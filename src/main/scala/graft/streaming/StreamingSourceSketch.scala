package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Curation

/** Live source-similarity sketching: keeps the q134 MinHash signatures (and
  * hence the pairwise source-Jaccard estimates) current as document files
  * land, at O(delta) per tick — so "did this drop make src_a a mirror of
  * src_b?" is answerable as the drop lands, without re-shingling the
  * corpus.
  *
  * Exactness comes free from the semilattice: a MinHash component is a MIN
  * over the source's shingle set, and min(A ∪ B) = min(min(A), min(B)) —
  * no interaction terms, no retroactive repair (the same argument as
  * [[StreamingDriftWatch]]'s additive counts, with min in place of sum).
  * Each tick shingles only the delta, appends its |sources| × H signature
  * slice, and the served pair table recomputed from the per-(source, h)
  * min over slices equals batch q134 over the full corpus BY CONSTRUCTION
  * (the serve path routes through the SAME
  * [[Curation.sketchPairsFromSignatures]] tail; spec-pinned anyway).
  *
  * Same contracts as the sibling maintainers:
  *   - the file stream is a CHANGE SIGNAL only; the tick re-derives the
  *     delta from table state (doc_id above the persisted watermark), so a
  *     redelivered batch is a no-op;
  *   - slices land under `sig/delta_<lo>/` keyed by the delta's FIRST id —
  *     a crashed tick's replay overwrites its own partial slice instead of
  *     leaving an overlapping doc range to double-count (min is idempotent
  *     anyway: even an overlapping slice could only repeat the same mins);
  *   - `SliceStore.maybeCompact` folds slices so tick listing cost never
  *     grows with tick count;
  *   - the watermark sidecar is written AFTER the slice, so a crash
  *     between the two re-runs an idempotent overwrite.
  *
  * At 100 TB the state stays |sources| × H rows per slice — like the drift
  * watch, a maintainer whose whole state is broadcast-sized forever.
  */
object StreamingSourceSketch {

  /** One maintenance tick; returns the number of delta docs processed
    * (0 = no-op tick). Callable directly (cron cadence) — `start` wires it
    * to a file stream.
    */
  def tick(spark: SparkSession, dataDir: String, stateDir: String): Long = {
    val wm = readWatermark(stateDir)
    val docs = graft.core.Tables.documents(spark, dataDir)
    val delta = docs.filter(col("doc_id") > wm)
    val mm = delta.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"), count(lit(1)).as("n")).head()
    val n = mm.getAs[Long]("n")
    if (n == 0L) return 0L
    val (lo, hi) = (mm.getAs[Long]("lo"), mm.getAs[Long]("hi"))

    Curation
      .sourceSketchSignatures(delta.select(col("source"), col("text")))
      .write
      .mode("overwrite")
      .parquet(s"$stateDir/sig/delta_$lo")

    Files.writeString(Paths.get(stateDir, "state.json"), s"""{"max_doc_id": $hi}""")
    // the corpus under dataDir grew: batch artifacts cached this session
    // over the pre-append corpus must rebuild on next access
    graft.operators.SessionCache.invalidateAllFor(spark, dataDir)
    SliceStore.maybeCompact(spark, s"$stateDir/sig", hi)
    n
  }

  /** The maintained signature table — per-(source, h) min over every slice
    * the ticks have appended (min-mergeability is the whole design).
    */
  def signatures(spark: SparkSession, stateDir: String): DataFrame =
    SliceStore
      .read(spark, s"$stateDir/sig")
      .groupBy(col("source"), col("h"))
      .agg(min(col("comp")).as("comp"))

  /** The maintained pair table — q134's exact output over every document
    * the ticks have covered, served through the same pair-compare tail as
    * the batch query.
    */
  def sketchTable(spark: SparkSession, stateDir: String): DataFrame =
    Curation.sketchPairsFromSignatures(signatures(spark, stateDir))

  private def readWatermark(stateDir: String): Long = {
    val p = Paths.get(stateDir, "state.json")
    if (!Files.exists(p)) Long.MinValue
    else {
      val s = Files.readString(p)
      val m = "\"max_doc_id\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(s)
      m.map(_.group(1).toLong).getOrElse(Long.MinValue)
    }
  }

  /** Wire the tick to a file stream over the documents landing path —
    * `Trigger.AvailableNow` drains what has landed and stops; pass a
    * processing-time trigger for a long-lived watcher. `onTick` sees each
    * tick's delta count.
    */
  def start(
      spark: SparkSession,
      dataDir: String,
      stateDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onTick: Long => Unit = _ => ()
  ): StreamingQuery = {
    val docPath = s"$dataDir/documents.parquet"
    val schema = spark.read.parquet(docPath).schema
    spark.readStream
      .schema(schema)
      .parquet(docPath)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$stateDir/_sketch_checkpoint")
      .foreachBatch { (_: DataFrame, _: Long) =>
        onTick(tick(spark, dataDir, stateDir))
      }
      .start()
  }
}
