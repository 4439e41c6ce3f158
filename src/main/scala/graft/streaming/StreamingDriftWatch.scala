package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Importance

/** Live source-drift monitoring: keeps the q128 Jensen–Shannon drift table
  * current as document files land, at O(delta) per tick — the ingest-time
  * form of the question q128 answers in batch (is a source's text drifting
  * away from the blend the mixture plan was tuned on?), which is exactly
  * when a curator wants the alarm: as the drop lands, not at the next full
  * scan.
  *
  * Why this maintainer is trivially exact where DupClusters/SpanDedup need
  * retroactive repair: q128's state is per-(source, bucket) hashed-unigram
  * COUNTS, and counts are ADDITIVE — the histogram of corpus ∪ delta is
  * histogram(corpus) + histogram(delta), no interaction terms. So each tick
  * only tokenizes the delta, appends its counts as a slice, and the served
  * drift table recomputed from the summed slices equals the batch q128 over
  * the full corpus BY CONSTRUCTION (same [[Importance.driftFromCounts]]
  * arithmetic over identical integer counts; spec-pinned anyway).
  *
  * Same contracts as the sibling maintainers:
  *   - the file stream is a CHANGE SIGNAL only; the tick re-derives the
  *     delta from table state (doc_id above the persisted watermark), so a
  *     redelivered batch is a no-op;
  *   - slices land under `hist/delta_<lo>/` keyed by the delta's FIRST id —
  *     a crashed tick's replay overwrites its own partial slice instead of
  *     leaving an overlapping doc range to double-count;
  *   - `SliceStore.maybeCompact` folds slices so tick cost never grows with
  *     tick count (state is ≤ |sources| × 64 rows per slice anyway);
  *   - the watermark sidecar is written AFTER the slice, so a crash between
  *     the two re-runs an idempotent overwrite.
  *
  * At 100 TB the per-slice state stays |sources| × 64 rows — the one
  * maintainer whose whole state is broadcast-sized forever.
  */
object StreamingDriftWatch {

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

    Importance
      .sourceBucketCounts(delta.select(col("source"), col("text")))
      .write
      .mode("overwrite")
      .parquet(s"$stateDir/hist/delta_$lo")

    Files.writeString(Paths.get(stateDir, "state.json"), s"""{"max_doc_id": $hi}""")
    // the corpus under dataDir grew: batch artifacts cached this session
    // over the pre-append corpus must rebuild on next access
    graft.operators.SessionCache.invalidateAllFor(spark, dataDir)
    SliceStore.maybeCompact(spark, s"$stateDir/hist", hi)
    n
  }

  /** The maintained drift table — q128's exact output over every document
    * the ticks have covered. Slices are summed to unique (source, bucket)
    * counts first (additivity is the whole design), then run through the
    * SAME arithmetic as the batch query.
    */
  def driftTable(spark: SparkSession, stateDir: String): DataFrame =
    Importance.driftFromCounts(
      SliceStore
        .read(spark, s"$stateDir/hist")
        .groupBy(col("source"), col("bucket"))
        .agg(sum(col("pn")).as("pn"))
        .localCheckpoint() // one fold feeds per-source and corpus histograms
    )

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
      .option("checkpointLocation", s"$stateDir/_drift_checkpoint")
      .foreachBatch { (_: DataFrame, _: Long) =>
        onTick(tick(spark, dataDir, stateDir))
      }
      .start()
  }
}
