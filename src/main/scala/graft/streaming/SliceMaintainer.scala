package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The shared tick/watermark/stream template for MERGEABLE slice
  * maintainers — families whose state is an algebra over per-delta slices
  * (additive counts: [[StreamingDriftWatch]]; min-mergeable signatures:
  * [[StreamingSourceSketch]]) so a tick is exactly: derive the delta from
  * table state, append one slice, advance the watermark. Factored so the
  * crash-safety protocol lives in ONE place; the two maintainers differ
  * only in the slice they compute and how they serve the folded state.
  *
  * Contracts (each load-bearing, spec-pinned via the maintainers):
  *   - the file stream is a CHANGE SIGNAL only; the tick re-derives the
  *     delta from table state (doc_id above the persisted watermark), so a
  *     redelivered batch is a no-op;
  *   - slices land under `<family>/delta_<lo>/` keyed by the delta's FIRST
  *     id — a crashed tick's replay overwrites its own partial slice
  *     instead of leaving an overlapping id range to double-merge;
  *   - the watermark sidecar is written AFTER the slice via a temp file +
  *     ATOMIC_MOVE, so no crash point can leave a TRUNCATED sidecar — a
  *     torn sidecar would read as "everything is new", and the resulting
  *     full-corpus slice (keyed at the global min id, at or below the
  *     base's `_covered` watermark once compaction has run) would be
  *     classified dead and GC'd while the watermark jumped to the global
  *     max: silent, permanent loss of every doc since the last real tick.
  *     A sidecar that exists but does not parse now FAILS the tick loudly
  *     instead of defaulting to "empty state";
  *   - `SliceStore.maybeCompact` folds slices so tick listing cost never
  *     grows with tick count.
  */
private[streaming] object SliceMaintainer {

  /** One maintenance tick: compute the family slice over the delta (docs
    * above the persisted watermark) and commit it. Returns the number of
    * delta docs processed (0 = no-op tick).
    */
  def tick(
      spark: SparkSession,
      dataDir: String,
      stateDir: String,
      family: String,
      slice: DataFrame => DataFrame
  ): Long = tickWithLo(spark, dataDir, stateDir, family, (delta, _) => slice(delta))

  /** The tick with the delta's FIRST id exposed to the slice closure — for
    * families whose slice depends on PRIOR state (StreamingPack's base
    * offsets): the closure reads `readBelow(lo)` itself, so a crashed
    * tick's replay never sees its own stale slice. Keeping this variant
    * here (rather than re-spelling the protocol in the maintainer) keeps
    * the crash-safety ordering — slice write, THEN atomic watermark, THEN
    * invalidation and compaction — in ONE place.
    */
  def tickWithLo(
      spark: SparkSession,
      dataDir: String,
      stateDir: String,
      family: String,
      slice: (DataFrame, Long) => DataFrame
  ): Long = {
    val wm = readWatermark(stateDir)
    val docs = graft.core.Tables.documents(spark, dataDir)
    val delta = docs.filter(col("doc_id") > wm)
    val mm = delta.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"), count(lit(1)).as("n")).head()
    val n = mm.getAs[Long]("n")
    if (n == 0L) return 0L
    val (lo, hi) = (mm.getAs[Long]("lo"), mm.getAs[Long]("hi"))

    slice(delta, lo).write.mode("overwrite").parquet(s"$stateDir/$family/delta_$lo")

    writeWatermark(stateDir, hi)
    // the corpus under dataDir grew: batch artifacts cached this session
    // over the pre-append corpus must rebuild on next access
    graft.operators.SessionCache.invalidateAllFor(spark, dataDir)
    SliceStore.maybeCompact(spark, s"$stateDir/$family", hi)
    n
  }

  private[streaming] def readWatermark(stateDir: String): Long = {
    val p = Paths.get(stateDir, "state.json")
    if (!Files.exists(p)) Long.MinValue
    else {
      val s = Files.readString(p)
      "\"max_doc_id\"\\s*:\\s*(-?\\d+)".r
        .findFirstMatchIn(s)
        .map(_.group(1).toLong)
        .getOrElse(
          throw new IllegalStateException(
            s"$p exists but carries no max_doc_id — refusing to treat a corrupt watermark as an empty state: $s"
          )
        )
    }
  }

  private[streaming] def writeWatermark(stateDir: String, hi: Long): Unit = {
    val tmp = Paths.get(stateDir, "state.json.tmp")
    Files.writeString(tmp, s"""{"max_doc_id": $hi}""")
    Files.move(tmp, Paths.get(stateDir, "state.json"), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Wire a tick to a file stream over the documents landing path —
    * `Trigger.AvailableNow` drains what has landed and stops; pass a
    * processing-time trigger for a long-lived watcher.
    */
  def start(
      spark: SparkSession,
      dataDir: String,
      stateDir: String,
      checkpointName: String,
      trigger: Trigger,
      onTick: Long => Unit,
      runTick: () => Long
  ): StreamingQuery = {
    val docPath = s"$dataDir/documents.parquet"
    val schema = spark.read.parquet(docPath).schema
    spark.readStream
      .schema(schema)
      .parquet(docPath)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$stateDir/$checkpointName")
      .foreachBatch { (_: DataFrame, _: Long) =>
        onTick(runTick())
      }
      .start()
  }
}
