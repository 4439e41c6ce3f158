package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Temporal

/** Live SCD2 dimension maintenance: keeps a versioned-history table current
  * as event files LAND in a directory, folding each tick's new events in
  * with [[Temporal.scd2Apply]] — only users that changed this tick are
  * touched.
  *
  * Same single-source-of-truth discipline as [[StreamingIndexer]]: the file
  * stream is a CHANGE SIGNAL only. Each tick re-derives the actual delta
  * from table state — events with `event_id` above the high-watermark the
  * history's sidecar records — never from the micro-batch rows, so a
  * redelivered or coalesced batch is a no-op (its ids are already under the
  * watermark). The landing contract is monotone ingest ids in event-time
  * order per user (ann-build's contract); a drop that VIOLATES it (an event
  * at-or-before some user's open interval) is detected at tick time and
  * triggers a full rebuild from the accumulated log — rebuild, never a
  * corrupt append (the JSONL-funnel rule).
  *
  * History commits are stage-then-swap (ParquetWarehouse's two-rename
  * shape), with the watermark sidecar written only after the swap: a crash
  * between the two leaves an older watermark and a newer history, and the
  * next tick's delta re-application compresses to a no-op (seed state ==
  * first delta state ⇒ no new versions).
  */
object StreamingScd2 {

  /** What a tick did: `incremental` (delta folded), `rebuild` (out-of-order
    * drop ⇒ full recompute), or `noop` (nothing above the watermark).
    */
  final case class TickOutcome(mode: String, historyRows: Long, watermark: Long)

  val historySchema: StructType = StructType(
    Seq(
      StructField("user_id", LongType),
      StructField("state", StringType),
      StructField("valid_from", TimestampType),
      StructField("valid_to", TimestampType),
      StructField("version", IntegerType),
      StructField("is_current", BooleanType)
    )
  )

  def readWatermark(historyDir: String): Long =
    StateStore.readWatermark(Paths.get(historyDir + ".watermark"))

  private def writeWatermark(historyDir: String, w: Long): Unit =
    StateStore.writeWatermark(Paths.get(historyDir + ".watermark"), w)

  def readHistory(spark: SparkSession, historyDir: String): DataFrame =
    StateStore.readTable(spark, historyDir, historySchema)

  private def commitHistory(df: DataFrame, historyDir: String): Unit =
    StateStore.commit(df, historyDir)

  /** One maintenance tick over the accumulated event log (exposed for the
    * batch/cron path and the spec; the stream calls exactly this).
    */
  def tick(spark: SparkSession, eventsDir: String, historyDir: String): TickOutcome = {
    val all = spark.read.parquet(eventsDir).select("user_id", "event_type", "ts", "event_id")
    val watermark = readWatermark(historyDir)
    val delta = all.filter(col("event_id") > watermark).localCheckpoint(true)
    val newWatermark =
      Option(all.agg(max(col("event_id"))).head().get(0)).map(_.asInstanceOf[Long]).getOrElse(-1L)
    if (delta.isEmpty) return TickOutcome("noop", readHistory(spark, historyDir).count(), watermark)

    val history = readHistory(spark, historyDir).localCheckpoint(true)
    // landing-contract check: any delta event at-or-before its user's open
    // interval start makes the incremental seed ordering invalid → rebuild
    val open = history.filter(col("is_current")).select(col("user_id"), col("valid_from"))
    val outOfOrder = delta
      .join(open, Seq("user_id"))
      .filter(col("ts") <= col("valid_from"))
      .limit(1)
      .count() > 0

    val (mode, updated) =
      if (outOfOrder) ("rebuild", Temporal.scd2Of(all))
      else ("incremental", Temporal.scd2Apply(history, delta))
    commitHistory(updated.select(historySchema.fieldNames.map(col): _*), historyDir)
    writeWatermark(historyDir, newWatermark)
    TickOutcome(mode, readHistory(spark, historyDir).count(), newWatermark)
  }

  /** Start the maintainer over `eventsDir` (parquet drops). Ticks are
    * change signals; `Trigger.AvailableNow` drains-and-stops (cron shape).
    */
  def start(
      spark: SparkSession,
      eventsDir: String,
      historyDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onTick: TickOutcome => Unit = _ => ()
  ): StreamingQuery = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream
      .schema(schema)
      .parquet(eventsDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", historyDir + ".checkpoint")
      .foreachBatch { (_: DataFrame, _: Long) =>
        onTick(tick(spark, eventsDir, historyDir))
      }
      .start()
  }
}
