package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming version of the hourly rollup (SURVEY §2.9): the
  * reference "streams" by cron-rerunning a batch job and deleting consumed
  * files (`docker/cron/schedules.py`, `data_processing.py:415-421`) — i.e.
  * at-most-once with manual offsets-by-deletion. The Spark-native form is a
  * file source with checkpointed progress (exactly-once tracking),
  * `Trigger.AvailableNow` for the same run-to-completion cadence, and
  * `cleanSource=delete` reproducing the consume-once behavior — but only
  * after the offset is committed, which upgrades the reference's crash
  * semantics for free.
  *
  * The event-time derivation is identical to the batch path:
  * `input_file_name()` is stable per file under streaming too, so one file
  * still lands in exactly one hour bucket.
  *
  * Scale notes: the aggregation is keyed by (date, hour) — bounded state
  * (24 rows/day); the watermark bounds it further. maxFilesPerTrigger
  * controls micro-batch size under backpressure at real volume.
  */
object StreamingRollup {

  /** Streaming (date, hour, event_type) counts from a raw event directory.
    *
    * @param schema file sources require an explicit schema (no inference
    *   race with arriving files) — pass the event schema, e.g. read once
    *   from an existing file at deploy time.
    */
  def hourlyCountsStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      userAgent: String,
      deleteConsumed: Boolean = false,
      watermark: String = "2 hours"
  ): DataFrame = {
    val reader = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
    val withClean = if (deleteConsumed) reader.option("cleanSource", "delete") else reader
    withClean
      .parquet(inputDir)
      .filter(col("device_settings.user_agent") === userAgent)
      // Only the two known file families count — a stray dk_-stamped file is
      // skipped, matching the batch FileRouter and the reference's router.
      .filter(
        input_file_name().contains("impressions_processed_dk_") ||
          input_file_name().contains("clicks_processed_dk_")
      )
      .withColumn(
        "event_ts",
        try_to_timestamp(regexp_extract(input_file_name(), "dk_(\\d{14})", 1), lit("yyyyMMddHHmmss"))
      )
      .filter(col("event_ts").isNotNull)
      .withColumn(
        "event_type",
        when(input_file_name().contains("impressions_processed_dk_"), "impression")
          .otherwise("click")
      )
      .withWatermark("event_ts", watermark)
      .groupBy(
        window(col("event_ts"), "1 hour").as("w"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("date"),
        hour(col("w.start")).as("hour"),
        col("event_type"),
        col("n")
      )
  }

  /** Run-to-completion micro-batch (the cron-tick equivalent): processes all
    * currently-available files, delivering each batch to `onBatch`
    * (e.g. a ParquetWarehouse merge), then stops. Checkpointed: a re-run
    * resumes after the last committed file, unlike the reference's
    * delete-as-offset.
    */
  def runAvailableNow(
      counts: DataFrame,
      checkpointDir: String,
      onBatch: (DataFrame, Long) => Unit
  ): Unit = {
    val q = counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, id: Long) => onBatch(df, id) }
      .start()
    q.awaitTermination()
  }
}
