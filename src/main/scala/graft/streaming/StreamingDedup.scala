package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the unbounded form of batch q29
  * (SURVEY §2.9 T7 ★: the reference has no dedup at all; a training-data
  * ingest stream needs it at the door). Documents are keyed by the same
  * whitespace-normalized md5 fingerprint the batch path uses, and
  * duplicates are dropped with `dropDuplicatesWithinWatermark`: state
  * holds one entry per fingerprint only until the watermark passes its
  * event time + delay, so memory is bounded by the dedup horizon, not the
  * stream's lifetime (a plain `dropDuplicates` on a stream keeps every key
  * forever — the classic state leak this operator exists to avoid).
  *
  * Emission is exactly-once per fingerprint within the horizon: the first
  * arrival wins, later copies (including late ones inside the watermark
  * delay) are dropped.
  */
object StreamingDedup {

  /** Fingerprint + dedup a document stream. `docs` needs `text` and an
    * event-time column `ts`; `delay` is the dedup horizon (how late a
    * duplicate can arrive and still be recognized).
    */
  def dedup(docs: DataFrame, delay: String): DataFrame =
    docs
      .withColumn("fingerprint", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
