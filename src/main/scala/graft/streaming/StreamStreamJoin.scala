package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY §2.9 — absent in the reference,
  * added ★): attribute each purchase to clicks by the same user within the
  * preceding attribution window, both sides unbounded streams.
  *
  * The watermarks + the time-range join condition bound the state Spark
  * must retain on each side: a click can be dropped once the watermark
  * passes (click time + window); a purchase once it can no longer match.
  * This is the streaming form of the batch as-of/range joins (q23/q44) —
  * same semantics, bounded memory at any stream length.
  */
object StreamStreamJoin {

  /** Join watermarked click and purchase streams on user within
    * `windowMinutes` before the purchase. Inputs MUST already carry
    * watermarks (the caller chooses lateness).
    *
    * @param clicks    streaming DF: (user_id, click_ts)
    * @param purchases streaming DF: (user_id, purchase_id, purchase_ts)
    */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame, windowMinutes: Int): DataFrame =
    // Explicit aliases: both sides may derive from one parent DF, and alias
    // resolution must not fall back to the dataset-id heuristic.
    purchases.as("p").join(
      clicks.as("c"),
      col("p.user_id") === col("c.user_id") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_ts") < col("purchase_ts"),
      "inner"
    ).select(
      col("p.user_id").as("user_id"),
      col("purchase_id"),
      col("purchase_ts"),
      col("click_ts")
    )
}
