package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming form of the q72 curation funnel: the SAME fused
  * signal-projection + first-failing-rule battery
  * (`Curation.funnelSignals` — one code path, so batch and streaming can
  * never classify a document differently), applied to documents as they
  * arrive from a file source, maintaining running (source, reason) counts.
  *
  * This is the ingest-time shape of corpus curation: a crawler drops
  * document files into a landing directory and the funnel keeps a live
  * per-source survival report, instead of waiting for a nightly batch over
  * the accumulated corpus. Every rule signal is per-row, so the streaming
  * plan is the batch plan with a stateful aggregate on top — no watermark
  * is needed because (source, reason) keys the state at a few dozen rows
  * regardless of corpus size (bounded state by construction, unlike
  * per-document keys). Complete output mode re-emits the whole dozens-row
  * report per trigger, which is exactly what a monitoring sink wants.
  *
  * StreamingSpec pins streaming == batch: the funnel counts after
  * `Trigger.AvailableNow` over a directory equal q72's counts over the
  * same corpus.
  */
object StreamingFunnel {

  /** Running (source, reason, n_docs, token_mass) over a document file
    * stream. Write with `outputMode("complete")`. `format` is "parquet"
    * (default) or "json" — crawlers drop JSONL; the declared schema keeps
    * the stream inference-free either way. A malformed JSONL line parses
    * to all-null columns; it is dropped here rather than killing the
    * stream or polluting the report (batch-mode quarantine with the raw
    * lines preserved is [[graft.sources.JsonlCorpus.split]]).
    */
  def funnelStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      format: String = "parquet"
  ): DataFrame = {
    val reader = spark.readStream.schema(schema)
    val docs = format match {
      case "parquet" => reader.parquet(inputDir)
      case "json"    => reader.json(inputDir).filter(col("text").isNotNull)
      case other     => throw new IllegalArgumentException(s"unsupported funnel stream format: $other")
    }
    graft.operators.Curation
      .funnelSignals(docs)
      .groupBy(col("source"), col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("token_mass"))
  }
}
