package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sampling and dataset-split operators — the selection half of a
  * training-data pipeline (the reference has none; a 100 TB corpus engine
  * needs reproducible subsetting).
  *
  * Two distinct tools:
  *   - `sampleBy` (q48): per-stratum Bernoulli sampling — statistical, seeded,
  *     engine-specific RNG → validated by proportion envelope, not an oracle.
  *   - hash-split (q49): DETERMINISTIC content-addressed splits via md5 —
  *     every engine that computes md5 agrees forever on which row is
  *     train/test. This is the correct tool for split assignment (a re-run,
  *     a different engine, a different day: same split), while sampleBy is
  *     for downsampling mass.
  */
object Sampling {

  // ---------------------------------------------------------------------------
  // q48 — stratified sampling: 50%/10% per event type via sampleBy with a
  // fixed seed. Per-row Bernoulli draw — no shuffle; the aggregate just
  // summarizes what survived.
  // ---------------------------------------------------------------------------
  def q48StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val fractions = Map("click" -> 0.5, "view" -> 0.5, "purchase" -> 0.1, "signup" -> 0.1, "error" -> 0.1)
    Tables
      .events(spark, dir)
      .stat
      .sampleBy("event_type", fractions, seed = 42L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------------------
  // q49 — deterministic train/validation/test split: bucket = first 2 hex
  // chars of md5(doc_id) (256 buckets) → 80/10/10. Pure per-row expression,
  // engine-agnostic (md5 is md5 everywhere) → fully oracle-checked.
  // ---------------------------------------------------------------------------
  def q49HashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .withColumn("bucket", conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int"))
      .withColumn(
        "split",
        when(col("bucket") < 205, "train").when(col("bucket") < 230, "validation").otherwise("test")
      )
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id")
      )
      .orderBy(col("split"))

  val q49Oracle: String =
    """WITH b AS (
      |  SELECT doc_id, n_chars,
      |         CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT AS INT) AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 205 THEN 'train'
      |            WHEN bucket < 230 THEN 'validation'
      |            ELSE 'test' END AS split,
      |       count(*) AS n_docs,
      |       sum(n_chars) AS total_chars,
      |       min(doc_id) AS min_doc_id
      |FROM b
      |GROUP BY 1
      |ORDER BY split""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_stratified_sample" -> (q48StratifiedSample _),
    "q49_hash_split" -> (q49HashSplit _)
  )

  /** q48 is RNG-based → rows-only; q49 is deterministic → oracle. */
  val oracles: Map[String, String] = Map(
    "q49_hash_split" -> q49Oracle
  )
}
