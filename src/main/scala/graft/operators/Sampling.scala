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
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       min(doc_id) AS min_doc_id
      |FROM b
      |GROUP BY 1
      |ORDER BY split""".stripMargin

  // ---------------------------------------------------------------------------
  // q51 — deterministic per-group sample via a typed custom Aggregator
  // (graft.functions.BottomKSketch): the k docs with smallest md5 per lang.
  // Content-addressed → reproducible anywhere md5 exists (fully
  // oracle-checked); O(k) state per group regardless of group size.
  // ---------------------------------------------------------------------------
  final case class LangDoc(lang: String, sortKey: String, id: Long)

  def q51BottomKSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sketch = graft.functions.BottomKSketch
      .aggregator[LangDoc](5)(_.sortKey, _.id)
      .toColumn
    Tables
      .documents(spark, dir)
      .select(
        col("lang"),
        md5(col("doc_id").cast("string")).as("sortKey"),
        col("doc_id").as("id")
      )
      .as[LangDoc]
      .groupByKey(_.lang)
      .agg(sketch.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"), explode(col("sample")).as("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  val q51Oracle: String =
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id,
      |         row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR)) AS rn
      |  FROM documents)
      |WHERE rn <= 5
      |ORDER BY lang, doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_stratified_sample" -> (q48StratifiedSample _),
    "q49_hash_split" -> (q49HashSplit _),
    "q51_bottomk_sample" -> (q51BottomKSample _)
  )

  /** q48 is RNG-based → rows-only; q49/q51 are deterministic → oracle. */
  val oracles: Map[String, String] = Map(
    "q49_hash_split" -> q49Oracle,
    "q51_bottomk_sample" -> q51Oracle
  )
}
