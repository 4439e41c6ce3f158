package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY §2 generalized);
  * every entry with an `oracleSql` counterpart is hash-checked against
  * DuckDB on the same parquet tables at sf0.01. Entries without an oracle
  * (approximate / hash-based ops that plain SQL can't reproduce) get a
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Analytic.queries ++
      operators.Temporal.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.SqlFrontend.queries ++
      operators.Skew.queries ++
      operators.RangeOps.queries ++
      operators.Sampling.queries ++
      operators.Curation.queries ++
      operators.TrainExport.queries ++
      operators.Privacy.queries ++
      operators.BloomPrune.queries ++
      operators.Retrieval.queries ++
      operators.Cartography.queries ++
      operators.Importance.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Analytic.oracles ++
      operators.Temporal.oracles ++
      operators.TextOps.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      operators.SqlFrontend.oracles ++
      operators.Skew.oracles ++
      operators.RangeOps.oracles ++
      operators.Sampling.oracles ++
      operators.Curation.oracles ++
      operators.TrainExport.oracles ++
      operators.Privacy.oracles ++
      operators.BloomPrune.oracles ++
      operators.Retrieval.oracles ++
      operators.Cartography.oracles ++
      operators.Importance.oracles
}
