package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Skew-mitigation operators: salted two-phase aggregation and a salted
  * broadcast-side join. At 100 TB a handful of hot keys (one viral user, one
  * default enum value) can pin a full shuffle partition on one task; salting
  * spreads a hot key over S sub-keys at the cost of a second (tiny) reduce.
  * AQE's skew-join handling covers sort-merge joins automatically; explicit
  * salting is the tool for aggregations and for deterministic plans.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial sums →
    * groupBy(key) final sums. Phase 1 spreads each key over `salts`
    * partitions; phase 2 reduces `salts` rows per key — negligible.
    * Semantics identical to a direct groupBy (sums/counts are associative).
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      valueCol: Column,
      salts: Int
  ): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))

  // ---------------------------------------------------------------------------
  // q43 — salted aggregation over a deliberately skewed key (user_id % 3
  // collapses 150 users onto 3 hot keys). The salted plan computes the same
  // result as a plain groupBy — the oracle is the plain SQL — while phase 1
  // runs on (key × 16 salts) groups. The value is accumulated in DECIMAL
  // (lossless for the 2-dp inputs): decimal addition is associative, so the
  // salt-partitioned merge order can never flip a rounding boundary the way
  // a double partial-sum could.
  // ---------------------------------------------------------------------------
  def q43SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("hot_key", (col("user_id") % 3).cast("int"))
    saltedSumCount(ev, col("hot_key"), col("value").cast("decimal(18,2)"), salts = 16)
      .select(
        col("key").as("hot_key"),
        col("total").cast("double").as("total_value"),
        col("n").as("n_events")
      )
      .orderBy(col("hot_key"))
  }

  val q43Oracle: String =
    """SELECT CAST(user_id % 3 AS INT) AS hot_key,
      |       round(sum(value), 2) AS total_value,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_salted_agg" -> (q43SaltedAgg _)
  )

  val oracles: Map[String, String] = Map(
    "q43_salted_agg" -> q43Oracle
  )
}
