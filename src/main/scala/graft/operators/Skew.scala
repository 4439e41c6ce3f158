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

  /** Salted replicated join: spread each hot fact key over `salts` sub-keys
    * and replicate every dim row `salts` ways so each (key, salt) pair still
    * finds its match. Inner-join semantics are exactly the plain join's —
    * each fact row meets each matching dim row exactly once, under exactly
    * one salt.
    *
    * This is the tool for the case AQE's skew handling doesn't cover and
    * broadcast can't: a MEDIUM dim (too big for one executor's memory) and
    * a fact side whose key histogram has a few keys holding a double-digit
    * percentage of rows — there, a plain shuffle join pins each hot key's
    * entire fact volume on one task, while the salted plan caps any task at
    * 1/`salts` of the hottest key for the price of `salts`× the (small
    * relative to fact) dim shuffle volume.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column, salts: Int): DataFrame = {
    val saltedFact =
      fact.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedDim =
      dim.withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedFact
      .join(saltedDim.hint("merge"), saltedFact("__salt") === saltedDim("__salt") && factKey === dimKey)
      .drop("__salt")
  }

  // ---------------------------------------------------------------------------
  // q87 — salted fact⋈dim join under a skewed fact key: events (every row one
  // of a handful of user_ids — the "viral user" histogram) joined to
  // customer, revenue by market segment. The `merge` hint pins the shape the
  // salt exists for (a shuffled sort-merge join, the 100 TB medium-dim
  // case); the oracle is the plain unsalted SQL join — salting must be
  // invisible in the result. The segment totals accumulate in DECIMAL so the
  // salt-sharded merge order can't flip a rounding boundary (q43's rule).
  // ---------------------------------------------------------------------------
  def q87SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    saltedJoin(ev, cust, col("user_id"), col("c_custkey"), salts = 16)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value")
      )
      .orderBy(col("segment"))
  }

  val q87Oracle: String =
    """SELECT c_mktsegment AS segment,
      |       count(*) AS n_events,
      |       round(sum(value), 2) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_salted_agg" -> (q43SaltedAgg _),
    "q87_skew_join" -> (q87SkewJoin _)
  )

  val oracles: Map[String, String] = Map(
    "q43_salted_agg" -> q43Oracle,
    "q87_skew_join" -> q87Oracle
  )
}
