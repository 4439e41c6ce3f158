package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Range joins and reshaping operators (SURVEY §2.12: no theta/range joins in
  * the reference — added ★; plus UNPIVOT, the inverse of q20's pivot).
  */
object RangeOps {

  // ---------------------------------------------------------------------------
  // q44 — equi + range join: for each purchase, how many clicks the same user
  // made in the preceding hour. The equi key (user_id) carries the join —
  // one hash shuffle per side — and the time-range predicate filters within
  // matched pairs; never a cross join. (For range-only joins the scalable
  // form adds a coarse time-bucket equi key; the user key plays that role
  // here.)
  // ---------------------------------------------------------------------------
  def q44RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // Both sides derive from the same scan; explicit aliases make the join
    // keys unambiguous (no dataset-id disambiguation heuristic).
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"), col("ts").as("p_ts"))
      .as("p")
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
      .as("c")
    purchases
      .join(
        clicks,
        col("p.user_id") === col("c.user_id") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"),
        "left"
      )
      .groupBy(col("p.user_id").as("user_id"), col("purchase_event_id"))
      .agg(count(col("c_ts")).as("clicks_prev_hour"))
      .orderBy(col("user_id"), col("purchase_event_id"))
  }

  val q44Oracle: String =
    """SELECT p.user_id, p.event_id AS purchase_event_id,
      |       count(c.ts) AS clicks_prev_hour
      |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR
      | AND c.ts < p.ts
      |GROUP BY p.user_id, p.event_id
      |ORDER BY p.user_id, purchase_event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q45 — UNPIVOT (stack): wide per-status order counts back to long form.
  // Map-side reshape — no shuffle beyond the producing aggregate.
  // ---------------------------------------------------------------------------
  def q45Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables
      .orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na
      .fill(0, Seq("F", "O", "P"))
    wide
      .select(
        col("o_orderpriority"),
        expr("stack(3, 'F', F, 'O', O, 'P', P) AS (o_orderstatus, n_orders)")
      )
      .filter(col("n_orders") > 0)
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))
  }

  val q45Oracle: String =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------------
  // q52 — array aggregation: per-customer sorted order-key array (collect_list
  // + sort_array for determinism) with array-function post-processing.
  // ---------------------------------------------------------------------------
  def q52CollectArrays(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(col("o_orderkey"))).as("order_keys"))
      .select(
        col("o_custkey"),
        // serialized — array-typed result columns aren't hashable by the
        // row-compare harness
        array_join(col("order_keys"), ",").as("order_keys"),
        size(col("order_keys")).as("n_orders"),
        element_at(col("order_keys"), 1).as("first_key"),
        element_at(col("order_keys"), -1).as("last_key")
      )
      .orderBy(col("o_custkey"))

  val q52Oracle: String =
    """SELECT o_custkey,
      |       array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
      |       CAST(count(*) AS INT) AS n_orders,
      |       min(o_orderkey) AS first_key,
      |       max(o_orderkey) AS last_key
      |FROM orders
      |WHERE o_custkey < 100
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------------------
  // q53 — FULL OUTER join: daily click vs purchase value totals, neither side
  // dominating, null-safe coalesce on both key and measures.
  // ---------------------------------------------------------------------------
  def q53FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def daily(t: String) = ev
      .filter(col("event_type") === t)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("value")), 2).as(s"${t}_value"))
    daily("click")
      .join(daily("purchase"), Seq("day"), "full_outer")
      .select(
        col("day"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"),
        coalesce(col("purchase_value"), lit(0.0)).as("purchase_value")
      )
      .orderBy(col("day"))
  }

  val q53Oracle: String =
    """WITH c AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, round(sum(value), 2) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |p AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, round(sum(value), 2) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT coalesce(c.day, p.day) AS day,
      |       coalesce(click_value, 0.0) AS click_value,
      |       coalesce(purchase_value, 0.0) AS purchase_value
      |FROM c FULL OUTER JOIN p ON c.day = p.day
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_range_join" -> (q44RangeJoin _),
    "q45_unpivot" -> (q45Unpivot _),
    "q52_collect_arrays" -> (q52CollectArrays _),
    "q53_full_outer" -> (q53FullOuter _)
  )

  val oracles: Map[String, String] = Map(
    "q44_range_join" -> q44Oracle,
    "q45_unpivot" -> q45Oracle,
    "q52_collect_arrays" -> q52Oracle,
    "q53_full_outer" -> q53Oracle
  )
}
