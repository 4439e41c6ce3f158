package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Window / multi-dimensional aggregation inventory (SURVEY §2.5 and §2.12 ★:
  * the reference imports `Window` in its notebook but never uses it; these
  * generalize what its dense-hourly report would need at analytical scale).
  *
  * Scale notes:
  *   - Every window partitions by a key (`c_custkey`, `n_name`, ...) — never an
  *     empty `Window.orderBy` global window, which would single-task at 100 TB.
  *   - Top-n-per-group is a window + filter, not a self-join: one shuffle on
  *     the partition key instead of two scans of the fact table.
  *   - Running sums are computed over DECIMAL, not DOUBLE: decimal addition is
  *     associative, so results are identical regardless of how the frame is
  *     accumulated (Spark running-frame vs DuckDB segment-tree vs a 1000-way
  *     cluster merge).
  *   - rollup/cube expand in the map side (Expand operator) before one hash
  *     aggregate — no extra shuffles versus a plain groupBy.
  */
object Analytic {

  private val dec = "decimal(18,2)"

  // ---------------------------------------------------------------------------
  // q13 — top-n per group via ranking window (row_number over a deterministic
  // order). One shuffle on c_custkey; the filter drops non-top rows before the
  // final projection so nothing else crosses the wire.
  // ---------------------------------------------------------------------------
  def q13TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(
        col("o_custkey"),
        col("rn"),
        col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice")
      )
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q13Oracle: String =
    """SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 2) AS o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------------------
  // q14 — lag/lead analytics: days since a customer's previous order plus the
  // rank of the order in the customer's history.
  // ---------------------------------------------------------------------------
  def q14OrderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .withColumn("order_seq", row_number().over(w))
      .withColumn("days_since_prev", datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("order_seq"),
        col("days_since_prev")
      )
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val q14Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       row_number() OVER w AS order_seq,
      |       CAST(date_diff('day',
      |                      lag(o_orderdate, 1) OVER w,
      |                      o_orderdate) AS INT) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, order_seq""".stripMargin

  // ---------------------------------------------------------------------------
  // q15 — running + moving aggregates: cumulative customer spend and a
  // 3-order moving average, DECIMAL so accumulation order can't change results.
  // ---------------------------------------------------------------------------
  def q15RunningSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-2, Window.currentRow)
    Tables
      .orders(spark, dir)
      .withColumn("price_dec", col("o_totalprice").cast(dec))
      .withColumn("cum_spend", sum(col("price_dec")).over(wRun))
      // moving avg as exact-decimal sum / count, rounded at 4 dp: a count of
      // 1/2/3 can't produce a decimal tie at the 4th place, so Spark's
      // HALF_UP and DuckDB's banker's rounding agree bit-for-bit.
      .withColumn(
        "mov_avg3",
        round(sum(col("price_dec")).over(wMov).cast("double") / count(lit(1)).over(wMov), 4)
      )
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("cum_spend").cast("double").as("cum_spend"),
        col("mov_avg3")
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q15Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |             / count(*) OVER
      |              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------------
  // q16 — ROLLUP (SURVEY §2.12 ★): subtotals along the
  // (returnflag, linestatus) hierarchy + grand total. grouping_id
  // disambiguates NULL-as-subtotal from NULL data.
  // ---------------------------------------------------------------------------
  def q16Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty")
      )
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("n_rows"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** HAVING count(*) > 0 pins the EMPTY-corpus contract: SQL's ROLLUP
    * emits a grand-total row even over zero input rows, while Spark's
    * rollup (Expand + grouped aggregate) emits none — on any non-empty
    * table every rollup group aggregates >= 1 row, so the clause only
    * suppresses the empty-input phantom and both engines agree on 0 rows.
    */
  val q16Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
      |       count(*) AS n_rows,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |HAVING count(*) > 0
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------------
  // q17 — CUBE: all 4 grouping combinations of (status, priority).
  // ---------------------------------------------------------------------------
  def q17Cube(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price")
      )
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"), col("n_orders"), col("total_price"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** HAVING count(*) > 0 — q16's empty-corpus contract (CUBE's grand
    * total also materializes over zero input rows in SQL, not in Spark).
    */
  val q17Oracle: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS gid,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |HAVING count(*) > 0
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------------
  // q18 — explicit GROUPING SETS (Dataset.groupingSets, Spark 4): per-flag and
  // per-status subtotals in one pass (one Expand + one aggregate).
  // ---------------------------------------------------------------------------
  def q18GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"),
        col("l_linestatus")
      )
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("sum_price")
      )
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("n_rows"), col("sum_price"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val q18Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
      |       count(*) AS n_rows,
      |       round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------------
  // q19 — window over an aggregate: each nation's share of its region's
  // revenue. The agg shrinks data to ~25 rows before the window, so the
  // window partition is trivially small no matter the input scale.
  // ---------------------------------------------------------------------------
  def q19RevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val cust = Tables.customer(spark, dir)
    val perNation = Tables
      .orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice").cast(dec)).as("nation_rev"))
    val w = Window.partitionBy(col("r_name"))
    perNation
      .withColumn("region_rev", sum(col("nation_rev")).over(w))
      .select(
        col("r_name"),
        col("n_name"),
        col("nation_rev").cast("double").as("nation_rev"),
        // floor-form rounding in all-double arithmetic, written identically
        // in the oracle: every op is IEEE-exact, so both engines agree even
        // at .xxxx5 boundaries (round(double) does not — see q12).
        (floor(
          col("nation_rev").cast("double") * lit(100.0) / col("region_rev").cast("double") * lit(10000.0) + lit(0.5)
        ) / lit(10000.0)).as("rev_share_pct")
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  val q19Oracle: String =
    """WITH per_nation AS (
      |  SELECT r_name, n_name,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS nation_rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name,
      |       CAST(nation_rev AS DOUBLE) AS nation_rev,
      |       floor(CAST(nation_rev AS DOUBLE) * 100.0
      |             / CAST(sum(nation_rev) OVER (PARTITION BY r_name) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
      |         AS rev_share_pct
      |FROM per_nation
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------------
  // q56 — RANGE window frame (value-based, not row-based): each order's
  // customer spend over the TRAILING 30 DAYS by order date. rowsBetween
  // counts rows; rangeBetween bounds by the ordering VALUE, so ties and
  // gaps in time are handled correctly — the frame every trailing-window
  // business metric actually means.
  // ---------------------------------------------------------------------------
  def q56TrailingSpend(spark: SparkSession, dir: String): DataFrame = {
    val secs30d = 30L * 24 * 3600
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_epoch"))
      .rangeBetween(-secs30d, Window.currentRow)
    Tables
      .orders(spark, dir)
      // NTZ has no direct long cast; via TIMESTAMP under the session's UTC
      // zone the epoch matches DuckDB's epoch() on the naive value
      .withColumn("o_epoch", col("o_orderdate").cast("timestamp").cast("long"))
      .withColumn("trailing_30d_spend", sum(col("o_totalprice").cast(dec)).over(w))
      .withColumn("trailing_30d_orders", count(lit(1)).over(w))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("trailing_30d_spend").cast("double").as("trailing_30d_spend"),
        col("trailing_30d_orders")
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q56Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_30d_spend,
      |       count(*) OVER w AS trailing_30d_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY floor(epoch(o_orderdate))::BIGINT
      |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------------
  // q57 — HAVING + join back onto the qualifying set (TPC-H Q18 shape):
  // orders whose total line quantity exceeds a threshold, with customer
  // detail. The heavy aggregate runs first and shrinks to the qualifying
  // keys; the detail join touches only those.
  // ---------------------------------------------------------------------------
  def q57LargeVolumeOrders(spark: SparkSession, dir: String): DataFrame = {
    val qualifying = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 300)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    qualifying
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"),
        col("c_name"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("total_qty")
      )
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val q57Oracle: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       round(o_totalprice, 2) AS o_totalprice,
      |       total_qty
      |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300) q
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_trailing_spend" -> (q56TrailingSpend _),
    "q57_large_volume_orders" -> (q57LargeVolumeOrders _),
    "q13_top_orders_per_customer" -> (q13TopOrdersPerCustomer _),
    "q14_order_gaps" -> (q14OrderGaps _),
    "q15_running_spend" -> (q15RunningSpend _),
    "q16_rollup" -> (q16Rollup _),
    "q17_cube" -> (q17Cube _),
    "q18_grouping_sets" -> (q18GroupingSets _),
    "q19_revenue_share" -> (q19RevenueShare _)
  )

  val oracles: Map[String, String] = Map(
    "q56_trailing_spend" -> q56Oracle,
    "q57_large_volume_orders" -> q57Oracle,
    "q13_top_orders_per_customer" -> q13Oracle,
    "q14_order_gaps" -> q14Oracle,
    "q15_running_spend" -> q15Oracle,
    "q16_rollup" -> q16Oracle,
    "q17_cube" -> q17Oracle,
    "q18_grouping_sets" -> q18Oracle,
    "q19_revenue_share" -> q19Oracle
  )
}
