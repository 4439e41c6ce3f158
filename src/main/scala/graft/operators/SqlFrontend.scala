package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** SQL front-end + advanced relational shapes (SURVEY §2.12 remainder):
  * `spark.sql` over registered temp views (the reference runs `spark.sql`
  * only as a smoke test, `verify_setup.py:287-289` — here it's a first-class
  * entry path), correlated scalar subqueries, and approximate distinct
  * counting. Same Catalyst plans as the DataFrame API — predicate pushdown,
  * broadcast selection and AQE apply identically.
  */
object SqlFrontend {

  /** Register every testdata table as a temp view (idempotent). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  // ---------------------------------------------------------------------------
  // q40 — the SQL front-end proper: a multi-join aggregation submitted as SQL
  // text over temp views. Plan-identical to the DataFrame form (verified by
  // the oracle): SQL is an entry path, not a separate engine.
  // ---------------------------------------------------------------------------
  def q40SqlFrontend(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT n_name,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
    )
  }

  val q40Oracle: String =
    """SELECT n_name,
      |       count(DISTINCT o_custkey) AS n_customers,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------------
  // q41 — correlated scalar subquery (TPC-H Q17 shape): lineitems below 40%
  // of their part's average quantity. Catalyst decorrelates into an
  // aggregate + join — one extra pass over lineitem, not a per-row probe.
  // ---------------------------------------------------------------------------
  def q41CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |WHERE l_quantity < (
        |  SELECT 0.4 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin
    )
  }

  val q41Oracle: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem l1
      |WHERE l_quantity < (
      |  SELECT 0.4 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  // ---------------------------------------------------------------------------
  // q42 — approximate distinct counting (HyperLogLog++): the sketch path for
  // count-distinct at 100 TB (mergeable, fixed memory, no dedup shuffle of
  // raw keys). The raw sketch estimate is implementation-specific, so the
  // ORACLE-FACING output carries the exact count plus an `approx_ok`
  // envelope verdict (|approx-exact|/exact <= 3*rsd): DuckDB reproduces
  // exact_users/n_events and pins `1` for the verdict, turning the old
  // rows-only check into a real hash-gated one — if the sketch ever leaves
  // its error envelope, CORRECTNESS flags the mismatch. The estimate
  // itself stays spec-pinned (SqlFrontendSpec, via q42Estimates).
  // ---------------------------------------------------------------------------
  private val HllRsd = 0.02

  /** Sketch + exact side by side — the spec's view (raw estimate visible). */
  def q42Estimates(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), HllRsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events")
      )
      .orderBy(col("event_type"))

  def q42ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    q42Estimates(spark, dir)
      .select(
        col("event_type"),
        col("exact_users"),
        col("n_events"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(3 * HllRsd) * col("exact_users")).cast("int").as("approx_ok")
      )
      .orderBy(col("event_type"))

  val q42Oracle: String =
    """SELECT event_type,
      |       count(DISTINCT user_id) AS exact_users,
      |       count(*) AS n_events,
      |       1 AS approx_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q50 — approximate quantiles (Greenwald-Khanna sketch): the mergeable
  // fixed-memory alternative to q12's exact percentile at 100 TB. The GK
  // guarantee is a RANK bound — rank(v_q) within eps*n of q*n — and rank is
  // checkable WITHOUT the exact sort the sketch exists to avoid: one extra
  // aggregate pass counts rows <= each sketch value (filter-count, no
  // global ordering; the 3-row sketch frame is broadcast). The registered
  // output is the oracle-checkable form — group, n, and per-quantile rank
  // verdicts — so CORRECTNESS hash-gates the sketch's contract; the raw
  // sketch values stay available to the spec via q50Sketch.
  // ---------------------------------------------------------------------------
  /** Observed-rank tolerance: GK guarantees 1/accuracy = 0.001; ties on
    * the counted `<=` predicate and the sketch's boundary choice can add a
    * little — 0.01 is still 25x tighter than chance.
    */
  private val GkRankEps = 0.01

  /** The sketch alone (mergeable summary — the 100 TB operator). */
  def q50Sketch(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)").as("approx_q"),
        count(lit(1)).as("n")
      )

  def q50ApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_returnflag"), col("l_extendedprice"))
    def rankOk(slot: Int, q: Double) =
      (abs(
        avg((col("l_extendedprice") <= element_at(col("approx_q"), slot)).cast("int")) - lit(q)
      ) <= lit(GkRankEps)).cast("int")
    li.join(broadcast(q50Sketch(spark, dir)), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        rankOk(1, 0.25).as("p25_rank_ok"),
        rankOk(2, 0.50).as("median_rank_ok"),
        rankOk(3, 0.75).as("p75_rank_ok")
      )
      .orderBy(col("l_returnflag"))
  }

  val q50Oracle: String =
    """SELECT l_returnflag,
      |       count(*) AS n,
      |       1 AS p25_rank_ok,
      |       1 AS median_rank_ok,
      |       1 AS p75_rank_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------------
  // q55 — data profiling: per-column null counts, exact distinct counts and
  // numeric ranges in ONE scan (every metric is an aggregate over the same
  // pass; the long shape comes from a map-side stack of the agg row). The
  // table-health primitive every ingestion pipeline runs first.
  // ---------------------------------------------------------------------------
  def q55ProfileCustomer(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val numeric = Set("c_custkey", "c_nationkey", "c_acctbal")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct")
      ) ++ (if (numeric(c))
              Seq(min(col(c)).cast("double").as(s"${c}__min"), max(col(c)).cast("double").as(s"${c}__max"))
            else
              Seq(lit(null).cast("double").as(s"${c}__min"), lit(null).cast("double").as(s"${c}__max")))
    }
    val stacks = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    Tables
      .customer(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.length}, $stacks) AS (column_name, n_nulls, n_distinct, min_value, max_value)"))
      .orderBy(col("column_name"))
  }

  val q55Oracle: String =
    """SELECT * FROM (
      |  SELECT 'c_custkey' AS column_name,
      |         CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |         count(DISTINCT c_custkey) AS n_distinct,
      |         min(c_custkey)::DOUBLE AS min_value, max(c_custkey)::DOUBLE AS max_value
      |  FROM customer
      |  UNION ALL
      |  SELECT 'c_name', CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT c_name), NULL, NULL FROM customer
      |  UNION ALL
      |  SELECT 'c_nationkey', CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT c_nationkey), min(c_nationkey)::DOUBLE, max(c_nationkey)::DOUBLE FROM customer
      |  UNION ALL
      |  SELECT 'c_acctbal', CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT c_acctbal), min(c_acctbal)::DOUBLE, max(c_acctbal)::DOUBLE FROM customer
      |  UNION ALL
      |  SELECT 'c_mktsegment', CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT c_mktsegment), NULL, NULL FROM customer)
      |ORDER BY column_name""".stripMargin

  // ---------------------------------------------------------------------------
  // q58 — multiset set operations: INTERSECT ALL / EXCEPT ALL preserve
  // duplicate cardinality (bag semantics), unlike q10's distinct set ops.
  // A user with 3 clicks and 2 purchases contributes min(3,2)=2 rows to the
  // intersection and 3-2=1 row to the difference.
  // ---------------------------------------------------------------------------
  def q58MultisetOps(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT 'click_intersect_purchase' AS op, user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id
        |UNION ALL
        |SELECT 'click_except_purchase' AS op, user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id
        |ORDER BY op, user_id""".stripMargin
    )
  }

  val q58Oracle: String =
    """SELECT 'click_intersect_purchase' AS op, user_id, count(*) AS n FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT ALL
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |GROUP BY user_id
      |UNION ALL
      |SELECT 'click_except_purchase' AS op, user_id, count(*) AS n FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT ALL
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |GROUP BY user_id
      |ORDER BY op, user_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q59 — correlated LATERAL subquery: each nation's two most recent orders.
  // Catalyst rewrites the lateral into a ranked window join — per-row probe
  // semantics, set-based execution.
  // ---------------------------------------------------------------------------
  def q59LateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT n.n_name, t.o_orderkey,
        |       date_format(t.o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
        |       round(t.o_totalprice, 2) AS o_totalprice
        |FROM nation n,
        |LATERAL (
        |  SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
        |  LIMIT 2) t
        |ORDER BY n.n_name, t.o_orderkey""".stripMargin
    )
  }

  val q59Oracle: String =
    """SELECT n.n_name, t.o_orderkey,
      |       strftime(t.o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       round(t.o_totalprice, 2) AS o_totalprice
      |FROM nation n,
      |LATERAL (
      |  SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
      |  LIMIT 2) t
      |ORDER BY n.n_name, t.o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_multiset_ops" -> (q58MultisetOps _),
    "q59_lateral_top_orders" -> (q59LateralTopOrders _),
    "q40_sql_frontend" -> (q40SqlFrontend _),
    "q41_correlated_subquery" -> (q41CorrelatedSubquery _),
    "q42_approx_distinct" -> (q42ApproxDistinct _),
    "q50_approx_quantiles" -> (q50ApproxQuantiles _),
    "q55_profile_customer" -> (q55ProfileCustomer _)
  )

  val oracles: Map[String, String] = Map(
    "q58_multiset_ops" -> q58Oracle,
    "q59_lateral_top_orders" -> q59Oracle,
    "q40_sql_frontend" -> q40Oracle,
    "q41_correlated_subquery" -> q41Oracle,
    "q42_approx_distinct" -> q42Oracle,
    "q50_approx_quantiles" -> q50Oracle,
    "q55_profile_customer" -> q55Oracle
  )
}
