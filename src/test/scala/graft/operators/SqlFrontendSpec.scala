package graft.operators

import graft.SparkSpec

/** SQL front-end, subquery, sketch, and skew invariants at sf0.001. */
class SqlFrontendSpec extends SparkSpec {

  test("q40 sql frontend equals the DataFrame construction of the same query") {
    import org.apache.spark.sql.functions._
    val sql = SqlFrontend.q40SqlFrontend(spark, sfDir).collect()
    val df = graft.core.Tables
      .orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
      .join(graft.core.Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(graft.core.Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue")
      )
      .orderBy(col("n_name"))
      .collect()
    assert(sql.sameElements(df))
  }

  test("q41 correlated subquery returns one non-negative scalar") {
    val rows = SqlFrontend.q41CorrelatedSubquery(spark, sfDir).collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(0) || rows.head.getDouble(0) >= 0.0)
  }

  test("q42 approx distinct within 5% of exact per event type") {
    val rows = SqlFrontend.q42ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
    }
  }

  test("q50 approx quantiles within 2% of exact medians") {
    val rows = SqlFrontend.q50ApproxQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getDouble(1)
      val exact = r.getDouble(2)
      assert(math.abs(approx - exact) / exact <= 0.02, s"approx=$approx exact=$exact")
    }
  }

  test("q43 salted aggregation equals the direct groupBy") {
    import org.apache.spark.sql.functions._
    val salted = Skew.q43SaltedAgg(spark, sfDir).collect()
    val direct = graft.core.Tables
      .events(spark, sfDir)
      .groupBy((col("user_id") % 3).cast("int").as("hot_key"))
      .agg(round(sum(col("value")), 2).as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("hot_key"))
      .collect()
    assert(salted.length === direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getInt(0) === d.getInt(0))
      assert(math.abs(s.getDouble(1) - d.getDouble(1)) < 0.02)
      assert(s.getLong(2) === d.getLong(2))
    }
  }
}
