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
    val rows = SqlFrontend.q42Estimates(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
    }
  }

  test("q42 registered output: envelope verdict is 1 for every event type") {
    val rows = SqlFrontend.q42ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("approx_ok") === 1, s"HLL left its 3-sigma envelope: $r"))
  }

  test("q50 approx quantiles within 2% of exact percentiles (computed here, not in the query)") {
    import org.apache.spark.sql.functions._
    val rows = SqlFrontend.q50Sketch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the exact sort lives in the TEST: the registered operator ships only
    // the mergeable sketch plus its rank-envelope verdicts (the 100 TB path)
    val exact = graft.core.Tables
      .lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("q"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap
    rows.foreach { r =>
      val e = exact(r.getString(0))
      r.getSeq[Double](1).zip(e).foreach { case (approx, ex) =>
        assert(math.abs(approx - ex) / ex <= 0.02, s"approx=$approx exact=$ex")
      }
    }
  }

  test("q50 registered output: rank-envelope verdicts are 1 for every group") {
    val rows = SqlFrontend.q50ApproxQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("p25_rank_ok", "median_rank_ok", "p75_rank_ok").foreach(c =>
        assert(r.getAs[Int](c) === 1, s"GK sketch left its rank envelope: $r")
      )
    }
  }

  test("q54 fuzzy names: symmetric-free pairs within the distance bound") {
    val rows = TextOps.q54FuzzyNames(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs are ordered, no mirror duplicates")
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 2)
      assert(r.getLong(3) > 0)
    }
  }

  test("q55 profile: one row per column, zero nulls, key column fully distinct") {
    val rows = SqlFrontend.q55ProfileCustomer(spark, sfDir).collect()
    assert(rows.length === 5)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val nCust = graft.core.Tables.customer(spark, sfDir).count()
    assert(rows.forall(_.getLong(1) == 0L), "testdata customer has no nulls")
    assert(byCol("c_custkey").getLong(2) === nCust, "key column distinct == row count")
    assert(byCol("c_name").isNullAt(3), "string columns have no numeric range")
    assert(byCol("c_acctbal").getDouble(3) <= byCol("c_acctbal").getDouble(4))
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

  test("q87 salted join equals the plain join and keeps the shuffled-join shape") {
    import org.apache.spark.sql.functions._
    val salted = Skew.q87SkewJoin(spark, sfDir).collect()
    val direct = graft.core.Tables
      .events(spark, sfDir)
      .join(graft.core.Tables.customer(spark, sfDir), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("segment"))
      .collect()
    assert(salted.length === direct.length && salted.nonEmpty)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) === d.getString(0))
      assert(s.getLong(1) === d.getLong(1))
      assert(math.abs(s.getDouble(2) - d.getDouble(2)) < 0.02)
    }
    // the merge hint must hold: salting is pointless under a broadcast join
    val plan = Skew.q87SkewJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("salted join replicates each dim row exactly once per salt") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sfDir)
    val cust = graft.core.Tables.customer(spark, sfDir)
    val joined = Skew.saltedJoin(ev, cust, col("user_id"), col("c_custkey"), salts = 7)
    // every fact row meets its dim match exactly once ⇒ row count == plain join
    val plainCount = ev.join(cust, col("user_id") === col("c_custkey")).count()
    assert(joined.count() === plainCount)
  }
}
