package graft.operators

import graft.SparkSpec

/** Structural invariants for the window / multi-dim agg inventory at sf0.001.
  * Value-level correctness is the DuckDB-oracle gate's job.
  */
class AnalyticSpec extends SparkSpec {

  test("q13 top-n: at most 3 rows per customer, rn dense from 1") {
    val rows = Relational.queries // touch object init
    val byCust = Analytic.q13TopOrdersPerCustomer(spark, sfDir).collect().groupBy(_.getLong(0))
    byCust.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
    assert(rows.nonEmpty)
  }

  test("q14 gaps: first order per customer has null gap, rest non-negative") {
    val rows = Analytic.q14OrderGaps(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.head.isNullAt(4))
      assert(sorted.tail.forall(r => !r.isNullAt(4) && r.getInt(4) >= 0))
    }
  }

  test("q15 max running spend per customer equals the customer's total spend") {
    // output rows are sorted by orderkey while the running frame is ordered by
    // orderdate, so monotonicity in row order is NOT an invariant — but the
    // frame's maximum is always the customer's full total.
    val rows = Analytic.q15RunningSpend(spark, sfDir).collect()
    val totals = graft.core.Tables
      .orders(spark, sfDir)
      .groupBy("o_custkey")
      .sum("o_totalprice")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    rows.groupBy(_.getLong(0)).foreach { case (cust, rs) =>
      assert(math.abs(rs.map(_.getDouble(2)).max - totals(cust)) < 0.5)
    }
  }

  test("q16 rollup has exactly one grand-total row (gid=3) matching table count") {
    val rows = Analytic.q16Rollup(spark, sfDir).collect()
    val grand = rows.filter(_.getInt(2) == 3)
    assert(grand.length === 1)
    val total = graft.core.Tables.lineitem(spark, sfDir).count()
    assert(grand.head.getAs[Long]("n_rows") === total)
  }

  test("q17 cube: per-gid row counts consistent (gid 3 = 1 row; gid sums equal)") {
    val rows = Analytic.q17Cube(spark, sfDir).collect()
    val byGid = rows.groupBy(_.getInt(2))
    assert(byGid(3).length === 1)
    val totals = byGid.view.mapValues(_.map(_.getAs[Long]("n_orders")).sum).toMap
    assert(totals.values.toSet.size === 1) // every grouping level sums to table count
  }

  test("q56 trailing spend covers at least the current order, never less") {
    val rows = Analytic.q56TrailingSpend(spark, sfDir).collect()
    val prices = graft.core.Tables
      .orders(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Double]("o_totalprice"))
      .toMap
    rows.foreach { r =>
      val own = prices(r.getLong(1))
      assert(r.getDouble(3) >= own - 0.01, "window includes the current row")
      assert(r.getLong(4) >= 1)
    }
  }

  test("q57 only returns orders above the quantity threshold") {
    val rows = Analytic.q57LargeVolumeOrders(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Double]("total_qty") > 300.0))
    val qtys = rows.map(_.getAs[Double]("total_qty"))
    assert(qtys.sameElements(qtys.sorted(Ordering[Double].reverse)), "sorted by total_qty desc")
  }

  test("q19 revenue shares sum to ~100 within each region") {
    val rows = Analytic.q19RevenueShare(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val pct = rs.map(_.getDouble(3)).sum
      assert(math.abs(pct - 100.0) < 0.01)
    }
  }
}
