package graft

/** The plan gate as a TEST: `sbt test` fails when any registered query's
  * executed plan picks a non-whitelisted scale-killer strategy, and the
  * detector itself is proven able to catch a planted cartesian / BNLJ —
  * a gate that can't fire is indistinguishable from a clean run.
  */
class PlanAuditGateSpec extends SparkSpec {

  test("full registry at sf0.001: no non-whitelisted BNLJ/cartesian") {
    val violations = PlanAudit.audit(spark, sfDir)
    assert(violations.isEmpty, violations.mkString("; "))
  }

  test("a planted cartesian product is caught") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disabling broadcast forces the conditionless join to plan as a true
    // CartesianProduct rather than a BroadcastNestedLoopJoin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.range(100).crossJoin(spark.range(100).withColumnRenamed("id", "id2"))
      val facts = PlanAudit.auditPlan("planted_cartesian", df)
      assert(
        facts.violations.exists(_.strategy == "CartesianProduct"),
        s"planted cartesian not flagged: joins=${facts.joins}, violations=${facts.violations}"
      )
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a planted BNLJ is caught unless the query is whitelisted for it") {
    val df = spark.range(1000).crossJoin(spark.range(3).withColumnRenamed("id", "id2"))
    val unlisted = PlanAudit.auditPlan("planted_bnlj", df)
    assert(
      unlisted.violations.exists(_.strategy == "BroadcastNestedLoopJoin"),
      s"planted BNLJ not flagged: joins=${unlisted.joins}"
    )
    // the same plan under a whitelisted query name passes — the waiver is
    // per-(query, strategy), not global
    val waived = PlanAudit.auditPlan("q34_bruteforce_topk", df)
    assert(waived.violations.isEmpty, waived.violations.mkString("; "))
  }

  test("a query that fails to plan fails the gate rather than passing silently") {
    intercept[Throwable] {
      PlanAudit.auditPlan("broken", spark.sql("SELECT * FROM nonexistent_table_xyz"))
    }
  }

  test("an analysis failure reports BROKEN (analysis) with the query's name and cause") {
    // the round-9 failure mode: a data-contract change makes a query
    // unresolvable — the gate must name the query and say "analysis", not
    // dump one shared stack trace for the whole suite
    val e = intercept[Throwable] { spark.sql("SELECT * FROM nonexistent_table_xyz").collect() }
    val v = PlanAudit.brokenViolation("q99_planted", e)
    assert(v.strategy == "BROKEN (analysis)", s"got strategy ${v.strategy}")
    assert(v.query == "q99_planted")
    assert(v.detail.nonEmpty, "detail must carry the first line of the analysis error")
    assert(v.toString.startsWith("q99_planted: BROKEN (analysis) — "), v.toString)
  }

  test("a non-analysis failure reports its exception class, not 'not whitelisted'") {
    val v = PlanAudit.brokenViolation("q98_planted", new IllegalStateException("boom town"))
    assert(v.strategy == "BROKEN (IllegalStateException)", v.strategy)
    assert(v.detail == "boom town")
    assert(!v.toString.contains("not whitelisted"), v.toString)
  }
}
