package graft

import org.scalatest.funsuite.AnyFunSuite

/** stripInitialPlans: the audit must count the FINAL adaptive plan exactly
  * once — dropping every "== Initial Plan ==" subtree (top-level AND nested
  * inside adaptive subquery subtrees) while keeping everything after a
  * nested one, which prefix-truncation at the first marker used to cut off.
  */
class PlanAuditSpec extends AnyFunSuite {

  test("top-level initial plan is dropped, final plan kept once") {
    val plan =
      """AdaptiveSparkPlan isFinalPlan=true
        |+- == Final Plan ==
        |   *(2) HashAggregate
        |   +- ShuffleQueryStage
        |      +- Exchange
        |         +- *(1) Scan parquet ReadSchema: struct<a:int>
        |+- == Initial Plan ==
        |   HashAggregate
        |   +- Exchange
        |      +- Scan parquet ReadSchema: struct<a:int>
        |""".stripMargin
    val out = PlanAudit.stripInitialPlans(plan)
    assert("ReadSchema".r.findAllIn(out).size === 1, out)
    assert(!out.contains("== Initial Plan =="))
    assert(out.contains("== Final Plan =="))
  }

  test("nested subquery initial plan does not truncate the enclosing final plan") {
    val plan =
      """AdaptiveSparkPlan isFinalPlan=true
        |+- == Final Plan ==
        |   *(3) Project
        |   :  +- Subquery subquery#1
        |   :     +- AdaptiveSparkPlan isFinalPlan=true
        |   :        +- == Final Plan ==
        |   :           *(1) HashAggregate
        |   :           +- Scan parquet ReadSchema: struct<x:int>
        |   :        +- == Initial Plan ==
        |   :           HashAggregate
        |   :           +- Scan parquet ReadSchema: struct<x:int>
        |   +- *(2) BroadcastHashJoin
        |      +- Scan parquet ReadSchema: struct<a:int>
        |+- == Initial Plan ==
        |   Project
        |   +- BroadcastHashJoin
        |      +- Scan parquet ReadSchema: struct<a:int>
        |""".stripMargin
    val out = PlanAudit.stripInitialPlans(plan)
    assert(!out.contains("== Initial Plan =="), out)
    // the two FINAL-plan scans survive (subquery's + main); both initial
    // copies are gone — prefix truncation would have dropped the main
    // BroadcastHashJoin and its scan entirely
    assert("ReadSchema".r.findAllIn(out).size === 2, out)
    assert(out.contains("BroadcastHashJoin"))
    assert("BroadcastHashJoin".r.findAllIn(out).size === 1, out)
  }

  test("a same-depth sibling branch after the marker is kept, not stripped") {
    // Hypothetical layout where the initial plan is NOT the last child:
    // the sibling `+- == Final Plan ==` sits at the marker's own depth.
    // The subtree root (space-indented) is stripped; the sibling branch
    // (its own `+- ` at that depth) resumes output.
    val plan =
      """AdaptiveSparkPlan isFinalPlan=true
        |+- == Initial Plan ==
        |   HashAggregate
        |   +- Exchange
        |      +- Scan parquet ReadSchema: struct<a:int>
        |+- == Final Plan ==
        |   *(2) HashAggregate
        |   +- ShuffleQueryStage
        |      +- Exchange
        |         +- *(1) Scan parquet ReadSchema: struct<a:int>
        |""".stripMargin
    val out = PlanAudit.stripInitialPlans(plan)
    assert(!out.contains("== Initial Plan =="), out)
    assert(out.contains("== Final Plan =="), out)
    assert("ReadSchema".r.findAllIn(out).size === 1, out)
    assert(out.contains("ShuffleQueryStage"), out)
  }
}
