package graft

/** Plan auditor: prints, per registered query, the physical-plan properties
  * that matter at scale — pushed filters, read schema width, join
  * strategies, whole-stage-codegen coverage. Run:
  *   sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {

  /** Remove every "== Initial Plan ==" block from a printed physical plan.
    * A block = the marker line plus the following lines whose tree-prefix
    * (spaces / ':' / '+' / '-') is at least as long as the marker's — i.e.
    * the subtree printed under it. The initial plan is always the LAST
    * inner child of its AdaptiveSparkPlan node, so the first shallower line
    * is the enclosing plan's continuation and is kept.
    */
  private[graft] def stripInitialPlans(full: String): String = {
    def prefixLen(l: String): Int = {
      val i = l.indexWhere(c => c != ' ' && c != ':' && c != '+' && c != '-')
      if (i == -1) l.length else i
    }
    val out = new StringBuilder
    var skipDepth = -1
    full.linesIterator.foreach { line =>
      val d = prefixLen(line)
      if (skipDepth >= 0 && d < skipDepth) skipDepth = -1
      if (skipDepth < 0) {
        if (line.contains("== Initial Plan ==")) skipDepth = d
        else out.append(line).append('\n')
      }
    }
    out.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = core.Sessions.local("graft-plan-audit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Execute THIS QueryExecution first (toRdd.count touches every
        // partition without collecting rows): under AQE the pre-execution
        // plan string shows no WholeStageCodegen markers at all — they only
        // exist in the finalized per-stage plans — so auditing the unexecuted
        // plan silently reports zero codegen coverage. (A noop-sink write
        // would NOT work: .write builds a fresh QueryExecution and the
        // original would stay unexecuted.)
        df.queryExecution.toRdd.count()
        // An executed AdaptiveSparkPlan prints the FINAL plan followed by a
        // "== Initial Plan ==" copy of the pre-AQE one: drop each initial
        // section, or every scan/join in a single-scan query counts twice.
        // Markers can also appear NESTED (adaptive subquery subtrees print
        // their own Initial Plan mid-tree), so prefix-truncating at the
        // first marker would cut off the rest of the main final plan:
        // instead skip each marker's SUBTREE — the lines that follow it at
        // the same-or-deeper tree indentation — and resume at the first
        // shallower line, which belongs to the enclosing final plan.
        val full = df.queryExecution.executedPlan.toString
        val plan = stripInitialPlans(full)
        if (sys.env.contains("PLAN_AUDIT_DEBUG")) println(plan.linesIterator.take(40).mkString("\n"))
        val scans = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
        val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan).map(_.group(1)).toSeq
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin", "ShuffledHashJoin")
          .map(j => j -> j.r.findAllIn(plan).size)
          .filter(_._2 > 0)
        // codegen stage markers appear as "*(n)" prefixes in the simple plan
        // string (AQE shows the pre-execution plan, so count distinct ids)
        val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(s"== $name")
        scans.zipWithIndex.foreach { case (s, i) =>
          val cols = s.split(",").length
          println(s"   scan$i: $cols cols" + (if (pushed.lift(i).exists(_.nonEmpty)) s" pushed=[${pushed(i)}]" else ""))
        }
        if (joins.nonEmpty) println(s"   joins: ${joins.map { case (k, v) => s"$k x$v" }.mkString(", ")}")
        println(s"   codegen spans: $codegenSpans")
      } catch {
        case e: Throwable => println(s"== $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
