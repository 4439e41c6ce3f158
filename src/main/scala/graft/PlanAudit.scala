package graft

/** Plan auditor: prints, per registered query, the physical-plan properties
  * that matter at scale — pushed filters, read schema width, join
  * strategies, whole-stage-codegen coverage. Run:
  *   sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
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
        // "== Initial Plan ==" copy of the pre-AQE one: keep only the final
        // section, or every scan/join in a single-scan query counts twice.
        val full = df.queryExecution.executedPlan.toString
        val plan = full.indexOf("== Initial Plan ==") match {
          case -1 => full
          case i  => full.substring(0, i)
        }
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
