package graft

/** Registry-wide smoke: the driver contract (SparkEntry) is only exercised
  * by the out-of-band Verify/Bench/PlanAudit mains, so a query broken by a
  * refactor outside its own spec would otherwise first surface at gate
  * time. This executes EVERY registered query end-to-end at sf0.001
  * (noop sink — full plan, no collected rows) and pins the
  * queries/oracleSql contract invariants the gate depends on.
  */
class SparkEntrySpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assert(df.schema.nonEmpty, s"$name: empty schema")
        df.write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable => Some(s"$name: ${e.toString.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }

  test("oracle map invariants: every oracle has a query, non-empty SQL, unique qNN prefixes") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle entry without a registered query: $name")
      assert(sql.trim.nonEmpty, s"empty oracle SQL: $name")
    }
    // Bench's compact JSON keys are the qNN prefixes — a duplicate prefix
    // would silently collapse two queries into one reported number
    val prefixes = qs.toSeq.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size === prefixes.size, "duplicate qNN prefix in the registry")
  }
}
