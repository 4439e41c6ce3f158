package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench line's one hard contract: the driver keeps only the LAST
  * ~2000 chars of process output (with ~100 chars of sbt epilogue landing
  * AFTER the line), so the whole line must fit or its head is silently
  * truncated — exactly what happened to the r3 and r11 artifacts. Pin the
  * budget at a future-proof registry size and worst-case-ish values.
  */
class BenchLineSpec extends AnyFunSuite {

  private val TailWindow = 2000
  private val SbtEpilogue = 100 // "\n[success] Total time: ...\n" and slack

  private def syntheticLine(nQueries: Int): String = {
    // REALISTIC values, not convenient ones: round 12's real line broke
    // while the old synthetic test passed, because realistic sub-second
    // medians ("0.42", 4 chars) render LONGER than the old worst-case
    // 12.345 ("12", 2 chars) — so most entries here are sub-second, with a
    // two-digit tail like a real run's expensive queries
    val queries = (1 to nQueries).map { i =>
      val v = if (i % 20 == 0) 12.345 else if (i % 5 == 0) 1.234 else 0.417
      f"q$i%03d_some_operator_name" -> v
    }
    Bench.renderLine(
      total = 1234.567,
      nRunnable = nQueries,
      nFailed = 0,
      planViolations = 0,
      calStart = 0.345,
      calEnd = 0.333,
      calBlockMax = 0.412,
      queries = queries,
      failed = Seq.empty,
      sfDir = "/root/testdata/sf0.1"
    )
  }

  test("line is registry-size-independent: 300 realistic queries fit the tail window with generous headroom") {
    val line = syntheticLine(300)
    assert(
      line.length <= TailWindow - SbtEpilogue - 100,
      s"bench line is ${line.length} chars — over the ${TailWindow - SbtEpilogue - 100} budget; " +
        "the driver keeps only the LAST 2000 chars (r12's artifact parsed to null when the head was cut)"
    )
    // growing the registry must not grow the line: top-K is a constant
    // (small variance allowed — WHICH values land in the top-K changes
    // entry widths — but nothing anywhere near per-entry linear growth)
    assert(math.abs(syntheticLine(300).length - syntheticLine(200).length) <= 60, "line must not scale with registry size")
    info(s"300-query line: ${line.length} chars (budget ${TailWindow - SbtEpilogue - 100})")
  }

  test("line at the CURRENT registry size fits with generous headroom") {
    val line = syntheticLine(SparkEntry.queries.size)
    assert(line.length <= TailWindow - SbtEpilogue - 100, s"line is ${line.length} chars — headroom gone")
  }

  test("top-K selection: the most expensive queries ride the line; the omitted mass keeps the total auditable") {
    val line = syntheticLine(300)
    // the 15 i%20==0 queries at 12.345 and the 60-15 = next-most-expensive
    // 1.234 entries are the line's population; every 0.417 entry is omitted
    assert(line.contains("\"q020\":12"), "expensive queries must ride the line")
    assert(!line.contains(":0.42"), "cheap queries must be omitted, not inlined")
    assert(line.contains("\"q_omitted\":240"), s"omitted count must be exact: $line")
    // omitted mass = 240 entries at 0.417 s = 100.080
    assert(line.contains("\"q_omitted_s\":100.080"), line)
    // and a small registry still carries EVERY query with no omission keys
    val small = syntheticLine(40)
    assert(!small.contains("q_omitted"))
    assert(small.contains("\"q001\":"))
  }

  test("floor suspects: flags only committed-floor breaches, tiered factor, most expensive first, capped, new queries exempt") {
    val floors = Map("q1_a" -> 1.0, "q2_b" -> 0.5, "q3_c" -> 2.0, "q5_zero" -> 0.0, "q7_big" -> 1.88)
    val kept = Seq(
      "q1_a" -> 2.4, // floor 1.0 (not > 1 s): 2.5x tier, 2.4x — must NOT flag
      "q2_b" -> 1.3, // 2.6x a sub-second floor — flags
      "q3_c" -> 8.0, // 4x floor — flags, and is the most expensive
      "q4_new" -> 99.0, // no committed floor (new this round) — exempt
      "q5_zero" -> 9.0, // floor 0 (degenerate) — exempt, no divide-by-zero flagging
      "q6_fail" -> -1.0, // failed query — exempt
      "q7_big" -> 4.5 // the r15 q155 case: 2.42x a 1.88 s floor — the 1.5x tier MUST flag it
    )
    val got = Bench.floorSuspects(kept, floors, Bench.floorFactor, 30)
    assert(got === Seq("q3_c", "q7_big", "q2_b"), "exactly the three breaches, largest median first")
    assert(Bench.floorSuspects(kept, floors, Bench.floorFactor, 1) === Seq("q3_c"), "cap keeps the most expensive")
    assert(Bench.floorSuspects(kept, Map.empty, Bench.floorFactor, 30).isEmpty, "no floors file -> layer disarms")
    assert(Bench.floorFactor(0.9) === 2.5 && Bench.floorFactor(1.01) === 1.5, "the tier boundary is 1 s")
  }

  test("committed bench_floors.json parses and covers the prior-round registry") {
    val floors = Bench.loadFloors("bench_floors.json")
    assert(floors.nonEmpty, "committed floors must load (refresh from bench_floors_candidate.json each round)")
    assert(floors.values.forall(v => v > 0 && v < 300), "floors are per-query seconds, sane range")
    // every floor key is a registered query (a renamed query would leave a
    // stale floor that can never fire); new queries may lack floors until
    // the next refresh, so the subset runs in THIS direction only
    val unknown = floors.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale floor keys for unregistered queries: $unknown")
  }

  test("floors loader survives a missing file") {
    assert(Bench.loadFloors("/nonexistent/bench_floors.json").isEmpty)
  }

  test("line is valid JSON with the driver-contract fields") {
    val line = syntheticLine(117)
    // minimal structural checks without a JSON lib: balanced braces, the
    // contract keys present, one line
    assert(!line.contains("\n"))
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    Seq("\"unit\":\"sec\"", "\"queries\":{", "\"sf\":", "\"calibration\":{", "\"plan_violations\":")
      .foreach(k => assert(line.contains(k), s"missing $k"))
    assert(line.count(_ == '{') === line.count(_ == '}'))
    // short keys only: the qNNN prefix, never the full operator name
    assert(!line.contains("some_operator_name"))
  }
}
