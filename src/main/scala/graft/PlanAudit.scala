package graft

import org.apache.spark.sql.DataFrame

/** Plan auditor and SCALE GATE: per registered query, inspects the executed
  * physical plan for the properties that matter at scale — pushed filters,
  * read schema width, join strategies, whole-stage-codegen coverage — and
  * FAILS (non-zero exit; see [[audit]]) on any strategy that does not scale
  * unless it is explicitly whitelisted with a justification:
  *
  *   - CartesianProduct: never acceptable (O(n·m) with no bound).
  *   - BroadcastNestedLoopJoin: acceptable only where one side is known
  *     O(1)-row or the scan is the query's declared contract (q34 is the
  *     brute-force ground truth every ANN result is measured against).
  *
  * Every other built-in strategy (BroadcastHashJoin, SortMergeJoin,
  * ShuffledHashJoin) is scale-legitimate by construction — the audit prints
  * them for the record but never fails on them. The whitelist lives here,
  * in code, so a new BNLJ/cartesian anywhere else turns the round's audit
  * red instead of relying on a human re-adjudicating known-good entries
  * every round. PlanAuditGateSpec runs [[audit]] over the full registry at
  * sf0.001 inside `sbt test` and separately proves a planted cartesian is
  * caught.
  *
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {

  /** One non-whitelisted scale-killer strategy found in a query's plan, or
    * a query that could not be audited at all (`strategy` starts with
    * "BROKEN"; `detail` carries the first line of the error). Broken
    * queries are violations too — an unplannable query must not pass the
    * plan gate — but they render with their own cause, not the
    * "not whitelisted" wording, so 23 analysis failures read as 23 named
    * broken queries instead of one opaque stack trace for the suite.
    */
  final case class Violation(query: String, strategy: String, count: Int, detail: String = "") {
    override def toString: String =
      if (strategy.startsWith("BROKEN")) s"$query: $strategy — $detail"
      else s"$query: $strategy x$count (not whitelisted)"
  }

  /** Adjudicated exceptions: query -> (allowed strategy -> justification).
    * Kept deliberately narrow — a strategy allowed for one query says
    * nothing about the next one.
    */
  private[graft] val whitelist: Map[String, Map[String, String]] = Map(
    "q34_bruteforce_topk" -> Map(
      "BroadcastNestedLoopJoin" ->
        "declared brute-force ground truth: broadcast 5-query side x one corpus scan is the contract"
    ),
    "q62_tfidf" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast total (corpus doc count) joined onto per-term rows"
    ),
    "q69_unigram_logprob" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast total (corpus token mass) joined onto per-doc rows"
    ),
    "q70_mixture_plan" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row/dozens-row broadcast frames (global totals, binding-cap row) over the per-source aggregate"
    ),
    "q74_mixture_apply" -> Map(
      "BroadcastNestedLoopJoin" ->
        "inherits q70's plan stage (1-row broadcast totals/cap); the corpus-side join is a BHJ on source"
    ),
    "q75_pq_topk" -> Map(
      "BroadcastNestedLoopJoin" ->
        "the ADC pass is a declared exhaustive scan of the 4-byte CODE table (PQ's contract: compressed scan, no float math); re-rank is a BHJ on vec_id"
    ),
    "q77_corpus_build" -> Map(
      "BroadcastNestedLoopJoin" ->
        "inherits q70's plan stage (1-row broadcast totals/cap over the survivor counts); every corpus-side join is keyed (fp, sh_key, doc_id, source)"
    ),
    "q78_bigram_lm" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast total (vocabulary size V) joined onto per-doc rows — the q69 pattern; transition/context joins are keyed (bgk, w1k)"
    ),
    "q93_filtered_topk" -> Map(
      "BroadcastNestedLoopJoin" ->
        "q34's declared brute-force contract over the predicate-filtered corpus: broadcast 5-query side x one (pushed-filter) corpus scan"
    ),
    "q100_epoch_plan" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast totals (corpus token mass + source count) joined onto per-source rows — the q70 broadcast-scalar pattern"
    ),
    "q177_media_boilerplate" -> Map(
      "BroadcastNestedLoopJoin" ->
        "per kind three 1-row aggregates (fp stats, item count, affected count) cross-joined into one audit row — the q70 broadcast-scalar pattern; the hot-fp probe join is keyed on fp",
      "CartesianProduct" ->
        "same 1-row x 1-row combine when the planner picks the cartesian form"
    ),
    "q97_conversion_funnel" -> Map(
      "BroadcastNestedLoopJoin" ->
        "three 1-row step-count aggregates cross-joined into the single summary row — the q70 broadcast-scalar pattern",
      "CartesianProduct" ->
        "same 1-row x 1-row combine when the planner picks the cartesian form"
    ),
    "q103_bm25" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast corpus constants (N, avgdl, per-term df) joined onto per-doc stat rows — the q62 broadcast-scalar pattern"
    ),
    "q105_dsir_weights" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast histogram totals joined onto the <=64-row bucket frame — the q70 broadcast-scalar pattern; the corpus-side scoring join is keyed on bucket"
    ),
    "q109_temperature_mix" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast totals (corpus tokens + temperature mass) joined onto per-source rows — the q70/q100 broadcast-scalar pattern"
    ),
    "q147_doremi_weights" -> Map(
      "BroadcastNestedLoopJoin" ->
        "two 1-row broadcast scalars (corpus NLL/totals, softmax Z) joined onto per-source rows — the q70/q100 broadcast-scalar pattern; the corpus-side NLL join is keyed on doc_id (q69's plan)"
    ),
    "q157_fertility_drift" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast scalars (id range, corpus fertility totals) — the q137/q141 pattern; the corpus-side tokenize join is a BHJ on the word"
    ),
    "q158_data_budget_plan" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast totals (corpus tokens + temperature mass) onto per-source rows — the q109 broadcast-scalar pattern; the survivor/raw joins are keyed (fp+doc_id, source)"
    ),
    "q111_kn_trigram" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast scalar (N1+(··), the bigram-type total) joined onto per-trigram-type rows — the q70 broadcast-scalar pattern; every other join is keyed on word tuples"
    ),
    "q112_perplexity_buckets" -> Map(
      "BroadcastNestedLoopJoin" ->
        "inherits q111's plan stage (the 1-row N1+(··) broadcast); the tercile layer's joins are keyed on doc_id/lang"
    ),
    "q118_hybrid_rrf" -> Map(
      "BroadcastNestedLoopJoin" ->
        "inherits q103's 1-row corpus-constants broadcast, plus the 1-row PRF seed vector broadcast into the dense scan — the q34 brute-force contract on the dense side; the fusion join is a keyed full-outer over <=2*TOP_K rows"
    ),
    "q119_triplet_mining" -> Map(
      "BroadcastNestedLoopJoin" ->
        "q34's declared brute-force contract: broadcast |anchors| side x one corpus scan; the per-side argmax is a map-side-combined groupBy on the anchor key, no corpus window"
    ),
    "q120_retrieval_eval" -> Map(
      "BroadcastNestedLoopJoin" ->
        "inherits q118's plan stages (q103's 1-row corpus constants + the 1-row PRF seed), plus two more 1-row broadcasts (IDCG@10, n_rel) crossed onto the 3-row per-ranker aggregate — the q70 broadcast-scalar pattern"
    ),
    "q122_bm25_indexed" -> Map(
      "BroadcastNestedLoopJoin" ->
        "q103's 1-row broadcast corpus constants (n_docs, avgdl, per-term df from the probe) crossed onto the per-doc pivot rows — the q62 broadcast-scalar pattern; the corpus itself is never scanned (bucket-pruned postings probe)"
    ),
    "q123_corpus_topics" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast corpus total crossed onto the <=K cluster profile rows — the q70 broadcast-scalar pattern; assignment itself is a pure projection against K literal centroids (no join)"
    ),
    "q124_moore_lewis" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast vocabulary size V joined onto per-bigram-type rows — the q78 pattern; all count joins are keyed on xxhash64 token keys"
    ),
    "q128_source_drift" -> Map(
      "BroadcastNestedLoopJoin" ->
        "dense-grid construction over two BOUNDED frames (|sources| x 64 histogram buckets) plus the 1-row corpus total — all broadcast-sized by construction, never corpus-scaled"
    ),
    "q133_threshold_sweep" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast corpus token total crossed onto the 5-row tau grid — the q70 broadcast-scalar pattern; the pair supply is the declared-exact q32 family and every per-tau rollup is a keyed aggregate"
    ),
    "q136_knn_purity" -> Map(
      "BroadcastNestedLoopJoin" ->
        "q34's declared brute-force contract: broadcast all-anchors side x one corpus scan (IVF candidates replace it at 100 TB); top-5 is a window keyed per anchor, purity a keyed aggregate"
    ),
    "q137_ingest_saturation" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast id-range (min_id, max_id) joined onto per-doc rows (the q69 broadcast-scalar pattern) to derive the ingest bucket; both rollups are keyed aggregates and the cumulative window runs over <= 20 post-agg rows"
    ),
    "q139_length_buckets" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast global-max token count crossed onto the <= ~40 length-bucket aggregate rows — the q70 broadcast-scalar pattern"
    ),
    "q141_embedding_drift" -> Map(
      "BroadcastNestedLoopJoin" ->
        "two 1-row broadcast scalars (vec_id range onto per-vector rows to derive the ingest bucket; corpus-norm onto the <= 20-row bucket rollup) — the q69 broadcast-scalar pattern; the only corpus-scale stage is the (bucket, pos) keyed aggregate"
    ),
    "q168_source_health" -> Map(
      "BroadcastNestedLoopJoin" ->
        "inherits q128's plan stages (the dense |sources|x64 grid over two bounded frames + the 1-row corpus total) — all broadcast-sized by construction; the scorecard assembly joins are keyed on source"
    ),
    "q173_mixture_concentration" -> Map(
      "BroadcastNestedLoopJoin" ->
        "1-row broadcast totals (corpus tokens + source count) crossed onto the |sources|-row aggregate — the q70/q100 broadcast-scalar pattern"
    ),
    "q167_unimax_plan" -> Map(
      "BroadcastNestedLoopJoin" ->
        "three 1-row broadcast scalars (corpus totals, the cap/uniform boundary rank, the capped prefix mass) crossed onto the |langs|-row aggregate — the q70/q100 broadcast-scalar pattern; the only corpus-scale stage is the per-lang aggregate"
    )
  )

  /** Strategies that fail the audit when not whitelisted for the query. */
  private val gated = Seq("CartesianProduct", "BroadcastNestedLoopJoin")

  /** Remove every "== Initial Plan ==" block from a printed physical plan.
    * A block = the marker line plus the subtree printed under it: lines
    * whose tree-prefix (spaces / ':' / '+' / '-') is strictly deeper, plus
    * the subtree's ROOT line at the marker's own depth — distinguishable
    * from a same-depth SIBLING node because the root is indented under the
    * `+- ` marker with spaces (prefix ends "   ") while a sibling is its
    * own branch (prefix ends "- "). Today the initial plan is always the
    * LAST child of its AdaptiveSparkPlan node so the sibling case never
    * fires, but if Spark's layout ever reorders the sections this keeps
    * the following same-depth branch instead of silently over-stripping.
    * [[auditPlan]] additionally guards that a stripped plan keeps at least
    * one node.
    */
  private[graft] def stripInitialPlans(full: String): String = {
    def prefixLen(l: String): Int = {
      val i = l.indexWhere(c => c != ' ' && c != ':' && c != '+' && c != '-')
      if (i == -1) l.length else i
    }
    // a line whose content starts a new branch at depth d (prefix "+- " /
    // ":- ") rather than continuing the block opened above it
    def isBranch(l: String, d: Int): Boolean = d >= 2 && l.charAt(d - 2) == '-'
    val out = new StringBuilder
    var skipDepth = -1
    full.linesIterator.foreach { line =>
      val d = prefixLen(line)
      if (skipDepth >= 0 && (d < skipDepth || (d == skipDepth && isBranch(line, d))))
        skipDepth = -1
      if (skipDepth < 0) {
        if (line.contains("== Initial Plan ==")) skipDepth = d
        else out.append(line).append('\n')
      }
    }
    out.toString
  }

  /** Audit facts extracted from one executed plan. */
  final case class PlanFacts(
      scans: Seq[Int], // column count per parquet scan
      pushed: Seq[String], // pushed-filter list per scan
      joins: Seq[(String, Int)], // strategy -> occurrence count
      codegenSpans: Int,
      violations: Seq[Violation]
  )

  /** Execute `df`'s plan (toRdd.count touches every partition without
    * collecting rows — under AQE the final per-stage plans only exist after
    * execution) and extract the audit facts, including gate violations.
    */
  private[graft] def auditPlan(name: String, df: DataFrame): PlanFacts = {
    df.queryExecution.toRdd.count()
    // An executed AdaptiveSparkPlan prints the FINAL plan followed by an
    // "== Initial Plan ==" copy of the pre-AQE one (possibly NESTED inside
    // adaptive subquery subtrees): strip each such block or every scan/join
    // counts twice — including joins AQE planned away, which would
    // false-positive the gate (an initial-plan SMJ that executed as a BHJ).
    val full = df.queryExecution.executedPlan.toString
    val plan = stripInitialPlans(full)
    require(
      plan.linesIterator.exists(_.trim.nonEmpty),
      s"$name: initial-plan stripping consumed the whole plan — layout change? raw:\n$full"
    )
    val scans = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(plan).map(_.group(1).split(",").length).toSeq
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    val joins =
      Seq("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin", "ShuffledHashJoin", "CartesianProduct")
        .map(j => j -> j.r.findAllIn(plan).size)
        .filter(_._2 > 0)
    val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
    val allowed = whitelist.getOrElse(name, Map.empty)
    val violations = joins.collect {
      case (j, n) if gated.contains(j) && !allowed.contains(j) => Violation(name, j, n)
    }
    PlanFacts(scans, pushed, joins, codegenSpans, violations)
  }

  /** First line of an error message, for one-line broken-query reporting. */
  private def firstLine(e: Throwable): String =
    String.valueOf(e.getMessage).linesIterator.find(_.trim.nonEmpty).getOrElse(e.getClass.getSimpleName).trim

  /** Classify a query failure for the gate report: analysis failures (the
    * query doesn't even resolve — wrong column type/name, bad SQL) are
    * called out as "BROKEN (analysis)" so a driver-side data-contract
    * change reads as exactly that; anything else carries its exception
    * class. Analysis errors can surface wrapped (e.g. inside a
    * SparkException from a forked planner thread), so walk the cause chain.
    */
  private[graft] def brokenViolation(name: String, e: Throwable): Violation = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val analysis = chain.collectFirst { case a: org.apache.spark.sql.AnalysisException => a }
    analysis match {
      case Some(a) => Violation(name, "BROKEN (analysis)", 1, firstLine(a))
      case None    => Violation(name, s"BROKEN (${e.getClass.getSimpleName})", 1, firstLine(e))
    }
  }

  /** Run the gate over every registered query: the returned violations are
    * empty iff the round's plans are scale-clean. Queries that FAIL to run
    * are reported as violations too — an unplannable query must not pass
    * the plan gate.
    */
  def audit(spark: org.apache.spark.sql.SparkSession, sfDir: String, verbose: Boolean = false): Seq[Violation] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val f = auditPlan(name, fn(spark, sfDir))
        if (verbose) {
          println(s"== $name")
          f.scans.zipWithIndex.foreach { case (cols, i) =>
            println(s"   scan$i: $cols cols" + (if (f.pushed.lift(i).exists(_.nonEmpty)) s" pushed=[${f.pushed(i)}]" else ""))
          }
          if (f.joins.nonEmpty) println(s"   joins: ${f.joins.map { case (k, v) => s"$k x$v" }.mkString(", ")}")
          val waived = whitelist.getOrElse(name, Map.empty)
          f.joins.collect { case (j, _) if waived.contains(j) => println(s"   whitelisted: $j — ${waived(j)}") }
          println(s"   codegen spans: ${f.codegenSpans}")
        }
        f.violations
      } catch {
        case e: Throwable =>
          val v = brokenViolation(name, e)
          println(s"== $v")
          Seq(v)
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = core.Sessions.local("graft-plan-audit")
    val violations = audit(spark, sfDir, verbose = true)
    spark.stop()
    if (violations.nonEmpty) {
      System.err.println(s"[plan-audit] ${violations.size} violation(s):")
      violations.foreach(v => System.err.println(s"[plan-audit]   $v"))
      sys.exit(1)
    }
    println("[plan-audit] clean: no non-whitelisted BNLJ/cartesian across the registry")
  }
}
