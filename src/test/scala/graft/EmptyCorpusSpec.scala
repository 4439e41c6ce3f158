package graft

import org.apache.spark.sql.functions._

/** The EMPTY-corpus contract, pinned for the whole registry: every
  * registered query must RUN on a corpus of empty (schema-only) tables and
  * agree with its DuckDB oracle's behavior there — the r13 verdict's
  * "engine emits 0 rows where the oracle fabricates 1 NULL row" class of
  * divergence, closed from both sides:
  *
  *   - group-less/rollup phantom rows: q16/q17 (SQL ROLLUP/CUBE emit a
  *     grand total over zero rows, Spark's Expand+agg does not — the
  *     oracles carry HAVING count(*) > 0), q173 (oracle aggregate grouped
  *     to match the engine's groupBy).
  *   - driver-loop guards: q123/q129 (no seeds -> no Lloyd), q159/q160/
  *     q164 (no examples -> no training run, init weights downstream),
  *     q165 (no text -> no checkpoints; oracle carries the same WHERE),
  *     q171 (no points -> no picks).
  *   - ANSI zero-denominator guards (the q151 CASE discipline): q97's
  *     funnel rates, q122's avgdl, q153's violation_frac.
  *
  * Emptiness is reached by a driver regeneration or a future probe, not by
  * the current gates (sf0.01/sf0.1 corpora are never empty) — this spec is
  * what keeps the contract from silently rotting until then. The 11
  * no-oracle ANN/hash selfchecks are NOT exercised here: a recall metric
  * over zero vectors is undefined by declaration (gated at sf0.01 only).
  */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("empty_corpus").toString
    val tables = Seq(
      "region",
      "nation",
      "customer",
      "supplier",
      "part",
      "orders",
      "lineitem",
      "events",
      "documents",
      "embeddings"
    )
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query runs on an empty corpus (no throw, bounded output)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).collect(); None
      } catch { case e: Throwable => Some(s"$name: ${e.toString.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"queries crashing on the empty corpus:\n${failures.mkString("\n")}")
  }

  test("phantom-row contracts: rollup/cube/concentration emit 0 rows, funnel/constraint audits their declared shapes") {
    for (q <- Seq("q16_rollup", "q17_cube", "q173_mixture_concentration", "q159_quality_train", "q165_tokenizer_budget", "q171_coreset_select", "q123_corpus_topics", "q129_embedding_outliers", "q160_quality_train_auc", "q164_quality_apply"))
      assert(SparkEntry.queries(q)(spark, emptyDir).count() === 0L, s"$q must emit 0 rows on empty")

    // the funnel is a legal 1-row zero state: counts 0, rates NULL (CASE
    // guard — ANSI division would have thrown)
    val funnel = SparkEntry.queries("q97_conversion_funnel")(spark, emptyDir).collect()
    assert(funnel.length === 1)
    assert(funnel(0).getAs[Long]("n_view") === 0L && funnel(0).isNullAt(funnel(0).fieldIndex("rate_click")))

    // the constraint battery audits 0 rows: every constraint trivially
    // passes with 0 violations and a NULL fraction
    val audit = SparkEntry.queries("q153_constraint_audit")(spark, emptyDir).collect()
    assert(audit.length === 7)
    audit.foreach { r =>
      assert(r.getAs[Long]("n_violations") === 0L && r.getAs[String]("verdict") === "pass")
      assert(r.isNullAt(r.fieldIndex("violation_frac")))
    }
  }
}
