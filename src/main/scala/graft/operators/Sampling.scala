package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sampling and dataset-split operators — the selection half of a
  * training-data pipeline (the reference has none; a 100 TB corpus engine
  * needs reproducible subsetting).
  *
  * Two distinct tools:
  *   - `sampleBy` (q48): per-stratum Bernoulli sampling — statistical, seeded,
  *     engine-specific RNG → validated by proportion envelope, not an oracle.
  *   - hash-split (q49): DETERMINISTIC content-addressed splits via md5 —
  *     every engine that computes md5 agrees forever on which row is
  *     train/test. This is the correct tool for split assignment (a re-run,
  *     a different engine, a different day: same split), while sampleBy is
  *     for downsampling mass.
  */
object Sampling {

  // ---------------------------------------------------------------------------
  // q48 — stratified sampling: 50%/10% per event type via sampleBy with a
  // fixed seed. Per-row Bernoulli draw — no shuffle; the aggregate just
  // summarizes what survived. The draw is engine-specific RNG, so the
  // registered output is the ORACLE-CHECKABLE envelope form: exact stratum
  // totals, the target fraction, and a verdict that the sampled fraction
  // sits within 5 binomial sigmas of target — DuckDB reproduces
  // n_total/target_frac and pins `1` for the verdict, hash-gating the
  // sampler's statistical contract. Raw sampled counts stay visible to the
  // spec via q48Sample.
  // ---------------------------------------------------------------------------
  private val q48Fractions =
    Map("click" -> 0.5, "view" -> 0.5, "purchase" -> 0.1, "signup" -> 0.1, "error" -> 0.1)

  /** Sampled counts per stratum (the RNG output — spec-checked shape). */
  def q48Sample(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .stat
      .sampleBy("event_type", q48Fractions, seed = 42L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"))

  def q48StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val targets = q48Fractions.toSeq.toDF("event_type", "target_frac")
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"))
      .join(broadcast(targets), Seq("event_type"))
      // LEFT join + coalesce 0: a stratum whose seeded draw returns zero
      // rows has no q48Sample row but must still appear (and fail/pass the
      // envelope on its merits) — an inner join would silently drop it and
      // desync the row count from the oracle. The five-type domain the
      // targets join assumes is pinned by TablesSpec, so no stratum is
      // dropped on the targets side either.
      .join(broadcast(q48Sample(spark, dir)), Seq("event_type"), "left")
      .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
      .select(
        col("event_type"),
        col("n_total"),
        col("target_frac"),
        // 5-sigma binomial envelope: |n_sampled/n - p| <= 5*sqrt(p(1-p)/n)
        (abs(col("n_sampled") / col("n_total") - col("target_frac")) <=
          lit(5.0) * sqrt(col("target_frac") * (lit(1.0) - col("target_frac")) / col("n_total")))
          .cast("int")
          .as("frac_ok")
      )
      .orderBy(col("event_type"))
  }

  val q48Oracle: String =
    """SELECT event_type,
      |       count(*) AS n_total,
      |       CASE WHEN event_type IN ('click', 'view') THEN 0.5::DOUBLE ELSE 0.1::DOUBLE END AS target_frac,
      |       1 AS frac_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q49 — deterministic train/validation/test split: bucket = first 2 hex
  // chars of md5(doc_id) (256 buckets) → 80/10/10. Pure per-row expression,
  // engine-agnostic (md5 is md5 everywhere) → fully oracle-checked.
  // ---------------------------------------------------------------------------
  /** 256-bucket boundaries of the 80/10/10 split — the ONE place the
    * fractions live: q49's doc-level split, q106/q107's group-level split
    * (Dedup.splitFrom), and the q107 selfcheck all throw this same coin, so
    * a re-balance here cannot silently desync them.
    */
  val SPLIT_TRAIN_LT = 205
  val SPLIT_VALIDATION_LT = 230

  /** The md5 split coin on any key column (cast to its string form). */
  private[graft] def hashSplitBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  private[graft] def hashSplitCoin(key: Column): Column = {
    val b = hashSplitBucket(key)
    when(b < SPLIT_TRAIN_LT, "train").when(b < SPLIT_VALIDATION_LT, "validation").otherwise("test")
  }

  def q49HashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .withColumn("bucket", hashSplitBucket(col("doc_id")))
      .withColumn(
        "split",
        when(col("bucket") < SPLIT_TRAIN_LT, "train").when(col("bucket") < SPLIT_VALIDATION_LT, "validation").otherwise("test")
      )
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id")
      )
      .orderBy(col("split"))

  val q49Oracle: String =
    """WITH b AS (
      |  SELECT doc_id, n_chars,
      |         CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT AS INT) AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 205 THEN 'train'
      |            WHEN bucket < 230 THEN 'validation'
      |            ELSE 'test' END AS split,
      |       count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       min(doc_id) AS min_doc_id
      |FROM b
      |GROUP BY 1
      |ORDER BY split""".stripMargin

  // ---------------------------------------------------------------------------
  // q51 — deterministic per-group sample via a typed custom Aggregator
  // (graft.functions.BottomKSketch): the k docs with smallest md5 per lang.
  // Content-addressed → reproducible anywhere md5 exists (fully
  // oracle-checked); O(k) state per group regardless of group size.
  // ---------------------------------------------------------------------------
  final case class LangDoc(lang: String, sortKey: String, id: Long)

  def q51BottomKSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sketch = graft.functions.BottomKSketch
      .aggregator[LangDoc](5)(_.sortKey, _.id)
      .toColumn
    Tables
      .documents(spark, dir)
      .select(
        col("lang"),
        md5(col("doc_id").cast("string")).as("sortKey"),
        col("doc_id").as("id")
      )
      .as[LangDoc]
      .groupByKey(_.lang)
      .agg(sketch.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"), explode(col("sample")).as("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  val q51Oracle: String =
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id,
      |         row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR)) AS rn
      |  FROM documents)
      |WHERE rn <= 5
      |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q130 — per-source quality cap (the RefinedWeb/C4 per-domain cap): keep
  // at most CAP docs per source, ranked by q26's quality score. Unchecked,
  // one over-represented crawl domain dominates the mixture no matter what
  // the source-level plan (q70/q109) says — the cap is the doc-level
  // enforcement those plans assume. Output is the full per-doc verdict
  // (rank + kept flag), the form the corpus-build join consumes.
  //
  // Determinism: the rank orders by (quality_score DESC, doc_id) — q26's
  // oracle-shared arithmetic plus a total tiebreak, so both engines agree
  // on every rank, not just the kept set.
  //
  // Scale shape: one scan + one hash-partitioned window keyed by source
  // (sort-based, streaming row_number — no per-group memory). A mega-source
  // serializes its partition's sort into one task; when emitting only the
  // kept rows at 100 TB, pre-prune with a per-source percentile_approx
  // score threshold (keep ~2×CAP survivors), then rank the survivors —
  // the full-verdict form here is the oracle-gated contract.
  // ---------------------------------------------------------------------------
  val SOURCE_CAP = 15

  def q130SourceCap(spark: SparkSession, dir: String): DataFrame =
    Tables
      .balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), TextOps.q26ScoreCol.as("quality_score"))
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))
            .orderBy(col("quality_score").desc, col("doc_id"))
        )
      )
      .withColumn("kept", when(col("rk") <= SOURCE_CAP, 1).otherwise(0))
      .orderBy(col("doc_id"))

  val q130Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         ${TextOps.q26ScoreSql} AS quality_score
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source, quality_score,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS INT) AS rk
       |  FROM t)
       |SELECT doc_id, source, quality_score, rk,
       |       CAST(CASE WHEN rk <= $SOURCE_CAP THEN 1 ELSE 0 END AS INT) AS kept
       |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q169 — quality-PRUNING sweep (Sorscher et al. 2022, "Beyond neural
  // scaling laws": with abundant data, aggressive pruning to the
  // highest-quality fraction beats training on everything): per source and
  // keep-fraction f ∈ {20..100}%, what keeping only the top-f% by the q26
  // quality score costs (token mass) and buys (mean kept score, the score
  // at the cutoff) — the prune-depth decision curve a curator reads before
  // fixing q130's CAP or q77's rule floor. Complements the threshold
  // sweeps already shipped (q133 sweeps the DEDUP tau, q80 floors by
  // percentile): this sweeps the quality axis itself.
  //
  // Determinism: ranks order by (score DESC, doc_id) — q26's oracle-shared
  // arithmetic with a total tiebreak (the q130 contract); the kept
  // predicate is CROSS-MULTIPLIED (rk·100 <= f·n_src, no division decides
  // a boundary), so kept@f has exactly floor(f·n/100) docs in both
  // engines; the 6dp score's micro integer is recovered exactly via the
  // shared floor(x*1e6+5e-1) before any sum (the q168 recovery rule).
  //
  // Scale shape: one scan + ONE source-keyed window pass (row_number and
  // the per-source count share the same partitioning — one exchange), a
  // 5-element literal explode (a Generate, never a join), one keyed
  // aggregate onto |sources|×5 rows. The q130 pre-prune note applies
  // verbatim at 100 TB.
  // ---------------------------------------------------------------------------
  private[operators] val PRUNE_GRID = Seq(20, 40, 60, 80, 100)

  def q169PruningSweep(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    Tables
      .balanced(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        col("source"),
        size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).cast("long").as("n_toks"),
        TextOps.q26ScoreCol.as("score")
      )
      .withColumn("rk", row_number().over(bySrc.orderBy(col("score").desc, col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(bySrc))
      .withColumn("f", explode(expr(s"array(${PRUNE_GRID.mkString(", ")})")))
      .filter(col("rk") * lit(100) <= col("f") * col("n_src"))
      .withColumn("score_micro", expr("CAST(floor(score * 1e6 + 5e-1) AS BIGINT)"))
      .groupBy(col("source"), col("f"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_toks")).as("kept_tokens"),
        sum(col("score_micro")).as("sum_micro"),
        min(col("score_micro")).as("cut_micro")
      )
      .select(
        col("source"),
        col("f").as("keep_pct"),
        col("n_kept"),
        col("kept_tokens"),
        expr("floor(CAST(sum_micro AS double) / n_kept + 5e-1) / 1e6").as("mean_score"),
        (col("cut_micro") / lit(1e6)).as("cutoff_score")
      )
      .orderBy(col("source"), col("keep_pct"))
  }

  val q169Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_toks,
       |         ${TextOps.q26ScoreSql} AS score
       |  FROM documents),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rk,
       |         count(*) OVER (PARTITION BY source) AS n_src
       |  FROM t),
       |g AS (SELECT unnest([${PRUNE_GRID.mkString(", ")}]) AS f),
       |k AS (
       |  SELECT r.source, g.f, r.n_toks, CAST(floor(r.score * 1e6 + 5e-1) AS BIGINT) AS score_micro
       |  FROM r CROSS JOIN g
       |  WHERE r.rk * 100 <= g.f * r.n_src)
       |SELECT source, CAST(f AS INT) AS keep_pct, CAST(count(*) AS BIGINT) AS n_kept,
       |       CAST(sum(n_toks) AS BIGINT) AS kept_tokens,
       |       floor(CAST(sum(score_micro) AS DOUBLE) / count(*) + 5e-1) / 1e6 AS mean_score,
       |       min(score_micro) / 1e6 AS cutoff_score
       |FROM k GROUP BY 1, 2 ORDER BY source, keep_pct""".stripMargin

  // ---------------------------------------------------------------------------
  // q145 — quality-WEIGHTED sampling without replacement (Efraimidis &
  // Spirakis 2006, A-Res): per language keep the SAMPLE_K docs with the
  // largest key u^(1/w) — equivalently ln(u)/w, rank-identical and
  // numerically tamer — where u is a per-doc uniform and w the q26 quality
  // score. This is the standard one-pass reservoir scheme for "sample the
  // corpus proportional to quality": inclusion odds scale with w, yet the
  // draw is exactly without replacement, and the key is a pure per-row
  // projection so the sample is reproducible anywhere the hash exists —
  // unlike rand()-seeded samplers, re-running on a re-partitioned corpus
  // returns byte-identical picks. Complements q48 (uniform stratified),
  // q51 (unweighted bottom-k) and q130 (hard top-by-score cap): A-Res keeps
  // a stochastic mix biased toward quality instead of deterministically
  // clipping everything below a rank.
  //
  // Engine-exactness: u = (first 12 md5 hex of a salted doc_id + 1) /
  // (16^12 + 1) in (0,1); the key is floored to integer micros via ONE
  // expression string shared with the oracle (ln agreement between engines
  // is already load-bearing in q84/q111), and the rank orders by
  // (key_micro DESC, doc_id) — a total order both engines replay.
  //
  // Scale shape: one scan + one per-lang window (sort-based streaming
  // row_number, the q130 plan). At 100 TB, pre-prune with a per-lang
  // approx-quantile key threshold (keep ~2×K survivors) before ranking —
  // same note as q130; the full-rank form here is the oracle-gated
  // contract.
  // ---------------------------------------------------------------------------
  val SAMPLE_K = 25

  /** The A-Res keyed frame over ANY (doc_id, lang, text, n_chars) docs —
    * keys are per-doc deterministic projections, so the streaming
    * maintainer keys each delta with the same code and top-K merges
    * losslessly (max-mergeability: topK(A ∪ B) = topK(topK(A) ∪ topK(B))).
    */
  private[graft] def aresKeyed(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), TextOps.q26ScoreCol.as("weight"))
      .withColumn(
        "h",
        conv(substring(md5(concat(lit("ws:"), col("doc_id").cast("string"))), 1, 12), 16, 10).cast("bigint")
      )
      .withColumn("key_micro", expr("CAST(floor(ln((h + 1) / 281474976710657e0) / weight * 1e6 + 5e-1) AS BIGINT)"))
      .select(col("doc_id"), col("lang"), col("weight"), col("key_micro"))

  /** Per-lang top-K selection + ranking over any keyed frame — q145's tail,
    * shared with the streaming maintainer's slice prune and serve path.
    */
  private[graft] def aresTopK(keyed: DataFrame): DataFrame =
    keyed
      .withColumn(
        "rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"))
            .orderBy(col("key_micro").desc, col("doc_id"))
        ).cast("long")
      )
      .filter(col("rank") <= SAMPLE_K)

  def q145WeightedSample(spark: SparkSession, dir: String): DataFrame =
    aresTopK(aresKeyed(Tables.balanced(Tables.documents(spark, dir))))
      .select(
        col("lang"),
        col("rank"),
        col("doc_id"),
        col("weight"),
        (col("key_micro") / lit(1e6)).as("sample_key")
      )
      .orderBy(col("lang"), col("rank"))

  val q145Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, ${TextOps.q26ScoreSql} AS weight
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, lang, weight,
       |         CAST(floor(ln((('0x' || substring(md5('ws:' || doc_id::VARCHAR), 1, 12))::BIGINT + 1)
       |               / 281474976710657e0) / weight * 1e6 + 5e-1) AS BIGINT) AS key_micro
       |  FROM t),
       |r AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY key_micro DESC, doc_id) AS BIGINT) AS rank
       |  FROM k)
       |SELECT lang, rank, doc_id, weight, key_micro / 1e6 AS sample_key
       |FROM r WHERE rank <= $SAMPLE_K
       |ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------------------
  // q148 — shard REBALANCE plan under rendezvous hashing (Thaler & Ravishankar
  // 1998, HRW): what fraction of the corpus moves when the shard fleet grows
  // N -> N+1, under HRW (assign each doc to argmax_s md5(doc_id:s)) vs the
  // naive doc_id mod N. The operational question behind every re-shard of a
  // 100 TB bucketed layout: HRW moves only the docs the NEW shard wins
  // (~1/(N+1), and every moved doc lands ON the new shard — zero
  // shard-to-shard churn), while mod-N reassigns almost everything. The
  // report measures both on the corpus itself, plus the post-grow balance
  // (most-loaded shard vs ideal), so the migration cost and the resulting
  // skew are read off one table before committing to a scheme.
  //
  // Engine-exactness: the HRW argmax is the q144 encode-min trick in
  // reverse — max over `md5hex || lpad(shard, 2)` strings, ties impossible
  // (md5 equality across shards of one doc); everything else is integer
  // counting with micro-floored fractions.
  //
  // Scale shape: the per-doc assignment is a pure projection (a transform
  // over an N+1-element literal — no explode, no join); the scheme fan-out
  // is a 2-element explode; two keyed aggregates land on <= 2·(N+1) rows.
  // ---------------------------------------------------------------------------
  val SHARDS_BEFORE = 8

  private def hrwExpr(n: Int): String =
    s"CAST(substring(array_max(transform(sequence(0, ${n - 1}), " +
      "s -> concat(md5(concat(cast(doc_id AS string), ':', cast(s AS string))), " +
      "lpad(cast(s AS string), 2, '0')))), 33, 2) AS INT)"

  def q148ShardRebalance(spark: SparkSession, dir: String): DataFrame = {
    val n = SHARDS_BEFORE
    val assigned = Tables
      .balanced(Tables.documents(spark, dir).select(col("doc_id")))
      .withColumn("hrw_b", expr(hrwExpr(n)))
      .withColumn("hrw_a", expr(hrwExpr(n + 1)))
      .withColumn("mod_b", expr(s"CAST(doc_id % $n AS INT)"))
      .withColumn("mod_a", expr(s"CAST(doc_id % ${n + 1} AS INT)"))
      .select(
        explode(
          array(
            struct(lit("hrw").as("scheme"), col("hrw_b").as("s_before"), col("hrw_a").as("s_after")),
            struct(lit("mod").as("scheme"), col("mod_b").as("s_before"), col("mod_a").as("s_after"))
          )
        ).as("x")
      )
      .select(col("x.scheme").as("scheme"), col("x.s_before").as("s_before"), col("x.s_after").as("s_after"))
      .localCheckpoint()
    val stats = assigned
      .groupBy(col("scheme"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("s_before") =!= col("s_after")).cast("long")).as("n_moved"),
        sum((col("s_before") =!= col("s_after") && col("s_after") === n).cast("long")).as("moved_to_new")
      )
    val load = assigned
      .groupBy(col("scheme"), col("s_after"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("scheme"))
      .agg(max(col("c")).as("max_load"))
    stats
      .join(load, "scheme")
      .select(
        col("scheme"),
        col("n_docs"),
        col("n_moved"),
        expr("floor(cast(n_moved AS double) * 1e6 / n_docs + 5e-1) / 1e6").as("moved_frac"),
        expr("floor(cast(moved_to_new AS double) * 1e6 / greatest(n_moved, 1) + 5e-1) / 1e6")
          .as("moved_to_new_frac"),
        expr(s"floor(cast(max_load AS double) * ${n + 1} * 1e6 / n_docs + 5e-1) / 1e6")
          .as("max_load_factor")
      )
      .orderBy(col("scheme"))
  }

  val q148Oracle: String = {
    val n = SHARDS_BEFORE
    def hrw(m: Int): String =
      s"CAST(substr(list_max(list_transform(range(0, $m), " +
        s"s -> md5(doc_id::VARCHAR || ':' || s::VARCHAR) || lpad(s::VARCHAR, 2, '0'))), 33, 2) AS INT)"
    s"""WITH a AS (
       |  SELECT doc_id,
       |         ${hrw(n)} AS hrw_b,
       |         ${hrw(n + 1)} AS hrw_a,
       |         CAST(doc_id % $n AS INT) AS mod_b,
       |         CAST(doc_id % ${n + 1} AS INT) AS mod_a
       |  FROM documents),
       |f AS (
       |  SELECT 'hrw' AS scheme, hrw_b AS s_before, hrw_a AS s_after FROM a
       |  UNION ALL
       |  SELECT 'mod' AS scheme, mod_b AS s_before, mod_a AS s_after FROM a),
       |st AS (
       |  SELECT scheme, count(*) AS n_docs,
       |         CAST(sum(CASE WHEN s_before <> s_after THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       |         CAST(sum(CASE WHEN s_before <> s_after AND s_after = $n THEN 1 ELSE 0 END) AS BIGINT) AS moved_to_new
       |  FROM f GROUP BY 1),
       |ld AS (
       |  SELECT scheme, CAST(max(c) AS BIGINT) AS max_load
       |  FROM (SELECT scheme, s_after, count(*) AS c FROM f GROUP BY 1, 2) GROUP BY 1)
       |SELECT st.scheme, st.n_docs, st.n_moved,
       |       floor(CAST(n_moved AS DOUBLE) * 1e6 / n_docs + 5e-1) / 1e6 AS moved_frac,
       |       floor(CAST(moved_to_new AS DOUBLE) * 1e6 / greatest(n_moved, 1) + 5e-1) / 1e6 AS moved_to_new_frac,
       |       floor(CAST(max_load AS DOUBLE) * ${n + 1} * 1e6 / n_docs + 5e-1) / 1e6 AS max_load_factor
       |FROM st JOIN ld USING (scheme)
       |ORDER BY scheme""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_shard_rebalance" -> (q148ShardRebalance _),
    "q145_weighted_sample" -> (q145WeightedSample _),
    "q48_stratified_sample" -> (q48StratifiedSample _),
    "q49_hash_split" -> (q49HashSplit _),
    "q51_bottomk_sample" -> (q51BottomKSample _),
    "q130_source_cap" -> (q130SourceCap _),
    "q169_pruning_sweep" -> (q169PruningSweep _)
  )

  /** q49/q51/q130 are deterministic → exact oracle; q48's RNG is checked
    * via its envelope form (exact totals + verdict columns).
    */
  val oracles: Map[String, String] = Map(
    "q148_shard_rebalance" -> q148Oracle,
    "q145_weighted_sample" -> q145Oracle,
    "q48_stratified_sample" -> q48Oracle,
    "q49_hash_split" -> q49Oracle,
    "q51_bottomk_sample" -> q51Oracle,
    "q130_source_cap" -> q130Oracle,
    "q169_pruning_sweep" -> q169Oracle
  )
}
