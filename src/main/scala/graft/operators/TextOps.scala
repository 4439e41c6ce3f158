package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators over the `documents` table — the training-data-
  * pipeline surface (language ID, quality scoring, token counting,
  * fingerprinting). The reference has no text ops (its only string work is a
  * filename regex, `data_processing.py:240`); these are the ★-additions the
  * engine needs to be useful on web-scale corpora.
  *
  * Everything here is built-in codegen'd expressions (regexp_extract_all,
  * split, md5, transform/filter/aggregate higher-order functions) — no UDFs,
  * so whole-stage codegen spans the full pipeline and the operators scale
  * embarrassingly (per-row, no shuffle except the final order/agg).
  */
object TextOps {

  /** Count of whole-word matches for any of `words` (case-insensitive). */
  private def wordHits(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(c), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  private val deStop = Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von")
  private val esStop = Seq("el", "la", "los", "las", "de", "que", "y", "es", "en", "un")
  private val frStop = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")

  // ---------------------------------------------------------------------------
  // q25 — language ID via stopword-hit ratios (n-gram heuristic class). Scores
  // for each candidate language; argmax with a fixed priority for ties.
  // ---------------------------------------------------------------------------
  def q25LangId(spark: SparkSession, dir: String): DataFrame =
    Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("en_hits", wordHits(col("text"), enStop))
      .withColumn("de_hits", wordHits(col("text"), deStop))
      .withColumn("es_hits", wordHits(col("text"), esStop))
      .withColumn("fr_hits", wordHits(col("text"), frStop))
      .withColumn(
        "predicted_lang",
        when(col("en_hits") >= greatest(col("de_hits"), col("es_hits"), col("fr_hits")), "en")
          .when(col("de_hits") >= greatest(col("es_hits"), col("fr_hits")), "de")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr")
      )
      .select(col("doc_id"), col("lang"), col("en_hits"), col("de_hits"), col("es_hits"), col("fr_hits"), col("predicted_lang"))
      .orderBy(col("doc_id"))

  private def sqlHits(words: Seq[String]): String =
    s"len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b'))"

  val q25Oracle: String =
    s"""SELECT doc_id, lang,
       |  CAST(${sqlHits(enStop)} AS INT) AS en_hits,
       |  CAST(${sqlHits(deStop)} AS INT) AS de_hits,
       |  CAST(${sqlHits(esStop)} AS INT) AS es_hits,
       |  CAST(${sqlHits(frStop)} AS INT) AS fr_hits,
       |  CASE WHEN ${sqlHits(enStop)} >= greatest(${sqlHits(deStop)}, ${sqlHits(esStop)}, ${sqlHits(frStop)}) THEN 'en'
       |       WHEN ${sqlHits(deStop)} >= greatest(${sqlHits(esStop)}, ${sqlHits(frStop)}) THEN 'de'
       |       WHEN ${sqlHits(esStop)} >= ${sqlHits(frStop)} THEN 'es'
       |       ELSE 'fr' END AS predicted_lang
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q26 — quality scoring: token stats + punctuation/stopword ratios folded
  // into a 0-100 score and a keep/review/drop bucket (the CCNet/Gopher-rule
  // shape of corpus filtering, reduced to pure SQL-safe arithmetic).
  // ---------------------------------------------------------------------------
  def q26QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = size(split(trim(col("text")), "\\s+"))
    val punct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    val stops = wordHits(col("text"), enStop)
    Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("n_tokens", toks)
      .withColumn("punct_ratio", round(punct.cast("double") / greatest(col("n_chars"), lit(1)), 6))
      .withColumn("stopword_ratio", round(stops.cast("double") / greatest(toks, lit(1)).cast("double"), 6))
      .withColumn(
        "quality_score",
        round(
          least(lit(40), col("n_tokens").cast("double") / 2)
            + least(lit(30), col("stopword_ratio") * 100)
            + lit(30) * when(col("n_chars").between(100, 500), 1.0).otherwise(0.5),
          4
        )
      )
      .withColumn(
        "bucket",
        when(col("quality_score") >= 70, "keep").when(col("quality_score") >= 45, "review").otherwise("drop")
      )
      .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("punct_ratio"), col("stopword_ratio"), col("quality_score"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** q26's quality score as a reusable (Column, SQL-snippet) pair — q130
    * ranks per-source caps by it. Both spellings are q26's verbatim
    * arithmetic (same round-then-use order), so composition inherits q26's
    * oracle guarantees.
    */
  private[operators] def q26ScoreCol: Column = {
    val toks = size(split(trim(col("text")), "\\s+"))
    val swr = round(wordHits(col("text"), enStop).cast("double") / greatest(toks, lit(1)).cast("double"), 6)
    round(
      least(lit(40), toks.cast("double") / 2)
        + least(lit(30), swr * 100)
        + lit(30) * when(col("n_chars").between(100, 500), 1.0).otherwise(0.5),
      4
    )
  }

  private[operators] val q26ScoreSql: String = {
    val toks = "len(string_split_regex(trim(text), '\\s+'))"
    s"""round(least(40, $toks::DOUBLE / 2)
       |      + least(30, round(${sqlHits(enStop)}::DOUBLE / greatest($toks, 1), 6) * 100)
       |      + 30 * (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.5 END), 4)""".stripMargin
  }

  val q26Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, n_chars,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    round(len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
       |    round(${sqlHits(enStop)}::DOUBLE
       |          / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stopword_ratio
       |  FROM documents)
       |SELECT doc_id, n_chars, CAST(n_tokens AS INT) AS n_tokens, punct_ratio, stopword_ratio,
       |  round(least(40, n_tokens::DOUBLE / 2)
       |        + least(30, stopword_ratio * 100)
       |        + 30 * (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.5 END), 4) AS quality_score,
       |  CASE WHEN least(40, n_tokens::DOUBLE / 2) + least(30, stopword_ratio * 100)
       |            + 30 * (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.5 END) >= 70 THEN 'keep'
       |       WHEN least(40, n_tokens::DOUBLE / 2) + least(30, stopword_ratio * 100)
       |            + 30 * (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.5 END) >= 45 THEN 'review'
       |       ELSE 'drop' END AS bucket
       |FROM t
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q27 — token counting, two tokenizers: whitespace and a BPE-ish regex
  // (letter runs / digit runs / single other non-space), aggregated per
  // source so the reduction side is exercised too.
  // ---------------------------------------------------------------------------
  def q27TokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val wsToks = size(split(trim(col("text")), "\\s+"))
    val bpeToks = size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
    Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("ws_tokens", wsToks)
      .withColumn("bpe_tokens", bpeToks)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"),
        round(avg(col("ws_tokens")), 4).as("avg_ws_tokens")
      )
      .orderBy(col("source"))
  }

  val q27Oracle: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_ws_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
      |  round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_ws_tokens
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------------
  // q28 — document fingerprinting: md5 over whitespace-normalized lowercase
  // text (the exact-dedup key), with a per-fingerprint cardinality so
  // duplicate groups are visible in one pass.
  // ---------------------------------------------------------------------------
  def q28Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val normalized = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val docs = Tables.balanced(Tables.documents(spark, dir)).withColumn("fingerprint", md5(normalized))
    val groups = docs.groupBy(col("fingerprint")).agg(count(lit(1)).as("n_copies"))
    docs
      .join(groups, Seq("fingerprint"))
      .select(col("doc_id"), col("fingerprint"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  val q28Oracle: String =
    """WITH f AS (
      |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |  FROM documents)
      |SELECT doc_id, fingerprint, count(*) OVER (PARTITION BY fingerprint) AS n_copies
      |FROM f
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q135 — character-entropy gibberish score: per-doc Shannon entropy (nats)
  // of the normalized character distribution — the signal that separates
  // natural prose (~2.8-3.1 nats for English-like char unigrams) from the
  // two failure modes the word-level signals miss: repeated-character /
  // boilerplate runs (entropy collapses toward 0) and key-mash / encoded
  // noise (entropy climbs toward ln(alphabet)). CCNet/C4-class pipelines
  // run exactly this class of cheap character-statistics filter before any
  // LM-based scoring; q26's ratios and q68's bigram repetition both operate
  // on word tokens and are blind to intra-word garbage.
  //
  // Exactness: H = ln(n) - (Σ c·ln(c))/n is computed as integer micros —
  // per distinct character, floor(c * ln(c) * 1e6 + 5e-1) (the ONE shared
  // expression string below), summed as 64-bit integers, subtracted from
  // the same-floored n·ln(n) term, floor-divided by n — so both engines
  // agree bit-for-bit modulo ln()'s final ulp (q62's already-green
  // exposure). Verdict thresholds compare the integer micros directly.
  //
  // Scale shape: pure per-row projection — the char counts come from
  // array_distinct + filter over the in-row char array (alphabet-bounded,
  // all codegen'd), the entropy from one aggregate() fold; NO shuffle
  // anywhere but the presentation sort. The cheapest possible 100 TB plan:
  // one scan, embarrassingly parallel.
  // ---------------------------------------------------------------------------
  private val ENT_TERM = "floor(c * ln(c) * 1e6 + 5e-1)"
  private val ENT_LOW_MICRO = 2000000L // < 2.0 nats: repetitive / boilerplate
  private val ENT_HIGH_MICRO = 3500000L // > 3.5 nats: key-mash / encoded noise

  /** The per-doc char-entropy signal frame, session-cached per
    * (session, dir) — the tokenStage pattern on the quality-signal axis:
    * the one embarrassingly-parallel entropy pass feeds q135's declared
    * output, q168's entropy leg, and the corpus report, so the scan runs
    * once per snapshot instead of once per consumer repetition. The bench
    * times the build as the named q135_entropy phase.
    */
  private val entStageCache = new SessionCache[DataFrame]

  private[graft] def entropyStage(spark: SparkSession, dir: String): DataFrame =
    entStageCache.getOrBuild(spark, dir) {
      Tables
        .balanced(Tables.documents(spark, dir))
        .withColumn("norm", lower(trim(col("text"))))
        .withColumn("n", length(col("norm")).cast("long"))
        .withColumn("chs", expr("filter(split(norm, ''), c -> c != '')"))
        .withColumn("n_distinct", size(array_distinct(col("chs"))).cast("long"))
        .withColumn(
          "s",
          expr(s"aggregate(transform(array_distinct(chs), ch -> cast(size(filter(chs, x -> x = ch)) AS bigint)), 0L, (acc, c) -> acc + ${ENT_TERM})")
        )
        .withColumn(
          "ent_micro",
          when(col("n") === 0L, lit(0L))
            .otherwise(expr("(floor(n * ln(n) * 1e6 + 5e-1) - s) div n"))
        )
        .select(
          col("doc_id"),
          col("n").as("n_chars_norm"),
          col("n_distinct").as("n_distinct_chars"),
          (col("ent_micro") / lit(1e6)).as("entropy_nats"),
          when(col("n") === 0L, lit("empty"))
            .when(col("ent_micro") < ENT_LOW_MICRO, lit("low"))
            .when(col("ent_micro") > ENT_HIGH_MICRO, lit("high"))
            .otherwise(lit("ok"))
            .as("verdict")
        )
        .localCheckpoint()
    }

  def q135CharEntropy(spark: SparkSession, dir: String): DataFrame =
    entropyStage(spark, dir).orderBy(col("doc_id"))

  val q135Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, lower(trim(text)) AS norm FROM documents),
       |ch AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(norm) + 1), i -> norm[i:i])) AS ch
       |  FROM d),
       |cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_distinct,
       |         sum(CAST(${ENT_TERM} AS BIGINT)) AS s
       |  FROM cnt GROUP BY 1),
       |base AS (SELECT doc_id, len(norm) AS n FROM d),
       |ent AS (
       |  SELECT b.doc_id, b.n, coalesce(a.n_distinct, 0) AS n_distinct,
       |         CASE WHEN b.n = 0 THEN 0
       |              ELSE (CAST(floor(b.n * ln(b.n) * 1e6 + 5e-1) AS BIGINT) - a.s) // b.n
       |         END AS ent_micro
       |  FROM base b LEFT JOIN agg a USING (doc_id))
       |SELECT doc_id, CAST(n AS BIGINT) AS n_chars_norm,
       |       CAST(n_distinct AS BIGINT) AS n_distinct_chars,
       |       ent_micro / 1e6 AS entropy_nats,
       |       CASE WHEN n = 0 THEN 'empty'
       |            WHEN ent_micro < $ENT_LOW_MICRO THEN 'low'
       |            WHEN ent_micro > $ENT_HIGH_MICRO THEN 'high'
       |            ELSE 'ok' END AS verdict
       |FROM ent ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q54 — fuzzy matching via edit distance: near-duplicate part names within
  // levenshtein <= 2, weighted by how many parts carry each name. Two scale
  // patterns compose here:
  //   1. DISTINCT-first: the pair stage runs on unique values, never on the
  //      raw table; the raw-table mass joins back by equality afterwards.
  //   2. LOSSLESS length blocking: levenshtein <= 2 bounds |len(a)-len(b)|
  //      <= 2, so the left side replicates each name to its 5 admissible
  //      partner lengths and the pair stage is an EQUI-join on exact
  //      length — a hash/sort-merge join Catalyst can distribute, not the
  //      BroadcastNestedLoopJoin the raw theta-join (`a < b AND lev <= 2`)
  //      plans, which is a pruned cartesian and O(n²) at corpus scale.
  //      Each qualifying pair lands in exactly ONE block (the right name's
  //      own length), so no dedup pass is needed and the result is
  //      IDENTICAL to the all-pairs form — the oracle below stays the
  //      brute-force SQL. Within-block skew (many same-length names) would
  //      next call for a deletion-neighborhood key (SymSpell) or q30's
  //      shingle-LSH candidates; the verify stays exact either way.
  // ---------------------------------------------------------------------------
  def q54FuzzyNames(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables
      .part(spark, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("len", length(col("p_name")))
    val l = names
      .withColumn("blk", explode(expr("sequence(len - 2, len + 2)")))
      .select(col("p_name").as("name_a"), col("n_parts").as("parts_a"), col("blk"))
    val r = names
      .select(col("p_name").as("name_b"), col("n_parts").as("parts_b"), col("len").as("blk"))
    l.as("l")
      .join(
        r.as("r"),
        // equi key first; the quadratic-ish verify runs on within-block
        // pairs only, cheap conjunct (<) ahead of levenshtein
        col("l.blk") === col("r.blk") && col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) <= 2
      )
      .select(
        col("name_a"),
        col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("edit_distance"),
        (col("parts_a") + col("parts_b")).as("parts_affected")
      )
      .orderBy(col("name_a"), col("name_b"))
  }

  val q54Oracle: String =
    """WITH names AS (
      |  SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name)
      |SELECT l.p_name AS name_a, r.p_name AS name_b,
      |       CAST(levenshtein(l.p_name, r.p_name) AS INT) AS edit_distance,
      |       l.n_parts + r.n_parts AS parts_affected
      |FROM names l JOIN names r
      |  ON l.p_name < r.p_name
      | AND abs(length(l.p_name) - length(r.p_name)) <= 2
      | AND levenshtein(l.p_name, r.p_name) <= 2
      |ORDER BY name_a, name_b""".stripMargin

  // ---------------------------------------------------------------------------
  // q62 — TF-IDF: top-3 characteristic terms per document. The classic
  // corpus-statistics op a training-data pipeline runs for topic/keyword
  // signals.
  //
  // Scale shape: explode → (doc, term) count shuffles on the pair key;
  // document frequency is a second count over the (already distinct)
  // (doc, term) rows — hot terms are harmless because both aggs
  // partial-combine map-side. dfreq is vocab-sized (Heaps' law: sublinear
  // in corpus size), so it is broadcast back onto tf when a measured count
  // proves it small — tf keeps its partitioning and the big relation is
  // never re-shuffled on term — and falls back to the shuffle join
  // automatically otherwise. N is a broadcast single row; the final top-3 window
  // partitions per doc. No collect anywhere.
  //
  // Determinism across engines: the score is ranked AFTER floor-form
  // rounding at 6dp (see q12) with a term-asc tiebreak, so a sub-6dp ULP
  // difference in ln() between libm implementations can neither flip the
  // ranking nor the emitted value.
  // ---------------------------------------------------------------------------
  def q62TfIdf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // project to (doc_id, text) BEFORE the balancing repartition: the
    // shuffle moves two columns, not whole document rows
    val docs = Tables.balanced(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    val terms = docs.select(
      col("doc_id"),
      explode(expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("term")
    )
    // tf feeds BOTH the document-frequency aggregate and the scored join:
    // materialize it once so the token pipeline (split + explode + count)
    // runs a single time instead of once per consumer (the explode sits
    // above the reusable exchange, so AQE stage reuse cannot dedup it) —
    // the same build-once shape a 100 TB pipeline gets by staging tf as a
    // table between passes
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")).localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // no broadcast hint and no driver-side gate: dfreq materializes through
    // a shuffle stage whose MEASURED size AQE already has, so the runtime
    // re-planner converts the join to broadcast-hash exactly when the vocab
    // is small and falls back to the shuffle join when Heaps'-law
    // "sublinear" still outgrows executor memory at 100 TB. The previous
    // `dfreq.count() <= threshold` gate bought the same decision with an
    // extra blocking job per invocation.
    val dfSide = dfreq
    // corpus size from the unbalanced scan: a count needs no repartition
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfSide, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "tfidf",
        // 1e6/5e-1 not 1000000.0/0.5: decimal-point literals are DECIMAL in
        // Spark SQL text and would make the output decimal, not double
        expr("floor(cast(tf AS double) * ln(cast(n_docs AS double) / cast(df AS double)) * 1e6 + 5e-1) / 1e6")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val q62Oracle: String =
    """WITH terms AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |         floor(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e6 + 5e-1) / 1e6 AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, term, tfidf,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      |  FROM scored)
      |SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
      |FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------------------
  // q80 — Gopher-style DYNAMIC quality threshold: instead of one global
  // cutoff (q26's fixed 70/45 buckets), each language keeps its own top 90%
  // by quality score — the per-subcorpus adaptive filtering real curation
  // pipelines use, because a fixed absolute floor over-prunes whichever
  // language the heuristic scores systematically lower.
  //
  // Exactness at scale: the naive formulation (percent_rank window over
  // every document) sorts the full corpus per language — a skew bomb at
  // 100 TB with a handful of languages. This is the scale-safe equivalent:
  // rank a document by COUNTING strictly-lower scores, which only needs
  // per-(lang, score) counts (map-side combined, tiny after agg) plus a
  // running sum over that aggregated frame (the q72 pattern: windows only
  // over post-agg dozens/thousands of rows, never the corpus). The cutoff
  // `cnt_less >= 0.1*(n-1)` is exactly `percent_rank() >= 0.1` with ties
  // sharing rank, so the result is identical to the window formulation but
  // the big table is only ever scanned, aggregated, and hash-joined.
  // ---------------------------------------------------------------------------
  def q80DynamicThreshold(spark: SparkSession, dir: String): DataFrame = {
    val toks = size(split(trim(col("text")), "\\s+"))
    val stops = wordHits(col("text"), enStop)
    val scored = Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("n_tokens", toks)
      .withColumn("stopword_ratio", round(stops.cast("double") / greatest(toks, lit(1)).cast("double"), 6))
      .withColumn(
        "score",
        round(
          least(lit(40), col("n_tokens").cast("double") / 2)
            + least(lit(30), col("stopword_ratio") * 100)
            + lit(30) * when(col("n_chars").between(100, 500), 1.0).otherwise(0.5),
          4
        )
      )
      .select(col("lang"), col("score"))
    val n = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val grouped = scored.groupBy(col("lang"), col("score")).agg(count(lit(1)).as("c"))
    // running count of strictly-lower scores, over the aggregated frame
    val w = Window.partitionBy(col("lang")).orderBy(col("score"))
    val thr = grouped
      .withColumn("cum_less", sum(col("c")).over(w) - col("c"))
      .join(n, "lang")
      .filter(col("cum_less") >= lit(0.1) * (col("n_total") - 1))
      .groupBy(col("lang"))
      .agg(min(col("score")).as("threshold"))
    val kept = scored
      .join(broadcast(thr), Seq("lang"))
      .filter(col("score") >= col("threshold"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), avg(col("score")).as("mk"))
    n.join(thr, "lang")
      .join(kept, "lang")
      .select(
        col("lang"),
        col("n_total"),
        col("threshold"),
        col("n_kept"),
        (col("n_total") - col("n_kept")).as("n_dropped"),
        expr("floor(mk * 1e6 + 5e-1) / 1e6").as("mean_kept")
      )
      .orderBy(col("lang"))
  }

  val q80Oracle: String =
    s"""WITH s AS (
       |  SELECT lang,
       |    round(least(40, len(string_split_regex(trim(text), '\\s+'))::DOUBLE / 2)
       |        + least(30, round(${sqlHits(enStop)}::DOUBLE
       |                          / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) * 100)
       |        + 30 * (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.5 END), 4) AS score
       |  FROM documents),
       |n AS (SELECT lang, count(*) AS n_total FROM s GROUP BY 1),
       |g AS (SELECT lang, score, count(*) AS c FROM s GROUP BY 1, 2),
       |cum AS (SELECT lang, score, sum(c) OVER (PARTITION BY lang ORDER BY score) - c AS cum_less FROM g),
       |thr AS (SELECT cum.lang AS lang, min(score) AS threshold
       |        FROM cum JOIN n ON cum.lang = n.lang WHERE cum_less >= 0.1 * (n_total - 1) GROUP BY 1),
       |k AS (SELECT s.lang AS lang, count(*) AS n_kept, avg(score) AS mk
       |      FROM s JOIN thr ON s.lang = thr.lang AND s.score >= thr.threshold GROUP BY 1)
       |SELECT n.lang AS lang, CAST(n_total AS BIGINT) AS n_total, threshold,
       |  CAST(n_kept AS BIGINT) AS n_kept, CAST(n_total - n_kept AS BIGINT) AS n_dropped,
       |  floor(mk * 1e6 + 5e-1) / 1e6 AS mean_kept
       |FROM n JOIN thr ON n.lang = thr.lang JOIN k ON n.lang = k.lang
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------------
  // q82 — vocabulary growth per source: total/distinct token counts, hapax
  // legomena (frequency-1 tokens), and type-token ratio — the Heaps-law
  // diagnostics a corpus curator reads to spot synthetic/templated sources
  // (TTR collapses) or OCR noise (hapax rate explodes). Two-level
  // aggregation: per-(source, token) counts first (map-side combined — the
  // explode never reaches the shuffle at corpus multiplicity), then the
  // per-source rollup over the much smaller vocabulary frame.
  // ---------------------------------------------------------------------------
  def q82VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.balanced(Tables.documents(spark, dir))
    val tf = docs
      .select(col("source"), explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    tf.groupBy(col("source"))
      .agg(
        sum(col("c")).as("total_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax_count")
      )
      .join(broadcast(nDocs), "source")
      .withColumn("ttr", expr("floor(cast(distinct_tokens AS double) * 1e6 / cast(total_tokens AS double) + 5e-1) / 1e6"))
      .select(col("source"), col("n_docs"), col("total_tokens"), col("distinct_tokens"), col("hapax_count"), col("ttr"))
      .orderBy(col("source"))
  }

  val q82Oracle: String =
    """WITH tf AS (
      |  SELECT source, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
      |  FROM documents),
      |g AS (SELECT source, tok, count(*) AS c FROM tf GROUP BY 1, 2),
      |d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT g.source AS source, CAST(any_value(n_docs) AS BIGINT) AS n_docs,
      |  CAST(sum(c) AS BIGINT) AS total_tokens, CAST(count(*) AS BIGINT) AS distinct_tokens,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
      |  floor(count(*) * 1e6 / sum(c) + 5e-1) / 1e6 AS ttr
      |FROM g JOIN d ON g.source = d.source
      |GROUP BY g.source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------------
  // q91 — context-window chunking: split each document into overlapping
  // token windows (width 64, stride 56 ⇒ 8-token overlap) — the "long doc →
  // training sequences" step that precedes packing when documents exceed
  // the context length. One scan; the explode emits chunk START POSITIONS
  // (a few ints per doc), not materialized chunk arrays, and the slice +
  // hash happen after, so shuffle volume is (doc_id, start, 32-byte hash)
  // per chunk regardless of chunk text size. Generators can't nest inside
  // expressions — explode first, slice in the next select.
  // ---------------------------------------------------------------------------
  private val CHUNK_W = 64
  private val CHUNK_STRIDE = 56

  def q91Chunking(spark: SparkSession, dir: String): DataFrame =
    Tables
      .balanced(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("toks")
      )
      .select(col("doc_id"), col("toks"), explode(expr(s"sequence(1, size(toks), $CHUNK_STRIDE)")).as("start"))
      .select(
        col("doc_id"),
        (((col("start") - 1) / CHUNK_STRIDE)).cast("int").as("chunk_idx"),
        col("start"),
        expr(s"size(slice(toks, start, $CHUNK_W))").as("chunk_tokens"),
        expr(s"md5(array_join(slice(toks, start, $CHUNK_W), ' '))").as("chunk_hash")
      )
      .orderBy(col("doc_id"), col("chunk_idx"))

  val q91Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, $CHUNK_STRIDE)) AS start
       |  FROM t)
       |SELECT doc_id,
       |       CAST((start - 1) / $CHUNK_STRIDE AS INT) AS chunk_idx,
       |       CAST(start AS INT) AS start,
       |       CAST(len(list_slice(toks, start, start + ${CHUNK_W - 1})) AS INT) AS chunk_tokens,
       |       md5(array_to_string(list_slice(toks, start, start + ${CHUNK_W - 1}), ' ')) AS chunk_hash
       |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------------------
  // q92 — BPE pair-frequency kernel: the most frequent adjacent character
  // pairs across the corpus vocabulary, occurrence-weighted — the
  // distributed inner loop of byte-pair-encoding vocabulary training (each
  // BPE iteration = this count over the current symbol sequences, then a
  // merge of the argmax pair). The full training loop is sequential by
  // nature; the kernel is where 100 TB of text gets reduced, and it
  // aggregates to |alphabet|² rows — tiny — after a map-side combine on
  // (word, count) first, so each distinct word's characters are walked once,
  // not once per occurrence.
  // ---------------------------------------------------------------------------
  def q92BpePairs(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables
      .balanced(Tables.documents(spark, dir))
      .select(explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("occ"))
      .filter(length(col("w")) >= 2)
    words
      .select(
        col("occ"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair")
      )
      .groupBy(col("pair"))
      .agg(sum(col("occ")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  val q92Oracle: String =
    """WITH words AS (
      |  SELECT w, count(*) AS occ FROM (
      |    SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
      |    FROM documents)
      |  GROUP BY w HAVING len(w) >= 2),
      |pairs AS (
      |  SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair, occ
      |  FROM words)
      |SELECT pair, CAST(sum(occ) AS BIGINT) AS cnt
      |FROM pairs GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------------
  // q94 — distributed BPE vocabulary training: N full merge iterations, not
  // just q92's one-shot pair count. The corpus collapses ONCE to the
  // distinct-word frame (word → occurrence count — bounded by vocabulary,
  // not corpus size, which is what makes 100 TB feasible: every later
  // iteration touches only that frame). Each driver TICK is
  //   count adjacent symbol pairs (occurrence-weighted, map-side combined)
  //   → a BATCH of top pairwise-disjoint merges (see below — one tick per
  //     merge would mean 30k sequential Spark jobs at a production
  //     vocabulary; batching divides the job count by the batch width)
  //   → apply each merge with a greedy leftmost left-fold HOF per word
  //     (one localCheckpoint per tick keeps the plan flat across ticks).
  // Greedy-leftmost matches the published BPE reference (Sennrich et al.
  // 2016); ties break lexicographically so the merge list is deterministic
  // — which makes even this iterative build oracle-gateable: q94Oracle
  // below replays all N merge iterations ONE AT A TIME in DuckDB as a
  // generated chain of CTE stages, so the oracle gate itself proves the
  // batch selection equals the sequential reference. The spec additionally
  // replays the loop single-node and pins the merge table exactly.
  //
  // Batch rule (provably identical to one-at-a-time, not a heuristic):
  // rank all pairs by (cnt DESC, l, r) and accept the maximal PREFIX whose
  // members are mutually disjoint — no shared left/right symbol and no
  // member's symbol equal to another's merged string — stopping at the
  // first conflicting pair, then truncating to members whose count is
  // STRICTLY above the stop row's count. Why this is exact: disjointness
  // means applying one accepted merge cannot create or destroy occurrences
  // of another (destroyed pairs share a symbol; created pairs involve the
  // merged string), so each accepted pair's count is unchanged when its
  // sequential turn comes; any OTHER pair the applications create or leave
  // behind is bounded by the count of some pair that overlaps an accepted
  // one — and every such pair ranks at or below the stop row, whose count
  // the strict truncation keeps all accepted members above. Ties at the
  // stop boundary are exactly the case the truncation removes.
  // ---------------------------------------------------------------------------
  private val BPE_MERGES = 10

  /** Merges accepted per driver tick (upper bound — the disjoint-prefix
    * rule may take fewer when top pairs conflict).
    */
  private val BPE_BATCH = 8

  private def sqlQuote(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")

  /** One greedy-leftmost merge of (a, b) → ab over a symbol array, as a
    * fold: `prev` carries the pending symbol; a (prev=a, x=b) adjacency
    * emits the merged symbol and clears the carry.
    */
  private def mergeExpr(a: String, b: String): String = {
    val (qa, qb, qab) = (sqlQuote(a), sqlQuote(b), sqlQuote(a + b))
    s"""aggregate(
       |  syms,
       |  named_struct('out', cast(array() AS array<string>), 'prev', cast(null AS string)),
       |  (acc, x) -> CASE
       |    WHEN acc.prev IS NULL THEN named_struct('out', acc.out, 'prev', x)
       |    WHEN acc.prev = '$qa' AND x = '$qb'
       |      THEN named_struct('out', concat(acc.out, array('$qab')), 'prev', cast(null AS string))
       |    ELSE named_struct('out', concat(acc.out, array(acc.prev)), 'prev', x) END,
       |  acc -> CASE WHEN acc.prev IS NULL THEN acc.out ELSE concat(acc.out, array(acc.prev)) END
       |)""".stripMargin
  }

  /** The learned merge table: (rank, left, right, merged, pair_count).
    * `batchWidth` caps merges per tick; any width yields the identical
    * table (the disjoint-prefix rule — TextOpsSpec pins width 1 == width 8).
    */
  def bpeTrain(
      spark: SparkSession,
      dir: String,
      nMerges: Int = BPE_MERGES,
      batchWidth: Int = BPE_BATCH
  ): DataFrame =
    bpeTrainState(spark, dir, nMerges, batchWidth)._1

  /** Training loop internals: the merge table plus the final distinct-word
    * frame (occ, syms) with all merges applied — the trained tokenizer's
    * word → pieces map, which [[q98BpeApply]] joins back onto the corpus.
    */
  private def bpeTrainState(
      spark: SparkSession,
      dir: String,
      nMerges: Int,
      batchWidth: Int = BPE_BATCH
  ): (DataFrame, DataFrame) = {
    val (m, w, _) = bpeTrainStateSnapshots(spark, dir, nMerges, batchWidth, Nil)
    (m, w)
  }

  /** The training loop with RANK SNAPSHOTS: the word frame as it stood
    * after exactly `s` merges, for each requested s (batch boundaries are
    * forced at snapshot ranks, so a batch never straddles one). Snapshots
    * past the pair-supply fixpoint return the final frame — exactly the
    * oracle's fixpoint semantics. q165's vocab-budget curve reads these;
    * plain training passes Nil and pays nothing.
    */
  private def bpeTrainStateSnapshots(
      spark: SparkSession,
      dir: String,
      nMerges: Int,
      batchWidth: Int,
      snapshots: Seq[Int]
  ): (DataFrame, DataFrame, Map[Int, DataFrame]) = {
    import spark.implicits._
    var words = Tables
      .balanced(Tables.documents(spark, dir))
      .select(explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("occ"))
      .filter(length(col("w")) >= 1)
      .withColumn("syms", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .select(col("occ"), col("syms"))
      // the corpus collapse above was the distributed heavy lift; what's
      // left is VOCABULARY-sized. Repartition (not coalesce — that would
      // collapse the collapse's own parallelism) into few partitions so the
      // merge iterations don't pay full-width task scheduling per tick
      // (size by |vocab| / ~1M rows per partition at real scale; 1 here)
      .repartition(1)
      .localCheckpoint(true)

    val snaps = scala.collection.mutable.Map.empty[Int, DataFrame]
    if (snapshots.contains(0)) snaps(0) = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // cap the batch at the next snapshot rank so no batch straddles one
      val nextSnap = snapshots.filter(_ >= rank).sorted.headOption
      val want = math.min(
        math.min(batchWidth, nMerges - rank + 1),
        nextSnap.map(_ - rank + 1).getOrElse(Int.MaxValue)
      )
      // collect a few rows past the batch so the stop/boundary count is
      // driver-known; TakeOrderedAndProject keeps this a top-k, not a sort
      val limit = 3 * want + 1
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(
          col("occ"),
          explode(expr("transform(sequence(1, size(syms) - 1), i -> named_struct('l', element_at(syms, i), 'r', element_at(syms, i + 1)))")).as("p")
        )
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("occ")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(limit)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        // maximal disjoint prefix: stop at the first pair sharing a symbol
        // (or merged string) with an accepted one
        val taken = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var stop: Option[Long] = None // count bound from the first conflict
        val it = top.iterator
        while (it.hasNext && stop.isEmpty && taken.size < want) {
          val row = it.next()
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          if (taken.isEmpty || (!used(l) && !used(r) && !used(l + r)))
            { taken += ((l, r, c)); used ++= Seq(l, r, l + r) }
          else stop = Some(c)
        }
        // counts at or below `bound` can belong to pairs the applications
        // create or revive — keep only members strictly above it. The head
        // (the global argmax under the full ordering) is always safe.
        val bound: Option[Long] =
          stop.orElse {
            if (it.hasNext) Some(it.next().getLong(2)) // scan ended early
            else if (top.length == limit) Some(top.last.getLong(2)) // more rows may exist off-driver
            else None // the entire pair universe was scanned, all disjoint
          }
        val kept = taken.head +: taken.tail.filter(t => bound.forall(t._3 > _))
        kept.zipWithIndex.foreach { case ((l, r, c), i) => merges += ((rank + i, l, r, l + r, c)) }
        val applied = kept.foldLeft(words) { case (w, (l, r, _)) =>
          w.withColumn("syms", expr(mergeExpr(l, r)))
        }
        words = applied.localCheckpoint(true)
        rank += kept.size
        if (snapshots.contains(rank - 1)) snaps(rank - 1) = words
      }
    }
    // snapshots past the fixpoint (exhausted supply, or never reached):
    // the final frame IS the frame at those ranks, per the oracle's
    // stage semantics (an empty top$k reproduces words unchanged)
    snapshots.filterNot(snaps.contains).foreach(s => snaps(s) = words)
    (
      merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count").orderBy(col("rank")),
      words,
      snaps.toMap
    )
  }

  def q94BpeTrain(spark: SparkSession, dir: String): DataFrame = bpeTrain(spark, dir)

  // ---------------------------------------------------------------------------
  // q98 — BPE tokenizer APPLICATION: train (q94's loop), then tokenize the
  // corpus with the learned merges — the step every tokenizer exists for,
  // closing the train → apply → chunk/pack → export pipeline. The
  // scale-correct shape: merges apply to the DISTINCT-WORD frame
  // (vocabulary-bounded, same invariant that makes training feasible at
  // 100 TB), and the corpus only pays a keyed join of words onto that
  // word → piece-count map — never a per-row merge scan over raw text. The
  // word string is rebuilt from the final symbols (merges only concatenate
  // adjacent pieces, so array_join inverts training's w → syms split).
  // Deterministic end to end → oracle-gated by extending q94's CTE chain
  // with the same join.
  // ---------------------------------------------------------------------------
  // ---------------------------------------------------------------------------
  // q165 — TOKENIZER BUDGET CURVE: per merge-count checkpoint, the pieces
  // in use (vocab), total corpus pieces, fertility (pieces per word) and
  // compression vs the character baseline — the "how many merges buy how
  // much compression" decision table read BEFORE committing to a vocab
  // budget (the marginal compression of each merge falls; this curve shows
  // where). ONE training run feeds every checkpoint: the loop snapshots
  // the word frame at grid ranks (batch boundaries forced there), and the
  // stats are vocabulary-bounded aggregates — nothing corpus-sized is
  // touched after the initial collapse.
  //
  // Oracle: q94's generated merge-replay chain already materializes
  // words$k after EVERY rank, so each checkpoint's stats are scalar
  // subqueries over the corresponding stage — the curve is hash-gated
  // end to end, including the fixpoint semantics when the pair supply
  // exhausts early.
  // ---------------------------------------------------------------------------
  private val BPE_GRID = Seq(0, 2, 5, BPE_MERGES)
  private val budgetCurve = new SessionCache[Seq[(Int, Long, Long, Long)]]

  def q165TokenizerBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // empty-corpus contract: no text, no training run, 0 checkpoint rows —
    // the oracle carries the same WHERE count(*) guard (without it, both
    // sides would otherwise fabricate NULL-laden phantom checkpoints)
    if (Tables.documents(spark, dir).isEmpty)
      return Seq
        .empty[(Int, Long, Long, Double, Double)]
        .toDF("merges", "vocab_pieces", "corpus_pieces", "fertility", "compression")
    val rows = budgetCurve.getOrBuild(spark, dir) {
      val (_, _, snaps) = bpeTrainStateSnapshots(spark, dir, BPE_MERGES, BPE_BATCH, BPE_GRID)
      BPE_GRID.map { k =>
        val w = snaps(k)
        val r = w
          .agg(
            expr("CAST(sum(occ * size(syms)) AS BIGINT)").as("pieces"),
            expr("CAST(sum(occ) AS BIGINT)").as("mass")
          )
          .collect()(0) // vocabulary-bounded agg, ONE row per checkpoint
        val vocab =
          w.select(explode(col("syms")).as("s")).agg(countDistinct(col("s"))).collect()(0).getLong(0)
        (k, vocab, r.getLong(0), r.getLong(1))
      }
    }
    val totalChars = rows.find(_._1 == 0).get._3 // pieces at k=0 ARE the chars
    rows
      .map { case (k, vocab, pieces, mass) =>
        (
          k,
          vocab,
          pieces,
          math.floor(pieces.toDouble * 1e6 / mass + 0.5) / 1e6,
          math.floor(totalChars.toDouble * 1e6 / pieces + 0.5) / 1e6
        )
      }
      .toDF("merges", "vocab_pieces", "corpus_pieces", "fertility", "compression")
      .orderBy(col("merges"))
  }

  lazy val q165Oracle: String = {
    val chain = q94Oracle.substring(0, q94Oracle.indexOf("\nSELECT 1 AS rank"))
    val rows = BPE_GRID.map { k =>
      s"""SELECT CAST($k AS INT) AS merges,
         |  (SELECT CAST(count(DISTINCT s.x) AS BIGINT) FROM words$k w2, unnest(w2.syms) AS s(x)) AS vocab_pieces,
         |  (SELECT CAST(sum(occ * len(syms)) AS BIGINT) FROM words$k) AS corpus_pieces,
         |  floor((SELECT sum(occ * len(syms)) FROM words$k)::DOUBLE * 1e6 / (SELECT sum(occ) FROM words$k) + 0.5) / 1e6 AS fertility,
         |  floor((SELECT sum(occ * len(syms)) FROM words0)::DOUBLE * 1e6 / (SELECT sum(occ * len(syms)) FROM words$k) + 0.5) / 1e6 AS compression""".stripMargin
    }
    chain + "\n" + rows.mkString(
      "SELECT * FROM (\n",
      "\nUNION ALL\n",
      "\n) WHERE (SELECT count(*) FROM documents) > 0 ORDER BY merges"
    )
  }

  /** The trained tokenizer is a session-scoped artifact (like the ANN
    * indexes and the dedup pair graph): q98 trains once per (session, dir)
    * and every later apply reuses the checkpointed word → pieces frame —
    * the build-once / apply-many shape a real pipeline has, where the
    * tokenizer is trained once and then tokenizes every shard. q94 stays
    * uncached: it MEASURES the training loop.
    */
  private val trainedTokenizer = new SessionCache[DataFrame]

  def q98BpeApply(spark: SparkSession, dir: String): DataFrame = {
    val trained = trainedTokenizer.getOrBuild(spark, dir)(bpeTrainState(spark, dir, BPE_MERGES)._2)
    val wordTokens = trained.select(
      array_join(col("syms"), "").as("w"),
      size(col("syms")).as("n_tokens")
    )
    Tables
      .balanced(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        col("source"),
        explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w")
      )
      .filter(length(col("w")) >= 1)
      .join(broadcast(wordTokens), Seq("w"))
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_words"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens_per_word")
      )
      .orderBy(col("source"))
  }

  /** q94's training chain, plus the tokenize-join: words10's symbol lists
    * ARE the trained tokenizer, so the apply oracle is one more join.
    * (lazy: q94Oracle is declared further down this object, so an eager
    * val here would read null during object init.)
    */
  lazy val q98Oracle: String = {
    val chain = q94Oracle.substring(0, q94Oracle.indexOf("\nSELECT 1 AS rank"))
    s"""$chain,
       |wordtok AS MATERIALIZED (
       |  SELECT array_to_string(syms, '') AS w, len(syms) AS n_tokens FROM words$BPE_MERGES),
       |docw AS (
       |  SELECT doc_id, source,
       |         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents)
       |SELECT d.source,
       |       count(DISTINCT d.doc_id) AS n_docs,
       |       count(*) AS total_words,
       |       CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
       |       round(avg(t.n_tokens), 4) AS avg_tokens_per_word
       |FROM docw d JOIN wordtok t USING (w)
       |WHERE len(d.w) >= 1
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q180 — TOKEN-EXACT pack manifest: q66's greedy context packing with
  // the mass the loader actually fills contexts by — TRAINED-BPE token
  // counts (q98's apply), not whitespace words. A whitespace-packed plan
  // over- or under-fills real contexts by each doc's fertility (q165's
  // curve is exactly how much); this is the q66 rollup a loader can trust
  // at the tokenizer it will really use. Population contract: the q98
  // apply population (docs with >= 1 whitespace word; training covers
  // every corpus word, so the tokenize join is total on it). Shares
  // q66/q170's shards/ctx knobs and their oracle-pinning warning (the
  // registered oracle assumes the defaults).
  //
  // Scale shape: the per-doc token sum is q98's broadcast tokenize join +
  // one doc-keyed aggregate; packing is q66's single (lang, shard)-hash
  // window exchange. The trained tokenizer is the session-cached artifact
  // q98 already builds — one training run feeds both.
  // ---------------------------------------------------------------------------
  /** Per-doc trained-BPE token totals — the q180 staging frame, exposed
    * for the spec's single-node replay.
    */
  private[graft] def bpeDocTokens(spark: SparkSession, dir: String): DataFrame = {
    val trained = trainedTokenizer.getOrBuild(spark, dir)(bpeTrainState(spark, dir, BPE_MERGES)._2)
    val wordTokens = trained.select(
      array_join(col("syms"), "").as("w"),
      size(col("syms")).as("n_tokens")
    )
    Tables
      .balanced(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        col("lang"),
        explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w")
      )
      .filter(length(col("w")) >= 1)
      .join(broadcast(wordTokens), Seq("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("n_tokens")).as("n_tokens"))
      .select(col("lang"), col("doc_id"), col("n_tokens"))
  }

  def q180BpePack(spark: SparkSession, dir: String): DataFrame = {
    // same knob discipline as q66/q170/StreamingPack: honor the session
    // confs so one session's q66/q170/q180 outputs stay mutually
    // consistent, and warn loudly that the REGISTERED oracle (pinned to
    // the defaults) no longer applies under non-default knobs
    val shards = spark.conf.getOption(Curation.ShardsConf).map(_.toInt).getOrElse(Curation.SHARDS)
    val ctx = spark.conf.getOption(Curation.CtxConf).map(_.toInt).getOrElse(Curation.CTX)
    if (shards != Curation.SHARDS || ctx != Curation.CTX)
      org.slf4j.LoggerFactory
        .getLogger(getClass)
        .warn(
          s"q180_bpe_pack running with non-default knobs (shards=$shards, ctx=$ctx): " +
            s"the registered oracle assumes shards=${Curation.SHARDS}, ctx=${Curation.CTX}"
        )
    Curation.packOver(bpeDocTokens(spark, dir), shards, ctx)
  }

  /** q94's chain + q98's tokenize join reduced to per-doc totals, then
    * q66's prefix-sum packing arithmetic verbatim.
    */
  lazy val q180Oracle: String = {
    val chain = q94Oracle.substring(0, q94Oracle.indexOf("\nSELECT 1 AS rank"))
    s"""$chain,
       |wordtok AS MATERIALIZED (
       |  SELECT array_to_string(syms, '') AS w, len(syms) AS n_tokens FROM words$BPE_MERGES),
       |docw AS (
       |  SELECT doc_id, lang,
       |         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents),
       |dt AS (
       |  SELECT d.doc_id, d.lang, CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
       |         CAST(d.doc_id % ${graft.operators.Curation.SHARDS} AS INT) AS shard
       |  FROM docw d JOIN wordtok t USING (w)
       |  WHERE len(d.w) >= 1
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT lang, shard, doc_id, n_tokens,
       |         COALESCE(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM dt)
       |SELECT lang, shard, CAST(floor(cum_before / ${graft.operators.Curation.CTX}.0) AS INT) AS bin,
       |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |FROM c GROUP BY 1, 2, 3
       |ORDER BY lang, shard, bin""".stripMargin
  }

  /** Full DuckDB replay of the BPE training loop: one generated chain of
    * per-iteration CTE stages (pair count → lexicographic-tiebreak argmax →
    * greedy-leftmost merge application), so even the iterative model-build
    * is hash-gated against an independent engine, not just replayed by the
    * spec. The merge application avoids a fold (DuckDB's list_reduce has no
    * initial accumulator) with an islands-and-parity formulation: a merge
    * STARTS at every odd offset within each maximal run of consecutive
    * matched positions — for left != right, matches are never adjacent, so
    * every match is a start; for left == right (a run of identical
    * symbols, e.g. 'aaa' under (a,a)), odd offsets reproduce exactly the
    * greedy-leftmost pairing. Starts are pairwise >= 2 apart by
    * construction, so "position follows a start" is exactly "consumed".
    * Every stage CTE is MATERIALIZED: stages reference their predecessor
    * more than once, and without materialization the inlining would double
    * work per stage (2^N blowup over N merges).
    *
    * top$k is consumed via SCALAR SUBQUERIES, not a CROSS JOIN: if the
    * pair supply exhausts before the requested merge count (tiny corpus),
    * top$k is EMPTY — a cross join would empty pos$k and every later
    * words$k, silently diverging from the Scala loop (which keeps the last
    * word frame). The scalar subqueries yield NULL instead: matched goes
    * NULL (filtered by WHERE matched), starts$k is empty, and words$k
    * reproduces words$p unchanged — the same fixpoint the loop holds.
    */
  private def bpeOracleStage(k: Int): String = {
    val p = k - 1
    s"""pairs$k AS MATERIALIZED (
       |  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(occ) AS BIGINT) AS cnt
       |  FROM words$p, unnest(range(1, len(syms))) AS u(i)
       |  GROUP BY 1, 2),
       |top$k AS MATERIALIZED (
       |  SELECT l, r, cnt FROM pairs$k ORDER BY cnt DESC, l, r LIMIT 1),
       |pos$k AS MATERIALIZED (
       |  SELECT w.wid, w.occ, u.i AS pos, w.syms[u.i] AS sym,
       |         (w.syms[u.i] = (SELECT l FROM top$k)
       |          AND w.syms[u.i+1] = (SELECT r FROM top$k)
       |          AND u.i < len(w.syms)) AS matched
       |  FROM words$p w, unnest(range(1, len(w.syms)+1)) AS u(i)),
       |starts$k AS MATERIALIZED (
       |  SELECT wid, pos FROM (
       |    SELECT wid, pos,
       |           row_number() OVER (PARTITION BY wid, isl ORDER BY pos) AS off
       |    FROM (SELECT wid, pos,
       |                 pos - row_number() OVER (PARTITION BY wid ORDER BY pos) AS isl
       |          FROM pos$k WHERE matched))
       |  WHERE off % 2 = 1),
       |words$k AS MATERIALIZED (
       |  SELECT p.wid, any_value(p.occ) AS occ,
       |         list(CASE WHEN st.pos IS NOT NULL
       |                   THEN (SELECT l || r FROM top$k)
       |                   ELSE p.sym END ORDER BY p.pos) AS syms
       |  FROM pos$k p
       |  LEFT JOIN starts$k st ON p.wid = st.wid AND p.pos = st.pos
       |  LEFT JOIN starts$k cons ON p.wid = cons.wid AND p.pos = cons.pos + 1
       |  WHERE cons.pos IS NULL
       |  GROUP BY p.wid)""".stripMargin
  }

  val q94Oracle: String = {
    val words0 =
      """words0 AS MATERIALIZED (
        |  SELECT row_number() OVER () AS wid, occ,
        |         list_transform(range(1, len(w)+1), i -> w[i]) AS syms
        |  FROM (
        |    SELECT w, count(*) AS occ FROM (
        |      SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |      FROM documents)
        |    GROUP BY w HAVING len(w) >= 1))""".stripMargin
    val stages = (1 to BPE_MERGES).map(bpeOracleStage)
    val selects = (1 to BPE_MERGES).map(k =>
      s"""SELECT $k AS rank, l AS "left", r AS "right", l || r AS merged, cnt AS pair_count FROM top$k"""
    )
    (words0 +: stages).mkString("WITH ", ",\n", "\n") +
      selects.mkString("\nUNION ALL\n") + "\nORDER BY rank"
  }

  // ---------------------------------------------------------------------------
  // q127 — frequent-bigram heavy hitters via a mergeable Misra–Gries sketch
  // + exact verify: every corpus bigram whose exact count exceeds N/K_MG
  // (the boilerplate/template-phrase detector — the frequent n-grams a
  // curator reviews for "this phrase is navigation chrome, strip it").
  //
  // Two passes, zero sketch error in the OUTPUT:
  //   1. ONE scan through the k-counter Misra–Gries aggregate
  //      (`functions/FreqSketch` — k-bounded state per partition, k-sized
  //      merges, NO vocabulary-sized shuffle). The MG guarantee makes the
  //      surviving counter keys a SUPERSET of every bigram with true count
  //      > N/k, whatever the data or merge order.
  //   2. An exact count of the ≤k candidates only (an IN-set filter over
  //      the candidate keys — optimizer turns it into an O(1) hash probe),
  //      kept on the EXACT threshold K_MG·count > N — integer arithmetic,
  //      no rational rounding.
  // That makes the result identical to "GROUP BY all bigrams HAVING
  // k·count > N" — the DuckDB oracle — while the distributed plan never
  // shuffles the bigram type table: the q88 bloom-prune trade applied to
  // frequency mining. At 100 TB pass 1 is scan + k-sized merges; pass 2
  // touches only candidate keys.
  // ---------------------------------------------------------------------------
  val K_MG = 2048

  def q127HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // a def, not a checkpointed val: materializing the per-INSTANCE bigram
    // frame would be a corpus-sized write, defeating the sketch's whole
    // bounded-state story — each pass re-runs the cheap tokenize instead
    def bg: DataFrame = Tables
      .balanced(Tables.documents(spark, dir).select(col("text")))
      .select(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        explode(
          expr("transform(sequence(1, size(toks) - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")
        ).as("bg")
      )

    val mg = udaf(graft.functions.FreqSketch.misraGries(K_MG))
    // ONE sketch-pass aggregate returns the <=K_MG candidate summary AND
    // the stream length together — bounded driver state (the q94 contract)
    val row = bg.agg(mg(col("bg")).as("summary"), count(lit(1)).as("n_total")).collect()(0)
    val candidates = row.getAs[Map[String, Long]]("summary").keys.toSeq
    val nTotal = row.getAs[Long]("n_total")

    bg.filter(col("bg").isin(candidates: _*))
      .groupBy(col("bg").as("gram"))
      .agg(count(lit(1)).as("n"))
      // the EXACT qualifying test, integer-only: k*n > N (N is a bounded
      // driver scalar from the sketch pass — no broadcast join needed)
      .filter(col("n") * lit(K_MG.toLong) > lit(nTotal))
      .withColumn("ppm", floor(col("n").cast("double") * lit(1e6) / lit(nTotal) + lit(0.5)).cast("long"))
      .select(col("gram"), col("n"), col("ppm"))
      .orderBy(col("n").desc, col("gram"))
  }

  val q127Oracle: String =
    s"""WITH t AS (
       |  SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |bg AS (
       |  SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS gram
       |  FROM t WHERE len(toks) >= 2),
       |tot AS (SELECT count(*) AS n_total FROM bg)
       |SELECT gram, CAST(count(*) AS BIGINT) AS n,
       |       CAST(floor(count(*)::DOUBLE * 1e6 / n_total + 0.5) AS BIGINT) AS ppm
       |FROM bg, tot
       |GROUP BY gram, n_total
       |HAVING count(*) * $K_MG > n_total
       |ORDER BY n DESC, gram""".stripMargin

  // ---------------------------------------------------------------------------
  // q150 — distinct-n diversity audit: per source and n ∈ {1,2,3}, the
  // distinct-n-gram count over the total n-gram mass (Li et al. 2016's
  // distinct-n; distinct-1 is the classic type-token ratio). The standard
  // mode-collapse detector for SYNTHETIC or templated data feeds: a
  // generator stuck on few patterns shows normal unigram diversity but a
  // cratered distinct-2/distinct-3, which no per-doc quality rule (q26/q72)
  // or dedup pass (exact/near) catches because every document is globally
  // unique. Grams are md5-keyed (collision-free 16-byte keys — at 100 TB
  // the distinct-count shuffle moves hashes, never gram strings).
  //
  // Scale shape: the gram instance table is the q110 linear blow-up × 3
  // (once per n); count + distinct-count per (source, n) is one
  // map-side-combined aggregate pair on the (source, n, key) grid. Output
  // is |sources|×3 rows.
  // ---------------------------------------------------------------------------
  private val DIVERSITY_NS = Seq(1, 2, 3)
  private val DIVERSITY_FLOOR_MICRO = 300000L // distinct-2 below 0.3: collapsed

  /** Session-cached (doc_id, source, toks) token table per (session, dir)
    * — the q67_shingles pattern one stage earlier: tokenization
    * (normalize + split) is the shared first stage of q150's THREE gram
    * explodes and q151's term frequencies, and q168 runs both as legs, so
    * one corpus pass feeds five consumers per bench repetition. A real
    * pipeline materializes the tokenized corpus once per snapshot.
    */
  private val tokenStageCache = new SessionCache[DataFrame]

  private[graft] def tokenStage(spark: SparkSession, dir: String): DataFrame =
    tokenStageCache.getOrBuild(spark, dir) {
      Tables
        .balanced(Tables.documents(spark, dir))
        .select(
          col("doc_id"),
          col("source"),
          split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("toks")
        )
        .localCheckpoint()
    }

  def q150DistinctN(spark: SparkSession, dir: String): DataFrame = {
    val base = tokenStage(spark, dir).select(col("source"), col("toks"))
    val grams = DIVERSITY_NS
      .map { n =>
        base
          .filter(size(col("toks")) >= n)
          .select(
            col("source"),
            lit(n).as("n"),
            explode(
              expr(s"transform(sequence(1, size(toks) - $n + 1), i -> md5(array_join(slice(toks, i, $n), ' ')))")
            ).as("key")
          )
      }
      .reduce(_.unionByName(_))
    grams
      .groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("total_grams"), countDistinct(col("key")).as("distinct_grams"))
      .select(
        col("source"),
        col("n"),
        col("total_grams"),
        col("distinct_grams"),
        expr("floor(cast(distinct_grams AS double) * 1e6 / total_grams + 5e-1) / 1e6").as("distinct_ratio"),
        expr(
          s"CASE WHEN n = 2 AND floor(cast(distinct_grams AS double) * 1e6 / total_grams + 5e-1) < $DIVERSITY_FLOOR_MICRO" +
            " THEN 'collapsed' ELSE 'ok' END"
        ).as("verdict")
      )
      .orderBy(col("source"), col("n"))
  }

  val q150Oracle: String =
    s"""WITH t AS (
       |  SELECT source, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |g AS (
       |  ${DIVERSITY_NS
        .map(n =>
          s"SELECT source, $n AS n, unnest(list_transform(range(1, len(toks) - $n + 2), " +
            s"i -> md5(array_to_string(toks[i:i+$n-1], ' ')))) AS key FROM t WHERE len(toks) >= $n"
        )
        .mkString("\n  UNION ALL\n  ")}),
       |ag AS (
       |  SELECT source, n, count(*) AS total_grams, count(DISTINCT key) AS distinct_grams
       |  FROM g GROUP BY 1, 2)
       |SELECT source, CAST(n AS INT) AS n,
       |       CAST(total_grams AS BIGINT) AS total_grams,
       |       CAST(distinct_grams AS BIGINT) AS distinct_grams,
       |       floor(CAST(distinct_grams AS DOUBLE) * 1e6 / total_grams + 5e-1) / 1e6 AS distinct_ratio,
       |       CASE WHEN n = 2 AND floor(CAST(distinct_grams AS DOUBLE) * 1e6 / total_grams + 5e-1)
       |                 < $DIVERSITY_FLOOR_MICRO THEN 'collapsed' ELSE 'ok' END AS verdict
       |FROM ag ORDER BY source, n""".stripMargin

  // ---------------------------------------------------------------------------
  // q151 — Zipf-fit audit: per source, the OLS slope of ln(freq) on
  // ln(rank) over the top ZIPF_K terms — natural language sits near the
  // Zipf exponent -1 (Zipf 1949; Piantadosi 2014 for the modern reading),
  // while key-mash noise flattens toward 0 and templated boilerplate
  // steepens past ~-1.5, so the slope is a one-number corpus-health probe
  // orthogonal to the per-doc signals (q135's entropy is within-doc; this
  // is the SOURCE's rank-frequency law). Regression inputs are per-rank
  // (ln rank, ln freq) pairs floored to integer micros, so the OLS sums
  // are exact 64-bit arithmetic and the closed-form slope
  // (k·Σxy − Σx·Σy)/(k·Σxx − Σx²) is engine-identical; ranks total-order
  // by (freq DESC, term).
  //
  // Scale shape: one term-frequency aggregate, a per-source top-K window
  // over the (source, term) grid (row_number, streaming sort — at 100 TB
  // swap for a per-source TakeOrdered), then the regression collapses to
  // one row per source.
  // ---------------------------------------------------------------------------
  private val ZIPF_K = 100

  def q151ZipfFit(spark: SparkSession, dir: String): DataFrame = {
    val tf = tokenStage(spark, dir)
      .select(col("source"), explode(col("toks")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("freq"))
    val ranked = tf
      .withColumn(
        "rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))
            .orderBy(col("freq").desc, col("term"))
        )
      )
      .filter(col("rank") <= ZIPF_K)
      .withColumn("x", expr("CAST(floor(ln(rank) * 1e6 + 5e-1) AS BIGINT)"))
      .withColumn("y", expr("CAST(floor(ln(freq) * 1e6 + 5e-1) AS BIGINT)"))
    ranked
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("k"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx")
      )
      .select(
        col("source"),
        col("k"),
        // a source with a single distinct term has OLS variance 0: the
        // slope is undefined — emit NULL explicitly (under ANSI mode the
        // raw division would THROW, and DuckDB's NaN would CAST-error:
        // the q155 singleton lesson, guarded identically in both engines)
        expr(
          "CASE WHEN k * sxx - sx * sx = 0 THEN NULL" +
            " ELSE floor(CAST(k * sxy - sx * sy AS double) * 1e6 / CAST(k * sxx - sx * sx AS double) + 5e-1) / 1e6 END"
        ).as("zipf_slope"),
        // CASE (not AND) so the division is never evaluated on the zero
        // branch — Spark's conjunctions do not short-circuit in codegen
        expr(
          "CASE WHEN k * sxx - sx * sx = 0 THEN 'anomalous'" +
            " WHEN floor(CAST(k * sxy - sx * sy AS double) * 1e6 / CAST(k * sxx - sx * sx AS double) + 5e-1)" +
            " BETWEEN -1500000 AND -700000 THEN 'zipfian' ELSE 'anomalous' END"
        ).as("verdict")
      )
      .orderBy(col("source"))
  }

  val q151Oracle: String =
    s"""WITH inst AS (
       |  SELECT source, unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
       |  FROM documents),
       |tf AS (SELECT source, term, count(*) AS freq FROM inst GROUP BY 1, 2),
       |rk AS (
       |  SELECT source, freq,
       |         row_number() OVER (PARTITION BY source ORDER BY freq DESC, term) AS rank
       |  FROM tf),
       |xy AS (
       |  SELECT source,
       |         CAST(floor(ln(rank) * 1e6 + 5e-1) AS BIGINT) AS x,
       |         CAST(floor(ln(freq) * 1e6 + 5e-1) AS BIGINT) AS y
       |  FROM rk WHERE rank <= $ZIPF_K),
       |ag AS (
       |  SELECT source, count(*) AS k,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM xy GROUP BY 1)
       |SELECT source, CAST(k AS BIGINT) AS k,
       |       CASE WHEN k * sxx - sx * sx = 0 THEN NULL
       |            ELSE floor(CAST(k * sxy - sx * sy AS DOUBLE) * 1e6 / CAST(k * sxx - sx * sx AS DOUBLE) + 5e-1) / 1e6
       |       END AS zipf_slope,
       |       CASE WHEN k * sxx - sx * sx = 0 THEN 'anomalous'
       |            WHEN floor(CAST(k * sxy - sx * sy AS DOUBLE) * 1e6 / CAST(k * sxx - sx * sx AS DOUBLE) + 5e-1)
       |                 BETWEEN -1500000 AND -700000 THEN 'zipfian' ELSE 'anomalous' END AS verdict
       |FROM ag ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------------
  // q168 — per-source HEALTH SCORECARD: the corpus-audit battery rolled up
  // to the table an ingest owner actually reads — per source the four
  // orthogonal health signals side by side (within-doc character entropy
  // q135, distinct-2 diversity q150, Zipf rank-frequency fit q151,
  // token-distribution drift vs the corpus mix q128) with a flag count
  // and a healthy/attention verdict. The q117/q158/q163 composition
  // pattern applied to corpus QUALITY: each signal catches a failure mode
  // the others are blind to (key-mash, mode collapse, templated feeds,
  // topical drift), and today a curator reads them from four reports.
  //
  // Exactness: the legs ARE the leg queries (shared code, so the views
  // cannot drift); q135's per-doc micro integer is recovered from its 6dp
  // output via the same floor(x*1e6+5e-1) both engines apply (exact —
  // the double is within 0.5 of the integer by construction), then the
  // per-source mean/flag-fraction are floored micros, the q105 rule.
  //
  // Scale shape: each leg is its own already-audited plan (one scan +
  // bounded aggregates); the scorecard assembly is four keyed joins over
  // |sources|-row frames. Verdict thresholds: entropy-flagged fraction
  // above 10%, or any leg's own detector firing, costs a flag.
  // ---------------------------------------------------------------------------
  private[operators] val HEALTH_ENT_BAD_MICRO = 100000L // >10% of docs entropy-flagged

  def q168SourceHealth(spark: SparkSession, dir: String): DataFrame = {
    // the tokenize leg IS tokenStage's normalization (size(toks) of the
    // shared staged table), and the entropy leg reads the staged per-doc
    // signal frame — the scorecard re-reads the session's materialized
    // stages instead of re-running both corpus passes per call
    val staged = tokenStage(spark, dir)
    val base = staged
      .select(col("source"), size(col("toks")).as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val ent = entropyStage(spark, dir)
      .join(staged.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("ent_micro", expr("CAST(floor(entropy_nats * 1e6 + 5e-1) AS BIGINT)"))
      .groupBy(col("source"))
      .agg(
        sum(col("ent_micro")).as("ent_sum"),
        count(lit(1)).as("n_ent"),
        sum(when(col("verdict") =!= "ok", 1L).otherwise(0L)).as("n_flagged")
      )
      .withColumn("mean_ent_micro", expr("CAST(floor(CAST(ent_sum AS double) / n_ent + 5e-1) AS BIGINT)"))
      .withColumn(
        "flag_micro",
        expr("CAST(floor(CAST(n_flagged AS double) * 1e6 / n_ent + 5e-1) AS BIGINT)")
      )
    val d2 = q150DistinctN(spark, dir)
      .filter(col("n") === 2)
      .select(col("source"), col("distinct_ratio").as("distinct2_ratio"), col("verdict").as("d2_verdict"))
    val zf = q151ZipfFit(spark, dir)
      .select(col("source"), col("zipf_slope"), col("verdict").as("zipf_verdict"))
    val dr = Importance
      .q128SourceDrift(spark, dir)
      .select(col("source"), col("js").as("js_drift"), col("drifted"))
    // legs 2-4 join LEFT: a source so degenerate a leg cannot score it
    // (all docs under 2 tokens -> no distinct-2 row; all-punctuation docs
    // -> no drift histogram) is exactly a source the scorecard must flag,
    // not silently drop — a missing leg costs the flag its detector would
    // (the entropy leg covers every doc unconditionally, so base |><| ent
    // stays inner)
    base
      .join(ent, "source")
      .join(d2, Seq("source"), "left")
      .join(zf, Seq("source"), "left")
      .join(dr, Seq("source"), "left")
      .withColumn(
        "n_flags",
        expr(
          s"CAST((CASE WHEN flag_micro > $HEALTH_ENT_BAD_MICRO THEN 1 ELSE 0 END)" +
            " + (CASE WHEN d2_verdict IS NULL OR d2_verdict = 'collapsed' THEN 1 ELSE 0 END)" +
            " + (CASE WHEN zipf_verdict IS NULL OR zipf_verdict = 'anomalous' THEN 1 ELSE 0 END)" +
            " + coalesce(drifted, 1) AS INT)"
        )
      )
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        (col("mean_ent_micro") / lit(1e6)).as("mean_entropy"),
        (col("flag_micro") / lit(1e6)).as("ent_flagged_frac"),
        col("distinct2_ratio"),
        col("zipf_slope"),
        col("js_drift"),
        col("n_flags"),
        when(col("n_flags") === 0, lit("healthy")).otherwise(lit("attention")).as("health")
      )
      .orderBy(col("source"))
  }

  /** Each leg's oracle nested as a derived table (the q163 splice rule:
    * concatenate already-stripped leg SQL between freshly stripped bridge
    * pieces, never re-stripMargin spliced text).
    */
  lazy val q168Oracle: String = {
    val head =
      """WITH base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |e0 AS (SELECT * FROM (""".stripMargin
    val afterEnt =
      s""")),
         |ent AS (
         |  SELECT d.source,
         |         CAST(floor(CAST(sum(CAST(floor(e0.entropy_nats * 1e6 + 5e-1) AS BIGINT)) AS DOUBLE) / count(*) + 5e-1) AS BIGINT) AS mean_ent_micro,
         |         CAST(floor(CAST(sum(CASE WHEN e0.verdict <> 'ok' THEN 1 ELSE 0 END) AS DOUBLE) * 1e6 / count(*) + 5e-1) AS BIGINT) AS flag_micro
         |  FROM e0 JOIN documents d USING (doc_id) GROUP BY 1),
         |d2 AS (SELECT source, distinct_ratio AS distinct2_ratio, verdict AS d2_verdict FROM (""".stripMargin
    val afterD2 =
      """) WHERE n = 2),
        |zf AS (SELECT source, zipf_slope, verdict AS zipf_verdict FROM (""".stripMargin
    val afterZf =
      """)),
        |dr AS (SELECT source, js AS js_drift, drifted FROM (""".stripMargin
    val tail =
      s""")),
         |f AS (
         |  SELECT base.source, n_docs, n_tokens, mean_ent_micro, flag_micro,
         |         distinct2_ratio, zipf_slope, js_drift,
         |         CAST((CASE WHEN flag_micro > $HEALTH_ENT_BAD_MICRO THEN 1 ELSE 0 END)
         |            + (CASE WHEN d2_verdict IS NULL OR d2_verdict = 'collapsed' THEN 1 ELSE 0 END)
         |            + (CASE WHEN zipf_verdict IS NULL OR zipf_verdict = 'anomalous' THEN 1 ELSE 0 END)
         |            + coalesce(drifted, 1) AS INT) AS n_flags
         |  FROM base JOIN ent USING (source) LEFT JOIN d2 USING (source)
         |       LEFT JOIN zf USING (source) LEFT JOIN dr USING (source))
         |SELECT source, n_docs, n_tokens,
         |       mean_ent_micro / 1e6 AS mean_entropy,
         |       flag_micro / 1e6 AS ent_flagged_frac,
         |       distinct2_ratio, zipf_slope, js_drift, n_flags,
         |       CASE WHEN n_flags = 0 THEN 'healthy' ELSE 'attention' END AS health
         |FROM f ORDER BY source""".stripMargin
    head + "\n" + q135Oracle + "\n" + afterEnt + "\n" + q150Oracle + "\n" + afterD2 + "\n" +
      q151Oracle + "\n" + afterZf + "\n" + Importance.q128Oracle + "\n" + tail
  }

  // ---------------------------------------------------------------------------
  // q157 — tokenizer FERTILITY DRIFT across ingest segments: per q137
  // id-range bucket, pieces-per-word under the q94-trained BPE vocabulary
  // next to the corpus average — the "tokenizer rot" monitor. A vocabulary
  // trained on an old snapshot compresses new data progressively worse as
  // the corpus drifts (new domains, new jargon), and rising fertility is
  // the direct cost signal: more pieces per word = more compute per token
  // of information. This is the production dial behind "when do we
  // retrain the tokenizer" — read per ingest segment, not per source
  // (q98's view), because rot is a TIME phenomenon.
  //
  // Scale shape: the tokenizer is the session-scoped artifact q98 already
  // builds (vocabulary-bounded word → piece-count map, broadcast); the
  // corpus pays one scan exploded to words joined against that broadcast —
  // q98's exact plan — plus the 1-row id-range and corpus-total scalars.
  // ---------------------------------------------------------------------------
  private val FERT_BUCKETS = 20 // q137's segment convention
  private val FERT_DRIFT_MICRO = 50000L // fertility > corpus + 5%: rotting

  def q157FertilityDrift(spark: SparkSession, dir: String): DataFrame = {
    val trained = trainedTokenizer.getOrBuild(spark, dir)(bpeTrainState(spark, dir, BPE_MERGES)._2)
    val wordTokens = trained.select(array_join(col("syms"), "").as("w"), size(col("syms")).as("n_pieces"))
    val docs = Tables.balanced(Tables.documents(spark, dir))
    val idRange = docs.agg(min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id")) // 1 row -> broadcast
    val per = docs
      .crossJoin(broadcast(idRange))
      .withColumn("bucket", expr(s"((doc_id - min_id) * $FERT_BUCKETS) div (max_id - min_id + 1)"))
      .select(
        col("bucket"),
        explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w")
      )
      .filter(length(col("w")) >= 1)
      // LEFT join: out-of-vocab words (the primary driver of tokenizer rot
      // — new jargon the trained vocab never saw) must be COUNTED, not
      // silently dropped by an inner join. Fertility stays an in-vocab
      // measure (pieces per tokenizable word); oov_frac carries the
      // new-jargon mass per bucket so a rotting segment shows in BOTH dials
      .join(broadcast(wordTokens), Seq("w"), "left")
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_all"),
        count(col("n_pieces")).as("n_words"), // non-null = in-vocab
        sum(col("n_pieces")).as("n_pieces")
      )
    per
      .crossJoin(broadcast(per.agg(sum(col("n_words")).as("tw"), sum(col("n_pieces")).as("tp"))))
      .withColumn("fert_micro", expr("CAST(floor(CAST(n_pieces AS double) * 1e6 / n_words + 5e-1) AS BIGINT)"))
      .withColumn("corpus_micro", expr("CAST(floor(CAST(tp AS double) * 1e6 / tw + 5e-1) AS BIGINT)"))
      .withColumn("oov_micro", expr("CAST(floor(CAST(n_all - n_words AS double) * 1e6 / n_all + 5e-1) AS BIGINT)"))
      .select(
        col("bucket").cast("int").as("bucket"),
        col("n_words"),
        col("n_pieces"),
        (col("oov_micro") / lit(1e6)).as("oov_frac"),
        (col("fert_micro") / lit(1e6)).as("fertility"),
        (col("corpus_micro") / lit(1e6)).as("corpus_fertility"),
        ((col("fert_micro") - col("corpus_micro")) / lit(1e6)).as("drift"),
        when(col("fert_micro") - col("corpus_micro") > FERT_DRIFT_MICRO, lit("rotting"))
          .otherwise(lit("ok"))
          .as("verdict")
      )
      .orderBy(col("bucket"))
  }

  /** q94's training chain + the tokenize-join (q98's splice), bucketed on
    * ingest order. Concatenated, not re-stripMargin'd (the chain holds
    * `||` continuation lines a second strip would eat).
    */
  lazy val q157Oracle: String = {
    val chain = q94Oracle.substring(0, q94Oracle.indexOf("\nSELECT 1 AS rank"))
    chain + ",\n" +
      s"""wordtok AS MATERIALIZED (
         |  SELECT array_to_string(syms, '') AS w, len(syms) AS n_pieces FROM words$BPE_MERGES),
         |mx AS (SELECT min(doc_id) AS min_id, max(doc_id) AS max_id FROM documents),
         |docw AS (
         |  SELECT ((doc_id - min_id) * $FERT_BUCKETS) // (max_id - min_id + 1) AS bucket,
         |         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents CROSS JOIN mx),
         |per AS (
         |  SELECT bucket, count(*) AS n_all, count(t.n_pieces) AS n_words,
         |         CAST(sum(t.n_pieces) AS BIGINT) AS n_pieces
         |  FROM docw d LEFT JOIN wordtok t USING (w) WHERE len(d.w) >= 1 GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_words) AS BIGINT) AS tw, CAST(sum(n_pieces) AS BIGINT) AS tp FROM per),
         |fin AS (
         |  SELECT bucket, n_words, n_pieces,
         |         CAST(floor(CAST(n_pieces AS DOUBLE) * 1e6 / n_words + 5e-1) AS BIGINT) AS fert_micro,
         |         CAST(floor(CAST(tp AS DOUBLE) * 1e6 / tw + 5e-1) AS BIGINT) AS corpus_micro,
         |         CAST(floor(CAST(n_all - n_words AS DOUBLE) * 1e6 / n_all + 5e-1) AS BIGINT) AS oov_micro
         |  FROM per CROSS JOIN tot)
         |SELECT CAST(bucket AS INT) AS bucket, CAST(n_words AS BIGINT) AS n_words, n_pieces,
         |       oov_micro / 1e6 AS oov_frac,
         |       fert_micro / 1e6 AS fertility, corpus_micro / 1e6 AS corpus_fertility,
         |       (fert_micro - corpus_micro) / 1e6 AS drift,
         |       CASE WHEN fert_micro - corpus_micro > $FERT_DRIFT_MICRO THEN 'rotting' ELSE 'ok' END AS verdict
         |FROM fin ORDER BY bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q150_distinct_n" -> (q150DistinctN _),
    "q151_zipf_fit" -> (q151ZipfFit _),
    "q168_source_health" -> (q168SourceHealth _),
    "q157_fertility_drift" -> (q157FertilityDrift _),
    "q165_tokenizer_budget" -> (q165TokenizerBudget _),
    "q127_heavy_hitters" -> (q127HeavyHitters _),
    "q25_lang_id" -> (q25LangId _),
    "q26_quality_score" -> (q26QualityScore _),
    "q27_token_counts" -> (q27TokenCounts _),
    "q28_fingerprint" -> (q28Fingerprint _),
    "q135_char_entropy" -> (q135CharEntropy _),
    "q54_fuzzy_names" -> (q54FuzzyNames _),
    "q62_tfidf" -> (q62TfIdf _),
    "q80_dynamic_threshold" -> (q80DynamicThreshold _),
    "q82_vocab_growth" -> (q82VocabGrowth _),
    "q91_chunking" -> (q91Chunking _),
    "q92_bpe_pairs" -> (q92BpePairs _),
    "q94_bpe_train" -> (q94BpeTrain _),
    "q98_bpe_apply" -> (q98BpeApply _),
    "q180_bpe_pack" -> (q180BpePack _)
  )

  val oracles: Map[String, String] = Map(
    "q150_distinct_n" -> q150Oracle,
    "q151_zipf_fit" -> q151Oracle,
    "q168_source_health" -> q168Oracle,
    "q157_fertility_drift" -> q157Oracle,
    "q165_tokenizer_budget" -> q165Oracle,
    "q127_heavy_hitters" -> q127Oracle,
    "q25_lang_id" -> q25Oracle,
    "q26_quality_score" -> q26Oracle,
    "q27_token_counts" -> q27Oracle,
    "q28_fingerprint" -> q28Oracle,
    "q135_char_entropy" -> q135Oracle,
    "q54_fuzzy_names" -> q54Oracle,
    "q62_tfidf" -> q62Oracle,
    "q80_dynamic_threshold" -> q80Oracle,
    "q82_vocab_growth" -> q82Oracle,
    "q91_chunking" -> q91Oracle,
    "q92_bpe_pairs" -> q92Oracle,
    "q94_bpe_train" -> q94Oracle,
    "q98_bpe_apply" -> q98Oracle,
    "q180_bpe_pack" -> q180Oracle
  )
}
