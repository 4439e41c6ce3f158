package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deduplication suite over `documents` / `embeddings` — exact, MinHash+LSH,
  * SimHash, token-set Jaccard, embedding-cosine. The reference has no dedup
  * (SURVEY §2.9 T7: none); this is the training-data-pipeline surface a
  * 100 TB corpus engine must have.
  *
  * Scale design:
  *   - Exact dedup is one hash-shuffle on the fingerprint (map-side partial
  *     counts first); survivors picked with min(doc_id), no window needed.
  *   - MinHash/SimHash signatures are pure per-row expression pipelines
  *     (higher-order functions over token arrays — no UDF, stays codegen'd).
  *     Candidate generation explodes b bands (small constant) and shuffles
  *     on (band, key): near-dup clusters land in the same bucket; everything
  *     else hashes apart, so the candidate join is ~linear, never the O(n²)
  *     cross-join a naive similarity pass would do.
  *   - The exact-verify stage joins shingle arrays back only for candidate
  *     pairs (tiny vs n²) — the LSH prune + exact verify structure is what
  *     survives a 1000-executor corpus.
  *   - Embedding near-dup at calibrated threshold is a brute self-join here
  *     (the synthetic vectors are near-orthogonal: max cos ≈ 0.51, so a real
  *     0.95 near-dup threshold matches nothing); the sub-quadratic ANN path
  *     (hyperplane LSH) lives in Similarity.q35.
  */
object Dedup {

  /** Whitespace-normalized lowercase text — the canonical dedup form. */
  private val normText: Column = regexp_replace(lower(trim(col("text"))), "\\s+", " ")

  private val tokenHashes: Column = expr("transform(split(norm_text, ' '), t -> xxhash64(t))")

  /** 3-word shingle hashes as the native one-pass `shingle_hashes`
    * (graft.functions): sorted distinct triple-hashes, no per-shingle string
    * building, no nested-lambda re-evaluation. Sorted output feeds
    * sorted_intersect_count and minhash_sigs16 directly.
    */
  private val shingleHashes: Column = expr("shingle_hashes(th)")

  // ---------------------------------------------------------------------------
  // q29 — exact deduplication (hash-groupBy): one survivor (min doc_id) per
  // normalized-text fingerprint. Output keeps group size so collapsed mass is
  // auditable. Single shuffle on the md5 key.
  // ---------------------------------------------------------------------------
  def q29ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("fingerprint", md5(normText))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("survivor_doc_id"), count(lit(1)).as("n_copies"))
      .select(col("survivor_doc_id"), col("fingerprint"), col("n_copies"))
      .orderBy(col("survivor_doc_id"))

  val q29Oracle: String =
    """SELECT min(doc_id) AS survivor_doc_id,
      |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |       count(*) AS n_copies
      |FROM documents
      |GROUP BY 2
      |ORDER BY survivor_doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q30 — MinHash + LSH near-duplicate pairs. k=16 permutations, 8 bands ×
  // 2 rows → candidates → exact shingle Jaccard verify >= 0.5 (sorted
  // two-pointer merge). ORACLE-GATED since r15 via q134's md5-affine
  // discipline: the default signature path hashes each 3-word shingle ONCE
  // with md5 (base integer x = first 15 hex digits, reduced mod the
  // Mersenne prime p = 2^31-1) and derives the 16 permutations as
  // (a_h·x + b_h) mod p with q134's published literal multipliers — every
  // step (signature mins, band-tuple candidate join, exact-Jaccard verify
  // over the 60-bit shingle keys) replays verbatim in DuckDB, so the
  // banded computation itself is the oracle (candidates INCLUDED: both
  // engines derive the identical candidate set, so the gate needs no
  // recall argument). The pre-r15 xxhash64 + native-minhash_sigs16 path
  // survives as the SERVING twin under `graft.dedup.minhash=native`
  // (the q121→q125 discipline inverted: the registered query is the
  // replayable one) — same plan shape, one hash call per shingle either
  // way; the native expression saves only the md5-vs-xxhash constant.
  // ---------------------------------------------------------------------------
  private val K = 16
  private val BANDS = 8
  private val ROWS_PER_BAND = K / BANDS

  /** Signature-path knob: `md5` (default — the oracle-replayable affine
    * construction) or `native` (xxhash64 shingles + the codegen'd
    * minhash_sigs16 expression, the pre-r15 serving path).
    */
  val MinhashConf = "graft.dedup.minhash"

  private def minhashPath(spark: SparkSession): String =
    spark.conf.getOption(MinhashConf).map(_.trim.toLowerCase).filter(_.nonEmpty) match {
      case None | Some("md5")  => "md5"
      case Some("native")      => "native"
      case Some(other) =>
        throw new IllegalArgumentException(s"$MinhashConf must be md5 or native, got '$other'")
    }

  /** md5-affine signatures: doc_id, sh (sorted distinct 60-bit md5 shingle
    * keys — the verify universe), sig (K affine-permutation mins). One md5
    * per distinct (doc, shingle); the K mins are K integer expressions in
    * one aggregate pass (the q134 shape at doc grain).
    */
  private def md5Signatures(spark: SparkSession, dir: String): DataFrame = {
    val p = Curation.SKETCH_P
    val sh = Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("norm_text", normText)
      .withColumn("toks", split(col("norm_text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        explode(expr("transform(sequence(1, size(toks) - 2), i -> array_join(slice(toks, i, 3), ' '))"))
          .as("shingle")
      )
      .distinct()
      .withColumn("xs", expr("cast(conv(substring(md5(shingle), 1, 15), 16, 10) AS bigint)"))
      .select(col("doc_id"), col("xs"))
      .distinct() // md5-prefix collisions collapse identically in both engines
      .withColumn("x", col("xs") % p)
    val mins = (0 until K).map(h =>
      min(expr(s"(${Curation.sketchA(h)}L * x + ${Curation.sketchB(h)}L) % $p")).as(s"m$h")
    )
    sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("xs"))).as("sh"), mins: _*)
      .select(col("doc_id"), col("sh"), array((0 until K).map(h => col(s"m$h")): _*).as("sig"))
  }

  /** Band tuples for the md5 path: band b's key is the VALUE PAIR
    * (sig[2b], sig[2b+1]) — no engine-private hash in the key, so the
    * oracle joins on the same tuples. Shared by q30's self-join and
    * q113's cross-split join.
    */
  private def md5BandTuples(sigs: DataFrame): DataFrame =
    sigs
      .select(
        col("doc_id"),
        explode(expr(
          s"transform(sequence(0, ${BANDS - 1}), b -> struct(b AS band, sig[b * $ROWS_PER_BAND] AS v0, sig[b * $ROWS_PER_BAND + 1] AS v1))"
        )).as("bk")
      )
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.v0").as("v0"), col("bk.v1").as("v1"))

  /** q30's candidate join with the verify's size-ratio conjunct applied
    * BEFORE the distinct (the q113 lesson, r16): floored/rounded
    * jaccard >= 0.5 requires raw j >= 0.4999995, and j <= min(sz)/max(sz),
    * so a 0.499 ratio prune rejects nothing the verify would keep — the
    * final rows (what the oracle gates) are identical, but size-skewed
    * band collisions never reach the distinct's shuffle. `szCol` is the
    * per-doc shingle-set size of whichever signature path is running.
    */
  private def q30BandCandidates(sigs: DataFrame, bandRows: DataFrame => DataFrame, szCol: Column): DataFrame = {
    val bands = bandRows(sigs).join(sigs.select(col("doc_id"), szCol.as("sz")), "doc_id")
    val keys = bands.columns.filter(c => c != "doc_id" && c != "sz").toSeq
    bands
      .as("l")
      .join(bands.as("r"), keys)
      .filter(
        col("l.doc_id") < col("r.doc_id") &&
          col("l.sz") * 0.499 <= col("r.sz") && col("r.sz") * 0.499 <= col("l.sz")
      )
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** doc_id, shingles (sorted distinct array<long>), sig (K minhashes). */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("norm_text", normText)
      .withColumn("th", tokenHashes)
      .withColumn("shingles", shingleHashes)
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", expr("minhash_sigs16(shingles)"))
      .select(col("doc_id"), col("shingles"), col("sig"))
  }

  /** Banded-LSH candidate pairs (doc_a < doc_b, distinct) from a signature
    * frame: explode b band keys, equi-join on (band, key). ~Linear for
    * hash-spread corpora — the shared candidate miner behind q30's
    * shingle-verified pairs and q101's token-verified dup-cluster graph.
    */
  /** (doc_id, band, key) LSH bucket rows for a (doc_id, sig) frame — the
    * persistable index shape: a delta of new docs probes these buckets
    * instead of re-mining the corpus. Any EXTRA input columns (sz, lang)
    * ride along unchanged, so candidate miners can apply their cheap
    * verify-implied conjuncts BEFORE the candidate distinct (the q30/q113
    * prune discipline) without a second join back to the corpus.
    */
  private[graft] def bandBuckets(sigs: DataFrame): DataFrame = {
    // band key = hash of the band's signature slice; explode to (band, key, doc)
    val bandCols = (0 until BANDS).map { b =>
      val slice = (0 until ROWS_PER_BAND).map(r => s"sig[${b * ROWS_PER_BAND + r}]").mkString(", ")
      expr(s"named_struct('band', $b, 'key', xxhash64($b, $slice))")
    }
    val carry = sigs.columns.filter(_ != "sig").map(col)
    sigs
      .select(carry :+ explode(array(bandCols: _*)).as("bk"): _*)
      .select(carry :+ col("bk.band").as("band") :+ col("bk.key").as("key"): _*)
  }

  /** Candidate pairs for the token-MinHash miner, with the verify's two
    * CHEAP implied conjuncts applied BEFORE the distinct (the q30/q113
    * prune discipline, guide §2.3 "shuffle fewer bytes"): the verify
    * requires lang_a == lang_b and token-jaccard >= 0.8, and j <=
    * min(sz)/max(sz), so cross-language or size-ratio-< 0.8 collisions can
    * never become edges — dropping them here shrinks the distinct's
    * exchange (measured at sf0.1: 10.9M candidates, only 0.76M verified
    * edges) and the verify join's probe side. lang rides as an extra
    * equi-key, which also SPLITS any hot (band, key) bucket by language.
    * Semantics-free on the edge set: every removed pair fails the verify.
    */
  private[graft] def minhashCandidates(sigs: DataFrame): DataFrame = {
    val buckets = bandBuckets(sigs)
    buckets
      .as("l")
      .join(
        buckets.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.lang") === col("r.lang") &&
          col("l.doc_id") < col("r.doc_id") &&
          col("l.sz") * 0.8 <= col("r.sz") &&
          col("r.sz") * 0.8 <= col("l.sz")
      )
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  def q30MinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark) // sorted_intersect_count on both paths
    // localCheckpoint: the signature pipeline feeds THREE consumers below
    // (buckets, sh_a, sh_b) — round 1 recomputed the full shingle/minhash
    // pass for each. Eager checkpoint runs it ONCE into executor storage
    // (MEMORY_AND_DISK) with lineage truncated; the blocks are reclaimed by
    // the ContextCleaner when the DF becomes unreachable, so nothing pins
    // storage for the session the way a .cache() we can't unpersist would.
    if (minhashPath(spark) == "native") {
      val sigs = signatures(spark, dir).localCheckpoint()
      val candidates =
        q30BandCandidates(sigs, s => bandBuckets(s.select(col("doc_id"), col("sig"))), size(col("shingles")))
      val sa = sigs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
      val sb = sigs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
      // shingle arrays are sorted-distinct → zero-allocation merge intersect
      val inter = expr("sorted_intersect_count(sh_a, sh_b)").cast("double")
      candidates
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", round(inter / (size(col("sh_a")) + size(col("sh_b")) - inter), 6))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    } else {
      val sigs = md5Signatures(spark, dir).localCheckpoint()
      val candidates =
        q30BandCandidates(sigs, s => md5BandTuples(s.select(col("doc_id"), col("sig"))), size(col("sh")))
      val sa = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val sb = sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      candidates
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("i", expr("sorted_intersect_count(sh_a, sh_b)"))
        .withColumn(
          "jaccard",
          expr("floor(CAST(i AS DOUBLE) * 1e6 / (size(sh_a) + size(sh_b) - i) + 5e-1) / 1e6")
        )
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  }

  /** The banded computation replayed outright: one md5 per distinct
    * (doc, shingle), q134's literal multipliers, band-tuple equality for
    * candidates, exact Jaccard over the 60-bit keys — identical candidate
    * set and identical floored micros in both engines.
    */
  lazy val q30Oracle: String = {
    val p = Curation.SKETCH_P
    val aLits = (0 until K).map(Curation.sketchA).mkString(", ")
    val bLits = (0 until K).map(Curation.sketchB).mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS shingle
       |  FROM t WHERE len(toks) >= 3),
       |shd AS (
       |  SELECT DISTINCT doc_id, ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS xs FROM sh),
       |sig AS (
       |  SELECT doc_id, h.range AS h,
       |         min((list_extract([$aLits], h.range::INT + 1) * (xs % $p)
       |              + list_extract([$bLits], h.range::INT + 1)) % $p) AS comp
       |  FROM shd CROSS JOIN range($K) h GROUP BY 1, 2),
       |bnd AS (
       |  SELECT s0.doc_id, CAST(s0.h // 2 AS INT) AS band, s0.comp AS v0, s1.comp AS v1
       |  FROM sig s0 JOIN sig s1 ON s1.doc_id = s0.doc_id AND s1.h = s0.h + 1
       |  WHERE s0.h % 2 = 0),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bnd l JOIN bnd r ON l.band = r.band AND l.v0 = r.v0 AND l.v1 = r.v1 AND l.doc_id < r.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
       |ix AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cand c JOIN shd a ON a.doc_id = c.doc_a JOIN shd b ON b.doc_id = c.doc_b AND b.xs = a.xs
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT c.doc_a, c.doc_b,
       |         floor(CAST(coalesce(ix.i, 0) AS DOUBLE) * 1e6 / (sa.n + sb.n - coalesce(ix.i, 0)) + 5e-1) / 1e6 AS jaccard
       |  FROM cand c
       |  LEFT JOIN ix ON ix.doc_a = c.doc_a AND ix.doc_b = c.doc_b
       |  JOIN sz sa ON sa.doc_id = c.doc_a JOIN sz sb ON sb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q31 — SimHash near-duplicates: signature from token-multiset hashes
  // (frequency-weighted by construction), candidates from any shared
  // 16-bit chunk (4 tables), verified with bit_count hamming <= 6.
  // ORACLE-GATED since r15, the q30 discipline: the default path hashes
  // each TOKEN with md5 (60-bit prefix), and the per-bit majority vote,
  // the chunk-equality candidate join, and the hamming verify all replay
  // in DuckDB (the signature is a 60-column sum aggregate there; here one
  // codegen'd simhash64 pass over the md5 longs — bits 60-63 vote
  // unanimously 0 in both engines, so the 64-bit container is exact).
  // Candidate REPLAY makes the gate sound without any recall argument —
  // the 4x16 chunk scheme is honest sub-1-recall LSH (6 bits can spread
  // 2+2+1+1 over 4 chunks), and both engines derive the identical
  // candidate set. The xxhash64 signature path stays the serving twin
  // under `graft.dedup.simhash=native` (saves the md5-vs-xxhash constant;
  // signatures differ per hash, so the twin is floor-pinned, not
  // equality-pinned — hamming is hash-dependent, unlike q30's Jaccard).
  // ---------------------------------------------------------------------------
  val SimhashConf = "graft.dedup.simhash"

  private def simhashPath(spark: SparkSession): String =
    spark.conf.getOption(SimhashConf).map(_.trim.toLowerCase).filter(_.nonEmpty) match {
      case None | Some("md5") => "md5"
      case Some("native")     => "native"
      case Some(other) =>
        throw new IllegalArgumentException(s"$SimhashConf must be md5 or native, got '$other'")
    }

  private def simhashed(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    val th =
      if (simhashPath(spark) == "native") tokenHashes
      else expr("transform(split(norm_text, ' '), t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint))")
    Tables
      .balanced(Tables.documents(spark, dir))
      .withColumn("norm_text", normText)
      .withColumn("th", th)
      .filter(size(col("th")) > 0)
      // bit b of the signature = sign of sum over tokens of (+1/-1 at bit b);
      // one codegen'd pass (graft.functions.SimHash64) instead of a 64-way
      // nested interpreted aggregate.
      .withColumn("simhash", expr("simhash64(th)"))
      .withColumn(
        "chunks",
        expr("transform(sequence(0, 3), c -> named_struct('c', c, 'v', (simhash >> (c * 16)) & 65535))")
      )
      .select(col("doc_id"), col("simhash"), col("chunks"))
  }

  /** The md5 path replayed outright: 60 per-bit majority sums (the
    * SimHash64 convention — bit set iff the vote is STRICTLY positive),
    * chunk-tuple candidates, xor/bit_count verify.
    */
  lazy val q31Oracle: String = {
    val sums = (0 until 60)
      .map(b => s"sum(CASE WHEN (x >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n  ")
    val bits = (0 until 60).map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |tx AS (
       |  SELECT doc_id, ('0x' || substring(md5(unnest(toks)), 1, 15))::BIGINT AS x FROM t),
       |s AS (
       |  SELECT doc_id,
       |  $sums
       |  FROM tx GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM s),
       |ck AS (
       |  SELECT doc_id, simhash, CAST(c.range AS INT) AS c, (simhash >> (c.range * 16)) & 65535 AS v
       |  FROM sig CROSS JOIN range(4) c),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l.simhash AS ha, r.simhash AS hb
       |  FROM ck l JOIN ck r ON l.c = r.c AND l.v = r.v AND l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  def q31SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhashed(spark, dir).localCheckpoint() // one pass — see q30 note
    val buckets = sh
      .select(col("doc_id"), col("simhash"), explode(col("chunks")).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.c").as("c"), col("ck.v").as("v"))
    buckets
      .as("l")
      .join(buckets.as("r"), Seq("c", "v"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(
        col("l.doc_id").as("doc_a"),
        col("r.doc_id").as("doc_b"),
        col("l.simhash").as("sh_a"),
        col("r.simhash").as("sh_b")
      )
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= 6)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------------------
  // q32 — exact token-set Jaccard pairs within language groups (the verify
  // primitive as a standalone, SQL-expressible operator). Grouping by lang
  // bounds the pair space; the real prune at scale is q30/q31's LSH.
  // ---------------------------------------------------------------------------
  def q32TokenJaccard(spark: SparkSession, dir: String): DataFrame =
    tokenJaccardPairs(spark, dir).orderBy(col("lang"), col("doc_a"), col("doc_b"))

  /** q32's pair set WITHOUT the presentation sort — the form consumers
    * (q61's cluster propagation, the cached pair graph) actually want: a
    * global sort of the edge list buys nothing downstream.
    */
  /** Token sets as SORTED xxhash64 arrays: sorting is paid once per
    * document; each pair is then one zero-allocation two-pointer merge via
    * the codegen'd sorted_intersect_count (graft.functions) instead of
    * array_intersect's per-pair hash-set build. Shared by the exact
    * all-pairs miner (q32) and the MinHash-candidate verify (q101's graph).
    */
  private def tokenSets(spark: SparkSession, dir: String): DataFrame =
    tokenSetsFrom(spark, Tables.balanced(Tables.documents(spark, dir)))

  /** Frame-based form of the token-set pipeline — the streaming maintainer
    * feeds it delta slices instead of a directory.
    */
  private[graft] def tokenSetsFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    docs
      .withColumn("toks", expr("array_sort(array_distinct(transform(split(" +
        "regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '), t -> xxhash64(t))))"))
      .withColumn("sz", size(col("toks")))
      .select(col("lang"), col("doc_id"), col("toks"), col("sz"))
  }

  private[operators] def tokenJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    tokenJaccardPairsAt(spark, dir, 0.8)

  /** The exact pair miner at an arbitrary jaccard floor — q32 at 0.8, the
    * q133 threshold sweep at its grid minimum.
    */
  private[operators] def tokenJaccardPairsAt(spark: SparkSession, dir: String, minJac: Double): DataFrame =
    tokenJaccardPairsFrom(tokenSets(spark, dir), minJac)

  /** The miner over ANY (lang, doc_id, toks, sz) token-set frame — shared
    * by the batch path and [[graft.streaming.StreamingDecontam]]'s serve
    * path (which reads the cluster maintainer's toks slices).
    */
  private[graft] def tokenJaccardPairsFrom(docs: DataFrame, minJac: Double): DataFrame = {
    graft.functions.VecFunctions.install(docs.sparkSession)
    // ALL predicates live in the join condition, cheap-first: generated code
    // evaluates conjuncts left-to-right, so the integer size-ratio prune
    // (jaccard <= min(sz)/max(sz), hence jaccard >= minJac ⇒ sizes within
    // minJac×) rejects most pairs before the merge runs. A separate .filter
    // would be pushed by Catalyst and PREPENDED to the join condition —
    // putting the expensive work first for every pair (measured 105 s vs
    // 44 s at sf0.1 even with array_intersect; ~7 s with the merge).
    val inter = expr("sorted_intersect_count(l.toks, r.toks)").cast("double")
    val jaccard = inter / (col("l.sz") + col("r.sz") - inter)
    docs
      .as("l")
      .join(
        docs.as("r"),
        col("l.lang") === col("r.lang") &&
          col("l.doc_id") < col("r.doc_id") &&
          col("l.sz") * minJac <= col("r.sz") &&
          col("r.sz") * minJac <= col("l.sz") &&
          jaccard >= minJac
      )
      .select(
        col("l.lang").as("lang"),
        col("l.doc_id").as("doc_a"),
        col("r.doc_id").as("doc_b"),
        round(jaccard, 6).as("jaccard")
      )
  }

  val q32Oracle: String =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |         list_distinct(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS toks
      |  FROM documents)
      |SELECT l.lang AS lang, l.doc_id AS doc_a, r.doc_id AS doc_b,
      |       round(len(list_intersect(l.toks, r.toks))::DOUBLE
      |             / len(list_distinct(list_concat(l.toks, r.toks))), 6) AS jaccard
      |FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
      |WHERE len(list_intersect(l.toks, r.toks))::DOUBLE
      |      / len(list_distinct(list_concat(l.toks, r.toks))) >= 0.8
      |ORDER BY lang, doc_a, doc_b""".stripMargin
  // (the size-ratio prune is an optimization, not a semantics change: any
  // pair it removes has jaccard <= min(sz)/max(sz) < 0.8, so the oracle —
  // which applies only the jaccard threshold — returns the identical set)

  // ---------------------------------------------------------------------------
  // q33 — embedding-cosine near-duplicate pairs, EXACT, as a grid-blocked
  // all-pairs equi-join. The naive form (`l.join(r, vec_a < vec_b && dot >=
  // t)`) has no equi key, so Spark plans a BroadcastNestedLoopJoin — a
  // cartesian that requires one side to fit in a broadcast and runs the
  // whole O(n²) on however many tasks the streamed side has. The grid form
  // replicates each side over B block ids and joins on the (gl, gr) cell
  // key: a ShuffledHash/SortMerge join that spreads the SAME O(n²) compute
  // evenly over B² shuffle partitions — no broadcast of the corpus, no
  // cartesian node, arbitrarily scalable executor-count-wise. Each unordered
  // pair lands in exactly ONE cell: (block(a), block(b)) with the vec_a <
  // vec_b orientation. Dot products are the codegen'd `vec_dot` (measured
  // 132 s → ~8 s at sf0.1 vs interpreted HOF lambdas).
  //
  // Exactness costs O(n²) by nature — that is q33's contract (it IS the
  // oracle-checkable ground truth). The sub-quadratic scale path over the
  // same data is q60: LSH-bucketed candidates + exact verify, recall < 1.
  // ---------------------------------------------------------------------------
  private val GRID_B = 8

  /** Grid-blocked exact near-dup over any (vec_id, embedding) frame at
    * `threshold` — the q33 machinery, corpus-parametric so the planted
    * clustered eval corpus (Similarity.plantedCorpus) reuses it as ground
    * truth. The vec_id-block cover is data-independent: every unordered
    * pair lands in exactly one (gl, gr) cell, so exactness holds for any
    * input.
    */
  private[operators] def exactNearDupFrom(spark: SparkSession, embSrc: DataFrame, threshold: Double): DataFrame = {
    // Normalize each vector ONCE (O(n·d)) so the O(n²) pair stage is a single
    // dot product. cosine(a,b) ≡ dot(a/|a|, b/|b|); the oracle normalizes
    // identically.
    graft.functions.VecFunctions.install(spark)
    val emb = Tables
      .balanced(embSrc)
      .withColumn(
        "nrm",
        expr("sqrt(aggregate(embedding, 0D, (a, e) -> a + cast(e AS double) * cast(e AS double)))")
      )
      .withColumn("unit", expr("transform(embedding, x -> cast(x AS double) / nrm)"))
      .withColumn("blk", pmod(col("vec_id"), lit(GRID_B)).cast("int"))
    val partner = explode(expr(s"sequence(0, ${GRID_B - 1})"))
    val l = emb.select(col("vec_id").as("vec_a"), col("unit").as("ua"), col("blk").as("gl"))
      .withColumn("gr", partner)
      .as("l")
    val r = emb.select(col("vec_id").as("vec_b"), col("unit").as("ub"), col("blk").as("gr"))
      .withColumn("gl", partner)
      .as("r")
    l.join(
        r,
        col("l.gl") === col("r.gl") && col("l.gr") === col("r.gr") &&
          col("vec_a") < col("vec_b") && expr("vec_dot(ua, ub)") >= threshold
      )
      .select(col("vec_a"), col("vec_b"), round(expr("vec_dot(ua, ub)"), 6).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  def q33EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    exactNearDupFrom(spark, Tables.embeddings(spark, dir), 0.45)

  val q33Oracle: String =
    """WITH t AS (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |           x -> x::DOUBLE / sqrt(list_sum(list_transform(embedding, e -> e::DOUBLE * e::DOUBLE)))) AS unit
      |  FROM embeddings)
      |SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
      |       round(list_sum(list_transform(list_zip(l.unit, r.unit), z -> z[1] * z[2])), 6) AS cosine
      |FROM t l JOIN t r ON l.vec_id < r.vec_id
      |WHERE list_sum(list_transform(list_zip(l.unit, r.unit), z -> z[1] * z[2])) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------------------
  // q60 — embedding near-dup via hyperplane-LSH candidates + exact verify:
  // the sub-quadratic scale path over the same data as q33. Candidate pairs
  // = corpus vectors sharing any (table, bucket) in the shared LSH index
  // (Similarity.buildLshIndex — built once per session, reused by q35);
  // exact cosine is computed on candidates ONLY. Reported pairs are always a
  // SUBSET of q33's exact output (precision 1); recall < 1 is the ANN trade
  // — DedupSpec pins it against q33 at sf0.001. Plan shape: bucket
  // equi-join, never a cartesian/BNLJ.
  // ---------------------------------------------------------------------------
  /** LSH-candidate near-dup over any prebuilt LSH index at `threshold` —
    * the q60 machinery, index-parametric so the planted clustered eval
    * corpus reuses it against [[exactNearDupFrom]] ground truth.
    */
  private[operators] def lshNearDupFrom(idx: DataFrame, threshold: Double): DataFrame = {
    val l = idx.select(col("t"), col("b"), col("vec_id").as("vec_a"), col("vb").as("ua"), col("cbs").as("a_bs"))
    val r = idx.select(col("t"), col("b"), col("vec_id").as("vec_b"), col("vb").as("ub"), col("cbs").as("b_bs"))
    l.as("l")
      .join(r.as("r"), col("l.t") === col("r.t") && col("l.b") === col("r.b") && col("vec_a") < col("vec_b"))
      // a pair can collide in several tables: keep it only at the FIRST
      // colliding table — exact dedup as a predicate, no shuffle
      .filter(Similarity.firstCollision("a_bs", "b_bs", tCol = "l.t"))
      .withColumn("cosine", expr("vec_dot(ua, ub)"))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  def q60LshNearDup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    lshNearDupFrom(Similarity.buildLshIndex(spark, dir), 0.45)
  }

  // -- planted-clusters near-dup eval (see Similarity.plantedCorpus) -----------
  // The uniform corpus has no true near-dups above ~0.51 cosine, so q60's
  // measured recall there tracks scanned fraction, not algorithm quality.
  // On the planted corpus, within-cluster pairs sit at cos ≈ 0.9: the 0.8
  // threshold selects exactly the planted structure, and LSH recall against
  // the exact grid-blocked baseline is the meaningful number the bench
  // reports as q60_recall.
  private val PLANTED_NEARDUP_THRESHOLD = 0.8

  /** Exact near-dup ground truth on the planted clustered corpus. */
  def plantedExactNearDup(spark: SparkSession, dir: String): DataFrame =
    exactNearDupFrom(spark, Similarity.plantedCorpus(spark, dir), PLANTED_NEARDUP_THRESHOLD)

  /** q60's pipeline on the planted clustered corpus. */
  def plantedLshNearDup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    lshNearDupFrom(Similarity.buildPlantedLshIndex(spark, dir), PLANTED_NEARDUP_THRESHOLD)
  }

  // ---------------------------------------------------------------------------
  // q61 — duplicate CLUSTERS: connected components over the exact near-dup
  // pair graph (q32's edges), labeling every involved doc with the minimum
  // doc_id of its component — the canonical-representative step a dedup
  // pipeline actually ships (pairs alone don't tell you which doc to keep).
  //
  // Algorithm: distributed min-label propagation with a FRONTIER. Each round
  // joins the edge list against only the labels that CHANGED last round (not
  // all labels — on near-clique similarity graphs the frontier collapses
  // after round 1), takes the per-node min offer, and merges it with the
  // current labels in one materialized pass that also yields the changed
  // count — so convergence is known the round it happens, with no extra
  // signature-repeat round. Nothing reaches the driver but that one count.
  // The frontier side is explicitly broadcast only when the driver-known
  // changed count says it is small (initial round and corpus-scale frontiers
  // shuffle normally). Rounds = graph diameter; >= 0.8 Jaccard graphs are
  // near-cliques (diameter 1-3). (For adversarial long-chain graphs the same
  // loop slots in pointer-doubling / large-star-small-star [Kiveris et al.,
  // "Connected Components in MapReduce"] for O(log n) rounds — not needed
  // for near-dup topology.) localCheckpoint per round truncates the
  // otherwise-exponential lineage; the pair graph itself comes from the
  // session-scoped cache (built once, shared with repeat runs — the artifact
  // a 100 TB dedup pipeline would persist as a table).
  // ---------------------------------------------------------------------------
  /** Doubled-edge frames as session artifacts: the repeat consumers of the
    * two cluster queries (Bench's median-of-N repeats, the SelfCheck
    * equality passes, q99/q102/q106-q108's label caches) would otherwise
    * re-run the doubling job and stack another checkpoint per call.
    */
  private val exactEdgesCache = new SessionCache[DataFrame]
  private val lshEdgesCache = new SessionCache[DataFrame]

  def q61DupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersFromEdges(exactEdgesCache.getOrBuild(spark, dir)(doubledEdges(buildPairGraph(spark, dir))))

  /** Connected components over ANY undirected pair frame (doc_a, doc_b) —
    * the propagation loop parametrized over its edge supply, so exact pair
    * graphs (q61) and sub-quadratic LSH-mined graphs (q101) cluster through
    * the same scale-safe machinery. Returns (doc_id, cluster, cluster_size)
    * with cluster = min doc_id of the component, ordered (cluster, doc_id).
    */
  /** Both-direction expansion, materialized once: the propagation loop
    * scans it every round, so paying one doubling job beats re-reading the
    * pair frame twice per round through a lazy union.
    */
  private def doubledEdges(pairs: DataFrame): DataFrame =
    pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .localCheckpoint()

  private[operators] def clustersFrom(pairs: DataFrame): DataFrame =
    clustersFromEdges(doubledEdges(pairs))

  private def clustersFromEdges(edges: DataFrame): DataFrame = {
    // Round 1 runs against IDENTITY labels (label(node) == node), so its
    // offer join collapses to a direct (dst, min src) aggregate, and the
    // label table needs no separate init pass at all: edges are doubled,
    // so every node occurs as dst and best0 already covers every node.
    // An empty pair graph yields an empty round-1 frame and the loop exits
    // after one cheap round with the correctly-schemed empty fixpoint.
    var improved = edges
      .select(col("dst").as("n"), col("src").as("cand"))
      .groupBy(col("n"))
      .agg(min(col("cand")).as("cand"))
      .select(col("n").as("node"), col("n").as("old"), least(col("n"), col("cand")).as("lbl"))
    var labels: DataFrame = null
    var changed = -1L
    while (changed != 0L) {
      // pointer jump: follow one label indirection — label(label(node)).
      // Every label IS a node id of the same component (labels start as own
      // ids and only ever move to a component-mate's min), so the self-join
      // always resolves and only shrinks labels further; on chain topologies
      // this halves the remaining rounds per round (O(log d) total).
      val jump = improved.select(col("node").as("jn"), col("lbl").as("jl"))
      // one eager materialization per round serves the new labels, the next
      // frontier, AND the convergence count — labels only ever decrease, so
      // label < old is exactly "changed this round"
      val merged = improved
        .join(jump, improved("lbl") === col("jn"), "left")
        .select(col("node"), col("old"), coalesce(col("jl"), col("lbl")).as("label"))
        .localCheckpoint()
      changed = merged.filter(col("label") < col("old")).count()
      labels = merged.select(col("node"), col("label"))
      if (changed != 0L) {
        val frontier = merged.filter(col("label") < col("old")).select(col("node"), col("label"))
        // offers: frontier labels pushed one hop; broadcast the frontier
        // only when last round's changed count proves it small (scale-safe:
        // a corpus-sized frontier takes the shuffle path)
        val fSide = if (changed <= 1000000L) broadcast(frontier) else frontier
        val best = edges
          .join(fSide, edges("src") === fSide("node"))
          .select(col("dst").as("n"), col("label").as("cand"))
          .groupBy(col("n"))
          .agg(min(col("cand")).as("cand"))
        improved = labels
          .join(best, labels("node") === best("n"), "left")
          .select(col("node"), col("label").as("old"), least(col("label"), col("cand")).as("lbl"))
      }
    }
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster"), col("cluster_size"))
      .orderBy(col("cluster"), col("doc_id"))
  }

  // -- session-scoped verified pair graph --------------------------------------
  private val pairGraphCache = new SessionCache[DataFrame]

  /** The verified near-dup pair graph — q32's edge set (doc_a, doc_b),
    * unsorted — built once per (session, dir) and materialized via
    * localCheckpoint. q61's propagation loop reads it every round, and
    * repeat runs in a session reuse it; at 100 TB this is the intermediate
    * a dedup pipeline persists as a table between the pair-mining and
    * clustering stages.
    */
  def buildPairGraph(spark: SparkSession, dir: String): DataFrame =
    pairGraphCache.getOrBuild(spark, dir) {
      tokenJaccardPairs(spark, dir).select(col("doc_a"), col("doc_b")).localCheckpoint()
    }

  // ---------------------------------------------------------------------------
  // q101 — dup clusters over the SUB-QUADRATIC pair graph: the 100-TB dedup
  // path. Candidate pairs come from q30's banded MinHash buckets (equi-join,
  // ~linear — never the per-language all-pairs join q61's exact graph pays),
  // then each candidate is verified with the SAME token-set Jaccard >= 0.8
  // within-language predicate as q32, so every q101 edge is a true q32 edge
  // (pair precision 1) and every q101 cluster is contained in a q61 cluster.
  // Recall < 1 is the LSH trade (a true pair whose signatures collide in no
  // band is missed); DedupSpec pins both properties against exact q61 and
  // Verify's self-check manifest re-measures them each run. Same propagation
  // loop as q61 via clustersFrom — only the edge supply changes.
  //
  // The signatures here are MinHash over the TOKEN sets (not q30's 3-word
  // shingles): the verify predicate is order-insensitive token Jaccard, and
  // shingles are order-sensitive — two docs sharing 80% of tokens in a
  // different order share almost no shingles, so shingle signatures would
  // miss them (measured: co-cluster recall 0.0006). Token MinHash estimates
  // the verified quantity directly: a 2-row band collides with prob j² =
  // 0.64 at the 0.8 threshold → 1-(1-0.64)^8 ≈ 0.997 per-edge recall, and
  // cluster transitivity repairs most residual missing edges.
  // ---------------------------------------------------------------------------
  // session-scoped like buildPairGraph: the mined+verified edge set is the
  // artifact a pipeline persists between pair mining and clustering, and
  // the bench times the build as its own phase (q101_graph) so the query
  // number reports the warm-graph clustering cost — symmetric with q61
  private val minhashGraphCache = new SessionCache[DataFrame]

  def minhashPairGraph(spark: SparkSession, dir: String): DataFrame =
    minhashGraphCache.getOrBuild(spark, dir)(minhashPairGraphBuild(spark, dir).localCheckpoint())

  private val sigFrameCache = new SessionCache[DataFrame]

  /** (lang, doc_id, toks, sz, sig) checkpointed once per (session, dir) —
    * one tokenize+sign pass feeds the full miner (q101's graph), the
    * incremental path (q108), and both verify sides.
    */
  private[graft] def sigTokenFrame(spark: SparkSession, dir: String): DataFrame =
    sigFrameCache.getOrBuild(spark, dir) {
      tokenSets(spark, dir)
        .filter(size(col("toks")) > 0)
        .withColumn("sig", expr("minhash_sigs16(toks)"))
        .localCheckpoint()
    }

  /** Exact verify of candidate pairs: same language AND token-jaccard >=
    * 0.8 (the q32 predicate). Emits (lang, doc_a, doc_b, jaccard) — the ONE
    * implementation of the precision-1 verify that q101/q108, the streaming
    * maintainer, and the q113 contamination screen all share; callers that
    * only need the edge shape select (doc_a, doc_b).
    */
  private[graft] def verifyEdges(t: DataFrame, candidates: DataFrame): DataFrame = {
    val a = t.select(col("lang").as("lang_a"), col("doc_id").as("doc_a"),
      col("toks").as("toks_a"), col("sz").as("sz_a"))
    val b = t.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"),
      col("toks").as("toks_b"), col("sz").as("sz_b"))
    val inter = expr("sorted_intersect_count(toks_a, toks_b)").cast("double")
    val j = inter / (col("sz_a") + col("sz_b") - inter)
    candidates
      .join(a, "doc_a")
      .join(b, "doc_b")
      .filter(col("lang_a") === col("lang_b") && j >= 0.8)
      .select(col("lang_a").as("lang"), col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
  }

  private def minhashPairGraphBuild(spark: SparkSession, dir: String): DataFrame = {
    val t = sigTokenFrame(spark, dir)
    verifyEdges(t, minhashCandidates(t.select(col("doc_id"), col("sig"), col("sz"), col("lang"))))
  }

  def q101LshDupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersFromEdges(lshEdgesCache.getOrBuild(spark, dir)(doubledEdges(minhashPairGraph(spark, dir))))

  /** Same components in DuckDB: min-label reachability via a recursive CTE
    * (the UNION dedups (node, label) states, so the fixpoint enumerates
    * component-mates, not paths).
    */
  val q61Oracle: String =
    """WITH RECURSIVE pairs AS (
      |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
      |  FROM (SELECT lang, doc_id,
      |               list_distinct(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS toks
      |        FROM documents) l
      |  JOIN (SELECT lang, doc_id,
      |               list_distinct(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS toks
      |        FROM documents) r
      |    ON l.lang = r.lang AND l.doc_id < r.doc_id
      |  WHERE len(list_intersect(l.toks, r.toks))::DOUBLE
      |        / len(list_distinct(list_concat(l.toks, r.toks))) >= 0.8),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs),
      |walk(node, label) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
      |labels AS (SELECT node, min(label) AS cluster FROM walk GROUP BY node),
      |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM labels GROUP BY cluster)
      |SELECT l.node AS doc_id, l.cluster AS cluster, s.cluster_size
      |FROM labels l JOIN sizes s USING (cluster)
      |ORDER BY cluster, doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q90 — SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
  // corpus with the IVF coarse quantizer, then drop any vector with a
  // smaller-id within-cluster neighbor at cosine ≥ τ (q71's canonical-owner
  // rule, in embedding space). The pair stage is O(Σ nc²) instead of q33's
  // O(n²): at 100 TB, C scales with corpus size to hold cluster population
  // bounded, so per-cluster all-pairs stays a constant-sized task — the
  // published SemDeDup recipe. Cross-cluster near-dups are the recall loss
  // the spec measures against q33's exact ground truth.
  //
  // Kept-set invariant (by the min-id rule): no two KEPT vectors in the
  // same cluster are ≥ τ — the dedup actually deduplicates.
  //
  // No SQL oracle: the quantizer is the trained k-means (not expressible in
  // DuckDB) → rows-only check; DedupSpec cross-validates every decision
  // against exact cosines.
  // ---------------------------------------------------------------------------
  private val SEM_TAU = 0.45

  def q90SemDedup(spark: SparkSession, dir: String): DataFrame = {
    val (_, corpus) = Similarity.buildIvfIndex(spark, dir) // (vec_id, vb unit, cluster)
    val l = corpus.select(col("cluster"), col("vec_id").as("vec_a"), col("vb").as("ua"))
    val r = corpus.select(col("cluster"), col("vec_id").as("vec_b"), col("vb").as("ub"))
    val dropped = l
      .join(r, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b") && expr("vec_dot(ua, ub)") >= SEM_TAU)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(min(col("vec_a")).as("kept_for"))
    corpus
      .join(dropped, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("cluster"),
        when(col("kept_for").isNull, "keep").otherwise("drop").as("decision"),
        col("kept_for")
      )
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------------------
  // q99 — canonical-representative selection: for every duplicate cluster
  // (q61), KEEP the highest-quality member (q84's logistic prob, doc_id
  // ascending on rounded-prob ties) and count the drops — the step a real
  // dedup pipeline runs between clustering and export, where "which copy
  // survives" should be a quality decision, not an arbitrary min-id. The
  // window partitions by cluster (near-dup clusters are small by
  // construction — bounded by group size, never corpus size) and the
  // quality join is keyed on doc_id; both inputs are already-reduced
  // frames, so the composition adds no corpus-scale work.
  // ---------------------------------------------------------------------------
  /** Cluster labels as a session-scoped artifact: the label table is what a
    * pipeline materializes once after the CC loop and then consumes many
    * times (canon selection here; audits, joins elsewhere). q61 itself
    * stays uncached — it MEASURES the propagation loop.
    */
  private val clusterCache = new SessionCache[DataFrame]

  /** Canonical selection over ANY (doc_id, cluster, cluster_size) frame —
    * like clustersFrom, parametrized over its cluster supply so the exact
    * path (q99) and the sub-quadratic path (q102) share one machinery.
    */
  private def canonFrom(clusters: DataFrame, quality: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster")).orderBy(col("prob").desc, col("doc_id"))
    clusters
      .join(quality, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("cluster"),
        col("cluster_size"),
        col("doc_id").as("kept_doc_id"),
        col("prob").as("kept_prob"),
        (col("cluster_size") - 1).cast("long").as("n_dropped")
      )
      .orderBy(col("cluster"))
  }

  def q99ClusterCanon(spark: SparkSession, dir: String): DataFrame =
    canonFrom(
      clusterCache.getOrBuild(spark, dir)(q61DupClusters(spark, dir).localCheckpoint()),
      Curation.qualityScored(spark, dir).select(col("doc_id"), col("prob"))
    )

  // ---------------------------------------------------------------------------
  // q102 — the 100 TB dedup pipeline composed END TO END on its scale path:
  // MinHash-mined pair graph (q101's edges) → clustersFrom propagation →
  // quality-ranked canonical selection. Nothing in the chain is
  // corpus-quadratic: candidates come from band-bucket equi-joins, the
  // verify touches candidates only, the CC loop is frontier-bounded, and
  // the canon window partitions by (small) cluster. q99 is the same canon
  // over the exact clusters — its oracle-gated ground-truth contract;
  // q102's selfcheck re-derives every keeper as the (prob DESC, doc_id)
  // argmax of its cluster from the run's own data.
  // ---------------------------------------------------------------------------
  private val lshClusterCache = new SessionCache[DataFrame]

  def q102LshClusterCanon(spark: SparkSession, dir: String): DataFrame =
    canonFrom(
      lshClusterCache.getOrBuild(spark, dir)(q101LshDupClusters(spark, dir).localCheckpoint()),
      Curation.qualityScored(spark, dir).select(col("doc_id"), col("prob"))
    )

  /** Oracle composed from the two published oracles: q61's recursive-CTE
    * components joined with q84's quality CTEs (spliced textually so the
    * model constants stay defined in exactly one place), ranked with the
    * same (prob DESC, doc_id) window.
    */
  lazy val q99Oracle: String = {
    // q61Oracle = "WITH RECURSIVE <ctes>\nSELECT l.node ..." — keep the ctes
    val clusterCtes = q61Oracle.substring(0, q61Oracle.indexOf("\nSELECT l.node"))
    // q84Oracle = "WITH <ctes>\nSELECT doc_id ... FROM z ORDER BY doc_id" —
    // strip "WITH ", wrap its final select (minus ORDER BY) as a CTE
    val q84body = Curation.q84Oracle.stripPrefix("WITH ")
    val selIdx = q84body.indexOf("\nSELECT doc_id")
    val q84Ctes = q84body.substring(0, selIdx)
    val q84Select = q84body.substring(selIdx + 1).stripSuffix(" ORDER BY doc_id")
    s"""$clusterCtes,
       |$q84Ctes,
       |quality AS (
       |$q84Select),
       |ranked AS (
       |  SELECT l.node AS doc_id, l.cluster, s.cluster_size, q.prob,
       |         row_number() OVER (PARTITION BY l.cluster ORDER BY q.prob DESC, l.node) AS rn
       |  FROM labels l JOIN sizes s USING (cluster) JOIN quality q ON q.doc_id = l.node)
       |SELECT cluster, cluster_size, doc_id AS kept_doc_id, prob AS kept_prob,
       |       CAST(cluster_size - 1 AS BIGINT) AS n_dropped
       |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q106 — leakage-safe train/validation/test split: q49's deterministic md5
  // coin thrown at DUP-GROUP granularity. A doc-level hash split (q49) lets
  // two near-duplicates land in train and test — the classic
  // contamination-by-duplicate leak that inflates eval scores and that
  // n-gram decontamination (q67) only catches after the fact. Here the coin
  // is thrown once per GROUP (the q61 dup-cluster label for clustered docs,
  // the doc's own id for singletons), so a near-dup cluster moves through
  // the split as one atom and train/test can never share members.
  //
  // Singleton docs hash exactly as q49 hashes them (group_key = doc_id), so
  // the group-aware split degrades to the doc-level split on a dedup'd
  // corpus — the property the spec pins.
  //
  // Scale shape: the label frame carries clustered docs only (dup clusters
  // are a small fraction of any real corpus) and joins keyed on doc_id; the
  // coin is a per-row expression. Composition adds one keyed join over the
  // corpus scan — no windows, no extra shuffles.
  // ---------------------------------------------------------------------------
  private def splitFrom(clusters: DataFrame, docs: DataFrame): DataFrame =
    docs
      .join(clusters.select(col("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("cluster"), col("doc_id")))
      .withColumn("in_cluster", when(col("cluster").isNotNull, 1).otherwise(0))
      // q49's shared coin + thresholds (Sampling) — the degrades-to-q49-on-
      // singletons contract holds by construction, not by parallel edits
      .withColumn("split", Sampling.hashSplitCoin(col("group_key")))
      .select(col("doc_id"), col("group_key"), col("in_cluster"), col("split"))
      .orderBy(col("doc_id"))

  def q106LeakageSafeSplit(spark: SparkSession, dir: String): DataFrame =
    splitFrom(
      clusterCache.getOrBuild(spark, dir)(q61DupClusters(spark, dir).localCheckpoint()),
      Tables.documents(spark, dir).select(col("doc_id"))
    )

  // q107 — the same group-aware split over the SUB-QUADRATIC q101 clusters:
  // the 100 TB path (mine → cluster → split with nothing corpus-quadratic).
  // q106 is its oracle-gated ground-truth contract; the selfcheck re-derives
  // every assignment from the run's own q101 labels and pins the
  // no-straddle property numerically.
  def q107LshSafeSplit(spark: SparkSession, dir: String): DataFrame =
    splitFrom(
      lshClusterCache.getOrBuild(spark, dir)(q101LshDupClusters(spark, dir).localCheckpoint()),
      Tables.documents(spark, dir).select(col("doc_id"))
    )

  // ---------------------------------------------------------------------------
  // q108 — INCREMENTAL dup-cluster maintenance: label a delta of newly
  // ingested docs at O(delta) cost instead of re-clustering the corpus.
  // The missing piece of the dedup lifecycle: q101 builds clusters once;
  // at 100 TB every ingest tick afterwards must not pay the full mine.
  //
  // Same trick the engine already uses for SCD2 (`scd2Apply`), the corpus
  // build (`StreamingCorpus`), and the ANN indexes (append refresh):
  // treat the existing label table as state and touch only what the delta
  // can affect. New docs' band keys probe the bucket table (equi-join), so
  // candidates are (new x bucket-mates) only; exact verification touches
  // candidates; and the connected-components repair runs on a CONTRACTED
  // graph — every existing cluster collapses to its label super-node, old
  // singletons and new docs ride as themselves — so the propagation loop
  // sees a delta-sized graph, never the corpus. A new doc bridging two old
  // clusters merges them via the contracted edge (label_a — label_b); the
  // resulting remap is delta-sized and joins back onto the label table.
  //
  // Exactly equal to the full rebuild, not approximately: banding and the
  // jaccard verify are per-pair deterministic, so the full miner's old-old
  // edges are precisely the ones the old run already contracted into
  // labels. DedupSpec pins incremental == rebuild (including a planted
  // bridge-merge) and the q108 selfcheck re-proves equality on every
  // Verify run from the run's own data.
  // ---------------------------------------------------------------------------
  /** Candidate pairs touching >= 1 delta doc: the delta's band keys probe
    * the full bucket table, so new-new pairs surface too (both directions —
    * least/greatest + distinct canonicalizes). Shared by the q108 batch
    * delta and the streaming maintainer so the two spec-pinned-equal paths
    * cannot drift.
    */
  /** Delta-probes-index candidate pairs, with the verify's implied
    * SIZE-RATIO conjunct applied before the distinct (j <= min(sz)/max(sz),
    * so a >= 0.8-jaccard edge needs sizes within 0.8x — the q30/q113 prune
    * discipline; sz rides in the bucket rows). Deliberately NOT a lang
    * equi-conjunct here: an equality between the two sides would join-key
    * lang and break the persisted index's bucketed-on-(band, key) layout
    * satisfying the join distribution (DedupSpec pins the probe plan to at
    * most one Exchange). Semantics-free: every removed pair fails the
    * verify.
    */
  private[graft] def deltaCandidates(newBuckets: DataFrame, allBuckets: DataFrame): DataFrame =
    newBuckets
      .as("l")
      .join(
        allBuckets.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") =!= col("r.doc_id") &&
          col("l.sz") * 0.8 <= col("r.sz") &&
          col("r.sz") * 0.8 <= col("l.sz")
      )
      .select(
        least(col("l.doc_id"), col("r.doc_id")).as("doc_a"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("doc_b")
      )
      .distinct()

  /** Apply a delta to an existing label table. `t` is the full signature
    * frame (old + new docs), `isNew` marks the delta, `oldLabels` is the
    * (doc_id, cluster) state from the previous run. Returns the same
    * (doc_id, cluster, cluster_size) contract as clustersFrom.
    */
  private[operators] def clustersApply(t: DataFrame, isNew: Column, oldLabels: DataFrame): DataFrame = {
    val allBuckets = bandBuckets(t.select(col("doc_id"), col("sig"), col("sz")))
    val newBuckets = bandBuckets(t.filter(isNew).select(col("doc_id"), col("sig"), col("sz")))
    applyEdgesToLabels(verifyEdges(t, deltaCandidates(newBuckets, allBuckets)), oldLabels)
  }

  /** The label-repair half of the incremental path: merge a verified edge
    * frame (every edge touches >= 1 unlabeled-or-new doc) into an existing
    * label table via the contracted-graph propagation. Shared by the q108
    * batch delta and the streaming maintainer.
    */
  private[graft] def applyEdgesToLabels(edges: DataFrame, oldLabels: DataFrame): DataFrame = {
    // contract: old clustered docs -> their label; everything else -> itself
    val la = oldLabels.select(col("doc_id").as("doc_a"), col("cluster").as("la"))
    val lb = oldLabels.select(col("doc_id").as("doc_b"), col("cluster").as("lb"))
    val superEdges = edges
      .join(la, Seq("doc_a"), "left")
      .join(lb, Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("doc_a"), coalesce(col("lb"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    // delta-sized propagation: nodes are cluster labels, old singletons,
    // and new docs — labels are component minima of MEMBER ids, and every
    // old label IS its cluster's min member, so min over super-nodes is
    // min over members
    val remap = clustersFrom(superEdges).select(col("doc_id").as("repr"), col("cluster").as("new_label"))
    val updatedOld = oldLabels
      .join(remap.select(col("repr").as("cluster"), col("new_label")), Seq("cluster"), "left")
      .select(col("doc_id"), coalesce(col("new_label"), col("cluster")).as("cluster"))
    // reprs that are NOT old cluster labels are docs gaining a label now
    // (new docs, or old singletons a new doc connected to)
    val newlyLabeled = remap
      .join(oldLabels.select(col("cluster").as("repr")).distinct(), Seq("repr"), "left_anti")
      .select(col("repr").as("doc_id"), col("new_label").as("cluster"))
    val all = updatedOld.unionByName(newlyLabeled).withColumnRenamed("cluster", "label0")
    val sizes = all.groupBy(col("label0")).agg(count(lit(1)).as("cluster_size"))
    all
      .join(sizes, "label0")
      .select(col("doc_id"), col("label0").as("cluster"), col("cluster_size"))
      .orderBy(col("cluster"), col("doc_id"))
  }

  /** Old-half labels as session state: what a real pipeline persists
    * between ingest ticks.
    */
  private val incrLabelCache = new SessionCache[DataFrame]

  /** The corpus's (doc_id, sz, band, key) LSH bucket table as a session
    * artifact — the persisted index a real pipeline keeps NEXT TO the label
    * table between ingest ticks (the streaming maintainer's buckets/ store
    * is the same shape, and at 100 TB it is stored bucketed on `key` per
    * sources/Layouts; sz rides so probes can size-ratio-prune before the
    * candidate distinct). The incremental path probes it instead of
    * re-exploding every signature on every read.
    */
  private val bucketFrameCache = new SessionCache[DataFrame]

  private def bucketFrame(spark: SparkSession, dir: String): DataFrame =
    bucketFrameCache.getOrBuild(spark, dir) {
      bandBuckets(sigTokenFrame(spark, dir).select(col("doc_id"), col("sig"), col("sz"))).localCheckpoint()
    }

  /** Persist the corpus LSH bucket table BUCKETED on the (band, key) probe
    * key — the 100 TB layout the scale notes promise, shipped: a delta
    * probe against the persisted index then plans with the INDEX side
    * scanning shuffle-free (its bucketed layout already satisfies the join
    * distribution; only the delta-sized side exchanges — DedupSpec pins
    * exactly one hashpartitioning Exchange in the probe plan). Rebuild
    * cadence is the ann-build pattern (periodic full rewrite); the
    * streaming maintainer's slice store carries the between-rebuild deltas.
    */
  def persistBucketIndex(
      spark: SparkSession,
      dir: String,
      table: String,
      path: String,
      buckets: Int = 32
  ): Unit =
    graft.sources.Layouts.writeBucketed(bucketFrame(spark, dir), table, Seq("band", "key"), buckets, path)

  /** Candidate pairs for a delta probing the PERSISTED bucket index —
    * [[deltaCandidates]] with the big side supplied by the bucketed table.
    */
  def deltaCandidatesAgainstIndex(spark: SparkSession, table: String, newBuckets: DataFrame): DataFrame =
    deltaCandidates(newBuckets, spark.table(table))

  /** The delta's bucket rows for a probe — bandBuckets over the signature
    * frame restricted to `doc_id > pivot` (the ingest-watermark shape).
    */
  def deltaBucketsAbove(spark: SparkSession, dir: String, pivot: Long): DataFrame =
    bucketFrame(spark, dir).filter(col("doc_id") > pivot)

  /** q108's ingest pivot at the 90 % id mark — a deterministic stand-in
    * for the ingest watermark separating "already clustered" (the bulk
    * state, mined once and session-cached) from "this tick's delta" (the
    * last ~10 % of ids), the realistic state-vs-delta proportion an ingest
    * tick sees; the result is pivot-invariant (equality with the full
    * rebuild is the spec'd and self-checked contract at EVERY split point).
    */
  private def incrPivot(spark: SparkSession, dir: String): Long = {
    val mm = sigTokenFrame(spark, dir)
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .head()
    mm.getAs[Long]("lo") + (mm.getAs[Long]("hi") - mm.getAs[Long]("lo")) * 9 / 10
  }

  private def incrOldLabels(spark: SparkSession, dir: String, pivot: Long): DataFrame =
    incrLabelCache.getOrBuild(spark, dir) {
      // the old-half mine IS a restriction of the full q101 edge graph:
      // banding and the jaccard verify are both per-pair deterministic, so
      // a pair with both ids <= pivot collides (and verifies) over the old
      // half iff it does over the full corpus. Reuse the session's mined
      // graph — the q101_graph artifact the bench (and a real pipeline)
      // already paid for — filtered to doc_b <= pivot (pairs are canonical
      // doc_a < doc_b, so that one bound covers both endpoints), instead
      // of re-mining 90% of the corpus a second time.
      clustersFrom(minhashPairGraph(spark, dir).filter(col("doc_b") <= pivot))
        .select(col("doc_id"), col("cluster"))
        .localCheckpoint()
    }

  /** Materialize exactly the session state an ingest tick carries between
    * runs — the old-half label table and the corpus bucket index — without
    * running a delta apply. The bench's q108_state phase times THIS, so the
    * phase number is the state cost and the timed q108 repetitions are the
    * only place the delta-apply cost appears (it used to be counted twice:
    * once inside the phase's full-query run, once per timed repetition).
    */
  def buildIncrementalState(spark: SparkSession, dir: String): Unit = {
    val pivot = incrPivot(spark, dir)
    incrOldLabels(spark, dir, pivot)
    bucketFrame(spark, dir)
    ()
  }

  def q108IncrementalClusters(spark: SparkSession, dir: String): DataFrame = {
    val t = sigTokenFrame(spark, dir)
    val pivot = incrPivot(spark, dir)
    val oldLabels = incrOldLabels(spark, dir, pivot)
    // same semantics as clustersApply (a per-doc delta's bandBuckets ==
    // a doc_id filter of the corpus bucket table), but probing the
    // session-persisted bucket index instead of re-exploding signatures —
    // the read path an ingest tick actually runs against persisted state
    val allBuckets = bucketFrame(spark, dir)
    val newBuckets = allBuckets.filter(col("doc_id") > pivot)
    applyEdgesToLabels(verifyEdges(t, deltaCandidates(newBuckets, allBuckets)), oldLabels)
  }

  /** Oracle: q61's recursive-CTE cluster labels left-joined onto documents,
    * then q49's published md5 coin on the group key.
    */
  lazy val q106Oracle: String = {
    val clusterCtes = q61Oracle.substring(0, q61Oracle.indexOf("\nSELECT l.node"))
    s"""$clusterCtes,
       |grouped AS (
       |  SELECT d.doc_id,
       |         coalesce(l.cluster, d.doc_id) AS group_key,
       |         CAST(CASE WHEN l.node IS NULL THEN 0 ELSE 1 END AS INT) AS in_cluster
       |  FROM documents d LEFT JOIN labels l ON l.node = d.doc_id),
       |coined AS (
       |  SELECT *, CAST(('0x' || substring(md5(group_key::VARCHAR), 1, 2))::INT AS INT) AS bucket
       |  FROM grouped)
       |SELECT doc_id, group_key, in_cluster,
       |       CASE WHEN bucket < 205 THEN 'train'
       |            WHEN bucket < 230 THEN 'validation'
       |            ELSE 'test' END AS split
       |FROM coined
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q113 — near-duplicate TEST-SET CONTAMINATION screen: the fuzzy upgrade
  // of q67's exact 8-gram overlap, and the published decontamination
  // practice (GPT-3's 13-gram screen was exact; RefinedWeb/Llama-class
  // pipelines re-screen with MinHash because a near-duplicate of a test
  // document leaks evaluation signal just as surely as a verbatim one).
  // Pairs a TRAIN-side doc (q49's md5 coin != 'test') with every TEST-side
  // doc it near-duplicates: banded token-MinHash candidates restricted to
  // cross-split bucket collisions, then q32's exact same-lang token-jaccard
  // >= 0.8 verify — so every emitted pair is exactly validated (precision
  // 1) and only the candidate surface is approximate, q60/q101's contract.
  //
  // Scale shape: identical to q101's miner — signatures from a
  // session-cached token-signature frame, band-bucket equi-join (train
  // side probes test side: the test split is ~10% of the corpus, so the
  // build side is the small one), verification touches candidates only.
  // ORACLE-GATED since r15 under the q30 discipline: the default
  // signature path is md5-affine at TOKEN grain (one md5 per distinct
  // (doc, token), q134's literal multipliers, band-TUPLE cross-split
  // candidates, exact same-lang Jaccard >= 0.8 verify over the 60-bit
  // token keys) — the banded screen REPLAYS VERBATIM in DuckDB,
  // candidates included, so the gate needs no recall argument (the
  // exact cross-split recall stays measured by the spec/selfcheck
  // heritage: the screen's contract is the banded computation itself).
  // The xxhash64 + minhash_sigs16 path (shared sigTokenFrame with q101's
  // miner) stays the serving twin under [[MinhashConf]].
  // ---------------------------------------------------------------------------
  def q113NeardupContamination(spark: SparkSession, dir: String): DataFrame = {
    if (minhashPath(spark) == "native") {
      val t = sigTokenFrame(spark, dir)
      // both sides filter the session-cached corpus bucket table (the coin is
      // a pure doc_id expression) instead of re-exploding signatures per side
      val split = Sampling.hashSplitCoin(col("doc_id"))
      val trainBuckets = bucketFrame(spark, dir).filter(split =!= "test")
      val testBuckets = bucketFrame(spark, dir).filter(split === "test")
      val cand = trainBuckets
        .as("l")
        .join(testBuckets.as("r"), Seq("band", "key"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
      // the shared precision-1 verify — (doc_a, doc_b) here is (train, test)
      // oriented, not id-canonicalized, and verifyEdges preserves that
      verifyEdges(t, cand).orderBy(col("lang"), col("doc_a"), col("doc_b"))
    } else q113Md5Verified(spark, dir).orderBy(col("lang"), col("doc_a"), col("doc_b"))
  }

  /** The md5 path's candidate frame — staged separately so
    * [[graft.tools.ProfileQ113]] can time the band-tuple join apart from
    * the verify (the r15 watch item on the ~1 s residual over the native
    * twin). The profiler showed the cost IS this stage: 2-row band tuples
    * at j>=0.8 collide per band with p~0.64, so the dup-dense corpus fans
    * ~1.9M distinct candidates at sf0.1. The verify's cheap conjuncts
    * (lang equality, the 0.799 size-ratio prune) are therefore applied
    * BEFORE the distinct — they reject nothing the verify would keep, so
    * the final rows (what the oracle gates) are identical, but the
    * distinct's shuffle input shrinks by every cross-lang / size-skewed
    * collision.
    */
  private[graft] def q113Md5Candidates(spark: SparkSession, dir: String): DataFrame = {
    val t = md5TokenSignatures(spark, dir)
    val split = Sampling.hashSplitCoin(col("doc_id"))
    val bands = md5BandTuples(t.select(col("doc_id"), col("sig")))
      .join(t.select(col("doc_id"), col("lang"), col("sz")), "doc_id")
    bands
      .filter(split =!= "test")
      .as("l")
      .join(bands.filter(split === "test").as("r"), Seq("band", "v0", "v1"))
      .filter(
        col("l.lang") === col("r.lang") &&
          col("l.sz") * 0.799 <= col("r.sz") && col("r.sz") * 0.799 <= col("l.sz")
      )
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** The md5 path's verified (UNORDERED) output — q113's else branch minus
    * the final orderBy, so the profiler can separate verify cost from the
    * output sort.
    */
  private[graft] def q113Md5Verified(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    val t = md5TokenSignatures(spark, dir)
    val cand = q113Md5Candidates(spark, dir)
    val a = t.select(col("lang").as("lang_a"), col("doc_id").as("doc_a"), col("toks").as("toks_a"), col("sz").as("sz_a"))
    val b = t.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"), col("toks").as("toks_b"), col("sz").as("sz_b"))
    // cheap conjuncts first inside the filter (the q32 lesson): lang
    // equality and the integer size-ratio prune reject most candidates
    // before the merge intersect runs. The prune factor is 0.799, NOT
    // 0.8: floored jaccard >= 0.8 only requires raw j >= 0.7999995, and
    // j <= min(sz)/max(sz), so 0.799 is semantics-free with margin —
    // the oracle applies no prune and returns the identical set.
    cand
      .join(a, "doc_a")
      .join(b, "doc_b")
      .filter(
        col("lang_a") === col("lang_b") &&
          col("sz_a") * 0.799 <= col("sz_b") && col("sz_b") * 0.799 <= col("sz_a")
      )
      .withColumn("i", expr("sorted_intersect_count(toks_a, toks_b)"))
      .withColumn(
        "jaccard",
        expr("floor(CAST(i AS DOUBLE) * 1e6 / (sz_a + sz_b - i) + 5e-1) / 1e6")
      )
      .filter(col("jaccard") >= 0.8)
      .select(col("lang_a").as("lang"), col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** md5-affine signatures at TOKEN grain — q30's construction over the
    * distinct token set, carrying lang for the same-lang verify. Cached
    * per (session, dir): q113 re-enters per bench repetition.
    */
  private val md5TokenSigCache = new SessionCache[DataFrame]

  /** Warm the md5 token-signature stage — named as a bench phase
    * (`q113_sigs`) so the one-time build cost is reported outside q113's
    * repetition medians, the q163_actions shape.
    */
  private[graft] def buildMd5TokenSigStage(spark: SparkSession, dir: String): Unit = {
    md5TokenSignatures(spark, dir)
    ()
  }

  private def md5TokenSignatures(spark: SparkSession, dir: String): DataFrame =
    md5TokenSigCache.getOrBuild(spark, dir) {
      val p = Curation.SKETCH_P
      val base = Tables
        .balanced(Tables.documents(spark, dir))
        .withColumn("norm_text", normText)
        .select(col("lang"), col("doc_id"), explode(split(col("norm_text"), " ")).as("tok"))
        .distinct()
        .withColumn("xs", expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) AS bigint)"))
        .select(col("lang"), col("doc_id"), col("xs"))
        .distinct()
        .withColumn("x", col("xs") % p)
      val mins = (0 until K).map(h =>
        min(expr(s"(${Curation.sketchA(h)}L * x + ${Curation.sketchB(h)}L) % $p")).as(s"m$h")
      )
      base
        .groupBy(col("lang"), col("doc_id"))
        .agg(sort_array(collect_set(col("xs"))).as("toks"), mins: _*)
        .select(
          col("lang"),
          col("doc_id"),
          col("toks"),
          size(col("toks")).as("sz"),
          array((0 until K).map(h => col(s"m$h")): _*).as("sig")
        )
        .localCheckpoint()
    }

  /** The banded cross-split screen replayed outright: one md5 per distinct
    * (doc, token), the affine mins, band-tuple candidates restricted to
    * train-probes-test, exact same-lang Jaccard over the 60-bit keys.
    */
  lazy val q113Oracle: String = {
    val p = Curation.SKETCH_P
    val aLits = (0 until K).map(Curation.sketchA).mkString(", ")
    val bLits = (0 until K).map(Curation.sketchB).mkString(", ")
    s"""WITH t AS (
       |  SELECT lang, doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |tok AS (SELECT DISTINCT lang, doc_id, unnest(toks) AS tk FROM t),
       |tx AS (
       |  SELECT DISTINCT lang, doc_id, ('0x' || substring(md5(tk), 1, 15))::BIGINT AS xs FROM tok),
       |sig AS (
       |  SELECT doc_id, h.range AS h,
       |         min((list_extract([$aLits], h.range::INT + 1) * (xs % $p)
       |              + list_extract([$bLits], h.range::INT + 1)) % $p) AS comp
       |  FROM tx CROSS JOIN range($K) h GROUP BY 1, 2),
       |bnd AS (
       |  SELECT s0.doc_id, CAST(s0.h // 2 AS INT) AS band, s0.comp AS v0, s1.comp AS v1
       |  FROM sig s0 JOIN sig s1 ON s1.doc_id = s0.doc_id AND s1.h = s0.h + 1
       |  WHERE s0.h % 2 = 0),
       |spl AS (
       |  SELECT DISTINCT doc_id, ('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT AS bucket FROM t),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bnd l JOIN spl sl ON sl.doc_id = l.doc_id AND sl.bucket < ${Sampling.SPLIT_VALIDATION_LT}
       |  JOIN bnd r ON r.band = l.band AND r.v0 = l.v0 AND r.v1 = l.v1
       |  JOIN spl sr ON sr.doc_id = r.doc_id AND sr.bucket >= ${Sampling.SPLIT_VALIDATION_LT}),
       |sz AS (SELECT doc_id, count(*) AS n FROM tx GROUP BY 1),
       |lg AS (SELECT DISTINCT doc_id, lang FROM tx),
       |ix AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cand c JOIN tx a ON a.doc_id = c.doc_a JOIN tx b ON b.doc_id = c.doc_b AND b.xs = a.xs
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT la.lang AS lang, c.doc_a, c.doc_b,
       |         floor(CAST(coalesce(ix.i, 0) AS DOUBLE) * 1e6 / (sa.n + sb.n - coalesce(ix.i, 0)) + 5e-1) / 1e6 AS jaccard
       |  FROM cand c
       |  LEFT JOIN ix ON ix.doc_a = c.doc_a AND ix.doc_b = c.doc_b
       |  JOIN sz sa ON sa.doc_id = c.doc_a JOIN sz sb ON sb.doc_id = c.doc_b
       |  JOIN lg la ON la.doc_id = c.doc_a JOIN lg lb ON lb.doc_id = c.doc_b AND lb.lang = la.lang)
       |SELECT lang, doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY lang, doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q117 — per-source dedup profile: the dashboard a curation operator reads
  // before deciding drop-the-source vs dedup-the-rows — every duplication
  // granularity the engine measures, rolled up per source in one frame:
  // exact whole-doc redundancy (q29's fingerprint rule: non-survivor share),
  // near-dup cluster membership (the sub-quadratic q101 banded-MinHash +
  // exact-verify components — the 100 TB path; its clusters equal q61's
  // exact jaccard>=0.8 components, pinned by DedupSpec and the selfcheck,
  // which is why the q61 recursive-CTE stays the SQL oracle below), mean
  // cross-doc passage sharing (q71), and mean duplicated-span coverage
  // (q110, over its >=8-token domain). Fractions aggregate the components'
  // 6dp-rounded per-doc values as integer micros (merge-order-proof, the
  // q105 rule). Composition cost: one fingerprint groupBy + the component
  // queries (q101's banded edge frame is session-cached).
  // ---------------------------------------------------------------------------
  def q117DedupProfile(spark: SparkSession, dir: String): DataFrame = {
    // is_dup derives from q29's OWN output (not a re-derivation of its
    // rule), so a future change to the survivor rule flows through here
    // structurally — the same dependency shape as q101LshDupClusters below
    val fp = Tables
      .balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), md5(normText).as("fingerprint"))
    val exacts = fp
      .join(q29ExactDedup(spark, dir), "fingerprint")
      .select(
        col("doc_id"),
        col("source"),
        when(col("n_copies") > 1 && col("doc_id") =!= col("survivor_doc_id"), 1).otherwise(0).as("is_dup")
      )
    // the same session-cached q101 label frame q102/q107 consume — the
    // materialized table a pipeline keeps after the CC loop, so the profile
    // does not re-run propagation per read
    val clustered = lshClusterCache
      .getOrBuild(spark, dir)(q101LshDupClusters(spark, dir).localCheckpoint())
      .select(col("doc_id"), lit(1).as("in_cluster"))
    val pass = Curation
      .q71PassageDedup(spark, dir)
      .select(col("doc_id"), expr("CAST(round(shared_frac * 1e6, 0) AS BIGINT)").as("shared_micro"))
    val span = Curation
      .q110SpanDedup(spark, dir)
      .select(col("doc_id"), expr("CAST(round(dup_frac * 1e6, 0) AS BIGINT)").as("dup_micro"))
    exacts
      .join(clustered, Seq("doc_id"), "left")
      .join(pass, Seq("doc_id"), "left")
      .join(span, Seq("doc_id"), "left")
      .na
      .fill(0, Seq("in_cluster"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("floor(CAST(sum(is_dup) AS DOUBLE) * 1e6 / count(1) + 5e-1) / 1e6").as("exact_dup_frac"),
        expr("floor(CAST(sum(in_cluster) AS DOUBLE) * 1e6 / count(1) + 5e-1) / 1e6").as("clustered_frac"),
        // coalesce 0: a source with no docs in a component's domain (e.g.
        // all under 8 tokens for q110) reports 0 measured duplication, not
        // a NULL that crashes row consumers
        expr("coalesce(floor(CAST(sum(shared_micro) AS DOUBLE) / count(shared_micro) + 5e-1) / 1e6, 0e0)")
          .as("passage_shared_mean"),
        expr("coalesce(floor(CAST(sum(dup_micro) AS DOUBLE) / count(dup_micro) + 5e-1) / 1e6, 0e0)")
          .as("span_dup_mean")
      )
      .orderBy(col("source"))
  }

  /** Oracle: the q61 recursive-CTE cluster prefix (the q106 composition
    * trick), plus renamed re-derivations of the q29 fingerprint rule, the
    * q71 instance/frequency chain, and the q110 span chain — all joined
    * onto documents and rolled up per source.
    */
  lazy val q117Oracle: String = {
    val clusterCtes = q61Oracle.substring(0, q61Oracle.indexOf("\nSELECT l.node"))
    s"""$clusterCtes,
       |fp AS (
       |  SELECT doc_id, source, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
       |  FROM documents),
       |fpg AS (SELECT f, min(doc_id) AS mn, count(*) AS n FROM fp GROUP BY 1),
       |exacts AS (
       |  SELECT fp.doc_id, fp.source,
       |         CASE WHEN g.n > 1 AND fp.doc_id <> g.mn THEN 1 ELSE 0 END AS is_dup
       |  FROM fp JOIN fpg g ON fp.f = g.f),
       |p_t AS (
       |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |p_seg AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(0, CAST(ceil(len(toks) / 16.0) AS INT)),
       |                i -> md5(array_to_string(toks[i*16+1:i*16+16], ' ')))) AS seg_key
       |  FROM p_t WHERE len(toks) >= 1),
       |p_freq AS (
       |  SELECT seg_key, count(*) AS n_docs
       |  FROM (SELECT DISTINCT doc_id, seg_key FROM p_seg) GROUP BY 1),
       |p_doc AS (
       |  SELECT s.doc_id,
       |         CAST(floor(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END)::DOUBLE * 1e6 / count(*) + 5e-1) AS BIGINT) AS shared_micro
       |  FROM p_seg s JOIN p_freq f USING (seg_key) GROUP BY 1),
       |s_inst AS (
       |  SELECT doc_id, len(toks) AS n_toks,
       |         unnest(list_transform(range(1, len(toks) - 8 + 2), i -> i)) AS pos,
       |         unnest(list_transform(range(1, len(toks) - 8 + 2),
       |                i -> md5(array_to_string(toks[i:i+8-1], ' ')))) AS key
       |  FROM p_t WHERE len(toks) >= 8),
       |s_dupk AS (SELECT key FROM s_inst GROUP BY key HAVING count(*) >= 2),
       |s_brk AS (
       |  SELECT doc_id, pos, pos + 7 AS endpos,
       |         CASE WHEN pos > coalesce(max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1 THEN 1 ELSE 0 END AS b
       |  FROM s_inst JOIN s_dupk USING (key)),
       |s_isl AS (
       |  SELECT doc_id, pos, endpos,
       |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM s_brk),
       |s_spans AS (
       |  SELECT doc_id, island, max(endpos) - min(pos) + 1 AS span_len
       |  FROM s_isl GROUP BY 1, 2),
       |s_sp AS (
       |  SELECT doc_id, sum(span_len) AS dup_tokens
       |  FROM s_spans WHERE span_len >= 16 GROUP BY 1),
       |s_doc AS (
       |  SELECT d.doc_id,
       |         CAST(floor(CAST(coalesce(sp.dup_tokens, 0) AS DOUBLE) * 1e6 / d.n_tokens + 5e-1) AS BIGINT) AS dup_micro
       |  FROM (SELECT doc_id, max(n_toks) AS n_tokens FROM s_inst GROUP BY 1) d
       |  LEFT JOIN s_sp sp ON sp.doc_id = d.doc_id),
       |j AS (
       |  SELECT e.doc_id, e.source, e.is_dup,
       |         CASE WHEN l.node IS NULL THEN 0 ELSE 1 END AS in_cluster,
       |         p.shared_micro, sd.dup_micro
       |  FROM exacts e
       |  LEFT JOIN labels l ON l.node = e.doc_id
       |  LEFT JOIN p_doc p ON p.doc_id = e.doc_id
       |  LEFT JOIN s_doc sd ON sd.doc_id = e.doc_id)
       |SELECT source,
       |       count(*)::BIGINT AS n_docs,
       |       floor(sum(is_dup)::DOUBLE * 1e6 / count(*) + 5e-1) / 1e6 AS exact_dup_frac,
       |       floor(sum(in_cluster)::DOUBLE * 1e6 / count(*) + 5e-1) / 1e6 AS clustered_frac,
       |       coalesce(floor(CAST(sum(shared_micro) AS DOUBLE) / count(shared_micro) + 5e-1) / 1e6, 0e0) AS passage_shared_mean,
       |       coalesce(floor(CAST(sum(dup_micro) AS DOUBLE) / count(dup_micro) + 5e-1) / 1e6, 0e0) AS span_dup_mean
       |FROM j GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q142 — cross-source syndication matrix: for each source pair, how many
  // duplicate CLUSTERS span both, and how many docs each side contributes
  // to those shared clusters. The cluster-confirmed duplication-flow view
  // of "which sources mirror each other": q81 estimates shingle-set overlap
  // and q134 sketches it, but neither says whether the overlap is actual
  // whole-document syndication — this reads it straight off the q101
  // near-dup clusters (the 100 TB label frame q102/q107/q117 already
  // consume from the session cache).
  //
  // Scale shape: labels ⋈ sources is a doc_id equi-join; the per-(cluster,
  // source) rollup bounds each cluster to <= |sources| rows, so the pair
  // stage is a cluster-keyed equi-join over that bounded frame — never an
  // all-pairs join over docs. Oracle composes the q61 recursive-CTE
  // cluster prefix (valid because q101 == q61 is spec- and
  // selfcheck-pinned, the q117 argument).
  // ---------------------------------------------------------------------------
  /** The (cluster, source, n_docs) rollup both syndication readers start
    * from — <= |clusters|·|sources| rows, session-cached per dir so q142's
    * matrix and q185's centrality share one labels ⋈ sources pass.
    */
  private val clusterSourceCache = new SessionCache[DataFrame]

  private def clusterSourcesCached(spark: SparkSession, dir: String): DataFrame =
    clusterSourceCache.getOrBuild(spark, dir) {
      val labels = lshClusterCache
        .getOrBuild(spark, dir)(q101LshDupClusters(spark, dir).localCheckpoint())
        .select(col("doc_id"), col("cluster"))
      val src = Tables.balanced(Tables.documents(spark, dir)).select(col("doc_id"), col("source"))
      clusterSourcesOver(labels, src).localCheckpoint()
    }

  /** The rollup over ANY (doc_id, cluster) label frame and (doc_id,
    * source) attribution frame — shared by the batch cache above and
    * [[graft.streaming.StreamingDupClusters]]'s maintained-state serves
    * (labels off the cluster maintainer, attribution off the corpus
    * maintainer's stage table).
    */
  private[graft] def clusterSourcesOver(labels: DataFrame, src: DataFrame): DataFrame =
    labels
      .join(src, "doc_id")
      .groupBy(col("cluster"), col("source"))
      .agg(count(lit(1)).as("n_docs"))

  def q142SyndicationMatrix(spark: SparkSession, dir: String): DataFrame =
    q142MatrixOver(clusterSourcesCached(spark, dir))

  /** q142's pair rollup over ANY (cluster, source, n_docs) frame. */
  private[graft] def q142MatrixOver(cs: DataFrame): DataFrame = {
    val a = cs.select(col("cluster"), col("source").as("source_a"), col("n_docs").as("da"))
    val b = cs.select(col("cluster"), col("source").as("source_b"), col("n_docs").as("db"))
    a.join(b, Seq("cluster"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("da")).as("docs_a"),
        sum(col("db")).as("docs_b")
      )
      .orderBy(col("source_a"), col("source_b"))
  }

  // ---------------------------------------------------------------------------
  // q185 — syndication CENTRALITY: PageRank (Brin & Page, WWW'98) over the
  // q142 flow graph — sources as nodes, shared near-dup clusters as edge
  // weights. q142 shows the pairwise flows; this ranks WHICH source sits
  // at the center of the syndication web — the read behind a canonical-
  // source keep rule (when a cluster spans sources, keep the copy from
  // the hub the content radiates from) and behind "dropping source X
  // barely dents the dup graph" calls. Damping 0.85, T = 10 fixed
  // iterations (the q159/q164 fixed-ladder discipline: a declared
  // iteration count, not a convergence test, so both engines run the
  // identical computation).
  //
  // Engine-exactness (the q105 merge-order rule): rank mass lives in
  // INTEGER MICROS end to end — pr0 = 1e6 div N, each u→s contribution
  // floors individually (pr·w div wout), the damped update is
  // (150000 div N) + (850000·inflow) div 1e6 — Spark `div` == DuckDB `//`
  // on positives, so all T iterations replay bit-exactly as an unrolled
  // CTE chain (the q159 gradient-replay pattern). Floor leakage (and
  // dangling mass on isolated sources) deterministically shrinks the
  // total; Σ centrality <= 1e6 is a spec invariant, not renormalized.
  //
  // Scale shape: the per-(cluster, source) rollup and the cluster-keyed
  // pair stage are the distributed work (each cluster caps at <=
  // |sources| rows before pairing — q142's argument); the resulting edge
  // list is |sources|²-BOUNDED BY CONSTRUCTION, so it collects to the
  // driver (the repo's bounded-collect rule: codebook samples, centroid
  // reads) and the T iterations run there as plain integer arithmetic —
  // a distributed loop over a 20-row frame is ten job launches of pure
  // overhead (measured 2.5 s vs ~0.1 s), and at 100 TB sources number
  // thousands, still driver-sized, while the corpus-sized label frame
  // stays exactly where it is: the shared session cache.
  // ---------------------------------------------------------------------------
  private val SYND_DAMP_MICRO = 850000L
  private val SYND_ITERS = 10

  /** The symmetric edge frame plus the node list, both |sources|-bounded
    * and session-cached — the dashboard re-reads the ranking against the
    * same corpus snapshot, so the warm path is two bounded collects.
    */
  private val syndGraphCache = new SessionCache[DataFrame]

  def q185SyndicationRank(spark: SparkSession, dir: String): DataFrame =
    q185RankOfGraph(spark, syndGraphCache.getOrBuild(spark, dir) {
      syndGraphOf(
        clusterSourcesCached(spark, dir),
        Tables.balanced(Tables.documents(spark, dir)).select(col("source"))
      ).localCheckpoint()
    })

  /** The bounded syndication graph over ANY (cluster, source, n_docs)
    * frame and (source) attribution frame: symmetric shared-cluster edge
    * weights, with the node list riding the same frame as w-NULL rows so
    * ONE frame carries the whole graph. Shared by the batch cache above
    * and the maintained-state serve.
    */
  private[graft] def syndGraphOf(cs: DataFrame, sources: DataFrame): DataFrame = {
    val edges = cs
      .select(col("cluster"), col("source").as("u"))
      .join(cs.select(col("cluster"), col("source").as("s")), Seq("cluster"))
      .filter(col("u") =!= col("s"))
      .groupBy(col("u"), col("s"))
      .agg(count(lit(1)).cast("long").as("w"))
    sources
      .select(col("source").as("u"), lit(null).cast("string").as("s"), lit(null).cast("long").as("w"))
      .distinct()
      .unionByName(edges)
  }

  /** The T-iteration integer-micro PageRank over a bounded graph frame —
    * the driver-side tail both the batch query and the serve share.
    */
  private[graft] def q185RankOfGraph(spark: SparkSession, graph: DataFrame): DataFrame = {
    val rows = graph.collect() // <= |sources|^2 + |sources| rows by construction
    val edgeRows = rows.filter(!_.isNullAt(2)).map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = rows.filter(_.isNullAt(2)).map(_.getString(0)).sorted
    // greatest(N,1) keeps the constants well-defined on an empty corpus
    // (nodes is empty then, so no row ever uses them — the oracle spells
    // the identical guard)
    val n = math.max(nodes.length.toLong, 1L)
    val wout = edgeRows.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    var pr = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to SYND_ITERS) {
      val inflow = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      edgeRows.foreach { case (u, s, w) => inflow(s) += pr(u) * w / wout(u) }
      pr = nodes.map(s => s -> (150000L / n + SYND_DAMP_MICRO * inflow(s) / 1000000L)).toMap
    }
    val nPartners = edgeRows.groupBy(_._1).map { case (u, es) => u -> es.length.toLong }
    val ranked = nodes
      .map(s => (s, nPartners.getOrElse(s, 0L), wout.getOrElse(s, 0L), pr(s)))
      .sortBy { case (s, _, _, p) => (-p, s) }
      .zipWithIndex
      .map { case ((s, np, sc, p), i) => (i + 1L, s, np, sc, p) }
    import spark.implicits._
    ranked.toSeq
      .toDF("rank", "source", "n_partners", "shared_clusters", "centrality_micro")
      .orderBy(col("rank"))
  }

  /** Oracle: the q61 cluster prefix (valid by the pinned q101 == q61
    * equality, q142's rule), the symmetric bounded edge rollup, then all
    * T PageRank iterations UNROLLED as a CTE chain with the identical
    * integer-micro arithmetic (the q159 replay pattern).
    */
  lazy val q185Oracle: String = {
    val clusterCtes = q61Oracle.substring(0, q61Oracle.indexOf("\nSELECT l.node"))
    val nGuard = "(SELECT greatest(count(DISTINCT source), 1) FROM documents)"
    val iters = (1 to SYND_ITERS)
      .map { k =>
        s"""it$k AS (
           |  SELECT nd.source,
           |         (150000 // $nGuard) + ($SYND_DAMP_MICRO * coalesce(f.inflow, 0)) // 1000000 AS pr
           |  FROM nodes nd LEFT JOIN (
           |    SELECT e.s AS source, sum(p.pr * e.w // e.wout) AS inflow
           |    FROM sedges e JOIN it${k - 1} p ON e.u = p.source
           |    GROUP BY 1) f ON nd.source = f.source)""".stripMargin
      }
      .mkString(",\n")
    s"""$clusterCtes,
       |cs AS (
       |  SELECT l.cluster, d.source
       |  FROM labels l JOIN documents d ON l.node = d.doc_id
       |  GROUP BY 1, 2),
       |e0 AS (
       |  SELECT a.source AS u, b.source AS s, count(*) AS w
       |  FROM cs a JOIN cs b ON a.cluster = b.cluster AND a.source <> b.source
       |  GROUP BY 1, 2),
       |sedges AS (SELECT u, s, w, sum(w) OVER (PARTITION BY u) AS wout FROM e0),
       |nodes AS (SELECT DISTINCT source FROM documents),
       |it0 AS (SELECT source, 1000000 // $nGuard AS pr FROM nodes),
       |$iters,
       |deg AS (SELECT u AS source, count(*) AS n_partners, sum(w) AS shared_clusters FROM e0 GROUP BY 1)
       |SELECT CAST(row_number() OVER (ORDER BY p.pr DESC, p.source) AS BIGINT) AS rank,
       |       p.source,
       |       CAST(coalesce(d.n_partners, 0) AS BIGINT) AS n_partners,
       |       CAST(coalesce(d.shared_clusters, 0) AS BIGINT) AS shared_clusters,
       |       CAST(p.pr AS BIGINT) AS centrality_micro
       |FROM it$SYND_ITERS p LEFT JOIN deg d ON p.source = d.source
       |ORDER BY rank""".stripMargin
  }

  /** Oracle: the q61 recursive-CTE cluster prefix (the q117 composition),
    * then the same bounded (cluster, source) rollup and pair join.
    */
  lazy val q142Oracle: String = {
    val clusterCtes = q61Oracle.substring(0, q61Oracle.indexOf("\nSELECT l.node"))
    s"""$clusterCtes,
       |cs AS (
       |  SELECT l.cluster, d.source, count(*) AS n_docs
       |  FROM labels l JOIN documents d ON l.node = d.doc_id
       |  GROUP BY 1, 2)
       |SELECT a.source AS source_a, b.source AS source_b,
       |       CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(sum(a.n_docs) AS BIGINT) AS docs_a,
       |       CAST(sum(b.n_docs) AS BIGINT) AS docs_b
       |FROM cs a JOIN cs b ON a.cluster = b.cluster AND a.source < b.source
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q133 — dedup threshold sweep: what does tightening (or loosening) the
  // jaccard floor COST? For each τ in the grid: surviving near-dup pairs,
  // docs a keep-smaller-id rule would drop, and the token mass that rule
  // removes — the curve a curator reads before committing to 0.8 (too low
  // deletes real data, too high ships duplicates; RefinedWeb/Gopher both
  // publish exactly this sensitivity analysis). One quadratic pass at the
  // GRID MINIMUM feeds all five thresholds; the drop rule is the simple
  // deterministic "a doc with any smaller-id neighbor at τ drops" (the
  // pairwise form of q102's canon — no per-τ clustering, so the sweep
  // stays one aggregation).
  //
  // Boundary discipline: the join floor is RAW jaccard >= min(τ) (q32's
  // rule), the per-τ filter is on the ROUNDED 6dp value — both spelled
  // identically in the oracle, so a pair that rounds onto a grid point
  // lands on the same side in both engines.
  //
  // Scale shape: the pair supply is the declared-exact q32 family (the
  // 100 TB path swaps in q101's banded candidates tuned for the grid
  // minimum); the τ fan-out is an explode over a 5-element literal — a
  // Generate, NOT a join — and everything downstream aggregates
  // (tau, doc)-keyed frames. Corpus token totals ride one 1-row broadcast.
  // ---------------------------------------------------------------------------
  val SWEEP_TAUS: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  def q133ThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tokenJaccardPairsAt(spark, dir, SWEEP_TAUS.min)
      .select(col("doc_b"), col("jaccard"))
      .localCheckpoint() // the one quadratic pass feeds all five thresholds
    val tokens = Tables
      .balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .localCheckpoint() // feeds dropped-token sums and the corpus total
    val total = tokens.agg(sum(col("n_tokens")).as("total_tokens")) // 1 row -> broadcast

    val fanned = pairs
      .withColumn("tau", explode(typedLit(SWEEP_TAUS)))
      .filter(col("jaccard") >= col("tau"))
    val nPairs = fanned.groupBy(col("tau")).agg(count(lit(1)).as("n_pairs"))
    val drops = fanned
      .select(col("tau"), col("doc_b"))
      .distinct()
      .join(tokens, col("doc_b") === col("doc_id"))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("n_dropped_docs"), sum(col("n_tokens")).as("n_dropped_tokens"))

    // a τ no pair survives must still emit its zero row
    spark
      .range(1)
      .select(explode(typedLit(SWEEP_TAUS)).as("tau"))
      .join(nPairs, Seq("tau"), "left")
      .join(drops, Seq("tau"), "left")
      .crossJoin(broadcast(total))
      .select(
        col("tau"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dropped_docs"), lit(0L)).as("n_dropped_docs"),
        coalesce(col("n_dropped_tokens"), lit(0L)).as("n_dropped_tokens"),
        (floor(coalesce(col("n_dropped_tokens"), lit(0L)).cast("double") / col("total_tokens") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("drop_frac")
      )
      .orderBy(col("tau"))
  }

  val q133Oracle: String = {
    val tauList = SWEEP_TAUS.map(t => s"${t}e0").mkString(", ")
    val jac =
      "len(list_intersect(l.toks, r.toks))::DOUBLE / len(list_distinct(list_concat(l.toks, r.toks)))"
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |         list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS toks,
       |         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
       |  FROM documents),
       |p AS (
       |  SELECT round($jac, 6) AS j, r.doc_id AS doc_b
       |  FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
       |  WHERE $jac >= ${SWEEP_TAUS.min}),
       |taus AS (SELECT unnest([$tauList]) AS tau),
       |f AS (SELECT tau, j, doc_b FROM taus JOIN p ON p.j >= taus.tau),
       |np AS (SELECT tau, count(*) AS n_pairs FROM f GROUP BY tau),
       |dd AS (SELECT tau, doc_b FROM f GROUP BY tau, doc_b),
       |dt AS (SELECT tau, count(*) AS n_dropped_docs, CAST(sum(t.n_tokens) AS BIGINT) AS n_dropped_tokens
       |       FROM dd JOIN t ON t.doc_id = dd.doc_b GROUP BY tau),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM t)
       |SELECT taus.tau,
       |       CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       |       CAST(coalesce(dt.n_dropped_docs, 0) AS BIGINT) AS n_dropped_docs,
       |       CAST(coalesce(dt.n_dropped_tokens, 0) AS BIGINT) AS n_dropped_tokens,
       |       floor(CAST(coalesce(dt.n_dropped_tokens, 0) AS DOUBLE) / total_tokens * 1e6 + 0.5) / 1e6 AS drop_frac
       |FROM taus LEFT JOIN np USING (tau) LEFT JOIN dt USING (tau) CROSS JOIN tot
       |ORDER BY tau""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q137 — ingest-saturation curve: per ingest-order segment (monotone
  // doc_ids are the landing order — the StreamingCorpus contract), how much
  // of the segment is NOVEL, i.e. its exact fingerprint (q29's md5 key)
  // never appeared in any earlier document. This is the crawl-snapshot
  // saturation monitor (C4/Gopher-class pipelines publish exactly this
  // curve): a collector reads falling per-segment novelty — and a
  // flattening cumulative-distinct curve — as "this source is mined out,
  // further crawls mostly re-fetch what we have".
  //
  // Segments are a FIXED count (20 ingest-order quantile buckets of the
  // OCCUPIED id range [min_id, max_id] — anchoring at min_id, not 0, so a
  // downstream corpus slice whose ids start high still spreads over all 20
  // segments instead of collapsing into the last one), not fixed-size
  // blocks: the cumulative window then runs over <= 20 post-agg rows at
  // ANY corpus size, never a corpus-scaled frame. A doc's novelty needs no
  // per-doc join: bucket is monotone in doc_id, so each fingerprint
  // contributes exactly one novel doc in min(bucket) — the
  // novel-per-bucket table falls out of the same fp aggregation q29 runs,
  // and per-bucket totals are a second keyed aggregate. Integer bucket
  // arithmetic (((doc_id - min_id) * 20) div (max_id - min_id + 1)) is
  // exact in both engines.
  // ---------------------------------------------------------------------------
  val SAT_BUCKETS = 20

  def q137IngestSaturation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), md5(normText).as("fp"))
    val idRange = docs.agg(min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id")) // 1 row -> broadcast
    val bucketed = docs
      .crossJoin(broadcast(idRange))
      .withColumn("bucket", expr(s"((doc_id - min_id) * $SAT_BUCKETS) div (max_id - min_id + 1)"))
    val perBucket = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val novel = bucketed
      .groupBy(col("fp"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_novel"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBucket
      .join(novel, Seq("bucket"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_novel", sum(col("n_novel")).over(w))
      .select(
        col("bucket").cast("int").as("bucket"),
        col("n_docs"),
        col("n_novel"),
        expr("floor(cast(n_novel AS double) * 1e6 / cast(n_docs AS double) + 5e-1) / 1e6").as("novelty_frac"),
        col("cum_docs"),
        col("cum_novel"),
        expr("floor(cast(cum_novel AS double) * 1e6 / cast(cum_docs AS double) + 5e-1) / 1e6")
          .as("cum_novelty_frac")
      )
      .orderBy(col("bucket"))
  }

  val q137Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM documents),
       |mx AS (SELECT min(doc_id) AS min_id, max(doc_id) AS max_id FROM d),
       |b AS (SELECT doc_id, fp, ((doc_id - min_id) * $SAT_BUCKETS) // (max_id - min_id + 1) AS bucket
       |      FROM d CROSS JOIN mx),
       |per AS (SELECT bucket, count(*) AS n_docs FROM b GROUP BY 1),
       |fb AS (SELECT fp, min(bucket) AS bucket FROM b GROUP BY 1),
       |nv AS (SELECT bucket, count(*) AS n_novel FROM fb GROUP BY 1),
       |j AS (SELECT per.bucket, per.n_docs, coalesce(nv.n_novel, 0) AS n_novel
       |      FROM per LEFT JOIN nv USING (bucket))
       |SELECT CAST(bucket AS INT) AS bucket, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(n_novel AS BIGINT) AS n_novel,
       |       floor(CAST(n_novel AS DOUBLE) * 1e6 / CAST(n_docs AS DOUBLE) + 5e-1) / 1e6 AS novelty_frac,
       |       CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
       |       CAST(sum(n_novel) OVER w AS BIGINT) AS cum_novel,
       |       floor(CAST(sum(n_novel) OVER w AS DOUBLE) * 1e6 / CAST(sum(n_docs) OVER w AS DOUBLE) + 5e-1) / 1e6
       |         AS cum_novelty_frac
       |FROM j
       |WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------------------
  // q144 — winnowing fingerprint near-dup pairs: the MOSS local-fingerprint
  // scheme (Schleimer, Wilkerson & Aiken, SIGMOD 2003). Per document, hash
  // every WIN_K-token k-gram, slide a window of WIN_W consecutive k-gram
  // hashes, and SELECT the rightmost minimal hash of each window (robust
  // winnowing). The selected (hash) set is the document's fingerprint, with
  // the paper's guarantee: any two documents sharing a contiguous token run
  // of length >= WIN_K + WIN_W - 1 share at least one fingerprint — unlike
  // MinHash (q30, a GLOBAL set-similarity sketch), winnowing is a LOCAL
  // scheme that catches a long verbatim span inside otherwise-unrelated
  // documents, at ~2/(WIN_W+1) of q110's every-position cost. The pair
  // report joins documents on shared fingerprints and scores asymmetric
  // containment per side (shared / |fp|), MOSS's plagiarism-direction view.
  //
  // Rightmost-minimum selection is made engine-exact by encoding each gram
  // as `md5hex || lpad(1000000 - pos, 7, '0')` — a fixed-width string whose
  // lexicographic MIN is (min hash, max pos), so one windowed min() picks
  // the winnow fingerprint with no argmin gymnastics; both engines compute
  // the identical string. Window starts are clamped to pos <=
  // greatest(m - WIN_W + 1, 1) so short documents (m < WIN_W grams) winnow
  // their single truncated window and no phantom end-of-doc windows fire.
  //
  // Scale shape: the gram table is one row per token position (the q110
  // blow-up, linear); selection is one doc_id-partitioned window (docs are
  // bounded, partitions balanced); fingerprints appearing in > WIN_MAXDF
  // docs are dropped before pairing (MOSS's "ignore extremely common
  // fingerprints" rule — boilerplate hits everything and says nothing), so
  // each surviving fp key fans out <= WIN_MAXDF^2/2 pairs and the pair
  // stage is a bounded bucket equi-join, never all-pairs. Positions are
  // safe in 7 digits: the corpus token cap (q72's MAX_TOKENS = 5000) keeps
  // pos < 1e6 by a wide margin.
  // ---------------------------------------------------------------------------
  private val WIN_K = 8
  private val WIN_W = 4
  private val WIN_MAXDF = 100

  /** Session-cached position-carrying winnow table per (session, dir) —
    * ONE winnow pass feeds q144's pairs, q152's screen, q162's runs and
    * q163's depth leg (each used to re-winnow the corpus per call; the
    * table is the index a real pipeline materializes once).
    */
  private val winnowPosCache = new SessionCache[DataFrame]

  private[graft] def winnowPositionsCached(spark: SparkSession, dir: String): DataFrame =
    winnowPosCache.getOrBuild(spark, dir) {
      winnowFingerprintPositions(Tables.balanced(Tables.documents(spark, dir))).localCheckpoint()
    }

  /** Distinct (doc_id, fp) winnowing fingerprints per document — the set
    * view of the cached position table (projecting the position away is
    * exactly the fp set, by construction).
    */
  private[graft] def winnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    winnowPositionsCached(spark, dir).select(col("doc_id"), col("fp")).distinct()

  /** The selected (doc_id, wmin) winnow encodings over ANY (doc_id, text)
    * frame — the shared core of the fp-set view (q144/q152/streaming) and
    * the position-carrying view (q162's run profile).
    */
  private def winnowSelectedEnc(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, WIN_W - 1)
    docs
      .withColumn("norm_text", normText)
      .withColumn("toks", split(col("norm_text"), " "))
      .filter(size(col("toks")) >= WIN_K)
      .withColumn("m", size(col("toks")) - WIN_K + 1)
      .select(
        col("doc_id"),
        col("m"),
        explode(
          expr(
            s"transform(sequence(1, size(toks) - $WIN_K + 1), " +
              s"i -> struct(concat(md5(array_join(slice(toks, i, $WIN_K), ' ')), " +
              s"lpad(cast(1000000 - i AS string), 7, '0')) AS enc, i AS pos))"
          )
        ).as("g")
      )
      .select(col("doc_id"), col("m"), col("g.enc").as("enc"), col("g.pos").as("pos"))
      .withColumn("wmin", min(col("enc")).over(w))
      .filter(col("pos") <= greatest(col("m") - WIN_W + 1, lit(1)))
      .select(col("doc_id"), col("wmin"))
  }

  /** Winnowing over ANY (doc_id, text) frame — fingerprinting is per-doc
    * LOCAL (no cross-doc state), so the streaming maintainer winnows each
    * delta with the same code and the union of slices IS the batch table.
    */
  private[graft] def winnowFingerprintsOf(docs: DataFrame): DataFrame =
    winnowSelectedEnc(docs)
      .select(col("doc_id"), substring(col("wmin"), 1, 32).as("fp"))
      .distinct()

  /** Position-carrying fingerprints: the selected gram's position decodes
    * from the enc suffix (1e6 - pos, the same fixed-width field the
    * rightmost-min trick encodes), so the run profile costs no extra pass.
    */
  private[graft] def winnowFingerprintPositions(docs: DataFrame): DataFrame =
    winnowSelectedEnc(docs)
      .select(
        col("doc_id"),
        substring(col("wmin"), 1, 32).as("fp"),
        (lit(1000000) - substring(col("wmin"), 33, 7).cast("int")).as("fpos")
      )
      .distinct()

  /** The rare-fingerprint table (MOSS df cap applied) over any fingerprint
    * frame — shared by the batch q144/q152 and the streaming maintainer's
    * served reports.
    */
  private[graft] def winnowRare(fps: DataFrame): DataFrame =
    fps.join(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= WIN_MAXDF).select(col("fp")),
      "fp"
    )

  def q144WinnowPairs(spark: SparkSession, dir: String): DataFrame =
    winnowPairsFrom(winnowFingerprints(spark, dir).localCheckpoint())

  private[graft] def winnowPairsFrom(fps: DataFrame): DataFrame = {
    // one fingerprint build feeds the df cap, both pair sides, and the
    // per-doc totals
    val kept = winnowRare(fps)
    val perDoc = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    kept.as("a")
      .join(kept.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .join(perDoc.select(col("doc_id").as("doc_a"), col("n_fp").as("fp_a")), "doc_a")
      .join(perDoc.select(col("doc_id").as("doc_b"), col("n_fp").as("fp_b")), "doc_b")
      .select(
        col("doc_a"),
        col("doc_b"),
        col("shared_fps"),
        col("fp_a"),
        col("fp_b"),
        expr("floor(cast(shared_fps AS double) * 1e6 / cast(fp_a AS double) + 5e-1) / 1e6")
          .as("containment_a"),
        expr("floor(cast(shared_fps AS double) * 1e6 / cast(fp_b AS double) + 5e-1) / 1e6")
          .as("containment_b")
      )
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q144Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, len(toks) - $WIN_K + 1 AS m,
       |         unnest(list_transform(range(1, len(toks) - $WIN_K + 2), i -> i)) AS pos,
       |         unnest(list_transform(range(1, len(toks) - $WIN_K + 2),
       |                i -> md5(array_to_string(toks[i:i+$WIN_K-1], ' '))
       |                     || lpad(CAST(1000000 - i AS VARCHAR), 7, '0'))) AS enc
       |  FROM t WHERE len(toks) >= $WIN_K),
       |wm AS (
       |  SELECT doc_id, m, pos,
       |         min(enc) OVER (PARTITION BY doc_id ORDER BY pos
       |               ROWS BETWEEN CURRENT ROW AND ${WIN_W - 1} FOLLOWING) AS wmin
       |  FROM g),
       |fp AS (
       |  SELECT DISTINCT doc_id, substr(wmin, 1, 32) AS fp
       |  FROM wm WHERE pos <= greatest(m - $WIN_W + 1, 1)),
       |rare AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= $WIN_MAXDF),
       |k AS (SELECT doc_id, fp.fp FROM fp JOIN rare USING (fp)),
       |pd AS (SELECT doc_id, count(*) AS n_fp FROM k GROUP BY 1),
       |sh AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
       |  FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(shared_fps AS BIGINT) AS shared_fps,
       |       CAST(pa.n_fp AS BIGINT) AS fp_a, CAST(pb.n_fp AS BIGINT) AS fp_b,
       |       floor(CAST(shared_fps AS DOUBLE) * 1e6 / pa.n_fp + 5e-1) / 1e6 AS containment_a,
       |       floor(CAST(shared_fps AS DOUBLE) * 1e6 / pb.n_fp + 5e-1) / 1e6 AS containment_b
       |FROM sh JOIN pd pa ON pa.doc_id = sh.doc_a JOIN pd pb ON pb.doc_id = sh.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------------
  // q162 — VERBATIM-RUN PROFILE over winnow fingerprints: per source, the
  // distribution of each document's LONGEST shared verbatim run. q110/q144
  // report coverage and pair counts but not "how long are the longest
  // clones" — the signal that separates boilerplate (short runs,
  // everywhere) from mirrored articles (long runs, few places), which
  // decides whether the fix is a span mask (q154) or a doc drop (q102).
  //
  // Method: the winnow selection already encodes each selected gram's
  // POSITION in the enc suffix (1e6 - pos), so positions are free — no
  // extra pass. Matching positions per (doc, partner) come from the same
  // df-capped fingerprint equi-join q144 ships (bounded fan-out, never
  // all-pairs); a shared verbatim span selects fingerprints with gaps
  // <= WIN_W (the winnowing window guarantee), so GAPS-AND-ISLANDS with
  // break > WIN_W reassembles each span: run_len = last - first + WIN_K
  // tokens. Per doc, the max island over all partners; per source, a
  // power-of-two length histogram plus the longest run observed.
  //
  // Scale shape: one winnow pass (linear), the df-capped pair join
  // (bounded), one (doc, partner)-partitioned window over matched
  // positions (each partition is one pair's shared-fp list, small by the
  // df cap), two narrow rollups. Everything is the q144 plan plus windows
  // over already-bounded frames.
  // ---------------------------------------------------------------------------
  /** (doc_id, max_run): each doc's longest verbatim run against any
    * partner — factored over a plain (doc_id, text) frame so the spec can
    * plant a known shared span and check the measured length against the
    * SIGMOD'03 winnowing bounds.
    */
  private[graft] def verbatimRunsFrom(docs: DataFrame): DataFrame =
    verbatimRunPairs(docs)
      .groupBy(col("doc_id"))
      .agg(max(col("run_len")).as("max_run"))

  /** The island level UNDER the per-doc max: every (doc, partner,
    * island) verbatim run with its token length — q162 maxes it per doc;
    * q163 keeps the partner so the runs can be restricted to pairs that
    * CROSS the train/test split.
    */
  private[graft] def verbatimRunPairs(docs: DataFrame): DataFrame =
    verbatimRunPairsFromFps(winnowFingerprintPositions(docs).localCheckpoint())

  /** The islands walk over an ALREADY-BUILT position-carrying fingerprint
    * frame — the batch path builds it fresh; the streaming maintainer
    * serves it from its append-only slices (winnowing is per-doc local, so
    * the union of delta slices IS this frame).
    */
  private[graft] def verbatimRunPairsFromFps(fpp: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rare = fpp
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= WIN_MAXDF)
      .select(col("fp"))
    val kept = fpp.join(rare, "fp")
    val matches = kept.as("a")
      .join(kept.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("partner"), col("a.fpos").as("pos"))
      .distinct()
    val wOrd = Window.partitionBy(col("doc_id"), col("partner")).orderBy(col("pos"))
    matches
      .withColumn("prev", lag(col("pos"), 1).over(wOrd))
      .withColumn("brk", when(col("pos") - col("prev") > WIN_W, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("partner"), col("island"))
      .agg(
        (max(col("pos")) - min(col("pos")) + lit(WIN_K)).as("run_len"),
        // the run's token INTERVAL (1-based, end covers the last gram's K
        // tokens) — q162 maxes run_len per doc; q182 exports the intervals
        min(col("pos")).as("run_start"),
        (max(col("pos")) + lit(WIN_K - 1)).as("run_end")
      )
  }

  def q162VerbatimRunProfile(spark: SparkSession, dir: String): DataFrame =
    verbatimRunProfileFrom(
      verbatimRunPairsFromFps(winnowPositionsCached(spark, dir)),
      Tables.balanced(Tables.documents(spark, dir)).select(col("doc_id"), col("source"))
    )

  /** The per-source bucket rollup over a run frame — shared by the batch
    * q162 and the maintained serve ([[graft.streaming.StreamingWinnow]]).
    */
  private[graft] def verbatimRunProfileFrom(runs: DataFrame, src: DataFrame): DataFrame =
    runs
      .groupBy(col("doc_id"))
      .agg(max(col("run_len")).as("max_run"))
      .join(src, "doc_id")
      .withColumn(
        "bucket",
        expr(
          "CASE WHEN max_run < 16 THEN 'a_lt16' WHEN max_run < 32 THEN 'b_16_31' " +
            "WHEN max_run < 64 THEN 'c_32_63' WHEN max_run < 128 THEN 'd_64_127' ELSE 'e_ge128' END"
        )
      )
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), max(col("max_run")).as("longest_run"))
      .orderBy(col("source"), col("bucket"))

  /** q144's chain through the windowed-min CTE (already margin-stripped —
    * concatenate, don't re-stripMargin), then the position-decoding
    * fingerprint view and the islands walk.
    */
  /** q162's CTE chain through the per-(doc, partner, island) `runs` table —
    * shared with q163, which restricts the runs to split-crossing pairs.
    */
  private lazy val q162RunChain: String = {
    val chain = q144Oracle.substring(0, q144Oracle.indexOf("\nfp AS"))
    chain + "\n" +
      s"""fpp AS (
         |  SELECT DISTINCT doc_id, substr(wmin, 1, 32) AS fp,
         |         1000000 - CAST(substr(wmin, 33, 7) AS INT) AS fpos
         |  FROM wm WHERE pos <= greatest(m - $WIN_W + 1, 1)),
         |rare AS (SELECT fp FROM fpp GROUP BY fp HAVING count(DISTINCT doc_id) <= $WIN_MAXDF),
         |k2 AS (SELECT fpp.doc_id, fpp.fp, fpp.fpos FROM fpp JOIN rare USING (fp)),
         |m2 AS (
         |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS partner, a.fpos AS pos
         |  FROM k2 a JOIN k2 b ON a.fp = b.fp AND a.doc_id <> b.doc_id),
         |lg AS (
         |  SELECT doc_id, partner, pos,
         |         lag(pos) OVER (PARTITION BY doc_id, partner ORDER BY pos) AS prev
         |  FROM m2),
         |isl AS (
         |  SELECT doc_id, partner, pos,
         |         sum(CASE WHEN pos - prev > $WIN_W THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id, partner ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM lg),
         |runs AS (
         |  SELECT doc_id, partner, island, CAST(max(pos) - min(pos) + $WIN_K AS INT) AS run_len,
         |         CAST(min(pos) AS INT) AS run_start, CAST(max(pos) + ${WIN_K - 1} AS INT) AS run_end
         |  FROM isl GROUP BY 1, 2, 3)""".stripMargin
  }

  /** The run table as a standalone query — q163 nests it as a derived
    * table (its own WITH scope, so CTE names can never collide).
    */
  private lazy val q162RunsSql: String =
    q162RunChain + "\nSELECT doc_id, partner, run_len FROM runs"

  /** The run INTERVALS as a standalone query — q182 nests it. */
  private lazy val q162RunSpansSql: String =
    q162RunChain + "\nSELECT doc_id, partner, run_start, run_end FROM runs"

  lazy val q162Oracle: String = {
    q162RunChain + ",\n" +
      s"""longest AS (SELECT doc_id, max(run_len) AS max_run FROM runs GROUP BY 1)
         |SELECT d.source,
         |       CASE WHEN max_run < 16 THEN 'a_lt16' WHEN max_run < 32 THEN 'b_16_31'
         |            WHEN max_run < 64 THEN 'c_32_63' WHEN max_run < 128 THEN 'd_64_127'
         |            ELSE 'e_ge128' END AS bucket,
         |       count(*) AS n_docs, max(max_run) AS longest_run
         |FROM longest JOIN documents d USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q163 — CONTAMINATION DEPTH profile: the decontamination DECISION table,
  // unifying the four exact evidence legs per offending train doc in one
  // frame (the q117 composition pattern applied to eval leakage):
  //   ngram_hits     q67's exact 8-gram overlap count with the test split
  //                  (breadth: how many distinct shingles leak),
  //   near_dup_test  exact same-lang jaccard >= 0.8 partners in the test
  //                  split (q32's declared-exact pair contract crossed with
  //                  the q49 coin — whole-doc duplication of a test doc),
  //   max_run        the LONGEST verbatim run shared with any test doc
  //                  (q162's islands restricted to split-crossing pairs —
  //                  depth: Lee et al.'s "how long is the clone" signal),
  //   img_leaks      q178's image screen: how many HELD-OUT images this
  //                  train doc's image near-duplicates (the multimodal leg
  //                  — an eval image that leaked into training, possibly
  //                  re-encoded),
  // and the ACTION the evidence dictates, first-match: a near-dup of a
  // test doc is dropped; a doc whose IMAGE leaks an eval image has the
  // image dropped ('drop_image' — an image can't be span-masked, and the
  // text may be clean, so the action is narrower than 'drop' but can't
  // wait behind text masking); a >= 50-token verbatim run is span-masked
  // (q154's machinery); remaining n-gram leaks go to review. The four
  // legs answer different questions (breadth / identity / depth /
  // modality) and a curator today reads them from four reports; this is
  // the one table that drives decontamination across modalities.
  //
  // Scale shape: leg 1 is q67's plan (hashed-shingle equi-join); leg 2 is
  // the DECLARED exact pair contract at audit scale (the shipped screens
  // are q113's banded MinHash — this leg exists because exactness is what
  // makes the row a decision, not a candidate); leg 3 reuses q162's
  // df-capped bounded pair join; leg 4 is q178's band-bucket equi-join
  // over the session-cached image band table — itself df-capped since
  // r16 (the q181 bucket rule), so no leg goes quadratic on a
  // mass-duplicated frame. Rollups are per-doc keyed
  // aggregates; the final assembly is four left joins on the union of
  // offenders. The whole decision frame is SESSION-CACHED per (session,
  // dir) — q172 costs it and q179-era dashboards read it repeatedly, and
  // a real pipeline materializes the decision table once per corpus
  // snapshot (the winnowPositionsCached pattern one level up).
  // ---------------------------------------------------------------------------
  private val RUN_BLOCK = 50 // >= 50-token verbatim run -> mask, the Lee et al. convention

  private val q163Cache = new SessionCache[DataFrame]

  /** The UNORDERED cached decision frame — q163's serve path orders it,
    * q172 joins it by doc_id. Bench names the first build `q163_actions`.
    */
  private[graft] def contaminationDepthCached(spark: SparkSession, dir: String): DataFrame =
    q163Cache.getOrBuild(spark, dir) {
      contaminationDepthFrame(spark, dir).localCheckpoint()
    }

  def q163ContaminationDepth(spark: SparkSession, dir: String): DataFrame =
    contaminationDepthCached(spark, dir).orderBy(col("doc_id"))

  private def contaminationDepthFrame(spark: SparkSession, dir: String): DataFrame =
    contaminationDepthOver(
      Curation.q67Contamination(spark, dir).select(col("doc_id"), col("n_hits").as("ngram_hits")),
      buildPairGraph(spark, dir), // the session-cached q32 edge set
      verbatimRunPairsFromFps(winnowPositionsCached(spark, dir)),
      Multimodal
        .q178ImageDecontam(spark, dir)
        .select(col("train_id").as("doc_id"), col("n_eval_matches").as("img_leaks"))
    )

  /** The four-leg composition over ANY leg frames — shared by the batch
    * path (session-cached stages) and
    * [[graft.streaming.StreamingDecontam]]'s maintained-state serve, so
    * the two views cannot drift. Split buckets are the q49 coin computed
    * INLINE from the id columns (md5 arithmetic is functional on doc_id —
    * no corpus scan needed, which is what lets the serve path run without
    * a documents directory at all).
    */
  private[graft] def contaminationDepthOver(
      ngramLeg: DataFrame, // (doc_id, ngram_hits) — q67's breadth leg
      pairs: DataFrame, // (doc_a, doc_b) — the exact near-dup edge set
      runPairs: DataFrame, // (doc_id, partner, run_len) — q162's run pairs
      imgLeg: DataFrame // (doc_id, img_leaks) — q178's image screen
  ): DataFrame = {
    def bucketOf(c: Column): Column =
      conv(substring(md5(c.cast("string")), 1, 2), 16, 10).cast("int")
    val trainLt = Sampling.SPLIT_TRAIN_LT
    val valLt = Sampling.SPLIT_VALIDATION_LT
    val edges = pairs
      .select(col("doc_a"), col("doc_b"), bucketOf(col("doc_a")).as("ba"), bucketOf(col("doc_b")).as("bb"))
    val legB = edges
      .filter(col("ba") < trainLt && col("bb") >= valLt)
      .select(col("doc_a").as("doc_id"))
      .unionByName(
        edges.filter(col("bb") < trainLt && col("ba") >= valLt).select(col("doc_b").as("doc_id"))
      )
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("near_dup_test"))
    val legC = runPairs
      .filter(bucketOf(col("doc_id")) < trainLt && bucketOf(col("partner")) >= valLt)
      .groupBy(col("doc_id"))
      .agg(max(col("run_len")).as("max_run"))
    val offenders = ngramLeg
      .select("doc_id")
      .unionByName(legB.select("doc_id"))
      .unionByName(legC.select("doc_id"))
      .unionByName(imgLeg.select("doc_id"))
      .distinct()
    offenders
      .join(ngramLeg, Seq("doc_id"), "left")
      .join(legB, Seq("doc_id"), "left")
      .join(legC, Seq("doc_id"), "left")
      .join(imgLeg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("ngram_hits"), lit(0L)).as("ngram_hits"),
        coalesce(col("near_dup_test"), lit(0L)).as("near_dup_test"),
        coalesce(col("max_run"), lit(0)).as("max_run"),
        coalesce(col("img_leaks"), lit(0L)).as("img_leaks")
      )
      .withColumn(
        "action",
        expr(
          s"CASE WHEN near_dup_test > 0 THEN 'drop' WHEN img_leaks > 0 THEN 'drop_image' " +
            s"WHEN max_run >= $RUN_BLOCK THEN 'mask_spans' ELSE 'review_ngrams' END"
        )
      )
  }

  /** Each leg's existing oracle nested as a derived table (its own WITH
    * scope — no CTE renaming needed), crossed with the q49 coin. Built by
    * CONCATENATING the already-margin-stripped leg SQL between freshly
    * stripped bridge pieces — never re-stripMargin'ing spliced text (the
    * q144 chain holds `||`-leading continuation lines a second strip
    * would eat).
    */
  lazy val q163Oracle: String = {
    val head =
      """WITH coin AS (
        |  SELECT doc_id, ('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT AS b FROM documents),
        |a AS (SELECT doc_id, n_hits AS ngram_hits FROM (""".stripMargin
    val mid =
      s""")),
         |p AS (SELECT doc_a, doc_b FROM (""".stripMargin
    val bridge =
      s""")),
         |b0 AS (
         |  SELECT p.doc_a AS doc_id FROM p
         |  JOIN coin ca ON ca.doc_id = p.doc_a JOIN coin cb ON cb.doc_id = p.doc_b
         |  WHERE ca.b < ${Sampling.SPLIT_TRAIN_LT} AND cb.b >= ${Sampling.SPLIT_VALIDATION_LT}
         |  UNION ALL
         |  SELECT p.doc_b FROM p
         |  JOIN coin ca ON ca.doc_id = p.doc_a JOIN coin cb ON cb.doc_id = p.doc_b
         |  WHERE cb.b < ${Sampling.SPLIT_TRAIN_LT} AND ca.b >= ${Sampling.SPLIT_VALIDATION_LT}),
         |b AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS near_dup_test FROM b0 GROUP BY 1),
         |rr AS (SELECT doc_id, partner, run_len FROM (""".stripMargin
    val afterRuns =
      s""")),
         |c AS (
         |  SELECT rr.doc_id, CAST(max(run_len) AS INT) AS max_run
         |  FROM rr
         |  JOIN coin ct ON ct.doc_id = rr.doc_id JOIN coin cp ON cp.doc_id = rr.partner
         |  WHERE ct.b < ${Sampling.SPLIT_TRAIN_LT} AND cp.b >= ${Sampling.SPLIT_VALIDATION_LT}
         |  GROUP BY 1),
         |dd AS (SELECT train_id AS doc_id, n_eval_matches AS img_leaks FROM (""".stripMargin
    val tail =
      s""")),
         |u AS (SELECT doc_id FROM a UNION SELECT doc_id FROM b UNION SELECT doc_id FROM c UNION SELECT doc_id FROM dd)
         |SELECT u.doc_id,
         |       CAST(coalesce(a.ngram_hits, 0) AS BIGINT) AS ngram_hits,
         |       CAST(coalesce(b.near_dup_test, 0) AS BIGINT) AS near_dup_test,
         |       CAST(coalesce(c.max_run, 0) AS INT) AS max_run,
         |       CAST(coalesce(dd.img_leaks, 0) AS BIGINT) AS img_leaks,
         |       CASE WHEN coalesce(b.near_dup_test, 0) > 0 THEN 'drop'
         |            WHEN coalesce(dd.img_leaks, 0) > 0 THEN 'drop_image'
         |            WHEN coalesce(c.max_run, 0) >= $RUN_BLOCK THEN 'mask_spans'
         |            ELSE 'review_ngrams' END AS action
         |FROM u LEFT JOIN a USING (doc_id) LEFT JOIN b USING (doc_id) LEFT JOIN c USING (doc_id) LEFT JOIN dd USING (doc_id)
         |ORDER BY u.doc_id""".stripMargin
    head + "\n" + Curation.q67Oracle + "\n" + mid + "\n" + q32Oracle + "\n" + bridge + "\n" + q162RunsSql + "\n" +
      afterRuns + "\n" + Multimodal.q178Oracle + "\n" + tail
  }

  // ---------------------------------------------------------------------------
  // q172 — decontamination COST ledger: what executing q163's decision
  // table actually costs, per source — every TRAIN-split document gets its
  // dictated action (drop / drop_image / mask_spans / review_ngrams from
  // q163, 'keep' for the unflagged rest) and the ledger rolls up docs,
  // token mass, and the share of the source's train mass per (source,
  // action). q163 says what to do about each offender; this says what the
  // decision costs WHERE budgets live (the source level, where
  // q109/q158/q167 plan) — the number a curator needs before signing off
  // on a decontamination pass that might gut a source.
  //
  // Scale shape: one corpus scan for the train split + token counts, the
  // SESSION-CACHED q163 decision frame (built once per dir; its legs are
  // the audited plans), one left join on doc_id, one keyed rollup onto
  // <= |sources|×5 rows; the share is a floored micro against the
  // per-source train total carried by a count window over the bounded
  // rollup (never a corpus window).
  // ---------------------------------------------------------------------------
  def q172DecontamLedger(spark: SparkSession, dir: String): DataFrame = {
    val train = graft.core.Tables
      .balanced(graft.core.Tables.documents(spark, dir))
      .withColumn("b", conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int"))
      .filter(col("b") < Sampling.SPLIT_TRAIN_LT)
      .select(
        col("doc_id"),
        col("source"),
        size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).cast("long").as("n_toks")
      )
    decontamLedgerOver(train, contaminationDepthCached(spark, dir))
  }

  /** The ledger rollup over ANY (train-split (doc_id, source, n_toks)
    * frame, decision frame) — shared by the batch query and
    * [[graft.streaming.StreamingDecontam]]'s maintained-state serve
    * (whose token counts come off the corpus maintainer's stage table;
    * same [[Curation.funnelSignals]] whitespace arithmetic).
    */
  private[graft] def decontamLedgerOver(train: DataFrame, decisions: DataFrame): DataFrame = {
    val actions = decisions.select(col("doc_id"), col("action"))
    val perAction = train
      .join(actions, Seq("doc_id"), "left")
      .withColumn("action", coalesce(col("action"), lit("keep")))
      .groupBy(col("source"), col("action"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tokens"))
    perAction
      .withColumn(
        "src_tokens",
        sum(col("tokens")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        )
      )
      .select(
        col("source"),
        col("action"),
        col("n_docs"),
        col("tokens"),
        expr("floor(CAST(tokens AS double) * 1e6 / CAST(src_tokens AS double) + 5e-1) / 1e6")
          .as("mass_share")
      )
      .orderBy(col("source"), col("action"))
  }

  /** q163's oracle nested as a derived table (its own WITH scope), crossed
    * with the train coin and token counts.
    */
  lazy val q172Oracle: String = {
    val head =
      s"""WITH tr AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_toks
         |  FROM documents
         |  WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT < ${Sampling.SPLIT_TRAIN_LT}),
         |act AS (SELECT doc_id, action FROM (""".stripMargin
    val tail =
      """)),
        |led AS (
        |  SELECT tr.source, coalesce(act.action, 'keep') AS action,
        |         count(*) AS n_docs, CAST(sum(tr.n_toks) AS BIGINT) AS tokens
        |  FROM tr LEFT JOIN act USING (doc_id) GROUP BY 1, 2),
        |tot AS (SELECT source, sum(tokens) AS src_tokens FROM led GROUP BY 1)
        |SELECT led.source, led.action, CAST(led.n_docs AS BIGINT) AS n_docs, led.tokens,
        |       floor(CAST(led.tokens AS DOUBLE) * 1e6 / CAST(tot.src_tokens AS DOUBLE) + 5e-1) / 1e6 AS mass_share
        |FROM led JOIN tot USING (source)
        |ORDER BY led.source, led.action""".stripMargin
    head + "\n" + q163Oracle + "\n" + tail
  }

  // ---------------------------------------------------------------------------
  // q182 — decontamination MASK export: q163's `mask_spans` action EXECUTED
  // as the loader artifact — for each train doc the decision table dictates
  // span-masking, the merged (start, end) token intervals of ALL its
  // split-crossing verbatim runs, in q154's export shape (one row per
  // merged interval with a per-doc span index). q163 decides, q172 costs,
  // this executes: the q110→q154 relationship applied to decontamination
  // (don't just flag the leaked spans — stop training on them). Masked
  // intervals are the WINNOW-MEASURED spans (within [L-2(W-1), L] of the
  // true shared span, the SIGMOD'03 bound q162 documents) merged across
  // partners — every split-crossing run on a masked doc is masked, not
  // just the >= RUN_BLOCK one that dictated the action (they are all
  // leaked eval text; the long one only justified span-level treatment
  // over review).
  //
  // Scale shape: the session-cached decision frame filtered to one
  // action, the winnow run table restricted to split-crossing pairs
  // (both already-built artifacts), then q154's gaps-and-islands interval
  // merge — windows partition by doc_id over per-doc interval lists
  // (bounded by the token cap), never the corpus.
  // ---------------------------------------------------------------------------
  def q182DecontamMaskExport(spark: SparkSession, dir: String): DataFrame =
    decontamMaskOver(
      contaminationDepthCached(spark, dir),
      verbatimRunPairsFromFps(winnowPositionsCached(spark, dir))
    )

  /** The mask export over ANY (decision frame, run-pair frame) — shared by
    * the batch query and [[graft.streaming.StreamingDecontam]]'s serve.
    */
  private[graft] def decontamMaskOver(decisions: DataFrame, runPairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val masked = decisions.filter(col("action") === lit("mask_spans")).select(col("doc_id"))
    val iv = runPairs
      .filter(
        conv(substring(md5(col("partner").cast("string")), 1, 2), 16, 10).cast("int") >=
          Sampling.SPLIT_VALIDATION_LT
      )
      .join(masked, "doc_id")
      .select(col("doc_id"), col("run_start").as("pos"), col("run_end").as("endpos"))
      .distinct()
    // q154's gaps-and-islands merge, tie-ordered (pos, endpos) — intervals
    // from different partners can share a start
    val ord = Seq(col("pos"), col("endpos"))
    val wSeen = Window.partitionBy(col("doc_id")).orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("brk", when(col("pos") > coalesce(max(col("endpos")).over(wSeen), lit(-1)) + 1, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("start_pos"), max(col("endpos")).as("end_pos"))
      .withColumn(
        "span_idx",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("start_pos"))).cast("long")
      )
      .select(
        col("doc_id"),
        col("span_idx"),
        col("start_pos").cast("long").as("start_pos"),
        col("end_pos").cast("long").as("end_pos"),
        (col("end_pos") - col("start_pos") + 1).cast("long").as("span_len")
      )
      .orderBy(col("doc_id"), col("span_idx"))
  }

  /** q163's oracle (the action filter) and the run-interval chain nested
    * as derived tables (the splice rule), then q154's interval-merge SQL.
    */
  lazy val q182Oracle: String = {
    val head = "WITH act AS (SELECT doc_id FROM ("
    val mid =
      """) WHERE action = 'mask_spans'),
        |rr AS (SELECT doc_id, partner, run_start, run_end FROM (""".stripMargin
    val tail =
      s""")),
         |iv AS (
         |  SELECT DISTINCT rr.doc_id, rr.run_start AS pos, rr.run_end AS endpos
         |  FROM rr JOIN act USING (doc_id)
         |  WHERE ('0x' || substring(md5(rr.partner::VARCHAR), 1, 2))::INT >= ${Sampling.SPLIT_VALIDATION_LT}),
         |brk AS (
         |  SELECT doc_id, pos, endpos,
         |         CASE WHEN pos > coalesce(max(endpos) OVER (PARTITION BY doc_id ORDER BY pos, endpos
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1 THEN 1 ELSE 0 END AS b
         |  FROM iv),
         |isl AS (
         |  SELECT doc_id, pos, endpos,
         |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos, endpos
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM brk),
         |ms AS (
         |  SELECT doc_id, island, min(pos) AS start_pos, max(endpos) AS end_pos
         |  FROM isl GROUP BY 1, 2),
         |f AS (
         |  SELECT doc_id, start_pos, end_pos,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY start_pos) AS span_idx
         |  FROM ms)
         |SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, CAST(start_pos AS BIGINT) AS start_pos,
         |       CAST(end_pos AS BIGINT) AS end_pos, CAST(end_pos - start_pos + 1 AS BIGINT) AS span_len
         |FROM f ORDER BY doc_id, span_idx""".stripMargin
    head + "\n" + q163Oracle + "\n" + mid + "\n" + q162RunSpansSql + "\n" + tail
  }

  // ---------------------------------------------------------------------------
  // q179 — cross-modal DECONTAMINATION SURFACE: one table answering "how
  // much of the train split does each decontamination method flag?" across
  // every modality the engine screens — exact 8-gram overlap (q67), the
  // bloom serving-path screen (q166, a declared superset of q67's
  // offenders), rare verbatim winnow spans (q152), and image near-dups of
  // held-out images (q178). This is the dashboard read BEFORE picking a
  // decontamination depth (q163 then dictates per-doc actions; q172 costs
  // them per source): method coverage side by side, on a comparable
  // denominator. Denominators are the whole train split (md5 bucket <
  // SPLIT_TRAIN_LT) — the image leg's is the train split's image-kind
  // docs — and mass is n_chars (the only mass defined across modalities).
  //
  // Scale shape: three of the four flagged sets are SERVED off the
  // session-cached q163 decision frame (one build, the q172 pattern) —
  // each a proven identity, not an approximation:
  //   8gram_exact    = frame rows with ngram_hits > 0 (the frame's breadth
  //                    leg IS q67's output, coalesced to 0 only for docs
  //                    flagged by other legs; every q67 row has n_hits>=1),
  //   verbatim_spans = frame rows with max_run > 0 (q152 flags train docs
  //                    sharing >= 1 rare winnow fp with a test doc; the
  //                    frame's depth leg builds runs from the SAME
  //                    position table under the SAME WIN_MAXDF df cap and
  //                    the SAME train/test coin, and every shared rare fp
  //                    yields a run island of length >= WIN_K, so the two
  //                    sets are equal — the oracle still replays q152's own
  //                    chain, so the identity is hash-gated at the gate),
  //   image_neardup  = frame rows with img_leaks > 0 (the frame's modality
  //                    leg IS q178's output; every q178 row has
  //                    n_eval_matches >= 1).
  // The bloom leg is NOT in the frame (q166 is a declared superset of q67
  // — different screen) but its flagged set is train-only and keyed on
  // doc_id, so it left-joins the same spine as the frame: ALL four legs
  // and both scopes collapse in ONE conditional aggregate over the
  // (train docs ⋈ frame ⋈ bloom-flag) join, unpivoted to the four method
  // rows (stack) — one aggregate job instead of four leg compositions,
  // and no broadcast-scalar cross join left anywhere in the plan.
  // Empty-corpus contract: four all-zero rows with NULL fractions
  // (CASE-guarded, the ANSI rule) in both engines (a global aggregate
  // always emits its row).
  // ---------------------------------------------------------------------------
  private val q179ScopeCache = new SessionCache[DataFrame]

  private val q179FracSql =
    "CASE WHEN n_scope = 0 THEN NULL ELSE floor(CAST(n_flagged AS DOUBLE) * 1e6 / n_scope + 5e-1) / 1e6 END"
  private val q179CharsFracSql =
    "CASE WHEN scope_chars = 0 THEN NULL ELSE floor(CAST(flagged_chars AS DOUBLE) * 1e6 / scope_chars + 5e-1) / 1e6 END"

  def q179DecontamSurface(spark: SparkSession, dir: String): DataFrame = {
    // one train-split scan feeds both scopes and all four mass joins —
    // session-cached (r16): the surface is a dashboard read repeatedly
    // against the same corpus snapshot, and with every leg served from
    // cached state this scan was the only remaining per-call corpus touch
    q179SurfaceOver(
      trainScopeCached(spark, dir),
      contaminationDepthCached(spark, dir),
      Curation.q166BloomScreen(spark, dir)
    )
  }

  /** The session-cached train-split scope frame (doc_id, n_chars) — one
    * corpus scan shared by q179's surface and q184's overlap matrix.
    */
  private def trainScopeCached(spark: SparkSession, dir: String): DataFrame =
    q179ScopeCache.getOrBuild(spark, dir) {
      Tables
        .balanced(Tables.documents(spark, dir))
        .withColumn("bucket", conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int"))
        .filter(col("bucket") < Sampling.SPLIT_TRAIN_LT)
        .select(col("doc_id"), col("n_chars"))
        .localCheckpoint()
    }

  /** The surface rollup over ANY (train-split (doc_id, n_chars) scope,
    * decision frame, q166-flagged frame) — shared by the batch query and
    * [[graft.streaming.StreamingDecontam]]'s maintained-state serve (whose
    * scope comes off the corpus maintainer's stage table, r16's `n_chars`
    * state column). The modality kind is derived here from doc_id — one
    * definition for both callers.
    */
  private[graft] def q179SurfaceOver(train: DataFrame, frame: DataFrame, bloomScreen: DataFrame): DataFrame = {
    val docs = train.withColumn(
      "kind",
      element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
    )
    // the bloom flagged set is train-only by construction (q166 screens
    // the train split), so left-joining it onto the train spine loses
    // nothing — it becomes one more conditional column
    val bloomFlagged = bloomScreen
      .select(col("doc_id"))
      .distinct()
      .withColumn("bl", lit(1))
    def flaggedAgg(pred: Column, f: String, c: String): Seq[Column] = Seq(
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(f),
      coalesce(sum(when(pred, col("n_chars")).otherwise(0L)), lit(0L)).as(c)
    )
    val one = docs
      .join(
        frame.select(col("doc_id"), col("ngram_hits"), col("max_run"), col("img_leaks")),
        Seq("doc_id"),
        "left"
      )
      .join(bloomFlagged, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_scope_all"),
        (Seq(
          coalesce(sum(col("n_chars")), lit(0L)).as("scope_chars_all"),
          coalesce(sum(when(col("kind") === lit("image"), 1L).otherwise(0L)), lit(0L)).as("n_scope_img"),
          coalesce(sum(when(col("kind") === lit("image"), col("n_chars")).otherwise(0L)), lit(0L))
            .as("scope_chars_img")
        ) ++ flaggedAgg(col("ngram_hits") > 0, "f1", "c1")
          ++ flaggedAgg(col("bl") === 1, "f2", "c2")
          ++ flaggedAgg(col("max_run") > 0, "f3", "c3")
          ++ flaggedAgg(col("img_leaks") > 0, "f4", "c4")): _*
      )
    one
      .select(expr(
        """stack(4,
          |  '8gram_exact',    n_scope_all, scope_chars_all, f1, c1,
          |  'bloom_screen',   n_scope_all, scope_chars_all, f2, c2,
          |  'image_neardup',  n_scope_img, scope_chars_img, f4, c4,
          |  'verbatim_spans', n_scope_all, scope_chars_all, f3, c3
          |) AS (method, n_scope, scope_chars, n_flagged, flagged_chars)""".stripMargin
      ))
      .select(
        col("method"),
        col("n_scope"),
        col("scope_chars"),
        col("n_flagged"),
        col("flagged_chars"),
        expr(q179FracSql).as("flagged_frac"),
        expr(q179CharsFracSql).as("chars_frac")
      )
      .orderBy(col("method"))
  }

  /** All four leg oracles nested as derived tables (the q163 splice rule —
    * each already margin-stripped, concatenated between freshly stripped
    * bridges), flagged sets reduced to distinct train doc ids, then one
    * scalar-subquery leg per method.
    */
  lazy val q179Oracle: String = {
    val head =
      s"""WITH doc0 AS (
         |  SELECT doc_id, n_chars,
         |         ('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT AS bucket,
         |         ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind
         |  FROM documents),
         |trs AS (SELECT doc_id, n_chars, kind FROM doc0 WHERE bucket < ${Sampling.SPLIT_TRAIN_LT}),
         |sa AS (SELECT count(*) AS n_scope, coalesce(sum(n_chars), 0) AS scope_chars FROM trs),
         |si AS (SELECT count(*) AS n_scope, coalesce(sum(n_chars), 0) AS scope_chars FROM trs WHERE kind = 'image'),
         |g1 AS (SELECT DISTINCT doc_id FROM (""".stripMargin
    val b12 = """)),
                |g2 AS (SELECT DISTINCT doc_id FROM (""".stripMargin
    val b23 = """)),
                |g3 AS (SELECT DISTINCT doc_id FROM (""".stripMargin
    val b34 = """)),
                |g4 AS (SELECT DISTINCT train_id AS doc_id FROM (""".stripMargin
    val tail =
      s""")),
         |legs AS (
         |  SELECT '8gram_exact' AS method, sa.n_scope, sa.scope_chars,
         |         (SELECT count(*) FROM g1) AS n_flagged,
         |         (SELECT coalesce(sum(n_chars), 0) FROM g1 JOIN trs USING (doc_id)) AS flagged_chars
         |  FROM sa
         |  UNION ALL
         |  SELECT 'bloom_screen', sa.n_scope, sa.scope_chars,
         |         (SELECT count(*) FROM g2),
         |         (SELECT coalesce(sum(n_chars), 0) FROM g2 JOIN trs USING (doc_id))
         |  FROM sa
         |  UNION ALL
         |  SELECT 'verbatim_spans', sa.n_scope, sa.scope_chars,
         |         (SELECT count(*) FROM g3),
         |         (SELECT coalesce(sum(n_chars), 0) FROM g3 JOIN trs USING (doc_id))
         |  FROM sa
         |  UNION ALL
         |  SELECT 'image_neardup', si.n_scope, si.scope_chars,
         |         (SELECT count(*) FROM g4),
         |         (SELECT coalesce(sum(n_chars), 0) FROM g4 JOIN trs USING (doc_id))
         |  FROM si)
         |SELECT method, CAST(n_scope AS BIGINT) AS n_scope, CAST(scope_chars AS BIGINT) AS scope_chars,
         |       CAST(n_flagged AS BIGINT) AS n_flagged, CAST(flagged_chars AS BIGINT) AS flagged_chars,
         |       $q179FracSql AS flagged_frac,
         |       $q179CharsFracSql AS chars_frac
         |FROM legs ORDER BY method""".stripMargin
    head + "\n" + Curation.q67Oracle + "\n" + b12 + "\n" + Curation.q166Oracle + "\n" + b23 + "\n" +
      q152Oracle + "\n" + b34 + "\n" + Multimodal.q178Oracle + "\n" + tail
  }

  // ---------------------------------------------------------------------------
  // q184 — decontamination method OVERLAP matrix: the dashboard read AFTER
  // q179. q179 says how much each method flags; this says how much the
  // methods flag the SAME documents — the redundancy/complementarity
  // question a curator answers before deciding which screens to keep
  // running at 100 TB (a method whose flagged set is contained in a
  // cheaper method's set buys nothing; a disjoint one is load-bearing).
  // One row per unordered method pair (6 rows over the 4 methods of
  // q179): flagged counts for both sides, the intersection, the union,
  // the overlap Jaccard, and the containment (intersection over the
  // smaller set — 1.0 reads "the smaller screen is subsumed").
  //
  // Scale shape: the same cached spine as q179 — train scope (session
  // cache) left-joined to the cached q163 decision frame and the served
  // q166 screen, reduced by ONE conditional aggregate to a single row of
  // 10 counts and stack-unpivoted onto the 6 pair rows. No pair join,
  // no window, nothing corpus-sized after the keyed joins; the pairwise
  // intersections are products of per-doc 0/1 flags inside the same
  // aggregate. Fractions are floored micros over exact 64-bit counts,
  // CASE-guarded (the ANSI zero-denominator rule) in both engines.
  //
  // Method keys and their flag identities are EXACTLY q179's (8gram_exact
  // = frame.ngram_hits > 0, bloom_screen = q166 membership, image_neardup
  // = frame.img_leaks > 0, verbatim_spans = frame.max_run > 0); the
  // oracle replays the four leg chains wholesale (q163 splice rule), so
  // the identities stay hash-gated here too.
  // ---------------------------------------------------------------------------
  private val q184JaccardSql =
    "CASE WHEN n_union = 0 THEN NULL ELSE floor(CAST(n_both AS DOUBLE) * 1e6 / n_union + 5e-1) / 1e6 END"
  private val q184ContainSql =
    "CASE WHEN least(n_a, n_b) = 0 THEN NULL ELSE floor(CAST(n_both AS DOUBLE) * 1e6 / least(n_a, n_b) + 5e-1) / 1e6 END"

  def q184DecontamOverlap(spark: SparkSession, dir: String): DataFrame =
    q184OverlapOver(
      trainScopeCached(spark, dir).select(col("doc_id")),
      contaminationDepthCached(spark, dir),
      Curation.q166BloomScreen(spark, dir)
    )

  /** The overlap rollup over ANY (train-split (doc_id) scope, decision
    * frame, q166-flagged frame) — shared by the batch query and
    * [[graft.streaming.StreamingDecontam]]'s maintained-state serve.
    * Flag columns m1..m4 are in lexicographic METHOD order (8gram_exact,
    * bloom_screen, image_neardup, verbatim_spans) so the stack rows land
    * pre-sorted on (method_a, method_b).
    */
  private[graft] def q184OverlapOver(train: DataFrame, frame: DataFrame, bloomScreen: DataFrame): DataFrame = {
    val bloomFlagged = bloomScreen.select(col("doc_id")).distinct().withColumn("bl", lit(1))
    val flags = train
      .join(
        frame.select(col("doc_id"), col("ngram_hits"), col("max_run"), col("img_leaks")),
        Seq("doc_id"),
        "left"
      )
      .join(bloomFlagged, Seq("doc_id"), "left")
      .select(
        when(col("ngram_hits") > 0, 1L).otherwise(0L).as("m1"),
        when(col("bl") === 1, 1L).otherwise(0L).as("m2"),
        when(col("img_leaks") > 0, 1L).otherwise(0L).as("m3"),
        when(col("max_run") > 0, 1L).otherwise(0L).as("m4")
      )
    val one = flags.agg(
      coalesce(sum(col("m1")), lit(0L)).as("n1"),
      (Seq("m2" -> "n2", "m3" -> "n3", "m4" -> "n4")
        .map { case (m, n) => coalesce(sum(col(m)), lit(0L)).as(n) } ++
        Seq(("m1", "m2", "b12"), ("m1", "m3", "b13"), ("m1", "m4", "b14"),
          ("m2", "m3", "b23"), ("m2", "m4", "b24"), ("m3", "m4", "b34"))
          .map { case (a, b, n) => coalesce(sum(col(a) * col(b)), lit(0L)).as(n) }): _*
    )
    one
      .select(expr(
        """stack(6,
          |  '8gram_exact',   'bloom_screen',   n1, n2, b12,
          |  '8gram_exact',   'image_neardup',  n1, n3, b13,
          |  '8gram_exact',   'verbatim_spans', n1, n4, b14,
          |  'bloom_screen',  'image_neardup',  n2, n3, b23,
          |  'bloom_screen',  'verbatim_spans', n2, n4, b24,
          |  'image_neardup', 'verbatim_spans', n3, n4, b34
          |) AS (method_a, method_b, n_a, n_b, n_both)""".stripMargin
      ))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_both"))
      .select(
        col("method_a"),
        col("method_b"),
        col("n_a"),
        col("n_b"),
        col("n_both"),
        col("n_union"),
        expr(q184JaccardSql).as("overlap_jaccard"),
        expr(q184ContainSql).as("containment")
      )
      .orderBy(col("method_a"), col("method_b"))
  }

  /** The same four leg oracles as [[q179Oracle]] nested as derived tables
    * (q163 splice rule), reduced to per-doc 0/1 flags on the train spine,
    * one aggregate row of the 10 counts, then the 6 pair rows. Note the
    * splice ORDER is q179's (g3 = verbatim runs, g4 = image) while the
    * flag order is lexicographic by method name — m3 reads g4, m4 reads
    * g3.
    */
  lazy val q184Oracle: String = {
    val head =
      s"""WITH trs AS (
         |  SELECT doc_id FROM documents
         |  WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT < ${Sampling.SPLIT_TRAIN_LT}),
         |g1 AS (SELECT DISTINCT doc_id FROM (""".stripMargin
    val b12 = """)),
                |g2 AS (SELECT DISTINCT doc_id FROM (""".stripMargin
    val b23 = """)),
                |g3 AS (SELECT DISTINCT doc_id FROM (""".stripMargin
    val b34 = """)),
                |g4 AS (SELECT DISTINCT train_id AS doc_id FROM (""".stripMargin
    val tail =
      s""")),
         |fl AS (
         |  SELECT CASE WHEN g1.doc_id IS NOT NULL THEN 1 ELSE 0 END AS m1,
         |         CASE WHEN g2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS m2,
         |         CASE WHEN g4.doc_id IS NOT NULL THEN 1 ELSE 0 END AS m3,
         |         CASE WHEN g3.doc_id IS NOT NULL THEN 1 ELSE 0 END AS m4
         |  FROM trs t
         |  LEFT JOIN g1 ON t.doc_id = g1.doc_id
         |  LEFT JOIN g2 ON t.doc_id = g2.doc_id
         |  LEFT JOIN g3 ON t.doc_id = g3.doc_id
         |  LEFT JOIN g4 ON t.doc_id = g4.doc_id),
         |agg AS (
         |  SELECT coalesce(sum(m1), 0) AS n1, coalesce(sum(m2), 0) AS n2,
         |         coalesce(sum(m3), 0) AS n3, coalesce(sum(m4), 0) AS n4,
         |         coalesce(sum(m1 * m2), 0) AS b12, coalesce(sum(m1 * m3), 0) AS b13,
         |         coalesce(sum(m1 * m4), 0) AS b14, coalesce(sum(m2 * m3), 0) AS b23,
         |         coalesce(sum(m2 * m4), 0) AS b24, coalesce(sum(m3 * m4), 0) AS b34
         |  FROM fl),
         |pairs AS (
         |  SELECT '8gram_exact' AS method_a, 'bloom_screen' AS method_b, n1 AS n_a, n2 AS n_b, b12 AS n_both FROM agg
         |  UNION ALL SELECT '8gram_exact', 'image_neardup', n1, n3, b13 FROM agg
         |  UNION ALL SELECT '8gram_exact', 'verbatim_spans', n1, n4, b14 FROM agg
         |  UNION ALL SELECT 'bloom_screen', 'image_neardup', n2, n3, b23 FROM agg
         |  UNION ALL SELECT 'bloom_screen', 'verbatim_spans', n2, n4, b24 FROM agg
         |  UNION ALL SELECT 'image_neardup', 'verbatim_spans', n3, n4, b34 FROM agg),
         |pu AS (SELECT method_a, method_b, n_a, n_b, n_both, n_a + n_b - n_both AS n_union FROM pairs)
         |SELECT method_a, method_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |       CAST(n_both AS BIGINT) AS n_both, CAST(n_union AS BIGINT) AS n_union,
         |       $q184JaccardSql AS overlap_jaccard,
         |       $q184ContainSql AS containment
         |FROM pu ORDER BY method_a, method_b""".stripMargin
    head + "\n" + Curation.q67Oracle + "\n" + b12 + "\n" + Curation.q166Oracle + "\n" + b23 + "\n" +
      q152Oracle + "\n" + b34 + "\n" + Multimodal.q178Oracle + "\n" + tail
  }

  // ---------------------------------------------------------------------------
  // q146 — LSH band-shape planner: the S-curve tuning table read BEFORE
  // committing K=16 minhash components to a band shape. For every
  // factorization K = r·b (rows-per-band × bands), a pair with true
  // jaccard j becomes an LSH candidate with probability p = 1-(1-j^r)^b
  // (the standard banding S-curve, Leskovec/Rajaraman/Ullman ch.3) —
  // steeper r trades recall at the τ=0.8 verify threshold against
  // near-miss candidate mass (the exact-verify workload). This planner
  // evaluates every shape against the CORPUS'S OWN observed pair-jaccard
  // distribution (the q133 exact pass at j >= 0.5), not a textbook prior:
  // expected candidate recall over the true (j >= τ) pairs, expected
  // candidate fraction over the near-misses (0.5 <= j < τ), and a verdict
  // at the 0.95 recall floor — the numbers that justify (or indict) the
  // r=2, b=8 shape q30/q101 ship.
  //
  // Engine-exactness: every exponent in the grid is a power of two, so
  // j^r and (1-j^r)^b are REPEATED-SQUARING multiplication chains — one
  // generated expression string shared verbatim with the oracle, no libm
  // pow — and each pair's p is floored to integer micros before the
  // rollup, so the per-shape sums are exact 64-bit arithmetic (the q105
  // merge-order rule).
  //
  // Scale shape: reuses the one declared quadratic pass q133 already
  // stages (the session-cached exact miner at the grid minimum — at
  // 100 TB feed the q101 banded+verified pair frame instead); the shape
  // fan-out is an explode over a 5-element literal and the rollup lands
  // on 5 rows.
  // ---------------------------------------------------------------------------
  private val LSH_PLAN_TAU = 0.8
  private val LSH_GRID: Seq[(Int, Int)] = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))

  /** x^e for power-of-two e as an explicit squaring chain — identical
    * IEEE-double multiplication order in both engines.
    */
  private def powChain(x: String, e: Int): String = {
    // halving-only chain: correct ONLY for power-of-two e (e=3 would fold
    // to x^2) — guard loudly, because a wrong expression would be spliced
    // identically into both engines and the oracle gate could never see it
    require(Integer.bitCount(e) == 1, s"powChain supports power-of-two exponents only, got $e")
    if (e == 1) x else { val h = powChain(x, e / 2); s"($h * $h)" }
  }

  /** floor-micro'd candidate probability 1-(1-j^r)^b, branching on the
    * exploded (r, b) columns; generated once, spliced into both engines.
    */
  private def lshPCase: String =
    LSH_GRID
      .map { case (r, b) =>
        s"WHEN r = $r AND b = $b THEN CAST(floor((1e0 - ${powChain(s"(1e0 - ${powChain("j", r)})", b)}) * 1e6 + 5e-1) AS BIGINT)"
      }
      .mkString("CASE ", " ", " END")

  def q146LshPlan(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tokenJaccardPairsAt(spark, dir, SWEEP_TAUS.min)
      .select(col("jaccard").as("j"))
    pairs
      .withColumn("cfg", explode(typedLit(LSH_GRID)))
      .select(col("j"), col("cfg._1").as("r"), col("cfg._2").as("b"))
      .withColumn("p_micro", expr(lshPCase))
      .withColumn("is_true", (col("j") >= LSH_PLAN_TAU).cast("int"))
      .groupBy(col("r"), col("b"))
      .agg(
        sum(col("is_true")).as("n_true_pairs"),
        sum(when(col("is_true") === 1, col("p_micro"))).as("true_sum"),
        (count(lit(1)) - sum(col("is_true"))).as("n_nearmiss_pairs"),
        sum(when(col("is_true") === 0, col("p_micro"))).as("near_sum")
      )
      .select(
        col("r"),
        col("b"),
        col("n_true_pairs"),
        expr("floor(cast(true_sum AS double) / n_true_pairs + 5e-1) / 1e6").as("expected_recall"),
        col("n_nearmiss_pairs"),
        expr("floor(cast(near_sum AS double) / n_nearmiss_pairs + 5e-1) / 1e6").as("nearmiss_candidate_frac"),
        expr("CASE WHEN floor(cast(true_sum AS double) / n_true_pairs + 5e-1) >= 950000 THEN 'ok' ELSE 'below_floor' END")
          .as("verdict")
      )
      .orderBy(col("r"))
  }

  lazy val q146Oracle: String = {
    val jac =
      "len(list_intersect(l.toks, r.toks))::DOUBLE / len(list_distinct(list_concat(l.toks, r.toks)))"
    val grid = LSH_GRID.map { case (r, b) => s"{'r': $r, 'b': $b}" }.mkString(", ")
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |         list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS toks
       |  FROM documents),
       |p AS (
       |  SELECT round($jac, 6) AS j
       |  FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
       |  WHERE $jac >= ${SWEEP_TAUS.min}),
       |cfg AS (SELECT unnest([$grid], recursive := true)),
       |f AS (
       |  SELECT r, b, j, $lshPCase AS p_micro,
       |         CASE WHEN j >= $LSH_PLAN_TAU THEN 1 ELSE 0 END AS is_true
       |  FROM p CROSS JOIN cfg),
       |ag AS (
       |  SELECT r, b,
       |         CAST(sum(is_true) AS BIGINT) AS n_true_pairs,
       |         CAST(sum(CASE WHEN is_true = 1 THEN p_micro END) AS BIGINT) AS true_sum,
       |         CAST(count(*) - sum(is_true) AS BIGINT) AS n_nearmiss_pairs,
       |         CAST(sum(CASE WHEN is_true = 0 THEN p_micro END) AS BIGINT) AS near_sum
       |  FROM f GROUP BY 1, 2)
       |SELECT r, b, n_true_pairs,
       |       floor(CAST(true_sum AS DOUBLE) / n_true_pairs + 5e-1) / 1e6 AS expected_recall,
       |       n_nearmiss_pairs,
       |       floor(CAST(near_sum AS DOUBLE) / n_nearmiss_pairs + 5e-1) / 1e6 AS nearmiss_candidate_frac,
       |       CASE WHEN floor(CAST(true_sum AS DOUBLE) / n_true_pairs + 5e-1) >= 950000
       |            THEN 'ok' ELSE 'below_floor' END AS verdict
       |FROM ag ORDER BY r""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q152 — verbatim-span contamination screen over the WINNOW index: train
  // docs (q49's md5 coin) sharing >= 1 rare winnowing fingerprint with any
  // test doc, with the shared-fp and test-doc counts per offender. The
  // third leg of the decontamination triad: q67 catches exact 8-gram
  // overlap at full gram-index cost, q113 catches NEAR-duplicates via
  // MinHash, and this screen catches verbatim runs >= WIN_K+WIN_W-1 tokens
  // (the SIGMOD'03 guarantee) from an index 2/(WIN_W+1) the size of the
  // full gram table — the economics that matter when the screen runs on
  // every ingest tick at 100 TB. The df cap (q144's MOSS rule) keeps
  // boilerplate fingerprints from flagging everything; the fingerprint
  // table is per-doc local state, so an incremental tick just winnows the
  // delta and probes — no cross-doc rebuild (the q108 bucket-probe shape,
  // but stateless).
  //
  // Oracle: q144's CTE chain through the rare-capped fingerprint table,
  // plus q49's coin and the cross-split equi-join.
  // ---------------------------------------------------------------------------
  def q152WinnowContamination(spark: SparkSession, dir: String): DataFrame =
    winnowContaminationFrom(winnowFingerprints(spark, dir).localCheckpoint())

  private[graft] def winnowContaminationFrom(fps: DataFrame): DataFrame = {
    val kept = winnowRare(fps)
      .withColumn("split", Sampling.hashSplitCoin(col("doc_id")))
    kept
      .filter(col("split") === "train")
      .select(col("doc_id"), col("fp"))
      .join(kept.filter(col("split") === "test").select(col("doc_id").as("test_doc"), col("fp")), "fp")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("fp")).as("n_shared_fps"), countDistinct(col("test_doc")).as("n_test_docs"))
      .orderBy(col("doc_id"))
  }

  lazy val q152Oracle: String = {
    // chain is already margin-stripped — concatenate, don't re-stripMargin
    // (a second strip would eat the `||` continuation lines inside it)
    val chain = q144Oracle.substring(0, q144Oracle.indexOf("\npd AS"))
    chain + "\n" +
      s"""coin AS (
        |  SELECT doc_id,
        |         CASE WHEN b < ${Sampling.SPLIT_TRAIN_LT} THEN 'train' WHEN b < ${Sampling.SPLIT_VALIDATION_LT} THEN 'validation' ELSE 'test' END AS split
        |  FROM (SELECT doc_id, ('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INT AS b FROM documents)),
        |tr AS (SELECT k.doc_id, k.fp FROM k JOIN coin USING (doc_id) WHERE split = 'train'),
        |te AS (SELECT k.doc_id AS test_doc, k.fp FROM k JOIN coin USING (doc_id) WHERE split = 'test')
        |SELECT tr.doc_id,
        |       CAST(count(DISTINCT tr.fp) AS BIGINT) AS n_shared_fps,
        |       CAST(count(DISTINCT te.test_doc) AS BIGINT) AS n_test_docs
        |FROM tr JOIN te USING (fp)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_verbatim_run_profile" -> (q162VerbatimRunProfile _),
    "q163_contamination_depth" -> (q163ContaminationDepth _),
    "q172_decontam_ledger" -> (q172DecontamLedger _),
    "q182_decontam_mask_export" -> (q182DecontamMaskExport _),
    "q152_winnow_contamination" -> (q152WinnowContamination _),
    "q179_decontam_surface" -> (q179DecontamSurface _),
    "q184_decontam_overlap" -> (q184DecontamOverlap _),
    "q185_syndication_rank" -> (q185SyndicationRank _),
    "q146_lsh_plan" -> (q146LshPlan _),
    "q144_winnow_pairs" -> (q144WinnowPairs _),
    "q29_exact_dedup" -> (q29ExactDedup _),
    "q30_minhash_pairs" -> (q30MinhashPairs _),
    "q31_simhash_pairs" -> (q31SimhashPairs _),
    "q32_token_jaccard" -> (q32TokenJaccard _),
    "q33_embedding_neardup" -> (q33EmbeddingNearDup _),
    "q60_lsh_neardup" -> (q60LshNearDup _),
    "q61_dup_clusters" -> (q61DupClusters _),
    "q90_semdedup" -> (q90SemDedup _),
    "q99_cluster_canon" -> (q99ClusterCanon _),
    "q101_lsh_dup_clusters" -> (q101LshDupClusters _),
    "q102_lsh_cluster_canon" -> (q102LshClusterCanon _),
    "q106_leakage_safe_split" -> (q106LeakageSafeSplit _),
    "q107_lsh_safe_split" -> (q107LshSafeSplit _),
    "q108_incremental_clusters" -> (q108IncrementalClusters _),
    "q113_neardup_contamination" -> (q113NeardupContamination _),
    "q117_dedup_profile" -> (q117DedupProfile _),
    "q142_syndication_matrix" -> (q142SyndicationMatrix _),
    "q133_threshold_sweep" -> (q133ThresholdSweep _),
    "q137_ingest_saturation" -> (q137IngestSaturation _)
  )

  /** q60 is embedding-space LSH (float hyperplane projections — the dot
    * products are order-sensitive IEEE sums no cross-engine SQL replay can
    * pin) → rows-only plus Verify's data-derived self-check manifest.
    * q30, q31 AND q113 were PROMOTED to oracle-gated in r15: their default
    * signature paths are md5-derived (q30/q113: q134's md5-affine
    * permutations at shingle/token grain; q31: simhash64 over md5 token
    * hashes, replayed as a 60-column majority-vote aggregate), so the
    * banded/chunked computations — CANDIDATES INCLUDED — replay verbatim
    * in DuckDB; the xxhash64/native paths survive as serving twins under
    * [[MinhashConf]] / [[SimhashConf]].
    *
    * The banded CLUSTER composites (q101/q102/q107/q108) ARE gated, each
    * against its exact twin's SQL (q61 / q99 / q106): banding itself is
    * SQL-inexpressible, but it is deterministic, and cluster TRANSITIVITY
    * repairs banding's missed edges — the equality with the exact clusters
    * is measured EXACT at both sf0.01 and sf0.1 (the same claim the
    * selfcheck proves numerically every run; registering the twin's oracle
    * upgrades it from a self-reported metric to a driver-enforced hash
    * match, the q117 pattern). The q113 pair SCREEN has no transitivity
    * repair, so it stays selfcheck-gated (see the note at its exclusion).
    */
  val oracles: Map[String, String] = Map(
    "q152_winnow_contamination" -> q152Oracle,
    "q179_decontam_surface" -> q179Oracle,
    "q184_decontam_overlap" -> q184Oracle,
    "q185_syndication_rank" -> q185Oracle,
    "q146_lsh_plan" -> q146Oracle,
    "q144_winnow_pairs" -> q144Oracle,
    "q162_verbatim_run_profile" -> q162Oracle,
    "q163_contamination_depth" -> q163Oracle,
    "q172_decontam_ledger" -> q172Oracle,
    "q182_decontam_mask_export" -> q182Oracle,
    "q29_exact_dedup" -> q29Oracle,
    "q30_minhash_pairs" -> q30Oracle,
    "q31_simhash_pairs" -> q31Oracle,
    "q32_token_jaccard" -> q32Oracle,
    "q33_embedding_neardup" -> q33Oracle,
    "q61_dup_clusters" -> q61Oracle,
    "q99_cluster_canon" -> q99Oracle,
    "q101_lsh_dup_clusters" -> q61Oracle,
    "q102_lsh_cluster_canon" -> q99Oracle,
    "q106_leakage_safe_split" -> q106Oracle,
    "q107_lsh_safe_split" -> q106Oracle,
    "q108_incremental_clusters" -> q61Oracle,
    // q113 oracle-gated since r15 under the q30 candidate-replay
    // discipline: the md5-affine default path's banded screen replays
    // verbatim in DuckDB, so engine == oracle holds REGARDLESS of the
    // banding's sub-1 recall vs the exact cross-split pair set (1.0 at
    // sf0.01, 0.999956 at sf0.1 — one borderline pair colliding in no
    // band; the honest LSH trade q60 documents). That recall stays
    // measured per run by the retained SelfCheck entry — the gate checks
    // the declared banded contract, the selfcheck reports how much of the
    // exact set it surfaces.
    "q113_neardup_contamination" -> q113Oracle,
    "q117_dedup_profile" -> q117Oracle,
    "q142_syndication_matrix" -> q142Oracle,
    "q133_threshold_sweep" -> q133Oracle,
    "q137_ingest_saturation" -> q137Oracle
  )
}
