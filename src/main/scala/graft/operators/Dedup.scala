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

  /** 3-word shingle hash array (distinct), as one codegen'd expression:
    * split → slide a 3-window via transform over an index sequence →
    * xxhash64 each shingle → distinct.
    */
  private val shingleHashes: Column = expr(
    """array_distinct(transform(
      |  sequence(0, greatest(size(split(norm_text, ' ')) - 3, 0)),
      |  i -> xxhash64(array_join(slice(split(norm_text, ' '), i + 1, 3), ' '))))""".stripMargin
  )

  // ---------------------------------------------------------------------------
  // q29 — exact deduplication (hash-groupBy): one survivor (min doc_id) per
  // normalized-text fingerprint. Output keeps group size so collapsed mass is
  // auditable. Single shuffle on the md5 key.
  // ---------------------------------------------------------------------------
  def q29ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
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
  // q30 — MinHash + LSH near-duplicate pairs. k=16 permutations (affine maps
  // over one xxhash64 base), 8 bands × 2 rows → candidates → exact shingle
  // Jaccard verify >= 0.5. Not SQL-expressible → rows-only driver check;
  // DedupSpec cross-checks against brute-force pairs at sf0.001.
  // ---------------------------------------------------------------------------
  private val K = 16
  private val BANDS = 8
  private val ROWS_PER_BAND = K / BANDS

  /** doc_id, shingles(array<long>), sig(array<long> of K minhashes). The K
    * "permutations" are xxhash64(h, i) — overflow-free under ANSI mode and
    * as uniform as affine maps.
    */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    val sigCols = (0 until K).map { i =>
      expr(s"array_min(transform(shingles, h -> xxhash64(h, $i)))")
    }
    Tables
      .documents(spark, dir)
      .withColumn("norm_text", normText)
      .withColumn("shingles", shingleHashes)
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", array(sigCols: _*))
      .select(col("doc_id"), col("shingles"), col("sig"))
  }

  def q30MinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = signatures(spark, dir).cache()
    // band key = hash of the band's signature slice; explode to (band, key, doc)
    val bandCols = (0 until BANDS).map { b =>
      val slice = (0 until ROWS_PER_BAND).map(r => s"sig[${b * ROWS_PER_BAND + r}]").mkString(", ")
      expr(s"named_struct('band', $b, 'key', xxhash64($b, $slice))")
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val candidates = buckets
      .as("l")
      .join(buckets.as("r"), Seq("band", "key"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    candidates
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn(
        "jaccard",
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"),
          6
        )
      )
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------------------
  // q31 — SimHash near-duplicates: 64-bit signature from token-multiset
  // hashes (frequency-weighted by construction), candidates from any shared
  // 16-bit chunk (4 tables), verified with bit_count hamming <= 6.
  // ---------------------------------------------------------------------------
  private def simhashed(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .withColumn("norm_text", normText)
      .withColumn("th", expr("transform(split(norm_text, ' '), t -> xxhash64(t))"))
      .filter(size(col("th")) > 0)
      // bit b of the signature = sign of sum over tokens of (+1/-1 at bit b)
      .withColumn(
        "simhash",
        expr(
          """aggregate(
            |  sequence(0, 63),
            |  0L,
            |  (acc, b) -> acc + if(
            |    aggregate(th, 0L, (s, h) -> s + if(((h >> b) & 1) = 1, 1L, -1L)) > 0L,
            |    shiftleft(1L, b), 0L))""".stripMargin
        )
      )
      .withColumn(
        "chunks",
        expr("transform(sequence(0, 3), c -> named_struct('c', c, 'v', (simhash >> (c * 16)) & 65535))")
      )
      .select(col("doc_id"), col("simhash"), col("chunks"))

  def q31SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhashed(spark, dir).cache()
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
  def q32TokenJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .withColumn("toks", array_distinct(split(normText, " ")))
      .select(col("lang"), col("doc_id"), col("toks"))
    docs
      .as("l")
      .join(docs.as("r"), Seq("lang"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .withColumn(
        "jaccard",
        round(
          size(array_intersect(col("l.toks"), col("r.toks"))).cast("double") /
            size(array_union(col("l.toks"), col("r.toks"))).cast("double"),
          6
        )
      )
      .filter(col("jaccard") >= 0.8)
      .select(col("lang"), col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"), col("jaccard"))
      .orderBy(col("lang"), col("doc_a"), col("doc_b"))
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

  // ---------------------------------------------------------------------------
  // q33 — embedding-cosine near-duplicate pairs (threshold calibrated to the
  // synthetic vectors; see scale note in the object doc). Dot product and
  // norms via zip_with/aggregate in double — no UDF.
  // ---------------------------------------------------------------------------
  private val cosExpr: String =
    """aggregate(zip_with(va, vb, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (a, e) -> a + e)
      | / (sqrt(aggregate(va, 0D, (a, e) -> a + cast(e AS double) * cast(e AS double)))
      |    * sqrt(aggregate(vb, 0D, (a, e) -> a + cast(e AS double) * cast(e AS double))))""".stripMargin

  def q33EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val l = emb.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val r = emb.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    l.join(r, col("vec_a") < col("vec_b"))
      .withColumn("cosine", expr(cosExpr))
      .filter(col("cosine") >= 0.45)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val q33Oracle: String =
    """WITH t AS (SELECT vec_id, embedding FROM embeddings)
      |SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
      |       round(list_sum(list_transform(list_zip(l.embedding, r.embedding),
      |                                     z -> z[1]::DOUBLE * z[2]::DOUBLE))
      |             / (sqrt(list_sum(list_transform(l.embedding, x -> x::DOUBLE * x::DOUBLE)))
      |                * sqrt(list_sum(list_transform(r.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cosine
      |FROM t l JOIN t r ON l.vec_id < r.vec_id
      |WHERE list_sum(list_transform(list_zip(l.embedding, r.embedding),
      |                              z -> z[1]::DOUBLE * z[2]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(l.embedding, x -> x::DOUBLE * x::DOUBLE)))
      |         * sqrt(list_sum(list_transform(r.embedding, x -> x::DOUBLE * x::DOUBLE)))) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_exact_dedup" -> (q29ExactDedup _),
    "q30_minhash_pairs" -> (q30MinhashPairs _),
    "q31_simhash_pairs" -> (q31SimhashPairs _),
    "q32_token_jaccard" -> (q32TokenJaccard _),
    "q33_embedding_neardup" -> (q33EmbeddingNearDup _)
  )

  /** q30/q31 are hash-based LSH — not reproducible in plain SQL → rows-only. */
  val oracles: Map[String, String] = Map(
    "q29_exact_dedup" -> q29Oracle,
    "q32_token_jaccard" -> q32Oracle,
    "q33_embedding_neardup" -> q33Oracle
  )
}
