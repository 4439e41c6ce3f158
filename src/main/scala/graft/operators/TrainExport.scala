package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Training-shard export — the last mile of the curation pipeline: turn a
  * curated corpus into the fixed set of shard files a training data loader
  * streams. Two requirements drive the design, both standard in pretraining
  * setups (and absent from the reference, whose pipeline ends at a
  * warehouse table — see `data_processing.py:303`'s terminal load step):
  *
  *   1. **Global shuffle, reproducibly.** Adjacent documents in the source
  *      corpus are correlated (same crawl, same source, same dedup
  *      cluster); a loader that streams shards sequentially needs the
  *      corpus pre-shuffled. Ordering by `md5(seed ':' doc_id)` is a
  *      deterministic permutation — re-running the export reproduces
  *      byte-identical shard order, and changing the seed reshuffles
  *      without touching the corpus.
  *   2. **Fixed shard count, hash-assigned.** shard = first-7-hex-digits of
  *      that same key mod N, so assignment needs no global coordination, is
  *      stable under corpus growth (a new doc lands in one shard, others
  *      unmoved), and each worker of an N-way loader reads exactly one
  *      file.
  *
  * Scale shape: the plan is one scan + one hash-partitioned sort
  * (`repartition(shard)` + `sortWithinPartitions`) — exactly the shuffle a
  * distributed sort-by-random-key does, with the key cryptographically
  * derived instead of RNG-drawn so the driver gate (and any re-run) can
  * reproduce it. The manifest query (q83) is the auditable plan: per-shard
  * doc/token totals plus the order-key range, all md5-deterministic, so
  * DuckDB recomputes it exactly.
  */
object TrainExport {

  val N_SHARDS = 8
  val SEED = "graft-v1"

  /** Any (doc_id, lang, source, text) frame decorated with the export key
    * and shard assignment. n_tokens is recomputed from text so the export
    * carries exactly one tokenizer regardless of what the source frame
    * staged.
    */
  private def shardedOf(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("order_key", md5(concat(lit(SEED + ":"), col("doc_id").cast("string"))))
      .withColumn(
        "shard",
        (conv(substring(col("order_key"), 1, 7), 16, 10).cast("long") % N_SHARDS).cast("int")
      )

  // ---------------------------------------------------------------------------
  // q83 — the shard manifest: what a loader (or an auditor) reads before
  // touching any shard file. Doc/token totals per shard prove balance; the
  // order-key range pins the permutation so a re-export can be verified
  // without re-reading payloads.
  // ---------------------------------------------------------------------------
  def q83ShardPlan(spark: SparkSession, dir: String): DataFrame =
    shardedOf(Tables.balanced(Tables.documents(spark, dir)))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("order_key")).as("first_key"),
        max(col("order_key")).as("last_key")
      )
      .orderBy(col("shard"))

  val q83Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |         md5('$SEED:' || doc_id::VARCHAR) AS order_key
       |  FROM documents)
       |SELECT CAST(('0x' || substring(order_key, 1, 7))::INT % $N_SHARDS AS INT) AS shard,
       |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(order_key) AS first_key, max(order_key) AS last_key
       |FROM d GROUP BY 1 ORDER BY shard""".stripMargin

  /** Write the shard files: one parquet file per shard under
    * `outDir/shard=N/`, rows in order_key order — the deterministic global
    * shuffle a trainer streams start-to-finish. `repartition(N, shard)`
    * co-locates each shard in one task (same-value hash), the
    * within-partition sort fixes row order, and `partitionBy` routes each
    * shard to its own directory while preserving that order — so each
    * shard is exactly one file written in one sequential pass.
    */
  def write(spark: SparkSession, dir: String, outDir: String): Unit =
    writeFrame(shardedOf(Tables.balanced(Tables.documents(spark, dir))), outDir)

  /** Build → export, end to end: the q77 curation-build survivors
    * ([[Curation.corpusBuildKept]]) as shard files — what an actual
    * pretraining run consumes. Same permutation contract as [[write]]; the
    * kept set itself is gated by q77's oracle.
    */
  def writeCurated(spark: SparkSession, dir: String, outDir: String): Unit =
    writeFrame(shardedOf(Curation.corpusBuildKept(spark, dir)), outDir)

  private def writeFrame(df: DataFrame, outDir: String): Unit =
    df
      .select(col("shard"), col("order_key"), col("doc_id"), col("lang"), col("source"), col("n_tokens"), col("text"))
      .repartition(N_SHARDS, col("shard"))
      .sortWithinPartitions(col("shard"), col("order_key"))
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)

  // ---------------------------------------------------------------------------
  // q132 — the multi-epoch shuffle plan: per-epoch salted permutations with
  // explicit within-shard POSITIONS. q83/write fix ONE deterministic global
  // shuffle; multi-epoch training wants each epoch reshuffled (repeated
  // data order correlates gradient noise across epochs) yet still
  // reproducible and resumable — a loader restarted at (epoch, shard, pos)
  // must find the same document there on any engine, any day. Salting the
  // md5 key with the epoch gives E independent permutations from the same
  // corpus with zero RNG state; shard membership reshuffles per epoch too.
  //
  // Scale shape: NO shard-wide rank window. pos decomposes exactly as
  // q131's rank: cumulative counts over the (epoch, shard, 4-hex-prefix)
  // AGGREGATE (≤ E×SHARDS×65536 rows — the explicit coarse grid standing in
  // for q131's natural value grid, since md5 keys are unique) + row_number
  // within a prefix's tie block (≈ corpus/(SHARDS×65536) rows — bounded).
  // The oracle uses the plain window (the declared semantics); the
  // decomposition equals it by construction, spec-pinned.
  // ---------------------------------------------------------------------------
  val EPOCHS = 2

  def q132EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables
      .balanced(Tables.documents(spark, dir).select(col("doc_id")))
      .select(col("doc_id"), explode(expr(s"sequence(0, ${EPOCHS - 1})")).as("epoch"))
      .withColumn("order_key", md5(concat(lit(SEED + ":"), col("epoch"), lit(":"), col("doc_id").cast("string"))))
      .withColumn(
        "shard",
        (conv(substring(col("order_key"), 1, 7), 16, 10).cast("long") % N_SHARDS).cast("int")
      )
      .withColumn("pfx", substring(col("order_key"), 1, 4))
      .localCheckpoint() // one keying pass feeds the grid aggregate and the tie blocks

    val grid = keyed
      .groupBy(col("epoch"), col("shard"), col("pfx"))
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "cum",
        sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("epoch"), col("shard")).orderBy(col("pfx"))
        ) - col("c")
      )

    keyed
      .join(grid, Seq("epoch", "shard", "pfx"))
      .withColumn(
        "tie_rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("epoch"), col("shard"), col("pfx"))
            .orderBy(col("order_key"), col("doc_id"))
        )
      )
      .select(col("epoch"), col("doc_id"), col("shard"), (col("cum") + col("tie_rn")).as("pos"))
      .orderBy(col("epoch"), col("doc_id"))
  }

  val q132Oracle: String =
    s"""WITH k AS (
       |  SELECT CAST(e.range AS INT) AS epoch, doc_id,
       |         md5('$SEED:' || e.range::VARCHAR || ':' || doc_id::VARCHAR) AS order_key
       |  FROM documents CROSS JOIN range($EPOCHS) e)
       |SELECT epoch, doc_id,
       |       CAST(('0x' || substring(order_key, 1, 7))::INT % $N_SHARDS AS INT) AS shard,
       |       CAST(row_number() OVER (
       |         PARTITION BY epoch, ('0x' || substring(order_key, 1, 7))::INT % $N_SHARDS
       |         ORDER BY order_key, doc_id) AS BIGINT) AS pos
       |FROM k
       |ORDER BY epoch, doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q139 — length-bucketed batching audit: per power-of-two length bucket,
  // doc/token mass and the PADDING WASTE under two batching policies —
  // pad-to-bucket-cap (the dynamic/length-bucketed batching every serious
  // loader runs) vs pad-to-global-max (the naive fixed-shape batch). The
  // delta between the two waste fractions is the exact compute a trainer
  // recovers by bucketing its batches by sequence length; the per-bucket
  // rows tell the loader author which buckets matter and where a cap
  // would truncate. Sequence packing (q66) is the zero-waste alternative
  // for pretraining; bucketed padding is what SFT/seq2seq loaders that
  // cannot split documents actually run — both belong in the inventory.
  //
  // Exactness: the bucket is PURE INTEGER arithmetic — bucket =
  // length(bin(n-1)) (the binary bit-length, i.e. ceil(log2 n) without
  // touching float log), cap = 1 << bucket — so no libm call decides a
  // boundary; waste fractions are the usual floor-micro rule over exact
  // 64-bit sums. Global max rides a 1-row broadcast (the q69 pattern).
  //
  // Scale shape: one scan -> one bounded groupBy (<= ~40 buckets ever);
  // the window-free cumulative story of q137 doesn't even arise.
  // ---------------------------------------------------------------------------
  def q139LengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .balanced(Tables.documents(spark, dir))
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr("CASE WHEN n_tokens <= 1 THEN 0 ELSE length(bin(n_tokens - 1)) END").cast("int"))
    val globalMax = docs.agg(max(col("n_tokens")).as("max_tokens")) // 1 row -> broadcast
    docs
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .withColumn("cap", expr("cast(shiftleft(1L, bucket) AS bigint)"))
      .crossJoin(broadcast(globalMax))
      .select(
        col("bucket"),
        col("cap"),
        col("n_docs"),
        col("total_tokens"),
        expr("floor(cast(n_docs * cap - total_tokens AS double) * 1e6 / cast(n_docs * cap AS double) + 5e-1) / 1e6")
          .as("bucket_pad_frac"),
        expr(
          "floor(cast(n_docs * max_tokens - total_tokens AS double) * 1e6 / cast(n_docs * max_tokens AS double) + 5e-1) / 1e6"
        ).as("global_pad_frac")
      )
      .orderBy(col("bucket"))
  }

  val q139Oracle: String =
    """WITH d AS (
      |  SELECT len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents),
      |b AS (
      |  SELECT n_tokens,
      |         CASE WHEN n_tokens <= 1 THEN 0 ELSE length(bin(n_tokens - 1)) END AS bucket
      |  FROM d),
      |mx AS (SELECT max(n_tokens) AS max_tokens FROM d),
      |g AS (
      |  SELECT bucket, count(*) AS n_docs, sum(n_tokens) AS total_tokens
      |  FROM b GROUP BY 1)
      |SELECT CAST(bucket AS INT) AS bucket,
      |       CAST(1::BIGINT << bucket AS BIGINT) AS cap,
      |       CAST(n_docs AS BIGINT) AS n_docs,
      |       CAST(total_tokens AS BIGINT) AS total_tokens,
      |       floor(CAST(n_docs * (1::BIGINT << bucket) - total_tokens AS DOUBLE) * 1e6
      |             / CAST(n_docs * (1::BIGINT << bucket) AS DOUBLE) + 5e-1) / 1e6 AS bucket_pad_frac,
      |       floor(CAST(n_docs * max_tokens - total_tokens AS DOUBLE) * 1e6
      |             / CAST(n_docs * max_tokens AS DOUBLE) + 5e-1) / 1e6 AS global_pad_frac
      |FROM g CROSS JOIN mx
      |ORDER BY bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_shard_plan" -> (q83ShardPlan _),
    "q132_epoch_shuffle" -> (q132EpochShuffle _),
    "q139_length_buckets" -> (q139LengthBuckets _)
  )

  val oracles: Map[String, String] = Map(
    "q83_shard_plan" -> q83Oracle,
    "q132_epoch_shuffle" -> q132Oracle,
    "q139_length_buckets" -> q139Oracle
  )
}
