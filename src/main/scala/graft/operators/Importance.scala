package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) — the
  * published recipe for picking the slice of a raw web corpus that "looks
  * like" a trusted target domain: estimate cheap bag-of-hashed-n-gram
  * distributions for target and raw, then weight every raw document by its
  * log importance ratio under those distributions. It complements the
  * engine's rule battery (q72), unigram scorer (q69), and bigram LM (q78)
  * with the distribution-matching selector those per-document signals can't
  * express.
  *
  * q105 declares `source = 'src0'` as the target-domain sample (the curator
  * designates any trusted slice), hashes unigrams into `N_BUCKETS` buckets
  * with the house md5 idiom (engine-agnostic, same as q49's split coin),
  * smooths both distributions add-1, and scores every document with
  * `sum_tokens ln(p_target[bucket] / p_raw[bucket])`. `selected` is the
  * sign test (weight > 0 = more target-like than raw-like) — the
  * threshold-free form; a curator composes it with q70's mixture plan for
  * rate control.
  *
  * Determinism across engines: the per-bucket log-ratio is floor-rounded to
  * an INTEGER micro count (1e-6) first; per-document weights are then pure
  * 64-bit integer arithmetic — `sum(count * lr_micro)` — so partial-agg
  * merge order can never change a result bit, and libm ln() ULP noise would
  * have to cross a half-micro boundary to matter (q62's rule, one rung
  * stronger: the sum itself is exact).
  *
  * Scale shape: tokenize+explode once into (doc, bucket) counts, staged
  * with `localCheckpoint` for its three consumers (raw histogram, target
  * histogram, scoring join). Both histograms are <= N_BUCKETS rows —
  * broadcast — and the scoring join + per-doc sum shuffles on doc_id once.
  * At 100 TB: one corpus scan, two 64-row broadcasts, one keyed shuffle.
  */
object Importance {

  /** Hashed-feature dimensionality. 64 keeps the histograms broadcast-sized
    * and the DuckDB oracle readable; production DSIR uses 10k+ — only this
    * constant changes.
    */
  val N_BUCKETS = 64

  /** The declared target-domain sample. */
  val TARGET_SOURCE = "src0"

  // ---------------------------------------------------------------------------
  // q105 — DSIR importance weights + sign-test selection over documents.
  // ---------------------------------------------------------------------------
  def q105DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val db = Tables
      .balanced(Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text")))
      .select(
        col("doc_id"),
        col("source"),
        explode(expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")).as("term")
      )
      .withColumn("bucket", (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("int") % N_BUCKETS))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // one tokenize+explode feeds histograms AND scoring

    val rawB = db.groupBy(col("bucket")).agg(sum(col("n")).as("raw_n"))
    val tgtB = db
      .filter(col("source") === TARGET_SOURCE)
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("tgt_n"))

    // <= N_BUCKETS rows: add-1 smoothed log ratio, floor-rounded to an
    // integer micro count so all downstream arithmetic is exact
    val ratios = rawB
      .join(tgtB, Seq("bucket"), "left")
      .withColumn("tgt_n", coalesce(col("tgt_n"), lit(0L)))
      .crossJoin(
        broadcast(
          db.agg(sum(col("n")).as("raw_total"), sum(when(col("source") === TARGET_SOURCE, col("n")).otherwise(0L)).as("tgt_total"))
        )
      )
      .withColumn(
        "lr_micro",
        floor(
          log(
            ((col("tgt_n") + 1).cast("double") / (col("tgt_total") + N_BUCKETS).cast("double")) /
              ((col("raw_n") + 1).cast("double") / (col("raw_total") + N_BUCKETS).cast("double"))
          ) * lit(1e6) + lit(0.5)
        ).cast("long")
      )
      .select(col("bucket"), col("lr_micro"))

    db.join(broadcast(ratios), "bucket")
      .groupBy(col("doc_id"), col("source"))
      .agg(
        sum(col("n")).cast("long").as("n_tokens"),
        sum(col("n") * col("lr_micro")).cast("long").as("w_micro")
      )
      .select(
        col("doc_id"),
        col("source"),
        col("n_tokens"),
        (col("w_micro").cast("double") / lit(1e6)).as("log_weight"),
        when(col("w_micro") > 0, 1).otherwise(0).as("selected")
      )
      .orderBy(col("doc_id"))
  }

  val q105Oracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
       |  FROM documents),
       |db AS (
       |  SELECT doc_id, source,
       |         CAST(('0x' || substring(md5(term), 1, 4)) AS INT) % $N_BUCKETS AS bucket,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM tok GROUP BY 1, 2, 3),
       |rawb AS (SELECT bucket, sum(n)::BIGINT AS raw_n FROM db GROUP BY bucket),
       |tgtb AS (SELECT bucket, sum(n)::BIGINT AS tgt_n FROM db WHERE source = '$TARGET_SOURCE' GROUP BY bucket),
       |tot AS (
       |  SELECT sum(n)::BIGINT AS raw_total,
       |         sum(CASE WHEN source = '$TARGET_SOURCE' THEN n ELSE 0 END)::BIGINT AS tgt_total
       |  FROM db),
       |ratios AS (
       |  SELECT rawb.bucket,
       |         CAST(floor(ln(((coalesce(tgt_n, 0) + 1)::DOUBLE / (tgt_total + $N_BUCKETS)::DOUBLE)
       |                      / ((raw_n + 1)::DOUBLE / (raw_total + $N_BUCKETS)::DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lr_micro
       |  FROM rawb LEFT JOIN tgtb ON rawb.bucket = tgtb.bucket CROSS JOIN tot)
       |SELECT db.doc_id, db.source,
       |       sum(n)::BIGINT AS n_tokens,
       |       (sum(n * lr_micro)::BIGINT)::DOUBLE / 1e6 AS log_weight,
       |       CAST(CASE WHEN sum(n * lr_micro) > 0 THEN 1 ELSE 0 END AS INT) AS selected
       |FROM db JOIN ratios ON db.bucket = ratios.bucket
       |GROUP BY db.doc_id, db.source
       |ORDER BY db.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_dsir_weights" -> (q105DsirWeights _)
  )

  val oracles: Map[String, String] = Map(
    "q105_dsir_weights" -> q105Oracle
  )
}
