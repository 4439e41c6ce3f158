package graft.operators

import graft.SparkSpec

/** Structural invariants for the corpus-curation operators at sf0.001.
  * (Value-level correctness is the DuckDB oracle's job — q66/q67/q68 are all
  * fully oracle-checked; these assert the semantic properties the oracle
  * hash can't explain when it fails.)
  */
class CurationSpec extends SparkSpec {

  private def tokens(text: String): Array[String] =
    text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")

  test("q66 packing: conserves docs, bins contiguous, boundaries at CTX multiples") {
    val rows = Curation.q66ContextPack(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs, "every doc in exactly one bin")
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"))).foreach {
      case ((lang, shard), bins) =>
        val sorted = bins.sortBy(_.getAs[Int]("bin"))
        assert(
          sorted.map(_.getAs[Int]("bin")).sameElements(sorted.indices),
          s"($lang,$shard) bins not contiguous from 0"
        )
        // bin k+1 exists only once the stream's running token count crossed
        // 512*(k+1): the prefix mass through bin k proves the boundary
        val prefix = sorted.map(_.getAs[Long]("bin_tokens")).scanLeft(0L)(_ + _).drop(1)
        sorted.indices.dropRight(1).foreach { k =>
          assert(prefix(k) >= 512L * (k + 1), s"($lang,$shard) bin ${k + 1} opened before boundary")
        }
    }
  }

  test("q66 shard/ctx knobs: any shard count conserves docs and token mass") {
    val base = Curation.q66ContextPack(spark, sfDir).collect()
    try {
      spark.conf.set(Curation.ShardsConf, "32")
      spark.conf.set(Curation.CtxConf, "128")
      val scaled = Curation.q66ContextPack(spark, sfDir).collect()
      assert(
        scaled.map(_.getAs[Long]("n_docs")).sum === base.map(_.getAs[Long]("n_docs")).sum,
        "re-sharding lost or duplicated docs"
      )
      assert(
        scaled.map(_.getAs[Long]("bin_tokens")).sum === base.map(_.getAs[Long]("bin_tokens")).sum,
        "re-sharding changed total token mass"
      )
      assert(
        scaled.map(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"))).distinct.length >
          base.map(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"))).distinct.length,
        "more shards must mean more independent packing streams"
      )
    } finally {
      spark.conf.unset(Curation.ShardsConf)
      spark.conf.unset(Curation.CtxConf)
    }
  }

  test("q67 contamination: only train-split docs, hits bounded by shingle count") {
    val rows = Curation.q67Contamination(spark, sfDir).collect()
    assert(rows.nonEmpty, "synthetic near-duplicates must cross the md5 split")
    val trainIds = graft.core.Tables
      .documents(spark, sfDir)
      .selectExpr("doc_id", "conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as b")
      .collect()
      .filter(_.getString(1).toInt < 205)
      .map(_.getLong(0))
      .toSet
    rows.foreach { r =>
      assert(trainIds.contains(r.getAs[Long]("doc_id")), "contamination flagged a non-train doc")
      val (n, h) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits"))
      assert(h >= 1 && h <= n)
      val c = r.getAs[Double]("contamination")
      assert(c > 0.0 && c <= 1.0)
      assert(math.abs(c - math.floor(h * 1e6 / n + 0.5) / 1e6) == 0.0, "rounding form drifted")
    }
  }

  test("q67 self-contamination: an exact duplicate of a test doc scores 1.0") {
    // the corpus's exact-dup clusters (q29) guarantee at least one pair that
    // straddles the split at sf0.001 (asserted non-empty above); here pin the
    // semantics: any train doc whose text equals a test doc's text must be
    // flagged with contamination 1.0
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .withColumn("b", expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val testTexts = docs.filter(col("b") >= 230).select("norm").distinct()
    val dupTrain = docs
      .filter(col("b") < 205)
      .join(testTexts, "norm")
      .filter(size(split(col("norm"), " ")) >= 8)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    if (dupTrain.nonEmpty) {
      val flagged = Curation
        .q67Contamination(spark, sfDir)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("contamination"))
        .toMap
      dupTrain.foreach { id =>
        assert(flagged.get(id).contains(1.0), s"exact dup of a test doc ($id) must score 1.0")
      }
    }
  }

  test("q68 repetition: ratio matches a direct recomputation per doc") {
    val rows = Curation.q68Repetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.core.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    rows.take(50).foreach { r =>
      val toks = tokens(texts(r.getAs[Long]("doc_id")))
      val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(r.getAs[Int]("n_grams") === grams.length)
      assert(r.getAs[Int]("n_distinct") === grams.distinct.length)
      val expected = math.floor((1.0 - grams.distinct.length.toDouble / grams.length) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("dup_ratio") === expected)
      val verdict = if (expected > 0.2) "flag" else "keep"
      assert(r.getAs[String]("verdict") === verdict)
    }
  }

  test("plans: q66/q68 shuffle-minimal, q67 equi-join only (no BNLJ/cartesian)") {
    for ((name, fn) <- Curation.queries) {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
    // q68 is per-row: nothing but the presentation sort may shuffle
    val q68 = Curation.q68Repetition(spark, sfDir).queryExecution.executedPlan.toString
    assert(!q68.contains("HashAggregate"), s"q68 must not aggregate:\n$q68")
  }
}
