package graft.operators

import graft.SparkSpec

/** Structural invariants for text analysis at sf0.001. */
class TextOpsSpec extends SparkSpec {

  test("q25 lang id: one row per doc, prediction from the candidate set") {
    val rows = TextOps.q25LangId(spark, sfDir).collect()
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(rows.length === nDocs)
    assert(rows.forall(r => Set("en", "de", "es", "fr").contains(r.getAs[String]("predicted_lang"))))
  }

  test("q26 quality: scores in [0,100], buckets consistent with thresholds") {
    val rows = TextOps.q26QualityScore(spark, sfDir).collect()
    rows.foreach { r =>
      val s = r.getAs[Double]("quality_score")
      assert(s >= 0 && s <= 100)
      val b = r.getAs[String]("bucket")
      if (s >= 70) assert(b == "keep") else if (s >= 45) assert(b == "review") else assert(b == "drop")
    }
  }

  test("q27 token counts: bpe >= ws tokens (bpe splits punctuation off)") {
    val rows = TextOps.q27TokenCounts(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bpe_tokens") >= r.getAs[Long]("total_ws_tokens"))
      assert(r.getAs[Long]("n_docs") > 0)
    }
  }

  test("q28 fingerprints: stable across runs and whitespace-insensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = TextOps.q28Fingerprint(spark, sfDir).collect()
    val b = TextOps.q28Fingerprint(spark, sfDir).collect()
    assert(a.sameElements(b))
    // same normalized content → same md5, regardless of spacing/case
    val df = Seq(("Hello  World", 1), ("hello world", 2)).toDF("text", "doc_id")
    val fp = df
      .withColumn("f", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .select("f")
      .collect()
    assert(fp(0).getString(0) === fp(1).getString(0))
  }

  test("q62 tf-idf: <=3 ranked terms per doc, scores non-negative and ordered") {
    val rows = TextOps.q62TfIdf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= 3, s"doc $doc has ${rs.length} rows")
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length), s"doc $doc ranks not dense")
      // scores non-increasing with rank; non-negative (df <= N => ln >= 0)
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"doc $doc scores increase")
      assert(scores.forall(_ >= 0.0))
    }
    // a term present in EVERY document must score 0 and so never outranks
    // any doc-discriminating term (idf = ln(1) = 0)
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    val top = rows.filter(_.getInt(1) == 1)
    assert(top.forall(r => r.getDouble(3) > 0.0 || nDocs == 1))
  }

  test("q54 length blocking is lossless vs the all-pairs theta form") {
    import org.apache.spark.sql.functions._
    val names = graft.core.Tables
      .part(spark, sfDir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
    // brute-force reference: the pruned-cartesian form q54 used to run
    val brute = names
      .as("l")
      .join(
        names.as("r"),
        col("l.p_name") < col("r.p_name") &&
          levenshtein(col("l.p_name"), col("r.p_name")) <= 2
      )
      .select(col("l.p_name"), col("r.p_name"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val blocked = TextOps
      .q54FuzzyNames(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(blocked.toSet === brute, "length blocking changed the pair set")
    assert(blocked.distinct.length === blocked.length, "blocking duplicated a pair")
  }

  test("q54 plan: length-blocked equi-join, no BroadcastNestedLoopJoin/cartesian") {
    val plan = TextOps.q54FuzzyNames(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"q54 must not plan a BNLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q54 must not plan a cartesian:\n$plan")
  }
}
