package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup invariants at sf0.001, including an LSH-vs-brute-force recall check
  * (the part the DuckDB oracle can't cover for hash-based ops).
  */
class DedupSpec extends SparkSpec {

  test("q29 exact dedup: survivors partition the corpus") {
    val rows = Dedup.q29ExactDedup(spark, sfDir).collect()
    val total = graft.core.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_copies")).sum === total)
    val fps = rows.map(_.getAs[String]("fingerprint"))
    assert(fps.distinct.length === fps.length)
  }

  test("q30 minhash-LSH recovers exactly the brute-force Jaccard>=0.5 pairs") {
    val lsh = Dedup
      .q30MinhashPairs(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    // brute force: all-pairs 3-shingle Jaccard with the same construction
    graft.functions.VecFunctions.install(spark)
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .withColumn("norm_text", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("th", expr("transform(split(norm_text, ' '), t -> xxhash64(t))"))
      .withColumn("sh", expr("shingle_hashes(th)"))
      .select(col("doc_id"), col("sh"))
    val inter = expr("sorted_intersect_count(l.sh, r.sh)").cast("double")
    val brute = docs
      .as("l")
      .join(docs.as("r"), col("l.doc_id") < col("r.doc_id"))
      .withColumn("j", inter / (size(col("l.sh")) + size(col("r.sh")) - inter))
      .filter(col("j") >= 0.5)
      .select(col("l.doc_id"), col("r.doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    assert(brute.nonEmpty, "test corpus should contain planted near-dups")
    assert(lsh === brute)
  }

  test("q31 simhash finds most minhash near-dup pairs (recall >= 0.8)") {
    val mh = Dedup.q30MinhashPairs(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.q31SimhashPairs(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty)
    val recall = mh.count(sh.contains).toDouble / mh.size
    assert(recall >= 0.8, s"simhash recall of planted pairs was $recall")
  }

  test("q33 cosine pairs: ordered ids, cosine within [threshold, 1]") {
    val rows = Dedup.q33EmbeddingNearDup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val c = r.getDouble(2)
      assert(c >= 0.45 && c <= 1.0)
    }
  }
}
