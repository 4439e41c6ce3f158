package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized equivalence: for arbitrary corpora and arbitrary watermark
  * split points, the incremental delta apply must reproduce the full
  * rebuild EXACTLY — the q108 contract, exercised far beyond the planted
  * cases (random cluster shapes, random bridges, random singleton links,
  * deltas that are empty, everything, or anywhere in between).
  */
class IncrementalClustersPropSpec extends SparkSpec {

  test("random corpora x random split points: clustersApply == clustersFrom rebuild") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 12).map(i => s"w$i")

    for (trial <- 1 to 3) {
      // 24 docs over a small vocabulary: random subsets collide into
      // jaccard>=0.8 near-dup groups by chance, plus planted exact dups
      val base = (0 until 18).map { id =>
        val k = 5 + rnd.nextInt(6)
        id.toLong -> rnd.shuffle(vocab).take(k)
      }
      val dups = (18 until 24).map { id =>
        val src = base(rnd.nextInt(base.size))._2
        // drop or keep one token — at most one set-edit from the source
        val toks = if (rnd.nextBoolean() && src.size > 5) src.drop(1) else src
        id.toLong -> toks
      }
      val corpus = base ++ dups
      val docs = corpus
        .map { case (id, toks) => (id, toks.mkString(" "), "en", "srcX", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")

      val t = Dedup
        .tokenSetsFrom(spark, docs)
        .filter(size(col("toks")) > 0)
        .withColumn("sig", expr("minhash_sigs16(toks)"))
        .localCheckpoint()
      def edgesOf(frame: org.apache.spark.sql.DataFrame) = {
        val bb = Dedup.bandBuckets(frame.select(col("doc_id"), col("sig")))
        val cand = bb
          .as("l")
          .join(bb.as("r"), Seq("band", "key"))
          .filter(col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
          .distinct()
        Dedup.verifyEdges(frame, cand)
      }
      val full = Dedup.clustersFrom(edgesOf(t)).collect()
      assert(full.nonEmpty, s"trial $trial generated no clusters — tighten the generator")

      // three split points per corpus: delta empty, delta everything, and a
      // random interior watermark
      for (pivot <- Seq(23L, -1L, rnd.nextInt(24).toLong)) {
        val tOld = t.filter(col("doc_id") <= pivot)
        val oldLabels = Dedup.clustersFrom(edgesOf(tOld)).select(col("doc_id"), col("cluster"))
        val inc = Dedup.clustersApply(t, col("doc_id") > pivot, oldLabels).collect()
        def rows(a: Array[org.apache.spark.sql.Row]) =
          a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(
          rows(inc) === rows(full),
          s"trial $trial pivot $pivot: incremental diverged from rebuild"
        )
      }
      info(s"trial $trial: ${full.map(_.getLong(1)).distinct.length} clusters over ${full.length} docs — 3 pivots equal")
    }
  }
}
