package graft.operators

import graft.SparkSpec

/** Randomized min-mergeability: for arbitrary corpora and arbitrary
  * partitions into drops, the per-(source, h) min over the drops'
  * signatures must equal the whole corpus's signature EXACTLY — the
  * algebraic fact the StreamingSourceSketch maintainer's O(delta) tick
  * rests on, exercised beyond the maintainer spec's fixed scenario
  * (random sources, random shingle overlap, drops of every size including
  * empty and singleton).
  */
class SourceSketchPropSpec extends SparkSpec {

  test("random corpora x random drop partitions: min-merged drop signatures == whole-corpus signature") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 20).map(i => s"tok$i")

    for (trial <- 1 to 3) {
      val docs = (0 until 18).map { id =>
        val src = s"src${rnd.nextInt(4)}"
        // 8-14 tokens so every doc sheds at least one 8-shingle
        val toks = (0 until 8 + rnd.nextInt(7)).map(_ => vocab(rnd.nextInt(vocab.size)))
        (id.toLong, toks.mkString(" "), "en", src, 0L)
      }
      val full = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      val whole = Curation
        .sourceSketchSignatures(full)
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
        .toMap

      // random partition into 3 drops (some possibly empty)
      val dropOf = docs.map(_ => rnd.nextInt(3))
      val merged = scala.collection.mutable.Map[(String, Int), Long]()
      for (d <- 0 until 3) {
        val part = docs.zip(dropOf).collect { case (doc, dd) if dd == d => doc }
        if (part.nonEmpty) {
          Curation
            .sourceSketchSignatures(part.toDF("doc_id", "text", "lang", "source", "n_chars"))
            .collect()
            .foreach { r =>
              val k = (r.getString(0), r.getInt(1))
              merged(k) = math.min(merged.getOrElse(k, Long.MaxValue), r.getLong(2))
            }
        }
      }
      assert(merged.toMap === whole, s"trial $trial: min-merge must equal the whole-corpus signature")
    }
  }
}
