package graft.operators

import graft.SparkSpec

/** DSIR importance-weight invariants: planted two-vocabulary corpus with a
  * known selection outcome, plus structural checks at sf0.001.
  */
class ImportanceSpec extends SparkSpec {

  test("q105 dsir: planted two-vocabulary corpus matches the single-node replica exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    // target domain (src0) speaks {alpha, beta}; the raw remainder speaks
    // {gamma, delta}. Base docs carry 200 tokens so one mixed doc can't
    // bend the histograms; doc 5 (mostly target vocabulary) must be
    // selected, doc 6 (mostly raw vocabulary) must not.
    val corpus: Seq[(Long, String, String)] = Seq(
      (1L, "src0", ("alpha beta " * 100).trim),
      (2L, "src0", ("beta alpha " * 100).trim),
      (3L, "srcX", ("gamma delta " * 100).trim),
      (4L, "srcX", ("delta gamma " * 100).trim),
      (5L, "srcX", ("alpha " * 20 + "gamma").trim),
      (6L, "srcX", ("gamma " * 8 + "alpha " * 2).trim)
    )
    corpus
      .map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .parquet(s"$dir/documents.parquet")

    // single-node replica of the exact production arithmetic (md5 bucket,
    // add-1 smoothing, micro-rounded integer weights)
    def bucket(t: String): Int = {
      val h = java.security.MessageDigest
        .getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      Integer.parseInt(h.substring(0, 4), 16) % Importance.N_BUCKETS
    }
    val toks = corpus.map { case (id, src, text) => (id, src, text.split(" ").toSeq.map(bucket)) }
    val raw = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgt = toks.filter(_._2 == "src0").flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (rawT, tgtT) = (raw.values.sum, tgt.values.sum)
    val lrMicro = raw.map { case (b, rn) =>
      val r = ((tgt.getOrElse(b, 0L) + 1).toDouble / (tgtT + Importance.N_BUCKETS)) /
        ((rn + 1).toDouble / (rawT + Importance.N_BUCKETS))
      b -> math.floor(math.log(r) * 1e6 + 0.5).toLong
    }
    val want = toks.map { case (id, _, bs) =>
      id -> bs.groupBy(identity).map { case (b, xs) => xs.size * lrMicro(b) }.sum
    }.toMap

    val out = Importance
      .q105DsirWeights(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out.size === 6)
    out.foreach { case (id, r) =>
      assert(r.getAs[Double]("log_weight") === want(id).toDouble / 1e6, s"doc $id weight")
      assert(r.getAs[Int]("selected") === (if (want(id) > 0) 1 else 0), s"doc $id selection")
    }
    val sel = out.view.mapValues(_.getAs[Int]("selected")).toMap
    assert(sel(1L) === 1 && sel(2L) === 1, "target-domain docs must be selected")
    assert(sel(3L) === 0 && sel(4L) === 0, "pure off-target docs must not be selected")
    assert(sel(5L) === 1, "majority-target-vocabulary mixed doc must be selected")
    assert(sel(6L) === 0, "majority-raw-vocabulary mixed doc must not be selected")
    assert(out(5L).getAs[Long]("n_tokens") === 21L)
    assert(out(6L).getAs[Long]("n_tokens") === 10L)
  }

  test("q105 dsir: every sf0.001 doc scored exactly once, deterministically") {
    val a = Importance.q105DsirWeights(spark, sfDir).collect()
    val b = Importance.q105DsirWeights(spark, sfDir).collect()
    assert(a.sameElements(b), "weights must be bit-deterministic across runs")
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(a.length.toLong === nDocs)
    assert(a.map(_.getAs[Long]("doc_id")).distinct.length === a.length)
    // n_tokens matches the house tokenizer
    val toks = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong)
      .toMap
    a.foreach(r => assert(r.getAs[Long]("n_tokens") === toks(r.getAs[Long]("doc_id"))))
  }
}
