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

  test("q124 moore-lewis: planted corpus — word ORDER separates docs DSIR scores identically; exact replica") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ml").toString
    // in-domain (src0) speaks "a b a b ..." (bigrams ab/ba); the raw
    // remainder speaks the SAME unigrams in blocks "a a ... b b ..."
    // (bigrams aa/bb). Probes 5 and 6 carry the SAME bag of words — a
    // bag-of-words selector cannot tell them apart — but probe 5 uses the
    // in-domain ORDER and probe 6 the raw order.
    val ab = ("a b " * 100).trim
    val blocks = (("a " * 100).trim + " " + ("b " * 100).trim)
    val corpus: Seq[(Long, String, String)] = Seq(
      (1L, "src0", ab),
      (2L, "src0", ab),
      (3L, "srcX", blocks),
      (4L, "srcX", blocks),
      (5L, "srcX", ("a b " * 10).trim),
      (6L, "srcX", (("a " * 10).trim + " " + ("b " * 10).trim))
    )
    corpus
      .map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .parquet(s"$dir/documents.parquet")

    // single-node replica of the exact production arithmetic
    val toksOf = corpus.map { case (id, _, t) => id -> t.split("[^a-z0-9]+").filter(_.nonEmpty) }.toMap
    val srcOf = corpus.map { case (id, s, _) => id -> s }.toMap
    val bigrams = toksOf.view.mapValues(t => t.sliding(2).map(w => (w(0), w(0) + " " + w(1))).toSeq).toMap
    def counts(ids: Seq[Long]): (Map[String, Long], Map[String, Long]) = {
      val all = ids.flatMap(bigrams(_))
      (
        all.groupBy(_._2).view.mapValues(_.size.toLong).toMap,
        all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      )
    }
    val (c12g, c1g) = counts(corpus.map(_._1))
    val (c12i, c1i) = counts(corpus.filter(_._2 == "src0").map(_._1))
    val v = toksOf.values.flatten.toSet.size.toDouble
    def lrMicro(w1: String, bg: String): Long = {
      val lr = math.log((c12i.getOrElse(bg, 0L) + 0.5) / (c1i.getOrElse(w1, 0L) + 0.5 * v)) -
        math.log((c12g(bg) + 0.5) / (c1g(w1) + 0.5 * v))
      math.floor(lr * 1e6 + 0.5).toLong
    }
    val expected = corpus.map(_._1).map { id =>
      val bs = bigrams(id)
      val sum = bs.map { case (w1, bg) => lrMicro(w1, bg) }.sum
      val n = bs.size.toLong
      (id, srcOf(id), n, math.floor(sum.toDouble / n + 0.5) / 1e6, if (sum > 0) 1 else 0)
    }

    val got = Importance
      .q124MooreLewis(spark, dir)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_bigrams"),
          r.getAs[Double]("avg_log_ratio"), r.getAs[Int]("selected"))
      )
      .toSeq
    assert(got === expected, "q124 must equal the single-node Moore-Lewis replica exactly")
    val sel = got.map(r => r._1 -> r._5).toMap
    assert(sel(1L) === 1 && sel(2L) === 1, "in-domain docs must be selected")
    assert(sel(3L) === 0 && sel(4L) === 0, "raw-order bulk must not be selected")
    assert(sel(5L) === 1, "in-domain ORDER probe must be selected")
    assert(sel(6L) === 0, "same bag of words in raw ORDER must not be selected — the signal DSIR cannot see")
  }

  test("q124 moore-lewis: sf0.001 coverage + determinism; target source selects at a higher rate") {
    val a = Importance.q124MooreLewis(spark, sfDir).collect()
    val b = Importance.q124MooreLewis(spark, sfDir).collect()
    assert(a.sameElements(b), "scores must be bit-deterministic across runs")
    val eligible = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .count(_.getAs[String]("text").toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty) >= 2)
    assert(a.length === eligible, "every >=2-token doc scored exactly once")
    val byTgt = a.groupBy(_.getAs[String]("source") == Importance.TARGET_SOURCE)
    def rate(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(_.getAs[Int]("selected") == 1).toDouble / rows.length
    assert(
      rate(byTgt(true)) > rate(byTgt(false)),
      s"target slice must look more in-domain: ${rate(byTgt(true))} vs ${rate(byTgt(false))}"
    )
  }

  test("q128 source drift: vocab-disjoint source drifts, corpus-like source does not; exact replica") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    // srcA and srcB share the corpus-dominant vocabulary; srcZ speaks a
    // disjoint one — JS(srcZ || corpus) must cross the threshold while the
    // majority sources stay under it
    val base = ("alpha beta gamma delta " * 50).trim
    val alien = ("zulu yankee xray whiskey " * 50).trim
    val corpus: Seq[(Long, String, String)] =
      (1L to 8L).map(i => (i, "srcA", base)) ++ (9L to 16L).map(i => (i, "srcB", base)) :+ ((17L, "srcZ", alien))
    corpus
      .map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .parquet(s"$dir/documents.parquet")

    // single-node replica of the exact production arithmetic
    def bucket(t: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(0, 4), 16) % Importance.N_BUCKETS
    }
    val toks = corpus.flatMap { case (_, src, text) =>
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(t => (src, bucket(t)))
    }
    val bySrcBucket = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val srcTot = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val byBucket = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val qt = toks.size.toLong
    val expected = srcTot.keys.toSeq.sorted.map { src =>
      val pt = srcTot(src)
      val jsMicro = byBucket.keys.toSeq.map { b =>
        val pn = bySrcBucket.getOrElse((src, b), 0L)
        val qn = byBucket(b)
        val p = (pn + 1.0) / (pt + Importance.N_BUCKETS)
        val q = (qn + 1.0) / (qt + Importance.N_BUCKETS)
        val m = (p + q) / 2.0
        math.floor(0.5 * (p * math.log(p / m) + q * math.log(q / m)) * 1e6 + 0.5).toLong
      }.sum
      (src, pt, jsMicro.toDouble / 1e6, if (jsMicro > (Importance.DRIFT_T * 1e6).toLong) 1 else 0)
    }

    val got = Importance
      .q128SourceDrift(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"), r.getAs[Double]("js"), r.getAs[Int]("drifted")))
      .toSeq
    assert(got === expected, "q128 must equal the single-node JS replica exactly")
    val flags = got.map(r => r._1 -> r._4).toMap
    assert(flags("srcZ") === 1, "vocab-disjoint source must be flagged as drifted")
    assert(flags("srcA") === 0 && flags("srcB") === 0, "corpus-dominant sources must not be flagged")
  }
}
