package graft.operators

import graft.SparkSpec

/** BM25 retrieval invariants at sf0.001 plus a hand-computed planted check. */
class RetrievalSpec extends SparkSpec {

  test("q103 bm25: ranks dense from 1, scores non-increasing, every hit matches a query term") {
    val rows = Retrieval.q103Bm25(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Retrieval.TOP_K)
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores must be non-increasing in rank")
    assert(rows.forall(_.getAs[Int]("n_matched") >= 1))
    // every returned doc really contains at least one query term
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val texts = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    ids.foreach { id =>
      val toks = texts(id).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      assert(Retrieval.QUERY_TERMS.exists(toks.contains), s"doc $id ranked but contains no query term")
    }
  }

  test("q103 bm25: top-1 score matches a direct single-node BM25 recomputation") {
    val corpus = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    val n = corpus.length.toDouble
    val avgdl = corpus.map(_._2.length).sum.toDouble / n
    val df = Retrieval.QUERY_TERMS.map(t => t -> corpus.count(_._2.contains(t))).toMap
    def bm25(toks: Seq[String]): Double = {
      val dl = toks.length.toDouble
      val raw = Retrieval.QUERY_TERMS.map { t =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * tf * (Retrieval.K1 + 1) / (tf + Retrieval.K1 * (1 - Retrieval.B + Retrieval.B * dl / avgdl))
      }.sum
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    val want = corpus
      .map { case (id, toks) => (id, bm25(toks)) }
      .filter { case (id, _) => corpus.find(_._1 == id).get._2.exists(Retrieval.QUERY_TERMS.contains) }
      .sortBy { case (id, s) => (-s, id) }
      .head
    val got = Retrieval.q103Bm25(spark, sfDir).collect().head
    assert(got.getAs[Long]("doc_id") === want._1)
    assert(got.getAs[Double]("score") === want._2)
  }

  test("q118 hybrid rrf: fusion equals a first-principles recomputation from q103 + exact cosine") {
    val lex = Retrieval
      .q103Bm25(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank"))
      .toMap
    val emb = graft.core.Tables
      .embeddings(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // PRF seed: the best lexical hit with an embedding
    val seedId = lex.toSeq.filter(kv => emb.contains(kv._1)).minBy(_._2)._1
    val qv = unit(emb(seedId))
    val dense = emb.toSeq
      .filter(_._1 != seedId)
      .map { case (id, v) =>
        val u = unit(v)
        val c = math.floor(qv.zip(u).map { case (a, b) => a * b }.sum * 1e6 + 0.5) / 1e6
        (id, c)
      }
      .sortBy { case (id, c) => (-c, id) }
      .take(Retrieval.TOP_K)
      .zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }
      .toMap
    val fusedIds = lex.keySet ++ dense.keySet
    val expected = fusedIds.toSeq
      .map { id =>
        val rrf = math.floor(
          (lex.get(id).map(r => 1.0 / (Retrieval.RRF_K + r)).getOrElse(0.0) +
            dense.get(id).map(r => 1.0 / (Retrieval.RRF_K + r)).getOrElse(0.0)) * 1e6 + 0.5
        ) / 1e6
        (id, lex.get(id), dense.get(id), rrf)
      }
      .sortBy { case (id, _, _, rrf) => (-rrf, id) }
      .zipWithIndex
      .map { case ((id, lr, dr, rrf), i) => (i + 1, id, lr, dr, rrf) }

    val got = Retrieval
      .q118HybridRrf(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
          Option(r.getAs[Integer]("lex_rank")).map(_.toInt), Option(r.getAs[Integer]("dense_rank")).map(_.toInt),
          r.getAs[Double]("rrf"))
      )
      .toSeq
    assert(got === expected, "fusion must equal the single-node recomputation row for row")
    // both retrieval modes must actually contribute on this corpus
    assert(got.exists(_._3.isDefined) && got.exists(_._4.isDefined), "both lists must contribute")
    // a doc in both lists outranks its single-list rrf components
    val both = got.filter(r => r._3.isDefined && r._4.isDefined)
    both.foreach(r => assert(r._5 > 1.0 / (Retrieval.RRF_K + 1) - 1e-9 || r._5 > 0))
    info(s"sf0.001: ${got.size} fused rows, seed=$seedId, ${both.size} docs in both lists")
  }

  test("q120 retrieval eval: metrics equal a first-principles recomputation from q118 + corpus qrels") {
    // qrels: rel(doc) = count of DISTINCT query terms present (q103's n_matched)
    val rels = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map { r =>
        val toks = r.getAs[String]("text").toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
        r.getAs[Long]("doc_id") -> Retrieval.QUERY_TERMS.count(toks.contains)
      }
      .filter(_._2 > 0)
      .toMap
    val idcg = rels.toSeq
      .sortBy { case (id, rel) => (-rel, id) }
      .take(Retrieval.NDCG_K)
      .zipWithIndex
      .map { case ((_, rel), i) => (math.pow(2.0, rel) - 1) / (math.log(i + 2.0) / math.log(2.0)) }
      .sum
    val fused = Retrieval.q118HybridRrf(spark, sfDir).collect()
    val lists: Map[String, Seq[(Long, Int)]] = Map(
      "hybrid" -> fused.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toSeq,
      "lex" -> fused.flatMap(r =>
        Option(r.getAs[Integer]("lex_rank")).map(lr => r.getAs[Long]("doc_id") -> lr.toInt)
      ).toSeq,
      "dense" -> fused.flatMap(r =>
        Option(r.getAs[Integer]("dense_rank")).map(dr => r.getAs[Long]("doc_id") -> dr.toInt)
      ).toSeq
    )
    def f6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = lists.map { case (ranker, l) =>
      val dcg = l.collect {
        case (id, r) if r <= Retrieval.NDCG_K =>
          (math.pow(2.0, rels.getOrElse(id, 0).toDouble) - 1) / (math.log(r + 1.0) / math.log(2.0))
      }.sum
      val rr = l.collect { case (id, r) if rels.getOrElse(id, 0) > 0 => 1.0 / r }
        .foldLeft(0.0)(math.max)
      val hits = l.count { case (id, r) => r <= Retrieval.TOP_K && rels.getOrElse(id, 0) > 0 }
      ranker -> ((f6(dcg / idcg), f6(rr), f6(hits.toDouble / rels.size)))
    }
    val got = Retrieval
      .q120RetrievalEval(spark, sfDir)
      .collect()
      .map(r =>
        r.getAs[String]("ranker") ->
          ((r.getAs[Double]("ndcg10"), r.getAs[Double]("mrr"), r.getAs[Double]("recall20")))
      )
      .toMap
    assert(got.keySet === Set("hybrid", "lex", "dense"))
    expected.foreach { case (ranker, want) =>
      // DCG sums are floating; the distributed sum may differ by sub-ULP
      // slack before the 6dp floor, so compare at the emitted grid
      val g = got(ranker)
      assert(math.abs(g._1 - want._1) < 2e-6, s"$ranker ndcg10: got ${g._1}, want ${want._1}")
      assert(g._2 === want._2, s"$ranker mrr")
      assert(g._3 === want._3, s"$ranker recall20")
    }
    got.values.foreach { case (ndcg, mrr, rec) =>
      assert(ndcg >= 0 && ndcg <= 1 + 1e-9)
      assert(mrr >= 0 && mrr <= 1)
      assert(rec >= 0 && rec <= 1)
    }
    info(s"sf0.001 metrics: $got")
  }

  test("q121 bitext mining: pairs equal a first-principles margin recomputation; hub rejection holds") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang"))
      .toMap
    val emb = graft.core.Tables
      .embeddings(spark, sfDir)
      .collect()
      .map { r =>
        val v = r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getAs[Long]("vec_id") -> v.map(_ / n)
      }
      .filter(kv => docs.contains(kv._1))
      .toMap
    def c6(a: Array[Double], b: Array[Double]): Double =
      math.floor(a.zip(b).map { case (x, y) => x * y }.sum * 1e6 + 0.5) / 1e6
    val src = emb.keys.filter(docs(_) == "en").toSeq.sorted
    val tgts = emb.keys.filter(docs(_) != "en").toSeq.sorted
    // cosine block + the two top-K averages
    val block = (for { t <- tgts; s <- src } yield (t, s, c6(emb(t), emb(s)))).toSeq
    val avgT = tgts.map { t =>
      val top = block.filter(_._1 == t).sortBy { case (_, s, c) => (-c, s) }.take(Retrieval.BITEXT_K)
      t -> top.map(_._3).sum / top.size
    }.toMap
    val avgS = src
      .flatMap { s =>
        block.filter(_._2 == s).groupBy(p => docs(p._1)).map { case (lang, ps) =>
          val top = ps.sortBy { case (t, _, c) => (-c, t) }.take(Retrieval.BITEXT_K)
          (s, lang) -> top.map(_._3).sum / top.size
        }
      }
      .toMap
    val expected = tgts.flatMap { t =>
      val best = block
        .filter(_._1 == t)
        .map { case (_, s, c) =>
          val m = math.floor(c / ((avgT(t) + avgS((s, docs(t)))) / 2) * 1e6 + 0.5) / 1e6
          (s, c, m)
        }
        .sortBy { case (s, _, m) => (-m, s) }
        .head
      if (best._3 > Retrieval.MARGIN_T) Some((docs(t), t, best._1, best._2, best._3)) else None
    }.sortBy(r => (r._1, r._2))

    val got = Retrieval
      .q121BitextMining(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[String]("lang"), r.getAs[Long]("tgt_id"), r.getAs[Long]("src_id"),
          r.getAs[Double]("c6"), r.getAs[Double]("margin"))
      )
      .toSeq
    assert(got === expected, "mined pairs must equal the single-node margin recomputation")
    assert(got.nonEmpty, "the synthetic corpus must mine at least one pair")
    got.foreach { case (lang, tgt, srcId, _, m) =>
      assert(lang != "en" && docs(tgt) == lang && docs(srcId) == "en")
      assert(m > Retrieval.MARGIN_T)
    }
    // at most one mined pair per foreign doc
    assert(got.map(_._2).distinct.size === got.size)
    info(s"sf0.001: ${got.size} mined pairs across ${got.map(_._1).distinct.size} languages")
  }

  test("q125 ivf-candidate mining: recall >= 0.9 vs exact q121, shared cosines, one pair per target") {
    val exact = Retrieval
      .q121BitextMining(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("tgt_id"), r.getAs[Long]("src_id")) -> r.getAs[Double]("c6"))
      .toMap
    val ivf = Retrieval
      .q125BitextMiningIvf(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[Long]("tgt_id"), r.getAs[Long]("src_id"), r.getAs[Double]("c6"), r.getAs[Double]("margin"))
      )
      .toSeq
    assert(ivf.nonEmpty)
    assert(ivf.map(_._1).distinct.size === ivf.size, "one mined pair per foreign doc")
    ivf.foreach { case (_, _, _, m) => assert(m > Retrieval.MARGIN_T) }
    // cosines bit-identical on common pairs: the index restricts the SET,
    // never the arithmetic
    ivf.foreach { case (t, s, c6, _) =>
      exact.get((t, s)).foreach(e => assert(e === c6, s"c6 drift on ($t, $s)"))
    }
    val hit = ivf.count { case (t, s, _, _) => exact.contains((t, s)) }
    val recall = hit.toDouble / exact.size
    assert(recall >= 0.9, s"mined-pair recall $recall vs exact ${exact.size}")
    info(s"sf0.001: ivf mined ${ivf.size}, exact ${exact.size}, recall $recall")
  }
}
