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

  test("q80 dynamic threshold: matches a per-lang percent-rank recomputation") {
    import org.apache.spark.sql.functions._
    // recompute the q26 score per doc with the same expressions, then derive
    // the keep set from first principles: percent_rank >= 0.1 with ties
    // sharing rank, i.e. cnt_less(score) >= 0.1 * (n - 1)
    val toks = size(split(trim(col("text")), "\\s+"))
    val stops = size(regexp_extract_all(lower(col("text")), lit("\\b(the|a|of|and|to|in|is|it|that|for)\\b"), lit(0)))
    val scored = graft.core.Tables
      .documents(spark, sfDir)
      .withColumn("sr", round(stops.cast("double") / greatest(toks, lit(1)).cast("double"), 6))
      .withColumn(
        "score",
        round(
          least(lit(40), toks.cast("double") / 2) + least(lit(30), col("sr") * 100)
            + lit(30) * when(col("n_chars").between(100, 500), 1.0).otherwise(0.5),
          4
        )
      )
      .select(col("lang"), col("score"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byLang = scored.groupBy(_._1).map { case (l, rs) => (l, rs.map(_._2)) }
    val rows = TextOps.q80DynamicThreshold(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === byLang.keySet)
    rows.foreach { r =>
      val (lang, nTotal, thr, nKept, nDropped, meanKept) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      val xs = byLang(lang)
      assert(nTotal === xs.length.toLong)
      assert(nKept + nDropped === nTotal)
      val expectedThr = xs.sorted.filter(sc => xs.count(_ < sc) >= 0.1 * (xs.length - 1)).min
      assert(thr === expectedThr, s"$lang threshold")
      val kept = xs.filter(_ >= expectedThr)
      assert(nKept === kept.length.toLong, s"$lang kept count")
      assert(math.abs(meanKept - kept.sum / kept.length) < 2e-6, s"$lang mean kept")
      // the whole point: at least ~90% of every language survives
      assert(nKept.toDouble / nTotal >= 0.85, s"$lang kept fraction")
    }
  }

  test("q82 vocab growth: matches an exact per-source recomputation") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .select("source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.trim.split("\\s+").toSeq))
    val rows = TextOps.q82VocabGrowth(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === docs.map(_._1).toSet)
    rows.foreach { r =>
      val src = r.getString(0)
      val toks = docs.filter(_._1 == src).flatMap(_._2)
      val freq = toks.groupBy(identity).map { case (t, ts) => (t, ts.length) }
      assert(r.getLong(1) === docs.count(_._1 == src).toLong, s"$src n_docs")
      assert(r.getLong(2) === toks.length.toLong, s"$src total")
      assert(r.getLong(3) === freq.size.toLong, s"$src distinct")
      assert(r.getLong(4) === freq.values.count(_ == 1).toLong, s"$src hapax")
      assert(math.abs(r.getDouble(5) - freq.size.toDouble / toks.length) < 2e-6, s"$src ttr")
    }
  }

  test("q91 chunking: windows tile every doc with the declared width/stride") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.replaceAll("\\s+", " ").split(" "))
      .toMap
    val rows = TextOps.q91Chunking(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet === docs.keySet, "every doc chunked")
    rows.groupBy(_.getLong(0)).foreach { case (id, cs) =>
      val n = docs(id).length
      val ordered = cs.sortBy(_.getInt(1))
      // chunk indexes dense from 0; starts advance by the stride
      assert(ordered.map(_.getInt(1)).sameElements(0 until ordered.length))
      ordered.foreach(c => assert(c.getInt(2) === c.getInt(1) * 56 + 1))
      // widths: exactly min(64, n - start + 1) per chunk; tail reaches n
      ordered.foreach(c => assert(c.getInt(3) === math.min(64, n - c.getInt(2) + 1), s"doc $id chunk width"))
      val last = ordered.last
      assert(last.getInt(2) + last.getInt(3) - 1 === n, s"doc $id tail doesn't reach end")
      // overlap: every token index covered at least once
      assert(ordered.head.getInt(2) === 1)
    }
  }

  test("q92 bpe pairs: counts recompute from first principles, top-20 ordered") {
    val words = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .flatMap(_.getString(1).toLowerCase.trim.replaceAll("\\s+", " ").split(" "))
      .filter(_.length >= 2)
    val expected = words
      .flatMap(w => w.sliding(2))
      .groupBy(identity)
      .map { case (p, ps) => (p, ps.length.toLong) }
    val rows = TextOps.q92BpePairs(spark, sfDir).collect()
    assert(rows.length === math.min(20, expected.size))
    rows.foreach(r => assert(expected(r.getString(0)) === r.getLong(1), s"pair ${r.getString(0)}"))
    // descending, pair-tiebroken order
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(
          a.getLong(1) > b.getLong(1) || (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0))
        )
      case _ =>
    }
    // the returned 20 are the global argmax set
    val top = expected.values.toSeq.sorted(Ordering[Long].reverse).take(20).sum
    assert(rows.map(_.getLong(1)).sum === top, "not the true top-20 by count")
  }

  test("q94 bpe train: distributed merge loop replays the single-node reference exactly") {
    // single-node reference BPE (Sennrich-style greedy leftmost, lex ties)
    var words: Map[Vector[String], Long] = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .flatMap(_.getString(1).toLowerCase.trim.replaceAll("\\s+", " ").split(" "))
      .groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toVector -> ws.length.toLong }

    def mergeWord(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.result()
    }

    val expected = (1 to 10).flatMap { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, occ) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + occ
          case _            =>
        }
      }
      if (counts.isEmpty) None
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        words = words.groupBy { case (syms, _) => mergeWord(syms, l, r) }.map { case (s, m) => s -> m.values.sum }
        Some((rank, l, r, l + r, cnt))
      }
    }

    val got = TextOps
      .bpeTrain(spark, sfDir, 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got === expected, s"merge tables differ:\n got $got\n exp $expected")
  }

  test("q94 batched merges: any batch width yields the identical merge table") {
    // 24 merges exercises multiple ticks at width 8 (incl. conflict-truncated
    // ones) against the strictly one-at-a-time loop
    def table(batch: Int) = TextOps
      .bpeTrain(spark, sfDir, 24, batch)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val sequential = table(1)
    val batched = table(8)
    assert(sequential.length === 24, "corpus should support 24 merges")
    assert(batched === sequential, s"batched merge table diverged:\n got $batched\n exp $sequential")
  }

  test("q94 pair-supply exhaustion: loop stops gracefully with fewer merges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpetiny").toString
    // vocabulary {ab, cd}: merge 1 = (a,b), merge 2 = (c,d), then every word
    // is a single symbol — the supply is exhausted far before 10 merges
    Seq(
      (1L, "ab cd ab", "en", "a", 8L),
      (2L, "cd ab", "en", "a", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps
      .bpeTrain(spark, dir, 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got === Seq((1, "a", "b", "ab", 3L), (2, "c", "d", "cd", 2L)))
    // the apply path must keep the fully-merged word frame, not an empty one
    val applied = TextOps.q98BpeApply(spark, dir).collect()
    assert(applied.length === 1)
    assert(applied.head.getAs[Long]("total_words") === 5L)
    assert(applied.head.getAs[Long]("total_tokens") === 5L, "each word is one merged token")
  }

  test("q98 bpe apply: tokenization totals bounded and consistent with training") {
    val rows = TextOps.q98BpeApply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every word tokenizes to at least 1 and at most word-length pieces, so
    // totals must sit between word count and character mass; 10 merges on
    // this corpus must actually compress (tokens strictly under characters)
    val words = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .flatMap(r => (r.getString(3), r.getString(1)) match {
        case (src, text) => text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).map(src -> _)
      })
    val bySource = words.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getString(0)
      val (nWords, nChars) = (bySource(src).length.toLong, bySource(src).map(_._2.length.toLong).sum)
      assert(r.getAs[Long]("total_words") === nWords, s"$src word count")
      val tokens = r.getAs[Long]("total_tokens")
      assert(tokens >= nWords && tokens < nChars, s"$src tokens=$tokens outside ($nWords, $nChars)")
    }
  }

  test("q127 heavy hitters equals the exact HAVING over all bigrams; sketch never misses a qualifier") {
    val docs = graft.core.Tables.documents(spark, sfDir).collect().map(_.getAs[String]("text"))
    val bigrams = docs.toSeq
      .map(t => t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq)
      .filter(_.size >= 2)
      .flatMap(ts => ts.sliding(2).map(w => w(0) + " " + w(1)))
    val n = bigrams.size.toLong
    val expected = bigrams
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toSeq
      .filter { case (_, c) => c * TextOps.K_MG > n }
      .map { case (g, c) => (g, c, math.floor(c.toDouble * 1e6 / n + 0.5).toLong) }
      .sortBy { case (g, c, _) => (-c, g) }

    val got = TextOps
      .q127HeavyHitters(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("gram"), r.getAs[Long]("n"), r.getAs[Long]("ppm")))
      .toSeq
    assert(got === expected, "sketch-candidates + exact verify must equal the exact HAVING")
    assert(got.nonEmpty)
    val again = TextOps.q127HeavyHitters(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(again === got.map(t => Seq[Any](t._1, t._2, t._3)), "deterministic across runs")
    info(s"sf0.001: ${got.size} heavy hitters over $n bigrams (threshold > ${n / TextOps.K_MG})")
  }

  test("q135 char entropy: equals a single-node integer-micro recomputation; bounded by ln(alphabet)") {
    val expected = graft.core.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map { r =>
        val norm = r.getString(1).trim.toLowerCase
        val n = norm.length.toLong
        val counts = norm.groupBy(identity).map(_._2.size.toLong)
        val s = counts.map(c => math.floor(c * math.log(c.toDouble) * 1e6 + 0.5).toLong).sum
        val entMicro =
          if (n == 0) 0L else (math.floor(n * math.log(n.toDouble) * 1e6 + 0.5).toLong - s) / n
        val verdict =
          if (n == 0) "empty"
          else if (entMicro < 2000000L) "low"
          else if (entMicro > 3500000L) "high"
          else "ok"
        (r.getLong(0), n, counts.size.toLong, entMicro / 1e6, verdict)
      }
      .sortBy(_._1)
    val got = TextOps
      .q135CharEntropy(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars_norm"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy_nats"), r.getAs[String]("verdict"))
      )
      .sortBy(_._1)
    assert(got.toSeq === expected.toSeq, "entropies must equal the single-node recomputation")
    // Shannon bound: H <= ln(n_distinct) (uniform maximum), modulo the
    // per-term micro rounding slack
    got.filter(_._3 >= 1).foreach { case (id, _, k, ent, _) =>
      assert(ent >= 0 && ent <= math.log(k.toDouble) + 1e-5, s"doc $id entropy $ent vs alphabet $k")
    }
    info(s"sf0.001: verdicts ${got.groupBy(_._5).view.mapValues(_.length).toMap}")
  }

  test("q150 distinct-n: equals a single-node replay; ratios rise with n and are bounded by 1") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .select("source", "text")
      .collect()
      .map(r => r.getString(0) -> r.getString(1).toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1))
    val expected = (for {
      n <- Seq(1, 2, 3)
      (src, grams) <- docs
        .filter(_._2.length >= n)
        .flatMap { case (s, toks) => (0 to toks.length - n).map(i => (s, toks.slice(i, i + n).mkString(" "))) }
        .groupBy(_._1)
    } yield {
      val total = grams.length.toLong
      val distinct = grams.map(_._2).distinct.length.toLong
      val ratioMicro = math.floor(distinct * 1e6 / total + 0.5).toLong
      val verdict = if (n == 2 && ratioMicro < 300000L) "collapsed" else "ok"
      (src, n, total, distinct, ratioMicro / 1e6, verdict)
    }).toSet
    val got = TextOps
      .q150DistinctN(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5)))
      .toSet
    assert(got === expected, "distinct-n must equal the single-node replay")
    got.groupBy(_._1).foreach { case (src, rows) =>
      val byN = rows.toSeq.sortBy(_._2).map(_._5)
      assert(byN === byN.sorted, s"$src distinct-n must rise with n on natural-ish data")
      assert(byN.forall(r => r > 0 && r <= 1.0), s"$src ratios in (0,1]")
    }
    info(s"sf0.001: ${got.size} rows; distinct-2 range ${got.filter(_._2 == 2).map(_._5).min}..${got.filter(_._2 == 2).map(_._5).max}")
  }

  test("q151 Zipf fit: equals a single-node OLS replay; uniform word-soup reads anomalous") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .select("source", "text")
      .collect()
      .map(r => r.getString(0) -> r.getString(1).toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1))
    val expected = docs
      .flatMap { case (s, toks) => toks.map(s -> _) }
      .groupBy(_._1)
      .map { case (src, terms) =>
        val tf = terms.map(_._2).groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
        val top = tf.toSeq.sortBy { case (t, f) => (-f, t) }.take(100).zipWithIndex
        val xy = top.map { case ((_, f), i) =>
          (math.floor(math.log(i + 1.0) * 1e6 + 0.5).toLong, math.floor(math.log(f.toDouble) * 1e6 + 0.5).toLong)
        }
        val k = xy.size.toLong
        val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
        val sxy = xy.map { case (x, y) => x * y }.sum
        val sxx = xy.map { case (x, _) => x * x }.sum
        val slopeMicro = math.floor((k * sxy - sx * sy).toDouble * 1e6 / (k * sxx - sx * sx).toDouble + 0.5).toLong
        val verdict = if (slopeMicro >= -1500000L && slopeMicro <= -700000L) "zipfian" else "anomalous"
        (src, k, slopeMicro / 1e6, verdict)
      }
      .toSet
    val got = TextOps
      .q151ZipfFit(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(got === expected, "Zipf fit must equal the single-node OLS replay")
    // the synthetic corpus draws words near-uniformly: every source must be
    // flagged, which is the detector doing its job
    assert(got.forall(_._4 == "anomalous"), "uniform word-soup must read anomalous")
    assert(got.forall(r => r._3 < 0), "slopes still negative (rank-frequency always decreases)")
    info(s"sf0.001: slope range ${got.map(_._3).min}..${got.map(_._3).max}")
  }

  test("q157 fertility drift: buckets partition q98's word mass; corpus fertility is the cross-view constant") {
    val rows = TextOps
      .q157FertilityDrift(spark, sfDir)
      .collect()
      .map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getString(7))
      )
    // the same corpus through q98's per-source view (q98 joins INNER, so
    // its word mass is exactly q157's in-vocab n_words)
    val q98 = TextOps.q98BpeApply(spark, sfDir).collect()
    val (tw, tp) = (q98.map(_.getAs[Long]("total_words")).sum, q98.map(_.getAs[Long]("total_tokens")).sum)
    assert(rows.map(_._2).sum === tw, "buckets must partition exactly the words q98 tokenizes")
    assert(rows.map(_._3).sum === tp, "bucket piece mass must sum to q98's total")
    val corpusFert = math.floor(tp.toDouble * 1e6 / tw + 0.5) / 1e6
    rows.foreach { case (b, nw, np, oov, fert, corpus, drift, verdict) =>
      assert(corpus === corpusFert, s"bucket $b corpus fertility must be the one cross-view constant")
      assert(fert === math.floor(np.toDouble * 1e6 / nw + 0.5) / 1e6, s"bucket $b fertility arithmetic")
      // self-trained corpus: the word → pieces map covers every distinct
      // word of THIS corpus by construction, so oov_frac is exactly 0 here;
      // it becomes nonzero precisely when a session-cached tokenizer
      // (trained on an older snapshot) meets newer ingest — the rot signal
      assert(oov === 0.0, s"bucket $b oov_frac must be 0 when the tokenizer was trained on this very corpus")
      assert(math.abs(drift - (fert - corpus)) < 1e-9, s"bucket $b drift")
      val wantVerdict = if (math.round(fert * 1e6) - math.round(corpus * 1e6) > 50000L) "rotting" else "ok"
      assert(verdict === wantVerdict, s"bucket $b verdict")
    }
    // drift is zero-sum in the word-weighted sense: Σ n_w·(fert−corpus) ≈ 0
    val weighted = rows.map { case (_, nw, _, _, f, c, _, _) => nw * (f - c) }.sum
    assert(math.abs(weighted) < rows.length * 1e-6 * tw, "word-weighted drift must net out")
    info(
      s"sf0.001: corpus fertility $corpusFert, oov range ${rows.map(_._4).min}..${rows.map(_._4).max}, " +
        s"${rows.count(_._8 == "rotting")} rotting buckets"
    )
  }

  test("q165 tokenizer budget: curve monotone (merges only compress); full-merge row equals q98's corpus totals") {
    val rows = TextOps
      .q165TokenizerBudget(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq === Seq(0, 2, 5, 10), "the declared checkpoint grid")
    // merges only ever concatenate adjacent pieces: corpus pieces (and so
    // fertility) are non-increasing in merge count; compression mirrors it
    rows.sliding(2).foreach { case Array((_, _, p1, f1, c1), (_, _, p2, f2, c2)) =>
      assert(p2 <= p1, "corpus pieces must not grow with merges")
      assert(f2 <= f1 && c2 >= c1, "fertility falls, compression rises")
    }
    val k0 = rows.head
    assert(k0._5 === 1.0, "at zero merges the char baseline compresses nothing")
    assert(rows.last._3 < k0._3, "ten merges must actually compress this corpus")
    // cross-view: the full-merge checkpoint IS the tokenizer q98 applies
    val q98 = TextOps.q98BpeApply(spark, sfDir).collect()
    val (tw, tp) = (q98.map(_.getAs[Long]("total_words")).sum, q98.map(_.getAs[Long]("total_tokens")).sum)
    assert(rows.last._3 === tp, "corpus pieces at k=10 must equal q98's total tokens")
    assert(rows.last._4 === math.floor(tp.toDouble * 1e6 / tw + 0.5) / 1e6, "fertility must equal q98/q157's corpus constant")
    info(s"sf0.001: curve ${rows.map(r => s"${r._1}->${r._4}").mkString(", ")}")
  }

  test("q168 source health: every column recomposes exactly from its four leg queries") {
    val out = TextOps
      .q168SourceHealth(spark, sfDir)
      .collect()
      .map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getInt(8), r.getString(9)))
      )
      .toMap
    assert(out.nonEmpty)
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    assert(out.keySet === docs.map(_._2).toSet, "one scorecard row per source")
    // leg 1: q135's per-doc entropy rolled up (micro recovery is exact)
    val entBySrc = TextOps
      .q135CharEntropy(spark, sfDir)
      .collect()
      .map(r => (srcOf(r.getLong(0)), math.floor(r.getDouble(3) * 1e6 + 0.5).toLong, r.getString(4)))
      .groupBy(_._1)
    // legs 2-4: the leg queries verbatim
    val d2 = TextOps
      .q150DistinctN(spark, sfDir)
      .collect()
      .filter(_.getInt(1) == 2)
      .map(r => r.getString(0) -> ((r.getDouble(4), r.getString(5))))
      .toMap
    val zf = TextOps
      .q151ZipfFit(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getString(3))))
      .toMap
    val dr = Importance
      .q128SourceDrift(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getInt(3))))
      .toMap
    out.foreach { case (src, (nDocs, nToks, meanEnt, flagFrac, d2r, slope, js, nFlags, health)) =>
      val srcDocs = docs.filter(_._2 == src)
      assert(nDocs === srcDocs.length.toLong)
      assert(nToks === srcDocs.map(_._3.trim.toLowerCase.split("\\s+").length.toLong).sum)
      val ent = entBySrc(src)
      val meanMicro = math.floor(ent.map(_._2).sum.toDouble / ent.length + 0.5).toLong
      val flagMicro =
        math.floor(ent.count(_._3 != "ok").toDouble * 1e6 / ent.length + 0.5).toLong
      assert(meanEnt === meanMicro / 1e6 && flagFrac === flagMicro / 1e6, s"$src entropy rollup")
      assert(d2r === d2(src)._1 && slope === zf(src)._1 && js === dr(src)._1, s"$src leg values")
      // missing-leg semantics: a leg that cannot score a source costs the
      // flag its detector would (all legs present on this corpus, so the
      // Option defaults only document the contract)
      val expFlags = (if (flagMicro > TextOps.HEALTH_ENT_BAD_MICRO) 1 else 0) +
        (if (d2.get(src).forall(_._2 == "collapsed")) 1 else 0) +
        (if (zf.get(src).forall(_._2 == "anomalous")) 1 else 0) +
        dr.get(src).map(_._2).getOrElse(1)
      assert(nFlags === expFlags, s"$src flag count")
      assert(health === (if (expFlags == 0) "healthy" else "attention"), s"$src verdict")
    }
    info(s"sf0.001: ${out.size} sources, ${out.values.count(_._9 == "attention")} attention, flag histogram ${out.values
        .groupBy(_._8).view.mapValues(_.size).toMap}")
  }

  test("q168 degenerate source: missing legs flag instead of dropping the row; null leg values survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q168deg").toString
    // src_bad: ONE doc of pure punctuation — a single token (so q150 has no
    // distinct-2 row), no [a-z0-9] terms (so q128's histogram never sees the
    // source), one distinct term (so q151's OLS denominator is 0 and the
    // slope is NULL), zero char entropy (the q135 'low' verdict)
    val docs = Seq(
      (1L, "!!!", "en", "src_bad"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "src_ok"),
      (3L, "one two three four five six seven eight nine ten", "en", "src_ok")
    )
    docs
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .parquet(s"$dir/documents.parquet")
    val rows = TextOps.q168SourceHealth(spark, dir).collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("src_bad", "src_ok"), "the degenerate source must NOT vanish from the scorecard")
    val bad = rows("src_bad")
    assert(bad.isNullAt(5), "no distinct-2 row -> null ratio")
    assert(bad.isNullAt(6), "single-distinct-term OLS -> null slope")
    assert(bad.isNullAt(7), "no alnum terms -> no drift row -> null js")
    // flags: entropy 'low' (zero-entropy doc) + missing d2 + anomalous-null
    // zipf + missing drift = all four fire
    assert(bad.getInt(8) === 4 && bad.getString(9) === "attention")
    assert(rows("src_ok").getInt(8) <= 4)
    info(s"degenerate: flags=${bad.getInt(8)} health=${bad.getString(9)}")
  }

  test("q180 BPE-token pack: equals a single-node greedy replay over the trained tokenizer's per-doc totals; mass conserves vs q98") {
    val dt = TextOps
      .bpeDocTokens(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = dt
      .map { case (lang, id, n) => ((lang, (id % graft.operators.Curation.SHARDS).toInt), id, n) }
      .groupBy(_._1)
      .toSeq
      .flatMap { case ((lang, shard), g) =>
        var cum = 0L
        g.sortBy(_._2).map { case (_, _, n) =>
          val bin = (cum / graft.operators.Curation.CTX).toInt
          cum += n
          ((lang, shard, bin), n)
        }
      }
      .groupBy(_._1)
      .map { case (k, g) => k -> ((g.size.toLong, g.map(_._2).sum)) }
    val got = TextOps
      .q180BpePack(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected, "manifest must equal the greedy prefix-sum replay over BPE doc totals")
    // conservation: packed token mass is exactly q98's applied token mass
    val q98Total = TextOps.q98BpeApply(spark, sfDir).collect().map(_.getAs[Long]("total_tokens")).sum
    assert(got.values.map(_._2).sum === q98Total, "packed mass must equal the q98 apply mass")
    // token-exactness is not whitespace-exactness: the BPE manifest must
    // differ from q66's whitespace packing somewhere on this corpus
    val q66 = graft.operators.Curation
      .q66ContextPack(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(got !== q66, "BPE packing must diverge from whitespace packing (fertility > 1 somewhere)")
    info(s"sf0.001: ${got.size} bins, ${got.values.map(_._2).sum} BPE tokens packed (q66 bins: ${q66.size})")
  }
}
