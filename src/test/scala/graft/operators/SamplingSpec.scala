package graft.operators

import graft.SparkSpec

/** Sampling invariants at sf0.001. */
class SamplingSpec extends SparkSpec {

  test("q48 stratified sample: proportions within a loose binomial envelope, reproducible") {
    val a = Sampling.q48Sample(spark, sfDir).orderBy("event_type").collect()
    val b = Sampling.q48Sample(spark, sfDir).orderBy("event_type").collect()
    assert(a.sameElements(b), "fixed seed must reproduce the sample")
    val totals = graft.core.Tables
      .events(spark, sfDir)
      .groupBy("event_type")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val want = Map("click" -> 0.5, "view" -> 0.5, "purchase" -> 0.1, "signup" -> 0.1, "error" -> 0.1)
    a.foreach { r =>
      val t = r.getString(0)
      val frac = r.getLong(1).toDouble / totals(t)
      assert(math.abs(frac - want(t)) < 0.15, s"$t sampled at $frac, wanted ~${want(t)}")
    }
  }

  test("q48 registered output: 5-sigma envelope verdict is 1 for every stratum") {
    val rows = Sampling.q48StratifiedSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("frac_ok") === 1, s"sampler left its envelope: $r"))
  }

  test("q48 emits every stratum even when its seeded draw samples zero rows") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("q48zero").toString
    // one 'purchase' row at fraction 0.1: the seeded draw leaves it
    // unsampled (pinned below), which used to vanish the stratum from the
    // inner-joined output while the oracle still emitted its row
    val t0 = Timestamp.valueOf("2024-06-01 00:00:00")
    val rows = (1L to 40L).map(i => (i, t0, i, if (i == 1) "purchase" else "click", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val sampled = Sampling.q48Sample(spark, dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!sampled.contains("purchase"), "fixture drift: the seeded draw now samples the single purchase row")
    val out = Sampling.q48StratifiedSample(spark, dir).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("click", "purchase"), "a zero-sampled stratum must still appear")
    val p = out.find(_.getString(0) == "purchase").get
    assert(p.getAs[Long]("n_total") === 1L)
    assert(p.getAs[Int]("frac_ok") === 1, "n=1 sits inside the 5-sigma envelope even at zero sampled")
  }

  test("q51 bottom-k sketch: k per group, partition-invariant, content-addressed") {
    val a = Sampling.q51BottomKSample(spark, sfDir).collect()
    // repartitioning the input must not change a content-addressed sample
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sketch = graft.functions.BottomKSketch
      .aggregator[Sampling.LangDoc](5)(_.sortKey, _.id)
      .toColumn
    val b = graft.core.Tables
      .documents(spark, sfDir)
      .repartition(13)
      .select(col("lang"), md5(col("doc_id").cast("string")).as("sortKey"), col("doc_id").as("id"))
      .as[Sampling.LangDoc]
      .groupByKey(_.lang)
      .agg(sketch.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"), explode(col("sample")).as("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
      .collect()
    assert(a.sameElements(b))
    a.groupBy(_.getString(0)).values.foreach(rs => assert(rs.length <= 5))
  }

  test("q49 hash split: partitions the corpus, deterministic, ~80/10/10") {
    val rows = Sampling.q49HashSplit(spark, sfDir).collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    assert(n === graft.core.Tables.documents(spark, sfDir).count())
    val bySplit = rows.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(bySplit.keySet === Set("train", "validation", "test"))
    assert(bySplit("train").toDouble / n > 0.7, "train should dominate")
  }

  test("q130 source cap: kept == top-CAP by (q26 score desc, doc_id), ranks a permutation per source") {
    val rows = Sampling
      .q130SourceCap(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Double]("quality_score"),
          r.getAs[Int]("rk"), r.getAs[Int]("kept"))
      )
      .toSeq
    assert(rows.size === graft.core.Tables.documents(spark, sfDir).count().toInt, "every doc gets a verdict")
    rows.groupBy(_._2).foreach { case (src, grp) =>
      // ranks are exactly 1..n and agree with the declared total order
      assert(grp.map(_._4).sorted === (1 to grp.size).toSeq, s"$src ranks must be a permutation")
      val byOrder = grp.sortBy(g => (-g._3, g._1))
      assert(byOrder.map(_._4) === (1 to grp.size).toSeq, s"$src rank order must be (score DESC, doc_id)")
      assert(grp.count(_._5 == 1) === math.min(Sampling.SOURCE_CAP, grp.size), s"$src kept count")
      assert(grp.forall(g => (g._5 == 1) === (g._4 <= Sampling.SOURCE_CAP)), s"$src kept == rank <= CAP")
    }
    // the score column is q26's: spot-check equality on the shared doc ids
    val q26 = TextOps
      .q26QualityScore(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score"))
      .toMap
    rows.foreach { case (id, _, score, _, _) => assert(score === q26(id), s"doc $id score must be q26's") }
  }

  test("q145 weighted sample: equals an A-Res single-node replay; sample is quality-biased vs uniform") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val q26 = TextOps
      .q26QualityScore(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality_score")))
      .toMap
    val langs = graft.core.Tables
      .documents(spark, sfDir)
      .select("doc_id", "lang")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val keyed = langs.map { case (id, lang) =>
      val h = java.lang.Long.parseLong(md5hex(s"ws:$id").substring(0, 12), 16)
      val keyMicro = math.floor(math.log((h + 1) / 281474976710657e0) / q26(id) * 1e6 + 0.5).toLong
      (lang, id, q26(id), keyMicro)
    }
    val expected = keyed
      .groupBy(_._1)
      .toSeq
      .flatMap { case (lang, grp) =>
        grp.sortBy(g => (-g._4, g._2)).take(Sampling.SAMPLE_K).zipWithIndex.map { case ((_, id, w, km), i) =>
          (lang, (i + 1).toLong, id, w, km / 1e6)
        }
      }
      .toSet
    val got = Sampling
      .q145WeightedSample(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got === expected, "sample must equal the A-Res single-node replay")

    // weighting must bias the draw: the sampled mean quality beats the
    // corpus mean in every language (deterministic given this corpus)
    keyed.groupBy(_._1).foreach { case (lang, grp) =>
      val corpusMean = grp.map(_._3).sum / grp.size
      val picked = got.filter(_._1 == lang).map(_._4)
      val sampleMean = picked.sum / picked.size
      assert(sampleMean > corpusMean, s"$lang: weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
    }
    info(s"sf0.001: ${got.size} sampled docs across ${got.map(_._1).toSet.size} languages")
  }

  test("q148 shard rebalance: equals a single-node HRW replay; HRW is monotone-consistent, mod-N is not") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val n = Sampling.SHARDS_BEFORE
    def hrw(id: Long, m: Int): Int =
      (0 until m).map(s => (md5hex(s"$id:$s") + f"$s%02d", s)).max._2
    val ids = graft.core.Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))

    // the HRW consistency theorem: growing the fleet never reassigns a doc
    // except TO the new shard
    val hrwPairs = ids.map(id => (hrw(id, n), hrw(id, n + 1)))
    hrwPairs.foreach { case (b, a) => assert(a == b || a == n, "HRW moved a doc shard-to-shard") }

    val modPairs = ids.map(id => ((id % n).toInt, (id % (n + 1)).toInt))
    def rowFor(scheme: String, pairs: Array[(Int, Int)]) = {
      val moved = pairs.count { case (b, a) => b != a }.toLong
      val toNew = pairs.count { case (b, a) => b != a && a == n }.toLong
      val maxLoad = pairs.groupBy(_._2).values.map(_.length).max.toLong
      (scheme, pairs.length.toLong, moved,
        math.floor(moved * 1e6 / pairs.length + 0.5) / 1e6,
        math.floor(toNew * 1e6 / math.max(moved, 1L) + 0.5) / 1e6,
        math.floor(maxLoad.toDouble * (n + 1) * 1e6 / pairs.length + 0.5) / 1e6)
    }
    val expected = Set(rowFor("hrw", hrwPairs), rowFor("mod", modPairs))
    val got = Sampling
      .q148ShardRebalance(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet
    assert(got === expected, "rebalance report must equal the single-node replay")
    val hrwRow = got.find(_._1 == "hrw").get
    val modRow = got.find(_._1 == "mod").get
    assert(hrwRow._4 < modRow._4, "HRW must move less than mod-N")
    assert(hrwRow._5 === 1.0, "every HRW move lands on the new shard")
    info(s"sf0.001: hrw moved ${hrwRow._4}, mod moved ${modRow._4}")
  }

  test("q169 pruning sweep: equals a single-node replay over q130's ranks; the curve is shaped right") {
    val rows = Sampling
      .q169PruningSweep(spark, sfDir)
      .collect()
      .map(r =>
        (r.getString(0), r.getInt(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      )
      .toMap
    assert(rows.nonEmpty)
    // replay from q130's already-spec-pinned rank frame plus raw token counts
    val toks = graft.core.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").length.toLong)
      .toMap
    val ranked = Sampling
      .q130SourceCap(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[String]("source"), r.getAs[Int]("rk"), r.getAs[Long]("doc_id"),
          math.floor(r.getAs[Double]("quality_score") * 1e6 + 0.5).toLong)
      )
      .groupBy(_._1)
    val expected = ranked.flatMap { case (src, grp) =>
      val n = grp.size.toLong
      Sampling.PRUNE_GRID.flatMap { f =>
        val kept = grp.filter(_._2 * 100L <= f * n)
        if (kept.isEmpty) None
        else
          Some(
            (src, f) -> ((kept.size.toLong, kept.map(g => toks(g._3)).sum,
              math.floor(kept.map(_._4).sum.toDouble / kept.size + 0.5) / 1e6,
              kept.map(_._4).min / 1e6))
          )
      }
    }.toMap
    assert(rows === expected, "sweep must equal the single-node replay")
    // curve shape per source: kept mass grows with f, mean quality of the
    // kept set and the cutoff score both fall (top-f means shrink as f grows)
    rows.keys.map(_._1).toSet[String].foreach { src =>
      val curve = Sampling.PRUNE_GRID.flatMap(f => rows.get((src, f)))
      curve.sliding(2).foreach {
        case Seq((n1, t1, m1, c1), (n2, t2, m2, c2)) =>
          assert(n2 >= n1 && t2 >= t1, s"$src kept mass must grow with f")
          assert(m2 <= m1 && c2 <= c1, s"$src mean/cutoff must not rise with f")
        case _ => ()
      }
      val full = rows((src, 100))
      assert(full._1 === ranked(src).size.toLong, s"$src f=100 must keep everything")
    }
    info(s"sf0.001: ${rows.size} (source, f) rows over ${ranked.size} sources")
  }
}
