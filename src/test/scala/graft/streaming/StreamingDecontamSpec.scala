package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, Sampling}

/** The serve-side decontamination family: q163's decision table composed
  * from the four maintainers' states must equal batch q163 over the same
  * landed corpus, tick by tick — including the RETROACTIVE action flip
  * when a later drop lands the test doc an earlier train doc duplicates.
  */
class StreamingDecontamSpec extends SparkSpec {

  private def bucketOf(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
    Integer.parseInt(d.take(1).map("%02x".format(_)).mkString, 16)
  }

  private def writeDocs(dataDir: String, mode: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs
      .map { case (id, text) => (id, text, "en", s"src${id % 2}", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .mode(mode)
      .parquet(s"$dataDir/documents.parquet")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("decision table from maintained state equals batch q163 per tick; retroactive flips on later drops") {
    val dataDir = java.nio.file.Files.createTempDirectory("decontam_data").toString
    val stateRoot = java.nio.file.Files.createTempDirectory("decontam_state").toString

    // id pools: text docs must not be image-kind (doc_id % 3 != 0), image
    // docs must be (== 0); split membership is the md5 coin
    val trainText = Iterator.from(1).map(_.toLong).filter(id => id % 3 != 0 && bucketOf(id) < Sampling.SPLIT_TRAIN_LT)
    val testText = Iterator.from(1).map(_.toLong).filter(id => id % 3 != 0 && bucketOf(id) >= Sampling.SPLIT_VALIDATION_LT)
    val trainImg = Iterator.from(1).map(_ * 3L).filter(id => bucketOf(id) < Sampling.SPLIT_TRAIN_LT)
    val testImg = Iterator.from(1).map(_ * 3L).filter(id => bucketOf(id) >= Sampling.SPLIT_VALIDATION_LT)
    val Seq(tDup, tRun, tGram) = trainText.take(3).toSeq
    val tImg = trainImg.next()
    val Seq(sRun, sGram) = testText.take(2).toSeq
    val drop1Max = Seq(tDup, tRun, tGram, tImg, sRun, sGram).max
    // drop-2 ids must exceed the watermark (max doc_id) of drop 1
    val eDup = testText.dropWhile(_ <= drop1Max).next()
    val eImg = testImg.dropWhile(_ <= drop1Max).next()

    def toks(prefix: String, n: Int): Seq[String] = (1 to n).map(i => s"$prefix$i")
    val run = toks("run", 60)
    val gram = toks("gm", 8)
    val imgBase = (1 to 100).map(i => ('a' + i % 26).toChar).mkString
    val imgEdit = imgBase.updated(10, 'z').updated(11, 'z')

    val drop1 = Seq(
      tDup -> toks("ta", 40).mkString(" "), // near-dup of eDup (drop 2)
      tRun -> (toks("rf", 50) ++ run ++ toks("rg", 50)).mkString(" "), // 60-token run shared with sRun
      tGram -> (toks("nf", 30) ++ gram ++ toks("ng", 30)).mkString(" "), // one 8-gram shared with sGram
      tImg -> imgBase, // image near-dup of eImg (drop 2)
      sRun -> (toks("sf", 50) ++ run ++ toks("sg", 50)).mkString(" "),
      sGram -> (toks("mf", 30) ++ gram ++ toks("mg", 30)).mkString(" ")
    )
    writeDocs(dataDir, "overwrite", drop1)

    def tickAll(): Unit = {
      StreamingBloomScreen.tick(spark, dataDir, s"$stateRoot/bloom")
      StreamingDupClusters.tick(spark, dataDir, s"$stateRoot/clusters")
      StreamingWinnow.tick(spark, dataDir, s"$stateRoot/winnow")
      StreamingMediaFps.tick(spark, dataDir, s"$stateRoot/media")
      StreamingCorpus.tick(spark, s"$dataDir/documents.parquet", s"$stateRoot/corpus")
      ()
    }
    tickAll()

    def served() =
      StreamingDecontam
        .decisionTable(spark, stateRoot)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4), r.getString(5))))
        .toMap

    // tick 1: the text legs fire where both sides landed; the duplicates'
    // partners haven't landed, so no drop/drop_image yet
    val s1 = served()
    assert(
      canon(StreamingDecontam.decisionTable(spark, stateRoot)) ===
        canon(Dedup.q163ContaminationDepth(spark, dataDir)),
      "tick 1: served decision table must equal batch q163"
    )
    assert(s1(tRun)._5 === "mask_spans", s"60-token shared run: $s1")
    assert(s1(tRun)._3 >= 50 && s1(tRun)._3 <= 60, s"winnow run bounds: $s1")
    assert(s1(tGram)._5 === "review_ngrams" && s1(tGram)._1 === 1L, s"single shared 8-gram: $s1")
    assert(!s1.contains(tDup), s"the near-dup's test partner hasn't landed yet: $s1")
    assert(!s1.contains(tImg), s"the leaked image's eval twin hasn't landed yet: $s1")

    // drop 2: the test-side partners land — earlier train docs flip
    // retroactively at the next serve, with NO dedicated repair tick
    writeDocs(dataDir, "append", Seq(eDup -> toks("ta", 39).mkString(" "), eImg -> imgEdit))
    tickAll()
    val s2 = served()
    assert(
      canon(StreamingDecontam.decisionTable(spark, stateRoot)) ===
        canon(Dedup.q163ContaminationDepth(spark, dataDir)),
      "tick 2: served decision table must equal batch q163"
    )
    assert(s2(tDup)._5 === "drop" && s2(tDup)._2 === 1L, s"retroactive near-dup flip: $s2")
    assert(s2(tImg)._5 === "drop_image" && s2(tImg)._4 === 1L, s"retroactive image-leak flip: $s2")
    assert(s2(tRun)._5 === "mask_spans" && s2(tGram)._5 === "review_ngrams", s"unrelated actions stable: $s2")

    // the mask export serves from the same states and equals batch q182
    assert(
      canon(StreamingDecontam.maskExport(spark, stateRoot)) ===
        canon(Dedup.q182DecontamMaskExport(spark, dataDir)),
      "served mask export must equal batch q182"
    )
    val masks = StreamingDecontam.maskExport(spark, stateRoot).collect()
    assert(masks.map(_.getLong(0)).toSet === Set(tRun), s"exactly the masked doc exports: ${masks.toSeq}")

    // the cost ledger serves from the corpus maintainer's token counts
    // plus the same decision composition and equals batch q172 — no
    // document re-read to cost the pass
    assert(
      canon(StreamingDecontam.ledger(spark, stateRoot)) ===
        canon(Dedup.q172DecontamLedger(spark, dataDir)),
      "served decontamination ledger must equal batch q172"
    )
    val led = StreamingDecontam
      .ledger(spark, stateRoot)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // every planted train doc is an offender here, so there is no 'keep'
    // row — one ledger row per (source, action), each a single doc
    assert(led.keys.exists(_._2 == "drop") && led.values.forall(_ === 1L), s"ledger actions present: $led")

    // the cross-modal surface serves from the same states (scope chars off
    // the corpus maintainer, bloom leg off the screen maintainer) and
    // equals batch q179 — the dashboard read with no corpus re-scan
    assert(
      canon(StreamingDecontam.surface(spark, stateRoot)) ===
        canon(Dedup.q179DecontamSurface(spark, dataDir)),
      "served decontamination surface must equal batch q179"
    )
    val surf = StreamingDecontam
      .surface(spark, stateRoot)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3))
      .toMap
    // after drop 2 every planted text offender shares 8-grams with a test
    // doc (the gram doc by construction, the run doc through its 60-token
    // run, the near-dup through its 39 shared tokens), the run and
    // near-dup docs carry winnow runs, and q166 is a superset of q67
    assert(surf("8gram_exact") === 3L && surf("verbatim_spans") === 2L, s"text legs flag the planted docs: $surf")
    assert(surf("bloom_screen") >= surf("8gram_exact"), s"bloom screens at least the exact set: $surf")
    assert(surf("image_neardup") === 1L, s"the leaked image is the one flagged image doc: $surf")

    // the overlap matrix serves from the same states and equals batch
    // q184; the bloom⊇8gram containment survives the composition
    assert(
      canon(StreamingDecontam.overlap(spark, stateRoot)) ===
        canon(Dedup.q184DecontamOverlap(spark, dataDir)),
      "served overlap matrix must equal batch q184"
    )
    val ov = StreamingDecontam
      .overlap(spark, stateRoot)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
      .toMap
    assert(ov.size === 6 && ov(("8gram_exact", "bloom_screen")) >= 1L, s"overlap pairs served: $ov")

    // redelivery: a no-new-data tick changes nothing
    tickAll()
    assert(served() === s2, "no-op ticks must not move the decision table")
    assert(
      canon(StreamingDecontam.ledger(spark, stateRoot)) ===
        canon(Dedup.q172DecontamLedger(spark, dataDir)),
      "no-op ticks must not move the ledger either"
    )

    // the one-command serve renders every family surface from the same
    // states (the `decontam-serve` CLI's testable core): all five
    // sections present, the decision counts echoing s2's actions
    val rendered = graft.tools.DecontamServe.render(spark, stateRoot)
    Seq("decisions (q163)", "ledger (q172)", "surface (q179)", "overlap (q184)", "mask export (q182)").foreach { sec =>
      assert(rendered.exists(_.contains(sec)), s"rendered serve must carry $sec:\n${rendered.mkString("\n")}")
    }
    assert(
      rendered.head.contains("drop=1") && rendered.head.contains("drop_image=1"),
      s"decision counts echo the served table: ${rendered.head}"
    )

    // state-schema MIGRATION (r16: the stage table grew n_chars): simulate
    // a stage table written under the old schema by rewriting it without
    // the column — the surface serve must refuse loudly, the ledger (which
    // never reads chars) must keep serving, and ONE maintenance tick (even
    // with no new documents) must backfill the column from the landing
    // directory and restore the surface, bit-equal to batch
    val stagesDir = s"$stateRoot/corpus/stages"
    val legacy = spark.read
      .parquet(stagesDir)
      .drop("n_chars")
      .localCheckpoint()
    legacy.write.mode("overwrite").parquet(stagesDir)
    val refused = intercept[IllegalArgumentException](StreamingDecontam.surface(spark, stateRoot))
    assert(refused.getMessage.contains("n_chars"), s"migration refusal names the missing column: $refused")
    assert(
      canon(StreamingDecontam.ledger(spark, stateRoot)) ===
        canon(Dedup.q172DecontamLedger(spark, dataDir)),
      "pre-migration state must still serve the ledger (it reads no chars)"
    )
    StreamingCorpus.tick(spark, s"$dataDir/documents.parquet", s"$stateRoot/corpus")
    assert(
      canon(StreamingDecontam.surface(spark, stateRoot)) ===
        canon(Dedup.q179DecontamSurface(spark, dataDir)),
      "one no-delta tick must backfill n_chars and restore the surface serve"
    )
  }
}
