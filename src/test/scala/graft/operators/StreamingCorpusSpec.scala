package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingCorpus

class StreamingCorpusSpec extends SparkSpec {

  private def md5Bucket(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 2), 16)
  }

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    rows
      .map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .mode("append")
      .parquet(dir)
  }

  private def stagesCanon(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(3)).toMap

  test("incremental ticks over real-corpus drops equal the batch build, drop by drop") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    val (drop1, drop2) = docs.splitAt(docs.length / 2)

    val land = Files.createTempDirectory("sc_land").toString
    val state = Files.createTempDirectory("sc_state").toString
    val mirror1 = Files.createTempDirectory("sc_m1").toString
    val mirror2 = Files.createTempDirectory("sc_m2").toString

    writeDocs(land, drop1)
    writeDocs(s"$mirror1/documents.parquet", drop1)
    val t1 = StreamingCorpus.tick(spark, land, state)
    assert(t1.mode === "incremental" && t1.nDelta === drop1.length.toLong)
    assert(
      stagesCanon(StreamingCorpus.finalStages(spark, state)) ===
        stagesCanon(Curation.corpusBuildStages(spark, mirror1)),
      "tick1 != batch over drop1"
    )

    writeDocs(land, drop2)
    writeDocs(s"$mirror2/documents.parquet", drop1 ++ drop2)
    val t2 = StreamingCorpus.tick(spark, land, state)
    assert(t2.mode === "incremental" && t2.nDelta === drop2.length.toLong)
    assert(
      stagesCanon(StreamingCorpus.finalStages(spark, state)) ===
        stagesCanon(Curation.corpusBuildStages(spark, mirror2)),
      "tick2 != batch over full corpus"
    )

    // redelivery: nothing above the watermark
    assert(StreamingCorpus.tick(spark, land, state).mode === "noop")
  }

  test("slice compaction mid-stream: many small drops still equal the batch build") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
      .take(120)
    val land = Files.createTempDirectory("sc_cpt_land").toString
    val state = Files.createTempDirectory("sc_cpt_state").toString
    val mirror = Files.createTempDirectory("sc_cpt_m").toString
    spark.conf.set("graft.stream.compactSlices", "2")
    try {
      // 4 drops of 30 docs: the testsh/fpcanon slice families fold after
      // drops 2 and 4; anti-joins must keep reading pre-tick state exactly
      var landed = Seq.empty[(Long, String, String, String)]
      for (drop <- docs.grouped(30)) {
        writeDocs(land, drop)
        landed ++= drop
        assert(StreamingCorpus.tick(spark, land, state).nDelta === drop.length.toLong)
      }
      writeDocs(s"$mirror/documents.parquet", landed)
      assert(
        stagesCanon(StreamingCorpus.finalStages(spark, state)) ===
          stagesCanon(Curation.corpusBuildStages(spark, mirror)),
        "post-compaction maintained stages != batch build"
      )
      import java.nio.file.Paths
      assert(Files.isDirectory(Paths.get(s"$state/testsh/base")), "testsh slices must have folded")
      assert(Files.isDirectory(Paths.get(s"$state/fpcanon/base")), "fpcanon slices must have folded")
    } finally spark.conf.unset("graft.stream.compactSlices")
  }

  test("a late test-split doc retroactively contaminates an earlier eligible doc") {
    // ids with known md5 buckets: A trains (< 205), B lands in the test split (>= 230)
    val idA = (1L to 5000L).find(md5Bucket(_) < Curation.SplitKeepBucket).get
    val idB = (idA + 1 to idA + 5000).find(md5Bucket(_) >= Curation.TestBucket).get
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ") // 20 tokens: passes rules, shares 8-grams

    val land = Files.createTempDirectory("scr_land").toString
    val state = Files.createTempDirectory("scr_state").toString

    writeDocs(land, Seq((idA, shared, "en", "src0")))
    val t1 = StreamingCorpus.tick(spark, land, state)
    assert(t1.retro === 0L)
    val s1 = stagesCanon(StreamingCorpus.finalStages(spark, state))
    assert(Set("kept", "sampled_out").contains(s1(idA)), s"doc $idA should be eligible, got ${s1(idA)}")

    writeDocs(land, Seq((idB, shared, "en", "src1")))
    val t2 = StreamingCorpus.tick(spark, land, state)
    assert(t2.retro === 1L, s"expected exactly one retro flip, got ${t2.retro}")
    val s2 = stagesCanon(StreamingCorpus.finalStages(spark, state))
    assert(s2(idA) === "contaminated", s"doc $idA must flip, got ${s2(idA)}")
    assert(s2(idB) === "held_out", s"doc $idB is in the held-out split, got ${s2(idB)}")
  }
}
