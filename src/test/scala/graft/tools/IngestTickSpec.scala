package graft.tools

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{Curation, Dedup}
import graft.streaming.{StreamingCorpus, StreamingDupClusters, StreamingSpanDedup}

/** The composite per-drop pass: after each ingest tick, EVERY maintained
  * surface must equal its batch twin over the corpus landed so far — the
  * whole point of the one-command entry.
  */
class IngestTickSpec extends SparkSpec {

  private def copyHalf(srcDir: String, dstDir: String, table: String, idCol: String, firstHalf: Boolean): Unit = {
    val df = spark.read.parquet(s"$srcDir/$table.parquet")
    val mid = df.agg(org.apache.spark.sql.functions.expr(s"percentile($idCol, 0.5)")).head().getDouble(0)
    val part =
      if (firstHalf) df.filter(org.apache.spark.sql.functions.col(idCol) <= mid)
      else df.filter(org.apache.spark.sql.functions.col(idCol) > mid)
    part.write.mode("append").parquet(s"$dstDir/$table.parquet")
  }

  private def labelSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def statSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[Long]("longest_span"))
      )
      .toSet

  private def stageMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(3)).toMap

  test("ingest-tick: two drops; clusters, spans, corpus stages and ANN all current after each") {
    val dataDir = Files.createTempDirectory("it_data").toString
    val stateDir = Files.createTempDirectory("it_state").toString

    for (first <- Seq(true, false)) {
      copyHalf(sfDir, dataDir, "documents", "doc_id", first)
      copyHalf(sfDir, dataDir, "embeddings", "vec_id", first)
      val o = IngestTick.run(spark, dataDir, stateDir)
      assert(o.corpus.mode === "incremental" && o.corpus.nDelta > 0)
      assert(o.clusterDelta > 0 && o.spanDelta > 0)

      // every maintained surface equals its batch twin over the landed corpus
      assert(
        labelSet(
          spark.read
            .parquet(s"$stateDir/clusters/labels/current")
            .select("doc_id", "cluster", "cluster_size")
        ) === labelSet(Dedup.q101LshDupClusters(spark, dataDir).select("doc_id", "cluster", "cluster_size")),
        s"drop first=$first: maintained clusters != batch q101"
      )
      assert(
        statSet(StreamingSpanDedup.readStats(spark, s"$stateDir/spans")) ===
          statSet(Curation.q110SpanDedup(spark, dataDir)),
        s"drop first=$first: maintained span stats != batch q110"
      )
      assert(
        stageMap(StreamingCorpus.finalStages(spark, s"$stateDir/corpus")) ===
          stageMap(Curation.corpusBuildStages(spark, dataDir)),
        s"drop first=$first: maintained corpus stages != batch build"
      )
      // the syndication readers compose this maintainer's labels with the
      // corpus maintainer's source attribution — both serves == batch
      assert(
        StreamingDupClusters
          .syndicationMatrix(spark, s"$stateDir/clusters", s"$stateDir/corpus")
          .collect().toSeq.map(_.toSeq) ===
          Dedup.q142SyndicationMatrix(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: served syndication matrix != batch q142"
      )
      assert(
        StreamingDupClusters
          .syndicationRank(spark, s"$stateDir/clusters", s"$stateDir/corpus")
          .collect().toSeq.map(_.toSeq) ===
          Dedup.q185SyndicationRank(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: served syndication rank != batch q185"
      )
      assert(o.driftDelta > 0, s"drop first=$first: drift tick must see the delta")
      assert(
        graft.streaming.StreamingDriftWatch.driftTable(spark, s"$stateDir/drift").collect().toSeq.map(_.toSeq) ===
          graft.operators.Importance.q128SourceDrift(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: maintained drift table != batch q128"
      )
      assert(o.sketchDelta > 0, s"drop first=$first: sketch tick must see the delta")
      assert(
        graft.streaming.StreamingSourceSketch.sketchTable(spark, s"$stateDir/sketch").collect().toSeq.map(_.toSeq) ===
          Curation.q134SourceSketch(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: maintained sketch table != batch q134"
      )
      assert(o.sampleDelta > 0, s"drop first=$first: sample tick must see the delta")
      assert(
        graft.streaming.StreamingSample.sampleTable(spark, s"$stateDir/sample").collect().toSeq.map(_.toSeq) ===
          graft.operators.Sampling.q145WeightedSample(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: maintained reservoir != batch q145"
      )
      assert(o.bloomDelta > 0, s"drop first=$first: bloom tick must see the delta")
      assert(
        graft.streaming.StreamingBloomScreen
          .screenTable(spark, s"$stateDir/bloom").collect().toSeq.map(_.toSeq) ===
          Curation.q166BloomScreen(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: maintained bloom screen != batch q166"
      )
      assert(o.packDelta > 0, s"drop first=$first: pack tick must see the delta")
      assert(
        graft.streaming.StreamingPack
          .manifestTable(spark, s"$stateDir/pack").collect().toSeq.map(_.toSeq) ===
          Curation.q170PackManifest(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: maintained pack manifest != batch q170"
      )
      assert(o.mediaDelta > 0, s"drop first=$first: media tick must see the delta")
      assert(
        graft.streaming.StreamingMediaFps
          .videoNeardup(spark, s"$stateDir/media").collect().toSeq.map(_.toSeq) ===
          graft.operators.Multimodal.q115VideoNeardup(spark, dataDir).collect().toSeq.map(_.toSeq),
        s"drop first=$first: maintained media index (video serve) != batch q115"
      )
      assert(o.winnowDelta > 0, s"drop first=$first: winnow tick must see the delta")
      assert(
        graft.streaming.StreamingWinnow
          .fpTable(spark, s"$stateDir/winnow").collect().toSeq.map(_.toSeq).sortBy(_.mkString("|")) ===
          Dedup.winnowFingerprints(spark, dataDir).collect().toSeq.map(_.toSeq).sortBy(_.mkString("|")),
        s"drop first=$first: maintained winnow index != batch fingerprints"
      )
      // ANN: every family persisted something on drop 1; drop 2 must reuse
      // geometry (Appended) or legitimately rebuild — never silently skip a
      // GROWN corpus as Current
      assert(o.ann.nonEmpty, "embeddings present: ann refresh must run")
      o.ann.foreach { case (fam, out) =>
        assert(out.wrote, s"drop first=$first: ann $fam did not write for a grown corpus ($out)")
      }
      if (!first)
        assert(
          o.ann.exists { case (_, out) => out.isInstanceOf[graft.operators.Similarity.Appended] },
          s"append refresh: at least one family must extend in place, got ${o.ann}"
        )
      // BM25 postings: drop 1 rebuilds, drop 2 (grown corpus, monotone ids)
      // appends; the served ranking equals the scan path over the landed data
      assert(o.bm25.wrote, s"drop first=$first: bm25 did not write for a grown corpus (${o.bm25})")
      if (!first) assert(o.bm25.isInstanceOf[graft.operators.Similarity.Appended], s"got ${o.bm25}")
      val serve = spark.newSession()
      serve.conf.set(graft.operators.Retrieval.Bm25IndexDirConf, s"$stateDir/bm25")
      assert(
        graft.operators.Retrieval.q122Bm25Indexed(serve, dataDir).collect().toSeq ===
          graft.operators.Retrieval.q103Bm25(spark.newSession(), dataDir).collect().toSeq,
        s"drop first=$first: maintained bm25 index != scan path"
      )
    }

    // redelivery: a tick with nothing new is a no-op everywhere
    val o3 = IngestTick.run(spark, dataDir, stateDir)
    assert(
      o3.corpus.mode === "noop" && o3.clusterDelta === 0L && o3.spanDelta === 0L &&
        o3.driftDelta === 0L && o3.sketchDelta === 0L && o3.winnowDelta === 0L &&
        o3.sampleDelta === 0L && o3.bloomDelta === 0L && o3.packDelta === 0L &&
        o3.mediaDelta === 0L
    )
    info(s"two drops + noop tick verified against batch twins")
  }
}
