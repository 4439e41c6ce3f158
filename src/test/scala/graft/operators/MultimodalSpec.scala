package graft.operators

import graft.SparkSpec

/** Multimodal plumbing invariants at sf0.001: the FAKE codec's outputs are
  * pinned against direct JVM recomputation (the part no SQL oracle covers),
  * and the batch/partitioning machinery is exercised for real.
  */
class MultimodalSpec extends SparkSpec {

  test("media table: payload bytes round-trip the document text") {
    val media = Multimodal.mediaTable(spark, sfDir).collect()
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(media.length === docs.size)
    media.take(20).foreach { m =>
      assert(new String(m.payload, "UTF-8") === docs(m.media_id))
      assert(Set("image", "audio", "video").contains(m.kind))
    }
  }

  test("decode matches a direct FakeCodec run (plumbing adds/loses nothing)") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val decoded = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    media.collect().take(50).foreach { m =>
      val (w, h, sum) = Multimodal.FakeCodec.decode(m.payload)
      val d = decoded(m.media_id)
      assert(d.width === w && d.height === h && d.byte_sum === sum)
      assert(d.n_bytes === m.payload.length.toLong)
    }
  }

  test("features: L1-normalized 16-dim histograms, stable across partitionings") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val f1 = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal
      .extractFeatures(media.repartition(7))
      .collect()
      .map(f => f.media_id -> f.features.toSeq)
      .toMap
    assert(f1 === f2, "feature extraction must not depend on partitioning")
    f1.values.take(20).foreach { f =>
      assert(f.length === Multimodal.FeatureDim)
      assert(math.abs(f.sum - 1.0f) < 1e-3, "histogram is L1-normalized")
    }
  }

  test("frame sampling: frame count = ceil(duration/cadence), contiguous indexes") {
    val frames = Multimodal.q38FrameSample(spark, sfDir).collect()
    val byMedia = frames.groupBy(_.getLong(0))
    val durations = Multimodal
      .mediaTable(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("kind") === "video")
      .collect()
      .map(m => m.media_id -> m.meta.duration_ms)
      .toMap
    assert(byMedia.keySet === durations.keySet)
    byMedia.foreach { case (id, fs) =>
      val expected = ((durations(id) + 999) / 1000).toInt
      assert(fs.length === expected)
      assert(fs.map(_.getInt(1)).sorted.sameElements(0 until expected))
    }
  }

  test("q65 resize: fits the 224-box, preserves aspect, never upscales, deterministic") {
    val rows = Multimodal
      .resize(Multimodal.mediaTable(spark, sfDir), targetW = 224, targetH = 224)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.out_width <= 224 && r.out_height <= 224, s"media ${r.media_id} exceeds the box")
      assert(r.scale <= 1.0 && r.scale > 0.0, "downscale only")
      // aspect preserved: cross-multiplied ratios agree within the slack
      // that per-dimension half-pixel rounding allows (|out_w*h - out_h*w|
      // <= 0.5h + 0.5w) — an implementation-independent invariant, not a
      // recomputation of the resize formula
      assert(
        math.abs(r.out_width.toLong * r.height - r.out_height.toLong * r.width) <= (r.width + r.height) / 2 + 1,
        s"aspect drifted: $r"
      )
      // at least one dimension touches the box unless the input already fit
      if (r.scale < 1.0) assert(r.out_width >= 223 || r.out_height >= 223, s"loose fit: $r")
      assert(r.resized_bytes >= 1L)
    }
    val summary = Multimodal.q65MediaResize(spark, sfDir).collect()
    assert(summary.map(_.getString(0)).sorted.sameElements(Array("audio", "image", "video")))
    // deterministic across runs
    val again = Multimodal.q65MediaResize(spark, sfDir).collect()
    assert(summary.map(_.toString).sameElements(again.map(_.toString)))
  }
}
