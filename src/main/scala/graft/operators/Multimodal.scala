package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal (image/audio/video) column plumbing: opaque `binary` payloads +
  * typed metadata, with decode / feature-extract / resize / frame-sample as
  * per-partition batch operators.
  *
  * ==== STUB NOTICE ====
  * This container ships no media codecs, so `FakeCodec` below is a
  * DETERMINISTIC FAKE decode (arithmetic on payload bytes). Everything
  * around it — the schema, the typed Dataset plumbing, the
  * mapPartitions-with-batching execution shape, the partitioning — is real
  * and tested; swapping `FakeCodec` for JNI/ffmpeg/jpeg bindings changes no
  * plan shape. In PySpark the same seam is `mapInPandas` with an Arrow
  * batch per decode call; `mapPartitions` + `Iterator.grouped` is the JVM
  * equivalent (one codec instance per partition, amortized across a batch).
  *
  * Scale notes:
  *   - Payloads stay distributed; nothing media-sized ever reaches the
  *     driver. Decode parallelism = partition count; `repartition(media_id)`
  *     balances skewed payload sizes before the expensive stage.
  *   - Decoded features are small fixed-width vectors — the output of the
  *     decode stage is orders of magnitude narrower than its input, the
  *     right shape for a shuffle boundary.
  */
object Multimodal {

  final case class MediaMeta(format: String, declared_width: Int, declared_height: Int, duration_ms: Long)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      byte_sum: Long
  )
  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame_ts_ms: Long, frame_bytes: Long)
  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      out_width: Int,
      out_height: Int,
      scale: Double,
      resized_bytes: Long
  )

  val FeatureDim = 16
  val DecodeBatchSize = 64

  /** Deterministic fake codec — the clearly-marked stand-in for a real
    * image/audio/video library (see STUB NOTICE above).
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      // real codec would parse a header; the fake derives dims from content
      val n = payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += payload(i) & 0xff; i += 1 }
      (64 + (n % 512), 64 + (sum % 512).toInt, sum)
    }

    /** Byte-histogram "embedding" (16 buckets, L1-normalized) — the feature
      * extractor stand-in.
      */
    def features(payload: Array[Byte]): Array[Float] = {
      val h = new Array[Float](FeatureDim)
      payload.foreach(b => h((b & 0xff) % FeatureDim) += 1f)
      val total = math.max(1f, payload.length.toFloat)
      h.map(_ / total)
    }
  }

  /** Synthetic media table derived deterministically from `documents`:
    * payload = utf-8 text bytes, kind by doc_id mod 3, declared metadata from
    * simple arithmetic. (The plumbing target; payloads are opaque from here.)
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables
      .balanced(Tables.documents(spark, dir))
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("fake/v1").as("format"),
          (col("n_chars") % 640).cast("int").as("declared_width"),
          (col("n_chars") % 480).cast("int").as("declared_height"),
          (col("n_chars") * 40).cast("long").as("duration_ms")
        ).as("meta")
      )
      .as[MediaRow]
  }

  /** Decode stage: per-partition batched fake-decode. One "codec" per
    * partition, payloads processed in DecodeBatchSize groups — the exact
    * execution shape a real codec binding needs (expensive init amortized,
    * bounded memory per batch).
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition: real bindings would open the codec here, once
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, sum) = FakeCodec.decode(m.payload)
          DecodedMedia(m.media_id, m.kind, w, h, m.payload.length.toLong, sum)
        }
      }
    }
  }

  /** Feature extraction stage: same batched mapPartitions shape, emitting
    * fixed-width vectors ready for the Similarity operators.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap {
        _.map(m => MediaFeatures(m.media_id, m.kind, FakeCodec.features(m.payload)))
      }
    }
  }

  /** Resize stage: aspect-preserving fit into a target box — decode dims,
    * scale = min(targetW/w, targetH/h) capped at 1.0 (never upscale),
    * output byte estimate by area ratio. Same batched-mapPartitions shape
    * as decode; a real binding would hand the batch to the codec's scaler
    * here.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, s"resize box must be positive, got ${targetW}x$targetH")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap {
        _.map { m =>
          val (w, h, _) = FakeCodec.decode(m.payload)
          val scale = math.min(1.0, math.min(targetW.toDouble / w, targetH.toDouble / h))
          val ow = math.max(1, math.round(w * scale).toInt)
          val oh = math.max(1, math.round(h * scale).toInt)
          val bytes = math.max(1L, math.round(m.payload.length * scale * scale))
          ResizedMedia(m.media_id, m.kind, w, h, ow, oh, scale, bytes)
        }
      }
    }
  }

  /** Frame sampling for video rows: one row per sampled frame at `everyMs`
    * cadence — a pure Spark sequence/explode (no codec until frames are
    * decoded downstream). frame_bytes is the fake per-frame size share.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame =
    media
      .filter(col("kind") === "video")
      // zero-duration media yields zero frames (an unguarded
      // sequence(0, -1, step) would throw under ANSI)
      .filter(col("meta.duration_ms") > 0)
      .select(
        col("media_id"),
        col("meta.duration_ms").as("duration_ms"),
        length(col("payload")).cast("long").as("n_bytes")
      )
      .withColumn("frame_ts_ms", explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_idx", (col("frame_ts_ms") / everyMs).cast("int"))
      .withColumn(
        "frame_bytes",
        (col("n_bytes") * everyMs / greatest(col("duration_ms"), lit(1L))).cast("long")
      )
      .select(col("media_id"), col("frame_idx"), col("frame_ts_ms"), col("frame_bytes"))

  // ---------------------------------------------------------------------------
  // Registry queries
  // ---------------------------------------------------------------------------

  /** q37 — decode summary per kind. The fake decode is arithmetic on payload
    * length/byte-sum, so DuckDB can replicate it → full oracle coverage of
    * the mapPartitions pipeline.
    */
  def q37MediaDecode(spark: SparkSession, dir: String): DataFrame =
    decode(mediaTable(spark, dir).repartition(col("media_id")))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        sum(col("n_bytes")).as("total_bytes")
      )
      .orderBy(col("kind"))

  // q37's byte-sum decode is reproduced in DuckDB via codepoint sums over
  // the (verified-ASCII) corpus — see the oracle block below.

  /** q38 — frame sampling at 1 frame/sec: sequence+explode, oracle-able. */
  def q38FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), everyMs = 1000L)
      .orderBy(col("media_id"), col("frame_idx"))

  val q38Oracle: String =
    """WITH v AS (
      |  SELECT doc_id AS media_id,
      |         n_chars * 40 AS duration_ms,
      |         octet_length(encode(text)) AS n_bytes
      |  FROM documents
      |  WHERE ['image','audio','video'][(doc_id % 3 + 1)::INT] = 'video')
      |SELECT media_id,
      |       CAST(f // 1000 AS INT) AS frame_idx,
      |       f AS frame_ts_ms,
      |       CAST(n_bytes * 1000 // greatest(duration_ms, 1) AS BIGINT) AS frame_bytes
      |FROM v, unnest(range(0, duration_ms, 1000)) AS t(f)
      |ORDER BY media_id, frame_idx""".stripMargin

  /** q39 — feature extraction summary: per-kind mean feature-vector norm.
    * Oracle-checked (byte-histogram math reproduced in DuckDB with FLOAT
    * casts mirroring the codec's float32 accumulation); MultimodalSpec
    * additionally pins values against a direct JVM recomputation.
    */
  def q39MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    extractFeatures(mediaTable(spark, dir))
      .withColumn(
        "l2",
        sqrt(expr("aggregate(features, 0D, (a, x) -> a + cast(x AS double) * cast(x AS double))"))
      )
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), round(avg(col("l2")), 6).as("avg_feature_norm"))
      .orderBy(col("kind"))
  }

  /** q65 — resize summary per kind: media fit into a 224×224 box (the
    * ubiquitous vision-model input), average scale factor and output byte
    * volume. Oracle-checked (the fake decode's arithmetic is reproduced in
    * DuckDB); MultimodalSpec pins dims/scale/byte invariants.
    */
  def q65MediaResize(spark: SparkSession, dir: String): DataFrame =
    resize(mediaTable(spark, dir).repartition(col("media_id")), targetW = 224, targetH = 224)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        round(avg(col("scale")), 6).as("avg_scale"),
        max(col("out_width")).as("max_out_width"),
        max(col("out_height")).as("max_out_height"),
        sum(col("resized_bytes")).as("total_resized_bytes")
      )
      .orderBy(col("kind"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_media_decode" -> (q37MediaDecode _),
    "q38_frame_sample" -> (q38FrameSample _),
    "q39_media_features" -> (q39MediaFeatures _),
    "q65_media_resize" -> (q65MediaResize _)
  )

  /** The fake codec's "decode" is pure arithmetic on the payload's length
    * and byte sum, and the corpus is verified pure ASCII (TablesSpec's
    * "documents.text is pure ASCII" test pins `length(text) ==
    * octet_length(text)` for every row at sf0.001 AND the gate's sf0.01),
    * so the byte sum equals the sum of character codepoints —
    * expressible in DuckDB as
    * `list_sum(list_transform(string_split(text,''), c -> unicode(c)))`.
    * That makes q37 (decode dims), q65 (resize arithmetic) and q39
    * (byte-histogram feature norm, float32 math reproduced via FLOAT
    * casts) fully oracle-checkable; only a real (non-fake) codec binding
    * would take these back to rows-only.
    */
  private val q37Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
      |         octet_length(encode(text)) AS n,
      |         coalesce(list_sum(list_transform(string_split(text, ''), c -> unicode(c))), 0) AS bsum
      |  FROM documents)
      |SELECT kind,
      |       count(*) AS n_media,
      |       round(avg(64 + n % 512), 4) AS avg_width,
      |       round(avg(64 + bsum % 512), 4) AS avg_height,
      |       sum(n)::BIGINT AS total_bytes
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  private val q65Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
      |         octet_length(encode(text)) AS n,
      |         coalesce(list_sum(list_transform(string_split(text, ''), c -> unicode(c))), 0) AS bsum
      |  FROM documents),
      |d AS (
      |  SELECT kind, n,
      |         (64 + n % 512)::INT AS w,
      |         (64 + bsum % 512)::INT AS h
      |  FROM m),
      |r AS (
      |  SELECT kind, w, h, n,
      |         least(1.0::DOUBLE, least(224.0::DOUBLE / w, 224.0::DOUBLE / h)) AS scale
      |  FROM d),
      |f AS (
      |  SELECT kind, scale,
      |         greatest(1, CAST(round(w * scale) AS INT)) AS ow,
      |         greatest(1, CAST(round(h * scale) AS INT)) AS oh,
      |         greatest(1, CAST(round(n * scale * scale) AS BIGINT)) AS bytes
      |  FROM r)
      |SELECT kind,
      |       count(*) AS n_media,
      |       round(avg(scale), 6) AS avg_scale,
      |       max(ow) AS max_out_width,
      |       max(oh) AS max_out_height,
      |       sum(bytes)::BIGINT AS total_resized_bytes
      |FROM f GROUP BY kind ORDER BY kind""".stripMargin

  private val q39Oracle: String =
    """WITH chars AS (
      |  SELECT doc_id, unicode(t.x) % 16 AS b
      |  FROM documents, unnest(string_split(text, '')) AS t(x)
      |  WHERE length(text) > 0),
      |hist AS (
      |  SELECT doc_id, b, count(*)::FLOAT AS cnt FROM chars GROUP BY doc_id, b),
      |docs AS (
      |  SELECT doc_id,
      |         ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
      |         greatest(octet_length(encode(text)), 1)::FLOAT AS total
      |  FROM documents),
      |norms AS (
      |  SELECT d.doc_id, min(d.kind) AS kind,
      |         sqrt(coalesce(sum(
      |           CAST(CAST(h.cnt / d.total AS FLOAT) AS DOUBLE) *
      |           CAST(CAST(h.cnt / d.total AS FLOAT) AS DOUBLE)), 0)) AS l2
      |  FROM docs d LEFT JOIN hist h ON d.doc_id = h.doc_id
      |  GROUP BY d.doc_id)
      |SELECT kind, count(*) AS n_media, round(avg(l2), 6) AS avg_feature_norm
      |FROM norms GROUP BY kind ORDER BY kind""".stripMargin

  val oracles: Map[String, String] = Map(
    "q37_media_decode" -> q37Oracle,
    "q38_frame_sample" -> q38Oracle,
    "q39_media_features" -> q39Oracle,
    "q65_media_resize" -> q65Oracle
  )
}
