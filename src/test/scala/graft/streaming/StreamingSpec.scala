package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.etl.Fixtures

/** Streaming behavior: file-source rollup with AvailableNow + checkpoint
  * resume, and stateful sessionization with event-time timeouts.
  */
class StreamingSpec extends SparkSpec {

  test("streaming rollup over fixture files matches the batch result") {
    val in = Files.createTempDirectory("s_in")
    val ckpt = Files.createTempDirectory("s_ckpt").toString
    Fixtures.goldenScenario(spark, in)
    val schema = spark.read.parquet(in.toString).schema

    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String, Long)]
    val counts = StreamingRollup.hourlyCountsStream(spark, in.toString, schema, Fixtures.UA)
    StreamingRollup.runAvailableNow(
      counts,
      ckpt,
      (df: DataFrame, _: Long) =>
        df.collect().foreach(r => collected += ((r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))))
    )

    val byKey = collected.groupBy(t => (t._2, t._3)).view.mapValues(_.map(_._4).sum).toMap
    assert(byKey((11, "click")) === 10L)
    assert(byKey((12, "click")) === 20L)
    assert(byKey((12, "impression")) === 10L)
    assert(collected.forall(_._1 == "2022-05-27"))

    // checkpoint resume: re-running with no new files emits nothing new
    val before = collected.size
    StreamingRollup.runAvailableNow(
      StreamingRollup.hourlyCountsStream(spark, in.toString, schema, Fixtures.UA),
      ckpt,
      (df: DataFrame, _: Long) => collected ++= df.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    )
    assert(collected.size === before, "checkpoint prevents reprocessing consumed files")
  }

  test("streaming funnel: arrival-order counts converge to the batch q72 report") {
    val dir = Files.createTempDirectory("s_funnel").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    // the corpus arrives as two file drops (a crawler's landing directory)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(s"$dir/in")
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(s"$dir/in")

    val q = StreamingFunnel
      .funnelStream(spark, s"$dir/in", docs.schema)
      .writeStream
      .format("memory")
      .queryName("funnel_live")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark
      .table("funnel_live")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("token_mass"))))
      .toMap
    // batch and streaming share ONE rule projection (Curation.funnelSignals),
    // so the running report must equal q72's over the same corpus exactly
    val want = graft.operators.Curation
      .q72CurationFunnel(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("token_mass"))))
      .toMap
    assert(got === want, "streaming funnel diverged from the batch funnel")
  }

  test("streaming funnel ingests JSONL drops; torn lines tolerated, counts == batch") {
    val dir = Files.createTempDirectory("s_funnel_jsonl").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.coalesce(1).write.mode("append").json(s"$dir/in")
    // a crawler's torn line lands mid-directory: must not kill the stream
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "in", "torn.json"),
      "{\"doc_id\": 99999, \"text\": \"trunc".getBytes("UTF-8")
    )

    val q = StreamingFunnel
      .funnelStream(spark, s"$dir/in", docs.schema, format = "json")
      .writeStream
      .format("memory")
      .queryName("funnel_jsonl")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark
      .table("funnel_jsonl")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("token_mass"))))
      .toMap
    val want = graft.operators.Curation
      .q72CurationFunnel(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("token_mass"))))
      .toMap
    assert(got === want, "JSONL-fed funnel diverged from the batch funnel")
  }

  test("streaming rollup feeds the warehouse via foreachBatch (T5 end-to-end)") {
    val in = Files.createTempDirectory("sw_in")
    val ckpt = Files.createTempDirectory("sw_ckpt").toString
    val whDir = Files.createTempDirectory("sw_wh").toString
    Fixtures.goldenScenario(spark, in)
    val schema = spark.read.parquet(in.toString).schema
    val wh = new graft.etl.ParquetWarehouse(spark, whDir)

    val counts = StreamingRollup.hourlyCountsStream(spark, in.toString, schema, Fixtures.UA)
    StreamingRollup.runAvailableNow(
      counts,
      ckpt,
      (batch: DataFrame, _: Long) => {
        if (!batch.isEmpty) {
          val report = batch
            .groupBy(col("date"), col("hour"))
            .pivot("event_type", Seq("impression", "click"))
            .sum("n")
            .na
            .fill(0, Seq("impression", "click"))
            .select(
              col("date"),
              col("hour"),
              col("impression").as("impression_count"),
              col("click").as("click_count")
            )
          wh.load(wh.prepare(report))
        }
      }
    )

    val summary = wh.verify()
    assert(summary("total_impressions") === 10L)
    assert(summary("total_clicks") === 30L)
    assert(summary("row_count") === 2L, "streaming load covers only the touched hours (11, 12)")
  }

  test("stateful sessionization: gap closes a session, timeout emits it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[StreamingSessionize.Event]
    val sessions = StreamingSessionize.sessions(
      input.toDS().withWatermark("ts", "0 seconds").as[StreamingSessionize.Event]
    )
    val q = sessions.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: two events 5 min apart (one session), then a 40-min gap event
    input.addData(
      StreamingSessionize.Event(1, ts(0), 1.0),
      StreamingSessionize.Event(1, ts(5), 2.0)
    )
    q.processAllAvailable()
    input.addData(StreamingSessionize.Event(1, ts(45), 4.0)) // gap > 30 min
    q.processAllAvailable()
    // advance watermark far past everything so the open session times out
    input.addData(StreamingSessionize.Event(99, Timestamp.valueOf("2024-01-01 23:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_out").as[StreamingSessionize.Session].collect()
    val u1 = out.filter(_.user_id == 1).sortBy(_.session_start.getTime)
    assert(u1.length === 2, s"expected both user-1 sessions, got: ${out.mkString(", ")}")
    assert(u1(0).n_events === 2 && u1(0).session_value === 3.0)
    assert(u1(0).session_start === ts(0) && u1(0).session_end === ts(5))
    assert(u1(1).n_events === 1 && u1(1).session_value === 4.0)
  }

  test("stream-stream interval join: purchases match preceding-window clicks only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    final case class Click(user_id: Long, click_ts: Timestamp)
    final case class Purchase(user_id: Long, purchase_id: Long, purchase_ts: Timestamp)
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]

    val joined = StreamStreamJoin.attributedPurchases(
      clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "1 minute"),
      purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts").withWatermark("purchase_ts", "1 minute"),
      windowMinutes = 30
    )
    val q = joined.writeStream
      .format("memory")
      .queryName("ss_join_out")
      .outputMode("append")
      .start()

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 12:$m%02d:00")
    clicks.addData((1L, ts(0)), (1L, ts(10)), (2L, ts(5)))
    purchases.addData((1L, 100L, ts(20)), (2L, 200L, ts(50)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ss_join_out").collect()
    // user 1 purchase at :20 matches both clicks (:00, :10); user 2 purchase
    // at :50 matches nothing (its only click at :05 is 45 min earlier)
    assert(rows.count(_.getLong(1) == 100L) === 2)
    assert(rows.count(_.getLong(1) == 200L) === 0)
  }

  test("updateState unit: in-batch gap split without the streaming harness") {
    def ev(m: Int, v: Double) =
      StreamingSessionize.Event(7, Timestamp.valueOf(f"2024-01-01 08:$m%02d:00"), v)
    val state = new TestGroupState[StreamingSessionize.SessionState]
    val out = StreamingSessionize
      .updateState(7, Iterator(ev(0, 1.0), ev(10, 1.0), ev(55, 5.0)), state)
      .toList
    assert(out.length === 1, "first session closed by the in-batch gap")
    assert(out.head.n_events === 2)
    assert(state.getOption.exists(_.n == 1), "second session stays open in state")
  }

  test("updateState unit: late events extend backward within gap, orphans don't corrupt") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def ev(h: Int, m: Int, v: Double) = StreamingSessionize.Event(8, ts(h, m), v)

    // open session [10:00, 10:10]
    val state = new TestGroupState[StreamingSessionize.SessionState]
    state.update(StreamingSessionize.SessionState(ts(10, 0), ts(10, 10), 2, 2.0))

    // a late event 20 min BEFORE start extends the session backward...
    val out1 = StreamingSessionize.updateState(8, Iterator(ev(9, 40, 1.0)), state).toList
    assert(out1.isEmpty)
    assert(state.get.start === ts(9, 40) && state.get.n === 3)

    // ...but an orphan >gap before start is emitted standalone, state intact
    val out2 = StreamingSessionize.updateState(8, Iterator(ev(8, 0, 9.0)), state).toList
    assert(out2.length === 1)
    assert(out2.head.n_events === 1 && out2.head.session_value === 9.0)
    assert(state.get.start === ts(9, 40) && state.get.n === 3, "open session unchanged")
  }

  test("streaming dedup: one emission per fingerprint within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamingDedup.dedup(input.toDF().toDF("ts", "text"), "10 minutes")
    val q = deduped.writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // whitespace/case variants are the SAME fingerprint (batch q29 parity)
    input.addData((ts(0), "Hello  World"), (ts(1), "hello world"), (ts(2), "other doc"))
    q.processAllAvailable()
    input.addData((ts(3), "HELLO WORLD")) // dup, watermark still below its event time
    q.processAllAvailable()
    // advance the watermark past ts(1) + 10min so the fingerprint state is evicted...
    input.addData((ts(35), "filler"))
    q.processAllAvailable()
    // ...then a very late copy re-emits: dedup guarantees are BY DESIGN
    // bounded to the horizon (that is what keeps state finite)
    input.addData((ts(36), "hello world"))
    q.processAllAvailable()
    q.stop()

    val texts = spark.table("dedup_out").select("text").as[String].collect()
    val helloCount = texts.count(_.toLowerCase.replaceAll("\\s+", " ").trim == "hello world")
    assert(helloCount === 2, s"one in-horizon emission + one post-eviction: $texts")
    assert(texts.count(_ == "other doc") === 1)
    assert(texts.length === 4, s"unexpected emissions: ${texts.mkString(", ")}")
  }
}

/** Minimal GroupState fake for direct unit-testing of the update function. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var value: Option[S] = None
  private var removed = false
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(s: S): Unit = { value = Some(s); removed = false }
  override def remove(): Unit = { value = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L

}
