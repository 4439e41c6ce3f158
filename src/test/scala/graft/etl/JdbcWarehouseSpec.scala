package graft.etl

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** The SQL load path (reference `src/Task2/warehouse.py`) end-to-end against
  * the in-memory fake driver — the role SQLite plays in the reference's own
  * tests (`tests/test_client_report_etl.py:48`). Covers DDL bootstrap,
  * archive→delete→chunked-insert→verify, the quarantine upsert through BOTH
  * dialects, batch chunking, and value parity with [[ParquetWarehouse]] on
  * the same scenario.
  */
class JdbcWarehouseSpec extends SparkSpec {

  private val dbSeq = new AtomicInteger(0)
  private def freshWh(dialect: SqlDialect = PostgresDialect, batchSize: Int = 1000): (JdbcWarehouse, String) = {
    val name = s"testdb_${dbSeq.incrementAndGet()}"
    FakeJdbc.drop(name)
    val wh = new JdbcWarehouse(FakeJdbc.factory(name), dialect, batchSize = batchSize)
    wh.ensureSchema()
    (wh, name)
  }

  private def reportDf(rows: Seq[(String, Integer, java.lang.Long, java.lang.Long)]) = {
    import spark.implicits._
    rows.toDF("date", "hour", "impression_count", "click_count")
  }

  test("ensureSchema creates the three reference tables with their keys") {
    val (_, name) = freshWh()
    val d = FakeJdbc.db(name)
    val report = d.table("client_report")
    assert(report.cols === Seq("datetime", "impression_count", "click_count", "audit_loaded_datetime"))
    assert(report.keys === Seq("datetime"))
    assert(d.table("client_report_archive").keys === Seq("datetime"))
    val invalid = d.table("client_report_invalid")
    assert(invalid.keys === Seq("datetime", "source_file"))
    assert(invalid.cols.contains("validation_error"))
  }

  test("load: archive overlapped rows, delete range, insert, verify — reference flow") {
    val (wh, name) = freshWh()
    val first = ParquetWarehouse.prepare(reportDf(Seq(("2022-05-01", 0, 1L, 1L), ("2022-05-01", 1, 2L, 2L))))
    val r1 = wh.load(first)
    assert(r1.rowsLoaded === 2 && r1.rowsArchived === 0)
    assert(r1.totalImpressions === 3 && r1.totalClicks === 3)

    val second = ParquetWarehouse.prepare(reportDf(Seq(("2022-05-01", 0, 9L, 9L), ("2022-05-01", 1, 8L, 8L))))
    val r2 = wh.load(second)
    assert(r2.rowsLoaded === 2, "range delete + insert keeps exactly the new rows")
    assert(r2.rowsArchived === 2, "old overlapped rows are archived")

    val d = FakeJdbc.db(name)
    val report = d.table("client_report").allRows
    assert(report.map(_(1).asInstanceOf[Long]).sorted === Seq(8L, 9L))
    assert(d.table("client_report_archive").allRows.map(_(1).asInstanceOf[Long]).sorted === Seq(1L, 2L))

    // third load of the same range: archive's NOT EXISTS dedups on datetime
    val third = ParquetWarehouse.prepare(reportDf(Seq(("2022-05-01", 0, 4L, 4L))))
    val r3 = wh.load(third)
    assert(r3.rowsArchived === 0, "datetimes already archived are not archived again")
    assert(d.table("client_report_archive").allRows.size === 2)

    val v = wh.verify()
    assert(v("row_count") === 2L, "hour 0 replaced, hour 1 retained (outside third range)")
    assert(v("total_impressions") === 12L) // 4 + 8
  }

  test("load chunks batches and distributes across partitions") {
    val (wh, name) = freshWh(batchSize = 7)
    val rows = (0 until 24).map(h => ("2022-06-01", Integer.valueOf(h), java.lang.Long.valueOf(h), java.lang.Long.valueOf(2L * h)))
    val r = wh.load(ParquetWarehouse.prepare(reportDf(rows)).repartition(5))
    assert(r.rowsLoaded === 24)
    assert(r.totalImpressions === (0 until 24).sum)
    assert(FakeJdbc.db(name).table("client_report").allRows.size === 24)
  }

  test("fake driver enforces the PK on plain INSERT (duplicates rejected)") {
    val (wh, name) = freshWh()
    wh.load(ParquetWarehouse.prepare(reportDf(Seq(("2022-05-01", 0, 1L, 1L)))))
    val conn = FakeJdbc.factory(name)()
    try {
      val ps = conn.prepareStatement(
        PostgresDialect.insertSql("adform_dw", "client_report", JdbcWarehouse.ReportColNames)
      )
      ps.setTimestamp(1, Timestamp.valueOf("2022-05-01 00:00:00"))
      ps.setObject(2, 2L)
      ps.setObject(3, 2L)
      ps.setTimestamp(4, Timestamp.valueOf("2022-05-02 00:00:00"))
      val e = intercept[java.sql.SQLException](ps.executeUpdate())
      assert(e.getMessage.contains("duplicate key"))
    } finally conn.close()
  }

  test("report load is idempotent under task re-execution (upsert on datetime)") {
    // a speculative / retried task re-runs its partition's upserts after the
    // originals committed; with the PK-keyed upsert this rewrites identical
    // rows instead of raising duplicate-key and failing the job
    val (wh, name) = freshWh()
    wh.load(ParquetWarehouse.prepare(reportDf(Seq(("2022-05-01", 0, 1L, 1L)))))
    val t = FakeJdbc.db(name).table("client_report")
    val committed = t.allRows.head.clone()
    val conn = FakeJdbc.factory(name)()
    try {
      val ps = conn.prepareStatement(
        PostgresDialect.upsertSql("adform_dw", "client_report", JdbcWarehouse.ReportColNames, Seq("datetime"))
      )
      committed.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
      ps.executeUpdate() // the duplicate partition's replay
    } finally conn.close()
    assert(t.allRows.size === 1)
    assert(t.allRows.head.toSeq === committed.toSeq)
  }

  test("load rejects duplicate datetimes within one prepared frame") {
    // the upsert would silently last-writer-win an in-frame duplicate —
    // a real input bug; the load must fail loudly the way the plain
    // INSERT's PK violation used to
    val (wh, _) = freshWh()
    val dup = ParquetWarehouse.prepare(
      reportDf(Seq(("2022-05-01", 0, 1L, 1L), ("2022-05-01", 0, 2L, 2L)))
    )
    val e = intercept[IllegalArgumentException](wh.load(dup))
    assert(e.getMessage.contains("duplicate datetime"))
  }

  test("storeInvalid: ON CONFLICT upsert keyed on (datetime, source_file)") {
    val (wh, name) = freshWh()
    import spark.implicits._
    def invalid(err: String, audit: String, imp: Long, clk: Long) =
      Seq((Timestamp.valueOf("2022-05-01 03:00:00"), imp, clk, err, "f.csv", Timestamp.valueOf(audit)))
        .toDF("datetime", "impression_count", "click_count", "validation_error", "source_file", "audit_loaded_datetime")
    wh.storeInvalid(invalid("first_error", "2022-05-02 10:00:00", 5L, 9L))
    wh.storeInvalid(invalid("second_error", "2022-05-02 11:00:00", 7L, 11L))
    val t = FakeJdbc.db(name).table("client_report_invalid")
    assert(t.allRows.size === 1, "same (datetime, source_file) upserts, not duplicates")
    val row = t.allRows.head
    assert(row(t.cols.indexOf("validation_error")) === "second_error")
    assert(row(t.cols.indexOf("impression_count")) === 7L)
    assert(row(t.cols.indexOf("click_count")) === 11L)
  }

  test("null-datetime quarantine rows accumulate instead of violating the key") {
    // the pipeline quarantines rows precisely BECAUSE their date/hour is
    // unparseable → NULL datetime key; the quarantine table must accept and
    // accumulate them (unique index, not a NOT NULL primary key)
    val (wh, name) = freshWh()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def invalid(err: String) =
      Seq((err, "bad.csv")).toDF("validation_error", "source_file")
        .withColumn("datetime", lit(null).cast("timestamp"))
        .withColumn("impression_count", lit(5L))
        .withColumn("click_count", lit(-1L))
        .withColumn("audit_loaded_datetime", lit(Timestamp.valueOf("2022-05-02 10:00:00")))
    wh.storeInvalid(invalid("bad_hour"))
    wh.storeInvalid(invalid("bad_hour_again"))
    val t = FakeJdbc.db(name).table("client_report_invalid")
    assert(t.allRows.size === 2, "NULL keys never conflict: rows accumulate")
    assert(t.allRows.forall(_(t.cols.indexOf("datetime")) == null))
    // non-null keys still upsert through the same unique index
    assert(t.keys === Seq("datetime", "source_file"))
  }

  test("fake driver enforces NOT NULL on the report table") {
    val (wh, _) = freshWh()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one valid row so the load gets past the bounds check; the NULL-keyed
    // second row must then trip the engine's NOT NULL constraint
    val bad = Seq(
      (Option(Timestamp.valueOf("2022-05-01 00:00:00")), 1L, 2L),
      (Option.empty[Timestamp], 3L, 4L)
    ).toDF("datetime", "impression_count", "click_count")
      .withColumn("audit_loaded_datetime", lit(Timestamp.valueOf("2022-05-02 10:00:00")))
    val e = intercept[org.apache.spark.SparkException](wh.load(bad))
    assert(e.getMessage != null)
  }

  test("storeInvalid through AnsiMergeDialect (MERGE) gives the same result") {
    val (wh, name) = freshWh(dialect = AnsiMergeDialect)
    import spark.implicits._
    def invalid(err: String) =
      Seq((Timestamp.valueOf("2022-05-01 03:00:00"), 5L, 9L, err, "f.csv", Timestamp.valueOf("2022-05-02 10:00:00")))
        .toDF("datetime", "impression_count", "click_count", "validation_error", "source_file", "audit_loaded_datetime")
    wh.storeInvalid(invalid("first"))
    wh.storeInvalid(invalid("merged"))
    val t = FakeJdbc.db(name).table("client_report_invalid")
    assert(t.allRows.size === 1)
    assert(t.allRows.head(t.cols.indexOf("validation_error")) === "merged")
  }

  test("dialect SQL text: Postgres ON CONFLICT vs ANSI MERGE, shared bind order") {
    val cols = Seq("datetime", "v", "source_file")
    val keys = Seq("datetime", "source_file")
    val pg = PostgresDialect.upsertSql("s", "t", cols, keys)
    assert(pg.contains("ON CONFLICT (\"datetime\", \"source_file\") DO UPDATE SET \"v\" = EXCLUDED.\"v\""))
    val merge = AnsiMergeDialect.upsertSql("s", "t", cols, keys)
    assert(merge.contains("MERGE INTO \"s\".\"t\" t USING (VALUES (?, ?, ?))"))
    assert(merge.contains("WHEN MATCHED THEN UPDATE SET t.\"v\" = s.\"v\""))
    assert(merge.contains("WHEN NOT MATCHED THEN INSERT"))
    // identical ?-count and therefore bind order for the shared writer
    assert(pg.count(_ == '?') === merge.count(_ == '?'))
  }

  test("pipeline end-to-end into the JDBC sink: golden counts land in client_report") {
    val in = java.nio.file.Files.createTempDirectory("jdbc_in")
    val out = java.nio.file.Files.createTempDirectory("jdbc_out")
    val (wh, name) = freshWh()
    Fixtures.goldenScenario(spark, in)

    val result = Pipeline.run(spark, in.toString, out.toString, wh, Fixtures.UA, deleteInputs = true)
    assert(result.success && result.processedDates.map(_.date) === Seq("2022-05-27"))
    assert(result.warehouseSummary("row_count") === 24L)
    assert(result.warehouseSummary("total_impressions") === 10L)
    assert(result.warehouseSummary("total_clicks") === 30L)
    val t = FakeJdbc.db(name).table("client_report")
    assert(t.allRows.size === 24, "dense 24-hour report loaded through the SQL path")
  }

  test("JDBC and parquet warehouses agree on the same load sequence") {
    val (jdbc, name) = freshWh()
    val whDir = java.nio.file.Files.createTempDirectory("wh_parity").toString
    val parquet = new ParquetWarehouse(spark, whDir)

    val loads = Seq(
      reportDf(Seq(("2022-05-01", 0, 1L, 1L), ("2022-05-01", 1, 2L, 2L), ("2022-05-02", 0, 3L, 3L))),
      reportDf(Seq(("2022-05-01", 0, 9L, 9L), ("2022-05-01", 1, 8L, 8L)))
    )
    loads.foreach { df =>
      // one shared prepared frame per load: audit stamps must match across sinks
      val prepared = ParquetWarehouse.prepare(df).localCheckpoint()
      jdbc.load(prepared)
      parquet.load(prepared)
    }

    def key(ts: Any, imp: Any, clk: Any) = (ts.toString, imp.asInstanceOf[Long], clk.asInstanceOf[Long])
    val t = FakeJdbc.db(name).table("client_report")
    val fromJdbc = t.allRows.map(r => key(r(0), r(1), r(2))).sortBy(_.toString)
    val fromParquet = parquet
      .readTable(ParquetWarehouse.ClientReport)
      .get
      .collect()
      .map(r => key(r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.toString)
      .toSeq
    assert(fromJdbc === fromParquet)

    val a = FakeJdbc.db(name).table("client_report_archive")
    val archJdbc = a.allRows.map(r => key(r(0), r(1), r(2))).sortBy(_.toString)
    val archParquet = parquet
      .readTable(ParquetWarehouse.ClientReportArchive)
      .get
      .collect()
      .map(r => key(r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.toString)
      .toSeq
    assert(archJdbc === archParquet)
  }
}
