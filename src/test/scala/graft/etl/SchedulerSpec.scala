package graft.etl

import java.nio.file.Files
import java.time.{Duration, LocalDateTime}

import graft.SparkSpec

/** Scheduler parity with the reference's cron layer
  * (`docker/cron/schedules.py`, `setup-cron.sh`): environment → cadence
  * mapping, 5-field cron evaluation, and the re-ticking loop driving the
  * REAL pipeline + warehouse across multiple fires on a virtual clock —
  * L1/T1 as "the loop", not one tick.
  */
class SchedulerSpec extends SparkSpec {

  import Scheduler._

  test("environment → schedule mapping matches the reference (unknown → testing)") {
    assert(schedule("testing") === "* * * * *")
    assert(schedule("development") === "*/5 * * * *")
    assert(schedule("production") === "0 */6 * * *")
    assert(schedule("staging") === "* * * * *", "get_schedule defaults to TESTING_SCHEDULE")
  }

  test("cron evaluation: the three reference cadences fire when cron would") {
    val t0 = LocalDateTime.of(2022, 5, 27, 11, 7)
    assert(parse("* * * * *").nextAfter(t0) === t0.plusMinutes(1))
    assert(parse("*/5 * * * *").nextAfter(t0) === LocalDateTime.of(2022, 5, 27, 11, 10))
    assert(parse("0 */6 * * *").nextAfter(t0) === LocalDateTime.of(2022, 5, 27, 12, 0))
    // production fires exactly at 00/06/12/18 (reference comment)
    val fires = Iterator
      .iterate(LocalDateTime.of(2022, 5, 27, 0, 0))(parse("0 */6 * * *").nextAfter)
      .drop(1)
      .take(4)
      .toSeq
    assert(fires.map(_.getHour) === Seq(6, 12, 18, 0))
    assert(fires.forall(_.getMinute == 0))
  }

  test("cron field vocabulary: lists, ranges, steps, Sunday as 0 and 7") {
    assert(parseField("1,15,30", 0, 59) === Set(1, 15, 30))
    assert(parseField("9-17", 0, 23) === (9 to 17).toSet)
    assert(parseField("10-20/5", 0, 59) === Set(10, 15, 20))
    val sundays = parse("0 0 * * 7")
    assert(sundays.matches(LocalDateTime.of(2022, 5, 29, 0, 0)), "2022-05-29 is a Sunday")
    assert(parse("0 0 * * 0").matches(LocalDateTime.of(2022, 5, 29, 0, 0)))
    intercept[IllegalArgumentException](parse("61 * * * *"))
    intercept[IllegalArgumentException](parse("* * * *"))
  }

  test("*/n day fields are unrestricted: AND-semantics, not the dom/dow OR rule (Vixie)") {
    // '*/2' starts with '*' → unrestricted; dow '1' restricted → plain AND:
    // fires only on Mondays whose day-of-month is odd
    val c = parse("0 0 */2 * 1")
    assert(!c.matches(LocalDateTime.of(2022, 5, 3, 0, 0)), "Tue May 3 (odd dom) must not fire")
    assert(!c.matches(LocalDateTime.of(2022, 5, 2, 0, 0)), "Mon May 2 (even dom) must not fire")
    assert(c.matches(LocalDateTime.of(2022, 5, 9, 0, 0)), "Mon May 9 (odd dom) fires")
    // both fields literally restricted → standard OR still applies
    val or = c.copy(domRestricted = true)
    assert(or.matches(LocalDateTime.of(2022, 5, 3, 0, 0)), "restricted dom OR dow fires on odd Tue")
  }

  test("loop re-ticks the full pipeline: two fires, two warehouse loads") {
    val in = Files.createTempDirectory("cron_in")
    val out = Files.createTempDirectory("cron_out")
    val wh = Files.createTempDirectory("cron_wh")

    // virtual clock: sleep() advances time instead of blocking
    var clock = LocalDateTime.of(2022, 5, 27, 11, 0, 30)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    def now() = clock
    def sleep(d: Duration): Unit = { sleeps += d.toMillis; clock = clock.plus(d) }

    // first tick sees day 1, second tick sees day 2 (dropped mid-loop,
    // like a new raw file landing between cron fires)
    Fixtures.writeEventFile(spark, in, "impressions", "20220527", 12, 10)
    Fixtures.writeEventFile(spark, in, "clicks", "20220527", 12, 20)

    val processed = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val ticks = Scheduler.loop(parse("* * * * *"), now _, sleep, maxTicks = Some(2)) { fireAt =>
      assert(fireAt.getSecond === 0, "fires on the minute")
      val r = Pipeline.run(spark, in.toString, out.toString, wh.toString, Fixtures.UA)
      processed += r.processedDates.map(_.date)
      if (processed.size == 1) {
        Fixtures.writeEventFile(spark, in, "impressions", "20220528", 9, 7)
      }
      true
    }

    assert(ticks === 2)
    assert(sleeps.head === 30000L, "first sleep lands on the next minute boundary")
    assert(processed.toSeq === Seq(Seq("2022-05-27"), Seq("2022-05-28")))
    // both ticks loaded the warehouse: both dates present
    val report = new ParquetWarehouse(spark, wh.toString)
      .readTable(ParquetWarehouse.ClientReport)
      .get
    val dates = report.select(org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("datetime")))
      .distinct()
      .collect()
      .map(_.get(0).toString)
      .sorted
    assert(dates === Array("2022-05-27", "2022-05-28"))
    // consume-once across ticks: inputs were drained
    assert(FileRouter.listParquet(in.toString).isEmpty)
  }

  test("loop through the JDBC sink: late re-delivery archives, replaces, re-upserts quarantine") {
    // reference semantics (`src/Task2/warehouse.py:422-466`): a cron tick
    // that sees an already-loaded date must archive the overlapped rows,
    // delete the range, and re-insert — here driven across TWO virtual-clock
    // fires with the SQL warehouse (FakeJdbc) instead of the parquet sink.
    val in = Files.createTempDirectory("cronj_in")
    val out = Files.createTempDirectory("cronj_out")
    val dbName = "cron_jdbc_db"
    FakeJdbc.drop(dbName)
    val wh = new JdbcWarehouse(FakeJdbc.factory(dbName), PostgresDialect)
    wh.ensureSchema()

    var clock = LocalDateTime.of(2022, 5, 27, 11, 0, 30)
    def now() = clock
    def sleep(d: Duration): Unit = clock = clock.plus(d)

    Fixtures.goldenScenario(spark, in)

    val results = scala.collection.mutable.ArrayBuffer[Pipeline.RunResult]()
    val ticks = Scheduler.loop(parse("* * * * *"), now _, sleep, maxTicks = Some(2)) { _ =>
      val r = Pipeline.run(spark, in.toString, out.toString, wh, Fixtures.UA, deleteInputs = true)
      results += r
      if (results.size == 1) {
        // LATE DATA between fires: the same date's files re-delivered
        // (identical names — the consume-once delete emptied the inbox)
        Fixtures.goldenScenario(spark, in)
      }
      true
    }

    assert(ticks === 2)
    assert(results.forall(_.success))
    assert(results.map(_.processedDates.map(_.date)) === Seq(Seq("2022-05-27"), Seq("2022-05-27")))

    val d = FakeJdbc.db(dbName)
    // the second fire replaced the live rows and archived the first fire's
    // 24 dense hours through the SQL anti-join
    assert(d.table("client_report").allRows.size === 24)
    assert(d.table("client_report_archive").allRows.size === 24)
    // both fires report the same totals (same data re-delivered)
    assert(results.map(_.warehouseSummary("total_impressions")) === Seq(10L, 10L))
    assert(results.map(_.warehouseSummary("total_clicks")) === Seq(30L, 30L))

    // quarantine flowed through the SQL upsert on BOTH ticks: the re-upsert
    // on (datetime, source_file) last-writer-wins instead of duplicating
    assert(results.forall(_.quarantinedRows >= 1))
    val inv = d.table("client_report_invalid")
    val rows = inv.allRows
    assert(rows.nonEmpty)
    val dtIdx = inv.cols.indexOf("datetime")
    val sfIdx = inv.cols.indexOf("source_file")
    val keys = rows.map(r => (r(dtIdx), r(sfIdx)))
    assert(keys.distinct.length === keys.length, "late re-delivery duplicated quarantine rows")
  }

  test("loop stops when the tick callback returns false") {
    var clock = LocalDateTime.of(2022, 1, 1, 0, 0)
    val n = Scheduler.loop(
      parse("* * * * *"),
      () => clock,
      d => clock = clock.plus(d),
      maxTicks = Some(100)
    )(_ => false)
    assert(n === 1)
  }
}
