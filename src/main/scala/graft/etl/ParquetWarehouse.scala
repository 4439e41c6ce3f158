package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse load semantics (SURVEY §2.1 S10-S13, §2.3 J2-J3, §3.2)
  * re-expressed Spark-first over parquet tables.
  *
  * The reference loads into Postgres with: archive overlapped rows
  * (`NOT EXISTS` anti-join, `warehouse.py:427-443`) → `DELETE` the incoming
  * [min,max] datetime range (`:448-455`) → bulk insert (`:458-466`) → verify
  * counts (`:469-473`), all inside one transaction; invalid rows go through a
  * staging table + `ON CONFLICT (datetime, source_file) DO UPDATE` upsert
  * (`:258-329`).
  *
  * This container ships no SQL JDBC driver (only hive-jdbc), so the same
  * semantics run against parquet directories:
  *   - transaction  → stage-then-atomic-swap: each table version is fully
  *     written to `<table>.staging`, then moved over `<table>` — readers see
  *     old or new, never partial. (On HDFS/S3 this becomes a rename/commit;
  *     with a real JDBC sink the seam is `load()` below — swap the writer,
  *     keep the plan.)
  *   - DELETE range → filter NOT BETWEEN on rewrite (range, not per-date —
  *     preserving the reference's min..max semantics, SURVEY §7.4.6).
  *   - archive anti-join → left_anti on datetime, append.
  *   - upsert       → union + row_number over (datetime, source_file) keeping
  *     the newest audit timestamp.
  *
  * Scale notes: report tables are hour-grained aggregates (tiny relative to
  * raw events), so full-rewrite-on-load is proportional to the table, not the
  * raw data. At true warehouse scale the same logical plan lands on a
  * transactional table format (Delta/Iceberg MERGE) — the operators here
  * (anti-join, range filter, keyed last-writer-wins) are exactly the ones
  * those formats execute.
  */
class ParquetWarehouse(spark: SparkSession, baseDir: String) extends WarehouseSink {

  import ParquetWarehouse._

  override def loadPrepared(prepared: DataFrame): Long = load(prepared).rowsLoaded
  override def storeInvalidRows(invalid: DataFrame): Unit = { storeInvalid(invalid); () }

  private def tableDir(name: String): Path = Paths.get(baseDir, name)

  def readTable(name: String): Option[DataFrame] = {
    val dir = tableDir(name)
    if (Files.isDirectory(dir)) Some(spark.read.parquet(dir.toString)) else None
  }

  /** Stage-then-swap write: the "transaction commit" of this sink. The old
    * version is moved aside (not deleted) before the staging move, so the
    * window where no table directory exists is two renames wide and a crash
    * inside it leaves both `.old` and `.staging` for manual recovery —
    * never zero copies of the data.
    */
  private def writeTable(df: DataFrame, name: String): Unit = {
    val staging = Paths.get(baseDir, s"$name.staging")
    val old = Paths.get(baseDir, s"$name.old")
    val target = tableDir(name)
    // materialize BEFORE touching the target (df may read from the target)
    val snapshot = df.collectResult()
    deleteRecursively(staging)
    snapshot.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    deleteRecursively(old)
    if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Prepare a report frame for load (reference `warehouse.py:331-389`):
    * datetime key = date + hour:00:00, counts cast long, audit stamp.
    */
  def prepare(report: DataFrame): DataFrame = ParquetWarehouse.prepare(report)

  final case class LoadReport(
      rowsLoaded: Long,
      rowsArchived: Long,
      minDatetime: java.sql.Timestamp,
      maxDatetime: java.sql.Timestamp,
      totalImpressions: Long,
      totalClicks: Long
  )

  /** Archive → delete range → insert → verify (one logical transaction). */
  def load(prepared: DataFrame): LoadReport = {
    val bounds = prepared.agg(min(col("datetime")), max(col("datetime"))).collect().head
    require(!bounds.isNullAt(0), "cannot load an empty report")
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))

    val existing = readTable(ClientReport)
    val overlapped = existing
      .map(_.filter(col("datetime").between(lo, hi)))
      .getOrElse(prepared.limit(0))

    // archive rows not already archived (anti-join on the key; J2)
    val archived = readTable(ClientReportArchive) match {
      case Some(arch) =>
        val fresh = overlapped.join(arch.select("datetime"), Seq("datetime"), "left_anti")
        val n = fresh.count()
        if (n > 0) writeTable(arch.unionByName(fresh), ClientReportArchive)
        n
      case None =>
        val n = overlapped.count()
        if (n > 0) writeTable(overlapped, ClientReportArchive)
        n
    }

    // delete range + insert, as one rewritten version
    val retained = existing.map(_.filter(!col("datetime").between(lo, hi)))
    val next = retained.map(_.unionByName(prepared)).getOrElse(prepared)
    writeTable(next, ClientReport)

    val stats = readTable(ClientReport).get
      .filter(col("datetime").between(lo, hi))
      .agg(
        count(lit(1)),
        coalesce(sum(col("impression_count")), lit(0L)),
        coalesce(sum(col("click_count")), lit(0L))
      )
      .collect()
      .head
    LoadReport(stats.getLong(0), archived, lo, hi, stats.getLong(1), stats.getLong(2))
  }

  /** Quarantine upsert keyed on (datetime, source_file), last writer (by
    * audit timestamp) wins — the reference's staged `ON CONFLICT DO UPDATE`
    * (`warehouse.py:258-329`).
    */
  def storeInvalid(invalid: DataFrame): Long = {
    if (invalid.isEmpty) return 0L
    val incoming = ParquetWarehouse.shapeInvalid(invalid)
    val all = readTable(ClientReportInvalid) match {
      // allowMissingColumns: tables written before the counts were carried
      // read back with nulls in the new columns rather than failing.
      case Some(existing) => existing.unionByName(incoming, allowMissingColumns = true)
      case None           => incoming
    }
    // Upsert on (datetime, source_file), last writer by audit ts — but ONLY
    // for non-null keys: SQL ON CONFLICT never fires on NULLs (Postgres
    // treats them as distinct), so null-datetime quarantine rows (e.g.
    // unparseable hours) accumulate rather than collapsing to one.
    val w = Window
      .partitionBy(col("datetime"), col("source_file"))
      .orderBy(col("audit_loaded_datetime").desc)
    val keyed = all
      .filter(col("datetime").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val merged = keyed.unionByName(all.filter(col("datetime").isNull))
    writeTable(merged, ClientReportInvalid)
    readTable(ClientReportInvalid).get.count()
  }

  /** Load verification summary (reference `warehouse.py:487-531`). */
  def verify(): Map[String, Any] =
    readTable(ClientReport) match {
      case None => Map("row_count" -> 0L)
      case Some(df) =>
        val r = df
          .agg(
            count(lit(1)),
            min(col("datetime")),
            max(col("datetime")),
            coalesce(sum(col("impression_count")), lit(0L)),
            coalesce(sum(col("click_count")), lit(0L))
          )
          .collect()
          .head
        Map(
          "row_count" -> r.getLong(0),
          "min_datetime" -> r.get(1),
          "max_datetime" -> r.get(2),
          "total_impressions" -> r.getLong(3),
          "total_clicks" -> r.getLong(4)
        )
    }
}

object ParquetWarehouse {
  val ClientReport = "client_report"
  val ClientReportArchive = "client_report_archive"
  val ClientReportInvalid = "client_report_invalid"

  /** Prepare a report frame for load (reference `warehouse.py:331-389`):
    * datetime key = date + hour:00:00, counts cast long, audit stamp.
    * Shared by the parquet and JDBC sinks — the load plan is identical,
    * only the writer differs.
    */
  def prepare(report: DataFrame): DataFrame =
    report
      .withColumn(
        "datetime",
        to_timestamp(concat(col("date"), lit(" "), lpad(col("hour").cast("string"), 2, "0")), "yyyy-MM-dd HH")
      )
      .withColumn("impression_count", col("impression_count").cast("long"))
      .withColumn("click_count", col("click_count").cast("long"))
      .withColumn("audit_loaded_datetime", current_timestamp())
      .select(col("datetime"), col("impression_count"), col("click_count"), col("audit_loaded_datetime"))
      .orderBy(col("datetime"))

  /** Canonical quarantine frame, shared by both sinks (the reference's
    * client_report_invalid shape, `warehouse.py:67-76`): the offending
    * counts ride along so a quarantined row stays auditable — you can see
    * WHY it was rejected. Structural-failure quarantines (V1: the column
    * itself is missing) carry null counts instead.
    */
  def shapeInvalid(invalid: DataFrame): DataFrame = {
    def countCol(name: String) =
      if (invalid.columns.contains(name)) col(name).cast("long").as(name)
      else lit(null).cast("long").as(name)
    invalid.select(
      col("datetime"),
      countCol("impression_count"),
      countCol("click_count"),
      col("audit_loaded_datetime"),
      col("validation_error"),
      col("source_file")
    )
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  /** Pin a DataFrame's current contents so a table rewrite can read from the
    * table it is about to replace: localCheckpoint materializes the rows on
    * the executors and cuts the lineage back to the source files.
    */
  implicit private[etl] class Snapshot(private val df: DataFrame) extends AnyVal {
    def collectResult(): DataFrame = df.localCheckpoint(eager = true)
  }
}
