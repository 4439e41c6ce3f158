package graft.etl

import java.sql.{Connection, PreparedStatement, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** SQL-warehouse loader: the reference's Task 2 load path
  * (`src/Task2/warehouse.py`) executed through `java.sql` with the
  * statement text supplied by a [[SqlDialect]].
  *
  * Flow per load (reference `load_data`, `warehouse.py:391-485`):
  *   1. bounds    — one O(1) driver aggregate for the [min, max] datetime.
  *   2. archive   — `INSERT .. SELECT .. NOT EXISTS` anti-join INSIDE the
  *                  warehouse (`:427-443`); no report data moves through
  *                  Spark for this step.
  *   3. delete    — range delete (`:448-455`), same transaction as 2.
  *   4. insert    — the distributed part: `foreachPartition`, one
  *                  connection per partition, `PreparedStatement` batches
  *                  of `batchSize` (the reference's `chunksize=1000`
  *                  single-process equivalent).
  *   5. verify    — one-row count/min/max/sum aggregate (`:487-531`).
  *
  * Transaction semantics, honestly stated: the reference wraps 2-4 in ONE
  * connection's transaction — possible only because pandas is a single
  * process. A thousand executors cannot share a SQL transaction, so the
  * distributed insert commits per partition and crash-safety comes from
  * idempotence instead: re-running the load repeats the delete-range and
  * re-inserts the same rows (same result), and `storeInvalid` is a keyed
  * upsert (naturally idempotent). A mid-job crash can leave a partially
  * loaded range visible until the retry — the price of parallel load into
  * an engine without distributed transactions; for exactly-once visibility
  * the same writer targets a staging table swapped by rename (see
  * [[ParquetWarehouse]]'s stage-then-swap, which is that pattern on files).
  * INTRA-job idempotence holds too: both distributed writes are keyed
  * upserts, so a task retry / speculative duplicate of an
  * already-committed partition rewrites identical rows instead of raising
  * duplicate-key.
  *
  * The connection factory is shipped to executors — it must be
  * `Serializable` and open a NEW connection per call (e.g.
  * `() => DriverManager.getConnection(url)`; pooling happens warehouse-side
  * or via a per-JVM lazy singleton, as with any Spark JDBC sink).
  */
class JdbcWarehouse(
    connect: JdbcWarehouse.ConnectionFactory,
    dialect: SqlDialect,
    schema: String = "adform_dw",
    batchSize: Int = 1000
) extends WarehouseSink
    with Serializable {

  override def loadPrepared(prepared: DataFrame): Long = load(prepared).rowsLoaded
  override def storeInvalidRows(invalid: DataFrame): Unit = storeInvalid(invalid)

  import JdbcWarehouse._
  import ParquetWarehouse.{ClientReport, ClientReportArchive, ClientReportInvalid}

  /** DDL bootstrap (reference `_ensure_schema`, `warehouse.py:40-90`):
    * schema, the three tables, and the datetime index, all IF NOT EXISTS.
    * Closes SURVEY §2.1 S13 through the SQL path.
    */
  def ensureSchema(): Unit = withConnection(connect) { conn =>
    val stmts =
      Seq(dialect.createSchemaSql(schema)) ++
        Seq(ClientReport, ClientReportArchive).map { t =>
          dialect.createTableSql(schema, t, ReportCols, primaryKey = Seq("datetime"))
        } :+
        // NO primary key on the quarantine table: the pipeline legitimately
        // produces NULL-datetime quarantine rows (unparseable date/hour —
        // that is WHY they are quarantined), which a NOT NULL PK would
        // reject. A unique index anchors the (datetime, source_file) upsert
        // and lets NULL-keyed rows accumulate, matching the parquet sink.
        // (The reference's NOT NULL DDL, warehouse.py:67-76, would fail on
        // these rows — a latent bug this sink does not reproduce.)
        dialect.createTableSql(schema, ClientReportInvalid, InvalidCols, primaryKey = Nil) :+
        dialect.createUniqueIndexSql(
          schema,
          ClientReportInvalid,
          "uq_client_report_invalid_key",
          Seq("datetime", "source_file")
        ) :+
        dialect.createIndexSql(schema, ClientReport, "idx_client_report_datetime", Seq("datetime"))
    stmts.foreach { sql =>
      val st = conn.createStatement()
      try st.execute(sql)
      finally st.close()
    }
  }

  final case class LoadReport(
      rowsLoaded: Long,
      rowsArchived: Long,
      minDatetime: Timestamp,
      maxDatetime: Timestamp,
      totalImpressions: Long,
      totalClicks: Long
  )

  /** Archive → delete range → distributed chunked insert → verify.
    * `prepared` must have the [[ParquetWarehouse.prepare]] shape:
    * (datetime, impression_count, click_count, audit_loaded_datetime).
    */
  def load(prepared: DataFrame): LoadReport = {
    val bounds = prepared
      .agg(min(col("datetime")), max(col("datetime")), count(col("datetime")), count_distinct(col("datetime")))
      .collect()
      .head
    require(!bounds.isNullAt(0), "cannot load an empty report")
    // The insert below is an upsert keyed on datetime (for task-retry
    // idempotence) — which would silently collapse duplicate datetimes
    // WITHIN one prepared frame to a partition-order last-writer. prepare()
    // is row-wise (no aggregation), so an upstream bug CAN produce
    // duplicates; fail loudly here instead of masking it, same signal the
    // old plain INSERT gave via the PK. One extra column in the aggregate
    // already being computed — no extra pass. (Non-null count vs distinct:
    // NULL keys are a different bug, left to the engine's NOT NULL.)
    require(
      bounds.getLong(2) == bounds.getLong(3),
      s"duplicate datetime keys in prepared frame (${bounds.getLong(2)} keyed rows, " +
        s"${bounds.getLong(3)} distinct datetimes): upstream must aggregate before load"
    )
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))

    // steps 2+3 in one driver-side transaction, as the reference does
    val archived = withConnection(connect) { conn =>
      conn.setAutoCommit(false)
      val n =
        try {
          val arch = conn.prepareStatement(
            dialect.archiveRangeSql(schema, ClientReport, ClientReportArchive, ReportColNames, "datetime")
          )
          val a =
            try { arch.setTimestamp(1, lo); arch.setTimestamp(2, hi); arch.executeUpdate() }
            finally arch.close()
          val del = conn.prepareStatement(dialect.deleteRangeSql(schema, ClientReport, "datetime"))
          try { del.setTimestamp(1, lo); del.setTimestamp(2, hi); del.executeUpdate() }
          finally del.close()
          conn.commit()
          a
        } catch {
          case e: Throwable => conn.rollback(); throw e
        }
      n.toLong
    }

    // step 4: the distributed insert — as an UPSERT keyed on the PK, not a
    // plain INSERT: a task retry or speculative re-execution of a partition
    // whose commit already landed would otherwise raise duplicate-key and
    // fail every retry of that task (the whole job) on a routine transient
    // failure. The range was deleted in step 3, so for first execution the
    // upsert IS an insert; re-executions overwrite identical rows.
    batchExecute(
      prepared.select(ReportColNames.map(col): _*),
      dialect.upsertSql(schema, ClientReport, ReportColNames, Seq("datetime"))
    )

    // step 5: verify the loaded range
    val stats = withConnection(connect) { conn =>
      val ps = conn.prepareStatement(dialect.verifySql(schema, ClientReport, "datetime", ranged = true))
      try {
        ps.setTimestamp(1, lo); ps.setTimestamp(2, hi)
        val rs = ps.executeQuery()
        try { rs.next(); (rs.getLong(1), rs.getLong(4), rs.getLong(5)) }
        finally rs.close()
      } finally ps.close()
    }
    LoadReport(stats._1, archived, lo, hi, stats._2, stats._3)
  }

  /** Quarantine upsert on (datetime, source_file) (reference
    * `store_invalid_records`, `warehouse.py:258-329`) — executed as
    * parameterized keyed upserts batched from executors. The reference's
    * staging-table hop exists only because pandas `to_sql` cannot upsert;
    * with a `PreparedStatement` the `ON CONFLICT`/`MERGE` form IS the
    * batch unit, so the load is one round-trip per `batchSize` rows and
    * naturally idempotent under task retry.
    */
  def storeInvalid(invalid: DataFrame): Unit = {
    if (invalid.isEmpty) return
    val shaped = ParquetWarehouse.shapeInvalid(invalid)
    batchExecute(shaped, dialect.upsertSql(schema, ClientReportInvalid, InvalidColNames, Seq("datetime", "source_file")))
  }

  /** Load verification summary (reference `verify_load`,
    * `warehouse.py:487-531`).
    */
  def verify(): Map[String, Any] = withConnection(connect) { conn =>
    val ps = conn.prepareStatement(dialect.verifySql(schema, ClientReport, "datetime", ranged = false))
    try {
      val rs = ps.executeQuery()
      try {
        rs.next()
        Map(
          "row_count" -> rs.getLong(1),
          "min_datetime" -> rs.getTimestamp(2),
          "max_datetime" -> rs.getTimestamp(3),
          "total_impressions" -> rs.getLong(4),
          "total_clicks" -> rs.getLong(5)
        )
      } finally rs.close()
    } finally ps.close()
  }

  /** The distributed writer: per partition open one connection, bind rows
    * positionally, flush in `executeBatch` chunks of `batchSize`, commit
    * once per partition. Connections never cross task boundaries; nothing
    * is collected to the driver.
    */
  private def batchExecute(df: DataFrame, sql: String): Unit = {
    val cf = connect
    val bs = batchSize
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = cf()
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { r =>
              bindRow(ps, r)
              ps.addBatch()
              pending += 1
              if (pending == bs) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally ps.close()
        } finally conn.close()
      }
    }
  }
}

object JdbcWarehouse {

  /** `Serializable` connection opener — the executor-side seam. */
  trait ConnectionFactory extends Serializable {
    def apply(): Connection
  }

  /** DriverManager-backed factory — serializable by VALUE (url +
    * credentials travel to executors; each call opens a fresh connection).
    * Requires the matching JDBC driver jar on the classpath (e.g. the
    * public org.postgresql:postgresql jar in /opt/spark/jars);
    * DriverManager's "No suitable driver" error is the diagnostic when it
    * is absent.
    */
  final case class DriverManagerFactory(url: String, user: String, password: String)
      extends ConnectionFactory {
    override def apply(): Connection =
      java.sql.DriverManager.getConnection(url, user, password)
  }

  private[etl] val ReportCols: Seq[(String, String, Boolean)] = Seq(
    ("datetime", "TIMESTAMP", true),
    ("impression_count", "BIGINT", true),
    ("click_count", "BIGINT", true),
    ("audit_loaded_datetime", "TIMESTAMP", true)
  )
  private[etl] val ReportColNames: Seq[String] = ReportCols.map(_._1)

  private[etl] val InvalidCols: Seq[(String, String, Boolean)] = Seq(
    ("datetime", "TIMESTAMP", false), // nullable: unparseable-key quarantines
    ("impression_count", "BIGINT", false),
    ("click_count", "BIGINT", false),
    ("audit_loaded_datetime", "TIMESTAMP", true),
    ("validation_error", "TEXT", true),
    ("source_file", "TEXT", true)
  )
  private[etl] val InvalidColNames: Seq[String] = InvalidCols.map(_._1)

  private def withConnection[A](cf: ConnectionFactory)(f: Connection => A): A = {
    val conn = cf()
    try f(conn)
    finally conn.close()
  }

  /** Positional bind of a Row's values; `setObject(null)` degrades to
    * `setNull` on conforming drivers, but be explicit for the strict ones.
    */
  private def bindRow(ps: PreparedStatement, r: Row): Unit = {
    var i = 0
    while (i < r.length) {
      if (r.isNullAt(i)) ps.setNull(i + 1, java.sql.Types.NULL)
      else ps.setObject(i + 1, r.get(i))
      i += 1
    }
  }
}
