package graft.etl

/** SQL dialect seam for the JDBC warehouse writer (SURVEY §7.3).
  *
  * The reference hard-codes Postgres SQL inside the loader
  * (`src/Task2/warehouse.py:44-90` DDL, `:427-466` archive/delete/insert,
  * `:293-320` `ON CONFLICT` upsert) and swaps the whole engine to SQLite in
  * tests (`tests/test_client_report_etl.py:48`). Here the statement text is
  * the ONLY per-engine piece: [[JdbcWarehouse]] talks `java.sql` and asks the
  * dialect for strings, so pointing the loader at a different warehouse is a
  * dialect object, not a rewrite.
  *
  * All generators take explicit column/key lists — nothing is reflected from
  * a live catalog, so the SQL is deterministic and unit-testable without a
  * connection.
  */
trait SqlDialect extends Serializable {

  /** Quote an identifier (ANSI double-quote by default). */
  def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  def qualify(schema: String, table: String): String = s"${quote(schema)}.${quote(table)}"

  /** Schema bootstrap (reference `warehouse.py:45`). */
  def createSchemaSql(schema: String): String =
    s"CREATE SCHEMA IF NOT EXISTS ${quote(schema)}"

  /** `CREATE TABLE IF NOT EXISTS` with typed columns and a primary key
    * (reference `warehouse.py:48-76`). `cols` are (name, sqlType, notNull).
    */
  def createTableSql(
      schema: String,
      table: String,
      cols: Seq[(String, String, Boolean)],
      primaryKey: Seq[String]
  ): String = {
    val colDefs = cols.map { case (n, t, nn) => s"${quote(n)} $t${if (nn) " NOT NULL" else ""}" }
    val pk = if (primaryKey.nonEmpty) Seq(s"PRIMARY KEY (${primaryKey.map(quote).mkString(", ")})") else Nil
    s"CREATE TABLE IF NOT EXISTS ${qualify(schema, table)} (${(colDefs ++ pk).mkString(", ")})"
  }

  /** Secondary index (reference `warehouse.py:79-82`). */
  def createIndexSql(schema: String, table: String, indexName: String, cols: Seq[String]): String =
    s"CREATE INDEX IF NOT EXISTS ${quote(indexName)} ON ${qualify(schema, table)} (${cols.map(quote).mkString(", ")})"

  /** Unique index — the upsert target for tables whose key may contain
    * NULL: a PRIMARY KEY would reject NULLs outright, while a unique index
    * lets NULL-keyed rows accumulate (SQL treats NULLs as distinct) and
    * still anchors `ON CONFLICT`/`MERGE` for fully-non-null keys.
    */
  def createUniqueIndexSql(schema: String, table: String, indexName: String, cols: Seq[String]): String =
    s"CREATE UNIQUE INDEX IF NOT EXISTS ${quote(indexName)} ON ${qualify(schema, table)} (${cols.map(quote).mkString(", ")})"

  /** Plain parameterized insert — the unit of the chunked batch append
    * (reference `prepared_df.to_sql(..., method='multi', chunksize=1000)`,
    * `warehouse.py:458-466`).
    */
  def insertSql(schema: String, table: String, cols: Seq[String]): String =
    s"INSERT INTO ${qualify(schema, table)} (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"

  /** Parameterized keyed upsert: insert-or-update on `keys`, updating every
    * non-key column (reference `ON CONFLICT (datetime, source_file) DO
    * UPDATE`, `warehouse.py:293-316`). Engine-specific — no ANSI default.
    */
  def upsertSql(schema: String, table: String, cols: Seq[String], keys: Seq[String]): String

  /** Delete the closed datetime range `[?, ?]` (reference
    * `warehouse.py:448-455`).
    */
  def deleteRangeSql(schema: String, table: String, tsCol: String): String =
    s"DELETE FROM ${qualify(schema, table)} WHERE ${quote(tsCol)} BETWEEN ? AND ?"

  /** Archive rows in the range that are not already archived — the
    * `INSERT .. SELECT .. WHERE NOT EXISTS` anti-join, entirely inside the
    * warehouse engine (reference `warehouse.py:427-443`). Parameters: the
    * [min, max] datetime bounds.
    */
  def archiveRangeSql(
      schema: String,
      from: String,
      to: String,
      cols: Seq[String],
      tsCol: String
  ): String = {
    val colList = cols.map(quote).mkString(", ")
    val srcCols = cols.map(c => s"src.${quote(c)}").mkString(", ")
    s"""INSERT INTO ${qualify(schema, to)} ($colList)
       |SELECT $srcCols FROM ${qualify(schema, from)} src
       |WHERE src.${quote(tsCol)} BETWEEN ? AND ?
       |AND NOT EXISTS (SELECT 1 FROM ${qualify(schema, to)} dst WHERE dst.${quote(tsCol)} = src.${quote(tsCol)})""".stripMargin
  }

  /** One-row load-verification aggregate over an optional closed range
    * (reference `verify_load`, `warehouse.py:487-531`): count, min/max
    * datetime, impression/click sums.
    */
  def verifySql(schema: String, table: String, tsCol: String, ranged: Boolean): String = {
    val base =
      s"SELECT COUNT(*), MIN(${quote(tsCol)}), MAX(${quote(tsCol)}), " +
        s"COALESCE(SUM(${quote("impression_count")}), 0), COALESCE(SUM(${quote("click_count")}), 0) " +
        s"FROM ${qualify(schema, table)}"
    if (ranged) s"$base WHERE ${quote(tsCol)} BETWEEN ? AND ?" else base
  }
}

/** Postgres: native `INSERT .. ON CONFLICT .. DO UPDATE` upsert — the
  * statement the reference runs (`warehouse.py:293-316`), minus its staging
  * table: a parameterized upsert batches straight from executors, the
  * staging hop existed only because pandas `to_sql` cannot upsert.
  */
object PostgresDialect extends SqlDialect {
  override def upsertSql(schema: String, table: String, cols: Seq[String], keys: Seq[String]): String = {
    val updates = cols.filterNot(keys.contains).map(c => s"${quote(c)} = EXCLUDED.${quote(c)}")
    insertSql(schema, table, cols) +
      s" ON CONFLICT (${keys.map(quote).mkString(", ")}) DO UPDATE SET ${updates.mkString(", ")}"
  }
}

/** `MERGE` keyed on a one-row `VALUES` source, for MERGE-capable engines —
  * validated against the in-memory fake driver only. The standalone VALUES
  * table constructor and alias-qualified SET targets are accepted by e.g.
  * SQL Server and DB2 but NOT by every MERGE engine (Oracle has no bare
  * VALUES source); wiring a real driver should add a per-engine dialect
  * object rather than reuse this one untested. Same parameter order as the
  * Postgres upsert, so [[JdbcWarehouse]] binds identically against either.
  */
object AnsiMergeDialect extends SqlDialect {
  override def upsertSql(schema: String, table: String, cols: Seq[String], keys: Seq[String]): String = {
    val src = s"(VALUES (${cols.map(_ => "?").mkString(", ")})) AS s (${cols.map(quote).mkString(", ")})"
    val on = keys.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")
    val updates = cols.filterNot(keys.contains).map(c => s"t.${quote(c)} = s.${quote(c)}").mkString(", ")
    val insertCols = cols.map(quote).mkString(", ")
    val insertVals = cols.map(c => s"s.${quote(c)}").mkString(", ")
    s"""MERGE INTO ${qualify(schema, table)} t USING $src ON ($on)
       |WHEN MATCHED THEN UPDATE SET $updates
       |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
  }
}
