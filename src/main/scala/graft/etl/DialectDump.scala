package graft.etl

/** Dump every SQL statement the warehouse dialects generate, as JSON, for
  * external syntax validation (`tools/check_dialect_sql.py` feeds each one
  * through DuckDB — a real parser/executor, unlike the reflective FakeJdbc
  * the unit tests use). The statement inventory mirrors exactly what
  * [[JdbcWarehouse]] asks a dialect for: DDL bootstrap, append insert, the
  * two upserts, range delete, archive anti-join, and both verify shapes.
  *
  *   sbt "runMain graft.etl.DialectDump /tmp/dialect_sql.json"
  *   python3 tools/check_dialect_sql.py /tmp/dialect_sql.json
  */
object DialectDump {
  import JdbcWarehouse.{InvalidColNames, InvalidCols, ReportColNames, ReportCols}
  import ParquetWarehouse.{ClientReport, ClientReportArchive, ClientReportInvalid}

  private val schema = "adform_dw"

  /** (name, sql, bindParamCount) for one dialect — the full inventory
    * [[JdbcWarehouse]] uses, in execution order (DDL first, so a validator
    * can execute, not just parse).
    */
  def statements(d: SqlDialect): Seq[(String, String, Int)] = Seq(
    ("create_schema", d.createSchemaSql(schema), 0),
    ("create_client_report", d.createTableSql(schema, ClientReport, ReportCols, Seq("datetime")), 0),
    ("create_archive", d.createTableSql(schema, ClientReportArchive, ReportCols, Seq("datetime")), 0),
    ("create_invalid", d.createTableSql(schema, ClientReportInvalid, InvalidCols, Nil), 0),
    (
      "create_invalid_unique_index",
      d.createUniqueIndexSql(schema, ClientReportInvalid, "uq_client_report_invalid_key", Seq("datetime", "source_file")),
      0
    ),
    (
      "create_datetime_index",
      d.createIndexSql(schema, ClientReport, "idx_client_report_datetime", Seq("datetime")),
      0
    ),
    ("insert_report", d.insertSql(schema, ClientReport, ReportColNames), ReportColNames.size),
    ("upsert_report", d.upsertSql(schema, ClientReport, ReportColNames, Seq("datetime")), ReportColNames.size),
    (
      "upsert_invalid",
      d.upsertSql(schema, ClientReportInvalid, InvalidColNames, Seq("datetime", "source_file")),
      InvalidColNames.size
    ),
    ("archive_range", d.archiveRangeSql(schema, ClientReport, ClientReportArchive, ReportColNames, "datetime"), 2),
    ("delete_range", d.deleteRangeSql(schema, ClientReport, "datetime"), 2),
    ("verify_ranged", d.verifySql(schema, ClientReport, "datetime", ranged = true), 2),
    ("verify_full", d.verifySql(schema, ClientReport, "datetime", ranged = false), 0)
  )

  private def jStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/dialect_sql.json")
    val entries = for {
      (dname, d) <- Seq("postgres" -> PostgresDialect, "ansi_merge" -> AnsiMergeDialect)
      (name, sql, params) <- statements(d)
    } yield s"""{"dialect":${jStr(dname)},"name":${jStr(name)},"params":$params,"sql":${jStr(sql)}}"""
    val json = entries.mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
    println(s"wrote ${entries.size} statements to $out")
  }
}
