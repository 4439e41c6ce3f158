package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Golden-SQL snapshots of the dialect generators. The FakeJdbc suites
  * validate the statements structurally and `tools/check_dialect_sql.py`
  * executes all of them against DuckDB; this spec pins the exact TEXT of
  * the trickiest generated statements so an accidental edit (lost quote,
  * reordered clause, broken interpolation) fails in `sbt test` with a
  * readable diff — the cheapest layer of the three.
  */
class DialectSqlSpec extends AnyFunSuite {

  test("every generated statement is single, balanced, and fully interpolated") {
    for {
      (dname, d) <- Seq("postgres" -> PostgresDialect, "ansi_merge" -> AnsiMergeDialect)
      (name, sql, params) <- DialectDump.statements(d)
    } {
      val label = s"$dname/$name"
      assert(!sql.contains(";"), s"$label: statement separator leaked")
      assert(sql.count(_ == '(') === sql.count(_ == ')'), s"$label: unbalanced parens")
      assert(sql.count(_ == '"') % 2 === 0, s"$label: unbalanced identifier quotes")
      assert(!sql.contains("null") && !sql.contains("None"), s"$label: interpolation artifact")
      assert(sql.count(_ == '?') === params, s"$label: bind-parameter count drifted")
    }
  }

  test("postgres upsert: ON CONFLICT updates every non-key column") {
    val sql = PostgresDialect.upsertSql(
      "adform_dw",
      "client_report",
      Seq("datetime", "impression_count", "click_count", "audit_loaded_datetime"),
      Seq("datetime")
    )
    assert(
      sql ===
        """INSERT INTO "adform_dw"."client_report" ("datetime", "impression_count", "click_count", "audit_loaded_datetime") VALUES (?, ?, ?, ?) ON CONFLICT ("datetime") DO UPDATE SET "impression_count" = EXCLUDED."impression_count", "click_count" = EXCLUDED."click_count", "audit_loaded_datetime" = EXCLUDED."audit_loaded_datetime""""
    )
  }

  test("ansi merge upsert: VALUES source, alias-qualified update and insert") {
    val sql = AnsiMergeDialect.upsertSql("s", "t", Seq("k", "v"), Seq("k"))
    assert(
      sql ===
        """MERGE INTO "s"."t" t USING (VALUES (?, ?)) AS s ("k", "v") ON (t."k" = s."k")
          |WHEN MATCHED THEN UPDATE SET t."v" = s."v"
          |WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")""".stripMargin
    )
  }

  test("archive anti-join: range-bounded INSERT..SELECT..NOT EXISTS") {
    val sql = PostgresDialect.archiveRangeSql("s", "a", "b", Seq("datetime", "n"), "datetime")
    assert(
      sql ===
        """INSERT INTO "s"."b" ("datetime", "n")
          |SELECT src."datetime", src."n" FROM "s"."a" src
          |WHERE src."datetime" BETWEEN ? AND ?
          |AND NOT EXISTS (SELECT 1 FROM "s"."b" dst WHERE dst."datetime" = src."datetime")""".stripMargin
    )
  }

  test("create table: typed columns, NOT NULL markers, primary key clause") {
    val sql = PostgresDialect.createTableSql(
      "s",
      "t",
      Seq(("datetime", "TIMESTAMP", true), ("note", "TEXT", false)),
      Seq("datetime")
    )
    assert(
      sql === """CREATE TABLE IF NOT EXISTS "s"."t" ("datetime" TIMESTAMP NOT NULL, "note" TEXT, PRIMARY KEY ("datetime"))"""
    )
    // no-PK form must not emit a dangling clause
    val noPk = PostgresDialect.createTableSql("s", "t", Seq(("note", "TEXT", false)), Nil)
    assert(noPk === """CREATE TABLE IF NOT EXISTS "s"."t" ("note" TEXT)""")
  }

  test("identifier quoting survives embedded quotes") {
    assert(PostgresDialect.quote("""wei"rd""") === "\"wei\"\"rd\"")
  }
}
