package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Warehouse-sink resolution (Main.dbEnv / Main.sinkFor): the compose
  * topology sets DB_HOST/DB_PORT/POSTGRES_* on the graft service, and the
  * pipeline must route its load to the JDBC warehouse exactly then —
  * falling back to the parquet warehouse when unset, with defaults that
  * match docker-compose.yml's warehouse service.
  */
class MainSpec extends AnyFunSuite with SparkSpec {

  test("no DB_HOST (or blank) resolves to the parquet warehouse") {
    assert(Main.dbEnv(Map.empty).isEmpty)
    assert(Main.dbEnv(Map("DB_HOST" -> "")).isEmpty)
    assert(Main.dbEnv(Map("DB_HOST" -> "   ")).isEmpty)
    val sink = Main.sinkFor(spark, Main.Args(warehouse = "/tmp/wh"), Map.empty)
    assert(sink.isInstanceOf[ParquetWarehouse])
  }

  test("DB_HOST alone resolves to JDBC with the compose defaults") {
    val d = Main.dbEnv(Map("DB_HOST" -> "warehouse")).get
    assert(d.url === "jdbc:postgresql://warehouse:5432/graft_db")
    assert(d.user === "graft_user")
    assert(d.password === "graft_pass")
    val sink = Main.sinkFor(spark, Main.Args(), Map("DB_HOST" -> "warehouse"))
    assert(sink.isInstanceOf[JdbcWarehouse])
  }

  test("explicit DB_PORT/POSTGRES_* override the defaults; bad port falls back") {
    val env = Map(
      "DB_HOST" -> "db.example.internal",
      "DB_PORT" -> "15432",
      "POSTGRES_DB" -> "mydb",
      "POSTGRES_USER" -> "me",
      "POSTGRES_PASSWORD" -> "secret"
    )
    val d = Main.dbEnv(env).get
    assert(d.url === "jdbc:postgresql://db.example.internal:15432/mydb")
    assert(d.user === "me" && d.password === "secret")
    assert(Main.dbEnv(Map("DB_HOST" -> "h", "DB_PORT" -> "not-a-port")).get.port === 5432)
  }

  test("the JDBC sink built from env coordinates loads through the dialect (FakeJdbc)") {
    // same constructor shape sinkFor produces, with the connection factory
    // swapped for the in-memory fake: proves the resolved sink drives the
    // full ensureSchema -> load -> verify path the compose container runs
    val wh = new JdbcWarehouse(FakeJdbc.factory("main-spec"), PostgresDialect)
    try {
      wh.ensureSchema()
      import spark.implicits._
      val prepared = ParquetWarehouse.prepare(
        Seq(("2024-01-01", 0, 10L, 1L), ("2024-01-01", 1, 20L, 2L))
          .toDF("date", "hour", "impression_count", "click_count")
      )
      assert(wh.loadPrepared(prepared) === 2L)
      assert(wh.verify()("row_count") === 2L)
    } finally FakeJdbc.drop("main-spec")
  }
}
