package graft.etl

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** CLI entry point (SURVEY §2.11 L1, reference `main.py:241-300`):
  * `runMain graft.etl.Main --user-agent "some user agent" \
  *    --input <dir> --output <dir> --warehouse <dir> [--keep-inputs]`
  * Env fallbacks mirror the reference's config.py: INPUT_PATH, OUTPUT_PATH,
  * WAREHOUSE_PATH.
  *
  * Warehouse-sink resolution: when `DB_HOST` is present in the environment
  * (compose's graft service sets DB_HOST/DB_PORT and the POSTGRES_* trio —
  * reference `docker-compose.yml` + `config.py`'s DB settings), the
  * pipeline loads the SQL warehouse through [[JdbcWarehouse]] over a
  * DriverManager connection; otherwise it loads the parquet warehouse at
  * `--warehouse`. Same plan either way — the sink is constructor choice
  * (Pipeline's sink-generic `run`).
  */
object Main {

  final case class Args(
      userAgent: String = "some user agent",
      input: String = sys.env.getOrElse("INPUT_PATH", "raw_data"),
      output: String = sys.env.getOrElse("OUTPUT_PATH", "output"),
      warehouse: String = sys.env.getOrElse("WAREHOUSE_PATH", "warehouse"),
      deleteInputs: Boolean = true
  )

  /** SQL-warehouse coordinates from the environment, present iff DB_HOST
    * is set (non-empty). Defaults mirror docker-compose.yml's warehouse
    * service so a compose boot needs no extra variables.
    */
  final case class DbEnv(host: String, port: Int, database: String, user: String, password: String) {
    def url: String = s"jdbc:postgresql://$host:$port/$database"
  }

  def dbEnv(env: Map[String, String] = sys.env): Option[DbEnv] =
    env.get("DB_HOST").map(_.trim).filter(_.nonEmpty).map { host =>
      DbEnv(
        host = host,
        port = env.get("DB_PORT").flatMap(p => scala.util.Try(p.trim.toInt).toOption).getOrElse(5432),
        database = env.getOrElse("POSTGRES_DB", "graft_db"),
        user = env.getOrElse("POSTGRES_USER", "graft_user"),
        password = env.getOrElse("POSTGRES_PASSWORD", "graft_pass")
      )
    }

  /** The run's warehouse sink. Construction does not connect — the first
    * statement does (JdbcWarehouse opens per use), so resolution is pure
    * and unit-testable without a server.
    */
  def sinkFor(spark: SparkSession, args: Args, env: Map[String, String] = sys.env): WarehouseSink =
    dbEnv(env) match {
      case Some(d) => new JdbcWarehouse(JdbcWarehouse.DriverManagerFactory(d.url, d.user, d.password), PostgresDialect)
      case None    => new ParquetWarehouse(spark, args.warehouse)
    }

  /** Resolve the sink, bootstrap DDL for the SQL path (idempotent — the
    * compose init SQL already created the schema; IF NOT EXISTS makes this
    * a no-op there), and say which mode the run is in.
    */
  private[etl] def prepareSink(spark: SparkSession, args: Args): WarehouseSink =
    sinkFor(spark, args) match {
      case wh: JdbcWarehouse =>
        println(s"warehouse sink: JDBC ${dbEnv().map(_.url).getOrElse("")}")
        wh.ensureSchema()
        wh
      case p =>
        println(s"warehouse sink: parquet ${args.warehouse}")
        p
    }

  def parse(argv: Array[String]): Args = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Args): Args = rest match {
      case "--user-agent" :: v :: t => loop(t, acc.copy(userAgent = v))
      case "--input" :: v :: t      => loop(t, acc.copy(input = v))
      case "--output" :: v :: t     => loop(t, acc.copy(output = v))
      case "--warehouse" :: v :: t  => loop(t, acc.copy(warehouse = v))
      case "--keep-inputs" :: t     => loop(t, acc.copy(deleteInputs = false))
      case Nil                      => acc
      case other :: _               => throw new IllegalArgumentException(s"unknown argument: $other")
    }
    loop(argv.toList, Args())
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    val spark: SparkSession = Sessions.local("graft-etl")
    try {
      val t0 = System.nanoTime()
      val result = Pipeline.run(spark, args.input, args.output, prepareSink(spark, args), args.userAgent, args.deleteInputs)
      println(f"pipeline wall: ${(System.nanoTime() - t0) / 1e9}%.2f s (excl. session startup)")
      println(s"processed dates: ${result.processedDates.map(_.date).mkString(", ")}")
      result.failedDates.foreach { case (d, e) => System.err.println(s"date $d failed: $e") }
      println(s"files deleted: ${result.filesDeleted}; quarantined rows: ${result.quarantinedRows}")
      println(s"warehouse: ${result.warehouseSummary}")
      if (!result.success) sys.exit(1)
    } finally spark.stop()
  }
}
