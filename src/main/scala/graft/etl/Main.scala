package graft.etl

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** CLI entry point (SURVEY §2.11 L1, reference `main.py:241-300`):
  * `runMain graft.etl.Main --user-agent "some user agent" \
  *    --input <dir> --output <dir> --warehouse <dir> [--keep-inputs]`
  * Env fallbacks mirror the reference's config.py: INPUT_PATH, OUTPUT_PATH,
  * WAREHOUSE_PATH.
  */
object Main {

  final case class Args(
      userAgent: String = "some user agent",
      input: String = sys.env.getOrElse("INPUT_PATH", "raw_data"),
      output: String = sys.env.getOrElse("OUTPUT_PATH", "output"),
      warehouse: String = sys.env.getOrElse("WAREHOUSE_PATH", "warehouse"),
      deleteInputs: Boolean = true
  )

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
      val result = Pipeline.run(spark, args.input, args.output, args.warehouse, args.userAgent, args.deleteInputs)
      println(f"pipeline wall: ${(System.nanoTime() - t0) / 1e9}%.2f s (excl. session startup)")
      println(s"processed dates: ${result.processedDates.map(_.date).mkString(", ")}")
      result.failedDates.foreach { case (d, e) => System.err.println(s"date $d failed: $e") }
      println(s"files deleted: ${result.filesDeleted}; quarantined rows: ${result.quarantinedRows}")
      println(s"warehouse: ${result.warehouseSummary}")
      if (!result.success) sys.exit(1)
    } finally spark.stop()
  }
}
