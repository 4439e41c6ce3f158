package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev harness: dump ONE (or a few) named queries + their oracle SQL in the
  * exact layout `tools/check_oracle.py` consumes, so a new query can be
  * oracle-gated locally without re-running the full 140+ registry.
  *
  *   sbt "runMain graft.tools.CheckQuery /root/testdata/sf0.01 /tmp/check_out q143_quality_calibration"
  *   python3 tools/check_oracle.py /tmp/check_out /root/testdata/sf0.01
  */
object CheckQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: CheckQuery <sfDir> <outDir> <queryName>...")
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
