package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The oracle SQL below is pinned to each query's DEFAULT knobs; a
    // semantics-changing conf leaked into this session (e.g. a curation
    // shard/ctx override or an ANN probe/index setting from an earlier
    // tuning run sharing the getOrCreate session) would make the gate
    // compare two different queries and fail opaquely — gated runs always
    // execute at the defaults.
    Seq(
      operators.Curation.ShardsConf,
      operators.Curation.CtxConf,
      operators.Similarity.LshProbesConf,
      operators.Similarity.IvfNprobeConf,
      operators.Similarity.IndexDirConf
    ).foreach(k => if (spark.conf.getOption(k).isDefined) spark.conf.unset(k))
    new java.io.File(outDir).mkdirs()
    // Queries that throw are recorded in _errors.json (query -> first error
    // line) in addition to stderr: a missing result dir then reads as
    // "errored, here's why" instead of silently absent from the compare.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = String.valueOf(e.getMessage).linesIterator
          .find(_.trim.nonEmpty).getOrElse(e.getClass.getSimpleName).trim
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    // Data-derived pass/fail for the no-oracle queries (SelfCheck): gives
    // the driver a numeric gate where DuckDB can't express the semantics.
    val selfJson = SelfCheck
      .run(spark, sfDir)
      .map { case (name, r) =>
        // Locale.ROOT: a comma-decimal default locale would emit 0,997 —
        // invalid JSON — and crash the driver's gate instead of reporting
        s"${q(name)}: {${q("check")}: ${q(r.check)}, ${q("metric")}: ${String.format(java.util.Locale.ROOT, "%.6f", Double.box(r.metric))}, " +
          s"${q("violations")}: ${r.violations}, ${q("pass")}: ${r.pass}}"
      }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/selfcheck.json"), selfJson)
    spark.stop()
  }
}
