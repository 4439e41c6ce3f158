package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

import graft.{SparkEntry, core}

/** Dump `.explain("formatted")` for named registry queries to
  * `<outDir>/<queryName>.txt` — the plan evidence the optimization-round
  * judge checks claims against (guide §7.2). Plans are captured without
  * executing (initial AQE plan, `isFinalPlan=false`), which is what
  * `df.explain` itself prints.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ExplainDump /root/repo/plans/r16 q179_decontam_surface ..."
  *
  * Pass `ALL` instead of names to dump every registered query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <outDir> <queryName>...|ALL")
    val outDir = Paths.get(args.head)
    Files.createDirectories(outDir)
    val names =
      if (args.tail.sameElements(Array("ALL"))) SparkEntry.queries.keys.toSeq.sorted
      else args.tail.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = core.Sessions.local("graft-explain")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.write(outDir.resolve(s"$name.txt"), txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] $name -> ${outDir.resolve(s"$name.txt")}")
    }
    spark.stop()
  }
}
