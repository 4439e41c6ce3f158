package graft.tools

import graft.{SparkEntry, core}

/** Dev harness: time ONE (or a few) named registry queries under bench
  * conditions — same session config, same noop-write materialization,
  * one untimed cold run per query to populate the session caches the
  * bench's build phases would have filled, then `SPARK_GRAFT_BENCH_REPEAT`
  * (default 5) timed repeats reporting median/min/max. For iterating on a
  * single query's plan without paying the full 180-query official bench.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.TimeQuery q179_decontam_surface"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName>...")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env
      .get("SPARK_GRAFT_BENCH_REPEAT")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(5)
      .max(1)
    val spark = core.Sessions.local("graft-timequery")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val cold = sec(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      val times = (1 to repeat)
        .map(_ => sec(fn(spark, sfDir).write.format("noop").mode("overwrite").save()))
        .sorted
      val med = times(times.length / 2)
      println(f"[time] $name cold=$cold%.2f median=$med%.3f min=${times.head}%.3f max=${times.last}%.3f (n=$repeat)")
    }
    spark.stop()
  }
}
