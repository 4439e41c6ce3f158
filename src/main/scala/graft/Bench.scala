package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every registered query
  * against SPARK_GRAFT_SF_DIR, forcing FULL materialization through the
  * noop sink (count() would let Spark skip projection work; noop executes
  * the complete plan including writes of every column), and prints exactly
  * one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = core.Sessions.local("graft-bench")
    // Warm-up: trigger codegen/JIT + parquet footer reads once so the first
    // timed query doesn't absorb all JVM cold-start (it isn't query cost).
    spark.range(1000000).selectExpr("sum(id)").collect()
    core.Tables.lineitem(spark, sfDir).limit(1).collect()
    // repeat each query and keep the fastest run: single-shot timings on a
    // shared box fold scheduler noise into query cost (observed up to 10x
    // outliers); min-of-N measures the query, not the neighbors.
    val repeat = sys.env
      .get("SPARK_GRAFT_BENCH_REPEAT")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(2)
      .max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      }
      val good = times.filter(_ >= 0)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
