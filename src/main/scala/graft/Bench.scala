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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
