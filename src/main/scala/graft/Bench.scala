package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every registered query
  * against SPARK_GRAFT_SF_DIR, forcing FULL materialization through the
  * noop sink (count() would let Spark skip projection work; noop executes
  * the complete plan including writes of every column), and prints exactly
  * one JSON line.
  *
  * ANN index/query phases are timed separately (`phases` key): q35/q36
  * amortize a build-once index (Similarity.buildLshIndex/buildIvfIndex), so
  * their per-query numbers are WARM-index times — the honest steady-state
  * cost — while the one-time build cost is reported alongside rather than
  * folded in or hidden.
  *
  * A failed query is reported in an explicit `failed` array AND exits
  * non-zero: a silently-missing query would make the bench look faster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = core.Sessions.local("graft-bench")
    // Warm-up: trigger codegen/JIT + parquet footer reads once so the first
    // timed query doesn't absorb all JVM cold-start (it isn't query cost).
    spark.range(1000000).selectExpr("sum(id)").collect()
    core.Tables.lineitem(spark, sfDir).limit(1).collect()

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // Index-build phases, timed before the query loop so every q35/q36
    // repetition below measures the warm-index query path.
    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
    try phases("q35_index_build") = sec(operators.Similarity.buildLshIndex(spark, sfDir))
    catch { case e: Throwable => System.err.println(s"[bench] q35_index_build failed: ${e.getMessage}") }
    try phases("q36_index_build") = sec(operators.Similarity.buildIvfIndex(spark, sfDir))
    catch { case e: Throwable => System.err.println(s"[bench] q36_index_build failed: ${e.getMessage}") }
    try phases("q61_pair_graph_build") = sec(operators.Dedup.buildPairGraph(spark, sfDir))
    catch { case e: Throwable => System.err.println(s"[bench] q61_pair_graph_build failed: ${e.getMessage}") }

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
        try sec(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      }
      val good = times.filter(_ >= 0)
      name -> (if (good.nonEmpty) (good.min, good.max) else (-1.0, -1.0))
    }
    val failed = results.collect { case (name, (v, _)) if v < 0 => name }
    val qs = results
      .map { case (k, (v, _)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // per-query [min,max] across repeats: a wide spread flags scheduler /
    // memory-pressure noise, so a regression vs the previous round is
    // self-diagnosing instead of demanding a re-run
    val sp = results
      .map { case (k, (lo, hi)) => "\"" + k + "\":[" + f"$lo%.3f" + "," + f"$hi%.3f" + "]" }
      .mkString("{", ",", "}")
    val ph = phases
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, (v, _)) if v >= 0 => v }.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$sp,"phases":$ph,"failed":$fl,"sf":"$sfDir"}"""
    )
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
