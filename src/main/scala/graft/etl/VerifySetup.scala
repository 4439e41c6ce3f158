package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** Environment verification entry point (SURVEY §2.11 L8 — the reference's
  * `verify_setup.py` checks structure/env/db/spark incl. a temp-view
  * `spark.sql` round trip at `:287-289`). Exit code 0 iff every check
  * passes; each check prints PASS/FAIL.
  */
object VerifySetup {

  final case class Check(name: String, ok: Boolean, detail: String = "")

  def run(spark: SparkSession, testdataDir: String = "/root/testdata/sf0.001"): Seq[Check] = {
    val checks = Seq.newBuilder[Check]

    // Spark smoke: createDataFrame → count (reference verify_setup.py:263-286)
    checks += (try {
      import spark.implicits._
      val n = Seq(1, 2, 3).toDF("x").count()
      Check("spark_basic", n == 3, s"count=$n")
    } catch { case e: Exception => Check("spark_basic", ok = false, e.toString) })

    // SQL round trip over a temp view (reference verify_setup.py:287-289)
    checks += (try {
      import spark.implicits._
      Seq((1, "a"), (2, "b")).toDF("id", "v").createOrReplaceTempView("verify_setup_view")
      val rows = spark.sql("SELECT * FROM verify_setup_view ORDER BY id").collect()
      Check("spark_sql_temp_view", rows.length == 2 && rows.head.getInt(0) == 1)
    } catch { case e: Exception => Check("spark_sql_temp_view", ok = false, e.toString) })

    // testdata presence + readability
    checks += (try {
      val ok = Files.isDirectory(Paths.get(testdataDir)) &&
        spark.read.parquet(s"$testdataDir/lineitem.parquet").limit(1).count() == 1
      Check("testdata_readable", ok, testdataDir)
    } catch { case e: Exception => Check("testdata_readable", ok = false, e.toString) })

    // native function registration
    checks += (try {
      graft.functions.VecFunctions.install(spark)
      val v = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").collect().head.getDouble(0)
      Check("native_functions", v == 11.0, s"vec_dot=$v")
    } catch { case e: Exception => Check("native_functions", ok = false, e.toString) })

    // shuffle round trip (exercises the configured shuffle partitions)
    checks += (try {
      val n = spark.range(0, 1000).groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k")).count().count()
      Check("shuffle", n == 7, s"groups=$n")
    } catch { case e: Exception => Check("shuffle", ok = false, e.toString) })

    checks.result()
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-verify-setup")
    try {
      val results = run(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
      results.foreach(c => println(f"${if (c.ok) "PASS" else "FAIL"}%-4s ${c.name}%-22s ${c.detail}"))
      if (results.exists(!_.ok)) sys.exit(1)
    } finally spark.stop()
  }
}
