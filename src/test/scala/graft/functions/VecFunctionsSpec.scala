package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native expression correctness: interpreted eval vs codegen paths, null
  * handling, and agreement with the built-in HOF equivalents.
  */
class VecFunctionsSpec extends SparkSpec {

  test("vec_dot matches the aggregate/zip_with fold exactly") {
    VecFunctions.install(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.5), Array(2.0, 2.0)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val rows = df
      .withColumn("native", expr("vec_dot(a, b)"))
      .withColumn("hof", expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"))
      .collect()
    rows.foreach(r => assert(r.getDouble(2) === r.getDouble(3)))
    assert(rows(0).getDouble(2) === 32.0)
    assert(rows(2).getDouble(2) === 0.0)
  }

  test("vec_dot propagates nulls") {
    VecFunctions.install(spark)
    import spark.implicits._
    val df = Seq((Option.empty[Array[Double]], Some(Array(1.0)))).toDF("a", "b")
    assert(df.selectExpr("vec_dot(a, b)").collect().head.isNullAt(0))
  }

  test("sorted_intersect_count matches size(array_intersect) on sorted distinct arrays") {
    VecFunctions.install(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L, 10L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L)),
      (Array(7L), Array(7L))
    ).toDF("a", "b")
    val rows = df
      .withColumn("native", expr("sorted_intersect_count(a, b)"))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
      .collect()
    rows.foreach(r => assert(r.getInt(2) === r.getInt(3)))
    assert(rows.map(_.getInt(2)).toSeq === Seq(2, 0, 0, 1))
  }

  test("expressions survive both codegen and interpreted evaluation") {
    VecFunctions.install(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 1.0), Array(2.0, 3.0))).toDF("a", "b")
    // wholestage off forces the interpreted/fallback path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(df.selectExpr("vec_dot(a, b)").collect().head.getDouble(0) === 5.0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(df.selectExpr("vec_dot(a, b)").collect().head.getDouble(0) === 5.0)
  }
}
