package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-layout behavior: bucketed joins must not shuffle; partitioned
  * reads must prune directories.
  */
class LayoutsSpec extends SparkSpec {

  test("same-key bucketed tables join with zero shuffle exchanges") {
    val base = Files.createTempDirectory("buckets")
    val orders = graft.core.Tables.orders(spark, sfDir)
    val customers = graft.core.Tables.customer(spark, sfDir)
    Layouts.writeBucketed(orders, "orders_b", "o_custkey", 8, s"$base/orders_b")
    Layouts.writeBucketed(
      customers.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b",
      "o_custkey",
      8,
      s"$base/customer_b"
    )
    // disable broadcast so the join must pick SMJ/shuffle-hash — the point
    // is that bucketing removes the Exchange, not that broadcast hides it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layouts.coLocatedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it returns the same rows as the plain join
      val expected = orders
        .join(customers, orders("o_custkey") === customers("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("bucketed same-key aggregation also skips the shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("orders_b").groupBy("o_custkey").agg(sum("o_totalprice"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed agg must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("partitioned table prunes to the matching date directories") {
    val base = Files.createTempDirectory("parts")
    val ev = graft.core.Tables
      .events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Layouts.writePartitioned(ev, "day", s"$base/events_p")
    val read = spark.read.parquet(s"$base/events_p").filter(col("day") === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "partition filter must reach the scan")
    val expected = ev.filter(col("day") === "2024-01-02").count()
    assert(read.count() === expected)
    assert(expected > 0)
  }
}
