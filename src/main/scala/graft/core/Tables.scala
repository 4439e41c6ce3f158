package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (`/root/repo/TESTDATA.md`):
  * TPC-H-ish star schema + `events` stream table + `documents`/`embeddings`
  * for the training-data-pipeline operators. One parquet file per table.
  *
  * All loads are plain `spark.read.parquet` so Catalyst predicate pushdown,
  * column pruning and partition pruning apply to every downstream query —
  * at 100 TB these would be partitioned/bucketed tables and the same
  * DataFrame code would pick that up from the catalog unchanged.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read nanos as long and rebuild a microsecond timestamp
    * (`ts div 1000` — integer division; a double division would lose
    * precision at 1e18 nanos). Column name stays `ts`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
