package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical table layouts for shuffle avoidance and partition pruning —
  * the storage-side half of the 100 TB design (SURVEY §4: the reference
  * leans on Catalyst defaults; a real deployment co-locates its big joins).
  *
  *   - **Bucketed tables**: `bucketBy(n, key)` + `sortBy(key)` persists a
  *     hash-partitioned, sorted layout. A join of two tables bucketed on the
  *     same key with the same bucket count plans as a SortMergeJoin with NO
  *     Exchange on either side — the shuffle is paid once at write time and
  *     amortized over every subsequent join/aggregation on that key.
  *   - **Date-partitioned tables**: `partitionBy(col)` gives directory-level
  *     partition pruning — a date-range predicate reads only matching
  *     directories (the 100 TB fact table becomes day-sized scans).
  *
  * Bucket counts should match downstream parallelism (a multiple of
  * executor-core count); both layouts are plain parquet readable by any
  * engine.
  */
object Layouts {

  /** Persist `df` bucketed+sorted on `key` as managed-table metadata backed
    * by `path`. The table is immediately joinable shuffle-free against any
    * other table bucketed on the same key with the same `buckets`.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      path: String
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Persist `df` partitioned by `partitionCol` (directory-level pruning). */
  def writePartitioned(
      df: DataFrame,
      partitionCol: String,
      path: String
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Join two same-key bucketed tables — plans shuffle-free (verified by
    * LayoutsSpec: zero ShuffleExchange below the join).
    */
  def coLocatedJoin(spark: SparkSession, tableA: String, tableB: String, key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
