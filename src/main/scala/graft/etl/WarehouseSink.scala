package graft.etl

import org.apache.spark.sql.DataFrame

/** Sink seam for the Task-2 load (SURVEY §3.2): the pipeline builds ONE
  * load plan ([[ParquetWarehouse.prepare]] → validate → quarantine → load →
  * verify) and the sink decides where rows land — parquet directories in
  * this container, a SQL warehouse through [[JdbcWarehouse]] wherever a
  * driver exists. Swapping warehouses is constructor choice, not a
  * pipeline change (the reference hard-wires Postgres at
  * `main.py:120-152`; this seam is the Spark-first generalization its
  * SQLite-swapping tests imply).
  */
trait WarehouseSink {

  /** Load a prepared report frame; returns rows loaded into the live
    * table for the incoming range.
    */
  def loadPrepared(prepared: DataFrame): Long

  /** Upsert quarantined rows keyed on (datetime, source_file). */
  def storeInvalidRows(invalid: DataFrame): Unit

  /** Post-load verification summary. */
  def verify(): Map[String, Any]
}
