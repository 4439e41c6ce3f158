package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON document per line) corpus source — the interchange
  * format text corpora actually ship in. Two scale rules are baked in:
  *
  *   - **Explicit schema, never inference.** Schema inference reads the
  *     ENTIRE input once before the real job starts — a free 100 TB scan.
  *     Callers pass (or use) a declared `StructType`; Spark then streams
  *     each line straight into typed rows.
  *   - **Corrupt lines are data, not failures.** A crawler's JSONL always
  *     contains torn lines. PERMISSIVE mode routes them to a corrupt-record
  *     column, and [[split]] stages the parsed frame ONCE and emits the
  *     (valid, quarantined) pair from that single read — the ETL layer's
  *     quarantine philosophy (QualityRules) applied at the source, with no
  *     second scan and no job-killing parse exception. (Staging also
  *     sidesteps Spark's restriction on queries that reference only the
  *     internal corrupt-record column.)
  */
object JsonlCorpus {

  val CorruptCol = "_corrupt_record"

  /** The `documents` table's declared schema (matches the parquet source). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** Read with an explicit schema; malformed lines land in [[CorruptCol]]
    * with every data column null.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** One read, two outputs: (valid rows without the corrupt column,
    * quarantined raw lines). The parsed frame is staged once; both sides
    * filter the staged table.
    */
  def split(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val staged = read(spark, path, schema).localCheckpoint()
    (
      staged.filter(col(CorruptCol).isNull).drop(CorruptCol),
      staged.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))
    )
  }

  /** The documents corpus from JSONL, pre-split. */
  def documents(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark, path, documentsSchema)
}
