package graft.etl

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture parquet generator mirroring the reference's raw-data shape: a
  * nested `device_settings.user_agent` column (plus decoy fields) in files
  * named `<type>_processed_dk_<14-digit-ts><3-digit-ms>_<range>_0.parquet`
  * — the filename carries the event time, exactly like
  * `/root/reference/raw_data/`.
  */
object Fixtures {

  val UA = "some user agent"

  /** Write one fixture file with `n` rows matching `ua` and `extra` rows with
    * a different user agent, timestamped at `date` (yyyyMMdd) × `hour`.
    */
  def writeEventFile(
      spark: SparkSession,
      dir: Path,
      eventType: String, // "impressions" | "clicks"
      date: String, // "20220527"
      hour: Int,
      n: Int,
      ua: String = UA,
      extra: Int = 0
  ): Path = {
    import spark.implicits._
    val rows = (1 to n).map(i => (ua, i.toLong)) ++ (1 to extra).map(i => ("other agent", (n + i).toLong))
    val df = rows
      .toDF("ua", "interaction_id")
      .select(
        struct(
          col("ua").as("user_agent"),
          struct(lit(1920).as("width"), lit(1080).as("height")).as("screen_size"),
          array(lit("en"), lit("dk")).as("language_codes")
        ).as("device_settings"),
        struct(
          struct(col("interaction_id").as("lo"), lit(0L).as("hi")).as("transaction_id"),
          lit(1653590000000L).as("creation_time")
        ).as("transaction_header"),
        col("interaction_id"),
        lit("http://example.test/page").as("page_url")
      )
    val ts = f"$date${hour}%02d3204" // yyyyMMddHHmmss
    val name = f"${eventType}_processed_dk_${ts}695_172756391-172756397_0.parquet"
    writeExactName(spark, df, dir.resolve(name))
  }

  /** Spark writers emit part-files; stage to a temp dir and move the single
    * part to the exact target name (the fixture files are tiny).
    */
  def writeExactName(spark: SparkSession, df: DataFrame, target: Path): Path = {
    val tmp = Files.createTempDirectory("fixture")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files
      .list(tmp)
      .filter(p => p.getFileName.toString.startsWith("part-") && p.getFileName.toString.endsWith(".parquet"))
      .findFirst()
      .orElseThrow()
    Files.createDirectories(target.getParent)
    Files.move(part, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    target
  }

  /** The golden scenario from the reference's shipped outputs
    * (`output/task1_output_2022-05-27.csv`): hour 11 → 0 imp / 10 clk,
    * hour 12 → 10 imp / 20 clk, everything else 0/0 — clicks legitimately
    * exceed impressions.
    */
  def goldenScenario(spark: SparkSession, inputDir: Path): Unit = {
    writeEventFile(spark, inputDir, "impressions", "20220527", 12, 10, extra = 3)
    writeEventFile(spark, inputDir, "clicks", "20220527", 11, 10, extra = 1)
    writeEventFile(spark, inputDir, "clicks", "20220527", 12, 20)
  }
}
