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

  /** Full-fidelity event frame mirroring the reference's REAL parquet shape
    * (SURVEY §1.2; reference notebook `adform_home_work.ipynb` cells 3-4;
    * root message `adform.kafka.contracts.processing.Impression`):
    * 3-5-level nested structs (`user_identity.providers.browser.id`),
    * repeated primitive and group fields (`language_codes`,
    * `geo_location.polygon{latitude,longitude}`), GUID-as-struct `{lo,hi}`
    * pairs, money-as-struct `{lo,hi,signScale}` + currency, epoch-int64
    * timestamps, and the impressions/clicks tail divergence
    * (`shown_in_non_friendly_iframe`/`output_type`/`detected_device_type`
    * vs `landing_url`/`banner_click_url_id`/`keywords`/
    * `server_impression_time_ms`). Values are deterministic functions of
    * `interaction_id` — no RNG, reproducible files.
    */
  def fullFidelityDf(
      spark: SparkSession,
      eventType: String,
      n: Int,
      ua: String = UA,
      extra: Int = 0
  ): DataFrame = {
    import spark.implicits._
    val rows = (1 to n).map(i => (ua, i.toLong)) ++ (1 to extra).map(i => ("other agent", (n + i).toLong))
    val base = rows.toDF("ua", "interaction_id")
    val id = col("interaction_id")
    val common = Seq(
      struct(
        struct(id.as("lo"), (id * 7919).as("hi")).as("transaction_id"),
        (lit(1653590000000L) + id).as("creation_time"),
        (lit(1653590000100L) + id).as("producer_time"),
        lit("producer-a").as("original_producer"),
        lit("producer-b").as("recent_producer")
      ).as("transaction_header"),
      struct(
        concat(lit("cookie_"), id).as("cookie_id"),
        (id % 13 === 0).as("is_opted_out"),
        (id % 100).as("cookie_id_origin_id"),
        concat(lit("bc_"), id * 31).as("browser_cookie_id"),
        lit("Enabled").as("browser_cookie_status"),
        // 4 levels deep: user_identity.providers.browser.id
        struct(
          struct(concat(lit("br_"), id).as("id"), lit("104.0").as("version")).as("browser"),
          struct(concat(lit("dev_"), id % 50).as("id"), lit("vendor-x").as("vendor")).as("device")
        ).as("providers")
      ).as("user_identity"),
      struct(
        array((id % 3).cast("int"), lit(7)).as("fraud_reason_ids"),
        lit(false).as("is_fraud")
      ).as("fraud_detection"),
      struct(
        lit("DK").as("country"),
        array(
          struct(lit(55.6761f).as("latitude"), lit(12.5683f).as("longitude")),
          struct(lit(55.7f).as("latitude"), lit(12.6f).as("longitude"))
        ).as("polygon")
      ).as("geo_location"),
      struct(
        col("ua").as("user_agent"),
        struct(lit(1920).as("width"), lit(1080).as("height")).as("screen_size"),
        array(lit("en"), lit("dk")).as("language_codes")
      ).as("device_settings"),
      struct(lit("10.0.0.1").as("ip"), lit("wifi").as("connection_type")).as("connection"),
      struct(
        (id % 1000 + 10000).as("banner_id"),
        (id % 100 + 1000).as("campaign_id"),
        (id % 10 + 100).as("media_id"),
        (id % 7).as("tag_id"),
        (id % 5).as("banner_placement_id")
      ).as("banner"),
      struct(
        struct((id * 100 + 50).as("lo"), lit(0).cast("int").as("hi"), lit(4).cast("int").as("signScale"))
          .as("winning_price_in_dkk"),
        lit("DKK").as("currency_code")
      ).as("rtb_vars"),
      id,
      concat(lit("https://example.test/page/"), id).as("page_url")
    )
    val tail =
      if (eventType == "impressions")
        Seq(
          (id % 11 === 0).as("shown_in_non_friendly_iframe"),
          lit("html5").as("output_type"),
          lit("desktop").as("detected_device_type")
        )
      else
        Seq(
          concat(lit("https://landing.test/"), id).as("landing_url"),
          (id % 17).as("banner_click_url_id"),
          array(lit("kw1"), lit("kw2")).as("keywords"),
          (lit(1653590000200L) + id).as("server_impression_time_ms")
        )
    base.select(common ++ tail: _*)
  }

  /** Write one full-fidelity fixture file under the reference's exact
    * filename convention (the filename carries the event hour).
    */
  def writeFullFidelityEventFile(
      spark: SparkSession,
      dir: Path,
      eventType: String,
      date: String,
      hour: Int,
      n: Int,
      ua: String = UA,
      extra: Int = 0
  ): Path = {
    val ts = f"$date${hour}%02d3204"
    val name = f"${eventType}_processed_dk_${ts}695_172756391-172756397_0.parquet"
    writeExactName(spark, fullFidelityDf(spark, eventType, n, ua, extra), dir.resolve(name))
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
