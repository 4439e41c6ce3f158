package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rules V1-V7 (SURVEY §2.10, reference `warehouse.py:91-177` +
  * `data_processing.py:247-265`,`340-356`) as composable Column predicates.
  * Each violated rule contributes rows to a quarantine frame tagged with
  * `validation_error` + `source_file` + an audit timestamp — the Spark-first
  * version of the reference's pandas mask + concat accumulation.
  *
  * All rules are narrow per-row predicates — they pipeline inside one
  * whole-stage-codegen pass over the data; the quarantine union is lazy and
  * only materializes rows that actually violate a rule.
  */
object QualityRules {

  final case class Validation(
      isValid: Boolean,
      errors: Seq[String],
      warnings: Seq[String],
      cleaned: DataFrame,
      quarantined: DataFrame
  )

  val RequiredColumns: Seq[String] = Seq("date", "hour", "impression_count", "click_count")

  /** V2: any required column null. */
  def nullRule(cols: Seq[String]): Column =
    cols.map(col(_).isNull).reduce(_ || _)

  /** V3: negative counts. */
  val negativeRule: Column =
    col("impression_count") < 0 || col("click_count") < 0

  /** V6: hour outside 0-23. */
  val hourRule: Column =
    col("hour").isNull || !col("hour").between(0, 23)

  /** V4/V7: clicks exceed impressions (warn-only by default — the reference
    * deliberately ships these rows, `data_processing.py:351-356`).
    */
  val clickExcessRule: Column =
    col("click_count") > col("impression_count")

  /** Validate a report frame (reference `warehouse.py:91-177`).
    *
    * @param autoCorrectClicks when true, clamp clicks := impressions on
    *   violating rows (reference `auto_correct`, `warehouse.py:144-148`);
    *   default false — parity with shipped behavior.
    */
  def validate(df: DataFrame, sourceFile: String, autoCorrectClicks: Boolean = false): Validation = {
    val missing = RequiredColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty) {
      // V1: structural failure — nothing to clean or quarantine.
      val empty = df.limit(0)
      return Validation(
        isValid = false,
        errors = Seq(s"missing required columns: ${missing.mkString(", ")}"),
        warnings = Seq.empty,
        cleaned = empty,
        quarantined = quarantineFrame(empty, lit("unused"), sourceFile).limit(0)
      )
    }

    def q(pred: Column, error: String): DataFrame =
      quarantineFrame(df.filter(pred), lit(error), sourceFile)

    val quarantined = Seq(
      q(nullRule(RequiredColumns), "null_required_field"),
      q(negativeRule, "negative_count"),
      q(hourRule, "hour_out_of_range"),
      q(clickExcessRule, "clicks_exceed_impressions")
    ).reduce(_ unionAll _)

    val warnings = Seq.newBuilder[String]
    if (!df.filter(clickExcessRule).isEmpty) warnings += "clicks_exceed_impressions rows present"

    val hardBad = nullRule(RequiredColumns) || negativeRule || hourRule
    val kept = df.filter(!hardBad)
    val cleaned =
      if (autoCorrectClicks)
        kept.withColumn(
          "click_count",
          when(clickExcessRule, col("impression_count")).otherwise(col("click_count"))
        )
      else kept

    Validation(isValid = true, errors = Seq.empty, warnings = warnings.result(), cleaned, quarantined)
  }

  /** V5 (reference `warehouse.py:179-256` — `_handle_click_impression_mismatch`,
    * defined there but never wired into the main path; provided here for full
    * rule parity): classify click/impression relationships into an
    * `issue_type` and optionally clamp clicks.
    */
  def triageClickMismatch(df: DataFrame, autoCorrect: Boolean = false): DataFrame = {
    val zeroImpressions = col("impression_count") === 0 && col("click_count") > 0
    val excessClicks = col("click_count") > col("impression_count") && col("impression_count") > 0
    val moreImpressions = col("impression_count") > col("click_count") && col("click_count") > 0
    val triaged = df.withColumn(
      "issue_type",
      when(zeroImpressions, "clicks_without_impressions")
        .when(excessClicks, "clicks_exceed_impressions")
        .when(moreImpressions, "impressions_exceed_clicks")
        .otherwise("none") // imp == clicks, or impressions with zero clicks — unflagged
    )
    if (autoCorrect)
      // reference corrections (`warehouse.py:200-204`, `:222-226`): raise
      // impressions to clicks where impressions are zero; clamp clicks to
      // impressions where clicks exceed a POSITIVE impression count. The
      // predicates are on the ORIGINAL values (disjoint masks), matching the
      // reference's sequential in-place updates.
      triaged
        .withColumn(
          "impression_count",
          when(zeroImpressions, col("click_count")).otherwise(col("impression_count"))
        )
        .withColumn(
          "click_count",
          when(excessClicks, col("impression_count")).otherwise(col("click_count"))
        )
    else triaged
  }

  /** V8 shape: original columns + validation_error + source_file + audit ts. */
  private def quarantineFrame(rows: DataFrame, error: Column, sourceFile: String): DataFrame =
    rows
      .withColumn("validation_error", error)
      .withColumn("source_file", lit(sourceFile))
      .withColumn("audit_loaded_datetime", current_timestamp())
}
