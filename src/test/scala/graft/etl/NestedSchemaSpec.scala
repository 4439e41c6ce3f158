package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rollup against the reference's REAL nested footprint (SURVEY §1.2):
  * a full-fidelity fixture with 4-level structs, repeated groups,
  * GUID/money structs and divergent impression/click tails — proving the
  * scan prunes to the single consumed leaf and the pipeline's answers
  * don't change when the decoy width grows.
  */
class NestedSchemaSpec extends SparkSpec {

  test("full-fidelity schema has the reference's shape: depth, arrays, structs, tails") {
    val imp = Fixtures.fullFidelityDf(spark, "impressions", 3)
    val clk = Fixtures.fullFidelityDf(spark, "clicks", 3)

    // 4-level nested leaf resolves
    assert(imp.select(col("user_identity.providers.browser.id")).collect().nonEmpty)
    // repeated group with float leaves
    val poly = imp.select(explode(col("geo_location.polygon")).as("p")).select(col("p.latitude"))
    assert(poly.schema.fields.head.dataType === org.apache.spark.sql.types.FloatType)
    assert(poly.count() === 6)
    // GUID-as-struct and money-as-struct conventions
    assert(imp.select(col("transaction_header.transaction_id.lo"), col("transaction_header.transaction_id.hi")).count() === 3)
    val money = imp.select(col("rtb_vars.winning_price_in_dkk.*")).schema.fieldNames
    assert(money.toSeq === Seq("lo", "hi", "signScale"))
    // tail divergence (SURVEY §1.2: shared head, divergent tail)
    assert(imp.columns.contains("shown_in_non_friendly_iframe") && !imp.columns.contains("landing_url"))
    assert(clk.columns.contains("landing_url") && clk.columns.contains("server_impression_time_ms"))
    assert(!clk.columns.contains("output_type"))
    // shared head is identical across the two event types
    val shared = Seq("transaction_header", "user_identity", "fraud_detection", "geo_location",
      "device_settings", "connection", "banner", "rtb_vars", "interaction_id", "page_url")
    shared.foreach { c =>
      assert(imp.schema(c).dataType === clk.schema(c).dataType, s"shared field $c diverges")
    }
  }

  test("scan prunes the nested schema to the single consumed leaf") {
    val dir = Files.createTempDirectory("nested_prune")
    val f = Fixtures.writeFullFidelityEventFile(spark, dir, "impressions", "20220527", 12, 10, extra = 5)

    val counts = HourlyRollup.hourlyCounts(spark, Seq(f.toString), Fixtures.UA)
    val plan = counts.queryExecution.executedPlan.toString

    // ReadSchema carries ONLY device_settings.user_agent — none of the wide
    // decoy structs survive column pruning into the parquet scan
    val readSchema = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.contains("device_settings"), s"expected nested leaf in ReadSchema: $readSchema")
    assert(readSchema.contains("user_agent"), s"expected user_agent leaf in ReadSchema: $readSchema")
    Seq("transaction_header", "user_identity", "geo_location", "banner", "rtb_vars", "page_url", "screen_size")
      .foreach(decoy => assert(!readSchema.contains(decoy), s"unpruned decoy column $decoy in: $readSchema"))
    // and the user-agent predicate reached the scan as a pushed filter
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in plan")
    assert(
      "PushedFilters: \\[[^\\]]*user_agent[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"user_agent filter not pushed to the scan: $plan"
    )
  }

  test("pipeline end-to-end over full-fidelity files matches the golden counts") {
    val in = Files.createTempDirectory("nested_in")
    val out = Files.createTempDirectory("nested_out")
    val wh = Files.createTempDirectory("nested_wh")
    // golden scenario shape, realistic footers: hour 11 -> 0/10, hour 12 -> 10/20
    Fixtures.writeFullFidelityEventFile(spark, in, "impressions", "20220527", 12, 10, extra = 3)
    Fixtures.writeFullFidelityEventFile(spark, in, "clicks", "20220527", 11, 10, extra = 1)
    Fixtures.writeFullFidelityEventFile(spark, in, "clicks", "20220527", 12, 20)

    val result = Pipeline.run(spark, in.toString, out.toString, wh.toString, Fixtures.UA)
    assert(result.success && result.processedDates.map(_.date) === Seq("2022-05-27"))

    val csv = spark.read
      .option("header", "true")
      .schema(Pipeline.csvSchema)
      .csv(out.resolve("task1_output_2022-05-27.csv").toString)
      .collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(csv(11) === ((0L, 10L)))
    assert(csv(12) === ((10L, 20L)))
    assert(csv(0) === ((0L, 0L)))
  }
}
