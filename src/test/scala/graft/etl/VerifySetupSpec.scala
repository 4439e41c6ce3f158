package graft.etl

import java.nio.file.Files

import graft.SparkSpec

/** Setup-verification breadth (reference `verify_setup.py`): structure/env/
  * warehouse checks alongside the original Spark smoke checks.
  */
class VerifySetupSpec extends SparkSpec {

  test("all setup checks pass in this container") {
    val results = VerifySetup.run(spark)
    val failed = results.filterNot(_.ok)
    assert(failed.isEmpty, s"failing checks: $failed")
    val names = results.map(_.name)
    Seq("structure", "environment", "warehouse_roundtrip", "spark_basic", "spark_sql_temp_view",
      "testdata_readable", "native_functions", "shuffle").foreach(n => assert(names.contains(n), s"missing check $n"))
  }

  test("structure check creates missing operational directories") {
    val base = Files.createTempDirectory("vs_structure")
    val c = VerifySetup.checkStructure(base)
    assert(c.ok, c.detail)
    // default (env-var-free) layout is created under the base
    Seq("raw_data", "output", "warehouse", "logs").foreach { d =>
      assert(Files.isDirectory(base.resolve(d)), s"missing $d")
    }
  }

  test("testdata check fails cleanly on a missing directory") {
    val results = VerifySetup.run(spark, "/nonexistent/sf0")
    val td = results.find(_.name == "testdata_readable").get
    assert(!td.ok)
  }
}
