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

  test("q104 pii scrub: planted emails/phones/IPs get exact redaction accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob@example.com or alice.smith+tag@mail.co.uk today"),
      (2L, "call 555-867-5309 or 555.867.5309 now"),
      (3L, "server at 10.0.0.1 and 192.168.255.254 up"),
      (4L, "mix: bob@ex.com then 10.0.0.1 then 555-123-4567 end"),
      (5L, "clean text with no personal data at all")
    ).toDF("doc_id", "text")
    val out = Privacy.piiScrub(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def counts(id: Long) = {
      val r = out(id)
      (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"), r.getAs[Int]("n_ips"), r.getAs[Int]("n_redactions"))
    }
    assert(counts(1L) === ((2, 0, 0, 2)))
    assert(counts(2L) === ((0, 2, 0, 2)))
    assert(counts(3L) === ((0, 0, 2, 2)))
    assert(counts(4L) === ((1, 1, 1, 3)))
    assert(counts(5L) === ((0, 0, 0, 0)))
    // scrubbed bytes are exactly the placeholder-substituted text
    val want4 = "mix: [EMAIL] then [IP] then [PHONE] end"
    assert(out(4L).getAs[Int]("clean_len") === want4.length)
    val fp = java.security.MessageDigest
      .getInstance("MD5")
      .digest(want4.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    assert(out(4L).getAs[String]("clean_fp") === fp)
  }

  test("q104 pii scrub: dotted phone numbers are not mistaken for IPs and vice versa") {
    import spark.implicits._
    val docs = Seq((1L, "555.867.5309 and 1.2.3.4")).toDF("doc_id", "text")
    val r = Privacy.piiScrub(docs).collect().head
    assert(r.getAs[Int]("n_phones") === 1)
    assert(r.getAs[Int]("n_ips") === 1)
  }

  test("q104 pii scrub: the synthetic corpus is PII-free, so scrub is the identity") {
    val out = Privacy.q104PiiScrub(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("n_redactions") === 0), "testdata unexpectedly contains PII-shaped text")
    // identity scrub: fingerprint equals the raw text's md5
    val raw = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp"))
      .toMap
    out.foreach(r => assert(r.getAs[String]("clean_fp") === raw(r.getAs[Long]("doc_id"))))
  }
}
