package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Privacy-preserving telemetry export — the anonymization pass a training
  * pipeline runs before user-event data may enter a corpus. The reference
  * pipeline ships raw `player_id`s straight into its warehouse
  * (`data_processing.py` Task2); at training-data scale that is exactly the
  * column you must NOT ship. Three standard mechanisms compose here, all as
  * plain codegen'd expressions:
  *
  *   1. '''Pseudonymization''' — `md5(pepper || user_id)`: deterministic
  *      (joins still work downstream) but not reversible without the pepper.
  *   2. '''Generalization ladder''' — event time is coarsened day → week
  *      until the quasi-identifier group `(bucket, event_type)` reaches
  *      k distinct users (Mondrian-style local recoding with a fixed
  *      2-rung ladder); `value` is bucketed to width-10 bands.
  *   3. '''k-anonymity suppression''' — rows whose group clears neither
  *      rung are dropped, and the export reports how many.
  *
  * Scale shape: one scan of events + two tiny aggregates (day×type and
  * week×type cardinality — a few hundred rows even at 100 TB of events)
  * joined back by broadcast. No window over the full fact table, no
  * per-user state; the only full-data shuffle is the final presentation
  * sort, which a real export would skip entirely (shard files don't need a
  * global order).
  */
object Privacy {

  /** Distinct-user floor a quasi-identifier group must clear. */
  val K_ANON = 5

  /** Deterministic keyed pseudonym — the pepper stands in for a managed
    * secret; rotating it rotates the entire pseudonym space.
    */
  val PEPPER = "graft-pepper-v1"

  // ---------------------------------------------------------------------------
  // q85 — anonymized event export: pseudonymize + generalize (day→week
  // ladder) + k-suppress. Oracle-gated: every mechanism is deterministic
  // SQL, so DuckDB reproduces the export byte-for-byte.
  // ---------------------------------------------------------------------------
  def q85Anonymize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        col("event_type"),
        col("value"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week")
      )

    val dayOk = ev
      .groupBy(col("day"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("day_users"))
    val weekOk = ev
      .groupBy(col("week"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("week_users"))

    ev.join(broadcast(dayOk), Seq("day", "event_type"))
      .join(broadcast(weekOk), Seq("week", "event_type"))
      .withColumn(
        "granularity",
        when(col("day_users") >= K_ANON, "day")
          .when(col("week_users") >= K_ANON, "week")
          .otherwise("suppressed")
      )
      .filter(col("granularity") =!= "suppressed")
      .select(
        md5(concat(lit(PEPPER + ":"), col("user_id").cast("string"))).as("pseudo_id"),
        when(col("granularity") === "day", col("day")).otherwise(col("week")).as("bucket"),
        col("granularity"),
        col("event_type"),
        (floor(col("value") / 10) * 10).cast("long").as("val_band")
      )
      .orderBy(col("bucket"), col("granularity"), col("event_type"), col("pseudo_id"), col("val_band"))
  }

  val q85Oracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, value,
       |         strftime(date_trunc('day', ts),  '%Y-%m-%d') AS day,
       |         strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
       |  FROM events),
       |d AS (SELECT day,  event_type, count(DISTINCT user_id) AS day_users  FROM ev GROUP BY 1, 2),
       |w AS (SELECT week, event_type, count(DISTINCT user_id) AS week_users FROM ev GROUP BY 1, 2),
       |j AS (
       |  SELECT ev.*, d.day_users, w.week_users,
       |         CASE WHEN d.day_users  >= $K_ANON THEN 'day'
       |              WHEN w.week_users >= $K_ANON THEN 'week'
       |              ELSE 'suppressed' END AS granularity
       |  FROM ev
       |  JOIN d ON ev.day = d.day AND ev.event_type = d.event_type
       |  JOIN w ON ev.week = w.week AND ev.event_type = w.event_type)
       |SELECT md5('$PEPPER:' || user_id) AS pseudo_id,
       |       CASE WHEN granularity = 'day' THEN day ELSE week END AS bucket,
       |       granularity, event_type,
       |       CAST(floor(value / 10) * 10 AS BIGINT) AS val_band
       |FROM j WHERE granularity <> 'suppressed'
       |ORDER BY bucket, granularity, event_type, pseudo_id, val_band""".stripMargin

  // ---------------------------------------------------------------------------
  // q104 — PII scrub over document text: the C4/CCNet-style redaction pass a
  // web corpus runs before anything reaches a tokenizer. Emails, phone
  // numbers, and IPv4 literals are counted and replaced with typed
  // placeholders, with per-doc accounting and a post-scrub fingerprint so a
  // downstream stage can prove it consumed the scrubbed bytes.
  //
  // The patterns are deliberately written in the regex intersection both
  // Java (Spark codegen'd regexp_replace/regexp_extract_all) and RE2
  // (DuckDB) interpret identically — \b, \d, bounded repetition, plain
  // character classes; no backreferences or lookaround — so the scrub is
  // fully oracle-gated. Replacement order is fixed (email -> phone -> IP)
  // and each count is taken on the PREVIOUS stage's text, so an
  // email-domain dot can never double-count as part of an IP.
  //
  // Scale shape: pure per-row projection battery — one corpus scan, no
  // shuffle except the presentation sort, whole-stage codegen end to end.
  // The synthetic corpus contains no PII (TablesSpec pins it ASCII word
  // bags), so counts are zero on testdata; PrivacySpec plants a corpus with
  // real-shaped PII and asserts the exact redaction accounting.
  // ---------------------------------------------------------------------------
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PHONE_RE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Scrub any (doc_id, text) frame — exposed separately from q104 so specs
    * can drive planted corpora through the exact production expressions.
    */
  def piiScrub(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_emails", size(regexp_extract_all(col("text"), lit(EMAIL_RE), lit(0))))
      .withColumn("t1", regexp_replace(col("text"), EMAIL_RE, "[EMAIL]"))
      .withColumn("n_phones", size(regexp_extract_all(col("t1"), lit(PHONE_RE), lit(0))))
      .withColumn("t2", regexp_replace(col("t1"), PHONE_RE, "[PHONE]"))
      .withColumn("n_ips", size(regexp_extract_all(col("t2"), lit(IP_RE), lit(0))))
      .withColumn("clean_text", regexp_replace(col("t2"), IP_RE, "[IP]"))
      .select(
        col("doc_id"),
        col("n_emails"),
        col("n_phones"),
        col("n_ips"),
        (col("n_emails") + col("n_phones") + col("n_ips")).as("n_redactions"),
        length(col("clean_text")).as("clean_len"),
        md5(col("clean_text")).as("clean_fp")
      )

  def q104PiiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrub(Tables.balanced(Tables.documents(spark, dir).select(col("doc_id"), col("text"))))
      .orderBy(col("doc_id"))

  val q104Oracle: String =
    s"""WITH s AS (
       |  SELECT doc_id, text,
       |         regexp_replace(text, '$EMAIL_RE', '[EMAIL]', 'g') AS t1
       |  FROM documents),
       |s2 AS (
       |  SELECT *, regexp_replace(t1, '$PHONE_RE', '[PHONE]', 'g') AS t2 FROM s),
       |s3 AS (
       |  SELECT *, regexp_replace(t2, '$IP_RE', '[IP]', 'g') AS clean_text FROM s2)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$EMAIL_RE')) AS INT) AS n_emails,
       |       CAST(len(regexp_extract_all(t1, '$PHONE_RE')) AS INT) AS n_phones,
       |       CAST(len(regexp_extract_all(t2, '$IP_RE')) AS INT) AS n_ips,
       |       CAST(len(regexp_extract_all(text, '$EMAIL_RE'))
       |            + len(regexp_extract_all(t1, '$PHONE_RE'))
       |            + len(regexp_extract_all(t2, '$IP_RE')) AS INT) AS n_redactions,
       |       CAST(length(clean_text) AS INT) AS clean_len,
       |       md5(clean_text) AS clean_fp
       |FROM s3
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_anonymize" -> (q85Anonymize _),
    "q104_pii_scrub" -> (q104PiiScrub _)
  )

  val oracles: Map[String, String] = Map(
    "q85_anonymize" -> q85Oracle,
    "q104_pii_scrub" -> q104Oracle
  )
}
