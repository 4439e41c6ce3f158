package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Event-time operators (SURVEY §2.9 generalized): the reference's whole
  * pipeline is "bucket events into hours, densify, report"
  * (`data_processing.py:238-362`); these re-express that shape over the
  * `events` table plus the temporal operators a real event pipeline needs
  * (tumbling windows, sessionization, as-of attribution, JSON props).
  *
  * Scale notes:
  *   - The dense scaffold is built from `sequence()` + explode of ONE row
  *     (min/max), then broadcast-joined against the aggregated counts — the
  *     big table is touched once, aggregated map-side, and the join input is
  *     already tiny (one row per hour), mirroring the reference's
  *     `spark.range(0,24)` left-join but unbounded in time span.
  *   - Sessionization and as-of join are single-shuffle window constructions
  *     (partition by user), NOT range self-joins — a range join would be
  *     O(n·m) per user at 100 TB; the union+last() trick is O(n log n).
  */
object Temporal {

  // ---------------------------------------------------------------------------
  // q20 — dense hourly report (reference J1/S6 generalized): hourly click and
  // view counts on a zero-filled scaffold spanning min..max event time.
  // ---------------------------------------------------------------------------
  def q20HourlyDense(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val hourly = ev
      .filter(col("event_type").isin("click", "view"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("hour"))
      .pivot("event_type", Seq("click", "view"))
      .sum("n")
    val scaffold = ev
      .agg(date_trunc("hour", min(col("ts"))).as("h0"), date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    scaffold
      .join(hourly, Seq("hour"), "left")
      .na
      .fill(0, Seq("click", "view"))
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("click").as("click_count"),
        col("view").as("view_count")
      )
      .orderBy(col("hour"))
  }

  val q20Oracle: String =
    """WITH bounds AS (
      |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM events),
      |scaffold AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds),
      |hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour,
      |         count(*) FILTER (event_type = 'click') AS click_count,
      |         count(*) FILTER (event_type = 'view') AS view_count
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1)
      |SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
      |       coalesce(h.click_count, 0) AS click_count,
      |       coalesce(h.view_count, 0) AS view_count
      |FROM scaffold s LEFT JOIN hourly h ON s.hour = h.hour
      |ORDER BY hour""".stripMargin

  // ---------------------------------------------------------------------------
  // q21 — tumbling event-time window via window() (SURVEY §2.9 T4): daily
  // windows per event type with count + value sum. Same expression works
  // unchanged under Structured Streaming with a watermark.
  // ---------------------------------------------------------------------------
  def q21TumblingDaily(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"),
        col("n_events"),
        col("total_value")
      )
      .orderBy(col("day"), col("event_type"))

  val q21Oracle: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       event_type,
      |       count(*) AS n_events,
      |       round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q22 — gap-based sessionization (30-min inactivity): lag + cumulative flag
  // sum per user. One shuffle on user_id; state never leaves the partition.
  // (user_id, ts) is unique in the data; event_id tiebreak keeps it total.
  // ---------------------------------------------------------------------------
  /** Events with their gap-session assignment (30-min inactivity) — q22's
    * state machine, shared with the q95 sequence export.
    */
  private def sessionAssigned(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0)
      )
      .withColumn("session_idx", sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def q22Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val flagged = sessionAssigned(Tables.events(spark, dir))
    flagged
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value")
      )
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q22Oracle: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         -- CAST: DuckDB sum(INT) is HUGEINT; Spark emits BIGINT.
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged)
      |SELECT user_id, session_idx,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |       count(*) AS n_events,
      |       round(sum(value), 2) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------------------
  // q23 — as-of join (last-touch attribution): each purchase matched to the
  // user's most recent click at-or-before it. Implemented as tag + union +
  // last(_, ignoreNulls) over one user-partitioned window — the scalable
  // as-of pattern (no range self-join; single shuffle; O(n log n) sort).
  // Clicks sort before purchases at equal ts so a same-instant click counts.
  // ---------------------------------------------------------------------------
  def q23AsofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"), col("ts").as("click_ts"))
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"), lit(null).cast("timestamp").as("click_ts"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks
      .unionAll(purchases)
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(
        col("user_id"),
        col("event_id").as("purchase_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss").as("attributed_click_ts"),
        (col("ts").cast("long") - col("last_click_ts").cast("long")).as("seconds_since_click")
      )
      .orderBy(col("user_id"), col("purchase_event_id"))
  }

  val q23Oracle: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id, 0 AS tag, ts AS click_ts
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, event_id, 1 AS tag, NULL AS click_ts
      |  FROM events WHERE event_type = 'purchase'),
      |attributed AS (
      |  SELECT user_id, ts, event_id, tag,
      |         last_value(click_ts IGNORE NULLS) OVER
      |           (PARTITION BY user_id ORDER BY ts, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      |  FROM tagged)
      |SELECT user_id,
      |       event_id AS purchase_event_id,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |       strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') AS attributed_click_ts,
      |       floor(epoch(ts))::BIGINT - floor(epoch(last_click_ts))::BIGINT AS seconds_since_click
      |FROM attributed
      |WHERE tag = 1
      |ORDER BY user_id, purchase_event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q24 — JSON property extraction (SURVEY §2.12: JSON functions absent in the
  // reference, added ★): parse props JSON, aggregate the extracted key.
  // get_json_object is codegen'd — no UDF.
  // ---------------------------------------------------------------------------
  def q24JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(avg(col("k")), 4).as("avg_k")
      )
      .orderBy(col("event_type"))

  val q24Oracle: String =
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(min(json_extract(props, '$.k')::INT) AS INT) AS min_k,
      |       CAST(max(json_extract(props, '$.k')::INT) AS INT) AS max_k,
      |       round(avg(json_extract(props, '$.k')::INT), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q63 — cohort retention: users grouped by first-seen date, retention =
  // share of each cohort active again N days later. The standard
  // product-analytics shape (cohort matrix) the reference's hourly report is
  // a 1-day special case of.
  //
  // Scale shape: first-seen is ONE min-aggregate shuffled on user_id;
  // activity days are a distinct over (user, day) — also user-keyed, so
  // both sides of the cohort join arrive co-partitioned (no extra
  // exchange); the final (cohort, offset) aggregate is tiny. No window
  // over the full event stream, no self-join of raw events.
  // ---------------------------------------------------------------------------
  def q63CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), to_date(col("ts")).as("d"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_date"))
    val activeDays = ev.distinct()
    val cohortSizes = firstSeen.groupBy(col("cohort_date")).agg(count(lit(1)).as("cohort_size"))
    activeDays
      .join(firstSeen, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")))
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSizes, "cohort_date")
      .withColumn(
        "retention_pct",
        // floor-form rounding in double (see q12): engine-agnostic at boundaries
        expr("floor(cast(n_active AS double) * 1e2 / cast(cohort_size AS double) * 1e4 + 5e-1) / 1e4")
      )
      // ISO string, not DATE: Spark date32 lands in pandas as object while
      // DuckDB DATE lands as datetime64 — a driver-gate dtype mismatch
      .select(
        col("cohort_date").cast("string").as("cohort_date"),
        col("day_offset"),
        col("n_active"),
        col("cohort_size"),
        col("retention_pct")
      )
      .orderBy(col("cohort_date"), col("day_offset"))
  }

  val q63Oracle: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |first_seen AS (SELECT user_id, min(d) AS cohort_date FROM ev GROUP BY user_id),
      |active_days AS (SELECT DISTINCT user_id, d FROM ev),
      |cohort_sizes AS (SELECT cohort_date, CAST(count(*) AS BIGINT) AS cohort_size
      |                 FROM first_seen GROUP BY cohort_date),
      |activity AS (
      |  SELECT f.cohort_date, date_diff('day', f.cohort_date, a.d) AS day_offset,
      |         CAST(count(*) AS BIGINT) AS n_active
      |  FROM active_days a JOIN first_seen f USING (user_id)
      |  GROUP BY 1, 2)
      |SELECT CAST(cohort_date AS VARCHAR) AS cohort_date, CAST(day_offset AS INT) AS day_offset, n_active, cohort_size,
      |       floor(CAST(n_active AS DOUBLE) * 1e2 / CAST(cohort_size AS DOUBLE) * 1e4 + 5e-1) / 1e4
      |         AS retention_pct
      |FROM activity JOIN cohort_sizes USING (cohort_date)
      |ORDER BY cohort_date, day_offset""".stripMargin

  // ---------------------------------------------------------------------------
  // q89 — SCD Type-2 history build: each user's event_type stream compressed
  // into versioned validity intervals (valid_from, valid_to, version,
  // is_current) — the slowly-changing-dimension shape every warehouse keeps
  // for "what was this entity's state at time T" queries, built from an
  // append-only event log in two window passes over ONE user-keyed shuffle:
  // pass 1 drops rows equal to their predecessor (run-length compression),
  // pass 2 closes each surviving interval with the next one's start.
  // (ts, event_id) is a total order, so version numbers are deterministic.
  // At 100 TB the shuffle is the unavoidable one (state is per-user); both
  // windows reuse the same partitioning, so it's paid once.
  // ---------------------------------------------------------------------------
  /** Typed SCD2 core over any (user_id, event_type, ts, event_id) frame,
    * with `version` continuing from an optional per-row offset column
    * `voff` (0 when absent): (user_id, state, valid_from, valid_to TIMESTAMP,
    * version, is_current).
    */
  private[graft] def scd2Of(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withOff = if (ev.columns.contains("voff")) ev else ev.withColumn("voff", lit(0))
    val changes = withOff
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", (row_number().over(w) + col("voff")).cast("int"))
      .select(
        col("user_id"),
        col("event_type").as("state"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("version"),
        col("valid_to").isNull.as("is_current")
      )
  }

  /** SCD2 history for the whole event log (typed timestamps). */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Of(Tables.events(spark, dir))

  /** Incremental SCD2 merge: fold a delta batch (events strictly after the
    * history's build horizon) into an existing history WITHOUT rebuilding
    * untouched users — the micro-batch shape of dimension maintenance. Per
    * affected user, only the OPEN interval participates: it is re-seeded as
    * the first pseudo-event (version continues from its number), closed
    * intervals pass through untouched, and `scd2Apply(scd2(≤T), events>T)`
    * equals `scd2(all)` row-for-row (the spec's invariant). At 100 TB the
    * win is proportional: the delta shuffle covers the users who CHANGED
    * this batch, not the dimension.
    */
  def scd2Apply(history: DataFrame, delta: DataFrame): DataFrame = {
    val affected = delta.select(col("user_id")).distinct()
    val untouched = history.join(affected, Seq("user_id"), "left_anti")
    val touched = history.join(broadcast(affected), Seq("user_id"))
    val closed = touched.filter(!col("is_current"))
    // the open interval re-enters as the seed pseudo-event; MinValue
    // event_id keeps it first among equal timestamps (delta is strictly
    // later anyway), and its version number anchors the continuation
    val seeds = touched
      .filter(col("is_current"))
      .select(
        col("user_id"),
        col("state").as("event_type"),
        col("valid_from").as("ts"),
        lit(Long.MinValue).as("event_id"),
        (col("version") - 1).as("voff")
      )
    // brand-new users (in delta, absent from history) start at version 1
    val voffs = seeds.select(col("user_id"), col("voff"))
    val dev = delta
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .join(broadcast(voffs), Seq("user_id"), "left")
      .na
      .fill(0, Seq("voff"))
    val rebuilt = scd2Of(seeds.unionByName(dev))
    untouched.unionByName(closed).unionByName(rebuilt)
  }

  def q89Scd2(spark: SparkSession, dir: String): DataFrame =
    scd2History(spark, dir)
      .select(
        col("user_id"),
        col("state"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
        col("version"),
        col("is_current")
      )
      .orderBy(col("user_id"), col("version"))

  val q89Oracle: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
      |  FROM events),
      |ch AS (
      |  SELECT * FROM ordered WHERE prev_state IS NULL OR prev_state <> event_type),
      |v AS (
      |  SELECT user_id, event_type, ts,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ts,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
      |  FROM ch)
      |SELECT user_id, event_type AS state,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |       strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |       version,
      |       (valid_to_ts IS NULL) AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------------------
  // q95 — behavioral sequence export: each gap-session becomes one training
  // example for a sequence model (recommender / next-action pretraining):
  // the session's ordered event-type sequence, plus a fixed-width (8-slot,
  // '<pad>'-filled) window of its start — the tensor-shaped view a trainer
  // consumes. Ordered collect is array_sort over (row_number, type) structs,
  // so the sequence order is the (ts, event_id) total order regardless of
  // aggregation order; the only full-data shuffle is the session window's
  // user partition, shared with q22.
  // ---------------------------------------------------------------------------
  private val SEQ_W = 8

  def q95EventSequences(spark: SparkSession, dir: String): DataFrame = {
    val w2 = Window.partitionBy(col("user_id"), col("session_idx")).orderBy(col("ts"), col("event_id"))
    sessionAssigned(Tables.events(spark, dir))
      .withColumn("rn", row_number().over(w2))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), collect_list(struct(col("rn"), col("event_type"))).as("evs"))
      .withColumn("seq_arr", expr("transform(array_sort(evs), x -> x.event_type)"))
      .select(
        col("user_id"),
        col("session_idx"),
        col("n_events"),
        array_join(col("seq_arr"), ",").as("seq"),
        concat(
          array_join(slice(col("seq_arr"), 1, SEQ_W), ","),
          expr(s"repeat(',<pad>', greatest(0, $SEQ_W - size(seq_arr)))")
        ).as("example")
      )
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q95Oracle: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id, event_type,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT user_id, ts, event_id, event_type,
       |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM flagged),
       |seqs AS (
       |  SELECT user_id, session_idx,
       |         count(*) AS n_events,
       |         list(event_type ORDER BY ts, event_id) AS seq_arr
       |  FROM sessions GROUP BY user_id, session_idx)
       |SELECT user_id, session_idx, n_events,
       |       array_to_string(seq_arr, ',') AS seq,
       |       array_to_string(list_slice(seq_arr, 1, $SEQ_W), ',')
       |         || repeat(',<pad>', greatest(0, $SEQ_W - len(seq_arr))) AS example
       |FROM seqs ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------------------
  // q96 — EWMA anomaly detection on the daily event-count series: each
  // (event_type, day) compared against the exponentially-weighted moving
  // average of its own trailing 10 days (excluding today), flagged when it
  // leaves the [0.5, 1.5]× band — the ops-monitoring readout over an event
  // pipeline ("did clicks fall off a cliff overnight?"). The corpus-sized
  // work is the first groupBy; the window then runs over the tiny
  // (type × day) aggregate, so the operator costs one scan at any scale.
  //
  // Exactness: α = 0.5 makes every weight a power of two, so the weighted
  // sums are exact dyadic arithmetic — bit-identical in both engines with
  // no rounding-order risk; only the final ratio is floor-rounded.
  // ---------------------------------------------------------------------------
  def q96EwmaAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day")).rowsBetween(-10, -1)
    daily
      .withColumn("xs", collect_list(col("n_events")).over(w))
      .withColumn(
        "ewma",
        expr(
          // newest trailing day gets weight 1, each older day halves;
          // den = 2 - 0.5^(k-1) is the closed-form weight sum
          """CASE WHEN size(xs) = 0 THEN NULL ELSE
            |floor(aggregate(sequence(1, size(xs)), 0D,
            |        (a, i) -> a + cast(element_at(xs, i) AS double) * power(5e-1, size(xs) - i))
            |      / (2e0 - power(5e-1, size(xs) - 1)) * 1e6 + 5e-1) / 1e6 END""".stripMargin
        )
      )
      .withColumn(
        "flag",
        when(col("ewma").isNull, lit("warmup"))
          .when(col("n_events") > col("ewma") * 1.5, lit("spike"))
          .when(col("n_events") < col("ewma") * 0.5, lit("drop"))
          .otherwise(lit("normal"))
      )
      .select(col("event_type"), col("day"), col("n_events"), col("ewma"), col("flag"))
      .orderBy(col("event_type"), col("day"))
  }

  val q96Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |win AS (
      |  SELECT event_type, day, n_events,
      |         list(n_events) OVER (PARTITION BY event_type ORDER BY day
      |                              ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS xs
      |  FROM daily),
      |e AS (
      |  SELECT event_type, day, n_events,
      |         CASE WHEN len(xs) = 0 THEN NULL ELSE
      |           floor(list_sum(list_transform(range(1, len(xs) + 1),
      |                   i -> xs[i]::DOUBLE * pow(5e-1, len(xs) - i)))
      |                 / (2e0 - pow(5e-1, len(xs) - 1)) * 1e6 + 5e-1) / 1e6 END AS ewma
      |  FROM win)
      |SELECT event_type, day, n_events, ewma,
      |       CASE WHEN ewma IS NULL THEN 'warmup'
      |            WHEN n_events > ewma * 1.5 THEN 'spike'
      |            WHEN n_events < ewma * 0.5 THEN 'drop'
      |            ELSE 'normal' END AS flag
      |FROM e ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------------------
  // q97 — ordered conversion funnel (view → click → purchase): how many
  // users complete each step IN ORDER, with step-to-step conversion rates —
  // the product-analytics readout (distinct from q72's curation funnel,
  // which is a rule battery). Each step is "earliest qualifying event
  // strictly after the previous step's time": three per-user min-aggregates
  // chained by user-keyed joins, all shuffling on the same user_id key (one
  // partitioning reused; step frames only shrink). Ties at the exact same
  // timestamp break by event_id — (ts, event_id) is the total order used
  // everywhere else.
  // ---------------------------------------------------------------------------
  def q97ConversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      // one orderable long key: micros×1000 + id%1000 (< 2^61, no overflow)
      // keeps the (ts, event_id) order for same-instant events
      .select(
        col("user_id"),
        col("event_type"),
        (unix_micros(col("ts")) * 1000L + pmod(col("event_id"), lit(1000L))).as("k")
      )
    def step(of: String, prev: DataFrame, prevKey: String, outKey: String) =
      ev.filter(col("event_type") === of)
        .join(prev, Seq("user_id"))
        .filter(col("k") > col(prevKey))
        .groupBy(col("user_id"))
        .agg(min(col("k")).as(outKey))
    val s1 = ev.filter(col("event_type") === "view").groupBy(col("user_id")).agg(min(col("k")).as("k1"))
    val s2 = step("click", s1, "k1", "k2")
    val s3 = step("purchase", s2, "k2", "k3")
    val total = ev.select(col("user_id")).distinct().count()
    s1.select(count(lit(1)).as("n_view"))
      .crossJoin(s2.select(count(lit(1)).as("n_view_click")))
      .crossJoin(s3.select(count(lit(1)).as("n_full_funnel")))
      .select(
        lit(total).as("n_users"),
        col("n_view"),
        col("n_view_click"),
        col("n_full_funnel"),
        // CASE (not AND): an empty step count is a legal funnel state (empty
        // corpus / nobody clicked) and ANSI division would THROW — the rate
        // out of a zero-population step is NULL in both engines by contract
        expr(
          "CASE WHEN n_view = 0 THEN NULL ELSE floor(cast(n_view_click AS double) / n_view * 1e6 + 5e-1) / 1e6 END"
        ).as("rate_click"),
        expr(
          "CASE WHEN n_view_click = 0 THEN NULL ELSE floor(cast(n_full_funnel AS double) / n_view_click * 1e6 + 5e-1) / 1e6 END"
        ).as("rate_purchase")
      )
  }

  val q97Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |         epoch_us(ts) * 1000 + (event_id % 1000) AS k
      |  FROM events),
      |s1 AS (SELECT user_id, min(k) AS k1 FROM ev WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT ev.user_id, min(k) AS k2 FROM ev JOIN s1 ON ev.user_id = s1.user_id
      |       WHERE event_type = 'click' AND k > k1 GROUP BY 1),
      |s3 AS (SELECT ev.user_id, min(k) AS k3 FROM ev JOIN s2 ON ev.user_id = s2.user_id
      |       WHERE event_type = 'purchase' AND k > k2 GROUP BY 1)
      |SELECT (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
      |       (SELECT count(*) FROM s1) AS n_view,
      |       (SELECT count(*) FROM s2) AS n_view_click,
      |       (SELECT count(*) FROM s3) AS n_full_funnel,
      |       CASE WHEN (SELECT count(*) FROM s1) = 0 THEN NULL ELSE
      |         floor((SELECT count(*) FROM s2)::DOUBLE / (SELECT count(*) FROM s1) * 1e6 + 5e-1) / 1e6 END AS rate_click,
      |       CASE WHEN (SELECT count(*) FROM s2) = 0 THEN NULL ELSE
      |         floor((SELECT count(*) FROM s3)::DOUBLE / (SELECT count(*) FROM s2) * 1e6 + 5e-1) / 1e6 END AS rate_purchase""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_hourly_dense" -> (q20HourlyDense _),
    "q21_tumbling_daily" -> (q21TumblingDaily _),
    "q22_sessionize" -> (q22Sessionize _),
    "q23_asof_attribution" -> (q23AsofAttribution _),
    "q24_json_props" -> (q24JsonProps _),
    "q63_cohort_retention" -> (q63CohortRetention _),
    "q89_scd2" -> (q89Scd2 _),
    "q95_event_sequences" -> (q95EventSequences _),
    "q96_ewma_anomaly" -> (q96EwmaAnomaly _),
    "q97_conversion_funnel" -> (q97ConversionFunnel _)
  )

  val oracles: Map[String, String] = Map(
    "q20_hourly_dense" -> q20Oracle,
    "q21_tumbling_daily" -> q21Oracle,
    "q22_sessionize" -> q22Oracle,
    "q23_asof_attribution" -> q23Oracle,
    "q24_json_props" -> q24Oracle,
    "q63_cohort_retention" -> q63Oracle,
    "q89_scd2" -> q89Oracle,
    "q95_event_sequences" -> q95Oracle,
    "q96_ewma_anomaly" -> q96Oracle,
    "q97_conversion_funnel" -> q97Oracle
  )
}
