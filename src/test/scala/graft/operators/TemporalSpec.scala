package graft.operators

import graft.SparkSpec

/** Structural invariants for the event-time inventory at sf0.001. */
class TemporalSpec extends SparkSpec {

  test("q20 dense hourly scaffold: contiguous hours, zero-filled, no nulls") {
    val rows = Temporal.q20HourlyDense(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val hours = rows.map(r => java.time.LocalDateTime.parse(r.getString(0), fmt))
    hours.zip(hours.tail).foreach { case (a, b) => assert(java.time.Duration.between(a, b).toHours == 1) }
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2))
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
    }
  }

  test("q22 sessions: indexes dense from 1, start <= end, events partition exactly") {
    val rows = Temporal.q22Sessionize(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val idx = rs.map(_.getLong(1)).sorted
      assert(idx.sameElements(1L to rs.length))
      rs.foreach(r => assert(r.getString(2) <= r.getString(3)))
    }
    val totalEvents = rows.map(_.getAs[Long]("n_events")).sum
    assert(totalEvents === graft.core.Tables.events(spark, sfDir).count())
  }

  test("q23 as-of: attribution never in the future, one row per purchase") {
    val rows = Temporal.q23AsofAttribution(spark, sfDir).collect()
    val purchases = graft.core.Tables
      .events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(rows.length === purchases)
    rows.filter(!_.isNullAt(4)).foreach(r => assert(r.getLong(4) >= 0))
  }

  test("q89 scd2: intervals tile each user's timeline, versions dense, one current") {
    val rows = Temporal.q89Scd2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val ordered = rs.sortBy(_.getInt(4))
      // versions are 1..n dense
      assert(ordered.map(_.getInt(4)).sameElements(1 to ordered.length))
      // exactly one open (current) interval per user, and it is the last
      assert(ordered.count(_.getBoolean(5)) === 1)
      assert(ordered.last.getBoolean(5))
      // intervals tile: each valid_to == next valid_from, valid_from < valid_to
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(3) === b.getString(2), s"gap between v${a.getInt(4)} and v${b.getInt(4)}")
          assert(a.getString(2) < a.getString(3))
        case _ =>
      }
      // run-length compression: consecutive versions always change state
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) !== b.getString(1))
        case _           =>
      }
    }
  }

  test("scd2Apply: incremental merge over a time-split equals the full rebuild") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sfDir)
    val cut = ev.stat.approxQuantile("event_id", Array(0.5), 0.0).head.toLong
    // split on event time so the delta is strictly later than the horizon
    val tcut = ev.agg(expr("percentile_approx(cast(ts AS double), 0.5, 10000)")).head().getDouble(0)
    val before = ev.filter(col("ts").cast("double") <= tcut)
    val after = ev.filter(col("ts").cast("double") > tcut)
    assert(before.count() > 0 && after.count() > 0, s"degenerate split at $tcut (cut id $cut)")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "state", "valid_from", "valid_to", "version", "is_current")
        .collect()
        .map(_.toSeq.map(v => if (v == null) "∅" else v.toString))
        .map(_.mkString("|"))
        .sorted

    val merged = Temporal.scd2Apply(Temporal.scd2Of(before), after)
    val full = Temporal.scd2Of(ev)
    assert(canon(merged).sameElements(canon(full)), "incremental != rebuild")
  }

  test("q95 event sequences: per-session order exact, example always 8 slots") {
    import org.apache.spark.sql.functions._
    val rows = Temporal.q95EventSequences(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // sequences reconstruct from the raw events in (ts, event_id) order
    val raw = graft.core.Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val byUser = raw.groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._4).toList).toMap
    // session boundaries come from q22 — cross-check counts line up with it
    val sess = Temporal.q22Sessionize(spark, sfDir).collect()
    val sessCount = sess.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n_events")).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === sessCount(key), s"$key n_events vs q22")
      val seq = r.getString(3).split(",", -1)
      assert(seq.length.toLong === r.getLong(2), s"$key seq length")
      val ex = r.getString(4).split(",", -1)
      assert(ex.length === 8, s"$key example not 8 slots: ${r.getString(4)}")
      assert(ex.takeWhile(_ != "<pad>").sameElements(seq.take(8)), s"$key example prefix")
      if (seq.length < 8) assert(ex.drop(seq.length).forall(_ == "<pad>"), s"$key padding")
    }
    // per-user concatenation of session sequences == the user's full ordered stream
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val concat = rs.sortBy(_.getLong(1)).flatMap(_.getString(3).split(",", -1)).toList
      assert(concat === byUser(u), s"user $u sequence stitch")
    }
  }

  test("q96 ewma anomaly: trailing average recomputes exactly, flags honor the band") {
    val rows = Temporal.q96EwmaAnomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { series =>
      val ordered = series.sortBy(_.getString(1))
      // first day of each series is warmup (empty trailing window)
      assert(ordered.head.getString(4) === "warmup")
      ordered.zipWithIndex.drop(1).foreach { case (r, i) =>
        val xs = ordered.slice(math.max(0, i - 10), i).map(_.getLong(2))
        val k = xs.length
        val num = xs.zipWithIndex.map { case (x, j) => x.toDouble * math.pow(0.5, k - j - 1) }.sum
        val den = 2.0 - math.pow(0.5, k - 1)
        val expected = math.floor(num / den * 1e6 + 0.5) / 1e6
        assert(math.abs(r.getDouble(3) - expected) < 1e-9, s"${r.getString(0)} ${r.getString(1)} ewma")
        val n = r.getLong(2).toDouble
        val want =
          if (n > expected * 1.5) "spike" else if (n < expected * 0.5) "drop" else "normal"
        assert(r.getString(4) === want, s"${r.getString(0)} ${r.getString(1)} flag")
      }
    }
  }

  test("q97 conversion funnel: step counts replay from the raw event order") {
    val row = Temporal.q97ConversionFunnel(spark, sfDir).collect().head
    val evs = graft.core.Tables
      .events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) * 1000 + pmod(event_id, 1000) AS k", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = evs.groupBy(_._1)
    def firstAfter(u: Long, typ: String, after: Long): Option[Long] =
      byUser(u).filter(e => e._3 == typ && e._2 > after).map(_._2).minOption
    var (s1, s2, s3) = (0L, 0L, 0L)
    byUser.keys.foreach { u =>
      firstAfter(u, "view", Long.MinValue).foreach { t1 =>
        s1 += 1
        firstAfter(u, "click", t1).foreach { t2 =>
          s2 += 1
          firstAfter(u, "purchase", t2).foreach(_ => s3 += 1)
        }
      }
    }
    assert(row.getLong(0) === byUser.size.toLong)
    assert(row.getLong(1) === s1, "n_view")
    assert(row.getLong(2) === s2, "n_view_click")
    assert(row.getLong(3) === s3, "n_full_funnel")
    assert(row.getLong(1) >= row.getLong(2) && row.getLong(2) >= row.getLong(3), "monotone funnel")
    assert(math.abs(row.getDouble(4) - math.floor(s2.toDouble / s1 * 1e6 + 0.5) / 1e6) < 1e-9)
  }
}
