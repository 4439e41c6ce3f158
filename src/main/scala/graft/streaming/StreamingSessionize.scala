package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState (SURVEY
  * §2.9 T7: absent in the reference — added ★). Batch q22 computes sessions
  * with a window; this is the unbounded-stream version: per-user state holds
  * the open session, an event-time timeout at (last event + gap) closes and
  * emits it.
  *
  * Scale notes: state is one small record per ACTIVE user (not per event);
  * the event-time timeout + watermark guarantee state is dropped once a
  * session can no longer change — bounded memory at any user cardinality
  * when backed by the RocksDB state store on a real cluster.
  */
object StreamingSessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Timestamp, end: Timestamp, n: Long, total: Double)
  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      session_value: Double
  )

  val GapMs: Long = 30 * 60 * 1000L

  /** Sessionize a watermarked event stream. Input MUST already have
    * `withWatermark("ts", ...)` applied — the event-time timeout needs it.
    */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      )(updateState)
  }

  private[streaming] def updateState(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]
  ): Iterator[Session] = {
    if (events.isEmpty && state.hasTimedOut) {
      // watermark passed session end + gap: emit and drop
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start, s.end, s.n, round2(s.total)))
    }

    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[Session]
    var cur = state.getOption

    sorted.foreach { e =>
      cur match {
        // within the gap of EITHER boundary: extend (a late event can land
        // just before the open session's start and still belong to it)
        case Some(s)
            if e.ts.getTime - s.end.getTime <= GapMs &&
              s.start.getTime - e.ts.getTime <= GapMs =>
          cur = Some(SessionState(minTs(s.start, e.ts), maxTs(s.end, e.ts), s.n + 1, s.total + e.value))
        // late orphan: older than (start - gap). Its own session was already
        // timed out and emitted (the watermark passed it), so emit it as a
        // standalone late session rather than corrupting the open one.
        case Some(s) if e.ts.getTime < s.start.getTime - GapMs =>
          closed ::= Session(userId, e.ts, e.ts, 1, round2(e.value))
        // beyond the gap after the end: close current, open new
        case Some(s) =>
          closed ::= Session(userId, s.start, s.end, s.n, round2(s.total))
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
      }
    }

    cur.foreach { s =>
      state.update(s)
      // close when the watermark passes the gap after the last event
      state.setTimeoutTimestamp(s.end.getTime + GapMs)
    }
    closed.reverseIterator
  }

  private def maxTs(a: Timestamp, b: Timestamp): Timestamp = if (a.after(b)) a else b
  private def minTs(a: Timestamp, b: Timestamp): Timestamp = if (a.before(b)) a else b
  private def round2(d: Double): Double = math.rint(d * 100) / 100
}
