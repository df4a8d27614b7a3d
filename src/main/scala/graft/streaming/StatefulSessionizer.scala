package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * extension row of the reference's streaming scorecard (SURVEY.md §2.3:
  * "stateful ops / late data — no → flatMapGroupsWithState"). Built-in
  * `session_window` covers gap-sessions declaratively (ops.Events e04);
  * this operator is the escape hatch for session logic the built-in
  * can't express (per-session aggregates beyond count, emit-on-close
  * semantics, custom timeout policy) and demonstrates the full state
  * lifecycle: per-key state, event-time timeout, emit-on-gap,
  * emit-on-watermark-timeout.
  *
  * Scale posture: state is one small record per ACTIVE user (not per
  * event) partitioned by user across executors; the watermark bounds
  * state lifetime, so steady-state memory is O(active sessions) — the
  * shape that survives an unbounded stream.
  */
object StatefulSessionizer {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(startUs: Long, lastUs: Long,
      n: Long, sum: Double)

  final case class CompletedSession(user_id: Long, session_start: Timestamp,
      n_events: Long, total_value: Double)

  /** Gap after which a session closes (same 30 min as ops.Events). */
  val GapUs: Long = 1800L * 1000 * 1000

  /** Sessionize an event-time stream. Sessions are emitted when a later
    * event of the same user arrives past the gap, or when the watermark
    * passes lastEvent + gap (event-time timeout).
    */
  def sessionize(ds: Dataset[SessionEvent],
      watermarkDelay: String = "10 minutes"): Dataset[CompletedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[CompletedSession]
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  // Full microsecond precision: Timestamp.getTime is ms-truncated, the
  // sub-second detail lives in getNanos — using getTime*1000 would floor
  // event times to ms and make gap decisions diverge from the µs-exact
  // batch operators (e03/e04) near the threshold.
  private def toUs(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def toTs(us: Long): Timestamp = {
    val ts = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  private[streaming] def update(userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[CompletedSession] = {
    if (state.hasTimedOut) {
      // Watermark passed lastEvent + gap: close and emit.
      val s = state.get
      state.remove()
      return Iterator(CompletedSession(userId, toTs(s.startUs), s.n, s.sum))
    }
    // Events within a micro-batch are unordered; sort before merging.
    val sorted = events.toSeq.sortBy(e => (toUs(e.ts), e.value))
    val out = Seq.newBuilder[CompletedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val us = toUs(e.ts)
      cur match {
        case Some(s) if us - s.lastUs >= GapUs =>
          out += CompletedSession(userId, toTs(s.startUs), s.n, s.sum)
          cur = Some(SessionState(us, us, 1, e.value))
        case Some(s) =>
          cur = Some(s.copy(lastUs = math.max(s.lastUs, us),
            n = s.n + 1, sum = s.sum + e.value))
        case None =>
          cur = Some(SessionState(us, us, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // Close when the watermark passes the gap after the last event.
      state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000)
    }
    out.result().iterator
  }
}
