package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One buffered event awaiting watermark finality. */
case class AsofEvt(tsUs: Long, eventId: Long, isClick: Boolean)

/** Per-user carried state: the latest FINAL click (below the
  * watermark) and the not-yet-final event buffer.
  */
case class AsofState(clickTs: Long, clickId: Long, hasClick: Boolean,
    buf: Seq[AsofEvt])

/** One enriched purchase (click_id/gap_us null when no prior click —
  * e08's LEFT semantics).
  */
case class AsofOut(purchase_id: Long, user_id: Long,
    click_id: java.lang.Long, gap_us: java.lang.Long)

/** STREAMING as-of enrichment — the stateful form of e08's batch as-of
  * join (purchase → latest strictly-prior click of the same user),
  * built on `flatMapGroupsWithState` because no built-in streaming
  * operator expresses it: stream-stream interval joins (e19) bound the
  * match window on BOTH sides, but "latest prior, however old" needs
  * per-key ordered state — the custom-state preference rung of SURVEY
  * §4.3, same as StatefulSessionizer.
  *
  * Correctness discipline: an event's enrichment is only FINAL once the
  * watermark passes its timestamp (an earlier click could still
  * arrive), so each invocation buffers arrivals, emits exactly the
  * purchases at-or-below the watermark — scanning them in the
  * (ts, event_id) total order e08's window uses, seeded by the carried
  * final click — and retains the rest. Readiness compares at MS
  * precision (`tsUs / 1000 <= watermarkMs`) because Spark's watermark
  * arithmetic floors event times to milliseconds; a µs-precision
  * compare would strand the max-timestamp events forever. Emitted rows
  * are append-mode exact-once (an event leaves the buffer when it
  * emits). The gate runs with a 0-second watermark delay so the
  * bounded fixture converges to the batch answer; a production
  * deployment sets a real delay and adds EventTimeTimeout state
  * eviction for departed users — semantics are unchanged, only the
  * finality lag moves.
  *
  * Scale shape: one shuffle on user_id (the same key the batch form
  * shuffles on), per-key state = one click + the sub-watermark-lag
  * buffer (bounded by arrival lag, not history), RocksDB-backed like
  * every gate.
  */
object AsofEnricher {

  /** `events` needs (user_id, ts TIMESTAMP watermarked, event_id,
    * event_type); returns (purchase_id, user_id, click_id, gap_us).
    */
  def enrich(s: SparkSession, events: DataFrame): DataFrame = {
    import s.implicits._
    events
      // the raw `ts` column rides along UNPROJECTED: it carries the
      // watermark metadata tag, and flatMapGroupsWithState refuses to
      // expose getCurrentWatermarkMs unless the tagged column survives
      // into its input (the µs projection strips metadata)
      .select($"user_id".cast("long").as("uid"),
        unix_micros($"ts").as("ts_us"),
        $"event_id".cast("long").as("eid"),
        ($"event_type" === "click").as("is_click"),
        $"ts")
      .as[(Long, Long, Long, Boolean, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }

  private def update(userId: Long,
      rows: Iterator[(Long, Long, Long, Boolean, java.sql.Timestamp)],
      st: GroupState[AsofState]): Iterator[AsofOut] = {
    val prev = st.getOption.getOrElse(AsofState(0L, 0L, false, Nil))
    val all = prev.buf ++
      rows.map(r => AsofEvt(r._2, r._3, r._4)).toSeq
    val wmMs = st.getCurrentWatermarkMs()
    // FINALITY BOUNDARY, explicit (round-12 advisory): an event is
    // final when its MILLISECOND (Spark floors event times to ms for
    // all watermark math) is <= the watermark. Spark's late-row filter
    // drops rows strictly BELOW the watermark, so a same-millisecond,
    // earlier-MICROSECOND out-of-order click can still be admitted in
    // a later batch after purchases in that millisecond were emitted
    // as final — at the 1 ms boundary the streamed attribution can
    // diverge from the batch oracle by design. The alternative
    // (finalize strictly below, `< wmMs`) closes that window but
    // strands every max-timestamp event until some later input pushes
    // the watermark past it — correct under a production delay +
    // unbounded stream, non-convergent for a bounded replay (this
    // gate's shape, and any backfill). `<=` is the deliberate choice:
    // sub-millisecond attribution order inside the watermark
    // millisecond is the documented precision limit of the operator.
    val (ready, pending) = all.partition(_.tsUs / 1000L <= wmMs)
    var ck: Option[(Long, Long)] =
      if (prev.hasClick) Some((prev.clickTs, prev.clickId)) else None
    val out = Seq.newBuilder[AsofOut]
    for (e <- ready.sortBy(e => (e.tsUs, e.eventId))) {
      if (e.isClick) ck = Some((e.tsUs, e.eventId))
      else out += AsofOut(e.eventId, userId,
        ck.map(c => java.lang.Long.valueOf(c._2)).orNull,
        ck.map(c => java.lang.Long.valueOf(e.tsUs - c._1)).orNull)
    }
    st.update(AsofState(ck.map(_._1).getOrElse(0L),
      ck.map(_._2).getOrElse(0L), ck.isDefined, pending))
    // Flushing needs the function to run again when the watermark
    // moves, and flatMapGroupsWithState only invokes a key on new rows
    // or an expired timeout — a key with pending events RE-ARMS at
    // watermark+1 ms (the earliest settable instant), so every
    // watermark advance re-partitions the buffer and emits what turned
    // final. Firing "early" is harmless (nothing ready → re-arm);
    // Spark's strict `timeout < watermark` eviction means a key can
    // trail the watermark by at most 1 ms, which only matters if the
    // stream's watermark stops dead exactly 1 ms past the timeout — a
    // bounded-replay edge the gate's 0-delay single jump never hits
    // and an unbounded stream outruns.
    if (pending.nonEmpty) st.setTimeoutTimestamp(wmMs + 1L)
    out.result().iterator
  }
}
