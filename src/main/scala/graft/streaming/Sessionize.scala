package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state (SURVEY §2.F's
  * flatMapGroupsWithState surface): per-key event-time sessions that
  * close after `gapMs` with no events, emitted in append mode when the
  * watermark passes session end + gap.
  *
  * This is the stateful complement to q54's batch `session_window()`:
  * identical gap semantics (a session spans [start, end + gap); an event
  * exactly gap after the last one opens a NEW session), but maintained
  * incrementally so an unbounded stream carries one small SessionState
  * per ACTIVE key — not per event. The event-time timeout ties state
  * eviction to the watermark, which is what bounds memory at 100 TB/day
  * stream rates: state size tracks concurrently-active sessions only.
  */
object Sessionize {

  final case class Event(key: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class Session(key: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp,
                           n_events: Long, total_value: Double)

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  /** The pure per-key session fold SHARED by the streaming closure and
    * [[replayBatchMicros]]: events as (time, value) pairs sorted
    * ascending, `time` in any fixed unit — milliseconds in streaming
    * (GroupState timeouts are ms), microseconds in the batch replay
    * (the driver's event data is micro-aligned). Returns the sessions
    * closed by gap breaks, in order, plus the still-open trailing
    * session. */
  private[graft] def fold(evs: Seq[(Long, Double)], init: Option[SessionState],
                          gap: Long): (Seq[SessionState], Option[SessionState]) = {
    val closed = Seq.newBuilder[SessionState]
    var cur = init
    evs.foreach { case (t, v) =>
      cur match {
        case Some(s) if t - s.end < gap =>
          cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + v))
        case Some(s) =>
          closed += s
          cur = Some(SessionState(t, t, 1L, v))
        case None =>
          cur = Some(SessionState(t, t, 1L, v))
      }
    }
    (closed.result(), cur)
  }

  /** BATCH replay of the streaming operator's session assignment — the
    * SAME [[fold]] the flatMapGroupsWithState closure runs, applied to
    * each key's full history in one group, with the trailing open
    * session flushed (end-of-data plays the watermark's role). Times
    * are epoch MICROSECONDS so no precision is lost on micro-aligned
    * event data. Registry query q81 hash-checks these semantics against
    * the q54-style gaps-and-islands SQL oracle — the green CORRECTNESS
    * row that ties the streaming code path to an oracle.
    *
    * Input columns: key LONG, t_us LONG, value DOUBLE. Output: one row
    * per session (key, session_start_us, session_end_us, n_events,
    * total). One keyed shuffle; per-key history sorts in the executor —
    * the same cost class as any session-window aggregation. */
  def replayBatchMicros(events: org.apache.spark.sql.DataFrame,
                        gapUs: Long): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    events
      .select(col("key").cast("long"), col("t_us").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key: Long, it: Iterator[(Long, Long, Double)]) =>
        val evs = it.toSeq.sortBy(_._2).map(e => (e._2, e._3))
        val (closed, open) = fold(evs, None, gapUs)
        (closed ++ open).iterator.map(s => (key, s.start, s.end, s.n, s.total))
      }
      .toDF("key", "session_start_us", "session_end_us", "n_events", "total")
  }

  /** @param events         streaming Dataset; caller must NOT pre-aggregate
    * @param gapMs          inactivity gap that closes a session
    * @param watermarkDelay how much event-time disorder to tolerate */
  def sessions(events: Dataset[Event], gapMs: Long,
               watermarkDelay: String): Dataset[Session] =
    sessionsWatermarked(events.withWatermark("ts", watermarkDelay), gapMs)

  /** [[sessions]] for input that ALREADY carries an event-time watermark
    * on `ts` — Spark disallows redefining the watermark inside one
    * query, so a composed pipeline (e.g. [[StreamDedup.withinWatermark]]
    * → sessionize, the StreamComposeSpec loop) sets it once at the
    * source-most stateful stage and every downstream stage inherits it. */
  def sessionsWatermarked(events: Dataset[Event],
                          gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap with no new events: session over
            val s = state.get
            state.remove()
            Iterator.single(Session(key, ts(s.start), ts(s.end), s.n, s.total))
          } else {
            // events within one micro-batch arrive unsorted; per (key,
            // batch) data is small, so an in-memory sort is safe
            val evs = it.toSeq.sortBy(_.ts.getTime).map(e => (e.ts.getTime, e.value))
            val (closed, open) = fold(evs, state.getOption, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator.map(s => Session(key, ts(s.start), ts(s.end), s.n, s.total))
          }
      }
  }
}
