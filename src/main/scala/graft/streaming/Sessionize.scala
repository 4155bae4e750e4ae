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

  /** @param events         streaming Dataset; caller must NOT pre-aggregate
    * @param gapMs          inactivity gap that closes a session
    * @param watermarkDelay how much event-time disorder to tolerate */
  def sessions(events: Dataset[Event], gapMs: Long,
               watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
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
            val evs = it.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            evs.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.end < gapMs =>
                  cur = Some(SessionState(
                    s.start, math.max(s.end, e.ts.getTime), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(key, ts(s.start), ts(s.end), s.n, s.total)
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
