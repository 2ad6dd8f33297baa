package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization: the 30-minute-gap session split
  * (batch twin: e_user_sessions) as a continuous query with CUSTOM
  * per-user state — `flatMapGroupsWithState` with event-time timeout,
  * the Structured Streaming primitive for session semantics that
  * windowed aggregation can't express (a session's end is data-driven,
  * not grid-aligned).
  *
  * Semantics: events of one user belong to one session while each is
  * within `gapMs` of the previous; a session is EMITTED either when a
  * later in-stream event breaks the gap, or when the event-time
  * watermark passes `session_end + gapMs` (timeout — the session can
  * no longer grow, because older events would be dropped as late).
  * Emission is therefore append-only and final: no session is ever
  * revised after it is output, the property a downstream consumer
  * (e.g. the tier cascade) needs.
  *
  * Scale: state per ACTIVE user is three longs (start, end, count) —
  * not the events — partitioned by user key across executors by the
  * state store; timeouts garbage-collect idle users, so state size
  * tracks concurrently-active users, not history. Backfill belongs to
  * the batch twin (e_user_sessions), not this code path: batch
  * execution of flatMapGroupsWithState discards still-open state at
  * end-of-input instead of emitting it.
  *
  * Late data: events older than the watermark are dropped by the
  * engine before the state function sees them (same documented
  * trade-off as [[StreamingIngest]]'s watermark delta).
  */
object StreamingSessions {

  case class SessionEvent(user_id: Long, ts_ms: Long, ts: java.sql.Timestamp)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  /** Adapt any frame with (user, epoch-ms) columns to the typed input,
    * deriving the event-time column the watermark needs. */
  def adapt(events: DataFrame, userCol: String = "user_id",
            tsMsCol: String = "ts_ms"): Dataset[SessionEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(userCol).as("user_id"), col(tsMsCol).as("ts_ms"),
      timestamp_millis(col(tsMsCol)).as("ts")).as[SessionEvent]
  }

  /** The sessionizer. `delay` is the watermark lateness allowance
    * (e.g. "10 minutes"); `gapMs` the session-split gap. */
  def sessions(events: Dataset[SessionEvent], gapMs: Long = 1800000L,
               delay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evts: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.end, s.n))
          } else {
            val out = Seq.newBuilder[Session]
            // Fold the open session AND the (small, per-user-per-batch)
            // group as START-SORTED intervals — standard gap clustering.
            // Per-batch events arrive unordered, and an out-of-order
            // (but not-late) event can even precede the open session's
            // start: sorting the open interval in with the events
            // handles every arrival order with one rule. In particular
            // an event more than gapMs BEFORE the open session's start
            // becomes its own (earlier) session, exactly as the batch
            // twin splits it — the old fold's `e.ts - end <= gap` test
            // was vacuously true for such events and glued them in
            // (only reachable when the watermark delay exceeds gapMs).
            val items = (state.getOption.toSeq ++
              evts.toSeq.map(e => OpenSession(e.ts_ms, e.ts_ms, 1L)))
              .sortBy(s => (s.start, s.end))
            var open: Option[OpenSession] = None
            items.foreach { it =>
              open = open match {
                case Some(s) if it.start - s.end <= gapMs =>
                  Some(OpenSession(s.start, math.max(s.end, it.end), s.n + it.n))
                case Some(s) =>
                  out += Session(user, s.start, s.end, s.n)
                  Some(it)
                case None =>
                  Some(it)
              }
            }
            open.foreach { s =>
              state.update(s)
              // never set a timeout at-or-before the current watermark
              // (the engine rejects it); if the session is already
              // expired relative to the watermark it times out on the
              // next trigger
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
