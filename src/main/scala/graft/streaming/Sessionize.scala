package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of an event stream — the canonical
  * custom-state streaming operator (SURVEY §2i extension; no reference
  * citations claimed — the reference has no streaming surface).
  *
  * Two implementations with identical semantics, cross-pinned in
  * `SessionizeSpec`:
  *
  *   - [[sessionStats]]: Spark's native `session_window` aggregation.
  *     Works on batch AND streaming frames (with a watermark); at scale
  *     this is one shuffle on the grouping key with AQE-managed state.
  *   - [[statefulSessions]]: `flatMapGroupsWithState` with explicit
  *     session state — the shape to reach for when session logic outgrows
  *     an aggregation (per-session ML features, mid-session triggers).
  *     In batch execution each key's full history arrives as one group; in
  *     streaming, open sessions persist in the state store and close via
  *     event-time timeout when the watermark passes `last + gap`.
  *
  * Boundary semantics (pinned by spec, matching `session_window`): a
  * session spans `[first, last + gap]` for merging — an event at exactly
  * `last + gap` JOINS the session and extends it.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, value_sum: Double)

  /** Open-session state carried between micro-batches (epoch micros). */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long,
      sum: Double)

  /** Native session-window session statistics.
    *
    * `value` sums go through DECIMAL(18,4) so the result does not depend
    * on partition accumulation order (cross-engine oracle requirement).
    * `session_end` is `last event + gap` — session_window's half-open end.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: String): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("win"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).as("value_sum"))
      .select(col(userCol), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"),
        col("value_sum").cast("double").as("value_sum"))

  /** Streaming variant: watermarked session windows (bounded state — a
    * session's state is dropped once the watermark passes its end).
    */
  def sessionStatsStream(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: String, watermark: String): DataFrame =
    sessionStats(events.withWatermark(tsCol, watermark), userCol, tsCol,
      valueCol, gap)

  /** Explicit-state sessionizer. Batch: each group is its whole history —
    * sort, split on gaps, emit every session. Streaming: buffer into the
    * open session, emit closed sessions, keep the open one in state until
    * the event-time timeout fires.
    *
    * The per-call sort is bounded by one key's events in one micro-batch
    * (batch execution: one key's whole history — the operator to pick when
    * that fits; session_window when it might not).
    */
  def statefulSessions(events: Dataset[SessionEvent], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    val streaming = events.isStreaming
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(finish(user, s, gapUs))
          } else {
            val sorted = it.toIndexedSeq.sortBy(e => micros(e.ts))
            var cur = state.getOption
            val closed = Vector.newBuilder[Session]
            sorted.foreach { e =>
              val us = micros(e.ts)
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, us, s.n + 1,
                    s.sum + e.value))
                case Some(s) =>
                  closed += finish(user, s, gapUs)
                  cur = Some(SessionState(us, us, 1L, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1L, e.value))
              }
            }
            if (state.exists) state.remove()
            cur.foreach { s =>
              if (streaming) {
                state.update(s)
                // ceil to ms: flooring could fire the timeout up to 999µs
                // BEFORE last+gap and split a session that an event at
                // exactly last+gap should join (pinned boundary rule);
                // firing ≤1ms late is always safe.
                state.setTimeoutTimestamp(
                  Math.floorDiv(s.lastUs + gapUs + 999L, 1000L))
              } else closed += finish(user, s, gapUs)
            }
            closed.result().iterator
          }
      }
  }

  /** Epoch microseconds of a Timestamp (getTime alone truncates to ms). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def fromMicros(us: Long): Timestamp = {
    // floor semantics so pre-epoch (negative) micros round toward -∞:
    // truncating division would hand setNanos a negative value (throws)
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def finish(user: Long, s: SessionState, gapUs: Long): Session =
    Session(user, fromMicros(s.startUs), fromMicros(s.lastUs + gapUs),
      s.n, s.sum)
}
