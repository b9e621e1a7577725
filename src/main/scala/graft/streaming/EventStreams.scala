package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event queries
  * (`RelationalQueries.eventsHourly` / `eventsSessionize`).
  *
  * The reference engine is purely bounded batch (SURVEY.md §2.3 —
  * "no streams anywhere"), so this module is north-star scope: the same
  * event analytics, unbounded. Design points:
  *
  *   - Event-time processing with watermarks — late data beyond the
  *     watermark is dropped deterministically, state is bounded (Spark
  *     evicts window/session state older than the watermark).
  *   - Tumbling-window aggregation is the built-in `window()` groupBy:
  *     incremental partial aggregation per micro-batch, the streaming
  *     analog of the batch partial+final agg.
  *   - Sessionization is `flatMapGroupsWithState` with event-time
  *     timeout: per-user state is one open session (O(1) per key), a
  *     session closes when the watermark passes its gap — identical
  *     semantics to the batch lag()-based sessionize for in-order data.
  *
  * At scale: state lives in the state store keyed by user_id — shuffle
  * is by user_id only once; watermark eviction bounds memory regardless
  * of stream length.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long,
                              sum_value: Double)

  /** Open-session accumulator held in the state store (one per user). */
  final case class SessionState(start: Long, end: Long,
                                n: Long, total: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Hourly tumbling counts per event type. `streaming=true` input →
    * append-mode-compatible once a watermark is set.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (30 min inactivity) with event-time
    * timeout. Emits a session when (a) an event arrives past the gap, or
    * (b) the watermark passes the open session's gap deadline.
    */
  def sessionize(events: Dataset[Event], watermark: String = "30 minutes")
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the gap deadline: close the open session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= SessionGapMs =>
                  open = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.total)
                  open = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.end + SessionGapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
