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

  /** Open-session accumulator held in the state store (one per user).
    * Times are epoch MICROSECONDS (the events table has microsecond
    * precision; `Timestamp.getTime` would truncate to millis and shift
    * session boundaries). `totalScaled` is the running sum of
    * `value` as a scale-6 decimal (unscaled long) — the same exact-sum
    * discipline as [[graft.functions.dsum]], so the emitted double equals
    * the batch oracle's `CAST(SUM(CAST(value AS DECIMAL(30,6))) AS
    * DOUBLE)` regardless of per-event accumulation order.
    */
  final case class SessionState(start: Long, end: Long,
                                n: Long, totalScaled: Long)

  val SessionGapUs: Long = 30 * 60 * 1000000L

  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** value → scale-6 unscaled long via the double's shortest string form —
    * Spark's own double→DecimalType(_,6) path, exact for harness values.
    */
  private def scaled6(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def unscale6(total: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(total), 6)
      .doubleValue()

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
            Iterator.single(SessionOut(userId, toTimestamp(s.start),
              toTimestamp(s.end), s.n, unscale6(s.totalScaled)))
          } else {
            val sorted = batch.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              val t = toMicros(e.ts)
              open match {
                case Some(s) if t - s.end <= SessionGapUs =>
                  open = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.totalScaled + scaled6(e.value)))
                case Some(s) =>
                  closed += SessionOut(userId, toTimestamp(s.start),
                    toTimestamp(s.end), s.n, unscale6(s.totalScaled))
                  open = Some(SessionState(t, t, 1L, scaled6(e.value)))
                case None =>
                  open = Some(SessionState(t, t, 1L, scaled6(e.value)))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                // timeout clock is millis; round the micro deadline UP so
                // the session never closes a hair early
                state.setTimeoutTimestamp((s.end + SessionGapUs + 999) / 1000)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
