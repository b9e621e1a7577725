package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, SessionOut}

class EventStreamsSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2026-01-01 10:00:00").getTime

  private def ts(minute: Int): Timestamp =
    new Timestamp(base + minute * 60000L)

  test("hourlyCounts over a memory stream matches the batch aggregate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(in.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(65), 2, "view", 3.0),
        Event(4, ts(70), 2, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test").collect()
        .map(r => (r.getAs[Timestamp]("hour"),
          r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))).toSet
      assert(rows === Set(
        (ts(0), "click", 2L, 3.0),
        (ts(60), "view", 1L, 3.0),
        (ts(60), "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark catches a retry with jittered time") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = in.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // same event_id delivered twice with a 10-minute timestamp drift —
      // the at-least-once-with-retry shape. Keying on (id, ts) would
      // pass both; within-watermark dedup must emit exactly one.
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(5), 2, "view", 2.0))
      q.processAllAvailable()
      // advance the watermark far enough to flush append-mode output
      in.addData(Event(99, ts(600), 9, "click", 0.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_test").collect()
        .map(_.getAs[Long]("event_id")).filter(_ != 99L).sorted.toSeq
      assert(ids === Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions; watermark closes the last one") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // session 1: minutes 0..10; gap > 30min; session 2: minute 50
      in.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(10), 7, "click", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(50), 7, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far past session 2's gap deadline
      in.addData(Event(99, ts(600), 8, "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("session_test").as[SessionOut].collect()
        .filter(_.user_id == 7L).sortBy(_.session_start.getTime)
      assert(sessions.length === 2, s"got: ${sessions.mkString(", ")}")
      assert(sessions(0).n_events === 2L && sessions(0).sum_value === 3.0)
      assert(sessions(0).session_start === ts(0) &&
             sessions(0).session_end === ts(10))
      assert(sessions(1).n_events === 1L && sessions(1).sum_value === 5.0)
    } finally q.stop()
  }

  test("boundary pin: an exactly-gap-sized gap MERGES under BOTH the " +
       "native session_window and the hand-rolled sessionizer") {
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // two events exactly 30:00.000 apart. The native session_window
    // merges them (per-event windows [ts, ts+gap] TOUCH), matching the
    // sessionizer's `<=` keep rule — both catalog oracles therefore
    // split on strict `>`. This pin keeps that shared boundary
    // convention from silently drifting with a Spark upgrade (a change
    // to >= on either side would make the oracles subtly wrong while
    // real data almost never lands exactly on the boundary).
    val boundary = Seq(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(30), 7, "click", 1.0))
    val flush = Event(99, ts(600), 8, "click", 0.0)

    val in1 = MemoryStream[Event]
    val q1 = in1.toDF()
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("n_events"))
      .writeStream.format("memory").queryName("swin_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      in1.addData(boundary: _*)
      q1.processAllAvailable()
      in1.addData(flush)
      q1.processAllAvailable()
      val native = spark.table("swin_boundary")
        .filter("user_id = 7").collect()
      assert(native.length === 1 &&
             native.head.getAs[Long]("n_events") === 2L,
        s"session_window must MERGE an exactly-gap gap, got: " +
          s"${native.mkString(", ")}")
    } finally q1.stop()

    val in2 = MemoryStream[Event]
    val q2 = EventStreams.sessionize(in2.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData(boundary: _*)
      q2.processAllAvailable()
      in2.addData(flush)
      q2.processAllAvailable()
      val handRolled = spark.table("sess_boundary").as[SessionOut]
        .collect().filter(_.user_id == 7L)
      assert(handRolled.length === 1 && handRolled.head.n_events === 2L,
        s"sessionize must KEEP an exactly-gap gap, got: " +
          s"${handRolled.mkString(", ")}")
    } finally q2.stop()
  }

  test("streaming hourly equals batch eventsHourly on the same data") {
    import graft.operators.RelationalQueries
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // batch twin over the harness parquet (counts only; value sums are
    // compared exactly in the oracle gate, not here)
    val batch = RelationalQueries.eventsHourly(spark, sf0001)
      .select("hour", "event_type", "n_events").collect()
      .map(r => (r.getAs[Timestamp](0), r.getString(1), r.getLong(2))).toSet
    val events = graft.core.Tables.events(spark, sf0001)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq
    val in = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(in.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("hourly_vs_batch")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(events)
      q.processAllAvailable()
      val stream = spark.table("hourly_vs_batch")
        .select("hour", "event_type", "n_events").collect()
        .map(r => (r.getAs[Timestamp](0), r.getString(1), r.getLong(2))).toSet
      assert(stream === batch)
    } finally q.stop()
  }
}
