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
