package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.operators.SourceQueries

/** Pins the `graft-snapshot` STREAMING arm (the changefeed source):
  *
  *  1. full-feed parity — the stream's change rows are exactly the
  *     batch CDC (v1 base as inserts + per-version `changeRows`);
  *  2. version-offset RESTART — a new query resuming from the same
  *     checkpoint processes only versions committed since the last
  *     incarnation (the lakehouse CDF contract: exactly-once per
  *     version across restarts);
  *  3. `fromVersion` scoping — a consumer can subscribe from the
  *     middle of history.
  */
class SnapshotChangefeedSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): java.io.File = {
    val f = new java.io.File(s"target/graft-io/cdf_spec/$name")
    org.apache.commons.io.FileUtils.deleteDirectory(f)
    f.mkdirs()
    f
  }

  /** Drain the changefeed at `root` into parquet `outDir` with `chk`
    * as checkpoint; returns rows this incarnation actually processed.
    */
  private def drainOnce(root: String, outDir: String, chk: String,
                        fromVersion: Int = 1): Long = {
    val q = spark.readStream.format("graft-snapshot")
      .option("fromVersion", fromVersion.toString)
      .load(root)
      .writeStream
      .format("parquet")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start(outDir)
    q.awaitTermination()
    val n = q.recentProgress.map(_.numInputRows).sum
    spark.streams.resetTerminated()
    n
  }

  private def frame(rows: Seq[(Long, String, Double)], month: String) =
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .withColumn("o_ym", lit(month))

  test("streamed feed equals the batch CDC, version by version") {
    val root = SourceQueries.snapshotFixture(spark, sf0001)
    val out = freshDir("parity_out")
    val chk = freshDir("parity_chk")
    drainOnce(root.toString, out.getAbsolutePath, chk.getAbsolutePath)
    val got = spark.read.parquet(out.getAbsolutePath)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    val base = SourceQueries.snapshotRead(spark, root, 1)
      .select(lit(1).as("version"), col("o_orderkey").as("k"),
        col("o_totalprice").as("price"), lit(1).as("alive"))
    val expect = base
      .unionByName(SourceQueries.changeRows(spark, root, 1, 2)
        .select(lit(2).as("version"), col("k"),
          col("price").cast("double").as("price"), col("alive")))
      .unionByName(SourceQueries.changeRows(spark, root, 2, 3)
        .select(lit(3).as("version"), col("k"),
          col("price").cast("double").as("price"), col("alive")))
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === expect)
    assert(got.nonEmpty)
    // the delete commit must appear as alive=0 rows
    assert(got.exists(t => t._1 === 3 && t._4 === 0))
  }

  test("restart resumes from the committed version offset") {
    val root = freshDir("restart_store").getAbsolutePath
    val out = freshDir("restart_out")
    val chk = freshDir("restart_chk")

    frame(Seq((1L, "O", 10.0), (2L, "O", 20.0), (3L, "F", 30.0)), "2024-01")
      .write.format("graft-snapshot").mode("append").save(root)
    val seen1 = drainOnce(root, out.getAbsolutePath, chk.getAbsolutePath)
    assert(seen1 === 3, s"incarnation 1 must stream v1's 3 inserts, got $seen1")

    // two more commits land while the consumer is down
    frame(Seq((2L, "O", 99.0), (9L, "P", 5.0)), "2024-01")
      .write.format("graft-snapshot").mode("append").save(root)
    frame(Seq((1L, "O", 10.0)), "2024-01")
      .write.format("graft-snapshot").mode("append")
      .option("commitMode", "delete").save(root)

    val seen2 = drainOnce(root, out.getAbsolutePath, chk.getAbsolutePath)
    assert(seen2 === 3,
      s"restart must stream ONLY v2 (update+insert) and v3 (delete): " +
        s"expected 3 change rows, got $seen2 — a re-emit of v1 means the " +
        "version offset was ignored")

    val rows = spark.read.parquet(out.getAbsolutePath)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3))).toSet
    assert(rows === Set(
      (1, 1L, Some(10.0), 1), (1, 2L, Some(20.0), 1), (1, 3L, Some(30.0), 1),
      (2, 2L, Some(99.0), 1), (2, 9L, Some(5.0), 1),
      (3, 1L, None, 0)))
  }

  test("fromVersion subscribes from the middle of history") {
    val root = SourceQueries.snapshotFixture(spark, sf0001)
    val out = freshDir("fromv_out")
    val chk = freshDir("fromv_chk")
    drainOnce(root.toString, out.getAbsolutePath, chk.getAbsolutePath,
      fromVersion = 3)
    val got = spark.read.parquet(out.getAbsolutePath)
    assert(got.select(min(col("version"))).head().getInt(0) === 3)
    val expected = SourceQueries.changeRows(spark, root, 2, 3).count()
    assert(got.count() === expected)
  }
}
