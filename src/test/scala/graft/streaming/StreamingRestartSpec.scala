package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** Checkpoint RESTART coverage for the mrout streaming sink — the
  * unbounded-pipeline contract the catalog's bounded AvailableNow runs
  * can't see. A real deployment stops and restarts its streaming jobs
  * constantly (deploys, node loss, backfill pauses); correctness there
  * means the checkpoint makes a restarted query (1) skip everything a
  * prior incarnation already processed and (2) continue the sink's
  * epoch sequence so no output file is doubled or lost. Reference
  * analog: the coordinator's completed-task bookkeeping across worker
  * deaths (`mr/coordinator.go:63-72`) — state that survives the process
  * and prevents re-emission of done work.
  *
  * Also pins the scratch-keying discipline VERDICT r7 #6 asked for:
  * two different source dirs get DISJOINT checkpoints (same keying rule
  * as `Tables.dirKey` scratch), so a run against dir B can never replay
  * dir A's progress or blocks.
  */
class StreamingRestartSpec extends SparkSpec {

  private def freshDir(name: String): java.io.File = {
    val f = new java.io.File(s"target/graft-io/restart_spec/$name")
    org.apache.commons.io.FileUtils.deleteDirectory(f)
    f.mkdirs()
    f
  }

  /** Drain `inDir` through the mrout sink with `chk` as checkpoint;
    * returns total numInputRows the run actually processed.
    */
  private def drainOnce(inDir: String, outDir: String, chk: String): Long = {
    val rawSchema = spark.read.parquet(inDir).schema
    val q = spark.readStream.schema(rawSchema).parquet(inDir)
      .select(col("event_id").cast("string").as("key"),
        col("event_type").as("value"))
      .writeStream
      .format("mrout")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start(outDir)
    q.awaitTermination()
    val n = q.recentProgress.map(_.numInputRows).sum
    spark.streams.resetTerminated()
    n
  }

  test("restart from checkpoint processes only new files; output exact-once") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(sf0001 + "/events.parquet")
    val in = freshDir("in")
    val out = freshDir("out")
    val chk = freshDir("chk")

    // incarnation 1: half the feed arrives (even user_id), gets drained
    val partA = events.filter(col("user_id") % 2 === 0)
    partA.write.mode("append").parquet(in.getAbsolutePath)
    val nA = partA.count()
    val seenA = drainOnce(in.getAbsolutePath, out.getAbsolutePath,
      chk.getAbsolutePath)
    assert(seenA === nA, "first incarnation must drain exactly part A")

    // incarnation 2: the rest arrives; a NEW query resumes from the SAME
    // checkpoint (fresh StreamingQuery = process restart in local mode)
    val partB = events.filter(col("user_id") % 2 === 1)
    partB.write.mode("append").parquet(in.getAbsolutePath)
    val nB = partB.count()
    val seenB = drainOnce(in.getAbsolutePath, out.getAbsolutePath,
      chk.getAbsolutePath)
    assert(seenB === nB,
      s"restart must process ONLY the new files: expected $nB rows, " +
        s"saw $seenB (a re-read of part A means the checkpoint was ignored)")

    // the sink's files must hold A ∪ B exactly once: the restarted query
    // continues the epoch sequence, so no mr-out-<epoch>-<pid> collides
    val back = spark.read.format("mrout").load(out.getAbsolutePath)
    assert(back.count() === nA + nB, "doubled or dropped epoch output")
    assert(back.select("key").distinct().count() === nA + nB,
      "an event_id appears twice across epochs")
    // both incarnations' epochs are present on disk (run 2 did not
    // overwrite run 1's epoch numbers)
    val epochs = out.listFiles().map(_.getName)
      .filter(_.startsWith("mr-out-"))
      .map(_.split("-")(2)).distinct
    assert(epochs.length >= 2,
      s"expected epochs from both incarnations, got ${epochs.toSeq}")
  }

  test("different source dirs get disjoint checkpoints (no stale reuse)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(sf0001 + "/events.parquet")
    // two "sf dirs": disjoint user cohorts standing in for sf0.001/sf0.01
    val cohorts = Seq(0, 1).map { c =>
      val dir = freshDir(s"iso_in_$c")
      events.filter(col("user_id") % 2 === c)
        .write.mode("append").parquet(dir.getAbsolutePath)
      dir
    }
    // the keying rule under test: scratch (out + chk) derived per source
    // dir, as ioDir(...)/dirKey does for the catalog's streaming queries
    val results = cohorts.map { dir =>
      val key = graft.core.Tables.dirKey(dir.getAbsolutePath)
      val out = freshDir(s"iso_out_$key")
      val chk = freshDir(s"iso_chk_$key")
      drainOnce(dir.getAbsolutePath, out.getAbsolutePath, chk.getAbsolutePath)
      spark.read.format("mrout").load(out.getAbsolutePath)
        .agg(count(lit(1)), countDistinct(col("key"))).head()
    }
    val expected = Seq(0, 1).map(c =>
      events.filter(col("user_id") % 2 === c).count())
    results.zip(expected).zipWithIndex.foreach { case ((row, exp), c) =>
      assert(row.getLong(0) === exp && row.getLong(1) === exp,
        s"cohort $c: checkpoint/scratch bled across source dirs")
    }
  }
}
