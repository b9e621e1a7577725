package graft.mr

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}

import graft.SparkSpec

/** Parallelism probes — analogs of the reference's mtiming / rtiming
  * tests (main/test-mr.sh:147-198, mrapps/mtiming.go, rtiming.go), which
  * assert that ≥2 map tasks and ≥2 reduce tasks actually execute
  * CONCURRENTLY (the coordinator hands out work in parallel, not one
  * task at a time).
  *
  * Spark analog: a SparkListener tracks, per stage, the peak number of
  * simultaneously-running tasks during one MR-engine job. The map
  * (shuffle-map) stage and the reduce (result) stage must each reach
  * peak ≥2 on the `local[4]` test session. Task bodies sleep briefly —
  * the same trick the reference apps use (mtiming.go sleeps ~1 s) — so
  * overlap is guaranteed rather than racy.
  */
class ParallelismSpec extends SparkSpec {
  import spark.implicits._

  /** Per-stage running-task counter with peak tracking. */
  private class PeakListener extends SparkListener {
    val running = new ConcurrentHashMap[Int, Integer]()
    val peak = new ConcurrentHashMap[Int, Integer]()
    val ended = new ConcurrentHashMap[Int, Integer]()
    override def onTaskStart(e: SparkListenerTaskStart): Unit = {
      val now = running.merge(e.stageId, 1, (a, b) => a + b)
      peak.merge(e.stageId, now, (a, b) => math.max(a, b))
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      running.merge(e.stageId, -1, (a, b) => a + b)
      ended.merge(e.stageId, 1, (a, b) => a + b)
    }
  }

  /** Listener events are posted asynchronously; poll until every started
    * task has its matching end event (all running counts back to 0) and
    * at least two stages were observed.
    */
  private def awaitDrained(l: PeakListener): Unit = {
    val deadline = System.nanoTime() + 10e9.toLong
    def settled: Boolean = {
      var allZero = true
      l.running.forEach((_, v) => if (v != 0) allZero = false)
      allZero && l.peak.size() >= 2
    }
    while (System.nanoTime() < deadline && !settled) Thread.sleep(25)
  }

  test("mtiming/rtiming: >=2 concurrent tasks in map AND reduce stages") {
    // 48 docs over local[4]'s default 4 partitions; shuffle.partitions=4
    // gives 4 reduce tasks. 150 ms of work per task >> scheduler launch
    // jitter, so 4 slots necessarily overlap.
    val docs = (1 to 48).map(i => (f"d$i%03d", s"k${i % 8} token"))
    val corpus = spark.createDataset(docs)
    val slowMap: MapReduceJob.MapF = (name, contents) => {
      Thread.sleep(150)
      Apps.WordCount.map(name, contents.split(" ").head)
    }
    val slowReduce: MapReduceJob.ReduceF = (k, values) => {
      Thread.sleep(150)
      Apps.WordCount.reduce(k, values)
    }
    val listener = new PeakListener
    spark.sparkContext.addSparkListener(listener)
    // AQE coalesces this tiny shuffle into a single reduce task, which
    // would make the probe vacuous — pin 4 reduce tasks for the probe.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
      val out = MapReduceJob.runOnCorpus(corpus, slowMap, slowReduce)
        .collect()
      assert(out.nonEmpty)
      awaitDrained(listener)
      val stages = listener.peak.keySet()
      assert(stages.size >= 2, s"expected map + reduce stages, saw $stages")
      // Lowest stage id in the job = the shuffle-map stage; highest =
      // the result (reduce) stage.
      var minStage = Int.MaxValue; var maxStage = Int.MinValue
      listener.peak.forEach((k, _) => {
        minStage = math.min(minStage, k); maxStage = math.max(maxStage, k)
      })
      val mapPeak = listener.peak.get(minStage).intValue()
      val reducePeak = listener.peak.get(maxStage).intValue()
      assert(mapPeak >= 2, s"map stage peak concurrency $mapPeak < 2")
      assert(reducePeak >= 2, s"reduce stage peak concurrency $reducePeak < 2")
    } finally {
      spark.conf.set(coalesceKey, prevCoalesce)
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
