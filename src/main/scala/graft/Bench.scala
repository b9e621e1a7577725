package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query at $SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results go through the `noop` sink so the full
  * result (every column) is computed — `.count()` would let Catalyst
  * prune the expensive projections and under-measure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Scan-split sizing follows the same rule as a real cluster: small
      // enough that every core gets work at the harness SF (a 10 MB table
      // must not become one task), large enough to amortize reader open
      // cost. At 100 TB the default 128m is right; harness inputs are
      // ~10-250 MB, so 4m keeps all 32 cores busy on scans and file sinks.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    // Per-query warmup at the smallest SF: compiles each query's
    // whole-stage-codegen classes (a fixed JVM cost, not a property of
    // the engine at scale) so the timed run at the target SF measures
    // execution. Falls back to the target dir if sf0.001 is absent.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", {
      val w = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(w).exists) w else sfDir
    })
    // optional args = subset of query names to time (iteration aid)
    val wanted = if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
                 else SparkEntry.queries
    // SPARK_GRAFT_EXPLAIN=1: dump each query's formatted physical plan
    // (iteration aid for plan audits; not used by the driver)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      // plan dumps must not execute workloads (lazy checkpoints)
      spark.conf.set(graft.core.Checkpoint.LazyConf, "true")
      wanted.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        println(s"===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
      spark.conf.set(graft.core.Checkpoint.LazyConf, "false")
    }
    // Trials per query: a single trial proved too noisy to distinguish a
    // real regression from accumulated JVM/GC state (rounds 2 and 4 both
    // produced >2x ghosts on unchanged plans). Median-of-3 with a GC
    // between queries bounds that noise; override for quick iteration.
    val trials = sys.env.get("SPARK_GRAFT_TRIALS") match {
      case Some(v) => v.toIntOption.filter(_ >= 1).getOrElse {
        System.err.println(
          s"[bench] ignoring invalid SPARK_GRAFT_TRIALS='$v'; using 3")
        3
      }
      case None => 3
    }
    def dropLeftoverBlocks(): Unit =
      // drop checkpoint/cache blocks a query left behind (jaccard /
      // components localCheckpoints) so they don't inflate heap pressure
      // for every later query — cleanup is outside the timed window
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    // SPARK_GRAFT_DETAILS=1: after each query's timed trials, run one
    // extra pass bracketed by task-metric snapshots and dump per-query
    // {input, shuffle write/read, spilled} bytes to
    // target/bench_details.json — measured evidence for SCALE.md's
    // shuffle claims (e.g. "dedup_exact shuffles ~40 bytes/doc").
    // Diagnostics only; the driver-facing JSON line is unchanged.
    val details = sys.env.contains("SPARK_GRAFT_DETAILS")
    val metrics = new BenchTaskMetrics
    if (details) spark.sparkContext.addSparkListener(metrics)
    val detailRows = scala.collection.mutable.ArrayBuffer[String]()
    val results = wanted.toSeq.sortBy(_._1).map { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      dropLeftoverBlocks()
      var failed = false
      val times = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        dropLeftoverBlocks()
        dt
      }.sorted
      // settle heap between query groups so one query's garbage doesn't
      // become the next query's GC pause
      System.gc()
      if (details && !failed) {
        // listener delivery is async; the settle sleeps bound the error
        Thread.sleep(300)
        val before = metrics.snapshot()
        // a crash mid-pass must not record its partial byte deltas as a
        // measurement (same rule as the -1 timing below)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite")
                  .save(); true }
          catch { case _: Throwable => false }
        Thread.sleep(300)
        val after = metrics.snapshot()
        val d = after.zip(before).map { case (a, b) => a - b }
        if (ok)
          detailRows += s"""  "$name": {"input":${d(0)},"shuffle_write":${
            d(1)},"shuffle_read":${d(2)},"spilled":${d(3)}}"""
        else
          detailRows += s"""  "$name": {"failed":true}"""
        dropLeftoverBlocks()
      }
      // A failed query must not report its time-to-failure as a timing —
      // a fast crash would otherwise IMPROVE the total and invert the
      // regression signal. -1 marks it broken and is excluded from the
      // total below.
      // lower median: exact median for odd trial counts; for even counts
      // times(len/2) would report the MAX of 2 trials
      name -> (if (failed) -1.0 else times((times.length - 1) / 2))
    }
    // Millisecond precision keeps the one-line JSON under ~2.5 KB for the
    // full catalog — the driver captures only the output tail, and r01-r03
    // all lost the line's head to truncation at full double precision.
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // File copy survives any stdout truncation/interleaving.
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    if (details)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target", "bench_details.json"),
        detailRows.mkString("{\n", ",\n", "\n}\n").getBytes("UTF-8"))
    spark.stop()
    // Printed after spark.stop() so no executor/log line lands between
    // this and sbt's epilogue — keeps the JSON as close to last as possible.
    println(line)
  }
}

/** Byte-level task metrics accumulator for the SPARK_GRAFT_DETAILS
  * mode: [input read, shuffle write, shuffle read, disk spilled].
  */
private class BenchTaskMetrics
    extends org.apache.spark.scheduler.SparkListener {
  private val sums = Array.fill(4)(new java.util.concurrent.atomic.AtomicLong)
  override def onTaskEnd(
      te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      sums(0).addAndGet(m.inputMetrics.bytesRead)
      sums(1).addAndGet(m.shuffleWriteMetrics.bytesWritten)
      sums(2).addAndGet(m.shuffleReadMetrics.totalBytesRead)
      sums(3).addAndGet(m.diskBytesSpilled)
    }
  }
  def snapshot(): Array[Long] = sums.map(_.get())
}
