package graft.mr

import org.apache.spark.{SparkEnv, TaskContext}
import org.apache.spark.sql.SparkSession

/** Worker-LOSS probe — the analog of the reference coordinator's
  * liveness eviction (mr/coordinator.go:149-232: 1 s heartbeats, a dead
  * worker's tasks — including its already-COMPLETED map tasks, whose
  * intermediate files died with it — are reset and reassigned).
  *
  * [[graft.mr.FaultToleranceSpec]] covers task *failure* (an attempt
  * throws); this probe covers executor *process death*: it runs a word
  * count on a `local-cluster[2,1,1024]` (real separate executor JVMs),
  * and the first reduce attempt to reach any executor `halt()`s that
  * JVM outright — taking the executor's shuffle map outputs down with
  * it. Spark must then notice the loss (its heartbeat/RPC liveness —
  * the S5 delegation), re-launch an executor via the standalone worker,
  * resubmit the lost map partitions, and rerun the reduce — the exact
  * recovery sequence coordinator.go implements by hand. The probe
  * writes the final counts to a file; the driving spec asserts they are
  * bit-identical to the no-fault result.
  *
  * Runs as its own JVM (spawned by `ExecutorLossSpec`) because a JVM
  * holds one SparkContext, and the suite-wide session is `local[4,4]`.
  *
  * args: <outFile> <markerFile> — the marker's atomic `createNewFile`
  * elects exactly one killer across all executors and attempts.
  */
object ExecutorLossProbe {

  def main(args: Array[String]): Unit = {
    val outFile = args(0)
    val markerFile = args(1)
    val cp = sys.props("java.class.path")
    // Spark 4 on JDK 17 needs the module opens on executor JVMs too;
    // outside spark-submit nothing injects them for us.
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-executor-loss")
      .config("spark.executor.memory", "1024m")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.task.maxFailures", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = (1 to 48).map(i => (f"d$i%03d", s"alpha beta w$i gamma delta"))
    val corpus = spark.createDataset(docs).repartition(8)
    // Kill in the REDUCE phase: by then the map stage has committed its
    // shuffle output on both executors, so the halt() loses COMPLETED
    // map results — the case coordinator.go:198-214 handles by resetting
    // finished map tasks of an evicted worker.
    val killerReduce: MapReduceJob.ReduceF = (k, values) => {
      val tc = TaskContext.get()
      if (tc != null && SparkEnv.get.executorId != "driver" &&
          new java.io.File(markerFile).createNewFile())
        Runtime.getRuntime.halt(137) // the whole executor JVM, not a throw
      Apps.WordCount.reduce(k, values)
    }
    val got = MapReduceJob.runOnCorpus(corpus, Apps.WordCount.map, killerReduce)
      .collect().map(kv => s"${kv.key} ${kv.value}").sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      got.mkString("\n").getBytes("UTF-8"))
    spark.stop()
    sys.exit(0) // LocalSparkCluster leaves non-daemon threads behind
  }
}
