package graft.mr

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd,
  SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** STRAGGLER probe — the stall arm of the reference's crash app
  * (mrapps/crash.go:26-28 sleeps 0–10 s inside a task without failing)
  * plus the coordinator's reissue of tasks that out-wait the 10 s
  * deadline (mr/coordinator.go:63-72): the job must finish at the speed
  * of the healthy reissued copy, not the straggler, and the result must
  * be exactly the no-fault result even though two attempts of the same
  * task both ran.
  *
  * Spark analog: `spark.speculation` — the scheduler launches a
  * speculative copy of a task whose runtime exceeds
  * multiplier × median. One hard constraint makes this the only probe
  * that needs a REAL standalone mini-cluster:
  * `TaskSetManager.dequeueTaskFromList` refuses to place a speculative
  * copy on a host that already has an attempt of that task
  * (`hasAttemptOnHost`), so single-host masters — `local[n]` AND
  * `local-cluster` (all its workers advertise the same hostname) — can
  * never launch one. This probe therefore spins up a Master process and
  * TWO Worker processes that advertise DIFFERENT host strings
  * (`localhost` / `127.0.0.1`) resolving to the same box: to the
  * scheduler they are distinct hosts, so the speculative copy is
  * placeable, while everything still runs on one machine.
  *
  * The injected straggler: the first attempt of map partition 7 parks
  * (no failure — exactly crash.go's stall arm, distinct from its crash
  * arm covered by FaultToleranceSpec) until a driver-side listener
  * observes a SUCCESSFUL speculative attempt and drops the marker file,
  * or a 60 s cap expires. When the speculative copy wins, the scheduler
  * kills the parked original (interrupt), and the job completes at the
  * copy's speed. The probe writes `speculative_started=N` plus the
  * sorted word counts; the driving spec asserts N ≥ 1 and exactness.
  *
  * Runs as its own JVM (spawned by `SpeculationSpec`): one SparkContext
  * per JVM, and the suite-wide session has no speculation confs.
  *
  * args: <outFile> <markerFile>
  */
object SpeculationProbe {

  private def waitPort(port: Int, timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      try {
        val s = new java.net.Socket("127.0.0.1", port)
        s.close()
        return true
      } catch { case _: java.io.IOException => Thread.sleep(200) }
    }
    false
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED")

  def main(args: Array[String]): Unit = {
    val outFile = args(0)
    val markerFile = args(1)
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    val cp = sys.props("java.class.path")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val masterPort = {
      val ss = new java.net.ServerSocket(0)
      val p = ss.getLocalPort
      ss.close()
      p
    }
    val work = java.nio.file.Files.createTempDirectory("graft-spec-work")

    def launch(mainClass: String, argv: Seq[String], host: String,
               log: String): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx768m", "-Dspark.ui.enabled=false", "-cp", cp, mainClass) ++ argv
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().put("SPARK_HOME", sparkHome)
      pb.environment().put("SPARK_SCALA_VERSION",
        scala.util.Properties.versionNumberString.split("\\.").take(2)
          .mkString("."))
      // what Utils.localHostName (and thus the advertised executor host)
      // resolves to inside this process tree — the two workers MUST
      // advertise different strings or hasAttemptOnHost blocks speculation
      pb.environment().put("SPARK_LOCAL_HOSTNAME", host)
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(log))
      pb.start()
    }

    val procs = scala.collection.mutable.ArrayBuffer[Process]()
    try {
      procs += launch("org.apache.spark.deploy.master.Master",
        Seq("--host", "127.0.0.1", "--port", masterPort.toString,
          "--webui-port", "0"),
        "127.0.0.1", s"$work/master.log")
      require(waitPort(masterPort, 60000), s"master never bound $masterPort")
      Seq("localhost", "127.0.0.1").zipWithIndex.foreach { case (h, i) =>
        procs += launch("org.apache.spark.deploy.worker.Worker",
          Seq("--host", h, "--cores", "2", "--memory", "1g",
            "--work-dir", s"$work/worker$i", "--webui-port", "0",
            s"spark://127.0.0.1:$masterPort"),
          h, s"$work/worker$i.log")
      }

      val spark = SparkSession.builder()
        .master(s"spark://127.0.0.1:$masterPort")
        .appName("graft-speculation")
        .config("spark.executor.memory", "768m")
        .config("spark.executor.cores", "2")
        .config("spark.executor.extraClassPath", cp)
        .config("spark.executor.extraJavaOptions", addOpens.mkString(" "))
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.quantile", "0.25")
        .config("spark.speculation.multiplier", "1.5")
        .config("spark.locality.wait", "0s")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.task.maxFailures", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._

      val specStarted = new AtomicInteger
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskStart(e: SparkListenerTaskStart): Unit =
          if (e.taskInfo.speculative) specStarted.incrementAndGet()
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
          if (e.taskInfo.speculative && e.taskInfo.successful)
            new java.io.File(markerFile).createNewFile()
      })

      val docs = (1 to 48).map(i => (f"d$i%03d", s"alpha beta w$i gamma delta"))
      val corpus = spark.createDataset(docs).repartition(8)
      val stallMap: MapReduceJob.MapF = (name, contents) => {
        val tc = TaskContext.get()
        if (tc != null && tc.partitionId() == 7 && tc.attemptNumber() == 0) {
          // crash.go's stall arm: park WITHOUT failing until the
          // speculative copy lands (driver drops the marker) or the cap
          // expires. When the copy wins first, the scheduler interrupts
          // this attempt — also fine; the job result must be identical
          // either way.
          val deadline = System.currentTimeMillis + 60000
          while (!new java.io.File(markerFile).exists &&
                 System.currentTimeMillis < deadline)
            Thread.sleep(100)
        }
        Apps.WordCount.map(name, contents)
      }
      val got = MapReduceJob.runOnCorpus(corpus, stallMap,
        Apps.WordCount.reduce)
        .collect().map(kv => s"${kv.key} ${kv.value}").sorted
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (s"speculative_started=${specStarted.get}\n" + got.mkString("\n"))
          .getBytes("UTF-8"))
      spark.stop()
    } finally {
      procs.foreach(_.destroyForcibly())
    }
    sys.exit(0) // worker/master watchdog threads are non-daemon
  }
}
