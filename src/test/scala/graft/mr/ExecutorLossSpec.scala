package graft.mr

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[ExecutorLossProbe]] in its own JVM (one SparkContext per
  * JVM; the probe needs `local-cluster` while the shared test session
  * is `local[4,4]`) and asserts the exact no-fault result — the S5
  * liveness-eviction behavior of the reference coordinator
  * (mr/coordinator.go:149-232), exercised rather than delegated.
  */
class ExecutorLossSpec extends AnyFunSuite {

  test("executor JVM killed mid-job: lost shuffle output is recomputed, " +
       "result exact") {
    // local-cluster executors launch through a Spark distribution;
    // cancel (not fail) where none is installed
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(s"$sparkHome/jars").isDirectory,
      s"no Spark distribution at $sparkHome")
    val out = java.nio.file.Files.createTempFile("graft-exloss-out", ".txt")
    val marker = java.nio.file.Files.createTempFile("graft-exloss-marker", "")
    java.nio.file.Files.delete(out)
    java.nio.file.Files.delete(marker)
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.mr.ExecutorLossProbe", out.toString, marker.toString)
    val pb = new ProcessBuilder(cmd.asJava)
    // the standalone worker resolves executor launch paths via SPARK_HOME;
    // the launcher can't infer the scala version from a jars-only layout
    // ("Cannot find any build directories"), so pin it
    pb.environment().put("SPARK_HOME", sparkHome)
    pb.environment().put("SPARK_SCALA_VERSION",
      scala.util.Properties.versionNumberString.split("\\.").take(2)
        .mkString("."))
    pb.redirectErrorStream(true)
    val log = java.nio.file.Files.createTempFile("graft-exloss-log", ".txt")
    pb.redirectOutput(log.toFile)
    val proc = pb.start()
    val done = proc.waitFor(240, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) proc.destroyForcibly()
    assert(done, s"probe timed out; log: ${log}")
    assert(proc.exitValue() === 0,
      s"probe exited ${proc.exitValue()}; log tail:\n" +
        java.nio.file.Files.readAllLines(log).asScala.takeRight(30)
          .mkString("\n"))
    // the kill really happened (an executor claimed the marker) …
    assert(java.nio.file.Files.exists(marker),
      "no executor ever took the kill marker — the fault was not injected")
    // … and the committed result is the exact no-fault word count
    val expected = {
      val docs = (1 to 48).map(i => (f"d$i%03d", s"alpha beta w$i gamma delta"))
      val counts = docs.flatMap(d => Apps.tokenize(d._2)).groupBy(identity)
        .map { case (w, occ) => s"$w ${occ.size}" }.toSeq.sorted
      counts
    }
    val got = java.nio.file.Files.readAllLines(out).asScala.toSeq
    assert(got === expected)
  }
}
