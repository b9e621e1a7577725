package graft.mr

import scala.jdk.CollectionConverters._

/** Drives [[SpeculationProbe]] in its own JVM and asserts (a) a
  * speculative task attempt really launched — closing the stall arm of
  * the reference's crash suite (mrapps/crash.go:26-28; reissue logic
  * mr/coordinator.go:63-72), the one reference behavior previously
  * untested — and (b) the committed result is exactly the no-fault
  * word count even though two attempts of the stalled task ran.
  */
class SpeculationSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("straggler task: a speculative copy launches, wins, result exact") {
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(s"$sparkHome/jars").isDirectory,
      s"no Spark distribution at $sparkHome")
    val out = java.nio.file.Files.createTempFile("graft-spec-out", ".txt")
    val marker = java.nio.file.Files.createTempFile("graft-spec-marker", "")
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
      "graft.mr.SpeculationProbe", out.toString, marker.toString)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_HOME", sparkHome)
    pb.environment().put("SPARK_SCALA_VERSION",
      scala.util.Properties.versionNumberString.split("\\.").take(2)
        .mkString("."))
    pb.redirectErrorStream(true)
    val log = java.nio.file.Files.createTempFile("graft-spec-log", ".txt")
    pb.redirectOutput(log.toFile)
    val proc = pb.start()
    val done = proc.waitFor(240, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) proc.destroyForcibly()
    assert(done, s"probe timed out; log: $log")
    assert(proc.exitValue() === 0,
      s"probe exited ${proc.exitValue()}; log tail:\n" +
        java.nio.file.Files.readAllLines(log).asScala.takeRight(30)
          .mkString("\n"))
    val lines = java.nio.file.Files.readAllLines(out).asScala.toSeq
    // (a) the scheduler actually launched a speculative attempt …
    val started = lines.head.stripPrefix("speculative_started=").toInt
    assert(started >= 1,
      s"no speculative attempt launched (log: $log)")
    // … one of them SUCCEEDED (the marker is dropped only on a
    // successful speculative task) …
    assert(java.nio.file.Files.exists(marker),
      "no speculative attempt ever succeeded")
    // … and (b) the committed result is the exact no-fault word count.
    val expected = {
      val docs = (1 to 48).map(i => (f"d$i%03d", s"alpha beta w$i gamma delta"))
      docs.flatMap(d => Apps.tokenize(d._2)).groupBy(identity)
        .map { case (w, occ) => s"$w ${occ.size}" }.toSeq.sorted
    }
    assert(lines.tail === expected)
  }
}
