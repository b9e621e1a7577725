package graft.mr

import graft.SparkSpec

/** Runtime plugin-loading parity with the reference's `.so` flow
  * (main/mrworker.go:32-49: `mrworker xxx.so`, `plugin.Open` on a
  * binary the engine build never saw). The JVM analog under test:
  * an application JAR produced OUTSIDE the engine's build — compiled
  * here with an in-test scalac against the published trait only —
  * carrying a `META-INF/services/graft.mr.MrApplication` entry, handed
  * to the running engine via `spark.addArtifact` plus a context
  * classloader for driver-side ServiceLoader discovery, then run BY
  * NAME through [[Main.run]] end to end into mr-out files.
  *
  * Why `addArtifact`, not `sparkContext.addJar`: Spark 4 isolates SQL
  * executions behind per-session artifact classloaders (SPARK-44146) —
  * an executor deserializes a SQL task binary through the session's
  * isolated loader, which `addJar` never feeds, so a plugin delivered
  * that way dies with the classic `cannot assign SerializedLambda`
  * ClassCastException (the deferred ClassNotFound is swallowed by
  * ObjectInputStream). The session-scoped artifact API is the Spark-4
  * `--jars` analog for SQL workloads; with it, even plugin LAMBDAS
  * round-trip (verified here — the app's map is a lambda).
  */
class DynamicAppJarSpec extends SparkSpec {

  private def makeJar(classes: java.nio.file.Path,
                      jar: java.nio.file.Path): Unit = {
    val out = new java.util.jar.JarOutputStream(
      java.nio.file.Files.newOutputStream(jar))
    try {
      val base = classes.toAbsolutePath
      java.nio.file.Files.walk(base).filter(_.toFile.isFile).forEach { f =>
        out.putNextEntry(new java.util.jar.JarEntry(
          base.relativize(f.toAbsolutePath).toString.replace('\\', '/')))
        out.write(java.nio.file.Files.readAllBytes(f))
        out.closeEntry()
      }
    } finally out.close()
  }

  test("a runtime-supplied app jar runs by name through the registry " +
       "(mrworker xxx.so parity)") {
    val root = java.nio.file.Files.createTempDirectory("graft-dynapp")
    // The plugin source: references only the published MrApplication /
    // MapReduceJob surface, never this build's internals.
    val src = root.resolve("VowelsApplication.scala")
    java.nio.file.Files.writeString(src,
      """package graftdemo
        |import graft.mr.{MapReduceJob, MrApplication}
        |final class VowelsApplication extends MrApplication {
        |  def name = "vowels"
        |  def map: MapReduceJob.MapF = (_, contents) =>
        |    contents.toLowerCase.filter(c => "aeiou".indexOf(c.toInt) >= 0)
        |      .map(c => (c.toString, "1"))
        |  def reduce: MapReduceJob.ReduceF =
        |    (_, values) => values.size.toString
        |}
        |""".stripMargin)
    val classes = root.resolve("classes")
    java.nio.file.Files.createDirectories(classes)
    val compiled = scala.tools.nsc.Main.process(Array(
      "-classpath", sys.props("java.class.path"),
      "-d", classes.toString, src.toString))
    assert(compiled, "in-test scalac failed on the plugin source")
    val svcDir = classes.resolve("META-INF/services")
    java.nio.file.Files.createDirectories(svcDir)
    java.nio.file.Files.writeString(
      svcDir.resolve("graft.mr.MrApplication"),
      "graftdemo.VowelsApplication\n")
    val jar = root.resolve("vowels-app.jar")
    makeJar(classes, jar)

    // not on the build classpath: the registry must NOT see it yet
    assert(!MrApplications.discover().contains("vowels"))

    val texts = Seq("the quick brown fox", "jumps over the lazy dog")
    val inDir = root.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    texts.zipWithIndex.foreach { case (t, i) =>
      java.nio.file.Files.writeString(inDir.resolve(s"doc$i.txt"), t) }
    val outDir = root.resolve("out").toString

    // Session artifact on a DISPOSABLE child session: executors resolve
    // the lambda's capturing class through the session's isolated
    // classloader (see scaladoc), and because artifacts are
    // session-scoped (SPARK-44146), registering on `newSession()` keeps
    // the throwaway jar out of the shared suite session's task artifact
    // sets — an artifact added there is attached forever and its backing
    // stream can vanish mid-run, failing UNRELATED later suites' tasks
    // with "Stream '/artifacts/<uuid>/...' was not found".
    val child = spark.newSession()
    child.addArtifact(jar.toString)
    val loader = new java.net.URLClassLoader(
      Array(jar.toUri.toURL), getClass.getClassLoader)
    val prev = Thread.currentThread.getContextClassLoader
    Thread.currentThread.setContextClassLoader(loader)
    try Main.run(child, "vowels",
      texts.indices.map(i => inDir.resolve(s"doc$i.txt").toString), outDir)
    finally Thread.currentThread.setContextClassLoader(prev)

    // the read-back needs no plugin classes: use the shared session to
    // prove the output is plain mrout data, independent of the artifact
    val got = spark.read.format("mrout").load(outDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = texts.flatMap(_.filter(c => "aeiou".contains(c)))
      .groupBy(_.toString).map { case (k, v) => k -> v.size.toString }
    assert(got === expected)
  }
}
