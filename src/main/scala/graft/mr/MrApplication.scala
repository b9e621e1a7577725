package graft.mr

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset

/** A named, runtime-pluggable MapReduce application.
  *
  * The reference loads applications as compiled `.so` plugins at worker
  * startup (`main/mrworker.go:32-49`, `plugin.Open` + `Lookup("Map")` /
  * `Lookup("Reduce")`). The JVM-idiomatic equivalent is
  * `java.util.ServiceLoader`: an application ships as a jar on the
  * classpath carrying a `META-INF/services/graft.mr.MrApplication`
  * entry, and [[MrApplications.discover]] finds it by name at runtime —
  * no recompilation of the engine, same late-binding contract as the
  * reference's plugin flag (`mrworker xxx.so`).
  *
  * Delivery of the jar to a RUNNING engine: `spark.addArtifact(jar)`
  * (NOT `sparkContext.addJar` — Spark 4's per-session artifact
  * isolation means SQL task binaries deserialize through the session's
  * isolated classloader, which addJar never feeds) plus a context
  * classloader holding the jar for driver-side discovery. Exercised
  * end to end by `graft.mr.DynamicAppJarSpec`, which compiles a plugin
  * out-of-build, jars it, and runs it by name through [[graft.mr.Main]].
  */
trait MrApplication {
  /** CLI-style name, the analog of the reference's plugin filename. */
  def name: String
  def map: MapReduceJob.MapF
  def reduce: MapReduceJob.ReduceF
}

object MrApplications {

  /** All applications registered on the classpath, keyed by name. */
  def discover(): Map[String, MrApplication] =
    java.util.ServiceLoader.load(classOf[MrApplication]).asScala
      .map(a => a.name -> a).toMap

  /** Look up an application by name (reference: `mrworker wc.so`) and
    * run it through the engine on the given corpus.
    */
  def run(name: String, corpus: Dataset[(String, String)]): Dataset[KV] = {
    val app = discover().getOrElse(name,
      throw new IllegalArgumentException(
        s"no MrApplication named '$name' on the classpath " +
          s"(found: ${discover().keys.toSeq.sorted.mkString(", ")})"))
    MapReduceJob.runOnCorpus(corpus, app.map, app.reduce)
  }
}

/** The reference's bundled applications, exposed as plugins — each a
  * zero-arg class so ServiceLoader can instantiate it.
  */
final class WcApplication extends MrApplication {
  def name = "wc"
  def map = Apps.WordCount.map
  def reduce = Apps.WordCount.reduce
}

final class IndexerApplication extends MrApplication {
  def name = "indexer"
  def map = Apps.Indexer.map
  def reduce = Apps.Indexer.reduce
}

final class KvConcatApplication extends MrApplication {
  def name = "kv_concat"
  def map = Apps.KvConcat.map
  def reduce = Apps.KvConcat.reduce
}

final class FileCountApplication extends MrApplication {
  def name = "file_count"
  def map = Apps.FileCount.map
  def reduce = Apps.FileCount.reduce
}
