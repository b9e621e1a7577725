package graft.mr

import graft.SparkSpec

/** Runtime plugin registry — analog of the reference's `.so` loading
  * (main/mrworker.go:32-49): applications are discovered by name from
  * the classpath at runtime, not wired at compile time.
  */
class MrApplicationSpec extends SparkSpec {
  import spark.implicits._

  val corpus = Seq(("d1", "a b a"), ("d2", "b c"))

  test("ServiceLoader discovers all bundled reference applications") {
    val apps = MrApplications.discover()
    assert(Set("wc", "indexer", "kv_concat", "file_count")
      .subsetOf(apps.keySet))
  }

  test("running a discovered app equals the compile-time wiring") {
    val viaPlugin = MrApplications.run("wc", corpus.toDS())
      .collect().map(kv => kv.key -> kv.value).toMap
    val direct = MapReduceJob.runOnCorpus(corpus.toDS(),
      Apps.WordCount.map, Apps.WordCount.reduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(viaPlugin === direct)
    assert(viaPlugin === Map("a" -> "2", "b" -> "2", "c" -> "1"))
  }

  test("unknown application name fails with the available list") {
    val e = intercept[IllegalArgumentException] {
      MrApplications.run("nope", corpus.toDS())
    }
    assert(e.getMessage.contains("no MrApplication named 'nope'"))
    assert(e.getMessage.contains("wc"))
  }
}
