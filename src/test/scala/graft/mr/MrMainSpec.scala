package graft.mr

import graft.SparkSpec

/** End-to-end CLI contract (reference: `mrcoordinator pg-*.txt` +
  * `mrworker wc.so`, main/mrcoordinator.go:23 / main/mrworker.go:25-49):
  * name an app, point at text files, get reference-format `mr-out-<N>`
  * output back — readable by both the `mrout` connector and a plain
  * line reader.
  */
class MrMainSpec extends SparkSpec {

  private def fixtures(): java.nio.file.Path = {
    val in = java.nio.file.Files.createTempDirectory("graft-main-in")
    java.nio.file.Files.writeString(in.resolve("pg-a.txt"),
      "the quick brown fox jumps over the lazy dog the fox")
    java.nio.file.Files.writeString(in.resolve("pg-b.txt"),
      "the dog sleeps")
    in
  }

  test("Main runs wc by name: text glob -> mr-out files -> mrout scan") {
    val in = fixtures()
    val out = java.nio.file.Files.createTempDirectory("graft-main-out").toString
    Main.run(spark, "wc", Seq(s"$in/pg-*.txt"), out)
    // reference output naming (mr-out-<N>), no leftover temp files
    val names = new java.io.File(out).list().toSeq
    assert(names.exists(_.startsWith("mr-out-")), names.toString)
    assert(!names.exists(_.contains("tmp")), names.toString)
    val counts = spark.read.format("mrout").load(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(counts("the") === "4" && counts("fox") === "2" &&
           counts("dog") === "2" && counts("sleeps") === "1")
  }

  test("Main runs indexer by name; output lists sorted source docs") {
    val in = fixtures()
    val out = java.nio.file.Files.createTempDirectory("graft-main-out").toString
    Main.run(spark, "indexer", Seq(s"$in/pg-*.txt"), out)
    val index = spark.read.format("mrout").load(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // "the" appears in both docs: "<count> <sorted,comma,joined,docs>"
    val the = index("the").split(" ")
    assert(the(0) === "2")
    val docs = the(1).split(",")
    assert(docs.length === 2 && docs.sorted.sameElements(docs))
    assert(docs(0).endsWith("pg-a.txt") && docs(1).endsWith("pg-b.txt"))
    assert(index("sleeps").startsWith("1 "))
  }

  test("Main rejects an unknown application name") {
    val in = fixtures()
    val out = java.nio.file.Files.createTempDirectory("graft-main-out").toString
    val e = intercept[IllegalArgumentException] {
      Main.run(spark, "no_such_app", Seq(s"$in/pg-*.txt"), out)
    }
    assert(e.getMessage.contains("no_such_app"))
  }
}
