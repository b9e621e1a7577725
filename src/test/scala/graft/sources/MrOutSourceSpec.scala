package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MrOutSourceSpec extends SparkSpec {

  private def writeSample(): String = {
    val dir = new java.io.File("target/graft-io/mrout_spec")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "mr-out-0"),
      "apple 3\nbanana 1 extra\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "mr-out-1"),
      "cherry 7\n")
    dir.getAbsolutePath
  }

  test("mrout: reads key/value lines, value = rest after first space") {
    val dir = writeSample()
    val rows = spark.read.format("mrout").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("apple", "3"), ("banana", "1 extra"), ("cherry", "7")))
  }

  test("mrout: one scan partition per output file") {
    val dir = writeSample()
    assert(spark.read.format("mrout").load(dir).rdd.getNumPartitions === 2)
  }

  test("mrout: column pruning reaches the scan's ReadSchema") {
    val dir = writeSample()
    val plan = spark.read.format("mrout").load(dir)
      .select(col("key")).queryExecution.executedPlan.toString
    // DSv2 BatchScan prints the pruned output attributes inline
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).get
    assert(scanLine.contains("[key#") && !scanLine.contains("value#"),
      plan)
    val keys = spark.read.format("mrout").load(dir).select("key")
      .collect().map(_.getString(0)).sorted
    assert(keys === Array("apple", "banana", "cherry"))
  }

  test("mrout: count(*) works with an empty projection") {
    val dir = writeSample()
    assert(spark.read.format("mrout").load(dir).count() === 3L)
  }

  test("mrout round-trips MapReduceJob.saveText output") {
    import spark.implicits._
    val out = graft.mr.MapReduceJob.runOnCorpus(
      Seq(("d1", "a b a"), ("d2", "b c")).toDS(),
      graft.mr.Apps.WordCount.map, graft.mr.Apps.WordCount.reduce)
    val dir = "target/graft-io/mrout_spec_rt"
    graft.mr.MapReduceJob.saveText(out, dir)
    val back = spark.read.format("mrout").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("a", "2"), ("b", "2"), ("c", "1")))
  }
}
