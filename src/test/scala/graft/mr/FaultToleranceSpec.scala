package graft.mr

import org.apache.spark.TaskContext

import graft.SparkSpec

/** Fault-tolerance BEHAVIOR tests — the analog of the reference's crash
  * suite (main/test-mr.sh:284-330, mrapps/crash.go), jobcount suite
  * (main/test-mr.sh:201-223, mrapps/jobcount.go) and early-exit output
  * finality (main/test-mr.sh:226-281).
  *
  * The reference proves its coordinator reassigns crashed tasks and that
  * the sorted union of the outputs still matches the sequential oracle.
  * Here the same property is exercised against Spark's task retry
  * (enabled via `local[4, 4]` in [[graft.SparkSpec]]): every task of a
  * stage throws on its first attempt (`TaskContext.attemptNumber == 0`),
  * so the job only completes if retry works, and the result must be
  * bit-identical to the no-fault run.
  */
class FaultToleranceSpec extends SparkSpec {
  import spark.implicits._

  // Enough docs that every one of the 4 input partitions is non-empty.
  val docs: Seq[(String, String)] =
    (1 to 48).map(i => (f"d$i%03d", s"alpha beta w$i gamma delta"))
  def corpus = spark.createDataset(docs)

  def golden: Map[String, String] =
    MapReduceJob.runOnCorpus(corpus, Apps.WordCount.map,
      Apps.WordCount.reduce).collect().map(kv => kv.key -> kv.value).toMap

  /** Wraps a map function so the FIRST attempt of every map task dies
    * mid-way (after emitting for some records — the reference's crash.go
    * also dies between emissions, not before any work).
    */
  def crashFirstAttempt(inner: MapReduceJob.MapF): MapReduceJob.MapF = {
    (name, contents) =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && name.endsWith("7"))
        throw new RuntimeException(
          s"injected map crash in ${tc.partitionId()} (crash.go analog)")
      inner(name, contents)
  }

  test("crash recovery: every map task dies once, result still exact") {
    val got = MapReduceJob.runOnCorpus(corpus,
      crashFirstAttempt(Apps.WordCount.map), Apps.WordCount.reduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === golden)
  }

  test("crash recovery: every reduce task dies once, result still exact") {
    val crashyReduce: MapReduceJob.ReduceF = (k, values) => {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0)
        throw new RuntimeException(
          s"injected reduce crash in ${tc.partitionId()} (crash.go analog)")
      Apps.WordCount.reduce(k, values)
    }
    val got = MapReduceJob.runOnCorpus(corpus, Apps.WordCount.map,
      crashyReduce).collect().map(kv => kv.key -> kv.value).toMap
    assert(got === golden)
  }

  test("crash recovery holds for the holistic sort-join reducer (crash.go)") {
    val noFault = MapReduceJob.runOnCorpus(corpus, Apps.KvConcat.map,
      Apps.KvConcat.reduce).collect().map(kv => kv.key -> kv.value).toMap
    val got = MapReduceJob.runOnCorpus(corpus,
      crashFirstAttempt(Apps.KvConcat.map), Apps.KvConcat.reduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === noFault)
  }

  test("output finality: committed text output is exact despite crashes") {
    // The reference commits via temp file + atomic rename
    // (mr/worker.go:108-121); Spark's FileOutputCommitter plays that
    // role. A crashed first attempt must leave no partial/duplicate
    // lines in the committed directory.
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val out = MapReduceJob.runOnCorpus(corpus,
      crashFirstAttempt(Apps.WordCount.map), Apps.WordCount.reduce)
    MapReduceJob.saveText(out, s"$dir/out")
    val lines = spark.read.text(s"$dir/out").collect().map(_.getString(0))
    val expected = golden.map { case (k, v) => s"$k $v" }.toSeq.sorted
    assert(lines.sorted.toSeq === expected)
  }

  test("jobcount: absent failures, each input is mapped exactly once") {
    // Reference jobcount (mrapps/jobcount.go + test-mr.sh:201-223):
    // the coordinator must not hand the same task out twice while the
    // worker is healthy. Spark analog: a counter incremented per map-
    // function invocation equals the input size — no duplicate
    // scheduling, no speculative re-run. (Accumulators only fold in
    // SUCCESSFUL task attempts, so a stray retry that somehow succeeded
    // twice would show up as a double count.)
    val calls = spark.sparkContext.longAccumulator("map-invocations")
    val counted: MapReduceJob.MapF = (name, contents) => {
      calls.add(1)
      Apps.WordCount.map(name, contents)
    }
    val got = MapReduceJob.runOnCorpus(corpus, counted,
      Apps.WordCount.reduce).collect().map(kv => kv.key -> kv.value).toMap
    assert(got === golden)
    assert(calls.value === docs.size.toLong,
      s"expected exactly ${docs.size} map invocations, saw ${calls.value}")
  }

  test("jobcount under crashes: committed result reflects single effect") {
    // With injected first-attempt crashes the RAW invocation count may
    // legitimately exceed n (retries re-run the function — same as the
    // reference, where a crashed map task's work is redone by the
    // reassigned worker). The contract that matters is that the
    // *committed result* counts each input exactly once.
    val calls = spark.sparkContext.longAccumulator("map-invocations-crash")
    val counted: MapReduceJob.MapF = (name, contents) => {
      calls.add(1)
      Apps.WordCount.map(name, contents)
    }
    val got = MapReduceJob.runOnCorpus(corpus, crashFirstAttempt(counted),
      Apps.WordCount.reduce).collect().map(kv => kv.key -> kv.value).toMap
    assert(got === golden)
    assert(calls.value >= docs.size.toLong)
  }

  test("crash recovery on the foldable (map-side combine) path too") {
    val noFault = MapReduceJob.runFoldable(corpus, Apps.WordCount.map,
      Apps.WordCount.zero, Apps.WordCount.fold, Apps.WordCount.merge,
      Apps.WordCount.finish).collect().map(kv => kv.key -> kv.value).toMap
    val got = MapReduceJob.runFoldable(corpus,
      crashFirstAttempt(Apps.WordCount.map),
      Apps.WordCount.zero, Apps.WordCount.fold, Apps.WordCount.merge,
      Apps.WordCount.finish).collect().map(kv => kv.key -> kv.value).toMap
    assert(got === noFault)
    assert(got === golden)
  }
}
