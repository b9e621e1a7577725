package graft.mr

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference engine's single record type: a bag of string key/value
  * pairs (reference: mr/worker.go:19-22 `type KeyValue struct`).
  */
case class KV(key: String, value: String)

/** Reference-parity MapReduce core, re-expressed as one Spark plan.
  *
  * The reference (xuanhieu2611/MapReduce_CS416) executes a fixed dataflow
  * for every job (mr/worker.go:74-190):
  *
  *   scan(whole files) → map(mapf) → hashPartition(fnv32a, nReduce)
  *     → shuffle files → sortByKey → groupByKey → reduce(reducef) → text sink
  *
  * On Spark that whole pipeline — including the scheduling, phase barrier,
  * straggler re-execution, heartbeats and atomic output commit the Go code
  * implements by hand (mr/coordinator.go, ~600 LoC) — is a single
  * `flatMap → groupByKey → mapGroups` expression: the shuffle subsumes the
  * intermediate JSON files (mr/worker.go:105-122), the stage boundary is
  * the phase barrier (mr/coordinator.go:78-89), task retry + the file
  * output committer replace the 10 s reassignment timeout and temp+rename
  * commit (mr/coordinator.go:63-72, mr/worker.go:108-121).
  *
  * FNV-32a partitioning parity is intentionally NOT reproduced: the
  * reference's correctness contract is the *sorted union* of all output
  * partitions (main/test-mr.sh:103-104), which is partition-agnostic, so
  * Spark's hash partitioner satisfies it as-is.
  *
  * Two reduce paths:
  *   - [[run]]/[[runOnCorpus]]: holistic `reducef(key, allValues)` —
  *     exact reference semantics (the Go reducer sees the full value
  *     slice, mr/worker.go:164-174). One key's values must fit in one
  *     task, same memory contract as the reference.
  *   - [[runFoldable]]: an `Aggregator`-backed variant with map-side
  *     partial aggregation for when the reduce function is a fold (e.g.
  *     word count). This is the 100 TB-scale path: hot keys never
  *     materialize their full value list.
  */
object MapReduceJob {

  type MapF    = (String, String) => IterableOnce[(String, String)]
  type ReduceF = (String, Seq[String]) => String

  /** Whole-file text scan: one record per file, `(path, contents)` —
    * the reference's split rule (one file = one split = one map task,
    * README.md:111, mr/worker.go:89-95).
    */
  def wholeFiles(spark: SparkSession, paths: Seq[String],
                 minPartitions: Int = 0): Dataset[(String, String)] = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    spark.createDataset(
      spark.sparkContext.wholeTextFiles(paths.mkString(","), mp))
  }

  /** Full reference-parity job over text files. */
  def run(spark: SparkSession, inputs: Seq[String], mapf: MapF,
          reducef: ReduceF, nPartitions: Int = 0): Dataset[KV] =
    runOnCorpus(wholeFiles(spark, inputs, nPartitions), mapf, reducef)

  /** Same job over any `(documentId, contents)` corpus — used to run the
    * reference applications over the harness `documents` parquet table.
    */
  def runOnCorpus(corpus: Dataset[(String, String)], mapf: MapF,
                  reducef: ReduceF): Dataset[KV] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .flatMap { case (name, contents) => mapf(name, contents).iterator
        .map { case (k, v) => KV(k, v) } }
      .groupByKey(_.key)
      .mapGroups { (k, it) => KV(k, reducef(k, it.map(_.value).toSeq)) }
  }

  /** Scalable fold variant: map-side partial aggregation via a typed
    * `Aggregator`. Output-equivalent to [[runOnCorpus]] whenever
    * `reducef` is expressible as (zero, fold, merge, finish); unlike the
    * holistic path, per-key memory is O(1) regardless of key skew.
    */
  def runFoldable[B](corpus: Dataset[(String, String)], mapf: MapF,
                     zeroB: B, foldB: (B, String) => B,
                     mergeB: (B, B) => B, finishB: B => String)(
      implicit be: org.apache.spark.sql.Encoder[B]): Dataset[KV] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val agg = new Aggregator[KV, B, String] {
      def zero: B = zeroB
      def reduce(b: B, kv: KV): B = foldB(b, kv.value)
      def merge(a: B, b: B): B = mergeB(a, b)
      def finish(b: B): String = finishB(b)
      def bufferEncoder: org.apache.spark.sql.Encoder[B] = be
      def outputEncoder: org.apache.spark.sql.Encoder[String] =
        org.apache.spark.sql.Encoders.STRING
    }
    corpus
      .flatMap { case (name, contents) => mapf(name, contents).iterator
        .map { case (k, v) => KV(k, v) } }
      .groupByKey(_.key)
      .agg(agg.toColumn.name("value"))
      .map { case (k, v) => KV(k, v) }
  }

  /** Reference output format: one `"<key> <value>"` line per key
    * (mr/worker.go:175, format rule README.md:195). Partition layout is
    * not part of the contract (sorted-union semantics), so Spark's
    * `part-*` naming and the built-in committer replace `mr-out-X` +
    * temp/rename.
    */
  def saveText(out: Dataset[KV], path: String): Unit =
    out.select(concat_ws(" ", col("key"), col("value")))
      .write.mode("overwrite").text(path)
}
