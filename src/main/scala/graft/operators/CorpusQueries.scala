package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions._

/** Reference-parity queries (SURVEY.md §2.2) expressed DataFrame-first
  * over the harness `documents` table, which stands in for the
  * reference's Gutenberg corpus (FIXTURES.md §2b: key = token, document
  * identity = doc_id).
  *
  * Every query here is declarative (codegen'd builtins only) so Catalyst
  * prunes the parquet scan down to the columns used and keeps the whole
  * pipeline inside WholeStageCodegen; the only shuffle in each is the
  * final keyed aggregation, with map-side partial aggregation — the
  * upgrade over the reference, which shuffles every ("word","1") pair
  * (SURVEY.md §2.3 "no combiner anywhere").
  */
object CorpusQueries {

  /** wc (mrapps/wc.go): token → occurrence count. */
  def wc(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** indexer (mrapps/indexer.go): token → distinct-doc count + sorted
    * comma-joined doc list. Doc ids are zero-padded so lexicographic
    * order (the reference sorts strings, indexer.go:37) is also stable.
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .distinct()
      .groupBy("word")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(sort_array(collect_set(padKey(col("doc_id")))), ",")
          .as("docs"))

  /** early_exit analog (mrapps/early_exit.go): docs per source "file". */
  def fileCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"))

  /** crash/nocrash analog (mrapps/crash.go:45-55): per group, the sorted
    * space-joined value list — the holistic "sort values then join"
    * reducer shape.
    *
    * Scale design: the naive `sort_array(collect_list(...))` puts EVERY
    * value of a group into one aggregation buffer — with ~5 `lang`
    * groups that is one task holding ~20% of the corpus, the one plan in
    * the catalog that dies at 100×. Instead the heavy sort runs
    * distributed (`repartitionByRange` + `sortWithinPartitions`, the
    * classic TeraSort shape), each partition emits ONE pre-joined
    * partial run per key, and the final reducer merges ≤ numPartitions
    * partials in partition-id order — its buffer holds ~32 structs, not
    * N rows. The output string is still O(group), but that is the
    * query's output contract, not intermediate state.
    */
  def kvConcat(s: SparkSession, dir: String): DataFrame = {
    // RangePartitioner assigns contiguous, increasing key ranges to
    // increasing partition ids, so (pid asc, in-partition sorted runs)
    // concatenate to the exact global sort order the oracle demands.
    val sorted = Tables.documents(s, dir)
      .select(col("lang"), padKey(col("doc_id")).as("doc"))
      .repartitionByRange(col("lang"), col("doc"))
      .sortWithinPartitions("lang", "doc")
      .select(col("lang"), col("doc"), spark_partition_id().as("pid"))
    // Each (lang, pid) group lives entirely inside one source partition,
    // so collect_list sees exactly one partial buffer filled in
    // encounter (= sorted) order.
    val partials = sorted
      .groupBy("lang", "pid")
      .agg(array_join(collect_list(col("doc")), " ").as("run"))
    partials
      .groupBy("lang")
      .agg(
        array_join(
          transform(
            sort_array(collect_list(struct(col("pid"), col("run")))),
            r => r.getField("run")),
          " ").as("vals"))
  }

  /** The documents table as the MR engine's `(documentId, contents)`
    * corpus shape (ids zero-padded so string sorts match numeric order).
    */
  private def mrCorpus(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(String, String)] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(padKey(col("doc_id")), col("text"))
      .as[(String, String)]
  }

  /** wc through the TYPED reference-parity engine (graft.mr): the exact
    * `flatMap → groupByKey → mapGroups` plan the reference executes,
    * with its Go application functions transcribed — verified by the
    * same DuckDB oracle as the relational `wc`, so the engine layer
    * itself sits behind the value-hash gate, not just the specs.
    */
  def mrWc(s: SparkSession, dir: String): DataFrame =
    graft.mr.MapReduceJob.runOnCorpus(mrCorpus(s, dir),
      graft.mr.Apps.WordCount.map, graft.mr.Apps.WordCount.reduce).toDF()

  /** Inverted index through the typed engine (mrapps/indexer.go
    * semantics: value = `"<count> <doc1,doc2,...>"`, docs sorted). */
  def mrInvertedIndex(s: SparkSession, dir: String): DataFrame =
    graft.mr.MapReduceJob.runOnCorpus(mrCorpus(s, dir),
      graft.mr.Apps.Indexer.map, graft.mr.Apps.Indexer.reduce).toDF()

  /** wc through the typed engine's SCALABLE path
    * ([[graft.mr.MapReduceJob.runFoldable]]): map-side partial
    * aggregation with O(1)/key buffers instead of the holistic
    * full-value-list reducer — the 100 TB shape, behind the same DuckDB
    * oracle as `mr_wc` so the bounded path is value-hash-gated too.
    */
  def mrWcFoldable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = graft.mr.Apps.WordCount
    graft.mr.MapReduceJob.runFoldable(mrCorpus(s, dir), a.map,
      a.zero, a.fold, a.merge, a.finish).toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wc"             -> wc _,
    "inverted_index" -> invertedIndex _,
    "file_count"     -> fileCount _,
    "kv_concat"      -> kvConcat _,
    "mr_wc"          -> mrWc _,
    "mr_wc_foldable" -> mrWcFoldable _,
    "mr_inverted_index" -> mrInvertedIndex _)

  val oracles: Map[String, String] = Map(
    "wc" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word""".stripMargin,
    "inverted_index" ->
      """WITH wd AS (
        |  SELECT DISTINCT word, lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc
        |  FROM (SELECT doc_id,
        |               unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |        FROM documents)
        |  WHERE word <> '')
        |SELECT word, count(*) AS n_docs,
        |       string_agg(doc, ',' ORDER BY doc) AS docs
        |FROM wd GROUP BY word""".stripMargin,
    "mr_wc" ->
      """SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word""".stripMargin,
    "mr_wc_foldable" ->
      """SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word""".stripMargin,
    "mr_inverted_index" ->
      """WITH wd AS (
        |  SELECT DISTINCT word, lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc
        |  FROM (SELECT doc_id,
        |               unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |        FROM documents)
        |  WHERE word <> '')
        |SELECT word AS key,
        |       count(*) || ' ' || string_agg(doc, ',' ORDER BY doc) AS value
        |FROM wd GROUP BY word""".stripMargin,
    "file_count" ->
      "SELECT source, count(*) AS n_docs FROM documents GROUP BY source",
    "kv_concat" ->
      """SELECT lang,
        |       string_agg(lpad(CAST(doc_id AS VARCHAR), 8, '0'), ' '
        |                  ORDER BY lpad(CAST(doc_id AS VARCHAR), 8, '0')) AS vals
        |FROM documents GROUP BY lang""".stripMargin)
}
