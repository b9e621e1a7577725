package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic sampling / dataset-splitting operators over `documents`
  * — the "carve the corpus" stage of an LLM-data pipeline (train/val/
  * test assignment, subsampling, per-stratum quotas).
  *
  * Random sampling is useless at 100 TB if it isn't reproducible across
  * reruns, engines, and partitionings — so none of these use an RNG. The
  * randomness is a pinned hash (md5 of the stable doc key): assignment is
  * a pure per-row function, immune to partition count, execution order,
  * and engine (DuckDB computes the identical md5 hex ⇒ every query here
  * is exact-value verifiable). Fixed-width lowercase hex compares
  * lexicographically as the underlying 128-bit integer, so hex-string
  * thresholds are uniform cuts of the hash space.
  *
  * Scale notes:
  *   - Split assignment and hash sampling are map-only: zero shuffles,
  *     pure scan throughput; the sample predicate evaluates before any
  *     wide transform, so downstream stages see only the kept fraction.
  *   - The stratified quota is a per-group top-k by hash order — planned
  *     as WindowGroupLimit, which prunes to k rows per group map-side
  *     BEFORE the shuffle, so the exchange moves O(k·|groups|) rows, not
  *     the corpus.
  */
object SamplingQueries {

  private def hashKey(c: Column): Column = md5(c.cast("string"))

  /** Train/val/test assignment by hash threshold: ~96% / ~2% / ~2%
    * (cuts at 0xf6/0x100 and 0xfb/0x100 of the hash space). Per-split
    * document and token totals — the numbers a pipeline actually gates
    * on before a run.
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    val h2 = substring(hashKey(col("doc_id")), 1, 2)
    Tables.documents(s, dir)
      .select(
        when(h2 < "f6", "train").when(h2 < "fb", "val").otherwise("test")
          .as("split"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
  }

  /** Deterministic ~1/16 subsample: keep docs whose hash falls in the
    * first sixteenth of the hash space. Emits the surviving rows (id,
    * source, token count) — the materialized sample a downstream job
    * would read.
    */
  def sampleHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(substring(hashKey(col("doc_id")), 1, 1) === "0")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))

  /** Stratified quota sample: the 10 docs with the smallest hash per
    * source — every stratum is represented with a fixed budget
    * regardless of stratum skew. Hash order is a reproducible shuffle;
    * md5 collisions are broken by doc_id so ranks are total.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), hashKey(col("doc_id")).as("h"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .drop("h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_assign"      -> splitAssign _,
    "sample_hash"       -> sampleHash _,
    "sample_stratified" -> sampleStratified _)

  val oracles: Map[String, String] = Map(
    "split_assign" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f6'
        |            THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'fb'
        |            THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS n_tokens
        |FROM documents GROUP BY 1""".stripMargin,
    "sample_hash" ->
      """SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |    AS n_toks
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'""".stripMargin,
    "sample_stratified" ->
      """SELECT source, doc_id, rank FROM (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS rank
        |  FROM documents)
        |WHERE rank <= 10""".stripMargin)
}
