package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Checkpoint.CheckpointOps

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

  /** DISTRIBUTED PREFIX SUM, the pattern behind both training-data
    * layout operators below: a global running aggregate computed WITHOUT
    * a global single-task window. Phase 1 groups rows into deterministic
    * coarse buckets (a pure function of the data, never physical
    * partitions) and aggregates one total per bucket; phase 2 prefix-sums
    * the tiny bucket-total table (its window is one task over N/width
    * rows — at larger scale the same recursion applies again); phase 3
    * joins the broadcast offsets back and finishes with an in-bucket
    * window, which partitions by bucket and therefore parallelizes.
    * Every phase is partition-count- and order-independent, so the
    * result is engine-exact and sits behind the DuckDB oracle (whose
    * twin is the naive one-big-window SQL).
    */
  private def bucketOffsets(bucketed: DataFrame, value: Column): DataFrame =
    bucketed.groupBy(col("bucket")).agg(sum(value).as("btotal"))
      .withColumn("boffset",
        coalesce(sum(col("btotal")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boffset"))

  /** SEQUENCE PACKING: assign documents (in stable doc_id order) to
    * fixed token-budget training sequences — the "pack the corpus into
    * 4096-token rows" stage every LLM data pipeline runs before
    * tokenizer sharding. A document's sequence is determined by its
    * GLOBAL starting token offset (running sum of whitespace-token
    * counts over all earlier docs) divided by the budget — computed with
    * the distributed prefix sum above (buckets of 1000 doc_ids), never a
    * corpus-wide single-task window. Output is one row per packed
    * sequence with its doc count, token load, and id range.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val budget = 4096
    // checkpointed: the bucket-totals branch and the per-doc branch both
    // consume it, and without the checkpoint each would re-tokenize the
    // whole corpus (countMatches over text is the dominant per-doc cost)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        // matches(\s+)+1 == whitespace token count (see TextQueries)
        (graft.plans.GraftExtensions
          .countMatches(s, trim(col("text")), "\\s+") + 1)
          .cast("long").as("toks"))
      .withColumn("bucket", expr("doc_id div 1000"))
      .sharedCheckpoint()
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(bucketOffsets(toks, col("toks"))), "bucket")
      .withColumn("start_tok",
        col("boffset") + coalesce(sum(col("toks")).over(wIn), lit(0L)))
      .withColumn("seq_id", expr(s"start_tok div $budget"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_tokens"),
           min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** DETERMINISTIC GLOBAL SHUFFLE: a reproducible random permutation of
    * the corpus — every doc gets a unique position 1..N in pinned-hash
    * order (md5 of doc_id + seed; ties impossible beyond hash collisions,
    * which doc_id breaks). Training pipelines need exactly this before
    * epoch sharding, and at 100 TB it must not be `row_number() OVER
    * (ORDER BY hash)` — a corpus-wide window is one task. Because the
    * bucket is a PREFIX of the sort key, bucket order aligns with hash
    * order, so bucket-count offsets + an in-bucket rank compose to the
    * exact global rank (256 hash-space buckets here; a longer prefix at
    * real scale).
    */
  /** SOURCE-CAP SAMPLING (the RefinedWeb/DCLM "domain cap" stage): no
    * single source may contribute more than K documents, and the K
    * kept are its BEST by quality score (ties broken by doc_id, so
    * ranks are total and engine-exact) — dedup-by-provenance for
    * training mixes where one crawl domain would otherwise dominate.
    * Output is the per-source budget accounting a pipeline gates on:
    * kept/total doc counts, the kept docs' token budget, and the
    * worst quality admitted.
    *
    * At 100 TB: the rank window partitions BY SOURCE — thousands of
    * sources parallelize across the cluster, and no global window
    * exists anywhere. A pathologically hot source bounds one
    * partition's sort; since only the top K survive, that arm can
    * swap to the `graft_min_k`-style bounded aggregate without
    * changing semantics — the oracle pins the semantics either way.
    */
  def sampleSourceCap(s: SparkSession, dir: String): DataFrame = {
    val K = 50
    val stats = TextQueries.textStats(s, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    docs.join(stats, "doc_id")
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        count(when(col("rk") <= K, 1)).as("n_kept"),
        count(lit(1)).as("n_total"),
        sum(when(col("rk") <= K, col("n_tokens"))).cast("long")
          .as("kept_tokens"),
        min(when(col("rk") <= K, col("quality_score")))
          .as("min_kept_score"))
  }

  def shufflePositions(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":42"))).as("hkey"))
      .withColumn("bucket", substring(col("hkey"), 1, 2))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("hkey"), col("doc_id"))
    keyed.join(broadcast(bucketOffsets(keyed, lit(1L))), "bucket")
      .withColumn("position",
        col("boffset") + row_number().over(wIn).cast("long"))
      .select(col("position"), col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_assign"      -> splitAssign _,
    "sample_hash"       -> sampleHash _,
    "sample_stratified" -> sampleStratified _,
    "pack_sequences"    -> packSequences _,
    "sample_source_cap" -> sampleSourceCap _,
    "shuffle_positions" -> shufflePositions _)

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
        |WHERE rank <= 10""".stripMargin,
    "sample_source_cap" ->
      s"""WITH stats AS (${TextQueries.textStatsSql}),
         |ranked AS (
         |  SELECT d.source, s.doc_id, s.n_tokens, s.quality_score,
         |    row_number() OVER (PARTITION BY d.source
         |      ORDER BY s.quality_score DESC, s.doc_id) AS rk
         |  FROM documents d JOIN stats s USING (doc_id))
         |SELECT source,
         |  COUNT(CASE WHEN rk <= 50 THEN 1 END) AS n_kept,
         |  COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN rk <= 50 THEN n_tokens END) AS BIGINT)
         |    AS kept_tokens,
         |  MIN(CASE WHEN rk <= 50 THEN quality_score END)
         |    AS min_kept_score
         |FROM ranked GROUP BY 1""".stripMargin,
    "pack_sequences" ->
      raw"""WITH t AS (
           |  SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
           |      AS toks
           |  FROM documents),
           |p AS (
           |  SELECT doc_id, toks,
           |    COALESCE(SUM(toks) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS start_tok
           |  FROM t)
           |SELECT CAST(start_tok // 4096 AS BIGINT) AS seq_id,
           |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS sum_tokens,
           |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
           |FROM p GROUP BY 1""".stripMargin,
    "shuffle_positions" ->
      """SELECT CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id)
        |  AS BIGINT) AS position, doc_id
        |FROM documents""".stripMargin)
}
