package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CorpusQueries, DedupQueries, EmbeddingQueries,
  MultimodalQueries, OlapQueries, RelationalQueries, SamplingQueries,
  SourceQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full verified catalog (reference-parity corpus
  * queries + star-schema relational operators + LLM-pipeline operators);
  * `oracleSql` carries the DuckDB-equivalent SQL for every entry that is
  * SQL-expressible (the rest get the driver's rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CorpusQueries.wc(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (CorpusQueries.queries, CorpusQueries.oracles),
    (RelationalQueries.queries, RelationalQueries.oracles),
    (DedupQueries.queries, DedupQueries.oracles),
    (TextQueries.queries, TextQueries.oracles),
    (EmbeddingQueries.queries, EmbeddingQueries.oracles),
    (SamplingQueries.queries, SamplingQueries.oracles),
    (MultimodalQueries.queries, MultimodalQueries.oracles),
    (OlapQueries.queries, OlapQueries.oracles),
    (SourceQueries.queries, SourceQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
