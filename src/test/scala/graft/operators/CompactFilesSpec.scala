package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins the three properties of `source_compact_files`:
  *  1. the compacted table has far fewer files than the fragmented one;
  *  2. content is identical (compaction is physical, never semantic);
  *  3. compaction REGAINS data skipping: a shipdate range predicate
  *     prunes row groups on the range-clustered compacted copy but not
  *     on the fragmented copy (every small file spans the full range).
  */
class CompactFilesSpec extends SparkSpec {

  private def parquetFiles(path: String): Int =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet"))

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(nodes)
    nodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("compaction shrinks the file count, keeps content, regains skipping") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")

    val fragPath = new File("target/graft-io/compact_spec_frag")
      .getAbsolutePath
    val compactPath = new File("target/graft-io/compact_spec_out")
      .getAbsolutePath
    val li = Tables.lineitem(s, sf0001)
      .select(col("l_shipdate"), col("l_returnflag"), col("l_quantity"))
      .withColumn("l_shipdate", to_date(col("l_shipdate")))
    li.repartition(256).write.mode("overwrite").parquet(fragPath)
    val frag = s.read.parquet(fragPath)
    frag.repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(compactPath)

    val nFrag = parquetFiles(fragPath)
    val nCompact = parquetFiles(compactPath)
    assert(nFrag >= 200, s"fixture not fragmented: $nFrag files")
    assert(nCompact <= 16, s"compaction left $nCompact files")

    def pred(df: DataFrame): DataFrame =
      df.filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-07-01"))
    val total = frag.count()
    val fragRows = scanRows(pred(s.read.parquet(fragPath)))
    val compactRows = scanRows(pred(s.read.parquet(compactPath)))
    assert(fragRows === total,
      s"fragmented copy unexpectedly pruned: $fragRows of $total")
    assert(compactRows < total / 2,
      s"compacted copy did not prune: $compactRows of $total")

    // content identical
    val a = s.read.parquet(fragPath)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)), graft.functions.dsum(col("l_quantity")))
      .orderBy("l_returnflag").collect().toSeq
    val b = s.read.parquet(compactPath)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)), graft.functions.dsum(col("l_quantity")))
      .orderBy("l_returnflag").collect().toSeq
    assert(a === b)
  }
}
