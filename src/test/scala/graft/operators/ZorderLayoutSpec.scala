package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MEASURES the multi-dimensional data skipping `source_zorder_prune`
  * claims, on identical data and an identical predicate:
  *
  *  - a 1-D layout (sorted by ship day only) and the Z-order layout are
  *    both written from the same lineitem slice;
  *  - the same wide-date + narrow-partkey filter-aggregate runs over
  *    each, AQE off so `executedPlan` is the real tree;
  *  - the parquet scan's `numOutputRows` metric (rows surviving
  *    row-group min/max pruning — record-level filtering is off, so
  *    this measures SKIPPING, not filtering) must be strictly smaller
  *    for the Z-layout: date-sorted files each span the full partkey
  *    range, so the partkey cut prunes nothing there, while Z-files
  *    cover compact (day, partkey) boxes and both dims prune;
  *  - both results — and a direct unlaid-out read — must be identical:
  *    layout is physical, never semantic.
  */
class ZorderLayoutSpec extends SparkSpec {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(nodes)
    val scans = nodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no parquet scan in executed plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout skips on both dimensions; 1-D sort layout cannot") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // many small files so pruning granularity is visible at sf0.001
    s.conf.set("spark.sql.files.maxPartitionBytes", "64k")

    val (zPath, cutoff) = SourceQueries.zorderLayout(s, sf0001)
    val datePath = new java.io.File("target/graft-io/datesort_lineitem")
      .getAbsolutePath
    // same DATE normalization as the z-layout, so the comparison
    // isolates the LAYOUT difference, not the column type's prunability
    graft.core.Tables.lineitem(s, sf0001)
      .select(col("l_partkey"), col("l_shipdate"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
      .withColumn("l_shipdate", to_date(col("l_shipdate")))
      .repartitionByRange(32, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(datePath)

    def query(path: String): DataFrame =
      s.read.parquet(path)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_partkey") <= lit(cutoff))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          graft.functions.dsum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))

    val zQ = query(zPath)
    val dQ = query(datePath)
    val zRows = scanRows(zQ)
    val dRows = scanRows(dQ)
    val total = s.read.parquet(zPath).count()

    // both layouts must skip SOMETHING (the date window prunes both)...
    assert(dRows < total, s"date layout pruned nothing: $dRows of $total")
    // ...but only z-order also prunes the partkey dimension
    assert(zRows < dRows,
      s"z-layout scan emitted $zRows rows, date-sorted $dRows — " +
        "no 2-D skipping advantage")

    // layout is transparent: all three reads agree exactly
    val direct = graft.core.Tables.lineitem(s, sf0001)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_partkey") <= lit(cutoff))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    val want = direct.orderBy("l_returnflag").collect().toSeq
    assert(zQ.orderBy("l_returnflag").collect().toSeq === want)
    assert(dQ.orderBy("l_returnflag").collect().toSeq === want)
  }
}
