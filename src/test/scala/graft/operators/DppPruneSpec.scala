package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EXERCISES dynamic partition pruning behind `source_dpp_prune`:
  *
  *  - the fact scan's partition filters must carry the injected
  *    `dynamicpruning` expression (no literal month predicate exists in
  *    the query — only the joined calendar dimension's quarter filter);
  *  - at runtime the scan must read ONLY the quarter's 3 month
  *    partitions of the ~80 on disk (the scan's partition metric);
  *  - the result must equal the same aggregate with a literal month
  *    predicate — pruning may never change semantics.
  */
class DppPruneSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap(nodes)

  test("partition filter is dynamic, reads 3 of 80 month partitions, " +
       "exact result") {
    // AQE off so the executed tree is directly traversable; DPP itself
    // is independent of AQE (the pruning subquery reuses the dimension
    // broadcast either way)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SourceQueries.dppJoinPrune(s, sf0001)

    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty)

    val scans = nodes(df.queryExecution.executedPlan)
      .collect { case sc: FileSourceScanExec
        if sc.output.exists(_.name == "o_ym") => sc }
    assert(scans.nonEmpty, "no partitioned fact scan in plan")
    val scan = scans.head
    assert(scan.partitionFilters.mkString(",").contains("dynamicpruning"),
      s"fact scan's partition filters are static: ${scan.partitionFilters}")

    // pin the DENOMINATOR first: the generator's date range must keep
    // the fixture at ~80 month dirs on disk, or "read 3" proves far
    // less pruning than advertised
    val factDir = new java.io.File(
      scan.relation.location.rootPaths.head.toUri.getPath)
    val monthDirs = Option(factDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("o_ym="))
    assert(monthDirs >= 70,
      s"fixture shrank to $monthDirs month partitions; 3-of-$monthDirs " +
        "no longer demonstrates partition-fraction pruning")

    // runtime partition metric: the quarter's 3 months of those
    val read = scan.metrics("numPartitions").value
    assert(read === 3, s"scan read $read partitions, wanted 3")

    // exactness vs the literal-predicate control
    val literal = graft.core.Tables.orders(s, sf0001)
      .filter(year(col("o_orderdate")) === 1995 &&
              quarter(col("o_orderdate")) === 1)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           graft.functions.dsum(col("o_totalprice")).as("sum_price"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === literal)
  }
}
