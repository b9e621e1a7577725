package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL door reports TRUE CARDINALITY from the file-stats sidecar
  * ([[SnapshotDppScan.estimateStatistics]]): the stock `FileScan`
  * estimate carries only bytes, leaving AQE/broadcast planning to
  * guess rows from a compression-sensitive byte heuristic. The scan's
  * `numRows` must equal the sidecar row sum over exactly the files the
  * PRUNED scan reads — whole table unpruned, the partition's rows
  * under a mirror predicate — and must reach the logical plan's
  * statistics (what join planning actually consults).
  */
class SnapshotReportedStatsSpec extends SparkSpec {

  private def dppScan(df: DataFrame): SnapshotDppScan =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation
        if r.scan.isInstanceOf[SnapshotDppScan] =>
        r.scan.asInstanceOf[SnapshotDppScan]
    }.getOrElse(fail("no SnapshotDppScan in plan"))

  test("scan numRows == sidecar row sum, post partition pruning; " +
    "logical stats carry it") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("repstats")
    val root = base.resolve("t")
    (1L to 90L).map(id => (id, s"d${id % 3}", id.toDouble))
      .toDF("id", "day", "v")
      .write.format("graft-snapshot")
      .option("keyCol", "id").option("partCol", "day")
      .mode("append").save(root.toString)
    val cat = "repstats"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftSnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base.toString)

    // whole-table scan: numRows == the store's 90 rows
    val full = spark.sql(s"SELECT id, v FROM $cat.`t`")
    val fullStats = dppScan(full).estimateStatistics()
    assert(fullStats.numRows.isPresent, "sidecar-backed scan must " +
      "report a row count")
    assert(fullStats.numRows.getAsLong === 90L)

    // pruned scan: numRows == exactly the kept partition's rows
    val pruned = spark.sql(
      s"SELECT id, v FROM $cat.`t` WHERE day_p = 'd1'")
    val prunedStats = dppScan(pruned).estimateStatistics()
    assert(prunedStats.numRows.isPresent)
    assert(prunedStats.numRows.getAsLong === 30L,
      s"pruned scan must report the surviving files' rows, got " +
        s"${prunedStats.numRows.getAsLong}")
    // and the number the optimizer actually consults agrees
    val planRows = pruned.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.stats.rowCount
    }.flatten
    assert(planRows.contains(BigInt(30)),
      s"logical stats must carry the sidecar count, got $planRows")
    // exactness of the data itself, same predicate
    assert(pruned.count() === 30L)
  }

  test("the union-of-specs (evolved) scan reports sidecar row counts " +
    "too") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("repstats_ev")
    val root = base.resolve("t")
    (1L to 90L).map(id => (id, s"t${id % 2}", s"d${id % 3}", id.toDouble))
      .toDF("id", "etype", "day", "v")
      .write.format("graft-snapshot")
      .option("keyCol", "id").option("partCol", "day")
      .mode("append").save(root.toString)
    val cat = "repstatsev"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftSnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base.toString)
    spark.sql(s"CALL $cat.evolve_partitioning('t', 'etype')")
    Seq((200L, "t0", "d0", 1200.0)).toDF("id", "etype", "day", "v")
      .write.format("graft-snapshot")
      .option("keyCol", "id").option("partCol", "day")
      .mode("append").save(root.toString) // head spans two layouts now
    val df = spark.sql(s"SELECT id, v FROM $cat.`t`")
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation
        if r.scan.isInstanceOf[SnapshotEvolvedScan] =>
        r.scan.asInstanceOf[SnapshotEvolvedScan]
    }.getOrElse(fail("expected the union-of-specs scan"))
    val st = scan.estimateStatistics()
    assert(st.numRows.isPresent && st.numRows.getAsLong === 91L,
      s"evolved scan must report sidecar cardinality, got $st")
  }

  test("a PARTIALLY-covered sidecar falls back to the delegate " +
    "estimate instead of under-reporting unknown files as 0 rows") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("repstats_part")
    val root = base.resolve("t")
    (1L to 90L).map(id => (id, s"d${id % 3}", id.toDouble))
      .toDF("id", "day", "v")
      .write.format("graft-snapshot")
      .option("keyCol", "id").option("partCol", "day")
      .mode("append").save(root.toString)
    val cat = "repstatspart"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftSnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base.toString)
    val sidecar = root.resolve("manifests").resolve("v1.files")
    val lines = java.nio.file.Files.readAllLines(sidecar)
    assert(lines.size() > 1, s"need a multi-file sidecar: $lines")
    // the legacy-upgrade shape: the scan PLANS against a sidecar-less
    // version (real listing), then a partial sidecar appears (an
    // upgrade that profiled only part of the history) before stats
    // are consulted — pre-fix, the two unprofiled files counted as 0
    // rows and numRows under-reported 90 as 30, flipping join
    // planning toward broadcasting a large table
    java.nio.file.Files.delete(sidecar)
    val df = spark.sql(s"SELECT id, v FROM $cat.`t`")
    val scan = dppScan(df)
    java.nio.file.Files.write(sidecar, lines.subList(0, 1))
    val st = scan.estimateStatistics()
    assert(!st.numRows.isPresent,
      s"partial sidecar must fall back to the delegate (numRows " +
        s"empty), got ${st.numRows}")
    assert(st.sizeInBytes.isPresent, "bytes still come from the scan")
  }
}
