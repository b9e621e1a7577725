package graft.operators

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins the property that makes `source_merge_upsert` viable at scale:
  * the merge rewrites ONLY the partitions its delta touches. A
  * single-month delta runs through `mergeInto` and every other month's
  * partition directory must be byte-for-byte untouched (same file
  * names, lengths, mtimes) — plus the merged table must show exactly
  * the update applied and all other rows intact.
  */
class MergeUpsertSpec extends SparkSpec {

  private def snapshot(dir: File): Map[String, Seq[(String, Long, Long)]] =
    dir.listFiles().filter(_.isDirectory).map { p =>
      p.getName -> p.listFiles().filter(_.isFile).sortBy(_.getName)
        .map(f => (f.getName, f.length, f.lastModified)).toSeq
    }.toMap

  test("merge rewrites touched partitions only; rows exact") {
    val root = new File("target/graft-io/merge_spec")
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    val basePath = new File(root, "base").getAbsolutePath
    val tmpPath = new File(root, "tmp").getAbsolutePath

    val orders = Tables.orders(spark, sf0001)
      .withColumn("o_ym", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.write.partitionBy("o_ym").parquet(basePath)
    val before = snapshot(new File(basePath))

    // delta: bump every order in ONE month by 1000.0
    val month = "1996-03"
    val delta = orders.filter(col("o_ym") === month)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
    val nDelta = delta.count()
    assert(nDelta > 0, s"fixture month $month is empty")
    SourceQueries.mergeInto(spark, basePath, tmpPath, delta)

    val after = snapshot(new File(basePath))
    assert(before.keySet === after.keySet, "partition set changed")
    val changed = before.keySet.filter(k => before(k) != after(k))
    assert(changed === Set(s"o_ym=$month"),
      s"expected only o_ym=$month rewritten, got: $changed")

    // row-level exactness: touched month bumped, rest identical
    val merged = spark.read.parquet(basePath)
    assert(merged.count() === orders.count())
    val bumped = merged.filter(col("o_ym") === month)
      .agg(sum(col("o_totalprice"))).head().getDouble(0)
    val origSum = orders.filter(col("o_ym") === month)
      .agg(sum(col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(bumped - (origSum + 1000.0 * nDelta)) < 1e-6 * origSum)
    // exact decimal sum: order-independent, so layout differences can't
    // smear the comparison the way a double fold would
    val restGot = merged.filter(col("o_ym") =!= month)
      .agg(count(lit(1)), graft.functions.dsum(col("o_totalprice"))).head()
    val restWant = orders.filter(col("o_ym") =!= month)
      .agg(count(lit(1)), graft.functions.dsum(col("o_totalprice"))).head()
    assert(restGot === restWant)

    // DELETE arm (insertDelta = false): same scoping, rows removed
    val beforeDel = snapshot(new File(basePath))
    val doomed = merged.filter(col("o_ym") === month &&
      col("o_orderkey") % 2 === 0)
    val nDoomed = doomed.count()
    assert(nDoomed > 0)
    SourceQueries.mergeInto(spark, basePath, tmpPath, doomed,
      insertDelta = false)
    val afterDel = snapshot(new File(basePath))
    val delChanged = beforeDel.keySet.filter(k => beforeDel(k) != afterDel(k))
    assert(delChanged === Set(s"o_ym=$month"),
      s"delete rewrote more than the touched partition: $delChanged")
    val left = spark.read.parquet(basePath)
    assert(left.count() === orders.count() - nDoomed)
    assert(left.filter(col("o_ym") === month &&
      col("o_orderkey") % 2 === 0).count() === 0)
  }
}
