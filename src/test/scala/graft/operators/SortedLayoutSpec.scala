package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the DATA-LAYOUT lever that matters most for selective scans at
  * 100 TB: writing a fact table sorted by its dominant filter column
  * tightens every parquet row-group's [min,max] band on that column, so
  * a range predicate prunes most row groups from the FOOTER alone —
  * before a single page is read. The spec writes the same rows twice
  * (hash-shuffled vs sorted by `l_shipdate`), then checks the actual
  * footer statistics: under the sorted layout a one-month predicate
  * must intersect only a small fraction of row groups, while the
  * shuffled layout intersects nearly all of them. Spark's parquet
  * reader applies exactly this min/max test per row group, so footer
  * intersection count is scan work.
  */
class SortedLayoutSpec extends SparkSpec {

  private def rowGroupBands(dir: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        val idx = schema.getFieldIndex("l_shipdate")
        r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val st = b.getColumns.get(idx).getStatistics
          (st.genericGetMin.asInstanceOf[Number].longValue,
           st.genericGetMax.asInstanceOf[Number].longValue)
        }
      } finally r.close()
    }
  }

  test("sorting by the filter column shrinks row-group min/max bands") {
    val li = graft.core.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_quantity"),
        // micros as long: parquet stats on INT64 are readable directly
        unix_micros(col("l_shipdate").cast("timestamp")).as("l_shipdate"))
    val base = "target/graft-io/layout_spec"
    val shuffled = s"$base/shuffled"
    val sorted = s"$base/sorted"
    // small row groups so the harness table produces many of them
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    li.repartition(4).write.options(opts)
      .mode("overwrite").parquet(shuffled)
    li.repartition(4).sortWithinPartitions(col("l_shipdate"))
      .write.options(opts).mode("overwrite").parquet(sorted)

    val bandsShuffled = rowGroupBands(shuffled)
    val bandsSorted = rowGroupBands(sorted)
    assert(bandsShuffled.size > 8, s"want many row groups, got ${bandsShuffled.size}")

    // one-month predicate in the middle of the date range
    val lo = bandsSorted.map(_._1).min
    val hi = bandsSorted.map(_._2).max
    val mid = lo + (hi - lo) / 2
    val month = 30L * 86400 * 1000000L
    def intersecting(bands: Seq[(Long, Long)]): Int =
      bands.count { case (mn, mx) => mx >= mid && mn <= mid + month }

    val hitShuffled = intersecting(bandsShuffled).toDouble / bandsShuffled.size
    val hitSorted = intersecting(bandsSorted).toDouble / bandsSorted.size
    // shuffled layout: almost every group spans the whole range and
    // intersects; sorted layout: only the groups covering the month
    assert(hitShuffled > 0.8,
      s"shuffled layout should intersect nearly all groups, got $hitShuffled")
    assert(hitSorted < 0.5 * hitShuffled,
      s"sorted layout should prune most groups: sorted=$hitSorted " +
        s"shuffled=$hitShuffled")

    // and the two layouts hold identical data (layout is a pure
    // physical choice)
    val a = spark.read.parquet(shuffled).agg(
      count(lit(1)), sum("l_quantity").cast("long")).head
    val b = spark.read.parquet(sorted).agg(
      count(lit(1)), sum("l_quantity").cast("long")).head
    assert(a === b)
  }
}
