package graft.sources

import graft.SparkSpec

/** WRITE-SIDE CLUSTERING ([[SnapshotClusteredWrite]] +
  * [[SnapshotFunctions]], round 14): every DSv2 batch write into the
  * store requires a distribution clustered by the layout — each
  * mirror as its transform over the source column, resolved through
  * the catalog's V2 `FunctionCatalog` — so a forced-multi-task
  * INSERT OVERWRITE / UPDATE writes O(touched partitions) files per
  * commit, not O(tasks × partitions). The file-count bound is THE
  * manifest-growth control at 100 TB: without it, leaf count scales
  * with cluster parallelism instead of data.
  */
class SnapshotClusteredWriteSpec extends SparkSpec {

  import spark.implicits._

  private def freshCat(name: String): (java.nio.file.Path, String) = {
    val base = java.nio.file.Files.createTempDirectory(name)
    val cat = name.replaceAll("[^A-Za-z0-9]", "")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftSnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base.toString)
    (base, cat)
  }

  private def filesPerPv(root: java.nio.file.Path, version: Int)
      : Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    SnapshotManifest.read(root, version).map { case (pv, dir) =>
      pv -> java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator.asScala
        .count(p => p.getFileName.toString.endsWith(".parquet"))
    }
  }

  test("multi-task INSERT OVERWRITE through a hidden bucket layout " +
    "writes exactly one file per (partition, commit) and plans one " +
    "clustering shuffle on the transform") {
    val (base, cat) = freshCat("cw_ow")
    spark.sql(
      s"""CREATE TABLE $cat.`t` (id BIGINT, v DOUBLE)
         |PARTITIONED BY (bucket(4, id))
         |TBLPROPERTIES ('key_column' = 'id')""".stripMargin)
    // a 16-partition source: unclustered, up to 16 tasks × 4 buckets
    // = 64 files; clustered, exactly the ≤4 touched buckets
    (1L to 400L).map(i => (i, i.toDouble)).toDF("id", "v")
      .repartition(16).createOrReplaceTempView("cw_src")
    spark.sql(s"INSERT OVERWRITE $cat.`t` SELECT id, v FROM cw_src")
    val root = base.resolve("t")
    val perPv = filesPerPv(root, SnapshotManifest.head(root))
    assert(perPv.nonEmpty && perPv.keySet.subsetOf(
      Set("0", "1", "2", "3")), s"unexpected pvs: ${perPv.keySet}")
    assert(perPv.values.forall(_ == 1),
      s"clustered overwrite must write ONE file per partition: $perPv")
    // round-trip: nothing lost in the shuffle
    assert(spark.sql(s"SELECT SUM(v) FROM $cat.`t`")
      .head().getDouble(0) === (1 to 400).map(_.toDouble).sum)
    // the clustered layout is already converged: compaction is a
    // no-op (no version churn — the converge guard sees one file per
    // partition and publishes nothing)
    val headBefore = SnapshotManifest.head(root)
    spark.sql(s"CALL $cat.compact('t', 2)").collect()
    assert(SnapshotManifest.head(root) === headBefore,
      "compact after a clustered write must converge to a no-op")
  }

  test("multi-task UPDATE (row-level replace) keeps the one-file-per-" +
    "group bound; identity layouts cluster by the source column") {
    val (base, cat) = freshCat("cw_up")
    val root = base.resolve("u")
    (1L to 120L).map(i => (i, f"2024-${i % 3 + 1}%02d", i.toDouble))
      .toDF("id", "ym", "v").repartition(8)
      .write.format("graft-snapshot")
      .option("keyCol", "id").option("partCols", "ym")
      .mode("append").save(root.toString)
    spark.sql(s"UPDATE $cat.`u` SET v = v + 1000.0 WHERE id % 2 = 0")
    val perPv = filesPerPv(root, SnapshotManifest.head(root))
    assert(perPv.values.forall(_ == 1),
      s"clustered rewrite must write ONE file per replaced group: $perPv")
    assert(spark.sql(s"SELECT SUM(v) FROM $cat.`u`").head().getDouble(0)
      === (1 to 120).map(i => if (i % 2 == 0) i + 1000.0 else i.toDouble)
        .sum)
  }

  test("the layout transforms are loadable V2 functions that agree " +
    "with the write/prune twins; unknown names refuse") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = new GraftSnapshotCatalog
    cat.initialize("fnprobe", new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Map.of("warehouse", "/tmp")))
    assert(cat.listFunctions(Array.empty).map(_.name()).toSet ===
      Set("bucket", "truncate", "days", "months", "years", "hours"))
    val bucket = cat.loadFunction(Identifier.of(Array.empty, "bucket"))
      .bind(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
        .ScalarFunction[Int]]
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](8, 37L))
    assert(bucket.produceResult(row) ===
      SnapshotTransforms.bucketOfLong(37L, 8),
      "the V2 function and the route/prune twin must be ONE hash")
    intercept[org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException] {
      cat.loadFunction(Identifier.of(Array.empty, "nope"))
    }
  }
}
