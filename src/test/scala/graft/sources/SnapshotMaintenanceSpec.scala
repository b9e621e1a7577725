package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The retrofit half of the maintenance plane (round 12):
  * `CALL snap.compute_stats('t')` backfills a missing stats sidecar
  * (legacy / pre-sidecar stores regain zero-`listStatus` planning and
  * range skipping), and `CALL snap.build_bloom('t', col)` retrofits
  * the per-file Bloom point-lookup index onto a store bootstrapped
  * without one. Both are one-scan, publish-once operations; neither
  * touches data files.
  */
class SnapshotMaintenanceSpec extends SparkSpec {

  private def freshStore(name: String): (java.nio.file.Path, String) = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory(name)
    val root = base.resolve("t")
    (1L to 120L).map(id => (id, s"d${id % 3}", id.toDouble))
      .toDF("id", "day", "v")
      .write.format("graft-snapshot")
      .option("keyCol", "id").option("partCol", "day")
      .mode("append").save(root.toString)
    val cat = name.replaceAll("[^A-Za-z0-9]", "")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftSnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base.toString)
    (root, cat)
  }

  test("compute_stats backfills a legacy store's sidecar BYTE-EQUAL to " +
    "the door-published one; an existing sidecar is left verbatim") {
    val (root, cat) = freshStore("ms_stats")
    val sidecar = root.resolve("manifests").resolve("v1.files")
    val original = java.nio.file.Files.readAllLines(sidecar)
    // simulate a pre-sidecar store
    java.nio.file.Files.delete(sidecar)
    assert(!SnapshotFiles.exists(root, 1))
    val r = spark.sql(s"CALL $cat.compute_stats('t')").head()
    assert(r.getInt(0) === 1 && r.getInt(1) === original.size, r.toString)
    // the backfill recomputes exactly what the commit published: same
    // files, same rows/bytes, same per-column min/max text
    val rebuilt = java.nio.file.Files.readAllLines(sidecar)
    assert(rebuilt.asInstanceOf[java.util.List[String]].toString ===
      original.asInstanceOf[java.util.List[String]].toString,
      "backfilled sidecar must equal the door-published one")
    // second call: immutable sidecar left verbatim, -1 reported
    val r2 = spark.sql(s"CALL $cat.compute_stats('t')").head()
    assert(r2.getInt(1) === -1)
    // and planning is sidecar-served again: zero listStatus calls
    val df = SnapshotTable.read(spark, root, 1)
    assert(df.count() === 120L)
    assert(SnapshotTable.fileIndexOf(df).fsListCalls === 0,
      "a backfilled sidecar must serve the listing")
  }

  test("build_bloom retrofits point-lookup skipping onto a store " +
    "bootstrapped without an index") {
    val (root, cat) = freshStore("ms_bloom")
    assert(!java.nio.file.Files.exists(root.resolve("bloomidx")),
      "the plain bootstrap must not have an index")
    val r = spark.sql(s"CALL $cat.build_bloom('t', 'id')").head()
    assert(r.getInt(0) === 1 && r.getInt(1) === 3, r.toString)
    // a keyed point lookup now Bloom-prunes files during planning
    val df = SnapshotTable.read(spark, root, 1, bloomKey = Some("id"))
      .filter(col("id") === 7L)
    assert(df.count() === 1L)
    val (_, files) = SnapshotTable.fileIndexOf(df).lastListing
    val all = SnapshotTable.read(spark, root, 1).inputFiles.length
    assert(files < all,
      s"bloom must prune the file list: planned $files of $all")
    // refusals: unknown column; renamed column (pre-rename footers
    // would index as NULL)
    intercept[Exception] {
      spark.sql(s"CALL $cat.build_bloom('t', 'nope')")
    }
    spark.sql(s"ALTER TABLE $cat.`t` RENAME COLUMN v TO val")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.build_bloom('t', 'val')")
    }
    assert(e.getMessage.contains("rename history"), e.getMessage)
  }

  test("the Bloom index CARRIES across CLONE: the clone's point " +
    "lookups skip without a build_bloom re-run (round 15, VERDICT " +
    "r14 #6)") {
    val (root, cat) = freshStore("ms_bloom_clone")
    spark.sql(s"CALL $cat.build_bloom('t', 'id')")
    spark.sql(s"CALL $cat.clone('t', 't2')")
    val cloneRoot = root.resolveSibling("t2")
    assert(java.nio.file.Files.isDirectory(
      cloneRoot.resolve("bloomidx")), "index must link across clone")
    // clone reads are exact…
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.`t2`")
      .head().getLong(0) === 120L)
    // …and the carried index prunes the clone's OWN file paths (the
    // stored source-root keys match through their root-relative form,
    // which the relative-layout clone placement preserves)
    val df = SnapshotTable.read(spark, cloneRoot, 1,
      bloomKey = Some("id")).filter(col("id") === 7L)
    assert(df.collect().map(_.getDouble(2)).toSeq === Seq(7.0))
    val (_, files) = SnapshotTable.fileIndexOf(df).lastListing
    val all = SnapshotTable.read(spark, cloneRoot, 1).inputFiles.length
    assert(files < all,
      s"carried bloom must prune the clone's files: $files of $all")
    // the marker carries too: a mismatched reader still degrades
    assert(SnapshotBloom.indexedColumn(
      cloneRoot.resolve("bloomidx").toString).contains("id"))
  }
}
