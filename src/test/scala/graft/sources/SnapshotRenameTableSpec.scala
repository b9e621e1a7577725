package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `ALTER TABLE … RENAME TO …` (round 13): one atomic directory move,
  * possible because every under-root path in the metadata planes is
  * stored RELATIVE to the table root. The spec pins what must survive
  * the move: data exactness, time travel, tags, branches (whose
  * manifests reference main dirs `../..`-relative), the stats
  * sidecar's zero-listing planning, Bloom file-skipping (suffix-matched
  * across the move), and DML under the new name — plus the one-time
  * migration sweep for LEGACY stores whose metadata still carried
  * absolute paths.
  */
class SnapshotRenameTableSpec extends SparkSpec {

  private def freshCat(name: String): (java.nio.file.Path, String) = {
    val base = java.nio.file.Files.createTempDirectory(name)
    val cat = name.replaceAll("[^A-Za-z0-9]", "")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftSnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base.toString)
    (base, cat)
  }

  import spark.implicits._

  private def frame(rows: Seq[(Long, String, Double)], ym: String) =
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .withColumn("o_ym", lit(ym))

  test("rename survives everything the root carries: data, time " +
    "travel, tags, branches, stats planning, Bloom skipping, DML") {
    val (base, cat) = freshCat("rt_main")
    val root = base.resolve("t")
    def commit(rows: Seq[(Long, String, Double)], ym: String): Unit =
      frame(rows, ym).write.format("graft-snapshot")
        .option("keyCol", "o_orderkey").option("bloomKey", "o_orderkey")
        .mode("append").save(root.toString)
    commit(Seq((1L, "O", 10.0), (2L, "F", 20.0)), "2024-01") // v1
    commit(Seq((7L, "N", 7.0)), "2024-02")                   // v2
    spark.sql(s"CALL $cat.tag('t', 'audited', 1)")
    spark.sql(s"CALL $cat.branch('t', 'dev')")
    frame(Seq((9L, "O", 9.0)), "2024-03")
      .write.format("graft-snapshot").option("branch", "dev")
      .option("keyCol", "o_orderkey")
      .mode("append").save(root.toString)

    spark.sql(s"ALTER TABLE $cat.`t` RENAME TO `u`")
    val newRoot = base.resolve("u")
    assert(!java.nio.file.Files.exists(root))

    // data + head exactness under the new name
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.`u`")
      .head().getLong(0) === 3L)
    // time travel + tag resolution survive (manifest mtimes kept)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.`u` VERSION AS OF 1")
      .head().getLong(0) === 2L)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $cat.`u` VERSION AS OF 'audited'")
      .head().getLong(0) === 2L)
    // the branch still reads (fork-shared entries were ../..-relative)
    // and still takes commits
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $cat.`u` VERSION AS OF 'dev'")
      .head().getLong(0) === 4L)
    frame(Seq((11L, "F", 11.0)), "2024-03")
      .write.format("graft-snapshot").option("branch", "dev")
      .option("keyCol", "o_orderkey")
      .mode("append").save(newRoot.toString)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $cat.`u` VERSION AS OF 'dev'")
      .head().getLong(0) === 5L)

    // stats sidecar still serves the listing: zero listStatus calls
    val read = SnapshotTable.read(spark, newRoot, 2,
      bloomKey = Some("o_orderkey"))
      .filter(col("o_orderkey") === 7L).select(col("o_totalprice"))
    assert(read.collect().map(_.getDouble(0)).toSeq === Seq(7.0))
    val idx = SnapshotTable.fileIndexOf(read)
    assert(idx.fsListCalls === 0,
      "sidecar-served planning must survive the move")
    // Bloom skipping still fires (suffix-matched across the root move)
    assert(idx.bloomBitsetsLoaded > 0,
      "bloom bitsets must still load after rename")
    assert(idx.lastListing._2 < idx.inputFiles.length,
      "bloom skipping went inert after rename")

    // DML under the new name: SQL upsert + DELETE
    spark.sql(
      s"INSERT INTO $cat.`u` VALUES (2L, 'F', 200.0, '2024-01', '2024-01')")
    assert(spark.sql(s"SELECT o_totalprice FROM $cat.`u` " +
      "WHERE o_orderkey = 2").head().getDouble(0) === 200.0)
    spark.sql(s"DELETE FROM $cat.`u` WHERE o_orderkey = 1")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.`u`")
      .head().getLong(0) === 2L)

    // the old name is gone; renaming onto an existing table refuses
    val eOld = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.`t`").collect()
    }
    assert(eOld.getMessage.contains("t"), eOld.getMessage)
    spark.sql(s"CREATE TABLE $cat.`w` (id BIGINT, d STRING, d_p STRING) " +
      "PARTITIONED BY (d_p) TBLPROPERTIES ('key_column'='id')")
    val eDup = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.`u` RENAME TO `w`")
    }
    assert(eDup.getMessage.toUpperCase.contains("ALREADY EXISTS"),
      eDup.getMessage)
  }

  test("legacy store with ABSOLUTE metadata paths: the rename sweep " +
    "migrates manifests and sidecars in place, mtimes preserved") {
    import scala.jdk.CollectionConverters._
    val (base, cat) = freshCat("rt_legacy")
    val root = base.resolve("t")
    frame(Seq((1L, "O", 10.0), (2L, "F", 20.0)), "2024-01")
      .write.format("graft-snapshot").option("keyCol", "o_orderkey")
      .mode("append").save(root.toString)
    // devolve the store to the pre-relative era: resolve every stored
    // path back to its absolute form
    val mf = root.resolve("manifests").resolve("v1.manifest")
    val mtime = mf.toFile.lastModified()
    val absLines = java.nio.file.Files.readAllLines(mf).asScala.map { l =>
      if (l.startsWith("#")) l
      else {
        val i = l.lastIndexOf('\t')
        l.substring(0, i + 1) +
          SnapshotManifest.resolvePath(root, l.substring(i + 1))
      }
    }
    java.nio.file.Files.write(mf, absLines.asJava)
    mf.toFile.setLastModified(mtime)
    val sc = root.resolve("manifests").resolve("v1.files")
    val scLines = java.nio.file.Files.readAllLines(sc).asScala.map(l =>
      l.replace("\"path\":\"", s""""path":"$root/"""))
    java.nio.file.Files.write(sc, scLines.asJava)
    assert(java.nio.file.Files.readString(mf).contains(root.toString),
      "fixture must actually be absolute-path legacy")

    spark.sql(s"ALTER TABLE $cat.`t` RENAME TO `u`")
    val newRoot = base.resolve("u")
    // the sweep rewrote the old-root paths; reads are exact and
    // sidecar-planned (zero listings)
    val got = SnapshotTable.read(spark, newRoot, 1)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 10.0), (2L, 20.0)))
    val idx = SnapshotTable.fileIndexOf(
      SnapshotTable.read(spark, newRoot, 1))
    idx.listFiles(Nil, Nil)
    assert(idx.fsListCalls === 0, "sidecar must still serve post-sweep")
    assert(newRoot.resolve("manifests").resolve("v1.manifest")
      .toFile.lastModified() === mtime,
      "the sweep must preserve commit instants")
    assert(!java.nio.file.Files.readString(
      newRoot.resolve("manifests").resolve("v1.manifest"))
      .contains(base.toString), "sweep left absolute paths behind")
  }
}
