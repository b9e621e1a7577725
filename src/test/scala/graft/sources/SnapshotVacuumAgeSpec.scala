package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TIME-BASED vacuum retention (`CALL snap.vacuum(t, keep_last,
  * retain_seconds, older_than_hours)` — the Delta `RETAIN n HOURS` /
  * Iceberg `older_than` shape): versions published inside the age
  * window are kept regardless of keep_last; the kept set is the UNION
  * of both planes plus the head and tagged versions. The age clock is
  * the manifest link's mtime — the same instant `TIMESTAMP AS OF`
  * resolves against.
  */
class SnapshotVacuumAgeSpec extends SparkSpec {

  private def freshStore(name: String): (java.nio.file.Path, String) = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory(name)
    val root = base.resolve("t")
    def commit(ids: Seq[Long]): Unit =
      ids.map(id => (id, s"d${id % 3}", id.toDouble))
        .toDF("id", "day", "v")
        .write.format("graft-snapshot")
        .option("keyCol", "id").option("partCol", "day")
        .mode("append").save(root.toString)
    commit(1L to 60L)        // v1
    commit(Seq(3L, 61L))     // v2
    commit(Seq(6L, 62L))     // v3
    val cat = name.replaceAll("[^A-Za-z0-9]", "")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftSnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base.toString)
    (root, cat)
  }

  private def backdate(root: java.nio.file.Path, v: Int, hoursAgo: Long)
      : Unit = {
    val f = root.resolve("manifests").resolve(s"v$v.manifest").toFile
    assert(f.setLastModified(
      System.currentTimeMillis() - hoursAgo * 3600000L))
  }

  test("expire-by-age: versions outside the window expire, the window, " +
    "the head, and tagged versions survive") {
    val (root, cat) = freshStore("vage_main")
    backdate(root, 1, 3); backdate(root, 2, 3)
    spark.sql(s"CALL $cat.tag('t', 'audit', 1)")
    // keep_last=1 keeps only v3 by count; the age window (1h) keeps
    // nothing older than an hour; the tag keeps v1 — so exactly v2
    // expires
    spark.sql(s"CALL $cat.vacuum('t', 1, 0, older_than_hours => 1.0)")
    val mdir = root.resolve("manifests")
    assert(!java.nio.file.Files.exists(mdir.resolve("v2.manifest")),
      "v2 is outside every retention plane and must expire")
    assert(java.nio.file.Files.exists(mdir.resolve("v1.manifest")),
      "the tag must keep v1 past the age horizon")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.`t`")
      .head().getLong(0) === 62L)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $cat.`t` VERSION AS OF 'audit'")
      .head().getLong(0) === 60L)
    intercept[Exception] {
      spark.sql(s"SELECT COUNT(*) FROM $cat.`t` VERSION AS OF 2").head()
    }
  }

  test("a window covering every version expires nothing even at " +
    "keep_last=1") {
    val (root, cat) = freshStore("vage_keep")
    backdate(root, 1, 3); backdate(root, 2, 3)
    val r = spark.sql(
      s"CALL $cat.vacuum('t', 1, 0, older_than_hours => 100.0)").head()
    assert(r.getInt(0) === 0, s"nothing should be removed: $r")
    val mdir = root.resolve("manifests")
    (1 to 3).foreach(v => assert(
      java.nio.file.Files.exists(mdir.resolve(s"v$v.manifest")),
      s"v$v must survive inside the age window"))
    assert(SnapshotTable.read(spark, root, 1).count() === 60L)
  }
}
