package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the write half of the `graft-snapshot` format door: bootstrap
  * from an empty root, upsert and delete commits advancing the head,
  * history immutability across door writes, and the append-only
  * contract (any other SaveMode is refused — a snapshot store never
  * overwrites history).
  */
class SnapshotWriteDoorSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() = {
    val r = Paths.get("target/graft-io/door_spec",
      java.util.UUID.randomUUID.toString.take(8))
    Files.createDirectories(r.getParent)
    r
  }

  private def frame(rows: Seq[(Long, String, Double)],
                    month: String = "2024-01") =
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .withColumn("o_ym", lit(month))

  test("bootstrap, upsert, delete: three versions, old ones immutable") {
    val root = freshRoot()
    val base = frame(Seq((1L, "O", 10.0), (2L, "O", 20.0), (3L, "F", 30.0)))
    base.write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    assert(SnapshotManifest.head(root) === 1)

    // upsert: bump key 2, insert key 9
    frame(Seq((2L, "O", 99.0), (9L, "P", 5.0)))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    assert(SnapshotManifest.head(root) === 2)

    // delete key 1
    frame(Seq((1L, "O", 10.0)))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append")
      .option("commitMode", "delete").save(root.toString)
    assert(SnapshotManifest.head(root) === 3)

    def keysOf(v: Int): Set[(Long, Double)] =
      SnapshotTable.read(spark, root, v)
        .select("o_orderkey", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet

    assert(keysOf(1) === Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    assert(keysOf(2) === Set((1L, 10.0), (2L, 99.0), (3L, 30.0), (9L, 5.0)))
    assert(keysOf(3) === Set((2L, 99.0), (3L, 30.0), (9L, 5.0)))

    // default read resolves the head
    val head = spark.read.format("graft-snapshot").load(root.toString)
      .select("o_orderkey").as[Long].collect().toSet
    assert(head === Set(2L, 3L, 9L))
  }

  test("an upsert introducing a brand-new partition appends it") {
    val root = freshRoot()
    frame(Seq((1L, "O", 10.0), (2L, "O", 20.0)))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    // delta spans an existing month (update key 2) AND a month the
    // parent manifest has never seen — the canonical time-partitioned
    // ingest pattern
    frame(Seq((2L, "O", 99.0)))
      .unionByName(frame(Seq((7L, "N", 7.0)), month = "2024-02"))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    assert(SnapshotManifest.head(root) === 2)
    assert(SnapshotManifest.read(root, 2).keySet === Set("2024-01", "2024-02"))
    val got = SnapshotTable.read(spark, root, 2)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 10.0), (2L, 99.0), (7L, 7.0)))
  }

  test("an empty delta is a legal no-change commit") {
    val root = freshRoot()
    frame(Seq((1L, "O", 10.0)))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    frame(Seq.empty)
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    assert(SnapshotManifest.head(root) === 2)
    assert(SnapshotManifest.read(root, 2) === SnapshotManifest.read(root, 1))
    assert(SnapshotTable.read(spark, root, 2).count() === 1)
  }

  test("non-append SaveMode is refused") {
    val root = freshRoot()
    val e = intercept[Exception] {
      frame(Seq((1L, "O", 1.0))).write.format("graft-snapshot")
        .mode(SaveMode.Overwrite).save(root.toString)
    }
    assert(e.getMessage.contains("Append"))
    assert(SnapshotManifest.head(root) === 0, "a refused write published")
  }

  test("a stale-head commit rebases instead of losing the other writer") {
    val root = freshRoot()
    frame(Seq((1L, "O", 1.0), (2L, "O", 2.0)))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    // two sequential upserts through the door land as v2 then v3 — the
    // second one's internal head re-read IS the rebase; both deltas
    // survive in the final head
    frame(Seq((1L, "O", 11.0)))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    frame(Seq((2L, "O", 22.0)))
      .write.format("graft-snapshot").option("keyCol", "o_orderkey").mode("append").save(root.toString)
    assert(SnapshotManifest.head(root) === 3)
    val got = SnapshotTable.read(spark, root, 3)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 11.0), (2L, 22.0)))
  }
}
