package graft.core

import graft.SparkSpec
import graft.plans.GraftExtensions

class CatalogSpec extends SparkSpec {

  test("SQL surface: star-schema query over registered views") {
    Catalog.register(spark, sf0001)
    val rows = spark.sql(
      """SELECT r_name, count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(1)).sum === 150L)
  }

  test("SQL surface: events view has normalized microsecond timestamps") {
    Catalog.register(spark, sf0001)
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
    assert(t.dataType.typeName === "timestamp")
  }

  test("graft_min_k from SQL equals sort_array(collect_set)[1:k]") {
    Catalog.register(spark, sf0001)
    val viaMinK = spark.sql(
      """SELECT lang, graft_min_k(source, 3) AS v
        |FROM documents GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaSet = spark.sql(
      """SELECT lang, slice(sort_array(collect_set(source)), 1, 3) AS v
        |FROM documents GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaMinK === viaSet)
  }

  test("graft_min_k uses partial (map-side) aggregation") {
    Catalog.register(spark, sf0001)
    val plan = spark.sql(
      "SELECT lang, graft_min_k(source, 3) FROM documents GROUP BY lang")
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice: partial + final
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected two-phase object hash aggregate:\n$plan")
  }

  test("graft_min_k caps the buffer at k regardless of group size") {
    Catalog.register(spark, sf0001)
    val rows = spark.sql(
      """SELECT graft_min_k(CAST(doc_id AS STRING), 4) AS v
        |FROM documents""".stripMargin).collect()
    assert(rows.head.getSeq[String](0) ===
      Seq("0", "1", "10", "100"))
  }

  test("dirKey: 64-bit, path-keyed, spelling-insensitive") {
    val k = Tables.dirKey(sf0001)
    assert(k.matches("[0-9a-f]{16}"), k)
    assert(Tables.dirKey(sf0001 + "/../" + new java.io.File(sf0001).getName)
      === k) // same dir, different spelling
    assert(Tables.dirKey("/root/testdata/sf0.01") !== k)
  }

  test("dataFingerprint tracks in-place regeneration") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp")
    val f = dir.resolve("part-0.parquet")
    java.nio.file.Files.writeString(f, "aaaa")
    val fp1 = Tables.dataFingerprint(dir.toString)
    assert(fp1.matches("[0-9a-f]{12}"), fp1)
    assert(Tables.dataFingerprint(dir.toString) === fp1) // stable
    // same size, same name, newer mtime — the in-place rewrite case
    java.nio.file.Files.writeString(f, "bbbb")
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(f).toMillis + 5000))
    assert(Tables.dataFingerprint(dir.toString) !== fp1)
  }

  test("extensions class injects functions via SparkSessionExtensions") {
    // the class route is what spark.sql.extensions uses; exercise apply()
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    // and the programmatic route stays idempotent
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
  }
}
