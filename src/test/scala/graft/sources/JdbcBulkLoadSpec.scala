package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Two implementations of the [[BulkLoadDialect]] contract — Derby's
  * native file-import door and the batched-INSERT fallback — must load
  * value-identical tables from the same frame. The frame deliberately
  * mixes SQL NULL, empty string, quotes, and commas in nullable
  * columns: the CSV spill is where a bulk door silently diverges from
  * the INSERT path (r7 ADVICE), so the diff IS the contract.
  */
class JdbcBulkLoadSpec extends SparkSpec {

  private val dbDir = {
    val f = new java.io.File("target/graft-io/jdbc_dialect_spec")
    f.mkdirs()
    f
  }

  test("derby-import and generic-insert load identical tables (nulls pinned)") {
    System.setProperty("derby.stream.error.file",
      new java.io.File(dbDir, "derby.log").getAbsolutePath)
    val url = s"jdbc:derby:${dbDir.getAbsolutePath}/db;create=true"

    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("txt", StringType, nullable = true),
      StructField("num", IntegerType, nullable = true),
      StructField("val", DoubleType, nullable = true)))
    val rows = Seq(
      Row(1L, "plain", 7, 1.5),
      Row(2L, null, null, null),                 // SQL NULL in every type
      Row(3L, "", 0, 0.0),                       // empty string ≠ NULL
      Row(4L, "comma, \"quoted\" text", -3, -2.25),
      Row(5L, " leading and trailing ", 42, 9.75))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    assert(BulkLoad.dialectFor(url) eq DerbyImportDialect,
      "a derby URL must route to the native import door")
    assert(BulkLoad.dialectFor("jdbc:postgresql://x/y") eq
      GenericInsertDialect, "unknown engines must fall back to INSERTs")

    val loaded = Seq(
      "door_import" -> Some(DerbyImportDialect: BulkLoadDialect),
      "door_insert" -> Some(GenericInsertDialect: BulkLoadDialect)
    ).map { case (table, dialect) =>
      BulkLoad.load(df, url, table,
        new java.io.File(dbDir, s"spill_$table"), dialect)
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", table).load()
        .collect().map(r => (r.getLong(0), Option(r.getString(1)),
          Option(r.get(2)), Option(r.get(3))))
        .sortBy(_._1).toSeq
    }
    assert(loaded(0) === loaded(1),
      "the two dialect doors disagree on the loaded table")
    // and both round-tripped the source exactly (NULL stayed NULL,
    // '' stayed '')
    val expected = rows.map(r => (r.getLong(0),
      Option(r.getString(1)), Option(r.get(2)), Option(r.get(3))))
      .sortBy(_._1)
    assert(loaded(0) === expected, "bulk door mangled a value")
  }
}
