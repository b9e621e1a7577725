package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins the two properties the `table_checksum` entry claims beyond
  * what the DuckDB oracle can see:
  *
  *  1. the published value is a plain BIGINT (the r8 regression: an
  *     unreduced DECIMAL(38,0) checksum exceeded int64 and cross-engine
  *     hash canonicalization diverged on the beyond-BIGINT value even
  *     though both engines computed the identical number) — verified
  *     here against an independent arbitrary-precision fold of the same
  *     rows, so the in-plan decimal mod/square arithmetic is exact;
  *  2. the per-row square makes the fold nonlinear: two rows EXCHANGING
  *     a field value (invisible to any linear sum of per-field terms)
  *     moves the checksum.
  */
class TableChecksumSpec extends SparkSpec {

  private val P = BigInt("9223372036854775783")

  test("checksum is int64 and matches an independent BigInt fold") {
    val row = OlapQueries.tableChecksum(spark, sf0001).head()
    val n = row.getLong(0)
    val got = row.getLong(1) // getLong itself proves BIGINT schema
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("d_us"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        expr("ascii(o_orderstatus)").as("st"))
      .collect()
    assert(rows.length.toLong === n)
    val want = rows.map { r =>
      val raw = BigInt(r.getLong(0)) * 1315423911L +
        BigInt(r.getLong(1)) * 2654435761L +
        BigInt(r.getLong(2)) +
        BigInt(r.getLong(3)) * 97 +
        BigInt(r.getInt(4))
      raw.mod(P).pow(2).mod(P)
    }.foldLeft(BigInt(0))(_ + _).mod(P)
    assert(BigInt(got) === want)
    assert(got >= 0L)
  }

  test("swapping o_custkey between two rows moves the checksum") {
    val root = new java.io.File("target/graft-io/checksum_spec")
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    val base = Tables.orders(spark, sf0001).limit(50).cache()
    // two orders with different custkeys to exchange
    val ks = base.select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val Some(((k1, c1), (k2, c2))) =
      ks.combinations(2).map { case Array(a, b) => (a, b) }
        .find { case ((_, ca), (_, cb)) => ca != cb }
    val swapped = base.withColumn("o_custkey",
      when(col("o_orderkey") === k1, lit(c2))
        .when(col("o_orderkey") === k2, lit(c1))
        .otherwise(col("o_custkey")))
    base.write.parquet(s"$root/base/orders.parquet")
    swapped.write.parquet(s"$root/swapped/orders.parquet")
    val a = OlapQueries.tableChecksum(spark, s"$root/base").head()
    val b = OlapQueries.tableChecksum(spark, s"$root/swapped").head()
    assert(a.getLong(0) === b.getLong(0)) // same row count
    assert(a.getLong(1) !== b.getLong(1),
      "field exchange between rows must move the checksum")
    base.unpersist()
  }
}
