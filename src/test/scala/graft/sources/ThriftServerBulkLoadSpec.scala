package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Second REAL dialect through the bulk door, end to end: boots Spark's
  * own Thrift Server (HiveServer2 wire protocol) on the shared test
  * session, then drives [[BulkLoad.load]] at a `jdbc:hive2:` URL — DDL
  * through the generic JDBC writer (via the registered
  * [[HiveQLDialect]]) and rows through the server-side parquet-ingest
  * door. The same nullable/empty/quoted frame as `JdbcBulkLoadSpec`
  * must come back value-identical, which proves the
  * [[BulkLoadDialect]] abstraction holds for an engine whose JDBC
  * driver can't even run the batched-INSERT fallback (Hive's
  * `addBatch` throws).
  */
class ThriftServerBulkLoadSpec extends SparkSpec {

  test("hive2 server-side ingest door loads a value-identical table") {
    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    // HiveConf reads hive.* system properties at construction — the
    // supported way to pick the port for an in-process server
    System.setProperty("hive.server2.thrift.port", port.toString)
    System.setProperty("hive.server2.thrift.bind.host", "localhost")
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    val url = s"jdbc:hive2://localhost:$port/default"
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // service start is async: poll until the port accepts a session
      var conn: java.sql.Connection = null
      var tries = 0
      while (conn == null) {
        try conn = java.sql.DriverManager.getConnection(url)
        catch {
          case e: java.sql.SQLException =>
            tries += 1
            if (tries > 60) throw e
            Thread.sleep(500)
        }
      }
      conn.close()

      assert(BulkLoad.dialectFor(url) eq SparkThriftIngestDialect,
        "a hive2 URL must route to the server-side ingest door")

      val schema = StructType(Seq(
        StructField("id", LongType, nullable = true),
        StructField("txt", StringType, nullable = true),
        StructField("num", IntegerType, nullable = true),
        StructField("val", DoubleType, nullable = true)))
      val rows = Seq(
        Row(1L, "plain", Integer.valueOf(7), java.lang.Double.valueOf(1.5)),
        Row(2L, null, null, null),
        Row(3L, "", Integer.valueOf(0), java.lang.Double.valueOf(0.0)),
        Row(4L, "comma, \"quoted\" `tick` text", Integer.valueOf(-3),
          java.lang.Double.valueOf(-2.25)),
        Row(5L, " leading and trailing ", Integer.valueOf(42),
          java.lang.Double.valueOf(9.75)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)

      val scratch =
        new java.io.File("target/graft-io/jdbc_dialect_spec/spill_hive2")
      val used = BulkLoad.load(df, url, "door_hive2", scratch)
      assert(used eq SparkThriftIngestDialect)

      def canon(r: Row) = (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)), Option(r.get(3)))
      val expected = rows.map(canon).sortBy(_._1)
      // the table the server wrote, read through the session catalog
      val got = spark.table("door_hive2").collect()
        .map(canon).sortBy(_._1).toSeq
      assert(got === expected, "ingest door mangled a value")
      // and back through the JDBC wire itself (the consumer's view)
      val viaWire = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "door_hive2")
        .option("driver", "org.apache.hive.jdbc.HiveDriver").load()
        .collect().map(canon).sortBy(_._1).toSeq
      assert(viaWire === expected, "wire read disagrees with the table")
    } finally {
      spark.sql("DROP TABLE IF EXISTS door_hive2")
      server.stop()
    }
  }
}
