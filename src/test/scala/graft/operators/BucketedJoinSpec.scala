package graft.operators

import graft.SparkSpec

/** Pins the property that makes `bucketed_join_revenue` the 100 TB
  * fact⋈fact shape: with both tables bucketed on the join key, the
  * join AND the per-key rollup plan with ZERO exchanges — bucket
  * metadata satisfies every required distribution, so nothing shuffles
  * regardless of input size. (Broadcast is disabled for the assertion:
  * at toy scale the planner would otherwise broadcast the small side,
  * which is also shuffle-free but doesn't exercise bucketing.)
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed join + rollup: zero exchanges in the plan") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = RelationalQueries.bucketedJoinRevenue(spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and the result matches the plain (shuffling) join bit-for-bit
      val bucketed = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
      val plain = {
        import org.apache.spark.sql.functions._
        import graft.functions._
        graft.core.Tables.orders(spark, sf0001)
          .join(graft.core.Tables.lineitem(spark, sf0001),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_lines"),
               dsum(col("l_quantity")).as("sum_qty"),
               dsum(col("l_extendedprice")).as("revenue"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).toSet
      }
      assert(bucketed === plain)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed tables track in-place data regeneration") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt_stale")
      .toString
    def regen(name: String, filter: String): Unit =
      spark.read.parquet(s"$sf0001/$name.parquet").where(filter)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    regen("orders", "true")
    regen("lineitem", "true")
    val r1 = RelationalQueries.bucketedJoinRevenue(spark, dir).count()
    // regenerate the dataset IN PLACE — same dir, different rows; a
    // cache keyed only on the dir would silently serve the old tables
    regen("orders", "o_orderkey % 2 = 0")
    val r2 = RelationalQueries.bucketedJoinRevenue(spark, dir).count()
    assert(r2 > 0 && r2 < r1, s"stale bucketed cache: r1=$r1 r2=$r2")
  }
}
