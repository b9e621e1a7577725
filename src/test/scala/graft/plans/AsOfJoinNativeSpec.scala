package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EXERCISES the native as-of join operator (custom LogicalPlan +
  * SparkStrategy + SparkPlan):
  *
  *  - plan shape: the physical plan contains `AsOfJoinExec` fed by one
  *    exchange per side (the sort-merge requirements), never a
  *    nested-loop/cartesian encoding;
  *  - edge semantics on a hand-built frame: inclusive at-or-before
  *    match, per-key carry-forward, keys with no right rows, right
  *    rows with no left rows, multi-partition merge;
  *  - equality with the composed union-tag + window formulation
  *    (`eventsAsofJoin`) over the harness data — two independent
  *    implementations of the same semantics must agree row-for-row.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap(nodes)

  private def ts(minute: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2026-01-01 10:00:00").getTime +
      minute * 60000L)

  test("edge semantics: inclusive boundary, carry-forward, unmatched " +
       "keys, across partitions") {
    import spark.implicits._
    val purchases = Seq(
      (101L, 1L, ts(5)),   // exact-tie with view@5: inclusive → match
      (102L, 1L, ts(10)),  // carry-forward of view@5
      (103L, 1L, ts(20)),  // later view@15 wins
      (104L, 2L, ts(5)),   // user 2's only view is AFTER → null
      (105L, 3L, ts(7)))   // user 3 has no views → null
      .toDF("purchase_id", "user_id", "purchase_ts")
    val views = Seq(
      (201L, 1L, ts(5)),
      (202L, 1L, ts(15)),
      (203L, 2L, ts(6)),
      (204L, 4L, ts(1)))   // user 4 has no purchases → dropped
      .toDF("view_id", "v_user", "view_ts")

    val out = AsOfJoin(purchases, views,
        "user_id", "v_user", "purchase_ts", "view_ts")
      .select(col("purchase_id"), col("view_id"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(
      101L -> Some(201L), 102L -> Some(201L), 103L -> Some(202L),
      104L -> None, 105L -> None))
  }

  test("bucketed children satisfy the as-of requirements: ZERO " +
       "exchanges, result unchanged") {
    import org.apache.spark.sql.functions._
    import graft.core.{Tables, Warehouse}
    val nb = 8
    val suffix = Tables.dirKey(sf0001)
    val fp = Tables.dataFingerprint(s"$sf0001/events.parquet")
    val vPrefix = s"graft_asof_views_${suffix}_"
    val pPrefix = s"graft_asof_purch_${suffix}_"
    val vTbl = s"$vPrefix${fp}_b$nb"
    val pTbl = s"$pPrefix${fp}_b$nb"
    Warehouse.ensure(spark, Seq(vPrefix, pPrefix), Seq(vTbl, pTbl)) {
      // one file per bucket (repartition aligned with the bucket spec)
      // so the scan also reports the in-bucket sort order
      Tables.events(spark, sf0001).filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_id"))
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
          col("view_id"))
        .repartition(nb, col("v_user"))
        .write.bucketBy(nb, "v_user").sortBy("v_user", "view_ts")
        .mode("overwrite").saveAsTable(vTbl)
      Tables.events(spark, sf0001).filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
        .repartition(nb, col("user_id"))
        .write.bucketBy(nb, "user_id").sortBy("user_id", "purchase_ts")
        .mode("overwrite").saveAsTable(pTbl)
    }
    val native = AsOfJoin(spark.table(pTbl), spark.table(vTbl),
      "user_id", "v_user", "purchase_ts", "view_ts")
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed as-of must not shuffle:\n$plan")
    // same rows as the plain (shuffling) composed formulation
    val key = Seq("purchase_id", "user_id", "purchase_ts",
      "view_id", "view_ts")
    val got = native
      .select(key.map(col): _*).orderBy("purchase_id").collect()
      .map(r => key.map(c => Option(r.getAs[Any](c))).toList).toList
    val composed = graft.operators.RelationalQueries
      .eventsAsofJoin(spark, sf0001).orderBy("purchase_id").collect()
      .map(r => key.map(c => Option(r.getAs[Any](c))).toList).toList
    assert(got === composed)
  }

  test("plans as AsOfJoinExec with sort-merge requirements, and the " +
       "native result equals the composed window formulation") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val native = graft.operators.RelationalQueries
      .eventsAsofNative(s, sf0001)
    val plan = native.queryExecution.executedPlan
    val execs = nodes(plan).collect { case e: AsOfJoinExec => e }
    assert(execs.size === 1,
      s"expected one AsOfJoinExec, plan:\n$plan")
    assert(nodes(plan).exists(
      _.getClass.getSimpleName == "ShuffleExchangeExec"),
      "as-of children must be co-partitioned by exchanges")

    val key = Seq("purchase_id", "user_id", "purchase_ts",
      "view_id", "view_ts")
    val got = native.orderBy("purchase_id").collect()
      .map(r => key.map(c => Option(r.getAs[Any](c))).toList).toList
    val composed = graft.operators.RelationalQueries
      .eventsAsofJoin(s, sf0001).orderBy("purchase_id").collect()
      .map(r => key.map(c => Option(r.getAs[Any](c))).toList).toList
    assert(got === composed)
  }
}
