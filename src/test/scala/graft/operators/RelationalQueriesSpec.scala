package graft.operators

import graft.SparkSpec

class RelationalQueriesSpec extends SparkSpec {

  test("all relational queries execute and return rows at sf0.001") {
    for ((name, fn) <- RelationalQueries.queries) {
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every relational query has a matching oracle") {
    assert(RelationalQueries.oracles.keySet === RelationalQueries.queries.keySet)
  }

  test("q1 aggregates are partition-count invariant (exact decimal sums)") {
    val a = RelationalQueries.q1PricingSummary(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.mkString)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = RelationalQueries.q1PricingSummary(spark, sf0001)
        .collect().map(_.toSeq).sortBy(_.mkString)
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("top-k queries return exactly k rows with deterministic order") {
    val top = RelationalQueries.q3TopOrders(spark, sf0001).collect()
    assert(top.length === 10)
    val revenues = top.map(_.getAs[Double]("revenue"))
    assert(revenues.sameElements(revenues.sortBy(-_)))
  }

  test("dimension joins in q5 are planned as broadcast joins") {
    val plan = RelationalQueries.q5RegionRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q6 predicates are pushed to the parquet scan") {
    val plan = RelationalQueries.q6RevenueForecast(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
           plan.contains("IsNotNull(l_shipdate)"), s"no pushdown:\n$plan")
  }

  test("sessionize: session gaps exceed 30 minutes between sessions") {
    val df = RelationalQueries.eventsSessionize(spark, sf0001)
    // every user's sessions are disjoint and ordered
    val rows = df.collect().groupBy(_.getAs[Long]("user_id"))
    rows.values.foreach { sessions =>
      val sorted = sessions.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime
          assert(gapMs > 30 * 60 * 1000L,
            s"sessions not separated by >30min gap: $a | $b")
        case _ =>
      }
    }
  }
}
