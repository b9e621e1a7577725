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

  test("as-of join: every purchase pairs with the latest view at-or-before") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "ts").collect()
    val views = ev.filter(_.getAs[String]("event_type") == "view")
    val expected = ev.filter(_.getAs[String]("event_type") == "purchase")
      .map { p =>
        val pts = p.getAs[java.sql.Timestamp]("ts")
        val best = views
          .filter(v => v.getAs[Long]("user_id") == p.getAs[Long]("user_id") &&
            !v.getAs[java.sql.Timestamp]("ts").after(pts))
          .sortBy(v => (v.getAs[java.sql.Timestamp]("ts").getTime,
            v.getAs[Long]("event_id")))
          .lastOption
        (p.getAs[Long]("event_id"),
          best.map(_.getAs[Long]("event_id")).getOrElse(-1L))
      }.toMap
    val got = RelationalQueries.eventsAsofJoin(spark, sf0001).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (if (r.isNullAt(r.fieldIndex("view_id"))) -1L
         else r.getAs[Long]("view_id"))).toMap
    assert(got === expected)
  }

  test("range join: bucketed equi-join matches the brute-force interval join") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "ts").collect()
    def us(r: org.apache.spark.sql.Row) = {
      val t = r.getAs[java.sql.Timestamp]("ts")
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    }
    val errors = ev.filter(_.getAs[String]("event_type") == "error")
    val expected = ev.filter(_.getAs[String]("event_type") == "purchase")
      .map { p =>
        val n = errors.count(e =>
          e.getAs[Long]("user_id") == p.getAs[Long]("user_id") &&
            us(e) > us(p) && us(e) <= us(p) + 3600000000L)
        p.getAs[Long]("event_id") -> n.toLong
      }.filter(_._2 > 0).toMap
    val got = RelationalQueries.eventsRangeJoin(spark, sf0001).collect()
      .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("n_errors"))
      .toMap
    assert(got === expected)
  }

  test("range join plans as a hash equi-join, not a nested-loop join") {
    val plan = RelationalQueries.eventsRangeJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), s"NLJ in range join:\n$plan")
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
