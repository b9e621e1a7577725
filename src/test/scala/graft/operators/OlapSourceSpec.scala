package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural specs for the OLAP-breadth and source/streaming modules.
  * Exact value parity vs DuckDB is the driver's gate
  * (tools/check_oracle.py); these pin the invariants that must hold at
  * any scale or partitioning.
  */
class OlapSourceSpec extends SparkSpec {

  test("jdbc read is range-partitioned into parallel scans") {
    import org.apache.spark.sql.functions._
    val url = "jdbc:derby:target/graft-io/jdbc_db/spec_parallel;create=true"
    graft.core.Tables.customer(spark, sf0001).coalesce(2)
      .write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", "customer").save()
    val read = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "customer")
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", "0").option("upperBound", "150")
      .option("numPartitions", "8").load()
    assert(read.rdd.getNumPartitions === 8)
    // bounds only split the key space — rows outside them must still
    // arrive via the unbounded edge partitions
    assert(read.count() === 150L)
    assert(read.agg(max(col("c_custkey"))).head.getLong(0) === 149L)
  }

  test("all olap + source queries execute and return rows at sf0.001") {
    for ((name, fn) <- OlapQueries.queries ++ SourceQueries.queries) {
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("query results are identical at 1 and 5 shuffle partitions") {
    // the determinism discipline, asserted end-to-end: partition count
    // must never leak into any catalog result (sampled across modules;
    // streaming/IO queries pin their own partitioning internally)
    val names = Seq("cube_orders", "corr_quantity_price", "topk_users_by_type",
      "percentile_brand_prices", "events_funnel", "pipeline_kept_docs",
      "dedup_minhash_lsh", "dedup_components", "sketch_distinct_users",
      "ann_lsh_topk")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def rows(name: String): Seq[Seq[Any]] = {
      val df = graft.SparkEntry.queries(name)(spark, sf0001)
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|"))
    }
    try {
      for (n <- names) {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        val a = rows(n)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val b = rows(n)
        assert(a === b, s"$n differs across partition counts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("salted join equals the plain unsalted join") {
    val salted = OlapQueries.saltedJoinRevenue(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = graft.core.Tables.lineitem(spark, sf0001)
      .join(graft.core.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
           graft.functions.dsum(col("l_extendedprice") *
             (lit(1.0) - col("l_discount"))).as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("cube: finest cells sum to the grand total in every measure") {
    val rows = OlapQueries.cubeOrders(spark, sf0001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val finest = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(finest.map(_.getAs[Long]("n_orders")).sum ===
      grand.head.getAs[Long]("n_orders"))
  }

  test("percentiles are ordered p25 <= p50 <= p75 per brand") {
    OlapQueries.percentileBrandPrices(spark, sf0001).collect().foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75, s"unordered quartiles: $r")
    }
  }

  test("ntile quartiles are balanced within each segment") {
    OlapQueries.ntileCustomers(spark, sf0001).collect()
      .groupBy(_.getAs[String]("c_mktsegment")).values.foreach { seg =>
        val sizes = seg.groupBy(_.getAs[Long]("balance_quartile"))
          .view.mapValues(_.length).values
        assert(sizes.max - sizes.min <= 1, s"unbalanced tiles: $sizes")
      }
  }

  test("corr coefficients are within [-1, 1]") {
    OlapQueries.corrQuantityPrice(spark, sf0001).collect().foreach { r =>
      val c = r.getAs[Double]("corr_qty_price")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
    }
  }

  test("per-user gap counts are one less than event counts") {
    OlapQueries.eventsUserGaps(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("n_gaps") === r.getAs[Long]("n_events") - 1)
    }
  }

  test("grouped top-k emits at most 3 ascending ranks per type") {
    OlapQueries.topkUsersByType(spark, sf0001).collect()
      .groupBy(_.getAs[String]("event_type")).values.foreach { g =>
        val ranks = g.map(_.getAs[Long]("rnk")).sorted
        assert(ranks.length <= 3)
        assert(ranks === (1L to ranks.length).toSeq)
      }
  }

  test("csv and json round-trips equal direct parquet aggregation") {
    val direct = graft.core.Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           graft.functions.dsum(col("o_totalprice")).as("sum_price"),
           max(col("o_orderdate")).as("last_order"))
      .collect().map(_.toSeq).toSet
    val viaCsv = SourceQueries.csvRoundtrip(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(viaCsv === direct, "CSV round-trip altered values")
    val directJson = graft.core.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
           graft.functions.dsum(col("l_quantity")).as("sum_qty"),
           graft.functions.dsum(col("l_extendedprice")).as("sum_price"),
           max(col("l_shipdate")).as("last_ship"))
      .collect().map(_.toSeq).toSet
    val viaJson = SourceQueries.jsonRoundtrip(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(viaJson === directJson, "JSON round-trip altered values")
  }

  test("text round-trip reproduces the in-memory word count") {
    val direct = CorpusQueries.wc(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rt = SourceQueries.textRoundtrip(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rt === direct)
  }

  test("streaming hourly rollup equals the batch query, all columns") {
    val batch = RelationalQueries.eventsHourly(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val stream = SourceQueries.streamingEventsHourly(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(stream === batch)
  }

  test("simhash pairs: a < b, hamming within threshold, no duplicates") {
    val rows = DedupQueries.queries("dedup_simhash_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall { case (a, b, h) => a < b && h >= 0 && h <= 4 })
    assert(rows.map(p => (p._1, p._2)).distinct.length === rows.length)
  }

  test("KMV sketch estimates land within 3x of the exact distinct count") {
    // k=64 gives ~12% standard error; 3x is a loose structural bound
    OlapQueries.sketchDistinctUsers(spark, sf0001).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val est = r.getAs[Double]("kmv_users")
      assert(est > exact / 3 && est < exact * 3,
        s"KMV estimate $est vs exact $exact")
    }
  }

  test("dedup components: labels are component minima and self-consistent") {
    val labels = DedupQueries.dedupComponents(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every label is itself a member and labels itself (root property)
    assert(labels.values.toSet.forall(c => labels.get(c).contains(c)))
    // labels never exceed the member id they label (min-reachable)
    assert(labels.forall { case (v, c) => c <= v })
    // edges connect same-component members
    val pairs = DedupQueries.dedupMinhashLsh(spark, sf0001)
      .filter("n_bands >= 2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"edge ($a,$b) crosses components")
    }
  }

  test("ewma: bounded by window min/max, converges to price for singletons") {
    import org.apache.spark.sql.functions._
    val rows = OlapQueries.windowEwma(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, e) => !e.isNaN && e > 0.0 })
    // a customer with exactly one order: ewma == that order's price
    val orders = graft.core.Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("p"), min(col("o_orderkey")).as("k"))
      .filter(col("n") === 1).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("p")).toMap
    val byOrder = rows.toMap
    orders.foreach { case (orderKey, price) =>
      // cents-rounded price is what the exact pipeline preserves
      val expect = math.round(price * 100) / 100.0
      assert(byOrder(orderKey) === expect,
        s"singleton order $orderKey: ${byOrder(orderKey)} != $expect")
    }
  }

  test("keep_best: kept doc is in its component with maximal quality") {
    val comp = DedupQueries.dedupComponents(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val quality = TextQueries.textStats(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("quality_score"))
      .toMap
    val kept = DedupQueries.dedupKeepBest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byComponent = comp.groupBy(_._2)
    assert(kept.length === byComponent.size)
    kept.foreach { case (cid, keptDoc, keptQ, nDocs) =>
      val members = byComponent(cid).map(_._1)
      assert(members.contains(keptDoc))
      assert(nDocs === members.length.toLong)
      assert(keptQ === quality(keptDoc))
      assert(members.forall(m => quality(m) < keptQ ||
        (quality(m) == keptQ && m >= keptDoc)))
    }
  }

  test("bigram top-50 is count-descending with deterministic ties") {
    val rows = TextQueries.ngramFreq(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 50)
    rows.sliding(2).foreach { case Array((b1, c1), (b2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && b1 < b2), s"order break: $b1/$c1 vs $b2/$c2")
    }
  }

  test("events stream scratch survives a RELATIVE sf dir (symlink targets " +
       "must be absolute)") {
    // A symlink stores its target string verbatim and resolves it against
    // the LINK's directory: linking a relative sf dir used to create
    // dangling events_* links and fail the whole streaming family with
    // UNABLE_TO_INFER_SCHEMA (found by the round-7 10x sweep, which
    // passed target/scale10 relative).
    val rel = java.nio.file.Paths.get("").toAbsolutePath
      .relativize(java.nio.file.Paths.get(sf0001)).toString
    assert(!java.nio.file.Paths.get(rel).isAbsolute, rel)
    val out = SourceQueries.streamingEventsHourly(spark, rel)
    assert(out.count() > 0)
  }
}
