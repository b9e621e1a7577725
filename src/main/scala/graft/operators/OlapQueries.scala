package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions._

/** OLAP operator breadth over the star schema: multi-dimensional
  * aggregation (CUBE, pivot), exact distribution statistics (interpolated
  * quartiles, correlation), analytic windows (ntile, lag-gaps, grouped
  * top-k), correlated scalar subqueries, and a skew-salted join.
  *
  * Determinism rules (every query is DuckDB-hash-verified, see
  * [[graft.functions]]): money/ratio aggregates go through exact decimal
  * sums; quartiles interpolate over integer cents so the interpolation
  * arithmetic (ints × dyadic fractions) is exact in both engines; the
  * correlation coefficient is assembled from exact decimal moment sums
  * with an identically-shaped IEEE expression in both engines; every
  * window/rank order is a total order (explicit key tie-breaks).
  */
object OlapQueries {

  /** CUBE over (status, priority): all 2^2 grouping sets in one pass.
    * Spark plans this as a single Expand + partial/final aggregate —
    * one shuffle regardless of how many sets, same as at 100 TB.
    */
  def cubeOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("sum_price"))

  /** Pivot: order-line counts + revenue with linestatus spread across
    * columns. The pivot values are pinned (`Seq("O","F")`) so the output
    * schema is static — at scale an unpinned pivot would need a separate
    * distinct-values job before planning.
    */
  def pivotReturns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("O", "F"))
      .agg(count(lit(1)).as("n"),
           dsum(col("l_extendedprice")).as("rev"))

  /** Exact interpolated quartiles of part price per brand. Prices are
    * quantized to integer cents first: `percentile` then interpolates
    * lo + (hi−lo)·frac over exact integers with frac ∈ {0,.25,.5,.75} —
    * every intermediate is exactly representable, so Spark and DuckDB
    * (`quantile_cont`) agree bit-for-bit; a raw-double percentile could
    * differ in the last ulp depending on each engine's formula shape.
    */
  def percentileBrandPrices(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("p_retailprice") * 100).cast("long")
    Tables.part(s, dir)
      .select(col("p_brand"), cents.as("cents"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
           (percentile(col("cents"), lit(0.25)) / 100.0).as("p25"),
           (percentile(col("cents"), lit(0.5)) / 100.0).as("p50"),
           (percentile(col("cents"), lit(0.75)) / 100.0).as("p75"))
  }

  /** Correlated scalar subquery through the SQL surface — one ANSI
    * statement, both engines: parts priced above their type's average.
    * Catalyst decorrelates the subquery into an aggregate + join (visible
    * as a single shuffle on p_type), rather than per-row re-execution.
    */
  def sqlPartsAboveTypeAvg(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlPartsAboveTypeAvg)
  }

  /** TPC-H Q17 shape (small-quantity revenue): one ANSI statement run
    * verbatim by BOTH engines — the correlated scalar AVG subquery is
    * the decorrelation stress case: Catalyst rewrites the per-row
    * re-execution into one partkey-grouped aggregate joined back
    * (visible as a single extra shuffle on l_partkey), exactly what a
    * hand-written two-pass plan would do. Determinism: the quantities
    * are integral, so AVG's double sum is EXACT in any accumulation
    * order (integer-valued partials below 2^53), `0.2 * avg` is one
    * IEEE multiply, and the revenue total is an exact decimal sum.
    */
  def sqlQ17SmallQty(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ17SmallQty)
  }

  private val SqlQ17SmallQty =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
      |  AND l_quantity < 0.2 * (SELECT AVG(l_quantity) FROM lineitem l2
      |                          WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q15 shape (top supplier): the quarterly per-supplier revenue
    * aggregate compared against ITS OWN maximum — the
    * equality-to-a-scalar-over-the-same-aggregate decorrelation case
    * (the spec's CREATE VIEW expressed as a CTE referenced twice).
    * Catalyst plans the CTE once per reference with the MAX side
    * reduced to a 1-row broadcast — no per-row re-execution.
    * Determinism: revenue is an exact decimal sum cast to double
    * (bit-identical in both engines), so MAX and the equality select
    * the same supplier(s) everywhere.
    */
  def sqlQ15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ15TopSupplier)
  }

  private val SqlQ15TopSupplier =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |                  AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1996-01-01'
      |    AND l_shipdate < DATE '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin

  /** TPC-H Q11 shape (important values), adapted to the harness schema
    * (no partsupp table): supplier-nation revenue retained only where
    * it exceeds a FRACTION OF THE GLOBAL TOTAL — the
    * HAVING-against-a-global-scalar-aggregate case. The global side is
    * recomputed as its own exact decimal sum (NOT a double sum over
    * the group rows, whose accumulation order differs per engine), so
    * the threshold is bit-identical in Spark and DuckDB and the
    * predicate can never flip on an ulp.
    */
  def sqlQ11ImportantNations(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ11ImportantNations)
  }

  private val SqlQ11ImportantNations =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |                AS DECIMAL(30,6))) AS DOUBLE) AS value
      |FROM lineitem, supplier, nation
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |GROUP BY n_name
      |HAVING CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |                     AS DECIMAL(30,6))) AS DOUBLE) >
      |  (SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |                        AS DECIMAL(30,6))) AS DOUBLE) * 0.05
      |   FROM lineitem, supplier, nation
      |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey)""".stripMargin

  private val SqlPartsAboveTypeAvg =
    """SELECT p_partkey, p_type, p_retailprice
      |FROM part p
      |WHERE p_retailprice > (
      |  SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(30,6))) AS DOUBLE)
      |           / COUNT(*)
      |  FROM part p2 WHERE p2.p_type = p.p_type)""".stripMargin

  /** Pearson correlation of quantity vs extended price per return flag,
    * assembled from EXACT INTEGER moment sums: x = quantity (integral),
    * y = price in cents (corr is scale-invariant, so the ×100 cancels),
    * with n·Σxy − Σx·Σy and the variance terms computed in wide exact
    * arithmetic (Spark DECIMAL(38,0) / DuckDB HUGEINT) and only then
    * cast to double. A double-space m·s − t·u combination differs across
    * engines by an ulp when one of them contracts it to FMA, and Spark's
    * built-in `corr` accumulates doubles in partition order — neither is
    * cross-engine reproducible.
    */
  def corrQuantityPrice(s: SparkSession, dir: String): DataFrame = {
    // All PER-ROW math stays in codegen'd long arithmetic (quantity
    // ≤ 50, cents ≤ ~10^7 — every product fits a long with orders of
    // magnitude of headroom); only the per-group accumulation widens to
    // decimal(38,0), exact and overflow-free to 10^38. An earlier shape
    // multiplied decimal(20,0)s per row — one BigDecimal object op per
    // value, which dominated the wall-clock at the 10× scale run.
    val x = round(col("l_quantity")).cast("long")
    val y = round(col("l_extendedprice") * 100).cast("long")
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val n   = count(lit(1)).cast("decimal(38,0)")
    val sx  = dsum(x)
    val sy  = dsum(y)
    val sxy = dsum(x * y)
    val sxx = dsum(x * x)
    val syy = dsum(y * y)
    val num  = (n * sxy - sx * sy).cast("double")
    val varx = (n * sxx - sx * sx).cast("double")
    val vary = (n * syy - sy * sy).cast("double")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
           (num / (sqrt(varx) * sqrt(vary))).as("corr_qty_price"))
  }

  /** Full pairwise Pearson correlation matrix over four lineitem
    * measures in ONE aggregate pass — the feature-correlation audit a
    * data pipeline runs before model training, at `profile_table`'s
    * cost shape: every moment (4 sums, 4 sums of squares, 6 cross
    * sums) accumulates in the same single global aggregate, so the
    * scan is paid once and the shuffle carries ONE row regardless of
    * how many column pairs are requested; the 6 correlations are then
    * assembled from that row and unpivoted with `stack`. The naive
    * per-pair `corr()` loop would be 6 scans — and Spark's built-in
    * `corr` accumulates doubles in partition order, which is not
    * cross-engine reproducible. Same exact-integer-moment discipline
    * as `corr_quantity_price`: per-row math in codegen'd longs
    * (cents/percent scaling), per-group accumulation in exact
    * DECIMAL(38,0) / HUGEINT, doubles only at the final cast.
    */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val exprs = Seq(
      "quantity"     -> round(col("l_quantity")).cast("long"),
      "price_cents"  -> round(col("l_extendedprice") * 100).cast("long"),
      "discount_pct" -> round(col("l_discount") * 100).cast("long"),
      "tax_pct"      -> round(col("l_tax") * 100).cast("long"))
    val names = exprs.map(_._1)
    val byName = exprs.toMap
    def dsum38(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val pairs = for {
      i <- names.indices; j <- i + 1 until names.size
    } yield (names(i), names(j))
    val aggCols =
      Seq(count(lit(1)).cast("decimal(38,0)").as("nd")) ++
        names.map(nm => dsum38(byName(nm)).as(s"s_$nm")) ++
        names.map(nm => dsum38(byName(nm) * byName(nm)).as(s"ss_$nm")) ++
        pairs.map { case (a, b) =>
          dsum38(byName(a) * byName(b)).as(s"sp_${a}_$b")
        }
    val m = Tables.lineitem(s, dir).agg(aggCols.head, aggCols.tail: _*)
    val corrCols = pairs.map { case (a, b) =>
      val num = (col("nd") * col(s"sp_${a}_$b") -
        col(s"s_$a") * col(s"s_$b")).cast("double")
      val va = (col("nd") * col(s"ss_$a") -
        col(s"s_$a") * col(s"s_$a")).cast("double")
      val vb = (col("nd") * col(s"ss_$b") -
        col(s"s_$b") * col(s"s_$b")).cast("double")
      (num / (sqrt(va) * sqrt(vb))).as(s"c_${a}_$b")
    }
    val stackArgs = pairs
      .map { case (a, b) => s"'$a', '$b', c_${a}_$b" }.mkString(", ")
    m.select(corrCols: _*)
      .select(expr(
        s"stack(${pairs.size}, $stackArgs) AS (x_name, y_name, corr)"))
  }

  /** Per-user inter-event gaps (lag over an explicit total order) —
    * the session-feature extraction shape: one shuffle by user_id, then
    * a per-user rollup of exact microsecond deltas.
    */
  def eventsUserGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           count(col("gap_us")).as("n_gaps"),
           max(col("gap_us")).as("max_gap_us"),
           (sum(col("gap_us")).cast("double") / count(col("gap_us")))
             .as("avg_gap_us"))
  }

  /** ntile quartiles of account balance within each market segment —
    * ranking shuffles once by segment; the (balance, custkey) order is
    * total so tile boundaries are deterministic.
    */
  def ntileCustomers(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("balance_quartile"))
  }

  /** Skew-salted repartition join: the fact side spreads each hot join
    * key across 8 salt buckets (deterministic salt from the line number),
    * the dim side replicates each row into all 8 — so one pathological
    * orderkey lands on 8 reducers instead of 1. Result is provably
    * identical to the unsalted join (the oracle IS the unsalted join).
    * At 100 TB this is the manual fallback when AQE's skew split can't
    * kick in (e.g. pre-shuffled bucketed inputs).
    */
  def saltedJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val nSalt = 4
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        pmod(col("l_linenumber"), lit(nSalt)).as("salt"))
    val dim = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        explode(array((0 until nSalt).map(lit): _*)).as("salt"))
    fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey") &&
          fact("salt") === dim("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
           dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("revenue"))
  }

  /** ROWS-frame window: 3-event moving average of event value per user.
    * Values are quantized to exact 1e-6 integers before the frame sum,
    * so the average is (exact integer)/count — frame summation order
    * can't leak engine differences.
    */
  def windowMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 1e6).cast("long").as("qv"))
      .select(col("user_id"), col("event_id"),
        (sum(col("qv")).over(w).cast("double") /
          count(col("qv")).over(w) / 1e6).as("moving_avg"))
  }

  /** EXPONENTIAL moving average, exactly: α=1/2 makes every EWMA weight
    * a dyadic 2^-k, so over the last ≤8 orders the weighted numerator
    * and the weight total are exact BIGINTs (cents × powers of two) and
    * the smoothed price is one IEEE division at the end — an EWMA that
    * passes a value-hash gate, which a float-recurrence formulation
    * never could. Truncating the tail at 8 terms bounds the lag chain;
    * the dropped mass is ≤ 2^-8 of the weight. One shuffle (by
    * customer), O(1) state per row — same scale shape as every window
    * here.
    */
  def windowEwma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("t"), col("o_orderkey"))
    val num = (1 until 8).foldLeft(col("cents") * lit(128L)) { (acc, k) =>
      acc + coalesce(lag(col("cents"), k).over(w) * lit(1L << (7 - k)),
        lit(0L))
    }
    val den = (1 until 8).foldLeft(lit(128L).cast("long")) { (acc, k) =>
      acc + when(lag(col("cents"), k).over(w).isNotNull,
        lit(1L << (7 - k))).otherwise(lit(0L))
    }
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(col("o_orderkey"), col("o_custkey"),
        (num.cast("double") / den / lit(100.0)).as("ewma_price"))
  }

  /** RANGE-frame window: per customer, each order's trailing-7-day spend
    * (inclusive) — the time-decayed feature shape. The frame ranges over
    * exact microsecond epochs; money sums are exact cents.
    */
  def windowTrailing7d(s: SparkSession, dir: String): DataFrame = {
    val sevenDaysUs = 7L * 24 * 3600 * 1000000L
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("t"))
      .rangeBetween(-sevenDaysUs, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(col("o_orderkey"), col("o_custkey"),
        (sum(col("cents")).over(w).cast("double") / 100.0)
          .as("trailing_7d_spend"),
        count(col("cents")).over(w).as("trailing_7d_orders"))
  }

  /** Funnel analysis: of the users who viewed, how many first-clicked
    * after their first view, and then first-purchased after that click —
    * the classic ordered-sequence metric. One conditional-aggregation
    * pass builds per-user first-occurrence timestamps (exact micros),
    * one tiny aggregate counts the stages; strict `<` comparisons make
    * ties drop out identically in both engines.
    */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val us = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view",
          unix_micros(col("ts")))).as("t_view"),
        min(when(col("event_type") === "click",
          unix_micros(col("ts")))).as("t_click"),
        min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("t_purchase"))
    us.agg(
      count(col("t_view")).as("n_viewed"),
      count(when(col("t_view") < col("t_click"), 1)).as("n_then_clicked"),
      count(when(col("t_view") < col("t_click") &&
                 col("t_click") < col("t_purchase"), 1))
        .as("n_then_purchased"))
  }

  /** Cohort retention: users bucketed by first-signup week, counted as
    * retained in each later week they show any activity. Two shuffles
    * (cohort build, distinct activity), then the offset arithmetic is
    * exact epoch-microsecond division (UTC weeks have no DST, so week
    * deltas are exact multiples of 7 days).
    */
  def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val activity = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    cohort.join(activity, "user_id")
      .select(col("cohort_week"),
        // `/` on longs is double division in Spark SQL; the quotient is
        // an exact small integer, so the long cast is lossless
        ((unix_micros(col("week")) - unix_micros(col("cohort_week"))) /
          lit(604800000000L)).cast("long").as("offset_weeks"))
      .filter(col("offset_weeks") >= 0)
      .groupBy("cohort_week", "offset_weeks")
      .agg(count(lit(1)).as("n_users"))
  }

  /** ANALYZE-style column profile of `orders`: one row per profiled
    * column carrying table row count, non-null count, exact NDV, and
    * string-rendered min/max — the stats-collection pass every
    * warehouse runs before planning (and every training-data pipeline
    * runs to detect drift/nulls before a run). All four columns
    * profile in ONE scan: Catalyst plans the multi-distinct aggregate
    * as a single Expand (×4 rows, map-side) feeding partial/final
    * aggregates, so exactly one shuffle moves only aggregate state,
    * never the table. min/max/null counts combine map-side for free.
    * At 100 TB the exact-NDV Expand is the knob to trade first: the
    * KMV door ([[sketchDistinctUsers]]'s `graft_min_k`) profiles NDV
    * with bounded ≤k state and no row multiplication. Long-form
    * output is `stack` over the single aggregate row — driver-sized,
    * no second scan. Only int/string columns are profiled so the
    * string rendering of min/max is engine-portable.
    */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val profiled = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +: profiled.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
    }
    val one = Tables.orders(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackArgs = profiled
      .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    one.select(
        expr(s"stack(${profiled.length}, $stackArgs)" +
          " AS (col_name, n_nonnull, n_distinct, min_val, max_val)"),
        col("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per event type, next
    * to the exact distinct count it estimates. The sketch state is the
    * `graft_min_k` native aggregate — a bounded ≤k set with map-side
    * partial aggregation, so the shuffle carries k hashes per group
    * instead of every distinct user (THE reason sketches exist at
    * 100 TB). Unlike HLL (`approx_count_distinct`), KMV over a pinned
    * md5 family is deterministic and cross-engine verifiable: the k-th
    * smallest hash is bit-identical in DuckDB, and the estimator
    * (k−1)/u is one IEEE division. Groups with < k distinct members ARE
    * the exact answer (the sketch degenerates losslessly).
    */
  def sketchDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val k = 64
    val kth = conv(substring(element_at(col("arr"), k), 1, 8), 16, 10)
      .cast("long").cast("double")
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("exact_users"),
           call_function("graft_min_k", col("h"), lit(k)).as("arr"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        when(size(col("arr")) < k, size(col("arr")).cast("double"))
          .otherwise(lit((k - 1).toDouble) / (kth / lit(4294967296.0)))
          .as("kmv_users"))
  }

  /** TPC-H Q4 shape through the SQL surface: correlated EXISTS subquery
    * (late-shipping orders per priority) — one ANSI statement, both
    * engines; Catalyst plans the EXISTS as a left-semi hash join.
    */
  def sqlQ4PriorityExists(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ4PriorityExists)
  }

  private val SqlQ4PriorityExists =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept the order waiting): EXISTS and
    * NOT EXISTS correlated against the SAME fact table, with the NOT
    * EXISTS carrying a non-equality correlated predicate
    * (`l3.l_shipdate > l1.l_shipdate`) — the hardest decorrelation case
    * on the board. Catalyst plans both as joins keyed on the EQUALITY
    * half of the correlation (l_orderkey): a left-semi for EXISTS and a
    * left-anti whose extra inequality rides along as the join's
    * residual condition — so all fact-side shuffles key on l_orderkey
    * (co-partitioned, reusable) and no nested-loop join appears
    * (machine-checked by PlanLintSpec). Adapted to the harness schema:
    * shipdate stands in for the reference's commit/receipt dates; the
    * output is a count per supplier — integer-exact, no float hazard.
    */
  def sqlQ21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ21WaitingSupplier)
  }

  private val SqlQ21WaitingSupplier =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name""".stripMargin

  /** TPC-H Q2 shape (minimum-cost supplier): a correlated scalar MIN
    * subquery that itself spans a 4-table join, equality-compared
    * against the outer row. Catalyst decorrelates into ONE
    * partkey-grouped min over the (already dimension-filtered) fact,
    * joined back on l_partkey — region/nation/supplier stay broadcast
    * on both sides, so the only fact shuffles are the two l_partkey
    * aggregations. Adapted to the harness schema: lineitem is the
    * part↔supplier link (no partsupp table) with l_extendedprice as
    * the cost; DISTINCT collapses repeat shipments of the same
    * (part, supplier) at the min price. Determinism: MIN over doubles
    * is order-independent and the equality compares bit-identical
    * parquet values — no arithmetic touches the floats.
    */
  def sqlQ2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ2MinCostSupplier)
  }

  private val SqlQ2MinCostSupplier =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size = 15 AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |  AND l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')""".stripMargin

  /** TPC-H Q16 shape (supplier count by part attributes): NOT IN
    * subquery + grouped COUNT(DISTINCT). The NOT IN plans as a
    * null-aware anti join — here the subquery key (s_suppkey) is
    * non-nullable and supplier-table-sized, so it collapses to a
    * broadcast anti against the fact; the distinct count is Spark's
    * two-shuffle expand (partial distinct on (group, suppkey), then
    * final count) — both shuffles carry post-filter attribute-grouped
    * rows, not raw fact rows. Integer-exact output.
    */
  def sqlQ16SupplierCount(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ16SupplierCount)
  }

  private val SqlQ16SupplierCount =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#17'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape (excess-shipment suppliers): a semi-join chain
    * whose inner side is a grouped aggregate compared against HALF OF
    * ITS OWN correlated total. Expressed as one CTE with BOTH sums
    * (the windowed year and the all-time total) accumulated in a
    * single (suppkey, partkey) aggregate pass — the classic
    * re-aggregation the reference query pays twice, folded into one
    * fact scan; the IN then plans as a left-semi against the
    * aggregate's output (group-cardinality-sized, broadcastable).
    * Determinism: quantities are integral so both sums and the dyadic
    * `0.5 *` threshold are exact in any accumulation order.
    */
  def sqlQ20ExcessShipments(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ20ExcessShipments)
  }

  private val SqlQ20ExcessShipments =
    """WITH shipped AS (
      |  SELECT l_suppkey, l_partkey,
      |    SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
      |              AND l_shipdate < DATE '1997-01-01'
      |             THEN l_quantity ELSE 0 END) AS q96,
      |    SUM(l_quantity) AS q_all
      |  FROM lineitem, part
      |  WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
      |  GROUP BY l_suppkey, l_partkey)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |  AND s_suppkey IN (SELECT l_suppkey FROM shipped
      |                    WHERE q96 > 0.5 * q_all)""".stripMargin

  /** TPC-H Q12 shape (shipping-priority line counts): fact ⋈ fact join
    * with conditional two-class counts in one aggregate pass —
    * `FILTER (WHERE ...)` runs verbatim in both engines. The date
    * filter lands in the lineitem scan (PushedFilters) BEFORE the
    * join, so the orderkey shuffle moves one year of lines, and AQE
    * sees the collapsed side for a broadcast re-plan. Adapted to the
    * harness schema: linestatus stands in for the reference's
    * shipmode. Integer-exact output.
    */
  def sqlQ12PriorityLines(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlQ12PriorityLines)
  }

  private val SqlQ12PriorityLines =
    """SELECT l_linestatus,
      |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
      |    AS high_line_count,
      |  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
      |    AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= DATE '1997-01-01'
      |  AND l_shipdate < DATE '1998-01-01'
      |GROUP BY l_linestatus""".stripMargin

  /** LATERAL correlated-LIMIT join through the SQL surface: each
    * building-segment customer joined to its own top-2 orders by
    * value — the top-N-per-group idiom written as a correlated
    * subquery with ORDER BY + LIMIT, runnable verbatim by both
    * engines. Catalyst decorrelates the per-row LIMIT into a rank
    * window over o_custkey with Spark 4's `WindowGroupLimit` pushdown
    * (a PARTIAL group-limit below the shuffle and a final one above),
    * so each map task forwards at most 2 rows per customer — the
    * declarative form already IS the hand-written two-pass top-N
    * plan, and the customer side broadcasts. Determinism: the inner
    * ORDER BY is a total order (price ties broken by unique
    * orderkey), so both engines select the identical row set; no
    * arithmetic touches the floats.
    */
  def sqlLateralTopOrders(s: SparkSession, dir: String): DataFrame = {
    graft.core.Catalog.register(s, dir)
    s.sql(SqlLateralTopOrders)
  }

  private val SqlLateralTopOrders =
    """SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c_mktsegment = 'BUILDING'""".stripMargin

  /** Grouped top-k: 3 highest-value users per event type. Two-level
    * shape: exact decimal per-(type,user) sums (one shuffle), then rank
    * within type — the rank shuffle moves only the aggregated rows.
    */
  def topkUsersByType(s: SparkSession, dir: String): DataFrame = {
    val sums = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(dsum(col("value")).as("total_value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("total_value").desc, col("user_id"))
    sums.select(col("event_type"), col("user_id"), col("total_value"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
  }

  /** TPC-H Q14-shaped promo revenue share: lineitem ⋈ broadcast part,
    * CONDITIONAL exact-decimal sums (promo vs total) in ONE pass — no
    * second scan, no self-join — and a single double division at the
    * very end. The conditional-aggregate shape is how any "share of X"
    * metric should run at 100 TB: the ratio costs nothing beyond the
    * one aggregation.
    */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)).as("n_lines"),
           dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
             .as("promo_revenue"),
           dsum(rev).as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  /** TPC-H Q18-shaped large-order report: per-order quantity rollup,
    * HAVING-filter, then join back to orders and customer. The
    * aggregate runs FIRST so the joins move only the few surviving
    * orders — and neither join side is hardcoded broadcast: customer
    * scales with the data (a 100 TB run has billions), while the
    * filtered order list is runtime-small, so AQE's size-based flip to
    * broadcast-hash picks the right side per run instead of a
    * hardwired guess.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 180.0)
    big
      .join(Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
  }

  /** TPC-H Q19-shaped disjunctive predicate: revenue from an OR of
    * brand/size/quantity conjunctions across the lineitem ⋈ part join.
    * The per-side conjuncts (quantity ranges on lineitem, brand/size on
    * part) are extracted by Catalyst's CNF conversion and pushed to
    * BOTH scans as data filters (`PushedFilters` shows the ORs), so
    * each side reads only rows that can satisfy SOME branch before the
    * join evaluates the full disjunction — the difference between
    * joining two filtered slivers and joining two full tables at
    * 100 TB.
    */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"),
      col("p_size"))
    val pred =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 40))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(count(lit(1)).as("n_lines"),
           dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("revenue"))
  }

  /** TPC-H Q7-shaped "volume shipping": bilateral trade revenue between
    * two nations by ship year. The scale-critical move is WHERE the
    * nation filter lands: joining the 2-row nation slice to supplier and
    * customer FIRST shrinks both to 2/25ths before they ever meet
    * lineitem, so the big join's build sides carry only in-scope keys
    * (at 100 TB that is the difference between shuffling 8% of customer
    * and shuffling all of it). Nation itself is the only explicit
    * broadcast — supplier/customer slices stay shuffle joins, because at
    * warehouse scale 2/25 of a billion-row table is not broadcastable
    * (AQE upgrades them to broadcast at harness scale on its own). The
    * shipdate window reaches the lineitem scan as a pushed filter.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_7")
    val nations = Tables.nation(s, dir)
      .filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate").between("1995-01-01", "1996-12-31"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      // directional pair filter: A→B and B→A stay, A→A / B→B go
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
              (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("n_lines"),
           dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("revenue"))
  }

  /** TPC-H Q9-shaped product profit: revenue from parts whose name
    * contains a token, by supplier nation and order year. (The harness
    * schema has no partsupp/ps_supplycost, so "profit" is
    * `l_extendedprice·(1−l_discount)` — the join/filter SHAPE is Q9's:
    * a selective LIKE dimension filter driving a 5-way star join.)
    * Scale: the p_name filter lands on the part scan and the filtered
    * part table joins lineitem FIRST, so the selective dimension prunes
    * fact rows before the wider orders join; nation is the only
    * explicit broadcast (supplier and filtered part stay shuffle joins
    * — at warehouse scale neither is broadcastable; AQE upgrades them
    * at harness scale on its own).
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
           dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("profit"))
  }

  /** TPC-H Q13-shaped customer order-count distribution: LEFT join
    * customer→orders (zero-order customers must appear, counted at 0),
    * orders per customer, then customers per order-count — the
    * double-aggregation histogram shape. Scale: the left join and the
    * first count share ONE customer-key shuffle (partial-aggregated);
    * the second aggregation shuffles |distinct counts| rows — nothing.
    * Q13's "not special requests" filter maps to excluding one priority
    * class, pushed to the orders scan.
    */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_custs"))
  }

  /** Frequency-ranked dictionary encoding of a categorical column — the
    * "build a label vocabulary, then encode the fact table" step of a
    * feature pipeline. The dictionary is a groupBy(event_type) aggregate
    * (rows = DISTINCT types, independent of corpus size) ranked by
    * (freq DESC, type ASC) — a total order, so code assignment is
    * deterministic in both engines; the unpartitioned `row_number`
    * window runs over that CARDINALITY-sized aggregate, never the fact
    * table (the corpus_mix exemption class in PlanLintSpec). Encoding is
    * a broadcast hash join of the fact side against the tiny dictionary;
    * the output re-aggregates per code to prove the mapping end to end
    * without dumping the fact table.
    */
  def dictEncodeTypes(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val dict = ev.groupBy("event_type").agg(count(lit(1)).as("freq"))
      .withColumn("code",
        row_number().over(
          Window.orderBy(col("freq").desc, col("event_type"))).cast("long"))
      .select("event_type", "code")
    ev.join(broadcast(dict), "event_type")
      .groupBy(col("code"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select("code", "event_type", "n_events", "sum_value")
  }

  /** Order-independent table checksum — the migration/CDC validation
    * primitive: after a snapshot copy, a merge replay, or an engine
    * swap, both sides run one cheap pass and compare a single number.
    * Each row folds its key/date/money/status fields to a linear
    * polynomial `raw` in EXACT decimal arithmetic (no float summation,
    * no engine-specific hash), then SQUARES it modulo the largest
    * prime below 2^63 before the commutative sum. The square makes the
    * per-row term nonlinear in every field, so not just a single-field
    * edit but also a field SWAP between two rows (two orders exchanging
    * o_custkey — invisible to a linear sum) moves the checksum; the
    * modulus keeps every intermediate and the result inside int64, so
    * any BIGINT-pathed consumer on either engine sees the identical
    * value (an unreduced sum of squares needs >38 digits and a
    * beyond-BIGINT result is exactly where cross-engine decimal
    * canonicalization diverges). Independent of partitioning, row
    * order, and engine. One grouping-free partial+final aggregate:
    * map-side combine reduces each partition to one 16-byte decimal,
    * shuffle bytes are O(partitions) at any table size.
    */
  def tableChecksum(s: SparkSession, dir: String): DataFrame = {
    // Largest prime < 2^63: r < P so r*r < 8.6e37 stays exact in
    // DECIMAL(38,0) (and in DuckDB's HUGEINT), and the folded sum is a
    // plain BIGINT on both engines.
    val P = "9223372036854775783BD"
    Tables.orders(s, dir)
      .select(expr(
        "pmod(CAST(o_orderkey AS DECIMAL(38,0)) * 1315423911" +
        " + CAST(o_custkey AS DECIMAL(38,0)) * 2654435761" +
        " + CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
        "     AS DECIMAL(38,0))" +
        " + CAST(CAST(round(o_totalprice * 100) AS BIGINT)" +
        "     AS DECIMAL(38,0)) * 97" +
        s" + ascii(o_orderstatus), $P)").as("r"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr(s"CAST(pmod(sum(pmod(r * r, $P)), $P) AS BIGINT)")
          .as("checksum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dict_encode_types"       -> dictEncodeTypes _,
    "table_checksum"          -> tableChecksum _,
    "q7_volume_shipping"      -> q7VolumeShipping _,
    "q9_product_profit"       -> q9ProductProfit _,
    "q13_customer_distribution" -> q13CustomerDistribution _,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue _,
    "q14_promo_revenue"       -> q14PromoRevenue _,
    "q18_large_orders"        -> q18LargeOrders _,
    "cube_orders"             -> cubeOrders _,
    "pivot_returns"           -> pivotReturns _,
    "percentile_brand_prices" -> percentileBrandPrices _,
    "sql_parts_above_type_avg" -> sqlPartsAboveTypeAvg _,
    "sql_q17_small_qty" -> sqlQ17SmallQty _,
    "sql_q15_top_supplier" -> sqlQ15TopSupplier _,
    "sql_q11_important_nations" -> sqlQ11ImportantNations _,
    "corr_quantity_price"     -> corrQuantityPrice _,
    "corr_matrix"             -> corrMatrix _,
    "events_user_gaps"        -> eventsUserGaps _,
    "ntile_customers"         -> ntileCustomers _,
    "salted_join_revenue"     -> saltedJoinRevenue _,
    "topk_users_by_type"      -> topkUsersByType _,
    "sketch_distinct_users"   -> sketchDistinctUsers _,
    "profile_table"           -> profileTable _,
    "sql_q4_priority_exists"  -> sqlQ4PriorityExists _,
    "sql_q21_waiting_supplier" -> sqlQ21WaitingSupplier _,
    "sql_q2_min_cost_supplier" -> sqlQ2MinCostSupplier _,
    "sql_q16_supplier_cnt"    -> sqlQ16SupplierCount _,
    "sql_q20_excess_shipments" -> sqlQ20ExcessShipments _,
    "sql_q12_priority_lines"  -> sqlQ12PriorityLines _,
    "sql_lateral_top_orders"  -> sqlLateralTopOrders _,
    "events_funnel"           -> eventsFunnel _,
    "window_moving_avg"       -> windowMovingAvg _,
    "window_ewma"             -> windowEwma _,
    "window_trailing_7d"      -> windowTrailing7d _,
    "events_retention"        -> eventsRetention _)

  val oracles: Map[String, String] = Map(
    "table_checksum" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM((r*r) % 9223372036854775783)
        |    % 9223372036854775783 AS BIGINT) AS checksum
        |FROM (
        |  SELECT (CAST(o_orderkey AS HUGEINT) * 1315423911
        |    + CAST(o_custkey AS HUGEINT) * 2654435761
        |    + CAST(epoch_us(o_orderdate) AS HUGEINT)
        |    + CAST(round(o_totalprice * 100) AS HUGEINT) * 97
        |    + ascii(o_orderstatus)) % 9223372036854775783 AS r
        |  FROM orders)""".stripMargin,
    "dict_encode_types" ->
      """WITH freq AS (
        |  SELECT event_type, COUNT(*) AS freq FROM events
        |  GROUP BY event_type),
        |dict AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (ORDER BY freq DESC, event_type)
        |      AS BIGINT) AS code
        |  FROM freq)
        |SELECT d.code, e.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dict d ON e.event_type = d.event_type
        |GROUP BY d.code, e.event_type""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice, l_discount
        |  FROM supplier
        |    JOIN lineitem ON s_suppkey = l_suppkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        |) shipping
        |GROUP BY 1, 2, 3""".stripMargin,
    "q9_product_profit" ->
      """SELECT nation, o_year, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(30,6))) AS DOUBLE) AS profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice, l_discount
        |  FROM lineitem
        |    JOIN part ON l_partkey = p_partkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%widget%') profit
        |GROUP BY 1, 2""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS n_custs FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT o_custkey, o_orderkey FROM orders
        |    WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey) counts
        |GROUP BY 1""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q14_promo_revenue" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n_lines,
        |    CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |          THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |        AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT n_lines, promo_revenue, total_revenue,
        |  100.0 * promo_revenue / total_revenue AS promo_pct
        |FROM a""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |      AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |    > 180.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "pivot_returns" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (l_linestatus = 'O') AS O_n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
        |       FILTER (l_linestatus = 'O') AS DOUBLE) AS O_rev,
        |  COUNT(*) FILTER (l_linestatus = 'F') AS F_n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
        |       FILTER (l_linestatus = 'F') AS DOUBLE) AS F_rev
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "percentile_brand_prices" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |  quantile_cont(CAST(round(p_retailprice * 100) AS BIGINT), 0.25)
        |    / 100.0 AS p25,
        |  quantile_cont(CAST(round(p_retailprice * 100) AS BIGINT), 0.5)
        |    / 100.0 AS p50,
        |  quantile_cont(CAST(round(p_retailprice * 100) AS BIGINT), 0.75)
        |    / 100.0 AS p75
        |FROM part GROUP BY p_brand""".stripMargin,
    "sql_parts_above_type_avg" -> SqlPartsAboveTypeAvg,
    "sql_q17_small_qty" -> SqlQ17SmallQty,
    "sql_q15_top_supplier" -> SqlQ15TopSupplier,
    "sql_q11_important_nations" -> SqlQ11ImportantNations,
    "corr_quantity_price" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS HUGEINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, COUNT(*) AS n_lines,
        |    CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM q GROUP BY l_returnflag)
        |SELECT l_returnflag, n_lines,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price
        |FROM m""".stripMargin,
    "corr_matrix" ->
      """WITH q AS (
        |  SELECT CAST(round(l_quantity) AS HUGEINT) AS x1,
        |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS x2,
        |    CAST(round(l_discount * 100) AS HUGEINT) AS x3,
        |    CAST(round(l_tax * 100) AS HUGEINT) AS x4
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3, SUM(x4) AS s4,
        |    SUM(x1*x1) AS ss1, SUM(x2*x2) AS ss2,
        |    SUM(x3*x3) AS ss3, SUM(x4*x4) AS ss4,
        |    SUM(x1*x2) AS p12, SUM(x1*x3) AS p13, SUM(x1*x4) AS p14,
        |    SUM(x2*x3) AS p23, SUM(x2*x4) AS p24, SUM(x3*x4) AS p34
        |  FROM q)
        |SELECT 'quantity' AS x_name, 'price_cents' AS y_name,
        |  CAST(n*p12 - s1*s2 AS DOUBLE) /
        |    (sqrt(CAST(n*ss1 - s1*s1 AS DOUBLE)) *
        |     sqrt(CAST(n*ss2 - s2*s2 AS DOUBLE))) AS corr FROM m
        |UNION ALL
        |SELECT 'quantity', 'discount_pct',
        |  CAST(n*p13 - s1*s3 AS DOUBLE) /
        |    (sqrt(CAST(n*ss1 - s1*s1 AS DOUBLE)) *
        |     sqrt(CAST(n*ss3 - s3*s3 AS DOUBLE))) FROM m
        |UNION ALL
        |SELECT 'quantity', 'tax_pct',
        |  CAST(n*p14 - s1*s4 AS DOUBLE) /
        |    (sqrt(CAST(n*ss1 - s1*s1 AS DOUBLE)) *
        |     sqrt(CAST(n*ss4 - s4*s4 AS DOUBLE))) FROM m
        |UNION ALL
        |SELECT 'price_cents', 'discount_pct',
        |  CAST(n*p23 - s2*s3 AS DOUBLE) /
        |    (sqrt(CAST(n*ss2 - s2*s2 AS DOUBLE)) *
        |     sqrt(CAST(n*ss3 - s3*s3 AS DOUBLE))) FROM m
        |UNION ALL
        |SELECT 'price_cents', 'tax_pct',
        |  CAST(n*p24 - s2*s4 AS DOUBLE) /
        |    (sqrt(CAST(n*ss2 - s2*s2 AS DOUBLE)) *
        |     sqrt(CAST(n*ss4 - s4*s4 AS DOUBLE))) FROM m
        |UNION ALL
        |SELECT 'discount_pct', 'tax_pct',
        |  CAST(n*p34 - s3*s4 AS DOUBLE) /
        |    (sqrt(CAST(n*ss3 - s3*s3 AS DOUBLE)) *
        |     sqrt(CAST(n*ss4 - s4*s4 AS DOUBLE))) FROM m""".stripMargin,
    "events_user_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts), 1)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events, COUNT(gap_us) AS n_gaps,
        |  max(gap_us) AS max_gap_us,
        |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS avg_gap_us
        |FROM g GROUP BY user_id""".stripMargin,
    "ntile_customers" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  ntile(4) OVER (PARTITION BY c_mktsegment
        |                 ORDER BY c_acctbal, c_custkey) AS balance_quartile
        |FROM customer""".stripMargin,
    // ^ DuckDB ntile is BIGINT; Spark side casts to long to match.
    "salted_join_revenue" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |                AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "events_retention" ->
      """WITH cohort AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        |  FROM events)
        |SELECT cohort_week,
        |  (epoch_us(week) - epoch_us(cohort_week)) // 604800000000
        |    AS offset_weeks,
        |  COUNT(*) AS n_users
        |FROM cohort JOIN activity USING (user_id)
        |WHERE epoch_us(week) >= epoch_us(cohort_week)
        |GROUP BY 1, 2""".stripMargin,
    "window_moving_avg" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(qv) OVER w AS DOUBLE) / (COUNT(qv) OVER w) / 1000000.0
        |    AS moving_avg
        |FROM (SELECT user_id, event_id, ts,
        |        CAST(round(value * 1000000.0) AS BIGINT) AS qv FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "window_ewma" -> {
      val num = (1 until 8).foldLeft("cents * 128")((acc, k) =>
        s"$acc + coalesce(lag(cents, $k) OVER w * ${1L << (7 - k)}, 0)")
      val den = (1 until 8).foldLeft("128")((acc, k) =>
        s"$acc + CASE WHEN lag(cents, $k) OVER w IS NOT NULL" +
          s" THEN ${1L << (7 - k)} ELSE 0 END")
      s"""SELECT o_orderkey, o_custkey,
         |  CAST($num AS DOUBLE) / ($den) / 100.0 AS ewma_price
         |FROM (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS t,
         |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |      FROM orders)
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY t, o_orderkey)""".stripMargin
    },
    "window_trailing_7d" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS trailing_7d_spend,
        |  COUNT(cents) OVER w AS trailing_7d_orders
        |FROM (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS t,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY t
        |             RANGE BETWEEN 604800000000 PRECEDING
        |               AND CURRENT ROW)""".stripMargin,
    "events_funnel" ->
      """WITH us AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(t_view) AS n_viewed,
        |  COUNT(CASE WHEN t_view < t_click THEN 1 END) AS n_then_clicked,
        |  COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase
        |        THEN 1 END) AS n_then_purchased
        |FROM us""".stripMargin,
    "profile_table" ->
      """WITH s AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(o_orderkey) AS nn1, COUNT(DISTINCT o_orderkey) AS nd1,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS mn1,
        |    CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
        |    COUNT(o_custkey) AS nn2, COUNT(DISTINCT o_custkey) AS nd2,
        |    CAST(MIN(o_custkey) AS VARCHAR) AS mn2,
        |    CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
        |    COUNT(o_orderstatus) AS nn3,
        |    COUNT(DISTINCT o_orderstatus) AS nd3,
        |    MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
        |    COUNT(o_orderpriority) AS nn4,
        |    COUNT(DISTINCT o_orderpriority) AS nd4,
        |    MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4
        |  FROM orders)
        |SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_nonnull,
        |  nd1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM s
        |UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2 FROM s
        |UNION ALL
        |SELECT 'o_orderstatus', n_rows, nn3, nd3, mn3, mx3 FROM s
        |UNION ALL
        |SELECT 'o_orderpriority', n_rows, nn4, nd4, mn4, mx4
        |FROM s""".stripMargin,
    "sketch_distinct_users" ->
      """WITH h AS (
        |  SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM events),
        |a AS (
        |  SELECT event_type, COUNT(*) AS n_events,
        |    COUNT(DISTINCT user_id) AS exact_users,
        |    list_sort(list(DISTINCT h))[1:64] AS arr
        |  FROM h GROUP BY event_type)
        |SELECT event_type, n_events, exact_users,
        |  CASE WHEN len(arr) < 64 THEN CAST(len(arr) AS DOUBLE)
        |       ELSE 63.0 / (CAST(CAST('0x' || substr(arr[64], 1, 8)
        |                              AS BIGINT) AS DOUBLE) / 4294967296.0)
        |  END AS kmv_users
        |FROM a""".stripMargin,
    "sql_q4_priority_exists" -> SqlQ4PriorityExists,
    "sql_q21_waiting_supplier" -> SqlQ21WaitingSupplier,
    "sql_q2_min_cost_supplier" -> SqlQ2MinCostSupplier,
    "sql_q16_supplier_cnt" -> SqlQ16SupplierCount,
    "sql_q20_excess_shipments" -> SqlQ20ExcessShipments,
    "sql_q12_priority_lines" -> SqlQ12PriorityLines,
    "sql_lateral_top_orders" -> SqlLateralTopOrders,
    "topk_users_by_type" ->
      """WITH sums AS (
        |  SELECT event_type, user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
        |  FROM events GROUP BY event_type, user_id),
        |ranked AS (
        |  SELECT event_type, user_id, total_value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY total_value DESC, user_id) AS rnk
        |  FROM sums)
        |SELECT * FROM ranked WHERE rnk <= 3""".stripMargin)
}
