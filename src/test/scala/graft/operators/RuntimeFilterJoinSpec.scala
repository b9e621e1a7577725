package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EXERCISES the runtime bloom-filter semi-join reduction behind
  * `runtime_filter_join`:
  *
  *  - the optimized plan must contain the injected
  *    `might_contain(bloom_filter_agg(...))` predicate on the fact side;
  *  - at runtime the might_contain filter must pass only a small
  *    fraction of the fact scan's rows (the measured semi-join
  *    reduction — what keeps the shuffle ~1% of the fact table at
  *    100 TB);
  *  - the result must equal the same join with injection disabled:
  *    a bloom filter's false positives go on to the real join, so
  *    reduction may never change semantics.
  */
class RuntimeFilterJoinSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap(nodes)

  test("bloom filter injected, prunes the fact side, exact result") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = RelationalQueries.runtimeFilterJoin(s, sf0001)

    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      s"no runtime bloom filter injected:\n$optimized")

    // metrics must come from the EXECUTED Dataset — orderBy would wrap
    // a fresh QueryExecution whose metrics never run
    val sorted = df.orderBy("o_month")
    val got = sorted.collect().toSeq

    // the might_contain FilterExec sits on the lineitem scan: its
    // output/input ratio is the measured semi-join reduction
    val all = nodes(sorted.queryExecution.executedPlan)
    val bloomFilters = all.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no might_contain filter in physical plan")
    val f = bloomFilters.head
    val scanRows = nodes(f)
      .collect { case sc: FileSourceScanExec => sc }
      .map(_.metrics("numOutputRows").value).sum
    val passed = f.metrics("numOutputRows").value
    assert(passed < scanRows / 10,
      s"bloom filter passed $passed of $scanRows scanned rows — no reduction")

    // exactness vs the control arm: same thresholds, no injection
    val plain = RelationalQueries.runtimeFilterJoin(s, sf0001,
      inject = false)
    assert(!plain.queryExecution.optimizedPlan.toString
      .contains("might_contain"))
    assert(plain.orderBy("o_month").collect().toSeq === got)
  }
}
