package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec

/** Pins `bpe_merges`' scale contract: ONE corpus pass builds the
  * frequency-weighted vocab, then every merge round runs against the
  * checkpointed vocab — the corpus parquet must be scanned by exactly
  * one executed plan across the whole K-round computation. Without the
  * vocab checkpoints, each round's `.head()` action replays the full
  * lineage (documents scan + tokenize + groupBy + all prior rewrites),
  * i.e. K corpus scans for K merges (the round-9 verdict's only plan
  * defect). The oracle proves VALUES; this spec proves the lineage.
  */
class BpeLineageSpec extends SparkSpec {

  private def countDocScans(p: SparkPlan): Int = {
    val self = p match {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths
            .exists(_.toString.contains("documents.parquet")) => 1
      case _ => 0
    }
    val inner = p match {
      case a: AdaptiveSparkPlanExec => countDocScans(a.executedPlan)
      // AQE stage wrappers are childless; the subtree hangs off .plan
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        countDocScans(q.plan)
      case s => s.children.map(countDocScans).sum
    }
    self + inner
  }

  test("K merge rounds scan the corpus exactly once") {
    val docScans = new AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        docScans.addAndGet(countDocScans(qe.executedPlan))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = TextQueries.bpeMerges(spark, sf0001).collect()
      assert(out.length === 3)
      // listener callbacks ride the shared async bus — drain before read
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      assert(docScans.get() === 1,
        s"expected exactly 1 corpus scan across 3 merge rounds, " +
          s"got ${docScans.get()} — the vocab checkpoint discipline broke")
    } finally spark.listenerManager.unregister(listener)
  }
}
