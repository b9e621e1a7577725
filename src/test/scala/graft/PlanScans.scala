package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Test utility: count how many EXECUTED plans scanned a given file
  * across a block of work — the lineage pin for one-corpus-pass
  * contracts (`BpeLineageSpec`, `DocLmLineageSpec`). Registers a
  * QueryExecutionListener, runs the block, drains the listener bus,
  * and counts `FileSourceScanExec` leaves (drilling through AQE's
  * plan and stage wrappers) whose root paths mention `pathFragment`.
  */
object PlanScans {
  def countScans(p: SparkPlan, pathFragment: String): Int = {
    val self = p match {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths
            .exists(_.toString.contains(pathFragment)) => 1
      case _ => 0
    }
    val inner = p match {
      case a: AdaptiveSparkPlanExec => countScans(a.executedPlan, pathFragment)
      // AQE stage wrappers are childless; the subtree hangs off .plan
      case q: QueryStageExec => countScans(q.plan, pathFragment)
      case s => s.children.map(countScans(_, pathFragment)).sum
    }
    self + inner
  }

  /** Total scans of `pathFragment` across every action `body` runs. */
  def during(spark: SparkSession, pathFragment: String)(body: => Unit): Int = {
    val n = new AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        n.addAndGet(countScans(qe.executedPlan, pathFragment))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      // listener callbacks ride the shared async bus — drain before read
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      n.get()
    } finally spark.listenerManager.unregister(listener)
  }
}
