package graft

import org.apache.spark.sql.execution.SparkPlan

/** Catalog-wide physical-plan lint: turns SCALE.md's cross-cutting
  * claims into enforced invariants over every `SparkEntry.queries`
  * entry's batch plan at sf0.001 —
  *
  *  1. no `CartesianProductExec` (a cross join over the corpus can
  *     never survive scale);
  *  2. no `BroadcastNestedLoopJoinExec` (inequality joins must be
  *     bucketed into equi-joins — the as-of/range-join design);
  *  3. no unpartitioned `WindowExec` over data-sized input (a window
  *     without PARTITION BY serializes the world into one task). The
  *     ONLY allowed unpartitioned windows are the documented
  *     distributed-prefix-sum bucket-total tables (N/width rows by
  *     construction, SCALE.md "Sampling / splits / training-data
  *     layout").
  *
  * Queries whose builders pre-materialize scratch data (roundtrips,
  * streaming) run their write phase here; the lint inspects the
  * RETURNED batch plan.
  */
class PlanLintSpec extends SparkSpec {

  private val unpartitionedWindowAllow = Set(
    // bucket-offset prefix sums over the tiny per-bucket totals table
    "pack_sequences", "shuffle_positions")

  test("no catalog plan contains a cartesian product, a nested-loop " +
       "join, or an unlisted unpartitioned window") {
    spark.conf.set(graft.core.Checkpoint.LazyConf, "true")
    try {
      val bad = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan: SparkPlan =
          try fn(spark, sf0001).queryExecution.executedPlan
          catch { case e: Throwable =>
            bad += s"$name: plan construction failed: ${e.getMessage}"
            null
          }
        if (plan != null) {
          def nodes(p: SparkPlan): Seq[SparkPlan] =
            (p +: p.children.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
          val all = nodes(plan)
          all.foreach { n =>
            val cls = n.getClass.getSimpleName
            if (cls == "CartesianProductExec")
              bad += s"$name: cartesian product"
            if (cls == "BroadcastNestedLoopJoinExec")
              bad += s"$name: broadcast nested-loop join"
            n match {
              case w: org.apache.spark.sql.execution.window.WindowExec
                  if w.partitionSpec.isEmpty &&
                     !unpartitionedWindowAllow.contains(name) =>
                bad += s"$name: unpartitioned window (single-task at scale)"
              case _ => ()
            }
          }
        }
      }
      assert(bad.isEmpty, "plan lint violations:\n" + bad.mkString("\n"))
    } finally spark.conf.set(graft.core.Checkpoint.LazyConf, "false")
  }
}
