package graft

import org.apache.spark.sql.execution.SparkPlan

/** Catalog-wide physical-plan lint: turns SCALE.md's cross-cutting
  * claims into enforced invariants over every `SparkEntry.queries`
  * entry's plan at sf0.001 —
  *
  *  1. no `CartesianProductExec` (a cross join over the corpus can
  *     never survive scale);
  *  2. no `BroadcastNestedLoopJoinExec` EXCEPT the enumerated
  *     exemptions, each pinned to its proof:
  *       - scalar sites (a broadcast of a grouping-free aggregate —
  *         structurally ≤1 row): the in-plan seed-stride `k` and the
  *         bm25 corpus-stats scalar;
  *       - constant-bounded sites (broadcast of a table whose size is
  *         a compile-time constant independent of N): the ≤16-row
  *         centroid tables of `assignNearest` and the NQuery=10 query
  *         table of brute-force ANN. These cannot be proven from the
  *         physical plan (the bound lives in the builder), so they are
  *         pinned BY NAME and any unlisted occurrence fails.
  *  3. no unpartitioned `WindowExec` over data-sized input (a window
  *     without PARTITION BY serializes the world into one task). The
  *     ONLY allowed unpartitioned windows are the documented
  *     distributed-prefix-sum bucket-total tables (N/width rows by
  *     construction, SCALE.md "Sampling / splits / training-data
  *     layout").
  *
  * The lint builds plans in a child session with AQE DISABLED: with
  * adaptive execution on (the Spark 4 default), `executedPlan` is a
  * single `AdaptiveSparkPlanExec` LEAF and a naive traversal sees
  * nothing — the r7 lint was vacuous for exactly this reason. AQE only
  * ever rewrites the plan at runtime from this initial tree, so linting
  * the non-adaptive tree is the strictest static check available.
  *
  * Streaming entries (`streaming_*`) run their bounded stream inside
  * the builder; a listener captures every started query and the lint
  * additionally walks each one's LAST micro-batch plan
  * (`StreamExecution.lastExecution`) under the same three invariants —
  * the batch-side plan of a memory-sink table scan says nothing about
  * what the micro-batches did.
  *
  * Allowlists are exact: an entry that no longer exhibits its exempted
  * node fails the lint too, so stale exemptions can't accumulate.
  */
class PlanLintSpec extends SparkSpec {

  private val unpartitionedWindowAllow = Set(
    // bucket-offset prefix sums over the tiny per-bucket totals table
    "pack_sequences", "shuffle_positions",
    // largest-remainder allocation windows over the per-source
    // AGGREGATE (≤ dozens of rows at any corpus size; the
    // Window.partitionBy(lit(1)) constant is folded away, leaving an
    // empty partitionSpec) — see TextQueries.corpusMix scaladoc
    "corpus_mix",
    // dictionary ranking window over the groupBy(event_type) AGGREGATE
    // (rows = distinct categorical values, not corpus size) — see
    // OlapQueries.dictEncodeTypes scaladoc
    "dict_encode_types")

  /** Queries whose BNLJ broadcast side is a grouping-free aggregate
    * (structurally ≤1 row; verified per-node below).
    */
  private val scalarBnljAllow = Set(
    "bm25_search",               // corpus-stats scalar (TextQueries)
    "ann_ivf_assign", "ann_ivf_topk",            // seed-stride k scalar
    "length_octiles",  // 1-row octile-boundary array (TextQueries)
    "q22_prospect_customers")  // 1-row global-average threshold
  // (The kmeans-trained entries ALSO build seeds from the scalar k, but
  // their seed join sits below the training rounds' checkpoints, so the
  // visible plan shows only the constant-bounded centroid BNLJ.)

  /** Queries whose BNLJ broadcast side is a constant-bounded table:
    * centroid tables capped at TargetNlist(Wide) ≤ 16 rows by the
    * in-plan stride, and the NQuery=10 query-vector table. The bound is
    * independent of corpus size — the broadcast stays bytes-sized at
    * 100 TB.
    */
  private val constantBnljAllow = Set(
    "ann_brute_force",           // broadcast(q): NQuery rows
    "ann_int8_rerank",           // broadcast(q8): NQuery rows (coarse pass)
    "ann_ivf_assign", "ann_ivf_topk",            // broadcast(cents)
    "ann_kmeans_centroids", "ann_kmeans_topk",
    "ann_kmeans_fixed_nlist", "ann_ivf_fixed_topk",
    "ann_ivf_persisted",      // broadcast(cents table): ≤ TargetNlist rows
    "ann_ivf_incremental")    // broadcast(cents table): ≤ TargetNlist rows

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)

  /** Structural ≤1-row proof: a grouping-free aggregate at the root of
    * the subtree, looked for through unary wrappers (exchange, project,
    * filter...).
    */
  private def scalarAggBelow(p: SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      a.groupingExpressions.isEmpty
    case _ if p.children.size == 1 => scalarAggBelow(p.children.head)
    case _ => false
  }

  /** Walk one physical plan, appending violations and recording which
    * allowlist entries were actually exercised.
    */
  private def lintPlan(name: String, where: String, plan: SparkPlan,
                       bad: scala.collection.mutable.ArrayBuffer[String],
                       usedScalar: scala.collection.mutable.Set[String],
                       usedConstant: scala.collection.mutable.Set[String],
                       usedWindow: scala.collection.mutable.Set[String])
      : Unit =
    nodes(plan).foreach { n =>
      n.getClass.getSimpleName match {
        case "CartesianProductExec" =>
          bad += s"$name ($where): cartesian product"
        case "BroadcastNestedLoopJoinExec" =>
          val scalarSide = n.children.exists(scalarAggBelow)
          if (scalarSide && scalarBnljAllow.contains(name))
            usedScalar += name
          else if (!scalarSide && constantBnljAllow.contains(name))
            usedConstant += name
          else
            bad += s"$name ($where): broadcast nested-loop join " +
              s"(scalarSide=$scalarSide, not exempted)"
        case _ =>
          n match {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty =>
              if (unpartitionedWindowAllow.contains(name))
                usedWindow += name
              else
                bad += s"$name ($where): unpartitioned window " +
                  "(single-task at scale)"
            case _ => ()
          }
      }
    }

  test("no catalog plan — batch or micro-batch — contains a cartesian " +
       "product, an unexempted nested-loop join, or an unlisted " +
       "unpartitioned window") {
    // Child session: AQE off so executedPlan is the real (non-adaptive)
    // tree, lazy checkpoints so constructing a plan doesn't execute its
    // workload. Session-scoped conf mutations never touch the shared
    // suite session (the AqeSkewJoinSpec isolation pattern).
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set(graft.core.Checkpoint.LazyConf, "true")

    val bad = scala.collection.mutable.ArrayBuffer[String]()
    val usedScalar = scala.collection.mutable.Set[String]()
    val usedConstant = scala.collection.mutable.Set[String]()
    val usedWindow = scala.collection.mutable.Set[String]()

    // capture every streaming query started by a builder so its final
    // micro-batch plan can be linted after the builder returns. The
    // QUERY OBJECT is grabbed at start (onQueryStarted is synchronous,
    // the query is still registered): after the bounded stream
    // terminates, `streams.get(id)` returns null, but the object's
    // `lastExecution` survives.
    val started = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQuery]()
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit =
          Option(s.streams.get(e.id)).foreach(started.add)
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      }
    s.streams.addListener(listener)

    /** `StreamingQueryWrapper.streamingQuery.lastExecution.executedPlan`
      * via reflection: the wrapper/execution types are private[sql] at
      * compile time but public in bytecode (Scala package-private), and
      * `lastExecution` survives query termination.
      */
    def lastMicroBatchPlan(
        q: org.apache.spark.sql.streaming.StreamingQuery)
        : Option[SparkPlan] = {
      val se = q.getClass.getMethod("streamingQuery").invoke(q)
      Option(se.getClass.getMethod("lastExecution").invoke(se)).map {
        _.asInstanceOf[org.apache.spark.sql.execution.QueryExecution]
          .executedPlan
      }
    }

    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        started.clear()
        val plan: SparkPlan =
          try fn(s, sf0001).queryExecution.executedPlan
          catch { case e: Throwable =>
            bad += s"$name: plan construction failed: ${e.getMessage}"
            null
          }
        if (plan != null)
          lintPlan(name, "batch", plan, bad,
            usedScalar, usedConstant, usedWindow)
        // a streaming entry that captured no query means the listener
        // hook silently broke — that must fail, not skip the lint
        if (name.startsWith("streaming_") && started.isEmpty)
          bad += s"$name: no streaming query captured for " +
            "micro-batch linting"
        started.forEach { q =>
          lastMicroBatchPlan(q) match {
            case Some(p) =>
              lintPlan(name, "micro-batch", p, bad,
                usedScalar, usedConstant, usedWindow)
            case None =>
              bad += s"$name: started stream ${q.id} left no " +
                "inspectable micro-batch plan"
          }
        }
      }
      assert(bad.isEmpty, "plan lint violations:\n" + bad.mkString("\n"))
      // exact allowlists: every exemption must still be exercised
      assert(scalarBnljAllow == usedScalar,
        s"stale scalar-BNLJ exemptions: ${scalarBnljAllow -- usedScalar}")
      assert(constantBnljAllow == usedConstant,
        s"stale constant-BNLJ exemptions: " +
          s"${constantBnljAllow -- usedConstant}")
      assert(unpartitionedWindowAllow == usedWindow,
        s"stale window exemptions: ${unpartitionedWindowAllow -- usedWindow}")
    } finally s.streams.removeListener(listener)
  }
}
