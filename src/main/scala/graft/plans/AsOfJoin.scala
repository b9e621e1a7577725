package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType,
  TimestampType}

/** NATIVE AS-OF JOIN — a whole-operator Catalyst extension (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`), the escalation path
  * for semantics Spark's built-in operators can't express directly.
  *
  * Semantics: for every LEFT row, attach the RIGHT row with the same
  * key and the greatest time AT OR BEFORE the left row's time; NULL
  * columns when no such row exists (left-outer as-of). If several right
  * rows share that (key, time), whichever the sort emits last wins —
  * feed a right side that is unique per (key, time) when ties must be
  * deterministic (the catalog query collapses them with `max(event_id)`
  * first, mirroring its oracle).
  *
  * Scale shape — this is WHY the operator exists: the relational
  * encodings are either an inequality join (plans as a per-key
  * nested-loop blow-up, |L|×|R| per key before the argmax prunes) or
  * the union-tag + carry-forward-window trick
  * ([[graft.operators.RelationalQueries.eventsAsofJoin]] — linear, but
  * it materializes the union and runs a window over L+R rows). The
  * native operator declares exactly a sort-merge join's requirements —
  * `ClusteredDistribution` on the key and (key, time) sort per child —
  * so Catalyst plans ONE co-partitioned shuffle per side and the
  * streamed merge holds O(1) state per partition (the one latest
  * matching right row), emitting left rows in order. No union
  * materialization, no window buffer, no pair expansion — at 100 TB
  * the cost is the two shuffles, which any correct formulation pays.
  *
  * Registered via [[GraftExtensions]] (both the
  * `spark.sql.extensions` route and programmatic
  * `extraStrategies`); [[AsOfJoin.apply]] is the DataFrame-API door.
  */
case class AsOfJoinPlan(
    left: logical.LogicalPlan, right: logical.LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute)
  extends logical.BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def maxRows: Option[Long] = left.maxRows
  override protected def withNewChildrenInternal(
      newLeft: logical.LogicalPlan, newRight: logical.LogicalPlan)
      : AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: logical.LogicalPlan): Seq[SparkPlan] =
    plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute)
  extends BinaryExecNode {

  private def longBacked(t: DataType): Boolean = t match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  require(leftKey.dataType == LongType && rightKey.dataType == LongType,
    "as-of join keys must be BIGINT")
  require(longBacked(leftTime.dataType) && longBacked(rightTime.dataType),
    "as-of join time columns must be BIGINT or TIMESTAMP")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** A sort-merge join's requirements: co-partition on the key, sort
    * each side by (key, time). EnsureRequirements inserts the
    * exchanges/sorts; a pre-bucketed or pre-sorted child satisfies them
    * for free.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending),
        SortOrder(rightTime, Ascending)) :: Nil
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
      "as-of key/time attributes must come from the respective child")
    val outAttrs = output
    // the projection's input schema must carry the OUTPUT nullability on
    // the right side: binding against the child's non-nullable attrs
    // would elide the null check and read 0 from the null-padded row
    val inAttrs = left.output ++ right.output.map(_.withNullability(true))
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightWidth)
        private val proj = UnsafeProjection.create(outAttrs, inAttrs)
        // O(1) merge state: the latest right row at-or-before the
        // current left row, and the key it belongs to
        private var matchKey = 0L
        private var hasMatch = false
        private var matchRow: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lkIdx) || l.isNullAt(ltIdx))
            return proj(joined(l, nullRight)) // NULL never matches
          val lk = l.getLong(lkIdx)
          val lt = l.getLong(ltIdx)
          // advance the right side through everything at-or-before
          // (lk, lt); rows of earlier keys and NULL rows (sorted first)
          // are consumed and dropped, in-key rows update the match
          while (rBuf.hasNext && {
            val h = rBuf.head
            h.isNullAt(rkIdx) || h.isNullAt(rtIdx) || {
              val rk = h.getLong(rkIdx)
              rk < lk || (rk == lk && h.getLong(rtIdx) <= lt)
            }
          }) {
            val r = rBuf.next()
            if (!r.isNullAt(rkIdx) && !r.isNullAt(rtIdx) &&
                r.getLong(rkIdx) == lk) {
              matchKey = lk
              hasMatch = true
              matchRow = r.copy() // iterator rows are reused buffers
            }
          }
          if (hasMatch && matchKey == lk) proj(joined(l, matchRow))
          else proj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** DataFrame door: `AsOfJoin(purchases, views, "user_id", "v_user",
    * "purchase_ts", "view_ts")`. Registers the planner strategy on the
    * session (idempotent) and wraps the children's ANALYZED plans, so
    * the key/time names resolve against exactly the passed frames.
    */
  def apply(leftDf: DataFrame, rightDf: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String): DataFrame = {
    val s = leftDf.sparkSession
    val em = s.sessionState.experimentalMethods
    // check-then-append under a lock: two threads' first use would
    // otherwise both pass the contains() check and register the
    // strategy twice (benign duplicate candidate plans, but noise)
    em.synchronized {
      if (!em.extraStrategies.contains(AsOfJoinStrategy))
        em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
    }
    val l = leftDf.queryExecution.analyzed
    val r = rightDf.queryExecution.analyzed
    def att(p: logical.LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' in ${p.output.map(_.name)}"))
    org.apache.spark.sql.GraftPlanBridge.ofRows(s,
      AsOfJoinPlan(l, r, att(l, leftKey), att(r, rightKey),
        att(l, leftTime), att(r, rightTime)))
  }
}
