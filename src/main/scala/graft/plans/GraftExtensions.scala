package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.MinKDistinct

/** Engine extension point: registers graft's native Catalyst functions.
  *
  * Two registration paths, both supported:
  *   - cluster-wide: `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (the idiomatic `SparkSessionExtensions` route);
  *   - programmatic: `GraftExtensions.register(spark)` — idempotent, used
  *     by the query catalog so any driver-created session works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.minKFunction)
}

object GraftExtensions {

  private val minKFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_min_k"),
    new ExpressionInfo(classOf[MinKDistinct].getName, "graft_min_k"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_min_k(expr, k) takes 2 arguments")
      val k = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_min_k: k must be an integer literal, got $other")
      }
      MinKDistinct(children.head, k)
    })

  /** Idempotent per-session registration (re-registering overwrites). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      minKFunction._1, minKFunction._2, minKFunction._3)

  /** `graft_min_k` as a Column, for DataFrame-API callers. */
  def minK(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_min_k", c,
      org.apache.spark.sql.functions.lit(k))
  }
}
