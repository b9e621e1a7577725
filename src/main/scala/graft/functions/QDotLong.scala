package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd dot product of two BIGINT arrays.
  *
  * The compositional form — `aggregate(zip_with(a, b, (x,y) => x*y),
  * 0L, (acc,x) => acc+x)` — allocates an intermediate array and runs
  * interpreted lambda calls per element. This expression is a single
  * fused loop over both `ArrayData`s inside whole-stage codegen: no
  * allocation, no virtual calls — the difference between a scan-bound
  * and compute-bound ANN pass over billions of vectors. Used by every
  * `EmbeddingQueries` operator via `graft_qdot`.
  *
  * Overflow contract (documented, not checked): inputs are 1e-6
  * quantized unit-ish vectors (|q| ≲ 5e5), so 64-dim dots stay ≈1.6e13,
  * far inside Long range.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - Dot product of two ARRAY<BIGINT> values " +
    "over their common prefix length.")
case class QDotLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qdot requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_qdot"
}
