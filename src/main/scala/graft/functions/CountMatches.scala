package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping regex matches in a string — the fused form
  * of `size(regexp_extract_all(s, re, 0))`, which materializes every
  * match as a `UTF8String` inside a `GenericArrayData` only to take the
  * array's length and drop it. For match-counting workloads (token
  * counts, PII tallies — millions of matches per scan task at corpus
  * scale) this expression runs the same `Matcher` loop with ZERO
  * allocations per row inside whole-stage codegen.
  *
  * The regex must be FOLDABLE (enforced here and by the rewrite rule):
  * the `Pattern` compiles once on the driver and ships to executors as
  * a codegen reference object, so the per-row cost is the match loop
  * itself. Null contract matches non-legacy `size`: null subject →
  * null (`BinaryExpression` null-intolerance).
  *
  * Catalog queries hit this through
  * [[graft.plans.RewriteCountMatches]], so the DuckDB oracle gate
  * verifies the fused loop against an engine that never saw the
  * rewrite.
  */
@ExpressionDescription(
  usage = "_FUNC_(str, regexp) - Number of non-overlapping matches of " +
    "regexp (a string literal) in str.")
case class CountMatches(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    // exact default-collation StringType, not any StringType instance: a
    // collated subject (e.g. UTF8_LCASE) would otherwise type-check here
    // but match with a case-sensitive java.util.regex.Pattern — the same
    // mismatch RewriteCountMatches guards against with `== StringType`
    def str(t: DataType): Boolean = t == StringType
    if (str(left.dataType) && str(right.dataType) && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_count_matches(str, regex) requires a default-collation " +
        "STRING subject and a foldable STRING regex, got " +
        s"${left.dataType.simpleString} and " +
        s"${right.dataType.simpleString} (foldable=${right.foldable})")
  }

  @transient private lazy val pattern: Pattern = {
    val r = right.eval(null)
    require(r != null, "graft_count_matches: regex must not be null")
    Pattern.compile(r.asInstanceOf[UTF8String].toString)
  }

  override protected def nullSafeEval(s: Any, r: Any): Any = {
    val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    var c = 0
    while (m.find()) c += 1
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // a foldable NULL regex makes the whole expression null for every
    // row (the interpreted path's null-intolerance) — forcing `pattern`
    // here would instead crash the query at codegen time
    if (right.eval(null) == null) return ExprCode.forNullValue(dataType)
    val patRef =
      ctx.addReferenceObj("graftCountPattern", pattern,
        classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      s"""
         |java.util.regex.Matcher $m = $patRef.matcher($s.toString());
         |int $c = 0;
         |while ($m.find()) $c++;
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMatches =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_count_matches"
}
