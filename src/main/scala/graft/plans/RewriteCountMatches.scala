package graft.plans

import org.apache.spark.sql.catalyst.expressions.{RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.functions.CountMatches

/** Optimizer rewrite: `size(regexp_extract_all(s, re, 0))` ⇒
  * `graft_count_matches(s, re)` — drop the per-row match ARRAY a
  * counting query builds only to measure, keeping the whole pipeline
  * allocation-free inside whole-stage codegen (see
  * [[graft.functions.CountMatches]]).
  *
  * Declarative callers keep writing the idiomatic builtin composition;
  * the engine recognizes the count-of-matches intent and substitutes
  * the fused operator — the Catalyst way to add a physical
  * optimization without changing any query.
  *
  * Fires only when the rewrite is exactly semantics-preserving:
  *   - the regex and group index are foldable, the index is 0 (whole
  *     match — group counts could differ when a group fails to
  *     participate), and the regex is non-null;
  *   - `size` is in non-legacy mode (`legacySizeOfNull = false`): null
  *     subject → null on both sides. Legacy `size` returns −1 for null,
  *     which CountMatches does not reproduce, so legacy plans are left
  *     untouched;
  *   - the subject is the DEFAULT-collation string type — a collated
  *     string could give its regexp operators different matching
  *     semantics, which the fused plain-`Pattern` loop would not
  *     reproduce.
  */
object RewriteCountMatches extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(rea: RegExpExtractAll, false)
          if rea.regexp.foldable && rea.idx.foldable &&
             rea.idx.eval() == 0 && rea.regexp.eval() != null &&
             rea.subject.dataType == StringType =>
        CountMatches(rea.subject, rea.regexp)
    }
}
