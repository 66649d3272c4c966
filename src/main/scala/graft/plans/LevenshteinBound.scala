package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: strengthen edit-distance threshold predicates with
  * the free length bound. `levenshtein(a,b) >= |length(a)-length(b)|`
  * always, so
  *
  *   levenshtein(a, b) <= k   ⇒   abs(length(a) - length(b)) <= k
  *
  * and the implied conjunct is added ahead of the original predicate.
  * The bound is O(1) per row while the DP is O(|a|·|b|): in a filter
  * it short-circuits the conjunction; in a join condition it gives the
  * optimizer a cheap reorderable predicate that rejects most candidate
  * pairs before the distance computation runs — the standard length
  * pre-filter of the fuzzy-join literature, applied automatically so
  * query authors don't have to remember it.
  *
  * Idempotent by construction (required: user-provided rules run to
  * fixpoint): the conjunct is only added when no semantically-equal
  * conjunct is already present.
  *
  * Install: `spark.experimental.extraOptimizations ++= Seq(LevenshteinBound)`
  * or config-based via `spark.sql.extensions=graft.GraftExtensions`.
  */
object LevenshteinBound extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def lengthGap(a: Expression, b: Expression): Expression =
    Abs(Subtract(Length(a), Length(b)))

  /** The implied length-bound predicate for an edit-distance
    * comparison, if `p` is one. Only thresholdless levenshtein
    * (threshold=None) is rewritten: the 3-arg form already caps its
    * own work internally. */
  private def boundOf(p: Expression): Option[Expression] = p match {
    case LessThanOrEqual(Levenshtein(a, b, None), k) =>
      Some(LessThanOrEqual(lengthGap(a, b), k))
    case LessThan(Levenshtein(a, b, None), k) =>
      Some(LessThan(lengthGap(a, b), k))
    case GreaterThanOrEqual(k, Levenshtein(a, b, None)) =>
      Some(GreaterThanOrEqual(k, lengthGap(a, b)))
    case GreaterThan(k, Levenshtein(a, b, None)) =>
      Some(GreaterThan(k, lengthGap(a, b)))
    case _ => None
  }

  private def strengthen(cond: Expression): Expression = {
    val cs = conjuncts(cond)
    val additions = cs.flatMap(boundOf)
      .filterNot(b => cs.exists(_.semanticEquals(b)))
    if (additions.isEmpty) cond else (additions ++ cs).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val s = strengthen(cond)
      if (s fastEquals cond) f else f.copy(condition = s)
    case j: Join if j.condition.isDefined =>
      val s = strengthen(j.condition.get)
      if (s fastEquals j.condition.get) j else j.copy(condition = Some(s))
  }
}
