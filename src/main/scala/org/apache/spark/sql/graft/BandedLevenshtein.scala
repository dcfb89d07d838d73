package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite threshold comparisons on the UNBOUNDED
  * levenshtein into Spark's banded variant, which computes only a
  * 2d+1-wide diagonal band of the DP matrix — O(d·n) instead of O(n·m)
  * per pair. Users (and generated SQL) naturally write
  * `levenshtein(a, b) <= d`; without this rule that form pays the full
  * quadratic cost even though the answer is only ever compared against
  * d. [[graft.operators.Dedup.editDistancePairs]] calls the banded form
  * directly — this rule gives ad-hoc SQL the same plan.
  *
  * Rewrites (d a non-negative foldable literal; banded levenshtein
  * returns the distance when <= threshold and -1 otherwise, and NULL on
  * NULL input exactly like the unbounded form, so each pair below is
  * equivalent row-for-row including NULL semantics):
  *
  *   levenshtein(a,b) <= d   ==>  levenshtein(a,b,d)   >= 0
  *   levenshtein(a,b) <  d   ==>  levenshtein(a,b,d-1) >= 0   (d >= 1)
  *   d >= levenshtein(a,b)   ==>  levenshtein(a,b,d)   >= 0
  *   d >  levenshtein(a,b)   ==>  levenshtein(a,b,d-1) >= 0   (d >= 1)
  *
  * and the DISSIMILARITY duals (keep-different filters: dedup survivors,
  * adversarial-pair mining) — distance above the threshold is exactly
  * the banded form's -1 sentinel:
  *
  *   levenshtein(a,b) >= d   ==>  levenshtein(a,b,d-1) < 0    (d >= 1)
  *   levenshtein(a,b) >  d   ==>  levenshtein(a,b,d)   < 0    (d >= 0)
  *   d <= levenshtein(a,b)   ==>  levenshtein(a,b,d-1) < 0    (d >= 1)
  *   d <  levenshtein(a,b)   ==>  levenshtein(a,b,d)   < 0    (d >= 0)
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule) or the
  * running-session path ([[GraftFunctions.register]] adds it to
  * `spark.experimental.extraOptimizations`). */
object BandedLevenshtein extends Rule[LogicalPlan] {

  private def bound(lit: Literal): Option[Int] = lit match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v >= Int.MinValue && v <= Int.MaxValue =>
      Some(v.toInt)
    case _ => None
  }

  private def banded(l: Expression, r: Expression, d: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(d))), Literal(0))

  /** distance > d (or >= d+1): the banded form's -1 "over threshold"
    * sentinel IS the predicate; NULL input stays NULL through `< 0`. */
  private def bandedOver(l: Expression, r: Expression, d: Int): Expression =
    LessThan(Levenshtein(l, r, Some(Literal(d))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), lit: Literal)
        if bound(lit).exists(_ >= 0) =>
      banded(l, r, bound(lit).get)
    case LessThan(Levenshtein(l, r, None), lit: Literal)
        if bound(lit).exists(_ >= 1) =>
      banded(l, r, bound(lit).get - 1)
    case GreaterThanOrEqual(lit: Literal, Levenshtein(l, r, None))
        if bound(lit).exists(_ >= 0) =>
      banded(l, r, bound(lit).get)
    case GreaterThan(lit: Literal, Levenshtein(l, r, None))
        if bound(lit).exists(_ >= 1) =>
      banded(l, r, bound(lit).get - 1)
    // dissimilarity duals: keep-different filters
    case GreaterThanOrEqual(Levenshtein(l, r, None), lit: Literal)
        if bound(lit).exists(_ >= 1) =>
      bandedOver(l, r, bound(lit).get - 1)
    case GreaterThan(Levenshtein(l, r, None), lit: Literal)
        if bound(lit).exists(_ >= 0) =>
      bandedOver(l, r, bound(lit).get)
    case LessThanOrEqual(lit: Literal, Levenshtein(l, r, None))
        if bound(lit).exists(_ >= 1) =>
      bandedOver(l, r, bound(lit).get - 1)
    case LessThan(lit: Literal, Levenshtein(l, r, None))
        if bound(lit).exists(_ >= 0) =>
      bandedOver(l, r, bound(lit).get)
  }
}
