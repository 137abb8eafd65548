package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Set-similarity length prefilter, as an optimizer rule.
  *
  * For sorted-set Jaccard, `J(a,b) >= t` implies
  * `|a| >= t*|b| && |b| >= t*|a|` (from `i <= min` and
  * `J = i/(|a|+|b|-i)`), so a threshold comparison over
  * [[SortedJaccardExpr]] can be guarded by an O(1) size check that skips
  * the O(|a|+|b|) merge for pairs whose sizes already rule them out — the
  * classic length filter of the set-similarity-join literature (e.g.
  * Vernica/Carey/Li's SSJoin-on-MapReduce family). At 100 TB candidate
  * volumes the guard, not the merge, touches most pairs.
  *
  * Handles the bare form `sorted_jaccard(a,b) >= t` and the rounded form
  * `round(sorted_jaccard(a,b), s) >= t` (threshold relaxed by the
  * half-ulp of the rounding scale). Conditions that already carry a
  * size guard are left alone, which makes the rule idempotent under the
  * optimizer's fixed-point batch.
  */
object JaccardLengthPruning extends Rule[LogicalPlan] {

  private def asDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case d: java.math.BigDecimal => Some(d.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  /** (a, b, effective threshold) when `e` is a guardable comparison. */
  private def guardable(e: Expression): Option[(Expression, Expression, Double)] =
    e match {
      case GreaterThanOrEqual(SortedJaccardExpr(a, b), Literal(v, _)) =>
        asDouble(v).map((a, b, _))
      case GreaterThan(SortedJaccardExpr(a, b), Literal(v, _)) =>
        asDouble(v).map((a, b, _))
      case GreaterThanOrEqual(r: Round, Literal(v, _)) => roundedBound(r, v)
      case GreaterThan(r: Round, Literal(v, _)) => roundedBound(r, v)
      case _ => None
    }

  private def roundedBound(r: Round, v: Any)
      : Option[(Expression, Expression, Double)] =
    (r.child, r.scale) match {
      case (SortedJaccardExpr(a, b), Literal(s: Int, IntegerType)) =>
        asDouble(v).map(t => (a, b, t - 0.5 * math.pow(10, -s)))
      case _ => None
    }

  private def sizeOf(arr: Expression): Expression =
    Cast(Size(arr, legacySizeOfNull = false), DoubleType)

  private def guard(a: Expression, b: Expression, t: Double): Expression = {
    val tl = Literal(t, DoubleType)
    And(
      GreaterThanOrEqual(sizeOf(a), Multiply(tl, sizeOf(b))),
      GreaterThanOrEqual(sizeOf(b), Multiply(tl, sizeOf(a))))
  }

  /** Marker for "already guarded": the distinctive shape
    * `Multiply(Literal, Cast(Size(_), _))` only this rule produces. */
  private def alreadyGuarded(cond: Expression): Boolean =
    cond.exists {
      case Multiply(_: Literal, Cast(_: Size, DoubleType, _, _), _) => true
      case _ => false
    }

  private def rewrite(cond: Expression): Expression =
    cond.transformUp {
      case e if guardable(e).isDefined =>
        val (a, b, t) = guardable(e).get
        And(guard(a, b, t), e)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _)
        if cond.exists(_.isInstanceOf[SortedJaccardExpr]) &&
          !alreadyGuarded(cond) =>
      f.copy(condition = rewrite(cond))
    case j @ Join(_, _, _, Some(cond), _)
        if cond.exists(_.isInstanceOf[SortedJaccardExpr]) &&
          !alreadyGuarded(cond) =>
      j.copy(condition = Some(rewrite(cond)))
  }
}
