package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite an inequality-only interval join into a binned
  * equi-join — the [[graft.ops.Temporal.rangeJoin]] plan, applied
  * AUTOMATICALLY to any user query of the shape
  *
  * {{{ left JOIN right ON r.ts >= l.start AND r.ts < l.end }}}
  *
  * Without an equality conjunct Spark has no hash/sort-merge key and falls
  * back to BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, the plan that
  * does not survive 100 TB. This rule adds one: intervals explode to the
  * `binWidth`-wide time bins they span (`explode(sequence(s div W, (e-1)
  * div W))`), points hash to `ts div W`, the join keys on the bin, and the
  * ORIGINAL predicate stays as the exact residual filter — same rows,
  * hash-partitionable plan, cost O(|L|·span/W + |R| + matches).
  *
  * Scope guards (correctness first): fires only on INNER joins whose
  * condition has NO equality conjunct (those already hash-join), exactly
  * one `point >= lower` / `point < upper` pair over LongType expressions
  * (the engine's epoch-nanos convention), point strictly from one side
  * and both bounds strictly from the other, all deterministic. Extra
  * conjuncts ride along in the residual. The rewritten join contains an
  * equality conjunct, so the rule cannot re-fire on its own output.
  *
  * `binWidth` comes from `spark.graft.rangejoin.binwidth` (same unit as
  * the operands; set it near the typical interval span). Unset → rule is
  * inert, plans are untouched — opt-in, like every layout decision.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangejoin.binwidth"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** (point, lower) for `point >= lower` in either spelling. */
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case LessThanOrEqual(lo, p) => Some((p, lo))
    case _ => None
  }

  /** (point, upper) for `point < upper` in either spelling. */
  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(p, hi) => Some((p, hi))
    case GreaterThan(hi, p) => Some((p, hi))
    case _ => None
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && e.dataType == LongType

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthOpt =
      try Option(conf.getConfString(ConfKey, null)).map(_.toLong)
      catch { case _: NumberFormatException => None }
    widthOpt match {
      case None => plan
      case Some(w) if w <= 0 => plan
      case Some(w) => plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if !splitConjuncts(cond).exists(_.isInstanceOf[EqualTo]) =>
          rewrite(j, left, right, cond, hint, w).getOrElse(j)
      }
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    val lowers = conjuncts.flatMap(c => asLower(c).map(c -> _))
    val uppers = conjuncts.flatMap(c => asUpper(c).map(c -> _))
    (lowers, uppers) match {
      case (Seq((_, (p1, lo))), Seq((_, (p2, hi)))) if p1.semanticEquals(p2) =>
        // orient: which side holds the point?
        val oriented =
          if (refsOnly(p1, right) && refsOnly(lo, left) && refsOnly(hi, left))
            Some((left, right, p1, lo, hi, false))
          else if (refsOnly(p1, left) && refsOnly(lo, right) && refsOnly(hi, right))
            Some((right, left, p1, lo, hi, true))
          else None
        oriented.map { case (ivSide, ptSide, p, lo, hi, swapped) =>
          val width = Literal(w, LongType)
          val one = Literal(1L, LongType)
          // intervals explode to every bin in [lo div W, (hi-1) div W]
          // Sequence is TimeZoneAwareExpression: without an explicit zone
          // it reports unresolved and fails post-optimizer plan validation.
          // No explicit step: an EMPTY interval (lo == hi) yields start >
          // stop, which errors under step=1 but walks backwards under the
          // inferred step — producing two phantom bins the exact residual
          // then rejects (same treatment as ops.Temporal.rangeJoin).
          // The stop is CLAMPED to start−1 so a malformed INVERTED
          // interval (hi ≪ lo) also degrades to those same two rejected
          // phantom bins — without the clamp the inferred step walked
          // backwards through every intervening bin (a hi=0/lo=10^12 row
          // tried to generate ~10^9 elements and failed the query that
          // the un-rewritten BNLJ plan simply answered with no matches).
          val start = IntegralDivide(lo, width)
          val stop = Greatest(Seq(
            IntegralDivide(Subtract(hi, one), width),
            Subtract(start, one)))
          val seq = Sequence(start, stop,
            None, Some(conf.sessionLocalTimeZone))
          val binL = AttributeReference("__graft_bin_l", LongType)()
          val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(binL), child = ivSide)
          // points hash to their single bin
          val binRAlias = Alias(IntegralDivide(p, width), "__graft_bin_r")()
          val proj = Project(ptSide.output :+ binRAlias, ptSide)
          val newCond = And(EqualTo(binL, binRAlias.toAttribute), cond)
          val (nl, nr) = if (swapped) (proj, gen) else (gen, proj)
          Project((left.output ++ right.output).toSeq,
            Join(nl, nr, Inner, Some(newCond), hint))
        }
      case _ => None
    }
  }
}
