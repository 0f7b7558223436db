package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rewrite: a pure temporal-proximity join
  *
  *   L JOIN R ON abs(L.t - R.t) <= radius        -- no equi conjunct
  *
  * has no equi-join key, so Spark plans BroadcastNestedLoopJoin —
  * O(|L|·|R|) comparisons on a single task when neither side fits in
  * memory, the classic cluster-killer. This rule rewrites the logical
  * plan into the binned form (operators/RangeJoin's algebra, applied
  * automatically):
  *
  *   bin(t) = floor(t / radius); |lt − rt| <= radius  ⇒
  *   bin(lt) ∈ {bin(rt)−1, bin(rt), bin(rt)+1}
  *
  * so R explodes to its three candidate bins and the join becomes an
  * EQUI-join on the bin value with the original predicate kept as the
  * exact residual filter — same rows, shuffle-partitionable plan.
  *
  * Fires only when: inner join, the condition's conjuncts contain NO
  * equi pair (Spark handles those fine), and exactly one conjunct of
  * shape `abs(a − b) <= positive INTEGRAL literal` with `a`/`b` each
  * bound to one side and of INTEGRAL type (epoch seconds — cast
  * timestamps upstream, the RangeJoin contract). Binning runs in exact
  * 64-bit arithmetic (floorDiv via pmod — no double cast), because a
  * float bin of an epoch-nanos-scale long (≫2^53) rounds by hundreds
  * of units and would silently drop matching pairs across a bin edge;
  * fractional radii / floating-point operands are left to Spark's own
  * plan rather than rewritten unsafely. The rewritten join's top-level
  * condition gains an equi conjunct, so the rule cannot re-fire on its
  * own output (fixed-point safe).
  *
  * Wire-up: `spark.experimental.extraOptimizations ++= Seq(BinnedIntervalJoin)`
  * or session-wide via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object BinnedIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def oneSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def integralValue(l: Literal): Option[Long] = l.value match {
    case n: java.lang.Long => Some(n.longValue())
    case n: java.lang.Integer => Some(n.longValue())
    case n: java.lang.Short => Some(n.longValue())
    case n: java.lang.Byte => Some(n.longValue())
    case _ => None
  }

  /** (leftTs, rightTs, radius) when the conjunct is an exactly-binnable
    * proximity bound: integral operands, integral positive radius. */
  private def proximity(conjunct: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[(Expression, Expression, Long)] =
    conjunct match {
      case LessThanOrEqual(abs: Abs, lit: Literal) =>
        (abs.child, integralValue(lit)) match {
          case (sub: Subtract, Some(r)) if r > 0 && isIntegral(sub.left) && isIntegral(sub.right) =>
            val (a, b) = (sub.left, sub.right)
            if (oneSide(a, left) && oneSide(b, right)) Some((a, b, r))
            else if (oneSide(a, right) && oneSide(b, left)) Some((b, a, r))
            else None
          case _ => None
        }
      case _ => None
    }

  private def isEquiPair(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = e match {
    case EqualTo(a, b) =>
      (oneSide(a, left) && oneSide(b, right)) || (oneSide(a, right) && oneSide(b, left))
    case EqualNullSafe(a, b) =>
      (oneSide(a, left) && oneSide(b, right)) || (oneSide(a, right) && oneSide(b, left))
    case _ => false
  }

  /** Exact floorDiv(ts, radius) in 64-bit: (t − pmod(t, r)) div r. The
    * numerator is an exact multiple of r, so truncating division IS
    * floor division — no float rounding at any timestamp magnitude. */
  private def binOf(ts: Expression, radius: Long): Expression = {
    val t = Cast(ts, LongType)
    val r = Literal(radius, LongType)
    IntegralDivide(Subtract(t, Pmod(t, r)), r)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists(isEquiPair(_, left, right))
      val prox = if (hasEqui) None
        else conjuncts.iterator.flatMap(proximity(_, left, right)).toSeq.headOption
      prox match {
        case None => j
        case Some((lts, rts, radius)) =>
          val lBin = Alias(binOf(lts, radius), "__lbin")()
          val lProj = Project(left.output :+ lBin, left)
          val rBin0 = binOf(rts, radius)
          val candidates = CreateArray(Seq(
            Subtract(rBin0, Literal(1L)), rBin0, Add(rBin0, Literal(1L))))
          val rBinAttr = AttributeReference("__rbin", LongType)()
          val rGen = Generate(Explode(candidates), unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(rBinAttr), child = right)
          val newCond = And(EqualTo(lBin.toAttribute, rBinAttr), cond)
          // restore the original output: the bin columns are plan-internal
          Project(j.output, Join(lProj, rGen, Inner, Some(newCond), hint))
      }
  }
}
