package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.types.TimestampType

/** Serving-layer guardrails as a Catalyst check rule (the survey §4
  * stretch: the reference enforces these only as prose in its serving
  * contract — "dashboard queries must carry bounded metric_minute
  * filters", "no fact-to-fact read-time joins" — here they are machine-
  * checked at analysis time for every query in a guarded session).
  *
  * Violations throw before execution, so an unbounded dashboard scan
  * never reaches the cluster.
  */
/** Thrown at analysis time for serving-contract violations. */
class GuardrailViolation(msg: String) extends RuntimeException(msg)

object ServingGuardrails {

  /** Views covered by the guardrail (the serving surface). */
  val ServingViewPrefix = "v_"

  private def servingAliases(plan: LogicalPlan): Seq[SubqueryAlias] =
    plan.collect { case s: SubqueryAlias if s.alias.startsWith(ServingViewPrefix) => s }

  /** A time bound counts for a serving view only if the compared
    * timestamp attribute comes from THAT view's output — a predicate on
    * some other table in the query must not satisfy the guardrail for
    * an unbounded serving scan. */
  private def hasTimeBoundFor(plan: LogicalPlan, serving: SubqueryAlias): Boolean = {
    val servingAttrs = serving.outputSet
    plan.collect { case f: Filter => f }.exists { f =>
      f.condition.exists {
        case cmp: BinaryComparison =>
          cmp.children.exists(_.exists {
            case a: Attribute => a.dataType == TimestampType && servingAttrs.contains(a)
            case _ => false
          })
        case _ => false
      }
    }
  }

  /** The sanctioned anchor pattern: a serving-view read consumed solely
    * by a grouping-free (scalar) aggregate — `SELECT max(minute) FROM
    * v_x` — is exempt from the time-bound rule; it reads one value, not
    * the table. */
  private def isScalarAnchorLeg(plan: LogicalPlan, s: SubqueryAlias): Boolean =
    plan.collect { case a: Aggregate if a.groupingExpressions.isEmpty => a }
      .exists(_.exists(_ eq s))

  def check(plan: LogicalPlan): Unit = {
    val serving = servingAliases(plan)
    if (serving.isEmpty) return

    // no fact-to-fact joins between serving views at read time (checked
    // FIRST: a cross-view join should error as a join, not as a missing
    // bound on one of its legs)
    plan.foreach {
      case j: Join =>
        val l = servingAliases(j.left).map(_.alias).distinct
        val r = servingAliases(j.right).map(_.alias).distinct
        // the anchor pattern (scalar-aggregate cross join of the SAME
        // view) is allowed; joining two different serving views is not.
        if (l.nonEmpty && r.nonEmpty && (l.toSet != r.toSet))
          throw new GuardrailViolation(
            s"serving guardrail: read-time join between serving views ${(l ++ r).distinct.mkString(", ")} is not allowed")
      case _ => ()
    }

    serving
      .filterNot(isScalarAnchorLeg(plan, _))
      .filterNot(hasTimeBoundFor(plan, _)) match {
      case Seq() => ()
      case unbounded =>
        throw new GuardrailViolation(
          s"serving guardrail: query over ${unbounded.map(_.alias).distinct.mkString(", ")} " +
            "has no event-time bound on that view's own columns; dashboard queries must filter on a bounded time range")
    }
  }
}

/** Session extension wiring:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectCheckRule(_ => ServingGuardrails.check)
    e.injectOptimizerRule(_ => BinnedIntervalJoin)
  }
}
