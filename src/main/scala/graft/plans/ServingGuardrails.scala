package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, SubqueryAlias}
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

  private def hasTimeBound(plan: LogicalPlan): Boolean =
    plan.collect { case f: Filter => f }.exists { f =>
      f.condition.exists {
        case cmp: BinaryComparison =>
          cmp.children.exists(_.exists {
            case a: Attribute => a.dataType == TimestampType
            case _ => false
          })
        case _ => false
      }
    }

  def check(plan: LogicalPlan): Unit = {
    val serving = servingAliases(plan)
    if (serving.isEmpty) return

    if (!hasTimeBound(plan))
      throw new GuardrailViolation(
        s"serving guardrail: query over ${serving.map(_.alias).distinct.mkString(", ")} " +
          "has no event-time bound; dashboard queries must filter on a bounded time range")

    // no fact-to-fact joins between serving views at read time
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
  }
}

/** Session extension wiring:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectCheckRule(_ => ServingGuardrails.check)
  }
}
