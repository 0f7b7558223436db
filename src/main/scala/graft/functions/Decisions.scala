package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decision semantics re-expressed from the reference
  * (rt_action_decisioning.py:23-91, rt_video_metrics_serving.sql:106-154,
  * metric-contract.md:20-53), dual-implemented as:
  *  - Column expressions (Catalyst-optimizable, codegen'd — the hot path), and
  *  - pure functions over case classes (driver-free property tests assert the
  *    two agree; mirrors the reference's Python/SQL dual implementation).
  *
  * Semantics preserved exactly from the reference pattern:
  *  - denominator floors (`greatest(x, floor)`) so cold keys don't explode rates;
  *  - `coalesce(flag, false)` null semantics on candidate/under-exposed;
  *  - decision precedence BOOST > REVIEW > RESCUE > NO_ACTION;
  *  - NO_ACTION is never persisted to the queue (suppression filter).
  */
object Decisions {

  /** Threshold registry row (reference dims.rt_rule_quantile_baselines —
    * published constants, not recomputed at read time). */
  final case class Thresholds(
      ruleVersion: String = "graft_rules_v1",
      velocityP90: Double = 0.6,
      viewsP40: Long = 0L,
      minViews: Long = 1L,
      minCompletion: Double = 0.5,
      maxSkip: Double = 0.5,
      minClicks: Long = 1L)

  /** Rolling 30-minute counters for one key+minute (the serving grain). */
  final case class Rolling30m(views: Long, clicks: Long, purchases: Long, errors: Long)

  final case class Flags(candidate: Boolean, qualityGatePass: Boolean, underExposed: Boolean)

  // ---- metric formulas (D1) ------------------------------------------------

  /** velocity = (clicks + 5*purchases) / max(views, 5) — engagement-velocity
    * analog of the reference's (likes + 5*shares)/GREATEST(impressions,100). */
  def velocityExpr(views: Column, clicks: Column, purchases: Column): Column =
    (clicks + lit(5.0) * purchases) / greatest(views, lit(5L))

  def completionExpr(clicks: Column, purchases: Column): Column =
    purchases.cast("double") / greatest(clicks, lit(1L))

  def skipRateExpr(clicks: Column, errors: Column): Column =
    errors.cast("double") / greatest(clicks, lit(1L))

  def velocity(r: Rolling30m): Double = (r.clicks + 5.0 * r.purchases) / math.max(r.views, 5L)
  def completion(r: Rolling30m): Double = r.purchases.toDouble / math.max(r.clicks, 1L)
  def skipRate(r: Rolling30m): Double = r.errors.toDouble / math.max(r.clicks, 1L)

  // ---- flag derivation (D2) ------------------------------------------------

  def candidateExpr(velocity: Column, views: Column, th: Thresholds): Column =
    coalesce(velocity >= lit(th.velocityP90) && views >= lit(th.minViews), lit(false))

  def qualityGateExpr(completion: Column, skip: Column, clicks: Column, th: Thresholds): Column =
    completion >= lit(th.minCompletion) && skip <= lit(th.maxSkip) && clicks >= lit(th.minClicks)

  def underExposedExpr(views: Column, clicks: Column, purchases: Column, th: Thresholds): Column =
    // coalesce wraps the WHOLE conjunction: null clicks/purchases must
    // yield false (the documented flag contract and the Scala twin's
    // behavior), not a null flag
    coalesce(views <= lit(th.viewsP40) && (clicks + purchases) >= lit(1L), lit(false))

  def flags(r: Rolling30m, th: Thresholds): Flags = Flags(
    candidate = velocity(r) >= th.velocityP90 && r.views >= th.minViews,
    qualityGatePass = completion(r) >= th.minCompletion && skipRate(r) <= th.maxSkip && r.clicks >= th.minClicks,
    underExposed = r.views <= th.viewsP40 && (r.clicks + r.purchases) >= 1L)

  // ---- decision precedence (D3) -------------------------------------------

  val Boost = "BOOST"
  val Review = "REVIEW"
  val Rescue = "RESCUE"
  val NoAction = "NO_ACTION"
  val AllDecisions: Seq[String] = Seq(Boost, Review, Rescue, NoAction)

  def decisionExpr(candidate: Column, qualityGatePass: Column, underExposed: Column): Column =
    when(candidate && qualityGatePass, Boost)
      .when(candidate, Review)
      .when(underExposed, Rescue)
      .otherwise(NoAction)

  def decide(f: Flags): String =
    if (f.candidate && f.qualityGatePass) Boost
    else if (f.candidate) Review
    else if (f.underExposed) Rescue
    else NoAction

  def decide(r: Rolling30m, th: Thresholds): String = decide(flags(r, th))

  // ---- queue row building (D4/D5) -----------------------------------------

  /** Priority map: RESCUE most urgent (reference rt_action_queue_producer.py:53-93). */
  def priorityExpr(decision: Column): Column =
    when(decision === Rescue, 1).when(decision === Review, 2).when(decision === Boost, 3)

  /** TTL minutes per decision (BOOST 15 / REVIEW 30 / RESCUE 30). */
  def ttlMinutesExpr(decision: Column): Column =
    when(decision === Boost, 15).when(decision === Review, 30).when(decision === Rescue, 30)

  /** Deterministic action id = sha256 over pipe-joined identity fields
    * (reference action_id=sha256(video|ws|we|decision|rule|decided_at)). */
  def actionIdExpr(parts: Column*): Column = sha2(concat_ws("|", parts: _*), 256)

  /** Producer initial state + full state domain
    * (reference action-queue-contract.md:25,66; rt_action_queue_producer.py:59-61). */
  val InitialState = "PENDING"
  val StateDomain: Seq[String] = Seq("PENDING", "ACKED", "DONE", "EXPIRED", "HOLD")

  /** Static reason-code set per decision type
    * (reference rt_action_queue_producer.py:53-57). */
  def reasonCodesExpr(decision: Column): Column =
    when(decision === Boost, array(lit("HIGH_VELOCITY_P90"), lit("GATE_PASS")))
      .when(decision === Review, array(lit("HIGH_VELOCITY_P90"), lit("LOW_COMPLETION"), lit("HIGH_SKIP")))
      .when(decision === Rescue, array(lit("NEW_UPLOAD_LT_60M"), lit("UNDER_EXPOSED_P40"), lit("GATE_PASS")))
}
