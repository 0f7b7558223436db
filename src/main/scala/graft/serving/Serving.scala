package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Decisions
import graft.functions.Decisions.Thresholds

/** The serving layer: per-minute counters → rolling 30-minute metrics →
  * flags → decision, re-expressed from the reference's Trino views
  * `v_rt_video_metrics_30m_1m` / `v_rt_video_decision_context_30m_1m`
  * (rt_video_metrics_serving.sql:8-158) over the testdata `events`
  * stream analog (key = user_id, enum = event_type).
  *
  * Plan shape at scale: one shuffle on (key, minute) for the counter
  * aggregation (partial+final), one shuffle on key for the rolling
  * window — nothing else. The decision stage is pure projection
  * (whole-stage codegen). The thresholds are a broadcast 1-row cross
  * join in the reference; here they are compile-time literals folded
  * by Catalyst — both avoid any scan-side work.
  */
object Serving {

  /** 1-minute grain conditional-count pivot (reference gold
    * rt_video_stats_1min, A1). */
  def perMinuteCounters(events: DataFrame, key: String = "user_id"): DataFrame = {
    val aggs = graft.functions.EventCounters.typeCounts :+ sum(col("value")).as("value_sum")
    events
      .groupBy(col(key), date_trunc("minute", col("ts")).as("minute"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Rolling 30-minute counters: RANGE-interval frame over event time
    * (reference A2/W3; DataFrame form = epoch-cast rangeBetween). */
  def rolling30m(perMinute: DataFrame, key: String = "user_id"): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col("minute").cast("long"))
      .rangeBetween(-29L * 60, 0)
    perMinute.select(
      col(key), col("minute"),
      sum(col("views")).over(w).as("views_30m"),
      sum(col("clicks")).over(w).as("clicks_30m"),
      sum(col("purchases")).over(w).as("purchases_30m"),
      sum(col("errors")).over(w).as("errors_30m"))
  }

  /** Metrics + flags + decision — the decision-context view (D1-D3). */
  def decisionContext(rolling: DataFrame, th: Thresholds): DataFrame = {
    val vel = Decisions.velocityExpr(col("views_30m"), col("clicks_30m"), col("purchases_30m"))
    val compl = Decisions.completionExpr(col("clicks_30m"), col("purchases_30m"))
    val skip = Decisions.skipRateExpr(col("clicks_30m"), col("errors_30m"))
    val withMetrics = rolling
      .withColumn("velocity_30m", vel)
      .withColumn("completion_rate_30m", compl)
      .withColumn("skip_rate_30m", skip)
    withMetrics
      .withColumn("candidate_flag",
        Decisions.candidateExpr(col("velocity_30m"), col("views_30m"), th))
      .withColumn("quality_gate_pass",
        Decisions.qualityGateExpr(col("completion_rate_30m"), col("skip_rate_30m"), col("clicks_30m"), th))
      .withColumn("under_exposed_flag",
        Decisions.underExposedExpr(col("views_30m"), col("clicks_30m"), col("purchases_30m"), th))
      .withColumn("decision_type_preview",
        Decisions.decisionExpr(col("candidate_flag"), col("quality_gate_pass"), col("under_exposed_flag")))
  }

  /** Full pipeline from raw events. */
  def decisionContextFromEvents(events: DataFrame, th: Thresholds = Thresholds(),
                                key: String = "user_id"): DataFrame =
    decisionContext(rolling30m(perMinuteCounters(events, key), key), th)

  /** Action-queue candidate rows: NO_ACTION suppressed (D4), priority/TTL
    * maps + deterministic sha-256 action ids (D5). */
  def actionQueue(context: DataFrame, ruleVersion: String): DataFrame =
    context
      .filter(col("decision_type_preview") =!= Decisions.NoAction)
      .select(
        col("user_id"), col("minute"),
        col("decision_type_preview").as("decision"),
        Decisions.priorityExpr(col("decision_type_preview")).as("priority"),
        Decisions.ttlMinutesExpr(col("decision_type_preview")).as("ttl_minutes"),
        Decisions.actionIdExpr(
          col("user_id"),
          date_format(col("minute"), "yyyy-MM-dd HH:mm:ss"),
          col("decision_type_preview"),
          lit(ruleVersion)).as("action_id"))

  /** Full queue-row shape (reference action-queue-contract: 11 core
    * fields incl. reason_codes ARRAY and TTL-derived expiry) — composes
    * with QueueValidation.split for the typed D6 reject path. */
  def actionQueueRows(context: DataFrame, ruleVersion: String, key: String = "user_id"): DataFrame =
    context
      .filter(col("decision_type_preview") =!= Decisions.NoAction)
      .withColumn("reason_codes", array_compact(array(
        when(col("candidate_flag"), "VELOCITY_GE_P90"),
        when(col("quality_gate_pass"), "QUALITY_GATE_PASS"),
        when(col("under_exposed_flag"), "UNDER_EXPOSED"))))
      .withColumn("decided_at", current_timestamp())
      .select(
        Decisions.actionIdExpr(
          col(key), date_format(col("minute"), "yyyy-MM-dd HH:mm:ss"),
          col("decision_type_preview"), lit(ruleVersion)).as("action_id"),
        col(key).cast("string").as("video_id"),
        col("minute").as("window_start"),
        (col("minute") + expr("INTERVAL 1 MINUTE")).as("window_end"),
        col("decision_type_preview").as("decision_type"),
        Decisions.priorityExpr(col("decision_type_preview")).as("priority"),
        Decisions.ttlMinutesExpr(col("decision_type_preview")).as("ttl_minutes"),
        lit(ruleVersion).as("rule_version"),
        col("reason_codes"),
        col("decided_at"),
        (col("decided_at") + Decisions.ttlMinutesExpr(col("decision_type_preview"))
          * expr("INTERVAL 1 MINUTE")).as("expires_at"))

  /** Register the serving surface as SQL views (reference S12). The
    * context view carries `rule_version` (reference traceability
    * contract: every served decision names the rule generation that
    * produced it). */
  def registerViews(spark: SparkSession, events: DataFrame, th: Thresholds = Thresholds()): Unit = {
    perMinuteCounters(events).createOrReplaceTempView("v_stats_1min")
    decisionContextFromEvents(events, th)
      .withColumn("rule_version", lit(th.ruleVersion))
      .createOrReplaceTempView("v_decision_context_30m_1m")
  }
}
