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

  /** Full 18-column queue write row (reference
    * action-queue-contract.md:19-38, rt_action_queue_producer.py:103-124,
    * 171-204) — composes with QueueValidation.split for the typed D6
    * reject path.
    *
    * `decided_at` is the window close (`window_end`), NOT
    * current_timestamp: the decision is a pure function of the closed
    * window, so the row — action_id fingerprint included — is
    * deterministic and replay-safe (a reprocessed batch emits an
    * identical row, which the MERGE-upsert sink then collapses; a
    * wall-clock stamp would fork action ids on every replay).
    * created_at/updated_at/state_updated_at start at decided_at on the
    * producer side (rt_action_queue_producer.py:199-201; downstream
    * state transitions move them). */
  def actionQueueRows(context: DataFrame, ruleVersion: String, key: String = "user_id"): DataFrame = {
    val decision = col("decision_type_preview")
    val windowStart = col("minute")
    val windowEnd = col("minute") + expr("INTERVAL 1 MINUTE")
    val decidedAt = windowEnd
    context
      .filter(decision =!= Decisions.NoAction)
      .select(
        // fingerprint field order mirrors the reference
        // (rt_action_queue_producer.py:162-168): video|ws|we|decision|rule|decided_at
        Decisions.actionIdExpr(
          col(key).cast("string"),
          date_format(windowStart, "yyyy-MM-dd HH:mm:ss"),
          date_format(windowEnd, "yyyy-MM-dd HH:mm:ss"),
          decision, lit(ruleVersion),
          date_format(decidedAt, "yyyy-MM-dd HH:mm:ss")).as("action_id"),
        col(key).cast("string").as("video_id"),
        decision.as("decision_type"),
        Decisions.priorityExpr(decision).as("priority"),
        lit(Decisions.InitialState).as("state"),
        decidedAt.as("decided_at"),
        windowStart.as("window_start"),
        windowEnd.as("window_end"),
        (decidedAt + Decisions.ttlMinutesExpr(decision) * expr("INTERVAL 1 MINUTE")).as("expires_at"),
        lit(ruleVersion).as("rule_version"),
        col("velocity_30m"),
        col("completion_rate_30m"),
        col("skip_rate_30m"),
        col("views_30m").as("impressions_30m"),
        Decisions.reasonCodesExpr(decision).as("reason_codes"),
        decidedAt.as("created_at"),
        decidedAt.as("updated_at"),
        decidedAt.as("state_updated_at"))
  }

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
