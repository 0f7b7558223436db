package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.serving.Serving

/** Dashboard / acceptance query surface (reference §2.8 + §3.3: the
  * metabase SQL pack and the Trino serving views executed as Spark SQL
  * — the engine-boundary the rebuild eliminates).
  *
  * The dashboard queries run through `spark.sql` over REGISTERED VIEWS
  * (S12): the serving layer is exercised as a SQL surface, not just a
  * DataFrame library. Dialect ports per P16: `date_diff`→epoch diff,
  * `COUNT_IF`→count_if, GREATEST/NULLIF unchanged.
  */
object Dashboards {

  private def ctxView(s: SparkSession, dir: String): Unit = {
    Serving.registerViews(s, Tables(s, dir, "events"))
  }

  /** A3/B7 analog: anchor CTE → 4-hour bound → latest row per key →
    * ORDER BY + LIMIT (every reference dashboard query's shape). */
  def latestPerVideo(s: SparkSession, dir: String): DataFrame = {
    ctxView(s, dir)
    s.sql(
      """WITH anchor AS (SELECT max(minute) AS anchor_minute FROM v_decision_context_30m_1m),
        |bounded AS (
        |  SELECT c.* FROM v_decision_context_30m_1m c CROSS JOIN anchor
        |  WHERE c.minute >= anchor.anchor_minute - INTERVAL 240 MINUTES),
        |ranked AS (
        |  SELECT user_id, minute, decision_type_preview,
        |    velocity_30m, views_30m,
        |    row_number() OVER (PARTITION BY user_id ORDER BY minute DESC) AS row_num
        |  FROM bounded)
        |SELECT user_id, minute, decision_type_preview,
        |  floor(velocity_30m * 10000 + 0.5) / 10000 AS velocity_30m, views_30m
        |FROM ranked WHERE row_num = 1
        |ORDER BY decision_type_preview, user_id
        |LIMIT 500""".stripMargin)
  }

  /** A5 analog: per-minute platform health averages over the last 30
    * minutes from the anchor. */
  def platformHealth(s: SparkSession, dir: String): DataFrame = {
    ctxView(s, dir)
    s.sql(
      """WITH anchor AS (SELECT max(minute) AS anchor_minute FROM v_decision_context_30m_1m)
        |SELECT minute,
        |  floor(avg(velocity_30m) * 10000 + 0.5) / 10000 AS avg_velocity,
        |  floor(avg(completion_rate_30m) * 10000 + 0.5) / 10000 AS avg_completion,
        |  floor(avg(skip_rate_30m) * 10000 + 0.5) / 10000 AS avg_skip,
        |  count(*) AS n_keys
        |FROM v_decision_context_30m_1m CROSS JOIN anchor
        |WHERE minute >= anchor_minute - INTERVAL 30 MINUTES
        |GROUP BY minute ORDER BY minute""".stripMargin)
  }

  /** D7: RT-vs-batch reconciliation — minute-level diff ratios with the
    * reference's formulas and thresholds (counts p95 ≤ 0.08 via
    * abs(rt−batch)/max(batch,100); rate p95 abs diff ≤ 0.03). The "rt"
    * leg models the validated stream (value filter as the quarantine
    * analog); "batch" is the full recompute. */
  def reconciliation(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val rt = e.filter(col("value") <= 195.0)
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("rt_n"),
        avg(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("rt_rate"))
    val batch = e
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("batch_n"),
        avg(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("batch_rate"))
    val joined = batch.join(rt, Seq("minute"), "left")
      .select(
        col("minute"),
        (abs(coalesce(col("rt_n"), lit(0L)) - col("batch_n")).cast("double") /
          greatest(col("batch_n"), lit(100L))).as("count_diff_ratio"),
        abs(coalesce(col("rt_rate"), lit(0.0)) - col("batch_rate")).as("rate_diff"))
    joined.agg(
      rd(expr("percentile(count_diff_ratio, 0.95)"), 6).as("count_p95"),
      rd(expr("percentile(rate_diff, 0.95)"), 6).as("rate_p95"),
      count(lit(1)).as("n_minutes"))
      .select(
        col("count_p95"), col("rate_p95"), col("n_minutes"),
        (col("count_p95") <= 0.08).as("counts_pass"),
        (col("rate_p95") <= 0.03).as("rates_pass"))
  }

  /** D8: sign-off gate battery — one labelled row per health gate. */
  def healthGates(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val k = get_json_object(col("props"), "$.k").cast("int")
    def gate(name: String, value: org.apache.spark.sql.Column, pass: org.apache.spark.sql.Column)
            (df: DataFrame): DataFrame =
      df.agg(value.as("value")).select(lit(name).as("gate"), rd(col("value"), 6).as("value"),
        pass.as("pass"))

    val invalidRate = gate("invalid_rate_le_20pct",
      sum(when(k > 80 || col("value") > 195.0, 1).otherwise(0)).cast("double") / count(lit(1)),
      col("value") <= 0.20)(e)
    val dupEvents = gate("event_id_unique",
      (count(lit(1)) - countDistinct(col("event_id"))).cast("double"),
      col("value") === 0.0)(e)
    val volume = gate("volume_ge_100",
      count(lit(1)).cast("double"), col("value") >= 100.0)(e)
    val freshness = gate("freshness_span_positive",
      (max(col("ts")).cast("long") - min(col("ts")).cast("long")).cast("double"),
      col("value") > 0.0)(e)
    invalidRate.unionByName(dupEvents).unionByName(volume).unionByName(freshness)
  }

  /** A10/B8 analog: decision distribution trend per minute over the
    * last 60 minutes from the anchor. */
  def decisionTrend(s: SparkSession, dir: String): DataFrame = {
    ctxView(s, dir)
    s.sql(
      """WITH anchor AS (SELECT max(minute) AS anchor_minute FROM v_decision_context_30m_1m)
        |SELECT minute, decision_type_preview, count(*) AS n
        |FROM v_decision_context_30m_1m CROSS JOIN anchor
        |WHERE minute >= anchor_minute - INTERVAL 60 MINUTES
        |GROUP BY minute, decision_type_preview
        |ORDER BY minute, decision_type_preview""".stripMargin)
  }

  /** A7/P16: COUNT_IF + NULLIF null-rate pack over the context view
    * (the reference's data-quality dashboard, metabase pack:274-337). */
  def nullRatePack(s: SparkSession, dir: String): DataFrame = {
    ctxView(s, dir)
    s.sql(
      """SELECT
        |  count(*) AS n_rows,
        |  count_if(velocity_30m IS NULL) AS velocity_nulls,
        |  count_if(completion_rate_30m IS NULL) AS completion_nulls,
        |  count_if(decision_type_preview IS NULL) AS decision_nulls,
        |  floor((count_if(views_30m = 0) / CAST(nullif(count(*), 0) AS DOUBLE))*1000000 + 0.5)/1000000 AS zero_view_rate
        |FROM v_decision_context_30m_1m""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dash_latest" -> latestPerVideo,
    "q_dash_health" -> platformHealth,
    "q_dash_decision_trend" -> decisionTrend,
    "q_dash_nullrate" -> nullRatePack,
    "q_reconciliation" -> reconciliation,
    "q_health_gates" -> healthGates,
  )

  val oracles: Map[String, String] = Map(
    "q_dash_latest" ->
      (Lakehouse.decisionContextCoreSql.replace("ctx_core AS (", "ctx_core AS (").stripSuffix(")") + """),
        |anchor AS (SELECT max(minute) AS anchor_minute FROM ctx_core),
        |bounded AS (
        |  SELECT c.* FROM ctx_core c CROSS JOIN anchor
        |  WHERE c.minute >= anchor.anchor_minute - INTERVAL '240' MINUTE),
        |ranked AS (
        |  SELECT user_id, minute, decision_type_preview, velocity_30m, views_30m,
        |    row_number() OVER (PARTITION BY user_id ORDER BY minute DESC) AS row_num
        |  FROM bounded)
        |SELECT user_id, minute, decision_type_preview,
        |  floor(velocity_30m * 10000 + 0.5) / 10000 AS velocity_30m, views_30m
        |FROM ranked WHERE row_num = 1
        |ORDER BY decision_type_preview, user_id
        |LIMIT 500""".stripMargin),
    "q_dash_health" ->
      (Lakehouse.decisionContextCoreSql.stripSuffix(")") + """),
        |anchor AS (SELECT max(minute) AS anchor_minute FROM ctx_core)
        |SELECT minute,
        |  floor(avg(velocity_30m) * 10000 + 0.5) / 10000 AS avg_velocity,
        |  floor(avg(completion_rate_30m) * 10000 + 0.5) / 10000 AS avg_completion,
        |  floor(avg(skip_rate_30m) * 10000 + 0.5) / 10000 AS avg_skip,
        |  count(*) AS n_keys
        |FROM ctx_core CROSS JOIN anchor
        |WHERE minute >= anchor_minute - INTERVAL '30' MINUTE
        |GROUP BY minute ORDER BY minute""".stripMargin),
    "q_dash_decision_trend" ->
      (Lakehouse.decisionContextCoreSql.stripSuffix(")") + """),
        |anchor AS (SELECT max(minute) AS anchor_minute FROM ctx_core)
        |SELECT minute, decision_type_preview, count(*) AS n
        |FROM ctx_core CROSS JOIN anchor
        |WHERE minute >= anchor_minute - INTERVAL '60' MINUTE
        |GROUP BY minute, decision_type_preview
        |ORDER BY minute, decision_type_preview""".stripMargin),
    "q_dash_nullrate" ->
      (Lakehouse.decisionContextCoreSql + """
        |SELECT
        |  count(*) AS n_rows,
        |  count(*) FILTER (WHERE velocity_30m IS NULL) AS velocity_nulls,
        |  count(*) FILTER (WHERE completion_rate_30m IS NULL) AS completion_nulls,
        |  count(*) FILTER (WHERE decision_type_preview IS NULL) AS decision_nulls,
        |  floor((count(*) FILTER (WHERE views_30m = 0) / CAST(nullif(count(*), 0) AS DOUBLE))*1000000 + 0.5)/1000000 AS zero_view_rate
        |FROM ctx_core""".stripMargin),
    "q_reconciliation" ->
      """WITH rt AS (
        |  SELECT date_trunc('minute', ts) AS minute, count(*) AS rt_n,
        |    avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS rt_rate
        |  FROM events WHERE value <= 195.0 GROUP BY 1),
        |batch AS (
        |  SELECT date_trunc('minute', ts) AS minute, count(*) AS batch_n,
        |    avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS batch_rate
        |  FROM events GROUP BY 1),
        |j AS (
        |  SELECT b.minute,
        |    1.0 * abs(coalesce(rt.rt_n, 0) - b.batch_n) / greatest(b.batch_n, 100) AS count_diff_ratio,
        |    abs(coalesce(rt.rt_rate, 0.0) - b.batch_rate) AS rate_diff
        |  FROM batch b LEFT JOIN rt ON rt.minute = b.minute),
        |agg AS (
        |  SELECT floor(quantile_cont(count_diff_ratio, 0.95)*1000000 + 0.5)/1000000 AS count_p95,
        |         floor(quantile_cont(rate_diff, 0.95)*1000000 + 0.5)/1000000 AS rate_p95,
        |         count(*) AS n_minutes
        |  FROM j)
        |SELECT count_p95, rate_p95, n_minutes,
        |  count_p95 <= 0.08 AS counts_pass, rate_p95 <= 0.03 AS rates_pass
        |FROM agg""".stripMargin,
    "q_health_gates" ->
      """SELECT 'invalid_rate_le_20pct' AS gate,
        |  floor((1.0 * count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INT) > 80 OR value > 195.0) / count(*))*1000000 + 0.5)/1000000 AS value,
        |  (1.0 * count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INT) > 80 OR value > 195.0) / count(*)) <= 0.20 AS pass
        |FROM events
        |UNION ALL
        |SELECT 'event_id_unique', floor((count(*) - count(DISTINCT event_id))*1000000 + 0.5)/1000000,
        |  (count(*) - count(DISTINCT event_id)) = 0 FROM events
        |UNION ALL
        |SELECT 'volume_ge_100', floor(count(*)*1000000 + 0.5)/1000000, count(*) >= 100 FROM events
        |UNION ALL
        |SELECT 'freshness_span_positive',
        |  floor(date_diff('second', min(date_trunc('second', ts)), max(date_trunc('second', ts)))*1000000 + 0.5)/1000000,
        |  date_diff('second', min(date_trunc('second', ts)), max(date_trunc('second', ts))) > 0 FROM events""".stripMargin,
  )
}
