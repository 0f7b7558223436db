package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Decisions
import graft.operators.{IncrementalAgg, MergeOps, Validation}
import graft.serving.Serving

/** Lakehouse-pipeline operator surface: validation/quarantine split,
  * serving decision context, queue production, MERGE-upsert semantics,
  * health/freshness gates (SURVEY.md §2.2, §2.7-§2.8 analogs on the
  * testdata events stream).
  */
object Lakehouse {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** P6/P13: precedence-ordered error-code annotation + split, reported
    * as per-code row counts (quarantine telemetry). */
  def validationSplit(s: SparkSession, dir: String): DataFrame =
    Validation.annotateEvents(t(s, dir, "events"))
      .groupBy(coalesce(col("error_code"), lit("VALID")).as("error_code"))
      .agg(count(lit(1)).as("n"), rd(sum(col("value")), 2).as("value_sum"))
      .orderBy("error_code")

  /** P1/P4: JSON payload probe — extract typed field from the JSON body,
    * aggregate per enum. */
  def jsonMetrics(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      // k_raw nullness (extraction missing) is the k_nulls predicate the
      // oracle mirrors; k is the ANSI-safe numeric view for the stats
      .withColumn("k_raw", get_json_object(col("props"), "$.k"))
      .withColumn("k", expr("try_cast(k_raw as int)"))
      .groupBy(col("event_type"))
      .agg(
        rd(avg(col("k")), 4).as("k_avg"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        count(when(col("k_raw").isNull, 1)).as("k_nulls"))
      .orderBy("event_type")

  /** D1-D3: the full serving decision context (rounded metric columns). */
  def decisionContext(s: SparkSession, dir: String): DataFrame =
    Serving.decisionContextFromEvents(t(s, dir, "events"))
      .select(
        col("user_id"), col("minute"),
        col("views_30m"), col("clicks_30m"), col("purchases_30m"), col("errors_30m"),
        rd(col("velocity_30m"), 4).as("velocity_30m"),
        rd(col("completion_rate_30m"), 4).as("completion_rate_30m"),
        rd(col("skip_rate_30m"), 4).as("skip_rate_30m"),
        col("candidate_flag"), col("quality_gate_pass"), col("under_exposed_flag"),
        col("decision_type_preview"))
      .orderBy("user_id", "minute")

  /** A10: decision distribution snapshot. */
  def decisionDistribution(s: SparkSession, dir: String): DataFrame =
    Serving.decisionContextFromEvents(t(s, dir, "events"))
      .groupBy(col("decision_type_preview"))
      .agg(count(lit(1)).as("n"))
      .orderBy("decision_type_preview")

  /** D4/D5: action-queue rows — NO_ACTION suppressed, priority/TTL maps,
    * deterministic sha-256 action ids. */
  def actionQueue(s: SparkSession, dir: String): DataFrame =
    Serving.actionQueue(
        Serving.decisionContextFromEvents(t(s, dir, "events")), "graft_rules_v1")
      .orderBy("user_id", "minute")

  /** D5/D6: the full 18-column action-queue write-row contract
    * (reference action-queue-contract.md:19-38). decided_at is the
    * window close — deterministic, so the whole row (action_id
    * included) hash-verifies against the oracle. reason_codes is
    * emitted comma-joined for the compare gate; the operator itself
    * carries the real ARRAY column. */
  def actionQueueRowsFull(s: SparkSession, dir: String): DataFrame =
    Serving.actionQueueRows(
        Serving.decisionContextFromEvents(t(s, dir, "events")), "graft_rules_v1")
      .select(
        col("action_id"), col("video_id"), col("decision_type"), col("priority"),
        col("state"), col("decided_at"), col("window_start"), col("window_end"),
        col("expires_at"), col("rule_version"),
        rd(col("velocity_30m"), 4).as("velocity_30m"),
        rd(col("completion_rate_30m"), 4).as("completion_rate_30m"),
        rd(col("skip_rate_30m"), 4).as("skip_rate_30m"),
        col("impressions_30m"),
        array_join(col("reason_codes"), ",").as("reason_codes"),
        col("created_at"), col("updated_at"), col("state_updated_at"))
      .orderBy("video_id", "window_start")

  /** J4/J5: MERGE-upsert semantics — split the stream at a date, upsert
    * the newer half's latest-per-key rows into the older snapshot. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      col("user_id"), col("event_type"), col("value"),
      date_trunc("second", col("ts")).as("ts_sec"), col("ts"), col("event_id"))
    val cut = lit("2024-01-04").cast("timestamp")
    // ascending (ts, event_id) is a total order per key (event_id unique),
    // so max_by aggregation replaces the full window sort on both legs
    val ordAsc = Seq(col("ts"), col("event_id"))
    val target = MergeOps.dedupLatestBy(e.filter(col("ts") < cut), Seq("user_id"), ordAsc)
      .select(col("user_id"), col("event_type"), col("value"), col("ts_sec"))
    val source = e.filter(col("ts") >= cut)
    val merged = MergeOps.upsertBy(target, source, Seq("user_id"), ordAsc)
    merged.select(col("user_id"), col("event_type"), col("value"), col("ts_sec")).orderBy("user_id")
  }

  /** SCD Type-2 dimension history: daily per-user change log (latest
    * event of each day, µs/event_id tiebreak) collapsed into versioned
    * validity intervals — consecutive same-value days merge into one
    * version, effective_to is the next version's start, null while
    * current. */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      col("user_id"), col("event_type"), to_date(col("ts")).as("day"),
      col("ts"), col("event_id"))
    val log = MergeOps.dedupLatestBy(e, Seq("user_id", "day"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("day"), col("event_type"))
    MergeOps.scd2(log, Seq("user_id"), "day", Seq("event_type"))
      .orderBy("user_id", "effective_from")
  }

  /** Dimension snapshot AS OF mid-history (2024-01-15), reconstructed
    * from the [[scd2]] interval table — time travel as a pushed-down
    * filter, no table format needed. */
  def scd2AsOf(s: SparkSession, dir: String): DataFrame =
    MergeOps.snapshotAsOf(scd2(s, dir), lit("2024-01-15").cast("date"))
      .select(col("user_id"), col("event_type"), col("effective_from"))
      .orderBy("user_id")

  /** P14/P16: per-key activity span in seconds (date_diff port). */
  def timeDiff(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        (max(date_trunc("second", col("ts"))).cast("long") -
         min(date_trunc("second", col("ts"))).cast("long")).as("span_seconds"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** A7: conditional null-count battery in one aggregate pass. */
  def nullBattery(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val e = t(s, dir, "events")
    val oAgg = o.agg(
      sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("o_custkey_nulls"),
      sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("o_totalprice_nulls"),
      sum(when(col("o_orderdate").isNull, 1).otherwise(0)).as("o_orderdate_nulls"),
      count(lit(1)).as("n_orders"))
    val eAgg = e.agg(
      sum(when(get_json_object(col("props"), "$.k").isNull, 1).otherwise(0)).as("k_nulls"),
      sum(when(col("props").isNull, 1).otherwise(0)).as("props_nulls"),
      count(lit(1)).as("n_events"))
    oAgg.crossJoin(broadcast(eAgg))
  }

  /** A6/P14: freshness anchors — per-type last event second + lag vs the
    * global anchor (reference freshness SLO query). */
  def freshness(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val anchor = e.agg(max(date_trunc("second", col("ts"))).as("anchor_sec"))
    e.groupBy(col("event_type"))
      .agg(max(date_trunc("second", col("ts"))).as("last_sec"), count(lit(1)).as("n"))
      .crossJoin(broadcast(anchor))
      .select(
        col("event_type"), col("last_sec"),
        (col("anchor_sec").cast("long") - col("last_sec").cast("long")).as("lag_seconds"),
        col("n"))
      .orderBy("event_type")
  }

  /** Key-distribution diagnostic (Profiler.keyDistribution) on the
    * event feed's user key: the top-10 hot keys, their share, and the
    * corpus skew factor — the number a salting/AQE-skew decision reads.
    * `share`/`skew_factor` are exact integer ratios in doubles (one
    * division each), so rd(6) is engine-stable. */
  def keySkew(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiler.keyDistribution(t(s, dir, "events"), "user_id", topN = 10)
      .select(col("user_id"), col("n"),
        rd(col("share"), 6).as("share"), rd(col("skew_factor"), 6).as("skew_factor"))
      .orderBy(col("n").desc, col("user_id"))

  /** Winsorization summary (Profiler.winsorize): per-event-type
    * [p05, p95] fences, clip counts each side, and the clipped mean —
    * the outlier-robust normalization a feature pipeline applies
    * before scaling. Fences rounded at 6dp (madOutliers pattern) so a
    * row exactly on a fence can't flip engines. */
  def winsorizeSummary(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiler.winsorize(t(s, dir, "events"), "event_type", "value")
      .groupBy(col("event_type"))
      .agg(
        min(col("lo")).as("p05"), min(col("hi")).as("p95"),
        count(when(col("value") < col("lo"), 1)).as("n_below"),
        count(when(col("value") > col("hi"), 1)).as("n_above"),
        rd(avg(col("clipped")), 4).as("clipped_avg"))
      .orderBy("event_type")

  /** Columns profiled by q_profile — one of each type family (int,
    * string, double, timestamp) so every render path is oracled. */
  private val profileCols = Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")

  /** Single-scan per-column profile of `orders` (operators/Profiler):
    * the data-quality summary job. */
  def profileOrders(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiler.profile(t(s, dir, "orders"), profileCols)

  /** DuckDB mirror generated from the same column list + type dispatch
    * as the Spark side (one UNION ALL leg per column). */
  private[queries] def profileOracle: String = {
    val legs = Seq(
      ("o_orderkey", "CAST(%s(o_orderkey) AS VARCHAR)"),
      ("o_orderstatus", "CAST(%s(o_orderstatus) AS VARCHAR)"),
      ("o_totalprice", "CAST(CAST(%s(o_totalprice) AS DECIMAL(28,6)) AS VARCHAR)"),
      ("o_orderdate", "CAST(date_trunc('second', %s(o_orderdate)) AS VARCHAR)"))
      .map { case (c, render) =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
           |  count(DISTINCT $c) AS n_distinct,
           |  ${render.format("min")} AS min_val, ${render.format("max")} AS max_val
           |FROM orders""".stripMargin
      }
    legs.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Snapshot diff (operators/MergeOps.snapshotDiff): the change feed
    * between the customer table and a deterministically mutated copy —
    * deletes (key % 97), updates (+100 on key % 13), inserts (shifted
    * keys for key % 101). */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val after = c.filter(col("c_custkey") % 97 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 13 === 0, col("c_acctbal") + lit(100.0))
          .otherwise(col("c_acctbal")))
      .unionByName(
        c.filter(col("c_custkey") % 101 === 0)
          .withColumn("c_custkey", col("c_custkey") + lit(1000000L)))
    graft.operators.MergeOps.snapshotDiff(c, after, Seq("c_custkey"),
        Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** CDC apply with deletes (operators/MergeOps.applyCdc): each
    * customer's LATEST order is its op — '1-URGENT' deletes the row,
    * anything else replaces the balance with that order's total;
    * customers with no orders survive untouched. */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val changes = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("o_totalprice").as("c_acctbal"), col("c_mktsegment"),
        when(col("o_orderpriority") === "1-URGENT", "D").otherwise("U").as("op"),
        col("o_orderkey").as("seq"))
    graft.operators.MergeOps.applyCdc(c, changes, Seq("c_custkey"), Seq(col("seq").desc))
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Equi-depth 8-bin histogram of events.value (operators/Profiler):
    * exact-percentile boundaries + one broadcast counting pass. */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiler.equiDepthHistogram(t(s, dir, "events"), "value", bins = 8)
      .select(col("bin_id").cast("int").as("bin_id"), col("n"), col("lo"), col("hi"))

  /** Incremental rollup maintenance: per-supplier lineitem state built
    * from a base batch and a delta batch (l_orderkey % 10 split), then
    * MERGED — must equal the full recompute, which is exactly what the
    * oracle computes. At 100 TB only the delta and the state tables are
    * read; the oracle-side full rescan is the thing being avoided. */
  def incrAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val keys = Seq("l_suppkey")
    val merged = IncrementalAgg.merge(keys,
      IncrementalAgg.partials(li.filter(col("l_orderkey") % 10 =!= 0), keys, "l_extendedprice"),
      IncrementalAgg.partials(li.filter(col("l_orderkey") % 10 === 0), keys, "l_extendedprice"))
    IncrementalAgg.finalized(merged)
      .select(col("l_suppkey"), col("n"),
        rd(col("sum_v"), 2).as("sum_v"), col("min_v"), col("max_v"),
        rd(col("avg_v"), 4).as("avg_v"))
      .orderBy("l_suppkey")
  }

  /** Hampel outlier gate per event_type: robust med/MAD stats + outlier
    * counts (operators/Profiler.madOutliers, k=3). */
  def outliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiler.madOutliers(t(s, dir, "events"), "event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(when(col("is_outlier"), 1)).as("n_outliers"))
      .orderBy("event_type")

  /** Z-order (Morton) clustering key over (customer, order-day): the
    * per-z-bucket bounding rectangles this emits are exactly the
    * parquet min/max stats a zorder-clustered write would give each
    * file — compact in BOTH dimensions (core/Layout.zValue /
    * clusterByZ; LayoutSpec measures the skipping win vs a linear
    * sort). Domains are bracketed into 16 bits on both engines. */
  def zorderBuckets(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "orders")
      .withColumn("a", (col("o_custkey") % 65536).cast("long"))
      .withColumn("b",
        (datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")) % 65536).cast("long"))
    x.withColumn("z", graft.core.Layout.zValue(col("a"), col("b")))
      .withColumn("z_bucket", shiftright(col("z"), 19))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("min_cust"), max(col("a")).as("max_cust"),
        min(col("b")).as("min_day"), max(col("b")).as("max_day"))
      .orderBy("z_bucket")
  }

  /** Data-quality expectation suite over the table pack: null / range /
    * enum-domain / uniqueness / referential-integrity checks, one
    * report row each (operators/Expectations). */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations._
    val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
    val c = t(s, dir, "customer"); val e = t(s, dir, "events")
    report(Seq(
      "orders_custkey_not_null" -> notNull(o, "o_custkey"),
      "orders_totalprice_range" -> inRange(o, "o_totalprice", 0, 1000000),
      "orders_priority_domain" -> inSet(o, "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      "orders_custkey_fk" -> refIntegrity(o, "o_custkey", c, "c_custkey"),
      "lineitem_orderkey_fk" -> refIntegrity(li, "l_orderkey", o, "o_orderkey"),
      "events_event_id_unique" -> unique(e, Seq("event_id")),
      "events_type_domain" -> inSet(e, "event_type",
        Seq("click", "signup", "purchase", "error", "view"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> profileOrders,
    "q_key_skew" -> keySkew,
    "q_winsorize" -> winsorizeSummary,
    "q_histogram" -> valueHistogram,
    "q_outliers" -> outliers,
    "q_zorder" -> zorderBuckets,
    "q_expectations" -> expectations,
    "q_table_diff" -> tableDiff,
    "q_cdc_apply" -> cdcApply,
    "q_incr_agg" -> incrAgg,
    "q_validation_split" -> validationSplit,
    "q_json_metrics" -> jsonMetrics,
    "q_decision_context" -> decisionContext,
    "q_decision_distribution" -> decisionDistribution,
    "q_action_queue" -> actionQueue,
    "q_action_queue_rows" -> actionQueueRowsFull,
    "q_merge_upsert" -> mergeUpsert,
    "q_scd2" -> scd2,
    "q_scd2_asof" -> scd2AsOf,
    "q_time_diff" -> timeDiff,
    "q_null_battery" -> nullBattery,
    "q_freshness" -> freshness,
  )

  /** Decision-context CTE chain ending at the UNROUNDED flags+decision
    * relation `f` — shared by every oracle that consumes the context
    * (the rounded projection is applied per final query, so aggregates
    * over the context see raw values on both engines). */
  private[queries] val decisionContextCoreSql =
    """WITH per_min AS (
      |  SELECT user_id, date_trunc('minute', ts) AS minute,
      |    count(*) FILTER (WHERE event_type = 'view') AS views,
      |    count(*) FILTER (WHERE event_type = 'click') AS clicks,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
      |    count(*) FILTER (WHERE event_type = 'error') AS errors
      |  FROM events GROUP BY 1, 2),
      |roll AS (
      |  SELECT user_id, minute,
      |    CAST(sum(views) OVER w AS BIGINT) AS views_30m,
      |    CAST(sum(clicks) OVER w AS BIGINT) AS clicks_30m,
      |    CAST(sum(purchases) OVER w AS BIGINT) AS purchases_30m,
      |    CAST(sum(errors) OVER w AS BIGINT) AS errors_30m
      |  FROM per_min
      |  WINDOW w AS (PARTITION BY user_id ORDER BY minute
      |    RANGE BETWEEN INTERVAL '29' MINUTE PRECEDING AND CURRENT ROW)),
      |m AS (
      |  SELECT *,
      |    (clicks_30m + 5.0 * purchases_30m) / greatest(views_30m, 5) AS velocity_30m,
      |    1.0 * purchases_30m / greatest(clicks_30m, 1) AS completion_rate_30m,
      |    1.0 * errors_30m / greatest(clicks_30m, 1) AS skip_rate_30m
      |  FROM roll),
      |ctx_core AS (
      |  SELECT *,
      |    coalesce(velocity_30m >= 0.6 AND views_30m >= 1, false) AS candidate_flag,
      |    completion_rate_30m >= 0.5 AND skip_rate_30m <= 0.5 AND clicks_30m >= 1 AS quality_gate_pass,
      |    coalesce(views_30m <= 0 AND (clicks_30m + purchases_30m) >= 1, false) AS under_exposed_flag,
      |    CASE WHEN coalesce(velocity_30m >= 0.6 AND views_30m >= 1, false)
      |              AND (completion_rate_30m >= 0.5 AND skip_rate_30m <= 0.5 AND clicks_30m >= 1) THEN 'BOOST'
      |         WHEN coalesce(velocity_30m >= 0.6 AND views_30m >= 1, false) THEN 'REVIEW'
      |         WHEN coalesce(views_30m <= 0 AND (clicks_30m + purchases_30m) >= 1, false) THEN 'RESCUE'
      |         ELSE 'NO_ACTION' END AS decision_type_preview
      |  FROM m)""".stripMargin

  private[queries] val decisionContextSql =
    decisionContextCoreSql + """
      |SELECT user_id, minute, views_30m, clicks_30m, purchases_30m, errors_30m,
      |  floor((velocity_30m)*10000 + 0.5)/10000 AS velocity_30m,
      |  floor((completion_rate_30m)*10000 + 0.5)/10000 AS completion_rate_30m,
      |  floor((skip_rate_30m)*10000 + 0.5)/10000 AS skip_rate_30m,
      |  candidate_flag, quality_gate_pass, under_exposed_flag, decision_type_preview
      |FROM ctx_core""".stripMargin

  /** SCD2 versioning CTE chain ending at the interval relation `o` —
    * shared by the history dump and the as-of snapshot oracle. */
  private val scd2CoreSql =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    row_number() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
      |      ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
      |  FROM events),
      |lg AS (SELECT user_id, day, event_type FROM e WHERE rn = 1),
      |c AS (SELECT *, lag(event_type) OVER w AS prev, row_number() OVER w AS rn2
      |      FROM lg WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |v AS (SELECT user_id, day, event_type FROM c
      |      WHERE rn2 = 1 OR prev IS DISTINCT FROM event_type),
      |o AS (SELECT user_id, event_type, day AS effective_from,
      |        lead(day) OVER (PARTITION BY user_id ORDER BY day) AS effective_to
      |      FROM v)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_profile" -> profileOracle,
    "q_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |st AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys, max(n) AS max_n FROM c)
        |SELECT user_id, n,
        |  floor((CAST(n AS DOUBLE) / CAST(total AS DOUBLE))*1000000 + 0.5)/1000000 AS share,
        |  floor((CAST(max_n AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(total AS DOUBLE))*1000000 + 0.5)/1000000 AS skew_factor
        |FROM c CROSS JOIN st ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "q_winsorize" ->
      """WITH f AS (
        |  SELECT event_type,
        |    floor((percentile_cont(0.05) WITHIN GROUP (ORDER BY value))*1000000 + 0.5)/1000000 AS lo,
        |    floor((percentile_cont(0.95) WITHIN GROUP (ORDER BY value))*1000000 + 0.5)/1000000 AS hi
        |  FROM events GROUP BY 1),
        |j AS (SELECT e.event_type, e.value, f.lo, f.hi FROM events e JOIN f USING (event_type))
        |SELECT event_type, lo AS p05, hi AS p95,
        |  count(*) FILTER (WHERE value < lo) AS n_below,
        |  count(*) FILTER (WHERE value > hi) AS n_above,
        |  floor((avg(least(greatest(value, lo), hi)))*10000 + 0.5)/10000 AS clipped_avg
        |FROM j GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin,
    "q_table_diff" ->
      """WITH after AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 101 = 0),
        |d AS (
        |  SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
        |    CASE WHEN b.c_custkey IS NULL THEN 'I'
        |         WHEN a.c_custkey IS NULL THEN 'D'
        |         WHEN NOT (b.c_name IS NOT DISTINCT FROM a.c_name
        |               AND b.c_nationkey IS NOT DISTINCT FROM a.c_nationkey
        |               AND b.c_acctbal IS NOT DISTINCT FROM a.c_acctbal
        |               AND b.c_mktsegment IS NOT DISTINCT FROM a.c_mktsegment) THEN 'U'
        |    END AS change_type
        |  FROM customer b FULL OUTER JOIN after a ON b.c_custkey = a.c_custkey)
        |SELECT c_custkey, change_type FROM d
        |WHERE change_type IS NOT NULL ORDER BY c_custkey""".stripMargin,
    "q_cdc_apply" ->
      """WITH l AS (
        |  SELECT o_custkey, o_totalprice, o_orderpriority,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        |  FROM orders),
        |latest AS (SELECT * FROM l WHERE rn = 1)
        |SELECT c.c_custkey,
        |  CASE WHEN latest.o_custkey IS NULL THEN c.c_acctbal ELSE latest.o_totalprice END AS c_acctbal,
        |  c.c_mktsegment
        |FROM customer c LEFT JOIN latest ON c.c_custkey = latest.o_custkey
        |WHERE latest.o_custkey IS NULL OR latest.o_orderpriority <> '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,
    "q_outliers" ->
      """WITH med AS (
        |  SELECT event_type, floor((quantile_cont(value, 0.5))*1000000 + 0.5)/1000000 AS med
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS absdev, m.med
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, floor((quantile_cont(absdev, 0.5))*1000000 + 0.5)/1000000 AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, count(*) AS n, max(d.med) AS med, max(mad.mad) AS mad,
        |  count(*) FILTER (WHERE d.absdev > 3.0 * 1.4826 * mad.mad) AS n_outliers
        |FROM d JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_expectations" ->
      """WITH checks AS (
        |  SELECT 'events_event_id_unique' AS check_name,
        |    (SELECT count(*) FROM (SELECT event_id FROM events GROUP BY 1 HAVING count(*) > 1)) AS n_violations
        |  UNION ALL SELECT 'events_type_domain',
        |    (SELECT count(*) FROM events WHERE event_type IS NOT NULL
        |       AND event_type NOT IN ('click','signup','purchase','error','view'))
        |  UNION ALL SELECT 'lineitem_orderkey_fk',
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'orders_custkey_fk',
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'orders_custkey_not_null',
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
        |  UNION ALL SELECT 'orders_priority_domain',
        |    (SELECT count(*) FROM orders WHERE o_orderpriority IS NOT NULL
        |       AND o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'))
        |  UNION ALL SELECT 'orders_totalprice_range',
        |    (SELECT count(*) FROM orders WHERE o_totalprice IS NOT NULL
        |       AND (o_totalprice < 0 OR o_totalprice > 1000000)))
        |SELECT check_name, n_violations, n_violations = 0 AS pass
        |FROM checks ORDER BY check_name""".stripMargin,
    // the interleave is generated from the same bit-term loop the Spark
    // side uses — disjoint bit positions, so + ≡ bitwise OR
    "q_zorder" -> {
      val zTerms = (0 until 16)
        .map(i => s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH x AS (
         |  SELECT CAST(o_custkey % 65536 AS BIGINT) AS a,
         |    CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 65536 AS BIGINT) AS b
         |  FROM orders),
         |z AS (SELECT a, b, $zTerms AS z FROM x)
         |SELECT (z >> 19) AS z_bucket, count(*) AS n,
         |  min(a) AS min_cust, max(a) AS max_cust,
         |  min(b) AS min_day, max(b) AS max_day
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the oracle is the FULL recompute the incremental path avoids:
    // merge(partials(base), partials(delta)) must equal agg(base ∪ delta)
    "q_incr_agg" ->
      """SELECT l_suppkey, count(*) AS n,
        |  floor((sum(l_extendedprice))*100 + 0.5)/100 AS sum_v,
        |  min(l_extendedprice) AS min_v, max(l_extendedprice) AS max_v,
        |  floor((sum(l_extendedprice)/count(*))*10000 + 0.5)/10000 AS avg_v
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact percentile boundaries: Spark `percentile` ≡ DuckDB
    // `quantile_cont` bit-for-bit; 1/8-grid fractions are exact binary
    "q_histogram" ->
      """WITH bounds AS (
        |  SELECT list_transform(
        |    quantile_cont(value, [1.0/8.0, 2.0/8.0, 3.0/8.0, 4.0/8.0, 5.0/8.0, 6.0/8.0, 7.0/8.0]),
        |    b -> floor(b * 1000000.0 + 0.5) / 1000000.0) AS bs
        |  FROM events),
        |binned AS (
        |  SELECT value, len(list_filter(bs, b -> value > b)) AS bin_id
        |  FROM events, bounds)
        |SELECT CAST(bin_id AS INTEGER) AS bin_id, count(*) AS n,
        |  min(value) AS lo, max(value) AS hi
        |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_validation_split" ->
      """SELECT coalesce(
        |  CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 'E_PARSE_ERROR'
        |       WHEN event_type NOT IN ('click','view','purchase','signup','error') THEN 'E_INVALID_EVENT_TYPE'
        |       WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT) > 80 THEN 'E_K_OUT_OF_RANGE'
        |       WHEN value > 195.0 THEN 'E_VALUE_OUT_OF_RANGE' END,
        |  'VALID') AS error_code,
        | count(*) AS n, floor((sum(value))*100 + 0.5)/100 AS value_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_json_metrics" ->
      """SELECT event_type,
        | floor((avg(TRY_CAST(json_extract_string(props, '$.k') AS INT)))*10000 + 0.5)/10000 AS k_avg,
        | min(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
        | max(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
        | count(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL) AS k_nulls
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_decision_context" -> (decisionContextSql + "\nORDER BY user_id, minute"),
    "q_decision_distribution" ->
      (decisionContextCoreSql +
        "\nSELECT decision_type_preview, count(*) AS n FROM ctx_core GROUP BY 1 ORDER BY 1"),
    "q_action_queue" ->
      (decisionContextCoreSql + """
        |SELECT user_id, minute, decision_type_preview AS decision,
        |  CASE decision_type_preview WHEN 'RESCUE' THEN 1 WHEN 'REVIEW' THEN 2 WHEN 'BOOST' THEN 3 END AS priority,
        |  CASE decision_type_preview WHEN 'BOOST' THEN 15 WHEN 'REVIEW' THEN 30 WHEN 'RESCUE' THEN 30 END AS ttl_minutes,
        |  sha256(concat_ws('|', user_id, strftime(minute, '%Y-%m-%d %H:%M:%S'),
        |                   decision_type_preview, 'graft_rules_v1')) AS action_id
        |FROM ctx_core WHERE decision_type_preview <> 'NO_ACTION'
        |ORDER BY user_id, minute""".stripMargin),
    "q_action_queue_rows" ->
      (decisionContextCoreSql + """,
        |rows AS (
        |  SELECT
        |    CAST(user_id AS VARCHAR) AS video_id,
        |    decision_type_preview AS decision_type,
        |    minute AS window_start,
        |    minute + INTERVAL '1' MINUTE AS window_end,
        |    minute + INTERVAL '1' MINUTE AS decided_at,
        |    velocity_30m, completion_rate_30m, skip_rate_30m,
        |    views_30m AS impressions_30m
        |  FROM ctx_core WHERE decision_type_preview <> 'NO_ACTION')
        |SELECT
        |  sha256(concat_ws('|', video_id,
        |    strftime(window_start, '%Y-%m-%d %H:%M:%S'),
        |    strftime(window_end, '%Y-%m-%d %H:%M:%S'),
        |    decision_type, 'graft_rules_v1',
        |    strftime(decided_at, '%Y-%m-%d %H:%M:%S'))) AS action_id,
        |  video_id, decision_type,
        |  CASE decision_type WHEN 'RESCUE' THEN 1 WHEN 'REVIEW' THEN 2 WHEN 'BOOST' THEN 3 END AS priority,
        |  'PENDING' AS state,
        |  decided_at, window_start, window_end,
        |  decided_at + (CASE decision_type WHEN 'BOOST' THEN 15 ELSE 30 END) * INTERVAL '1' MINUTE AS expires_at,
        |  'graft_rules_v1' AS rule_version,
        |  floor((velocity_30m)*10000 + 0.5)/10000 AS velocity_30m,
        |  floor((completion_rate_30m)*10000 + 0.5)/10000 AS completion_rate_30m,
        |  floor((skip_rate_30m)*10000 + 0.5)/10000 AS skip_rate_30m,
        |  impressions_30m,
        |  CASE decision_type
        |    WHEN 'BOOST' THEN 'HIGH_VELOCITY_P90,GATE_PASS'
        |    WHEN 'REVIEW' THEN 'HIGH_VELOCITY_P90,LOW_COMPLETION,HIGH_SKIP'
        |    WHEN 'RESCUE' THEN 'NEW_UPLOAD_LT_60M,UNDER_EXPOSED_P40,GATE_PASS' END AS reason_codes,
        |  decided_at AS created_at, decided_at AS updated_at, decided_at AS state_updated_at
        |FROM rows ORDER BY video_id, window_start""".stripMargin),
    "q_merge_upsert" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value, date_trunc('second', ts) AS ts_sec,
        |         date_trunc('microseconds', ts) AS ts_us, event_id
        |  FROM events),
        |tgt AS (
        |  SELECT user_id, event_type, value, ts_sec FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
        |    FROM e WHERE ts_us < TIMESTAMP '2024-01-04') WHERE rn = 1),
        |src AS (
        |  SELECT user_id, event_type, value, ts_sec FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
        |    FROM e WHERE ts_us >= TIMESTAMP '2024-01-04') WHERE rn = 1)
        |SELECT user_id, event_type, value, ts_sec FROM src
        |UNION ALL
        |SELECT user_id, event_type, value, ts_sec FROM tgt
        |WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.user_id = tgt.user_id)
        |ORDER BY user_id""".stripMargin,
    "q_scd2" ->
      (scd2CoreSql + """
        |SELECT user_id, event_type, effective_from, effective_to,
        |  effective_to IS NULL AS is_current
        |FROM o ORDER BY user_id, effective_from""".stripMargin),
    // half-open interval containment: the version effective at the
    // snapshot instant is from <= t AND (to IS NULL OR to > t)
    "q_scd2_asof" ->
      (scd2CoreSql + """
        |SELECT user_id, event_type, effective_from
        |FROM o
        |WHERE effective_from <= DATE '2024-01-15'
        |  AND (effective_to IS NULL OR effective_to > DATE '2024-01-15')
        |ORDER BY user_id""".stripMargin),
    "q_time_diff" ->
      """SELECT user_id,
        | date_diff('second', min(date_trunc('second', ts)), max(date_trunc('second', ts))) AS span_seconds,
        | count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_null_battery" ->
      """SELECT
        | (SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders) AS o_custkey_nulls,
        | (SELECT count(*) FILTER (WHERE o_totalprice IS NULL) FROM orders) AS o_totalprice_nulls,
        | (SELECT count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders) AS o_orderdate_nulls,
        | (SELECT count(*) FROM orders) AS n_orders,
        | (SELECT count(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL) FROM events) AS k_nulls,
        | (SELECT count(*) FILTER (WHERE props IS NULL) FROM events) AS props_nulls,
        | (SELECT count(*) FROM events) AS n_events""".stripMargin,
    "q_freshness" ->
      """WITH anchor AS (SELECT max(date_trunc('second', ts)) AS anchor_sec FROM events)
        |SELECT event_type, max(date_trunc('second', ts)) AS last_sec,
        |  date_diff('second', max(date_trunc('second', ts)), (SELECT anchor_sec FROM anchor)) AS lag_seconds,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
