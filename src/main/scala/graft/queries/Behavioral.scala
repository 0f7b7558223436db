package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Behavioral analytics over the events stream: gap-based
  * sessionization (lag + cumulative gap counter — the batch twin of a
  * streaming session window) and a view→click→purchase conversion
  * funnel. Extends the window-function surface beyond the reference
  * (which uses no lag/lead) — standard ops any events lakehouse needs.
  */
object Behavioral {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Sessionize with a 30-minute inactivity gap: session_id = running
    * count of gap-starts per user (ordered by event time). Two window
    * passes over the same (user_id, ts) ordering — Catalyst runs both
    * in one Window operator chain with a single shuffle on user_id. */
  def sessionize(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy(col("user_id"), col("session_no"))
      .agg(
        min(date_trunc("second", col("ts"))).as("session_start"),
        (max(date_trunc("second", col("ts"))).cast("long") -
          min(date_trunc("second", col("ts"))).cast("long")).as("duration_seconds"),
        count(lit(1)).as("n_events"),
        rd(sum(col("value")), 2).as("value_sum"))
      .orderBy("user_id", "session_no")
  }

  /** Native session-window aggregation — Spark's built-in
    * `session_window(time, gap)` (the streaming-capable form of
    * [[sessionize]]'s lag+cumsum). Boundary semantics differ from the
    * manual formulation: windows are half-open [start, end), so an
    * event exactly `gap` after its predecessor starts a NEW session
    * (the oracle mirrors with `>=`). Timestamps are second-truncated
    * up front so both engines do identical integer gap math. */
  def sessionWindows(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    t(s, dir, "events")
      .withColumn("tss", date_trunc("second", col("ts")))
      .groupBy(session_window(col("tss"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), rd(sum(col("value")), 2).as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))
      .orderBy("user_id", "session_start")

  /** Conversion funnel per user: first view → first click after that →
    * first purchase after that; counts users reaching each stage. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val firstView = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    // stage predicates live IN the join condition: a user whose clicks
    // all precede the first view must survive as a null-stage row, not
    // vanish (LEFT JOIN ON ts >= stage, not join-then-filter).
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("t_click"))
    val firstClick = firstView.join(clicks,
        col("user_id") === col("c_user") && col("t_click") >= col("t_view"), "left")
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("t_click")).as("t_click"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("t_purchase"))
    val full = firstClick.join(purchases,
        col("user_id") === col("p_user") && col("t_purchase") >= col("t_click"), "left")
      .groupBy(col("user_id"), col("t_view"), col("t_click"))
      .agg(min(col("t_purchase")).as("t_purchase"))
    full.agg(
      count(lit(1)).as("n_viewers"),
      count(col("t_click")).as("n_clickers"),
      count(col("t_purchase")).as("n_purchasers"))
  }

  /** Cohort retention: cohort = first active day per user; n distinct
    * users active at each (cohort_day, day_offset). Two aggregations on
    * user_id + one broadcast-size join — the standard retention
    * triangle. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = d.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    d.join(cohort, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Analytic-function battery over purchases, one window definition:
    * row_number / ntile / percent_rank / cume_dist / lag / lead /
    * running first — the W-surface beyond the reference's
    * row_number-only usage, cross-checked against DuckDB. */
  def windowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"), col("value"), col("ts"))
      .withColumn("rn", row_number().over(w))
      .withColumn("ntile4", ntile(4).over(w))
      .withColumn("pct_rank", rd(percent_rank().over(w), 6))
      .withColumn("cume", rd(cume_dist().over(w), 6))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("first_value", first(col("value")).over(w))
      .drop("ts")
      .orderBy("user_id", "rn")
  }

  /** Exponentially-decayed engagement score per user — the classic
    * recency-weighted feature (EMA_t = α·x_t + (1−α)·EMA_{t−1}, seeded
    * EMA_1 = x_1). α = 1/2 on purpose: the unrolled closed form
    * Σ 2^{−(n−i+1)}·x_i (+ doubled first term) multiplies by exact
    * binary powers only, so both engines scale identically and the sum
    * is the only rounding site. Two window passes (count + rank), one
    * aggregate — no recursion, no UDF. */
  def emaDecay(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("weight",
        when(col("rn") === 1, pow(lit(0.5), col("n") - 1))
          .otherwise(pow(lit(0.5), col("n") - col("rn") + 1)))
      .groupBy(col("user_id"))
      .agg(rd(sum(col("value") * col("weight")), 6).as("ema_value"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Grouped top-k through the native bounded-heap aggregate
    * (plans/TopKAggregate): top-3 purchases per user with map-side
    * pruning — at most k rows ship per partition per user, where the
    * window formulation shuffles every row to rank it. The oracle IS
    * that window formulation, proving the two agree including ties
    * (score DESC, id ASC). */
  def groupTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.TopKAggregate.heapTopKAgg
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(heapTopKAgg(col("event_id"), col("value"), 3).as("tk"))
      .select(col("user_id"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("user_id"), (col("i") + 1).cast("int").as("rank"),
        col("e.id").as("event_id"), col("e.score").as("value"))
      .orderBy("user_id", "rank")
  }

  /** Hourly resample + forward fill per user (operators/Resample),
    * summarized per user: grid size, gap count, filled-series sum. */
  def resampleFill(s: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.forwardFill(
        t(s, dir, "events"), "user_id", "ts", rd(sum(col("value")), 2), unit = "hour")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"),
        count(when(col("is_gap"), 1)).as("n_gaps"),
        rd(sum(col("v_filled")), 2).as("filled_sum"))
      .orderBy("user_id")

  /** Behavioral path mining: the most frequent 3-step event-type
    * sequences across user streams (two leads over the per-user order,
    * one global count) — the funnel-discovery complement to the fixed
    * q_funnel. Top 20, count ties broken by path. */
  def paths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("e1"), col("ts"), col("event_id"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — P(next event type | current), the behavior-model
    * baseline (and the input to next-event prediction evals). One
    * user-keyed window for the lead, one keyed aggregate, transition
    * probabilities as exact count ratios via a per-row window over the
    * tiny |types|² frame. */
  def markov(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val rowTot = Window.partitionBy(col("cur"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("cur"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(rowTot))
      .select(col("cur"), col("nxt"), col("n"), rd(col("p"), 8).as("p"))
      .orderBy("cur", "nxt")
  }

  /** RFM segmentation: per-user recency/frequency/monetary quintiles
    * (deterministic ntile tie-break on user_id) — the classic
    * customer-value grid. Windows run over the |users| frame, not raw
    * events. */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("frequency"),
        (sum(floor(col("value") * 100 + lit(0.5)).cast("long")).cast("double") / 100)
          .as("monetary"))
    val anchor = per.agg(max(col("last_day")).as("anchor"))
    per.crossJoin(broadcast(anchor))
      .withColumn("recency_days", datediff(col("anchor"), col("last_day")))
      .withColumn("r_score",
        ntile(5).over(Window.orderBy(col("recency_days"), col("user_id"))))
      .withColumn("f_score",
        ntile(5).over(Window.orderBy(col("frequency").desc, col("user_id"))))
      .withColumn("m_score",
        ntile(5).over(Window.orderBy(col("monetary").desc, col("user_id"))))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        rd(col("monetary"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
      .orderBy("user_id")
  }

  /** Benford first-digit audit over the value column — the fabricated-
    * data smoke test: observed leading-digit shares vs the Benford
    * expectation log10(1 + 1/d). The digit comes from the exact cents
    * INTEGER's decimal rendering (no float log10 at the boundary);
    * expected shares are shared double constants. */
  def benford(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val expected = (1 to 9).map(d => d -> math.log10(1 + 1.0 / d))
    val expCol = expected.foldLeft(lit(Double.NaN)) { case (e, (d, p)) =>
      when(col("digit") === d, lit(p)).otherwise(e)
    }
    val digits = t(s, dir, "events")
      .select(cents.as("c")).filter(col("c") > 0)
      .withColumn("digit", substring(col("c").cast("string"), 1, 1).cast("int"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    digits.crossJoin(broadcast(digits.agg(sum(col("n")).as("tot"))))
      .withColumn("frac", col("n").cast("double") / col("tot"))
      .withColumn("expected", expCol)
      .select(col("digit"), col("n"), rd(col("frac"), 6).as("frac"),
        rd(col("expected"), 6).as("expected"),
        rd(abs(col("frac") - col("expected")), 6).as("abs_dev"))
      .orderBy("digit")
  }

  /** Poisson-bootstrap CI (Bootstrap.poissonBootstrapMean, B=50) for
    * the mean purchase value — the distributed-native uncertainty
    * estimate; hash-derived multiplicities make every replicate
    * engine-identical. */
  def bootstrapCi(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bootstrap.poissonBootstrapMean(
        t(s, dir, "events").filter(col("event_type") === "purchase"),
        "event_id", "value", b = 50)
      .select(col("n"), rd(col("mean"), 4).as("mean"), col("b"),
        rd(col("ci_lo"), 4).as("ci_lo"), rd(col("ci_hi"), 4).as("ci_hi"))

  /** Additive seasonal decomposition (Resample.seasonalDecompose) of
    * the per-minute view rate: trend (61-row centered mean) +
    * per-slot-of-hour seasonal + residual. */
  def seasonal(s: SparkSession, dir: String): DataFrame = {
    val series = t(s, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"))
      .agg(count(lit(1)).cast("double").as("rate"))
    graft.operators.Resample.seasonalDecompose(series, "minute_epoch", "rate",
        period = 60, halfWindow = 30)
      .select(col("minute_epoch"), col("rate"),
        rd(col("trend"), 6).as("trend"),
        rd(col("seasonal"), 6).as("seasonal"),
        rd(col("residual"), 6).as("residual"))
      .orderBy("minute_epoch")
  }

  /** ACF of the per-minute view rate (Resample.acf, lags 1..10): the
    * periodicity/memory diagnostic feeding the seasonal-period choice. */
  def acfSeries(s: SparkSession, dir: String): DataFrame = {
    val series = t(s, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"))
      .agg(count(lit(1)).as("rate"))
    graft.operators.Resample.acf(series, "minute_epoch", "rate", maxLag = 10)
      .select(col("lag"), rd(col("acf"), 6).as("acf"))
      .orderBy("lag")
  }

  /** Holt linear-trend smoothing (Forecast.holtLinear, α=0.5, β=0.25)
    * of the per-hour event rate, one series per event_type, with the
    * 1/2/3-hour-ahead forecasts — the trend-aware step past q_ema_decay.
    * The fold runs in one codegen'd `aggregate` over the time-sorted
    * per-key array (fixed operation order → bit-equal to the oracle's
    * recursive CTE); α/β are exactly representable so 1−α matches the
    * SQL literal. */
  def holt(s: SparkSession, dir: String): DataFrame = {
    val series = t(s, dir, "events")
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .agg(count(lit(1)).cast("double").as("rate"))
    graft.operators.Forecast.holtLinear(series, "event_type", "hour_epoch", "rate",
        alpha = 0.5, beta = 0.25, horizon = 3)
      .select(col("event_type"), col("n"),
        rd(col("level"), 6).as("level"), rd(col("trend"), 6).as("trend"),
        rd(col("fc_1"), 6).as("fc_1"), rd(col("fc_2"), 6).as("fc_2"),
        rd(col("fc_3"), 6).as("fc_3"))
      .orderBy("event_type")
  }

  /** Robust trend (Resample.robustTrend) of each event type's DAILY
    * rate: Mann-Kendall S/z (monotone-trend significance, tie-
    * corrected, continuity-corrected) + Theil-Sen slope (median
    * pairwise slope) — the outlier-proof OLS replacement. Pairwise
    * over the ≤31-row per-type daily frame only. */
  def trendRobust(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    graft.operators.Resample.robustTrend(daily, "event_type", "day", "n_events")
      .select(col("event_type"), col("n"), col("s_stat"),
        rd(col("var_s"), 4).as("var_s"), rd(col("z"), 6).as("z"),
        rd(col("theil_sen_slope"), 6).as("theil_sen_slope"))
      .orderBy("event_type")
  }

  /** Kaplan-Meier churn curve (Survival.churnCurve, 3-day silence
    * rule): per-duration at-risk/event/censored counts and the
    * survival estimate — retention WITH right-censoring, which naive
    * retention curves get wrong for users still active at the corpus
    * boundary. One corpus-scale shuffle (per-user span); everything
    * after runs on the ≤|window-days| duration frame. */
  def survivalQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Survival.churnCurve(t(s, dir, "events"), "user_id", "ts",
        silenceDays = 3)
      .select(col("duration"), col("n_risk"), col("n_events"), col("n_censored"),
        rd(col("survival"), 6).as("survival"))
      .orderBy("duration")

  /** WOE/IV feature screen (Encoding.woeIv): the 50-wide value bands
    * scored against the purchase-vs-view label — "how separating is
    * the value band", with the IV headline (< 0.02 useless, > 0.5
    * leakage-suspicious). Add-half smoothing keeps empty cells
    * finite; IV sums in 1e-9 fixed point. */
  def woeIvQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(floor(col("value") / 50).cast("long").as("band"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    graft.operators.Encoding.woeIv(e, "band", "y")
      .select(col("bin"), col("n_good"), col("n_bad"),
        rd(col("woe"), 6).as("woe"), rd(col("contrib"), 6).as("contrib"),
        rd(col("iv"), 6).as("iv"))
      .orderBy("bin")
  }

  private val CcfMaxLag = 5

  /** Lead-lag cross-correlation (Resample.ccf, lags −5..5) between the
    * view and purchase per-minute rates — "purchases trail views by k
    * minutes" shows up as the argmax lag, which the symmetric ACF and
    * the lag-0 rolling corr can't see. 1e-9 fixed-point sums,
    * engine-exact; oracle is GENERATED from the same CcfMaxLag. */
  def ccfSeries(s: SparkSession, dir: String): DataFrame = {
    val rates = t(s, dir, "events")
      .groupBy(unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    graft.operators.Resample.ccf(rates, "minute_epoch", "x", "y", maxLag = CcfMaxLag)
      .select(col("lag"), rd(col("ccf"), 6).as("ccf"))
      .orderBy("lag")
  }

  /** DuckDB mirror of [[ccfSeries]], generated from CcfMaxLag so the
    * lag set can't drift (the langIdOracle anti-drift pattern). Every
    * arithmetic step mirrors the Spark association order. */
  private def ccfOracleSql: String = {
    val L = CcfMaxLag
    def fxs(e: String) =
      s"CAST(sum(CAST(floor(($e)*1000000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000000"
    val leads = (1 to L).map(k =>
      s"lead(y, $k) OVER win AS ly_$k, lead(x, $k) OVER win AS lx_$k").mkString(",\n    ")
    val nums = (
      (1 to L).map(k => fxs(s"CASE WHEN lx_$k IS NOT NULL THEN (lx_$k - mx)*(y - my) ELSE 0.0 END") + s" AS num_n$k") ++
      Seq(fxs("(x - mx)*(y - my)") + " AS num_0") ++
      (1 to L).map(k => fxs(s"CASE WHEN ly_$k IS NOT NULL THEN (x - mx)*(ly_$k - my) ELSE 0.0 END") + s" AS num_p$k")
    ).mkString(",\n    ")
    val sel = (
      (1 to L).map(k => s"SELECT ${-k} AS lag, num_n$k / (sqrt(dx) * sqrt(dy)) AS c FROM s") ++
      Seq(s"SELECT 0 AS lag, num_0 / (sqrt(dx) * sqrt(dy)) AS c FROM s") ++
      (1 to L).map(k => s"SELECT $k AS lag, num_p$k / (sqrt(dx) * sqrt(dy)) AS c FROM s")
    ).mkString("\nUNION ALL ")
    s"""WITH r AS (
       |  SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS me,
       |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS xi,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS yi
       |  FROM events GROUP BY 1),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(xi) AS BIGINT) AS sx,
       |             CAST(sum(yi) AS BIGINT) AS sy FROM r),
       |b AS (
       |  SELECT CAST(xi AS DOUBLE) AS x, CAST(yi AS DOUBLE) AS y,
       |    CAST(sx AS DOUBLE)/n AS mx, CAST(sy AS DOUBLE)/n AS my,
       |    $leads
       |  FROM r CROSS JOIN m WINDOW win AS (ORDER BY me)),
       |s AS (
       |  SELECT
       |    ${fxs("(x - mx)*(x - mx)")} AS dx,
       |    ${fxs("(y - my)*(y - my)")} AS dy,
       |    $nums
       |  FROM b)
       |SELECT lag, floor((c)*1000000 + 0.5)/1000000 AS ccf FROM (
       |$sel
       |) ORDER BY lag""".stripMargin
  }

  /** Rolling 60-minute Pearson correlation between the view and
    * purchase per-minute rates — "are these streams still coupled"
    * (decoupling flags instrumentation loss or funnel breakage).
    * Closed-form corr from exact integer window sums (n, Σx, Σy, Σx²,
    * Σy², Σxy over the pre-aggregated series frame) — no engine
    * corr() and its merge-formula drift; every value up to the final
    * divide is a long, so rho is bit-identical cross-engine. Windows
    * are over REALIZED minutes (ROWS, not a zero-filled spine);
    * emitted only when the window is full (n = 60) and both variances
    * are positive (NULL otherwise — undefined, not zero). */
  def rollingCorr(s: SparkSession, dir: String): DataFrame = {
    val rates = t(s, dir, "events")
      .groupBy(unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val w = Window.orderBy(col("minute_epoch")).rowsBetween(-59, 0)
    val d = rates
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .filter(col("n") === 60)
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    d.select(col("minute_epoch"), col("x"), col("y"),
        rd(when(dx > 0 && dy > 0, num / (sqrt(dx) * sqrt(dy))), 6).as("rho"))
      .orderBy("minute_epoch")
  }

  /** HBOS outlier scoring table (Anomaly.hbos): rarity score per
    * realized (value-band, hour, type) combination — the linear-time
    * unsupervised outlier detector over the event feed. */
  def hbosScores(s: SparkSession, dir: String): DataFrame =
    graft.operators.Anomaly.hbos(t(s, dir, "events"), "ts", "value", "event_type",
        bandWidth = 50.0)
      .select(col("value_band"), col("hr"), col("etype"), col("n_events"),
        rd(col("score"), 6).as("score"))
      .orderBy("value_band", "hr", "etype")

  /** Last-touch attribution: each purchase credits the user's most
    * recent preceding non-purchase event (the classic marketing
    * attribution window). `last(..., ignoreNulls)` over ROWS UNBOUNDED
    * PRECEDING..1 PRECEDING — one shuffle on user_id, shared with any
    * other per-user window in the same stage. Purchases with no prior
    * touch credit "none". */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .withColumn("last_touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
          .over(byUser))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), rd(sum(col("value")), 2).as("value_sum"))
      .orderBy("channel")
  }

  /** Per-user ordered event sequences — the behavior-sequence training
    * example builder (sequence models consume exactly this shape).
    * collect_list + sort_array on (ts, event_id, type) structs: one
    * shuffle on user_id, order made deterministic inside the array
    * rather than relying on any shuffle order. Compared cross-engine
    * via the full-sequence md5 and a head-5 preview string (arrays
    * stay out of the hash contract). */
  def userSequences(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type"))))
        .as("seq"))
      .select(col("user_id"), size(col("seq")).as("n_events"),
        md5(concat_ws(">", expr("transform(seq, x -> x.event_type)"))).as("seq_md5"),
        concat_ws(">", expr("transform(slice(seq, 1, 5), x -> x.event_type)")).as("head5"))
      .orderBy("user_id")

  /** Per-user Shannon entropy of the event-type mix — the behavioral
    * diversity diagnostic (a user doing only one thing has H=0; five
    * uniform types → H=ln 5). Two keyed aggregations, no joins beyond
    * the per-user totals; exact rational p=n_t/n feeds ln so rounding
    * at 4dp absorbs libm ulps. */
  def typeEntropy(s: SparkSession, dir: String): DataFrame = {
    val byType = t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_t"))
    val p = col("n_t").cast("double") / col("n_u").cast("double")
    byType
      .withColumn("n_u", sum(col("n_t")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("user_id"))
      .agg(sum(col("n_t")).as("n_events"),
        rd(negate(sum(p * log(p))), 4).as("type_entropy"))
      .orderBy("user_id")
  }

  /** Churn-label generation — the supervised-training label builder:
    * per-user activity span, active-day count, recency vs the corpus
    * end, and the 7-day churn flag. Distinct (user, day) first so the
    * label never depends on intra-day volume; corpus end rides in as
    * a 1-row broadcast. */
  def churnLabels(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct()
    val anchor = broadcast(days.agg(max(col("day")).as("corpus_end")))
    days.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        count(lit(1)).as("n_active_days"))
      .crossJoin(anchor)
      .select(col("user_id"), col("first_day"), col("last_day"), col("n_active_days"),
        datediff(col("corpus_end"), col("last_day")).as("days_since_last"),
        (datediff(col("corpus_end"), col("last_day")) > 7).as("churned_7d"))
      .orderBy("user_id")
  }

  /** Seasonal anomaly sweep: hour-of-day × event-type baseline, |z| ≥ 3
    * flags (Anomaly.seasonalZ — exact fixed-point baseline, so the flag
    * set hash-gates with no tolerance). */
  def anomalies(s: SparkSession, dir: String): DataFrame =
    graft.operators.Anomaly.seasonalZ(t(s, dir, "events"),
        Seq("event_type"), hour(col("ts")), "value", sigma = 3.0)
      .select(col("event_id"), col("event_type"), col("season").as("hr"),
        col("value"), rd(col("z"), 4).as("z"))
      .orderBy("event_id")

  /** Two-sample KS drift gate between purchase and view value
    * distributions (Drift.ksTwoSample — two-level distributed prefix
    * sum, log-free exact statistic). */
  def ksDrift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.ksTwoSample(t(s, dir, "events"), "value", "event_type",
        a = "purchase", b = "view")
      .select(col("n_a"), col("n_b"), rd(col("ks_stat"), 6).as("ks_stat"), col("ks_at"))

  /** Wasserstein-1 drift between the same two slices
    * (Drift.wasserstein1): mass-transport distance in value units —
    * "how far did the distribution move", not just the worst gap. */
  def w1Drift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.wasserstein1(t(s, dir, "events"), "value", "event_type",
        a = "purchase", b = "view")
      .select(col("n_a"), col("n_b"), rd(col("w1"), 6).as("w1"))

  /** CUSUM change-point scan (Anomaly.cusum) over the per-minute view
    * RATE — sustained-shift detection the per-point z test misses.
    * Counts are integers and target/slack are half-integers, so every
    * running sum is an exact multiple of 0.5 (bit-exact under ANY
    * window summation order — engine segment trees included). */
  def cusumDrift(s: SparkSession, dir: String): DataFrame = {
    val series = t(s, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"))
      .agg(count(lit(1)).cast("double").as("rate"))
    graft.operators.Anomaly.cusum(series, "minute_epoch", "rate",
        target = 1.0, slack = 0.5, h = 5.0)
      .select(col("minute_epoch"), col("rate"),
        col("cusum_pos"), col("cusum_neg"), col("alarm"))
      .orderBy("minute_epoch")
  }

  /** PSI drift gate (Drift.psi, 10 A-decile bins, add-half smoothing):
    * the per-bin shift ledger plus the headline index. */
  def psiDrift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.psi(t(s, dir, "events"), "value", "event_type",
        a = "purchase", b = "view", bins = 10)
      .select(col("bin"), col("ca_bin"), col("cb_bin"),
        rd(col("pa"), 8).as("pa"), rd(col("pb"), 8).as("pb"),
        rd(col("contrib"), 8).as("contrib"), rd(col("psi"), 8).as("psi"))
      .orderBy("bin")

  /** Association rules (Assoc.associationRules) over the implicit
    * market basket: user → the distinct `props.k` item ids they
    * touched. Top-20 rules by lift (exact integer-count divisions on
    * both engines, so the ordering key is bit-stable), tie-broken by
    * pair id. */
  def assocRules(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
    graft.operators.Assoc.associationRules(e, "user_id", "item", minPairSupport = 30,
        failOnCap = true)
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        rd(col("support"), 6).as("support"), rd(col("conf_ab"), 6).as("conf_ab"),
        rd(col("conf_ba"), 6).as("conf_ba"), rd(col("lift"), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  /** Item–item collaborative-filtering cosine (Assoc.itemItemCosine)
    * over per-(user, item) event counts — "users who touched a also
    * touched b" with magnitude. Top-20 by cosine (integer dot and
    * norms², identical float op order both engines), tie-broken by
    * pair id. */
  def itemCosineQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
    graft.operators.Assoc.itemItemCosine(e, "user_id", "item", minCommon = 20)
      .select(col("item_a"), col("item_b"), col("n_common"), col("dot"),
        rd(col("cosine"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  /** 2-D Pareto frontier (Skyline.skyline2D): users maximizing
    * purchase spend while minimizing error-event count. Spend
    * accumulates as exact cents (int64) so frontier membership is a
    * pure integer comparison — no float-sum order hazard — and the
    * oracle cross-checks the whole two-level machinery with an
    * independent NOT EXISTS dominance formulation. */
  def skylineQ(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + lit(0.5)).cast("long")).otherwise(0L))
          .as("spend_cents"))
    graft.operators.Skyline.skyline2D(pts, "errors", "spend_cents")
      .select(col("user_id"), col("errors"),
        (col("spend_cents").cast("double") / 100).as("spend"))
      .orderBy("errors", "user_id")
  }

  /** Per-type OLS linear trend (Forecast.olsTrend) of event value over
    * hour index — slope/intercept/r² from exact integer moment sums
    * (re-based hours × cent values), the parametric twin of
    * q_trend_robust's Theil–Sen. */
  def olsTrendQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"),
        floor(col("ts").cast("long") / 3600).as("t"), col("value"))
    graft.operators.Forecast.olsTrend(e, "event_type", "t", "value")
      .select(col("event_type"), col("n"), rd(col("slope"), 8).as("slope"),
        rd(col("intercept"), 6).as("intercept"), rd(col("r2"), 8).as("r2"))
      .orderBy("event_type")
  }

  /** Difference-in-differences (Experiment.diffInDiff): treat = odd
    * user ids, post = second half of the month — the four cell means,
    * the DiD causal contrast under parallel trends, and its unpooled
    * SE, all from exact cent moments. */
  def didQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select((col("user_id") % 2 === 1).as("treat"),
        (col("ts") >= lit("2024-01-16").cast("timestamp")).as("post"),
        col("value"))
    graft.operators.Experiment.diffInDiff(e, "treat", "post", "value")
      .select(col("n_total"),
        rd(col("m_tp"), 6).as("m_tp"), rd(col("m_t0"), 6).as("m_t0"),
        rd(col("m_cp"), 6).as("m_cp"), rd(col("m_c0"), 6).as("m_c0"),
        rd(col("did"), 6).as("did"), rd(col("se"), 8).as("se"))
  }

  /** CUPED variance reduction (Experiment.cuped): unit = user,
    * covariate = first-half spend, metric = second-half spend;
    * adjusted arm means, pooled θ, and the variance-reduction ratio.
    * Per-user cent sums keep the unit frame exact before the moment
    * pass. */
  def cupedQ(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val units = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut, cents).otherwise(0L)).as("pre_c"),
        sum(when(col("ts") >= cut, cents).otherwise(0L)).as("post_c"))
      .select((col("user_id") % 2 === 1).as("arm"),
        (col("pre_c").cast("double") / 100).as("pre"),
        (col("post_c").cast("double") / 100).as("post"))
    graft.operators.Experiment.cuped(units, "arm", "pre", "post")
      .select(col("arm"), col("n_arm"),
        rd(col("mean_y"), 6).as("mean_y"), rd(col("mean_y_adj"), 6).as("mean_y_adj"),
        rd(col("theta"), 8).as("theta"), rd(col("var_ratio"), 8).as("var_ratio"))
      .orderBy("arm")
  }

  /** Length-2 sequential patterns (SeqMining.seqPairs): for every
    * ordered event-type pair, how many users did a before b — the
    * all-pairs generalization of the hardcoded view→click→purchase
    * funnel. "∃ a before b" is decided from per-(user, type) min/max
    * timestamps, so the plan never self-joins the raw log. */
  def seqPairsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeqMining.seqPairs(t(s, dir, "events"),
        "user_id", "event_type", "ts", minUsers = 2)
      .select(col("type_a"), col("type_b"), col("n_users"),
        rd(col("support"), 6).as("support"))
      .orderBy("type_a", "type_b")

  /** Delete-one-cohort jackknife SE of the mean event value
    * (Bootstrap.jackknifeMean, cohorts = user_id % 20): the exact,
    * no-resampling error bar that complements q_bootstrap_ci — one
    * pass, no replicate fan-out, and the grouped form respects
    * within-user correlation. All arithmetic is fixed-point over exact
    * cent sums, so both engines land on the identical SE. */
  def jackknifeQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bootstrap.jackknifeMean(
        t(s, dir, "events").withColumn("cohort", col("user_id") % 20), "cohort", "value")
      .select(col("g"), rd(col("mean"), 6).as("mean"), rd(col("se_jack"), 8).as("se_jack"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pairs" -> seqPairsQ,
    "q_jackknife" -> jackknifeQ,
    "q_did" -> didQ,
    "q_cuped" -> cupedQ,
    "q_ols_trend" -> olsTrendQ,
    "q_assoc_rules" -> assocRules,
    "q_item_cosine" -> itemCosineQ,
    "q_skyline" -> skylineQ,
    "q_anomaly" -> anomalies,
    "q_ks_drift" -> ksDrift,
    "q_w1_drift" -> w1Drift,
    "q_psi_drift" -> psiDrift,
    "q_cusum" -> cusumDrift,
    "q_markov" -> markov,
    "q_rfm" -> rfm,
    "q_benford" -> benford,
    "q_bootstrap_ci" -> bootstrapCi,
    "q_seasonal" -> seasonal,
    "q_holt" -> holt,
    "q_rolling_corr" -> rollingCorr,
    "q_ccf" -> ccfSeries,
    "q_woe_iv" -> woeIvQ,
    "q_survival" -> survivalQ,
    "q_trend_robust" -> trendRobust,
    "q_hbos" -> hbosScores,
    "q_acf" -> acfSeries,
    "q_group_topk" -> groupTopK,
    "q_paths" -> paths,
    "q_resample" -> resampleFill,
    "q_sessionize" -> ((s, d) => sessionize(s, d)),
    "q_session_window" -> ((s, d) => sessionWindows(s, d)),
    "q_funnel" -> funnel,
    "q_retention" -> retention,
    "q_window_suite" -> windowSuite,
    "q_ema_decay" -> emaDecay,
    // Skew.saltedAgg is semantics-preserving by construction — this row
    // pins it against the plain-GROUP-BY oracle on the real event feed
    // (count/sum/max are the algebraic trio the salt two-phase carries).
    "q_salted_agg" -> ((s, d) => {
      import scala.collection.immutable.ListMap
      graft.operators.Skew.saltedAgg(t(s, d, "events"), Seq("event_type"), saltBuckets = 8,
        aggs = ListMap(
          "n_events" -> ((count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))),
          "value_sum" -> ((sum(col("value")), (c: org.apache.spark.sql.Column) => sum(c))),
          "value_max" -> ((max(col("value")), (c: org.apache.spark.sql.Column) => max(c)))))
        .select(col("event_type"), col("n_events"),
          rd(col("value_sum"), 2).as("value_sum"), col("value_max"))
        .orderBy("event_type")
    }),
    "q_attribution" -> attribution,
    "q_user_sequences" -> userSequences,
    "q_type_entropy" -> typeEntropy,
    "q_churn_labels" -> churnLabels,
    "q_welch_ttest" -> welchTtest,
    "q_mann_whitney" -> mannWhitneyQ,
  )

  /** Welch's t-test over every pair of event types on `value` — the
    * experiment-readout twin of the drift gates (HypothesisTests
    * scaladoc). 10 pairs from 5 arms; one scan, G-row broadcast pair
    * join. df rounds at 2 (it is O(n), float-stable to far more). */
  def welchTtest(s: SparkSession, dir: String): DataFrame =
    graft.operators.HypothesisTests.welchPairs(t(s, dir, "events"), "event_type", "value")
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        rd(col("mean_diff"), 6).as("mean_diff"), rd(col("t_stat"), 6).as("t_stat"),
        rd(col("df_welch"), 2).as("df_welch"), col("significant_05"))
      .orderBy("grp_a", "grp_b")

  /** Mann–Whitney U, purchase vs view on `value` — the rank-based
    * (outlier-proof) complement to q_welch_ttest on the same slice
    * pair as q_ks_drift/q_w1_drift. u_stat is an exact half-integer
    * (no rounding needed); only z is summation-closing → rd6. */
  def mannWhitneyQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.HypothesisTests.mannWhitney(t(s, dir, "events"), "event_type", "value",
        a = "purchase", b = "view")
      .select(col("n_a"), col("n_b"), col("u_stat"), rd(col("z"), 6).as("z"),
        col("significant_05"))

  val oracles: Map[String, String] = Map(
    // ∃(a before b) ⟺ min(ts|a) < max(ts|b) — per-(user,type) extremes
    "q_seq_pairs" ->
      """WITH ut AS (
        |  SELECT user_id, event_type, min(ts) AS first_ts, max(ts) AS last_ts
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total FROM ut),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type AND a.first_ts < b.last_ts
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT type_a, type_b, n_users,
        |  floor((CAST(n_users AS DOUBLE) / n_total)*1000000 + 0.5)/1000000 AS support
        |FROM p, tot ORDER BY type_a, type_b""".stripMargin,
    // mirrors jackknifeMean's fixed-point ladder: θ_fp at 1e-9, dev from
    // the exact integer identity (θ_fp·G − Σθ_fp), dev² at 1e-12
    "q_jackknife" ->
      """WITH b AS (
        |  SELECT user_id % 20 AS g0, CAST(floor(value*100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |per AS (SELECT g0, CAST(sum(c) AS BIGINT) AS s_g, CAST(count(*) AS BIGINT) AS n_g
        |        FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(s_g) AS BIGINT) AS s, CAST(sum(n_g) AS BIGINT) AS n,
        |        CAST(count(*) AS BIGINT) AS g FROM per),
        |loo AS (SELECT CASE WHEN t.n > p.n_g THEN
        |    CAST(floor((CAST(t.s - p.s_g AS DOUBLE) / 100) / (t.n - p.n_g)
        |      * 1000000000 + 0.5) AS BIGINT) END AS theta_fp
        |  FROM per p, tot t),
        |bar AS (SELECT CAST(sum(theta_fp) AS BIGINT) AS sum_fp,
        |        count(CASE WHEN theta_fp IS NULL THEN 1 END) AS n_bad FROM loo),
        |ss AS (SELECT CAST(sum(CAST(floor(d*d*1e12 + 0.5) AS BIGINT)) AS BIGINT) AS ssum
        |  FROM (SELECT CAST(l.theta_fp * t.g - b2.sum_fp AS DOUBLE) / (1e9 * t.g) AS d
        |        FROM loo l, tot t, bar b2))
        |SELECT t.g AS g,
        |  floor(((CAST(t.s AS DOUBLE) / 100) / t.n)*1000000 + 0.5)/1000000 AS mean,
        |  CASE WHEN t.g > 1 AND b2.n_bad = 0 THEN
        |    floor(sqrt((CAST(t.g - 1 AS DOUBLE) / t.g) * (CAST(ss.ssum AS DOUBLE) / 1e12))
        |      *100000000 + 0.5)/100000000
        |  END AS se_jack
        |FROM tot t, bar b2, ss""".stripMargin,
    // four exact cent-moment cells; var, DiD, and SE mirrored op for op
    "q_did" ->
      """WITH b AS (
        |  SELECT (user_id % 2 = 1) AS treat,
        |    (date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-16') AS post,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS fx
        |  FROM events),
        |cells AS (
        |  SELECT treat, post, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(fx) AS BIGINT) AS s1, CAST(sum(fx*fx) AS BIGINT) AS s2
        |  FROM b GROUP BY 1, 2),
        |cv AS (
        |  SELECT treat, post, n,
        |    (CAST(s1 AS DOUBLE)/100)/n AS mean,
        |    CASE WHEN n > 1 THEN
        |      ((CAST(s2 AS DOUBLE)/10000)
        |        - (CAST(s1 AS DOUBLE)/100) * (CAST(s1 AS DOUBLE)/100) / n) / (n - 1)
        |    END AS var
        |  FROM cells),
        |w AS (
        |  SELECT
        |    max(CASE WHEN treat AND post THEN mean END) AS m_tp,
        |    max(CASE WHEN treat AND NOT post THEN mean END) AS m_t0,
        |    max(CASE WHEN NOT treat AND post THEN mean END) AS m_cp,
        |    max(CASE WHEN NOT treat AND NOT post THEN mean END) AS m_c0,
        |    max(CASE WHEN treat AND post THEN var / n END) AS v_tp,
        |    max(CASE WHEN treat AND NOT post THEN var / n END) AS v_t0,
        |    max(CASE WHEN NOT treat AND post THEN var / n END) AS v_cp,
        |    max(CASE WHEN NOT treat AND NOT post THEN var / n END) AS v_c0,
        |    CAST(sum(n) AS BIGINT) AS n_total
        |  FROM cv)
        |SELECT n_total,
        |  floor((m_tp)*1000000 + 0.5)/1000000 AS m_tp,
        |  floor((m_t0)*1000000 + 0.5)/1000000 AS m_t0,
        |  floor((m_cp)*1000000 + 0.5)/1000000 AS m_cp,
        |  floor((m_c0)*1000000 + 0.5)/1000000 AS m_c0,
        |  floor(((m_tp - m_t0) - (m_cp - m_c0))*1000000 + 0.5)/1000000 AS did,
        |  floor((sqrt(v_tp + v_t0 + v_cp + v_c0))*100000000 + 0.5)/100000000 AS se
        |FROM w""".stripMargin,
    // per-user exact cent sums -> /100 unit frame -> re-floored cent
    // moments; theta / adjusted means / OLS-residual variance ratio
    // mirrored op for op
    "q_cuped" ->
      """WITH u0 AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN date_trunc('microseconds', ts) < TIMESTAMP '2024-01-16'
        |        THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS pre_c,
        |    CAST(sum(CASE WHEN date_trunc('microseconds', ts) >= TIMESTAMP '2024-01-16'
        |        THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS post_c
        |  FROM events GROUP BY 1),
        |u AS (
        |  SELECT (user_id % 2 = 1) AS arm,
        |    CAST(floor((CAST(pre_c AS DOUBLE)/100)*100 + 0.5) AS BIGINT) AS x,
        |    CAST(floor((CAST(post_c AS DOUBLE)/100)*100 + 0.5) AS BIGINT) AS y
        |  FROM u0),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x*x) AS BIGINT) AS sx2,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y*y) AS BIGINT) AS sy2,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM u),
        |gg AS (
        |  SELECT n, n*sxy - sx*sy AS cov, n*sx2 - sx*sx AS varx, n*sy2 - sy*sy AS vary,
        |    sx, sy
        |  FROM g),
        |gt AS (
        |  SELECT
        |    CASE WHEN varx > 0 THEN CAST(cov AS DOUBLE)/varx ELSE 0.0 END AS theta,
        |    (CAST(sx AS DOUBLE)/100)/n AS mean_x,
        |    CASE WHEN varx > 0 AND vary > 0 THEN
        |      (CAST(vary AS DOUBLE) - CAST(cov AS DOUBLE)*CAST(cov AS DOUBLE)/varx)
        |        / vary
        |    ELSE 1.0 END AS var_ratio
        |  FROM gg),
        |arms AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS n_arm,
        |    CAST(sum(y) AS BIGINT) AS asy, CAST(sum(x) AS BIGINT) AS asx
        |  FROM u GROUP BY 1)
        |SELECT a.arm, a.n_arm,
        |  floor(((CAST(asy AS DOUBLE)/100)/n_arm)*1000000 + 0.5)/1000000 AS mean_y,
        |  floor((((CAST(asy AS DOUBLE)/100)/n_arm)
        |    - gt.theta * (((CAST(asx AS DOUBLE)/100)/n_arm) - gt.mean_x))*1000000 + 0.5)/1000000 AS mean_y_adj,
        |  floor((gt.theta)*100000000 + 0.5)/100000000 AS theta,
        |  floor((gt.var_ratio)*100000000 + 0.5)/100000000 AS var_ratio
        |FROM arms a CROSS JOIN gt ORDER BY arm""".stripMargin,
    // six exact integer moment sums, closing divisions mirrored
    // term for term (slope in value-units/hour = cov/vart/100)
    "q_ols_trend" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)/3600) AS BIGINT)
        |      - min(CAST(floor(epoch(ts)/3600) AS BIGINT)) OVER (PARTITION BY event_type) AS tb,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS fx
        |  FROM events),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(tb) AS BIGINT) AS st, CAST(sum(tb*tb) AS BIGINT) AS st2,
        |    CAST(sum(fx) AS BIGINT) AS sx, CAST(sum(fx*fx) AS BIGINT) AS sx2,
        |    CAST(sum(tb*fx) AS BIGINT) AS stx
        |  FROM b GROUP BY 1),
        |c AS (
        |  SELECT event_type, n, n*stx - st*sx AS cov, n*st2 - st*st AS vart,
        |    n*sx2 - sx*sx AS varx, st, sx
        |  FROM m)
        |SELECT event_type, n,
        |  floor((CASE WHEN vart > 0 THEN CAST(cov AS DOUBLE)/vart/100 END)*100000000 + 0.5)/100000000 AS slope,
        |  floor((CASE WHEN vart > 0 THEN (CAST(sx AS DOUBLE)/100)/n
        |    - (CAST(cov AS DOUBLE)/vart/100) * (CAST(st AS DOUBLE)/n) END)*1000000 + 0.5)/1000000 AS intercept,
        |  floor((CASE WHEN vart > 0 AND varx > 0 THEN
        |    (CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE)) / (CAST(vart AS DOUBLE) * CAST(varx AS DOUBLE)) END)*100000000 + 0.5)/100000000 AS r2
        |FROM c ORDER BY event_type""".stripMargin,
    "q_assoc_rules" ->
      """WITH bi AS (
        |  SELECT DISTINCT user_id AS b, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM bi),
        |ic AS (SELECT item, count(*) AS n_item FROM bi GROUP BY 1),
        |p AS (
        |  SELECT x.item AS item_a, y.item AS item_b, count(*) AS n_ab
        |  FROM bi x JOIN bi y ON x.b = y.b AND x.item < y.item
        |  GROUP BY 1, 2 HAVING count(*) >= 30),
        |r AS (
        |  SELECT p.item_a, p.item_b, p.n_ab, a.n_item AS n_a, b.n_item AS n_b,
        |    floor((CAST(p.n_ab AS DOUBLE) / nb.n_baskets)*1000000 + 0.5)/1000000 AS support,
        |    floor((CAST(p.n_ab AS DOUBLE) / a.n_item)*1000000 + 0.5)/1000000 AS conf_ab,
        |    floor((CAST(p.n_ab AS DOUBLE) / b.n_item)*1000000 + 0.5)/1000000 AS conf_ba,
        |    floor((CAST(p.n_ab * nb.n_baskets AS DOUBLE) / (a.n_item * b.n_item))*1000000 + 0.5)/1000000 AS lift
        |  FROM p
        |  JOIN ic a ON a.item = p.item_a
        |  JOIN ic b ON b.item = p.item_b
        |  CROSS JOIN nb)
        |SELECT * FROM r ORDER BY lift DESC, item_a, item_b LIMIT 20""".stripMargin,
    "q_item_cosine" ->
      """WITH r AS (
        |  SELECT user_id AS u, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    count(*) AS cnt
        |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  GROUP BY 1, 2),
        |norms AS (SELECT item, sum(cnt * cnt) AS sq FROM r GROUP BY 1),
        |p AS (
        |  SELECT x.item AS item_a, y.item AS item_b,
        |    sum(x.cnt * y.cnt) AS dot, count(*) AS n_common
        |  FROM r x JOIN r y ON x.u = y.u AND x.item < y.item
        |  GROUP BY 1, 2 HAVING count(*) >= 20),
        |sc AS (
        |  SELECT p.item_a, p.item_b, CAST(p.n_common AS BIGINT) AS n_common,
        |    CAST(p.dot AS BIGINT) AS dot,
        |    floor((CAST(p.dot AS DOUBLE) /
        |      (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))))*1000000 + 0.5)/1000000 AS cosine
        |  FROM p
        |  JOIN norms a ON a.item = p.item_a
        |  JOIN norms b ON b.item = p.item_b)
        |SELECT * FROM sc ORDER BY cosine DESC, item_a, item_b LIMIT 20""".stripMargin,
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS spend_cents
        |  FROM events GROUP BY 1)
        |SELECT p.user_id, CAST(p.errors AS BIGINT) AS errors,
        |  CAST(p.spend_cents AS DOUBLE) / 100 AS spend
        |FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.errors <= p.errors AND q.spend_cents >= p.spend_cents
        |    AND (q.errors < p.errors OR q.spend_cents > p.spend_cents))
        |ORDER BY errors, user_id""".stripMargin,
    // identical double-op chain over identical exact cent sums — see
    // HypothesisTests scaladoc for the bit-exactness argument
    "q_welch_ttest" ->
      """WITH s AS (
        |  SELECT event_type AS g, count(*) AS n,
        |    sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS s1,
        |    sum(CAST(floor(value*100 + 0.5) AS BIGINT) * CAST(floor(value*100 + 0.5) AS BIGINT)) AS s2
        |  FROM events GROUP BY 1),
        |d AS (SELECT g, n, CAST(s1 AS DOUBLE)/n AS mean_c, CAST(s2 AS DOUBLE)/n AS ex2 FROM s),
        |v AS (SELECT g, n, mean_c,
        |        ((ex2 - mean_c*mean_c) * n / (n - 1.0)) / n AS q FROM d),
        |p AS (SELECT a.g AS grp_a, b.g AS grp_b, a.n AS n_a, b.n AS n_b,
        |        a.mean_c AS ma, b.mean_c AS mb, a.q AS qa, b.q AS qb
        |      FROM v a JOIN v b ON a.g < b.g)
        |SELECT grp_a, grp_b, n_a, n_b,
        |  floor(((ma - mb)/100.0)*1000000 + 0.5)/1000000 AS mean_diff,
        |  floor(((ma - mb)/sqrt(qa + qb))*1000000 + 0.5)/1000000 AS t_stat,
        |  floor(((qa + qb)*(qa + qb) / (qa*qa/(n_a - 1.0) + qb*qb/(n_b - 1.0)))*100 + 0.5)/100 AS df_welch,
        |  abs((ma - mb)/sqrt(qa + qb)) > 1.96 AS significant_05
        |FROM p ORDER BY grp_a, grp_b""".stripMargin,
    // global-window average-tie ranks mirror the bucketed prefix sum
    // (exact longs, so the two forms are identical); 2·rank_avg stays
    // integer so the rank-sum is exact on both engines
    "q_mann_whitney" ->
      """WITH g AS (
        |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |pv AS (SELECT c, count(*) AS ct, CAST(sum(is_a) AS BIGINT) AS ct_a FROM g GROUP BY 1),
        |r AS (SELECT *, CAST(coalesce(sum(ct) OVER (ORDER BY c
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below FROM pv),
        |agg AS (SELECT CAST(sum(ct_a) AS BIGINT) AS n_a, CAST(sum(ct) AS BIGINT) AS n,
        |          CAST(sum(ct_a*(2*below + ct + 1)) AS BIGINT) AS r2_a,
        |          CAST(sum(ct*ct*ct - ct) AS BIGINT) AS ties FROM r),
        |f AS (SELECT n_a, n - n_a AS n_b, n, ties,
        |        CAST(r2_a - n_a*(n_a + 1) AS DOUBLE)/2.0 AS u_stat FROM agg),
        |z AS (SELECT n_a, n_b, u_stat,
        |        (u_stat - (n_a*n_b)/2.0) /
        |          sqrt(CAST(n_a*n_b AS DOUBLE)/12.0 *
        |               ((n + 1.0) - CAST(ties AS DOUBLE)/(CAST(n AS DOUBLE)*(n - 1.0)))) AS zval
        |      FROM f)
        |SELECT n_a, n_b, u_stat,
        |  floor(zval*1000000 + 0.5)/1000000 AS z,
        |  abs(zval) > 1.96 AS significant_05
        |FROM z""".stripMargin,
    // global-window ECDF mirror of the two-level prefix sum (exact
    // integers, so the bucketed and global forms are identical)
    "q_ks_drift" ->
      """WITH t AS (
        |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |pv AS (SELECT c, CAST(sum(ia) AS BIGINT) AS ca, CAST(sum(ib) AS BIGINT) AS cb
        |       FROM t GROUP BY 1),
        |n AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a, CAST(sum(ib) AS BIGINT) AS n_b FROM t),
        |e AS (SELECT c,
        |        CAST(sum(ca) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
        |        CAST(sum(cb) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
        |      FROM pv),
        |g AS (SELECT e.c, abs(CAST(cuma AS DOUBLE)/n.n_a - CAST(cumb AS DOUBLE)/n.n_b) AS gap,
        |             n.n_a, n.n_b
        |      FROM e CROSS JOIN n),
        |m AS (SELECT n_a, n_b, max(gap) AS mx FROM g GROUP BY 1, 2)
        |SELECT m.n_a, m.n_b,
        |  floor((m.mx)*1000000 + 0.5)/1000000 AS ks_stat,
        |  CAST(min(g.c) AS DOUBLE)/100 AS ks_at
        |FROM m JOIN g ON g.gap = m.mx AND g.n_a = m.n_a AND g.n_b = m.n_b
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_markov" ->
      """WITH s AS (
        |  SELECT cur, lead(cur) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM (SELECT user_id, event_type AS cur, ts, event_id FROM events)),
        |c AS (SELECT cur, nxt, count(*) AS n FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        |  floor((CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE))*100000000 + 0.5)/100000000 AS p
        |FROM c ORDER BY cur, nxt""".stripMargin,
    "q_rfm" ->
      """WITH per AS (
        |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day, count(*) AS frequency,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS monetary
        |  FROM events GROUP BY 1),
        |a AS (SELECT max(last_day) AS anchor FROM per),
        |sc AS (
        |  SELECT user_id, date_diff('day', last_day, anchor) AS recency_days,
        |    frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY date_diff('day', last_day, anchor), user_id) AS INT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m_score
        |  FROM per CROSS JOIN a)
        |SELECT user_id, CAST(recency_days AS INT) AS recency_days, frequency,
        |  floor((monetary)*100 + 0.5)/100 AS monetary,
        |  r_score, f_score, m_score,
        |  CAST(r_score AS VARCHAR)||CAST(f_score AS VARCHAR)||CAST(m_score AS VARCHAR) AS segment
        |FROM sc ORDER BY user_id""".stripMargin,
    "q_acf" -> {
      val leads = (1 to 10)
        .map(k => s"lead(CAST(rate AS DOUBLE), $k) OVER (ORDER BY minute_epoch) AS l$k")
        .mkString(",\n      |    ")
      val nums = (1 to 10)
        .map(k => s"CAST(sum(CAST(floor((CASE WHEN l$k IS NOT NULL THEN (x - mean)*(l$k - mean) ELSE 0.0 END)*1e9 + 0.5) AS BIGINT)) AS DOUBLE)/1e9 AS n$k")
        .mkString(",\n      |    ")
      val unions = (1 to 10)
        .map(k => s"SELECT $k AS lag, n$k AS nv FROM nk")
        .mkString("\n      |  UNION ALL ")
      s"""WITH s AS (
      |  SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
      |    CAST(count(*) AS BIGINT) AS rate
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |m AS (SELECT CAST(sum(rate) AS DOUBLE) / count(*) AS mean FROM s),
      |L AS (
      |  SELECT CAST(rate AS DOUBLE) AS x,
      |    $leads
      |  FROM s),
      |Lm AS (SELECT * FROM L CROSS JOIN m),
      |d AS (
      |  SELECT CAST(sum(CAST(floor(((x - mean)*(x - mean))*1e9 + 0.5) AS BIGINT)) AS DOUBLE)/1e9 AS den
      |  FROM Lm),
      |nk AS (
      |  SELECT
      |    $nums
      |  FROM Lm),
      |u AS (
      |  $unions)
      |SELECT lag, floor((nv / den)*1000000 + 0.5)/1000000 AS acf
      |FROM u CROSS JOIN d ORDER BY lag""".stripMargin
    },
    "q_hbos" ->
      """WITH b AS (
        |  SELECT CAST(floor(CAST(floor(value*100 + 0.5) AS BIGINT) / 5000) AS BIGINT) AS value_band,
        |    CAST(hour(ts) AS INT) AS hr, event_type AS etype
        |  FROM events),
        |n AS (SELECT count(*) AS n FROM b),
        |mv AS (SELECT value_band, count(*) AS nv FROM b GROUP BY 1),
        |mh AS (SELECT hr, count(*) AS nh FROM b GROUP BY 1),
        |mt AS (SELECT etype, count(*) AS nt FROM b GROUP BY 1),
        |cb AS (SELECT value_band, hr, etype, count(*) AS n_events FROM b GROUP BY 1, 2, 3)
        |SELECT cb.value_band, cb.hr, cb.etype, cb.n_events,
        |  floor((-ln(CAST(nv AS DOUBLE)/n) - ln(CAST(nh AS DOUBLE)/n) - ln(CAST(nt AS DOUBLE)/n))*1000000 + 0.5)/1000000 AS score
        |FROM cb JOIN mv USING (value_band) JOIN mh USING (hr) JOIN mt USING (etype) CROSS JOIN n
        |ORDER BY value_band, hr, etype""".stripMargin,
    "q_seasonal" ->
      """WITH s AS (
        |  SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
        |    CAST(count(*) AS DOUBLE) AS rate
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |d AS (
        |  SELECT minute_epoch, rate,
        |    sum(rate) OVER (ORDER BY minute_epoch ROWS BETWEEN 30 PRECEDING AND 30 FOLLOWING)
        |      / count(rate) OVER (ORDER BY minute_epoch ROWS BETWEEN 30 PRECEDING AND 30 FOLLOWING) AS trend,
        |    CAST((row_number() OVER (ORDER BY minute_epoch) - 1) % 60 AS INT) AS slot
        |  FROM s),
        |d2 AS (SELECT *, rate - trend AS dt FROM d),
        |se AS (
        |  SELECT slot,
        |    (CAST(sum(CAST(floor(dt*1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9) / count(*) AS seasonal
        |  FROM d2 GROUP BY 1)
        |SELECT minute_epoch, rate,
        |  floor((trend)*1000000 + 0.5)/1000000 AS trend,
        |  floor((seasonal)*1000000 + 0.5)/1000000 AS seasonal,
        |  floor((dt - seasonal)*1000000 + 0.5)/1000000 AS residual
        |FROM d2 JOIN se USING (slot) ORDER BY minute_epoch""".stripMargin,
    "q_bootstrap_ci" -> {
      // CDF-ladder thresholds generated from the SAME Scala constants
      val ladder = graft.operators.Bootstrap.PoissonCdf.zipWithIndex
        .map { case (thr, k) => s"WHEN u < CAST($thr AS DOUBLE) THEN $k" }
        .mkString(" ")
      s"""WITH base AS (
        |  SELECT event_id AS id, CAST(floor(value*100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |reps AS (
        |  SELECT id, c, r,
        |    (CAST(CAST('0x'||substr(md5('boot:'||CAST(id AS VARCHAR)||':'||CAST(r AS VARCHAR)),1,13) AS BIGINT) AS DOUBLE) + 0.5)
        |      / CAST(4503599627370496 AS DOUBLE) AS u
        |  FROM base CROSS JOIN generate_series(1, 50) AS t(r)),
        |mult AS (SELECT id, c, r, CASE $ladder ELSE 7 END AS m FROM reps),
        |agg AS (
        |  SELECT r, CAST(sum(m * c) AS BIGINT) AS s, CAST(sum(m) AS BIGINT) AS w
        |  FROM mult GROUP BY 1 HAVING sum(m) > 0),
        |rm AS (
        |  SELECT r, (CAST(s AS DOUBLE) / 100) / w AS rep_mean,
        |    row_number() OVER (ORDER BY (CAST(s AS DOUBLE) / 100) / w, r) AS rk
        |  FROM agg),
        |bounds AS (
        |  SELECT min(rep_mean) AS ci_lo, max(rep_mean) AS ci_hi
        |  FROM rm WHERE rk = 2 OR rk = 49),
        |pt AS (
        |  SELECT count(*) AS n, (CAST(sum(c) AS DOUBLE) / 100) / count(*) AS mean
        |  FROM base)
        |SELECT n, floor((mean)*10000 + 0.5)/10000 AS mean, 50 AS b,
        |  floor((ci_lo)*10000 + 0.5)/10000 AS ci_lo,
        |  floor((ci_hi)*10000 + 0.5)/10000 AS ci_hi
        |FROM pt CROSS JOIN bounds""".stripMargin
    },
    "q_benford" -> {
      // expected shares generated from the SAME Scala constants as the
      // query — literal round-trips to the identical double
      val ladder = (1 to 9)
        .map(d => s"WHEN digit = $d THEN CAST(${math.log10(1 + 1.0 / d)} AS DOUBLE)")
        .mkString(" ")
      s"""WITH c AS (
        |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS c FROM events
        |  WHERE CAST(floor(value*100 + 0.5) AS BIGINT) > 0),
        |d AS (
        |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit, count(*) AS n
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d),
        |x AS (
        |  SELECT digit, n, CAST(n AS DOUBLE) / tot AS frac,
        |    CASE $ladder END AS expected
        |  FROM d CROSS JOIN t)
        |SELECT digit, n,
        |  floor((frac)*1000000 + 0.5)/1000000 AS frac,
        |  floor((expected)*1000000 + 0.5)/1000000 AS expected,
        |  floor((abs(frac - expected))*1000000 + 0.5)/1000000 AS abs_dev
        |FROM x ORDER BY digit""".stripMargin
    },
    // sequential window cumulatives mirror left-to-right exactly; the
    // running-min/max closed form replaces the CUSUM recursion
    "q_ccf" -> ccfOracleSql,
    "q_trend_robust" ->
      """WITH srs AS (
        |  SELECT event_type AS k, CAST(ts AS DATE) AS t, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT k, x,
        |          CAST(row_number() OVER (PARTITION BY k ORDER BY t) AS INTEGER) AS i
        |        FROM srs),
        |pr AS (
        |  SELECT a.k, a.i, b.i AS j,
        |    CAST(sign(b.x - a.x) AS BIGINT) AS sgn,
        |    CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
        |  FROM idx a JOIN idx b ON a.k = b.k AND a.i < b.i),
        |s AS (SELECT k, CAST(sum(sgn) AS BIGINT) AS s_stat,
        |             CAST(count(*) AS BIGINT) AS n_pairs FROM pr GROUP BY 1),
        |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM idx GROUP BY 1),
        |ties AS (
        |  SELECT k, CAST(sum(tt * (tt - 1) * (2*tt + 5)) AS BIGINT) AS tie_sum
        |  FROM (SELECT k, x, CAST(count(*) AS BIGINT) AS tt FROM idx GROUP BY 1, 2)
        |  GROUP BY 1),
        |med AS (
        |  SELECT r.k, r.slope AS theil_sen_slope
        |  FROM (SELECT k, slope,
        |          row_number() OVER (PARTITION BY k ORDER BY slope, i, j) AS rn
        |        FROM pr) r JOIN s ON s.k = r.k
        |  WHERE r.rn = (s.n_pairs + 1) // 2),
        |v AS (
        |  SELECT s.k, nn.n, s.s_stat,
        |    (CAST(nn.n AS DOUBLE) * CAST(nn.n - 1 AS DOUBLE) * CAST(2*nn.n + 5 AS DOUBLE)
        |      - CAST(ties.tie_sum AS DOUBLE)) / 18.0 AS var_s,
        |    med.theil_sen_slope
        |  FROM s JOIN nn ON nn.k = s.k JOIN ties ON ties.k = s.k JOIN med ON med.k = s.k)
        |SELECT k AS event_type, n, s_stat,
        |  floor(var_s*10000 + 0.5)/10000 AS var_s,
        |  floor((CASE WHEN var_s > 0
        |    THEN (CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE))) / sqrt(var_s)
        |    ELSE 0.0 END)*1000000 + 0.5)/1000000 AS z,
        |  floor(theil_sen_slope*1000000 + 0.5)/1000000 AS theil_sen_slope
        |FROM v ORDER BY event_type""".stripMargin,
    "q_survival" ->
      """WITH d AS (SELECT user_id AS subject, CAST(ts AS DATE) AS dd FROM events),
        |span AS (SELECT subject, min(dd) AS first_d, max(dd) AS last_d FROM d GROUP BY 1),
        |ce AS (SELECT max(dd) AS end_d FROM d),
        |subj AS (
        |  SELECT subject,
        |    CAST(datediff('day', first_d, last_d) AS BIGINT) AS duration,
        |    CAST(CASE WHEN datediff('day', last_d, end_d) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS observed
        |  FROM span CROSS JOIN ce),
        |per AS (SELECT duration, CAST(sum(observed) AS BIGINT) AS n_events,
        |        CAST(sum(1 - observed) AS BIGINT) AS n_censored,
        |        CAST(count(*) AS BIGINT) AS n_total FROM subj GROUP BY 1),
        |t AS (SELECT CAST(sum(n_total) AS BIGINT) AS alln FROM per),
        |km AS (
        |  SELECT duration, n_events, n_censored,
        |    CAST(alln - coalesce(sum(n_total) OVER (ORDER BY duration
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM per CROSS JOIN t),
        |k2 AS (
        |  SELECT duration, n_risk, n_events, n_censored,
        |    CAST(floor(ln(greatest(1.0 - CAST(n_events AS DOUBLE) / n_risk, 1e-12))*1000000000 + 0.5) AS BIGINT) AS lnterm
        |  FROM km),
        |k3 AS (
        |  SELECT duration, n_risk, n_events, n_censored,
        |    exp(CAST(sum(lnterm) OVER (ORDER BY duration
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/1000000000) AS survival
        |  FROM k2)
        |SELECT duration, n_risk, n_events, n_censored,
        |  floor(survival*1000000 + 0.5)/1000000 AS survival
        |FROM k3 ORDER BY duration""".stripMargin,
    "q_woe_iv" ->
      """WITH e AS (
        |  SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |b AS (SELECT bin, CAST(sum(y) AS BIGINT) AS n_good,
        |             CAST(sum(1 - y) AS BIGINT) AS n_bad FROM e GROUP BY 1),
        |t AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg, CAST(sum(n_bad) AS BIGINT) AS tb,
        |             CAST(count(*) AS BIGINT) AS m FROM b),
        |s AS (
        |  SELECT bin, n_good, n_bad,
        |    (CAST(n_good AS DOUBLE) + 0.5) / (CAST(tg AS DOUBLE) + 0.5 * CAST(m AS DOUBLE)) AS pg,
        |    (CAST(n_bad AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 0.5 * CAST(m AS DOUBLE)) AS pb
        |  FROM b CROSS JOIN t),
        |w AS (SELECT bin, n_good, n_bad, ln(pg/pb) AS woe,
        |             (pg - pb) * ln(pg/pb) AS contrib FROM s),
        |i AS (SELECT CAST(sum(CAST(floor(contrib*1000000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000000 AS iv FROM w)
        |SELECT bin, n_good, n_bad,
        |  floor(woe*1000000 + 0.5)/1000000 AS woe,
        |  floor(contrib*1000000 + 0.5)/1000000 AS contrib,
        |  floor(iv*1000000 + 0.5)/1000000 AS iv
        |FROM w CROSS JOIN i ORDER BY bin""".stripMargin,
    "q_rolling_corr" ->
      """WITH r AS (
        |  SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT minute_epoch, x, y,
        |    count(*) OVER win AS n,
        |    sum(x) OVER win AS sx, sum(y) OVER win AS sy,
        |    sum(x*x) OVER win AS sxx, sum(y*y) OVER win AS syy,
        |    sum(x*y) OVER win AS sxy
        |  FROM r WINDOW win AS (ORDER BY minute_epoch ROWS BETWEEN 59 PRECEDING AND CURRENT ROW))
        |SELECT minute_epoch, x, y,
        |  floor((CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
        |    THEN CAST(n*sxy - sx*sy AS DOUBLE) /
        |      (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
        |    END)*1000000 + 0.5)/1000000 AS rho
        |FROM w WHERE n = 60 ORDER BY minute_epoch""".stripMargin,
    // the recursion recomputes l_new inside b_new exactly as the Spark
    // fold's lambda does (no lateral binding there either) — same ops,
    // same order, bit-equal doubles
    "q_holt" ->
      """WITH RECURSIVE s0 AS (
        |  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
        |    CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, x,
        |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS i
        |      FROM s0),
        |nn AS (SELECT event_type, CAST(max(i) AS BIGINT) AS n FROM s GROUP BY 1),
        |init AS (
        |  SELECT s1.event_type, CAST(1 AS BIGINT) AS i, s1.x AS l, s2.x - s1.x AS b
        |  FROM s s1 JOIN s s2 ON s2.event_type = s1.event_type AND s2.i = 2
        |  WHERE s1.i = 1),
        |rec(event_type, i, l, b) AS (
        |  SELECT event_type, i, l, b FROM init
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |    CAST(0.5 AS DOUBLE) * s.x + CAST(0.5 AS DOUBLE) * (r.l + r.b),
        |    CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * s.x + CAST(0.5 AS DOUBLE) * (r.l + r.b)) - r.l)
        |      + CAST(0.75 AS DOUBLE) * r.b
        |  FROM rec r JOIN s ON s.event_type = r.event_type AND s.i = r.i + 1),
        |fin AS (
        |  SELECT r.event_type, nn.n, r.l AS level, r.b AS trend
        |  FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n)
        |SELECT event_type, n,
        |  floor((level)*1000000 + 0.5)/1000000 AS level,
        |  floor((trend)*1000000 + 0.5)/1000000 AS trend,
        |  floor((level + 1.0*trend)*1000000 + 0.5)/1000000 AS fc_1,
        |  floor((level + 2.0*trend)*1000000 + 0.5)/1000000 AS fc_2,
        |  floor((level + 3.0*trend)*1000000 + 0.5)/1000000 AS fc_3
        |FROM fin ORDER BY event_type""".stripMargin,
    "q_cusum" ->
      """WITH s AS (
        |  SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
        |    CAST(count(*) AS DOUBLE) AS rate
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |d AS (
        |  SELECT minute_epoch, rate,
        |    sum(rate - 1.0 - 0.5) OVER (ORDER BY minute_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sp,
        |    sum(rate - 1.0 + 0.5) OVER (ORDER BY minute_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sn
        |  FROM s),
        |c AS (
        |  SELECT minute_epoch, rate,
        |    sp - least(min(sp) OVER (ORDER BY minute_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS cusum_pos,
        |    greatest(max(sn) OVER (ORDER BY minute_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) - sn AS cusum_neg
        |  FROM d)
        |SELECT minute_epoch, rate, cusum_pos, cusum_neg,
        |  cusum_pos > 5.0 OR cusum_neg > 5.0 AS alarm
        |FROM c ORDER BY minute_epoch""".stripMargin,
    // same ECDF chain as q_ks_drift, then the exact interval-area sum
    "q_w1_drift" ->
      """WITH t AS (
        |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |pv AS (SELECT c, CAST(sum(ia) AS BIGINT) AS ca, CAST(sum(ib) AS BIGINT) AS cb
        |       FROM t GROUP BY 1),
        |n AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a, CAST(sum(ib) AS BIGINT) AS n_b FROM t),
        |e AS (SELECT c,
        |        CAST(sum(ca) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
        |        CAST(sum(cb) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
        |      FROM pv),
        |g AS (SELECT c, lead(c) OVER (ORDER BY c) AS nxt, cuma, cumb FROM e),
        |ar AS (SELECT n_a, n_b,
        |        CASE WHEN nxt IS NOT NULL
        |          THEN abs(CAST(cuma AS DOUBLE)/n_a - CAST(cumb AS DOUBLE)/n_b)
        |               * (CAST(nxt - c AS DOUBLE)/100)
        |          ELSE 0.0 END AS area
        |       FROM g CROSS JOIN n)
        |SELECT n_a, n_b,
        |  floor((CAST(sum(CAST(floor(area*1e9 + 0.5) AS BIGINT)) AS DOUBLE)/1e9)*1000000 + 0.5)/1000000 AS w1
        |FROM ar GROUP BY 1, 2""".stripMargin,
    // A-decile bins realized on the discrete grid via the LEFT-limit
    // CDF; add-half smoothing keeps empty sides finite
    "q_psi_drift" ->
      """WITH t AS (
        |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |pv AS (SELECT c, CAST(sum(ia) AS BIGINT) AS ca, CAST(sum(ib) AS BIGINT) AS cb
        |       FROM t GROUP BY 1),
        |n AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a, CAST(sum(ib) AS BIGINT) AS n_b FROM t),
        |e AS (SELECT c, ca, cb,
        |        CAST(sum(ca) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma
        |      FROM pv),
        |b AS (SELECT CAST(least(floor((CAST(cuma - ca AS DOUBLE)/n_a) * 10) + 1, 10) AS INT) AS bin,
        |        ca, cb, n_a, n_b
        |      FROM e CROSS JOIN n),
        |per AS (SELECT bin, n_a, n_b,
        |          CAST(sum(ca) AS BIGINT) AS ca_bin, CAST(sum(cb) AS BIGINT) AS cb_bin
        |        FROM b GROUP BY 1, 2, 3),
        |p2 AS (SELECT bin, ca_bin, cb_bin,
        |         (CAST(ca_bin AS DOUBLE) + 0.5)/(CAST(n_a AS DOUBLE) + 5.0) AS pa,
        |         (CAST(cb_bin AS DOUBLE) + 0.5)/(CAST(n_b AS DOUBLE) + 5.0) AS pb
        |       FROM per),
        |p3 AS (SELECT *, (pa - pb) * ln(pa/pb) AS contrib FROM p2),
        |tt AS (SELECT CAST(sum(CAST(floor(contrib*1e9 + 0.5) AS BIGINT)) AS DOUBLE)/1e9 AS psi FROM p3)
        |SELECT bin, ca_bin, cb_bin,
        |  floor((pa)*100000000 + 0.5)/100000000 AS pa,
        |  floor((pb)*100000000 + 0.5)/100000000 AS pb,
        |  floor((contrib)*100000000 + 0.5)/100000000 AS contrib,
        |  floor((psi)*100000000 + 0.5)/100000000 AS psi
        |FROM p3 CROSS JOIN tt ORDER BY bin""".stripMargin,
    // baseline sums on exact cents (row-order-proof), z re-derived with
    // the identical fixed-order expression — mirrors Anomaly.seasonalZ
    "q_anomaly" ->
      """WITH b AS (
        |  SELECT event_type, hour(ts) AS hr,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT) * CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS s2,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, hr, n,
        |    (CAST(s1 AS DOUBLE) / 100) / n AS mean,
        |    sqrt(((CAST(s2 AS DOUBLE) / 10000) / n) - ((CAST(s1 AS DOUBLE) / 100) / n) * ((CAST(s1 AS DOUBLE) / 100) / n)) AS sd
        |  FROM b),
        |z AS (
        |  SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS INT) AS hr, e.value,
        |    (e.value - st.mean) / st.sd AS z
        |  FROM events e JOIN st ON st.event_type = e.event_type AND st.hr = hour(e.ts)
        |  WHERE st.sd > 0)
        |SELECT event_id, event_type, hr, value, floor((z)*10000 + 0.5)/10000 AS z
        |FROM z WHERE abs(z) >= 3 ORDER BY event_id""".stripMargin,
    "q_group_topk" ->
      """WITH p AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, CAST(rank AS INTEGER) AS rank, event_id, value
        |FROM p WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin,
    "q_paths" ->
      """WITH s AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT e1, e2, e3, count(*) AS n
        |FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,
    "q_resample" ->
      """WITH a AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    floor((sum(value))*100 + 0.5)/100 AS v
        |  FROM events GROUP BY 1, 2),
        |sp AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM a GROUP BY 1)),
        |j AS (
        |  SELECT sp.user_id, sp.bucket, a.v, a.v IS NULL AS is_gap,
        |    last_value(a.v IGNORE NULLS) OVER (PARTITION BY sp.user_id ORDER BY sp.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |  FROM sp LEFT JOIN a ON sp.user_id = a.user_id AND sp.bucket = a.bucket)
        |SELECT user_id, count(*) AS n_hours,
        |  count(*) FILTER (WHERE is_gap) AS n_gaps,
        |  floor((sum(v_filled))*100 + 0.5)/100 AS filled_sum
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ema_decay" ->
      """WITH r AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |wt AS (
        |  SELECT user_id, value,
        |    CASE WHEN rn = 1 THEN pow(0.5, n - 1) ELSE pow(0.5, n - rn + 1) END AS weight
        |  FROM r)
        |SELECT user_id, floor((sum(value * weight))*1000000 + 0.5)/1000000 AS ema_value,
        |  count(*) AS n_events
        |FROM wt GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  floor((sum(value))*100 + 0.5)/100 AS value_sum,
        |  max(value) AS value_max
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_attribution" ->
      """WITH a AS (
        |  SELECT user_id, event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |  FROM events)
        |SELECT coalesce(last_touch, 'none') AS channel,
        |  count(*) AS n_purchases,
        |  floor((sum(value))*100 + 0.5)/100 AS value_sum
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    "q_user_sequences" ->
      """WITH s AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id, CAST(len(seq) AS INTEGER) AS n_events,
        |  md5(array_to_string(seq, '>')) AS seq_md5,
        |  array_to_string(seq[1:5], '>') AS head5
        |FROM s ORDER BY user_id""".stripMargin,
    "q_type_entropy" ->
      """WITH bt AS (
        |  SELECT user_id, event_type, count(*) AS n_t
        |  FROM events GROUP BY 1, 2),
        |wt AS (SELECT user_id, n_t,
        |         CAST(sum(n_t) OVER (PARTITION BY user_id) AS BIGINT) AS n_u
        |       FROM bt)
        |SELECT user_id, CAST(sum(n_t) AS BIGINT) AS n_events,
        |  floor((-(sum((CAST(n_t AS DOUBLE) / CAST(n_u AS DOUBLE)) * ln(CAST(n_t AS DOUBLE) / CAST(n_u AS DOUBLE)))))*10000 + 0.5)/10000 AS type_entropy
        |FROM wt GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_churn_labels" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |an AS (SELECT max(day) AS corpus_end FROM d),
        |u AS (SELECT user_id, min(day) AS first_day, max(day) AS last_day,
        |        count(*) AS n_active_days
        |      FROM d GROUP BY 1)
        |SELECT user_id, first_day, last_day, n_active_days,
        |  CAST(date_diff('day', last_day, corpus_end) AS INTEGER) AS days_since_last,
        |  date_diff('day', last_day, corpus_end) > 7 AS churned_7d
        |FROM u CROSS JOIN an ORDER BY user_id""".stripMargin,
    "q_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
        |SELECT c.cohort_day,
        |  CAST(date_diff('day', c.cohort_day, d.day) AS INTEGER) AS day_offset,
        |  count(DISTINCT d.user_id) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_window_suite" ->
      """WITH p AS (
        |  SELECT user_id, event_id, value,
        |    date_trunc('microseconds', ts) AS tsu, date_trunc('second', ts) AS ts_sec
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, event_id, ts_sec, value,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(ntile(4) OVER w AS INTEGER) AS ntile4,
        |  floor((percent_rank() OVER w)*1000000 + 0.5)/1000000 AS pct_rank,
        |  floor((cume_dist() OVER w)*1000000 + 0.5)/1000000 AS cume,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  first_value(value) OVER w AS first_value
        |FROM p
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        |ORDER BY user_id, rn""".stripMargin,
    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', date_trunc('microseconds', lag(ts) OVER w),
        |                        date_trunc('microseconds', ts)) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY date_trunc('microseconds', ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |  FROM marked)
        |SELECT user_id, session_no,
        |  min(date_trunc('second', ts)) AS session_start,
        |  date_diff('second', min(date_trunc('second', ts)), max(date_trunc('second', ts))) AS duration_seconds,
        |  count(*) AS n_events,
        |  floor((sum(value))*100 + 0.5)/100 AS value_sum
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_session_window" ->
      // gaps-and-islands mirror of session_window: NEW session only when
      // the second-truncated gap EXCEEDS 1800 s. Spark merges an event
      // landing exactly at the session end (closed boundary — verified
      // empirically at sf0.1, where one exactly-1800 s pair exists and
      // session_window merged it); end = last event + gap
      """WITH e AS (SELECT user_id, date_trunc('second', ts) AS tss, value FROM events),
        |m AS (
        |  SELECT user_id, tss, value,
        |    CASE WHEN lag(tss) OVER w IS NULL
        |           OR date_diff('second', lag(tss) OVER w, tss) > 1800
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss)),
        |g AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tss
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, min(tss) AS session_start,
        |  max(tss) + INTERVAL '30' MINUTE AS session_end,
        |  count(*) AS n_events,
        |  floor((sum(value))*100 + 0.5)/100 AS value_sum
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q_funnel" ->
      // every ts is µs-truncated up front: Spark reads the ns parquet at
      // µs precision, so comparing raw ns on the DuckDB side could admit
      // or exclude different events in the same microsecond
      """WITH ev AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events),
        |fv AS (
        |  SELECT user_id, min(ts) AS t_view FROM ev WHERE event_type = 'view' GROUP BY 1),
        |fc AS (
        |  SELECT fv.user_id, fv.t_view, min(c.ts) AS t_click
        |  FROM fv LEFT JOIN ev c
        |    ON c.user_id = fv.user_id AND c.event_type = 'click' AND c.ts >= fv.t_view
        |  GROUP BY 1, 2),
        |fp AS (
        |  SELECT fc.user_id, fc.t_view, fc.t_click, min(p.ts) AS t_purchase
        |  FROM fc LEFT JOIN ev p
        |    ON p.user_id = fc.user_id AND p.event_type = 'purchase' AND p.ts >= fc.t_click
        |  GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_viewers, count(t_click) AS n_clickers,
        |  count(t_purchase) AS n_purchasers
        |FROM fp""".stripMargin,
  )
}
