package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.MetricOps

/** Product-metric serving layer over the event/order feeds: rolling
  * actives, metric-change decomposition, bitmap exact distincts,
  * weighted quantiles, EB-shrunk rates, uplift deciles. Thin wrappers
  * over [[graft.operators.MetricOps]]; every query carries a full
  * DuckDB oracle (the HLL estimate is oracled as a within-tolerance
  * boolean, same pattern as q_approx_stats).
  */
object Metrics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** DAU + exact rolling 7-day WAU + HLL-estimated WAU (5% gate) per
    * observed day. Exact path is the explode-to-window-end shuffle;
    * sketch path merges per-day HLLs (MetricOps scaladoc). */
  def rollingDau(s: SparkSession, dir: String): DataFrame =
    MetricOps.rollingActives(t(s, dir, "events"), "user_id", "ts", windowDays = 7)

  /** Why did the average order price move from the first half of the
    * order history to the second — per-priority mix vs rate effects.
    * Period split at the midpoint date (integer-day floor, so both
    * engines compute the identical boundary). */
  def deltaDecomp(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val mid = o.agg(
      to_date(min(col("o_orderdate"))).as("mn"),
      to_date(max(col("o_orderdate"))).as("mx"))
      .select(date_add(col("mn"),
        (datediff(col("mx"), col("mn")) / 2).cast("int")).as("mid"))
    val tagged = o.crossJoin(broadcast(mid))
      .withColumn("period",
        when(to_date(col("o_orderdate")) < col("mid"), "a").otherwise("b"))
    MetricOps.deltaDecomposition(tagged, "o_orderpriority", "period", "o_totalprice")
      .select(col("segment"),
        rd(col("share_a"), 6).as("share_a"), rd(col("share_b"), 6).as("share_b"),
        rd(col("rate_a"), 2).as("rate_a"), rd(col("rate_b"), 2).as("rate_b"),
        rd(col("mix_effect"), 4).as("mix_effect"),
        rd(col("rate_effect"), 4).as("rate_effect"),
        rd(col("interaction"), 4).as("interaction"))
      .orderBy("segment")
  }

  /** Exact distinct users per event type via two-level bitmap
    * aggregation (map-side bitmap fold, popcount-sum reduce) — the
    * no-approx-allowed swap for countDistinct at 100 TB. user_id is
    * 0-based in the feed; bitmap positions are 1-based, so shift. */
  def bitmapDistinct(s: SparkSession, dir: String): DataFrame =
    MetricOps.bitmapDistinct(
        t(s, dir, "events").withColumn("uid", col("user_id") + 1),
        "event_type", "uid")
      .withColumnRenamed("n_distinct", "n_users")
      .orderBy("event_type")

  /** Quantity-weighted price quartiles per return flag: the
    * cumulative-weight crossing, exact (quantities are integral so
    * the running sums carry no float drift). */
  def weightedQuantile(s: SparkSession, dir: String): DataFrame =
    MetricOps.weightedQuantiles(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", "l_quantity",
        tieCols = Seq("l_orderkey", "l_linenumber"), qs = Seq(0.25, 0.5, 0.75))
      .select(col("l_returnflag"),
        rd(col("wq25"), 2).as("wq25"), rd(col("wq50"), 2).as("wq50"),
        rd(col("wq75"), 2).as("wq75"))
      .orderBy("l_returnflag")

  /** Per-user purchase rate, EB-shrunk toward the fleet Beta prior
    * (method-of-moments on users with ≥5 events). First 40 users by
    * id — the full frame is |users| rows. */
  def ebShrinkage(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events").groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("k"))
    MetricOps.ebShrinkRates(per, "user_id", "n", "k", minTrials = 5)
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("n"), col("k"),
        rd(col("alpha"), 4).as("alpha"), rd(col("beta"), 4).as("beta"),
        rd(col("rate_raw"), 6).as("rate_raw"),
        rd(col("rate_eb"), 5).as("rate_eb"))
      .orderBy("user_id")
  }

  /** Uplift deciles + cumulative Qini: treatment = even user_id (the
    * deterministic split), outcome = ever-purchased, targeting score
    * = non-purchase activity value (2-decimal-rounded so both engines
    * rank the identical order). */
  def qini(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events").groupBy("user_id").agg(
      max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"),
      rd(sum(when(col("event_type") =!= "purchase", col("value")).otherwise(0.0)), 2)
        .as("score"))
      .withColumn("treated", (col("user_id") % 2 === 0).cast("long"))
    MetricOps.qiniDeciles(per, "score", "user_id", "treated", "converted", k = 10)
      .select(col("bucket"), col("n_t"), col("n_c"), col("conv_t"), col("conv_c"),
        rd(col("uplift"), 6).as("uplift"), rd(col("qini_cum"), 4).as("qini_cum"))
      .orderBy("bucket")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_dau" -> rollingDau,
    "q_delta_decomp" -> deltaDecomp,
    "q_bitmap_distinct" -> bitmapDistinct,
    "q_weighted_quantile" -> weightedQuantile,
    "q_eb_shrinkage" -> ebShrinkage,
    "q_qini" -> qini)

  def oracles: Map[String, String] = Map(
    "q_rolling_dau" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM d),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY 1),
        |wau AS (SELECT days.day, CAST(count(DISTINCT d.user_id) AS BIGINT) AS wau
        |        FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
        |        GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau, TRUE AS wau_est_ok
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "q_delta_decomp" ->
      """WITH mm AS (
        |  SELECT CAST(min(o_orderdate) AS DATE)
        |           + CAST(floor(date_diff('day', CAST(min(o_orderdate) AS DATE),
        |                                  CAST(max(o_orderdate) AS DATE)) / 2) AS INTEGER)
        |           AS mid
        |  FROM orders),
        |seg AS (
        |  SELECT o_orderpriority AS segment,
        |    CASE WHEN CAST(o_orderdate AS DATE) < mm.mid THEN 'a' ELSE 'b' END AS period,
        |    CAST(count(*) AS BIGINT) AS n, sum(o_totalprice) AS tot
        |  FROM orders CROSS JOIN mm GROUP BY 1, 2),
        |per AS (SELECT period, CAST(sum(n) AS BIGINT) AS n_all FROM seg GROUP BY 1),
        |r AS (
        |  SELECT segment, period,
        |    CAST(n AS DOUBLE) / n_all AS share, tot / n AS rate
        |  FROM seg JOIN per USING (period)),
        |a AS (SELECT segment, share AS share_a, rate AS rate_a FROM r WHERE period = 'a'),
        |b AS (SELECT segment, share AS share_b, rate AS rate_b FROM r WHERE period = 'b')
        |SELECT segment,
        |  floor(share_a*1000000 + 0.5)/1000000 AS share_a,
        |  floor(share_b*1000000 + 0.5)/1000000 AS share_b,
        |  floor(rate_a*100 + 0.5)/100 AS rate_a,
        |  floor(rate_b*100 + 0.5)/100 AS rate_b,
        |  floor((share_b - share_a)*rate_a*10000 + 0.5)/10000 AS mix_effect,
        |  floor(share_a*(rate_b - rate_a)*10000 + 0.5)/10000 AS rate_effect,
        |  floor((share_b - share_a)*(rate_b - rate_a)*10000 + 0.5)/10000 AS interaction
        |FROM a JOIN b USING (segment) ORDER BY segment""".stripMargin,
    "q_bitmap_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_quantile" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    sum(l_quantity) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cumw,
        |    sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  floor(min(CASE WHEN cumw >= tot*0.25 THEN l_extendedprice END)*100 + 0.5)/100 AS wq25,
        |  floor(min(CASE WHEN cumw >= tot*0.5  THEN l_extendedprice END)*100 + 0.5)/100 AS wq50,
        |  floor(min(CASE WHEN cumw >= tot*0.75 THEN l_extendedprice END)*100 + 0.5)/100 AS wq75
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_eb_shrinkage" ->
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |fit AS (
        |  SELECT avg(CAST(k AS DOUBLE)/n) AS mu, var_samp(CAST(k AS DOUBLE)/n) AS v
        |  FROM per WHERE n >= 5),
        |ab AS (
        |  SELECT mu*(mu*(1.0-mu)/v - 1.0) AS alpha,
        |         (1.0-mu)*(mu*(1.0-mu)/v - 1.0) AS beta
        |  FROM fit)
        |SELECT user_id, n, k,
        |  floor(alpha*10000 + 0.5)/10000 AS alpha,
        |  floor(beta*10000 + 0.5)/10000 AS beta,
        |  floor((CAST(k AS DOUBLE)/n)*1000000 + 0.5)/1000000 AS rate_raw,
        |  floor(((k + alpha)/(n + alpha + beta))*100000 + 0.5)/100000 AS rate_eb
        |FROM per CROSS JOIN ab WHERE user_id < 40 ORDER BY user_id""".stripMargin,
    "q_qini" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted,
        |    floor(sum(CASE WHEN event_type <> 'purchase' THEN value ELSE 0.0 END)*100 + 0.5)/100 AS score,
        |    CAST(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS treated
        |  FROM events GROUP BY user_id),
        |dec AS (
        |  SELECT *, CAST(ntile(10) OVER (ORDER BY score DESC, user_id) AS BIGINT) AS bucket
        |  FROM per),
        |agg AS (
        |  SELECT bucket,
        |    CAST(sum(treated) AS BIGINT) AS n_t,
        |    CAST(sum(1 - treated) AS BIGINT) AS n_c,
        |    CAST(sum(converted * treated) AS BIGINT) AS conv_t,
        |    CAST(sum(converted * (1 - treated)) AS BIGINT) AS conv_c
        |  FROM dec GROUP BY 1)
        |SELECT bucket, n_t, n_c, conv_t, conv_c,
        |  floor((CAST(conv_t AS DOUBLE)/n_t - CAST(conv_c AS DOUBLE)/n_c)*1000000 + 0.5)/1000000 AS uplift,
        |  floor((CAST(sum(conv_t) OVER w AS DOUBLE)
        |         - CAST(sum(conv_c) OVER w AS DOUBLE)
        |           * CAST(sum(n_t) OVER w AS DOUBLE) / CAST(sum(n_c) OVER w AS DOUBLE))*10000 + 0.5)/10000 AS qini_cum
        |FROM agg
        |WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin)
}
