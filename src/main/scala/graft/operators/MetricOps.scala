package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-metric primitives a lakehouse serving layer runs daily:
  * rolling-window distinct actives (DAU/WAU), period-over-period
  * metric delta decomposition (mix vs rate), bitmap-based exact
  * distinct counting, weighted quantiles, empirical-Bayes rate
  * shrinkage, and uplift (Qini) deciles.
  *
  * Extends the reference's dashboard surface (daily-grain metric
  * views, e.g. realtime-metrics-sql-pack.sql A1's per-minute health trend)
  * with the rolling/decomposition layer those views feed.
  *
  * Every operator is a keyed shuffle shape — no driver loops, no
  * all-pairs joins. The only global window is over |segments|- or
  * |users|-sized frames (documented per call).
  */
object MetricOps {

  /** Rolling 7-day distinct actives per day, exact AND sketched.
    *
    * Exact WAU without a range self-join: each distinct (user, day)
    * pair contributes to the 7 window-ends it can be counted in —
    * explode to (user, window_end), distinct, count. That is a
    * fan-out of exactly `windowDays` rows per active-pair and a
    * hash-key shuffle, vs the `days × events` range join the naive
    * SQL runs — at 100 TB the explode ships |distinct pairs| × 7
    * narrow rows, all equi-keyed.
    *
    * The HLL path is the at-scale swap: per-day sketches (one tiny
    * row per day), exploded the same way and merged with
    * hll_union_agg — register-max merge is order-independent, so the
    * estimate is deterministic. Emitted as a within-5%-of-exact
    * boolean so the oracle can predict it.
    */
  def rollingActives(events: DataFrame, userCol: String, tsCol: String,
                     windowDays: Int = 7): DataFrame = {
    val e = events.select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
    val pairs = e.distinct() // one shuffle on (user, day)
    val days = pairs.select(col("day")).distinct()
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val fan = (d: Column) => explode(sequence(d, date_add(d, windowDays - 1)))
    val wau = pairs.select(col("user_id"), fan(col("day")).as("day"))
      .distinct()
      .join(days, "day") // drop window-ends past the observed calendar
      .groupBy("day").agg(count(lit(1)).as("wau"))
    val sketched = e.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(col("sk"), fan(col("day")).as("day"))
      .join(days, "day")
      .groupBy("day").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_est"))
    dau.join(wau, "day").join(sketched, "day")
      .select(col("day"), col("dau"), col("wau"),
        (abs(col("wau_est") - col("wau")).cast("double") <=
          col("wau").cast("double") * 0.05).as("wau_est_ok"))
      .orderBy("day")
  }

  /** Period-over-period decomposition of a ratio metric into per-
    * segment mix shift vs rate change (the "why did the average
    * move" report):
    *
    *   Δavg = Σ_seg (share_b−share_a)·rate_a      (mix effect)
    *        + Σ_seg share_a·(rate_b−rate_a)       (rate effect)
    *        + Σ_seg (share_b−share_a)·(rate_b−rate_a)  (interaction)
    *
    * Two keyed aggregates and a |segments|-row self-join — the fact
    * table is scanned once. `periodCol` must be a two-valued "a"/"b"
    * column.
    */
  def deltaDecomposition(df: DataFrame, segCol: String, periodCol: String,
                         valueCol: String): DataFrame = {
    val seg = df.groupBy(col(segCol).as("segment"), col(periodCol).as("period"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("tot"))
    val per = seg.groupBy("period").agg(sum(col("n")).as("n_all"))
    val r = seg.join(per, "period")
      .select(col("segment"), col("period"),
        (col("n").cast("double") / col("n_all")).as("share"),
        (col("tot") / col("n")).as("rate"))
    def side(p: String) = r.filter(col("period") === p)
      .select(col("segment"), col("share").as(s"share_$p"), col("rate").as(s"rate_$p"))
    val ds = col("share_b") - col("share_a")
    val dr = col("rate_b") - col("rate_a")
    side("a").join(side("b"), "segment")
      .select(col("segment"), col("share_a"), col("share_b"),
        col("rate_a"), col("rate_b"),
        (ds * col("rate_a")).as("mix_effect"),
        (col("share_a") * dr).as("rate_effect"),
        (ds * dr).as("interaction"))
      .orderBy("segment")
  }

  /** EXACT distinct count via roaring-style bitmaps — the two-level
    * pattern every warehouse uses when approx isn't allowed but a
    * global countDistinct shuffle of raw ids is too wide: ids fold
    * into fixed 4 KB bucket bitmaps map-side (bitmap_construct_agg is
    * a partial aggregate), so the shuffle carries
    * |keys|·|buckets-touched| bitmap rows instead of |rows| ids, then
    * popcounts sum. Positions are 1-based: callers with 0-based ids
    * pass idCol already shifted.
    */
  def bitmapDistinct(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol), expr(s"bitmap_bucket_number($idCol)").as("bkt"))
      .agg(expr(s"bitmap_construct_agg(bitmap_bit_position($idCol))").as("bm"))
      .groupBy(col(keyCol))
      .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))

  /** Weighted quantiles per group: cumulative-weight crossing over a
    * deterministic total order. One shuffle on the group key, one
    * in-partition sort; the crossing row is picked with a conditional
    * MIN (prices are non-decreasing along cumw, so min-over-suffix =
    * first crossing) — no second pass, no driver collect. Weights
    * must be > 0 for the crossing to be unique.
    */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                        weightCol: String, tieCols: Seq[String],
                        qs: Seq[Double]): DataFrame = {
    val ord = Window.partitionBy(col(groupCol))
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    val whole = Window.partitionBy(col(groupCol))
    val cum = df
      .withColumn("cumw", sum(col(weightCol)).over(ord))
      .withColumn("tot", sum(col(weightCol)).over(whole))
    val aggs = qs.map { q =>
      min(when(col("cumw") >= col("tot") * q, col(valueCol)))
        .as(s"wq${(q * 100).round}")
    }
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    * per-key event rates: fit a Beta(α, β) prior on keys with enough
    * trials, then posterior-mean every key as (k+α)/(n+α+β). The fit
    * is one tiny aggregate broadcast back over the per-key frame —
    * raw rates of sparse keys stop whipsawing the ranking.
    * Returns (key, n, k, alpha, beta, rate_raw, rate_eb).
    *
    * Degenerate-prior guard: the method-of-moments fit is undefined
    * when the qualifying keys give v = 0 (all rates identical), v is
    * NULL (fewer than 2 qualifying keys), v ≥ μ(1−μ) (over-dispersed →
    * negative α/β), or μ ∉ (0,1) (all-zero / all-one rates). In every
    * such case α/β are emitted as NULL and rate_eb falls back to
    * rate_raw — the NULL-on-undefined convention (degreeAssortativity)
    * instead of silently shipping Infinity or a rate outside [0,1]. */
  def ebShrinkRates(perKey: DataFrame, keyCol: String, nCol: String, kCol: String,
                    minTrials: Int = 5): DataFrame = {
    val prior = perKey.filter(col(nCol) >= minTrials)
      .select((col(kCol).cast("double") / col(nCol)).as("r"))
      .agg(avg(col("r")).as("mu"), var_samp(col("r")).as("v"))
      .select(col("mu"), col("v"),
        when(col("v") > 0 && col("mu") > 0 && col("mu") < 1,
          col("mu") * (lit(1.0) - col("mu")) / col("v") - 1.0).as("m"))
      .select(when(col("m") > 0, col("mu") * col("m")).as("alpha"),
        when(col("m") > 0, (lit(1.0) - col("mu")) * col("m")).as("beta"))
    perKey.crossJoin(broadcast(prior))
      .select(col(keyCol), col(nCol), col(kCol), col("alpha"), col("beta"),
        (col(kCol).cast("double") / col(nCol)).as("rate_raw"),
        coalesce(
          (col(kCol) + col("alpha")) / (col(nCol) + col("alpha") + col("beta")),
          col(kCol).cast("double") / col(nCol)).as("rate_eb"))
  }

  /** Qini / uplift deciles: rank units by a targeting score, cut into
    * `k` ntile buckets, and report per-bucket treated/control
    * conversion plus the cumulative Qini value
    * cum(conv_t) − cum(conv_c)·cum(n_t)/cum(n_c).
    *
    * The global ntile runs over the PER-UNIT frame (|units| rows,
    * already aggregated from the event log) — fine to |units| ~ 10⁹;
    * at that point swap the cut for approx_percentile boundaries.
    * Score ties must be pre-broken (pass a deterministic tieCol).
    */
  def qiniDeciles(units: DataFrame, scoreCol: String, tieCol: String,
                  treatedCol: String, convertedCol: String, k: Int = 10): DataFrame = {
    val byScore = Window.orderBy(col(scoreCol).desc, col(tieCol))
    val dec = units.withColumn("bucket", ntile(k).over(byScore).cast("long"))
    val t = col(treatedCol)
    val byDec = dec.groupBy("bucket").agg(
      sum(t).as("n_t"), sum(lit(1) - t).as("n_c"),
      sum(col(convertedCol) * t).as("conv_t"),
      sum(col(convertedCol) * (lit(1) - t)).as("conv_c"))
    val cum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec
      .withColumn("uplift",
        col("conv_t").cast("double") / col("n_t") -
          col("conv_c").cast("double") / col("n_c"))
      .withColumn("qini_cum",
        sum(col("conv_t")).over(cum).cast("double") -
          sum(col("conv_c")).over(cum).cast("double") *
            sum(col("n_t")).over(cum) / sum(col("n_c")).over(cum))
      .orderBy("bucket")
  }
}
