package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key event
  * stream onto a fixed grid and forward-fill the gaps — what every
  * telemetry/feature pipeline does before windowed models see the data.
  *
  *   1. bucket events to the grid (`date_trunc`) and aggregate per
  *      (key, bucket);
  *   2. explode each key's [min, max] span into the dense spine
  *      (`sequence` — rows only for the key's own active range);
  *   3. left-join actuals onto the spine and forward-fill with
  *      `last(value, ignoreNulls)` over an unbounded-preceding frame.
  *
  * Scale shape: one groupBy on (key, bucket), one per-key span
  * aggregate, one join + one window — all partitioned by key. Spine
  * size is Σ per-key active spans, never |keys| × global span: a key
  * alive for a day costs a day of buckets regardless of corpus span.
  * `is_gap` marks filled rows so downstream can weigh imputed points.
  */
object Resample {

  def forwardFill(events: DataFrame, keyCol: String, tsCol: String, valueExpr: Column,
                  unit: String = "hour"): DataFrame = {
    val step = unit match {
      case "minute" => expr("interval 1 minute")
      case "hour" => expr("interval 1 hour")
      case "day" => expr("interval 1 day")
      case other => throw new IllegalArgumentException(s"unsupported grid unit: $other")
    }
    val actual = events
      .withColumn("bucket", date_trunc(unit, col(tsCol)))
      .groupBy(col(keyCol), col("bucket"))
      .agg(valueExpr.as("v"))
    val spine = actual
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"), step)).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(actual, Seq(keyCol, "bucket"), "left")
      .withColumn("is_gap", col("v").isNull)
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
  }

  /** Additive seasonal decomposition (classical-decomposition / STL-
    * lite): x = trend + seasonal + residual over an ordered series —
    * trend from a centered (2·halfWindow+1)-row moving mean, seasonal
    * from the per-slot mean of the detrended values
    * (slot = position mod `period`), residual the leftover. The
    * monitoring prep that makes [[Anomaly.cusum]]/seasonalZ honest on
    * strongly cyclic series.
    *
    * Exactness: `valueCol` must be integer-valued (counts — the series
    * convention), so the moving-window sums are exact and the trend is
    * one exact division; per-slot seasonal means are 1e-9 fixed-point
    * sums over the detrended doubles; residual is two sequential
    * subtractions of identical doubles. Edge rows average over their
    * truncated window (standard classical-decomposition behavior).
    *
    * Scale contract: `series` is an ALREADY-AGGREGATED frame; the one
    * unpartitioned window runs on those rows, never raw events. */
  /** Autocorrelation function of an ordered series — the
    * periodicity/memory diagnostic that tells a monitoring pipeline
    * which seasonal period to decompose at and whether residuals are
    * white: for each lag k in 1..maxLag,
    *
    *   r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    *
    * (the standard biased-normalization ACF — denominator over the
    * full series). Integer-valued series (counts) keep x̄ an exact
    * ratio; cross-products are 1e-9 fixed-point summed, the final
    * division is one IEEE op per lag.
    *
    * Scale contract: `series` is pre-aggregated; the lag alignment is
    * ONE window pass producing all maxLag leads, so cost is
    * O(rows·maxLag) on the small series frame. */
  def acf(series: DataFrame, orderCol: String, valueCol: String,
          maxLag: Int = 10): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.orderBy(col(orderCol))
    val fx = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    val stats = series.agg(
      count(lit(1)).as("__n"), sum(col(valueCol).cast("long")).as("__s"))
      .select((col("__s").cast("double") / col("__n")).as("__mean"))
    val lagged = (1 to maxLag).foldLeft(
      series.select(col(orderCol), col(valueCol).cast("double").as("__x"))) {
      case (df, k) => df.withColumn(s"__lead_$k", lead(col("__x"), k).over(w))
    }.crossJoin(broadcast(stats))
    val denom = lagged.agg(
      (sum(fx((col("__x") - col("__mean")) * (col("__x") - col("__mean"))))
        .cast("double") / lit(1e9)).as("__d"))
    val numExprs = (1 to maxLag).map { k =>
      (sum(fx(when(col(s"__lead_$k").isNotNull,
        (col("__x") - col("__mean")) * (col(s"__lead_$k") - col("__mean")))
        .otherwise(lit(0.0)))).cast("double") / lit(1e9)).as(s"__num_$k")
    }
    val nums = lagged.agg(numExprs.head, numExprs.tail: _*)
    val acfCols = (1 to maxLag).map(k =>
      struct(lit(k).as("lag"), (col(s"__num_$k") / col("__d")).as("acf")))
    nums.crossJoin(broadcast(denom))
      .select(explode(array(acfCols: _*)).as("r"))
      .select(col("r.lag"), col("r.acf"))
  }

  /** Robust trend per series key: the Mann-Kendall monotone-trend
    * test (S = Σ_{i<j} sign(xⱼ − xᵢ), tie-corrected variance,
    * continuity-corrected z) plus the Theil-Sen slope (median of all
    * pairwise slopes) — the outlier-proof replacement for OLS slope
    * on dirty operational series. Everything except the final z
    * division is exact integer arithmetic; pairwise slopes are single
    * IEEE divisions and the median picks the lower-middle element
    * under a total (slope, i, j) order — deterministic cross-engine
    * with no tolerance.
    *
    * Shape: the pre-aggregated series self-joins per key (i < j) —
    * O(len²) PER KEY on the tiny per-key series frame (bounded by the
    * observation window, never raw events), all keys in parallel. */
  def robustTrend(series: DataFrame, keyCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    val idx = series.select(col(keyCol).as("k"),
      col(orderCol).as("t"), col(valueCol).cast("long").as("x"))
      .withColumn("i", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("t"))))
    val pairs = idx.select(col("k"), col("i"), col("x"))
      .join(idx.select(col("k"), col("i").as("j"), col("x").as("xj")), "k")
      .filter(col("i") < col("j"))
      .withColumn("sgn", signum((col("xj") - col("x")).cast("double")).cast("long"))
      .withColumn("slope",
        (col("xj") - col("x")).cast("double") / (col("j") - col("i")).cast("double"))
    val s = pairs.groupBy(col("k")).agg(
      sum(col("sgn")).as("s_stat"), count(lit(1)).as("n_pairs"))
    val n = idx.groupBy(col("k")).agg(count(lit(1)).as("n"))
    // tie correction: Σ t(t−1)(2t+5) over tied-value group sizes
    val ties = idx.groupBy(col("k"), col("x")).agg(count(lit(1)).as("tt"))
      .groupBy(col("k"))
      .agg(sum(col("tt") * (col("tt") - 1) * (lit(2) * col("tt") + 5)).as("tie_sum"))
    // lower-middle median of the pairwise slopes under (slope, i, j)
    val wSlope = Window.partitionBy(col("k")).orderBy(col("slope"), col("i"), col("j"))
    val med = pairs.withColumn("rn", row_number().over(wSlope))
      .join(s.select(col("k"), col("n_pairs")), "k")
      .filter(col("rn") === ((col("n_pairs") + 1) / 2).cast("long"))
      .select(col("k"), col("slope").as("theil_sen_slope"))
    val varS = (col("n").cast("double") * (col("n") - 1).cast("double")
      * (lit(2) * col("n") + 5).cast("double")
      - col("tie_sum").cast("double")) / lit(18.0)
    s.join(n, "k").join(ties, "k").join(med, "k")
      .withColumn("var_s", varS)
      .withColumn("z", when(col("var_s") > 0,
        (col("s_stat").cast("double") - signum(col("s_stat").cast("double")))
          / sqrt(col("var_s"))).otherwise(lit(0.0)))
      .select(col("k").as(keyCol), col("n"), col("s_stat"),
        col("var_s"), col("z"), col("theil_sen_slope"))
  }

  /** Cross-correlation function between two integer-valued series on
    * the same order column, lags −maxLag..maxLag:
    *   ccf(k) = Σ(x_t−μx)(y_{t+k}−μy) / √(Σ(x−μx)²·Σ(y−μy)²)
    * (negative k shifts x instead). The lead-lag diagnostic ACF can't
    * give: "purchases trail views by k minutes" shows up as the argmax
    * lag. Same exactness recipe as [[acf]]: means from exact integer
    * sums, every product rounded to 1e-9 fixed point and summed as
    * longs — engine-exact with no tolerance; one window pass builds
    * all 2·maxLag lead columns over the pre-aggregated series frame
    * (bounded by the time span, never raw events). */
  def ccf(series: DataFrame, orderCol: String, xCol: String, yCol: String,
          maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.orderBy(col(orderCol))
    val fx = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    val stats = series.agg(
      count(lit(1)).as("__n"),
      sum(col(xCol).cast("long")).as("__sx"),
      sum(col(yCol).cast("long")).as("__sy"))
      .select((col("__sx").cast("double") / col("__n")).as("__mx"),
        (col("__sy").cast("double") / col("__n")).as("__my"))
    val base = series.select(col(orderCol),
      col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
    val lagged = (1 to maxLag).foldLeft(base) { case (df, k) =>
      df.withColumn(s"__ly_$k", lead(col("__y"), k).over(w))
        .withColumn(s"__lx_$k", lead(col("__x"), k).over(w))
    }.crossJoin(broadcast(stats))
    val dx = col("__x") - col("__mx")
    val dy = col("__y") - col("__my")
    val denoms = lagged.agg(
      (sum(fx(dx * dx)).cast("double") / lit(1e9)).as("__dx"),
      (sum(fx(dy * dy)).cast("double") / lit(1e9)).as("__dy"))
    val numExprs =
      (1 to maxLag).map { k =>
        (sum(fx(when(col(s"__lx_$k").isNotNull,
          (col(s"__lx_$k") - col("__mx")) * dy).otherwise(lit(0.0))))
          .cast("double") / lit(1e9)).as(s"__num_n$k")
      } ++ Seq(
        (sum(fx(dx * dy)).cast("double") / lit(1e9)).as("__num_0")) ++
      (1 to maxLag).map { k =>
        (sum(fx(when(col(s"__ly_$k").isNotNull,
          dx * (col(s"__ly_$k") - col("__my"))).otherwise(lit(0.0))))
          .cast("double") / lit(1e9)).as(s"__num_p$k")
      }
    val nums = lagged.agg(numExprs.head, numExprs.tail: _*)
    val den = sqrt(col("__dx")) * sqrt(col("__dy"))
    val ccfCols =
      (1 to maxLag).map(k =>
        struct(lit(-k).as("lag"), (col(s"__num_n$k") / den).as("ccf"))) ++
      Seq(struct(lit(0).as("lag"), (col("__num_0") / den).as("ccf"))) ++
      (1 to maxLag).map(k =>
        struct(lit(k).as("lag"), (col(s"__num_p$k") / den).as("ccf")))
    nums.crossJoin(broadcast(denoms))
      .select(explode(array(ccfCols: _*)).as("r"))
      .select(col("r.lag"), col("r.ccf"))
  }

  def seasonalDecompose(series: DataFrame, orderCol: String, valueCol: String,
                        period: Int, halfWindow: Int): DataFrame = {
    require(period >= 2 && halfWindow >= 1,
      s"need period >= 2, halfWindow >= 1, got period=$period halfWindow=$halfWindow")
    val wTrend = Window.orderBy(col(orderCol))
      .rowsBetween(-halfWindow, halfWindow)
    val wPos = Window.orderBy(col(orderCol))
    val fx = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    val detrended = series
      .withColumn("trend",
        sum(col(valueCol)).over(wTrend).cast("double") /
          count(col(valueCol)).over(wTrend))
      .withColumn("__slot",
        ((row_number().over(wPos) - 1) % period).cast("int"))
      .withColumn("__dt", col(valueCol) - col("trend"))
    val seasonal = detrended.groupBy(col("__slot"))
      .agg(((sum(fx(col("__dt"))).cast("double") / lit(1e9)) /
        count(lit(1))).as("seasonal"))
    detrended.join(broadcast(seasonal), "__slot")
      .withColumn("residual", col("__dt") - col("seasonal"))
      .drop("__slot", "__dt")
  }
}
