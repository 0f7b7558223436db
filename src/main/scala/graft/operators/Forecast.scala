package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Holt linear-trend exponential smoothing (double exponential
  * smoothing) per series key — the one-step-beyond-EMA forecaster:
  * EMA tracks level only and lags any trending series; Holt carries a
  * second smoothed state for the trend and extrapolates it.
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *   ŷ_{n+h} = l_n + h·b_n
  *
  * Initialization is the textbook two-point start: l₁ = x₁,
  * b₁ = x₂ − x₁, then the update runs over x₂..x_n.
  *
  * Determinism: the recurrence is inherently sequential, so it runs
  * as ONE codegen'd `aggregate` fold over the per-key time-sorted
  * array — a fixed operation order, bit-identical on every engine
  * that folds the same order (the DuckDB oracle's recursive CTE
  * recomputes the same expressions verbatim). α/β must be exactly
  * representable doubles (0.5, 0.25, …) so `1−α` is exact on both
  * sides.
  *
  * Scale shape: one hash aggregate keyed by series key builds the
  * array (a series is one key's history — bounded, same contract as
  * sequence packing / sessionize), then the fold is a pure projection.
  * No window, no cross-key anything; 10⁹ keys parallelize freely.
  * NOT for a single unbounded series — that is a streaming job
  * (stateful mapGroupsWithState carrying (l, b)), not a batch fold.
  */
object Forecast {

  /** Per-key Holt state + h-step-ahead forecasts. Input: one row per
    * (key, t, x) observation, t unique within key. Returns one row per
    * key with ≥ 2 observations: (key, n, level, trend,
    * fc_1..fc_`horizon`). Keys with a single point have no definable
    * trend and are dropped (document, don't guess). */
  def holtLinear(df: DataFrame, keyCol: String, tCol: String, xCol: String,
                 alpha: Double, beta: Double, horizon: Int = 3): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"need 0 < alpha, beta < 1, got alpha=$alpha beta=$beta")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    // exactness of 1−α / 1−β is what makes the oracle literal-matchable
    val a = alpha.toString
    val oa = (1.0 - alpha).toString
    val b = beta.toString
    val ob = (1.0 - beta).toString
    val series = df
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(tCol).as("t"),
        col(xCol).cast("double").as("x")))).as("s"))
      .filter(size(col("s")) >= 2)
      .withColumn("xs", expr("transform(s, e -> e.x)"))
    // l_new appears inside b_new unexpanded (no lateral binding in the
    // lambda) — the oracle recursion recomputes it identically, so the
    // doubles stay bit-equal
    val lNew = s"CAST($a AS DOUBLE) * x + CAST($oa AS DOUBLE) * (acc.l + acc.b)"
    val fold = series.withColumn("st", expr(
      s"""aggregate(
         |  slice(xs, 2, size(xs) - 1),
         |  named_struct('l', element_at(xs, 1),
         |               'b', element_at(xs, 2) - element_at(xs, 1)),
         |  (acc, x) -> named_struct(
         |    'l', $lNew,
         |    'b', CAST($b AS DOUBLE) * (($lNew) - acc.l) + CAST($ob AS DOUBLE) * acc.b),
         |  acc -> acc)""".stripMargin))
    val base = fold.select(col(keyCol), size(col("xs")).cast("long").as("n"),
      col("st.l").as("level"), col("st.b").as("trend"))
    (1 to horizon).foldLeft(base) { (acc, h) =>
      acc.withColumn(s"fc_$h", col("level") + lit(h.toDouble) * col("trend"))
    }
  }

  /** Per-key ordinary-least-squares linear trend: slope, intercept, r²
    * from the closed-form moment solution — the parametric complement
    * to the Theil–Sen robust slope (exact CIs and r² when the noise is
    * well-behaved; Theil–Sen when it isn't).
    *
    * Engine-exactness: t is RE-BASED to the key's min (small offsets),
    * x accumulates as 1e-2 fixed-point int64, so all six moment sums
    * (n, Σt, Σt², Σx, Σx², Σtx) are exact integers under any row
    * order; cov = nΣtx−ΣtΣx and the two variances stay in int64 (the
    * re-basing is what keeps Σt² small — audit the headroom for >10⁶
    * observations·spans per key), and the closing slope/intercept/r²
    * divisions are the only float ops, in one mirrored order. Keys
    * with zero t-variance (single timestamp) emit NULL slope/r²
    * (undefined, not zero).
    *
    * Shape: one window-min over the key (re-base) + one keyed
    * aggregate — the window and the aggregate share the same shuffle
    * key, so the exchange is reused. */
  def olsTrend(df: DataFrame, keyCol: String, tCol: String, xCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val based = df
      .withColumn("__tb", (col(tCol) - min(col(tCol)).over(w)).cast("long"))
      .withColumn("__fx", floor(col(xCol) * 100 + lit(0.5)).cast("long"))
    val m = based.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__tb")).as("st"),
      sum(col("__tb") * col("__tb")).as("st2"),
      sum(col("__fx")).as("sx"),
      sum(col("__fx") * col("__fx")).as("sx2"),
      sum(col("__tb") * col("__fx")).as("stx"))
    m.withColumn("cov", col("n") * col("stx") - col("st") * col("sx"))
      .withColumn("vart", col("n") * col("st2") - col("st") * col("st"))
      .withColumn("varx", col("n") * col("sx2") - col("sx") * col("sx"))
      .select(col(keyCol), col("n"),
        when(col("vart") > 0,
          col("cov").cast("double") / col("vart") / 100).as("slope"),
        when(col("vart") > 0,
          (col("sx").cast("double") / 100) / col("n")
            - (col("cov").cast("double") / col("vart") / 100)
              * (col("st").cast("double") / col("n"))).as("intercept"),
        when(col("vart") > 0 && col("varx") > 0,
          (col("cov").cast("double") * col("cov").cast("double"))
            / (col("vart").cast("double") * col("varx").cast("double"))).as("r2"))
  }
}
