package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-scan table profiling — the data-quality summary a lakehouse
  * job publishes per table (null rates, cardinalities, value ranges):
  * one row per column from ONE pass over the data.
  *
  * Shape: all per-column aggregates are computed in a single `agg`
  * (Spark plans the multiple DISTINCT aggregates with one Expand over
  * one scan — rows multiply by the distinct-agg count, but the table
  * is still read once), then the single wide row is exploded into
  * per-column rows. At 100 TB swap the exact `count(DISTINCT ...)`
  * for `approx_count_distinct` — same plan without the Expand; the
  * exact form is kept here because the cross-engine oracle must
  * predict it.
  *
  * min/max are rendered to VARCHAR deterministically per type family
  * (doubles through DECIMAL(28,6), timestamps second-truncated,
  * integers/strings verbatim) so two engines produce byte-identical
  * strings — raw double→string formatting is NOT portable (Java
  * switches to E-notation at 1e7, DuckDB never does).
  */
object Profiler {

  private def render(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(28, 6)).cast("string")
    case TimestampType => date_trunc("second", c).cast("string")
    case _ => c.cast("string")
  }

  /** One profile row per column: (col_name, n_rows, n_nonnull,
    * n_distinct, min_val, max_val). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val fields = cols.map(c => df.schema(c))
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__nn_${f.name}"),
        countDistinct(c).as(s"__nd_${f.name}"),
        render(min(c), f.dataType).as(s"__min_${f.name}"),
        render(max(c), f.dataType).as(s"__max_${f.name}"))
    }
    val structs = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_${f.name}").as("n_nonnull"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__min_${f.name}").as("min_val"),
        col(s"__max_${f.name}").as("max_val"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Equi-depth (equal-frequency) histogram: `bins` buckets whose
    * boundaries are the exact 1/bins .. (bins-1)/bins percentiles, then
    * one counting pass with the (bins-1)-element boundary array
    * broadcast into a scalar fold — no sort, no second shuffle of the
    * data. Bucket of x = #boundaries strictly below x, so ties on a
    * boundary all land in the lower bucket (deterministic, order-free).
    * Two scans total; at 100 TB swap `percentile` for
    * `approx_percentile` — the exact form is kept because the
    * cross-engine oracle must predict it (Spark `percentile` ≡ DuckDB
    * `quantile_cont` bit-for-bit). Pass bins as a power of two so the
    * percentile fractions are exact binary doubles on both engines. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, bins: Int,
                         boundaryDecimals: Int = 6): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    val ps = (1 until bins).map(i => s"CAST(${i}.0/${bins}.0 AS DOUBLE)").mkString(", ")
    // Boundaries are rounded (half-up at `boundaryDecimals`) BEFORE the
    // comparison pass: when a percentile lands exactly on a duplicated
    // data value, engines disagree in the last ulp of the interpolation
    // (a + f*(b-a) vs (1-f)*a + f*b) and rows sitting ON the boundary
    // would flip bins. Input data at 2 decimals puts true boundaries on
    // a 5-decimal grid, so 6-decimal rounding absorbs the drift without
    // merging distinct boundaries.
    val scale = math.pow(10, boundaryDecimals).toLong
    val bounds = df.agg(expr(
      s"""transform(percentile($valueCol, array($ps)),
         | b -> CAST(FLOOR(b * $scale.0 + 0.5) AS DOUBLE) / $scale.0)""".stripMargin)
      .as("__bounds"))
    df.select(col(valueCol)).crossJoin(broadcast(bounds))
      .withColumn("bin_id",
        expr(s"aggregate(__bounds, 0, (acc, b) -> acc + (CASE WHEN $valueCol > b THEN 1 ELSE 0 END))"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n"), min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .orderBy("bin_id")
  }

  /** Robust per-group outlier detection: a row is an outlier when its
    * absolute deviation from the group MEDIAN exceeds `k` × MAD ×
    * 1.4826 (the normal-consistency constant — Hampel's rule; k=3 ≈
    * "3 robust sigmas"). Median/MAD resist the very outliers that drag
    * mean/stddev toward themselves, which is why this beats a z-score
    * gate on dirty telemetry.
    *
    * Two aggregate passes by construction (MAD needs the median first):
    * fact → per-key median (broadcast back) → per-key MAD (broadcast
    * back) → flag. Group-stat tables are |keys| rows, so both
    * join-backs broadcast; the fact shuffles twice on the key, never
    * more. Exact `percentile` keeps the cross-engine oracle exact —
    * swap `approx_percentile` at 100 TB (same plan shape). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
                  k: Double = 3.0, boundaryDecimals: Int = 6): DataFrame = {
    // med/mad are rounded like the histogram boundaries above: rows
    // sitting exactly ON the k·MAD fence would otherwise flip with the
    // engines' last-ulp percentile-interpolation drift
    val scale = math.pow(10, boundaryDecimals).toLong
    def roundedP50(c: String) =
      expr(s"CAST(FLOOR(percentile($c, CAST(0.5 AS DOUBLE)) * $scale.0 + 0.5) AS DOUBLE) / $scale.0")
    val med = df.groupBy(col(keyCol)).agg(roundedP50(valueCol).as("med"))
    val withMed = df.join(broadcast(med), keyCol)
      .withColumn("__absdev", abs(col(valueCol) - col("med")))
    val mad = withMed.groupBy(col(keyCol)).agg(roundedP50("__absdev").as("mad"))
    withMed.join(broadcast(mad), keyCol)
      .withColumn("is_outlier", col("__absdev") > lit(k) * lit(1.4826) * col("mad"))
      .drop("__absdev")
  }

  /** Per-key winsorization: clip a value column to its group's
    * [pLo, pHi] exact-percentile fences. Same rounded-boundary trick
    * as [[madOutliers]] (a row exactly ON a fence must not flip with
    * the engines' interpolation ulps). Fences come back as a tiny
    * per-key frame and broadcast onto the data — two passes, no sort
    * of the full table. The exact `percentile` swaps for
    * `approx_percentile` at 100 TB (same plan shape); exact is kept
    * here because the oracle compares values. */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
                pLo: Double = 0.05, pHi: Double = 0.95,
                boundaryDecimals: Int = 6): DataFrame = {
    val scale = math.pow(10, boundaryDecimals).toLong
    def roundedP(p: Double) =
      expr(s"CAST(FLOOR(percentile($valueCol, CAST($p AS DOUBLE)) * $scale.0 + 0.5) AS DOUBLE) / $scale.0")
    val fences = df.groupBy(col(keyCol))
      .agg(roundedP(pLo).as("lo"), roundedP(pHi).as("hi"))
    df.join(broadcast(fences), keyCol)
      .withColumn("clipped", least(greatest(col(valueCol), col("lo")), col("hi")))
  }

  /** Key-distribution diagnostic — the question every skew remedy
    * (Skew.saltedAgg/saltedJoin, AQE skew splits) starts from: how hot
    * is the hottest key? Emits the top-N keys with their share plus
    * the corpus-wide skew factor max/avg (1.0 = perfectly uniform);
    * a factor ≫ partition-count means one reducer owns the stage.
    * One groupBy + a 1-row broadcast of the totals — safe to point at
    * a 100 TB fact column as-is. */
  def keyDistribution(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum(col("n")).as("total"), count(lit(1)).as("n_keys"), max(col("n")).as("max_n"))
    counts.crossJoin(broadcast(stats))
      .select(col(keyCol), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"),
        (col("max_n").cast("double") * col("n_keys").cast("double") / col("total").cast("double"))
          .as("skew_factor"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topN)
  }
}
