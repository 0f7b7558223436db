package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Poisson bootstrap — the distributed-native resampling scheme for
  * confidence intervals on aggregate metrics: classic bootstrap draws
  * n-out-of-n WITH replacement (needs global coordination); the
  * Poisson approximation gives every row an independent
  * Poisson(1) multiplicity per replicate, which is embarrassingly
  * parallel — each replicate is just a weighted aggregate, and B
  * replicates are one explode + one keyed aggregate over (replicate)
  * (the production-scale bootstrap, e.g. Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams", Google 2012).
  *
  * Determinism: the multiplicity is hash-derived, not rand() — u =
  * (md5(id ‖ replicate) → 52-bit mantissa), inverted through the
  * Poisson(1) CDF ladder whose cumulative thresholds are Scala-
  * computed double constants shared verbatim with the oracle; every
  * engine draws the identical multiplicities. Multiplicity is capped
  * at 7 (P(X>7) ≈ 1e-5 — bias far below any CI width).
  *
  * Exactness: replicate means are ratios of exact fixed-point sums
  * (cents × integer multiplicities); the CI bounds are order
  * statistics of the B-row replicate frame picked by row_number —
  * exact, no interpolation. Windows touch only the B-row frame.
  *
  * Scale note: the explode costs B× the scan. At 100 TB run the B
  * counters in ONE pass instead (B weighted-sum columns in a single
  * aggregate — same algebra, no explode); the exploded form is kept
  * here because it is the SQL-oracle-expressible twin. */
object Bootstrap {

  /** Cumulative Poisson(1) CDF thresholds for multiplicities 0..6;
    * a uniform above the last threshold draws 7. */
  val PoissonCdf: Seq[Double] = {
    val pmf = (0 to 6).scanLeft(math.exp(-1.0)) { case (p, k) => p / (k + 1) }.take(7)
    pmf.scanLeft(0.0)(_ + _).tail
  }

  /** Per-(row, replicate) Poisson(1) multiplicity from the seeded id
    * hash — the CDF-ladder inversion. */
  private def multiplicity(id: Column, rep: Column, seed: String): Column = {
    val h = conv(substring(md5(concat_ws(":", lit(seed), id.cast("string"),
      rep.cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    // sequential CASE ladder — smallest threshold checked FIRST
    PoissonCdf.zipWithIndex.tail
      .foldLeft(when(u < lit(PoissonCdf.head), 0)) { case (acc, (thr, k)) =>
        acc.when(u < lit(thr), k)
      }
      .otherwise(lit(7))
  }

  /** Bootstrap CI for the MEAN of `valueCol` (2-decimal metric):
    * one row — n, point estimate, B, and the (alphaLo, alphaHi) order-
    * statistic bounds of the replicate means. */
  def poissonBootstrapMean(df: DataFrame, idCol: String, valueCol: String,
                           b: Int = 50, loRank: Int = 2, hiRank: Int = 49,
                           seed: String = "boot"): DataFrame = {
    require(b >= 4 && loRank >= 1 && hiRank <= b && loRank < hiRank,
      s"need 1 <= loRank < hiRank <= b, got b=$b lo=$loRank hi=$hiRank")
    val cents = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    val base = df.select(col(idCol).as("__id"), cents.as("__c"))
    val reps = base
      .select(col("__id"), col("__c"), explode(sequence(lit(1), lit(b))).as("__r"))
      .withColumn("__m", multiplicity(col("__id"), col("__r"), seed))
      .groupBy(col("__r"))
      .agg(sum(col("__m") * col("__c")).as("__s"), sum(col("__m")).as("__w"))
      .filter(col("__w") > 0)
      .withColumn("rep_mean", (col("__s").cast("double") / 100) / col("__w"))
    val wAsc = Window.orderBy(col("rep_mean"), col("__r"))
    val ranked = reps.withColumn("__rk", row_number().over(wAsc))
    val bounds = ranked
      .filter(col("__rk") === loRank || col("__rk") === hiRank)
      .agg(min(col("rep_mean")).as("ci_lo"), max(col("rep_mean")).as("ci_hi"))
    val point = base.agg(count(lit(1)).as("n"),
      ((sum(col("__c")).cast("double") / 100) / count(lit(1))).as("mean"))
    point.crossJoin(broadcast(bounds)).withColumn("b", lit(b))
      .select(col("n"), col("mean"), col("b"), col("ci_lo"), col("ci_hi"))
  }

  /** Delete-one-GROUP jackknife SE for the mean of `valueCol`
    * (2-decimal metric, same cent-exact contract as
    * [[poissonBootstrapMean]]) (Efron;
    * the grouped/block form — delete-one-ROW is pointless at corpus
    * scale and the block form is also what correlated-within-group
    * data needs, e.g. users as groups): for each of the G groups,
    * θ̂₋g = (S − s_g)/(N − n_g), then
    * SE² = (G−1)/G · Σ (θ̂₋g − θ̄)², θ̄ = mean of the θ̂₋g.
    * The deterministic, no-resampling complement to
    * [[poissonBootstrapMean]]: one pass, exact, no replicate fan-out.
    *
    * Exactness: S/s_g are exact cent sums, so each θ̂₋g is one double
    * division of exact integers, then quantized to 1e-9 fixed point —
    * θ̄ becomes an exact long sum, each deviation is
    * (θ_fp·G − Σθ_fp)/(1e9·G) (one division of exact integers, no
    * float-order anywhere), and the squared deviations are quantized
    * to 1e-12 before their own exact sum. Shape: one group aggregate +
    * two 1-row broadcasts back over the G-row frame; degenerate G=1
    * (SE undefined) or any group with n_g = N emit NULL se.
    * Returns (g = G, mean, se_jack). */
  def jackknifeMean(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    // three consumers (tot, loo, and loo's second read through bar) —
    // leaf barrier so the log scan+aggregate runs once
    val per = graft.core.Lineage.truncate(
      df.select(col(groupCol).as("__g"), cents.as("__c"))
        .groupBy(col("__g"))
        .agg(sum(col("__c")).as("s_g"), count(lit(1)).as("n_g")))
    val tot = per.agg(sum(col("s_g")).as("s"), sum(col("n_g")).as("n"),
      count(lit(1)).as("g"))
    val loo = per.crossJoin(broadcast(tot))
      .withColumn("theta_fp",
        when(col("n") > col("n_g"),
          floor(((col("s") - col("s_g")).cast("double") / 100) / (col("n") - col("n_g"))
            * lit(1000000000L) + lit(0.5)).cast("long")))
    val bar = loo.agg(sum(col("theta_fp")).as("sum_fp"),
      count(when(col("theta_fp").isNull, 1)).as("n_bad"))
    loo.crossJoin(broadcast(bar))
      .withColumn("dev",
        (col("theta_fp") * col("g") - col("sum_fp")).cast("double") /
          (lit(1e9) * col("g")))
      .agg(max(col("g")).as("g"),
        ((max(col("s")).cast("double") / 100) / max(col("n"))).as("mean"),
        max(col("n_bad")).as("__bad"),
        sum(floor(col("dev") * col("dev") * lit(1e12) + lit(0.5)).cast("long")).as("__ss"))
      .select(col("g"), col("mean"),
        when(col("g") > 1 && col("__bad") === 0,
          sqrt((col("g") - 1).cast("double") / col("g") *
            (col("__ss").cast("double") / 1e12))).as("se_jack"))
  }
}
