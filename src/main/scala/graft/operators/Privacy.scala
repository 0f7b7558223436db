package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Privacy-risk audit for a release candidate — k-anonymity and
  * l-diversity (Sweeney 2002; Machanavajjhala et al. 2007) over a
  * chosen quasi-identifier set: every row whose quasi-identifier
  * combination is shared by fewer than k rows is linkable, and a
  * class whose sensitive attribute is (near-)constant leaks the
  * attribute even at k. The report is the per-class frame a
  * de-identification pass consumes (suppress or generalize the
  * violating classes) plus the headline rates.
  *
  * Scale shape: one hash aggregate keyed by the quasi-identifier
  * tuple (map-side combinable count + distinct-sensitive), then a
  * broadcast 1-row totals frame for the corpus-level rates — the data
  * is scanned once, nothing is sorted. `countDistinct` per class is
  * exact (classes are small by definition of the audit); swap in
  * `approx_count_distinct` only for the corpus-level diagnostics,
  * never for the l-diversity gate itself.
  */
object Privacy {

  /** Per-equivalence-class report: (quasi cols…, class_size,
    * l_diversity, risk = 1/class_size, violates_k, violates_l) plus
    * corpus-level columns repeated on every row: n_rows,
    * frac_rows_at_risk (share of ROWS in sub-k classes — the number
    * that matters, classes are not rows), min_class_size. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Int = 5, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2 && l >= 1, s"need k >= 2 and l >= 1, got k=$k l=$l")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("risk", lit(1.0) / col("class_size"))
      .withColumn("violates_k", col("class_size") < k)
      .withColumn("violates_l", col("l_diversity") < l)
    val totals = classes.agg(
      sum(col("class_size")).as("n_rows"),
      sum(when(col("violates_k"), col("class_size")).otherwise(0L)).as("__at_risk"),
      min(col("class_size")).as("min_class_size"))
      .select(col("n_rows"),
        (col("__at_risk").cast("double") / col("n_rows").cast("double"))
          .as("frac_rows_at_risk"),
        col("min_class_size"))
    classes.crossJoin(broadcast(totals))
  }

  /** t-closeness (Li, Li & Venkatasubramanian 2007) — the gate
    * k-anonymity and l-diversity both miss: a class can be large AND
    * diverse yet still leak because its sensitive-attribute
    * DISTRIBUTION differs from the corpus's (skewness attack). For an
    * ORDERED sensitive attribute the distance is the Earth Mover's
    * Distance with unit ground distance between adjacent values,
    * normalized by the value range:
    *   EMD(p, q) = (1/(m−1)) · Σ_{j<m} |CumP(j) − CumQ(j)|.
    *
    * The sensitive value is bucketed into fixed-width ordered bins
    * (`binWidth`) first — the standard practical move that bounds the
    * per-class distribution vector at m ≤ range/binWidth regardless of
    * corpus size. `violates_t` compares the 6-decimal-rounded EMD so
    * the boolean is engine-stable.
    *
    * Scale shape: one (class, bin) hash aggregate; the zero-filled
    * grid comes from a broadcast cross of the TINY distinct-bin frame
    * (≤ m rows at any scale) against per-class sizes; cumulatives are
    * windows PARTITIONED BY CLASS (parallel, m-bounded). No global
    * sort, no per-row window. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 binWidth: Long, t: Double = 0.2): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val qc = quasiCols.map(col)
    val binned = df.withColumn("__bin",
      floor(col(sensitiveCol).cast("double") / binWidth).cast("long"))
    // global per-bin counts (q) + the ordered bin universe
    val global = binned.groupBy(col("__bin")).agg(count(lit(1)).as("cq"))
    val nTotal = binned.agg(count(lit(1)).as("n_total"))
    // per-(class, bin) counts (p), zero-filled over the bin universe
    val perClassBin = binned.groupBy(qc :+ col("__bin"): _*)
      .agg(count(lit(1)).as("cp"))
    val classes = binned.groupBy(qc: _*).agg(count(lit(1)).as("class_size"))
    val grid = classes
      .crossJoin(broadcast(global))
      .join(perClassBin, quasiCols :+ "__bin", "left")
      .withColumn("cp", coalesce(col("cp"), lit(0L)))
    val wCum = Window.partitionBy(qc: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCls = Window.partitionBy(qc: _*)
    val emd = grid.crossJoin(broadcast(nTotal))
      .withColumn("cum_p", sum(col("cp")).over(wCum))
      .withColumn("cum_q", sum(col("cq")).over(wCum))
      .withColumn("m", count(lit(1)).over(wCls))
      .withColumn("last_bin", max(col("__bin")).over(wCls))
      // the final cumulative is 1−1 by construction: exclude it
      .filter(col("__bin") < col("last_bin"))
      .groupBy(qc :+ col("class_size"): _*)
      .agg((sum(abs(col("cum_p").cast("double") / col("class_size")
          - col("cum_q").cast("double") / col("n_total")))
        / (max(col("m")).cast("double") - 1.0)).as("emd"))
    val p = math.pow(10, 6)
    emd.withColumn("emd", floor(col("emd") * p + lit(0.5)) / p)
      .withColumn("violates_t", col("emd") > t)
      .select(qc ++ Seq(col("class_size"), col("emd"), col("violates_t")): _*)
  }

  /** The two STRONGER l-diversity instantiations from Machanavajjhala
    * et al. 2007 that distinct-count l-diversity ([[kAnonymity]]'s
    * `l_diversity` column) provably misses:
    *
    *  - **entropy l-diversity**: H(class) = −Σ p·ln p ≥ ln(l). A class
    *    can hold l distinct sensitive values yet be 98% one value —
    *    distinct-count passes, the adversary still wins; entropy
    *    doesn't.
    *  - **recursive (c,l)-diversity**: with per-class value counts
    *    r₁ ≥ r₂ ≥ … ≥ r_m, require r₁ < c·(r_l + r_{l+1} + … + r_m).
    *    The skew gate that tolerates a common value only while the
    *    tail beyond rank l−1 stays proportionally heavy; m < l fails
    *    by definition.
    *
    * Both flags compare 6-dp-rounded quantities (the shared
    * oracle-stable formula) so the booleans are engine-stable; the
    * entropy threshold ln(l) is itself rounded once to 6 dp and the
    * SAME literal is used by any cross-engine auditor.
    *
    * Scale shape: one (class, value) hash aggregate, then windows
    * PARTITIONED BY CLASS (per-class value lists are small by the
    * nature of a sensitive attribute — the window never sees more
    * rows than distinct sensitive values in one class). No global
    * sort, no cross join, no driver round-trip.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Int = 2, c: Double = 2.0): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2 (l=1 is vacuous), got $l")
    require(c > 0, s"c must be positive, got $c")
    val qc = quasiCols.map(col)
    val counts = df.groupBy(qc :+ col(sensitiveCol).cast("string").as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    // deterministic rank: count desc, value asc (ties broken stably)
    val wRank = Window.partitionBy(qc: _*)
      .orderBy(col("__cnt").desc, col("__v").asc)
    val wCls = Window.partitionBy(qc: _*)
    val p6 = math.pow(10, 6)
    val lnL = math.floor(math.log(l.toDouble) * p6 + 0.5) / p6
    val ranked = counts
      .withColumn("__rank", row_number().over(wRank))
      .withColumn("class_size", sum(col("__cnt")).over(wCls))
      .withColumn("__p", col("__cnt").cast("double") / col("class_size").cast("double"))
    // entropy accumulates FIXED-POINT longs (each p·ln p rounded at
    // 1e-12 before the sum): bit-stable under any shuffle order
    ranked
      .groupBy(qc :+ col("class_size"): _*)
      .agg(
        count(lit(1)).as("distinct_l"),
        (-sum(floor(col("__p") * log(col("__p")) * lit(1e12) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e12)).as("__entropy"),
        max(col("__cnt")).as("__r1"),
        sum(when(col("__rank") >= l, col("__cnt")).otherwise(0L)).as("__tail"))
      .select(qc ++ Seq(
        col("class_size"), col("distinct_l"),
        (floor(col("__entropy") * p6 + lit(0.5)) / p6).as("entropy"),
        (floor(col("__entropy") * p6 + lit(0.5)) / p6 >= lnL).as("entropy_ok"),
        col("__r1").as("top_count"),
        (col("__r1").cast("double") <
          floor(lit(c) * col("__tail").cast("double") * p6 + lit(0.5)) / p6)
          .as("recursive_ok")): _*)
  }

  /** ε-differentially-private group counts (Laplace mechanism,
    * b = sensitivity/ε) with SEEDED hash-derived noise: the 52-bit
    * md5-uniform (the weightedSample recipe) through the Laplace
    * inverse CDF, −b·sign(u−½)·ln(1−2|u−½|). Determinism is a feature
    * twice over: (1) re-running a release must NOT draw fresh noise —
    * averaging independent draws of the same statistic washes the
    * mechanism out, so one fixed (seed, statistic) → one noise value is
    * the correct noise-reuse discipline; (2) it makes the mechanism
    * auditable cross-engine (the oracle reproduces the exact release).
    * u ∈ (0,1) strictly (the +0.5 offset), so the log argument is in
    * (0,1] and the noise is always finite.
    *
    * Sensitivity contract: `sensitivity` must bound one protected
    * unit's contribution to ONE group's count (=1 when each unit
    * appears at most once per group — pre-aggregate to unit level
    * first) — and ε composes across every released statistic on the
    * same data; the caller owns the budget ledger.
    *
    * Emits n_true alongside n_dp: this is the CALIBRATION/audit view
    * (inspect the realized noise before publishing); a production
    * release projects n_dp only. Shape: one keyed count + a projection
    * — noise needs no second pass and no driver round-trip.
    *
    * SEED SECRECY IS PART OF THE PRIVACY GUARANTEE: the noise is a
    * deterministic function of (seed, group key), so anyone who knows
    * the seed can recompute and SUBTRACT it — a public or low-entropy
    * seed voids ε-DP entirely (the release degrades to the true
    * counts). There is deliberately NO default seed: the caller must
    * supply one, and for a real release it must be a secret,
    * high-entropy value managed like a key (and never shipped next to
    * the data). Determinism stays a feature — one (secret seed,
    * statistic) → one noise draw — but only under a secret seed. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               seed: String, sensitivity: Double = 1.0): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(sensitivity > 0, s"sensitivity must be positive, got $sensitivity")
    require(seed.nonEmpty, "dpCounts: seed must be non-empty — and SECRET " +
      "for a real release (a known seed makes the noise subtractable)")
    val b = sensitivity / epsilon
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_true"))
    val key = concat_ws(":", lit(seed) +: groupCols.map(c => col(c).cast("string")): _*)
    val h = conv(substring(md5(key), 1, 13), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    grouped
      .withColumn("noise", noise)
      .select(groupCols.map(col) ++ Seq(col("n_true"),
        (col("n_true") + col("noise")).as("n_dp"),
        col("noise"), lit(epsilon).as("epsilon")): _*)
  }
}
