package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classifier/score evaluation over DataFrames — metrics an LLM-data
  * pipeline runs on its quality/filter models. */
object Eval {

  /** ROC AUC of `scoreCol` as a ranker of the boolean `labelCol`,
    * computed WITHOUT a global row sort: group to per-score
    * (n_pos, n_neg) counts, then apply the Mann-Whitney identity
    *
    *   AUC = Σ_s n_pos(s) · (N_neg(<s) + n_neg(s)/2) / (P·N),
    *
    * i.e. the probability a random positive outranks a random negative
    * with ties counted half. The running negative count is a window
    * over the per-score frame — ≤ 10^grain rows for fixed-decimal
    * scores (the 4-dp curation convention), never corpus-sized.
    *
    * All internals are exact integers (the ½ tie term is kept as a
    * ×2-scaled numerator), so the single final division is the only
    * IEEE op — AUC hash-gates with no tolerance. Returns one row:
    * (n_pos, n_neg, auc) with auc rounded to 4 decimals; NULL auc when
    * either class is empty (AUC undefined).
    *
    * Scale shape: one keyed aggregation to the per-score frame, one
    * tiny window, one 1-row reduce. For scores too fine-grained to
    * bucket, round them first — AUC over 4-dp scores differs
    * negligibly and keeps the frame bounded. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .groupBy(col(scoreCol).as("__s"))
      .agg(
        count(when(col(labelCol), 1)).as("__np"),
        count(when(!col(labelCol), 1)).as("__nn"))
    val wAsc = Window.orderBy(col("__s")).rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("__cum_neg", coalesce(sum(col("__nn")).over(wAsc), lit(0L)))
      // 2x-scaled per-score contribution: pos·(2·neg_below + neg_here)
      .withColumn("__num2x", col("__np") * (lit(2) * col("__cum_neg") + col("__nn")))
      .agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__num2x")).as("__num"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          graft.queries.rd(col("__num").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 4)).as("auc"))
  }

  /** Reliability diagram + expected calibration error for a probability
    * scorer — "when the filter model says 0.8, is it right 80% of the
    * time?". Equal-width bins over [0, 1]: bin b = min(⌊p·B⌋, B−1).
    * Per bin: n, mean predicted confidence, empirical positive rate,
    * |gap|; plus the scalar ECE = Σ_b (n_b/N)·|gap_b| repeated on every
    * row (the diagram and the headline number in one frame).
    *
    * Exactness: bin assignment is floor of an exact product; per-bin
    * means are fixed-point (1e-12) BIGINT sums divided by exact
    * counts; ECE is the fixed-point sum of n_b·|gap_b| divided by N —
    * every emitted double is a division of cross-engine-identical
    * values, no tolerance.
    *
    * Scale shape: one partial+final aggregate to the B-row frame, one
    * broadcast 1-row reduce for N and ECE — corpus scanned once,
    * nothing sorted. `labelCol` must be 0.0/1.0 doubles (the LogReg
    * convention). */
  def calibration(df: DataFrame, probCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val fx = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e12) + lit(0.5)).cast("long")
    val perBin = df
      .withColumn("__b", least(floor(col(probCol) * lit(bins)), lit(bins - 1)).cast("int"))
      .groupBy(col("__b").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(fx(col(probCol))).as("__sp"),
        sum(col(labelCol).cast("long")).as("__npos"))
      .withColumn("avg_conf", (col("__sp").cast("double") / lit(1e12)) / col("n"))
      .withColumn("frac_pos", col("__npos").cast("double") / col("n"))
      .withColumn("abs_gap", abs(col("avg_conf") - col("frac_pos")))
    val tot = perBin.agg(
      sum(col("n")).as("__nt"),
      sum(fx(col("n") * col("abs_gap"))).as("__g"))
      .select(((col("__g").cast("double") / lit(1e12)) / col("__nt")).as("ece"))
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("avg_conf"), col("frac_pos"),
        col("abs_gap"), col("ece"))
  }

  /** Exact isotonic calibration over score bins — pool-adjacent-
    * violators via the minimax identity (Ayer et al. 1955; Barlow &
    * Brunk 1972): with bins ordered by score,
    *   rate_iso(i) = max_{j≤i} min_{k≥i} (Σ npos[j..k] / Σ n[j..k]),
    * which IS the PAV solution — no sequential pooling loop, so the
    * whole fit is dataflow: one corpus aggregate to the B-row bin
    * frame, prefix sums over it, then two nested min/max joins that
    * touch only B² tiny rows. The monotone-regression upgrade over
    * [[calibration]]'s raw per-bin rates (a calibration map must be
    * non-decreasing to be invertible into a decision threshold).
    *
    * Exactness: every range rate is one double division of exact
    * integer prefix-sum differences — identical in any engine; min/max
    * never accumulate, so there is no float-order surface at all.
    * Returns (bin, n, rate_raw, rate_iso), rate_iso non-decreasing.
    * `labelCol` must be 0/1 (the LogReg convention). */
  def isotonicFit(df: DataFrame, probCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val perBin = df
      .withColumn("__b", least(floor(col(probCol) * lit(bins)), lit(bins - 1)).cast("int"))
      .groupBy(col("__b").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("npos"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = perBin
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cp", sum(col("npos")).over(w))
    val js = pre.select(col("bin").as("j"),
      (col("cn") - col("n")).as("cnj"), (col("cp") - col("npos")).as("cpj"))
    val ks = pre.select(col("bin").as("k"), col("cn").as("cnk"), col("cp").as("cpk"))
    // B-row frames only: the non-equi joins below are bins²-sized
    val ranges = js.join(ks, col("j") <= col("k"))
      .select(col("j"), col("k"),
        (col("cpk") - col("cpj")).as("p"), (col("cnk") - col("cnj")).as("c"))
    val innerMin = perBin.select(col("bin").as("i"), col("n"), col("npos"))
      .join(ranges, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("n"), col("npos"), col("j"))
      .agg(min(col("p").cast("double") / col("c")).as("mn"))
    innerMin.groupBy(col("i"), col("n"), col("npos"))
      .agg(max(col("mn")).as("rate_iso"))
      .select(col("i").as("bin"), col("n"),
        (col("npos").cast("double") / col("n")).as("rate_raw"), col("rate_iso"))
  }

  /** Cohen's kappa — chance-corrected agreement between two labelings
    * (Cohen 1960), in the integer-cleared form: with diagonal count D,
    * marginal products Σ r_g·c_g and total N,
    *   κ = (D·N − Σ r_g·c_g) / (N² − Σ r_g·c_g)
    * (multiply (p_o − p_e)/(1 − p_e) through by N²) — exact integer
    * arithmetic to one closing division, NULL when p_e = 1 (both raters
    * constant and equal — κ undefined). Input is any (aCol, bCol) pair
    * frame (e.g. predicted vs true, or two annotators). One pair
    * groupBy + two marginal aggregates, all label-cardinality-sized.
    * The N²-order products (Σ r·c, d·N, N²) are computed in
    * decimal(38,0), not int64 — exact to N ≤ 10¹⁹ pairs, so the
    * 100 TB row count can't silently wrap a long (the closing
    * decimal→double casts are value-identical to the long→double
    * casts wherever a long would not have overflowed). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // cut the |A|×|B| confusion grid to a leaf: four aggregates below
    // consume it, and without the cut each one re-executes the whole
    // upstream pipeline (for q_kappa that upstream is the entire
    // NaiveBayes fit+score chain — measured ~2× the query)
    val cells = graft.core.Lineage.truncate(
      df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
        .agg(count(lit(1)).as("n")))
    val ra = cells.groupBy(col("a")).agg(sum(col("n")).as("r"))
    val cb = cells.groupBy(col("b").as("a")).agg(sum(col("n")).as("c"))
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val pe = ra.join(cb, Seq("a"), "inner")
      .agg(coalesce(sum(dec(col("r")) * dec(col("c"))), lit(0).cast("decimal(38,0)")).as("sab"))
    cells.agg(sum(col("n")).as("n_pairs"),
        sum(when(col("a") === col("b"), col("n")).otherwise(lit(0L))).as("d"))
      .crossJoin(broadcast(pe))
      .select(col("n_pairs"), col("d"),
        (col("d").cast("double") / col("n_pairs")).as("agreement"),
        when(dec(col("n_pairs")) * dec(col("n_pairs")) =!= col("sab"),
          (dec(col("d")) * dec(col("n_pairs")) - col("sab")).cast("double") /
            (dec(col("n_pairs")) * dec(col("n_pairs")) - col("sab")).cast("double")).as("kappa"))
  }

  /** Split-conformal prediction interval for a 1-feature regression —
    * the distribution-free uncertainty wrapper: fit on one hash slice,
    * take the ⌈(n+1)·q⌉-th smallest absolute residual on a disjoint
    * calibration slice as the interval half-width, and report the
    * empirical coverage of ŷ ± width on a third held-out slice
    * (finite-sample guarantee ≥ q under exchangeability — the point
    * of conformal).
    *
    * The model is exact closed-form OLS: slope/intercept from integer
    * sums (x, y integer-valued by contract), so the fit is bit-
    * identical cross-engine; the calibration quantile is an exact
    * order statistic (row_number over (residual, id) — ties
    * deterministic); coverage is a ratio of counts over comparisons of
    * identical doubles. No tolerance anywhere.
    *
    * Scale shape: three disjoint hash slices from ONE scan; the fit is
    * a 1-row aggregate; the order statistic sorts only the calibration
    * slice (swap in an approx quantile at 100 TB — the documented
    * exact→approx trade). Returns one row: split sizes, slope,
    * intercept, the interval half-width q_hat, and coverage. */
  def splitConformal(df: DataFrame, idCol: String, xCol: String, yCol: String,
                     quantile: Double = 0.9): DataFrame = {
    require(quantile > 0 && quantile < 1, s"quantile must be in (0,1), got $quantile")
    val b = Sampling.hashBucket(col(idCol), 100)
    val tagged = df.select(col(idCol).as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"),
      b.as("__b"))
    val fit = tagged.filter(col("__b") < 50).agg(
      count(lit(1)).as("n_fit"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("slope",
        (col("n_fit") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
          / (col("n_fit") * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
      .withColumn("intercept",
        (col("__sy").cast("double") - col("slope") * col("__sx")) / col("n_fit"))
      .select(col("n_fit"), col("slope"), col("intercept"))
    val resid = (frame: DataFrame) => frame.crossJoin(broadcast(fit))
      .withColumn("__r", abs(col("__y").cast("double")
        - (col("intercept") + col("slope") * col("__x"))))
    val calib = resid(tagged.filter(col("__b") >= 50 && col("__b") < 75))
    val nCalib = calib.agg(count(lit(1)).as("n_calib"))
    val w = Window.orderBy(col("__r"), col("__id"))
    val qhat = calib.withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(nCalib))
      .filter(col("__rk") === least(
        ceil((col("n_calib") + 1) * quantile).cast("long"), col("n_calib")))
      .select(col("n_calib"), col("__r").as("q_hat"))
    val test = resid(tagged.filter(col("__b") >= 75))
      .crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__r") <= col("q_hat"), 1L).otherwise(0L)).as("__cov"))
      .withColumn("coverage", col("__cov").cast("double") / col("n_test"))
    fit.crossJoin(broadcast(qhat)).crossJoin(broadcast(test))
      .select(col("n_fit"), col("n_calib"), col("n_test"),
        col("slope"), col("intercept"), col("q_hat"), col("coverage"))
  }

  /** Group-fairness report for a binary classifier — demographic
    * parity and equalized-odds diagnostics per protected group:
    * per-group selection rate, TPR, FPR (NULL where the class is
    * absent — a rate over nothing is undefined, not 0), plus the
    * corpus-level gaps repeated on every row: dp_gap = max−min
    * selection rate, eo_gap = max−min TPR. Every rate is a ratio of
    * exact integer counts — tolerance-free.
    *
    * Scale shape: ONE keyed aggregate to the |groups| frame carrying
    * all four confusion cells, then a broadcast 1-row gap reduce.
    * `labelCol`/`predCol` must be 0.0/1.0 doubles (LogReg.score
    * convention). */
  def groupFairness(df: DataFrame, groupCol: String, labelCol: String,
                    predCol: String): DataFrame = {
    val y = col(labelCol) === 1.0
    val p = col(predCol) === 1.0
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(y, 1L).otherwise(0L)).as("__np"),
        sum(when(p, 1L).otherwise(0L)).as("__npp"),
        sum(when(y && p, 1L).otherwise(0L)).as("__tp"),
        sum(when(!y && p, 1L).otherwise(0L)).as("__fp"))
      .withColumn("base_rate", col("__np").cast("double") / col("n"))
      .withColumn("sel_rate", col("__npp").cast("double") / col("n"))
      .withColumn("tpr",
        when(col("__np") > 0, col("__tp").cast("double") / col("__np")))
      .withColumn("fpr",
        when(col("n") - col("__np") > 0,
          col("__fp").cast("double") / (col("n") - col("__np"))))
      // |groups|-row leaf: the gap reduce and the result rows both read
      // it, instead of each re-running the whole scored pipeline
      .transform(graft.core.Lineage.truncate)
    val gaps = per.agg(
      (max(col("sel_rate")) - min(col("sel_rate"))).as("dp_gap"),
      (max(col("tpr")) - min(col("tpr"))).as("eo_gap"))
    per.crossJoin(broadcast(gaps))
      .select(col(groupCol), col("n"), col("base_rate"), col("sel_rate"),
        col("tpr"), col("fpr"), col("dp_gap"), col("eo_gap"))
  }

  /** Brier score with the Murphy decomposition — the proper-scoring
    * companion to [[calibration]]: over the same equal-width bins,
    *
    *   brier ≈ reliability − resolution + uncertainty
    *
    * with reliability = Σ n_b(conf_b − acc_b)²/N (how far confidence
    * sits from per-bin truth), resolution = Σ n_b(acc_b − ȳ)²/N (how
    * much the bins separate outcomes), uncertainty = ȳ(1−ȳ). The
    * identity is EXACT when forecasts are grouped by distinct value;
    * under equal-width binning it holds up to the within-bin forecast
    * variance (Stephenson's generalized decomposition) — small when
    * bins are narrow, zero for a perfect scorer (MixtureSpec pins
    * both regimes).
    *
    * Exactness: squared terms are fixed-point (1e-12) summed; ȳ and
    * per-bin means are integer-count ratios. One corpus scan for the
    * bins, one B-row reduce, one broadcast of ȳ. */
  def brierDecomposition(df: DataFrame, probCol: String, labelCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val fx = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e12) + lit(0.5)).cast("long")
    val perBin = df
      .withColumn("__b", least(floor(col(probCol) * lit(bins)), lit(bins - 1)).cast("int"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(fx(col(probCol))).as("__sp"),
        sum(col(labelCol).cast("long")).as("__npos"),
        sum(fx((col(probCol) - col(labelCol)) * (col(probCol) - col(labelCol))))
          .as("__sq"))
      .withColumn("__conf", (col("__sp").cast("double") / lit(1e12)) / col("__n"))
      .withColumn("__acc", col("__npos").cast("double") / col("__n"))
    val ybar = perBin.agg(
      (sum(col("__npos")).cast("double") / sum(col("__n"))).as("__ybar"))
    perBin.crossJoin(broadcast(ybar))
      .agg(
        sum(col("__n")).as("n"),
        ((sum(col("__sq")).cast("double") / lit(1e12))).as("__sqsum"),
        (sum(fx(col("__n") * (col("__conf") - col("__acc"))
          * (col("__conf") - col("__acc")))).cast("double") / lit(1e12)).as("__rel"),
        (sum(fx(col("__n") * (col("__acc") - col("__ybar"))
          * (col("__acc") - col("__ybar")))).cast("double") / lit(1e12)).as("__res"),
        first(col("__ybar")).as("__yb"))
      .select(col("n"),
        (col("__sqsum") / col("n")).as("brier"),
        (col("__rel") / col("n")).as("reliability"),
        (col("__res") / col("n")).as("resolution"),
        (col("__yb") * (lit(1.0) - col("__yb"))).as("uncertainty"))
  }

  /** 1e-9 fixed-point NDCG rank discounts: disc(i) = round(1e9/log₂(i+1)).
    * Shared by [[ndcgBinaryAtK]] and any oracle SQL generated against it
    * — both engines consume the SAME integer literals, so DCG/IDCG are
    * exact integer sums with no float-log or float-sum-order hazard. */
  def ndcgDiscountsFp(k: Int): Seq[Long] =
    (1 to k).map(i => math.floor(1e9 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** NDCG@k with binary relevance over an already-ranked candidate
    * list (one row per (query, rank ≤ k)): DCG = Σ rel·disc(rank),
    * IDCG = the ideal ranking's DCG = Σ_{i ≤ min(k, total_relevant)}
    * disc(i), NDCG = DCG/IDCG (0 when the query has no relevant
    * candidates at all). `totalRelCol` must carry the query's TOTAL
    * relevant-candidate count in the corpus — normalizing only against
    * relevant-found would gift every recall miss a perfect score.
    *
    * Engine-exactness: discounts are the [[ndcgDiscountsFp]] integer
    * table, so both DCG and IDCG accumulate in int64 and the single
    * final division is the only float op. Shape: pure projection +
    * one groupBy(query) — queries-row output, no joins. */
  def ndcgBinaryAtK(ranked: DataFrame, queryCol: String, rankCol: String,
                    relCol: String, totalRelCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k must be in [1, 20], got $k")
    val disc = ndcgDiscountsFp(k)
    val prefix = disc.scanLeft(0L)(_ + _)
    val discAtRank = disc.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (d, i)) => when(col(rankCol) === (i + 1), lit(d)).otherwise(acc)
    }
    val idcgFp = (0 until k).foldLeft(lit(prefix(k))) {
      (acc, j) => when(col(totalRelCol) === j, lit(prefix(j))).otherwise(acc)
    }
    ranked
      .groupBy(col(queryCol))
      .agg(
        sum(when(col(relCol), discAtRank).otherwise(lit(0L))).as("dcg_fp"),
        max(idcgFp).as("idcg_fp"),
        sum(when(col(relCol), 1L).otherwise(0L)).as("n_hits"),
        max(col(totalRelCol)).as("total_rel"),
        count(lit(1)).as("n_returned"))
      .select(col(queryCol), col("n_hits"), col("total_rel"), col("n_returned"),
        when(col("idcg_fp") > 0, col("dcg_fp").cast("double") / col("idcg_fp"))
          .otherwise(lit(0.0)).as("ndcg"))
  }

  /** Mean-average-precision@k with binary relevance over an
    * already-ranked candidate list: AP = Σ_{rel hits} P@rank /
    * min(k, total_relevant), P@i = hits-so-far/i. Every P@i is
    * rationalized by lcm(1..k) — hits·(lcm/i) is an exact integer, so
    * the numerator accumulates in int64 and the single closing
    * division is the only float op (the ndcg recipe without even a
    * discount table). Same normalization stance as [[ndcgBinaryAtK]]:
    * ideal = TOTAL relevant (capped at k), so recall misses cost. */
  def mapBinaryAtK(ranked: DataFrame, queryCol: String, rankCol: String,
                   relCol: String, totalRelCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k must be in [1, 20], got $k")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1L to k.toLong).foldLeft(1L)((a, i) => a / gcd(a, i) * i)
    val mult = (1 to k).foldLeft(lit(0L)) {
      (acc, i) => when(col(rankCol) === i, lit(lcm / i)).otherwise(acc)
    }
    val w = Window.partitionBy(col(queryCol)).orderBy(col(rankCol))
    val idealDen = when(col(totalRelCol) >= k, lit(k.toLong))
      .otherwise(col(totalRelCol).cast("long"))
    ranked
      .withColumn("__h", sum(when(col(relCol), 1L).otherwise(0L)).over(w))
      .groupBy(col(queryCol))
      .agg(
        sum(when(col(relCol), col("__h") * mult).otherwise(lit(0L))).as("ap_num_fp"),
        max(idealDen).as("ideal_den"),
        sum(when(col(relCol), 1L).otherwise(0L)).as("n_hits"),
        count(lit(1)).as("n_returned"))
      .select(col(queryCol), col("n_hits"), col("n_returned"),
        when(col("ideal_den") > 0,
          col("ap_num_fp").cast("double") / (lit(lcm) * col("ideal_den")))
          .otherwise(lit(0.0)).as("ap"))
  }

  /** EXACT KNN-Shapley data valuation (Jia et al., VLDB 2019): the
    * Shapley value of every training point for a K-NN proxy classifier
    * evaluated on a probe test set — the data-selection signal "which
    * examples actually help" that heuristic quality scores
    * approximate. The O(N!)-looking Shapley collapses, for KNN, to a
    * closed recursion over the distance-sorted training list:
    *   s_(N) = rel_(N)/N,
    *   s_(j) = s_(j+1) + (rel_(j) − rel_(j+1)) · min(K,j)/(K·j),
    * i.e. a SUFFIX SUM of per-rank terms — one window pass, no
    * simulation. Each term rounds to 1e-12 fixed point and the suffix
    * sum runs in exact int64 (the adamic-adar/modularity recipe), so
    * the valuation is bit-identical on any engine despite the float
    * divisions inside each term.
    *
    * Shape: probe×train broadcast cross (the probe set is CONTRACTUALLY
    * small — valuation cost is O(|probe|·|train|)), one per-probe
    * ranking window + one suffix-sum window on the same key (one
    * shuffle), one keyed mean over probes. The per-probe window scans
    * |train| rows in one task — for very large train sets, value a
    * train SAMPLE per probe (the standard estimator) rather than
    * widening the window. */
  def knnShapley(train: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
      col(labelCol).as("p_label")))
    val t = train.select(col(idCol).as("train_id"), col(vecCol).as("tv"),
      col(labelCol).as("t_label"))
    val byProbe = Window.partitionBy(col("probe_id"))
    val asc = byProbe.orderBy(col("d"), col("train_id"))
    val ranked = t.crossJoin(p)
      .withColumn("d", lit(1.0) - graft.plans.VectorExpressions.cosine(col("tv"), col("pv")))
      .withColumn("rel", (col("t_label") === col("p_label")).cast("int"))
      .withColumn("rank", row_number().over(asc))
      .withColumn("rel_next", lead(col("rel"), 1).over(asc))
      .withColumn("n", count(lit(1)).over(byProbe))
    val term = when(col("rel_next").isNull, // rank N: the recursion base
      col("rel").cast("double") / col("n"))
      .otherwise((col("rel") - col("rel_next")).cast("double")
        * least(lit(k), col("rank")).cast("double")
        / (lit(k) * col("rank")).cast("double"))
    val suffix = byProbe.orderBy(col("rank"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ranked
      .withColumn("term_fp", floor(term * lit(1e12) + lit(0.5)).cast("long"))
      .withColumn("s_fp", sum(col("term_fp")).over(suffix))
      .groupBy(col("train_id"))
      .agg(((sum(col("s_fp")).cast("double") / count(lit(1))) / lit(1e12)).as("shapley"),
        count(lit(1)).as("n_probes"))
  }
}
