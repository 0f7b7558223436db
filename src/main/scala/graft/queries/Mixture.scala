package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Drift, Eval, Linkage, LogReg, Raking, Sampling}

/** Corpus-mix design and monitoring surface: token-distribution
  * divergence between slices, temperature-scaled source weights, IPF
  * raking to target marginals, and filter-model calibration — the
  * queries a data-mix designer runs before and after committing a
  * training blend.
  */
object Mixture {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** English-vs-rest unigram drift (Drift.tokenJsDivergence): KL both
    * ways + bounded JSD in nats, Laplace-smoothed over the union
    * vocab — the "how different are these two slices really" gate. */
  def tokenDrift(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Drift.tokenJsDivergence(
        d.filter(col("lang") === "en"), d.filter(col("lang") =!= "en"), "text")
      .select(col("n_tok_a"), col("n_tok_b"),
        col("vocab_union"), col("vocab_a"), col("vocab_b"),
        rd(col("kl_ab"), 6).as("kl_ab"),
        rd(col("kl_ba"), 6).as("kl_ba"),
        rd(col("jsd"), 6).as("jsd"))
  }

  /** Temperature-scaled source mix (Sampling.temperatureWeights,
    * α = 0.5, 100k-token budget): the exponent-smoothed sampling rule
    * with the upsampling-epochs signal per source. */
  def tempMix(s: SparkSession, dir: String): DataFrame =
    Sampling.temperatureWeights(
        docs(s, dir).withColumn("n_toks", size(TextAnalysis.tokens("text"))),
        "source", "n_toks", alpha = 0.5, budget = 100000L)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        rd(col("p_raw"), 6).as("p_raw"),
        rd(col("weight"), 6).as("weight"),
        rd(col("expected_tokens"), 2).as("expected_tokens"),
        rd(col("epochs"), 4).as("epochs"))
      .orderBy("source")

  private[queries] val RakeLangTargets = Map(
    "en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)
  private[queries] val RakeSourceTargets =
    (0 to 9).map(i => s"src$i" -> 0.1).toMap

  /** IPF raking (Raking.rake, 2 rounds): per-(lang, source) document
    * weights that pull the corpus marginals toward a 40%-English /
    * uniform-source target blend without dropping rows. */
  def raking(s: SparkSession, dir: String): DataFrame =
    Raking.rake(docs(s, dir), "lang", "source",
        RakeLangTargets, RakeSourceTargets, iters = 2)
      .select(col("lang"), col("source"), col("n"),
        rd(col("weight"), 8).as("weight"),
        rd(col("mass"), 8).as("mass"))
      .orderBy("lang", "source")

  /** Reliability diagram + ECE (Eval.calibration, 10 bins) for the
    * quality score read as an is-English predictor — "is the filter
    * signal's confidence honest?". The quality score has real spread
    * across bins (the 2-round linear fit's algebraic-sigmoid
    * probabilities all land in one bin — a degenerate diagram), and
    * its per-bin gap exposes exactly the miscalibration a reliability
    * diagram exists to show. */
  /** Isotonic (PAV) calibration of the quality score against the
    * lang=='en' label over the q_calibration bins (Eval.isotonicFit,
    * minimax identity — pure dataflow, no sequential pooling): the
    * non-decreasing calibration map a decision threshold can invert,
    * where q_calibration only reports raw per-bin rates. */
  def isotonic(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir)
      .withColumn("toks", TextAnalysis.tokens("text"))
      .select(
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        TextAnalysis.qualityScore(size(col("toks")),
          TextAnalysis.stopwordRatio("toks"), TextAnalysis.punctRatio("text")).as("p"))
    Eval.isotonicFit(scored, "p", "y", bins = 10)
      .select(col("bin"), col("n"),
        rd(col("rate_raw"), 6).as("rate_raw"), rd(col("rate_iso"), 6).as("rate_iso"))
      .orderBy("bin")
  }

  def calibration(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir)
      .withColumn("toks", TextAnalysis.tokens("text"))
      .select(
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        TextAnalysis.qualityScore(size(col("toks")),
          TextAnalysis.stopwordRatio("toks"), TextAnalysis.punctRatio("text")).as("p"))
    Eval.calibration(scored, "p", "y", bins = 10)
      .select(col("bin"), col("n"),
        rd(col("avg_conf"), 6).as("avg_conf"),
        rd(col("frac_pos"), 6).as("frac_pos"),
        rd(col("abs_gap"), 6).as("abs_gap"),
        rd(col("ece"), 6).as("ece"))
      .orderBy("bin")
  }

  /** Dominant principal direction of the embedding corpus
    * (Pca.powerIteration, 2 rounds): per-dim loadings + eigenvalue +
    * top component's variance share — the anisotropy diagnostic. */
  def pcaTop(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pca.powerIteration(
        Tables(s, dir, "embeddings"), "vec_id", "embedding", iters = 2)
      .select(col("pos"),
        rd(col("loading"), 8).as("loading"),
        rd(col("eigenvalue"), 8).as("eigenvalue"),
        rd(col("var_frac"), 8).as("var_frac"))
      .orderBy("pos")

  /** Fellegi-Sunter linkage scoring (Linkage.fellegiSunter) over the
    * MinHash-blocked candidate pairs: (source, lang, length-band)
    * agreement vector, unsupervised m/u estimation (pseudo-truth =
    * est_jaccard ≥ 0.75), log-likelihood match weight + decision. */
  def linkage(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("len_band", floor(col("n_chars") / 200))
    // the session-shared LSH pair leaf IS this exact chain (k=8,
    // rowsPerBand=2; min over duplicate shingles == min over distinct,
    // so the FromShingles path yields identical signatures) — reuse it
    // instead of re-running minhash + banding per sweep
    val pairs = TextVector.lshPairsShared(s, dir)
      .select(col("id_a"), col("id_b"), (col("est_jaccard") >= 0.75).as("pseudo"))
    Linkage.fellegiSunter(d, "doc_id", pairs, Seq("source", "lang", "len_band"), "pseudo")
      .select(col("id_a"), col("id_b"), col("agree_source"), col("agree_lang"),
        col("agree_len_band"), rd(col("score"), 6).as("score"), col("decision"))
      .orderBy("id_a", "id_b")
  }

  /** Heaps-law diversity growth (Diversity.growthCurve): cumulative
    * distinct-trigram curve over 10 hash slices + per-slice novelty
    * rate — the crawl-saturation signal. */
  def diversity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diversity.growthCurve(docs(s, dir), "doc_id", "text",
        n = 3, buckets = 10)
      .select(col("bucket"), col("n_docs"), col("slice_tokens"), col("new_types"),
        col("cum_tokens"), col("cum_types"),
        rd(col("novelty_rate"), 6).as("novelty_rate"))
      .orderBy("bucket")

  /** Exact-phrase blocklist hits (Curation.blocklistHits): mixed 2- and
    * 3-token banned phrases matched via hashed token-window equi-join. */
  def blocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ph = Seq(
      (1L, "table table"), (2L, "fast table value"), (3L, "batch window"),
      (4L, "slow filter value"), (5L, "agg join small"))
      .toDF("phrase_id", "phrase")
    graft.operators.Curation.blocklistHits(
        docs(s, dir), "doc_id", "text", ph, "phrase_id", "phrase")
      .orderBy("doc_id", "phrase_id")
  }

  /** k-anonymity / l-diversity audit (Privacy.kAnonymity, k=5, l=2):
    * quasi-identifiers (source, 500-char length band), sensitive
    * attribute lang — per-class risk plus corpus rates. */
  def kAnon(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.kAnonymity(
        docs(s, dir).withColumn("len_band", floor(col("n_chars") / 500)),
        Seq("source", "len_band"), "lang", k = 5, l = 2)
      .select(col("source"), col("len_band"), col("class_size"),
        col("l_diversity"), rd(col("risk"), 6).as("risk"),
        col("violates_k"), col("violates_l"), col("n_rows"),
        rd(col("frac_rows_at_risk"), 6).as("frac_rows_at_risk"),
        col("min_class_size"))
      .orderBy("source", "len_band")

  /** Group-fairness report (Eval.groupFairness) for the 2-round linear
    * language classifier across sources: per-group selection rate /
    * TPR / FPR + demographic-parity and equal-opportunity gaps. */
  def fairness(s: SparkSession, dir: String): DataFrame = {
    val f = TextVector.logregFeatures(s, dir)
    val w = LogReg.fit(f, TextVector.LogregFeatures, "y", lr = 1.0, iters = 2)
    val scored = LogReg.score(f, TextVector.LogregFeatures, w)
      .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
    Eval.groupFairness(scored, "source", "y", "pred")
      .select(col("source"), col("n"),
        rd(col("base_rate"), 6).as("base_rate"),
        rd(col("sel_rate"), 6).as("sel_rate"),
        rd(col("tpr"), 6).as("tpr"), rd(col("fpr"), 6).as("fpr"),
        rd(col("dp_gap"), 6).as("dp_gap"), rd(col("eo_gap"), 6).as("eo_gap"))
      .orderBy("source")
  }

  /** Brier score + Murphy decomposition (Eval.brierDecomposition) for
    * the quality-score-as-English-predictor — the proper-scoring
    * counterpart of q_calibration over the same bins. */
  def brier(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir)
      .withColumn("toks", TextAnalysis.tokens("text"))
      .select(
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        TextAnalysis.qualityScore(size(col("toks")),
          TextAnalysis.stopwordRatio("toks"), TextAnalysis.punctRatio("text")).as("p"))
    Eval.brierDecomposition(scored, "p", "y", bins = 10)
      .select(col("n"), rd(col("brier"), 8).as("brier"),
        rd(col("reliability"), 8).as("reliability"),
        rd(col("resolution"), 8).as("resolution"),
        rd(col("uncertainty"), 8).as("uncertainty"))
  }

  /** Robust embedding centroid (GeoMedian.geometricMedian, 2 Weiszfeld
    * rounds): per-dim L2 mean vs geometric median — the gap is the
    * outlier-contamination signal. */
  def geoMedian(s: SparkSession, dir: String): DataFrame =
    graft.operators.GeoMedian.geometricMedian(
        Tables(s, dir, "embeddings"), "vec_id", "embedding", iters = 2)
      .select(col("pos"), rd(col("mean"), 6).as("mean"),
        rd(col("median"), 6).as("median"))
      .orderBy("pos")

  /** Split-conformal interval (Eval.splitConformal, q=0.9): exact OLS
    * of n_chars on token count, calibration-slice residual quantile,
    * held-out coverage — distribution-free uncertainty for the length
    * model. */
  def conformal(s: SparkSession, dir: String): DataFrame =
    Eval.splitConformal(
        docs(s, dir).withColumn("n_toks", size(TextAnalysis.tokens("text"))),
        "doc_id", "n_toks", "n_chars", quantile = 0.9)
      .select(col("n_fit"), col("n_calib"), col("n_test"),
        rd(col("slope"), 8).as("slope"),
        rd(col("intercept"), 6).as("intercept"),
        rd(col("q_hat"), 6).as("q_hat"),
        rd(col("coverage"), 6).as("coverage"))

  /** Per-source Gini concentration of document mass
    * (RankStats.giniByGroup over n_chars): "is this source a few huge
    * docs or many small ones". Ranks are group-partitioned windows
    * (parallel, group-bounded sorts); Σr·x stays in exact longs, the
    * one division rounds at 6. */
  def gini(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.giniByGroup(docs(s, dir), "source", "n_chars", "doc_id")
      .select(col("source"), col("n"), col("total"), rd(col("gini"), 6).as("gini"))
      .orderBy("source")

  /** Theil T decomposition of the same mass (RankStats.theilByGroup):
    * t_total = t_between + Σ share·t_within — tells a mix designer
    * whether size skew lives ACROSS sources (rebalance the mix) or
    * INSIDE them (cap within-source). Pure aggregation, no ranks. */
  def theil(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.theilByGroup(docs(s, dir), "source", "n_chars")
      .select(col("source"), col("n_k"), col("mass_k").cast("long").as("mass_k"),
        rd(col("share"), 6).as("share"),
        rd(col("t_within"), 6).as("t_within"),
        rd(col("t_total"), 6).as("t_total"),
        rd(col("t_between_k"), 6).as("t_between_k"))
      .orderBy("source")

  /** t-closeness audit (Privacy.tCloseness, 250-char bins, t = 0.2)
    * over quasi-identifiers (source, lang) with n_chars as the ordered
    * sensitive attribute — the distributional leak k-anonymity and
    * l-diversity both miss (skewness attack). */
  def tClose(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.tCloseness(
        docs(s, dir), Seq("source", "lang"), "n_chars", binWidth = 250L, t = 0.2)
      .orderBy("source", "lang")

  /** Stratified epoch ordering (Sampling.stratifiedInterleave): the
    * first 100 positions of a curriculum epoch — within-source rank by
    * difficulty (n_chars ascending, easy-first), sources interleaved
    * round-robin so no source dominates a training window — plus the
    * rank each doc would take in a seeded SHUFFLED epoch
    * (Sampling.epochShuffleKey, epoch 1) for contrast. The head is a
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * position stamp is a window over the already-limited 100 rows. */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
    val c1 = Sampling.stratifiedInterleave(d, "source", col("n_chars"), "doc_id")
      .withColumn("rn_curr", col("rn").cast("long")).drop("rn")
    val c2 = Sampling.stratifiedInterleave(c1, "source",
        Sampling.epochShuffleKey(col("doc_id"), "ep", 1), "doc_id")
      .withColumn("rn_shuffle", col("rn").cast("long")).drop("rn")
    c2.orderBy(col("rn_curr"), col("source")).limit(100)
      .withColumn("position",
        row_number().over(Window.orderBy(col("rn_curr"), col("source"))).cast("long"))
      .select(col("position"), col("doc_id"), col("source"), col("n_chars"),
        col("rn_curr"), col("rn_shuffle"))
      .orderBy("position")
  }

  /** Blocked sorted-neighborhood candidates (Linkage.sortedNeighborhood,
    * w = 2) over a normalized text-prefix key — the third blocking
    * family (LSH banding and equality blocking being q_lsh_pairs and
    * q_linkage's): near-equal sort keys pair up with no shared exact
    * token. Block-partitioned windows, no global sort. */
  def sortedBlocking(s: SparkSession, dir: String): DataFrame = {
    val keyed = docs(s, dir).select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 16).as("k"))
    Linkage.sortedNeighborhood(keyed, "doc_id", "k", w = 2, blockLen = 1)
      .orderBy("id_a", "w_dist")
  }

  /** ε-DP released group counts (Privacy.dpCounts, ε=1, seeded
    * Laplace): the calibration/audit view of a private per-day
    * event-type histogram — realized noise next to the true count so
    * the release is inspectable before n_true is dropped. The oracle
    * reproduces the exact release (hash-derived noise), which is the
    * point: one (seed, statistic) → one noise draw, ever. The seed
    * here is PUBLIC ("dp") because this is the audit view — n_true is
    * in the output, so nothing is private to protect; a production
    * release must pass a secret high-entropy seed (dpCounts scaladoc:
    * a known seed makes the noise subtractable). */
  def dpCountsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.dpCounts(
        Tables(s, dir, "events").withColumn("day", to_date(col("ts"))),
        Seq("event_type", "day"), epsilon = 1.0, seed = "dp")
      .select(col("event_type"), col("day"), col("n_true"),
        rd(col("n_dp"), 6).as("n_dp"), rd(col("noise"), 6).as("noise"), col("epsilon"))
      .orderBy("event_type", "day")

  /** Entropy + recursive (c,l)-diversity (Privacy.lDiversity, l=2,
    * c=2.0) over the q_kanon quasi-identifier classes — the two
    * STRONGER gates distinct-count l-diversity provably misses: a
    * class can hold 2 langs yet be 98% one of them. Entropy sums are
    * fixed-point (1e-12 longs), bit-stable cross-engine. */
  def lDiversityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.lDiversity(
        docs(s, dir).withColumn("len_band", floor(col("n_chars") / 500)),
        Seq("source", "len_band"), "lang", l = 2, c = 2.0)
      .orderBy("source", "len_band")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ldiversity" -> lDiversityQ,
    "q_dp_counts" -> dpCountsQ,
    "q_curriculum" -> curriculum,
    "q_sorted_blocking" -> sortedBlocking,
    "q_tcloseness" -> tClose,
    "q_gini" -> gini,
    "q_theil" -> theil,
    "q_conformal" -> conformal,
    "q_geomedian" -> geoMedian,
    "q_fairness" -> fairness,
    "q_brier" -> brier,
    "q_kanon" -> kAnon,
    "q_token_drift" -> tokenDrift,
    "q_temp_mix" -> tempMix,
    "q_raking" -> raking,
    "q_calibration" -> calibration,
    "q_isotonic" -> isotonic,
    "q_pca_top" -> pcaTop,
    "q_linkage" -> linkage,
    "q_diversity" -> diversity,
    "q_blocklist" -> blocklist)

  private def sqlCase(keyCol: String, targets: Map[String, Double]): String =
    "CASE " + targets.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $keyCol = '$k' THEN $v" }
      .mkString(" ") + " END"

  /** Shared DuckDB CTE: the quality-score/label frame behind
    * q_calibration AND q_isotonic — factored so the score formula
    * can't drift between the raw-rate and isotonic oracles. */
  private val qualityScoredCte =
    """dq AS (
      |  SELECT doc_id, lang, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
      |mq AS (
      |  SELECT doc_id, lang, CAST(len(w) AS INTEGER) AS n_tokens,
      |    1.0 * len(list_filter(w, t -> t IN ('the', 'a'))) / greatest(len(w), 1) AS stopword_ratio,
      |    1.0 * (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / greatest(length(text), 1) AS punct_ratio
      |  FROM dq),
      |sc AS (
      |  SELECT CAST(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y,
      |    0.5 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - stopword_ratio) + 0.2 * (1.0 - punct_ratio) AS p
      |  FROM mq)""".stripMargin

  def oracles: Map[String, String] = Map(
    // the md5 52-bit uniform (weightedSample recipe) through the
    // Laplace inverse CDF, op order mirrored term for term
    "q_dp_counts" ->
      """WITH g AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_true
        |  FROM events GROUP BY 1, 2),
        |n AS (
        |  SELECT event_type, day, n_true,
        |    (CAST(('0x'||substr(md5('dp:'||event_type||':'||CAST(day AS VARCHAR)),1,13)) AS BIGINT) + 0.5)
        |      / 4503599627370496.0 AS u
        |  FROM g),
        |z AS (
        |  SELECT event_type, day, n_true,
        |    (-1.0 * sign(u - 0.5)) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
        |  FROM n)
        |SELECT event_type, day, n_true,
        |  floor((n_true + noise)*1000000 + 0.5)/1000000 AS n_dp,
        |  floor((noise)*1000000 + 0.5)/1000000 AS noise,
        |  CAST(1.0 AS DOUBLE) AS epsilon
        |FROM z ORDER BY event_type, day""".stripMargin,
    "q_curriculum" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn_curr,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5('ep:1:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn_shuffle
        |  FROM documents),
        |h AS (SELECT * FROM r ORDER BY rn_curr, source LIMIT 100)
        |SELECT CAST(row_number() OVER (ORDER BY rn_curr, source) AS BIGINT) AS position,
        |  doc_id, source, n_chars, rn_curr, rn_shuffle
        |FROM h ORDER BY position""".stripMargin,
    "q_sorted_blocking" ->
      """WITH k AS (
        |  SELECT doc_id AS id_a,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 16) AS key_a
        |  FROM documents),
        |l AS (
        |  SELECT id_a, key_a,
        |    lead(id_a, 1) OVER w AS id1, lead(key_a, 1) OVER w AS k1,
        |    lead(id_a, 2) OVER w AS id2, lead(key_a, 2) OVER w AS k2
        |  FROM k WINDOW w AS (PARTITION BY substr(key_a, 1, 1) ORDER BY key_a, id_a))
        |SELECT id_a, id1 AS id_b, key_a, k1 AS key_b, 1 AS w_dist
        |FROM l WHERE id1 IS NOT NULL
        |UNION ALL
        |SELECT id_a, id2 AS id_b, key_a, k2 AS key_b, 2 AS w_dist
        |FROM l WHERE id2 IS NOT NULL
        |ORDER BY id_a, w_dist""".stripMargin,
    "q_tcloseness" ->
      """WITH b AS (
        |  SELECT source, lang,
        |    CAST(floor(CAST(n_chars AS DOUBLE)/250) AS BIGINT) AS bin
        |  FROM documents),
        |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS cq FROM b GROUP BY bin),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM b),
        |cls AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS class_size
        |        FROM b GROUP BY 1, 2),
        |pcb AS (SELECT source, lang, bin, CAST(count(*) AS BIGINT) AS cp
        |        FROM b GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT c.source, c.lang, c.class_size, g.bin, g.cq,
        |    coalesce(p.cp, 0) AS cp, nt.n_total
        |  FROM cls c CROSS JOIN g CROSS JOIN nt
        |  LEFT JOIN pcb p ON p.source = c.source AND p.lang = c.lang AND p.bin = g.bin),
        |cum AS (
        |  SELECT source, lang, class_size, bin, n_total,
        |    sum(cp) OVER (PARTITION BY source, lang ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p,
        |    sum(cq) OVER (PARTITION BY source, lang ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_q,
        |    count(*) OVER (PARTITION BY source, lang) AS m,
        |    max(bin) OVER (PARTITION BY source, lang) AS last_bin
        |  FROM grid),
        |e AS (
        |  SELECT source, lang, class_size,
        |    sum(abs(CAST(cum_p AS DOUBLE)/class_size - CAST(cum_q AS DOUBLE)/n_total))
        |      / (max(m) - 1.0) AS emd
        |  FROM cum WHERE bin < last_bin GROUP BY 1, 2, 3)
        |SELECT source, lang, class_size,
        |  floor(emd*1000000 + 0.5)/1000000 AS emd,
        |  floor(emd*1000000 + 0.5)/1000000 > 0.2 AS violates_t
        |FROM e ORDER BY source, lang""".stripMargin,
    "q_gini" ->
      """WITH ranked AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total,
        |  floor((2.0*CAST(sum(r*x) AS DOUBLE)/(CAST(count(*) AS DOUBLE)*CAST(sum(x) AS DOUBLE))
        |         - (CAST(count(*) AS DOUBLE)+1.0)/CAST(count(*) AS DOUBLE))*1000000 + 0.5)/1000000 AS gini
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,
    "q_theil" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_k,
        |    sum(CAST(n_chars AS DOUBLE)) AS mass_k,
        |    sum(CAST(n_chars AS DOUBLE)*ln(CAST(n_chars AS DOUBLE))) AS xlnx_k
        |  FROM documents WHERE n_chars > 0 GROUP BY source),
        |t AS (
        |  SELECT CAST(sum(n_k) AS BIGINT) AS n, sum(mass_k) AS mass, sum(xlnx_k) AS xlnx
        |  FROM g)
        |SELECT source, n_k, CAST(mass_k AS BIGINT) AS mass_k,
        |  floor((mass_k/mass)*1000000 + 0.5)/1000000 AS share,
        |  floor((xlnx_k/mass_k - ln(mass_k/n_k))*1000000 + 0.5)/1000000 AS t_within,
        |  floor((xlnx/mass - ln(mass/n))*1000000 + 0.5)/1000000 AS t_total,
        |  floor(((mass_k/mass)*ln((mass_k/n_k)/(mass/n)))*1000000 + 0.5)/1000000 AS t_between_k
        |FROM g CROSS JOIN t ORDER BY source""".stripMargin,
    "q_conformal" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS x,
        |    CAST(n_chars AS BIGINT) AS y,
        |    CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS BIGINT) % 100 AS b
        |  FROM documents),
        |fit AS (
        |  SELECT count(*) AS n_fit,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
        |  FROM t WHERE b < 50),
        |f2 AS (
        |  SELECT n_fit,
        |    CAST(n_fit*sxy - sx*sy AS DOUBLE) / CAST(n_fit*sxx - sx*sx AS DOUBLE) AS slope,
        |    (CAST(sy AS DOUBLE) - (CAST(n_fit*sxy - sx*sy AS DOUBLE) / CAST(n_fit*sxx - sx*sx AS DOUBLE)) * sx) / n_fit AS intercept
        |  FROM fit),
        |calib AS (
        |  SELECT id, abs(CAST(y AS DOUBLE) - (intercept + slope * x)) AS r
        |  FROM t CROSS JOIN f2 WHERE b >= 50 AND b < 75),
        |nc AS (SELECT count(*) AS n_calib FROM calib),
        |qh AS (
        |  SELECT n_calib, r AS q_hat FROM (
        |    SELECT id, r, row_number() OVER (ORDER BY r, id) AS rk FROM calib)
        |  CROSS JOIN nc
        |  WHERE rk = least(CAST(ceil((n_calib + 1) * CAST(0.9 AS DOUBLE)) AS BIGINT), n_calib)),
        |tst AS (
        |  SELECT count(*) AS n_test,
        |    CAST(sum(CASE WHEN abs(CAST(y AS DOUBLE) - (intercept + slope * x)) <= q_hat
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cov
        |  FROM t CROSS JOIN f2 CROSS JOIN qh WHERE b >= 75)
        |SELECT n_fit, n_calib, n_test,
        |  floor((slope)*100000000 + 0.5)/100000000 AS slope,
        |  floor((intercept)*1000000 + 0.5)/1000000 AS intercept,
        |  floor((q_hat)*1000000 + 0.5)/1000000 AS q_hat,
        |  floor((CAST(cov AS DOUBLE) / n_test)*1000000 + 0.5)/1000000 AS coverage
        |FROM f2 CROSS JOIN qh CROSS JOIN tst""".stripMargin,
    "q_geomedian" ->
      """WITH ex AS (
        |  SELECT vec_id AS id, pos - 1 AS pos, x FROM (
        |    SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |           generate_subscripts(embedding, 1) AS pos
        |    FROM embeddings)),
        |mn AS (
        |  SELECT pos, (CAST(sum(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) / count(*) AS mean
        |  FROM ex GROUP BY pos),
        |y0 AS (SELECT pos, mean AS y FROM mn),
        |w1 AS (
        |  SELECT id, CAST(1 AS DOUBLE) / dist AS w FROM (
        |    SELECT id, sqrt(CAST(sum(CAST(floor(((x - y) * (x - y)) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) AS dist
        |    FROM ex JOIN y0 USING (pos) GROUP BY id)
        |  WHERE dist > 1e-6),
        |ws1 AS (SELECT CAST(sum(CAST(floor(w * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS ws FROM w1),
        |y1 AS (
        |  SELECT pos, (CAST(sum(CAST(floor((x * w) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6) / ws AS y
        |  FROM ex JOIN w1 USING (id) CROSS JOIN ws1 GROUP BY pos, ws),
        |w2 AS (
        |  SELECT id, CAST(1 AS DOUBLE) / dist AS w FROM (
        |    SELECT id, sqrt(CAST(sum(CAST(floor(((x - y) * (x - y)) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) AS dist
        |    FROM ex JOIN y1 USING (pos) GROUP BY id)
        |  WHERE dist > 1e-6),
        |ws2 AS (SELECT CAST(sum(CAST(floor(w * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS ws FROM w2),
        |y2 AS (
        |  SELECT pos, (CAST(sum(CAST(floor((x * w) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6) / ws AS y
        |  FROM ex JOIN w2 USING (id) CROSS JOIN ws2 GROUP BY pos, ws)
        |SELECT CAST(pos AS INT) AS pos,
        |  floor((mean)*1000000 + 0.5)/1000000 AS mean,
        |  floor((y)*1000000 + 0.5)/1000000 AS median
        |FROM mn JOIN y2 USING (pos) ORDER BY pos""".stripMargin,
    "q_fairness" ->
      ("WITH " + TextVector.logregW2Cte + """,
        |sc AS (
        |  SELECT d.source, f.y, CAST(CASE WHEN m >= 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS pred
        |  FROM (
        |    SELECT f.doc_id, f.y,
        |      ((w.w_bias + w.w_ntok * f.x_ntok) + w.w_stop * f.x_stop) + w.w_punct * f.x_punct AS m
        |    FROM f CROSS JOIN w2 w) f
        |  JOIN documents d USING (doc_id)),
        |per AS (
        |  SELECT source, count(*) AS n,
        |    CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN pred = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS npp,
        |    CAST(sum(CASE WHEN y = 1.0 AND pred = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN y <> 1.0 AND pred = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp
        |  FROM sc GROUP BY 1),
        |r AS (
        |  SELECT source, n,
        |    CAST(np AS DOUBLE)/n AS base_rate, CAST(npp AS DOUBLE)/n AS sel_rate,
        |    CASE WHEN np > 0 THEN CAST(tp AS DOUBLE)/np END AS tpr,
        |    CASE WHEN n - np > 0 THEN CAST(fp AS DOUBLE)/(n - np) END AS fpr
        |  FROM per),
        |g AS (SELECT max(sel_rate) - min(sel_rate) AS dp_gap,
        |             max(tpr) - min(tpr) AS eo_gap FROM r)
        |SELECT source, n,
        |  floor((base_rate)*1000000 + 0.5)/1000000 AS base_rate,
        |  floor((sel_rate)*1000000 + 0.5)/1000000 AS sel_rate,
        |  floor((tpr)*1000000 + 0.5)/1000000 AS tpr,
        |  floor((fpr)*1000000 + 0.5)/1000000 AS fpr,
        |  floor((dp_gap)*1000000 + 0.5)/1000000 AS dp_gap,
        |  floor((eo_gap)*1000000 + 0.5)/1000000 AS eo_gap
        |FROM r CROSS JOIN g ORDER BY source""".stripMargin),
    "q_brier" ->
      """WITH dq AS (
        |  SELECT doc_id, lang, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
        |mq AS (
        |  SELECT doc_id, lang, CAST(len(w) AS INTEGER) AS n_tokens,
        |    1.0 * len(list_filter(w, t -> t IN ('the', 'a'))) / greatest(len(w), 1) AS stopword_ratio,
        |    1.0 * (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) / greatest(length(text), 1) AS punct_ratio
        |  FROM dq),
        |sc AS (
        |  SELECT CAST(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y,
        |    0.5 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - stopword_ratio) + 0.2 * (1.0 - punct_ratio) AS p
        |  FROM mq),
        |pb AS (
        |  SELECT CAST(least(floor(p * 10), 9) AS INTEGER) AS b, count(*) AS n,
        |    sum(CAST(floor(p * 1e12 + 0.5) AS BIGINT)) AS sp,
        |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS npos,
        |    sum(CAST(floor(((p - y) * (p - y)) * 1e12 + 0.5) AS BIGINT)) AS sq
        |  FROM sc GROUP BY 1),
        |pbx AS (
        |  SELECT b, n, npos, sq,
        |    (CAST(sp AS DOUBLE) / 1e12) / n AS conf,
        |    CAST(npos AS DOUBLE) / n AS acc
        |  FROM pb),
        |yb AS (SELECT CAST(sum(npos) AS DOUBLE) / CAST(sum(n) AS BIGINT) AS ybar FROM pbx),
        |ag AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(sq) AS DOUBLE) / 1e12 AS sqsum,
        |    CAST(sum(CAST(floor(((n * (conf - acc)) * (conf - acc)) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS rel,
        |    CAST(sum(CAST(floor(((n * (acc - ybar)) * (acc - ybar)) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS res,
        |    max(ybar) AS yb
        |  FROM pbx CROSS JOIN yb)
        |SELECT n,
        |  floor((sqsum / n)*100000000 + 0.5)/100000000 AS brier,
        |  floor((rel / n)*100000000 + 0.5)/100000000 AS reliability,
        |  floor((res / n)*100000000 + 0.5)/100000000 AS resolution,
        |  floor((yb * (1.0 - yb))*100000000 + 0.5)/100000000 AS uncertainty
        |FROM ag""".stripMargin,
    // the oracle recomputes both gates: deterministic (count desc,
    // value asc) ranking, fixed-point (1e-12) entropy sum, ln(2)
    // threshold rounded once at 6 dp — the engine's exact contract
    "q_ldiversity" ->
      """WITH c AS (
        |  SELECT source, CAST(floor(n_chars / 500) AS BIGINT) AS len_band,
        |    CAST(lang AS VARCHAR) AS v, count(*) AS cnt
        |  FROM documents GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source, len_band ORDER BY cnt DESC, v ASC) AS rnk,
        |    CAST(sum(cnt) OVER (PARTITION BY source, len_band) AS BIGINT) AS class_size
        |  FROM c),
        |p AS (SELECT *, CAST(cnt AS DOUBLE) / class_size AS pp FROM r),
        |a AS (
        |  SELECT source, len_band, class_size, count(*) AS distinct_l,
        |    -CAST(sum(CAST(floor(pp * ln(pp) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS ent,
        |    max(cnt) AS r1,
        |    CAST(sum(CASE WHEN rnk >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS tail
        |  FROM p GROUP BY 1, 2, 3)
        |SELECT source, len_band, class_size, distinct_l,
        |  floor(ent*1000000 + 0.5)/1000000 AS entropy,
        |  floor(ent*1000000 + 0.5)/1000000 >= 0.693147 AS entropy_ok,
        |  r1 AS top_count,
        |  CAST(r1 AS DOUBLE) < floor(2.0*tail*1000000 + 0.5)/1000000 AS recursive_ok
        |FROM a ORDER BY source, len_band""".stripMargin,
    "q_kanon" ->
      """WITH c AS (
        |  SELECT source, CAST(floor(n_chars / 500) AS BIGINT) AS len_band,
        |    count(*) AS class_size, count(DISTINCT lang) AS l_diversity
        |  FROM documents GROUP BY 1, 2),
        |x AS (
        |  SELECT *, CAST(1 AS DOUBLE) / class_size AS risk,
        |    class_size < 5 AS violates_k, l_diversity < 2 AS violates_l
        |  FROM c),
        |t AS (
        |  SELECT CAST(sum(class_size) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN violates_k THEN class_size ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(class_size) AS DOUBLE) AS frac_rows_at_risk,
        |    min(class_size) AS min_class_size
        |  FROM x)
        |SELECT source, len_band, class_size, l_diversity,
        |  floor((risk)*1000000 + 0.5)/1000000 AS risk, violates_k, violates_l,
        |  n_rows, floor((frac_rows_at_risk)*1000000 + 0.5)/1000000 AS frac_rows_at_risk,
        |  min_class_size
        |FROM x CROSS JOIN t ORDER BY source, len_band""".stripMargin,
    "q_token_drift" ->
      """WITH ta AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents WHERE lang = 'en'),
        |tb AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents WHERE lang <> 'en'),
        |ca AS (SELECT term, count(*) AS ca FROM ta GROUP BY 1),
        |cb AS (SELECT term, count(*) AS cb FROM tb GROUP BY 1),
        |j AS (
        |  SELECT term, coalesce(a.ca, 0) AS ca, coalesce(b.cb, 0) AS cb
        |  FROM ca a FULL JOIN cb b USING (term)),
        |tot AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS n_tok_a, CAST(sum(cb) AS BIGINT) AS n_tok_b,
        |    count(*) AS vocab_union,
        |    CAST(sum(CAST(ca > 0 AS BIGINT)) AS BIGINT) AS vocab_a,
        |    CAST(sum(CAST(cb > 0 AS BIGINT)) AS BIGINT) AS vocab_b
        |  FROM j),
        |terms AS (
        |  SELECT n_tok_a, n_tok_b, vocab_union, vocab_a, vocab_b,
        |    CAST(ca + 1 AS DOUBLE) / CAST(n_tok_a + vocab_union AS DOUBLE) AS p,
        |    CAST(cb + 1 AS DOUBLE) / CAST(n_tok_b + vocab_union AS DOUBLE) AS q,
        |    (CAST(ca + 1 AS DOUBLE) / CAST(n_tok_a + vocab_union AS DOUBLE)
        |     + CAST(cb + 1 AS DOUBLE) / CAST(n_tok_b + vocab_union AS DOUBLE)) / 2 AS m
        |  FROM j CROSS JOIN tot),
        |agg AS (
        |  SELECT n_tok_a, n_tok_b, vocab_union, vocab_a, vocab_b,
        |    sum(CAST(floor((p * ln(p / q)) * 1e9 + 0.5) AS BIGINT)) AS kab,
        |    sum(CAST(floor((q * ln(q / p)) * 1e9 + 0.5) AS BIGINT)) AS kba,
        |    sum(CAST(floor((0.5 * (p * ln(p / m) + q * ln(q / m))) * 1e9 + 0.5) AS BIGINT)) AS js
        |  FROM terms GROUP BY 1, 2, 3, 4, 5)
        |SELECT n_tok_a, n_tok_b, vocab_union, vocab_a, vocab_b,
        |  floor((CAST(kab AS DOUBLE) / 1e9)*1000000 + 0.5)/1000000 AS kl_ab,
        |  floor((CAST(kba AS DOUBLE) / 1e9)*1000000 + 0.5)/1000000 AS kl_ba,
        |  floor((CAST(js AS DOUBLE) / 1e9)*1000000 + 0.5)/1000000 AS jsd
        |FROM agg""".stripMargin,
    "q_temp_mix" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS nt
        |  FROM documents),
        |per AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY 1),
        |tot AS (SELECT sum(n_tokens) AS tot FROM per),
        |raw AS (
        |  SELECT source, n_docs, n_tokens,
        |    CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS p_raw,
        |    sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) AS pa
        |  FROM per CROSS JOIN tot),
        |z AS (SELECT sum(CAST(floor(pa * 1e12 + 0.5) AS BIGINT)) AS zfx FROM raw),
        |wt AS (
        |  SELECT source, n_docs, n_tokens, p_raw,
        |    pa / (CAST(zfx AS DOUBLE) / 1e12) AS weight,
        |    (pa / (CAST(zfx AS DOUBLE) / 1e12)) * 100000.0 AS expected_tokens
        |  FROM raw CROSS JOIN z)
        |SELECT source, n_docs, n_tokens,
        |  floor((p_raw)*1000000 + 0.5)/1000000 AS p_raw,
        |  floor((weight)*1000000 + 0.5)/1000000 AS weight,
        |  floor((expected_tokens)*100 + 0.5)/100 AS expected_tokens,
        |  floor((expected_tokens / CAST(n_tokens AS DOUBLE))*10000 + 0.5)/10000 AS epochs
        |FROM wt ORDER BY source""".stripMargin,
    "q_raking" -> {
      val tr = sqlCase("r", RakeLangTargets)
      val tc = sqlCase("c", RakeSourceTargets)
      val langs = RakeLangTargets.keys.toSeq.sorted.map(l => s"'$l'").mkString(", ")
      val srcs = RakeSourceTargets.keys.toSeq.sorted.map(x => s"'$x'").mkString(", ")
      s"""WITH cells AS (
         |  SELECT lang AS r, source AS c, count(*) AS n, 1.0 AS w
         |  FROM documents WHERE lang IN ($langs) AND source IN ($srcs)
         |  GROUP BY 1, 2),
         |rm1 AS (
         |  SELECT r, sum(CAST(floor((w * n) * 1e9 + 0.5) AS BIGINT)) AS rm
         |  FROM cells GROUP BY r),
         |s1 AS (
         |  SELECT cells.r, cells.c, n,
         |    w * ($tr) / (CAST(rm AS DOUBLE) / 1e9) AS w
         |  FROM cells JOIN rm1 USING (r)),
         |cm1 AS (
         |  SELECT c, sum(CAST(floor((w * n) * 1e9 + 0.5) AS BIGINT)) AS cm
         |  FROM s1 GROUP BY c),
         |s2 AS (
         |  SELECT s1.r, s1.c, n,
         |    w * ($tc) / (CAST(cm AS DOUBLE) / 1e9) AS w
         |  FROM s1 JOIN cm1 USING (c)),
         |rm2 AS (
         |  SELECT r, sum(CAST(floor((w * n) * 1e9 + 0.5) AS BIGINT)) AS rm
         |  FROM s2 GROUP BY r),
         |s3 AS (
         |  SELECT s2.r, s2.c, n,
         |    w * ($tr) / (CAST(rm AS DOUBLE) / 1e9) AS w
         |  FROM s2 JOIN rm2 USING (r)),
         |cm2 AS (
         |  SELECT c, sum(CAST(floor((w * n) * 1e9 + 0.5) AS BIGINT)) AS cm
         |  FROM s3 GROUP BY c),
         |s4 AS (
         |  SELECT s3.r, s3.c, n,
         |    w * ($tc) / (CAST(cm AS DOUBLE) / 1e9) AS w
         |  FROM s3 JOIN cm2 USING (c))
         |SELECT r AS lang, c AS source, n,
         |  floor((w)*100000000 + 0.5)/100000000 AS weight,
         |  floor((w * n)*100000000 + 0.5)/100000000 AS mass
         |FROM s4 ORDER BY lang, source""".stripMargin
    },
    "q_calibration" ->
      ("WITH " + qualityScoredCte + """,
        |pb AS (
        |  SELECT CAST(least(floor(p * 10), 9) AS INTEGER) AS bin,
        |    count(*) AS n,
        |    sum(CAST(floor(p * 1e12 + 0.5) AS BIGINT)) AS sp,
        |    sum(CAST(y AS BIGINT)) AS npos
        |  FROM sc GROUP BY 1),
        |pbx AS (
        |  SELECT bin, n,
        |    (CAST(sp AS DOUBLE) / 1e12) / n AS avg_conf,
        |    CAST(npos AS DOUBLE) / n AS frac_pos,
        |    abs((CAST(sp AS DOUBLE) / 1e12) / n - CAST(npos AS DOUBLE) / n) AS abs_gap
        |  FROM pb),
        |tt AS (
        |  SELECT (CAST(sum(CAST(floor((n * abs_gap) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12)
        |    / sum(n) AS ece
        |  FROM pbx)
        |SELECT bin, n,
        |  floor((avg_conf)*1000000 + 0.5)/1000000 AS avg_conf,
        |  floor((frac_pos)*1000000 + 0.5)/1000000 AS frac_pos,
        |  floor((abs_gap)*1000000 + 0.5)/1000000 AS abs_gap,
        |  floor((ece)*1000000 + 0.5)/1000000 AS ece
        |FROM pbx CROSS JOIN tt ORDER BY bin""".stripMargin),
    // PAV via the minimax identity over the same bin frame: every range
    // rate is one division of exact prefix-sum differences; min/max
    // never accumulate
    "q_isotonic" ->
      ("WITH " + qualityScoredCte + """,
        |pb2 AS (
        |  SELECT CAST(least(floor(p * 10), 9) AS INTEGER) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS npos
        |  FROM sc GROUP BY 1),
        |pre AS (
        |  SELECT bin, n, npos,
        |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |    CAST(sum(npos) OVER (ORDER BY bin) AS BIGINT) AS cp
        |  FROM pb2),
        |rng AS (
        |  SELECT j.bin AS j, k.bin AS k,
        |    k.cp - (j.cp - j.npos) AS p, k.cn - (j.cn - j.n) AS c
        |  FROM pre j JOIN pre k ON j.bin <= k.bin),
        |im AS (
        |  SELECT b.bin AS i, b.n, b.npos, r.j, min(CAST(r.p AS DOUBLE) / r.c) AS mn
        |  FROM pb2 b JOIN rng r ON r.j <= b.bin AND b.bin <= r.k
        |  GROUP BY 1, 2, 3, 4),
        |iso AS (SELECT i AS bin, n, npos, max(mn) AS rate_iso FROM im GROUP BY 1, 2, 3)
        |SELECT bin, n,
        |  floor((CAST(npos AS DOUBLE) / n)*1000000 + 0.5)/1000000 AS rate_raw,
        |  floor((rate_iso)*1000000 + 0.5)/1000000 AS rate_iso
        |FROM iso ORDER BY bin""".stripMargin),
    "q_pca_top" ->
      """WITH ex AS (
        |  SELECT vec_id AS id, pos - 1 AS pos, x FROM (
        |    SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |           generate_subscripts(embedding, 1) AS pos
        |    FROM embeddings)),
        |mu AS (
        |  SELECT pos, count(*) AS n,
        |    (CAST(sum(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) / count(*) AS mu
        |  FROM ex GROUP BY pos),
        |exc AS (SELECT id, pos, x - mu AS xc FROM ex JOIN mu USING (pos)),
        |dm AS (SELECT count(*) AS d, max(n) AS n FROM mu),
        |v0 AS (SELECT pos, 1.0 / sqrt(CAST(d AS DOUBLE)) AS v FROM mu CROSS JOIN dm),
        |s1 AS (
        |  SELECT id, CAST(sum(CAST(floor((xc * v) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS s
        |  FROM exc JOIN v0 USING (pos) GROUP BY id),
        |u1 AS (
        |  SELECT pos, (CAST(sum(CAST(floor((xc * s) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) / n AS u
        |  FROM exc JOIN s1 USING (id) CROSS JOIN dm GROUP BY pos, n),
        |n1 AS (
        |  SELECT sqrt(CAST(sum(CAST(floor((u * u) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        |  FROM u1),
        |v1 AS (SELECT pos, u / nrm AS v FROM u1 CROSS JOIN n1),
        |s2 AS (
        |  SELECT id, CAST(sum(CAST(floor((xc * v) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS s
        |  FROM exc JOIN v1 USING (pos) GROUP BY id),
        |u2 AS (
        |  SELECT pos, (CAST(sum(CAST(floor((xc * s) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) / n AS u
        |  FROM exc JOIN s2 USING (id) CROSS JOIN dm GROUP BY pos, n),
        |n2 AS (
        |  SELECT sqrt(CAST(sum(CAST(floor((u * u) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        |  FROM u2),
        |v2 AS (SELECT pos, u / nrm AS v FROM u2 CROSS JOIN n2),
        |tot AS (
        |  SELECT CAST(sum(CAST(floor((xc * xc) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS tv
        |  FROM exc)
        |SELECT CAST(pos AS INT) AS pos,
        |  floor((v)*100000000 + 0.5)/100000000 AS loading,
        |  floor((nrm)*100000000 + 0.5)/100000000 AS eigenvalue,
        |  floor((nrm / (tv / n))*100000000 + 0.5)/100000000 AS var_frac
        |FROM v2 CROSS JOIN n2 CROSS JOIN dm CROSS JOIN tot ORDER BY pos""".stripMargin,
    "q_linkage" ->
      (s"WITH ${TextVector.lshPairsCte}," + """
        |pp AS (SELECT id_a, id_b, est_jaccard >= 0.75 AS pseudo FROM pairs),
        |db AS (
        |  SELECT doc_id, source, lang, CAST(floor(n_chars / 200) AS BIGINT) AS len_band
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |u_source AS (
        |  SELECT CAST(sum(c*(c-1)) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS u_source
        |  FROM (SELECT count(*) AS c FROM db GROUP BY source) CROSS JOIN nn GROUP BY n),
        |u_lang AS (
        |  SELECT CAST(sum(c*(c-1)) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS u_lang
        |  FROM (SELECT count(*) AS c FROM db GROUP BY lang) CROSS JOIN nn GROUP BY n),
        |u_len AS (
        |  SELECT CAST(sum(c*(c-1)) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS u_len_band
        |  FROM (SELECT count(*) AS c FROM db GROUP BY len_band) CROSS JOIN nn GROUP BY n),
        |fl AS (
        |  SELECT p.id_a, p.id_b, p.pseudo,
        |    CAST(a.source = b.source AS INT) AS agree_source,
        |    CAST(a.lang = b.lang AS INT) AS agree_lang,
        |    CAST(a.len_band = b.len_band AS INT) AS agree_len_band
        |  FROM pp p JOIN db a ON p.id_a = a.doc_id JOIN db b ON p.id_b = b.doc_id),
        |mm AS (
        |  SELECT
        |    CAST(sum(agree_source) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m_source,
        |    CAST(sum(agree_lang) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m_lang,
        |    CAST(sum(agree_len_band) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m_len_band
        |  FROM fl WHERE pseudo),
        |params AS (
        |  SELECT
        |    least(greatest(m_source, 0.001), 0.999) AS mc_source,
        |    least(greatest(u_source, 0.001), 0.999) AS uc_source,
        |    least(greatest(m_lang, 0.001), 0.999) AS mc_lang,
        |    least(greatest(u_lang, 0.001), 0.999) AS uc_lang,
        |    least(greatest(m_len_band, 0.001), 0.999) AS mc_len,
        |    least(greatest(u_len_band, 0.001), 0.999) AS uc_len
        |  FROM mm CROSS JOIN u_source CROSS JOIN u_lang CROSS JOIN u_len),
        |sc AS (
        |  SELECT id_a, id_b, agree_source, agree_lang, agree_len_band,
        |    (CASE WHEN agree_source = 1 THEN ln(mc_source / uc_source)
        |          ELSE ln((1.0 - mc_source) / (1.0 - uc_source)) END
        |     + CASE WHEN agree_lang = 1 THEN ln(mc_lang / uc_lang)
        |            ELSE ln((1.0 - mc_lang) / (1.0 - uc_lang)) END
        |     + CASE WHEN agree_len_band = 1 THEN ln(mc_len / uc_len)
        |            ELSE ln((1.0 - mc_len) / (1.0 - uc_len)) END) AS score
        |  FROM fl CROSS JOIN params)
        |SELECT id_a, id_b, agree_source, agree_lang, agree_len_band,
        |  floor((score)*1000000 + 0.5)/1000000 AS score,
        |  CASE WHEN score >= 2.0 THEN 'match'
        |       WHEN score <= -2.0 THEN 'non_match'
        |       ELSE 'possible' END AS decision
        |FROM sc ORDER BY id_a, id_b""".stripMargin),
    "q_diversity" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,13) AS BIGINT) % 10 AS INT) AS b,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, b,
        |    unnest([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN generate_series(1, len(w)-2)]) AS g
        |  FROM d WHERE len(w) >= 3),
        |pg AS (SELECT g, min(b) AS bucket FROM g GROUP BY g),
        |nt AS (SELECT bucket, count(*) AS new_types FROM pg GROUP BY 1),
        |st AS (SELECT b AS bucket, count(*) AS slice_tokens FROM g GROUP BY 1),
        |dp AS (SELECT b AS bucket, count(*) AS n_docs FROM d GROUP BY 1),
        |j AS (
        |  SELECT dp.bucket, n_docs,
        |    coalesce(slice_tokens, 0) AS slice_tokens,
        |    coalesce(new_types, 0) AS new_types
        |  FROM dp LEFT JOIN st USING (bucket) LEFT JOIN nt USING (bucket)),
        |c AS (
        |  SELECT *, CAST(sum(slice_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
        |    CAST(sum(new_types) OVER (ORDER BY bucket) AS BIGINT) AS cum_types
        |  FROM j)
        |SELECT bucket, n_docs, slice_tokens, new_types, cum_tokens, cum_types,
        |  CASE WHEN slice_tokens > 0 THEN
        |    floor((CAST(new_types AS DOUBLE) / CAST(slice_tokens AS DOUBLE))*1000000 + 0.5)/1000000
        |  END AS novelty_rate
        |FROM c ORDER BY bucket""".stripMargin,
    "q_blocklist" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
        |p AS (
        |  SELECT CAST(phrase_id AS BIGINT) AS phrase_id, phrase,
        |    len(string_split(phrase, ' ')) AS plen
        |  FROM (VALUES (1, 'table table'), (2, 'fast table value'), (3, 'batch window'),
        |               (4, 'slow filter value'), (5, 'agg join small')) v(phrase_id, phrase)),
        |w2 AS (
        |  SELECT doc_id, unnest([w[i]||' '||w[i+1] FOR i IN generate_series(1, len(w)-1)]) AS win
        |  FROM t WHERE len(w) >= 2),
        |w3 AS (
        |  SELECT doc_id, unnest([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN generate_series(1, len(w)-2)]) AS win
        |  FROM t WHERE len(w) >= 3),
        |h AS (
        |  SELECT doc_id, phrase_id, count(*) AS n_hits
        |  FROM w2 JOIN p ON plen = 2 AND win = phrase GROUP BY 1, 2
        |  UNION ALL
        |  SELECT doc_id, phrase_id, count(*) AS n_hits
        |  FROM w3 JOIN p ON plen = 3 AND win = phrase GROUP BY 1, 2)
        |SELECT doc_id, phrase_id, n_hits FROM h ORDER BY doc_id, phrase_id""".stripMargin)
}
