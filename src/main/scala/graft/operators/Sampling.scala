package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reproducible sampling/splitting for training-data pipelines.
  *
  * Both operators key on a content-independent hash of the ID column,
  * so membership is a pure function of the row — stable across runs,
  * engines, partitionings, and data order (the property `rand()`-based
  * sampling lacks). Scale shape: hashSplit is a pure projection (zero
  * shuffle); stratifiedSample shuffles once on the stratum key.
  */
object Sampling {

  /** Deterministic hash bucket in [0, buckets): md5 of the stringified
    * id, first 8 hex chars → integer. Engine-independent (DuckDB:
    * `CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,8) AS BIGINT) % n`). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Train/val/test split by hash bucket — the canonical reproducible
    * split. `weights` are integer percents summing to 100 (exact bucket
    * arithmetic, no float thresholds). Adds a `split` column; zero
    * shuffle, zero state. */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10))
      : DataFrame = {
    require(weights.map(_._2).sum == 100, s"weights must sum to 100, got $weights")
    val bucket = hashBucket(col(idCol))
    val cutoffs = weights.scanLeft(0)(_ + _._2).tail
    // first-match ladder in declared order: bucket < cumulative cutoff
    val ladder = weights.zip(cutoffs).reverse.foldLeft(lit(weights.last._1)) {
      case (els, ((name, _), cutoff)) => when(bucket < cutoff, name).otherwise(els)
    }
    df.withColumn("split", ladder)
  }

  /** Token-budget mixture (the LLM-pretraining data-mix op): each
    * stratum contributes documents until its share of the total token
    * budget is reached. Documents are taken in deterministic hash order
    * (reproducible), and a stratum keeps every row whose PRECEDING
    * cumulative token count is below its budget share — so the mix
    * overshoots by at most one document per stratum and small strata
    * contribute everything they have. One shuffle on the stratum key. */
  def mixByTokenBudget(df: DataFrame, strataCol: String, idCol: String, tokenCol: String,
                       weights: Map[String, Double], totalBudget: Long): DataFrame = {
    require(math.abs(weights.values.sum - 1.0) < 1e-9, s"weights must sum to 1, got $weights")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val share = weights.foldLeft(lit(0.0)) { case (els, (k, v)) =>
      when(col(strataCol) === k, v).otherwise(els)
    }
    df.filter(col(strataCol).isin(weights.keys.toSeq: _*))
      .withColumn("__cum_before",
        coalesce(sum(col(tokenCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__cum_before") < share * totalBudget)
      .drop("__cum_before")
  }

  /** Distributed sequence packing (the pretraining batch-construction
    * op): assign documents to fixed-token-budget bins. Documents are
    * spread over `buckets` hash groups; within each group they fill
    * bins greedily in deterministic hash order — bin = floor(preceding
    * cumulative tokens / seqLen). Fully parallel across buckets (the
    * exact global greedy pack is inherently sequential); each bucket's
    * last bin may be underfilled and a document longer than `seqLen`
    * overflows its bin (truncation is the caller's policy). Adds
    * `bin_id`; one shuffle on the bucket key. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Long, buckets: Int = 32): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__bucket", hashBucket(col(idCol), buckets))
      .withColumn("__cum_before",
        coalesce(sum(col(tokenCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin_id",
        concat_ws("-", col("__bucket"), floor(col("__cum_before") / seqLen)))
      .drop("__bucket", "__cum_before")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES, IPL 2006): each row draws u ∈ (0,1) from a seeded
    * hash-uniform and is ranked by key = u^(1/weight); the global top-k
    * under that key is distributed exactly as sequential weighted
    * sampling without replacement. The uniform is hash-derived (52
    * md5 bits → (h+0.5)/2^52, every step IEEE-exact), so the sample is
    * the same on every run, engine, and partitioning — `rand()`-based
    * weighted sampling is not even the same twice locally. Scale shape:
    * pure projection + global top-k (TakeOrderedAndProject — per-
    * partition heaps of k, no full sort, no shuffle of non-winners). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     seed: String = "aes"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    // A-ES is only defined for w > 0: w = 0 would give u^(1/0) = Inf
    // exponent and w < 0 gives u^(1/w) > 1 — either silently always
    // wins the top-k. Fail fast per-row instead (raise_error keeps the
    // whole check inside the codegen'd projection — no extra pass).
    val w = col(weightCol).cast("double")
    val checked = when(w > 0, w).otherwise(raise_error(concat(
      lit(s"weightedSample: $weightCol must be > 0 (A-ES undefined), got "), w)))
    df.withColumn("sample_key", pow(u, lit(1.0) / checked))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic negative sampling for contrastive training: for each
    * anchor, `k` negatives drawn from a candidate pool, excluding the
    * anchor's known positives, ranked by a seeded per-(anchor,candidate)
    * hash — reproducible across runs/engines, and each anchor gets an
    * independent pseudo-random order (no shared "first k" bias).
    *
    * Scale contract: `candidates` must be a PRE-SAMPLED pool (e.g.
    * [[weightedSample]] or a hash-order top-P), small enough to
    * broadcast — the cross join is anchors × pool, never anchors ×
    * corpus. Positives are removed by anti-join before ranking, so the
    * pool should carry ≥ k + expected-positive-overlap candidates. */
  def negativeSample(anchors: DataFrame, anchorCol: String,
                     candidates: DataFrame, candCol: String,
                     positives: DataFrame, k: Int, seed: String = "neg"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(anchorCol)).orderBy(col("__r"), col(candCol))
    anchors.select(col(anchorCol))
      .crossJoin(broadcast(candidates.select(col(candCol))))
      .join(positives.select(col(anchorCol), col(candCol)), Seq(anchorCol, candCol), "left_anti")
      .withColumn("__r", md5(concat_ws(":", lit(seed),
        col(anchorCol).cast("string"), col(candCol).cast("string"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__r")
  }

  /** Exact stratified sample: per stratum, keep ceil(fraction·n) rows,
    * chosen by deterministic hash order (md5 of id, id tiebreak) — the
    * same rows every run, exact per-stratum allocation (largest-count
    * guarantee `rand() < p` sampling can't give). One shuffle on the
    * stratum key. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0,1], got $fraction")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val wAll = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * land in the SAME split, or the held-out sets are contaminated by
    * paraphrases of training rows (the C4/Dolma pipeline splits on the
    * dedup CLUSTER, not the document). `dupPairs` is any near-dup pair
    * frame (id_a, id_b) — e.g. Dedup.lshCandidatePairs above a Jaccard
    * floor; clusters come from Dedup.connectedComponents, singletons
    * keep their own id as the cluster, and the split is [[hashSplit]]
    * keyed on the cluster id. Adds (cluster_id, split).
    *
    * Scale shape: CC is the pointer-doubling loop (O(log d) rounds over
    * a |pairs|-scale frame); everything after is one left equi-join +
    * the zero-shuffle hash ladder. */
  def leakageSafeSplit(df: DataFrame, idCol: String, dupPairs: DataFrame,
                       weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
                       labels: Option[DataFrame] = None): DataFrame = {
    // `labels` short-circuits the CC run for callers that already hold
    // the (id, cluster_id) labeling of dupPairs — e.g. a session-shared
    // leaf also feeding the cluster/canonical queries. Caller contract:
    // labels IS the CC labeling of dupPairs (min-id clusters).
    val cc = labels.getOrElse(Dedup.connectedComponents(dupPairs))
      .select(col("id").as(idCol), col("cluster_id"))
    val clustered = df
      .join(cc, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    hashSplit(clustered, "cluster_id", weights)
  }

  /** Water-filling domain caps — the data-mixing dual of
    * [[mixByTokenBudget]]: instead of PRESCRIBING per-domain shares,
    * solve for the single cap `c` such that Σ_d min(tokens_d, c) =
    * `budget` and allocate min(tokens_d, c) to every domain. Small
    * domains keep everything; big domains are clipped at one common
    * water level — the standard head-domain de-biasing step when
    * building a pretraining mix from raw crawl counts.
    *
    * Closed form on domains sorted by token count ascending: with
    * prefix sums S_i, domain i is fully satisfiable iff
    * S_i + (n−i)·t_i ≤ budget; for k such domains the cap is
    * (budget − S_k)/(n−k) (or t_max when k = n, i.e. the budget covers
    * the corpus). All decisions compare exact integers scaled by
    * (n−k), so fully/clipped labeling is engine-exact; only the cap
    * itself is one IEEE division.
    *
    * Scale shape: one keyed aggregation to |domains| rows, then
    * windows over that domain-level frame. The global sort window runs
    * on |domains| rows, NOT corpus rows — fine to thousands of
    * domains; for per-URL-host caps (millions of keys) swap the
    * window for the two-level prefix sum in Drift.ksTwoSample, same
    * algebra.
    *
    * Returns one row per domain: (strataCol, tokens_avail,
    * tokens_alloc, clipped) with tokens_alloc rounded to 4 decimals. */
  def waterFillCaps(df: DataFrame, strataCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val dom = df.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).cast("long").as("tokens_avail"))
    val wAsc = Window.orderBy(col("tokens_avail"), col(strataCol))
    val wAll = Window.partitionBy()
    val ranked = dom
      .withColumn("__s", sum(col("tokens_avail")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__i", row_number().over(wAsc))
      .withColumn("__n", count(lit(1)).over(wAll))
      // integer feasibility test: domain i keeps everything iff the
      // water level at its height fits the budget
      .withColumn("__full",
        col("__s") + (col("__n") - col("__i")) * col("tokens_avail") <= lit(budget))
      .withColumn("__k", sum(when(col("__full"), 1L).otherwise(0L)).over(wAll))
      .withColumn("__sk", max(when(col("__full"), col("__s")).otherwise(lit(0L))).over(wAll))
    ranked
      .withColumn("__cap",
        when(col("__k") === col("__n"), col("tokens_avail").cast("double"))
          .otherwise((lit(budget) - col("__sk")).cast("double") / (col("__n") - col("__k"))))
      .withColumn("clipped", !col("__full"))
      .withColumn("tokens_alloc", graft.queries.rd(
        when(col("__full"), col("tokens_avail").cast("double")).otherwise(col("__cap")), 4))
      .select(col(strataCol), col("tokens_avail"), col("tokens_alloc"), col("clipped"))
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * α-sampling rule (exponent-smoothed sampling, as in the mBERT/XLM
    * pretraining recipe): source i is sampled with probability
    * w_i = p_i^α / Σ_j p_j^α where p_i is its raw token share. α = 1
    * keeps natural proportions; α → 0 flattens toward uniform, lifting
    * low-resource sources. Returns one row per stratum: n_docs,
    * n_tokens, p_raw, weight, expected_tokens = weight·budget, and
    * epochs = expected/available (> 1 ⇒ the source is repeated —
    * the upsampling-repetition signal the mix designer watches).
    *
    * Exactness: p_raw is one IEEE division of exact longs; α = 0.5
    * (the common default) is computed with `sqrt` — correctly rounded
    * by IEEE 754, so identical on every engine, unlike `pow`, which
    * carries a libm ulp. The normalizer Σ p^α is summed in 1e-12 fixed
    * point (order-independent); every downstream value is then a pure
    * division/multiplication of identical inputs — tolerance-free.
    * Non-half exponents fall back to `pow` (callers should round).
    *
    * Scale shape: one partial+final aggregate to the |strata|-row
    * frame, one broadcast 1-row totals frame — no windows, no sort;
    * the corpus is scanned once. */
  def temperatureWeights(df: DataFrame, strataCol: String, tokenCol: String,
                         alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val per = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).cast("long").as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("__tot"))
    val powAlpha = (c: Column) =>
      if (alpha == 1.0) c else if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))
    val raw = per.crossJoin(broadcast(tot))
      .withColumn("p_raw", col("n_tokens").cast("double") / col("__tot").cast("double"))
      .withColumn("__pa", powAlpha(col("p_raw")))
    val z = raw.agg(
      sum(floor(col("__pa") * lit(1e12) + lit(0.5)).cast("long")).as("__zfx"))
    raw.crossJoin(broadcast(z))
      .withColumn("weight", col("__pa") / (col("__zfx").cast("double") / lit(1e12)))
      .withColumn("expected_tokens", col("weight") * lit(budget.toDouble))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        col("p_raw"), col("weight"), col("expected_tokens"),
        (col("expected_tokens") / col("n_tokens").cast("double")).as("epochs"))
  }

  /** Deterministic per-epoch shuffle key: md5 of (seed, epoch, id) —
    * a fresh pseudo-random total order per epoch that is identical on
    * every run, engine, and partitioning (the property training-data
    * reproducibility actually needs; `rand()` has none of it). Ordering
    * compares the hex STRING — no numeric conversion to disagree on. */
  def epochShuffleKey(id: Column, seed: String, epoch: Int): Column =
    md5(concat_ws(":", lit(seed), lit(epoch), id.cast("string")))

  /** Stratified epoch ordering — the "in what order does the trainer
    * see the data" operator. Within each stratum rows are ranked by
    * `orderCol` (a difficulty score for curriculum, an
    * [[epochShuffleKey]] for a shuffled epoch), and the global epoch
    * order is (rn, stratum): one row from each stratum round-robin —
    * no source ever dominates a training window, which is the failure
    * mode of concatenated-source epochs.
    *
    * Returns the input plus `rn` (1-based rank within stratum). The
    * consumer materializes the epoch by sorting on (rn, stratum) —
    * a range-partitioned distributed sort at scale, never a single
    * reducer; for a bounded head (the usual inspection/smoke path)
    * Catalyst folds it to TakeOrderedAndProject. Windows partition by
    * the STRATUM, so ranking parallelizes per source and no global
    * row-number is ever computed. */
  def stratifiedInterleave(df: DataFrame, strataCol: String,
                           orderCol: Column, tieCol: String): DataFrame =
    df.withColumn("rn", row_number().over(
      Window.partitionBy(col(strataCol)).orderBy(orderCol, col(tieCol))))
}
