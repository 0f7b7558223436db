package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Multinomial Naive Bayes text classification as pure dataflow — the
  * classic fast-and-strong baseline for corpus labeling jobs (source /
  * language / quality-tier routing) where training a real model per
  * sweep is overkill. The "model" is a DataFrame (term, label,
  * log-likelihood), never a driver-side object, so fitting is two
  * keyed aggregations and scoring is one equi-join — works at any
  * vocabulary size.
  *
  * Numerics: per-(term, label) Laplace log-likelihoods
  * ln((n_tc + 1) / (n_tok_c + V)) and log-priors ln(n_docs_c / N) are
  * quantized to 1e-9 fixed point BEFORE summation, and per-doc scores
  * are exact integer sums of those longs (the chi2/fixed-point-moments
  * recipe) — so the argmax is over exact integers: no float-order or
  * engine drift can flip a prediction. Ties (exactly equal fixed-point
  * scores) break to the LARGER label, pinned by max(struct(score,
  * label)).
  *
  * Scale shape: token explode → (doc, term) counts (one doc-key agg),
  * term-class counts + the V×C Laplace grid (term-keyed shuffles; the
  * grid is vocabulary-bounded model state, not corpus-bounded), score
  * join on term, one (doc, label) agg, one doc agg for the argmax. No
  * collect, no windows over the corpus.
  */
object NaiveBayes {

  /** Fit on `docs` and self-classify every row that has at least one
    * token (train-set evaluation — the vocabulary is closed, so Laplace
    * covers every (term, class) hole; token-less documents carry no
    * multinomial evidence and are EXCLUDED from fit and output both).
    * Returns one row per scored document:
    * (idCol, label_true, label_pred, correct). Feed the confusion
    * aggregation downstream; accuracy = avg(correct). */
  def fitPredict(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String): DataFrame = {
    // EVERY statistic below derives from the (doc, label, term) count
    // frame — the coarsest sufficient aggregate (guide §2.3 "aggregate
    // before you shuffle"): one corpus scan + explode + one keyed agg
    // builds dt, then class totals / corpus totals / term-class counts
    // / vocab are all re-aggregations of the (much smaller) deduped dt
    // leaf. The previous shape cut the raw exploded tokens to the leaf
    // and re-scanned THAT five times — measured ~2× this query's cost
    // at sf0.1 (q_kappa 3.2 s, 33 single-task stages, most of them
    // full passes over the exploded tokens).
    val dt = graft.core.Lineage.truncate(docs
      .select(col(idCol), col(labelCol).as("label_true"),
        TextAnalysis.tokens(textCol).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col(idCol), col("label_true"), explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("label_true"), col("term"))
      .agg(count(lit(1)).as("c")))
    // term × class Laplace grid (missing (term, class) pairs get n_tc=0)
    // and the (doc, label) token totals — the only two direct passes
    // over dt besides the scoring join; class totals, corpus totals and
    // the vocabulary all re-aggregate these two far smaller frames
    // (values identical: labels are per-doc, so dl rows ARE the
    // distinct docs and tc's terms ARE the distinct vocabulary)
    val tc = dt.groupBy(col("term"), col("label_true").as("label"))
      .agg(sum(col("c")).as("n_tc"))
    val dl = dt.groupBy(col(idCol), col("label_true").as("label"))
      .agg(sum(col("c")).as("n_tok"))
    val cls = dl.groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs_c"), sum(col("n_tok")).as("n_tok_c"))
    val tot = dl.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tc.agg(countDistinct(col("term")).as("v")))
    val vocab = tc.select(col("term")).distinct()
    val fp = (x: org.apache.spark.sql.Column) =>
      floor(x * lit(1000000000L) + lit(0.5)).cast("long")
    val model = vocab.crossJoin(broadcast(cls))
      .join(tc, Seq("term", "label"), "left")
      .crossJoin(broadcast(tot))
      .select(col("term"), col("label"),
        fp(log((coalesce(col("n_tc"), lit(0L)) + lit(1)).cast("double") /
          (col("n_tok_c") + col("v")).cast("double"))).as("ll_fp"))
    val prior = cls.crossJoin(broadcast(tot))
      .select(col("label"),
        fp(log(col("n_docs_c").cast("double") / col("n_docs").cast("double"))).as("prior_fp"))
    // score: every doc against every class — exact long sums
    val scores = dt.join(model, Seq("term"))
      .groupBy(col(idCol), col("label_true"), col("label"))
      .agg(sum(col("c") * col("ll_fp")).as("s"))
      .join(broadcast(prior), Seq("label"))
      .select(col(idCol), col("label_true"), col("label"),
        (col("s") + col("prior_fp")).as("score"))
    scores.groupBy(col(idCol), col("label_true"))
      .agg(max(struct(col("score"), col("label"))).as("m"))
      .select(col(idCol), col("label_true"), col("m.label").as("label_pred"),
        (col("m.label") === col("label_true")).as("correct"))
  }

  /** Confusion matrix over [[fitPredict]]'s output: one row per
    * (label_true, label_pred) with its doc count — the C×C summary a
    * labeling-quality dashboard reads. */
  def confusion(pred: DataFrame): DataFrame =
    pred.groupBy(col("label_true"), col("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
}
