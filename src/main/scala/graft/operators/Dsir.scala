package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** DSIR-style data selection: hashed n-gram importance weights
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling", arXiv:2302.03169). Every raw document gets
  * a log importance weight
  *
  *   log w(x) = Σ_b c_x[b] · ( ln p̂_target[b] − ln p̂_raw[b] ),
  *
  * where c_x[b] counts the document's hashed unigram+bigram features
  * landing in bucket b and both distributions are Laplace-smoothed
  * bucket frequencies. Documents resembling the target domain more
  * than the raw corpus score > 0; resampling raw data proportional to
  * w concentrates it on the target distribution.
  *
  * Scale shape: both models are B-row count tables (B = `buckets`,
  * constant) built by one keyed aggregation each, broadcast into the
  * scoring join; the per-doc score is one more keyed aggregation. No
  * driver-side vocabulary, no all-pairs anything — three shuffles
  * total at any corpus size, two of them over B-row frames.
  *
  * The feature hash is the md5-prefix bucket (same construction as
  * Dedup.minhashSignatures' base hash) so the DuckDB oracle can mirror
  * it textually: `cast(conv(substr(md5(f),1,15),16,10) as bigint) % B`.
  */
object Dsir {

  /** Hashed unigram+bigram feature array for a token-array column —
    * multiplicities preserved (DSIR counts, not presence). */
  private def featureBuckets(toksCol: String, buckets: Int) = expr(
    s"""transform(
       |  concat($toksCol,
       |         transform(sequence(1, size($toksCol) - 1),
       |                   i -> concat(element_at($toksCol, i), ' ', element_at($toksCol, i + 1)))),
       |  f -> cast(conv(substr(md5(f), 1, 15), 16, 10) as bigint) % $buckets)""".stripMargin)

  /** Importance weights for every `raw` document against a `target`
    * sample. Returns (idCol, n_feats, log_weight) — log_weight rounded
    * to 4 decimals at the surface (sum-of-ln drift is ~1e-11 at any
    * realistic document size; same contract as
    * Collocations.unigramCrossEntropy).
    *
    * `target` rows need only `textCol`; docs with zero tokens carry no
    * evidence either way and are excluded (degenerate for selection).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 64, alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    require(alpha > 0, s"alpha must be > 0 (unsmoothed ln(0) diverges), got $alpha")
    def bucketed(df: DataFrame, cols: Seq[String]): DataFrame = df
      .withColumn("__toks", TextAnalysis.tokens(textCol))
      .filter(size(col("__toks")) > 0)
      .select(cols.map(col) :+ explode(featureBuckets("__toks", buckets)).as("b"): _*)
    val rawFeats = bucketed(raw, Seq(idCol))
    // B-row smoothed log-frequency models; ratios only ever read buckets
    // that occur in rawFeats, and those are all present in rawCnt by
    // construction — the left join fills target-absent buckets with the
    // smoothing floor
    val rawCnt = rawFeats.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgtCnt = bucketed(target, Seq.empty).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = rawCnt.agg(sum(col("cr")).as("nr"))
      .crossJoin(tgtCnt.agg(sum(col("ct")).as("nt")))
    val lam = rawCnt.join(tgtCnt, Seq("b"), "left").crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(alpha)) / (col("nt") + lit(alpha * buckets)))
          - log((col("cr") + lit(alpha)) / (col("nr") + lit(alpha * buckets)))).as("lam"))
    rawFeats.join(broadcast(lam), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        graft.queries.rd(sum(col("lam")), 4).as("log_weight"))
  }
}
