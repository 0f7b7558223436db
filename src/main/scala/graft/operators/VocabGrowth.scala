package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextAnalysis

/** Heaps'-law vocabulary-growth curve (Heaps 1978; Herdan 1960):
  * V(n) ≈ K·n^β — the corpus-composition diagnostic a tokenizer/mix
  * designer reads before freezing a vocab budget. A slice whose β
  * stays high keeps minting new types (OCR noise, IDs, code — vocab
  * pressure); a β collapsing toward 0 means the slice has saturated
  * (duplicated boilerplate). The curve also calibrates "how much more
  * data until X% OOV" for a fixed vocabulary.
  *
  * Computation, shaped for 100 TB:
  *  - docs are assigned to ORDERED buckets of `bucketSize` ids; every
  *    cumulative quantity lives at bucket grain, so the only global
  *    window runs over #buckets rows (caller scales bucketSize to keep
  *    that ≤ ~10⁴ — the curve needs resolution, not row grain);
  *  - per-bucket token mass is one map-side-combinable aggregate;
  *  - type first-sightings: one shuffle keyed by TERM (min doc_id per
  *    term — associative, partial-agg friendly), then a COUNT per
  *    first-bucket: the cumulative vocab at bucket b is Σ of new-type
  *    counts through b, never a distinct-count over a prefix (the
  *    naive formulation rescans the corpus per checkpoint).
  *  - β and K come from one OLS fit of ln V on ln n over the bucket
  *    checkpoints (closed form, single 1-row aggregate, broadcast
  *    back onto the curve).
  *
  * Bucket ids come from the caller-supplied monotone `idCol` — at
  * 100 TB that is an ingest sequence or event-time rank, which is
  * exactly the axis "growth" is measured along.
  */
object VocabGrowth {

  /** Per-bucket curve: (bucket, n_docs, bucket_tokens, cum_tokens,
    * new_types, cum_vocab) plus the fitted heaps_beta / heaps_k
    * repeated on every row (6-dp rounded). Buckets with zero new
    * types still appear (token mass drives the bucket universe). */
  def heapsCurve(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 bucketSize: Long = 25L): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    val toks = df.select(col(idCol).as("__id"),
      TextAnalysis.tokens(textCol).as("__toks"))
    val bucketed = toks.withColumn("__bucket", floor(col("__id") / bucketSize).cast("long"))

    val perBucket = bucketed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(size(col("__toks"))).as("bucket_tokens"))

    // one shuffle on term; min(__id) is partial-aggregable
    val firstSeen = bucketed
      .select(col("__id"), explode(col("__toks")).as("__term"))
      .groupBy(col("__term")).agg(min(col("__id")).as("__first_id"))
      .withColumn("__bucket", floor(col("__first_id") / bucketSize).cast("long"))
      .groupBy(col("__bucket")).agg(count(lit(1)).as("new_types"))

    val wCum = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = perBucket.join(firstSeen, Seq("__bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_tokens", sum(col("bucket_tokens")).over(wCum))
      .withColumn("cum_vocab", sum(col("new_types")).over(wCum))

    // OLS of ln(cum_vocab) on ln(cum_tokens) over the checkpoints
    val x = log(col("cum_tokens").cast("double"))
    val y = log(col("cum_vocab").cast("double"))
    val fit = curve.filter(col("cum_tokens") > 0 && col("cum_vocab") > 0)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .select(
        ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))).as("__beta"),
        col("__sx"), col("__sy"), col("__n"))
      .select(col("__beta"),
        exp((col("__sy") - col("__beta") * col("__sx")) / col("__n")).as("__k"))
    val p6 = math.pow(10, 6)
    curve.crossJoin(broadcast(fit))
      .select(col("__bucket").as("bucket"), col("n_docs"), col("bucket_tokens"),
        col("cum_tokens"), col("new_types"), col("cum_vocab"),
        (floor(col("__beta") * p6 + lit(0.5)) / p6).as("heaps_beta"),
        (floor(col("__k") * p6 + lit(0.5)) / p6).as("heaps_k"))
  }
}
