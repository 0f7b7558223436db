package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextAnalysis

/** Corpus diversity growth — the Heaps-law / type-token curve that
  * answers "does doubling this corpus still add new content, or are we
  * re-crawling the same text?" (the saturation signal a crawl-
  * scheduling pipeline watches).
  *
  * The corpus is cut into `buckets` deterministic hash slices (md5 of
  * the doc id — the repo's reproducible-sampling convention; a hash
  * slice IS a uniform random slice, with no global sort to rank docs).
  * For each n-gram the FIRST slice containing it is one min-aggregate;
  * grouping by that first slice gives per-slice NEW-distinct counts,
  * and a window over the `buckets`-row frame turns per-slice counts
  * into the cumulative curve: cum_tokens (instances) vs cum_types
  * (distinct n-grams) plus the per-slice novelty rate
  * new_types/slice_tokens — the curve flattening toward 0 is
  * saturation.
  *
  * Scale shape: one |tokens|-row explode, one hash aggregate keyed by
  * the gram (map-side combinable min/count), one aggregate to the
  * `buckets`-row frame, windows only over those `buckets` rows. All
  * counts are exact integers; the single ratio is one IEEE division —
  * hash-gateable with no tolerance. */
object Diversity {

  /** Growth curve of distinct `n`-grams over `buckets` cumulative hash
    * slices. Returns one row per slice: (bucket, n_docs, slice_tokens,
    * new_types, cum_tokens, cum_types, novelty_rate). */
  def growthCurve(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, buckets: Int = 10): DataFrame = {
    require(n >= 1 && buckets >= 2, s"need n >= 1, buckets >= 2, got n=$n buckets=$buckets")
    val bucket = (conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long") % buckets).cast("int")
    val grams = docs
      .withColumn("__b", bucket)
      .withColumn("__toks", TextAnalysis.tokens(textCol))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), col("__b"),
        explode(TextAnalysis.shinglesMulti("__toks", n)).as("__g"))
    // per gram: first slice + per-slice instance counts in ONE keyed agg
    val perGram = grams.groupBy(col("__g"))
      .agg(min(col("__b")).as("__first"), count(lit(1)).as("__cnt"))
    val newTypes = perGram.groupBy(col("__first").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val sliceTok = grams.groupBy(col("__b").as("bucket"))
      .agg(count(lit(1)).as("slice_tokens"))
    val docsPer = docs.withColumn("__b", bucket)
      .groupBy(col("__b").as("bucket")).agg(count(lit(1)).as("n_docs"))
    val w = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    docsPer
      .join(sliceTok, Seq("bucket"), "left")
      .join(newTypes, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("slice_tokens"), lit(0L)).as("slice_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_tokens", sum(col("slice_tokens")).over(w))
      .withColumn("cum_types", sum(col("new_types")).over(w))
      .withColumn("novelty_rate",
        when(col("slice_tokens") > 0,
          col("new_types").cast("double") / col("slice_tokens").cast("double")))
  }
}
