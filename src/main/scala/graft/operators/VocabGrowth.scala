package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * types still appear (token mass drives the bucket universe).
    *
    * Determinism contract: the OLS sums accumulate FIXED-POINT longs
    * (each ln() value rounded at 1e-9 before summation), so the fit is
    * bit-stable under any partition/summation order — the same recipe
    * the divergence queries use. Degenerate curves (fewer than 2
    * valid checkpoints, or zero OLS denominator) yield NULL
    * heaps_beta / heaps_k explicitly rather than ±Inf/NaN. */
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

    // OLS of ln(cum_vocab) on ln(cum_tokens) over the checkpoints —
    // fixed-point (1e-9) long accumulation: summation-order-proof
    def f9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)).cast("long")
    val x9 = f9(log(col("cum_tokens").cast("double"))).cast("double") / lit(1e9)
    val y9 = f9(log(col("cum_vocab").cast("double"))).cast("double") / lit(1e9)
    val fit0 = curve.filter(col("cum_tokens") > 0 && col("cum_vocab") > 0)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(f9(x9)).cast("double").as("__sx"), sum(f9(y9)).cast("double").as("__sy"),
        sum(f9(x9 * y9)).cast("double").as("__sxy"),
        sum(f9(x9 * x9)).cast("double").as("__sxx"))
    // scales: __sx/__sy = Σv·1e9, __sxy/__sxx = Σv·1e9 → numerator and
    // denominator both carry 1e18; the ratio is scale-free
    val den = col("__n") * col("__sxx") * lit(1e9) - col("__sx") * col("__sx")
    val num = col("__n") * col("__sxy") * lit(1e9) - col("__sx") * col("__sy")
    val fit = fit0
      .select(when(col("__n") >= 2 && den =!= 0.0, num / den).as("__beta"),
        col("__sx"), col("__sy"), col("__n"))
      .select(col("__beta"),
        exp((col("__sy") / lit(1e9) - col("__beta") * col("__sx") / lit(1e9)) / col("__n"))
          .as("__k"))
    val p6 = math.pow(10, 6)
    curve.crossJoin(broadcast(fit))
      .select(col("__bucket").as("bucket"), col("n_docs"), col("bucket_tokens"),
        col("cum_tokens"), col("new_types"), col("cum_vocab"),
        (floor(col("__beta") * p6 + lit(0.5)) / p6).as("heaps_beta"),
        (floor(col("__k") * p6 + lit(0.5)) / p6).as("heaps_k"))
  }

  /** Zipf's-law fit over the term-frequency spectrum: freq(r) ≈ C·r^−α
    * — Heaps' dual (the two exponents are linked; a corpus that obeys
    * one obeys the other). A healthy natural-language slice fits
    * α ≈ 1; far-off α flags boilerplate floods (α high — a few
    * templates dominate) or ID/noise floods (α low — a flat spectrum).
    *
    * Emits the top-`topN` spectrum rows (rank, term, freq — rank by
    * count desc then term asc, deterministic) with the OLS fit of
    * ln freq on ln rank repeated on every row, SAME fixed-point recipe
    * as [[heapsCurve]] (1e-9 longs; <2 points or zero denominator →
    * NULL α/C).
    *
    * Scale shape: one explode+count keyed shuffle (map-side
    * combinable), then ranking/fit over topN rows only — the global
    * sort is a TakeOrdered of the aggregated term frame, never the
    * corpus. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    require(topN >= 2, s"topN must be >= 2 for a fit, got $topN")
    val counts = df.select(explode(TextAnalysis.tokens(textCol)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc).limit(topN)
    val ranked = counts.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("term").asc)).cast("long"))
    def f9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)).cast("long")
    val x9 = f9(log(col("rank").cast("double"))).cast("double") / lit(1e9)
    val y9 = f9(log(col("freq").cast("double"))).cast("double") / lit(1e9)
    val fit0 = ranked.agg(count(lit(1)).cast("double").as("__n"),
      sum(f9(x9)).cast("double").as("__sx"), sum(f9(y9)).cast("double").as("__sy"),
      sum(f9(x9 * y9)).cast("double").as("__sxy"),
      sum(f9(x9 * x9)).cast("double").as("__sxx"))
    val den = col("__n") * col("__sxx") * lit(1e9) - col("__sx") * col("__sx")
    val num = col("__n") * col("__sxy") * lit(1e9) - col("__sx") * col("__sy")
    val fit = fit0
      .select(when(col("__n") >= 2 && den =!= 0.0, num / den).as("__slope"),
        col("__sx"), col("__sy"), col("__n"))
      .select((-col("__slope")).as("__alpha"),
        exp((col("__sy") / lit(1e9) - col("__slope") * col("__sx") / lit(1e9)) / col("__n"))
          .as("__c"))
    val p6 = math.pow(10, 6)
    ranked.crossJoin(broadcast(fit))
      .select(col("rank"), col("term"), col("freq"),
        (floor(col("__alpha") * p6 + lit(0.5)) / p6).as("zipf_alpha"),
        (floor(col("__c") * p6 + lit(0.5)) / p6).as("zipf_c"))
  }
}
