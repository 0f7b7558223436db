package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Kaplan-Meier survival estimation with right-censoring — the
  * retention curve done correctly: a user who is still active at the
  * end of the observation window hasn't churned, they're CENSORED,
  * and dropping or mis-counting them biases naive retention DOWN.
  *
  *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)
  *
  * with dᵢ the observed churn events at duration tᵢ and nᵢ the
  * at-risk count (everyone with duration ≥ tᵢ).
  *
  * Exactness: dᵢ/nᵢ are exact integer ratios; the product is carried
  * as exp(Σ ln(1 − dᵢ/nᵢ)) with each ln-term rounded to 1e-9 fixed
  * point and cumulated in exact longs — the one libm call per
  * DISTINCT duration (≤ observation-window days, a tiny frame), so
  * engines agree to well below the 6-decimal reporting grain.
  *
  * Scale shape: one groupBy(subject) for durations (the only
  * corpus-scale shuffle), one groupBy(duration) to the ≤|window|-day
  * frame, cumulative windows over THAT frame only. */
object Survival {

  /** Per-duration KM table from a per-subject (duration, observed)
    * frame: (duration, n_risk, n_events, n_censored, survival).
    * `observedCol` is 1 when the terminal event (churn) was seen,
    * 0 when the subject is censored at that duration. */
  def kaplanMeier(subjects: DataFrame, durationCol: String,
                  observedCol: String): DataFrame = {
    val per = subjects.groupBy(col(durationCol).as("duration"))
      .agg(sum(col(observedCol).cast("long")).as("n_events"),
        sum(lit(1L) - col(observedCol).cast("long")).as("n_censored"),
        count(lit(1)).as("n_total"))
    val wCum = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val total = per.agg(sum(col("n_total")).as("__all"))
    per.crossJoin(broadcast(total))
      .withColumn("n_risk", col("__all") - coalesce(sum(col("n_total")).over(wCum), lit(0L)))
      // ln(1 − d/n) in 1e-9 fixed point, cumulated exactly, exp'd once;
      // the greatest() floor keeps the d = n bucket (curve hits 0)
      // finite — survival then rounds to 0 instead of ln(0) = −∞
      .withColumn("__lnterm",
        floor(log(greatest(lit(1.0) - col("n_events").cast("double") / col("n_risk"),
          lit(1e-12))) * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("survival",
        exp(sum(col("__lnterm")).over(wRun).cast("double") / lit(1e9)))
      .select(col("duration"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"))
  }

  /** Churn framing over an event log: per-subject duration = days
    * from first to last activity; churn OBSERVED when the subject has
    * been silent for ≥ `silenceDays` before the corpus end, CENSORED
    * otherwise (still active at the boundary — their true lifetime is
    * longer than we can see). */
  def churnSubjects(events: DataFrame, subjectCol: String, tsCol: String,
                    silenceDays: Int): DataFrame = {
    val d = events.select(col(subjectCol).as("subject"), to_date(col(tsCol)).as("d"))
    val span = d.groupBy(col("subject"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val corpusEnd = d.agg(max(col("d")).as("end_d"))
    span.crossJoin(broadcast(corpusEnd))
      .select(col("subject"),
        datediff(col("last_d"), col("first_d")).cast("long").as("duration"),
        (datediff(col("end_d"), col("last_d")) >= silenceDays)
          .cast("long").as("observed"))
  }

  /** Convenience: [[churnSubjects]] piped into [[kaplanMeier]]. */
  def churnCurve(events: DataFrame, subjectCol: String, tsCol: String,
                 silenceDays: Int): DataFrame =
    kaplanMeier(churnSubjects(events, subjectCol, tsCol, silenceDays),
      "duration", "observed")
}
