package graft.plans

import org.apache.spark.sql.SparkSession

/** One-call registration of the library's full custom SQL surface on an
  * existing session: the codegen'd vector kernels (cosine_sim,
  * dot_product), the byte-scan text expressions (ascii_tokens,
  * md5_long), and the runtime-injectable optimizer rewrite
  * (BinnedIntervalJoin). Sessions built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` get the
  * analysis-time guardrails and the optimizer rule at construction;
  * this is the path for a session you don't control the builder of.
  * Calling it on a GraftExtensions-built session is safe: the rule is
  * detected anywhere in the session's optimizer batches (extension
  * injection included), not just in extraOptimizations, so it never
  * runs in two batches. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    VectorExpressions.register(spark)
    TextExpressions.register(spark)
    val alreadyInjected =
      spark.sessionState.optimizer.batches.iterator.flatMap(_.rules).exists(_ eq BinnedIntervalJoin) ||
        spark.experimental.extraOptimizations.exists(_ eq BinnedIntervalJoin)
    if (!alreadyInjected)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BinnedIntervalJoin
  }
}
