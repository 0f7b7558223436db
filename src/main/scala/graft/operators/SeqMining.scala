package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-2 sequential-pattern mining over an event log (the depth-2
  * core of PrefixSpan, Pei et al. 2001): for every ordered pair of
  * event types (a → b), the number of users with SOME a-event strictly
  * before SOME b-event, and its support over the active-user base.
  * This is the "what do users do next" sequence signal: the reference
  * has no funnel/sequence surface (its dashboards stop at per-minute
  * rate trends, realtime-metrics-sql-pack.sql); here every type pair
  * is scored in one pass — a pure training-pipeline addition.
  *
  * Scale shape: the naive form self-joins the raw event log per user
  * (quadratic in events/user). Instead, "∃ a before b" is decided
  * exactly from per-(user, type) min/max timestamps:
  *   ∃ (ta < tb)  ⟺  min(ts | a) < max(ts | b),
  * so the plan is one (user, type) groupBy over the log, then a
  * per-user type×type join bounded by (#distinct types)² per user —
  * #types is a small vocabulary, never corpus-scale. Counts are exact
  * integers; support is one division, rounded at the emit site.
  */
object SeqMining {

  /** @param events (userCol, typeCol, tsCol) event log
    * @param minUsers pairs below this user count are dropped
    * @return (type_a, type_b, n_users, support) — support = n_users /
    *         all active users, type_a ≠ type_b, strict-before order */
  def seqPairs(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, minUsers: Long = 1L): DataFrame = {
    require(minUsers >= 1, s"minUsers must be >= 1, got $minUsers")
    // three consumers (total, pair side a, pair side b) — cut to a
    // checkpoint leaf or each re-derives the full log scan+aggregate
    val perUt = graft.core.Lineage.truncate(events
      .groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts")))
    val nUsers = perUt.agg(countDistinct(col("u")).as("n_total"))
    val pairs = perUt.select(col("u"), col("t").as("type_a"), col("first_ts"))
      .join(perUt.select(col("u"), col("t").as("type_b"), col("last_ts")), "u")
      .filter(col("type_a") =!= col("type_b") && col("first_ts") < col("last_ts"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minUsers)
    pairs.crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_users"),
        (col("n_users").cast("double") / col("n_total")).as("support"))
  }
}
