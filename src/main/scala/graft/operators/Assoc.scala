package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Lineage

/** Market-basket co-occurrence mining over (basket, item) rows — the
  * classic support / confidence / lift association rules, plus
  * item–item collaborative-filtering cosine. Both are pure keyed
  * dataflow: pair generation is a self-join on the BASKET key (each
  * basket fans out to its own \binom{b}{2} pairs — never a cross-basket
  * product), pair scoring shuffles on the (item_a, item_b) key, and the
  * per-item marginals are an |items|-row frame that broadcasts.
  */
object Assoc {

  /** Frequent item-pair association rules: for every unordered item
    * pair seen in ≥ `minPairSupport` baskets,
    *   support   = n_ab / N            (pair frequency),
    *   conf(a→b) = n_ab / n_a          (how often a implies b),
    *   lift      = n_ab·N / (n_a·n_b)  (co-occurrence vs independence).
    * All three are single divisions of exact integer counts, so the
    * values are engine-bit-identical given the same data.
    *
    * Scale shape: per-basket pair fan-out is quadratic in basket size,
    * so heavy-tailed baskets are CAPPED deterministically to their
    * `maxBasketItems` lexicographically-first items (a documented
    * approximation — the standard Apriori-at-scale guard; the cap is a
    * per-basket WindowGroupLimit, not a sort of the corpus). Marginals
    * (`n_a`, `n_b`) count FULL baskets, but `n_ab` is counted from the
    * CAPPED frame — so when any basket actually exceeds the cap, a
    * surviving pair can UNDERCOUNT co-occurrences from baskets where
    * one member fell past the cap (support and confidence are then
    * lower bounds, lift a lower bound too). With every basket under
    * the cap the counts are exact — pass `failOnCap = true` where
    * exactness is required (the q_assoc_rules site does, because its
    * DuckDB oracle has no cap): any basket exceeding the cap then
    * fails fast per-row (raise_error — no extra validation action)
    * instead of silently undercounting. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minPairSupport: Long = 2,
                       maxBasketItems: Int = 1000,
                       failOnCap: Boolean = false): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport must be >= 1, got $minPairSupport")
    require(maxBasketItems >= 2, s"maxBasketItems must be >= 2, got $maxBasketItems")
    val bi = Lineage.truncate(
      df.select(col(basketCol).as("b"), col(itemCol).as("item")).distinct())
    val nBaskets = bi.groupBy().agg(countDistinct(col("b")).as("n_baskets"))
    val itemCnt = bi.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val withRn = bi
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("b")).orderBy(col("item"))))
    val capped = (if (failOnCap)
        withRn.withColumn("item",
          when(col("rn") <= maxBasketItems, col("item")).otherwise(raise_error(concat(
            lit(s"associationRules: basket "), col("b").cast("string"),
            lit(s" exceeds maxBasketItems=$maxBasketItems — capped counts would " +
              "undercount; raise the cap or drop failOnCap")))))
      else withRn.filter(col("rn") <= maxBasketItems))
      .select(col("b"), col("item"))
    val pairs = capped.select(col("b"), col("item").as("item_a"))
      .join(capped.select(col("b"), col("item").as("item_b")), "b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    pairs
      .join(broadcast(itemCnt.select(col("item").as("item_a"), col("n_item").as("n_a"))), "item_a")
      .join(broadcast(itemCnt.select(col("item").as("item_b"), col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_baskets")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("conf_ab"),
        (col("n_ab").cast("double") / col("n_b")).as("conf_ba"),
        ((col("n_ab") * col("n_baskets")).cast("double") / (col("n_a") * col("n_b")))
          .as("lift"))
  }

  /** Item–item collaborative-filtering cosine: implicit rating = event
    * count per (user, item), similarity = dot / (‖a‖·‖b‖) over the
    * shared-user co-ratings. Counts keep every dot product and squared
    * norm an exact int64 (corpus needs a single user×item count near
    * 3·10⁹ before cnt²·users threatens overflow), so the only floats
    * are the final sqrt/divide — identical op order on any engine.
    *
    * Shape: one (user, item) count aggregate, a self-join on the USER
    * key (co-rated pairs only — a user rating k items emits
    * \binom{k}{2} pairs; cap upstream for k-heavy users, the
    * associationRules treatment), one (item_a, item_b) keyed sum, and
    * a broadcast of the |items|-row norm frame. `minCommon` prunes
    * pairs supported by fewer than that many shared users (cosine on
    * 1 shared user is noise at any scale). */
  def itemItemCosine(df: DataFrame, userCol: String, itemCol: String,
                     minCommon: Long = 2): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val r = Lineage.truncate(
      df.groupBy(col(userCol).as("u"), col(itemCol).as("item"))
        .agg(count(lit(1)).as("cnt")))
    val norms = r.groupBy(col("item")).agg(sum(col("cnt") * col("cnt")).as("sq"))
    r.select(col("u"), col("item").as("item_a"), col("cnt").as("cnt_a"))
      .join(r.select(col("u"), col("item").as("item_b"), col("cnt").as("cnt_b")), "u")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("dot"),
        count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      .join(broadcast(norms.select(col("item").as("item_a"), col("sq").as("sq_a"))), "item_a")
      .join(broadcast(norms.select(col("item").as("item_b"), col("sq").as("sq_b"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_common"), col("dot"),
        (col("dot").cast("double") /
          (sqrt(col("sq_a").cast("double")) * sqrt(col("sq_b").cast("double"))))
          .as("cosine"))
  }
}
