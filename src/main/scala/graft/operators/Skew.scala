package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at cluster scale.
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); these operators cover the
  * two patterns AQE can't: a skewed AGGREGATION key (AQE never splits
  * a hash-aggregate) and a skewed join against a small-but-not-tiny
  * build side where broadcast is borderline.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial → strip
    * salt → final. The partial shuffle spreads a hot key over
    * `saltBuckets` reducers; the second shuffle only carries
    * `buckets × |distinct keys|` pre-combined rows.
    *
    * `aggs` maps output column name → (partialExpr, mergeExpr): e.g.
    * "n" -> (count(lit(1)), sum). Correct for any algebraic aggregate.
    *
    * Salt derivation note: the salt is nondeterministic under task
    * retries (partition id + position), which is CORRECT here — any
    * salt value yields the same final aggregate for an algebraic agg,
    * and a row re-attempted with a different salt only moves its
    * partial contribution between buckets. Rows whose recomputation
    * must be bit-stable (e.g. a salted WRITE partitioned by salt)
    * should derive the salt from row content instead:
    * pmod(xxhash64(<row id col>), buckets). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col(s"__p_$n")).as(n) }.toSeq: _*)
  }

  /** Salted broadcast-replicated join for a skewed LEFT side joining a
    * mid-size right side: left gets a random salt in [0, buckets),
    * right is replicated `buckets` times with every salt value, and the
    * join key becomes (key, salt) — the hot key's rows land on
    * `buckets` different reducers instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), col(key)), lit(saltBuckets)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
