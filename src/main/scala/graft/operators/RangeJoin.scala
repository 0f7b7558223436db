package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join — the scale path for temporal
  * proximity/interval predicates that Spark would otherwise plan as a
  * broadcast nested-loop join (quadratic work, un-shardable).
  *
  * Shape: quantize time into fixed-width bins; a ±radius proximity
  * predicate can only match within the same or an adjacent bin when
  * binWidth >= radius, so the right side explodes to {b-1, b, b+1} and
  * the join becomes an EQUI-join on (key, bin) with an exact residual
  * filter. Work is O(|L| + 3|R| + matches) and shuffles on a compound
  * key — the same banding algebra as the LSH/SimHash candidate joins,
  * applied to time instead of hash space.
  */
object RangeJoin {

  /** Pairs (left row, right row) with the same `key` whose timestamps
    * differ by at most `radiusSec`. Timestamp columns must be
    * epoch-second LongType (cast upstream). */
  def proximityJoin(left: DataFrame, right: DataFrame, key: String,
                    leftSec: String, rightSec: String, radiusSec: Long): DataFrame = {
    require(radiusSec > 0, s"radius must be positive, got $radiusSec")
    val clash = (left.columns ++ right.columns).filter(Set("__bin", "__bin0"))
    require(clash.isEmpty,
      s"proximityJoin reserves column names __bin, __bin0 internally; " +
        s"rename input column(s) ${clash.distinct.mkString(", ")}")
    val binW = radiusSec // binWidth = radius ⇒ adjacency coverage is exact
    val l = left.withColumn("__bin", floor(col(leftSec) / binW))
    val r = right
      .withColumn("__bin0", floor(col(rightSec) / binW))
      .withColumn("__bin", explode(array(col("__bin0") - 1, col("__bin0"), col("__bin0") + 1)))
      .drop("__bin0")
    l.join(r, Seq(key, "__bin"))
      .filter(abs(col(leftSec) - col(rightSec)) <= radiusSec)
      .drop("__bin")
  }

  /** Nested-loop formulation (exact semantics twin for tests; the
    * quadratic shape that does NOT scale). */
  def proximityJoinNested(left: DataFrame, right: DataFrame, key: String,
                          leftSec: String, rightSec: String, radiusSec: Long): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        abs(left(leftSec) - right(rightSec)) <= radiusSec)
      .drop(right(key))

  /** INTERVAL × INTERVAL overlap join: every (left, right) pair with
    * `lStart ≤ rEnd && rStart ≤ lEnd` (closed-interval overlap — the
    * concurrency / double-booking / co-presence primitive), without the
    * nested-loop plan the raw inequality conjunction gets.
    *
    * Shape: each interval explodes to the fixed-width bins it covers
    * (`sequence(floor(s/B), floor(e/B))`), the join runs as an
    * EQUI-join on the bin, and the exact predicate filters residual
    * false positives. An overlapping pair shares every bin both
    * intervals cover, so instead of a post-join `distinct` the pair is
    * kept ONLY in its canonical bin — the later of the two start bins,
    * which both sides provably cover when they overlap. Work is
    * O(Σ span/B) explode + matches; pick `binWidth` near the typical
    * interval span (too small → fan-out, too large → bin crowding).
    * Columns must be numeric (epoch seconds/longs, cast upstream) and
    * the two inputs must not share column names. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String, rStart: String, rEnd: String,
                  binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val reserved = Set("__bin", "__sbinl", "__sbinr")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"overlapJoin reserves ${reserved.mkString(", ")}; rename ${clash.distinct.mkString(", ")}")
    def bins(df: DataFrame, s: String, e: String, sbin: String): DataFrame = df
      .withColumn(sbin, floor(col(s) / binWidth))
      .withColumn("__bin", explode(sequence(col(sbin), floor(col(e) / binWidth))))
    val l = bins(left, lStart, lEnd, "__sbinl")
    val r = bins(right, rStart, rEnd, "__sbinr")
    l.join(r, Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(col("__sbinl"), col("__sbinr")))
      .drop("__bin", "__sbinl", "__sbinr")
  }
}
