package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (time-series) join: for each left row, the single latest
  * right row with `right.ts <= left.ts` on the same key — the join
  * DuckDB/QuestDB expose as `ASOF JOIN` and Spark has no native
  * operator for.
  *
  * Implemented with the union-tag trick, NOT a range join: both sides
  * are unioned with a source tag, then one window pass per key ordered
  * by (ts, tag) carries the last-seen right payload forward
  * (`last(..., ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT).
  * Cost = one shuffle on the key + one ordered window — linear in
  * |L|+|R|, versus the |L|×|matching-range| blowup of the
  * inequality-join formulation. At a 100 TB left side this is the only
  * shape that survives: the shuffle carries each row once, and AQE can
  * split a skewed key's sort.
  *
  * Tie semantics: a right row AT the left timestamp matches
  * (`<=`, the ASOF standard) — the right tag sorts before the left tag
  * at equal ts. The right side must be unique per (key, ts); pre-dedup
  * with MergeOps.dedupLatestBy otherwise (documented contract, same as
  * DuckDB ASOF's "pick one arbitrarily" being a smell, not a feature).
  */
object AsofJoin {

  /** Internal helper column names the union-tag plan builds; user
    * frames must not collide with them (checked, fail-fast). */
  private val reserved = Set("__k", "__t", "__src", "__payload", "__match")

  /** @param valueCols right-side columns carried onto matched left rows
    *                  (null when no right row precedes the left row). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val clash = (leftCols ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")} internally; " +
        s"rename input column(s) ${clash.distinct.mkString(", ")}")
    val dup = valueCols.filter(leftCols.contains)
    require(dup.isEmpty,
      s"asofJoin output would carry duplicate column(s) ${dup.mkString(", ")}: " +
        "valueCols must be disjoint from the left frame's columns")
    val payload = struct(valueCols.map(col): _*)
    // null semantics must match the inequality formulation (and SQL
    // ASOF): a null key or null timestamp never compares true, so a
    // right row carrying either can match nothing — drop it BEFORE the
    // union, otherwise the window (which groups null keys together and
    // sorts null ts first) would carry its payload onto left rows. Left
    // rows with null key/ts need no guard: their partition then holds
    // no right rows / nothing sorts before them, so they get null.
    val rightClean = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
    val taggedRight = rightClean.select(
      Seq(col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__src"),
        payload.as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__src"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Inequality-join formulation (exact semantics twin for tests; the
    * |L|×|range| shape that does NOT scale — kept as the oracle of the
    * union-window implementation). */
  def asofJoinViaWindow(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__lid", monotonically_increasing_id())
    val r = right.select(col(key).as("__rk") +: col(rightTs).as("__rt") +: valueCols.map(col): _*)
    val joined = l.join(r, l(key) === col("__rk") && col("__rt") <= l(leftTs), "left")
    val w = Window.partitionBy(col("__lid")).orderBy(col("__rt").desc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(left.columns.map(col).toSeq ++
        valueCols.map(c => when(col("__rt").isNotNull, col(c)).otherwise(lit(null)).as(c)): _*)
  }
}
