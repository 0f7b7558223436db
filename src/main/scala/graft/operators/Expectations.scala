package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the dbt-test /
  * Great-Expectations surface for a lakehouse table pack: each
  * expectation names a violation set; the report is one row per check
  * with its violation count and pass flag.
  *
  * Every check is a single scan-aggregate or one anti-join — nothing
  * quadratic, nothing driver-side. At 100 TB the whole suite over one
  * table can share a scan (the violation counts are `count(CASE...)`
  * compatible); they are kept as separate frames here because checks
  * typically target different tables and the per-check lazy frames
  * compose freely.
  */
object Expectations {

  /** Rows where `c` is null. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** Rows outside [lo, hi] (nulls are not range violations — pair with
    * [[notNull]] to forbid them). */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    df.filter(col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Rows whose value is outside the accepted enum domain. */
  def inSet(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(values: _*))

  /** Key groups that occur more than once (one row per duplicated key). */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)

  /** Child rows whose foreign key has no parent (orphans) — one
    * anti-join; Spark broadcasts the parent when it fits. */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")

  /** Fold named violation frames into the (check_name, n_violations,
    * pass) report, ordered by check name. */
  def report(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "no expectations given")
    checks.map { case (name, viol) =>
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0)
      .orderBy("check_name")
  }
}
