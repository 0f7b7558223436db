package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-scan table profiling — the data-quality summary a lakehouse
  * job publishes per table (null rates, cardinalities, value ranges):
  * one row per column from ONE pass over the data.
  *
  * Shape: all per-column aggregates are computed in a single `agg`
  * (Spark plans the multiple DISTINCT aggregates with one Expand over
  * one scan — rows multiply by the distinct-agg count, but the table
  * is still read once), then the single wide row is exploded into
  * per-column rows. At 100 TB swap the exact `count(DISTINCT ...)`
  * for `approx_count_distinct` — same plan without the Expand; the
  * exact form is kept here because the cross-engine oracle must
  * predict it.
  *
  * min/max are rendered to VARCHAR deterministically per type family
  * (doubles through DECIMAL(28,6), timestamps second-truncated,
  * integers/strings verbatim) so two engines produce byte-identical
  * strings — raw double→string formatting is NOT portable (Java
  * switches to E-notation at 1e7, DuckDB never does).
  */
object Profiler {

  private def render(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(28, 6)).cast("string")
    case TimestampType => date_trunc("second", c).cast("string")
    case _ => c.cast("string")
  }

  /** One profile row per column: (col_name, n_rows, n_nonnull,
    * n_distinct, min_val, max_val). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val fields = cols.map(c => df.schema(c))
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__nn_${f.name}"),
        countDistinct(c).as(s"__nd_${f.name}"),
        render(min(c), f.dataType).as(s"__min_${f.name}"),
        render(max(c), f.dataType).as(s"__max_${f.name}"))
    }
    val structs = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_${f.name}").as("n_nonnull"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__min_${f.name}").as("min_val"),
        col(s"__max_${f.name}").as("max_val"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
