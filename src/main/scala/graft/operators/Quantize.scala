package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization — the standard 4× ANN-index
  * compression: per-dimension min/max over the corpus defines a 255-step
  * grid; each coordinate stores its grid code. Reconstruction error is
  * HARD-bounded by scale/2 per dimension (floor(x+0.5) rounding), which
  * the oracle checks as a boolean per vector.
  *
  * Plan shape: one posexplode + groupBy(dim) for the stats (shuffles
  * n·d scalar rows once — at 100 TB switch to per-partition partial
  * min/max, which Spark's partial aggregation already gives this
  * groupBy), then the d-row stats table folds to ONE array row that
  * broadcasts back; codes are a pure zip_with projection. No collect,
  * no UDF, all arithmetic identical on any engine (float→double casts
  * are exact; grid math is single-rounded).
  */
object Quantize {

  /** Per-dimension (1-based pos, min, max) over the corpus. */
  def dimStats(embs: DataFrame, vecCol: String): DataFrame =
    embs.select(posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .withColumn("pos", col("__p") + 1)
      .groupBy(col("pos"))
      .agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"))

  // SQL fragments shared by code + bound so both stay in lockstep;
  // `x` is the float coordinate, `s` the (pos, mn, mx) struct
  private val scaleSql = "((CAST(s.mx AS DOUBLE) - CAST(s.mn AS DOUBLE)) / 255.0)"
  private val codeSql =
    s"""CASE WHEN s.mx > s.mn
       | THEN CAST(least(255.0, floor((CAST(x AS DOUBLE) - CAST(s.mn AS DOUBLE)) / $scaleSql + 0.5)) AS BIGINT)
       | ELSE CAST(0 AS BIGINT) END""".stripMargin

  /** Adds `codes` (array<bigint> in 0..255) and `within_bound` (every
    * dimension's reconstruction error ≤ scale/2). Degenerate dimensions
    * (mx = mn) code to 0 and reconstruct exactly. */
  def scalarQuantize(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val statsArr = dimStats(embs, vecCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("__sa"))
    embs.crossJoin(broadcast(statsArr))
      .withColumn("codes", expr(
        s"zip_with($vecCol, __sa, (x, s) -> $codeSql)"))
      .withColumn("within_bound", expr(
        s"""forall(zip_with($vecCol, __sa, (x, s) ->
           |  CASE WHEN s.mx > s.mn
           |   THEN abs((CAST(s.mn AS DOUBLE) + ($codeSql) * $scaleSql) - CAST(x AS DOUBLE))
           |        <= $scaleSql * 0.5
           |   ELSE CAST(x AS DOUBLE) = CAST(s.mn AS DOUBLE) END), b -> b)""".stripMargin))
      .drop("__sa")
  }
}
