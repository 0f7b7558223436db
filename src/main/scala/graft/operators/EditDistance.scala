package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded edit-distance self-join via the symmetric-deletion scheme
  * (SymSpell): two strings are within Levenshtein distance 1 iff their
  * 1-deletion neighborhoods (each string plus every single-character
  * deletion of it) intersect — a substitution deletes the differing
  * position from both sides, an insert/delete makes one side's deletion
  * equal the other string, and equality is the identity variant. The
  * all-pairs O(n²) distance scan becomes an EQUI-join on the variant
  * string:
  *
  *   explode variants (len+1 per row) → shuffle on variant →
  *   within-bucket pairing → DISTINCT → exact levenshtein verify.
  *
  * 100 TB shape: one shuffle keyed by variant; candidate volume is
  * bounded by bucket sizes, not corpus size². Keys should be SHORT
  * bounded strings (titles, URLs, leading prefixes — the caller
  * truncates), which also caps the explode factor. A corpus-wide
  * hot variant (e.g. thousands of rows sharing one title) is a data
  * skew fact, not an artifact of the scheme — AQE skew-join splits
  * those buckets.
  */
object EditDistance {

  /** `s` plus every 1-character deletion of `s`, distinct. */
  def deletionNeighborhood(s: Column): Column =
    array_distinct(array_append(
      transform(sequence(lit(1), length(s)),
        i => concat(substring(s, lit(1), i - lit(1)),
          // tail from i+1: 3-arg substring needs a length — use the
          // full remaining length; Spark clamps past end-of-string
          substring(s, i + lit(1), length(s)))),
      s))

  /** Record-linkage scoring: character-trigram cosine similarity over
    * BLOCKED candidate pairs. Blocking (any cheap equality key — a
    * leading prefix, a phonetic code, a sort-neighborhood bucket) keeps
    * the pair set linear-ish; the all-pairs trigram join this avoids is
    * the classic record-linkage scale trap. Counts and dot products are
    * exact integer sums; cosine is the only float op (sqrt is
    * correctly-rounded IEEE, so the score is engine-exact). */
  def trigramCosinePairs(df: DataFrame, idCol: String, strCol: String,
                         blockExpr: Column): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"), blockExpr.as("__blk"))
    val grams = base.select(col("__id"),
        explode(expr(
          """CASE WHEN length(__s) >= 3
            | THEN transform(sequence(1, length(__s) - 2), i -> substring(__s, i, 3))
            | ELSE array() END""".stripMargin)).as("g"))
      .groupBy(col("__id"), col("g")).agg(count(lit(1)).as("c"))
    val norms = grams.groupBy(col("__id")).agg(sum(col("c") * col("c")).as("n2"))
    val pairs = base.select(col("__blk"), col("__id").as("id_a"))
      .join(base.select(col("__blk"), col("__id").as("id_b")), Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val dots = pairs
      .join(grams.select(col("__id").as("id_a"), col("g"), col("c").as("__ca")), Seq("id_a"))
      .join(grams.select(col("__id").as("id_b"), col("g"), col("c").as("__cb")), Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("__ca") * col("__cb")).as("dot"))
    pairs
      .join(dots, Seq("id_a", "id_b"), "left").na.fill(0L, Seq("dot"))
      .join(norms.select(col("__id").as("id_a"), col("n2").as("__na")), Seq("id_a"))
      .join(norms.select(col("__id").as("id_b"), col("n2").as("__nb")), Seq("id_b"))
      .withColumn("cosine", col("dot") / (sqrt(col("__na")) * sqrt(col("__nb"))))
      .select(col("id_a"), col("id_b"), col("dot"), col("cosine"))
  }

  /** Distinct id pairs (id_a < id_b) whose `strCol` values are within
    * Levenshtein distance 1, with both strings carried for downstream
    * scoring. Exact (no false negatives ≤ 1, verified filter removes
    * false positives). */
  def symspellPairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val variants = df
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__v", explode(deletionNeighborhood(col("__s"))))
    val a = variants.select(col("__id").as("id_a"), col("__s").as("s_a"), col("__v"))
    val b = variants.select(col("__id").as("id_b"), col("__s").as("s_b"), col("__v"))
    a.join(b, Seq("__v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
      .distinct()
      .filter(levenshtein(col("s_a"), col("s_b")) <= 1)
  }
}
