package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Codegen'd Jaro–Winkler similarity — the record-linkage scorer for
  * short identifier-like strings (names, brands, SKUs), where
  * character TRANSPOSITIONS are the dominant typo class that
  * edit-distance blocking (SymSpell) and trigram cosine both
  * over-penalize.
  *
  * Semantics exactly mirror DuckDB's `jaro_winkler_similarity` (the
  * oracle): byte-wise Jaro with match window ⌊max(|a|,|b|)/2⌋−1,
  * half-transposition count, Winkler prefix boost p=0.1 over at most 4
  * leading bytes applied only when jaro > 0.7, empty input ⇒ 0. The
  * closing arithmetic runs in the same IEEE op order as the oracle's,
  * so scores are bit-identical (verified on 4k random pairs +
  * the full q_jaro_winkler output) — byte-wise because the corpus
  * contract is ASCII (same reasoning as [[AsciiTokens]]).
  *
  * Scale: O(|a|·window) per pair inside whole-stage codegen; the QUERY
  * bounds the pair count by blocking (never all-pairs), this bounds
  * per-pair cost.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects two string columns, got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression = copy(newLeft, newRight)
}

object JaroWinkler {

  /** Static so generated code can call it (janino-friendly). */
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.getBytes; val s2 = ub.getBytes
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    var window = (if (l1 > l2) l1 else l2) / 2 - 1
    if (window < 0) window = 0
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!f2(j) && s1(i) == s2(j)) { f1(i) = true; f2(j) = true; m += 1; matched = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // same IEEE op order as the oracle: (m/l1 + m/l2 + (m−t)/m) / 3
    var simv = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (simv > 0.7) {
      val maxp = if (4 < l1) (if (4 < l2) 4 else l2) else (if (l1 < l2) l1 else l2)
      var l = 0
      var stop = false
      while (l < maxp && !stop) {
        if (s1(l) == s2(l)) l += 1 else stop = true
      }
      simv += l * 0.1 * (1.0 - simv)
    }
    simv
  }

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
