package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Codegen'd ASCII word tokenizer: exactly equivalent to
  * `regexp_extract_all(lower(s), '[a-z0-9]+', 0)` — the hot inner loop
  * of every text operator (minhash shingles, quality stats, lang-id,
  * repetition filters) — as a single byte scan instead of a Unicode
  * lowercase pass plus an NFA regex walk.
  *
  * Equivalence argument (holds for ALL inputs, not just ASCII corpora):
  * `lower()` maps A-Z to a-z and any non-ASCII letter to a non-ASCII
  * letter, which `[a-z0-9]` never matches; UTF-8 multibyte sequences
  * use only bytes ≥ 0x80, which are separators in the byte scan just as
  * their decoded characters are separators for the regex. So scanning
  * raw UTF-8 bytes for [A-Za-z0-9] runs (lowercasing A-Z in the output)
  * yields the identical token array.
  */
case class AsciiTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string column, got $t")
    }

  @inline private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (isTok(bytes(i))) {
        var j = i
        while (j < n && isTok(bytes(j))) j += 1
        val t = new Array[Byte](j - i)
        var k = i
        while (k < j) {
          val c = bytes(k)
          t(k - i) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
          k += 1
        }
        out += UTF8String.fromBytes(t)
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val toks = ctx.freshName("toks")
      // janino: raw ArrayList (no generics), fully-qualified names
      s"""
         |byte[] $bytes = $in.getBytes();
         |int $n = $bytes.length;
         |java.util.ArrayList $toks = new java.util.ArrayList();
         |int $i = 0;
         |while ($i < $n) {
         |  byte $b = $bytes[$i];
         |  if (($b >= 'a' && $b <= 'z') || ($b >= 'A' && $b <= 'Z') || ($b >= '0' && $b <= '9')) {
         |    int $j = $i;
         |    while ($j < $n) {
         |      byte $c = $bytes[$j];
         |      if (!(($c >= 'a' && $c <= 'z') || ($c >= 'A' && $c <= 'Z') || ($c >= '0' && $c <= '9'))) break;
         |      $j++;
         |    }
         |    byte[] $t = new byte[$j - $i];
         |    for (int $k = $i; $k < $j; $k++) {
         |      byte $c = $bytes[$k];
         |      $t[$k - $i] = ($c >= 'A' && $c <= 'Z') ? (byte)($c + 32) : $c;
         |    }
         |    $toks.add(org.apache.spark.unsafe.types.UTF8String.fromBytes($t));
         |    $i = $j;
         |  } else $i++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($toks.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object TextExpressions {
  def asciiTokens(s: Column): Column =
    ColumnBridge.column(AsciiTokens(ColumnBridge.expression(s)))

  /** SQL registration: ascii_tokens(s). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ascii_tokens", exprs => AsciiTokens(exprs.head), "built-in")
}
