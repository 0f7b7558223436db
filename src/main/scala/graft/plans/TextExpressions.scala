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

/** First 8 bytes of md5(input) as a big-endian signed long — ONE digest
  * pass replacing the two `conv(substr(md5(x), …), 16, 10)` string
  * round-trips of the SQL formulation. Value-identical to
  * `(hi32 << 32) | lo32` with hi = hex chars 1-8, lo = 9-16 (hex is the
  * big-endian byte rendering), so the DuckDB oracle mirrors it with
  * exactly that arithmetic and the 64-bit simhash fingerprints are
  * unchanged. */
case class Md5Long(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string column, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Long.digestLong(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.Md5Long.digestLong($in.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object Md5Long {
  private val md5Pool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static so generated code can call it (janino-friendly). */
  def digestLong(bytes: Array[Byte]): Long = {
    val md = md5Pool.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }
}

/** [[AsciiTokens]]' positional twin: the 1-based inclusive BYTE offset
  * range of every `[A-Za-z0-9]+` run, packed `(start << 32) | end` into
  * an `array<bigint>` (a struct array would cost an InternalRow per
  * token; two bit-ops unpack the pair in any downstream SQL lambda).
  * Token i of [[AsciiTokens]] is exactly bytes `start..end` of the raw
  * input — the mapping exact-substring dedup needs to turn token-space
  * spans into byte-offset cut lists (Lee et al., ACL 2022 §3.1 operate
  * on raw bytes). Same single byte scan, same equivalence argument:
  * UTF-8 multibyte bytes are ≥ 0x80, so they terminate runs exactly
  * where the regex does, and for ASCII text byte offsets ARE character
  * offsets (the oracle-facing contract). */
case class AsciiTokenOffsets(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
        out += ((i + 1).toLong << 32) | j.toLong // 1-based inclusive [i+1, j]
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
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val offs = ctx.freshName("offs")
      s"""
         |byte[] $bytes = $in.getBytes();
         |int $n = $bytes.length;
         |java.util.ArrayList $offs = new java.util.ArrayList();
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
         |    $offs.add(java.lang.Long.valueOf((((long)($i + 1)) << 32) | (long)$j));
         |    $i = $j;
         |  } else $i++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($offs.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object TextExpressions {
  def asciiTokens(s: Column): Column =
    ColumnBridge.column(AsciiTokens(ColumnBridge.expression(s)))

  def asciiTokenOffsets(s: Column): Column =
    ColumnBridge.column(AsciiTokenOffsets(ColumnBridge.expression(s)))

  def md5Long(s: Column): Column =
    ColumnBridge.column(Md5Long(ColumnBridge.expression(s)))

  /** SQL registration: ascii_tokens(s), md5_long(s). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ascii_tokens", exprs => AsciiTokens(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long", exprs => Md5Long(exprs.head), "built-in")
  }
}
