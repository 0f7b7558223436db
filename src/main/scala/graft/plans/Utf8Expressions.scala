package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Encoding audit over raw `binary` payloads — the "is this actually
  * text, and is it the text it claims to be" gate a crawl-ingest
  * pipeline runs before any tokenizer sees a byte. Implemented from
  * the PUBLIC Unicode 15 / RFC 3629 well-formedness table:
  *
  *  - lead 0xC2–0xDF → one continuation (0x80–0xBF);
  *  - lead 0xE0–0xEF → two continuations, with the table's narrowed
  *    second-byte ranges (0xE0: A0–BF, 0xED: 80–9F — the surrogate
  *    exclusion);
  *  - lead 0xF0–0xF4 → three continuations, narrowed at the edges
  *    (0xF0: 90–BF, 0xF4: 80–8F — the > U+10FFFF exclusion);
  *  - 0xC0/0xC1 (overlong) and 0xF5–0xFF are never legal leads.
  *
  * One malformed SEQUENCE counts as ONE invalid event and the scanner
  * resynchronizes AT the offending byte (the W3C/WHATWG "maximal
  * subpart" policy), so error counts are stable under concatenation —
  * an audit that double-counts a torn sequence at a chunk boundary
  * can't be reconciled across ingest runs.
  *
  * Alongside well-formedness the same single pass counts the three
  * practical corpus-poison signals:
  *  - decoded U+FFFD (replacement chars an upstream decoder already
  *    substituted — evidence of a LOSSY prior transcode);
  *  - C0 control characters other than tab/LF/CR, plus DEL (binary
  *    payload smuggled into a text column);
  *  - decoded U+00C2/U+00C3 ("Â"/"Ã") — the tell-tale lead letters of
  *    UTF-8-read-as-Latin-1-re-encoded-as-UTF-8 mojibake (each
  *    double-encoded char surfaces exactly one of them).
  *
  * Shape: scalar UnaryExpressions over BinaryType, each whole-stage-
  * codegen'd into a call on the shared static scanner, which packs all
  * five answers into one long — decode-at-scan-throughput, zero
  * allocation, no UDF, partition-parallel. NULL input stays NULL.
  *
  * Selecting SEVERAL audit columns: use [[Utf8AuditPacked]] once and
  * bit-extract ([[Utf8Expressions.unpack*]]) — the five identical
  * packed subtrees collapse to ONE audit() call under whole-stage
  * codegen subexpression elimination (asserted by Utf8AuditSpec on
  * the generated code, not assumed). The five single-column
  * expressions are for point use (one answer, one scan).
  */
object Utf8Audit {

  private final val CAP = 0xffff

  /** Packed audit: bit 62 = wellFormed, bits 48–61 mojibake count,
    * 32–47 control count, 16–31 replacement count, 0–15 invalid count
    * (each capped at 0xFFFF / 0x3FFF so fields never bleed). */
  def audit(b: Array[Byte]): Long = {
    val n = b.length
    var i = 0
    var invalid = 0
    var repl = 0
    var control = 0
    var moji = 0
    while (i < n) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) {
        if ((b0 < 0x20 && b0 != 0x09 && b0 != 0x0a && b0 != 0x0d) || b0 == 0x7f) control += 1
        i += 1
      } else if (b0 >= 0xc2 && b0 <= 0xdf) {
        if (i + 1 < n && (b(i + 1) & 0xc0) == 0x80) {
          val cp = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f)
          if (cp == 0xc2 || cp == 0xc3) moji += 1
          i += 2
        } else { invalid += 1; i += 1 }
      } else if (b0 >= 0xe0 && b0 <= 0xef) {
        val lo2 = if (b0 == 0xe0) 0xa0 else 0x80
        val hi2 = if (b0 == 0xed) 0x9f else 0xbf
        if (i + 1 < n && (b(i + 1) & 0xff) >= lo2 && (b(i + 1) & 0xff) <= hi2) {
          if (i + 2 < n && (b(i + 2) & 0xc0) == 0x80) {
            val cp = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
            if (cp == 0xfffd) repl += 1
            i += 3
          } else { invalid += 1; i += 2 } // maximal subpart: lead+1 cont consumed
        } else { invalid += 1; i += 1 }
      } else if (b0 >= 0xf0 && b0 <= 0xf4) {
        val lo2 = if (b0 == 0xf0) 0x90 else 0x80
        val hi2 = if (b0 == 0xf4) 0x8f else 0xbf
        if (i + 1 < n && (b(i + 1) & 0xff) >= lo2 && (b(i + 1) & 0xff) <= hi2) {
          if (i + 2 < n && (b(i + 2) & 0xc0) == 0x80) {
            if (i + 3 < n && (b(i + 3) & 0xc0) == 0x80) i += 4
            else { invalid += 1; i += 3 }
          } else { invalid += 1; i += 2 }
        } else { invalid += 1; i += 1 }
      } else { // 0x80–0xC1 stray continuation / overlong lead, 0xF5–0xFF
        invalid += 1; i += 1
      }
    }
    val inv = math.min(invalid, CAP).toLong
    val rp = math.min(repl, CAP).toLong
    val ct = math.min(control, CAP).toLong
    val mj = math.min(moji, 0x3fff).toLong
    val ok = if (invalid == 0) 1L else 0L
    (ok << 62) | (mj << 48) | (ct << 32) | (rp << 16) | inv
  }

  def wellFormed(b: Array[Byte]): Boolean = (audit(b) >>> 62) == 1L
  def invalidCount(b: Array[Byte]): Int = (audit(b) & 0xffff).toInt
  def replacementCount(b: Array[Byte]): Int = ((audit(b) >>> 16) & 0xffff).toInt
  def controlCount(b: Array[Byte]): Int = ((audit(b) >>> 32) & 0xffff).toInt
  def mojibakeCount(b: Array[Byte]): Int = ((audit(b) >>> 48) & 0x3fff).toInt
}

/** RFC 3629 well-formedness — true iff zero malformed sequences. */
case class Utf8WellFormed(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    Utf8Audit.wellFormed(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Utf8Audit.wellFormed($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Count of malformed sequences (maximal-subpart policy; capped 65535). */
case class Utf8InvalidCount(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Utf8Audit.invalidCount(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Utf8Audit.invalidCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Count of decoded U+FFFD replacement characters. */
case class Utf8ReplacementCount(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Utf8Audit.replacementCount(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Utf8Audit.replacementCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Count of C0 controls (minus tab/LF/CR) plus DEL. */
case class Utf8ControlCount(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Utf8Audit.controlCount(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Utf8Audit.controlCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Count of decoded U+00C2/U+00C3 — the double-encoding tell. */
case class Utf8MojibakeCount(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Utf8Audit.mojibakeCount(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Utf8Audit.mojibakeCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** The whole audit in one scan: the packed long of
  * [[Utf8Audit.audit]] (bit 62 wellFormed, 48–61 mojibake, 32–47
  * control, 16–31 replacement, 0–15 invalid). Derive columns with the
  * [[Utf8Expressions]] unpack helpers — the multi-column form that
  * guarantees one pass per payload structurally. */
case class Utf8AuditPacked(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Utf8Audit.audit(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Utf8Audit.audit($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object Utf8Expressions {
  import org.apache.spark.sql.functions.{lit, shiftright}

  def utf8AuditPacked(c: Column): Column =
    ColumnBridge.column(Utf8AuditPacked(ColumnBridge.expression(c)))

  /** Bit-extraction twins of the five single-column expressions —
    * apply to the SAME [[utf8AuditPacked]] column so codegen CSE
    * collapses the scans to one (bit 63 is always 0, so arithmetic
    * shiftright is safe). */
  def unpackWellFormed(packed: Column): Column = shiftright(packed, 62) === lit(1L)
  def unpackInvalid(packed: Column): Column =
    packed.bitwiseAND(lit(0xffffL)).cast("int")
  def unpackReplacement(packed: Column): Column =
    shiftright(packed, 16).bitwiseAND(lit(0xffffL)).cast("int")
  def unpackControl(packed: Column): Column =
    shiftright(packed, 32).bitwiseAND(lit(0xffffL)).cast("int")
  def unpackMojibake(packed: Column): Column =
    shiftright(packed, 48).bitwiseAND(lit(0x3fffL)).cast("int")

  def utf8WellFormed(c: Column): Column =
    ColumnBridge.column(Utf8WellFormed(ColumnBridge.expression(c)))
  def utf8InvalidCount(c: Column): Column =
    ColumnBridge.column(Utf8InvalidCount(ColumnBridge.expression(c)))
  def utf8ReplacementCount(c: Column): Column =
    ColumnBridge.column(Utf8ReplacementCount(ColumnBridge.expression(c)))
  def utf8ControlCount(c: Column): Column =
    ColumnBridge.column(Utf8ControlCount(ColumnBridge.expression(c)))
  def utf8MojibakeCount(c: Column): Column =
    ColumnBridge.column(Utf8MojibakeCount(ColumnBridge.expression(c)))
}
