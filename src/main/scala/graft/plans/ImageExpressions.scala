package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header parsing over opaque `binary` columns —
  * the decode step of the multimodal pipeline (container sniff +
  * intrinsic width/height), implemented from the PUBLIC container
  * layouts:
  *
  *  - PNG (RFC 2083 / W3C PNG spec): 8-byte signature
  *    89 50 4E 47 0D 0A 1A 0A, then the IHDR chunk — 4-byte length,
  *    ASCII "IHDR", width and height as big-endian uint32 at byte
  *    offsets 16 and 20.
  *  - JPEG/JFIF (ITU-T T.81): SOI FF D8, then a marker walk — each
  *    segment is FF <marker> <big-endian uint16 length incl. itself>;
  *    the frame header SOFn (C0-CF minus C4 DHT / C8 JPG / CC DAC)
  *    carries [precision u8][height u16][width u16] after the length.
  *  - GIF (GIF87a/GIF89a spec): 6-byte version magic, then logical
  *    screen width and height as little-endian uint16 at offsets 6/8.
  *  - BMP (Windows BITMAPINFOHEADER): "BM", width/height as
  *    little-endian int32 at offsets 18/22 (height < 0 = top-down row
  *    order; magnitude is the pixel height).
  *
  * Shape: three scalar UnaryExpressions (format / width / height) over
  * BinaryType, each a whole-stage-codegen'd call into the shared
  * static parser ([[ImageHeaders]]) — decode runs at parquet-scan
  * throughput with zero allocation beyond the format constant, no UDF,
  * no driver involvement, and partition-parallel by construction.
  * Truncated or corrupt headers yield NULL (never a throw, never a
  * fabricated dimension): a 100 TB asset scan must classify bad bytes,
  * not die on them.
  */
object ImageHeaders {

  private val PNG_S = UTF8String.fromString("png")
  private val JPEG_S = UTF8String.fromString("jpeg")
  private val GIF_S = UTF8String.fromString("gif")
  private val BMP_S = UTF8String.fromString("bmp")

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    (u8(b, i + 3) << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

  private def hasPngMagic(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4e &&
      u8(b, 3) == 0x47 && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
      u8(b, 7) == 0x0a

  private def hasJpegMagic(b: Array[Byte]): Boolean =
    b.length >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  private def hasGifMagic(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def hasBmpMagic(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  /** Container format by magic bytes alone ("what does this claim to
    * be") — null when no known magic matches. Dimension validity is a
    * SEPARATE question ([[dims]]): a truncated PNG still sniffs as
    * png, which is what a quarantine pipeline needs to route it. */
  def formatOf(b: Array[Byte]): UTF8String =
    if (hasPngMagic(b)) PNG_S
    else if (hasJpegMagic(b)) JPEG_S
    else if (hasGifMagic(b)) GIF_S
    else if (hasBmpMagic(b)) BMP_S
    else null

  /** (width << 32) | height packed in a long, or -1 when the header is
    * not fully parseable. Packing keeps the shared parser single-pass
    * for the width/height expression pair. */
  def dims(b: Array[Byte]): Long = {
    val n = b.length
    if (hasPngMagic(b)) {
      // IHDR must be the first chunk: 4-byte length (13), "IHDR", then
      // width/height big-endian uint32 at 16/20
      if (n < 24 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return -1L
      val w = be32(b, 16); val h = be32(b, 20)
      // uint32 with the sign bit set (> 2^31-1) is out of spec (PNG
      // caps at 2^31-1) and would overflow the int column: reject
      if (w <= 0L || h <= 0L || w > Int.MaxValue || h > Int.MaxValue) return -1L
      (w << 32) | h
    } else if (hasJpegMagic(b)) {
      var off = 2
      while (off + 3 < n) {
        if (u8(b, off) != 0xff) return -1L // lost marker sync: corrupt
        var m = u8(b, off + 1)
        // FF fill bytes before a marker are legal padding
        while (m == 0xff && off + 2 < n) { off += 1; m = u8(b, off + 1) }
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          off += 2 // standalone markers: no length field
        } else if (m == 0xd9 || m == 0xda) {
          return -1L // EOI / start-of-scan before any SOF: no dims
        } else {
          if (off + 3 >= n) return -1L
          val len = be16(b, off + 2)
          if (len < 2) return -1L
          val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof) {
            // SOFn payload: [precision u8][height u16][width u16]...
            if (len < 7 || off + 8 >= n) return -1L
            val h = be16(b, off + 5); val w = be16(b, off + 7)
            return if (w > 0 && h > 0) (w.toLong << 32) | h.toLong else -1L
          }
          off += 2 + len
        }
      }
      -1L
    } else if (hasGifMagic(b)) {
      if (n < 10) return -1L
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) (w.toLong << 32) | h.toLong else -1L
    } else if (hasBmpMagic(b)) {
      if (n < 26) return -1L
      val w = le32(b, 18); val h0 = le32(b, 22)
      val h = if (h0 == Int.MinValue) 0 else math.abs(h0) // negative = top-down
      if (w > 0 && h > 0) (w.toLong << 32) | h.toLong else -1L
    } else -1L
  }

  def widthOf(b: Array[Byte]): Int = {
    val d = dims(b); if (d < 0L) -1 else (d >>> 32).toInt
  }

  def heightOf(b: Array[Byte]): Int = {
    val d = dims(b); if (d < 0L) -1 else (d & 0xffffffffL).toInt
  }

  /** ONE-parse struct decode: (format, width, height) as an
    * InternalRow — format null for unknown magic, dims null when the
    * header doesn't fully parse. The multi-column form: project the
    * fields off one [[DecodeImageHeader]] so a row is parsed once, not
    * once per output column. */
  def decodeStruct(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val f = formatOf(b)
    if (f == null)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, null, null))
    else {
      val d = dims(b)
      if (d < 0L)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](f, null, null))
      else
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](f, (d >>> 32).toInt, (d & 0xffffffffL).toInt))
    }
  }
}

private[plans] trait BinaryInputExpr extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a binary column, got $other")
  }
}

/** Container format by magic bytes — 'png' | 'jpeg' | 'gif' | 'bmp',
  * NULL for unrecognized bytes. */
case class ImageFormat(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    ImageHeaders.formatOf(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.ImageHeaders.formatOf($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Intrinsic pixel width from the container header — NULL when the
  * header is truncated, corrupt, or the format unknown. */
case class ImageWidth(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any = {
    val w = ImageHeaders.widthOf(input.asInstanceOf[Array[Byte]])
    if (w < 0) null else w
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.ImageHeaders.widthOf($c);
       |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = -1; }
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Intrinsic pixel height from the container header — NULL when the
  * header is truncated, corrupt, or the format unknown. */
case class ImageHeight(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any = {
    val h = ImageHeaders.heightOf(input.asInstanceOf[Array[Byte]])
    if (h < 0) null else h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.ImageHeaders.heightOf($c);
       |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = -1; }
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Single-pass header decode: struct<format,width,height> from ONE
  * parse of the payload (the three scalar expressions each re-walk the
  * header — fine for one answer, 3–4× redundant for all of them; at
  * 100 TB scan grain the struct form is the multi-column contract).
  * Never null itself (bad bytes classify as null FIELDS) so the
  * quarantine semantics live in the fields, input NULL stays NULL. */
case class DecodeImageHeader(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = DecodeImageHeader.schema
  override def nullSafeEval(input: Any): Any =
    ImageHeaders.decodeStruct(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ImageHeaders.decodeStruct($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object DecodeImageHeader {
  import org.apache.spark.sql.types.{StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("format", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType)))
}

object ImageExpressions {
  def decodeImageHeader(c: Column): Column =
    ColumnBridge.column(DecodeImageHeader(ColumnBridge.expression(c)))
  def imageFormat(c: Column): Column = ColumnBridge.column(ImageFormat(ColumnBridge.expression(c)))
  def imageWidth(c: Column): Column = ColumnBridge.column(ImageWidth(ColumnBridge.expression(c)))
  def imageHeight(c: Column): Column = ColumnBridge.column(ImageHeight(ColumnBridge.expression(c)))
}
