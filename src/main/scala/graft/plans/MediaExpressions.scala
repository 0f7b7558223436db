package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Audio/video container-header parsing over opaque `binary` columns —
  * the media half of the multimodal decode surface (images:
  * [[ImageHeaders]]), implemented from the PUBLIC container layouts:
  *
  *  - WAV (RIFF, Microsoft/IBM spec): "RIFF" [u32 LE riff-size] "WAVE",
  *    then a chunk walk — each chunk is [4cc][u32 LE size][payload,
  *    padded to even]; the `fmt ` chunk carries audio format u16,
  *    channels u16, sample rate u32, byte rate u32, block align u16,
  *    bits/sample u16 (all LE); the `data` chunk's size with the byte
  *    rate gives duration: ms = data_size · 1000 / byte_rate.
  *  - MP4 / ISO-BMFF (ISO 14496-12): a box walk — each box is
  *    [u32 BE size][4cc], size 1 → u64 largesize follows, size 0 → box
  *    extends to EOF; the `moov` box's `mvhd` child carries
  *    version u8 + flags u24, then (v0) u32 ctime, u32 mtime,
  *    u32 timescale, u32 duration, or (v1) u64 ctime, u64 mtime,
  *    u32 timescale, u64 duration; ms = duration · 1000 / timescale.
  *  - Magic-only sniffs for the other common media containers: OGG
  *    ("OggS"), FLAC ("fLaC"), WebM/Matroska (EBML 1A 45 DF A3),
  *    MP3 ("ID3" or an FF Ex frame sync).
  *
  * Same shape and contract as the image expressions: scalar
  * whole-stage-codegen'd expressions calling a shared static parser —
  * scan-throughput, no UDF, partition-parallel; truncated/corrupt
  * headers yield NULL (classify, never throw — the quarantine
  * contract a 100 TB asset scan needs). Full codec decode slots in
  * AFTER this gate, on the rows that survive it.
  */
object MediaHeaders {

  private val WAV_S = UTF8String.fromString("wav")
  private val MP4_S = UTF8String.fromString("mp4")
  private val OGG_S = UTF8String.fromString("ogg")
  private val FLAC_S = UTF8String.fromString("flac")
  private val WEBM_S = UTF8String.fromString("webm")
  private val MP3_S = UTF8String.fromString("mp3")

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  @inline private def fourCc(b: Array[Byte], i: Int, a: Char, c: Char, d: Char, e: Char): Boolean =
    b(i) == a.toByte && b(i + 1) == c.toByte && b(i + 2) == d.toByte && b(i + 3) == e.toByte

  private def hasWavMagic(b: Array[Byte]): Boolean =
    b.length >= 12 && fourCc(b, 0, 'R', 'I', 'F', 'F') && fourCc(b, 8, 'W', 'A', 'V', 'E')

  /** ISO-BMFF: the FIRST box must be well-formed and its type `ftyp`
    * (every conforming MP4/MOV starts with the file-type box). */
  private def hasMp4Magic(b: Array[Byte]): Boolean =
    b.length >= 12 && fourCc(b, 4, 'f', 't', 'y', 'p') && be32(b, 0) >= 16

  def formatOf(b: Array[Byte]): UTF8String =
    if (hasWavMagic(b)) WAV_S
    else if (hasMp4Magic(b)) MP4_S
    else if (b.length >= 4 && fourCc(b, 0, 'O', 'g', 'g', 'S')) OGG_S
    else if (b.length >= 4 && fourCc(b, 0, 'f', 'L', 'a', 'C')) FLAC_S
    else if (b.length >= 4 && u8(b, 0) == 0x1a && u8(b, 1) == 0x45 &&
      u8(b, 2) == 0xdf && u8(b, 3) == 0xa3) WEBM_S
    else if (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') MP3_S
    else if (b.length >= 2 && u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0) MP3_S
    else null

  /** WAV fmt+data walk → packed
    * `(sampleRate << 40) | (channels << 32) | durationMs`, or -1 when
    * the chunks are truncated/corrupt. Packing keeps the walk
    * single-pass for the three scalar expressions. durationMs is
    * integer floor(data_size·1000 / byte_rate) — exact long math. */
  def wavInfo(b: Array[Byte]): Long = {
    if (!hasWavMagic(b)) return -1L
    val n = b.length
    var off = 12
    var rate = -1L; var ch = -1L; var byteRate = -1L; var dataSize = -1L
    while (off + 8 <= n && (rate < 0 || dataSize < 0)) {
      val size = le32(b, off + 4)
      if (size < 0 || size > Int.MaxValue) return -1L
      if (fourCc(b, off, 'f', 'm', 't', ' ')) {
        if (size < 16 || off + 8 + 16 > n) return -1L
        ch = le16(b, off + 10)
        rate = le32(b, off + 12)
        byteRate = le32(b, off + 16)
      } else if (fourCc(b, off, 'd', 'a', 't', 'a')) {
        dataSize = size // payload may legitimately be absent (header-only probe)
      }
      // chunks pad to even length (RIFF alignment rule)
      off += 8 + size.toInt + (size.toInt & 1)
    }
    if (rate <= 0 || ch <= 0 || ch > 255 || byteRate <= 0 || dataSize < 0) return -1L
    val durationMs = dataSize * 1000L / byteRate
    // packing domain guards: a corrupt header can carry a multi-MHz
    // "rate" or a micro byte-rate whose ms overflows the packed field —
    // classify as invalid rather than alias into a plausible value
    if (rate > 0xffffffL || durationMs > 0xffffffffL) -1L
    else (rate << 40) | (ch << 32) | durationMs
  }

  /** MP4 box walk → duration in ms from moov/mvhd, or -1. Handles
    * 64-bit largesize boxes, size-0 (to-EOF) boxes, mvhd v0 and v1,
    * and moov placed after arbitrary boxes (mdat-first files). */
  def mp4DurationMs(b: Array[Byte]): Long = {
    if (!hasMp4Magic(b)) return -1L
    val n = b.length
    var off = 0L
    while (off + 8 <= n) {
      var size = be32(b, off.toInt)
      var hdr = 8L
      if (size == 1) {
        if (off + 16 > n) return -1L
        size = be64(b, off.toInt + 8); hdr = 16L
      } else if (size == 0) size = n - off // box extends to EOF
      if (size < hdr) return -1L
      if (fourCc(b, off.toInt + 4, 'm', 'o', 'o', 'v')) {
        // walk moov's children for mvhd
        var c = off + hdr
        val end = math.min(off + size, n.toLong)
        while (c + 8 <= end) {
          var cs = be32(b, c.toInt)
          var chdr = 8L
          if (cs == 1) {
            if (c + 16 > end) return -1L
            cs = be64(b, c.toInt + 8); chdr = 16L
          } else if (cs == 0) cs = end - c
          if (cs < chdr) return -1L
          if (fourCc(b, c.toInt + 4, 'm', 'v', 'h', 'd')) {
            val p = (c + chdr).toInt
            if (p + 1 > n) return -1L
            val version = u8(b, p)
            if (version == 0) {
              if (p + 20 > n) return -1L
              val timescale = be32(b, p + 12)
              val duration = be32(b, p + 16)
              return if (timescale > 0 && duration >= 0) duration * 1000L / timescale else -1L
            } else if (version == 1) {
              if (p + 32 > n) return -1L
              val timescale = be32(b, p + 20)
              val duration = be64(b, p + 24)
              return if (timescale > 0 && duration >= 0) duration * 1000L / timescale else -1L
            } else return -1L
          }
          c += cs
        }
        return -1L // moov without mvhd
      }
      off += size
    }
    -1L
  }

  /** Container-agnostic duration: WAV from fmt+data, MP4 from mvhd;
    * -1 (→ NULL at the expression layer) for magic-only formats and
    * corrupt headers. */
  def durationMsOf(b: Array[Byte]): Long =
    if (hasWavMagic(b)) { val i = wavInfo(b); if (i < 0) -1L else i & 0xffffffffL }
    else if (hasMp4Magic(b)) mp4DurationMs(b)
    else -1L

  def sampleRateOf(b: Array[Byte]): Int = {
    val i = wavInfo(b); if (i < 0) -1 else (i >>> 40).toInt
  }

  def channelsOf(b: Array[Byte]): Int = {
    val i = wavInfo(b); if (i < 0) -1 else ((i >>> 32) & 0xff).toInt
  }

  /** ONE-parse struct decode: (format, duration_ms, sample_rate,
    * channels) — format null for unknown magic, the other fields null
    * whenever that container doesn't carry them or the header is
    * corrupt. One WAV chunk walk / one MP4 box walk per row total. */
  def decodeStruct(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    def row(vs: Array[Any]) =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vs)
    val f = formatOf(b)
    if (f == null) row(Array[Any](null, null, null, null))
    else if (hasWavMagic(b)) {
      val i = wavInfo(b)
      if (i < 0L) row(Array[Any](f, null, null, null))
      else row(Array[Any](f, i & 0xffffffffL, (i >>> 40).toInt, ((i >>> 32) & 0xff).toInt))
    } else if (hasMp4Magic(b)) {
      val d = mp4DurationMs(b)
      if (d < 0L) row(Array[Any](f, null, null, null))
      else row(Array[Any](f, d, null, null))
    } else row(Array[Any](f, null, null, null))
  }
}

/** Media container format by magic — 'wav' | 'mp4' | 'ogg' | 'flac' |
  * 'webm' | 'mp3', NULL for unrecognized bytes. */
case class MediaFormat(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.formatOf(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.MediaHeaders.formatOf($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Asset duration in milliseconds from the container header (WAV
  * fmt/data, MP4 mvhd) — NULL when truncated, corrupt, or the format
  * carries no cheap duration field. */
case class MediaDurationMs(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val d = MediaHeaders.durationMsOf(input.asInstanceOf[Array[Byte]])
    if (d < 0L) null else d
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.MediaHeaders.durationMsOf($c);
       |if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = -1L; }
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** WAV sample rate (Hz) from the fmt chunk — NULL for non-WAV or
  * corrupt headers. */
case class MediaSampleRate(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any = {
    val r = MediaHeaders.sampleRateOf(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.MediaHeaders.sampleRateOf($c);
       |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = -1; }
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** WAV channel count from the fmt chunk — NULL for non-WAV or corrupt
  * headers. */
case class MediaChannels(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any = {
    val c = MediaHeaders.channelsOf(input.asInstanceOf[Array[Byte]])
    if (c < 0) null else c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.MediaHeaders.channelsOf($c);
       |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = -1; }
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Single-pass container decode: struct<format,duration_ms,
  * sample_rate,channels> from ONE walk of the header — the
  * multi-column contract (the scalar expressions each re-walk; fine
  * for one answer, redundant for all of them). Never null itself;
  * quarantine semantics live in the fields, input NULL stays NULL. */
case class DecodeMediaHeader(child: Expression) extends BinaryInputExpr {
  override def dataType: DataType = DecodeMediaHeader.schema
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.decodeStruct(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MediaHeaders.decodeStruct($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object DecodeMediaHeader {
  import org.apache.spark.sql.types.{StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("format", StringType), StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType)))
}

object MediaExpressions {
  def decodeMediaHeader(c: Column): Column =
    ColumnBridge.column(DecodeMediaHeader(ColumnBridge.expression(c)))
  def mediaFormat(c: Column): Column = ColumnBridge.column(MediaFormat(ColumnBridge.expression(c)))
  def mediaDurationMs(c: Column): Column = ColumnBridge.column(MediaDurationMs(ColumnBridge.expression(c)))
  def mediaSampleRate(c: Column): Column = ColumnBridge.column(MediaSampleRate(ColumnBridge.expression(c)))
  def mediaChannels(c: Column): Column = ColumnBridge.column(MediaChannels(ColumnBridge.expression(c)))
}
