package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.plans.ImageHeaders

/** Multimodal plumbing: binary columns, REAL header decode
  * (PNG/JPEG/GIF/BMP magic + dimensions, incl. truncated/corrupt
  * headers), byte-feature batch shape, frame sampling grain/spacing. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets = Multimodal.assetsFromDocuments(
    Seq((0L, "abcdefghijklmnopqrstuvwxyz0123456789", "web", 36L),
        (1L, "short", "pdf", 5L))
      .toDF("doc_id", "text", "source", "n_chars"))

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // genuine minimal headers, hand-laid-out from the public specs
  private val png = hx("89504E470D0A1A0A 0000000D 49484452 00000140 000000F0 0806000000 00000000")
  private val jpegApp0ThenSof = hx(
    "FFD8 FFE00010 4A46494600010100000100010000 FFC00011 08 00F0 0140 03 011100 021101 031101 FFD9")
  private val gif87 = hx("474946383761 4001 F000 F70000") // 320x240 little-endian
  private val bmp = hx("424D46000000 00000000 36000000 28000000 40010000 F0000000 0100 1800" +
    "00000000 10000000 130B0000 130B0000 00000000 00000000")
  private val bmpTopDown = hx("424D46000000 00000000 36000000 28000000 40010000 10FFFFFF 0100 1800" +
    "00000000 10000000 130B0000 130B0000 00000000 00000000") // height = -240 (top-down)

  test("ImageHeaders: PNG/JPEG/GIF/BMP magic + dims parse from genuine layouts") {
    assert(ImageHeaders.formatOf(png).toString == "png")
    assert(ImageHeaders.widthOf(png) == 320 && ImageHeaders.heightOf(png) == 240)
    assert(ImageHeaders.formatOf(jpegApp0ThenSof).toString == "jpeg")
    // the SOF0 sits AFTER an APP0 segment: the marker walk must skip it
    assert(ImageHeaders.widthOf(jpegApp0ThenSof) == 320)
    assert(ImageHeaders.heightOf(jpegApp0ThenSof) == 240)
    assert(ImageHeaders.formatOf(gif87).toString == "gif")
    assert(ImageHeaders.widthOf(gif87) == 320 && ImageHeaders.heightOf(gif87) == 240)
    assert(ImageHeaders.formatOf(bmp).toString == "bmp")
    assert(ImageHeaders.widthOf(bmp) == 320 && ImageHeaders.heightOf(bmp) == 240)
    // negative BMP height = top-down row order, magnitude is the height
    assert(ImageHeaders.heightOf(bmpTopDown) == 240)
  }

  test("ImageHeaders: truncated/corrupt headers classify, never throw, never fabricate") {
    // truncated PNG: magic sniffs, dims must be null (-1)
    val trunc = png.take(12)
    assert(ImageHeaders.formatOf(trunc).toString == "png")
    assert(ImageHeaders.widthOf(trunc) == -1 && ImageHeaders.heightOf(trunc) == -1)
    // PNG whose first chunk is not IHDR: dims unparseable
    val notIhdr = png.clone(); notIhdr(12) = 'X'.toByte
    assert(ImageHeaders.widthOf(notIhdr) == -1)
    // JPEG cut before the SOF marker: walk must hit the end and give up
    val jpegCut = jpegApp0ThenSof.take(20)
    assert(ImageHeaders.formatOf(jpegCut).toString == "jpeg")
    assert(ImageHeaders.widthOf(jpegCut) == -1)
    // JPEG with EOI before any SOF: no dims
    assert(ImageHeaders.widthOf(hx("FFD8FFD9")) == -1)
    // JPEG that loses marker sync (non-FF where a marker must start)
    assert(ImageHeaders.widthOf(hx("FFD8 00C0 0011")) == -1)
    // zero-dimension GIF is invalid
    assert(ImageHeaders.widthOf(hx("474946383961 0000 F000 F70000")) == -1)
    // unknown magic / empty input
    assert(ImageHeaders.formatOf(hx("00112233445566")) == null)
    assert(ImageHeaders.formatOf(Array.emptyByteArray) == null)
    assert(ImageHeaders.widthOf(Array.emptyByteArray) == -1)
  }

  test("decodeImageMeta: codegen'd expression path over a binary column, null semantics") {
    val df = Seq(
      (0L, png), (1L, jpegApp0ThenSof), (2L, gif87), (3L, bmp),
      (4L, png.take(12)), (5L, hx("DEADBEEF")))
      .toDF("asset_id", "content").withColumn("kind", lit("image"))
    val r = Multimodal.decodeImageMeta(df)
      .select($"asset_id", $"format", $"width", $"height", $"valid")
      .as[(Long, Option[String], Option[Int], Option[Int], Boolean)]
      .collect().sortBy(_._1)
    assert(r(0) == ((0L, Some("png"), Some(320), Some(240), true)))
    assert(r(1) == ((1L, Some("jpeg"), Some(320), Some(240), true)))
    assert(r(2) == ((2L, Some("gif"), Some(320), Some(240), true)))
    assert(r(3) == ((3L, Some("bmp"), Some(320), Some(240), true)))
    assert(r(4) == ((4L, Some("png"), None, None, false)), "truncated: sniffs, no dims")
    assert(r(5) == ((5L, None, None, None, false)), "garbage: nothing")
  }

  // ---- media containers (WAV / MP4 / magic sniffs) ------------------------

  private def le16h(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
  private def le32h(v: Int) =
    f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"
  private def be32h(v: Int) = f"$v%08X"

  /** Minimal WAV: RIFF/WAVE + fmt(16) + optional extra chunk + data. */
  private def wav(rate: Int, ch: Int, dataSize: Int, extraChunk: String = ""): Array[Byte] = {
    val byteRate = rate * ch * 2
    hx("52494646" + le32h(36 + dataSize) + "57415645" + extraChunk +
      "666D7420" + "10000000" + "0100" + le16h(ch) + le32h(rate) + le32h(byteRate) +
      le16h(ch * 2) + "1000" + "64617461" + le32h(dataSize))
  }

  test("MediaHeaders: WAV fmt/data walk — rate, channels, exact integer duration") {
    val b = wav(rate = 16000, ch = 2, dataSize = 16000 * 2 * 2 * 3) // 3 s
    assert(graft.plans.MediaHeaders.formatOf(b).toString == "wav")
    assert(graft.plans.MediaHeaders.sampleRateOf(b) == 16000)
    assert(graft.plans.MediaHeaders.channelsOf(b) == 2)
    assert(graft.plans.MediaHeaders.durationMsOf(b) == 3000L)
    // an ODD-size chunk before fmt must be skipped with the RIFF pad
    // byte (chunk walk that forgets the pad desyncs on the next 4cc)
    val odd = wav(8000, 1, 8000 * 2, extraChunk = "4C495354" + le32h(3) + "414243" + "00")
    assert(graft.plans.MediaHeaders.sampleRateOf(odd) == 8000)
    assert(graft.plans.MediaHeaders.durationMsOf(odd) == 1000L)
  }

  test("MediaHeaders: WAV corrupt/truncated classify as invalid, never fabricate") {
    // RIFF..WAVE only: sniffs wav, no fields
    val trunc = wav(16000, 2, 100).take(12)
    assert(graft.plans.MediaHeaders.formatOf(trunc).toString == "wav")
    assert(graft.plans.MediaHeaders.sampleRateOf(trunc) == -1)
    assert(graft.plans.MediaHeaders.durationMsOf(trunc) == -1L)
    // fmt that declares 16 bytes but is cut mid-payload
    val cutFmt = wav(16000, 2, 100).take(24)
    assert(graft.plans.MediaHeaders.sampleRateOf(cutFmt) == -1)
    // zero byte-rate would divide by zero — must classify instead
    val zeroRate = wav(0, 1, 100)
    assert(graft.plans.MediaHeaders.durationMsOf(zeroRate) == -1L)
    // data chunk missing: duration unknowable
    val noData = hx("52494646" + le32h(36) + "57415645" +
      "666D7420" + "10000000" + "0100" + le16h(1) + le32h(8000) + le32h(16000) +
      le16h(2) + "1000")
    assert(graft.plans.MediaHeaders.durationMsOf(noData) == -1L)
  }

  /** mvhd v0 payload: version+flags, ctime, mtime, timescale, duration. */
  private def mvhdV0(timescale: Int, duration: Int) =
    "0000001C6D766864" + "00000000" + "00000000" + "00000000" +
      be32h(timescale) + be32h(duration)
  private val ftyp = "0000001066747970" + "69736F6D00000000"

  test("MediaHeaders: MP4 box walk — v0, v1, box skipping, mdat-first, largesize") {
    val v0 = hx(ftyp + "000000246D6F6F76" + mvhdV0(600, 1800))
    assert(graft.plans.MediaHeaders.formatOf(v0).toString == "mp4")
    assert(graft.plans.MediaHeaders.mp4DurationMs(v0) == 3000L)
    // moov AFTER an mdat box (streaming-unfriendly but common layout):
    // the top-level walk must skip mdat by its declared size
    val mdatFirst = hx(ftyp + "0000000C6D646174" + "DEADBEEF" +
      "000000246D6F6F76" + mvhdV0(1000, 2500))
    assert(graft.plans.MediaHeaders.mp4DurationMs(mdatFirst) == 2500L)
    // 64-bit LARGESIZE mdat (size field 1 + u64), then moov
    val large = hx(ftyp + "00000001" + "6D646174" + "0000000000000014" + "00000000" +
      "000000246D6F6F76" + mvhdV0(100, 250))
    assert(graft.plans.MediaHeaders.mp4DurationMs(large) == 2500L)
    // mvhd v1: 64-bit times and duration
    val v1 = hx(ftyp + "000000306D6F6F76" + "000000286D766864" + "01000000" +
      "0000000000000000" + "0000000000000000" + be32h(1000) + "00000000" + be32h(7250))
    assert(graft.plans.MediaHeaders.mp4DurationMs(v1) == 7250L)
  }

  test("MediaHeaders: MP4 corrupt classify — zero timescale, no mvhd, cut walk") {
    assert(graft.plans.MediaHeaders.mp4DurationMs(
      hx(ftyp + "000000246D6F6F76" + mvhdV0(0, 1800))) == -1L, "zero timescale")
    assert(graft.plans.MediaHeaders.mp4DurationMs(
      hx(ftyp + "000000106D6F6F76" + "0000000866726565")) == -1L, "moov without mvhd")
    assert(graft.plans.MediaHeaders.mp4DurationMs(
      hx(ftyp + "000000246D6F6F76" + mvhdV0(600, 1800)).take(30)) == -1L, "cut mid-mvhd")
    assert(graft.plans.MediaHeaders.formatOf(hx(ftyp).take(8)) == null,
      "ftyp needs its full 12-byte probe")
    // magic-only sniffs carry no duration
    assert(graft.plans.MediaHeaders.formatOf(hx("4F676753AABB")).toString == "ogg")
    assert(graft.plans.MediaHeaders.formatOf(hx("664C6143")).toString == "flac")
    assert(graft.plans.MediaHeaders.formatOf(hx("1A45DFA3")).toString == "webm")
    assert(graft.plans.MediaHeaders.formatOf(hx("494433040000")).toString == "mp3")
    assert(graft.plans.MediaHeaders.formatOf(hx("FFFB9000")).toString == "mp3")
    assert(graft.plans.MediaHeaders.durationMsOf(hx("4F676753AABB")) == -1L)
    assert(graft.plans.MediaHeaders.formatOf(Array.emptyByteArray) == null)
  }

  test("decodeMediaMeta: codegen'd expression path, null semantics per format") {
    val df = Seq(
      (0L, wav(44100, 2, 44100 * 2 * 2 * 2)),
      (1L, hx(ftyp + "000000246D6F6F76" + mvhdV0(600, 3600))),
      (2L, hx("4F67675300020000")),
      (3L, wav(44100, 2, 100).take(12)),
      (4L, hx("DEADBEEF")))
      .toDF("asset_id", "content").withColumn("kind", lit("media"))
    val r = Multimodal.decodeMediaMeta(df)
      .select($"asset_id", $"format", $"duration_ms", $"sample_rate", $"channels", $"valid")
      .as[(Long, Option[String], Option[Long], Option[Int], Option[Int], Boolean)]
      .collect().sortBy(_._1)
    assert(r(0) == ((0L, Some("wav"), Some(2000L), Some(44100), Some(2), true)))
    assert(r(1) == ((1L, Some("mp4"), Some(6000L), None, None, true)))
    assert(r(2) == ((2L, Some("ogg"), None, None, None, false)), "magic-only: no duration")
    assert(r(3) == ((3L, Some("wav"), None, None, None, false)), "truncated: sniffs only")
    assert(r(4) == ((4L, None, None, None, None, false)), "garbage: nothing")
  }

  test("struct decode ≡ scalar point expressions; codegen CSE gives ONE parse per row") {
    import org.apache.spark.sql.functions.{col, concat, encode, lit, unhex}
    // struct fields must agree with the single-column expressions on
    // every container + corrupt case
    val df = Seq(
      (0L, wav(8000, 1, 8000 * 2)),
      (1L, hx(ftyp + "000000246D6F6F76" + mvhdV0(600, 1800))),
      (2L, hx("89504E470D0A1A0A0000000D49484452000000400000002008")),
      (3L, hx("DEADBEEF")), (4L, hx("4F67675300020000")))
      .toDF("asset_id", "content")
    import graft.plans.{ImageExpressions => I, MediaExpressions => M}
    val ih = I.decodeImageHeader(col("content"))
    val mh = M.decodeMediaHeader(col("content"))
    df.select(
      ih.getField("format") <=> I.imageFormat(col("content")),
      ih.getField("width") <=> I.imageWidth(col("content")),
      ih.getField("height") <=> I.imageHeight(col("content")),
      mh.getField("format") <=> M.mediaFormat(col("content")),
      mh.getField("duration_ms") <=> M.mediaDurationMs(col("content")),
      mh.getField("sample_rate") <=> M.mediaSampleRate(col("content")),
      mh.getField("channels") <=> M.mediaChannels(col("content")))
      .collect().foreach { r =>
        (0 until 7).foreach(i => assert(r.getBoolean(i), s"field $i disagrees: $r"))
      }
    // CSE: the 4 image projections + 5 media projections in the meta
    // operators compile to ONE decodeStruct call each (non-foldable input)
    val nf = spark.range(3).select(col("id").as("asset_id"), lit("x").as("kind"),
      encode(concat(lit("p"), col("id").cast("string")), "UTF-8").as("content"))
    def calls(plan: org.apache.spark.sql.DataFrame, marker: String): Int = {
      val gen = org.apache.spark.sql.execution.debug.codegenString(
        plan.queryExecution.executedPlan)
      java.util.regex.Pattern.quote(marker).r.findAllIn(gen).size
    }
    assert(calls(Multimodal.decodeImageMeta(nf), "ImageHeaders.decodeStruct(") === 1)
    assert(calls(Multimodal.decodeMediaMeta(nf), "MediaHeaders.decodeStruct(") === 1)
  }

  test("frameSample: even spacing, fixed grain, correct slice content") {
    val frames = Multimodal.frameSample(assets, frames = 4, frameSize = 5)
      .orderBy("asset_id", "frame_no")
      .select($"asset_id", $"frame_no", $"frame_bytes".cast("string"))
      .as[(Long, Int, String)].collect()
    assert(frames.count(_._1 == 0L) == 4)
    val doc0 = frames.filter(_._1 == 0L).map(_._3).toSeq
    // 36 bytes, frame 5, 4 frames → offsets 1, 1+10, 1+20, 1+31
    assert(doc0 == Seq("abcde", "klmno", "uvwxy", "56789"))
    // short doc: offsets clamp to 1, slices truncate — never throws
    val doc1 = frames.filter(_._1 == 1L).map(_._3).toSeq
    assert(doc1 == Seq("short", "short", "short", "short"))
  }

  test("byteFeatures: histogram features normalized, mean in byte domain") {
    implicit val s = spark
    val f = Multimodal.byteFeatures(assets).collect().sortBy(_.asset_id)
    assert(f.length == 2)
    f.foreach { a =>
      assert(a.features.length == 8)
      assert(math.abs(a.features.sum - 1.0) < 1e-9, "histogram must sum to 1")
      assert(a.mean_byte >= 0.0 && a.mean_byte <= 255.0)
    }
    assert(f(0).n_bytes == 36L && f(1).n_bytes == 5L)
  }
}
