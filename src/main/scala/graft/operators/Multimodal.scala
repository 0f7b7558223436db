package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns + typed metadata struct, with decode / feature-extract /
  * frame-sample operators.
  *
  * Header decode ([[decodeImageMeta]]) is REAL binary parsing —
  * PNG/JPEG/GIF/BMP magic sniffing and intrinsic width/height
  * extraction from the container headers, as whole-stage-codegen'd
  * Catalyst expressions (plans/ImageExpressions). Full pixel decode
  * (which needs a codec library this container doesn't ship) slots in
  * AFTER the header gate at the same column position — the header
  * pass is what a 100 TB asset scan runs on everything, the pixel
  * codec only on what survives it.
  */
object Multimodal {

  final case class AssetMeta(kind: String, nBytes: Long, declaredChars: Long)
  final case class Asset(asset_id: Long, kind: String, content: Array[Byte], meta: AssetMeta)
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                                 mean_byte: Double, features: Array[Double])

  /** Build a binary-asset table from the documents testdata: content =
    * UTF-8 bytes, kind derived from source. Stands in for an
    * image/audio blob column with the same plumbing. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("declared_chars")).as("meta"))

  /** Container-header decode: format sniff + intrinsic width/height
    * from the PNG/JPEG/GIF/BMP headers (plans/ImageExpressions — real
    * byte parsing, codegen'd, scan-throughput). `format` is NULL for
    * unrecognized magic; `width`/`height` are NULL whenever the header
    * is truncated or corrupt; `valid` = dimensions parsed. Bad bytes
    * classify, never throw — the quarantine contract. */
  def decodeImageMeta(assets: DataFrame): DataFrame = {
    import graft.plans.ImageExpressions._
    // ONE struct decode per row, fields projected off it (the four
    // identical subtrees collapse to a single parse under codegen CSE
    // — MultimodalSpec asserts one decodeStruct() call site)
    val h = decodeImageHeader(col("content"))
    assets.select(
      col("asset_id"), col("kind"),
      h.getField("format").as("format"),
      h.getField("width").as("width"),
      h.getField("height").as("height"),
      h.getField("width").isNotNull.as("valid"))
  }

  /** Audio/video container-header decode (plans/MediaExpressions —
    * real byte parsing, codegen'd, scan-throughput): format sniff
    * (wav/mp4/ogg/flac/webm/mp3) plus the cheap typed metadata the
    * headers carry — duration (WAV fmt+data walk, MP4 moov/mvhd box
    * walk) and the WAV fmt fields (sample rate, channels). `valid` =
    * a duration was parsed; magic-only sniffs and corrupt headers
    * classify with NULLs, never throw — the same quarantine contract
    * as [[decodeImageMeta]]. */
  def decodeMediaMeta(assets: DataFrame): DataFrame = {
    import graft.plans.MediaExpressions._
    // ONE container walk per row (see decodeImageMeta)
    val h = decodeMediaHeader(col("content"))
    assets.select(
      col("asset_id"), col("kind"),
      h.getField("format").as("format"),
      h.getField("duration_ms").as("duration_ms"),
      h.getField("sample_rate").as("sample_rate"),
      h.getField("channels").as("channels"),
      h.getField("duration_ms").isNotNull.as("valid"))
  }

  /** Byte-level content features (mean byte, 8-bucket byte histogram):
    * the cheap content fingerprint computed alongside header decode —
    * drift/corruption signals that need no codec. The mapPartitions
    * shape (batched, partition-parallel, no driver involvement) is
    * where a real pixel-level embedding model slots in. */
  def byteFeatures(assets: DataFrame)(implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          val n = bytes.length.toLong
          val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
          val hist = new Array[Double](8)
          bytes.foreach(b => hist((b & 0xff) >> 5) += 1.0)
          AssetFeatures(id, kind, n, mean, hist.map(h => if (n == 0) 0.0 else h / n))
        }
      }
  }

  /** Frame sampling: emit `frames` evenly-spaced byte-slices per asset
    * (posexplode; stands in for video frame extraction — the output
    * grain (asset_id, frame_no, frame_bytes) and the even-spacing
    * logic are the real thing). */
  def frameSample(assets: DataFrame, frames: Int, frameSize: Int): DataFrame = {
    // sequence(0, frames-1) runs DESCENDING for frames < 1 → negative
    // frame_no whose negative offset makes substring slice from the END
    require(frames >= 1 && frameSize >= 1, s"need frames/frameSize >= 1, got $frames/$frameSize")
    assets
      .withColumn("__n", length(col("content")))
      .withColumn("frame_no", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("__offset",
        (col("frame_no") * greatest((col("__n") - frameSize) / math.max(frames - 1, 1), lit(0))).cast("int") + 1)
      .select(
        col("asset_id"), col("kind"), col("frame_no"),
        expr(s"substring(content, __offset, $frameSize)").as("frame_bytes"))
  }
}
