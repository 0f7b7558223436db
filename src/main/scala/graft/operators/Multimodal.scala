package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns + typed metadata struct, with decode / feature-extract /
  * frame-sample operators.
  *
  * The decode step is a clearly-marked deterministic STUB (no media
  * libraries in this container); everything around it — schema, binary
  * column plumbing, partition-parallel batch processing, feature
  * vector shape — is real and tested. Swap `decodeStub` for a real
  * codec (e.g. a JNI decoder or `mapInPandas`+PIL on a PySpark edge)
  * without touching any other operator.
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

  /** STUB decode: deterministic per-byte "feature extraction" standing in
    * for image decode + embedding. Real implementation would decode
    // content with a codec here; the mapPartitions shape (batched,
    * partition-parallel, no driver involvement) is the production shape. */
  def decodeStub(assets: DataFrame)(implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          // STUB: byte-statistics pseudo-features (deterministic).
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
