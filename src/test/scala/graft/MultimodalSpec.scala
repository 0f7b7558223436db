package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: binary columns, decode-stub batch shape, frame
  * sampling grain/spacing. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets = Multimodal.assetsFromDocuments(
    Seq((0L, "abcdefghijklmnopqrstuvwxyz0123456789", "web", 36L),
        (1L, "short", "pdf", 5L))
      .toDF("doc_id", "text", "source", "n_chars"))

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

  test("decodeStub: histogram features normalized, mean in byte domain") {
    implicit val s = spark
    val f = Multimodal.decodeStub(assets).collect().sortBy(_.asset_id)
    assert(f.length == 2)
    f.foreach { a =>
      assert(a.features.length == 8)
      assert(math.abs(a.features.sum - 1.0) < 1e-9, "histogram must sum to 1")
      assert(a.mean_byte >= 0.0 && a.mean_byte <= 255.0)
    }
    assert(f(0).n_bytes == 36L && f(1).n_bytes == 5L)
  }
}
