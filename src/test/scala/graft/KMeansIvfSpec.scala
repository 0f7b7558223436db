package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.Similarity

/** Lloyd-fit coarse quantizer: the k-means guarantee (monotone
  * objective) and IVF recall against the brute-force ground truth. */
class KMeansIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val embs = Tables(spark, dir, "embeddings")

  test("each Lloyd round improves (or holds) the quantization objective") {
    val stride = Similarity.strideCentroids(embs, "vec_id", "embedding", 100)
    val fit1 = Similarity.kMeansFit(embs, "vec_id", "embedding", 100, iters = 1)
    val fit2 = Similarity.kMeansFit(embs, "vec_id", "embedding", 100, iters = 2)
    val s0 = Similarity.quantizationScore(embs, stride, "vec_id", "embedding")
    val s1 = Similarity.quantizationScore(embs, fit1, "vec_id", "embedding")
    val s2 = Similarity.quantizationScore(embs, fit2, "vec_id", "embedding")
    assert(s1 >= s0 - 1e-9, s"round 1 worsened objective: $s1 < $s0")
    assert(s2 >= s1 - 1e-9, s"round 2 worsened objective: $s2 < $s1")
  }

  test("fitted IVF recall@3 vs brute force is no worse than stride IVF") {
    import org.apache.spark.sql.functions.col
    val queries = embs.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 3))
    val strideHits = pairs(Similarity.ivfTopK(embs, queries, "vec_id", "embedding", 3, 100))
    val fitted = Similarity.kMeansFit(embs, "vec_id", "embedding", 100, iters = 2)
    val fittedHits = pairs(Similarity.ivfTopKWith(embs, queries, "vec_id", "embedding", 3, fitted))
    val multiHits = pairs(Similarity.ivfTopKWith(embs, queries, "vec_id", "embedding", 3, fitted, nprobe = 3))
    val strideRecall = (strideHits & truth).size.toDouble / truth.size
    val fittedRecall = (fittedHits & truth).size.toDouble / truth.size
    val multiRecall = (multiHits & truth).size.toDouble / truth.size
    info(s"recall@3: stride=$strideRecall fitted=$fittedRecall fitted+nprobe3=$multiRecall")
    assert(fittedRecall >= strideRecall - 1e-9)
    assert(multiRecall >= fittedRecall - 1e-9, "multi-probe must not lose recall")
    assert(fittedHits.nonEmpty)
  }

  test("silhouette: separated axis clusters score near 1, overlapping centroids score lower") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cluster A hugs e1, cluster B hugs e2 — centroids on the axes
    val vecs = Seq(
      (1L, Seq(1.0f, 0.05f)), (2L, Seq(1.0f, -0.05f)), (3L, Seq(0.95f, 0.0f)),
      (11L, Seq(0.05f, 1.0f)), (12L, Seq(-0.05f, 1.0f)), (13L, Seq(0.0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val goodCent = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("centroid_id", "centroid_vec")
    val good = Similarity.silhouette(vecs, goodCent, "vec_id", "embedding")
      .select("mean_sil").as[Double].collect()
    good.foreach(s => assert(s > 0.8, s"separated clusters: mean_sil $s"))
    // both centroids in cluster A's direction: B's members sit between
    // them -> near-zero or negative silhouette somewhere
    val badCent = Seq((0L, Seq(1.0f, 0.1f)), (1L, Seq(1.0f, -0.1f)))
      .toDF("centroid_id", "centroid_vec")
    val bad = Similarity.silhouette(vecs, badCent, "vec_id", "embedding")
      .select("mean_sil").as[Double].collect()
    assert(bad.exists(_ < 0.5), s"overlapping centroids should drop silhouette, got ${bad.toSeq}")
  }

  test("kCenterSeeds: covers well-separated directions — one seed per cluster " +
    "before any repeat; deterministic trajectory") {
    import spark.implicits._
    // three orthogonal directions, slight within-cluster jitter via a 4th dim
    def v(dir: Int, j: Float): Array[Float] = {
      val a = Array.fill(4)(0.0f); a(dir) = 1.0f; a(3) = j; a
    }
    val vecs = (0 until 9).map { i =>
      (i.toLong, v(i % 3, 0.01f * (i / 3)))
    }.toDF("vec_id", "embedding")
    val seeds = Similarity.kCenterSeeds(vecs, "vec_id", "embedding", k = 3)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(seeds.map(_._1).toSeq == Seq(1, 2, 3))
    // greedy cover: the three seeds hit all three directions
    assert(seeds.map(_._2 % 3).toSet.size == 3, s"seeds ${seeds.toSeq}")
    assert(seeds.head._3 == 0.0, "first pick carries dist 0 by convention")
    assert(seeds.tail.forall(_._3 > 0.5), s"cross-cluster distances: ${seeds.toSeq}")
    val again = Similarity.kCenterSeeds(vecs, "vec_id", "embedding", k = 3)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq == seeds.toSeq, "trajectory must be deterministic")
  }
}
