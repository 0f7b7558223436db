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
}
