package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** LSH-bucketed ANN (difference-plane sign bands + exact re-rank):
  * candidate quality, bias resistance, and the no-cross-join plan
  * shape. The per-row result values are oracled by q_embed_lsh; these
  * tests pin the properties the oracle can't see. */
class LshAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  test("re-ranked output: ranks contiguous from 1, cosine non-increasing per query") {
    val out = Similarity.lshTopK(embs, embs.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).toSeq == (1 to rows.length), s"query $q ranks not contiguous")
      val cos = rows.sortBy(_._2).map(_._4)
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"query $q cosine not sorted")
    }
  }

  test("every LSH hit is a true-cosine hit: scores match brute force exactly") {
    val q = embs.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(embs, q, "vec_id", "embedding", k = 500)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("bf_cosine"))
    val lsh = Similarity.lshTopK(embs, q, "vec_id", "embedding", k = 3)
    val joined = lsh.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("bf_cosine").isNull || col("bf_cosine") =!= col("cosine")).count() == 0L)
  }

  test("recall@3 vs brute force clears the documented floor on the real corpus") {
    val q = embs.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(embs, q, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"))
    val lsh = Similarity.lshTopK(embs, q, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"))
    val hits = lsh.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val total = exact.count()
    assert(total == 8 * 3L)
    val recall = hits.toDouble / total
    assert(recall >= 0.3, f"recall@3 = $recall%.2f below documented floor 0.3")
  }

  test("difference-plane signatures fan out on an all-positive (sign-biased) corpus") {
    val rows = (0L until 64L).map { id =>
      val v = Array.tabulate(16) { i =>
        val x = (1.0 + math.sin(id * 16 + i)).toFloat
        if (x <= 0f) 0.01f else x
      }
      (id, v)
    }
    val biased = rows.toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L), (3L, 5L), (7L, 11L), (13L, 17L), (19L, 23L), (29L, 31L),
      (37L, 41L), (43L, 47L), (4L, 8L), (6L, 9L), (10L, 14L), (12L, 15L))
    val planes = Similarity.differencePlanes(biased, "vec_id", "embedding", pairs)
    val sigs = Similarity.lshSignatures(biased, "vec_id", "embedding", planes)
    assert(sigs.select("sig").distinct().count() > 8L, "signatures collapsed on biased corpus")
  }

  test("plan: candidate generation is a hash join on the band key, no cartesian product") {
    val plan = Similarity.lshTopK(embs, embs.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product in LSH plan:\n$plan")
  }

  test("marginBitext: the ratio margin demotes the hub an absolute-cosine pick keeps") {
    // 4-D fixture: X = the three axes; hub = their normalized mean
    // (cos .577 to EVERY x — the textbook hub); y1/y2 are genuine
    // partners of x1/x2 living partly in the 4th dimension. For x2 the
    // raw-cosine argmax is the hub (.577 > .55) but the hub's own
    // neighborhood mean is high (b_hub = .577) while y2's is low
    // (b_y2 = .275), so the margin flips the pick to y2.
    val s3 = (1.0 / math.sqrt(3.0)).toFloat
    val xs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val ys = Seq(
      (10L, Array(s3, s3, s3, 0f)),                 // hub
      (11L, Array(0.97f, 0f, 0f, 0.2431049f)),      // x1's partner
      (12L, Array(0f, 0.55f, 0f, 0.8351646f)))      // x2's partner
      .toDF("vec_id", "embedding")
    // raw-cosine pick for x2 IS the hub
    val raw = Similarity.bruteForceTopK(ys, xs, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(2L) === 10L, s"fixture must make the hub the raw pick: $raw")
    val m = Similarity.marginBitext(xs, ys, "vec_id", "embedding", k = 2, threshold = 1.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    // margin flips x2 to its true partner, and the pair is mutual+mined
    assert(m(2L)._1 === 12L, s"margin must demote the hub: $m")
    assert(m(2L)._3 && m(2L)._4, s"x2-y2 is mutual and above threshold: ${m(2L)}")
    assert(m(1L)._1 === 11L && m(1L)._3, s"x1 keeps its genuine partner: ${m(1L)}")
    // x3 has no partner: its best falls back to the hub, and the
    // MUTUAL gate rejects the pair (the hub's own margin-best is x1)
    assert(m(3L)._1 === 10L && !m(3L)._3, s"x3's hub pair must not be mutual: ${m(3L)}")
    // margin is the hand value: m(x2,y2) = .55 / ((.56368+.275)/2) ≈ 1.3116
    assert(math.abs(m(2L)._2 - 1.3116) < 0.001, s"hand margin: ${m(2L)._2}")
  }

  test("marginBitext under the IVF ANN topK matches brute force on planted clustered pairs") {
    import org.apache.spark.sql.DataFrame
    // 4 well-separated clusters along the first 4 axes, jitter in dim 5:
    // within-cluster cosines ≈ .95+, cross-cluster ≈ .05 — the regime
    // bucketed ANN is built for. Buckets = the axis directions, so each
    // side's candidates are exactly its cluster peers and the ANN
    // mining result must equal the brute-force one row for row.
    def vec(c: Int, jit: Float): Array[Float] = {
      val v = Array.fill(5)(0.02f); v(c) = 1f; v(4) = jit; v
    }
    val xs = (0 until 8).map(i => ((i + 1).toLong, vec(i / 2, 0.2f + 0.2f * (i % 2))))
      .toDF("vec_id", "embedding")
    val ys = (0 until 12).map(i => ((i + 11).toLong, vec(i / 3, 0.1f + 0.15f * (i % 3))))
      .toDF("vec_id", "embedding")
    val centroids = (0 until 4).map(c => (c.toLong, {
      val v = Array.fill(5)(0f); v(c) = 1f; v
    })).toDF("centroid_id", "centroid_vec")
    val ann = (c: DataFrame, q: DataFrame, id: String, vecCol: String, k: Int) =>
      Similarity.ivfTopKWith(c, q, id, vecCol, k, centroids, nprobe = 1)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
    def canon(df: DataFrame) = df.orderBy("x_id").collect().map(_.toSeq).toSeq
    val brute = canon(Similarity.marginBitext(xs, ys, "vec_id", "embedding", k = 2, threshold = 1.0))
    val viaAnn = canon(Similarity.marginBitext(xs, ys, "vec_id", "embedding",
      k = 2, threshold = 1.0, topK = ann))
    assert(brute.length == 8, s"every x mines a best pair: $brute")
    // mutual-best pairs exist (the planted partners)
    assert(brute.count(_(4) == true) >= 4, s"planted mutual pairs expected: $brute")
    assert(viaAnn == brute,
      s"ANN mining diverged from brute force on clustered data:\n$viaAnn\nvs\n$brute")
  }
}
