package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the outputs the DuckDB hash gate can't see:
  * every query is oracled since round 4, but the centroid-dependent
  * IVF ranking detail and the approx-sketch estimates only reach the
  * driver as within-tolerance booleans — their detailed values are
  * pinned here from the deterministic sf0.01 testdata instead.
  *
  * Note on q_lang_id: the synthetic documents carry NO language signal
  * (the text is English-flavored technical filler under every declared
  * lang label — none of the de/es/fr function words or CJK chars occur),
  * so the classifier correctly reads every row as en or und regardless
  * of label; the pin asserts that deterministic output. Classifier
  * QUALITY is proven separately: LangIdSpec measures >0.9 per-language
  * accuracy on the generator's signal-bearing fixture. */
class GoldenRowsOnlySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("q_lang_id golden at sf0.01: full confusion table pinned") {
    val got = SparkEntry.queries("q_lang_id")(spark, dir)
      .as[(String, String, Long)].collect().toSet
    val expected = Set(
      ("de", "en", 51L), ("de", "und", 19L),
      ("en", "en", 160L), ("en", "und", 58L),
      ("es", "en", 57L), ("es", "und", 16L),
      ("fr", "en", 51L), ("fr", "und", 13L),
      ("zh", "en", 63L), ("zh", "und", 12L))
    assert(got == expected)
  }

  test("q_multimodal_features golden at sf0.01: count + first rows + domains") {
    val df = SparkEntry.queries("q_multimodal_features")(spark, dir)
    val rows = df.collect()
    assert(rows.length == 500)
    val first3 = rows.take(3).map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))).toSeq
    assert(first3 == Seq(
      (0L, "image", 157L, 92.4076, 0.1975),
      (1L, "audio", 406L, 95.0222, 0.1749),
      (2L, "video", 246L, 94.065, 0.1789)))
    // decode-stub feature domains hold for every asset
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 255.0))
    assert(rows.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("k-means IVF detail golden at sf0.01: shape + recall vs exact brute-force") {
    val got = graft.queries.TextVector.embedIvfKmeans(spark, dir)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSeq
    // 8 queries × top-3, ranks exactly 1..3 per query
    assert(got.length == 24)
    assert(got.groupBy(_._1).forall { case (_, rs) => rs.map(_._2).sorted == Seq(1, 2, 3) })
    val approx = got.map { case (q, _, n) => (q, n) }.toSet
    val exact = graft.queries.TextVector.embedTopK(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = approx.count(exact.contains).toDouble / exact.size
    // fitted quantizer + nprobe=3 must beat the stride quantizer's
    // single-probe recall floor by a wide margin (KMeansIvfSpec measured
    // 0.375 → 0.83; pin a conservative bound so legit float jitter in
    // the distributed Lloyd averages can't flake the build)
    assert(recall >= 0.7, s"recall@3 vs brute-force = $recall")
  }

  test("q_approx_stats: every within_tol boolean true (2% distinct, 1% p90)") {
    val rows = SparkEntry.queries("q_approx_stats")(spark, dir)
      .select("event_type", "users_within_tol", "p90_within_tol")
      .as[(String, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, u, p) =>
      assert(u, s"$t distinct beyond 2% of exact")
      assert(p, s"$t p90 beyond 1% of exact")
    }
  }

  test("q_embed_ivf_kmeans recall gate: full top-3 and >=1 true neighbor per query") {
    val rows = SparkEntry.queries("q_embed_ivf_kmeans")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == 8)
    rows.foreach { case (q, n, ok) =>
      assert(n == 3L, s"query $q returned $n results")
      assert(ok, s"query $q recalled no true neighbor")
    }
  }
}
