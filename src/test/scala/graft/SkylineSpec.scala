package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference brute-force dominance filter (the definition itself). */
  private def naive(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, m, x) =>
      !pts.exists { case (_, m2, x2) =>
        m2 <= m && x2 >= x && (m2 < m || x2 > x)
      }
    }.map(_._1).toSet

  test("skyline2D: hand case — dominated interior point drops, frontier stays") {
    // (id, minimize, maximize): (1,0,5) (2,1,9) (3,2,9) (4,3,1)
    // 3 is dominated by 2 (same max, higher min); 4 by everyone richer
    val pts = Seq((1L, 0L, 5L), (2L, 1L, 9L), (3L, 2L, 9L), (4L, 3L, 1L))
    val got = Skyline.skyline2D(pts.toDF("id", "m", "x"), "m", "x")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), s"got $got, expected ${naive(pts)}")
    assert(got == naive(pts))
  }

  test("skyline2D: ties on both axes survive together (strictness clause)") {
    val pts = Seq((1L, 2L, 7L), (2L, 2L, 7L), (3L, 2L, 6L))
    val got = Skyline.skyline2D(pts.toDF("id", "m", "x"), "m", "x")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("skyline2D: deterministic pseudo-random sweep equals brute force, " +
    "bucket-count invariant") {
    // seeded LCG so the sweep is reproducible
    var state = 42L
    def next(mod: Long): Long = { state = (state * 6364136223846793005L + 1442695040888963407L); math.floorMod(state >>> 16, mod) }
    val pts = (1L to 300L).map(id => (id, next(40), next(40)))
    val df = pts.toDF("id", "m", "x")
    val want = naive(pts)
    for (nb <- Seq(1, 3, 64, 128)) {
      val got = Skyline.skyline2D(df, "m", "x", nBuckets = nb)
        .select("id").as[Long].collect().toSet
      assert(got == want, s"nBuckets=$nb: got ${got.size}, want ${want.size}")
    }
  }

  test("skyline2D: single distinct minCol value degenerates to the max peers") {
    val pts = Seq((1L, 5L, 1L), (2L, 5L, 9L), (3L, 5L, 9L))
    val got = Skyline.skyline2D(pts.toDF("id", "m", "x"), "m", "x")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }
}
