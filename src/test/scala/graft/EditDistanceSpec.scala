package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EditDistance

class EditDistanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deletionNeighborhood: the string plus each single-char deletion, distinct") {
    val got = Seq("abc").toDF("s")
      .select(EditDistance.deletionNeighborhood(col("s")).as("v"))
      .as[Seq[String]].head().toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
    // repeated chars dedup: "aa" deletes to "a" twice
    val aa = Seq("aa").toDF("s")
      .select(EditDistance.deletionNeighborhood(col("s")).as("v"))
      .as[Seq[String]].head().toSet
    assert(aa == Set("aa", "a"))
  }

  test("symspellPairs is complete for distance <= 1 (sub, ins/del, equal) and excludes distance 2") {
    val rows = Seq(
      (1L, "spark"),  // base
      (2L, "spank"),  // substitution  -> d=1
      (3L, "sparks"), // insertion     -> d=1
      (4L, "spak"),   // deletion      -> d=1
      (5L, "spark"),  // equal         -> d=0
      (6L, "spunky"), // d=3 from spark
      (7L, "snark")   // substitution  -> d=1
    ).toDF("id", "s")
    val pairs = EditDistance.symspellPairs(rows, "id", "s")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "substitution missed")
    assert(pairs.contains((1L, 3L)), "insertion missed")
    assert(pairs.contains((1L, 4L)), "deletion missed")
    assert(pairs.contains((1L, 5L)), "exact duplicate missed")
    assert(pairs.contains((1L, 7L)), "substitution missed")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L), "distance-3 string must not pair")
    // spank vs spak: delete n -> d=1; spank vs sparks d=2 must be absent
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.contains((2L, 3L)))
    assert(pairs.forall(p => p._1 < p._2), "canonical id ordering")
  }

  test("symspellPairs agrees with brute-force levenshtein on a random corpus") {
    val rng = new scala.util.Random(7)
    val words = (1L to 60L).map { i =>
      val len = 3 + rng.nextInt(4)
      (i, (0 until len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
    }
    val df = words.toDF("id", "s")
    val got = EditDistance.symspellPairs(df, "id", "s")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = (for {
      (ia, sa) <- words; (ib, sb) <- words if ia < ib
      if levenshteinDist(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(got == brute)
  }

  test("trigramCosinePairs: identical strings score 1.0, disjoint score 0, blocking bounds pairs") {
    val df = Seq(
      (1L, "abcdefgh"), (2L, "abcdefgh"),   // same block, identical -> cos 1
      (3L, "abcdzzzz"),                     // same block as 1/2, partial overlap
      (4L, "qrstuvwx")                      // different block -> never paired
    ).toDF("id", "s")
    val got = graft.operators.EditDistance
      .trigramCosinePairs(df, "id", "s", expr("substring(s, 1, 4)"))
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"blocking violated: ${got.keySet}")
    // sqrt(n)·sqrt(n) may differ from n in the last ulp (both engines
    // identically), so identical strings score 1.0 ± 1 ulp
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-12)
    // "abcdzzzz" shares exactly abc,bcd with "abcdefgh"; its own grams
    // are abc,bcd,cdz,dzz,zzz,zzz (zzz twice -> n2 = 4+4·1 = 8), the
    // other side has 6 distinct grams: cos = 2 / (√6·√8)
    assert(math.abs(got((1L, 3L)) - 2.0 / (math.sqrt(6.0) * math.sqrt(8.0))) < 1e-12)
  }

  test("trigramCosinePairs: zero-overlap pair in one block scores 0, not dropped") {
    val df = Seq((1L, "aaaXbbbb"), (2L, "aaaXcccc")).toDF("id", "s")
    // block on full prefix 4 so they pair; suffix grams overlap only in
    // the first 2 grams (aaa, aaX? -> compute: strings share grams aaa,aaX,aXb vs aaX? )
    val got = graft.operators.EditDistance
      .trigramCosinePairs(df, "id", "s", expr("substring(s, 1, 4)"))
      .select("id_a", "id_b", "dot").as[(Long, Long, Long)].collect()
    assert(got.length == 1 && got.head._3 > 0L)
    val none = graft.operators.EditDistance
      .trigramCosinePairs(Seq((1L, "aaaaaa"), (2L, "aaabbb")).toDF("id", "s"),
        "id", "s", lit("k"))
      .select("dot").as[Long].collect()
    assert(none.length == 1, "same-block pair must appear even with low overlap")
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
