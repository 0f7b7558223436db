package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantize

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toF(xs: Seq[Double]): Seq[Float] = xs.map(_.toFloat)

  test("codes span 0..255, extremes map to the grid ends, bound holds") {
    val embs = Seq(
      (1L, toF(Seq(0.0, -1.0, 5.0))),
      (2L, toF(Seq(1.0, 1.0, 5.0))),   // dim 3 is degenerate (constant)
      (3L, toF(Seq(0.5, 0.0, 5.0)))).toDF("vec_id", "embedding")
    val q = Quantize.scalarQuantize(embs, "vec_id", "embedding")
      .select("vec_id", "codes", "within_bound")
      .as[(Long, Seq[Long], Boolean)].collect().sortBy(_._1).toSeq
    assert(q.forall(_._3), "scale/2 reconstruction bound must hold everywhere")
    val m = q.map(r => r._1 -> r._2).toMap
    assert(m(1L)(0) == 0L && m(2L)(0) == 255L, "min/max coords hit grid ends")
    assert(m(3L)(0) == 128L, "midpoint rounds to 128 (floor(127.5+0.5))")
    assert(m(1L)(1) == 0L && m(2L)(1) == 255L && m(3L)(1) == 128L)
    assert(q.map(_._2(2)).toSet == Set(0L), "degenerate dim codes to 0")
  }

  test("reconstruction error is within scale/2 on a random corpus, codes deterministic") {
    val rng = new scala.util.Random(11)
    val embs = (1L to 200L).map(i => (i, toF(Seq.fill(16)(rng.nextGaussian())))).toDF("vec_id", "embedding")
    val q = Quantize.scalarQuantize(embs, "vec_id", "embedding").cache()
    assert(q.filter(!$"within_bound").count() == 0)
    val c1 = q.select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
    assert(c1.values.forall(_.forall(c => c >= 0 && c <= 255)))
    val c2 = Quantize.scalarQuantize(embs, "vec_id", "embedding")
      .select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
    assert(c1 == c2, "quantization must be deterministic")
    q.unpersist()
  }
}
