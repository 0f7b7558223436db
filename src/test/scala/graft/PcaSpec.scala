package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.Pca

/** Power-iteration PCA invariants. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private lazy val embs = Tables(spark, "/root/testdata/sf0.01", "embeddings")

  test("powerIteration: unit loading, eigenvalue/variance accounting") {
    val r = Pca.powerIteration(embs, "vec_id", "embedding", iters = 2)
      .select("pos", "loading", "eigenvalue", "var_frac")
      .as[(Int, Double, Double, Double)].collect()
    assert(r.length == 64)
    // unit up to the 1e-12 fixed-point quantum × 64 dims
    val norm = r.map(x => x._2 * x._2).sum
    assert(math.abs(norm - 1.0) < 1e-7, s"loading norm $norm != 1")
    val (lam, vf) = (r.head._3, r.head._4)
    assert(r.forall(x => x._3 == lam && x._4 == vf), "constants repeated per row")
    assert(lam > 0 && vf > 0 && vf <= 1.0)
    // 64 dims: the top component of a real corpus beats the uniform share
    assert(vf > 1.0 / 64)
  }

  test("powerIteration: Rayleigh estimate is non-decreasing in rounds") {
    def lam(iters: Int): Double =
      Pca.powerIteration(embs, "vec_id", "embedding", iters)
        .select("eigenvalue").as[Double].head()
    val l1 = lam(1); val l3 = lam(3)
    assert(l3 >= l1 - 1e-9, s"iters=3 estimate $l3 below iters=1 $l1")
  }

  test("powerIteration: recovers a planted dominant axis") {
    // dim 0 carries ±10, the rest tiny deterministic noise
    val planted = spark.range(200).select(col("id"),
      expr("""transform(sequence(0, 7), j -> CASE WHEN j = 0
              | THEN CASE WHEN id % 2 = 0 THEN 10.0 ELSE -10.0 END
              | ELSE CAST((id * 7 + j * 3) % 5 AS DOUBLE) / 10 END)""".stripMargin)
        .as("vec"))
    val r = Pca.powerIteration(planted, "id", "vec", iters = 3)
      .select("pos", "loading", "var_frac").as[(Int, Double, Double)].collect()
    val byPos = r.map(x => x._1 -> x._2).toMap
    assert(math.abs(byPos(0)) > 0.99, s"dim-0 loading ${byPos(0)} should dominate")
    assert(r.head._3 > 0.95, "planted axis should own nearly all variance")
    // deterministic sign: all-positive start keeps the dominant sign positive
    assert(byPos(0) > 0)
  }
}
