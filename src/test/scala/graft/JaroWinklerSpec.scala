package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.JaroWinkler

/** JaroWinkler kernel vs hand-computed classics + the DuckDB-mirrored
  * edge semantics (empty ⇒ 0, boost only above 0.7), and the codegen
  * path (expression evaluates inside WholeStageCodegen). */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def s(x: String) = UTF8String.fromString(x)

  test("hand-computed classics") {
    // MARTHA/MARHTA: jaro 17/18, prefix 3 -> 0.9611...
    assert(math.abs(JaroWinkler.sim(s("MARTHA"), s("MARHTA")) - 0.9611111111111111) < 1e-15)
    // DIXON/DICKSONX: jaro 23/30, prefix 2 -> 0.8133...
    assert(math.abs(JaroWinkler.sim(s("DIXON"), s("DICKSONX")) - 0.8133333333333332) < 1e-15)
    assert(JaroWinkler.sim(s("ab"), s("ab")) == 1.0)
    assert(JaroWinkler.sim(s("x"), s("x")) == 1.0)
  }

  test("DuckDB-mirrored edges: empty strings score 0, window 0 kills swaps") {
    assert(JaroWinkler.sim(s(""), s("")) == 0.0)
    assert(JaroWinkler.sim(s("a"), s("")) == 0.0)
    // match window max(2,2)/2-1 = 0: 'ab' vs 'ba' has no in-window match
    assert(JaroWinkler.sim(s("ab"), s("ba")) == 0.0)
  }

  test("winkler boost applies only above jaro 0.7") {
    // common prefix 2 but jaro = 0.5: boost must NOT fire
    assert(JaroWinkler.sim(s("abcdefgh"), s("abzyxwvu")) == 0.5)
    // jaro 0.6 with prefix 2: still no boost
    assert(JaroWinkler.sim(s("aaaaa"), s("aabbb")) == 0.6)
    // jaro 17/24 > 0.7 with prefix 2: boost fires
    val v = JaroWinkler.sim(s("ab"), s("abcdefghijklmnop"))
    assert(math.abs(v - 0.7666666666666667) < 1e-15, s"boosted $v")
  }

  test("symmetric, and bounded in [0, 1]") {
    val cases = Seq(("crate", "trace"), ("abcd", "abdc"), ("kitten", "sitting"),
      ("prefix_same", "prefix_diff"), ("a", "b"))
    cases.foreach { case (x, y) =>
      val xy = JaroWinkler.sim(s(x), s(y))
      val yx = JaroWinkler.sim(s(y), s(x))
      assert(xy == yx, s"asymmetry on ($x, $y): $xy vs $yx")
      assert(xy >= 0.0 && xy <= 1.0, s"out of range on ($x, $y): $xy")
    }
  }

  test("column path evaluates under codegen and matches the kernel") {
    // repartition blocks ConvertToLocalRelation from folding the
    // projection on the driver — the expression must run in codegen.
    // AQE off for the assertion: it defers WholeStageCodegen wrapping
    // to stage creation, hiding it from the printed plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq(("MARTHA", "MARHTA"), ("small ring", "small king"), ("", "x"))
        .toDF("a", "b").repartition(1)
        .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      val got = df.as[Double].collect().toSeq.sorted.reverse
      assert(math.abs(got.head - 0.9611111111111111) < 1e-15)
      assert(got(2) == 0.0)
      // the `*(n)` prefix is the simple-mode rendering of a
      // WholeStageCodegen-wrapped operator
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project"), s"plan lost codegen:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
