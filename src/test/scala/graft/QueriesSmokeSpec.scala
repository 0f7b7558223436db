package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs and returns rows on sf0.001 (the DuckDB
  * hash comparison is driver-side; this catches runtime regressions). */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      // anti-join legitimately returns 0 rows on some SFs; just force execution
      df.count()
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
