package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Layout, Tables}

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registerAll exposes every testdata table to spark.sql") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT (SELECT count(*) FROM lineitem) + (SELECT count(*) FROM documents) AS n")
      .as[Long].head()
    assert(n == 6500L)
  }

  test("date-partitioned write produces __date partition dirs and prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    Layout.writeDatePartitioned(e, "ts", s"$dir/events", sortCols = Seq("user_id"))
    val dirs = new java.io.File(s"$dir/events").listFiles().map(_.getName).filter(_.startsWith("__date="))
    assert(dirs.length > 1, s"expected multiple date partitions, got ${dirs.toSeq}")
    val read = spark.read.parquet(s"$dir/events").filter(col("__date") === "2024-01-01")
    val plan = read.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), "partition pruning filter missing from scan")
    assert(read.count() > 0)
  }

  test("bucketed catalog table joins without a shuffle") {
    // a fresh JVM's in-memory catalog forgets the table but the managed
    // LOCATION survives on disk — drop both or CTAS fails with
    // LOCATION_ALREADY_EXISTS
    Seq("g_bucket_a", "g_bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val e = Tables(spark, "/root/testdata/sf0.001", "events").select("event_id", "user_id", "value")
    Layout.writeBucketed(e, "g_bucket_a", "user_id", buckets = 4)
    Layout.writeBucketed(e, "g_bucket_b", "user_id", buckets = 4)
    assert(Layout.isShuffleFreeJoin(spark, "g_bucket_a", "g_bucket_b", "user_id"),
      "co-bucketed join should not shuffle")
  }
}
