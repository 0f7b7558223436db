package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Layout, Tables}

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact: small files collapse to the target count, rows byte-identical, no leftovers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    df.repartition(40).write.parquet(dir)
    val before = df.orderBy("event_id").collect().toSeq

    val stats = Layout.compact(spark, dir, targetBytes = 512L * 1024)
    assert(stats.filesBefore == 40)
    assert(stats.filesAfter < stats.filesBefore,
      s"expected compaction, got ${stats.filesAfter} files from ${stats.filesBefore}")
    val after = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(after == before, "compaction must preserve every row exactly")
    // swap hygiene: no tmp/old residue
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact.tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact.old")))
  }

  test("compact: already-compact directory no-ops; missing directory no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact3").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1).write.parquet(dir)
    val s1 = Layout.compact(spark, dir, targetBytes = 128L * 1024 * 1024)
    assert(s1.filesBefore == 1 && s1.filesAfter == 1, "steady-state maintenance must no-op")
    // file set untouched by the no-op (no rewrite happened)
    val s2 = Layout.compact(spark, dir + "_never_written")
    assert(s2 == Layout.CompactionStats(0, 0, 0L), "missing dir must no-op, not throw")
  }

  test("compact: recovers a parked snapshot from a simulated crash between renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(4).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate: swap step 1 done (dest renamed away), step 2 never ran
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".compact.old")))
    val stats = Layout.compact(spark, dir, targetBytes = 1L * 1024 * 1024)
    assert(stats.filesAfter >= 1)
    assert(spark.read.parquet(dir).count() == 2L, "recovered snapshot must be compacted intact")
  }

  test("recoverParked restores the NEWEST parked snapshot by mtime, not name order") {
    // double-crash shape: __old_9 and __old_10 coexist; lexicographic
    // name order picks __old_9 (the stale batch) — mtime must win
    val base = java.nio.file.Files.createTempDirectory("graft_park").toString
    val dest = new org.apache.hadoop.fs.Path(base + "/t")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((9L, "stale")).toDF("id", "v").write.parquet(base + "/t__old_9")
    Thread.sleep(1100) // parquet dir mtime granularity is 1 s on some filesystems
    Seq((10L, "fresh")).toDF("id", "v").write.parquet(base + "/t__old_10")
    graft.core.AtomicSwap.recoverParked(fs, dest, "__old_")
    val got = spark.read.parquet(base + "/t").as[(Long, String)].collect().toSeq
    assert(got == Seq((10L, "fresh")), s"recovered the wrong snapshot: $got")
  }

  test("recoverParked equal-mtime tie-break: numeric batch id wins, not name order") {
    // 1-second-granularity filesystems make adjacent micro-batch parks
    // share an mtime; '__old_9' > '__old_10' lexicographically, so the
    // tie-break must parse the numeric suffix
    val base = java.nio.file.Files.createTempDirectory("graft_park2").toString
    val dest = new org.apache.hadoop.fs.Path(base + "/t")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((9L, "stale")).toDF("id", "v").write.parquet(base + "/t__old_9")
    Seq((10L, "fresh")).toDF("id", "v").write.parquet(base + "/t__old_10")
    val now = System.currentTimeMillis()
    fs.setTimes(new org.apache.hadoop.fs.Path(base + "/t__old_9"), now, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(base + "/t__old_10"), now, -1)
    graft.core.AtomicSwap.recoverParked(fs, dest, "__old_")
    val got = spark.read.parquet(base + "/t").as[(Long, String)].collect().toSeq
    assert(got == Seq((10L, "fresh")), s"recovered the wrong snapshot: $got")
  }

  test("asofJoin / proximityJoin fail fast on reserved internal column names") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "__payload")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.AsofJoin.asofJoin(l, r, "k", "t", "t", Seq("v"))
    }
    assert(e1.getMessage.contains("__payload"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.proximityJoin(
        Seq((1L, 10L, 0L)).toDF("k", "s", "__bin"), r.toDF("k", "s", "v"), "k", "s", "s", 5L)
    }
    assert(e2.getMessage.contains("__bin"))
  }

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

  test("dynamic partition pruning: a filtered dim prunes fact date partitions at runtime") {
    // the 100 TB read-path contract for writeDatePartitioned: a fact
    // joined to a dim filtered on a NON-key column has no static date
    // predicate to push down — only Catalyst's dynamic partition
    // pruning (broadcast the filtered dim's join keys as a runtime IN
    // filter on the partition column) keeps the scan from reading every
    // date. Pin that the DPP filter actually lands on the fact scan.
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    Layout.writeDatePartitioned(e, "ts", s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // the dim must be a STORAGE relation: for an in-memory Seq dim,
    // ConvertToLocalRelation folds the filter into the LocalRelation
    // before the PartitionPruning rule looks for a selective predicate,
    // and DPP silently never fires (pinned by this test's history)
    Seq(
      (java.sql.Date.valueOf("2024-01-01"), "keep"),
      (java.sql.Date.valueOf("2030-01-01"), "drop")).toDF("d", "tag")
      .write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val q = fact.join(dim.filter($"tag" === "keep"), fact("__date") === $"d")
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning PartitionFilter on the fact scan; plan:\n${plan.take(2000)}")
    val expected = fact.filter($"__date" === "2024-01-01").count()
    assert(expected > 0, "fixture date must exist in events")
    assert(q.count() == expected, "DPP must not change the join result")
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

  test("zValue matches the reference interleave and is monotone per dimension") {
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L), (7L, 42L))
    val got = pairs.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z")).as[Long].collect().toSeq
    assert(got == pairs.map { case (a, b) => ref(a, b) })
    // doubling-range property: z of (a,b) fits in 2·bits bits
    assert(got.forall(z => z >= 0 && z < (1L << 32)))
  }

  test("clusterByZ: min/max stats skip files on BOTH dimensions; linear sort only on its own") {
    // uniform 64×64 grid — the adversarial case for single-column sort:
    // every a-stripe file spans the full b domain, so a predicate on b
    // can never skip a file. Z-order files are compact squares.
    val n = 4096
    val grid = (0 until n).map(i => (i.toLong % 64, i.toLong / 64)).toDF("a", "b")
    // files whose [min,max] range intersects the predicate band — what
    // parquet footer stats give a reader
    def touched(df: org.apache.spark.sql.DataFrame, dim: String, lo: Long, hi: Long): Long = {
      import org.apache.spark.sql.functions.spark_partition_id
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
        .filter($"mx" >= lo && $"mn" <= hi).count()
    }
    val z = Layout.clusterByZ(grid, "a", "b", files = 16, bits = 6).cache()
    val lin = grid.repartitionByRange(16, $"a").sortWithinPartitions($"a").cache()
    val (zb, linb) = (touched(z, "b", 10, 13), touched(lin, "b", 10, 13))
    val (za, lina) = (touched(z, "a", 10, 13), touched(lin, "a", 10, 13))
    assert(linb == 16, s"linear-by-a must touch every file for a b-band, got $linb")
    assert(zb <= linb / 2, s"z-order should skip most files on b: z=$zb linear=$linb")
    assert(za < 16, s"z-order must still skip on a, got $za")
    assert(lina <= 2, "sanity: linear sort skips on its own column")
    z.unpersist(); lin.unpersist()
  }
}
