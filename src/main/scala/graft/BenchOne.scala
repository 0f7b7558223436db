package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query benchmark — the adjudication tool behind the
  * per-query bench ceiling gate: `runMain graft.BenchOne q_a q_b ...`
  * times each named query with the exact protocol of [[Bench]] (noop
  * full-result write, cache cleared between queries, untimed q_topk
  * warm-up) and prints one `name,sec` line per query per pass.
  *
  * Args: query names; `--passes N` (default 3) repeats the whole list
  * N times so a transient spike is distinguishable from a plan
  * regression (the 3-pass protocol that settled q_simhash_pairs in
  * round 4 and q_containment in round 6).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val passes = args.sliding(2).collectFirst {
      case Array("--passes", n) => n.toInt }.getOrElse(3)
    val names = args.filter(a => !a.startsWith("--") && !a.forall(_.isDigit))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.ScaleDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    try run(SparkEntry.queries("q_topk")) catch { case _: Throwable => () }
    spark.sharedState.cacheManager.clearCache()

    for (p <- 1 to passes; name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (known: ${SparkEntry.queries.keys.toSeq.sorted.take(5).mkString(", ")}...)"))
      val t0 = System.nanoTime()
      try run(fn) catch { case e: Throwable =>
        System.err.println(s"[benchone] $name FAILED: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] pass=$p $name%s ${dt}%.2f")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
