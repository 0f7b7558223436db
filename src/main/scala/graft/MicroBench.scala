package graft

import org.apache.spark.sql.SparkSession

/** Per-query micro-adjudicator — the 3-pass protocol that settled the
  * r4 q_simhash_pairs and r6 q_blocking_eval perf disputes: run the
  * named queries IN ORDER in one session (cold first occurrence, warm
  * repeats — repeats expose how much of a query's cost is shared-leaf
  * build vs its own irreducible work). Defaults to the sf0.1 bench
  * scale. Usage:
  *   sbt "runMain graft.MicroBench q_blocking_eval q_blocking_eval q_lsh_pairs"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.ScaleDefaults(SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false"), shufflePartitions = "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_topk")
    def t(name: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"MICRO $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    t("q_topk") // untimed-purpose warmup (still printed)
    names.foreach(t)
  }
}
