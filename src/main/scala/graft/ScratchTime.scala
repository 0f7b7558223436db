package graft
import org.apache.spark.sql.SparkSession
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.ScaleDefaults(SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false"), shufflePartitions = "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    }
    run("q_topk") // warm-up
    for (name <- args.drop(1); i <- 1 to 2) {
      val t0 = System.nanoTime()
      run(name)
      println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
