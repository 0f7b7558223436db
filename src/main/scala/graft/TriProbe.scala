package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.ScaleDefaults(SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false"), shufflePartitions = "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.1", "documents")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sh = docs
      .withColumn("__tokens", graft.functions.TextAnalysis.tokens("text"))
      .select(col("doc_id"), graft.functions.TextAnalysis.shingles("__tokens", 3).as("sh"))
      .filter(size(col("sh")) > 0).persist()
    time("sh materialize")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("__g"))
      .select(col("doc_id"), md5(col("__g")).as("__gh"))
    val dfreq = ex.groupBy(col("__gh")).agg(count(lit(1)).as("__df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__df"), col("__gh"))
    val prefix = ex.join(dfreq, "__gh")
      .withColumn("__rn", row_number().over(wDoc))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("__rn") <= col("__n") - ceil(col("__n") * 0.5) + 1)
      .select(col("doc_id"), col("__gh")).persist()
    time("prefix materialize")(println("prefix rows: " + prefix.count()))
    val sharing = prefix.select(col("__gh"), col("doc_id").as("id_a"))
      .join(prefix.select(col("__gh"), col("doc_id").as("id_b")), "__gh")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().persist()
    time("sharing pairs")(println("cand rows: " + sharing.count()))
    val hashed = sh.select(col("doc_id"),
      expr("transform(sh, s -> xxhash64(s))").as("hs"), size(col("sh")).as("n"))
    val truth = sharing
      .join(hashed.select(col("doc_id").as("id_a"), col("hs").as("__sa"), col("n").as("__na")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("hs").as("__sb"), col("n").as("__nb")), "id_b")
      .withColumn("__ni", size(array_intersect(col("__sa"), col("__sb"))))
      .filter(col("__ni").cast("double") / (col("__na") + col("__nb") - col("__ni")) >= 0.5)
    time("truth verify")(println("truth rows: " + truth.count()))
    spark.stop()
  }
}
