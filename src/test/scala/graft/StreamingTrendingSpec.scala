package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.HeavyHitters.mgHeavyHitters

/** The Misra–Gries aggregate on the STREAMING path: a trending-items
  * query is `groupBy(window).agg(mg_heavy_hitters(...))` in complete
  * mode — the binary MG buffer rides the state store across
  * micro-batches exactly like collect_list's, so the batch sketch and
  * the streaming sketch are one implementation. The no-false-negative
  * guarantee must survive arbitrary micro-batch slicing of the stream
  * (each batch is a partial-merge into state). */
class StreamingTrendingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("trending heavy hitters survive micro-batch slicing with bounded state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft_trend").toString

    // bucket 0: 'hot' 60× vs 40 distinct cold items; vocabulary (41) > m (8)
    val hot = Seq.fill(60)((0, "hot"))
    val cold = (1 to 40).map(i => (0, s"cold$i"))
    val all = (hot ++ cold).sortBy(_._2.hashCode)

    val q = mem.toDF().toDF("bucket", "item")
      .groupBy($"bucket")
      .agg(mgHeavyHitters($"item", 8).as("sk"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_trending")
      .option("checkpointLocation", s"$dir/cp")
      .start()
    try {
      // three uneven micro-batches: state-merge across batches is the point
      val (b1, rest) = all.splitAt(17)
      val (b2, b3) = rest.splitAt(49)
      Seq(b1, b2, b3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }

      val sk = spark.table("graft_trending")
        .select(explode($"sk").as("e")).select($"e.item", $"e.est")
        .as[(String, Long)].collect().toMap
      // n=100, m+1=9 → bound 11; freq(hot)=60 >> 11 must be retained
      assert(sk.contains("hot"), s"heavy item lost across micro-batches: $sk")
      assert(sk.size <= 8, "state exceeded m counters")
      assert(sk("hot") <= 60L && 60L - sk("hot") <= 100L / 9,
        s"estimate out of MG bounds: ${sk("hot")}")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_trending")
    }
  }
}
