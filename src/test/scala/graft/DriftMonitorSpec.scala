package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftMonitor

/** Streaming token-drift monitor: per-batch JSD ledger semantics. */
class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val baselineTexts = Seq(
    "the cat sat on the mat", "the dog sat on the log",
    "the cat and the dog", "a cat a dog a mat a log")

  test("per-batch ledger: in-distribution batch scores below a drifted batch") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = baselineTexts.toDF("text")
    val stream = MemoryStream[String]
    val docs = stream.toDF().select(col("value").as("text"))
    val out = java.nio.file.Files.createTempDirectory("drift_out").toString
    val ck = java.nio.file.Files.createTempDirectory("drift_ck").toString
    val q = DriftMonitor.start(docs, baseline, "text", out, ck,
      trigger = Trigger.ProcessingTime(0))
    try {
      // batch 0: same distribution as the baseline
      stream.addData(baselineTexts: _*)
      q.processAllAvailable()
      // batch 1: drifted — vocabulary the baseline has never seen
      stream.addData("zx qq ww zx qq", "ww zx qq zx zx")
      q.processAllAvailable()
    } finally q.stop()
    val ledger = spark.read.option("recursiveFileLookup", "true").parquet(out)
      .select("batch_id", "jsd", "kl_ab", "vocab_b")
      .as[(Long, Double, Double, Long)].collect().map(x => x._1 -> x).toMap
    assert(ledger.keySet == Set(0L, 1L), s"one ledger row per batch: ${ledger.keySet}")
    assert(ledger(0L)._2 >= 0 && ledger(1L)._2 >= 0)
    assert(ledger(1L)._2 > ledger(0L)._2,
      s"drifted batch must score higher: ${ledger(1L)._2} vs ${ledger(0L)._2}")
    // the identical-distribution batch is exactly zero divergence
    assert(ledger(0L)._2 == 0.0 && ledger(0L)._3 == 0.0)
    assert(ledger(1L)._4 == 3, "drifted batch carries its own 3-term vocab")
  }
}
