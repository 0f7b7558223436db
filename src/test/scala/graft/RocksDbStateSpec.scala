package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventPipeline

/** The default (HDFS-backed) state store holds all streaming state in
  * executor heap — at 100 TB-scale key cardinality that OOMs; the
  * production setting is the RocksDB provider (state spills to local
  * disk, changelog-checkpointed). This spec proves the gold aggregation
  * pipeline runs UNCHANGED on RocksDB and produces identical results —
  * the provider is a config swap, not a code path. */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def json(id: String, ts: String, user: String = "u1", typ: String = "view"): String =
    s"""{"event_id":"$id","event_timestamp":"$ts","user_id":"$user","event_type":"$typ","schema_version":"v1","payload_json":"{\\"watch_time_ms\\":100}"}"""

  private def runGold(providerConf: Option[String]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    providerConf.foreach(spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    try {
      val events = MemoryStream[String]
      val raw = events.toDF()
        .select(col("value").as("raw_value"))
        .withColumn("source_topic", lit("t"))
        .withColumn("source_partition", lit(0))
        .withColumn("source_offset", xxhash64(col("raw_value")))
      val dir = Files.createTempDirectory("graft_rocks").toString
      val q = EventPipeline.goldAggregate(
          EventPipeline.annotate(EventPipeline.parse(raw)), watermark = "10 minutes")
        .writeStream.format("memory").queryName(s"rocks_gold_${providerConf.isDefined}")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("complete").start()
      events.addData(
        json("r1", "2024-01-01T00:00:05Z"),
        json("r1", "2024-01-01T00:00:05Z"), // dup: stateful dedup must drop
        json("r2", "2024-01-01T00:00:30Z", typ = "click"),
        json("r3", "2024-01-01T00:01:10Z"))
      q.processAllAvailable()
      q.stop()
      spark.table(s"rocks_gold_${providerConf.isDefined}")
        .select(col("user_id"), col("views"), col("clicks"))
        .as[(String, Long, Long)].collect().sorted.toSeq
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("gold aggregate on RocksDB state store ≡ default provider") {
    val rocks = runGold(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val default = runGold(None)
    assert(rocks.nonEmpty && rocks == default,
      s"provider swap changed results: rocks=$rocks default=$default")
  }
}
