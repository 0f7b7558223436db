package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Contracts

class ContractsSpec extends AnyFunSuite {

  test("matching schema passes the drift gate") {
    assert(Contracts.GoldStats1Min.enforce(Contracts.GoldStats1Min.schema).isRight)
  }

  test("missing column fails with an additive ALTER fix list") {
    val live = StructType(Contracts.GoldStats1Min.schema.fields.dropRight(1))
    Contracts.GoldStats1Min.enforce(live) match {
      case Left(fixes) =>
        assert(fixes == Seq("ALTER TABLE gold_stats_1min ADD COLUMNS (processed_at TIMESTAMP)"))
      case Right(_) => fail("expected drift failure")
    }
  }

  test("extra live columns are tolerated (additive-first evolution)") {
    val live = StructType(Contracts.DimVideos.schema.fields :+ StructField("extra", StringType))
    assert(Contracts.DimVideos.enforce(live).isRight)
  }

  test("ddl renders schema + partition spec (transforms only on table formats)") {
    val ddl = Contracts.BronzeEvents.ddl()
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS bronze_events"))
    assert(ddl.contains("USING iceberg"))
    assert(ddl.contains("PARTITIONED BY (hours(ts))"))
    assert(ddl.contains("event_id STRING"))
    // the V1 parquet catalog rejects transform partitioning — the DDL
    // must not emit a statement that can't execute on that format
    val pq = Contracts.BronzeEvents.ddl("parquet")
    assert(pq.contains("USING parquet") && !pq.contains("hours("))
  }

  test("type drift is refused, not waved through by a name-only check") {
    val live = StructType(Contracts.GoldStats1Min.schema.fields.map(f =>
      if (f.name == "views") StructField("views", StringType) else f))
    Contracts.GoldStats1Min.enforce(live) match {
      case Left(fixes) =>
        assert(fixes.exists(_.contains("REFUSE gold_stats_1min.views")))
        assert(fixes.exists(_.contains("STRING incompatible with contract BIGINT")))
      case Right(_) => fail("expected type-drift refusal")
    }
  }

  test("streaming pipeline output matches the gold contract") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val raw = Seq("""{"event_id":"e1","event_timestamp":"2024-01-01T00:00:05Z","user_id":"u1","event_type":"view","schema_version":"v1","payload_json":"{\"watch_time_ms\":1}"}""")
      .toDF("raw_value")
      .withColumn("source_topic", lit("t")).withColumn("source_partition", lit(0))
      .withColumn("source_offset", lit(0L))
    val gold = graft.streaming.EventPipeline.goldAggregate(
      graft.streaming.EventPipeline.annotate(graft.streaming.EventPipeline.parse(raw)))
    assert(Contracts.GoldStats1Min.enforce(gold.schema).isRight)
    val bronze = graft.streaming.EventPipeline.bronze(
      graft.streaming.EventPipeline.annotate(graft.streaming.EventPipeline.parse(raw)))
    assert(Contracts.BronzeEvents.enforce(bronze.schema).isRight)
  }
}
