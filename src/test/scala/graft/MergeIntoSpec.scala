package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.JobSettings
import graft.streaming.{MergeInto, ParquetUpsertSink}

class MergeIntoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("strictlyNewer expands a lexicographic tuple comparison") {
    assert(MergeInto.strictlyNewer(Seq("ts")) == "(s.ts > t.ts)")
    assert(MergeInto.strictlyNewer(Seq("ts", "off")) ==
      "(s.ts > t.ts) OR (s.ts = t.ts AND s.off > t.off)")
  }

  test("mergeSql: keyed upsert with stale-loses MATCHED guard") {
    val sql = MergeInto.mergeSql("delta.`/tmp/t`", "src", Seq("video_id", "window_start"),
      Seq("updated_at"), Seq("video_id", "window_start", "views", "updated_at"))
    assert(sql.contains("MERGE INTO delta.`/tmp/t` t"))
    assert(sql.contains("USING src s"))
    assert(sql.contains("ON t.video_id = s.video_id AND t.window_start = s.window_start"))
    assert(sql.contains("WHEN MATCHED AND ((s.updated_at > t.updated_at)) THEN UPDATE SET t.views = s.views, t.updated_at = s.updated_at"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (video_id, window_start, views, updated_at) VALUES (s.video_id, s.window_start, s.views, s.updated_at)"))
    // merge keys must not appear in the UPDATE SET list
    assert(!sql.contains("t.video_id = s.video_id,") && !sql.contains("SET t.video_id"))
  }

  test("mergeSql: all-key table omits the MATCHED clause (empty SET is a syntax error)") {
    val sql = MergeInto.mergeSql("t", "s", Seq("k1", "k2"), Seq("k1"), Seq("k1", "k2"))
    assert(!sql.contains("WHEN MATCHED"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (k1, k2) VALUES (s.k1, s.k2)"))
  }

  test("createTableSql: CTAS with optional partitioning") {
    val sql = MergeInto.createTableSql("cat.db.t", "src", "iceberg", Seq("days(ts)"))
    assert(sql == "CREATE TABLE cat.db.t\nUSING iceberg\nPARTITIONED BY (days(ts))\nAS SELECT * FROM src")
  }

  test("sink auto-detects parquet here (no format jars) and honors a pin") {
    assert(JobSettings.detectTableFormat(spark) == "parquet")
    val auto = new ParquetUpsertSink(spark, "/tmp/graft-mi-none", Seq("k"), Seq("ts"))
    assert(auto.tableFormat == "parquet")
    val pinned = new ParquetUpsertSink(spark, "/tmp/graft-mi-none", Seq("k"), Seq("ts"), Some("delta"))
    assert(pinned.tableFormat == "delta")
  }
}
