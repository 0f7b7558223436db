package graft.streaming

/** ANSI `MERGE INTO` statement builder for table formats with row-level
  * operations (Delta, Iceberg v2 merge-on-read — the reference's write
  * path, rt_content_events_aggregator_sql.py:128-172 and
  * rt_video_cdc_upsert_sql.py:113-172). Delta and Iceberg share the same
  * MERGE syntax on Spark, so one builder serves both.
  *
  * Semantics mirror the parquet-swap emulation in [[ParquetUpsertSink]]:
  * latest-wins on the merge keys with a lexicographic `orderBy` tiebreak —
  * WHEN MATCHED updates only when the source row is strictly newer (the
  * CDC "stale row must lose" contract), WHEN NOT MATCHED inserts.
  */
object MergeInto {

  /** `(s.o1, s.o2, ...) > (t.o1, t.o2, ...)` expanded lexicographically —
    * MERGE match conditions must be plain boolean expressions. */
  private[graft] def strictlyNewer(orderBy: Seq[String]): String =
    orderBy.indices.map { i =>
      val eqs = orderBy.take(i).map(o => s"s.$o = t.$o")
      ((eqs :+ s"s.${orderBy(i)} > t.${orderBy(i)}")).mkString("(", " AND ", ")")
    }.mkString(" OR ")

  /** Build the statement. `sourceView` must be a registered temp view of
    * the (pre-deduped latest-per-key) micro-batch. */
  def mergeSql(targetTable: String, sourceView: String, keys: Seq[String],
               orderBy: Seq[String], columns: Seq[String]): String = {
    require(keys.nonEmpty && orderBy.nonEmpty && columns.nonEmpty)
    val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val nonKey = columns.filterNot(keys.contains)
    val insertCols = columns.mkString(", ")
    val insertVals = columns.map(c => s"s.$c").mkString(", ")
    // all-key table: a matched row has nothing to update — omit the
    // MATCHED clause entirely (an empty SET list is a syntax error)
    val matchedClause =
      if (nonKey.isEmpty) ""
      else {
        val setters = nonKey.map(c => s"t.$c = s.$c").mkString(", ")
        s"\nWHEN MATCHED AND (${strictlyNewer(orderBy)}) THEN UPDATE SET $setters"
      }
    s"""MERGE INTO $targetTable t
       |USING $sourceView s
       |ON $on$matchedClause
       |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
  }

  /** DDL for the initial target when it does not exist yet: CTAS from the
    * first batch keeps schema authority with the stream (the reference
    * creates Iceberg tables with hidden partition specs up front; a
    * library consumer can pre-create instead and this CTAS is skipped). */
  def createTableSql(targetTable: String, sourceView: String, format: String,
                     partitionBy: Seq[String] = Nil): String = {
    val part = if (partitionBy.isEmpty) "" else partitionBy.mkString("\nPARTITIONED BY (", ", ", ")")
    s"""CREATE TABLE $targetTable
       |USING $format$part
       |AS SELECT * FROM $sourceView""".stripMargin
  }
}
