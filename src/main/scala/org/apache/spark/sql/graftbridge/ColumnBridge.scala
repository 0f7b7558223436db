package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column↔Expression
  * constructors `private[sql]` (Column is Connect-agnostic now); custom
  * Catalyst expressions still need both directions, so this one-file
  * shim lives in the org.apache.spark.sql namespace — the standard
  * extension-library practice (same technique as spark-daria etc.).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
