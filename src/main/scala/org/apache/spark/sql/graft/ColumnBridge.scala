package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x moved `Column` into `sql-api` and made the Expression-backed
  * constructor `private[sql]`; this shim (living in a subpackage of
  * `org.apache.spark.sql`) re-exports the two conversions our custom
  * Catalyst expressions (e.g. [[graft.expr.NfcNormalize]]) need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
