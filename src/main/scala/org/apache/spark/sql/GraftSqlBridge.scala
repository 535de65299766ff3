package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column ⇄ Catalyst-Expression converters, which are
  * `private[sql]` in Spark 4 (the Column API is connect-agnostic; classic
  * Catalyst interop lives behind org.apache.spark.sql.classic). Placing
  * this one-file shim inside the sql package is the standard technique
  * Spark extension libraries use to expose custom native expressions as
  * user-facing Columns.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
