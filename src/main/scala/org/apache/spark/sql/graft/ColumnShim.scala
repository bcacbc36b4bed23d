package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst [[Expression]] to a public [[Column]].
  *
  * Spark 4 moved `Column(expr)` behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils.column`); the sanctioned
  * escape hatch for extension libraries shipping native expressions is a
  * one-line shim inside the `org.apache.spark.sql` package scope. This is
  * the only file in the repo outside the `graft` namespace, and it
  * contains no logic — just the visibility bridge.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
