package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's Column wraps a ColumnNode
  * (Connect refactor) and the converters are `private[sql]`, so
  * extension libraries expose them from inside the sql namespace —
  * the established pattern for custom-Expression packages.
  */
object Bridge {
  def column(e: Expression): Column    = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
