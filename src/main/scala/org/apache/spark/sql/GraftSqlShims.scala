package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression plumbing, the standard
  * pattern for libraries that ship custom Catalyst expressions (Spark 4
  * moved Column construction behind ColumnNode).
  */
object GraftSqlShims {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
