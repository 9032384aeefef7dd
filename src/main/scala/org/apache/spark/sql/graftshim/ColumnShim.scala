package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  * Spark 4 hid the Column(expr) constructor behind `private[sql]`
  * (`classic.ExpressionUtils`); extensions that ship custom expressions
  * need this one-file shim inside the sql package namespace — the standard
  * pattern for Catalyst extension libraries. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
