package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: Spark 4 removed the public
  * Column(Expression) constructor (Connect refactor); extensions that add
  * native expressions need this one hop. Lives under org.apache.spark.sql
  * for package-private access — the conventional pattern for third-party
  * Catalyst expression libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
