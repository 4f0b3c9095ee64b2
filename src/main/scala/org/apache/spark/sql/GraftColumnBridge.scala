package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge for graft's custom expressions.
  *
  * Spark 4 moved the classic `Column(expr)` constructor behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala); the established third-party-library pattern is
  * a one-file shim inside the `org.apache.spark.sql` package exposing
  * exactly the two conversions a custom `Expression` needs. Nothing else
  * from the private API surface is re-exported.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
