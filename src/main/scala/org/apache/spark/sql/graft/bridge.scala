package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversions (the
  * unified Column of Spark 4 no longer exposes `.expr`/`new Column(e)`
  * publicly). Standard extension-library pattern: one file inside the
  * org.apache.spark.sql package tree, nothing else reaches in.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
