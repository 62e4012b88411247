package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column construction go through ColumnNode; the classic
  * bridge (ExpressionUtils) that converts between catalyst Expressions
  * and Columns is private[sql], so this shim lives under the
  * org.apache.spark.sql package to re-expose it for the library's
  * native expressions. Isolated here so a Spark-internals API shift
  * only touches one file.
  */
object ColumnBridge {
  def apply(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
