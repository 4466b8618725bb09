package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-private Column↔Expression converters (Spark 4.x moved
  * the classic Column constructor behind the Spark-Connect column-node API).
  * Lives under org.apache.spark.sql so private[sql] members resolve.
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
