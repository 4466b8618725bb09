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

  /** Re-bind `df`'s (analyzed) plan to `spark`, so the query PLANS AND
    * EXECUTES under that session's SQL conf. Lets an operator hand back
    * a plan that runs with a scoped conf posture (e.g. a raised
    * ObjectHashAggregate fallback threshold) without mutating the
    * caller's session. The analyzed plan re-analyzes idempotently; the
    * shared CacheManager still substitutes persisted relations. */
  def rebind(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)
}
