package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` members needed when defining native Catalyst
  * expressions outside Spark's own tree (the standard pattern used by
  * third-party expression libraries): Column <-> Expression conversion in
  * Spark 4's classic API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
