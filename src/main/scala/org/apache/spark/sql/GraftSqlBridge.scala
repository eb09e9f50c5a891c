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

  /** EAGER Column -> Expression conversion: walks the ColumnNode tree into
    * catalyst expressions (Unresolved* nodes the analyzer then resolves
    * normally). `expression` above wraps lazily in a ColumnNodeExpression,
    * which only specific Dataset-API analyzer paths unwrap — an expression
    * embedded in a FunctionRegistry builder must convert eagerly or the
    * wrapper survives to codegen and fails.
    */
  def resolvableExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
