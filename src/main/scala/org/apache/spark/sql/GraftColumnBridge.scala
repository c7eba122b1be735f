package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's package-private Column ↔ Expression conversions
  * (classic.ExpressionUtils) for registering custom Catalyst expressions
  * without a function-registry round-trip. Standard extension-point
  * pattern: lives in the spark.sql package on purpose. */
object GraftColumnBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
