package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4 made the converters in
  * `org.apache.spark.sql.classic.ExpressionUtils` private[sql]; placing
  * this shim inside the sql package is the standard pattern for
  * libraries that define native Catalyst expressions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
