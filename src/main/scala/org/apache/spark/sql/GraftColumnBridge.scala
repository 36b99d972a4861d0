package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 made `Column`
  * wrap a ColumnNode rather than a Catalyst Expression, so extension
  * libraries that define native expressions need this one seam. Lives in
  * the `org.apache.spark.sql` package solely to satisfy the `private[sql]`
  * access qualifier — the standard pattern for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
