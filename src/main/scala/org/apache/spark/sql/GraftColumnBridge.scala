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

  /** Eagerly-parsed expression tree of a Column. `expr("...")`-built
    * Columns convert to a LAZY [[classic.ColumnNodeExpression]] wrapping
    * the unparsed SQL text (parsing is deferred to analysis), so a tree
    * inspection or transform over the plain `expression` conversion sees
    * ONE opaque leaf instead of the attribute references inside. This
    * unwraps through the session converter so the real tree is visible;
    * Columns already carrying Catalyst expressions pass through
    * unchanged. */
  def parsedExpression(c: Column): Expression =
    classic.GraftClassicBridge.parseColumnNodes(expression(c))

  /** Build a DataFrame from a hand-constructed logical plan (custom
    * operator nodes — `Dataset.ofRows` is `private[sql]`). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The CatalogTable behind a session-catalog v2 `Table` wrapper, if it
    * is one (`connector.catalog.V1Table` is `private[sql]` — the shape
    * Spark's V2SessionCatalog serves v1 tables through, and the one the
    * analyzed `SHOW TBLPROPERTIES` plan carries). */
  def v1CatalogTable(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] = t match {
    case v1: org.apache.spark.sql.connector.catalog.V1Table => Some(v1.v1Table)
    case _ => None
  }
}

/** Bridge for input-type contracts: `ExpectsInputTypes.inputTypes` is typed
  * over the `private[sql]` AbstractDataType, so extension expressions
  * outside this package cannot override it directly. They declare plain
  * (public) [[types.DataType]]s here instead; the analyzer then inserts
  * implicit casts or rejects mistyped calls at analysis time
  * (ImplicitCastInputTypes), rather than mis-reading ArrayData at runtime. */
trait GraftImplicitCastInputTypes
  extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  /** The public-API half of the contract: one concrete DataType per child. */
  def declaredInputTypes: Seq[types.DataType]
  override def inputTypes: Seq[types.AbstractDataType] = declaredInputTypes
}
