package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[classic]` column-node machinery (the sibling of
  * [[org.apache.spark.sql.GraftColumnBridge]], one package deeper for
  * the one type that needs it): `expr("...")`-built Columns convert to
  * a LAZY [[ColumnNodeExpression]] wrapping unparsed SQL text, which an
  * extension library cannot even name from outside this package. */
object GraftClassicBridge {
  /** Replace every lazy column-node leaf with its eagerly-converted
    * (parsed) Catalyst tree; expressions without such leaves pass
    * through unchanged. */
  def parseColumnNodes(e: Expression): Expression = e.transformUp {
    case cne: ColumnNodeExpression =>
      ColumnNodeToExpressionConverter(cne.node)
  }
}
