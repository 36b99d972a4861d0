package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension for the graftstore maintenance verbs — the commands
  * that have no ANSI SQL surface and so can't arrive as analyzable plans
  * the way DELETE/UPDATE/MERGE do (those are [[GraftDmlRule]]'s job):
  *
  *   - `OPTIMIZE t [CLUSTER BY (a[, b]) [INTO n BUCKETS]]`
  *   - `VACUUM t [RETAIN n HOURS]`
  *   - `DESCRIBE HISTORY t`  (also `DESC HISTORY t`)
  *   - `RESTORE [TABLE] t [TO] VERSION AS OF n`
  *
  * `t` is a catalog table (`CREATE TABLE ... USING graftstore`) or the
  * Delta-style path form `` graftstore.`/path/to/store` ``.
  *
  * Same architecture as Delta's public `DeltaSqlParser`: a delegating
  * [[ParserInterface]] that pattern-matches its own verbs and hands
  * EVERYTHING else — including every identifier/type/expression parse —
  * to Spark's parser, so no built-in syntax is shadowed (none of these
  * verbs are valid Spark SQL today; a non-matching OPTIMIZE/VACUUM text
  * falls through and fails with Spark's own error). Matching is
  * anchored, case-insensitive, whole-statement regex — the verb grammar
  * is three fixed shapes, not worth an ANTLR grammar. */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraftVerb(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  // A table reference: `graftstore.`...``, a backquoted ident, or plain
  // (possibly dotted) identifier text — resolved by GraftTableRef at run.
  private val Tbl = """(graftstore\s*\.\s*`[^`]+`|`[^`]+`|[\w.]+)"""

  private val DescribeHistory =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Tbl\\s*;?\\s*$$""".r
  private val DescribeDetail =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Tbl\\s*;?\\s*$$""".r
  private val Vacuum =
    s"""(?is)^\\s*VACUUM\\s+$Tbl(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?\\s*;?\\s*$$""".r
  private val Optimize =
    (s"""(?is)^\\s*OPTIMIZE\\s+$Tbl""" +
      """(?:\s+CLUSTER\s+BY\s*\(\s*([^)]+?)\s*\)""" +
      """(?:\s+INTO\s+(\d+)\s+BUCKETS)?)?\s*;?\s*$""").r
  private val Restore =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Tbl(?:\\s+TO)?\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$""".r
  private val RestoreTs =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Tbl(?:\\s+TO)?\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$""".r

  private[graft] def parseGraftVerb(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case DescribeHistory(t) => Some(GraftHistoryCommand(t))
      case DescribeDetail(t)  => Some(GraftDescribeDetailCommand(t))
      case Vacuum(t, hours) =>
        Some(GraftVacuumCommand(t, Option(hours).map(_.toLong)))
      case Optimize(t, cols, buckets) =>
        val clusterCols = Option(cols).toSeq.flatMap(_.split(","))
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        Some(GraftOptimizeCommand(t, clusterCols,
          Option(buckets).map(_.toInt)))
      case Restore(t, v)    => Some(GraftRestoreCommand(t, Right(v.toLong)))
      case RestoreTs(t, ts) => Some(GraftRestoreCommand(t, Left(ts)))
      case _ => None
    }
}
