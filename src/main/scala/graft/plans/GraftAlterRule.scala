package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{
  FieldName, RelationTimeTravel, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{
  DropColumns, LogicalPlan, RenameColumn, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

import graft.sinks.VersionedStore

/** SQL schema evolution + time travel for graftstore tables:
  *
  *   ALTER TABLE t RENAME COLUMN a TO b   → [[VersionedStore.renameColumn]]
  *   ALTER TABLE t DROP COLUMN c          → [[VersionedStore.dropColumn]]
  *   SELECT ... FROM t VERSION AS OF n    → the pinned-version relation
  *
  * The ALTERs are metadata-only commits under column mapping (no dir
  * rewritten; the drop retires the physical name); time travel reads
  * the same immutable snapshot `versionAsOf` serves on the DataFrame
  * path.
  *
  * Unlike the DML rule this must run in the HINT-RESOLUTION batch,
  * matching the still-UNRESOLVED table: Spark's own
  * `ResolveSessionCatalog` throws "RENAME/DROP COLUMN is only supported
  * with v2 tables" the moment the v1 table reference resolves — and
  * built-in rules run before extension rules within each Resolution
  * iteration, so even a main-batch injection is too late. The hint
  * batch precedes Resolution entirely; the rule resolves the
  * identifier through the session catalog ITSELF, and rewrites only
  * when the provider really is graftstore; any other table (or an
  * unresolvable name) passes through untouched and gets Spark's own
  * semantics and errors. The same interception point Delta's analysis
  * rules use for their v1-command surface. */
final class GraftAlterRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The catalog entry IFF `nameParts` names a graftstore table. */
  private def graftTable(nameParts: Seq[String]): Option[CatalogTable] = {
    val ident = nameParts match {
      case Seq(t)     => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      // fully-qualified session-catalog form; any OTHER catalog is not
      // ours to claim
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _          => return None
    }
    try {
      val ct = spark.sessionState.catalog.getTableMetadata(ident)
      if (ct.provider.exists(_.equalsIgnoreCase("graftstore"))) Some(ct)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def rootOf(ct: CatalogTable): String =
    ct.storage.properties.getOrElse("path",
      ct.storage.locationUri.map(u => new org.apache.hadoop.fs.Path(u).toString)
        .getOrElse(throw new IllegalArgumentException(
          s"${ct.identifier} records no path")))

  /** The TIMESTAMP AS OF clause value as the option-channel string. The
    * rule runs in the hint batch (pre-resolution), so only LITERAL
    * shapes are evaluable here: a string literal passes through verbatim
    * (parsed by the option channel in the session zone), a typed
    * `TIMESTAMP '...'` / `DATE '...'` literal converts exactly. Anything
    * needing resolution (expressions, functions) is rejected loudly
    * with the accepted forms named. */
  private def literalTravelTimestamp(
      e: org.apache.spark.sql.catalyst.expressions.Expression): String = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.{DateType, StringType, TimestampType,
      TimestampNTZType}
    e match {
      case Literal(v, StringType) if v != null => v.toString
      case l @ Literal(_, TimestampType | TimestampNTZType | DateType) =>
        // render through Spark's own cast-to-string (session-zoned), the
        // same serialization parseTravelTimestamp accepts
        String.valueOf(Cast(l, StringType,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
          .eval(org.apache.spark.sql.catalyst.InternalRow.empty))
      case other => throw new IllegalArgumentException(
        s"graftstore TIMESTAMP AS OF takes a literal (string, TIMESTAMP or " +
          s"DATE), got: $other")
    }
  }

  private def topLevel(f: FieldName, what: String): String = {
    require(f.name.length == 1,
      s"graftstore $what supports top-level columns only, " +
        s"got ${f.name.mkString(".")}")
    f.name.head
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r @ RenameColumn(u: UnresolvedTable, column, newName) =>
      graftTable(u.multipartIdentifier).map { ct =>
        GraftRenameColumnCommand(rootOf(ct),
          topLevel(column, "RENAME COLUMN"), newName,
          ct.identifier.quotedString): LogicalPlan
      }.getOrElse(r)

    case d @ DropColumns(u: UnresolvedTable, cols, ifExists) =>
      graftTable(u.multipartIdentifier).map { ct =>
        require(cols.length == 1,
          "graftstore DROP COLUMN drops one column per statement")
        GraftDropColumnCommand(rootOf(ct),
          topLevel(cols.head, "DROP COLUMN"), ifExists,
          ct.identifier.quotedString): LogicalPlan
      }.getOrElse(d)

    // `SELECT ... FROM t VERSION AS OF n` / `TIMESTAMP AS OF t` — Spark
    // parses the clause for every table but resolves it for v2 only; a
    // graftstore table pins the requested version through the same
    // relation the `versionAsOf`/`timestampAsOf` options serve on the
    // DataFrame path (immutable snapshot, DML rejected). TIMESTAMP AS OF
    // resolves against the monotonic commit wall-clock every publish
    // stamps into manifest meta (VersionedStore.versionAtTimestamp).
    case tt @ RelationTimeTravel(u: UnresolvedRelation, timestamp, version) =>
      graftTable(u.multipartIdentifier).map { ct =>
        val travel: Map[String, String] = (timestamp, version) match {
          case (None, Some(v)) => Map("versionAsOf" -> v)
          case (Some(ts), None) =>
            Map("timestampAsOf" -> literalTravelTimestamp(ts))
          case _ => throw new IllegalArgumentException(
            "graftstore time travel takes exactly one of VERSION AS OF <n> " +
              "or TIMESTAMP AS OF <literal>")
        }
        val rel = new graft.sources.GraftStoreSource().createRelation(
          spark.sqlContext, Map("path" -> rootOf(ct)) ++ travel)
        SubqueryAlias(u.multipartIdentifier.last,
          org.apache.spark.sql.execution.datasources.LogicalRelation(
            rel, isStreaming = false)): LogicalPlan
      }.getOrElse(tt)
  }
}

final case class GraftRenameColumnCommand(root: String, from: String,
                                          to: String, refreshIdent: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = VersionedStore.renameColumn(spark, root, from, to)
    GraftAlterRule.syncCatalogSchema(spark, refreshIdent, root)
    GraftTableRef.refreshAfterWrite(spark, Some(refreshIdent), root)
    Seq(Row(v))
  }
}

final case class GraftDropColumnCommand(root: String, name: String,
                                        ifExists: Boolean,
                                        refreshIdent: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val schemaHas = VersionedStore
      .schemaAt(spark, root, VersionedStore.currentVersion(spark, root))
      .exists(d => org.apache.spark.sql.types.StructType.fromDDL(d)
        .fieldNames.contains(name))
    if (!schemaHas && ifExists) return Seq.empty
    val v = VersionedStore.dropColumn(spark, root, name)
    GraftAlterRule.syncCatalogSchema(spark, refreshIdent, root)
    GraftTableRef.refreshAfterWrite(spark, Some(refreshIdent), root)
    Seq(Row(v))
  }
}

object GraftAlterRule {
  /** Keep the catalog entry's recorded schema in step with the log
    * after a schema-changing command, so `DESCRIBE t` stays truthful.
    * Reads never depend on it — the source is a SchemaRelationProvider
    * and treats the LOG as the schema authority — so failure here is
    * cosmetic and non-fatal. */
  private[plans] def syncCatalogSchema(spark: SparkSession,
                                       refreshIdent: String,
                                       root: String): Unit =
    try {
      val ident = GraftTableRef.tableIdent(spark, refreshIdent)
      VersionedStore.schemaAt(spark, root,
          VersionedStore.currentVersion(spark, root)).foreach { ddl =>
        spark.sessionState.catalog.alterTableDataSchema(ident,
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
