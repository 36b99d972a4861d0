package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, DeleteAction, DeleteFromTable, InsertAction,
  InsertIntoStatement, InsertStarAction, LogicalPlan, MergeAction,
  MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InsertIntoHadoopFsRelationCommand, LogicalRelation}
import org.apache.spark.sql.types.{LongType, StringType}

import graft.sinks.VersionedStore
import graft.sources.{GraftFileIndex, GraftStoreRowRelation}

/** The SQL front door for [[VersionedStore]] DML — the missing half of
  * the `format("graftstore")` seam: a `CREATE TABLE t USING graftstore`
  * user could SELECT (and stream) but had to drop into the Scala API the
  * first time they needed to FIX data. This rule makes the standard
  * row-level commands Spark already PARSES — `DELETE FROM`, `UPDATE`,
  * `MERGE INTO` land as [[DeleteFromTable]]/[[UpdateTable]]/
  * [[MergeIntoTable]] and then die in CheckAnalysis with "only supported
  * with v2 tables" — execute against the store's transactional commit
  * path instead, the same move Delta's public engine makes with its
  * DeltaAnalysis resolution rules.
  *
  * Injected as a POST-HOC resolution rule ([[graft.GraftExtensions]]):
  * by then the target relation and every condition/assignment expression
  * are fully resolved (main-batch work), and the rewrite happens before
  * CheckAnalysis would reject the V1 relation. The rewrite swaps the
  * command node for a [[LeafRunnableCommand]] delegating to the existing
  * transactional operations — `deleteWhere`/`updateWhere`/`mergeInto` —
  * so SQL DML gets the identical CAS-at-base+1 contract, ledger
  * carry-forward, stats recording, and change-feed labeling as the Scala
  * API; nothing is reimplemented at this layer.
  *
  * Resolved-to-unresolved bridge: the analyzed condition's
  * [[AttributeReference]]s carry THIS relation instance's exprIds, but
  * the store ops apply predicates to frames they read themselves — so
  * every attribute is rewritten to a name-based [[UnresolvedAttribute]]
  * and re-resolves against the operation's own read (sound: store
  * columns are unique by schema contract). Subquery conditions are
  * rejected loudly — they'd need the rewrite-to-join machinery of the
  * v2 path and silently mis-scoping one is a wrong answer. */
object GraftDmlRule extends Rule[LogicalPlan] {

  /** A resolved graftstore target: (store root, time-travel pinned?,
    * catalog identifier when the relation came from a `CREATE TABLE ...
    * USING graftstore` entry — the cache key the command must refresh).
    * Both relation shapes qualify — the vectorized `HadoopFsRelation`
    * over [[GraftFileIndex]] and the column-mapped row fallback. */
  private[graft] object GraftTarget {
    def unapply(plan: LogicalPlan): Option[(String, Boolean, Option[String])] =
      plan match {
        case SubqueryAlias(_, child) => unapply(child)
        case l: LogicalRelation =>
          val ident = l.catalogTable.map(_.identifier.quotedString)
          l.relation match {
            case h: HadoopFsRelation => h.location match {
              case g: GraftFileIndex => Some((g.root, g.pinned, ident))
              case _                 => None
            }
            case r: GraftStoreRowRelation => Some((r.root, r.pinned, ident))
            case _                        => None
          }
        case _ => None
      }
  }

  private def requireCurrent(pinned: Boolean, op: String): Unit =
    require(!pinned,
      s"$op on a time-traveled graftstore relation (VERSION AS OF / " +
        "TIMESTAMP AS OF / the versionAsOf/timestampAsOf reader options) " +
        "is not allowed — DML always targets the current version")

  private def requireNoSubquery(e: Expression, op: String): Unit =
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graftstore $op does not support subqueries in its condition — " +
        "materialize the subquery and use MERGE INTO, or the Scala API")

  /** Resolved expression → name-resolved form (see class doc). */
  private def dealign(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  /** Wrapped as an opaque [[Column]] — NOT a bare Expression field: the
    * command is a finished analysis product, but CheckAnalysis walks
    * every Expression-typed argument of every node and would reject the
    * deliberately name-unresolved attributes (they re-resolve against
    * the store op's own read, see class doc). */
  private def toColumn(e: Expression): Column =
    GraftColumnBridge.column(dealign(e))

  // resolveOperatorsDown, not a root-only match: the grammar allows
  // CTE-prefixed DML (`WITH s AS (...) MERGE INTO t USING s ...`), whose
  // analyzed plan wraps the command node — a root match would let those
  // fall through to CheckAnalysis's misleading v2-only error.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case DeleteFromTable(t @ GraftTarget(root, pinned, ident), cond)
        if t.resolved =>
      requireCurrent(pinned, "DELETE")
      requireNoSubquery(cond, "DELETE")
      GraftDeleteCommand(root, toColumn(cond), ident)

    case UpdateTable(t @ GraftTarget(root, pinned, ident), assignments, cond)
        if t.resolved && assignments.forall(_.resolved) =>
      requireCurrent(pinned, "UPDATE")
      cond.foreach(requireNoSubquery(_, "UPDATE"))
      val set = assignments.map { a =>
        a.key match {
          case k: AttributeReference =>
            requireNoSubquery(a.value, "UPDATE SET")
            k.name -> toColumn(a.value)
          case other => throw new IllegalArgumentException(
            s"graftstore UPDATE supports top-level column assignments only, " +
              s"got: SET $other = ...")
        }
      }
      GraftUpdateCommand(root, set, cond.map(toColumn), ident)

    case m @ MergeIntoTable(t @ GraftTarget(root, pinned, ident), source, mergeCond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if t.resolved && source.resolved =>
      requireCurrent(pinned, "MERGE INTO")
      requireNoSubquery(mergeCond, "MERGE INTO")
      val targetAttrs = t.output
      val sourceAttrs = source.output
      val keys = mergeKeys(mergeCond, targetAttrs, sourceAttrs)
      if (notMatchedBySource.isEmpty &&
          isUpsertShape(matched, notMatched, targetAttrs))
        // the whole-row upsert keeps its dedicated single-pass path
        // (and the WITH SCHEMA EVOLUTION contract)
        GraftMergeCommand(root, source, keys, targetAttrs.map(_.name),
          mergeSchema = withSchemaEvolution, refreshIdent = ident)
      else {
        require(!withSchemaEvolution,
          "WITH SCHEMA EVOLUTION needs the whole-row upsert shape " +
            "(UPDATE SET * + INSERT *) — conditional clauses never change " +
            "the table schema")
        lowerMergeClauses(root, source, keys, matched, notMatched,
          notMatchedBySource, targetAttrs, sourceAttrs, ident)
      }

    // INSERT, vectorized-table edition: by the time injected post-hoc
    // rules run, Spark's own DataSourceAnalysis has already converted
    // `INSERT INTO t ...` over the HadoopFsRelation into a raw
    // file-write command — which would stream parquet DIRECTLY into the
    // store root, bypassing the manifest entirely (readers would never
    // see the rows; an unreferenced-file sweep could reap them).
    // Rewriting it into a transactional append/snapshot commit is
    // therefore correctness, not convenience. (An extension-less SQL
    // session still has that hole — the manifest stays the truth, so
    // reads are unaffected, but the inserted rows are silently lost;
    // SQL writes require the extensions.)
    case i: InsertIntoHadoopFsRelationCommand
        if i.fileIndex.exists(_.isInstanceOf[GraftFileIndex]) =>
      val g = i.fileIndex.get.asInstanceOf[GraftFileIndex]
      requireCurrent(g.pinned, "INSERT")
      require(i.staticPartitions.isEmpty,
        "graftstore INSERT does not take a PARTITION spec — write day as " +
          "an ordinary column (the store partitions by its own contract)")
      require(i.mode == SaveMode.Append || i.mode == SaveMode.Overwrite,
        s"graftstore INSERT supports INTO (append) and OVERWRITE, got ${i.mode}")
      GraftInsertCommand(g.root, i.query, i.outputColumnNames,
        overwrite = i.mode == SaveMode.Overwrite, byName = true,
        refreshIdent = i.catalogTable.map(_.identifier.quotedString))

    // INSERT, column-mapped (marker relation) edition: Spark's converter
    // skips the marker (not a HadoopFsRelation), so the statement
    // arrives intact and would otherwise die in PreWriteCheck.
    case InsertIntoStatement(t @ GraftTarget(root, pinned, ident),
        partitionSpec, userCols, query, overwrite, ifPartitionNotExists, byName)
        if t.resolved && query.resolved =>
      requireCurrent(pinned, "INSERT")
      require(partitionSpec.isEmpty && !ifPartitionNotExists,
        "graftstore INSERT does not take a PARTITION spec — write day as " +
          "an ordinary column (the store partitions by its own contract)")
      require(userCols.isEmpty,
        "graftstore INSERT takes the full row positionally (or INSERT ... " +
          "BY NAME) — a partial column list is not supported")
      GraftInsertCommand(root, query, t.output.map(_.name), overwrite,
        byName, ident)

    // SHOW TBLPROPERTIES on a graftstore table answers from the
    // TRANSACTION LOG (current commit meta + graft.version), not the
    // catalog entry's frozen creation-time options; any other table
    // keeps Spark's own semantics untouched. The statement resolves as
    // the V2 node over the session catalog's V1Table wrapper (Spark
    // serves v1 tables through the v2 ShowTableProperties exec), so the
    // match is on that shape; the v1-command twin below covers any
    // ResolveSessionCatalog conversion path.
    case sp @ org.apache.spark.sql.catalyst.plans.logical.ShowTableProperties(
        r: org.apache.spark.sql.catalyst.analysis.ResolvedTable, key, out) =>
      GraftColumnBridge.v1CatalogTable(r.table)
        .flatMap(GraftTableRef.rootFromCatalogTable) match {
        case Some(root) => GraftShowPropsCommand(root, key, out)
        case None       => sp
      }
    case sp: org.apache.spark.sql.execution.command.ShowTablePropertiesCommand =>
      GraftTableRef.graftRootOf(SparkSession.active, sp.table) match {
        case Some(root) => GraftShowPropsCommand(root, sp.propertyKey, sp.output)
        case None       => sp
      }
  }

  /** The ON clause as upsert keys: a conjunction of `t.k = s.k`
    * equalities between same-named target and source columns — the only
    * shape [[VersionedStore.mergeInto]]'s key-based semantics express.
    * Anything else (expressions, differing names, disjunctions) is
    * rejected with the expected form named. The ANALYZER'S implicit
    * type-coercion casts are stripped first (an inline `VALUES (1, ...)`
    * source arrives as `t.k = cast(s.k as bigint)`) — sound, because the
    * store op re-joins by NAME with Spark's own coercion applied again. */
  private def mergeKeys(cond: Expression, target: Seq[Attribute],
                        source: Seq[Attribute]): Seq[String] = {
    val tIds = target.map(_.exprId).toSet
    val sIds = source.map(_.exprId).toSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(l, r) => EqualTo(uncast(l), uncast(r))
      case other         => other
    }.map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tIds.contains(a.exprId) && sIds.contains(b.exprId) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sIds.contains(a.exprId) && tIds.contains(b.exprId) => (b, a)
      case other => throw new IllegalArgumentException(
        s"graftstore MERGE requires ON to be a conjunction of " +
          s"target.key = source.key equalities, got: $other")
    }.map { case (tAttr, sAttr) =>
      require(tAttr.name == sAttr.name,
        s"graftstore MERGE keys must share a name on both sides " +
          s"(got ${tAttr.name} = ${sAttr.name}) — alias the source column")
      tAttr.name
    }
  }

  /** Strip the analyzer's implicit type-coercion casts — a typed source
    * (inline VALUES, a narrower view) wraps every same-named reference
    * in `cast(s.col as <target type>)`; sound to look through because
    * the store ops re-align by NAME and re-apply Spark's own coercion. */
  private def uncast(e: Expression): Expression = e match {
    case org.apache.spark.sql.catalyst.expressions.Cast(child, _, _, _) =>
      uncast(child)
    case other => other
  }

  /** Every target column assigned from its same-named source column
    * (`SET *` / `INSERT *`, or the analyzer's expansion, or hand-written
    * in full). */
  private def fullRowAssignments(as: Seq[Assignment],
                                 target: Seq[Attribute]): Boolean = {
    val pairs = as.flatMap { a => (a.key, uncast(a.value)) match {
      case (k: AttributeReference, v: AttributeReference) if k.name == v.name =>
        Some(k.name)
      case _ => None
    }}
    pairs.length == as.length && target.map(_.name).toSet == pairs.toSet
  }

  /** The whole-row-upsert MERGE shape — one unconditional matched
    * UPDATE SET * plus one unconditional not-matched INSERT * — which
    * keeps its dedicated single-pass [[GraftMergeCommand]] path; every
    * other clause combination lowers to [[GraftMergeClausesCommand]]. */
  private def isUpsertShape(matched: Seq[MergeAction],
                            notMatched: Seq[MergeAction],
                            target: Seq[Attribute]): Boolean = {
    val okMatched = matched match {
      case Seq(UpdateStarAction(None))    => true
      case Seq(UpdateAction(None, as, _)) => fullRowAssignments(as, target)
      case _                              => false
    }
    val okNotMatched = notMatched match {
      case Seq(InsertStarAction(None))    => true
      case Seq(InsertAction(None, as))    => fullRowAssignments(as, target)
      case _                              => false
    }
    okMatched && okNotMatched
  }

  /** Lower a conditional-clause MERGE onto
    * [[VersionedStore.mergeIntoClauses]]. Resolved references carry the
    * relation instances' exprIds; the store op re-reads both sides
    * itself, so every reference is rewritten BY SIDE into the op's
    * alias contract — target attrs to `t.<name>`, source attrs to
    * `s.<name>` (qualified [[UnresolvedAttribute]]s that re-resolve
    * against the op's own join frame). First-match-wins order is the
    * user's clause order; a non-final unconditional matched clause
    * makes its successors dead, so it is rejected loudly (the Delta
    * grammar's rule). */
  private def lowerMergeClauses(root: String, source: LogicalPlan,
                                keys: Seq[String],
                                matched: Seq[MergeAction],
                                notMatched: Seq[MergeAction],
                                notMatchedBySource: Seq[MergeAction],
                                targetAttrs: Seq[Attribute],
                                sourceAttrs: Seq[Attribute],
                                ident: Option[String]): LogicalPlan = {
    val tIds = targetAttrs.map(_.exprId).toSet
    val sIds = sourceAttrs.map(_.exprId).toSet
    def qualify(e: Expression, what: String): Column = {
      requireNoSubquery(e, what)
      GraftColumnBridge.column(e.transform {
        case a: AttributeReference if tIds.contains(a.exprId) =>
          UnresolvedAttribute(Seq("t", a.name))
        case a: AttributeReference if sIds.contains(a.exprId) =>
          UnresolvedAttribute(Seq("s", a.name))
      })
    }
    def sourceOnly(e: Expression, what: String): Column = {
      require(!e.exists {
        case a: AttributeReference => tIds.contains(a.exprId)
        case _ => false
      }, s"$what may reference source columns only")
      qualify(e, what)
    }
    def targetOnly(e: Expression, what: String): Column = {
      require(!e.exists {
        case a: AttributeReference => sIds.contains(a.exprId)
        case _ => false
      }, s"$what may reference target columns only — a row not matched " +
        "by source has no source side")
      qualify(e, what)
    }
    val targetNames = targetAttrs.map(_.name)
    val srcStar: Map[String, Column] = targetNames.map(n =>
      n -> GraftColumnBridge.column(UnresolvedAttribute(Seq("s", n)))).toMap
    val matchedSpecs: Seq[VersionedStore.MergeMatched] = matched.map {
      case UpdateStarAction(cond) =>
        VersionedStore.MergeMatched.Update(
          cond.map(qualify(_, "WHEN MATCHED AND")), srcStar)
      case UpdateAction(cond, assignments, _) =>
        val set = assignments.map { a =>
          a.key match {
            case k: AttributeReference if tIds.contains(k.exprId) =>
              k.name -> qualify(a.value, s"UPDATE SET ${k.name}")
            case other => throw new IllegalArgumentException(
              s"graftstore MERGE UPDATE supports top-level target column " +
                s"assignments only, got: SET $other = ...")
          }
        }.toMap
        VersionedStore.MergeMatched.Update(
          cond.map(qualify(_, "WHEN MATCHED AND")), set)
      case DeleteAction(cond) =>
        VersionedStore.MergeMatched.Delete(
          cond.map(qualify(_, "WHEN MATCHED AND")))
      case other => throw new IllegalArgumentException(
        s"graftstore MERGE supports UPDATE/DELETE matched clauses, got: $other")
    }
    matchedSpecs.dropRight(1).foreach {
      case VersionedStore.MergeMatched.Update(None, _) |
           VersionedStore.MergeMatched.Delete(None) =>
        throw new IllegalArgumentException(
          "only the LAST WHEN MATCHED clause may omit its AND condition — " +
            "an earlier unconditional clause makes the rest unreachable")
      case _ => ()
    }
    val insertSpec: Option[VersionedStore.MergeInsert] = notMatched match {
      case Seq() => None
      case Seq(InsertStarAction(cond)) =>
        Some(VersionedStore.MergeInsert(
          cond.map(sourceOnly(_, "WHEN NOT MATCHED AND")), None))
      case Seq(InsertAction(cond, as)) =>
        // the full-row shape stays the star path; a PARTIAL column list
        // carries its value expressions, with NULL for omitted columns
        // (standard SQL INSERT semantics — Delta permits the same)
        val values =
          if (fullRowAssignments(as, targetAttrs)) None
          else {
            val pairs = as.map { a =>
              a.key match {
                case k: AttributeReference if tIds.contains(k.exprId) =>
                  k.name -> sourceOnly(a.value, s"INSERT value for ${k.name}")
                case other => throw new IllegalArgumentException(
                  s"graftstore MERGE INSERT names top-level target columns " +
                    s"only, got: INSERT (... $other ...)")
              }
            }
            // a repeated column (INSERT (v, v) VALUES (1, 2)) must fail,
            // not silently take the last assignment — Delta rejects it
            val dups = pairs.map(_._1)
              .groupBy(identity).collect { case (n, g) if g.length > 1 => n }
            if (dups.nonEmpty) throw new IllegalArgumentException(
              s"duplicate column in MERGE INSERT list: ${dups.toSeq.sorted.mkString(",")}")
            Some(pairs.toMap)
          }
        Some(VersionedStore.MergeInsert(
          cond.map(sourceOnly(_, "WHEN NOT MATCHED AND")), values))
      case many => throw new IllegalArgumentException(
        s"graftstore MERGE supports one WHEN NOT MATCHED clause, " +
          s"got ${many.length}")
    }
    // WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE — target-only
    // references (the source side of an unmatched row does not exist),
    // first-match-wins among themselves, same dead-clause rejection.
    val bySourceSpecs: Seq[VersionedStore.MergeMatched] =
      notMatchedBySource.map {
        case UpdateAction(cond, assignments, _) =>
          val set = assignments.map { a =>
            a.key match {
              case k: AttributeReference if tIds.contains(k.exprId) =>
                k.name -> targetOnly(a.value,
                  s"NOT MATCHED BY SOURCE UPDATE SET ${k.name}")
              case other => throw new IllegalArgumentException(
                s"graftstore MERGE UPDATE supports top-level target column " +
                  s"assignments only, got: SET $other = ...")
            }
          }.toMap
          VersionedStore.MergeMatched.Update(
            cond.map(targetOnly(_, "WHEN NOT MATCHED BY SOURCE AND")), set)
        case DeleteAction(cond) =>
          VersionedStore.MergeMatched.Delete(
            cond.map(targetOnly(_, "WHEN NOT MATCHED BY SOURCE AND")))
        case other => throw new IllegalArgumentException(
          s"graftstore MERGE supports UPDATE/DELETE in WHEN NOT MATCHED " +
            s"BY SOURCE, got: $other")
      }
    bySourceSpecs.dropRight(1).foreach {
      case VersionedStore.MergeMatched.Update(None, _) |
           VersionedStore.MergeMatched.Delete(None) =>
        throw new IllegalArgumentException(
          "only the LAST WHEN NOT MATCHED BY SOURCE clause may omit its " +
            "AND condition — an earlier unconditional clause makes the " +
            "rest unreachable")
      case _ => ()
    }
    GraftMergeClausesCommand(root, source, keys, matchedSpecs, insertSpec,
      bySourceSpecs, ident)
  }
}

/** `DELETE FROM t WHERE ...` → [[VersionedStore.deleteWhere]].
  * Returns the committed version (unchanged when nothing matched). */
final case class GraftDeleteCommand(root: String, cond: Column,
                                    refreshIdent: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // rewritten dirs reproduce the table's recorded stats columns — a
    // SQL DELETE must not turn every touched dir stats-less (see
    // GraftInsertCommand's rationale)
    val v = VersionedStore.deleteWhere(spark, root, cond,
      statsCols = VersionedStore.recordedStatsCols(spark, root))
    GraftTableRef.refreshAfterWrite(spark, refreshIdent, root)
    Seq(Row(v))
  }
}

/** `UPDATE t SET ... [WHERE ...]` → [[VersionedStore.updateWhere]].
  * A missing WHERE updates every row (standard SQL), expressed as a
  * literal TRUE predicate. */
final case class GraftUpdateCommand(root: String,
                                    set: Seq[(String, Column)],
                                    cond: Option[Column],
                                    refreshIdent: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val pred = cond.getOrElse(org.apache.spark.sql.functions.lit(true))
    val v = VersionedStore.updateWhere(spark, root, pred, set.toMap,
      statsCols = VersionedStore.recordedStatsCols(spark, root))
    GraftTableRef.refreshAfterWrite(spark, refreshIdent, root)
    Seq(Row(v))
  }
}

/** `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *` → [[VersionedStore.mergeInto]].
  * The resolved source PLAN rides the command (not a materialized
  * frame): execution builds the DataFrame in `run`, aligned to the
  * target's column order, so the merge's own control aggregates and
  * write jobs drive it exactly as the Scala API would. */
final case class GraftMergeCommand(root: String, source: LogicalPlan,
                                   keys: Seq[String],
                                   targetCols: Seq[String],
                                   mergeSchema: Boolean,
                                   refreshIdent: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val src = GraftColumnBridge.ofRows(spark, source)
      .select(targetCols.map(col): _*)
    val v = VersionedStore.mergeInto(spark, root, src, keys,
      statsCols = VersionedStore.recordedStatsCols(spark, root),
      mergeSchema = mergeSchema)
    GraftTableRef.refreshAfterWrite(spark, refreshIdent, root)
    Seq(Row(v))
  }
}

/** Conditional-clause `MERGE INTO` →
  * [[VersionedStore.mergeIntoClauses]]: `WHEN MATCHED [AND c] THEN
  * UPDATE SET col = expr, ... | DELETE` (first-match-wins, partial
  * columns allowed), an optional `WHEN NOT MATCHED [AND c] THEN
  * INSERT * | (cols) VALUES (exprs)` (omitted columns insert NULL),
  * and `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE`
  * (target-only references). The source PLAN rides the command like
  * [[GraftMergeCommand]]'s; clause Columns are in the store op's
  * `t.<col>`/`s.<col>` alias contract (see [[GraftDmlRule]]). */
final case class GraftMergeClausesCommand(root: String, source: LogicalPlan,
                                          keys: Seq[String],
                                          matched: Seq[VersionedStore.MergeMatched],
                                          insertNotMatched: Option[VersionedStore.MergeInsert],
                                          notMatchedBySource: Seq[VersionedStore.MergeMatched],
                                          refreshIdent: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftColumnBridge.ofRows(spark, source)
    val v = VersionedStore.mergeIntoClauses(spark, root, src, keys,
      matched, insertNotMatched, notMatchedBySource,
      statsCols = VersionedStore.recordedStatsCols(spark, root))
    GraftTableRef.refreshAfterWrite(spark, refreshIdent, root)
    Seq(Row(v))
  }
}

/** `INSERT INTO` (append) / `INSERT OVERWRITE` (snapshot replace) →
  * [[VersionedStore.commitAppend]] / [[VersionedStore.commit]]. Column
  * alignment is positional unless the statement was BY NAME (standard
  * SQL); the stats request is REPRODUCED from the current version's
  * recorded stats columns, so SQL inserts keep the table's
  * data-skipping contract without an options channel. Schema drift
  * fails with the store's own commit-time policy (narrower-on-lattice
  * allowed, anything else loud). */
final case class GraftInsertCommand(root: String, query: LogicalPlan,
                                    targetCols: Seq[String],
                                    overwrite: Boolean,
                                    byName: Boolean,
                                    refreshIdent: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val q = GraftColumnBridge.ofRows(spark, query)
    val df =
      if (byName) q.select(targetCols.map(col): _*)
      else {
        require(q.columns.length == targetCols.length,
          s"INSERT provides ${q.columns.length} columns, table has " +
            s"${targetCols.length} (${targetCols.mkString(", ")})")
        q.toDF(targetCols: _*)
      }
    val statsCols = VersionedStore.recordedStatsCols(spark, root)
    val v =
      if (overwrite) VersionedStore.commit(df, root, statsCols = statsCols)
      else VersionedStore.commitAppend(df, root, statsCols = statsCols)
    GraftTableRef.refreshAfterWrite(spark, refreshIdent, root)
    Seq(Row(v))
  }
}

/** Shared table-reference resolution for the maintenance commands (the
  * parser-level verbs that carry a raw identifier): either the Delta
  * path form `` graftstore.`/path/to/store` `` or a catalog table whose
  * provider is graftstore (its recorded `path` option / location). */
object GraftTableRef {
  private val ByPath = """(?is)\s*graftstore\s*\.\s*`([^`]+)`\s*""".r

  /** A (possibly catalog-qualified) identifier string → TableIdentifier.
    * `CatalogTable.identifier.quotedString` is 3-part
    * (`spark_catalog`.`db`.`t`) — parseTableIdentifier rejects it, so
    * parse multipart and keep the (db, table) tail. */
  private[plans] def tableIdent(spark: SparkSession, s: String)
      : org.apache.spark.sql.catalyst.TableIdentifier = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(s)
    parts.takeRight(2) match {
      case Seq(db, t) => org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      case Seq(t)     => org.apache.spark.sql.catalyst.TableIdentifier(t)
    }
  }

  /** Post-write cache refresh — the catalog CACHES a table's resolved
    * relation, and a graftstore relation pins one store version at
    * resolution: without this, the session that just ran the DML keeps
    * reading the pre-DML snapshot (and after VACUUM, dirs that no longer
    * exist). Identifier-precise when the target came from the catalog;
    * refreshByPath additionally drops any cached plans over the root
    * (path-loaded frames). The Delta engine's commands end the same way. */
  private[plans] def refreshAfterWrite(spark: SparkSession,
                                       ident: Option[String],
                                       root: String): Unit = {
    // session-catalog-level refresh (drops the cached relation without
    // re-analyzing the table plan — the public Catalog.refreshTable
    // walks the analyzed plan and chokes on relations it didn't expect)
    ident.foreach(i =>
      spark.sessionState.catalog.refreshTable(tableIdent(spark, i)))
    spark.catalog.refreshByPath(root)
  }

  /** The maintenance verbs carry a raw identifier instead of a resolved
    * relation; refresh through the same two doors. */
  private[plans] def refreshAfterMaintenance(spark: SparkSession,
                                             ref: String, root: String): Unit =
    refreshAfterWrite(spark,
      ref match { case ByPath(_) => None; case name => Some(name.trim) }, root)

  /** The store root IFF `ident` names a graftstore catalog table; None
    * for any other (or unresolvable) table — the non-claiming twin of
    * [[resolveRoot]] for rules that must leave foreign tables alone. */
  private[plans] def rootFromCatalogTable(
      ct: org.apache.spark.sql.catalyst.catalog.CatalogTable): Option[String] =
    if (!ct.provider.exists(_.equalsIgnoreCase("graftstore"))) None
    else ct.storage.properties.get("path")
      .orElse(ct.storage.locationUri.map(u => new Path(u).toString))

  private[plans] def graftRootOf(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.TableIdentifier): Option[String] =
    try rootFromCatalogTable(spark.sessionState.catalog.getTableMetadata(ident))
    catch { case scala.util.control.NonFatal(_) => None }

  def resolveRoot(spark: SparkSession, ref: String): String = ref match {
    case ByPath(p) => p
    case name =>
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(name.trim)
      val ct = spark.sessionState.catalog.getTableMetadata(ident)
      require(ct.provider.exists(_.equalsIgnoreCase("graftstore")),
        s"${name.trim} is not a graftstore table (provider: " +
          s"${ct.provider.getOrElse("none")})")
      ct.storage.properties.get("path")
        .orElse(ct.storage.locationUri.map(u => new Path(u).toString))
        .getOrElse(throw new IllegalArgumentException(
          s"${name.trim} records no path — CREATE TABLE ... USING " +
            "graftstore OPTIONS (path '...')"))
  }
}

/** `OPTIMIZE t` (full compaction) / `OPTIMIZE t CLUSTER BY (a[, b])
  * [INTO n BUCKETS]` (cluster rewrite; two columns Z-order) — the Delta
  * `OPTIMIZE [ZORDER BY]` shape over [[VersionedStore.optimize]] /
  * [[graft.streaming.VersionedStream.compact]]. */
final case class GraftOptimizeCommand(tableRef: String,
                                      clusterCols: Seq[String],
                                      buckets: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftTableRef.resolveRoot(spark, tableRef)
    // A maintenance rewrite must REPRODUCE the table's recorded stats
    // (incl. blooms) on the dirs it writes — otherwise one OPTIMIZE
    // silently turns every data-skipping query into a full scan. The
    // cluster columns add their own min/max on top.
    val recorded = VersionedStore.recordedStatsCols(spark, root)
    val v = clusterCols match {
      case Nil =>
        require(buckets.isEmpty, "INTO n BUCKETS requires CLUSTER BY")
        graft.streaming.VersionedStream.compact(spark, root,
          statsCols = recorded)
      case cols =>
        require(cols.length <= 2,
          s"OPTIMIZE clusters by one column or a two-column Z-order, " +
            s"got ${cols.length}: ${cols.mkString(", ")}")
        val key =
          if (cols.length == 1)
            GraftColumnBridge.column(UnresolvedAttribute.quoted(cols.head))
          else GraftColumnBridge.column(graft.functions.ZOrderKey(
            UnresolvedAttribute.quoted(cols.head),
            UnresolvedAttribute.quoted(cols(1))))
        VersionedStore.optimize(spark, root, key,
          buckets = buckets.getOrElse(8),
          statsCols = (cols ++ recorded).distinct)
    }
    GraftTableRef.refreshAfterMaintenance(spark, tableRef, root)
    Seq(Row(v))
  }
}

/** `RESTORE [TABLE] t [TO] VERSION AS OF n | TIMESTAMP AS OF '<ts>'` →
  * [[VersionedStore.restore]]: a manifest-only commit re-referencing
  * the target version's dirs (zero data copy; the undone versions stay
  * time-travelable; the CURRENT ledger is kept so no stream watermark
  * regresses). The timestamp form (`target`: Left) resolves through
  * the same publish-stamped commit clock as read-side travel —
  * restore-to-timestamp is read-resolution plus the version restore. */
final case class GraftRestoreCommand(tableRef: String,
                                     target: Either[String, Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftTableRef.resolveRoot(spark, tableRef)
    val toVersion = target match {
      case Right(v) => v
      case Left(ts) => VersionedStore.versionAtTimestamp(spark, root,
        VersionedStore.parseTravelTimestamp(ts,
          spark.sessionState.conf.sessionLocalTimeZone),
        // "restore to where the table stood at t" is well-defined for a
        // later t (floors to the latest version); only READS reject a
        // future timestamp as non-reproducible — Delta's own split
        canReturnLastCommit = true)
    }
    val v = VersionedStore.restore(spark, root, toVersion)
    GraftTableRef.refreshAfterMaintenance(spark, tableRef, root)
    Seq(Row(v))
  }
}

/** `VACUUM t [RETAIN n HOURS]` → [[VersionedStore.vacuum]]. The DEFAULT
  * retention is 168 hours (Delta's 7 days): an unreferenced-looking dir
  * may be a concurrent writer's prepared-but-uncommitted data — and the
  * fast CAS retry deliberately keeps a prepared dir alive across its
  * whole conflict/re-anchor window — so the dangerous setting must
  * never be the no-argument default. `RETAIN 0 HOURS` is the explicit
  * maintenance-window override (nothing else is running; reap now). */
final case class GraftVacuumCommand(tableRef: String, retainHours: Option[Long])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftTableRef.resolveRoot(spark, tableRef)
    VersionedStore.vacuum(spark, root,
      minAgeMs = retainHours.getOrElse(168L) * 3600L * 1000L)
    GraftTableRef.refreshAfterMaintenance(spark, tableRef, root)
    Seq.empty
  }
}

/** `DESCRIBE DETAIL t` — the Delta table-detail verb over the manifest:
  * ONE row with the format, location, current version, its commit
  * wall-clock, dir/size footprint, the recorded schema DDL, and the
  * current commit's meta as properties. Everything answers from the
  * manifest chain (cached parses) except `size_bytes`, which uses the
  * recorded per-dir byte stats when every dir carries them and is NULL
  * otherwise — DESCRIBE must stay interactive at any table width, so it
  * never falls back to a filesystem sweep. */
final case class GraftDescribeDetailCommand(tableRef: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at",
      org.apache.spark.sql.types.TimestampType, nullable = true)(),
    AttributeReference("num_data_dirs", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = true)(),
    AttributeReference("schema", StringType, nullable = true)(),
    AttributeReference("properties", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftTableRef.resolveRoot(spark, tableRef)
    val v = VersionedStore.currentVersion(spark, root)
    // an EMPTY store still describes (version 0, no schema) — tooling
    // probes freshly created tables, and SHOW TBLPROPERTIES already
    // serves graft.version=0 for the same state
    if (v == 0)
      return Seq(Row("graftstore", root, 0L, null, 0L, null, null, ""))
    val meta = VersionedStore.metaAt(spark, root, v)
    val ts = meta.get("commitTs").flatMap(_.toLongOption)
      .map(ms => new java.sql.Timestamp(ms)).orNull
    val dirs = VersionedStore.prunedDirs(spark, root, v, Seq.empty)
    val size = VersionedStore.statedSizeInBytes(spark, root, v)
    val schema = VersionedStore.schemaAt(spark, root, v).orNull
    val props = meta.toSeq.sortBy(_._1)
      .map { case (k, value) => s"$k=$value" }.mkString(", ")
    Seq(Row("graftstore", root, v, ts, dirs.length.toLong,
      size.map(Long.box).orNull, schema, props))
  }
}

/** `SHOW TBLPROPERTIES t [(key)]` on a graftstore table — intercepted
  * from Spark's v1 command so the properties shown are the TRANSACTION
  * LOG's (the current commit's meta plus the synthetic `graft.version`),
  * not the catalog entry's frozen creation-time options; the Delta
  * engine redirects the same verb to its snapshot metadata. Output
  * shape mirrors Spark's: (key, value) rows, or a single `value` row
  * when one key was asked for. */
final case class GraftShowPropsCommand(root: String,
                                       propertyKey: Option[String],
                                       override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = VersionedStore.currentVersion(spark, root)
    val props = (if (v == 0) Map.empty[String, String]
                 else VersionedStore.metaAt(spark, root, v)) +
      ("graft.version" -> v.toString)
    propertyKey match {
      case Some(k) =>
        val value = props.getOrElse(k,
          s"Table $root does not have property: $k")
        if (output.length == 1) Seq(Row(value)) else Seq(Row(k, value))
      case None =>
        props.toSeq.sortBy(_._1).map { case (k, value) => Row(k, value) }
    }
  }
}

/** `DESCRIBE HISTORY t` → one row per live version, ascending: the
  * version number, its anchor data dir, and the commit metadata as a
  * JSON-ish `k=v` map string (the stream ledger, DML markers). */
final case class GraftHistoryCommand(tableRef: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("data_dir", StringType, nullable = false)(),
    AttributeReference("meta", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftTableRef.resolveRoot(spark, tableRef)
    VersionedStore.history(spark, root).map { case (v, dir) =>
      val meta = VersionedStore.metaAt(spark, root, v)
      Row(v, dir, meta.toSeq.sortBy(_._1)
        .map { case (k, value) => s"$k=$value" }.mkString(", "))
    }
  }
}
