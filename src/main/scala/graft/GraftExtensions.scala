package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CappedCollectLongs, MisraGriesAgg, PackInt8, SkillPointsExpr, TopKAgg, UnpackInt8, VecDot, ZOrderKey}

/** SQL surface for the engine's native expressions (SURVEY.md §2.10):
  * makes `skill_points`, `vec_dot` and `top_k` callable from
  * `spark.sql(...)`.
  *
  * Two registration paths, same builders:
  *  - [[GraftExtensions]] for session construction
  *    (`.withExtensions(new GraftExtensions)`) or cluster-wide via
  *    `spark.sql.extensions=graft.GraftExtensions` — the deployment path.
  *  - [[GraftFunctions.register]] for an already-running session (local
  *    mode reuses one SparkContext, so a second builder can't inject
  *    extensions) — the embedded/test path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // The graftstore SQL front door (Delta's DeltaSqlParser/DeltaAnalysis
    // architecture): the parser adds the maintenance verbs (OPTIMIZE /
    // VACUUM / DESCRIBE HISTORY), the post-hoc rule routes the
    // already-parseable row-level commands (DELETE/UPDATE/MERGE INTO on
    // a graftstore relation) into the store's transactional ops. BOTH
    // need session-construction injection — a parser cannot be swapped
    // into a live session, so SQL DML requires `.withExtensions(new
    // GraftExtensions)` (or spark.sql.extensions=graft.GraftExtensions);
    // the Scala API needs neither.
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // HINT-batch rule (runs BEFORE the Resolution batch): ALTER TABLE
    // RENAME/DROP COLUMN on a v1 table is rejected by Spark's own
    // ResolveSessionCatalog the moment the table reference resolves —
    // even a same-batch extension rule is too late (built-ins run
    // first each iteration). The hint batch sees the statement with the
    // table still unresolved, so the rule can claim graftstore tables
    // via its own catalog lookup and leave everything else untouched.
    e.injectHintResolutionRule(session => new graft.plans.GraftAlterRule(session))
    e.injectPostHocResolutionRule(_ => graft.plans.GraftDmlRule)
    // AFTER the DML rule (same Once batch, injection order): DML matches
    // the marker relation; every remaining marker then upgrades to the
    // vectorized physical-schema scan + alias projection.
    e.injectPostHocResolutionRule(_ => graft.sources.GraftStoreVectorizeRule)
  }
}

object GraftFunctions {

  private def stringArg(e: Expression, fn: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a string literal argument, got: $other")
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument, got: $other")
  }

  /** (name, info, builder) triples shared by both registration paths. */
  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("skill_points",
      new ExpressionInfo(classOf[SkillPointsExpr].getName, "skill_points"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "skill_points(level, 'skill')")
        SkillPointsExpr(args.head, stringArg(args(1), "skill_points"))
      }),
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b)")
        VecDot(args.head, args(1))
      }),
    ("top_k",
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_k(struct(score, id), k)")
        TopKAgg(args.head, intArg(args(1), "top_k")).toAggregateExpression()
      }),
    ("pack_int8",
      new ExpressionInfo(classOf[PackInt8].getName, "pack_int8"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "pack_int8(embedding, scale)")
        PackInt8(args.head, args(1))
      }),
    ("unpack_int8",
      new ExpressionInfo(classOf[UnpackInt8].getName, "unpack_int8"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "unpack_int8(bytes, scale)")
        UnpackInt8(args.head, args(1))
      }),
    ("zorder_key",
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "zorder_key(a, b)")
        ZOrderKey(args.head, args(1))
      }),
    ("misra_gries",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "misra_gries(term, k)")
        MisraGriesAgg(args.head, intArg(args(1), "misra_gries")).toAggregateExpression()
      }),
    ("capped_collect_longs",
      new ExpressionInfo(classOf[CappedCollectLongs].getName, "capped_collect_longs"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "capped_collect_longs(value, cap)")
        CappedCollectLongs(args.head, intArg(args(1), "capped_collect_longs"))
          .toAggregateExpression()
      }))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }

  /** Install the optimizer rewrites into an already-running session (the
    * live-session twin of [[GraftExtensions]]'s injectOptimizerRule). */
  def installOptimizations(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRule
}
