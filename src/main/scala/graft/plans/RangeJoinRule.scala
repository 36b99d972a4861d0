package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

/** Catalyst optimizer rule: rewrite a date point-in-interval join written
  * the natural way —
  *
  *   points.join(intervals, col("p").between(col("s"), col("e")))
  *
  * — into the grid-cell equi-join of
  * [[graft.operators.RangeJoin.pointInInterval]]. Without this, Spark has
  * no equi-keys to hash on and plans BroadcastNestedLoopJoin: every point
  * row tested against every interval and one whole side broadcast —
  * O(P·I) work that dies first at 100 TB. The rewrite projects the
  * point's grid cell, explodes each interval over the cells it spans
  * (span/granularity rows, bounded), equi-joins on the cell, and keeps
  * the ORIGINAL predicate as a post-join filter — semantics are identical
  * by construction, only the physical strategy changes (hash join).
  *
  * This is preference order (c) of the design brief — a whole-operator
  * rewrite the built-in optimizer cannot express — registered through
  * [[graft.GraftExtensions]] (`spark.sql.extensions`) for session
  * construction and `spark.experimental.extraOptimizations` for live
  * sessions. Scoped narrowly: inner joins whose entire condition is a
  * date BETWEEN with the point on one side and both bounds on the other;
  * anything else is left untouched.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  /** Grid granularity config. The 7-day default suits day-grained
    * intervals of days-to-weeks span: fanout = span/7 rows per interval,
    * selectivity = one week of points per cell. Tune toward the typical
    * interval length. */
  val GranularityConf = "spark.graft.rangeJoin.granularityDays"
  val GranularityDefault = 7

  private def granularityDays: Int = {
    val g = conf.getConfString(GranularityConf, GranularityDefault.toString).toInt
    require(g >= 1, s"$GranularityConf must be >= 1, got $g")
    g
  }

  private def cellOf(p: Expression, g: Int): Expression =
    Floor(Divide(
      Cast(DateDiff(p, Literal(0, DateType)), DoubleType),
      Literal(g.toDouble)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      matchBetween(cond) match {
        case Some((p, s, e))
            if sided(p, left) && sided(s, right) && sided(e, right) =>
          rewrite(left, right, p, s, e, cond, hint, pointOnLeft = true)
        case Some((p, s, e))
            if sided(p, right) && sided(s, left) && sided(e, left) =>
          rewrite(left, right, p, s, e, cond, hint, pointOnLeft = false)
        case _ => j
      }
  }

  private def sided(expr: Expression, side: LogicalPlan): Boolean =
    expr.references.nonEmpty && expr.references.subsetOf(side.outputSet)

  /** The whole condition must be `p >= s AND p <= e` over DateType (the
    * exact shape `Column.between` produces). */
  private def matchBetween(cond: Expression): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(GreaterThanOrEqual(p1, s), LessThanOrEqual(p2, e))
          if p1.semanticEquals(p2) &&
            p1.dataType == DateType && s.dataType == DateType && e.dataType == DateType &&
            p1.deterministic && s.deterministic && e.deterministic =>
        Some((p1, s, e))
      case _ => None
    }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      p: Expression, s: Expression, e: Expression,
                      cond: Expression, hint: JoinHint,
                      pointOnLeft: Boolean): LogicalPlan = {
    val g = granularityDays
    val (pointChild, ivalChild) = if (pointOnLeft) (left, right) else (right, left)
    val pointCell = Alias(cellOf(p, g), "__graft_cell_p")()
    val pointSide = Project(pointChild.output :+ pointCell, pointChild)
    val ivalCell = AttributeReference("__graft_cell_iv", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved, and the optimizer never re-runs ResolveTimeZone.
    val cells = new Sequence(cellOf(s, g), cellOf(e, g)).withTimeZone(conf.sessionLocalTimeZone)
    val ivalSide = Generate(
      Explode(cells),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ivalCell), child = ivalChild)
    // The rewritten join's left child is always the POINT side; when the
    // point sat on the original right, the children swap, so side-specific
    // hints (e.g. a broadcast on the original left) must swap with them or
    // they'd silently apply to the wrong side.
    val sidedHint = if (pointOnLeft) hint else JoinHint(hint.rightHint, hint.leftHint)
    val joined = Join(pointSide, ivalSide, Inner,
      Some(EqualTo(pointCell.toAttribute, ivalCell)), sidedHint)
    // Original predicate re-checked inside cells; original output order and
    // attribute ids preserved, so downstream references stay valid.
    Project(left.output ++ right.output, Filter(cond, joined))
  }
}
