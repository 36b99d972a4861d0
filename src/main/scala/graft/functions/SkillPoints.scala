package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Skill-points formula (SURVEY.md §2.8 X1).
  *
  * The reference's `_calcSkillPoints` (/root/reference/lib/src/etl.dart:572-606)
  * computes, per skill with constants (a, b, c=10, d):
  *
  *   points = floor( ((b^(v − 10) − 1) / (b − 1)) · a / d )
  *
  * i.e. the closed form of a geometric series of per-level training costs.
  * A NULL level is treated as 10 (`?? c`, etl.dart:605) giving 0 points;
  * levels below 10 follow the negative-exponent branch of `pow` exactly as
  * the reference does.
  *
  * Implemented as a native Catalyst [[UnaryExpression]] with `doGenCode` so
  * it stays inside whole-stage codegen (no UDF/serde boundary in the hot
  * path) — constants are baked into the generated Java as literals.
  */
object SkillPoints {
  /** skill -> (a, b, d); c is 10 for every skill (etl.dart:583-601). */
  val constants: Map[String, (Double, Double, Double)] = Map(
    "fist"      -> (50.0, 1.5, 1800.0),
    "axe"       -> (50.0, 2.0, 1800.0),
    "club"      -> (50.0, 2.0, 1800.0),
    "sword"     -> (50.0, 2.0, 1800.0),
    "distance"  -> (25.0, 2.0, 1000.0),
    "shielding" -> (100.0, 1.5, 3600.0),
    "fishing"   -> (20.0, 1.1, 1200.0))

  /** Reference-faithful scalar form (etl.dart:605). */
  def points(skill: String, level: Long): Long = {
    val (a, b, d) = constants(skill)
    math.floor((math.pow(b, (level - 10).toDouble) - 1.0) / (b - 1.0) * a / d).toLong
  }

  /** Column API: `skill_points($"level", "sword")`. */
  def skill_points(level: Column, skill: String): Column = {
    require(constants.contains(skill), s"unknown skill: $skill")
    GraftColumnBridge.column(SkillPointsExpr(GraftColumnBridge.expression(level), skill))
  }
}

/** Codegen'd skill-points expression. NULL level => level 10 => 0 points,
  * so the output itself is never NULL (matches etl.dart:605 `?? c`). */
case class SkillPointsExpr(child: Expression, skill: String) extends UnaryExpression {
  private val (a, b, d) = SkillPoints.constants(skill)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "skill_points"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val lvl = if (v == null) 10L else v.asInstanceOf[Number].longValue()
    SkillPoints.points(skill, lvl)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val lvl = ctx.freshName("lvl")
    ev.copy(
      code = code"""
        ${c.code}
        long $lvl = ${c.isNull} ? 10L : (long) ${c.value};
        long ${ev.value} = (long) Math.floor(
          (Math.pow(${b}d, (double)($lvl - 10L)) - 1.0d) / (${b}d - 1.0d) * ${a}d / ${d}d);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
