package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

object ZOrder {
  /** Morton (Z-order) key of two dimension values — see [[ZOrderKey]]. */
  def zorder_key(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ZOrderKey(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Morton (Z-order) interleave of two 31-bit dimension values: bit j of `a`
  * lands at position 2j, bit j of `b` at 2j+1. Sorting a table by this key
  * before writing clusters rows so that EVERY parquet row group covers a
  * small rectangle in (a, b) space — min/max pruning then works for
  * predicates on EITHER dimension (or both), where a plain sort only
  * prunes its leading column. The data-layout lever that complements
  * bucketing (co-located joins) and compaction (file counts) at 100 TB:
  * `events.orderBy(zorder_key(user_id, day))` makes both per-user scans
  * and per-day scans skip most row groups.
  *
  * Inputs are LONGs whose LOW 31 BITS are used (callers pre-bucket wider
  * domains) — 31, not 32, so the 62-bit key is ALWAYS non-negative and
  * sorts in interleaved order: a 32nd `b` bit would land on the sign bit
  * and make large-`b` rows sort FIRST, silently destroying the locality
  * the key exists for. Codegen'd with the standard O(log w) shift-mask
  * spreading, one per side — no loops, no branches. The DuckDB oracle
  * reproduces the key with an explicit 31-term bit sum, so the fused
  * magic-number form is verified against the definitional one. */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression
  with GraftImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  override def declaredInputTypes: Seq[DataType] = Seq(LongType, LongType)

  @inline private def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      def spreadCode(v: String): String =
        s"""$v &= 0x7FFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x3333333333333333L;
           |$v = ($v | ($v << 1)) & 0x5555555555555555L;""".stripMargin
      s"""
        long $xa = $a;
        long $xb = $b;
        ${spreadCode(xa)}
        ${spreadCode(xb)}
        ${ev.value} = $xa | ($xb << 1);
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
