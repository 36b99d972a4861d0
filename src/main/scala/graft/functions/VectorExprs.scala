package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd vector primitives for the similarity operators.
  *
  * Motivation (measured, sf0.1): Spark's higher-order array functions
  * (`aggregate`/`zip_with`) evaluate interpreted, one lambda call per
  * element with boxing — the LSH signature (64 plane dots × 64 dims per
  * row) and the pairwise cosine dots dominated `ann_lsh` at ~5 s. These
  * expressions generate tight primitive Java loops instead (preference
  * order (b) of the design brief: custom Expression before custom plan).
  */
object VectorExprs {
  /** dot(a, b) over two ArrayType(Double) columns, index-ordered. */
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** All multi-table LSH bucket signatures in one pass: returns
    * Array[Long] of length planes.length (one bucket id per table). */
  def lsh_buckets(e: Column, planes: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(LshBuckets(GraftColumnBridge.expression(e), planes))
}

/** Index-ordered dot product — same summation order as the DuckDB oracle's
  * sequential fold, so results stay bit-comparable. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs.getDouble(i) * ys.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane signatures for every LSH table in one traversal:
  * bucket_t = Σ_j [dot(e, plane_{t,j}) >= 0] << j. The plane tensor rides
  * along as a codegen reference object — no per-row literal array
  * construction, no interpreted lambdas. */
case class LshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Any](planes.length)
    var t = 0
    while (t < planes.length) {
      var bucket = 0L
      var j = 0
      while (j < planes(t).length) {
        val p = planes(t)(j)
        var dot = 0.0
        var i = 0
        val n = math.min(e.length, p.length)
        while (i < n) { dot += e(i) * p(i); i += 1 }
        if (dot >= 0.0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      val e = ctx.freshName("e")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
        double[] $e = $c.toDoubleArray();
        long[] $out = new long[$planesRef.length];
        for (int $t = 0; $t < $planesRef.length; $t++) {
          long $bucket = 0L;
          for (int $j = 0; $j < $planesRef[$t].length; $j++) {
            double[] $p = $planesRef[$t][$j];
            double $dot = 0.0;
            int n = java.lang.Math.min($e.length, $p.length);
            for (int $i = 0; $i < n; $i++) { $dot += $e[$i] * $p[$i]; }
            if ($dot >= 0.0) $bucket |= (1L << $j);
          }
          $out[$t] = $bucket;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
