package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftImplicitCastInputTypes
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

  /** Symmetric per-vector int8 quantization: one byte per dimension. */
  def pack_int8(e: Column, scale: Column): Column =
    GraftColumnBridge.column(
      PackInt8(GraftColumnBridge.expression(e), GraftColumnBridge.expression(scale)))

  /** Inverse of [[pack_int8]]: binary + scale back to ArrayType(Double). */
  def unpack_int8(bin: Column, scale: Column): Column =
    GraftColumnBridge.column(
      UnpackInt8(GraftColumnBridge.expression(bin), GraftColumnBridge.expression(scale)))
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

/** Symmetric per-vector int8 quantization — the 4× storage lever for an
  * embedding corpus at 100 TB (a 64-dim float32 vector is 256 payload
  * bytes; quantized it is 64 bytes + one float scale). q_i = round(e_i /
  * scale · 127), rounding half AWAY from zero (BigDecimal HALF_UP /
  * DuckDB semantics — java.lang.Math.round rounds half toward +∞ and
  * would diverge on negative midpoints). `scale` is the vector's max |e_i|
  * computed by the caller and stored alongside the blob. A zero-vector
  * (scale = 0) packs to all-zero bytes. */
case class PackInt8(left: Expression, right: Expression) extends BinaryExpression
  with GraftImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_int8"

  // Registered on the SQL surface (pack_int8), so the input contract must
  // be analysis-time: without it, an array<int> argument silently reads
  // int-encoded ArrayData as doubles (garbage bytes) and a non-double
  // scale throws ClassCastException at runtime. The cast-input contract
  // makes the analyzer insert implicit casts or reject the call.
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), DoubleType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val out = new Array[Byte](e.numElements())
    var i = 0
    while (i < out.length) {
      if (scale != 0.0) {
        val x = e.getDouble(i) / scale * 127.0
        out(i) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toByte
      }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
        byte[] $out = new byte[$a.numElements()];
        for (int $i = 0; $i < $out.length; $i++) {
          if ($s != 0.0) {
            double $x = $a.getDouble($i) / $s * 127.0;
            $out[$i] = (byte) ($x >= 0 ? java.lang.Math.floor($x + 0.5d)
                                       : java.lang.Math.ceil($x - 0.5d));
          }
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Inverse of [[PackInt8]]: dq_i = (q_i · scale) / 127 — the evaluation
  * order is part of the contract (mirrored in the DuckDB oracle so the
  * doubles are bit-identical). */
case class UnpackInt8(left: Expression, right: Expression) extends BinaryExpression
  with GraftImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unpack_int8"

  // Same analysis-time contract as PackInt8 (SQL-surface function).
  override def declaredInputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val scale = b.asInstanceOf[Double]
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) * scale / 127.0; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
        double[] $out = new double[$a.length];
        for (int $i = 0; $i < $out.length; $i++) {
          $out[$i] = $a[$i] * $s / 127.0;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
