package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982, "Finding
  * repeated elements"), with the mergeable-summaries merge of Agarwal,
  * Cormode, Huang, Phillips, Wei & Yi (PODS 2012).
  *
  * The buffer holds at most `k` (term → counter) entries regardless of
  * vocabulary size. Guarantee (the theorem this engine's heavy-hitter
  * pass leans on): for every term t,
  * {{{ true_count(t) − N/(k+1)  ≤  counter(t)  ≤  true_count(t) }}}
  * where an absent term has counter 0 and N is the TOTAL stream length.
  * Hence any term with true count > N/(k+1) MUST survive in the summary
  * — on any partitioning and any merge order — which makes the
  * candidate set a sound superset of the heavy hitters. The candidate
  * SET itself is order-dependent below the threshold, so it is never
  * oracle-gated directly; [[graft.operators.Sketches.heavyHitters]]
  * re-counts candidates exactly and filters to the guaranteed region,
  * giving a fully deterministic result.
  *
  * Update: present → +1; absent with room → insert 1; absent and full →
  * decrement ALL counters by 1, dropping zeros (the "pairing off" step —
  * each decrement retires k+1 occurrences, bounding total error by
  * N/(k+1)). Merge: add counters pointwise; if over k entries, subtract
  * the (k+1)-th largest counter from all and drop non-positive — the
  * PODS'12 rule that keeps the summed error bound, making partial
  * (map-side) aggregation sound.
  *
  * At 100 TB this is the heavy-hitter plan you want: O(k) memory per
  * partition, one tiny merged summary at the driver of the aggregation
  * tree, no shuffle of the long-tail vocabulary — versus a full groupBy
  * that shuffles every distinct term.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < k => buf.update(t, 1L)
        case None =>
          // Pair the new occurrence off against one of each counter.
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      // (k+1)-th largest counter; subtracting it everywhere keeps the
      // combined error ≤ N1/(k+1) + N2/(k+1) (Agarwal et al. 2012, §3).
      val cut = buf.values.toArray.sortInPlaceWith(_ > _).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Candidates as array<struct<term, mg_count>>, counter desc then term
    * asc. mg_count is a LOWER bound on the true count (within N/(k+1)).
    * Order-dependent below the heavy-hitter threshold — downstream must
    * re-count exactly before gating (see scaladoc). */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }: Array[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.update(in.readUTF(), in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("mg_count", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** `misra_gries(term, k)` as an aggregate Column. */
  def misra_gries(term: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAgg(GraftColumnBridge.expression(term), k).toAggregateExpression())
}
