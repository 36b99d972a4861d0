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

/** Bounded collect for hot-key-safe list aggregation: gathers the
  * SMALLEST `cap` long values of each group in ascending order, or NULL
  * when the group exceeds `cap` elements — the memory-safe replacement
  * for `collect_list` + post-filter when a group's size is adversarial
  * (a corpus-wide boilerplate shingle would otherwise materialize its
  * full million-element doc list inside ONE aggregation buffer before
  * any filter runs).
  *
  * The buffer is a max-heap truncated at `cap + 1` entries, so per-group
  * memory is O(cap) REGARDLESS of group size, the aggregate stays
  * map-side combinable (heap merge is associative + commutative), and
  * overflow is detected exactly: a heap that still holds `cap + 1`
  * entries after all merges proves the true group size exceeds `cap`
  * (conversely a group of ≤ cap distinct values is returned COMPLETE —
  * truncation can only ever drop values beyond the cap+1'th smallest).
  * Requires distinct inputs per group for the completeness guarantee
  * (the shingle pipeline's (sh, doc_id) rows are distinct by
  * construction).
  */
case class CappedCollectLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long] // max-heap: head = largest = eviction candidate

  override def update(buf: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Long], other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[Long], v: Long): Unit =
    if (buf.size <= cap) buf.enqueue(v) // grow to at most cap + 1 entries
    else if (v < buf.head) { buf.dequeue(); buf.enqueue(v) }

  override def eval(buf: mutable.PriorityQueue[Long]): Any =
    if (buf.size > cap) null // overflow: true group size exceeds the cap
    else new GenericArrayData(buf.toArray.sorted.map(x => x: Any))

  override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue(in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "capped_collect_longs"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CappedCollectLongs {
  /** `capped_collect_longs(v, cap)` as an aggregate Column: ascending
    * array of the group's values, NULL when the group exceeds `cap`. */
  def capped_collect(v: Column, cap: Int): Column =
    GraftColumnBridge.column(
      CappedCollectLongs(GraftColumnBridge.expression(v), cap).toAggregateExpression())
}
