package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass per-group k-minimum DISTINCT values aggregate — the KMV
  * ("k minimum values") sketch buffer of Beyer et al., SIGMOD 2007
  * ("On Synopses for Distinct-Value Estimation Under Multiset Operations").
  *
  * Keeps the k smallest distinct longs seen per group in a bounded
  * red-black tree: O(log k) per row, O(k) memory, map-side partial
  * aggregation (set union then trim is associative and commutative), and
  * set semantics by construction — duplicate inputs land on an existing
  * tree node and change nothing, so no pre-`distinct` shuffle is needed.
  * Feeding it [[Md5Hash60]] values makes the result a deterministic
  * order-/partitioning-independent sketch: the k smallest 60-bit hashes of
  * a set are a pure function of the set. [[graft.operators.Kmv]] builds
  * distinct-count / union / intersection estimators on top.
  *
  * Output: the sorted-ascending array of the ≤ k retained values.
  */
case class MinKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) MinKAgg.offer(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long], other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(v => MinKAgg.offer(buf, v, k))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    buf.forEach { v => out(i) = v.longValue(); i += 1 } // TreeSet iterates ascending
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(v => out.writeLong(v))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "min_k_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinKAgg {
  /** `min_k_distinct(value, k)` as an aggregate Column over a LONG input. */
  def min_k_distinct(value: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinKAgg(GraftColumnBridge.expression(value), k).toAggregateExpression())

  /** THE min-k insertion — one shared definition for the batch aggregate
    * buffer and the streaming keyed state
    * ([[graft.streaming.OnlineTimeStream.kmvDistinctUsers]]), the same
    * shared-definition discipline as [[Md5Hash60]]: the two tiers cannot
    * drift. No-op on duplicates and on values above the current k-th. */
  def offer(buf: java.util.TreeSet[java.lang.Long], v: Long, k: Int): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }
  }
}
