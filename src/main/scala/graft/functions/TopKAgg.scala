package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass per-group top-K aggregate (SURVEY.md §2.10).
  *
  * The window formulation of "top K rows per group" —
  * `row_number().over(partitionBy(g).orderBy(v.desc))` then `rn <= k` —
  * sorts every group in full. This [[TypedImperativeAggregate]] keeps a
  * bounded K-element min-heap per group instead: O(n log K) per partition,
  * map-side partial aggregation (the heap merges associatively), and no
  * sort of the long tail. At 100 TB that's the difference between
  * shuffling whole groups and shuffling K rows per group.
  *
  * Input: a struct column `(score: Double, id: Long)`; output: the top-K
  * (score, id) structs, ordered score desc then id asc (deterministic
  * tiebreak, matching the engine-wide ranking convention).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  // "Better" = higher score, ties -> smaller id. Under this ordering the
  // GREATEST tuple is the weakest (lowest score / largest id), so the
  // PriorityQueue head is the eviction candidate.
  private val heapOrder: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrder)

  override def update(buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        offer(buf, (row.getDouble(0), row.getLong(1)))
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)], other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (heapOrder.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) } // e better than weakest

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(sorted.map { case (s, id) => InternalRow(s, id) }: Array[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** `top_k(struct(score, id), k)` as an aggregate Column. */
  def top_k(scoreAndId: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(GraftColumnBridge.expression(scoreAndId), k).toAggregateExpression())
}
