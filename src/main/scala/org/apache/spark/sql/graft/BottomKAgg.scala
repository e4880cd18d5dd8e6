package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bottom-k sketch aggregate (the KMV / k-minimum-values distinct-count
  * estimator of Bar-Yossef et al.): keeps the k smallest values of a long
  * column in a bounded max-heap buffer; buffers merge by union-then-trim,
  * so partial aggregation and AQE work exactly like built-in aggregates.
  *
  * Unlike HLL (`approx_count_distinct`), the sketch CONTENT is
  * deterministic — the k smallest md5-derived hashes are the same in any
  * engine — so the result is oracle-checkable: DuckDB reproduces it as
  * `list_sort(list(h))[1:k]`. The distinct-count estimate derives as
  * (k−1) · 2^60 / kth-min for hashes uniform on [0, 2^60).
  *
  * This is the `TypedImperativeAggregate` tier of the extension surface
  * (scalar tier: [[DotProduct]]): mutable buffer, custom serialization,
  * map-side partials — the pattern any mergeable sketch (HLL, quantile,
  * reservoir) plugs into.
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[Long] =
    scala.collection.mutable.PriorityQueue.empty[Long] // max-heap

  override def update(
      buf: scala.collection.mutable.PriorityQueue[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): scala.collection.mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  private def add(buf: scala.collection.mutable.PriorityQueue[Long], v: Long): Unit =
    if (buf.size < k) buf.enqueue(v)
    else if (v < buf.head) { buf.dequeue(); buf.enqueue(v) }

  override def merge(
      buf: scala.collection.mutable.PriorityQueue[Long],
      other: scala.collection.mutable.PriorityQueue[Long]): scala.collection.mutable.PriorityQueue[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(buf.toArray.sorted)

  override def serialize(buf: scala.collection.mutable.PriorityQueue[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(child = newChildren.head)
}

object BottomKAgg {
  /** Column-API surface: `bottomK($"h", 16)` aggregates to the sorted
    * array of the 16 smallest values. */
  def bottomK(c: Column, k: Int): Column =
    ExpressionUtils.column(
      BottomKAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
