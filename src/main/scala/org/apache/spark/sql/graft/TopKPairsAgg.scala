package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded per-group top-k over (score: Long, id: Long) pairs, ordered by
  * score DESC then id ASC — the postings-list aggregate of an inverted
  * index: for each term, keep the k highest-tf documents without ever
  * materializing the full postings list on one reducer.
  *
  * Why not a window: `row_number() OVER (PARTITION BY term ORDER BY tf
  * DESC)` shuffles EVERY (term, doc, tf) row to the term's single
  * reducer — for a stopword at 100 TB that partition is corpus-sized
  * (the exact skew class the repo's other windows avoid by partitioning
  * on bounded keys, e.g. d36's per-doc window). This aggregate keeps a
  * k-element min-heap per group with the standard mergeable-summaries
  * union-then-trim merge, so map-side partial aggregation bounds the
  * shuffle to ≤ k pairs per (term, map partition) and AQE/partial-agg
  * work exactly like built-in aggregates.
  *
  * The result is DETERMINISTIC (a total order on (score desc, id asc)
  * decides membership and output order), so — unlike a reservoir sample —
  * it is oracle-checkable: DuckDB reproduces it with a windowed
  * row_number at test scale.
  *
  * Third `TypedImperativeAggregate` of the extension surface (siblings:
  * [[BottomKAgg]], [[HeavyHittersAgg]]).
  */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  // min-heap on goodness: head = the WORST kept pair (smallest score;
  // among score ties, the largest id), i.e. the eviction candidate.
  private val worstFirst: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](worstFirst)

  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def add(buf: mutable.PriorityQueue[(Long, Long)], p: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(p)
    else if (beats(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) add(buf, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sortWith(beats)
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairsAgg {
  /** Column-API surface: `topKPairs($"tf", $"doc_id", 5)` aggregates to
    * the array of the 5 (score,id) pairs ranked by score desc, id asc. */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairsAgg(
        ExpressionUtils.expression(score),
        ExpressionUtils.expression(id), k).toAggregateExpression())
}
