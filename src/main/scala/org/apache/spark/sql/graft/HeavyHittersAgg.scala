package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters aggregate: tracks up to k counters over a
  * string column in O(k) memory, with the standard mergeable-summaries
  * merge (sum matching counters; if over capacity, subtract the (k+1)-th
  * largest count and drop non-positives — Agarwal et al., "Mergeable
  * Summaries"), so map-side partial aggregation and AQE work exactly like
  * built-in aggregates.
  *
  * Guarantees: every item with true frequency > n/k is present, and each
  * reported count c satisfies true − n/k ≤ c ≤ true. When k ≥ |distinct|
  * no decrement ever fires and the counts are EXACT and order-independent
  * — that regime is the oracle contract (DuckDB reproduces it with a
  * plain GROUP BY count); the sub-capacity regime is property-tested
  * (HeavyHittersSpec) instead, since its counters are arrival-order
  * dependent within the error bound.
  *
  * Second `TypedImperativeAggregate` of the extension surface (first:
  * [[BottomKAgg]]) — the corpus-vocabulary operator for when an exact
  * token groupBy at 100 TB would shuffle billions of distinct keys but
  * only the frequent tail matters.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString // copy out of the row buffer
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < k => buf(s) = 1L
        case None => decrementAll(buf, 1L) // classic MG: no insert when full
      }
    }
    buf
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (s, c) =>
      if (c - by <= 0) dead += s else buf(s) = c - by
    }
    dead.foreach(buf.remove)
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf(s) = buf.getOrElse(s, 0L) + c }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, keeping ≤ k positives
      val m = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      decrementAll(buf, m)
    }
    buf
  }

  /** Sorted (count desc, token asc) — a total order, so the array is
    * deterministic whenever the counts are (always, in the exact regime). */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toArray.sortBy { case (s, c) => (-c, s) }
        .map { case (s, c) =>
          InternalRow(UTF8String.fromString(s), c)
        })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf(new String(b, StandardCharsets.UTF_8)) = bb.getLong
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
}

object HeavyHittersAgg {
  /** Column-API surface: `heavyHitters($"tok", 64)` aggregates to the
    * array of (token, cnt) structs sorted by count desc, token asc. */
  def heavyHitters(c: Column, k: Int): Column =
    ExpressionUtils.column(
      HeavyHittersAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
