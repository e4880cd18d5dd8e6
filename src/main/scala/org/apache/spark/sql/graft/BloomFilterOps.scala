package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column surface over Spark's internal Bloom-filter membership
  * expression (`BloomFilterMightContain` — the predicate Spark's own
  * runtime-filter injection plants on the probe side of large joins; it
  * is `private[sql]`-adjacent catalyst machinery, hence this package).
  *
  * The filter bytes ride as a foldable BinaryType literal, so the
  * predicate is codegen'd and the deserialized sketch is cached per task
  * by the expression itself. Hash contract: `DataFrameStatFunctions
  * .bloomFilter` puts LongType columns via `putLong`, and
  * `BloomFilterMightContain` probes LongType values via
  * `mightContainLong` — the same `org.apache.spark.util.sketch
  * .BloomFilter` class on both sides, so build and probe agree by
  * construction.
  */
object BloomFilterOps {

  /** `mightContain(bytes, $"h")` — true iff the serialized Bloom filter
    * possibly contains the long value (no false negatives). */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      ExpressionUtils.expression(value)))
}
