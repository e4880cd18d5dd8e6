package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency-distribution operators (reference A11 `value_counts`,
  * W3 share-of-total — `run_analytics.py:180,204,208,212`).
  *
  * pandas `value_counts(normalize=True)` silently drops NaN keys; we make
  * that explicit with a `filter(isNotNull)` (SURVEY.md §7.4.1).
  *
  * Scale: implemented as groupBy-count (map-side partial aggregation) plus a
  * broadcast of the single-row grand total — NOT a
  * `Window.partitionBy()` (empty partition spec), which would funnel every
  * row through one task at 100 TB. The grand total after grouping is tiny
  * (one row per distinct key), so the second aggregate + broadcast join is
  * effectively free and keeps every stage parallel.
  */
object Distribution {

  /** Counts + percentage share per distinct value of `key`.
    * No round(): `n * 100.0 / total` on exact integers is identical IEEE
    * double arithmetic in every engine, while round-on-double is not. */
  def valueCountsPct(df: DataFrame, key: Column, keyName: String): DataFrame = {
    val counts = df.filter(key.isNotNull)
      .groupBy(key.as(keyName)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("pct", col("n") * lit(100.0) / col("__total"))
      .drop("__total")
  }
}
