package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.OlapQueries

/** q52's SCD-2 interval builder: a hand-checkable change log through the
  * exact production window algebra, plus the interval invariants every
  * type-2 dimension consumer relies on, asserted over the real table.
  */
class ScdSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("hand-built change log produces the expected type-2 intervals") {
    import spark.implicits._
    // cust 1: A, A (run collapses), B, A again (new version — value
    // RE-appearing must open a fresh interval, not merge with v1)
    // cust 2: single value -> one open row
    val changes = Seq(
      (1L, ts("1995-01-01"), "A"),
      (1L, ts("1995-02-01"), "A"),
      (1L, ts("1995-03-01"), "B"),
      (1L, ts("1995-04-01"), "A"),
      (2L, ts("1996-06-15"), "C")
    ).toDF("o_custkey", "o_orderdate", "prio")
    val got = OlapQueries.scd2Intervals(changes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getLong(5))).toSeq
    val high = Timestamp.valueOf(OlapQueries.ScdHighDate)
    val want = Seq(
      (1L, 1L, "A", ts("1995-01-01"), ts("1995-03-01"), 0L),
      (1L, 2L, "B", ts("1995-03-01"), ts("1995-04-01"), 0L),
      (1L, 3L, "A", ts("1995-04-01"), high, 1L),
      (2L, 1L, "C", ts("1996-06-15"), high, 1L))
    assert(got === want)
  }

  test("q52 intervals tile each customer's timeline with one open row") {
    val hist = OlapQueries.q52ScdHistory(spark, sfDir).cache()
    try {
      assert(hist.count() > 0)
      // exactly one is_current per customer, and it owns the high date
      val current = hist.groupBy(col("customer_id"))
        .agg(sum(col("is_current")).as("n_open"),
          max(col("valid_to")).as("max_to"))
      assert(current.filter(col("n_open") =!= 1L).isEmpty)
      assert(current
        .filter(col("max_to") =!= lit(OlapQueries.ScdHighDate).cast("timestamp"))
        .isEmpty)
      // versions are 1..n dense and intervals are contiguous: row k's
      // valid_to equals row k+1's valid_from (no gap, no overlap)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("customer_id")).orderBy(col("version_no"))
      val linked = hist
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .withColumn("next_ver", lead(col("version_no"), 1).over(w))
      assert(linked.filter(col("next_from").isNotNull &&
        (col("valid_to") =!= col("next_from") ||
          col("next_ver") =!= col("version_no") + 1L)).isEmpty)
      assert(linked.filter(col("version_no") === 1L).count() ===
        hist.select(col("customer_id")).distinct().count())
      // adjacent versions genuinely changed value (runs were collapsed)
      val chg = hist
        .withColumn("next_prio", lead(col("priority"), 1).over(w))
      assert(chg.filter(col("next_prio").isNotNull &&
        col("next_prio") === col("priority")).isEmpty)
    } finally hist.unpersist()
  }

  test("q54: every order lands in exactly ONE interval (the tiling proof, read side)") {
    val n = OlapQueries.q54AsOfDimension(spark, sfDir)
      .agg(sum(col("n_orders"))).head.getLong(0)
    val orders = Tables.orders(spark, sfDir).count()
    assert(n === orders,
      s"as-of join produced $n rows for $orders orders — intervals must tile")
    // and the interval-opening order matches its own interval's value:
    // each version's first day is the pinned change itself, so orders on
    // valid_from with the winning key must match
    val matched = OlapQueries.q54AsOfDimension(spark, sfDir)
      .agg(sum(col("n_matching"))).head.getLong(0)
    assert(matched > 0 && matched <= n)
  }
}
