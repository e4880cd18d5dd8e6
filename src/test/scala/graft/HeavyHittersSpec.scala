package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HeavyHittersAgg.heavyHitters

/** Misra-Gries heavy-hitters aggregate: exact-regime equality with a
  * plain groupBy, partitioning independence, and the sub-capacity
  * frequency guarantee. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows, zipf-ish: token t_i appears ~1000/(i+1) times
  private def skewed = (0 until 12).flatMap { i =>
    Seq.fill(1000 / (i + 1))(s"t_$i")
  }

  test("exact regime (k >= distinct): counts equal groupBy, any partitioning") {
    val df = skewed.toDF("tok")
    val want = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts)
        .agg(heavyHitters(col("tok"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token"), col("e.cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("exact-regime output is sorted (cnt desc, token asc)") {
    val rows = skewed.toDF("tok")
      .agg(heavyHitters(col("tok"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.cnt"), col("e.token"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sortBy { case (c, t) => (-c, t) }.toSeq == rows.toSeq)
  }

  test("sub-capacity regime: every true heavy hitter survives, counts within n/k") {
    val n = skewed.size.toLong
    val k = 4
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = skewed.toDF("tok").repartition(3)
      .agg(heavyHitters(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k)
    // MG guarantee: any token with true freq > n/k is reported
    truth.filter(_._2 > n / k).keys.foreach(t => assert(got.contains(t), t))
    // and every reported count is an underestimate within n/k
    got.foreach { case (t, c) =>
      assert(c <= truth(t) && c >= truth(t) - n / k, s"$t: $c vs ${truth(t)}")
    }
  }

  test("works as a streaming aggregate (trending tokens per window)") {
    // TypedImperativeAggregate buffers serialize into the state store, so
    // the sketch works in streaming aggregation like any built-in —
    // trending-token tracking over an event stream
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = (0 until 300).map { i =>
      (new java.sql.Timestamp(t0 + i * 1000L), s"t_${i % 3}")
    }
    stream.addData(events)
    val q = graft.streaming.Realtime.startMemorySink(
      stream.toDF().toDF("ts", "tok")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(heavyHitters(col("tok"), 8).as("hh")),
      "t_trending", org.apache.spark.sql.streaming.OutputMode.Update)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_trending")
      .select(col("window.start").as("w"), explode(col("hh")).as("e"))
      .select(col("w"), col("e.token"), col("e.cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // 300 events over 5 minutes → one 10-minute window, 100 per token
    assert(got.length == 3)
    assert(got.forall(_._3 == 100L))
  }

  test("null inputs are ignored") {
    val got = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("tok")
      .agg(heavyHitters(col("tok"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
