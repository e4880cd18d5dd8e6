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
