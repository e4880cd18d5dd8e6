package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asof join picks the latest right row at-or-before each left row") {
    val left = Seq((1L, ts(5), "p1"), (1L, ts(10), "p2"), (2L, ts(3), "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(5), 100L), (1L, ts(7), 200L), (2L, ts(4), 300L))
      .toDF("user_id", "ts", "rid")
    val out = AsOf.join(left, right, "user_id", "ts", "ts")
      .select(col("tag"), col("asof.rid"))
      .orderBy("tag").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq(
      ("p1", 100L), // equal timestamp matches (<=)
      ("p2", 200L), // latest preceding wins
      ("p3", -1L))) // right row is AFTER the left row → no match
  }

  test("asof join carries nulls before any right row exists") {
    val left = Seq((9L, ts(1), "early")).toDF("user_id", "ts", "tag")
    val right = Seq((9L, ts(2), 1L)).toDF("user_id", "ts", "rid")
    val out = AsOf.join(left, right, "user_id", "ts", "ts").collect()(0)
    assert(out.getAs[Any]("asof") == null)
  }
}
