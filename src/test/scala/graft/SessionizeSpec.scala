package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Sessionize

/** Streaming sessionization (flatMapGroupsWithState) equals the batch
  * gaps-and-islands form, including sessions assembled ACROSS
  * micro-batches. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")

  private val events = Seq(
    // user 1: two sessions (gap 40 min between minute 10 and 50)
    Sessionize.In(1, ts(0), 1L, "view", 1.0),
    Sessionize.In(2, ts(10), 1L, "click", 2.5),
    Sessionize.In(3, ts(50), 1L, "view", 3.0),
    Sessionize.In(4, ts(55), 1L, "purchase", 10.0),
    // user 2: one session spanning the micro-batch split
    Sessionize.In(5, ts(5), 2L, "view", 1.0),
    Sessionize.In(6, ts(20), 2L, "view", 1.0))

  test("streaming sessions == batch sessions, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Sessionize.In]
    stream.addData(events.take(3)) // splits user 1's day AND user 2's session
    stream.addData(events.drop(3))
    val q = Sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("t_sessions")
      .outputMode(OutputMode.Update).start()
    q.processAllAvailable()
    q.stop()
    // last-write-wins per (user, session_start) — the KV-sink contract
    val got = spark.table("t_sessions")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "session_start")
          .orderBy(col("session_end").desc, col("n_events").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = graft.analytics.EventQueries
      .sessionize(events.toDF())
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == want)
    assert(want.size == 3) // 2 sessions for user 1, 1 for user 2
  }
}
