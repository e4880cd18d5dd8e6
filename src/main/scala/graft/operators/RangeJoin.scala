package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Range (point-in-interval) join — the second operator Spark's built-ins
  * only plan as a nested-loop (tier (a) composition, like [[AsOf]]):
  * match each point `(key, ts)` to intervals `(key, start, end)` with
  * `start <= ts <= end`.
  *
  * Composition: intervals explode to the fixed-width time buckets they
  * overlap; points compute their single bucket; the join becomes an
  * EQUI-join on (key, bucket) refined by the exact BETWEEN predicate —
  * a hash join instead of BroadcastNestedLoop. Bucket width trades
  * duplication (long intervals explode to many buckets) against join
  * selectivity; pick it near the median interval length.
  *
  * A point meets a given interval in exactly one bucket (its own), so the
  * explode introduces no duplicate matches.
  */
object RangeJoin {

  /** Exact floor-division bucket id. Plain `/`+cast truncates toward zero,
    * which floors pre-1970 (negative-micros) points and interval endpoints
    * inconsistently and silently drops matches (ADVICE r1); and double
    * division loses precision above 2^53 (epoch-micros are ~1.7e18), so
    * the quotient is built from integer ops only: truncating DIV, then -1
    * when a negative dividend had a nonzero remainder. */
  private def bucketOf(micros: Column, bucketMicros: Long): Column = {
    // pmod is non-negative, so (micros - r) is the exact long multiple of
    // the bucket width at-or-below micros; its double quotient has
    // |error| << 0.5 for any bucketSeconds >= 1 (quotient <= 2^63/10^6 <
    // 2^53), so round() recovers the exact floor quotient.
    val r = pmod(micros, lit(bucketMicros))
    round((micros - r) / lit(bucketMicros)).cast(LongType)
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val b = bucketSeconds * 1000000L
    val taggedIntervals = intervals.withColumn("__bucket",
      explode(sequence(
        bucketOf(unix_micros(col(startCol)), b),
        bucketOf(unix_micros(col(endCol)), b))))
    val taggedPoints = points.withColumn("__bucket",
      bucketOf(unix_micros(col(tsCol)), b))
    taggedPoints.join(taggedIntervals, Seq(key, "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** q31 — every event matched to its enclosing session interval (from
    * q29's gaps-and-islands sessions): a natural point-in-interval
    * workload whose oracle is a plain BETWEEN join. */
  def q31RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val sessions = graft.analytics.EventQueries
      .sessionize(Tables.events(spark, dir))
      .select(col("user_id"), col("session_no"),
        col("session_start"), col("session_end"))
    pointInInterval(e, sessions, "user_id", "ts",
        "session_start", "session_end", bucketSeconds = 3600)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("session_no"), col("session_start"), col("session_end"))
      .orderBy(col("event_id"), col("session_no"))
  }

  val q31Sql: String = {
    val sessionsCte = graft.analytics.EventQueries.q29Sql
      .replace("ORDER BY user_id, session_no", "")
    s"""WITH sessions AS ($sessionsCte)
       |SELECT e.event_id, e.user_id, e.ts,
       |       s.session_no, s.session_start, s.session_end
       |FROM events e JOIN sessions s
       |  ON e.user_id = s.user_id
       | AND e.ts BETWEEN s.session_start AND s.session_end
       |ORDER BY event_id, session_no""".stripMargin
  }
}
