package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Event-stream analytics S-Q1..S-Q5 (SURVEY.md §2.10/§2.12) — the
  * reference's Kafka→Redis realtime metrics (`consumer.py:192-344`)
  * re-expressed as declarative aggregations. Each is defined on a plain
  * DataFrame so the SAME function runs in batch (here, for the
  * DuckDB-checked correctness tier) and on a streaming frame (see
  * `graft.streaming.Realtime`, which reuses these transforms with
  * watermarks) — one definition, two execution modes, which is exactly the
  * Structured Streaming model.
  */
object EventQueries {

  /** S-Q1 (ST1): tumbling 1-minute counts per event type
    * (`consumer.py:200-204`). Batch form uses date_trunc — identical
    * bucketing to `window($"ts", "1 minute")` for tumbling windows. */
  def minutelyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("minute", col("ts")).as("minute"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  def q23MinutelyCounts(spark: SparkSession, dir: String): DataFrame =
    minutelyCounts(Tables.events(spark, dir))
      .orderBy(col("minute"), col("event_type"))

  val q23Sql: String =
    """SELECT date_trunc('minute', ts) AS minute, event_type, COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY minute, event_type""".stripMargin

  /** S-Q2 (ST2): tumbling 1-minute revenue + cart-value sums
    * (`consumer.py:250-251,313-315`) — purchase events only. */
  def minutelyRevenue(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(
        Queries.moneySum(col("value")).as("revenue"),
        count(lit(1)).as("n_purchases"))

  def q24MinutelyRevenue(spark: SparkSession, dir: String): DataFrame =
    minutelyRevenue(Tables.events(spark, dir)).orderBy(col("minute"))

  val q24Sql: String =
    """SELECT date_trunc('minute', ts) AS minute,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_purchases
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY minute""".stripMargin

  /** S-Q3 (ST3/A17): running totals since start per event type
    * (`consumer.py:146-189`) — in streaming this is the `update`-mode
    * global aggregate; in batch, a plain groupBy. */
  def runningTotals(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Queries.moneySum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))

  def q25RunningTotals(spark: SparkSession, dir: String): DataFrame =
    runningTotals(Tables.events(spark, dir)).orderBy(col("event_type"))

  val q25Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** S-Q4 (ST4/A18+T5): per-user leaderboard, top-10 by event count
    * (`consumer.py:207-216` + `utils.py:143-150`). Deterministic tie-break
    * on user_id. Scale: groupBy shuffles once on user_id; the top-k is a
    * TakeOrderedAndProject (no global sort materialization). */
  def userLeaderboard(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        Queries.moneySum(col("value")).as("total_value"))

  def q26TopUsers(spark: SparkSession, dir: String): DataFrame =
    userLeaderboard(Tables.events(spark, dir))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(10)

  val q26Sql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1
      |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin

  /** S-Q5 (ST5/T6): most-recent-100 event feed (`consumer.py:219-226`
    * LPUSH+LTRIM ring buffer) — ordered by event time desc, id desc. */
  def q27RecentFeed(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(100)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

  val q27Sql: String =
    """SELECT event_id, ts, user_id, event_type, value
      |FROM events ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin

  /** N2 — explode of nested order items (`consumer.py:317-325`): the
    * events table carries a JSON props column; parse it (N1 from_json) and
    * aggregate on the extracted field — exercising the JSON path the
    * reference's order events use. */
  def q28PropsExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast(DoubleType) / count(col("k"))).as("avg_k"))
      .orderBy(col("event_type"))
  }

  val q28Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS DOUBLE)
      |         / COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS avg_k
      |FROM events
      |WHERE CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL
      |GROUP BY 1 ORDER BY event_type""".stripMargin
}
