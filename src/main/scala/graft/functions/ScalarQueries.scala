package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checked query bundles for the scalar library (SURVEY.md §2.8):
  * f01 exercises the cleaning vocabulary (F1/F2/F4/F16) over customers,
  * f02 the multi-format timestamp parse (F7) over orders. */
object ScalarQueries {

  def f01ScalarSuite(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    Scalars.minMaxScaled(c, col("c_acctbal"), "acct_scaled", 5.0, 100.0)
      .select(
        col("c_custkey").as("cust_id"),
        Scalars.asciiFold(col("c_name")).as("name_folded"),
        Scalars.normalizeKey(col("c_mktsegment")).as("segment_norm"),
        Scalars.stripFloatArtifact(
          concat(col("c_custkey").cast("string"), lit(".0"))).as("key_str"),
        col("acct_scaled"))
      .orderBy(col("cust_id"))
  }

  val f01Sql: String =
    """SELECT c_custkey AS cust_id,
      |       lower(trim(strip_accents(c_name))) AS name_folded,
      |       regexp_replace(lower(trim(c_mktsegment)), '[^a-zA-Z0-9 ]', '', 'g') AS segment_norm,
      |       regexp_replace(CAST(c_custkey AS VARCHAR) || '.0', '\.0$', '') AS key_str,
      |       CASE WHEN mm.mx = mm.mn THEN 5.0
      |            ELSE ((c_acctbal - mm.mn) / (mm.mx - mm.mn)) * 95.0 + 5.0 END AS acct_scaled
      |FROM customer CROSS JOIN
      |  (SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx FROM customer) mm
      |ORDER BY cust_id""".stripMargin

  /** f02: strings arrive in two formats (keyed by order parity); the
    * multi-format coalesce parses both — the reference's 4-format
    * ingestion contract (`ingestion_script.py:182`). */
  def f02MultiFormatParse(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.withColumn("raw_ts",
        when(col("o_orderkey") % 2 === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
          .otherwise(date_format(col("o_orderdate"), "yyyy/MM/dd")))
      .select(
        col("o_orderkey").as("order_id"),
        col("raw_ts"),
        Scalars.parseTimestampMulti(col("raw_ts"), Scalars.referenceFormats)
          .as("parsed_ts"))
      .orderBy(col("order_id"))
  }

  val f02Sql: String =
    """SELECT o_orderkey AS order_id,
      |       CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |            ELSE strftime(o_orderdate, '%Y/%m/%d') END AS raw_ts,
      |       COALESCE(
      |         try_strptime(CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                           ELSE strftime(o_orderdate, '%Y/%m/%d') END, '%Y-%m-%d %H:%M:%S'),
      |         try_strptime(CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                           ELSE strftime(o_orderdate, '%Y/%m/%d') END, '%Y-%m-%d'),
      |         try_strptime(CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                           ELSE strftime(o_orderdate, '%Y/%m/%d') END, '%Y/%m/%d %H:%M:%S'),
      |         try_strptime(CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                           ELSE strftime(o_orderdate, '%Y/%m/%d') END, '%Y/%m/%d')) AS parsed_ts
      |FROM orders ORDER BY order_id""".stripMargin
}
