package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Round-3 OLAP widening beyond the reference's flat GROUP BYs: multi-level
  * rollup aggregation and exact distributed percentiles — the two
  * aggregate shapes a warehouse user reaches for next (the reference
  * approximates both client-side: its two-level state rollup Q5 re-groups
  * a CTE, and it has no percentile at all — SURVEY.md §2.4 "no median/
  * percentile aggregates").
  */
object OlapQueries {

  import Queries.moneySum

  // ---------------------------------------------------------------------
  // q33 — ROLLUP revenue by (region, nation): one query produces the
  // nation grain, per-region subtotals, and the grand total, with a
  // grouping-level bitmask disambiguating subtotal NULLs from data NULLs.
  //
  // Scale: Catalyst lowers rollup to Expand (×3 row replication) feeding
  // ONE hash aggregate with map-side partials — cheaper than three
  // separate aggregations unioned (one shuffle, not three, and the two
  // coarser grains aggregate partially on the map side). The dimensions
  // (customer→nation→region) broadcast; orders⋈customer is the only
  // genuine shuffle.
  // ---------------------------------------------------------------------
  def q33Rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
    val r = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(r("r_name").as("region_name"), n("n_name").as("nation_name"),
        col("o_totalprice"), col("o_orderkey"))
      .rollup(col("region_name"), col("nation_name"))
      .agg(
        grouping_id().cast(IntegerType).as("lvl"),
        count(col("o_orderkey")).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_sales"))
      .orderBy(col("lvl"), col("region_name").asc_nulls_first,
        col("nation_name").asc_nulls_first)
  }

  val q33Sql: String =
    """SELECT region_name, nation_name,
      |       CAST(GROUPING(region_name, nation_name) AS INT) AS lvl,
      |       COUNT(o_orderkey) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
      |FROM (
      |  SELECT r.r_name AS region_name, n.n_name AS nation_name,
      |         o.o_totalprice, o.o_orderkey
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey)
      |GROUP BY ROLLUP(region_name, nation_name)
      |ORDER BY lvl, region_name NULLS FIRST, nation_name NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q34 — exact per-group percentiles (PERCENTILE_DISC semantics: the
  // value at rank ceil(p·n) under a deterministic total order) — median
  // and p90 of customer account balance per nation.
  //
  // Built from a PARTITIONED window (hash on nationkey — bounded groups,
  // nothing global) + one aggregate: rank every row within its group,
  // flag the two target ranks, max(when(flag)) collapses them. Exact — no
  // sketch — yet fully distributed; contrast q07b's approx-quantile tier,
  // which trades exactness for a single pass when groups are the whole
  // table. Both engines compute the same closed-form rank, so the value
  // is the same ROW, not a numerically-close interpolation (engines
  // disagree on interpolated PERCENTILE_CONT in low-order bits; DISC
  // picks a stored value, which hashes identically).
  // ---------------------------------------------------------------------
  def q34ExactMedian(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val cnt = Window.partitionBy(col("c_nationkey"))
    c.select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cnt))
      .withColumn("__med_rank", ((col("__n") + 1) / 2).cast(LongType))
      .withColumn("__p90_rank", ((col("__n") * 9 + 9) / 10).cast(LongType))
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        max(when(col("__rn") === col("__med_rank"), col("c_acctbal")))
          .as("median_acctbal"),
        max(when(col("__rn") === col("__p90_rank"), col("c_acctbal")))
          .as("p90_acctbal"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation_name"), col("n_customers"),
        col("median_acctbal"), col("p90_acctbal"))
      .orderBy(col("nation_name"))
  }

  val q34Sql: String =
    """WITH ranked AS (
      |  SELECT c_nationkey, c_acctbal,
      |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |           ORDER BY c_acctbal ASC, c_custkey ASC) AS rn,
      |         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM customer),
      |agg AS (
      |  SELECT c_nationkey, COUNT(*) AS n_customers,
      |         MAX(CASE WHEN rn = (n + 1) // 2 THEN c_acctbal END) AS median_acctbal,
      |         MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN c_acctbal END) AS p90_acctbal
      |  FROM ranked GROUP BY c_nationkey)
      |SELECT n.n_name AS nation_name, a.n_customers, a.median_acctbal, a.p90_acctbal
      |FROM agg a JOIN nation n ON a.c_nationkey = n.n_nationkey
      |ORDER BY nation_name""".stripMargin
}
