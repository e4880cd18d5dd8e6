package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{Dedup, Validate}

/** Silver-layer transforms Q18–Q22 (SURVEY.md §2.12): the reference's
  * staging operators — window dedup maps, mean imputation via a 1-row cross
  * join, enrichment joins with fallback keys, latest-wins dedup with
  * timestamp coalescing, and the ingestion validation/quarantine split —
  * instantiated over the driver test tables.
  */
object StagingQueries {

  // ---------------------------------------------------------------------
  // Q18 — window dedup map (reference A12, `spark_transform.py:365-373`:
  // one geolocation_id per zip, tie-break lowest lat). Here: one canonical
  // lineitem per (partkey, suppkey), tie-break earliest shipdate then
  // (orderkey, linenumber) for full determinism — the reference's
  // "computed in Postgres via JDBC subquery" round-trip (S8) replaced by
  // the native window (SURVEY.md §3.2).
  // Scale: one shuffle on the key pair; skewed hot keys → AQE or a
  // min_by pre-aggregate (same semantics for single-column payloads).
  // ---------------------------------------------------------------------
  def q18DedupMap(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    Dedup.keepFirst(l, Seq("l_partkey", "l_suppkey"),
        Seq(col("l_shipdate").asc_nulls_first, col("l_orderkey").asc,
          col("l_linenumber").asc))
      .select(
        col("l_partkey").as("part_id"),
        col("l_suppkey").as("supplier_id"),
        col("l_orderkey").as("first_order_id"),
        col("l_linenumber").as("first_line_no"),
        to_date(col("l_shipdate")).as("first_ship_date"))
      .orderBy(col("part_id"), col("supplier_id"))
  }

  val q18Sql: String =
    """SELECT l_partkey AS part_id, l_suppkey AS supplier_id,
      |       l_orderkey AS first_order_id, l_linenumber AS first_line_no,
      |       CAST(l_shipdate AS DATE) AS first_ship_date
      |FROM lineitem
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
      |                           ORDER BY l_shipdate NULLS FIRST, l_orderkey, l_linenumber) = 1
      |ORDER BY part_id, supplier_id""".stripMargin

  /** q18b — the SKEW-PATH twin of q18: identical semantics and oracle,
    * executed through [[Dedup.keepFirstSalted]]'s two-phase salted
    * reduction instead of a window. A pathologically hot (partkey,
    * suppkey) never lands on one task with all its rows — each of the 16
    * salt shards reduces ~1/16 of it with map-side combine, then ≤16
    * survivors per key meet in phase 2. The ordering tuple packs as
    * (epoch-micros, (orderkey, linenumber)) — null shipdates sort first
    * via the Long.MinValue coalesce, matching q18's NULLS FIRST. This is
    * the plan to reach for when AQE skew stats arrive too late (e.g. the
    * hot key is known a priori); the gate proving both forms hash-equal
    * is the point of registering it. */
  def q18bDedupMapSalted(spark: SparkSession, dir: String): DataFrame = {
    // project FIRST: keepFirstSalted packs every input column into its
    // min-struct payload, which blocks Catalyst's column pruning — the
    // explicit 5-column projection is what reaches the parquet scan
    val l = Tables.lineitem(spark, dir).select(
      col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
      col("l_linenumber"), col("l_shipdate"))
    Dedup.keepFirstSalted(l, Seq("l_partkey", "l_suppkey"),
        ord = coalesce(unix_micros(col("l_shipdate")), lit(Long.MinValue)),
        tieBreaker = struct(col("l_orderkey"), col("l_linenumber")))
      .select(
        col("l_partkey").as("part_id"),
        col("l_suppkey").as("supplier_id"),
        col("l_orderkey").as("first_order_id"),
        col("l_linenumber").as("first_line_no"),
        to_date(col("l_shipdate")).as("first_ship_date"))
      .orderBy(col("part_id"), col("supplier_id"))
  }

  // ---------------------------------------------------------------------
  // Q19 — STG products: mean imputation via 1-row cross join + category
  // fallback (reference J7+F5, `staging_layer.py:203-225`: NVL(dim,
  // AVG(dim)) from a single-row aggregate subquery, COALESCE(category,
  // 'others')). The means frame is one row → broadcast cross join, free at
  // any scale.
  // ---------------------------------------------------------------------
  def q19ProductImputation(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val means = p.agg(
      (sum(col("p_size")).cast(DoubleType) / count(col("p_size"))).as("__avg_size"),
      Queries.moneyAvg(col("p_retailprice")).as("__avg_price"))
    p.crossJoin(broadcast(means))
      .select(
        col("p_partkey").as("part_id"),
        coalesce(col("p_type"), lit("others")).as("category"),
        coalesce(col("p_brand"), lit("others")).as("brand"),
        coalesce(col("p_size").cast(DoubleType), col("__avg_size")).as("size_filled"),
        coalesce(col("p_retailprice"), col("__avg_price")).as("price_filled"))
      .orderBy(col("part_id"))
  }

  val q19Sql: String =
    """SELECT p_partkey AS part_id,
      |       COALESCE(p_type, 'others') AS category,
      |       COALESCE(p_brand, 'others') AS brand,
      |       COALESCE(CAST(p_size AS DOUBLE), m.avg_size) AS size_filled,
      |       COALESCE(p_retailprice, m.avg_price) AS price_filled
      |FROM part CROSS JOIN (
      |  SELECT CAST(SUM(p_size) AS DOUBLE) / COUNT(p_size) AS avg_size,
      |         CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(p_retailprice) AS avg_price
      |  FROM part) m
      |ORDER BY part_id""".stripMargin

  // ---------------------------------------------------------------------
  // Q20 — enrichment join with fallback key (reference J8+F5,
  // `staging_layer.py:257-284`: every customer × a fallback geolocation row,
  // COALESCE(geo_id, fallback_id)). Customer ⟕ nation ⟕ region with -1 /
  // 'UNKNOWN' fallbacks. nation/region broadcast — zero extra shuffles.
  // ---------------------------------------------------------------------
  def q20CustomerGeoEnrich(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(
        c("c_custkey").as("cust_id"),
        c("c_name").as("cust_name"),
        coalesce(n("n_nationkey"), lit(-1)).as("nation_id"),
        coalesce(n("n_name"), lit("UNKNOWN")).as("nation"),
        coalesce(r("r_regionkey"), lit(-1)).as("region_id"),
        coalesce(r("r_name"), lit("UNKNOWN")).as("region"))
      .orderBy(col("cust_id"))
  }

  val q20Sql: String =
    """SELECT c.c_custkey AS cust_id, c.c_name AS cust_name,
      |       COALESCE(n.n_nationkey, -1) AS nation_id,
      |       COALESCE(n.n_name, 'UNKNOWN') AS nation,
      |       COALESCE(r.r_regionkey, -1) AS region_id,
      |       COALESCE(r.r_name, 'UNKNOWN') AS region
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY cust_id""".stripMargin

  // ---------------------------------------------------------------------
  // Q21 — latest-wins dedup + null-timestamp coalescing (reference
  // A14+F5, `staging_layer.py:288-344`: reviews keep latest by
  // creation_date DESC NULLS LAST; timestamps coalesced to 1900-01-01).
  // Here: last event per user; desc_nulls_last ordering replicated.
  // ---------------------------------------------------------------------
  def q21LatestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    Dedup.keepFirst(e, Seq("user_id"),
        Seq(col("ts").desc_nulls_last, col("event_id").desc))
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        coalesce(col("ts"), lit("1900-01-01 00:00:00").cast(TimestampType))
          .as("last_ts"),
        col("event_type").as("last_event_type"))
      .orderBy(col("user_id"))
  }

  val q21Sql: String =
    """SELECT user_id, event_id AS last_event_id,
      |       COALESCE(ts, TIMESTAMP '1900-01-01 00:00:00') AS last_ts,
      |       event_type AS last_event_type
      |FROM events
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
      |                           ORDER BY ts DESC NULLS LAST, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // Q22 — ingestion validation report (reference P10+A15+S16,
  // `ingestion_script.py:229-383`): rule-chain error tagging, duplicate
  // flagging, and the {total, valid, invalid, duplicate} JSON report as a
  // single-row frame. The split frames themselves are exposed by
  // operators.Validate (quarantine sink S15).
  // ---------------------------------------------------------------------
  def q22ValidationReport(spark: SparkSession, dir: String): DataFrame =
    Validate.report(Validate.splitEvents(Tables.events(spark, dir)))

  // clean-first duplicate ranking, mirroring Validate.split (rows failing a
  // field rule sort after clean ones, so counts are order-independent)
  val q22Sql: String =
    """WITH tagged AS (
      |  SELECT CASE WHEN bad IS NOT NULL THEN bad
      |              WHEN ROW_NUMBER() OVER (PARTITION BY event_id
      |                ORDER BY (bad IS NOT NULL), ts NULLS FIRST, user_id NULLS FIRST,
      |                         event_type NULLS FIRST, value NULLS FIRST) > 1
      |              THEN 'duplicate' END AS error
      |  FROM (SELECT *, CASE
      |    WHEN ts IS NULL THEN 'missing_ts'
      |    WHEN event_type IS NULL OR event_type NOT IN ('click','view','purchase','signup','error') THEN 'bad_event_type'
      |    WHEN value IS NULL THEN 'missing_value'
      |    WHEN value < 0 THEN 'negative_value'
      |    END AS bad FROM events))
      |SELECT COUNT(*) AS total,
      |       COUNT(*) FILTER (WHERE error IS NULL) AS valid,
      |       COUNT(*) FILTER (WHERE error IS NOT NULL AND error <> 'duplicate') AS invalid,
      |       COUNT(*) FILTER (WHERE error = 'duplicate') AS duplicate
      |FROM tagged""".stripMargin

  // ---------------------------------------------------------------------
  // Q22b — validation sweep over ALL eight tables (reference
  // `ingestion_script.py:59-179` validates every dataset, not just the
  // stream). One report row per table; rules live in Validate.registry and
  // the oracle SQL is GENERATED from the same registry, so the two engines
  // run the same rule text by construction.
  // ---------------------------------------------------------------------
  def q22bValidationAll(spark: SparkSession, dir: String): DataFrame =
    Validate.reportAll(spark, dir)

  val q22bSql: String = Validate.oracleAll

  // ---------------------------------------------------------------------
  // q44 — dimension MERGE (SCD-1 upsert): the warehouse write path the
  // reference fakes with TRUNCATE-and-reload (`spark_transform.py:443`,
  // S11). An incoming batch of changed/new customer rows merges into the
  // current snapshot: matched keys take the batch's values ("updated"),
  // unmatched batch keys append ("inserted"), untouched snapshot rows
  // survive ("kept"). Snapshot = hash-buckets 0-89 of the customer key
  // space, batch = buckets 80-99 with re-stated balances, so all three
  // actions occur and the split is a pure function of the row.
  //
  // Scale: MERGE is one full-outer sort-merge join on the dimension key —
  // both sides hash-partition on c_custkey, no broadcast needed at any
  // size; with the snapshot bucketed on the key (Sinks.bucketed) the
  // shuffle drops to the batch side only. The action column is derived,
  // not stored, so the merge stays a single pass.
  // ---------------------------------------------------------------------
  def q44DimensionMerge(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        graft.llm.TextOps.hashBucket(col("c_custkey")).as("__b"))
    val snapshot = c.filter(col("__b") < 90)
      .select(col("c_custkey").as("k"), col("c_name").as("snap_name"),
        col("c_acctbal").as("snap_bal"))
    val batch = c.filter(col("__b") >= 80)
      .select(col("c_custkey").as("k"), col("c_name").as("batch_name"),
        (col("c_acctbal") + lit(100.0)).as("batch_bal"))
    snapshot.join(batch, Seq("k"), "full_outer")
      .select(
        col("k").as("customer_id"),
        coalesce(col("batch_name"), col("snap_name")).as("name"),
        coalesce(col("batch_bal"), col("snap_bal")).as("acctbal"),
        when(col("batch_name").isNotNull && col("snap_name").isNotNull, "updated")
          .when(col("batch_name").isNotNull, "inserted")
          .otherwise("kept").as("action"))
      .orderBy(col("customer_id"))
  }

  val q44Sql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_name, c_acctbal,
      |         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
      |  FROM customer),
      |snapshot AS (
      |  SELECT c_custkey AS k, c_name AS snap_name, c_acctbal AS snap_bal
      |  FROM c WHERE b < 90),
      |batch AS (
      |  SELECT c_custkey AS k, c_name AS batch_name, c_acctbal + 100.0 AS batch_bal
      |  FROM c WHERE b >= 80)
      |SELECT COALESCE(s.k, bt.k) AS customer_id,
      |       COALESCE(bt.batch_name, s.snap_name) AS name,
      |       COALESCE(bt.batch_bal, s.snap_bal) AS acctbal,
      |       CASE WHEN bt.batch_name IS NOT NULL AND s.snap_name IS NOT NULL THEN 'updated'
      |            WHEN bt.batch_name IS NOT NULL THEN 'inserted'
      |            ELSE 'kept' END AS action
      |FROM snapshot s
      |FULL OUTER JOIN batch bt ON s.k = bt.k
      |ORDER BY customer_id""".stripMargin
}
