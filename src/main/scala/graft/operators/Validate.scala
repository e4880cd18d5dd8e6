package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ingestion-time validation / quarantine split (reference
  * `ingestion_script.py:59-179, 229-383`, SURVEY.md §2.2 P10, §2.4 A15,
  * §2.1 S15/S16): a `when`-chain tags each row with its FIRST failing rule
  * (or a duplicate marker), then the frame is split into valid / quarantine
  * sides and a count report — valid ∪ quarantine = input, disjoint
  * (property-tested).
  *
  * The reference validates all eight datasets with per-table
  * required-field / domain / duplicate rules; [[registry]] is that table →
  * rules map. Each [[Rule]] carries BOTH the Spark `Column` predicate and
  * its DuckDB SQL text, and the oracle query is generated from the same
  * registry ([[oracleFor]]) — the two sides cannot drift.
  *
  * Duplicate semantics: rows failing a field rule are tagged with that rule
  * regardless of key multiplicity; among the remaining clean rows, the
  * first per key (clean-first ranking, deterministic tie-break) is valid
  * and the rest are `duplicate`. Ranking clean rows first makes every
  * report count order-independent (valid = #keys with ≥1 clean row).
  *
  * Scale: the rule chain is a pure projection (whole-stage codegen); the
  * duplicate window is the only shuffle (hash on the key — the same
  * exchange a dedup would need, so this is the floor). Reports are single
  * global aggregates with map-side partials.
  */
object Validate {

  /** One validation rule: `bad` is the VIOLATION predicate; `sql` is the
    * same predicate in DuckDB SQL (used to generate the oracle). */
  final case class Rule(label: String, bad: Column, sql: String)

  /** Per-table rule set. `tieBreak` columns order clean rows within a key
    * (NULLS FIRST on both engines) so which row survives is deterministic. */
  final case class TableRules(table: String, key: Seq[String],
      tieBreak: Seq[String], rules: Seq[Rule])

  private def r(label: String, sql: String): Rule =
    Rule(label, expr(sql), sql)

  /** All eight driver tables (reference `ingestion_script.py:59-179`
    * validates every dataset it lands). Domain bounds mirror the test
    * data's dictionaries (FIXTURES.md). */
  val registry: Seq[TableRules] = Seq(
    TableRules("orders", Seq("o_orderkey"),
      Seq("o_orderdate", "o_custkey", "o_totalprice"), Seq(
        r("missing_key", "o_orderkey IS NULL"),
        r("missing_custkey", "o_custkey IS NULL"),
        r("missing_orderdate", "o_orderdate IS NULL"),
        r("bad_status", "o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P')"),
        r("negative_totalprice", "o_totalprice < 0"),
        // nanosecond-horizon sanity: pandas datetime64[ns] (and any
        // ns-resolution consumer) tops out at 2262-04-11 23:47:16.854775807,
        // so a timestamp past it is corruption that would silently diverge
        // downstream hash / arrow paths (the q52 round-15 class) —
        // quarantine at ingest. The threshold is Timestamp.max truncated
        // to Spark's microsecond precision: .854775 is the largest µs
        // value still representable in ns (ADVICE r16 — the old
        // second-truncated bound over-quarantined the final 0.85 s).
        r("ts_past_ns_horizon",
          "o_orderdate > TIMESTAMP '2262-04-11 23:47:16.854775'"))),
    TableRules("lineitem", Seq("l_orderkey", "l_linenumber"),
      Seq("l_shipdate", "l_partkey", "l_suppkey"), Seq(
        r("missing_key", "l_orderkey IS NULL OR l_linenumber IS NULL"),
        r("bad_quantity", "l_quantity IS NULL OR l_quantity <= 0"),
        r("bad_discount", "l_discount < 0 OR l_discount > 1"),
        r("negative_price", "l_extendedprice < 0"))),
    TableRules("customer", Seq("c_custkey"), Seq("c_name", "c_nationkey"), Seq(
        r("missing_key", "c_custkey IS NULL"),
        r("missing_name", "c_name IS NULL"),
        r("bad_nationkey", "c_nationkey IS NULL OR c_nationkey < 0 OR c_nationkey > 24"))),
    TableRules("supplier", Seq("s_suppkey"), Seq("s_name", "s_nationkey"), Seq(
        r("missing_key", "s_suppkey IS NULL"),
        r("missing_name", "s_name IS NULL"),
        r("bad_nationkey", "s_nationkey IS NULL OR s_nationkey < 0 OR s_nationkey > 24"))),
    TableRules("nation", Seq("n_nationkey"), Seq("n_name"), Seq(
        r("missing_key", "n_nationkey IS NULL"),
        r("missing_name", "n_name IS NULL"),
        r("bad_regionkey", "n_regionkey IS NULL OR n_regionkey < 0 OR n_regionkey > 4"))),
    TableRules("region", Seq("r_regionkey"), Seq("r_name"), Seq(
        r("missing_key", "r_regionkey IS NULL"),
        r("missing_name", "r_name IS NULL"))),
    TableRules("part", Seq("p_partkey"), Seq("p_name", "p_brand"), Seq(
        r("missing_key", "p_partkey IS NULL"),
        r("negative_price", "p_retailprice < 0"),
        r("bad_size", "p_size IS NULL OR p_size <= 0"))),
    TableRules("events", Seq("event_id"),
      Seq("ts", "user_id", "event_type", "value"), Seq(
        r("missing_key", "event_id IS NULL"),
        r("missing_ts", "ts IS NULL"),
        r("bad_event_type",
          "event_type IS NULL OR event_type NOT IN ('click','view','purchase','signup','error')"),
        r("missing_value", "value IS NULL"),
        r("negative_value", "value < 0"))),
  )

  def rulesFor(table: String): TableRules =
    registry.find(_.table == table)
      .getOrElse(sys.error(s"no validation rules for table $table"))

  /** Tag each row with its first failing rule (or `duplicate`), keeping
    * every input column plus `error` (NULL = valid).
    *
    * Scale: the duplicate window runs ONLY over rows whose key actually
    * repeats. The dup-key set comes from a key-column-only aggregate
    * (16-byte-ish shuffle rows), and the semi/anti joins against it are
    * AQE-broadcast when duplication is rare — so a mostly-unique table
    * (the common 100 TB case) never shuffles its full rows at all; only
    * the duplicated groups pay the window. Requires every rule set to
    * flag null keys (all registry entries do, asserted in RanksSpec):
    * null-key rows quarantine via their rule, never via dup-ranking. */
  /** First failing rule's label (NULL = clean) — shared by the row-level
    * [[split]] and the count-only [[reportCounts]]. */
  private def firstBad(tr: TableRules) =
    tr.rules.tail.foldLeft(
      when(tr.rules.head.bad, tr.rules.head.label)) {
      case (acc, rule) => acc.when(rule.bad, rule.label)
    }

  def split(df: DataFrame, tr: TableRules): DataFrame = {
    val tagged = df.withColumn("__bad", firstBad(tr))
    val dupKeys = tagged.groupBy(tr.key.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).drop("__n")
    val outCols = df.columns.map(col).toSeq :+ col("error")
    // unique-key rows: rank 1 by construction — no window, no row shuffle
    val uniq = tagged.join(dupKeys, tr.key, "left_anti")
      .withColumn("error", col("__bad"))
      .select(outCols: _*)
    // clean-first ranking within duplicated groups: rows failing a rule
    // sort after clean ones, so a key group never loses its valid slot
    // to an invalid row
    val order = col("__bad").isNotNull.asc +:
      tr.tieBreak.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(tr.key.map(col): _*).orderBy(order: _*)
    val ranked = tagged.join(dupKeys, tr.key, "left_semi")
      .withColumn("__rn", row_number().over(w))
      .withColumn("error",
        when(col("__bad").isNotNull, col("__bad"))
          .when(col("__rn") > 1, "duplicate"))
      .select(outCols: _*)
    uniq.union(ranked)
  }

  /** Event-stream rules (kept as the named entry point the streaming path
    * and q22 use). */
  def splitEvents(df: DataFrame): DataFrame = split(df, rulesFor("events"))

  def valid(tagged: DataFrame): DataFrame =
    tagged.filter(col("error").isNull).drop("error")

  /** Quarantine side, `error` column attached (reference S15 writes these
    * under `quarantine/` with the reason column). */
  def quarantine(tagged: DataFrame): DataFrame =
    tagged.filter(col("error").isNotNull)

  /** Single-row {total, valid, invalid, duplicate} report (reference S16's
    * ingestion JSON report). */
  def report(tagged: DataFrame): DataFrame =
    tagged.agg(
      count(lit(1)).as("total"),
      count(when(col("error").isNull, 1)).as("valid"),
      count(when(col("error").isNotNull && col("error") =!= "duplicate", 1))
        .as("invalid"),
      count(when(col("error") === "duplicate", 1)).as("duplicate"))

  /** Count-only twin of `report(split(df, tr))`, proven equal row
    * arithmetic (r18): [[split]]'s clean-first ranking sorts every clean
    * row of a duplicated key group before every flagged row, so a group
    * with n rows and c clean ones always reports 1 valid (when c ≥ 1),
    * c − 1 duplicates, and n − c invalid — pure per-group counts. The
    * report therefore needs ONE keyed aggregate (map-side partials over
    * key + two longs) and a single-row rollup, instead of materializing
    * the full row-level split: no dup-key anti/semi joins, no window, no
    * second scan of the table (q22b's plan dropped from 4 exchanges +
    * 8 scans per table to 1 + 1; guide §2.3 "aggregate before you
    * shuffle"). q22 keeps [[split]] — its quarantine output needs the
    * actual rows. */
  def reportCounts(df: DataFrame, tr: TableRules): DataFrame = {
    val perKey = df.withColumn("__bad", firstBad(tr))
      .groupBy(tr.key.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        count(when(col("__bad").isNull, 1)).as("__c"))
    perKey.agg(
      coalesce(sum(col("__n")), lit(0L)).as("total"),
      coalesce(sum(least(col("__c"), lit(1L))), lit(0L)).as("valid"),
      coalesce(sum(col("__n") - col("__c")), lit(0L)).as("invalid"),
      coalesce(sum(greatest(col("__c") - lit(1L), lit(0L))), lit(0L))
        .as("duplicate"))
  }

  /** Validation sweep over every registered table: one report row per
    * table. Each table is one projection + one keyed count aggregate
    * ([[reportCounts]]); the 8 single-row results union for free. */
  def reportAll(spark: SparkSession, dir: String): DataFrame = {
    val loaders: Map[String, DataFrame] = Map(
      "orders" -> Tables.orders(spark, dir),
      "lineitem" -> Tables.lineitem(spark, dir),
      "customer" -> Tables.customer(spark, dir),
      "supplier" -> Tables.supplier(spark, dir),
      "nation" -> Tables.nation(spark, dir),
      "region" -> Tables.region(spark, dir),
      "part" -> Tables.part(spark, dir),
      "events" -> Tables.events(spark, dir))
    registry.map { tr =>
      reportCounts(loaders(tr.table), tr)
        .select(lit(tr.table).as("table_name"), col("total"), col("valid"),
          col("invalid"), col("duplicate"))
    }.reduce(_.union(_)).orderBy(col("table_name"))
  }

  /** DuckDB oracle for one table, generated from the SAME registry that
    * drives the Spark plan — rule text cannot drift between engines. */
  def oracleFor(tr: TableRules): String = {
    val caseWhen = tr.rules
      .map(rule => s"WHEN ${rule.sql} THEN '${rule.label}'").mkString(" ")
    val keys = tr.key.mkString(", ")
    val order = ("(bad IS NOT NULL)" +: tr.tieBreak.map(c => s"$c NULLS FIRST"))
      .mkString(", ")
    s"""SELECT '${tr.table}' AS table_name,
       |  COUNT(*) AS total,
       |  COUNT(*) FILTER (WHERE error IS NULL) AS valid,
       |  COUNT(*) FILTER (WHERE error IS NOT NULL AND error <> 'duplicate') AS invalid,
       |  COUNT(*) FILTER (WHERE error = 'duplicate') AS duplicate
       |FROM (
       |  SELECT CASE WHEN bad IS NOT NULL THEN bad
       |              WHEN ROW_NUMBER() OVER (PARTITION BY $keys ORDER BY $order) > 1
       |              THEN 'duplicate' END AS error
       |  FROM (SELECT *, CASE $caseWhen END AS bad FROM ${tr.table}))""".stripMargin
  }

  /** Oracle for [[reportAll]]: the per-table oracles unioned. */
  def oracleAll: String =
    registry.map(oracleFor).mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
}
