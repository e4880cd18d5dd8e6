package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion-time validation / quarantine split (reference
  * `ingestion_script.py:229-383`, SURVEY.md §2.2 P10, §2.4 A15, §2.1
  * S15/S16): a `when`-chain tags each row with its FIRST failing rule (or
  * a duplicate marker), then the frame is split into valid / quarantine
  * sides and a single-row count report — valid ∪ quarantine = input,
  * disjoint (property-tested).
  *
  * Scale: the rule chain is a pure projection (whole-stage codegen); the
  * duplicate window is the only shuffle (on the key). The report is a
  * single global aggregate with map-side partials.
  */
object Validate {

  /** Event-stream rules mirroring the reference's required-field +
    * type + domain checks, plus all-but-first duplicate flagging. */
  def splitEvents(df: DataFrame): DataFrame = {
    val allowed = Seq("click", "view", "purchase", "signup", "error")
    // deterministic duplicate ranking: order over ALL non-key columns with
    // explicit null placement (Spark ASC = NULLS FIRST; DuckDB defaults
    // NULLS LAST — both sides pin NULLS FIRST). Remaining ties are full
    // duplicates, where any choice is equivalent.
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("ts").asc_nulls_first, col("user_id").asc_nulls_first,
        col("event_type").asc_nulls_first, col("value").asc_nulls_first)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("error",
        when(col("ts").isNull, "missing_ts")
          .when(col("event_type").isNull || !col("event_type").isin(allowed: _*),
            "bad_event_type")
          .when(col("value").isNull, "missing_value")
          .when(col("value") < 0, "negative_value")
          .when(col("__rn") > 1, "duplicate"))
      .drop("__rn")
  }

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
}
