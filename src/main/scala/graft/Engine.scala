package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * - `spark.sql.ansi.enabled=false`: the reference relies on null-on-failure
  *   cast/parse semantics throughout (`TRY_TO_TIMESTAMP` in
  *   `ods_layer.py:316-361`, `pd.to_numeric(errors='coerce')` in
  *   `ingestion_script.py:313-320`); Spark 4 defaults ANSI on, so we pin it
  *   off (SURVEY.md §7.4.6).
  * - UTC session time zone: oracle (DuckDB) parity for timestamp/date math.
  * - shuffle partitions sized to the local core count, not the 200 default;
  *   on a real cluster this is overridden per deployment (AQE coalesces
  *   post-shuffle partitions either way).
  * - AQE on: runtime re-planning (skew-join splitting, dynamic coalescing,
  *   broadcast-join conversion) is part of the 100 TB design.
  */
object Engine {
  def session(master: String = "local[*]",
              cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE: outputTimestampType stays at the INT96 default on purpose —
      // Spark's annotated TIMESTAMP(MICROS) carries isAdjustedToUTC=true,
      // which downstream naive-timestamp readers (DuckDB/pandas, incl. the
      // driver's oracle compare) surface as tz-aware values that no longer
      // string-match a naive oracle. Tables.tsUnit reads INT96 fine.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the engine-standard SQL confs to an externally-built session
    * (used by Verify/Bench whose builders the driver contract owns). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    spark
  }
}
