package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY.md §2.1 S1/S3/S6): every read carries a declared
  * schema — `inferSchema` is never used (the reference's documented failure
  * mode, `spark_transform.py:97` "prevent inferSchema issues", `fix1.md`).
  */
object Sources {

  /** S1 — CSV with explicit schema, quoted multiline fields (reference
    * `spark_transform.py:494-504`: header, quote `"`, multiLine). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** S3 — string-typed bronze CSV read with custom NA tokens (reference
    * `ingestion_script.py:247-253`: `na_values=["","null","NULL"]`, all
    * columns as strings, validation casts later). Spark's nullValue takes
    * one token, so the remaining tokens are normalized by the caller's
    * validation chain (graft.operators.Validate / F14-style casts). */
  def csvBronze(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("nullValue", "")
      .csv(path)
  }

  /** S6 — parquet scan over a (possibly partitioned) directory. With a
    * `dt=YYYY-MM-DD/` layout, date predicates become partition pruning
    * (Catalyst `PruneFileSourcePartitions`) — the declarative form of the
    * reference's "latest Parquet per prefix" S3 listing
    * (`ods_layer.py:289-308`). */
  def parquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** S13-adjacent — streaming file source with the same pinned schema
    * (tests and local runs; production subscribes Kafka with identical
    * downstream plan). */
  def jsonStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)
}
