package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Pinned schemas + loaders for the driver test tables.
  *
  * The reference burned itself on schema inference three separate times and
  * ended up pinning explicit schemas everywhere (reference
  * `spark_transform.py:96-208` "prevent inferSchema issues",
  * `ingestion_script.py:59-179`, DDL in `ods_layer.py:54-160`). We adopt the
  * same rule: every source read carries a declared [[StructType]];
  * `inferSchema` is never used. For Parquet this also guarantees the scan's
  * `ReadSchema` is exactly what downstream needs — Catalyst prunes columns
  * against it.
  *
  * Scale note (100 TB): these loaders read a single file per table at test
  * scale but accept any path Spark can glob, so a production deployment
  * points them at a date-partitioned directory (`dt=YYYY-MM-DD/`) and gets
  * partition pruning (Catalyst `PruneFileSourcePartitions`) for free —
  * mirroring the reference's "latest Parquet per dataset" pruning
  * (`ods_layer.py:289-308`) declaratively instead of via S3 listing.
  */
object Tables {

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  /** events.ts is TIMESTAMP(NANOS) in the parquet file, which Spark cannot
    * map to TimestampType (micros). Read it as raw nanos (LongType, via
    * `spark.sql.legacy.parquet.nanosAsLong`) and convert with integer
    * division — the same ns→µs truncation DuckDB applies on read, so the
    * two engines see identical timestamps. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** `dir` may be the raw driver layout (single `<name>.parquet` files)
    * OR a pipeline layer directory (`<name>/` parquet dirs as written by
    * [[graft.pipeline.Runner]]) — the loaders serve both, so the layered
    * pipeline can point every downstream query at the PREVIOUS layer's
    * output with the same call. One driver-side existence probe per
    * loaded table decides the layout (never per row). */
  private[graft] def isLayerDir(spark: SparkSession, dir: String,
      name: String): Boolean = {
    val raw = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(raw)
  }

  private def read(spark: SparkSession, dir: String, name: String,
                   schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(
      if (isLayerDir(spark, dir, name)) s"$dir/$name" else s"$dir/$name.parquet")

  def orders(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "orders", ordersSchema)
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "lineitem", lineitemSchema)
  def customer(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "customer", customerSchema)
  def supplier(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "supplier", supplierSchema)
  def nation(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "nation", nationSchema)
  def region(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "region", regionSchema)
  def part(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "part", partSchema)
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (isLayerDir(spark, dir, "events")) {
      // a layer copy was WRITTEN by this loader's consumer, so its ts is
      // already a micros TIMESTAMP — read it back as such, no conversion
      val layerSchema = StructType(eventsSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = TimestampType) else f))
      spark.read.schema(layerSchema).parquet(s"$dir/events")
    } else {
      // defensive: required to read TIMESTAMP(NANOS) parquet as long; set
      // here (runtime-settable SQLConf) so callers with sessions not built
      // by Engine still work
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      read(spark, dir, "events", eventsSchema)
        // integer division, NOT `/` (double division loses precision above
        // 2^53 — epoch-nanos are ~1.7e18)
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings", embeddingsSchema)

  /** Register every table as a temp view so `spark.sql(...)` is a
    * first-class query surface over the same pinned-schema loaders (the
    * reference's users speak SQL; a view is a pure plan alias, so SQL text
    * gets identical Catalyst treatment — pushdown, pruning, broadcast —
    * as the DataFrame API, verified in SqlSurfaceSpec). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    orders(spark, dir).createOrReplaceTempView("orders")
    lineitem(spark, dir).createOrReplaceTempView("lineitem")
    customer(spark, dir).createOrReplaceTempView("customer")
    supplier(spark, dir).createOrReplaceTempView("supplier")
    nation(spark, dir).createOrReplaceTempView("nation")
    region(spark, dir).createOrReplaceTempView("region")
    part(spark, dir).createOrReplaceTempView("part")
    events(spark, dir).createOrReplaceTempView("events")
    documents(spark, dir).createOrReplaceTempView("documents")
    embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }
}
