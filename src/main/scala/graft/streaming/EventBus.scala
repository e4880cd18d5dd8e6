package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 4-topic Kafka event bus re-expressed as one Structured
  * Streaming ingestion contract (reference `kafka_scripts/producer.py:24-27`
  * topic registry, `:105-207` per-topic JSON event shapes;
  * `consumer.py:388-404` dispatches on `message.topic`).
  *
  * Shape: every transport row is `(topic, value)` — the Kafka wire format
  * after `CAST(value AS STRING)`. A [[BusSource]] supplies that frame:
  *   - [[kafka]] is the production path: `format("kafka")` with
  *     `subscribePattern` covering all four topics in ONE stream (the
  *     reference polls all four from one consumer, `consumer.py:80-97`) —
  *     present and compiling; not executable here (no broker / connector
  *     jar in this environment), which is exactly why the contract seam
  *     exists;
  *   - [[fileSource]] is the test/local twin: a JSON folder stream (or
  *     batch frame in tests) carrying the same `(topic, value)` rows.
  *
  * [[ingest]] then dispatches per-topic `from_json` schemas and unions the
  * four branches into one normalized envelope — self-union of one source
  * stream, legal in batch and streaming alike. Topic-specific fields stay
  * typed (items array for orders, quantity for cart adds); absent fields
  * are null, mirroring the reference's per-topic processors writing into
  * one metrics store.
  *
  * Scale: the dispatch is 4 filters over one stream (no extra shuffle);
  * parsing is per-row codegen'd JsonToStructs; downstream aggregations
  * decide partitioning. Adding a topic = one registry entry.
  */
object EventBus {

  val ProductViews = "ecommerce.product.views"
  val CartAdd = "ecommerce.cart.add"
  val WishlistAdd = "ecommerce.wishlist.add"
  val Orders = "ecommerce.orders.completed"

  /** Items array carried by order-completed events
    * (`producer.py:180-189`). */
  val orderItemSchema: StructType = StructType(Seq(
    StructField("product_id", LongType),
    StructField("product_name", StringType),
    StructField("product_category", StringType),
    StructField("product_price", DoubleType),
    StructField("quantity", IntegerType),
    StructField("item_total", DoubleType)))

  private val common = Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("user_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("session_id", StringType))

  private val productFields = Seq(
    StructField("product_id", LongType),
    StructField("product_name", StringType),
    StructField("product_category", StringType),
    StructField("product_price", DoubleType))

  /** topic → value schema (`producer.py:105-207` event dictionaries). */
  val schemas: Map[String, StructType] = Map(
    ProductViews -> StructType(common ++ productFields ++ Seq(
      StructField("page_url", StringType),
      StructField("referrer", StringType))),
    CartAdd -> StructType(common ++ productFields ++ Seq(
      StructField("quantity", IntegerType),
      StructField("total_amount", DoubleType))),
    WishlistAdd -> StructType(common ++ productFields),
    Orders -> StructType(common ++ Seq(
      StructField("order_id", StringType),
      StructField("items", ArrayType(orderItemSchema)),
      StructField("total_amount", DoubleType),
      StructField("payment_method", StringType),
      StructField("shipping_address", StructType(Seq(
        StructField("street", StringType),
        StructField("city", StringType),
        StructField("state", StringType),
        StructField("zip_code", StringType),
        StructField("country", StringType)))))))

  /** A transport producing `(topic STRING, value STRING)` rows. */
  trait BusSource {
    def load(spark: SparkSession): DataFrame
  }

  /** Production transport: one Kafka subscription over all four topics.
    * Compiles against the stable DataSource V2 string API; running it
    * needs the spark-sql-kafka connector on the classpath and a broker. */
  final case class KafkaBus(
      bootstrapServers: String,
      subscribePattern: String = "ecommerce\\..*",
      startingOffsets: String = "earliest") extends BusSource {
    def load(spark: SparkSession): DataFrame =
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribePattern", subscribePattern)
        .option("startingOffsets", startingOffsets)
        .load()
        .select(col("topic"), col("value").cast(StringType).as("value"))
  }

  /** Test/local transport: a JSON folder stream whose files carry
    * `{"topic": …, "value": …}` rows — the same wire shape. */
  final case class FileBus(dir: String) extends BusSource {
    private val wire = StructType(Seq(
      StructField("topic", StringType), StructField("value", StringType)))
    def load(spark: SparkSession): DataFrame =
      spark.readStream.schema(wire).json(dir)
  }

  /** Kafka producer twin (reference `producer.py:209-218`): frame must
    * carry `key`/`value` string or binary columns. Same caveat as
    * [[KafkaBus]] — the branch exists so a deployment only supplies a
    * broker address. */
  def kafkaWriter(df: DataFrame, bootstrapServers: String, topic: String) =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)

  /** Normalized envelope columns every branch projects into. */
  private val envelope = Seq("topic", "event_id", "event_type", "user_id",
    "ts", "session_id", "product_id", "product_category", "product_price",
    "quantity", "total_amount", "order_id", "items")

  /** Per-topic `from_json` dispatch + union into the envelope. Works on a
    * streaming or batch `(topic, value)` frame. */
  def ingest(raw: DataFrame): DataFrame = {
    def branch(topic: String): DataFrame = {
      val e = raw.filter(col("topic") === topic)
        .withColumn("e", from_json(col("value"), schemas(topic)))
      val parsed = e.select(col("topic") +: schemas(topic).fieldNames.toSeq
        .map(f => col(s"e.$f")): _*)
        .withColumnRenamed("timestamp", "ts")
      envelope.foldLeft(parsed) { (d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(c match {
          case "product_id" => LongType
          case "quantity" => IntegerType
          case "product_price" | "total_amount" => DoubleType
          case "items" => ArrayType(orderItemSchema)
          case _ => StringType
        }))
      }.select(envelope.map(col): _*)
    }
    Seq(ProductViews, CartAdd, WishlistAdd, Orders).map(branch).reduce(_.union(_))
  }

  // ---------------------------------------------------------------------
  // The reference consumer's per-topic Redis metrics (`consumer.py:
  // 200-344`: HINCRBY per product/category/user, cart totals, per-category
  // order revenue) as mode-agnostic aggregations over the [[ingest]]
  // envelope — run them on a batch frame for backfill or on the stream in
  // update mode into KvSink. Each is one groupBy (one shuffle, map-side
  // partials); the 24 h Redis TTL is the stream side's watermark concern.
  // ---------------------------------------------------------------------

  /** product:views — per-product view counts (`consumer.py:207-208`). */
  def productViews(env: DataFrame): DataFrame =
    env.filter(col("topic") === ProductViews)
      .groupBy(col("product_id")).agg(count(lit(1)).as("views"))

  /** category:views (`consumer.py:211-212`). */
  def categoryViews(env: DataFrame): DataFrame =
    env.filter(col("topic") === ProductViews)
      .groupBy(col("product_category")).agg(count(lit(1)).as("views"))

  /** user activity across ALL topics (`consumer.py:215-216` counts views;
    * the totals block counts every event type per user). */
  def userActivity(env: DataFrame): DataFrame =
    env.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** cart totals — adds, units, value (`consumer.py:232-259`). */
  def cartTotals(env: DataFrame): DataFrame =
    env.filter(col("topic") === CartAdd)
      .agg(
        count(lit(1)).as("n_cart_adds"),
        sum(col("quantity").cast("long")).as("units"),
        sum(col("total_amount").cast("decimal(18,2)")).cast("double")
          .as("cart_value"))

  /** per-category order revenue from the nested items
    * (`consumer.py:317-325`) — the EventBus twin of q32's rollup. */
  def orderCategoryRevenue(env: DataFrame): DataFrame =
    env.filter(col("topic") === Orders)
      .select(explode(col("items")).as("item"))
      .groupBy(col("item.product_category").as("product_category"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("item.item_total").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
}
