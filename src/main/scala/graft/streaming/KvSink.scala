package graft.streaming

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
  * The store here is an in-process map (tests / single-node serving); a
  * production deployment implements the same `upsert(rows)` against Redis
  * or any KV store — the streaming side is unchanged.
  */
class KvSink(keyCol: String) {
  private val store = new ConcurrentHashMap[String, Row]()

  def upsert(batch: DataFrame): Unit =
    batch.collect().foreach { r =>
      store.put(String.valueOf(r.getAs[Any](keyCol)), r)
    }

  def get(key: String): Option[Row] = Option(store.get(key))
  def snapshot: Map[String, Row] = {
    import scala.jdk.CollectionConverters._
    store.asScala.toMap
  }

  /** Attach to an update-mode aggregation. */
  def writer(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch((batch: DataFrame, _: Long) => upsert(batch))
}
