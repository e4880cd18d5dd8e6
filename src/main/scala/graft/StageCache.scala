package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-level materialized stage views: several registered queries are
  * tiers over the same expensive intermediate (q07/q08 share the scored
  * RFM frame; d07/d11/d12/d23 share MinHash signatures over the documents
  * table; d13/d18 share the quality gate + signatures + shingles). Each
  * stage is keyed by (session, data dir, tag), built once, pinned with
  * localCheckpoint (r3 lesson: checkpoint, not cache, when separate
  * actions consume a frame — cache still recomputes the lineage per
  * action for `repartitionByRange` inputs and interpreted lambdas), and
  * reused by every consumer for the life of the session.
  *
  * At 100 TB this is the "silver table" pattern: the shared stage is a
  * persisted intermediate dataset, not a per-query recompute; here the
  * persistence is executor-local blocks instead of a lake write.
  */
object StageCache {

  private val stages =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  /** Stable per-session key: identity hash is safe here because the map
    * value holds a strong reference to the session itself — the session
    * cannot be GC'd while its entry lives, so its identity hash cannot be
    * reused by a new session. (Spark 4.1's `sessionUUID` is private[sql],
    * so it is not an option from this package.) */
  private def sessionKey(spark: SparkSession): String =
    s"id${System.identityHashCode(spark)}"

  /** Drop every stage owned by `spark` — the cold-path bench hook
    * (SPARK_GRAFT_COLD): clearing before each timed pass makes a tiered
    * query pay its shared-stage build cost, so the bench board carries
    * both the deployed (persisted-silver) number and the from-scratch
    * one. The checkpoint blocks release via the ContextCleaner once the
    * dropped frames are GC'd. */
  def clear(spark: SparkSession): Unit = {
    val prefix = s"${sessionKey(spark)}:"
    stages.forEach((k, v) => if (k.startsWith(prefix)) stages.remove(k, v))
  }

  /** Build-once per (session, dir, tag): returns the eagerly
    * materialized (localCheckpoint'd) frame on every call.
    *
    * RE-ENTRANT by design: a stage build may itself resolve another
    * cached stage (q52_intervals builds on q52_changes), so the build
    * runs OUTSIDE the map's atomic update — `computeIfAbsent` with a
    * re-entrant builder throws IllegalStateException("Recursive update")
    * whenever the two keys land in one bin. The get → build → putIfAbsent
    * race can at worst build a stage twice concurrently (same
    * deterministic result; the loser's checkpoint blocks release via the
    * ContextCleaner), which is the correct trade against a bin-collision
    * crash. */
  def cached(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame = {
    // lazily evict entries of stopped sessions: their checkpoint blocks
    // died with the executor, so the frames are unusable, and keeping
    // them would leak plans for the life of the JVM
    stages.forEach((k, v) => if (v._1.sparkContext.isStopped) stages.remove(k, v))
    val key = s"${sessionKey(spark)}:$dir:$tag"
    val hit = stages.get(key)
    if (hit != null) hit._2
    else {
      val built = (spark, build.localCheckpoint())
      val prev = stages.putIfAbsent(key, built)
      (if (prev != null) prev else built)._2
    }
  }
}
