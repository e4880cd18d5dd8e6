package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CDC apply: keep a keyed dimension snapshot in sync with a stream of
  * upserts (the streaming twin of `StagingQueries.q44DimensionMerge` —
  * SCD-1 semantics: incoming values win, unmatched incoming keys insert,
  * untouched rows survive).
  *
  * Storage is VERSIONED parquet: each merge reads the highest complete
  * version `v<N>/` and writes `v<N+1>/` — never overwriting what it
  * reads. A version is "complete" only when Spark's `_SUCCESS` marker
  * exists, so a crash mid-write leaves the previous version current
  * (re-applying an upsert batch is a no-op by construction — SCD-1 sets
  * values, it does not accumulate). A partial directory left by a crash
  * does occupy its version slot (`ErrorIfExists` cannot distinguish a
  * dead writer from an in-flight one); sweeping `v<N>` dirs without
  * `_SUCCESS` older than the write timeout is the retention job's call,
  * not the merge path's.
  * This is the optimistic-commit protocol of a lake table format (Delta/
  * Iceberg) reduced to its parquet essentials; swapping the version
  * listing for a real table catalog changes nothing upstream.
  *
  * Scale: each merge is one full-outer sort-merge join on the key — the
  * q44 plan; with the snapshot written bucketed on the key, only the
  * day's CDC batch shuffles. Old versions are retained for time travel /
  * concurrent readers and pruned by any retention sweep.
  */
object DimSync {

  private val VersionRe = "v(\\d+)".r

  /** Highest version directory with a `_SUCCESS` marker, if any. */
  def latestVersion(spark: SparkSession, dimPath: String): Option[Int] = {
    val p = new Path(dimPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionRe(n) if fs.exists(new Path(s.getPath, "_SUCCESS")) =>
          Some(n.toInt)
        case _ => None
      })
      .sorted.lastOption
  }

  /** The snapshot frame at a known version (empty-with-batch-schema when
    * `version` is None, so merge #0 is a pure insert). */
  private def readVersion(spark: SparkSession, dimPath: String,
      version: Option[Int], like: DataFrame): DataFrame = version match {
    case Some(n) => spark.read.parquet(s"$dimPath/v$n")
    case None => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
  }

  /** The current snapshot frame. */
  def snapshot(spark: SparkSession, dimPath: String, like: DataFrame): DataFrame =
    readVersion(spark, dimPath, latestVersion(spark, dimPath), like)

  /** Time-travel read: the snapshot as of a specific COMPLETE version.
    * Fails loudly on an incomplete or absent slot rather than serving a
    * dead writer's partial directory. */
  def snapshotAt(spark: SparkSession, dimPath: String, version: Int): DataFrame = {
    val p = new Path(s"$dimPath/v$version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(p, "_SUCCESS")),
      s"version v$version at $dimPath is absent or incomplete")
    spark.read.parquet(p.toString)
  }

  /** VACUUM: the retention sweep the merge path's contract defers to.
    * Deletes (a) COMPLETE versions older than the newest `keep` (time
    * travel shrinks to the retained window) and (b) incomplete version
    * dirs BELOW the latest complete version — those writers are provably
    * dead, something committed past them. An incomplete dir ABOVE the
    * latest complete version is left alone: that slot may be an
    * in-flight writer, and sweeping it would turn the optimistic-commit
    * protocol into lost work (a real lake ages those out by wall-clock;
    * version order is the crash-proof signal available here).
    * Returns the swept directory names. Bounded driver work throughout:
    * one directory listing, never data reads. */
  def vacuum(spark: SparkSession, dimPath: String, keep: Int): Seq[String] = {
    require(keep >= 1, "must keep at least the current version")
    val p = new Path(dimPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val slots = fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionRe(n) =>
          Some((n.toInt, s.getPath,
            fs.exists(new Path(s.getPath, "_SUCCESS"))))
        case _ => None
      }).sortBy(_._1)
    val complete = slots.collect { case (n, _, true) => n }
    if (complete.isEmpty) return Nil
    val latest = complete.max
    val keepFloor = complete.sorted.takeRight(keep).head
    val sweep = slots.filter { case (n, _, ok) =>
      (ok && n < keepFloor) || (!ok && n < latest)
    }
    sweep.foreach { case (_, path, _) => fs.delete(path, true) }
    sweep.map(_._2.getName)
  }

  /** Apply one upsert batch: full-outer merge on `key`, batch values win
    * column-wise, result lands as the next version. Usable directly as a
    * `foreachBatch` body.
    *
    * Contract notes:
    *   - COLUMN-WISE upsert, not whole-row SCD-1: a NULL in an incoming
    *     value column inherits the current snapshot value rather than
    *     overwriting it with NULL (partial-upsert / CDC-patch semantics,
    *     matching q44's oracle). A source that must null a column out
    *     needs a sentinel or a whole-row variant — this one cannot
    *     express "set to NULL".
    *   - A batch with several upserts for the same key is collapsed to
    *     one row per key BEFORE the join (a fan-out there would plant
    *     duplicate snapshot rows that persist into every later version).
    *     `batchOrder` picks the survivor: highest ordering wins
    *     (last-wins for a CDC offset/timestamp column). When omitted,
    *     the survivor is still deterministic — highest packed value-
    *     struct wins — but semantically arbitrary; pass the batch's real
    *     ordering column whenever it has one.
    *   - Optimistic concurrency: the base version is listed ONCE and the
    *     output version derived from it, so a writer that raced us owns
    *     v(base+1) and this write fails on `ErrorIfExists` instead of
    *     silently discarding the concurrent commit. Retry the merge on
    *     that failure (re-reads the new snapshot).
    */
  def merge(spark: SparkSession, dimPath: String, batch: DataFrame,
      key: String, batchOrder: Seq[Column] = Nil): Unit = {
    val base = latestVersion(spark, dimPath)
    val cur = readVersion(spark, dimPath, base, batch)
    val valueCols = batch.columns.filter(_ != key).toSeq
    val order = if (batchOrder.nonEmpty) batchOrder.map(_.desc)
      else Seq(struct(valueCols.map(col): _*).desc)
    val one = graft.operators.Dedup.keepFirst(batch, Seq(key), order)
    val merged = cur.as("s").join(one.as("b"), Seq(key), "full_outer")
      .select(col(key) +: valueCols.map(c =>
        coalesce(col(s"b.$c"), col(s"s.$c")).as(c)): _*)
    merged.write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$dimPath/v${base.getOrElse(-1) + 1}")
  }

  /** SCD-2 lake merge — the TYPE-2 twin of [[merge]] and the persistence
    * seam of `OlapQueries.scd2Merge`: fold one change batch
    * (`o_custkey`, `o_orderdate`, `prio`) into an interval table stored
    * as a key-BUCKETED parquet lake (`bucket = pmod(customer_id, n)`).
    *
    * Blast-radius discipline (d49): the batch's key set decides the
    * touched buckets; ONLY those directories are read (partition
    * pruning — untouched keys are genuinely unread, not merely
    * pass-through) and only they are rewritten (dynamic partition
    * overwrite). Untouched bucket files stay byte-identical — asserted
    * in ScdSpec the way LayoutSpec pins d49.
    *
    * Same append-only-per-key contract as `scd2Merge`. Returns the
    * touched bucket ids (the measured blast radius). */
  def mergeScd2(spark: SparkSession, lakePath: String, batch: DataFrame,
      nBuckets: Int): Seq[Int] = {
    import graft.analytics.OlapQueries
    val p = new Path(lakePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bounded collect: distinct bucket ids of the batch's keys (<= n)
    val touched = batch
      .select(pmod(col("o_custkey"), lit(nBuckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val hist =
      if (fs.exists(p))
        spark.read.parquet(lakePath)
          .filter(col("bucket").isin(touched: _*)) // directory-pruned read
          .drop("bucket")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        OlapQueries.scd2Intervals(batch).schema)
    val merged = OlapQueries.scd2Merge(hist, batch)
      .withColumn("bucket", pmod(col("customer_id"), lit(nBuckets)).cast("int"))
      // co-locate each bucket in one task: without this every shuffle
      // task writes its own file into every bucket dir (tasks × buckets
      // small files per version), and the NEXT merge pays the listing +
      // footer cost — one extra keyed shuffle of a dimension-sized frame
      // buys one file per bucket
      .repartition(col("bucket"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "STATIC")
    try {
      spark.conf.set(key, "dynamic")
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(lakePath)
    } finally spark.conf.set(key, prev)
    touched
  }

  /** The SCD-2 lake as an interval frame (bucket column dropped). */
  def scd2Snapshot(spark: SparkSession, lakePath: String): DataFrame =
    spark.read.parquet(lakePath).drop("bucket")

  /** Point-in-time lookup against an SCD-2 interval table — the
    * STREAM-side consumer of q52's history (q54 is the batch twin):
    * each incoming row joins the version whose [valid_from, valid_to)
    * interval covers its event time, so late-arriving events resolve
    * against the dimension AS OF when they happened, not as of arrival.
    *
    * Works directly as a stream-static join (`events` streaming, `hist`
    * static — Structured Streaming plans the equi-join on the key with
    * the interval predicate as a join filter, append mode, no watermark
    * needed) or inside a foreachBatch body against a versioned snapshot
    * ([[snapshotAt]]/[[scd2Snapshot]]).
    *
    * Scale: per key the dimension carries only that key's version rows
    * (bounded by its change count), so the per-row interval probe is a
    * few-row scan — same shape as q54's batch join. */
  def asOfScd2(events: DataFrame, hist: DataFrame,
      key: Column, at: Column): DataFrame =
    events.join(hist,
      key === hist("customer_id")
        && at >= hist("valid_from") && at < hist("valid_to"))
}
