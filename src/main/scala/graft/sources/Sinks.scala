package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink writers (SURVEY.md §2.1 S4/S15/S16 + partitioned-lake layout).
  * All writes are `overwrite` — idempotent by construction, replacing the
  * reference's TRUNCATE-then-append protocol (S11,
  * `spark_transform.py:443-469`).
  */
object Sinks {

  /** S4 — parquet table write. `tinyOutput=true` reproduces the
    * reference's single-file-per-table layout (`coalesce(1)`,
    * `spark_transform.py:564-566`) for small marts; the default keeps the
    * natural partitioning (AQE-coalesced) for scale. */
  def parquet(df: DataFrame, path: String, tinyOutput: Boolean = false): Unit =
    (if (tinyOutput) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Date-partitioned lake write (`dt=YYYY-MM-DD/`): downstream readers
    * get partition pruning instead of the reference's latest-file S3
    * listing. `dtCol` must be a date-formatted string column. */
  def parquetPartitioned(df: DataFrame, path: String, dtCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(dtCol).parquet(path)

  /** S15 — quarantine sink: rows that failed validation, with their
    * `error` reason column, as CSV under `<path>/quarantine/` (reference
    * `ingestion_script.py:360-366`). */
  def quarantine(tagged: DataFrame, path: String): Unit =
    graft.operators.Validate.quarantine(tagged)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(s"$path/quarantine")

  /** S16 — ingestion report sink: the single-row
    * {total, valid, invalid, duplicate} counts as JSON (reference
    * `ingestion_script.py:368-381`). */
  def report(tagged: DataFrame, path: String): Unit =
    graft.operators.Validate.report(tagged)
      .withColumn("generated_by", lit("graft-ingest"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .json(s"$path/report")

  /** Bucketed managed-table write: co-locates (and optionally co-sorts)
    * the table on its join key so repeated big-big joins on that key run
    * WITHOUT a shuffle exchange (verified by plan in BucketingSpec) — the
    * 100 TB answer to the orders⋈lineitem join that otherwise shuffles
    * both sides on every query. Bucket count is the scale knob: pick so a
    * bucket of the larger table fits an executor's memory. */
  def bucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    // idempotent across JVMs: the in-memory catalog forgets managed tables
    // between sessions but their warehouse directory survives, and
    // Overwrite can only replace a table the catalog knows — drop the
    // entry if present AND clear a stale orphaned location
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) {
      // guard the recursive delete: only reclaim a directory that looks
      // like an orphaned managed-table remnant (parquet part files or a
      // _SUCCESS marker at its top level). Anything else at this warehouse
      // path — e.g. data another tool parked there, or an external table
      // registered under a different name — is NOT ours to destroy.
      val top = fs.listStatus(loc).map(_.getPath.getName)
      val looksLikeTableRemnant = top.isEmpty ||
        top.exists(n => n == "_SUCCESS" || (n.startsWith("part-") && n.contains(".parquet")))
      require(looksLikeTableRemnant,
        s"refusing to overwrite $loc for table `$table`: directory exists " +
        s"but does not look like an orphaned managed-table remnant " +
        s"(top-level entries: ${top.take(5).mkString(", ")}); move it aside first")
      println(s"[sinks] reclaiming orphaned managed-table dir $loc for `$table`")
      fs.delete(loc, true)
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** S7 — JDBC append sink, the warehouse egress the reference uses for
    * Postgres (`spark_transform.py:331-355`). Exercised end-to-end against
    * embedded Derby (JdbcSpec: write → read-back → predicate pushdown);
    * a production target differs only in URL/driver. The parquet lake
    * remains the primary sink. */
  def jdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  case class CompactStats(leaves: Int, compacted: Int,
      filesBefore: Int, filesAfter: Int)

  /** Small-file compaction — the maintenance pass every streaming lake
    * needs at scale: micro-batch and per-partition writes accumulate
    * part files far below the scan-efficient size, and a 100 TB table of
    * kilobyte files is a metadata DoS on its own listing. Walks the
    * partition tree under `dir`, and rewrites every leaf whose part-file
    * count exceeds ceil(bytes/targetBytes) down to exactly that many
    * files (`repartition` — round-robin for even output sizes; the
    * shuffle is the price of not writing one skewed giant file).
    *
    * Safety: the rewrite lands in a sibling temp dir, is row-count
    * verified against the source leaf, then swapped in by rename —
    * readers see the old or the new leaf, never a mix. A crash between
    * the two renames leaves `<leaf>.__old__` next to a complete new
    * leaf: recovery is delete the leftover; a crash before the swap
    * leaves only temp dirs this pass overwrites on retry. NOT for
    * replay-ledger layouts (CorpusStream's `batch=<id>` dirs ARE the
    * commit protocol — compacting across them would forge replays). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L << 20): CompactStats = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path): Seq[Path] = {
      val subdirs = fs.listStatus(p)
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith(".")
          && !s.getPath.getName.endsWith("__compact__")
          && !s.getPath.getName.endsWith("__old__")) // crashed-pass leftovers
        .map(_.getPath).toSeq
      if (subdirs.isEmpty) Seq(p) else subdirs.flatMap(leaves)
    }
    var compacted, before, after = 0
    val all = leaves(root)
    all.foreach { leaf =>
      val parts = fs.listStatus(leaf)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      val n = math.max(1, math.ceil(
        parts.map(_.getLen).sum.toDouble / targetBytes).toInt)
      before += parts.length
      if (parts.length <= n) after += parts.length
      else {
        val src = spark.read.parquet(leaf.toString)
        val nRows = src.count()
        val tmp = new Path(leaf.getParent, leaf.getName + ".__compact__")
        src.repartition(n).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        require(spark.read.parquet(tmp.toString).count() == nRows,
          s"compaction of $leaf would change its row count; aborting swap")
        val old = new Path(leaf.getParent, leaf.getName + ".__old__")
        fs.delete(old, true) // leftover from a crashed prior pass
        require(fs.rename(leaf, old) && fs.rename(tmp, leaf),
          s"compaction swap failed for $leaf")
        fs.delete(old, true)
        compacted += 1
        after += n
      }
    }
    CompactStats(all.size, compacted, before, after)
  }
}
