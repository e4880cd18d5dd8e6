package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CDC apply: keep a keyed dimension snapshot in sync with a stream of
  * upserts (the streaming twin of `StagingQueries.q44DimensionMerge` —
  * SCD-1 semantics: incoming values win, unmatched incoming keys insert,
  * untouched rows survive).
  *
  * Storage is VERSIONED parquet: each merge reads the highest complete
  * version `v<N>/` and writes `v<N+1>/` — never overwriting what it
  * reads. A version is "complete" only when Spark's `_SUCCESS` marker
  * exists, so a crash mid-write leaves the previous version current and
  * the next merge retries idempotently (re-applying an upsert batch is a
  * no-op by construction — SCD-1 sets values, it does not accumulate).
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

  /** The current snapshot frame (empty-with-batch-schema before the first
    * merge, so merge #0 is a pure insert). */
  def snapshot(spark: SparkSession, dimPath: String, like: DataFrame): DataFrame =
    latestVersion(spark, dimPath) match {
      case Some(n) => spark.read.parquet(s"$dimPath/v$n")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
    }

  /** Apply one upsert batch: full-outer merge on `key`, batch values win
    * column-wise, result lands as the next version. Usable directly as a
    * `foreachBatch` body. */
  def merge(spark: SparkSession, dimPath: String, batch: DataFrame,
      key: String): Unit = {
    val cur = snapshot(spark, dimPath, batch)
    val valueCols = batch.columns.filter(_ != key).toSeq
    val merged = cur.as("s").join(batch.as("b"), Seq(key), "full_outer")
      .select(col(key) +: valueCols.map(c =>
        coalesce(col(s"b.$c"), col(s"s.$c")).as(c)): _*)
    val next = latestVersion(spark, dimPath).getOrElse(-1) + 1
    merged.write.mode(SaveMode.ErrorIfExists).parquet(s"$dimPath/v$next")
  }
}
