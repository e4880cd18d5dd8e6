package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Layout census: measure what d47's clustered rewrite buys a selective
  * serving scan, against the SAME corpus written unclustered (hash
  * repartition on doc_id — the layout a plain ingest produces). For each
  * layout the serving query (n_chars ∈ [LoChars, HiChars], group by
  * lang) runs cold-ish (fresh dataframe, metrics drained) and reports:
  * files on disk vs files the scan READ (directory pruning), task input
  * bytes (row-group stats + pruning together), scan output rows, wall.
  * Writes LAYOUT_CENSUS.json — the number a 100 TB lake actually sizes
  * by: what fraction of the table a banded predicate touches after
  * OPTIMIZE, vs a full-file sweep before it.
  */
object LayoutBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val im = te.taskMetrics.inputMetrics
        bytesRead.addAndGet(im.bytesRead)
        recordsRead.addAndGet(im.recordsRead)
      }
    })

    // unclustered baseline: the layout a plain ingest leaves behind
    val basePath = {
      val out = Layout.layoutPath(sfDir, "d47_docs_unclustered")
      Tables.documents(spark, sfDir)
        .repartition(col("doc_id"))
        .write.mode("overwrite").parquet(out)
      out
    }
    val clusteredPath = {
      val t0 = System.nanoTime()
      val out = Layout.writeClustered(spark, sfDir)
      System.err.println(f"[layout] clustered rewrite: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }

    def serve(df: DataFrame): DataFrame = df
      .filter(col("n_chars").between(Layout.LoChars, Layout.HiChars))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

    // AQE wraps the aggregate in AdaptiveSparkPlanExec, whose finalized
    // tree is only reachable through executedPlan — a plain .collect{}
    // over the adaptive node sees no FileSourceScanExec children
    def findScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      // materialized stages are LEAF nodes — their subtree hangs off .plan
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case o => o.children.flatMap(findScans)
    }

    def measure(tag: String, mk: () => DataFrame, allFiles: Int): String = {
      // drain the async listener bus before zeroing (SkewBench's lesson)
      Thread.sleep(1500)
      bytesRead.set(0); recordsRead.set(0)
      val df = mk()
      val t0 = System.nanoTime()
      df.collect() // bounded: one row per lang
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      val scan = findScans(df.queryExecution.executedPlan).head
      val filesRead = scan.metrics("numFiles").value
      val scanRows = scan.metrics("numOutputRows").value
      f""""$tag":{"wall_sec":$wall%.3f,"files_on_disk":$allFiles,""" +
        f""""files_read":$filesRead,"scan_output_rows":$scanRows,""" +
        f""""task_bytes_read":${bytesRead.get},"task_records_read":${recordsRead.get}}"""
    }

    def nFiles(path: String): Int = spark.read.parquet(path).inputFiles.length

    // warmup: touch every copy's footers so no side pays first-read
    serve(spark.read.parquet(basePath)).write.format("noop").mode("overwrite").save()
    serve(Layout.servingScan(spark, clusteredPath).drop("len_band"))
      .write.format("noop").mode("overwrite").save()

    // z-order copy (round 15): the same corpus Morton-clustered on
    // (length band, lang rank) — measured under BOTH single-column
    // predicates, against the linear layout which can only serve one
    val zorderPath = {
      val t0 = System.nanoTime()
      val out = Layout.writeZordered(spark, sfDir)
      System.err.println(f"[layout] z-order rewrite: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    def serveLang(df: DataFrame): DataFrame = df
      .filter(col("lang") === Layout.ZLang)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

    serve(spark.read.parquet(zorderPath)).write.format("noop").mode("overwrite").save()
    serveLang(spark.read.parquet(zorderPath)).write.format("noop").mode("overwrite").save()
    serveLang(spark.read.parquet(clusteredPath)).write.format("noop").mode("overwrite").save()

    val rows = Seq(
      measure("unclustered",
        () => serve(spark.read.parquet(basePath)), nFiles(basePath)),
      measure("clustered",
        () => serve(Layout.servingScan(spark, clusteredPath).drop("len_band")),
        nFiles(clusteredPath)),
      measure("zorder_len",
        () => serve(spark.read.parquet(zorderPath)), nFiles(zorderPath)),
      // the cross-dimension rows: the linear layout has no lang locality,
      // the z-order one does — same table, same predicate, only layout
      measure("clustered_lang",
        () => serveLang(spark.read.parquet(clusteredPath)), nFiles(clusteredPath)),
      measure("zorder_lang",
        () => serveLang(spark.read.parquet(zorderPath)), nFiles(zorderPath)))

    // copy-on-write purge economics (round 15): what fraction of the
    // lake a takedown actually rewrites when the partition grain aligns
    // with the request grain
    val purgeRow = {
      val lake = Layout.writeSourceLake(spark, sfDir)
      def lakeFiles() = {
        val base = java.nio.file.Paths.get(lake)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(base).iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p)
            && p.getFileName.toString.endsWith(".parquet"))
          .map(p => (base.relativize(p).toString, java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toVector
      }
      val before = lakeFiles()
      val t0 = System.nanoTime()
      val hit = Layout.purgeLake(spark, lake, Layout.purgePredicate, "source")
      val wall = (System.nanoTime() - t0) / 1e9
      val after = lakeFiles()
      val beforeSet = before.toSet
      val rewritten = after.filterNot(beforeSet)
      f""""purge":{"wall_sec":$wall%.3f,"partitions_hit":${hit.size},""" +
        f""""files_total":${before.size},"files_rewritten":${rewritten.size},""" +
        f""""bytes_total":${before.map(_._2).sum},"bytes_rewritten":${rewritten.map(_._2).sum}}"""
    }

    val json = s"""{"metric":"layout_census","sf":"$sfDir","cpus":$cpus,""" +
      s""""band_width":${Layout.BandWidth},"predicate":"n_chars BETWEEN ${Layout.LoChars} AND ${Layout.HiChars}",""" +
      s""""lang_predicate":"lang = '${Layout.ZLang}'",""" +
      (rows :+ purgeRow).mkString("", ",", "}")
    println(json)
    val out = sys.env.get("SPARK_GRAFT_LAYOUT_OUT")
    out.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
