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
    // (length band, lang rank). The serving aggregate here READS THE
    // TEXT COLUMN (the realistic corpus-lake pattern — a loader pulls
    // documents, not metadata), because that is what row-group skipping
    // monetizes: a metadata-only aggregate over a fixture-sized table is
    // footer-bound and cannot show the byte win. Measured under BOTH
    // single-column predicates on all three layouts — the linear layout
    // can only serve one.
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

    def zread(p: String) = spark.read.parquet(p)
    Seq[DataFrame => DataFrame](serve, serveLang).foreach { s =>
      Seq(basePath, clusteredPath, zorderPath).foreach { p =>
        s(zread(p).drop("len_band")).write.format("noop").mode("overwrite").save()
      }
    }

    val rows = Seq(
      measure("unclustered",
        () => serve(spark.read.parquet(basePath)), nFiles(basePath)),
      measure("clustered",
        () => serve(Layout.servingScan(spark, clusteredPath).drop("len_band")),
        nFiles(clusteredPath)),
      measure("zorder_len",
        () => serve(zread(zorderPath)), nFiles(zorderPath)),
      measure("clustered_lang",
        () => serveLang(zread(clusteredPath).drop("len_band")),
        nFiles(clusteredPath)),
      measure("zorder_lang",
        () => serveLang(zread(zorderPath)), nFiles(zorderPath)))

    // ------------------------------------------------------------------
    // Deterministic row-group skipping census, straight from the parquet
    // FOOTERS (min/max stats per group — the exact inputs the reader's
    // skip decision uses). This is THE layout number a 100 TB lake sizes
    // by: what fraction of row groups (and their data bytes) a predicate
    // touches under each layout. Task-level byte counters are useless
    // for this on a local fs at fixture scale — they are dominated by
    // footer/metadata reads (measured: a full 5.9 MB table scan reports
    // 152 KB) — while the footer census is exact and reproducible.
    // ------------------------------------------------------------------
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.hadoop.metadata.BlockMetaData
    import scala.jdk.CollectionConverters._

    def blocks(dir: String): Seq[BlockMetaData] = {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(conf)
      val it = fs.listFiles(root, true)
      val out = Seq.newBuilder[BlockMetaData]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
          try out ++= rd.getFooter.getBlocks.asScala
          finally rd.close()
        }
      }
      out.result()
    }
    def stats(b: BlockMetaData, name: String) =
      b.getColumns.asScala.find(_.getPath.toDotString == name)
        .map(_.getStatistics).filter(s => s != null && !s.isEmpty)
    // conservative: a group with no usable stats SURVIVES (is read)
    def lenSurvives(b: BlockMetaData): Boolean =
      stats(b, "n_chars").forall { s =>
        val mn = s.genericGetMin.asInstanceOf[java.lang.Long].longValue
        val mx = s.genericGetMax.asInstanceOf[java.lang.Long].longValue
        mx >= Layout.LoChars && mn <= Layout.HiChars
      }
    def langSurvives(b: BlockMetaData): Boolean =
      stats(b, "lang").forall { s =>
        val mn = s.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8
        val mx = s.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8
        mn <= Layout.ZLang && mx >= Layout.ZLang
      }
    def skipRow(dir: String, pred: BlockMetaData => Boolean): String = {
      val bs = blocks(dir)
      val sel = bs.filter(pred)
      s"""{"rg_selected":${sel.size},"rg_total":${bs.size},""" +
        s""""bytes_selected":${sel.map(_.getTotalByteSize).sum},""" +
        s""""bytes_total":${bs.map(_.getTotalByteSize).sum}}"""
    }
    val skipping =
      s""""skipping":{"len":{"unclustered":${skipRow(basePath, lenSurvives)},""" +
        s""""linear":${skipRow(clusteredPath, lenSurvives)},""" +
        s""""zorder":${skipRow(zorderPath, lenSurvives)}},""" +
        s""""lang":{"unclustered":${skipRow(basePath, langSurvives)},""" +
        s""""linear":${skipRow(clusteredPath, langSurvives)},""" +
        s""""zorder":${skipRow(zorderPath, langSurvives)}}}"""

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

    // incremental SCD-2 merge economics (round 16; round 17: versioned
    // protocol + bucket-count sensitivity): what fraction of the bucketed
    // interval lake one change batch reads + writes — the write
    // amplification a daily dimension ingest pays at 100 TB. Under the
    // manifested protocol nothing is rewritten in place: "written" = the
    // new version's files, and the amplification question becomes how
    // fast bytes_written/bytes_total converges to the batch's key
    // fraction as bucket count grows past the birthday bound
    // (SPARK_GRAFT_SCD2_BUCKETS, default "64"; the census runs 64,1024,8192).
    val scd2Rows = {
      import org.apache.spark.sql.functions._
      val bucketCounts = sys.env.getOrElse("SPARK_GRAFT_SCD2_BUCKETS", "64")
        .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
      val o = Tables.orders(spark, sfDir)
      val years = o.select(year(col("o_orderdate")).as("y")).distinct()
        .collect().map(_.getInt(0)).sorted
      def batchOf(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("prio"))
      // seed in ONE merge (scd2Intervals handles multi-change batches):
      // the measurement is the incremental merge against a built lake,
      // not the seed's shape
      val seed = o.filter(year(col("o_orderdate")) < years.last)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("prio"))
        .localCheckpoint()
      val totalKeys = seed.select(col("o_custkey")).distinct().count()
      // the day's change batch: the last year's 50 lowest keys
      val keys = batchOf(years.last).select(col("o_custkey")).distinct()
        .orderBy(col("o_custkey")).limit(50).collect().map(_.getLong(0))
      val lastBatch = batchOf(years.last)
        .filter(col("o_custkey").isin(keys: _*)).localCheckpoint()
      def lakeFiles(lake: String) = {
        val base = java.nio.file.Paths.get(lake)
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(base)
        try walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p)
            && p.getFileName.toString.endsWith(".parquet"))
          .map(p => (base.relativize(p).toString, java.nio.file.Files.size(p)))
          .toVector
        finally walk.close()
      }
      val rows = bucketCounts.map { nBuckets =>
        val lake = Layout.layoutPath(sfDir, s"scd2_bench_lake_$nBuckets")
        val fsPath = new org.apache.hadoop.fs.Path(lake)
        fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(fsPath, true)
        graft.streaming.DimSync.mergeScd2(spark, lake, seed, nBuckets)
        val before = lakeFiles(lake)
        val t0 = System.nanoTime()
        val touched = graft.streaming.DimSync.mergeScd2(spark, lake, lastBatch)
        val wall = (System.nanoTime() - t0) / 1e9
        val after = lakeFiles(lake)
        val beforeKeys = before.map(_._1).toSet
        val written = after.filterNot(f => beforeKeys(f._1))
        val bytesTotal = before.map(_._2).sum
        val bytesWritten = written.map(_._2).sum
        f"""{"buckets_total":$nBuckets,"wall_sec":$wall%.3f,""" +
          f""""batch_keys":${keys.length},"total_keys":$totalKeys,""" +
          f""""buckets_touched":${touched.size},""" +
          f""""files_total":${before.size},"files_written":${written.size},""" +
          f""""bytes_total":$bytesTotal,"bytes_written":$bytesWritten,""" +
          f""""written_frac":${bytesWritten.toDouble / math.max(1L, bytesTotal)}%.4f,""" +
          f""""key_frac":${keys.length.toDouble / math.max(1L, totalKeys)}%.4f}"""
      }
      s""""scd2_merge":${rows.mkString("[", ",", "]")}"""
    }

    val json = s"""{"metric":"layout_census","sf":"$sfDir","cpus":$cpus,""" +
      s""""band_width":${Layout.BandWidth},"predicate":"n_chars BETWEEN ${Layout.LoChars} AND ${Layout.HiChars}",""" +
      s""""lang_predicate":"lang = '${Layout.ZLang}'",""" +
      (rows ++ Seq(skipping, purgeRow, scd2Rows)).mkString("", ",", "}")
    println(json)
    val out = sys.env.get("SPARK_GRAFT_LAYOUT_OUT")
    out.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
