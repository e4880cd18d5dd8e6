package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSpec {

  test("d47 equals the same aggregate over the raw table (layout is value-invariant)") {
    val got = Layout.d47LayoutCluster(spark, sfDir)
    val want = Tables.documents(spark, sfDir)
      .filter(col("n_chars").between(Layout.LoChars, Layout.HiChars))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("serving scan partition-prunes: only in-band directories are read") {
    val out = Layout.writeClustered(spark, sfDir)
    val served = Layout.servingScan(spark, out)
    served.collect()
    val scans = served.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("len_band")),
      s"no len_band partition filter in: ${scan.partitionFilters}")
    val readFiles = scan.metrics("numFiles").value
    val allFiles = spark.read.parquet(out).inputFiles.length
    assert(readFiles < allFiles,
      s"pruning read $readFiles of $allFiles files — nothing pruned")
    // the n_chars conjunct reaches the parquet reader as a pushed filter
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("n_chars"), s"n_chars not pushed: $pushed")
  }

  test("d47b equals the same aggregate over the raw table (z-order is value-invariant)") {
    val got = Layout.d47bLayoutZorder(spark, sfDir)
    val want = Tables.documents(spark, sfDir)
      .filter(col("lang") === Layout.ZLang
        && col("n_chars").between(Layout.LoChars, Layout.HiChars))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("z-ordered files are local in BOTH dimensions and both predicates push down") {
    // the locality property needs enough files for the curve to split on
    // both dimensions' bits (the test session's 4 shuffle partitions give
    // the curve only 2 split levels); 16 matches half the bench session
    val out = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        Layout.writeZordered(spark, sfDir)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val files = spark.read.parquet(out).inputFiles
    assert(files.length > 1, "need >1 file to say anything about locality")
    val all = Tables.documents(spark, sfDir)
    val nLangs = all.select(col("lang")).distinct().count()
    val span = all.agg(max(col("n_chars")) - min(col("n_chars"))).head.getLong(0)
    // per-file stats: a z-ordered file covers a RECTANGLE of (lang,
    // length) space, so on average it must hold fewer languages than the
    // corpus and a narrower n_chars range than the global span — the
    // property parquet min/max skipping monetizes for either predicate.
    // (A linear n_chars sort passes the span check but fails the lang
    // one; a lang sort vice versa.)
    val perFile = files.map { f =>
      val d = spark.read.parquet(f)
        .agg(countDistinct(col("lang")).cast("double").as("nl"),
          (max(col("n_chars")) - min(col("n_chars"))).cast("double").as("sp"))
        .head
      (d.getDouble(0), d.getDouble(1))
    }
    val avgLangs = perFile.map(_._1).sum / files.length
    val avgSpan = perFile.map(_._2).sum / files.length
    assert(avgLangs < nLangs * 0.75,
      s"files average $avgLangs of $nLangs languages — no lang locality")
    assert(avgSpan < span * 0.75,
      s"files average n_chars span $avgSpan of global $span — no length locality")
    // and both serving conjuncts reach the reader
    val served = spark.read.parquet(out)
      .filter(col("lang") === Layout.ZLang
        && col("n_chars").between(Layout.LoChars, Layout.HiChars))
    served.collect()
    val scan = served.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("lang") && pushed.contains("n_chars"),
      s"serving conjuncts not pushed: $pushed")
  }

  test("d49 purge removes exactly the requested rows and equals the anti-filtered original") {
    val got = Layout.d49PurgeLake(spark, sfDir)
    val want = Tables.documents(spark, sfDir)
      .filter(!Layout.purgePredicate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
    // row-level: the purged lake holds exactly the surviving rows
    val lake = Layout.layoutPath(sfDir, "d49_docs_by_source")
    val lakeRows = spark.read.parquet(lake)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    val wantRows = Tables.documents(spark, sfDir)
      .filter(!Layout.purgePredicate)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    assert(lakeRows.exceptAll(wantRows).isEmpty
      && wantRows.exceptAll(lakeRows).isEmpty)
  }

  test("d49 is copy-on-write: only the hit partition's files change") {
    import scala.jdk.CollectionConverters._
    def fileMap(root: String): Map[String, (Long, Long)] = {
      val base = java.nio.file.Paths.get(root)
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .map(p => (base.relativize(p).toString,
          (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
    val lake = Layout.writeSourceLake(spark, sfDir)
    val before = fileMap(lake)
    val rewritten = Layout.purgeLake(spark, lake, Layout.purgePredicate, "source")
    assert(rewritten === Seq(Layout.PurgeSource),
      s"blast radius should be exactly one partition, got $rewritten")
    val after = fileMap(lake)
    val hitDir = s"source=${Layout.PurgeSource}/"
    val untouchedBefore = before.filterNot(_._1.startsWith(hitDir))
    val untouchedAfter = after.filterNot(_._1.startsWith(hitDir))
    assert(untouchedAfter === untouchedBefore,
      "copy-on-write must leave non-hit partitions byte-untouched")
    assert(after.keys.exists(_.startsWith(hitDir)),
      "partial purge keeps the hit partition (with survivors)")
    assert(before.filter(_._1.startsWith(hitDir)) !=
      after.filter(_._1.startsWith(hitDir)))
  }

  test("purge predicate evaluating to NULL keeps the row (three-valued logic)") {
    import spark.implicits._
    // a lake whose predicate column is nullable: rows where the
    // predicate is NULL satisfy neither pred nor !pred, so a naive
    // .filter(!pred) rewrite would silently drop them from the hit
    // partition — they must survive the copy-on-write
    val lake = java.nio.file.Files
      .createTempDirectory("purge_null_lake").toString
    Seq(
      ("a", "hot", Some(5L)),   // matches → purged
      ("b", "hot", None),       // pred NULL → MUST survive
      ("c", "hot", Some(99L)),  // pred false → survives
      ("d", "cold", Some(5L))   // other partition, untouched
    ).toDF("id", "part", "score")
      .write.mode("overwrite").partitionBy("part").parquet(lake)
    val pred = col("part") === "hot" && col("score") < 10L
    val rewritten = Layout.purgeLake(spark, lake, pred, "part")
    assert(rewritten === Seq("hot"))
    val left = spark.read.parquet(lake).select(col("id"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(left === Seq("b", "c", "d"),
      s"NULL-predicate row must survive the rewrite, got $left")
  }

  test("purging an entire partition deletes its directory") {
    val lake = Layout.writeSourceLake(spark, sfDir)
    val rewritten = Layout.purgeLake(spark, lake, col("source") === "src3", "source")
    assert(rewritten === Seq("src3"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(lake, "source=src3")),
      "fully-purged partition directory must not survive dynamic overwrite")
    val left = spark.read.parquet(lake)
    assert(left.filter(col("source") === "src3").isEmpty)
    assert(left.count() ===
      Tables.documents(spark, sfDir).filter(col("source") =!= "src3").count())
  }
}
