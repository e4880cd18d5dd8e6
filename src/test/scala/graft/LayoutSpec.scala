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
}
