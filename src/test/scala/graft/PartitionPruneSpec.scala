package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** The partitioned-lake scale story, proven on the physical plan:
  * `Sinks.parquetPartitioned` writes `dt=YYYY-MM-DD/` directories and a
  * date predicate on the read side prunes the scan to ONLY the matching
  * partitions — the 100 TB answer to the reference's latest-file S3
  * listing (`ods_layer.py:289-308`), where finding "today's" data costs
  * a full listing of every object ever written. Companion to
  * BucketingSpec (which proves the shuffle-free co-located join). */
class PartitionPruneSpec extends SparkSpec {

  test("dt= lake: a date predicate reads 1 of 3 partitions (plan-verified)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake_dt").toString
    val events = Tables.events(spark, sfDir)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    val days = events.select(col("dt")).distinct()
      .orderBy(col("dt")).limit(3).collect().map(_.getString(0))
    assert(days.length == 3, s"need 3 distinct days in testdata, got ${days.length}")
    val lake = events.filter(col("dt").isin(days: _*))
    Sinks.parquetPartitioned(lake, dir, "dt")

    // the partition column survives the round-trip and the data is intact
    val read = spark.read.parquet(dir)
    assert(read.columns.contains("dt"))
    assert(read.count() == lake.count())

    // a dt predicate becomes a PartitionFilter (metadata-only pruning),
    // NOT a data filter evaluated per row
    val oneDay = read.filter(col("dt") === days(1))
    val scan = oneDay.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "dt predicate must reach the scan as a partition filter")
    oneDay.collect() // populate scan metrics
    assert(scan.metrics("numPartitions").value == 1,
      s"expected 1 of 3 partitions read, got ${scan.metrics("numPartitions").value}")
    assert(oneDay.count() ==
      events.filter(col("dt") === days(1)).count())

    // control: the unfiltered read touches all 3 partitions
    val full = spark.read.parquet(dir)
    val fullScan = full.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    full.collect()
    assert(fullScan.metrics("numPartitions").value == 3)
  }
}
