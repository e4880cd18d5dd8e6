package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure census (r11 verdict #5): run the containment/ANN-tier
  * heavyweights at a large SF and report, per query, the task-metric
  * sums a 100 TB deployment sizes its executors from — shuffle bytes
  * written/read, memory and disk spill, and the largest single-task
  * peak execution memory. Sustained spill with zero OOM is the healthy
  * signal: the operators degrade to disk instead of dying.
  *
  * The census is a MEMORY-PER-CORE LADDER: the heap is clamped (8 GB,
  * build.sbt / tools/spill_census.sh), so the executor-thread count
  * sets memory per core — 32 threads ≈ 256 MB/core, 16 ≈ 512 MB,
  * 8 ≈ 1 GB. Every query starts at the top rung; whatever OOMs reruns
  * one rung down. The final row reports the first rung that survived
  * ("mem_per_core_mb") plus its spill stats there, and the rungs it
  * died at ("oom_at_mb") — the measured per-core floor for that
  * operator at that scale, which is the number a deployment divides
  * executor memory by.
  *
  * PROCESS MODEL: one (query, rung) attempt per JVM. A hard OOM in
  * local mode kills executor threads inside the driver JVM; the first
  * in-JVM ladder attempt showed the rebuild path is not reliable after
  * that (direct-buffer exhaustion, shutdown-hook races, getOrCreate
  * observing a half-stopped context), and a shared JVM also lets one
  * attempt's page cache and JIT state contaminate the next
  * measurement. So this main runs ONE query at ONE thread count
  * (SPARK_GRAFT_QUERY / SPARK_GRAFT_CPUS) and appends a single JSONL
  * row to SPARK_GRAFT_SPILL_OUT; `tools/spill_census.sh` walks the
  * ladder across fresh JVMs and assembles SPILL_CENSUS.json. An OOM
  * that kills the JVM before the row is written IS the failure signal
  * (nonzero exit / missing row).
  */
object SpillBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10_salted")
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q01_sales_overview")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt
    // shuffle partition count stays cluster-like (32) at every rung;
    // only the number of CONCURRENTLY RUNNING tasks drops as the
    // ladder descends, exactly as it would on executors with more
    // memory per core
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_SPILL_OUT", "/tmp/spill_rows.jsonl")

    // per-task metric tuples, drained after the timed run
    case class T(shw: Long, shr: Long, mem: Long, disk: Long, peak: Long)
    val tasks = new scala.collection.mutable.ArrayBuffer[T]()

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) tasks.synchronized {
          tasks += T(m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.memoryBytesSpilled, m.diskBytesSpilled,
            m.peakExecutionMemory)
        }
      }
    })

    // untimed warmup (JIT + parquet footers), then drop its task rows
    SparkEntry.queries("q03_daily_sales")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(1500) // listener bus drains asynchronously
    tasks.synchronized(tasks.clear())

    val heapMb = Runtime.getRuntime.maxMemory() / 1048576
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // listener bus drains asynchronously
    val ts = tasks.synchronized(tasks.toVector)

    def mb(v: Long) = v / 1048576.0
    val row = f"""{"query":"$name","cores":$cpus,""" +
      f""""mem_per_core_mb":${heapMb / cpus},"wall_sec":$wall%.1f,""" +
      f""""n_tasks":${ts.size},""" +
      f""""shuffle_write_mb":${mb(ts.map(_.shw).sum)}%.1f,""" +
      f""""shuffle_read_mb":${mb(ts.map(_.shr).sum)}%.1f,""" +
      f""""mem_spill_mb":${mb(ts.map(_.mem).sum)}%.1f,""" +
      f""""disk_spill_mb":${mb(ts.map(_.disk).sum)}%.1f,""" +
      f""""max_task_peak_mem_mb":${mb((ts.map(_.peak) :+ 0L).max)}%.1f}"""
    val w = new java.io.FileWriter(out, true)
    try w.write(row + "\n") finally w.close()
    println(row)
    spark.stop()
  }
}
