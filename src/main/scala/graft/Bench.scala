package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print the JSON metrics line (full per-query form,
  * then a short totals line that survives the driver's bounded tail
  * capture; the full JSON is also written to SPARK_GRAFT_BENCH_OUT,
  * default ./BENCH_LOCAL.json, as the self-contained artifact).
  *
  * Queries execute into the `noop` sink — full computation, every column
  * materialized, no disk write — rather than `.count()`, which would let
  * Catalyst prune projections and undercount the real work.
  *
  * Robustness (round-2 hardening): BENCH_r01 recorded 538 s for a ~75 s
  * engine because environment thrash (JIT cold start + VM memory pressure)
  * landed inside individual measurements. Countermeasures:
  *   - one untimed warmup query before the loop (absorbs JVM/JIT/classload
  *     + parquet-footer cold costs that otherwise bill to whichever query
  *     sorts first);
  *   - every query runs twice and reports best-of-2 (a transient stall in
  *     one pass no longer misstates the engine's cost);
  *   - a query that throws is excluded from per-query metrics and the
  *     total, and is listed in an "errors" array instead of silently
  *     contributing its failure time (ADVICE r1);
  *   - build.sbt clamps SPARK_DRIVER_MEM to 8g — an oversized heap makes
  *     this VM 5-8x slower via page-zeroing thrash.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      Engine.configure(s)
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = newSession()

    // optional comma-separated filter for targeted iteration
    // (SPARK_GRAFT_ONLY=d18_corpus_prep_full,d13_corpus_prep)
    val only = sys.env.get("SPARK_GRAFT_ONLY").filter(_.trim.nonEmpty)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names => // fail loudly on typos rather than bench nothing
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not registered: ${unknown.mkString(", ")}")
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    /** One timed execution; None on failure. Clears intra-query caches
      * (sketch signatures etc.) so they can't leak memory pressure into
      * the next measurement. */
    // Cold mode (SPARK_GRAFT_COLD=1): drop the shared-stage memo before
    // every timed pass, so tiered queries (q01/q02, q07/q08, d07..d23,
    // d13/d18, m01/m03 families) bill their shared-stage build instead
    // of reading the session's materialized silver stage. The default
    // (warm) mode models the persisted-silver-table deployment; cold is
    // the from-scratch cost. Both numbers ship with the round
    // (BENCH_LOCAL.json / BENCH_COLD.json).
    val cold = sys.env.get("SPARK_GRAFT_COLD").exists(_.trim.nonEmpty)

    // queries during which the session had to be rebuilt after a fatal
    // executor error (ADVICE r11): published in the JSON so post-rebuild
    // warm timings — which silently re-pay their shared-stage builds on
    // the fresh session — can be discounted when reading the board
    val rebuilds = scala.collection.mutable.ArrayBuffer.empty[String]

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      if (cold) StageCache.clear(spark)
      val t0 = System.nanoTime()
      val r =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          // an executor OOM can take the whole local SparkContext down —
          // without a rebuild, every query sorted after the culprit
          // "fails" on the stopped context and the board reads as a mass
          // failure instead of one bad query (observed: the first sf3 run,
          // d40's OOM zeroed 6 innocent entries). Rebuild and move on.
          if (spark.sparkContext.isStopped) {
            System.err.println(s"[bench] SparkContext died during $name — rebuilding session")
            // drop the dead session's StageCache entries eagerly (their
            // checkpoint blocks died with the executor) instead of
            // leaking them until the next lazy eviction, and record the
            // rebuild so the board can discount post-rebuild timings
            StageCache.clear(spark)
            rebuilds += name
            spark = newSession()
          }
          None
        }
      spark.catalog.clearCache()
      // localCheckpoint snapshot blocks (Ranks, d18) are NOT in the
      // CacheManager — they release only when the ContextCleaner sees the
      // RDD GC'd. Nudge the GC so one query's snapshots can't squat on
      // the clamped 8g heap into the next query's timed passes.
      if (sys.env.get("SPARK_GRAFT_NO_GC").isEmpty) System.gc()
      r
    }

    // Load sentinel (r14 verdict #1): a fixed, data-independent
    // calibration task timed before and after the sweep, plus the OS
    // load average at both points, stamped into the artifact — so a
    // board taken on a loaded machine is SELF-identifying instead of
    // poisoning cross-round per-query diffs (r14's +13% drift on
    // untouched code was concurrent fixture generation; nothing in the
    // artifact said so). Reading rule (README): trust per-query diffs
    // only when both sentinel walls sit within ~1.2× of the comparison
    // round's sentinels.
    // r17: min-of-3 — the single-shot probe false-alarmed (post/pre
    // 3.2× bracketing a sweep whose 143-query geomean moved 1.04×);
    // min is robust to one transient stall, which is exactly the
    // sentinel's own noise mode. A disk probe joins it: r17's first
    // board showed a 1.21× geomean with the CPU sentinel IN band —
    // the poison was IO-side (post-fixture-generation writeback), which
    // a hash loop cannot see but a 32 MB fsync wall can.
    def sentinel(): (Double, Double, Double) = {
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      import org.apache.spark.sql.functions.{col, sum, xxhash64}
      val cpu = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 300000000L, 1L, cpus.toInt)
          .select(sum(xxhash64(col("id"))).as("h")).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val buf = new Array[Byte](32 << 20)
      // Probe the filesystem the SPILLS live on (spark.local.dir), not
      // blindly java.io.tmpdir: on hosts where /tmp is tmpfs the fsync
      // would measure memory while shuffle/spill IO — the writeback-
      // poison surface this probe exists to catch — goes to the disk
      // spark.local.dir points at. SPARK_GRAFT_SENTINEL_DIR overrides
      // (e.g. to probe the fixture volume when it differs). The testdata
      // dir itself is read-only by contract, so it is never probed.
      val probeDir = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_SENTINEL_DIR",
          spark.sparkContext.getConf.get("spark.local.dir",
            System.getProperty("java.io.tmpdir"))))
      val disk = (1 to 2).map { _ =>
        val f = java.io.File.createTempFile("graft_sentinel", ".bin", probeDir)
        val t0 = System.nanoTime()
        val out = new java.io.FileOutputStream(f)
        try { out.write(buf); out.getFD.sync() } finally out.close()
        val d = (System.nanoTime() - t0) / 1e9
        f.delete()
        d
      }.min
      (cpu, disk, load)
    }

    // Untimed warmup: a representative scan+join+agg query warms codegen,
    // parquet readers, and the shuffle machinery before anything is timed.
    queries.find(_._1 == "q03_daily_sales").orElse(queries.headOption).foreach {
      case (n, fn) => runOnce(n, fn)
    }
    // q09b's registered entry documents the READ path of the bucketed
    // warehouse (exchange-free fact-fact join); the one-time bucketed
    // WRITE of both fact tables belongs to warehouse construction, not
    // the query — build it here, untimed, so neither timed pass bills
    // for it (r9 adjudication: in-sequence 11.1 s vs isolated 1.6 s — the
    // write inside the first timed pass under heap pressure was the gap).
    queries.find(_._1 == "q09b_scorecard_bucketed").foreach {
      case (n, fn) => runOnce(n, fn)
    }

    sentinel() // untimed: the sentinel's own codegen/JIT warmup —
               // pre/post must differ only by machine load

    // One full measured sweep, sentinel-bracketed. (time, flaky):
    // flaky = one of the two passes threw. The surviving time still
    // counts, but the query is named in "flaky" so an intermittent
    // OOM/regression can't hide behind best-of-2 (ADVICE r2).
    case class SweepResult(rows: Seq[(String, Option[(Double, Boolean)])],
        pre: Double, post: Double, diskPre: Double, diskPost: Double,
        loadPre: Double, loadPost: Double, rebuilds: Seq[String])
    // each sweep owns its rebuild list (ADVICE r17: a discarded first
    // sweep's rebuild names must not be published as the final board's)
    def sweep(): SweepResult = {
      rebuilds.clear()
      val (pre, diskP, loadP) = sentinel()
      val rs: Seq[(String, Option[(Double, Boolean)])] = queries.map {
        case (name, fn) =>
          val best = (runOnce(name, fn), runOnce(name, fn)) match {
            case (Some(a), Some(b)) => Some((math.min(a, b), false))
            case (a, b)             => a.orElse(b).map((_, true))
          }
          name -> best
      }
      val (post, diskQ, loadQ) = sentinel()
      SweepResult(rs, pre, post, diskP, diskQ, loadP, loadQ, rebuilds.toList)
    }

    // Self-defense (r16 verdict #4): BENCH_r16 shipped with its own
    // sentinel outside the trust band — the mechanism detected the
    // poison but still published it as the round's board. Now a sweep
    // whose sentinel walls drift past the 1.2× band (either direction),
    // or that STARTS on a loaded machine (load_avg_pre > cores/4),
    // retries ONCE; a retry that still violates publishes with
    // "trusted": false so no reader can miss it.
    val loadCap = cpus.toInt / 4.0
    def ratio(a: Double, b: Double): Double =
      math.max(a, b) / math.max(1e-9, math.min(a, b))
    // absolute floors: at sub-100 ms probe walls, scheduler jitter
    // dominates any ratio — a drift must be big in BOTH relative and
    // absolute terms before it may reject a board (measured: min-of-3
    // walls of 0.062/0.108 s bracketing a sweep whose 143-query geomean
    // moved 0.98× — ratio alone cried wolf)
    def violated(s: SweepResult): Boolean =
      (ratio(s.pre, s.post) > 1.2 && math.abs(s.pre - s.post) > 0.15) ||
        (ratio(s.diskPre, s.diskPost) > 2.0 && // disk walls are noisier
          math.abs(s.diskPre - s.diskPost) > 0.2) ||
        s.loadPre > loadCap
    var s = sweep()
    var retried = false
    var discardedRebuilds: Seq[String] = Nil
    if (violated(s)) {
      System.err.println(f"[bench] sentinel violation (cpu ${s.pre}%.3f/" +
        f"${s.post}%.3f disk ${s.diskPre}%.3f/${s.diskPost}%.3f " +
        f"load_pre=${s.loadPre}%.2f) — retrying the sweep once")
      retried = true
      discardedRebuilds = s.rebuilds
      // a clean retry, not a cache-warmed one: the discarded sweep left
      // shared-stage memos and JIT state that would bias the retried
      // board low vs a clean run — rebuild the session and re-run the
      // same untimed warmups a clean run gets (ADVICE r17)
      StageCache.clear(spark)
      spark.stop()
      spark = newSession()
      queries.find(_._1 == "q03_daily_sales").orElse(queries.headOption)
        .foreach { case (n, fn) => runOnce(n, fn) }
      queries.find(_._1 == "q09b_scorecard_bucketed")
        .foreach { case (n, fn) => runOnce(n, fn) }
      s = sweep()
    }
    val trusted = !violated(s)
    val (results, sentPre, sentPost, loadPre, loadPost) =
      (s.rows, s.pre, s.post, s.loadPre, s.loadPost)

    val ok = results.collect { case (k, Some((v, _))) => k -> v }
    val errors = results.collect { case (k, None) => k }
    val flaky = results.collect { case (k, Some((_, true))) => k }
    val qs = ok.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    val sent = f""""sentinel":{"pre_sec":$sentPre%.3f,"post_sec":$sentPost%.3f,""" +
      f""""disk_pre_sec":${s.diskPre}%.3f,"disk_post_sec":${s.diskPost}%.3f,""" +
      f""""load_avg_pre":$loadPre%.2f,"load_avg_post":$loadPost%.2f},""" +
      s""""retried":$retried,"trusted":$trusted,""" +
      s""""discarded_rebuilds":${arr(discardedRebuilds)}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":${arr(errors)},"flaky":${arr(flaky)},"rebuilds":${arr(s.rebuilds)},$sent,"sf":"$sfDir"}"""
    // The round driver stores only a bounded TAIL of this process's
    // output before parsing, and the full line (~3.4 KB at 100 queries)
    // overflows it — BENCH_r07/r08 both landed as parsed:null with the
    // first ~32 per-query timings cut off. Three-way belt and braces:
    //   1. the complete JSON goes to a FILE (self-contained artifact,
    //      committed with the round);
    //   2. the full line still prints (driver contract, parseable
    //      whenever the window is big enough);
    //   3. a short totals line prints LAST — it always fits the tail
    //      window whole, so a last-match parse always succeeds, and it
    //      carries the file path + query count for whoever reads it.
    val outFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")).getAbsoluteFile
    try {
      val w = new java.io.PrintWriter(outFile, "UTF-8")
      try w.println(full) finally w.close()
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    println(full)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${ok.size},"errors":${arr(errors)},"flaky":${arr(flaky)},"rebuilds":${arr(s.rebuilds)},"sf":"$sfDir","queries_file":"$outFile"}""")
    spark.stop()
  }
}
