package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Skew census (round-11 gate): run the window/salted twin pairs on a
  * HOT-KEY fixture (tools/make_skewed.py plants one key holding ~20% of
  * lineitem and one stratum holding ~20% of documents) and report each
  * query's task-time distribution — wall seconds, and for the stage
  * holding the single longest task: max task ms, median task ms, and
  * the max/median ratio. On skewed data the unsalted forms (q18, d34)
  * show one straggler task carrying the hot key (ratio ≫ 1) while the
  * salted twins (q18b, d34b) spread it across their 16/8 salt shards —
  * the measured evidence, not just the hash-equality proof, that the
  * salt paths absorb skew. Writes SKEW_CENSUS.json and prints it.
  */
object SkewBench {

  private val Names = Seq("q18_dedup_map", "q18b_dedup_map_salted",
    "d34_stratified_sample", "d34b_stratified_salted")

  /** r12 extension (r11 verdict #4): the heavy hash-join family runs the
    * census too — these have no salted twin because Spark's own machinery
    * (AQE skew-join splitting, partial aggregation, broadcast dims) is
    * the skew absorber, and the census documents whether it was needed.
    * Defaults pass only: the WindowGroupLimit toggle is about rank
    * windows, which none of these plan. */
  private val JoinNames = Seq("q01_sales_overview", "q09_supplier_scorecard",
    "d07_minhash_lsh", "d11_lsh_neardup", "d23_dedup_clusters",
    // r15: a09 vs its salted twin on the ORGANIC embeddings (this
    // fixture's copy is unskewed) — the side-by-side wall showing what
    // the structural R-way salt premium costs when there is no skew
    "a09_knn_join", "a09c_knn_join_salted",
    // r16: q53's decorrelated per-part average + self-join both shuffle
    // on l_partkey — this fixture's planted hot key (TPC-H Q17's part
    // distribution is the textbook skew case). Absorbers on the plan:
    // map-side partial aggregation for the per-part average, AQE skew
    // split for the probe-side join.
    "q53_small_qty_revenue")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")

    val tasks = new scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        tasks.synchronized { tasks += ((te.stageId, te.taskInfo.duration)) }
    })

    def runCensusThunk(name: String,
        frame: () => org.apache.spark.sql.DataFrame): String = {
      // the listener bus drains asynchronously: late TaskEnd events from
      // the warmup or the PREVIOUS query can land after a bare clear and
      // contaminate this query's stats (ADVICE r11) — drain before
      // clearing too, not only before reading
      Thread.sleep(1500)
      tasks.synchronized(tasks.clear())
      val t0 = System.nanoTime()
      frame().write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus drains asynchronously
      val byStage = tasks.synchronized(tasks.toVector).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted).toMap
      spark.catalog.clearCache()
      System.gc()
      // every stage's distribution, stage order: the hot key's straggler
      // shows up as max ≫ median in the stage that reduces it
      val stages = byStage.toSeq.sortBy(_._1).map { case (stage, ds) =>
        val med = ds(ds.size / 2).max(1L)
        f"""{"stage":$stage,"n":${ds.size},"max_ms":${ds.max},""" +
          f""""med_ms":$med,"max_over_med":${ds.max.toDouble / med}%.1f}"""
      }.mkString("[", ",", "]")
      f""""$name":{"wall_sec":$wall%.2f,"stages":$stages}"""
    }
    def runCensusOn(name: String, dir: String): String =
      runCensusThunk(name, () => SparkEntry.queries(name)(spark, dir))
    def runCensus(name: String): String = runCensusOn(name, sfDir)

    // untimed warmup (JIT + parquet footers)
    SparkEntry.queries("q03_daily_sales")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    // Pass 1 — engine defaults. Spark 4 plans rank<=k dedup windows with
    // WindowGroupLimit(Partial) BEFORE the shuffle, so the hot key
    // crosses the exchange as <= one row per map task: the plain window
    // forms are already skew-absorbed here (the census proves it).
    val defaults = (Names ++ JoinNames).map(runCensus).mkString("{", ",", "}")
    // Pass 2 — WindowGroupLimit disabled: models engines/shapes without
    // the partial-limit rewrite (rank <= k above the threshold, older
    // engines, windowed aggs that keep every row). THIS is where the
    // planted hot key straggles the plain window and the salted twins'
    // map-side-combined two-phase reduction stays flat.
    val wglConf = "spark.sql.optimizer.windowGroupLimitThreshold"
    spark.conf.set(wglConf, "-1")
    val noWgl = Names.map(runCensus).mkString("{", ",", "}")
    spark.conf.set(wglConf, "1000")

    // Pass 3 (r12, optional) — AQE skew-join splitting, demonstrated on a
    // fixture whose hot key IS the shuffle-join column (make_skewed.py
    // --hot-orderkey: ~20% of lineitem on one l_orderkey). Two knobs make
    // the local fixture behave like the cluster-scale shape: (a)
    // broadcast is disabled for the pass because at 100 TB the orders
    // side is multi-TB and CANNOT broadcast — locally AQE would quietly
    // convert the 22 MB orders side to a broadcast join and the hot key
    // would never shuffle at all (the first run of this pass measured
    // exactly that: flat stages both ways); (b) the skew thresholds are
    // lowered so the fixture's ~200 MB hot partition qualifies the same
    // way a multi-GB partition would at scale.
    //
    // Two shapes, because they demonstrate OPPOSITE findings, both plan-
    // verified (skew=true present/absent in the final adaptive plan):
    //  - join_agg (orders⋈lineitem → sum by l_suppkey): the split FIRES —
    //    the skewed side's hot partition is read as N advisory-sized
    //    slices, the orders row block is duplicated to each, and the
    //    downstream agg keys on a different column so nothing above
    //    needs the join's partitioning.
    //  - q09 (adds countDistinct(o_orderkey)): the split is structurally
    //    BLOCKED — the distinct-agg's partial phase reuses the join's
    //    hashpartitioning(o_orderkey) (ClusteredDistribution satisfied by
    //    a subset key, a shuffle SAVED), and splitting the hot partition
    //    would scatter equal o_orderkeys across tasks, breaking that
    //    distribution. forceOptimizeSkewedJoin=true is the documented
    //    escape: split anyway and re-shuffle the distinct phase.
    val skewJoin = sys.env.get("SPARK_GRAFT_SKEWJOIN_DIR")
      .filter(_.trim.nonEmpty).map { dir =>
        import org.apache.spark.sql.functions.{col, sum => fsum}
        def conf(k: String, v: String): Unit = spark.conf.set(k, v)
        // save EVERY conf the pass mutates and restore the saved values
        // (not literals) — silently wrong otherwise if Spark defaults
        // change or Engine.configure ever sets these (advice r12/r13).
        // adaptive.autoBroadcastJoinThreshold is the one exception: its
        // default is a FALLBACK to the non-adaptive threshold, and
        // conf.get resolves that fallback — restoring the resolved value
        // would pin it and sever the fallback, so it is unset instead.
        val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val skewThresh = spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        val advisory = spark.conf.get(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        val skewFactor = spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        val skewEnabled = spark.conf.get(
          "spark.sql.adaptive.skewJoin.enabled")
        val forceSkew = spark.conf.get(
          "spark.sql.adaptive.forceOptimizeSkewedJoin")
        conf("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        def bareJoin() = {
          val orders = spark.read.parquet(s"$dir/orders.parquet")
          val li = spark.read.parquet(s"$dir/lineitem.parquet")
          orders.join(li, orders("o_orderkey") === li("l_orderkey"))
            .groupBy(col("l_suppkey"))
            .agg(fsum(col("l_extendedprice")).as("rev"))
        }
        val q09 = "q09_supplier_scorecard"
        conf("spark.sql.adaptive.skewJoin.enabled", "true")
        val jOn = runCensusThunk("join_agg", bareJoin _)
        val qOn = runCensusOn(q09, dir)
        conf("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        val qForce = runCensusOn(q09, dir)
        conf("spark.sql.adaptive.forceOptimizeSkewedJoin", forceSkew)
        conf("spark.sql.adaptive.skewJoin.enabled", "false")
        val jOff = runCensusThunk("join_agg", bareJoin _)
        val qOff = runCensusOn(q09, dir)
        conf("spark.sql.adaptive.skewJoin.enabled", skewEnabled)
        conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", skewFactor)
        conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", skewThresh)
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
        conf("spark.sql.autoBroadcastJoinThreshold", bcast)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        s""","aqe_skewjoin":{"sf":"$dir","on":{$jOn,$qOn},""" +
          s""""force":{$qForce},"off":{$jOff,$qOff}}"""
      }.getOrElse("")

    // Pass 4 (r14) — bucket skew in a09's k-NN candidate join, on a
    // fixture where one sign-LSH bucket holds ~20% of BOTH join sides
    // (make_skewed.py --hot-bucket: the clustered-corpus shape; the
    // organic fixture's random signs give uniform buckets, so a09's skew
    // behavior was otherwise unmeasured). Unlike q09 there is no
    // distribution-reusing agg above this join (the top-k window
    // repartitions on left_id regardless), so OptimizeSkewedJoin has no
    // structural blocker. Four local-scale knobs make the fixture behave
    // like the cluster-scale shape, each measured as NECESSARY:
    //  - broadcast disabled: at 100 TB both a09 sides are corpus-sized
    //    and cannot broadcast; locally AQE would convert the ~10 MB side
    //    and the hot bucket would never shuffle at all.
    //  - skew thresholds lowered (1m/1m/2): the fixture's ~3.3 MB hot
    //    partition qualifies the way a multi-GB one would.
    //  - partition coalescing OFF for the pass: with sub-advisory
    //    uniform partitions, CoalesceShufflePartitions rewrites the
    //    reads into multi-reducer CoalescedPartitionSpecs first, and
    //    OptimizeSkewedJoin only matches 1:1 reads — the split silently
    //    never fires (measured: skewMarks=0 at every threshold until
    //    this was disabled). At scale partitions exceed advisory and
    //    this conflict does not arise.
    //  - small scan splits (files.maxPartitionBytes=1m) PLUS a
    //    many-row-group fixture: the split operates at MAP-OUTPUT
    //    granularity, and a row group is the minimum scan unit — with
    //    the fixture written as one row group every hot row funnels
    //    through one map task and the hot reduce partition is
    //    structurally unsplittable ("number of skewed partitions:
    //    left 0" in the rule's debug log). make_skewed.py writes 4k-row
    //    groups; production corpora have thousands of row groups (d47's
    //    OPTIMIZE tier is what keeps that true on a real lake).
    val skewAnn = sys.env.get("SPARK_GRAFT_SKEWANN_DIR")
      .filter(_.trim.nonEmpty).map { dir =>
        def conf(k: String, v: String): Unit = spark.conf.set(k, v)
        val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val skewThresh = spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        val advisory = spark.conf.get(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        val skewFactor = spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        val skewEnabled = spark.conf.get(
          "spark.sql.adaptive.skewJoin.enabled")
        val coalesce = spark.conf.get(
          "spark.sql.adaptive.coalescePartitions.enabled")
        val maxPart = spark.conf.get("spark.sql.files.maxPartitionBytes")
        conf("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf("spark.sql.files.maxPartitionBytes", "1m")
        val a09 = "a09_knn_join"
        // restore in finally (ADVICE r14): a failure mid-census must not
        // leave broadcast/coalescing disabled and 1 MB scan splits for
        // whatever runs after this pass in the same session
        val (aOn, aSaltOn, aOff, aSalt) =
          try {
            conf("spark.sql.adaptive.skewJoin.enabled", "true")
            val on = runCensusOn(a09, dir)
            // salt ∘ AQE — the composition a deployment actually runs:
            // the salt bounds the hot shard structurally by R, AQE's
            // byte split mops up what's left inside each shard
            val saltOn = runCensusOn("a09c_knn_join_salted", dir)
            conf("spark.sql.adaptive.skewJoin.enabled", "false")
            val off = runCensusOn(a09, dir)
            // the salted twin (r15): measured with AQE skew-join OFF —
            // the split is STRUCTURAL (hash(right_id) pre-shards the hot
            // bucket's build side), so it needs none of the byte-based
            // rule's preconditions (fires even on the single-row-group
            // files that make hot keys unsplittable for AQE) and is the
            // knob past AQE's max/med≈10 residual, where every split
            // slice still joined the FULL hot index partition
            val salt = runCensusOn("a09c_knn_join_salted", dir)
            (on, saltOn, off, salt)
          } finally {
            conf("spark.sql.adaptive.skewJoin.enabled", skewEnabled)
            conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", skewFactor)
            conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", skewThresh)
            conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
            conf("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
            conf("spark.sql.files.maxPartitionBytes", maxPart)
            conf("spark.sql.autoBroadcastJoinThreshold", bcast)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
          }
        s""","aqe_skewann":{"sf":"$dir","on":{$aOn},"salted_on":{$aSaltOn},""" +
          s""""off":{$aOff},"salted_off":{$aSalt}}"""
      }.getOrElse("")

    // Pass 5 (r17, verdict #7) — the SCD-2 family under planted key skew
    // (make_skewed.py --hot-custkey: one customer owns ~20% of all order
    // change records). Everything here shuffles on o_custkey: q52's
    // per-day argmax (map-side combinable — the hot key collapses to one
    // row per (custkey, day) per map task), the custkey window (NOT
    // combinable: the hot key's full run history lands in one window
    // task — the straggler this pass measures), q52b's semi/anti key
    // splits, and q52c's per-merge bucket containing the hot key.
    // Defaults only: the per-key claim ("window rows bounded by change
    // count") is exactly what the planted key violates, and the census
    // documents what that costs.
    val skewCust = sys.env.get("SPARK_GRAFT_SKEWCUST_DIR")
      .filter(_.trim.nonEmpty).map { dir =>
        val rows = Seq("q52_scd2_history", "q52b_scd2_merge",
          "q52c_scd2_lake", "q54_asof_dimension")
          .map(runCensusOn(_, dir)).mkString(",")
        // r18 (r17 verdict #4): prove — not infer by analogy to the a09
        // pass — that AQE's byte split absorbs q54's PROBE-side
        // straggler (the orders shuffle carrying the 20%-hot customer
        // into one as-of-join partition). Same local-scale
        // preconditions as passes 3/4, each one necessary:
        //  - broadcast off: at 100 TB neither as-of side broadcasts
        //    (orders is fact-sized, the full interval history is
        //    dimension-history-sized); locally AQE would broadcast the
        //    dim and the probe would never shuffle at all;
        //  - skew thresholds lowered (1m/1m/2) so the fixture's hot
        //    partition qualifies the way a multi-GB one would;
        //  - partition coalescing off: OptimizeSkewedJoin only matches
        //    1:1 shuffle reads (the pass-4 finding).
        val q54 = "q54_asof_dimension"
        def conf(k: String, v: String): Unit = spark.conf.set(k, v)
        val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val skewThresh = spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        val advisory = spark.conf.get(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        val skewFactor = spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        val skewEnabled = spark.conf.get(
          "spark.sql.adaptive.skewJoin.enabled")
        val coalesce = spark.conf.get(
          "spark.sql.adaptive.coalescePartitions.enabled")
        conf("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf("spark.sql.adaptive.coalescePartitions.enabled", "false")
        val (q54On, q54Off) =
          try {
            conf("spark.sql.adaptive.skewJoin.enabled", "true")
            val on = runCensusOn(q54, dir)
            conf("spark.sql.adaptive.skewJoin.enabled", "false")
            val off = runCensusOn(q54, dir)
            (on, off)
          } finally {
            conf("spark.sql.adaptive.skewJoin.enabled", skewEnabled)
            conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", skewFactor)
            conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", skewThresh)
            conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
            conf("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
            conf("spark.sql.autoBroadcastJoinThreshold", bcast)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
          }
        s""","scd2_hotcust":{"sf":"$dir",$rows,""" +
          s""""aqe_q54":{"on":{$q54On},"off":{$q54Off}}}"""
      }.getOrElse("")

    val line = s"""{"metric":"skew_census","sf":"$sfDir","defaults":$defaults,"no_window_group_limit":$noWgl$skewJoin$skewAnn$skewCust}"""
    val outFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_SKEW_OUT", "SKEW_CENSUS.json")).getAbsoluteFile
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
