package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CorpusStream

/** Compaction census: what compactIndex/compactStore buy a LONG-RUNNING
  * gated ingest. Every micro-batch commits one index-delta dir and one
  * store batch dir, and every later batch's history probes list + read
  * ALL of them — so per-batch cost grows with batch count unless the
  * deltas are periodically folded. This harness drives the REAL
  * `ingestBatch` (all four gates on) over the documents corpus sliced
  * into N batches, in two regimes on identical input:
  *
  *   - `never`:     no compaction — the delta population grows one dir
  *                  per batch, the store one dir per batch.
  *   - `compactN`:  compactIndex + compactStore after every N batches —
  *                  the physical population stays O(N).
  *
  * Reported per regime: per-batch ingest walls, physical delta-dir
  * counts over time, the mean of the LAST quartile of batch walls (the
  * steady-state a deployment lives in), and a final cold index-probe
  * wall. Writes COMPACTION_CENSUS.json. The correctness side — folds
  * preserve probe results, replay no-ops, and gate behavior — is pinned
  * by StreamingSpec; this census is the wall-clock evidence that the
  * fold is worth running.
  */
object CompactionBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "40").toInt
    val every = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint() // one scan; slices filter the pinned frame

    def physicalDirs(dir: String): Int =
      Option(new java.io.File(dir).list()).map(_.count(_.startsWith("v")))
        .getOrElse(0)

    def runRegime(tag: String, compactEvery: Option[Int]): String = {
      val idx = java.nio.file.Files.createTempDirectory(s"graft_cmp_idx").toString
      val out = java.nio.file.Files.createTempDirectory(s"graft_cmp_out").toString
      val walls = new scala.collection.mutable.ArrayBuffer[Double]
      val dirsOverTime = new scala.collection.mutable.ArrayBuffer[Int]
      (0 until nBatches).foreach { b =>
        val slice = docs.filter(pmod(col("doc_id"), lit(nBatches)) === b)
        val t0 = System.nanoTime()
        CorpusStream.ingestBatch(spark, idx, out, writer = "bench",
          nearDup = true, spanGate = true, containGate = true,
          syndGate = true)(slice, b.toLong)
        walls += (System.nanoTime() - t0) / 1e9
        compactEvery.foreach { e =>
          if ((b + 1) % e == 0 && b + 1 < nBatches) {
            CorpusStream.compactIndex(spark, idx)
            CorpusStream.compactStore(spark, out,
              CorpusStream.storeBuckets(spark, out))
          }
        }
        dirsOverTime += physicalDirs(idx)
        spark.catalog.clearCache()
      }
      // steady-state probe: a fresh read of the full index population
      val p0 = System.nanoTime()
      val idxRows = CorpusStream.readIndex(spark, idx).count()
      val probe = (System.nanoTime() - p0) / 1e9
      val lastQ = walls.takeRight(nBatches / 4)
      val res =
        f""""$tag":{"walls_sec":[${walls.map(w => f"$w%.3f").mkString(",")}],""" +
        f""""delta_dirs":[${dirsOverTime.mkString(",")}],""" +
        f""""last_quartile_avg_sec":${lastQ.sum / lastQ.size}%.3f,""" +
        f""""index_probe_sec":$probe%.3f,"index_rows":$idxRows}"""
      Seq(idx, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
      res
    }

    val rows = Seq(
      runRegime("never", None),
      runRegime(s"compact$every", Some(every)))

    // ANN fold census (r15, gated on SPARK_GRAFT_ANN_DIR): the trigger
    // economics of a10c's retrain-and-fold — per-list delta share vs
    // the DriftRetrainFrac threshold, whether the organic data trips
    // it, and the two walls a deployment weighs: serving incrementally
    // (index ∪ delta, a10) vs the one-off forced retrain+refreeze
    // (compactAnnIndex(force)) plus post-fold serving (a10c). The fold
    // is the scheduled-job cost; the drift board is what schedules it.
    val ann = sys.env.get("SPARK_GRAFT_ANN_DIR").filter(_.trim.nonEmpty)
      .map { dir =>
        import graft.llm.VectorOps
        def wall(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val wServe = wall(VectorOps.a10AnnIncremental(spark, dir)
          .write.format("noop").mode("overwrite").save())
        val drift = VectorOps.a10bAnnDrift(spark, dir).collect() // k rows
        val iR = drift.head.fieldIndex("retrain")
        val iF = drift.head.fieldIndex("delta_frac")
        val lists = drift.map(r =>
          f"""{"centroid_id":${r.getInt(0)},"delta_frac":${r.getDouble(iF)}%.4f,"retrain":${r.getBoolean(iR)}}""")
          .mkString("[", ",", "]")
        val tripped = drift.exists(_.getBoolean(iR))
        val wFold = wall(VectorOps.compactAnnIndex(spark, dir, force = true))
        val wPost = wall(VectorOps.a10cAnnCompacted(spark, dir)
          .write.format("noop").mode("overwrite").save())
        f""","ann_fold":{"sf":"$dir","threshold":${VectorOps.DriftRetrainFrac},""" +
          f""""organic_trigger":$tripped,"lists":$lists,""" +
          f""""serve_incremental_sec":$wServe%.3f,"fold_retrain_sec":$wFold%.3f,""" +
          f""""serve_post_fold_sec":$wPost%.3f}"""
      }.getOrElse("")

    val json = s"""{"metric":"compaction_census","sf":"$sfDir","cpus":$cpus,""" +
      s""""n_batches":$nBatches,"compact_every":$every,""" +
      rows.mkString("", ",", "") + ann + "}"
    println(json)
    sys.env.get("SPARK_GRAFT_COMPACTION_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
