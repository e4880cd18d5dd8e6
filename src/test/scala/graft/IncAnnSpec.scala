package graft

import org.apache.spark.sql.functions._

import graft.llm.{SketchOps, TextOps, VectorOps}

/** Contracts for the incremental ANN tier (a10/a10b).
  *
  * The load-bearing claim is FOLD PARITY: assigning the index stratum
  * and the delta batch in separate passes against the frozen centroids,
  * then unioning, must equal the one-pass assignment a10 actually runs —
  * i.e. serving over index ∪ delta is result-identical to serving after
  * a compaction folded the delta in. The probe is a pure function of the
  * assignment, so parity at the assignment level carries to the results.
  */
class IncAnnSpec extends SparkSpec {

  private def deltaIds(): Set[Long] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"))
      .filter(TextOps.hashBucket(col("vec_id")) >= SketchOps.IndexBuckets)
      .collect().map(_.getLong(0)).toSet

  test("a10 fold parity: two-pass index/delta assignment == one-pass") {
    val (cents, onePass) = VectorOps.a10Index(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("__norm", sqrt(VectorOps.dot(col("embedding"), col("embedding"))))
    val isDelta = TextOps.hashBucket(col("vec_id")) >= SketchOps.IndexBuckets
    val twoPass = VectorOps.assignTo(e.filter(!isDelta), cents)
      .union(VectorOps.assignTo(e.filter(isDelta), cents))
    def asn(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
      df.select(col("vec_id"), col("centroid_id").cast("int"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val one = asn(onePass)
    assert(one == asn(twoPass), "incremental ingest must equal fold-then-serve")
    assert(one.size == Tables.embeddings(spark, sfDir).count())
  }

  test("a10 probe provenance and delta searchability") {
    val res = VectorOps.a10AnnIncremental(spark, sfDir).collect()
    val delta = deltaIds()
    assert(res.nonEmpty)
    res.foreach { r =>
      val nid = r.getLong(r.fieldIndex("neighbor_id"))
      assert(r.getBoolean(r.fieldIndex("from_delta")) == delta.contains(nid),
        s"from_delta must be the hash-bucket provenance for neighbor $nid")
    }
    // a fresh (delta) vector must actually be servable: with ~20% of the
    // corpus in the delta stratum, the fixture's 20×top-5 board reaching
    // zero delta neighbors would mean the delta never entered the lists
    assert(res.exists(_.getBoolean(res.head.fieldIndex("from_delta"))),
      "no delta vector surfaced in any top-k — the upsert path is dead")
    // ranks are dense 1..k per query, ordered by cos desc
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(rows.head.fieldIndex("rank")))
      assert(byRank.map(_.getInt(byRank.head.fieldIndex("rank"))).toSeq ==
        (1 to byRank.length))
      val cos = byRank.map(_.getDouble(byRank.head.fieldIndex("cos_sim")))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("a10b drift census: counts partition the corpus, retrain matches the threshold") {
    val rows = VectorOps.a10bAnnDrift(spark, sfDir).collect()
    val total = Tables.embeddings(spark, sfDir).count()
    val nIdx = rows.map(_.getLong(rows.head.fieldIndex("n_index"))).sum
    val nDel = rows.map(_.getLong(rows.head.fieldIndex("n_delta"))).sum
    assert(nIdx + nDel == total, "every vector lands in exactly one list")
    assert(nDel == deltaIds().size.toLong)
    rows.foreach { r =>
      val frac = r.getDouble(r.fieldIndex("delta_frac"))
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getBoolean(r.fieldIndex("retrain")) ==
        (frac >= VectorOps.DriftRetrainFrac))
      if (r.getLong(r.fieldIndex("n_index")) > 0)
        assert(!r.isNullAt(r.fieldIndex("mean_cos_index")))
    }
    // the 80/20 hash split should put roughly a fifth of vectors in the
    // delta stratum overall (md5 buckets are uniform)
    val globalFrac = nDel.toDouble / total
    assert(globalFrac > 0.1 && globalFrac < 0.3, s"delta share $globalFrac")
  }

  /** The frozen-model serving algebra recomputed in-spec from a given
    * centroid frame — the independent expectation for a10c's fold
    * parity (reads the PERSISTED bits, not the query's internal state). */
  private def servingFrom(cents: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val c = cents.withColumn("cn",
      sqrt(VectorOps.dot(col("ce"), col("ce"))))
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("__norm", sqrt(VectorOps.dot(col("embedding"), col("embedding"))))
    val assigned = VectorOps.assignTo(e, cents)
    val probes = e.filter(col("vec_id") < VectorOps.NQueries)
      .crossJoin(broadcast(c))
      .withColumn("__cs", VectorOps.dot(col("embedding"), col("ce"))
        / (col("__norm") * col("cn")))
      .withColumn("__pr", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("__cs").desc, col("centroid_id"))))
      .filter(col("__pr") <= VectorOps.NProbeDefault)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("__norm").as("qn"), col("centroid_id").as("pc"))
    val n = assigned.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), col("__norm").as("nn"),
      col("centroid_id").as("nc"))
    val scored = probes.join(n,
        col("pc") === col("nc") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (VectorOps.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
          .as("cos_sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= VectorOps.K)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  test("a10c fold: artifact-backed serving parity, ledger reset, both trigger branches") {
    // organic branch: the trigger is whatever the data says
    val res = VectorOps.a10cAnnCompacted(spark, sfDir)
    val rows = res.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.getBoolean(rows.head.fieldIndex("from_delta"))),
      "post-fold serving must report an empty delta ledger")
    val disk = spark.read.parquet(graft.llm.Models.path(sfDir, "a10c_centroids"))
    val kBefore = disk.count() // snapshot before the forced overwrite
                               // deletes these part files
    val got = res.drop("from_delta")
    val want = servingFrom(disk)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "serving must replay exactly from the persisted folded artifact")
    // forced-retrain branch: re-freeze on index ∪ delta (what a tripped
    // drift census triggers) — parity must hold on the NEW bits too
    VectorOps.compactAnnIndex(spark, sfDir, force = true)
    val disk2 = spark.read.parquet(graft.llm.Models.path(sfDir, "a10c_centroids"))
    val got2 = VectorOps.a10cAnnCompacted(spark, sfDir).drop("from_delta")
    val want2 = servingFrom(disk2)
    assert(got2.exceptAll(want2).isEmpty && want2.exceptAll(got2).isEmpty,
      "post-retrain serving must replay from the retrained artifact")
    // the retrained model keeps the same list count (k rows, modulo
    // empty-cluster drops — none at fixture scale)
    assert(disk2.count() == kBefore)
  }
}
