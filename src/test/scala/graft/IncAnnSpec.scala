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
}
