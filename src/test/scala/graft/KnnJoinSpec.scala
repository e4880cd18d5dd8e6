package graft

import org.apache.spark.sql.functions._

import graft.llm.VectorOps

class KnnJoinSpec extends SparkSpec {

  test("a09 links even probes to odd index rows only, ranks dense, cosine non-increasing") {
    val got = VectorOps.a09KnnJoin(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(0) % 2 == 0, s"probe side must be even: ${r.getLong(0)}")
      assert(r.getLong(1) % 2 == 1, s"index side must be odd: ${r.getLong(1)}")
    }
    got.groupBy(_.getLong(0)).foreach { case (lid, rows) =>
      val ranks = rows.map(_.getInt(4)).sorted.toSeq
      assert(ranks == (1 to rows.length), s"left $lid ranks not dense: $ranks")
      val cs = rows.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
      assert(cs == cs.sorted.reverse, s"left $lid cosine not non-increasing: $cs")
      assert(rows.length <= 3)
    }
  }

  test("a09 equals brute force restricted to the probe's bucket (candidate contract)") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", VectorOps.signBucket(col("embedding")))
    val a = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("left_id"), col("embedding").as("le"), col("bucket"))
    val b = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("right_id"), col("embedding").as("re"),
        col("bucket").as("rbucket"))
    val brute = a.join(b, col("bucket") === col("rbucket"))
      .select(col("left_id"), col("right_id"), col("bucket"),
        VectorOps.cosine(col("le"), col("re")).as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("left_id"))
          .orderBy(col("cos_sim").desc, col("right_id"))).cast("int"))
      .filter(col("rank") <= 3)
    val got = VectorOps.a09KnnJoin(spark, sfDir)
      .select("left_id", "right_id", "bucket", "rank")
    val want = brute.select("left_id", "right_id", "bucket", "rank")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("a09c salted twin is row-identical to a09 (salt never changes the answer)") {
    val a09 = VectorOps.a09KnnJoin(spark, sfDir)
    val a09c = VectorOps.a09cKnnJoinSalted(spark, sfDir)
    assert(a09.columns.toSeq == a09c.columns.toSeq)
    assert(a09c.exceptAll(a09).isEmpty && a09.exceptAll(a09c).isEmpty)
  }

  test("a09b banded: superset recall over a09's single band, candidates ≪ all-pairs") {
    // every single-band survivor pair is also a banded CANDIDATE: band 0
    // of a09b is exactly a09's bucket (same leading 8 components), so
    // the OR-union can only add pairs. Compare at the candidate level —
    // top-3 membership can legitimately change when better neighbors
    // from other bands displace a bucket-local one.
    val singleBand = VectorOps.knnJoinPairs(spark, sfDir, 8)
      .select("left_id", "right_id")
    val cand = VectorOps.knnJoinBandedCandidates(spark, sfDir, VectorOps.KnnBands)
    assert(singleBand.exceptAll(cand.select("left_id", "right_id")).isEmpty,
      "banded candidates must contain every single-band pair")
    // cost contract: the deduped candidate set stays well under the
    // |A|·|B| all-pairs cross join the banding exists to avoid
    val e = Tables.embeddings(spark, sfDir)
    val nA = e.filter(col("vec_id") % 2 === 0).count()
    val nB = e.filter(col("vec_id") % 2 === 1).count()
    val nCand = cand.count()
    assert(nCand < nA * nB / 4,
      s"banded candidates $nCand not ≪ all-pairs ${nA * nB}")
    // n_bands is a collision count in [1, B]
    val bad = cand.filter(col("n_bands") < 1 || col("n_bands") > VectorOps.KnnBands)
    assert(bad.isEmpty)
  }
}
