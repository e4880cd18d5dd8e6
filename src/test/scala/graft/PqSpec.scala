package graft

import org.apache.spark.sql.functions._

import graft.llm.VectorOps

/** Recall + structure contract for the product-quantization tier (a07)
  * against the exact brute-force baseline (a01). The fixture embeddings
  * are structureless random vectors — quantization's worst case (no
  * cluster structure for codebooks to exploit) — so the asserted floor is
  * the measured recall minus a small margin; clustered production
  * corpora sit above it. */
class PqSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ADC + exact re-rank recall vs brute force; output shape") {
    val exact = pairs(VectorOps.a01AnnBruteForce(spark, sfDir))
    val pq = VectorOps.a07AnnPq(spark, sfDir)
    val got = pairs(pq)
    assert(got.size == 100) // 20 queries × top-5, like a01
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.5,
      s"PQ recall@5 = $recall — below the random-vector floor")
    // ranks contiguous per query
    val mx = pq.groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), max(col("rank")).as("m"))
      .filter(col("k") =!= 5 || col("m") =!= 5).count()
    assert(mx === 0)
  }

  test("a08 IVF-PQ recall vs brute force; candidates bounded by probed lists") {
    val exact = pairs(VectorOps.a01AnnBruteForce(spark, sfDir))
    val ivfpq = VectorOps.a08AnnIvfPq(spark, sfDir)
    val got = pairs(ivfpq)
    assert(got.size == 100) // 20 queries × top-5
    // two approximations compound (5/8 lists probed + residual PQ), and
    // the fixture is IVF's worst case (structureless random vectors) —
    // floor set under the measured value, well above chance (~0.03)
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.4,
      s"IVF-PQ recall@5 = $recall — below the random-vector floor")
    // ranks contiguous per query
    val mx = ivfpq.groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), max(col("rank")).as("m"))
      .filter(col("k") =!= 5 || col("m") =!= 5).count()
    assert(mx === 0)
  }
}
