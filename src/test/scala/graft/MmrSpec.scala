package graft

import org.apache.spark.sql.functions._

import graft.llm.VectorOps

/** a12 MMR re-ranking: the distributed greedy must reproduce a
  * driver-side simulation BIT-FOR-BIT (sequential-fold dot products,
  * pinned 0.7/0.3 literals, argmax tie-break by id — the oracle's
  * cross-engine contract), plus the structural K-pick invariants. */
class MmrSpec extends SparkSpec {

  private def sdot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    sdot(a, b) / (math.sqrt(sdot(a, a)) * math.sqrt(sdot(b, b)))

  private lazy val vecs: Map[Long, Array[Float]] =
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** Driver-side replica of the a12 algebra: top-20 relevance candidates,
    * then K greedy picks of argmax(0.7·rel − 0.3·maxsim). */
  private def simulate(qid: Long): Seq[(Long, Double, Double)] = {
    val qv = vecs(qid)
    val cands = vecs.toSeq.filter(_._1 != qid)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    var picked = Vector.empty[(Long, Double, Double)] // (id, rel, score)
    for (t <- 1 to 5) {
      val remaining = cands.filterNot(c => picked.exists(_._1 == c._1))
      val scored = remaining.map { case (id, rel) =>
        val score =
          if (t == 1) 0.7 * rel
          else 0.7 * rel - 0.3 * picked.map(p => cos(vecs(id), vecs(p._1))).max
        (id, rel, score)
      }
      picked :+= scored.sortBy { case (id, _, s) => (-s, id) }.head
    }
    picked
  }

  test("a12 == the driver-side greedy simulation, bit-for-bit") {
    val got = VectorOps.a12MmrRerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size == 20 * 5)
    for (qid <- 0L until 20L; (exp, t) <- simulate(qid).zipWithIndex) {
      val (id, rel, score) = got((qid, t + 1))
      assert(id == exp._1, s"q$qid rank ${t + 1}: picked $id, simulated ${exp._1}")
      assert(rel == exp._2 && score == exp._3,
        s"q$qid rank ${t + 1}: ($rel, $score) != $exp")
    }
  }

  test("a12 structure: K distinct picks per query; scores non-increasing past rank 2") {
    val rows = VectorOps.a12MmrRerank(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(rows.size == 20)
    rows.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to 5), s"q$q ranks")
      assert(rs.map(_.getLong(1)).distinct.length == 5, s"q$q picks must be distinct")
      // once the penalty term is live (t ≥ 2), per-candidate scores only
      // decay as the picked set grows, so pick scores are non-increasing
      val s = rs.sortBy(_.getInt(2)).map(_.getDouble(4)).drop(1)
      assert(s.zip(s.tail).forall { case (a, b) => a >= b }, s"q$q scores $s")
    }
  }
}
