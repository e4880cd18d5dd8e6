package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.VectorOps

/** a11 D4-style diversity pruning: the scale-safe rank construction
  * (global range-rank minus per-cluster base) must equal the plain
  * per-cluster window row_number, the drop rule must be the exact
  * integer ceil, and the frame must cover the corpus exactly once. */
class DiversitySpec extends SparkSpec {

  private lazy val res = VectorOps.a11DiversityPrune(spark, sfDir).cache()

  test("a11 proto_rank == per-cluster window ROW_NUMBER") {
    val w = Window.partitionBy(col("centroid_id"))
      .orderBy(col("cos_to_centroid").desc, col("vec_id"))
    val want = res.select(col("vec_id"), col("centroid_id"), col("cos_to_centroid"))
      .withColumn("pr", row_number().over(w))
      .select(col("vec_id"), col("pr"))
    val got = res.select(col("vec_id"), col("proto_rank").cast("int").as("pr"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("a11 drop rule: kept == rank past the integer ceil(25%), per cluster") {
    val bad = res.filter(
      col("kept") =!= (col("proto_rank") > expr("(cluster_n + 3) div 4")))
    assert(bad.isEmpty)
    // each cluster drops EXACTLY ceil(n/4): kept count is n - ceil(n/4)
    val perCluster = res.groupBy(col("centroid_id"))
      .agg(max(col("cluster_n")).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("k"),
        count(lit(1)).as("c"), max(col("proto_rank")).as("maxr"))
      .collect()
    perCluster.foreach { r =>
      val (n, k, c, maxr) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(c == n && maxr.toLong == n, s"cluster ${r.get(0)}: ranks must be 1..n")
      assert(k == n - (n + 3) / 4, s"cluster ${r.get(0)}: kept $k of $n")
    }
  }

  test("a11 covers every embedding exactly once") {
    val total = Tables.embeddings(spark, sfDir).count()
    assert(res.count() == total)
    assert(res.select(col("vec_id")).distinct().count() == total)
  }
}
