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
}
