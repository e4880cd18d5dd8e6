package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BottomKAgg

class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("bottomK keeps the k smallest, sorted, merged across partitions") {
    val df = (1 to 1000).map(_.toLong).reverse.toDF("v")
      .repartition(7) // force partial buffers + merge
    val got = df.agg(BottomKAgg.bottomK(col("v"), 5)).collect()(0)
      .getSeq[Long](0)
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("bottomK with fewer rows than k returns all, sorted") {
    val got = Seq(9L, 3L, 7L).toDF("v")
      .agg(BottomKAgg.bottomK(col("v"), 10)).collect()(0).getSeq[Long](0)
    assert(got == Seq(3L, 7L, 9L))
  }

  test("bottomK per group (KMV building block)") {
    val df = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("b", 2L), ("b", 8L))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(BottomKAgg.bottomK(col("v"), 2).as("bk"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(got.toSeq == Seq(("a", Seq(1L, 5L)), ("b", Seq(2L, 8L))))
  }
}
