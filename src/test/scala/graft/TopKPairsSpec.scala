package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPairsAgg

class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(r: Row): Seq[(Long, Long)] =
    r.getSeq[Row](0).map(p => (p.getLong(0), p.getLong(1)))

  test("topKPairs keeps the k best by (score desc, id asc), merged across partitions") {
    val df = (1L to 1000L).map(v => (v % 100, v)).toDF("score", "id")
      .repartition(7) // force partial buffers + merge
    val got = pairs(df.agg(TopKPairsAgg.topKPairs(col("score"), col("id"), 3)).collect()(0))
    // score 99 occurs at ids 99, 199, 299, ... — ties break on smallest id
    assert(got == Seq((99L, 99L), (99L, 199L), (99L, 299L)))
  }

  test("topKPairs with fewer rows than k returns all, ranked") {
    val got = pairs(Seq((1L, 10L), (5L, 20L), (5L, 7L)).toDF("score", "id")
      .agg(TopKPairsAgg.topKPairs(col("score"), col("id"), 10)).collect()(0))
    assert(got == Seq((5L, 7L), (5L, 20L), (1L, 10L)))
  }

  test("topKPairs per group matches the window form (postings contract)") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 400L)
      .map(v => (s"t${v % 7}", v % 13, v)) // (term, tf, doc)
      .toDF("tok", "tf", "doc_id")
      .repartition(5)
    val agg = df.groupBy("tok")
      .agg(TopKPairsAgg.topKPairs(col("tf"), col("doc_id"), 4).as("p"))
      .select(col("tok"), posexplode(col("p")))
      .select(col("tok"), (col("pos") + 1).as("rank"),
        col("col.score").as("tf"), col("col.id").as("doc_id"))
    val win = df.withColumn("rank",
        row_number().over(Window.partitionBy(col("tok"))
          .orderBy(col("tf").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= 4)
      .select(col("tok"), col("rank"), col("tf"), col("doc_id"))
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }

  test("d46 inverted index: df/tf_total/postings agree with a recomputed window form") {
    val got = graft.llm.QualityOps.d46InvertedIndex(spark, sfDir)
    assert(got.count() > 0)
    // every term in the output has df >= 3 and ranks are 1..min(df, 5), dense
    val byTok = got.collect().groupBy(_.getString(0))
    byTok.foreach { case (tok, rows) =>
      val df = rows.head.getLong(1)
      assert(df >= 3, s"$tok df=$df below MinDf")
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to math.min(df, 5L).toInt), s"$tok ranks not dense: $ranks")
      // postings tf are non-increasing by rank
      val tfs = rows.sortBy(_.getInt(3)).map(_.getLong(5)).toSeq
      assert(tfs == tfs.sortBy(-_), s"$tok postings not tf-ordered: $tfs")
    }
  }
}
