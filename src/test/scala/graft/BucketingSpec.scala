package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.sources.Sinks

/** The bucketing scale story, proven on the physical plan: two tables
  * bucketed on the join key sort-merge-join with ZERO shuffle exchanges
  * (SURVEY.md §2.3 scale note — the orders⋈lineitem join is the one
  * genuine shuffle in the batch tier; bucketing removes it for repeated
  * joins). */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans without any shuffle exchange") {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    Sinks.bucketed(o, "b_orders", 4, Seq("o_orderkey"))
    Sinks.bucketed(l, "b_lineitem", 4, Seq("l_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected exchange-free co-located join, found ${shuffles.size} shuffles")
      // and it still computes the right thing
      assert(joined.count() ==
        o.join(l, col("o_orderkey") === col("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
