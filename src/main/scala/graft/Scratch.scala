package graft
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"[t] $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val full = graft.llm.SketchOps.d07MinhashLsh(spark, dir)
    val noSort = full.queryExecution.analyzed // hack below instead
    time("d07 full noop")(full.write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    // without the final sort
    val unsorted = graft.llm.SketchOps.d07MinhashLsh(spark, dir).sortWithinPartitions("d1")
    time("d07 re-noop (caches cleared)")(graft.llm.SketchOps.d07MinhashLsh(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
