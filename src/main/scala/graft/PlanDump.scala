package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of named SparkEntry
  * queries to a file (PLANS.md evidence). Usage:
  *   runMain graft.PlanDump <sfDir> <outFile> <query> [query…]
  */
object PlanDump {

  /** Internal stages whose plans matter for evidence but that execute
    * EAGERLY inside their registered query (pinned frames, iterative
    * loops) — a PlanDump of the registered name would only show the
    * final consumer plan. */
  private def extras: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "q51_pairs" -> ((s, d) => graft.analytics.OlapQueries.copurchasePairs(s, d))
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val text = names.map { n =>
      val plan = SparkEntry.queries.getOrElse(n, extras(n))(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      s"===== $n =====\n$plan"
    }.mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), text)
    spark.stop()
  }
}
