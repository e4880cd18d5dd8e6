package graft

import org.apache.spark.sql.SparkSession

import graft.analytics.OlapQueries

/** Convergence census for the iterative graph operator (r16 verdict
  * #6): what the ε-exit knob (`graft.iter.convergeEpsMicro`) buys on
  * the real sf0.1 co-purchase graph — iterations executed, wall
  * seconds, and top-30 agreement with the fixed-count reference, per ε
  * rung. The fixed 10-iteration run is the oracle-gated mode and the
  * quality reference; ε rungs show the saved-iterations / rank-drift
  * trade a deployment tunes. Writes GRAPH_CENSUS.json and prints it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.GraphBench"
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")

    // the edge frame is the shared input, built once and pinned so the
    // rungs measure the ITERATIONS, not the pair blow-up
    val pairs = OlapQueries.copurchasePairs(spark, sfDir).localCheckpoint()
    val nEdges = pairs.count()

    def top30(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      import org.apache.spark.sql.functions.col
      df.orderBy(col("r").desc, col("node")).limit(30)
        .collect().map(_.getLong(0)).toSeq
    }

    def run(eps: Long): (Double, Int, Seq[Long]) = {
      if (eps >= 0) spark.conf.set(OlapQueries.ConvergeEpsKey, eps.toString)
      else spark.conf.unset(OlapQueries.ConvergeEpsKey)
      val t0 = System.nanoTime()
      val (df, iters) =
        try OlapQueries.weightedPageRankConverged(pairs)
        finally spark.conf.unset(OlapQueries.ConvergeEpsKey)
      val ids = top30(df)
      ((System.nanoTime() - t0) / 1e9, iters, ids)
    }

    run(-1) // untimed warmup: codegen + shuffle machinery
    val (refWall, refIters, refTop) = run(-1)
    val rungs = sys.env.getOrElse("SPARK_GRAFT_GRAPH_EPS", "0,10000,50000,100000")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    val rows = rungs.map { eps =>
      val (wall, iters, ids) = run(eps)
      val agree = ids.count(refTop.contains)
      f"""{"eps_micro":$eps,"wall_sec":$wall%.2f,"iters":$iters,""" +
        f""""iters_saved":${refIters - iters},"top30_agree":$agree}"""
    }
    val json = f"""{"metric":"graph_census","sf":"$sfDir","cpus":$cpus,""" +
      f""""n_edges":$nEdges,"fixed":{"wall_sec":$refWall%.2f,"iters":$refIters},""" +
      s""""eps_rungs":${rows.mkString("[", ",", "]")}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_GRAPH_OUT", "GRAPH_CENSUS.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
