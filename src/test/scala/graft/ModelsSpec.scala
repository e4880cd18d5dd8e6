package graft

import org.apache.spark.sql.functions._

import graft.llm.Models

/** The frozen-model artifact seam (round 11): training persists a tiny
  * parquet model, inference consumes the RE-READ bits, and the oracle
  * SQL — generated after the query ran — reads the same file. These
  * tests pin the seam's three contracts: lossless round-trip, per-dir
  * path keying (sf0.01 / sf1 / dirty gates never clobber each other),
  * and last-trained-dir oracle targeting (the Verify dump order).
  */
class ModelsSpec extends SparkSpec {
  import spark.implicits._

  test("artifact round-trips float bits exactly and re-reads from disk") {
    val dir = java.nio.file.Files.createTempDirectory("modelsA").toString
    val df = Seq((0, Array(1.0f, 2.5f, -3.375f)), (1, Array(0.1f, -0.2f, 7f)))
      .toDF("centroid_id", "ce")
    val back = Models.save(df, dir, "spec_tag_rt")
    val orig = df.select(col("centroid_id"), col("ce"))
      .as[(Int, Array[Float])].collect().toMap
    val got = back.select(col("centroid_id"), col("ce"))
      .as[(Int, Array[Float])].collect().toMap
    assert(got.keySet == orig.keySet)
    got.foreach { case (k, v) =>
      // bit-exact, not epsilon: the oracle hashes these values
      assert(v.map(java.lang.Float.floatToIntBits).toSeq ==
        orig(k).map(java.lang.Float.floatToIntBits).toSeq)
    }
    // the returned frame reads the PERSISTED file, not the input plan
    assert(back.queryExecution.analyzed.toString.contains("parquet"))
  }

  test("paths key by data dir; sqlRef targets the last-trained dir") {
    val dirA = java.nio.file.Files.createTempDirectory("modelsB").toString
    val dirB = java.nio.file.Files.createTempDirectory("modelsC").toString
    assert(Models.path(dirA, "t") != Models.path(dirB, "t"),
      "two gate dirs must never share an artifact path")
    val df = Seq((0, 1.0)).toDF("k", "v")
    Models.save(df, dirA, "spec_tag_key")
    assert(Models.sqlRef("spec_tag_key")
      .contains(Models.path(dirA, "spec_tag_key")))
    // retraining on another dir retargets the oracle reference — the
    // Verify contract (queries run first, oracle SQL is dumped after)
    Models.save(df, dirB, "spec_tag_key")
    assert(Models.sqlRef("spec_tag_key")
      .contains(Models.path(dirB, "spec_tag_key")))
    // and dirA's artifact is still on disk, unclobbered
    assert(spark.read.parquet(Models.path(dirA, "spec_tag_key")).count() == 1)
  }
}
