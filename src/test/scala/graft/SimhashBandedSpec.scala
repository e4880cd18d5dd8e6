package graft

import org.apache.spark.sql.functions._

import graft.llm.SketchOps

/** Multi-index banding recall guarantee: at Hamming ≤ bands−1, the
  * pigeonhole principle forces at least one clean band, so the banded
  * candidate join finds EXACTLY the pairs a brute-force all-pairs scan
  * finds at that threshold. */
class SimhashBandedSpec extends SparkSpec {

  test("banded pairs == brute-force pairs at the guaranteed threshold") {
    val docs = Tables.documents(spark, sfDir)
    val sk = SketchOps.simhashes(docs).cache()
    val banded = SketchOps.bandedPairs(sk)
      .select("d1", "d2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = sk.select(col("doc_id").as("d1"), col("simhash").as("sh1"))
    val b = sk.select(col("doc_id").as("d2"), col("simhash").as("sh2"))
    val brute = a.join(b, col("d1") < col("d2")) // full cross — test scale only
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= 3)
      .select("d1", "d2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // the corpus genuinely has close pairs
  }
}
