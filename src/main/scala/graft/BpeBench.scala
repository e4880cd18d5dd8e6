package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.LmOps

/** BPE batching probe on a NATURAL vocabulary (r11 verdict #3): the
  * measured round reduction so far (20 merges in 14-15 rounds) comes
  * from the 31-word synthetic fixture — near the batch rule's worst
  * case, because a tiny vocabulary makes every top pair share symbols
  * with the next. A real tokenizer trains on tens of thousands of
  * distinct words whose pair table is wide and conflict-sparse, which
  * is where disjoint-batching pays. This main builds a deterministic
  * English-like corpus (syllable stems × morphological suffixes under
  * a Zipf rank distribution — the shape BPE exists for), trains
  * K=200 batched AND sequential, asserts the sequences are identical,
  * and reports rounds/K — the evidence behind the "rounds ≪ merges at
  * 30k" extrapolation. Writes BPE_CENSUS.json.
  */
object BpeBench {

  /** Deterministic English-like vocabulary: `n` stems built from
    * phonotactic syllables, each crossed with common morphological
    * suffixes. Shared onsets/vowels/codas and shared suffixes give the
    * corpus the heavy-substring-reuse structure natural text has. */
  def naturalVocab(n: Int): Seq[String] = {
    val onsets = Seq("b", "c", "d", "f", "g", "h", "l", "m", "n", "p",
      "r", "s", "t", "v", "w", "st", "tr", "ch", "sh", "pl", "gr", "br")
    val vowels = Seq("a", "e", "i", "o", "u", "ai", "ea", "ou")
    val codas = Seq("", "n", "r", "t", "l", "nd", "st", "ck")
    val suffixes = Seq("", "s", "ed", "ing", "er", "ly", "tion", "ness")
    val stems = for {
      i <- 0 until n
      o = onsets(i % onsets.size)
      v = vowels((i / onsets.size) % vowels.size)
      c = codas((i / (onsets.size * vowels.size)) % codas.size)
      second = if (i % 3 == 0) vowels((i / 3) % vowels.size) + codas((i / 7) % codas.size) else ""
    } yield o + v + c + second
    stems.distinct.flatMap(s => suffixes.map(s + _)).distinct
  }

  /** Zipf-distributed corpus over the natural vocabulary: doc d is
    * `wordsPerDoc` draws from rank distribution p(r) ∝ 1/(r+1), seeded
    * deterministically so every run (and the spec) sees the same data. */
  def naturalCorpus(spark: SparkSession, nDocs: Int, wordsPerDoc: Int,
      nStems: Int): DataFrame = {
    import spark.implicits._
    val vocab = naturalVocab(nStems).toIndexedSeq
    val rnd = new scala.util.Random(42)
    val harmonic = (1 to vocab.size).map(1.0 / _).sum
    def draw(): String = {
      // inverse-CDF on the Zipf ranks
      var u = rnd.nextDouble() * harmonic
      var r = 0
      while (r < vocab.size - 1 && u > 1.0 / (r + 1)) { u -= 1.0 / (r + 1); r += 1 }
      vocab(r)
    }
    (1 to nDocs).map { d =>
      (d.toLong, (1 to wordsPerDoc).map(_ => draw()).mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val k = sys.env.getOrElse("SPARK_GRAFT_BPE_K", "200").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fixture knobs (r12 verdict #7): the scale run grows the VOCABULARY
    // (nStems) — the word-frequency table is what each training round
    // aggregates, so vocab width, not raw corpus rows, is the axis that
    // shows where driver-round synchronization starts to dominate
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BPE_DOCS", "2000").toInt
    val wordsPerDoc = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "60").toInt
    val nStems = sys.env.getOrElse("SPARK_GRAFT_BPE_STEMS", "700").toInt
    val docs = naturalCorpus(spark, nDocs = nDocs, wordsPerDoc = wordsPerDoc,
      nStems = nStems).cache()
    val distinctWords = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.llm.TextOps.tokens(org.apache.spark.sql.functions.col("text"))))
      .distinct().count()

    val t0 = System.nanoTime()
    val batched = LmOps.bpeTrain(spark, docs, k)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val batchedSec = (System.nanoTime() - t0) / 1e9
    val rounds = LmOps.lastBpeRounds

    val t1 = System.nanoTime()
    val seq = LmOps.bpeTrainSequential(spark, docs, k)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val seqSec = (System.nanoTime() - t1) / 1e9
    require(batched == seq,
      s"batched != sequential on the natural vocabulary: " +
        s"first diff at ${batched.zip(seq).indexWhere(p => p._1 != p._2)}")

    val line = f"""{"metric":"bpe_census","k":$k,"n_docs":$nDocs,"words_per_doc":$wordsPerDoc,"n_stems":$nStems,"merges":${batched.size},"rounds":$rounds,"merges_per_round":${batched.size.toDouble / rounds}%.2f,"distinct_words":$distinctWords,"batched_sec":$batchedSec%.1f,"sequential_sec":$seqSec%.1f,"batched_equals_sequential":true}"""
    val outFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BPE_OUT", "BPE_CENSUS.json")).getAbsoluteFile
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
