package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.llm.{SketchOps, TextOps}

/** Measured recall census for every sketch-gated tier (r11 verdict #2):
  * at small SF the UNBLOCKED exact forms are affordable, so each tier's
  * recall claim becomes an engineering number instead of an assertion.
  *
  * Ground truths (computed here, never shipped — they are exactly the
  * quadratic forms the tiers exist to avoid at 100 TB):
  *  - near-dup: all-pairs exact shingle Jaccard ≥ 0.2 (no banding);
  *  - SimHash: all-pairs Hamming ≤ 3 over the 48-bit sketches (no
  *    source block, no banding);
  *  - same-source containment: d40's exact tier (it IS exact — d40b's
  *    sketch gate is what gets measured against it);
  *  - cross-source containment: the unblocked exact intersection join
  *    restricted to source-unequal pairs (the form the sf3 probe showed
  *    OOMs at scale — affordable at sf0.01/0.1, which is the point).
  *
  * Each tier reports truth/tier/hit counts and recall, plus one
  * sensitivity row per knob (bands for LSH, k and estimate threshold
  * for the containment sketches). Precision against the thresholded
  * truth is 1.0 by construction for d11/d08b/d44 (their last stage is
  * an exact verify at the truth's own threshold) — the census asserts
  * that instead of measuring it. Writes RECALL_CENSUS.json.
  */
object RecallBench {

  /** (doc_id, source, shh) 60-bit shingle hashes + per-doc sizes. */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    TextOps.shingleRows(Tables.documents(spark, dir), 3)
      .select(col("doc_id"), col("source"),
        TextOps.shingleHash(col("sh")).as("shh"))

  /** All-pairs exact (n_inter, sz1, sz2) via the unblocked shingle-hash
    * self-join — Σ df² pair rows, the quadratic truth engine. */
  private def exactPairStats(sh: DataFrame, crossSourceOnly: Boolean): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("d1"), col("source").as("s1"), col("shh"))
    val b = sh.select(col("doc_id").as("d2"), col("source").as("s2"),
      col("shh").as("shh2"))
    val blocked =
      if (crossSourceOnly) a("s1") =!= b("s2") else lit(true)
    a.join(b, a("shh") === b("shh2") && a("d1") < b("d2") && blocked)
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("d1").cast("long"), col("d2").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallRow(label: String, truth: Set[(Long, Long)],
      tier: Set[(Long, Long)]): String = {
    val hits = (truth & tier).size
    val recall = if (truth.isEmpty) 1.0 else hits.toDouble / truth.size
    f"""{"knob":"$label","truth":${truth.size},"tier":${tier.size},"hits":$hits,"recall":$recall%.4f}"""
  }

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime() // wall stamp: keeps reruns byte-distinct
    // (the commit-time artifact gate needs regenerated != committed)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val sh = shingles(spark, sfDir).cache()

    // ---- near-dup: MinHash-LSH banding (d07/d11) vs exact Jaccard ----
    val jaccTruth = pairSet(exactPairStats(sh, crossSourceOnly = false)
      .filter(col("n_inter").cast(DoubleType)
        / (col("sz1") + col("sz2") - col("n_inter")) >= SketchOps.NearDupThreshold))
    val sig = SketchOps.minhashSignatures(docs).cache()
    val lshRows = Seq(2, 4, 8).map { b =>
      val tier = pairSet(SketchOps.lshVerifiedPairs(sig, sh, b))
      require((tier -- jaccTruth).isEmpty,
        s"d11 precision must be 1.0 (exact verify): bands=$b")
      recallRow(s"bands=$b,rows=${16 / b}", jaccTruth, tier)
    }

    // ---- SimHash banding (d08b) vs all-pairs Hamming ≤ 3 ----
    val sk = SketchOps.simhashes(docs).cache()
    val a = sk.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b2 = sk.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val simTruth = pairSet(a.join(b2, col("d1") < col("d2"))
      .filter(bit_count(col("h1").bitwiseXOR(col("h2"))) <= SketchOps.BandedHamming))
    val simTier = pairSet(SketchOps.bandedPairs(sk))
    require((simTier -- simTruth).isEmpty, "d08b precision must be 1.0")
    val simRows = Seq(recallRow("bands=4,bits=12,hamming<=3", simTruth, simTier))

    // ---- same-source containment: d40b's estimate gate vs d40 exact ----
    val d40Truth = pairSet(TextOps.shingleContainment(docs))
    val kmvRows =
      (Seq(8, 16, 32).map(k => (k, SketchOps.ContainEstThreshold)) ++
        Seq((16, 0.3), (16, 0.5))).distinct.map { case (k, t) =>
        val tier = pairSet(SketchOps.containmentKmv(docs, k, t))
        recallRow(f"k=$k,est_t=$t%.1f", d40Truth, tier)
      }

    // ---- cross-source containment: d44's gate vs unblocked exact ----
    val thr = TextOps.ContainmentThreshold
    val d44Truth = pairSet(exactPairStats(sh, crossSourceOnly = true)
      .filter(greatest(
        col("n_inter").cast(DoubleType) / col("sz1").cast(DoubleType),
        col("n_inter").cast(DoubleType) / col("sz2").cast(DoubleType)) >= thr))
    val d44Rows =
      (Seq(8, 16, 32).map(k => (k, SketchOps.ContainEstThreshold)) ++
        Seq((16, 0.3), (16, 0.5))).distinct.map { case (k, t) =>
        val tier = pairSet(SketchOps.crossSourceContainment(docs, k, t))
        require((tier -- d44Truth).isEmpty,
          s"d44 precision must be 1.0 (exact verify): k=$k,t=$t")
        recallRow(f"k=$k,est_t=$t%.1f", d44Truth, tier)
      }

    // ---- a09 k-NN join: sign-LSH bucket recall vs brute-force top-k ----
    // truth = the bits=0 run (single bucket ⇒ exact top-JoinK over the
    // full index side); tier = the bucketed join at each bit width. The
    // knob trades candidate-set size (≈ N/2^bits per probe) against
    // recall — the number a deployment picks bits by.
    def knnPairs(bits: Int): Set[(Long, Long)] =
      graft.llm.VectorOps.knnJoinPairs(spark, sfDir, bits)
        .select(col("left_id").as("d1"), col("right_id").as("d2"))
        .select(col("d1").cast("long"), col("d2").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val knnTruth = knnPairs(0)
    val knnRows = Seq(4, 8, 12).map { bits =>
      recallRow(s"bits=$bits", knnTruth, knnPairs(bits))
    } :+ {
      // the banded tier on the ORGANIC fixture, for contrast with the
      // planted section below: random vectors' global top-3 are far
      // pairs (cos ~0.3), so even OR-amplification stays low here —
      // the serving-grade number lives on the planted fixture
      val tier = graft.llm.VectorOps.a09bKnnJoinBanded(spark, sfDir)
        .select(col("left_id").cast("long").as("d1"),
          col("right_id").cast("long").as("d2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      recallRow(s"banded_B=${graft.llm.VectorOps.KnnBands}", knnTruth, tier)
    }

    def sect(rows: Seq[String]) = rows.mkString("[", ",", "]")

    // ---- a09b serving-grade recall (r14 verdict #2): planted-neighbor
    // fixture (tools/make_skewed.py --planted) — every odd index row is
    // its even probe's EXACT cosine-0.9 twin, so truth = the unblocked
    // pairs at cos ≥ 0.85 is unambiguous (organic 64-dim pairs top out
    // near 0.4). Measures joint recall AND the candidate-pair count
    // against the |A|·|B| all-pairs cost the banding exists to avoid:
    // single-band sign-LSH collides a θ=25.8° pair with p^8 ≈ 0.29;
    // eight OR-ed bands compound to 1-(1-p^8)^8 ≈ 0.94. ----
    val plantedSect = sys.env.get("SPARK_GRAFT_PLANTED_DIR")
      .filter(_.trim.nonEmpty).map { pdir =>
        import graft.llm.VectorOps
        val e = Tables.embeddings(spark, pdir)
        val a = e.filter(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("d1"), col("embedding").as("le"))
        val b = e.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("d2"), col("embedding").as("re"))
        val nA = a.count(); val nB = b.count()
        // quadratic truth engine (census-only): unblocked cross join
        val truth = pairSet(a.crossJoin(b)
          .filter(VectorOps.cosine(col("le"), col("re")) >= 0.85))
        require(truth.size >= (nA * 9) / 10,
          s"planted fixture must carry ~$nA cos-0.9 twins, found ${truth.size}")
        def row(knob: String, bands: Int,
            tierDf: org.apache.spark.sql.DataFrame): String = {
          // tier = the SERVING output (top-k rows), so this is end-to-end
          // recall; candidates = the deduped pair count the exact-scoring
          // stage paid for — the cost column vs all_pairs
          val nCand = VectorOps.knnJoinBandedCandidates(spark, pdir, bands)
            .count()
          val tier = pairSet(tierDf.select(col("left_id").as("d1"),
            col("right_id").as("d2")))
          val hits = (truth & tier).size
          val recall = if (truth.isEmpty) 1.0 else hits.toDouble / truth.size
          f"""{"knob":"$knob","truth":${truth.size},"hits":$hits,""" +
            f""""recall":$recall%.4f,"candidates":$nCand,""" +
            f""""all_pairs":${nA * nB}}"""
        }
        val rows = Seq(
          row("single_band(a09)", 1,
            VectorOps.knnJoinPairs(spark, pdir, 8)),
          row(s"banded_B=${VectorOps.KnnBands}(a09b)", VectorOps.KnnBands,
            VectorOps.a09bKnnJoinBanded(spark, pdir)))
        s""","a09b_planted":{"sf":"$pdir","rows":${sect(rows)}}"""
      }.getOrElse("")

    // ---- boundary probe (r12 verdict #4): planted pairs AT the decision
    // boundary (tools/make_boundary.py) — true containment just above the
    // exact threshold (estimate-noise failure mode) and tiny-in-huge
    // full containment (candidate-miss failure mode). Measures where
    // gate recall actually degrades vs k / est_t, and what restores it —
    // the organic fixture's 1.0000 rows never exercised either mode. ----
    val boundary = sys.env.get("SPARK_GRAFT_BOUNDARY_DIR")
      .filter(_.trim.nonEmpty).map { bdir =>
        val bdocs = Tables.documents(spark, bdir)
        val bsh = shingles(spark, bdir).cache()
        val cfgLabels = Map(0 -> "c=0.51", 1 -> "c=0.55", 2 -> "c=0.60",
          3 -> "c=0.70", 4 -> "c=1.00,ratio=10", 5 -> "c=1.00,ratio=66",
          // sub-threshold plants: truth is EMPTY by construction, so
          // `tier` on these rows is the estimate gate's false-positive
          // count (d40b emits them; d44's exact verify must kill them)
          6 -> "c=0.49(sub)", 7 -> "c=0.45(sub)", 8 -> "c=0.30(sub)")
        // doc_id encodes (family, config) — the make_boundary.py contract
        def cfgOf(id: Long): (Int, Int) =
          (((id / 1000000L) - 1).toInt, ((id % 1000000L) / 10000L).toInt)
        def byCfg(pairs: Set[(Long, Long)], fam: Int): Map[Int, Set[(Long, Long)]] =
          pairs.filter(p => cfgOf(p._1)._1 == fam).groupBy(p => cfgOf(p._1)._2)
        val truth40 = byCfg(pairSet(TextOps.shingleContainment(bdocs)), 0)
        val truth44 = byCfg(pairSet(exactPairStats(bsh, crossSourceOnly = true)
          .filter(greatest(
            col("n_inter").cast(DoubleType) / col("sz1").cast(DoubleType),
            col("n_inter").cast(DoubleType) / col("sz2").cast(DoubleType)) >= thr)), 1)
        (0 to 8).foreach { c =>
          val want = if (c <= 5) 50 else 0 // sub-threshold cfgs: no truth
          require(truth40.getOrElse(c, Set.empty).size == want
            && truth44.getOrElse(c, Set.empty).size == want,
            s"boundary fixture must plant $want truth pairs for cfg=$c:" +
              s" ${truth40.getOrElse(c, Set.empty).size}" +
              s"/${truth44.getOrElse(c, Set.empty).size}")
        }
        val knobs =
          Seq(8, 16, 32, 64, 128).map(k => (k, SketchOps.ContainEstThreshold)) ++
            Seq((16, 0.3), (64, 0.3), (16, 0.5))
        def famRows(fam: Int, truth: Map[Int, Set[(Long, Long)]],
            tierOf: (Int, Double) => DataFrame): Seq[String] =
          knobs.flatMap { case (k, t) =>
            val tier = pairSet(tierOf(k, t))
            (0 to 8).map { c =>
              recallRow(f"${cfgLabels(c)},k=$k,est_t=$t%.1f",
                truth.getOrElse(c, Set.empty),
                tier.filter(p => cfgOf(p._1) == ((fam, c))))
            }
          }
        val rows40 = famRows(0, truth40,
          (k, t) => SketchOps.containmentKmv(bdocs, k, t))
        val rows44 = famRows(1, truth44,
          (k, t) => SketchOps.crossSourceContainment(bdocs, k, t))
        bsh.unpersist()
        s""","d40b_boundary":${sect(rows40)},"d44_boundary":${sect(rows44)}"""
      }.getOrElse("")

    // ---- a12 MMR diversity vs plain top-K (round 15): what λ=0.7 buys.
    // Per query, mean pairwise cosine AMONG the 5 picks (redundancy) and
    // mean relevance (what the diversity trade costs) — MMR vs a01's
    // pure-relevance top-5. Driver-side exact: ≤ |Q|·K ids involved. ----
    val a12Sect = {
      import graft.llm.VectorOps
      def picks(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSeq }
      val mmr = picks(VectorOps.a12MmrRerank(spark, sfDir))
      val topk = picks(VectorOps.a01AnnBruteForce(spark, sfDir))
      val ids = (mmr.values.flatten ++ topk.values.flatten ++ mmr.keys).toSeq.distinct
      val vecs = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      def dot(x: Array[Float], y: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }; s
      }
      def cs(x: Array[Float], y: Array[Float]): Double =
        dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
      def stats(sel: Map[Long, Seq[Long]]): (Double, Double) = {
        val pairCos = for {
          (_, ps) <- sel.toSeq; i <- ps.indices; j <- (i + 1) until ps.size
        } yield cs(vecs(ps(i)), vecs(ps(j)))
        val rel = for ((q, ps) <- sel.toSeq; p <- ps) yield cs(vecs(q), vecs(p))
        (pairCos.sum / pairCos.size, rel.sum / rel.size)
      }
      val (mCos, mRel) = stats(mmr)
      val (tCos, tRel) = stats(topk)
      f""","a12_diversity":{"queries":${mmr.size},""" +
        f""""mmr_mean_pairwise_cos":$mCos%.4f,"topk_mean_pairwise_cos":$tCos%.4f,""" +
        f""""mmr_mean_rel":$mRel%.4f,"topk_mean_rel":$tRel%.4f}"""
    }

    val wall = f"${(System.nanoTime() - t0) / 1e9}%.1f"
    val line = s"""{"metric":"recall_census","sf":"$sfDir","wall_sec":$wall,""" +
      s""""d11_lsh_neardup":${sect(lshRows)},""" +
      s""""d08b_simhash_banded":${sect(simRows)},""" +
      s""""d40b_containment_kmv":${sect(kmvRows)},""" +
      s""""d44_cross_source_gate":${sect(d44Rows)},""" +
      s""""a09_knn_join_bucket":${sect(knnRows)}$a12Sect$plantedSect$boundary}"""
    val outFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT", "RECALL_CENSUS.json")).getAbsoluteFile
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
