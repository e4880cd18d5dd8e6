package graft

import graft.llm.SketchOps

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains with the component minimum") {
    // two components: a 4-chain {1,2,3,4} (diameter 3 — needs >1 round)
    // and a pair {10,11}; 2 and 4 never share an edge but share a cluster
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val got = SketchOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges on a 120-link chain (pointer doubling)") {
    // a 121-doc chain has min-id eccentricity 120: pure min-label
    // propagation would need 120 rounds and trip the 50-round bound;
    // pointer doubling must close it in O(log n) rounds. This is the
    // boilerplate-mega-cluster shape (templated docs drifting gradually).
    val pairs = (0L until 120L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = SketchOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 121)
    assert(got.forall(_._2 == 0L), "every chain member labels to the min id")
  }

  test("connectedComponents on an empty pair set is empty, not a crash") {
    val pairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(SketchOps.connectedComponents(pairs).collect().isEmpty)
  }

  test("d23 clusters are consistent with d11 pairs (every pair co-clustered)") {
    val clusters = SketchOps.d23DedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SketchOps.d11LshNearDup(spark, sfDir)
      .select("d1", "d2").collect()
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b), "cluster label above member id")
    }
  }
}
