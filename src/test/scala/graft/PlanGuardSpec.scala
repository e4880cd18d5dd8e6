package graft

/** Scale-regression guard: every registered query's physical plan is
  * checked for the anti-patterns that kill 100 TB runs. A new query that
  * trips a pattern must either fix its plan or consciously join the
  * whitelist with a bounded-size justification.
  *
  * Patterns:
  *   - CartesianProduct: never acceptable (an unbounded all-pairs join).
  *   - BroadcastNestedLoopJoin: acceptable ONLY when the build side is a
  *     broadcast of a bounded frame (a 1-row global aggregate, a k-row
  *     centroid table) — the whitelisted queries below all cross-join
  *     such a frame by construction.
  *   - Exchange SinglePartition: acceptable ONLY for a final single-row
  *     (or bounded-row) aggregate that partial aggregation has already
  *     collapsed map-side — whitelisted below. A data-sized single
  *     partition (global window, global sort-in-one-task) must never
  *     appear; the distributed forms live in operators.Ranks.
  */
class PlanGuardSpec extends SparkSpec {

  // crossJoin(broadcast(bounded)): snapshots (q07b), whole-table means
  // (q19, f01), pct-of-total denominators (q11/q15-q17), centroid tables
  // (a01/a04/a04b/a05 — k rows)
  private val bnljOk = Set(
    "a01_ann_brute_force", "a04_ann_ivf", "a04b_ann_ivf_kmeans",
    "a05_semantic_dedup", "a06_quantize_embeddings", // 1-row calibration
    "a07_ann_pq", // K-row sub-codebook broadcasts (assignL2, a01/a04's shape)
    "a08_ann_ivf_pq", // k-row coarse-centroid broadcasts (a04b's probe shape)
    "a10_ann_incremental", // k-row frozen-centroid broadcasts (assign + probe, a04b's shape)
    "a10b_ann_drift", // same k-row centroid broadcast into assignment + drift join
    "a10c_ann_compacted", // k-row FOLDED-centroid broadcasts (a10's serving shape on the retrained artifact)
    "a11_diversity_prune", // k-row frozen-centroid broadcast inside a10's assignment (rank itself is range-partitioned, no per-cluster window)
    "a12_mmr_rerank", // bounded-query-set non-equi candidate join (a01's shape); every later frame is |Q|·C
    "d28_token_rarity", // 1-row mean-token-frequency threshold
    "d28b_token_rarity_topk", // same 1-row threshold, over the K-row table
    "d31_lm_score", // 1-row vocabulary-size |V| broadcast into the model table
    "d31b_lm_score_pruned", // 1-row |V| + 1-row vocabulary-floor broadcasts
    "d32_source_divergence", // 1-row corpus token total broadcast into the term join
    "d36_tfidf_keywords", // 1-row corpus doc-count broadcast into the idf expression
    "f01_scalar_suite", "q07b_rfm_approx",
    "q11_returnflag_dist", "q15_status_dist", "q16_priority_dist",
    "q17_filtered_dist", "q19_product_imputation")

  // final single-row (q02/q02b/q22) or bounded-row (q22b: 8 tables,
  // f01/q07b/q19: 1-row means/cuts; q11/q15-q17: 1-row totals;
  // q46: 1-row funnel-count aggregate — partials collapse map-side,
  // the single partition receives per-partition counts only) aggregates
  private val singlePartOk = Set(
    "a06_quantize_embeddings", // 1-row min/max calibration aggregate
    "d28_token_rarity", // 1-row avg-token-frequency aggregate (vocab-sized input)
    "d28b_token_rarity_topk", // K-row global top-k limit + 1-row threshold, both over the aggregated vocab table
    "d31_lm_score", // 1-row |V| count-distinct aggregate (vocab-sized input, map-side partials)
    "d31b_lm_score_pruned", // same 1-row |V| aggregate feeding model, backoff, and floor
    "d32_source_divergence", // 1-row corpus-total aggregate over the (source, token) count table
    "d36_tfidf_keywords", // 1-row doc-count aggregate over the per-doc length table
    "f01_scalar_suite", "q02_kpi_totals", "q02b_kpi_approx",
    "q07b_rfm_approx", "q11_returnflag_dist", "q15_status_dist",
    "q16_priority_dist", "q17_filtered_dist", "q19_product_imputation",
    "q22_validation_report", "q22b_validation_all", "q46_funnel")

  /** A SinglePartition exchange is stray unless it is the final merge of
    * Spark's own injected runtime bloom filter (InjectRuntimeFilter): its
    * child is the partial bloom aggregate, so the exchange moves one
    * bounded bloom buffer per map partition — never data-sized, and it
    * can appear under ANY query whose join shape qualifies for a runtime
    * filter, so it is exempted structurally rather than per-query. */
  private def straySinglePartition(plan: String): Boolean = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.exists { case (l, i) =>
      l.contains("Exchange SinglePartition") &&
        !lines.lift(i + 1).exists(_.contains("partial_bloom_filter_agg"))
    }
  }

  test("no registered query plans a cartesian product, unbounded BNLJ, or stray single-partition exchange") {
    val dir = sfDir
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      Seq(
        Option.when(plan.contains("CartesianProduct"))(s"$name: CartesianProduct"),
        Option.when(plan.contains("BroadcastNestedLoopJoin")
          && !bnljOk(name))(s"$name: unexpected BroadcastNestedLoopJoin"),
        Option.when(straySinglePartition(plan)
          && !singlePartOk(name))(s"$name: unexpected Exchange SinglePartition"),
      ).flatten
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("d35: the corpus-sized candidate shuffle hashes the 8-byte fingerprint, not shingle text") {
    val plan = SparkEntry.queries("d35_span_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // phase-1 candidate aggregate partitions on fp (xxhash64 of the
    // shingle) with a map-side partial — the only corpus-sized groupBy
    // shuffle in the op moves 8-byte keys
    assert(plan.contains("hashpartitioning(fp"))
    val partialIdx = plan.linesIterator.indexWhere(l =>
      l.contains("HashAggregate") && l.contains("keys=[fp") &&
        l.contains("partial_count"))
    assert(partialIdx >= 0, "phase-1 fp aggregate lost its map-side partial")
  }
}
