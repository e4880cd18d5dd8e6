package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{EventQueries, Queries, StagingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator bundle from SURVEY.md §2 to a
  * DataFrame program over the driver test tables; `oracleSql` carries the
  * equivalent DuckDB SQL for the hash-compare gate. Column names and types
  * are aliased identically on both sides (the driver sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Doubles as the fixture-contract smoke (round-9 lesson): every
    * timestamp-bearing table must convert into [1990, 2100) END-TO-END, so
    * a regenerated fixture with a drifted unit/encoding fails the driver's
    * cheap smoke check — not 50 queries into the oracle board. sf0.001 is
    * ~6k rows, so the three min/max scans cost milliseconds. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{min, max}
    val lo = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
    Seq(
      "events"   -> Tables.events(spark, dir).select(min("ts"), max("ts")),
      "orders"   -> Tables.orders(spark, dir)
        .select(min("o_orderdate"), max("o_orderdate")),
      "lineitem" -> Tables.lineitem(spark, dir)
        .select(min("l_shipdate"), max("l_shipdate"))
    ).foreach { case (name, mm) =>
      val r = mm.collect()(0)
      val (tmin, tmax) = (r.getTimestamp(0), r.getTimestamp(1))
      require(tmin != null && !tmin.before(lo) && tmax.before(hi),
        s"[graft] fixture contract violated: $name timestamps [$tmin, $tmax] " +
          s"outside [1990, 2100) — the driver fixture's timestamp unit or " +
          "encoding drifted; see Tables.tsUnit")
    }
    Queries.q01SalesOverview(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sales_overview" -> (Queries.q01SalesOverview _),
    "q02_kpi_totals" -> (Queries.q02KpiTotals _),
    "q02b_kpi_approx" -> (Queries.q02bKpiApprox _), // rows-only: HLL has no cross-engine oracle
    "q03_daily_sales" -> (Queries.q03DailySales _),
    "q04_sales_by_nation" -> (Queries.q04SalesByNation _),
    "q05_sales_by_region" -> (Queries.q05SalesByRegion _),
    "q06_delivery_enrichment" -> (Queries.q06DeliveryEnrichment _),
    "q07_rfm" -> (Queries.q07Rfm _),
    "q07b_rfm_approx" -> (Queries.q07bRfmApprox _), // rows-only: sketch quantiles have no cross-engine oracle
    "q08_rfm_summary" -> (Queries.q08RfmSummary _),
    "q09_supplier_scorecard" -> (Queries.q09SupplierScorecard _),
    "q09b_scorecard_bucketed" -> (Queries.q09bScorecardBucketed _), // same result from the bucketed warehouse: exchange-free fact-fact join
    "q10_avg_by_delivery_status" -> (Queries.q10AvgByDeliveryStatus _),
    "q11_returnflag_dist" -> (Queries.q11ReturnFlagDist _),
    "q12_brand_discount_extremes" -> (Queries.q12BrandDiscountExtremes _),
    "q13_top_brands_by_revenue" -> (Queries.q13TopBrandsByRevenue _),
    "q14_top_supplier_nations" -> (Queries.q14TopSupplierNations _),
    "q15_status_dist" -> (Queries.q15StatusDist _),
    "q16_priority_dist" -> (Queries.q16PriorityDist _),
    "q17_filtered_dist" -> (Queries.q17FilteredDist _),
    "q18_dedup_map" -> (StagingQueries.q18DedupMap _),
    "q18b_dedup_map_salted" -> (StagingQueries.q18bDedupMapSalted _),
    "q19_product_imputation" -> (StagingQueries.q19ProductImputation _),
    "q20_customer_geo_enrich" -> (StagingQueries.q20CustomerGeoEnrich _),
    "q21_latest_event_per_user" -> (StagingQueries.q21LatestEventPerUser _),
    "q22_validation_report" -> (StagingQueries.q22ValidationReport _),
    "q22b_validation_all" -> (StagingQueries.q22bValidationAll _),
    "q23_minutely_counts" -> (EventQueries.q23MinutelyCounts _),
    "q24_minutely_revenue" -> (EventQueries.q24MinutelyRevenue _),
    "q25_running_totals" -> (EventQueries.q25RunningTotals _),
    "q26_top_users" -> (EventQueries.q26TopUsers _),
    "q27_recent_feed" -> (EventQueries.q27RecentFeed _),
    "q28_props_extract" -> (EventQueries.q28PropsExtract _),
    "q29_sessionize" -> (EventQueries.q29Sessionize _),
    "q30_asof_attribution" -> (graft.operators.AsOf.q30Attribution _),
    "q32_items_explode" -> (EventQueries.q32ItemsExplode _),
    "q31_range_join" -> (graft.operators.RangeJoin.q31RangeJoin _),
    "q33_rollup" -> (graft.analytics.OlapQueries.q33Rollup _),
    "q34_exact_median" -> (graft.analytics.OlapQueries.q34ExactMedian _),
    "q35_daily_windows" -> (graft.analytics.OlapQueries.q35DailyWindows _),
    "q36_inactive_customers" -> (graft.analytics.OlapQueries.q36InactiveCustomers _),
    "q37_pricing_summary" -> (graft.analytics.OlapQueries.q37PricingSummary _),
    "q38_shipping_priority" -> (graft.analytics.OlapQueries.q38ShippingPriority _),
    "q39_pivot_status_revenue" -> (graft.analytics.OlapQueries.q39PivotStatusRevenue _),
    "q40_unpivot_status_revenue" -> (graft.analytics.OlapQueries.q40UnpivotStatusRevenue _),
    "q41_cube" -> (graft.analytics.OlapQueries.q41Cube _),
    "q42_grouping_sets" -> (graft.analytics.OlapQueries.q42GroupingSets _),
    "q43_min_cost_supplier" -> (graft.analytics.OlapQueries.q43MinCostSupplier _),
    "q44_dimension_merge" -> (graft.analytics.StagingQueries.q44DimensionMerge _),
    "q45_priority_late_orders" -> (graft.analytics.OlapQueries.q45PriorityLateOrders _),
    "q46_funnel" -> (EventQueries.q46Funnel _),
    "q47_cohort_retention" -> (EventQueries.q47CohortRetention _),
    "q48_market_basket" -> (graft.analytics.OlapQueries.q48MarketBasket _),
    "q49_nation_share_of_region" -> (graft.analytics.OlapQueries.q49NationShareOfRegion _),
    "q50_retained_buyers" -> (graft.analytics.OlapQueries.q50RetainedBuyers _),
    "q51_copurchase_rank" -> (graft.analytics.OlapQueries.q51CopurchaseRank _), // fixed-point weighted PageRank; GraphRankSpec pins the arithmetic
    "q52_scd2_history" -> (graft.analytics.OlapQueries.q52ScdHistory _), // type-2 dimension history (q44's SCD-1 keeps latest; this keeps intervals)
    "q52b_scd2_merge" -> (graft.analytics.OlapQueries.q52bScdMerge _), // incremental SCD-2 merge folded over date-split batches; oracle = the from-scratch SQL, so the gate itself proves fold parity
    "q52c_scd2_lake" -> (graft.analytics.OlapQueries.q52cScdLake _), // the persisted twin: same fold through DimSync.mergeScd2's bucketed lake, gated on what a consumer reads back
    "q53_small_qty_revenue" -> (graft.analytics.OlapQueries.q53SmallQtyRevenue _), // correlated scalar subquery, decorrelated (TPC-H Q17 shape)
    "q54_asof_dimension" -> (graft.analytics.OlapQueries.q54AsOfDimension _), // point-in-time lookup against q52's SCD-2 intervals
    "d01_dedup_exact" -> (graft.llm.TextOps.d01DedupExact _),
    "d02_token_stats" -> (graft.llm.TextOps.d02TokenStats _),
    "d03_lang_id" -> (graft.llm.TextOps.d03LangId _),
    "d04_quality_score" -> (graft.llm.TextOps.d04QualityScore _),
    "d05_fingerprint" -> (graft.llm.TextOps.d05Fingerprint _),
    "d06_ngram_jaccard" -> (graft.llm.TextOps.d06NgramJaccard _),
    "d07_minhash_lsh" -> (graft.llm.SketchOps.d07MinhashLsh _),
    "d08_simhash" -> (graft.llm.SketchOps.d08Simhash _),
    "d08b_simhash_banded" -> (graft.llm.SketchOps.d08bSimhashBanded _),
    "d09_kmv_distinct" -> (graft.llm.SketchOps.d09KmvDistinct _),
    "d10_deterministic_sample" -> (graft.llm.TextOps.d10DeterministicSample _),
    "d11_lsh_neardup" -> (graft.llm.SketchOps.d11LshNearDup _),
    "d12_dedup_apply" -> (graft.llm.SketchOps.d12DedupApply _),
    "d23_dedup_clusters" -> (graft.llm.SketchOps.d23DedupClusters _),
    "d13_corpus_prep" -> (graft.llm.CorpusPrep.d13CorpusPrep _),
    "d14_redact_pii" -> (graft.llm.TextOps.d14RedactPii _),
    "d15_decontaminate" -> (graft.llm.QualityOps.d15Decontaminate _),
    "d15b_decontaminate_bloom" -> (graft.llm.QualityOps.d15bDecontaminateBloom _),
    "d16_repetition_quality" -> (graft.llm.QualityOps.d16RepetitionQuality _),
    "d17_ngram_vocab" -> (graft.llm.QualityOps.d17NgramVocab _),
    "d18_corpus_prep_full" -> (graft.llm.CorpusPrep.d18CorpusPrepFull _),
    "d19_corpus_stats" -> (graft.llm.QualityOps.d19CorpusStats _),
    "d20_chunk" -> (graft.llm.QualityOps.d20Chunk _),
    "d21_heavy_hitters" -> (graft.llm.QualityOps.d21HeavyHitters _),
    "d22_boilerplate" -> (graft.llm.QualityOps.d22Boilerplate _),
    "d24_mixture_replicate" -> (graft.llm.TextOps.d24MixtureReplicate _),
    "d25_sequence_pack" -> (graft.llm.QualityOps.d25SequencePack _),
    "d26_incremental_dedup" -> (graft.llm.TextOps.d26IncrementalDedup _),
    "d27_epoch_shuffle" -> (graft.llm.TextOps.d27EpochShuffle _),
    "d28_token_rarity" -> (graft.llm.QualityOps.d28TokenRarity _),
    "d28b_token_rarity_topk" -> ((s: org.apache.spark.sql.SparkSession, d: String) => graft.llm.QualityOps.d28bTokenRarityTopK(s, d)),
    "d29_source_overlap" -> ((s: org.apache.spark.sql.SparkSession, d: String) => graft.llm.QualityOps.d29SourceOverlap(s, d)),
    "d29b_source_overlap_bounded" -> (graft.llm.QualityOps.d29bSourceOverlapBounded _),
    "d30_incremental_neardup" -> (graft.llm.SketchOps.d30IncrementalNearDup _),
    "d31_lm_score" -> (graft.llm.LmOps.d31LmScore _),
    "d31b_lm_score_pruned" -> (graft.llm.LmOps.d31bLmScorePruned _), // broadcast pruned-LM tier: corpus stream never shuffles

    "d32_source_divergence" -> (graft.llm.LmOps.d32SourceDivergence _),
    "d33_bpe_train" -> (graft.llm.LmOps.d33BpeTrain _), // rows-only: K data-dependent merge rounds are not one SQL query
    "d33b_bpe_encode" -> (graft.llm.LmOps.d33bBpeEncode _), // encode oracled against the frozen merge-table artifact (Models)
    "d34_stratified_sample" -> (graft.llm.LmOps.d34StratifiedSample _),
    "d34b_stratified_salted" -> (graft.llm.LmOps.d34bStratifiedSampleSalted _), // identical contract, salted skew path (q18b's move)
    "d35_span_dedup" -> (graft.llm.TextOps.d35SpanDedup _),
    "d35b_span_dedup_incr" -> (graft.llm.TextOps.d35bSpanDedupIncremental _), // index-probe form; oracle is the global rule on batch docs (losslessness proof)
    "d38_span_decontaminate" -> (graft.llm.TextOps.d38SpanDecontaminate _),
    "d39_domain_stats" -> (graft.llm.TextOps.d39DomainStats _),
    "d40_shingle_containment" -> (graft.llm.TextOps.d40ShingleContainment _),
    "d40b_containment_kmv" -> (graft.llm.SketchOps.d40bContainmentKmv _),
    "d41_containment_apply" -> (graft.llm.TextOps.d41ContainmentApply _),
    "d42_incremental_containment" -> (graft.llm.SketchOps.d42IncrementalContainment _),
    "d43_source_containment" -> (graft.llm.QualityOps.d43SourceContainment _),
    "d44_cross_source_containment" -> (graft.llm.SketchOps.d44CrossSourceContainment _),
    "d45_syndication_ingest" -> (graft.streaming.CorpusStream.d45SyndicationIngest _),
    "d36_tfidf_keywords" -> (graft.llm.QualityOps.d36TfidfKeywords _),
    "d37_quality_classifier" -> (graft.llm.LmOps.d37QualityClassifier _),
    "a05_semantic_dedup" -> (graft.llm.VectorOps.a05SemanticDedup _),
    "a06_quantize_embeddings" -> (graft.llm.VectorOps.a06QuantizeEmbeddings _),
    "a01_ann_brute_force" -> (graft.llm.VectorOps.a01AnnBruteForce _),
    "a08_ann_ivf_pq" -> (graft.llm.VectorOps.a08AnnIvfPq _), // inference oracled against the frozen coarse+codebook artifacts; PqSpec recall contract for training
    "a02_ann_lsh_bucketed" -> (graft.llm.VectorOps.a02AnnLshBucketed _),
    "a03_embedding_neardup" -> (graft.llm.VectorOps.a03EmbeddingNearDup _),
    "a04_ann_ivf" -> (graft.llm.VectorOps.a04AnnIvf _),
    "a04b_ann_ivf_kmeans" -> (graft.llm.VectorOps.a04bAnnIvfKmeans _), // inference oracled against the frozen centroid artifact; IvfSpec recall contract for training
    "a07_ann_pq" -> (graft.llm.VectorOps.a07AnnPq _), // inference oracled against the frozen codebook artifact; PqSpec recall contract for training
    "a09_knn_join" -> (graft.llm.VectorOps.a09KnnJoin _),
    "a09b_knn_join_banded" -> (graft.llm.VectorOps.a09bKnnJoinBanded _),
    "a09c_knn_join_salted" -> (graft.llm.VectorOps.a09cKnnJoinSalted _), // output ≡ a09; oracle reuses a09Sql
    "a10_ann_incremental" -> (graft.llm.VectorOps.a10AnnIncremental _), // serving oracled against the frozen index-stratum centroids; IncAnnSpec fold parity
    "a10b_ann_drift" -> (graft.llm.VectorOps.a10bAnnDrift _),
    "a10c_ann_compacted" -> (graft.llm.VectorOps.a10cAnnCompacted _), // retrain-and-fold; oracle serves from the folded artifact
    "a11_diversity_prune" -> (graft.llm.VectorOps.a11DiversityPrune _), // D4 prototypicality pruning over the frozen a10 lists
    "a12_mmr_rerank" -> (graft.llm.VectorOps.a12MmrRerank _), // MMR diversity re-ranking; K greedy steps unrolled in the oracle

    "d46_inverted_index" -> (graft.llm.QualityOps.d46InvertedIndex _),
    "d47_layout_cluster" -> (graft.sources.Layout.d47LayoutCluster _),
    "d47b_layout_zorder" -> (graft.sources.Layout.d47bLayoutZorder _), // 2-D Morton clustering; either predicate row-group-skips
    "d49_purge_lake" -> (graft.sources.Layout.d49PurgeLake _), // copy-on-write takedown; only the hit partition is rewritten
    "d48_token_efficiency" -> (graft.llm.LmOps.d48TokenEfficiency _), // tokenizer-fit census from the frozen d33b merges
    "m01_decode_features" -> (graft.llm.Multimodal.m01DecodeFeatures _),
    "m02_frame_sample" -> (graft.llm.Multimodal.m02FrameSample _),
    "m03_image_decode" -> (graft.llm.Multimodal.m03ImageDecode _),
    "m04_audio_features" -> (graft.llm.Multimodal.m04AudioFeatures _),
    "m05_video_frames" -> (graft.llm.Multimodal.m05VideoFrames _),
    "m06_image_resize" -> (graft.llm.Multimodal.m06ImageResize _),
    "f01_scalar_suite" -> (graft.functions.ScalarQueries.f01ScalarSuite _),
    "f02_multiformat_parse" -> (graft.functions.ScalarQueries.f02MultiFormatParse _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_sales_overview" -> Queries.q01Sql,
    "q02_kpi_totals" -> Queries.q02Sql,
    "q03_daily_sales" -> Queries.q03Sql,
    "q04_sales_by_nation" -> Queries.q04Sql,
    "q05_sales_by_region" -> Queries.q05Sql,
    "q06_delivery_enrichment" -> Queries.q06Sql,
    "q07_rfm" -> Queries.q07Sql,
    "q08_rfm_summary" -> Queries.q08Sql,
    "q09_supplier_scorecard" -> Queries.q09Sql,
    "q09b_scorecard_bucketed" -> Queries.q09Sql, // bucketing changes the plan, not the result
    "q10_avg_by_delivery_status" -> Queries.q10Sql,
    "q11_returnflag_dist" -> Queries.q11Sql,
    "q12_brand_discount_extremes" -> Queries.q12Sql,
    "q13_top_brands_by_revenue" -> Queries.q13Sql,
    "q14_top_supplier_nations" -> Queries.q14Sql,
    "q15_status_dist" -> Queries.q15Sql,
    "q16_priority_dist" -> Queries.q16Sql,
    "q17_filtered_dist" -> Queries.q17Sql,
    "q18_dedup_map" -> StagingQueries.q18Sql,
    "q18b_dedup_map_salted" -> StagingQueries.q18Sql, // identical contract, salted execution
    "q19_product_imputation" -> StagingQueries.q19Sql,
    "q20_customer_geo_enrich" -> StagingQueries.q20Sql,
    "q21_latest_event_per_user" -> StagingQueries.q21Sql,
    "q22_validation_report" -> StagingQueries.q22Sql,
    "q22b_validation_all" -> StagingQueries.q22bSql,
    "q23_minutely_counts" -> EventQueries.q23Sql,
    "q24_minutely_revenue" -> EventQueries.q24Sql,
    "q25_running_totals" -> EventQueries.q25Sql,
    "q26_top_users" -> EventQueries.q26Sql,
    "q27_recent_feed" -> EventQueries.q27Sql,
    "q28_props_extract" -> EventQueries.q28Sql,
    "q29_sessionize" -> EventQueries.q29Sql,
    "q30_asof_attribution" -> graft.operators.AsOf.q30Sql,
    "q32_items_explode" -> EventQueries.q32Sql,
    "q31_range_join" -> graft.operators.RangeJoin.q31Sql,
    "q33_rollup" -> graft.analytics.OlapQueries.q33Sql,
    "q34_exact_median" -> graft.analytics.OlapQueries.q34Sql,
    "q35_daily_windows" -> graft.analytics.OlapQueries.q35Sql,
    "q36_inactive_customers" -> graft.analytics.OlapQueries.q36Sql,
    "q37_pricing_summary" -> graft.analytics.OlapQueries.q37Sql,
    "q38_shipping_priority" -> graft.analytics.OlapQueries.q38Sql,
    "q39_pivot_status_revenue" -> graft.analytics.OlapQueries.q39Sql,
    "q40_unpivot_status_revenue" -> graft.analytics.OlapQueries.q40Sql,
    "q41_cube" -> graft.analytics.OlapQueries.q41Sql,
    "q42_grouping_sets" -> graft.analytics.OlapQueries.q42Sql,
    "q43_min_cost_supplier" -> graft.analytics.OlapQueries.q43Sql,
    "q44_dimension_merge" -> graft.analytics.StagingQueries.q44Sql,
    "q45_priority_late_orders" -> graft.analytics.OlapQueries.q45Sql,
    "q46_funnel" -> EventQueries.q46Sql,
    "q47_cohort_retention" -> EventQueries.q47Sql,
    "q48_market_basket" -> graft.analytics.OlapQueries.q48Sql,
    "q49_nation_share_of_region" -> graft.analytics.OlapQueries.q49Sql,
    "q50_retained_buyers" -> graft.analytics.OlapQueries.q50Sql,
    "q51_copurchase_rank" -> graft.analytics.OlapQueries.q51Sql,
    "q52_scd2_history" -> graft.analytics.OlapQueries.q52Sql,
    "q52b_scd2_merge" -> graft.analytics.OlapQueries.q52Sql,
    "q52c_scd2_lake" -> graft.analytics.OlapQueries.q52Sql,
    "q53_small_qty_revenue" -> graft.analytics.OlapQueries.q53Sql,
    "q54_asof_dimension" -> graft.analytics.OlapQueries.q54Sql,
    "d01_dedup_exact" -> graft.llm.TextOps.d01Sql,
    "d02_token_stats" -> graft.llm.TextOps.d02Sql,
    "d03_lang_id" -> graft.llm.TextOps.d03Sql,
    "d04_quality_score" -> graft.llm.TextOps.d04Sql,
    "d05_fingerprint" -> graft.llm.TextOps.d05Sql,
    "d06_ngram_jaccard" -> graft.llm.TextOps.d06Sql,
    "d07_minhash_lsh" -> graft.llm.SketchOps.d07Sql,
    "d08_simhash" -> graft.llm.SketchOps.d08Sql,
    "d08b_simhash_banded" -> graft.llm.SketchOps.d08bSql,
    "d09_kmv_distinct" -> graft.llm.SketchOps.d09Sql,
    "d10_deterministic_sample" -> graft.llm.TextOps.d10Sql,
    "d11_lsh_neardup" -> graft.llm.SketchOps.d11Sql,
    "d12_dedup_apply" -> graft.llm.SketchOps.d12Sql,
    "d23_dedup_clusters" -> graft.llm.SketchOps.d23Sql,
    "d13_corpus_prep" -> graft.llm.CorpusPrep.d13Sql,
    "d14_redact_pii" -> graft.llm.TextOps.d14Sql,
    "d15_decontaminate" -> graft.llm.QualityOps.d15Sql,
    "d15b_decontaminate_bloom" -> graft.llm.QualityOps.d15Sql, // exact result: bloom is a prefilter only
    "d16_repetition_quality" -> graft.llm.QualityOps.d16Sql,
    "d17_ngram_vocab" -> graft.llm.QualityOps.d17Sql,
    "d18_corpus_prep_full" -> graft.llm.CorpusPrep.d18Sql,
    "d19_corpus_stats" -> graft.llm.QualityOps.d19Sql,
    "d20_chunk" -> graft.llm.QualityOps.d20Sql,
    "d21_heavy_hitters" -> graft.llm.QualityOps.d21Sql,
    "d22_boilerplate" -> graft.llm.QualityOps.d22Sql,
    "d24_mixture_replicate" -> graft.llm.TextOps.d24Sql,
    "d25_sequence_pack" -> graft.llm.QualityOps.d25Sql,
    "d26_incremental_dedup" -> graft.llm.TextOps.d26Sql,
    "d27_epoch_shuffle" -> graft.llm.TextOps.d27Sql,
    "d28_token_rarity" -> graft.llm.QualityOps.d28Sql,
    "d28b_token_rarity_topk" -> graft.llm.QualityOps.d28bSql,
    "d29_source_overlap" -> graft.llm.QualityOps.d29Sql,
    "d29b_source_overlap_bounded" -> graft.llm.QualityOps.d29bSql,
    "d30_incremental_neardup" -> graft.llm.SketchOps.d30Sql,
    "d31_lm_score" -> graft.llm.LmOps.d31Sql,
    "d31b_lm_score_pruned" -> graft.llm.LmOps.d31bSql,
    "d32_source_divergence" -> graft.llm.LmOps.d32Sql,
    "d34_stratified_sample" -> graft.llm.LmOps.d34Sql,
    "d34b_stratified_salted" -> graft.llm.LmOps.d34Sql, // salting changes the plan, not the result
    "d35_span_dedup" -> graft.llm.TextOps.d35Sql,
    "d35b_span_dedup_incr" -> graft.llm.TextOps.d35bSql,
    "d38_span_decontaminate" -> graft.llm.TextOps.d38Sql,
    "d39_domain_stats" -> graft.llm.TextOps.d39Sql,
    "d40_shingle_containment" -> graft.llm.TextOps.d40Sql,
    "d40b_containment_kmv" -> graft.llm.SketchOps.d40bSql,
    "d41_containment_apply" -> graft.llm.TextOps.d41Sql,
    "d42_incremental_containment" -> graft.llm.SketchOps.d42Sql,
    "d43_source_containment" -> graft.llm.QualityOps.d43Sql,
    "d44_cross_source_containment" -> graft.llm.SketchOps.d44Sql,
    "d45_syndication_ingest" -> graft.streaming.CorpusStream.d45Sql,
    "d36_tfidf_keywords" -> graft.llm.QualityOps.d36Sql,
    "d37_quality_classifier" -> graft.llm.LmOps.d37Sql,
    "a05_semantic_dedup" -> graft.llm.VectorOps.a05Sql,
    "a06_quantize_embeddings" -> graft.llm.VectorOps.a06Sql,
    "a01_ann_brute_force" -> graft.llm.VectorOps.a01Sql,
    "a02_ann_lsh_bucketed" -> graft.llm.VectorOps.a02Sql,
    "a03_embedding_neardup" -> graft.llm.VectorOps.a03Sql,
    "a04_ann_ivf" -> graft.llm.VectorOps.a04Sql,
    "a09_knn_join" -> graft.llm.VectorOps.a09Sql,
    "a09b_knn_join_banded" -> graft.llm.VectorOps.a09bSql,
    "a09c_knn_join_salted" -> graft.llm.VectorOps.a09Sql, // salted twin: same rows as a09 by construction
    "d46_inverted_index" -> graft.llm.QualityOps.d46Sql,
    "d47_layout_cluster" -> graft.sources.Layout.d47Sql,
    "d47b_layout_zorder" -> graft.sources.Layout.d47bSql,
    "d49_purge_lake" -> graft.sources.Layout.d49Sql,
    "d48_token_efficiency" -> graft.llm.LmOps.d48Sql,
    // frozen-model inference oracles (defs — the SQL bakes in the
    // artifact path the query persisted for THIS run's data dir; Verify
    // runs queries first, dumps oracle SQL after)
    "a04b_ann_ivf_kmeans" -> graft.llm.VectorOps.a04bSql,
    "a10_ann_incremental" -> graft.llm.VectorOps.a10Sql,
    "a10b_ann_drift" -> graft.llm.VectorOps.a10bSql,
    "a10c_ann_compacted" -> graft.llm.VectorOps.a10cSql,
    "a11_diversity_prune" -> graft.llm.VectorOps.a11Sql,
    "a12_mmr_rerank" -> graft.llm.VectorOps.a12Sql,
    "a07_ann_pq" -> graft.llm.VectorOps.a07Sql,
    "a08_ann_ivf_pq" -> graft.llm.VectorOps.a08Sql,
    "d33b_bpe_encode" -> graft.llm.LmOps.d33bSql,
    "m01_decode_features" -> graft.llm.Multimodal.m01Sql,
    "m02_frame_sample" -> graft.llm.Multimodal.m02Sql,
    "m03_image_decode" -> graft.llm.Multimodal.m03Sql,
    "m04_audio_features" -> graft.llm.Multimodal.m04Sql,
    "m05_video_frames" -> graft.llm.Multimodal.m05Sql,
    "m06_image_resize" -> graft.llm.Multimodal.m06Sql,
    "f01_scalar_suite" -> graft.functions.ScalarQueries.f01Sql,
    "f02_multiformat_parse" -> graft.functions.ScalarQueries.f02Sql,
  )
}
