package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query over the
  * driver testdata plus (where SQL-expressible) a DuckDB oracle. Column
  * names are aliased identically on both sides; every query orders by
  * its own (rounded) output columns with a unique tiebreaker so the
  * hash compare is engine-order-independent.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // projection / filter / agg / sort (SURVEY §2.2)
    "q_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q_revenue_filter" -> ((s, d) => Relational.revenueFilter(s, d)),
    "q_top_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "q_join_agg_topk" -> ((s, d) => Relational.joinAggTopK(s, d)),
    // joins
    "q_join_brand_revenue" -> ((s, d) => Joins.brandRevenue(s, d)),
    "q_join_priority_stats" -> ((s, d) => Joins.priorityStats(s, d)),
    "q_semi_join_big_lines" -> ((s, d) => Joins.ordersWithBigLines(s, d)),
    "q_anti_join_no_orders" -> ((s, d) => Joins.customersWithoutOrders(s, d)),
    "q_join_region_balance" -> ((s, d) => Joins.regionBalance(s, d)),
    // aggregations
    "q_agg_distinct" -> ((s, d) => Aggregates.distinctStats(s, d)),
    "q_agg_approx_distinct" -> ((s, d) => Aggregates.approxDistinct(s, d)),
    "q_agg_rollup" -> ((s, d) => Aggregates.rollupSummary(s, d)),
    "q_agg_cube" -> ((s, d) => Aggregates.cubeSummary(s, d)),
    "q_agg_monthly" -> ((s, d) => Aggregates.monthlyOrderStats(s, d)),
    "q_agg_quantiles" -> ((s, d) => Aggregates.priceQuantiles(s, d)),
    "q_corr_stats" -> ((s, d) => Aggregates.corrStats(s, d)),
    // windows
    "q_window_running" -> ((s, d) => Windows.runningCustomerRevenue(s, d)),
    "q_window_topk" -> ((s, d) => Windows.topOrdersPerCustomer(s, d)),
    "q_window_gaps" -> ((s, d) => Windows.eventGaps(s, d)),
    "q_sessionize" -> ((s, d) => Windows.sessionize(s, d)),
    "q_window_rank_stats" -> ((s, d) => Windows.rankStats(s, d)),
    // events: range scan (O11), json, as-of, range join
    "q_event_time_range" -> ((s, d) => EventOps.eventTimeRange(s, d)),
    "q_rate_limit" -> ((s, d) => EventOps.rateLimit(s, d)),
    "q_json_props" -> ((s, d) => EventOps.jsonProps(s, d)),
    "q_asof_last_order" -> ((s, d) => EventOps.asofLastOrder(s, d)),
    "q_event_pairs_60s" -> ((s, d) => EventOps.eventPairs60s(s, d)),
    // set ops + scalar functions
    "q_union_customers" -> ((s, d) => SetAndScalar.unionCustomers(s, d)),
    "q_intersect_customers" -> ((s, d) => SetAndScalar.intersectCustomers(s, d)),
    "q_except_parts" -> ((s, d) => SetAndScalar.exceptParts(s, d)),
    "q_scalar_funcs" -> ((s, d) => SetAndScalar.scalarFuncs(s, d)),
    "q_ship_delays" -> ((s, d) => SetAndScalar.shipDelays(s, d)),
    "q_edit_distances" -> ((s, d) => SetAndScalar.editDistances(s, d)),
    "q_array_funcs" -> ((s, d) => SetAndScalar.arrayFuncs(s, d)),
    // text analysis (documents)
    "q_text_stats" -> ((s, d) => Text.textStats(s, d)),
    "q_term_freq" -> ((s, d) => Text.termFreq(s, d)),
    "q_token_counts" -> ((s, d) => Text.tokenCounts(s, d)),
    "q_bpe_tokens" -> ((s, d) => Bpe.bpeTokens(s, d)),
    "q_quality_score" -> ((s, d) => Text.qualityScore(s, d)),
    "q_lang_id" -> ((s, d) => Text.langId(s, d)),
    "q_lang_id_ngram" -> ((s, d) => Text.langIdNgram(s, d)),
    "q_fingerprints" -> ((s, d) => Text.fingerprints(s, d)),
    // dedup (documents)
    "q_dedup_exact_summary" -> ((s, d) => Dedup.exactSummary(s, d)),
    "q_dedup_exact_groups" -> ((s, d) => Dedup.exactGroups(s, d)),
    "q_minhash_signatures" -> ((s, d) => Dedup.minhashSignatures(s, d)),
    "q_lsh_near_dup_pairs" -> ((s, d) => Dedup.lshNearDupPairs(s, d)),
    "q_ngram_jaccard_pairs" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "q_simhash_buckets" -> ((s, d) => Dedup.simhashBuckets(s, d)),
    "q_simhash_near_dup" -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "q_incremental_near_dup" -> ((s, d) => Dedup.incrementalNearDupQuery(s, d)),
    // similarity search (embeddings)
    "q_knn_brute_force" -> ((s, d) => Similarity.knnBruteForce(s, d)),
    "q_grid_near_dup" -> ((s, d) => Similarity.gridNearDupPairs(s, d)),
    "q_hyperplane_lsh" -> ((s, d) => Similarity.hyperplaneLshPairs(s, d)),
    "q_vector_stats" -> ((s, d) => Similarity.vectorStats(s, d)),
    // multimodal: binary column round trip
    "q_binary_meta" -> ((s, d) => Multimodal.binaryMeta(s, d)),
    // classic analytics shapes + SQL surface
    "q_local_supplier_volume" -> ((s, d) => Analytics.localSupplierVolume(s, d)),
    "q_returned_item_ranking" -> ((s, d) => Analytics.returnedItemRanking(s, d)),
    "q_promo_revenue" -> ((s, d) => Analytics.promoRevenueShare(s, d)),
    "q_grouping_sets" -> ((s, d) => Analytics.groupingSets(s, d)),
    // IVF ANN index build + probe
    "q_ivf_assign" -> ((s, d) => Similarity.ivfAssign(s, d)),
    "q_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q_ivf_trained_topk" -> ((s, d) => Similarity.ivfTrainedTopK(s, d)),
    "q_pq_topk" -> ((s, d) => Pq.pqTopK(s, d)),
    "q_ivfpq_topk" -> ((s, d) => Pq.ivfPqTopK(s, d)),
    "q_sq_topk" -> ((s, d) => Pq.sqTopK(s, d)),
    // rolling-hash fingerprint + near-dedup keep list
    "q_rolling_fingerprint" -> ((s, d) => Text.rollingFingerprints(s, d)),
    "q_near_dedup_summary" -> ((s, d) => Dedup.nearDedupSummary(s, d)),
    "q_near_dup_clusters" -> ((s, d) => Dedup.nearDupClusters(s, d)),
    "q_dup_cluster_hist" -> ((s, d) => Dedup.dupClusterHist(s, d)),
    // behavioral analytics
    "q_funnel" -> ((s, d) => Behavior.funnel(s, d)),
    "q_weekly_retention" -> ((s, d) => Behavior.weeklyRetention(s, d)),
    "q_value_histogram" -> ((s, d) => Behavior.valueHistogram(s, d)),
    // pivot + SQL-surface subqueries
    "q_event_pivot" -> ((s, d) => EventOps.eventTypePivot(s, d)),
    "q_sql_subqueries" -> ((s, d) => EventOps.sqlSubqueries(s, d)),
    "q_lateral_topk" -> ((s, d) => EventOps.lateralTopOrders(s, d)),
    // tf-idf, label centroids, column profiling
    "q_tfidf" -> ((s, d) => Text.tfidf(s, d)),
    "q_lm_score" -> ((s, d) => Text.lmScore(s, d)),
    "q_stratified_sample" -> ((s, d) => Text.stratifiedSample(s, d)),
    "q_label_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "q_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d)),
    "q_profile_orders" -> ((s, d) => SetAndScalar.profileOrders(s, d)),
    // round-4 pipeline additions: decontamination, repetition filters,
    // weighted sampling, interval-overlap join
    "q_decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    "q_substring_overlap" -> ((s, d) => Dedup.substringOverlap(s, d)),
    "q_neardup_pagerank" -> ((s, d) => Graph.nearDupPagerank(s, d)),
    "q_doc_repetition" -> ((s, d) => Text.docRepetition(s, d)),
    "q_weighted_sample" -> ((s, d) => Text.weightedSample(s, d)),
    "q_session_overlap" -> ((s, d) => Behavior.sessionOverlap(s, d)),
    // pipeline assembly: packing, domain mixing, PII scrub, chunking
    "q_seq_pack" -> ((s, d) => Pipeline.seqPack(s, d)),
    "q_source_mix" -> ((s, d) => Pipeline.sourceMix(s, d)),
    "q_pii_redact" -> ((s, d) => Pipeline.piiRedact(s, d)),
    "q_chunk_windows" -> ((s, d) => Pipeline.chunkWindows(s, d)),
    "q_curation_funnel" -> ((s, d) => Pipeline.curationFunnel(s, d)),
    // time-series resample + skew-safe aggregation
    "q_gap_fill" -> ((s, d) => EventOps.gapFill(s, d)),
    "q_skew_agg" -> ((s, d) => Skew.saltedEventStats(s, d)),
    // RANGE window frame, unpivot, frequency sketch
    "q_range_frame" -> ((s, d) => Windows.rollingRangeRevenue(s, d)),
    "q_unpivot" -> ((s, d) => EventOps.eventTypeUnpivot(s, d)),
    "q_cms_heavy_hitters" -> ((s, d) => Sketch.cmsHeavyHitters(s, d)),
    // graph BFS, batching analysis, outlier gate
    "q_graph_bfs" -> ((s, d) => Graph.nearDupBfs(s, d)),
    "q_pack_efficiency" -> ((s, d) => Pipeline.packEfficiency(s, d)),
    "q_anomaly_zscore" -> ((s, d) => Aggregates.anomalyZscore(s, d)),
    // CDC upsert (MERGE / full outer), SCD2 history, sparse cosine
    "q_merge_upsert" -> ((s, d) => Joins.mergeUpsert(s, d)),
    "q_scd2_intervals" -> ((s, d) => EventOps.scd2Intervals(s, d)),
    "q_sparse_cosine" -> ((s, d) => Dedup.sparseCosinePairs(s, d)),
    // Markov transitions + sliding distinct window
    "q_markov_transitions" -> ((s, d) => Behavior.markovTransitions(s, d)),
    "q_sliding_dau" -> ((s, d) => Behavior.slidingDau(s, d)),
    "q_time_to_convert" -> ((s, d) => Behavior.timeToConvert(s, d)),
    "q_oov_rate" -> ((s, d) => Text.oovRate(s, d)),
    // bloom-filtered semi-join + fuzzy dictionary join
    "q_bloom_semi_join" -> ((s, d) => Sketch.bloomSemiJoin(s, d)),
    "q_fuzzy_name_pairs" -> ((s, d) => SetAndScalar.fuzzyNamePairs(s, d)),
    // agg-based argmax (top-1 per group without a window)
    "q_argmax_order" -> ((s, d) => Relational.argmaxOrder(s, d)),
    // time-weighted average + chi-square contingency audit
    "q_time_weighted_avg" -> ((s, d) => EventOps.timeWeightedAvg(s, d)),
    "q_chi_square" -> ((s, d) => Behavior.chiSquare(s, d)),
    // cohort retention matrix + positional phrase search
    "q_cohort_matrix" -> ((s, d) => Behavior.cohortMatrix(s, d)),
    "q_phrase_search" -> ((s, d) => Text.phraseSearch(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Engine-specific estimates (HLL sketches,
    * trained k-means probes) are checked through DERIVED columns: the
    * deterministic part is hash-compared exactly and the estimate is
    * asserted inside a bound the oracle states as a literal. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" -> Relational.pricingSummarySql,
    "q_revenue_filter" -> Relational.revenueFilterSql,
    "q_top_orders" -> Relational.topOrdersSql,
    "q_join_agg_topk" -> Relational.joinAggTopKSql,
    "q_join_brand_revenue" -> Joins.brandRevenueSql,
    "q_join_priority_stats" -> Joins.priorityStatsSql,
    "q_semi_join_big_lines" -> Joins.ordersWithBigLinesSql,
    "q_anti_join_no_orders" -> Joins.customersWithoutOrdersSql,
    "q_join_region_balance" -> Joins.regionBalanceSql,
    "q_agg_distinct" -> Aggregates.distinctStatsSql,
    "q_agg_approx_distinct" -> Aggregates.approxDistinctSql,
    "q_agg_rollup" -> Aggregates.rollupSummarySql,
    "q_agg_cube" -> Aggregates.cubeSummarySql,
    "q_agg_monthly" -> Aggregates.monthlyOrderStatsSql,
    "q_agg_quantiles" -> Aggregates.priceQuantilesSql,
    "q_corr_stats" -> Aggregates.corrStatsSql,
    "q_window_running" -> Windows.runningCustomerRevenueSql,
    "q_window_topk" -> Windows.topOrdersPerCustomerSql,
    "q_window_gaps" -> Windows.eventGapsSql,
    "q_sessionize" -> Windows.sessionizeSql,
    "q_window_rank_stats" -> Windows.rankStatsSql,
    "q_event_time_range" -> EventOps.eventTimeRangeSql,
    "q_rate_limit" -> EventOps.rateLimitSql(),
    "q_json_props" -> EventOps.jsonPropsSql,
    "q_asof_last_order" -> EventOps.asofLastOrderSql,
    "q_event_pairs_60s" -> EventOps.eventPairs60sSql,
    "q_union_customers" -> SetAndScalar.unionCustomersSql,
    "q_intersect_customers" -> SetAndScalar.intersectCustomersSql,
    "q_except_parts" -> SetAndScalar.exceptPartsSql,
    "q_scalar_funcs" -> SetAndScalar.scalarFuncsSql,
    "q_ship_delays" -> SetAndScalar.shipDelaysSql,
    "q_edit_distances" -> SetAndScalar.editDistancesSql,
    "q_array_funcs" -> SetAndScalar.arrayFuncsSql,
    "q_text_stats" -> Text.textStatsSql,
    "q_term_freq" -> Text.termFreqSql,
    "q_token_counts" -> Text.tokenCountsSql,
    "q_bpe_tokens" -> Bpe.bpeTokensSql,
    "q_quality_score" -> Text.qualityScoreSql,
    "q_lang_id" -> Text.langIdSql,
    "q_lang_id_ngram" -> Text.langIdNgramSql,
    "q_fingerprints" -> Text.fingerprintsSql,
    "q_dedup_exact_summary" -> Dedup.exactSummarySql,
    "q_dedup_exact_groups" -> Dedup.exactGroupsSql,
    "q_minhash_signatures" -> Dedup.minhashSignaturesSql,
    "q_lsh_near_dup_pairs" -> Dedup.lshNearDupPairsSql,
    "q_ngram_jaccard_pairs" -> Dedup.ngramJaccardPairsSql,
    "q_simhash_buckets" -> Dedup.simhashBucketsSql,
    "q_simhash_near_dup" -> Dedup.simhashNearDupSql(),
    "q_incremental_near_dup" -> Dedup.incrementalNearDupQuerySql,
    "q_knn_brute_force" -> Similarity.knnBruteForceSql,
    "q_grid_near_dup" -> Similarity.gridNearDupPairsSql,
    "q_hyperplane_lsh" -> Similarity.hyperplaneLshPairsSql,
    "q_vector_stats" -> Similarity.vectorStatsSql,
    "q_binary_meta" -> Multimodal.binaryMetaSql,
    "q_local_supplier_volume" -> Analytics.localSupplierVolumeSql,
    "q_returned_item_ranking" -> Analytics.returnedItemRankingSql,
    "q_promo_revenue" -> Analytics.promoRevenueShareSql,
    "q_grouping_sets" -> Analytics.groupingSetsSql,
    "q_ivf_assign" -> Similarity.ivfAssignSql,
    "q_ivf_topk" -> Similarity.ivfTopKSql(),
    "q_ivf_trained_topk" -> Similarity.ivfTrainedTopKSql(),
    "q_pq_topk" -> Pq.pqTopKSql(),
    "q_ivfpq_topk" -> Pq.ivfPqTopKSql(),
    "q_sq_topk" -> Pq.sqTopKSql(),
    "q_rolling_fingerprint" -> Text.rollingFingerprintsSql,
    "q_near_dedup_summary" -> Dedup.nearDedupSummarySql,
    "q_near_dup_clusters" -> Dedup.nearDupClustersSql,
    "q_dup_cluster_hist" -> Dedup.dupClusterHistSql,
    "q_funnel" -> Behavior.funnelSql,
    "q_weekly_retention" -> Behavior.weeklyRetentionSql,
    "q_value_histogram" -> Behavior.valueHistogramSql,
    "q_event_pivot" -> EventOps.eventTypePivotSql,
    "q_sql_subqueries" -> EventOps.sqlSubqueriesSql,
    "q_lateral_topk" -> EventOps.lateralTopOrdersSql,
    "q_tfidf" -> Text.tfidfSql,
    "q_lm_score" -> Text.lmScoreSql,
    "q_stratified_sample" -> Text.stratifiedSampleSql,
    "q_label_centroids" -> Similarity.labelCentroidsSql,
    "q_semantic_dedup" -> Similarity.semanticDedupSql(),
    "q_profile_orders" -> SetAndScalar.profileOrdersSql,
    "q_decontaminate" -> Dedup.decontaminateSql,
    "q_substring_overlap" -> Dedup.substringOverlapSql(),
    "q_neardup_pagerank" -> Graph.nearDupPagerankSql,
    "q_doc_repetition" -> Text.docRepetitionSql,
    "q_weighted_sample" -> Text.weightedSampleSql,
    "q_session_overlap" -> Behavior.sessionOverlapSql,
    "q_seq_pack" -> Pipeline.seqPackSql(),
    "q_source_mix" -> Pipeline.sourceMixSql,
    "q_pii_redact" -> Pipeline.piiRedactSql,
    "q_chunk_windows" -> Pipeline.chunkWindowsSql(),
    "q_curation_funnel" -> Pipeline.curationFunnelSql(),
    "q_gap_fill" -> EventOps.gapFillSql,
    "q_skew_agg" -> Skew.saltedEventStatsSql,
    "q_range_frame" -> Windows.rollingRangeRevenueSql,
    "q_unpivot" -> EventOps.eventTypeUnpivotSql,
    "q_cms_heavy_hitters" -> Sketch.cmsHeavyHittersSql,
    "q_graph_bfs" -> Graph.nearDupBfsSql(),
    "q_pack_efficiency" -> Pipeline.packEfficiencySql,
    "q_anomaly_zscore" -> Aggregates.anomalyZscoreSql,
    "q_merge_upsert" -> Joins.mergeUpsertSql,
    "q_scd2_intervals" -> EventOps.scd2IntervalsSql,
    "q_sparse_cosine" -> Dedup.sparseCosinePairsSql(),
    "q_markov_transitions" -> Behavior.markovTransitionsSql,
    "q_sliding_dau" -> Behavior.slidingDauSql,
    "q_time_to_convert" -> Behavior.timeToConvertSql,
    "q_oov_rate" -> Text.oovRateSql(),
    "q_bloom_semi_join" -> Sketch.bloomSemiJoinSql,
    "q_fuzzy_name_pairs" -> SetAndScalar.fuzzyNamePairsSql,
    "q_argmax_order" -> Relational.argmaxOrderSql,
    "q_time_weighted_avg" -> EventOps.timeWeightedAvgSql,
    "q_chi_square" -> Behavior.chiSquareSql,
    "q_cohort_matrix" -> Behavior.cohortMatrixSql,
    "q_phrase_search" -> Text.phraseSearchSql(),
  )
}
