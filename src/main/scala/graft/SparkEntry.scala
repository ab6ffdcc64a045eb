package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end curation pipeline (q79) — dedup keepers, benchmark
    * holdout, shingle decontamination, quality gate in one query — is
    * the single best picture of what this engine is for.
    */
  def entry(spark: SparkSession): DataFrame = entry(spark, "/root/testdata/sf0.001")

  /** Same flagship query over an arbitrary data dir (the driver's smoke
    * check uses the sf0.001 default above; real callers pass their own).
    */
  def entry(spark: SparkSession, dir: String): DataFrame =
    TrainingData.curationPipeline(GraftSession.tune(spark), dir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 relational core
    "q01_filter_project"        -> ((s, d) => Relational.filterProject(GraftSession.tune(s), d)),
    "q02_pricing_summary"       -> ((s, d) => Relational.pricingSummary(GraftSession.tune(s), d)),
    "q03_top_revenue_parts"     -> ((s, d) => Relational.topRevenueParts(GraftSession.tune(s), d)),
    "q04_shipping_priority"     -> ((s, d) => Relational.shippingPriority(GraftSession.tune(s), d)),
    "q05_local_supplier_volume" -> ((s, d) => Relational.localSupplierVolume(GraftSession.tune(s), d)),
    "q06_customer_order_gaps"   -> ((s, d) => Relational.customerOrderGaps(GraftSession.tune(s), d)),
    "q07_waiting_orders"        -> ((s, d) => Relational.waitingOrders(GraftSession.tune(s), d)),
    "q08_idle_customers"        -> ((s, d) => Relational.idleCustomers(GraftSession.tune(s), d)),
    "q09_small_quantity_revenue" -> ((s, d) => Relational.smallQuantityRevenue(GraftSession.tune(s), d)),
    "q10_rank_in_segment"       -> ((s, d) => Relational.rankInSegment(GraftSession.tune(s), d)),
    "q11_order_value_delta"     -> ((s, d) => Relational.orderValueDelta(GraftSession.tune(s), d)),
    "q12_running_revenue"       -> ((s, d) => Relational.runningRevenue(GraftSession.tune(s), d)),
    "q13_distinct_parts_per_order" -> ((s, d) => Relational.distinctPartsPerOrder(GraftSession.tune(s), d)),
    "q14_set_ops"               -> ((s, d) => Relational.setOps(GraftSession.tune(s), d)),
    "q15_status_pivot"          -> ((s, d) => Relational.statusPivot(GraftSession.tune(s), d)),
    "q16_rollup_revenue"        -> ((s, d) => Relational.rollupRevenue(GraftSession.tune(s), d)),
    "q17_name_buckets"          -> ((s, d) => Relational.nameBuckets(GraftSession.tune(s), d)),
    "q18_big_segments"          -> ((s, d) => Relational.bigSegments(GraftSession.tune(s), d)),
    "q19_approx_sketches"       -> ((s, d) => Relational.approxSketches(GraftSession.tune(s), d)),
    "q20_value_quantiles"       -> ((s, d) => Relational.valueQuantiles(GraftSession.tune(s), d)),
    // §2.2 changefeed / temporal (batch-verifiable analogues)
    "q21_cdc_latest_state"      -> ((s, d) => Temporal.cdcLatestState(GraftSession.tune(s), d)),
    "q22_cdc_delta"             -> ((s, d) => Temporal.cdcDelta(GraftSession.tune(s), d)),
    "q23_tumbling_hour"         -> ((s, d) => Temporal.tumblingHour(GraftSession.tune(s), d)),
    "q24_sliding_window"        -> ((s, d) => Temporal.slidingWindow(GraftSession.tune(s), d)),
    "q25_sessionize"            -> ((s, d) => Temporal.sessionize(GraftSession.tune(s), d)),
    "q26_asof_join"             -> ((s, d) => Temporal.asofJoin(GraftSession.tune(s), d)),
    "q89_asof_enrich"           -> ((s, d) => Temporal.asofEnrich(GraftSession.tune(s), d)),
    "q90_mad_robust"            -> ((s, d) => TrainingData.madRobust(GraftSession.tune(s), d)),
    "q27_feed_compaction"       -> ((s, d) => Temporal.feedCompaction(GraftSession.tune(s), d)),
    "q28_funnel"                -> ((s, d) => Temporal.funnel(GraftSession.tune(s), d)),
    "q29_json_props"            -> ((s, d) => Temporal.jsonProps(GraftSession.tune(s), d)),
    "q30_hourly_top_users"      -> ((s, d) => Temporal.hourlyTopUsers(GraftSession.tune(s), d)),
    "q31_cube_revenue"          -> ((s, d) => Relational.cubeRevenue(GraftSession.tune(s), d)),
    "q32_ntile_percent_rank"    -> ((s, d) => Relational.ntilePercentRank(GraftSession.tune(s), d)),
    "q33_trailing_revenue"      -> ((s, d) => Relational.trailingRevenue(GraftSession.tune(s), d)),
    "q34_status_listagg"        -> ((s, d) => Relational.statusListAgg(GraftSession.tune(s), d)),
    "q35_big_spenders"          -> ((s, d) => Relational.bigSpenders(GraftSession.tune(s), d)),
    "q36_weighted_avg_discount" -> ((s, d) => Relational.weightedAvgDiscount(GraftSession.tune(s), d)),
    "q37_price_quantity_corr"   -> ((s, d) => Relational.priceQuantityCorr(GraftSession.tune(s), d)),
    "q38_decayed_sum"           -> ((s, d) => Temporal.decayedSum(GraftSession.tune(s), d)),
    "q39_event_pattern"         -> ((s, d) => Temporal.eventPattern(GraftSession.tune(s), d)),
    "q40_asof_state"            -> ((s, d) => Temporal.versionedState(GraftSession.tune(s), d)),
    "q41_multiset_ops"          -> ((s, d) => Relational.multisetOps(GraftSession.tune(s), d)),
    "t05_unigram_logprob"       -> ((s, d) => TextAnalysis.unigramLogprob(GraftSession.tune(s), d)),
    // §2.4 LLM-data-pipeline operators
    "d01_dedup_exact"           -> ((s, d) => Dedup.exact(GraftSession.tune(s), d)),
    "d02_dedup_ngram_jaccard"   -> ((s, d) => Dedup.ngramJaccard(GraftSession.tune(s), d)),
    "d03_dedup_minhash_lsh"     -> ((s, d) => Dedup.minhashLsh(GraftSession.tune(s), d)),
    "d04_dedup_simhash"         -> ((s, d) => Dedup.simhash(GraftSession.tune(s), d)),
    // numPlanes pinned to 8: the DuckDB oracle emulates exactly these 8
    // sin-hyperplanes (auto-sizing would pick 8 here anyway, n=500)
    "d05_dedup_embedding"       -> ((s, d) => Dedup.embeddingNearDup(GraftSession.tune(s), d, numPlanes0 = 8)),
    "d06_dedup_clusters"        -> ((s, d) => Dedup.dedupClusters(GraftSession.tune(s), d)),
    "s01_ann_bruteforce"        -> ((s, d) => Similarity.annBruteForce(GraftSession.tune(s), d)),
    "s02_ann_lsh"               -> ((s, d) => Similarity.annLsh(GraftSession.tune(s), d, numPlanes0 = 8)),
    "s03_embedding_stats"       -> ((s, d) => Similarity.embeddingStats(GraftSession.tune(s), d)),
    "s04_ann_ivf"               -> ((s, d) => Similarity.annIvf(GraftSession.tune(s), d)),
    "t01_langid"                -> ((s, d) => TextAnalysis.langId(GraftSession.tune(s), d)),
    "t02_quality"               -> ((s, d) => TextAnalysis.quality(GraftSession.tune(s), d)),
    "t03_tokens"                -> ((s, d) => TextAnalysis.tokens(GraftSession.tune(s), d)),
    "t04_fingerprint"           -> ((s, d) => TextAnalysis.fingerprint(GraftSession.tune(s), d)),
    "m01_multimodal_pipeline"   -> ((s, d) => Multimodal.pipeline(GraftSession.tune(s), d)),
    "m02_audio_pipeline"        -> ((s, d) => Multimodal.audioPipeline(GraftSession.tune(s), d)),
    "m03_video_pipeline"        -> ((s, d) => Multimodal.videoPipeline(GraftSession.tune(s), d)),
    // §2.4 training-data curation (q42+)
    "q42_train_test_split"      -> ((s, d) => TrainingData.trainTestSplit(GraftSession.tune(s), d)),
    "q43_sequence_packing"      -> ((s, d) => TrainingData.sequencePacking(GraftSession.tune(s), d)),
    "q44_contamination"         -> ((s, d) => TrainingData.contamination(GraftSession.tune(s), d)),
    "q45_normalize_text"        -> ((s, d) => TrainingData.normalizeText(GraftSession.tune(s), d)),
    "q46_range_join"            -> ((s, d) => TrainingData.errorBlastRadius(GraftSession.tune(s), d)),
    "q47_frequent_shingles"     -> ((s, d) => TrainingData.frequentShingles(GraftSession.tune(s), d)),
    "q48_stratified_sample"     -> ((s, d) => TrainingData.stratifiedSample(GraftSession.tune(s), d)),
    "q49_mixture_sample"        -> ((s, d) => TrainingData.mixtureSample(GraftSession.tune(s), d)),
    "q50_dedup_corpus"          -> ((s, d) => Dedup.dedupedCorpus(GraftSession.tune(s), d)),
    "q51_anomalies"             -> ((s, d) => Temporal.anomalies(GraftSession.tune(s), d)),
    "q52_cohort_retention"      -> ((s, d) => Temporal.cohortRetention(GraftSession.tune(s), d)),
    "q53_grouping_sets"         -> ((s, d) => Relational.groupingSets(GraftSession.tune(s), d)),
    "q54_part_cooccurrence"     -> ((s, d) => Relational.partCooccurrence(GraftSession.tune(s), d)),
    "q55_unpivot_metrics"       -> ((s, d) => Relational.unpivotMetrics(GraftSession.tune(s), d)),
    "q56_mode_median"           -> ((s, d) => Relational.modeMedian(GraftSession.tune(s), d)),
    "q57_window_navigation"     -> ((s, d) => Relational.windowNavigation(GraftSession.tune(s), d)),
    "t06_repetition"            -> ((s, d) => TextAnalysis.repetition(GraftSession.tune(s), d)),
    "t07_bigram_logprob"        -> ((s, d) => TextAnalysis.bigramLogprob(GraftSession.tune(s), d)),
    "d07_dedup_incremental"     -> ((s, d) => Dedup.incrementalDedup(GraftSession.tune(s), d)),
    "q58_diversity_sample"      -> ((s, d) => Similarity.diversitySample(GraftSession.tune(s), d)),
    "q59_sketch_rollup"         -> ((s, d) => Sketches.sketchRollup(GraftSession.tune(s), d)),
    "q60_weighted_sample"       -> ((s, d) => TrainingData.weightedSample(GraftSession.tune(s), d)),
    "q61_zscore_outliers"       -> ((s, d) => Relational.zscoreOutliers(GraftSession.tune(s), d)),
    "q62_salted_join"           -> ((s, d) => Relational.saltedRevenueByBrand(GraftSession.tune(s), d)),
    "t08_tfidf"                 -> ((s, d) => TextAnalysis.tfidf(GraftSession.tune(s), d)),
    "q63_merge_upsert"          -> ((s, d) => Temporal.mergeUpsert(GraftSession.tune(s), d)),
    "q64_activity_streaks"      -> ((s, d) => Temporal.activityStreaks(GraftSession.tune(s), d)),
    "q65_interval_merge"        -> ((s, d) => Temporal.coalesceIntervals(GraftSession.tune(s), d)),
    "q66_topk_per_group"        -> ((s, d) => Relational.topPerSegment(GraftSession.tune(s), d)),
    "d08_passage_dedup"         -> ((s, d) => Dedup.passageDedup(GraftSession.tune(s), d)),
    "t09_bpe_pairs"             -> ((s, d) => Bpe.pairStats(GraftSession.tune(s), d)),
    "q67_conversion_delay"      -> ((s, d) => Temporal.conversionDelay(GraftSession.tune(s), d)),
    // hash-exact since the fixed-point Lloyd rewrite (integer codebooks
    // replayed round-for-round by the oracle); recall pinned in spec
    "s05_ann_pq"                -> ((s, d) => Similarity.annPq(GraftSession.tune(s), d)),
    // rows-only (MG counts depend on merge order); bounds pinned in spec
    "q68_heavy_hitters"         -> ((s, d) => Relational.heavyHitters(GraftSession.tune(s), d)),
    "t11_lang_agreement"        -> ((s, d) => TextAnalysis.langAgreement(GraftSession.tune(s), d)),
    "d09_fuzzy_match"           -> ((s, d) => Dedup.fuzzyMatch(GraftSession.tune(s), d)),
    "q69_price_histogram"       -> ((s, d) => Relational.priceHistogram(GraftSession.tune(s), d)),
    "q70_session_funnel"        -> ((s, d) => Temporal.sessionFunnel(GraftSession.tune(s), d)),
    "d10_containment"           -> ((s, d) => Dedup.containment(GraftSession.tune(s), d)),
    "t12_unicode_tokens"        -> ((s, d) => TextAnalysis.unicodeTokens(GraftSession.tune(s), d)),
    // hash-exact (deterministic integer Lloyd ⇒ persisted index is
    // bit-identical to inline s05; same oracle SQL). Lloyd runs only on
    // the FIRST call per (session, corpus) — the query path reads the
    // index
    "s06_ann_pq_served"         -> ((s, d) => Similarity.annPqServed(GraftSession.tune(s), d)),
    "q71_correlated_exists"     -> ((s, d) => Relational.correlatedExists(GraftSession.tune(s), d)),
    "q72_lateral_aggregate"     -> ((s, d) => Relational.lateralAggregate(GraftSession.tune(s), d)),
    "q73_not_in_nullaware"      -> ((s, d) => Relational.notInSubquery(GraftSession.tune(s), d)),
    // deterministic end-to-end (fixed hyperplanes, exact cosines,
    // round+id tiebreaks) -> hash-exact oracle
    "s07_ann_graph"             -> ((s, d) => Similarity.annGraph(GraftSession.tune(s), d)),
    "d11_unicode_dedup"         -> ((s, d) => Dedup.unicodeDedup(GraftSession.tune(s), d)),
    "d12_semdedup"              -> ((s, d) => Similarity.semDedup(GraftSession.tune(s), d)),
    "d13_canonical_selection"   -> ((s, d) => Dedup.canonicalSelection(GraftSession.tune(s), d)),
    "d14_cross_source_leakage"  -> ((s, d) => Dedup.crossSourceLeakage(GraftSession.tune(s), d)),
    "d15_substring_dedup"       -> ((s, d) => Dedup.substringDedup(GraftSession.tune(s), d)),
    // all-pairs top-k: deterministic bucketed self-join + bounded TopK
    // aggregate (no Window over candidate pairs) -> hash-exact
    "s08_knn_join"              -> ((s, d) => Similarity.knnJoin(GraftSession.tune(s), d)),
    "s09_ann_filtered"          -> ((s, d) => Similarity.annFiltered(GraftSession.tune(s), d)),
    "q74_quality_deciles"       -> ((s, d) => TrainingData.qualityDeciles(GraftSession.tune(s), d)),
    "q75_chunk_overlap"         -> ((s, d) => TrainingData.chunkOverlap(GraftSession.tune(s), d)),
    "q86_global_shard_ids"      -> ((s, d) => TrainingData.globalShardIds(GraftSession.tune(s), d)),
    "q87_semantic_contamination" -> ((s, d) => Similarity.semanticContamination(GraftSession.tune(s), d)),
    "q76_windowed_distinct"     -> ((s, d) => Relational.windowedDistinct(GraftSession.tune(s), d)),
    "q77_hierarchy_rollup"      -> ((s, d) => Relational.hierarchyRollup(GraftSession.tune(s), d)),
    "q78_event_transitions"     -> ((s, d) => Temporal.eventTransitions(GraftSession.tune(s), d)),
    "q79_curation_pipeline"     -> ((s, d) => TrainingData.curationPipeline(GraftSession.tune(s), d)),
    "q80_part_pagerank"         -> ((s, d) => Relational.pageRank(GraftSession.tune(s), d)),
    "q81_sliding_distinct"      -> ((s, d) => Temporal.slidingDistinct(GraftSession.tune(s), d)),
    "q82_twap"                  -> ((s, d) => Temporal.twap(GraftSession.tune(s), d)),
    "q83_ohlc_hourly"           -> ((s, d) => Temporal.ohlc(GraftSession.tune(s), d)),
    "q84_triangle_stats"        -> ((s, d) => Relational.triangleStats(GraftSession.tune(s), d)),
    "q85_skew_diagnostics"      -> ((s, d) => Relational.skewDiagnostics(GraftSession.tune(s), d)),
    "q88_gapfill_locf"          -> ((s, d) => Temporal.gapFill(GraftSession.tune(s), d)),
    "t13_gopher_quality"        -> ((s, d) => TextAnalysis.gopherQuality(GraftSession.tune(s), d)),
    "t14_length_histogram"      -> ((s, d) => TextAnalysis.lengthHistogram(GraftSession.tune(s), d)),
    "t15_bm25"                  -> ((s, d) => TextAnalysis.bm25Rank(GraftSession.tune(s), d)),
    "t16_lexical_diversity"     -> ((s, d) => TextAnalysis.lexicalDiversity(GraftSession.tune(s), d)),
    "t17_source_divergence"     -> ((s, d) => TextAnalysis.sourceDivergence(GraftSession.tune(s), d)),
    "t18_vocab_growth"          -> ((s, d) => TextAnalysis.vocabularyGrowth(GraftSession.tune(s), d)),
    "q91_dsir_sample"           -> ((s, d) => TrainingData.dsirSample(GraftSession.tune(s), d)),
    "q92_groups_frame"          -> ((s, d) => Relational.groupsFrame(GraftSession.tune(s), d)),
    "q93_regr_linefit"          -> ((s, d) => Relational.regrLinefit(GraftSession.tune(s), d)),
    "t19_pii_scan"              -> ((s, d) => TextAnalysis.piiScan(GraftSession.tune(s), d)),
    "q94_mixture_weights"       -> ((s, d) => TrainingData.mixtureWeights(GraftSession.tune(s), d)),
    "q95_exclude_frame"         -> ((s, d) => Relational.excludeFrame(GraftSession.tune(s), d)),
    "q96_peak_concurrency"      -> ((s, d) => Temporal.peakConcurrency(GraftSession.tune(s), d)),
    "q97_asof_tolerance"        -> ((s, d) => Temporal.asofTolerance(GraftSession.tune(s), d)),
    "q98_session_attribution"   -> ((s, d) => Temporal.sessionAttribution(GraftSession.tune(s), d)),
    "q99_lateness_profile"      -> ((s, d) => Temporal.latenessProfile(GraftSession.tune(s), d)),
    "q100_market_share"         -> ((s, d) => Relational.marketShare(GraftSession.tune(s), d)),
    "q101_integrity_audit"      -> ((s, d) => Relational.integrityAudit(GraftSession.tune(s), d)),
    "q102_order_overlap"        -> ((s, d) => Temporal.orderOverlapPairs(GraftSession.tune(s), d)),
    "q103_shard_entropy"        -> ((s, d) => TrainingData.shardMixEntropy(GraftSession.tune(s), d)),
    "q104_leakage_safe_split"   -> ((s, d) => TrainingData.leakageSafeSplit(GraftSession.tune(s), d)),
    "q105_sole_failing_supplier" -> ((s, d) => Relational.soleFailingSupplier(GraftSession.tune(s), d)),
    "q106_rfm_segments"         -> ((s, d) => Relational.rfmSegments(GraftSession.tune(s), d)),
    "q107_important_parts"      -> ((s, d) => Relational.importantParts(GraftSession.tune(s), d)),
    "q108_dormant_balance"      -> ((s, d) => Relational.dormantHighBalance(GraftSession.tune(s), d)),
    "q109_top_supplier"         -> ((s, d) => Relational.topQuarterSupplier(GraftSession.tune(s), d)),
    "q110_region_coverage"      -> ((s, d) => Relational.regionCoverageDivision(GraftSession.tune(s), d)),
    "q111_pareto_parts"         -> ((s, d) => Relational.paretoParts(GraftSession.tune(s), d)),
    "q112_clean_corpus"         -> ((s, d) => TrainingData.cleanCorpus(GraftSession.tune(s), d)),
    "q113_custdist"             -> ((s, d) => Relational.customerOrderDistribution(GraftSession.tune(s), d)),
    "q114_stickiness"           -> ((s, d) => Temporal.stickiness(GraftSession.tune(s), d)),
    "q115_min_cost_supplier"    -> ((s, d) => Relational.minCostSupplier(GraftSession.tune(s), d)),
    "q116_large_qty_orders"     -> ((s, d) => Relational.largeQuantityOrders(GraftSession.tune(s), d)),
    "q117_excess_stock"         -> ((s, d) => Relational.excessStockSuppliers(GraftSession.tune(s), d)),
    "q118_nation_pair_volume"   -> ((s, d) => Relational.nationPairVolume(GraftSession.tune(s), d)),
    "q119_nation_profit"        -> ((s, d) => Relational.nationProfit(GraftSession.tune(s), d)),
    "q120_returned_items"       -> ((s, d) => Relational.returnedItemReport(GraftSession.tune(s), d)),
    "q121_lateness_priority"    -> ((s, d) => Relational.latenessPriorityProfile(GraftSession.tune(s), d)),
    "q122_promo_share"          -> ((s, d) => Relational.promoShare(GraftSession.tune(s), d)),
    "q123_supplier_breadth"     -> ((s, d) => Relational.partSupplierBreadth(GraftSession.tune(s), d)),
    "q124_disjunctive_revenue"  -> ((s, d) => Relational.disjunctiveRevenue(GraftSession.tune(s), d)),
    "q125_column_profile"       -> ((s, d) => Profiling.columnProfile(GraftSession.tune(s), d)),
    "q126_source_mix_chisq"     -> ((s, d) => Profiling.contingencyChiSq(GraftSession.tune(s), d)),
    "q127_snapshot_diff"        -> ((s, d) => Profiling.snapshotDiffChangefeed(GraftSession.tune(s), d)),
    "q128_cusum_drift"          -> ((s, d) => Profiling.cusumChangepoint(GraftSession.tune(s), d)),
    "q129_kmv_overlap"          -> ((s, d) => Sketches.kmvOverlap(GraftSession.tune(s), d)),
    "q131_asof_nearest"         -> ((s, d) => Temporal.asofNearest(GraftSession.tune(s), d)),
    "q132_walkforward_splits"   -> ((s, d) => TrainingData.walkForwardSplits(GraftSession.tune(s), d)),
    "q134_cms_counts"           -> ((s, d) => Sketches.cmsCounts(GraftSession.tune(s), d)),
    "q135_hybrid_rrf"           -> ((s, d) => Similarity.hybridRrf(GraftSession.tune(s), d)),
    "q136_psi_drift"            -> ((s, d) => Profiling.psiDrift(GraftSession.tune(s), d)),
    "q137_timed_funnel"         -> ((s, d) => Temporal.timedFunnel(GraftSession.tune(s), d)),
    "q138_association_rules"    -> ((s, d) => Relational.associationRules(GraftSession.tune(s), d)),
    "q139_seasonal_backtest"    -> ((s, d) => Temporal.seasonalNaiveBacktest(GraftSession.tune(s), d)),
    "q140_bfs_distance"         -> ((s, d) => Relational.bfsDistance(GraftSession.tune(s), d)),
    "q141_gapfill_linear"       -> ((s, d) => Temporal.gapFillLinear(GraftSession.tune(s), d)),
    "q142_data_card"            -> ((s, d) => TrainingData.dataCard(GraftSession.tune(s), d)),
    "q133_table_digest"         -> ((s, d) => Profiling.tableDigest(GraftSession.tune(s), d)),
    "q130_bloom_semijoin"       -> ((s, d) => Relational.bloomSemiJoin(GraftSession.tune(s), d)),
    "t26_hash_classifier"       -> ((s, d) => TextAnalysis.hashClassifier(GraftSession.tune(s), d)),
    "d16_dedup_rewrite"         -> ((s, d) => Dedup.substringRewrite(GraftSession.tune(s), d)),
    "d17_threshold_sweep"       -> ((s, d) => Dedup.thresholdSweep(GraftSession.tune(s), d)),
    "d18_image_dedup"           -> ((s, d) => Multimodal.imageDedupDhash(GraftSession.tune(s), d)),
    "d19_audio_dedup"           -> ((s, d) => Multimodal.audioDedupFingerprint(GraftSession.tune(s), d)),
    "d20_video_dedup"           -> ((s, d) => Multimodal.videoDedupFingerprint(GraftSession.tune(s), d)),
    "q143_phrase_match"         -> ((s, d) => TextAnalysis.phraseMatch(GraftSession.tune(s), d)),
    "t27_gram_novelty"          -> ((s, d) => TextAnalysis.gramNovelty(GraftSession.tune(s), d)),
    "t28_token_fertility"       -> ((s, d) => TextAnalysis.tokenFertility(GraftSession.tune(s), d)),
    "q144_zorder_layout"        -> ((s, d) => Relational.zorderLayout(GraftSession.tune(s), d)),
    "q145_gini_concentration"   -> ((s, d) => Relational.giniConcentration(GraftSession.tune(s), d)),
    "q146_bitmap_intersect"     -> ((s, d) => Relational.bitmapIntersect(GraftSession.tune(s), d)),
    "q147_bitmap_live"          -> ((s, d) => graft.streaming.BitmapIndexView.bitmapLiveCells(GraftSession.tune(s), d)),
    "q148_phrase_live"          -> ((s, d) => graft.streaming.PostingIndexView.phraseLive(GraftSession.tune(s), d)),
    "q149_skyline_parts"        -> ((s, d) => Relational.skylineParts(GraftSession.tune(s), d)),
    "q150_weighted_median"      -> ((s, d) => Relational.weightedMedian(GraftSession.tune(s), d)),
    "s14_mutual_nn"             -> ((s, d) => Similarity.mutualNn(GraftSession.tune(s), d)),
    "t24_dup_ngrams"            -> ((s, d) => TextAnalysis.dupNgramStats(GraftSession.tune(s), d)),
    "t25_char_entropy"          -> ((s, d) => TextAnalysis.charBigramEntropy(GraftSession.tune(s), d)),
    "s10_ann_recall"            -> ((s, d) => Similarity.annRecallAudit(GraftSession.tune(s), d)),
    "s11_ann_pq_recall"         -> ((s, d) => Similarity.annPqRecallAudit(GraftSession.tune(s), d)),
    "s12_ann_ivf_recall"        -> ((s, d) => Similarity.annIvfRecallAudit(GraftSession.tune(s), d)),
    "s13_ann_live_index"        -> ((s, d) => graft.streaming.AnnIndexView.annLiveIndex(GraftSession.tune(s), d)),
    "s15_ann_ivf_live"          -> ((s, d) => graft.streaming.IvfIndexView.annIvfLive(GraftSession.tune(s), d)),
    "s16_ann_pq_live"           -> ((s, d) => graft.streaming.PqIndexView.annPqLive(GraftSession.tune(s), d)),
    "q151_hybrid_live"          -> ((s, d) => graft.streaming.HybridLive.hybridRrfLive(GraftSession.tune(s), d)),
    "q152_bm25_live"            -> ((s, d) => graft.streaming.PostingIndexView.bm25FromLive(GraftSession.tune(s), d)),
    "t20_readability"           -> ((s, d) => TextAnalysis.readability(GraftSession.tune(s), d)),
    "t22_zipf_slope"            -> ((s, d) => TextAnalysis.zipfSlope(GraftSession.tune(s), d)),
    "t23_perplexity_buckets"    -> ((s, d) => TextAnalysis.perplexityBuckets(GraftSession.tune(s), d)),
  )

  // ---- fixed-point Lloyd oracle scaffolding (s04/s05/s06) ----------
  // Similarity.ivfIndex/pqIndex train k-means entirely in micro-unit
  // integer arithmetic (quantize once, integer argmin-L2 assignment,
  // floored-mean update), so the oracle replays training ROUND FOR
  // ROUND: these templates unroll the two Lloyd iterations as CTE
  // levels, exactly like the q80 fixed-point PageRank oracle.
  /** DuckDB-side hex→int fold for `ndigits` md5 hex digits starting at
    * 1-based `start` — the q129/q130/t26 pairing for Spark's
    * `conv(substring(md5(x), start, n), 16, 10)`.
    */
  private def hexValSql(h: String, start: Int, ndigits: Int): String =
    (0 until ndigits).map { i =>
      val shift = 1L << (4 * (ndigits - 1 - i))
      s"(strpos('0123456789abcdef', substr($h, ${start + i}, 1)) - 1) * $shift"
    }.mkString("(", " + ", ")")

  private def sqlDotF(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * $b[i]), 'sum')"
  private def sqlDotI(a: String, b: String): String =
    s"CAST(list_aggregate(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), 'sum') AS BIGINT)"
  private def sqlMicro(a: String): String =
    s"list_transform($a, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"

  private def ivfAssignSql(cents: String, out: String, src: String = "e"): String =
    s"""${out}_s AS (SELECT e.vec_id, e.embedding, e.norm, e.xi, c.cid,
       |  row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY 2 * ${sqlDotI("e.xi", "c.ci")} - c.c2 DESC, c.cid) AS arn
       |  FROM $src e, $cents c),
       |$out AS (SELECT vec_id, embedding, norm, xi, cid FROM ${out}_s WHERE arn = 1)""".stripMargin
  private def ivfRecomputeSql(assigned: String, out: String): String =
    s"""${out}_x AS (SELECT cid, generate_subscripts(xi, 1) AS pos, unnest(xi) AS x FROM $assigned),
       |${out}_m AS (SELECT cid, pos, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS m
       |  FROM ${out}_x GROUP BY cid, pos),
       |${out}_l AS (SELECT cid, list(m ORDER BY pos) AS ci FROM ${out}_m GROUP BY cid),
       |$out AS (SELECT cid, ci, ${sqlDotI("ci", "ci")} AS c2 FROM ${out}_l)""".stripMargin

  private lazy val s04OracleSql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
       |  ${sqlMicro("embedding")} AS xi
       |  FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS INT) AS cid, xi AS ci, ${sqlDotI("xi", "xi")} AS c2
       |  FROM e WHERE vec_id < 16),
       |${ivfAssignSql("c0", "a1")},
       |${ivfRecomputeSql("a1", "c1")},
       |${ivfAssignSql("c1", "a2")},
       |${ivfRecomputeSql("a2", "c2t")},
       |${ivfAssignSql("c2t", "cells")},
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, xi AS q_xi
       |  FROM cells WHERE vec_id < 10),
       |pr_s AS (SELECT q.query_id, q.q_emb, q.q_norm, c.cid,
       |  row_number() OVER (PARTITION BY q.query_id
       |    ORDER BY 2 * ${sqlDotI("q.q_xi", "c.ci")} - c.c2 DESC, c.cid) AS prn
       |  FROM q, c2t c),
       |pr AS (SELECT query_id, q_emb, q_norm, cid FROM pr_s WHERE prn <= 2),
       |p AS (SELECT pr.query_id, e2.vec_id AS neighbor_id,
       |  round(${sqlDotF("pr.q_emb", "e2.embedding")} / (pr.q_norm * e2.norm), 6) AS sim6
       |  FROM cells e2 JOIN pr ON e2.cid = pr.cid AND e2.vec_id <> pr.query_id),
       |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
       |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p)
       |SELECT query_id, neighbor_id, round(sim6, 4) AS cosine, CAST(rn AS BIGINT) AS rn
       |FROM r WHERE rn <= 3""".stripMargin

  // d12: replay the s04 cluster assignment, then the in-cluster integer
  // cosine-threshold test in HUGEINT (Spark side: DECIMAL(38)) — the
  // survivor set is exact integer arithmetic end-to-end.
  private lazy val d12OracleSql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
       |  ${sqlMicro("embedding")} AS xi
       |  FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS INT) AS cid, xi AS ci, ${sqlDotI("xi", "xi")} AS c2
       |  FROM e WHERE vec_id < 16),
       |${ivfAssignSql("c0", "a1")},
       |${ivfRecomputeSql("a1", "c1")},
       |${ivfAssignSql("c1", "a2")},
       |${ivfRecomputeSql("a2", "c2t")},
       |${ivfAssignSql("c2t", "cells")},
       |a AS (SELECT vec_id, cid, xi, ${sqlDotI("xi", "xi")} AS x2 FROM cells),
       |dup AS (SELECT DISTINCT r.vec_id
       |  FROM a l JOIN a r ON l.cid = r.cid AND l.vec_id < r.vec_id
       |  WHERE ${sqlDotI("l.xi", "r.xi")} >= 0
       |    AND CAST(${sqlDotI("l.xi", "r.xi")} AS HUGEINT) * ${sqlDotI("l.xi", "r.xi")} * 1000000
       |        >= 62500 * CAST(l.x2 AS HUGEINT) * r.x2)
       |SELECT vec_id, CAST(cid AS INT) AS cid FROM a
       |WHERE vec_id NOT IN (SELECT vec_id FROM dup)""".stripMargin

  private def pqAssignSql(cb: String, out: String, src: String = "subs"): String =
    s"""${out}_s AS (SELECT s.vec_id, s.j, s.svi, c.code,
       |  row_number() OVER (PARTITION BY s.vec_id, s.j
       |    ORDER BY 2 * ${sqlDotI("s.svi", "c.cvi")} - c.c2 DESC, c.code) AS arn
       |  FROM $src s JOIN $cb c ON s.j = c.j),
       |$out AS (SELECT vec_id, j, svi, code FROM ${out}_s WHERE arn = 1)""".stripMargin
  private def pqRecomputeSql(assigned: String, out: String): String =
    s"""${out}_x AS (SELECT j, code, generate_subscripts(svi, 1) AS pos, unnest(svi) AS x FROM $assigned),
       |${out}_m AS (SELECT j, code, pos, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS mu
       |  FROM ${out}_x GROUP BY j, code, pos),
       |${out}_l AS (SELECT j, code, list(mu ORDER BY pos) AS cvi FROM ${out}_m GROUP BY j, code),
       |$out AS (SELECT j, code, cvi, ${sqlDotI("cvi", "cvi")} AS c2 FROM ${out}_l)""".stripMargin

  // s06 serves bit-identical answers from the persisted index (the #139
  // spec asserts it), so it shares this oracle verbatim.
  private lazy val s05OracleSql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
       |  len(embedding) // 4 AS d FROM embeddings),
       |subs AS (SELECT vec_id, j,
       |  ${sqlMicro("embedding[j * d + 1 : (j + 1) * d]")} AS svi
       |  FROM e, (SELECT unnest(range(0, 4)) AS j) t),
       |cb0 AS (SELECT j, CAST(vec_id AS INT) AS code, svi AS cvi, ${sqlDotI("svi", "svi")} AS c2
       |  FROM subs WHERE vec_id < 16),
       |${pqAssignSql("cb0", "a1")},
       |${pqRecomputeSql("a1", "cb1")},
       |${pqAssignSql("cb1", "a2")},
       |${pqRecomputeSql("a2", "cb2")},
       |${pqAssignSql("cb2", "codes")},
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, d FROM e WHERE vec_id < 10),
       |lut AS (SELECT q.query_id, q.q_norm, c.j, c.code,
       |  ${sqlDotI(sqlMicro("q.q_emb[c.j * q.d + 1 : (c.j + 1) * q.d]"), "c.cvi")} AS pdot
       |  FROM q, cb2 c),
       |cand_s AS (SELECT l.query_id, co.vec_id AS neighbor_id,
       |  sum(l.pdot) AS adot, any_value(l.q_norm) AS q_norm
       |  FROM codes co JOIN lut l ON co.j = l.j AND co.code = l.code
       |  WHERE co.vec_id <> l.query_id
       |  GROUP BY l.query_id, co.vec_id),
       |cand AS (SELECT c.*, e2.norm AS n_norm, e2.embedding AS n_emb,
       |  row_number() OVER (PARTITION BY c.query_id ORDER BY c.adot DESC, c.neighbor_id) AS arn
       |  FROM cand_s c JOIN e e2 ON c.neighbor_id = e2.vec_id),
       |rr AS (SELECT c.query_id, c.neighbor_id,
       |  round(${sqlDotF("q.q_emb", "c.n_emb")} / (c.q_norm * c.n_norm), 6) AS sim6
       |  FROM cand c JOIN q ON c.query_id = q.query_id WHERE c.arn <= 60),
       |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
       |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM rr)
       |SELECT query_id, neighbor_id, round(sim6, 4) AS approx_cosine, CAST(rn AS BIGINT) AS rn
       |FROM r WHERE rn <= 3""".stripMargin

  /** DuckDB-runnable oracle SQL per query key. Column names/aliases must
    * match the Spark output exactly (the driver sorts columns by name and
    * hashes values). Time crosses this boundary only as epoch-us bigints or
    * formatted strings; doubles are rounded identically on both sides.
    */
  // s11: recall@3 of the PQ pipeline vs brute force — the PQ side is
  // the whole s05 oracle as a derived table (its own WITH chain), the
  // exact side s01's brute force at k=3, intersected per query.
  private lazy val s11OracleSql: String =
    s"""WITH pq AS (SELECT query_id, neighbor_id FROM ($s05OracleSql) z),
       |exq AS (SELECT vec_id AS query_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id < 10),
       |exp AS (SELECT exq.query_id, e.vec_id AS neighbor_id,
       |  round(${sqlDotF("exq.q_emb", "e.embedding")}
       |    / (sqrt(list_aggregate(list_transform(exq.q_emb, x -> CAST(x AS DOUBLE) * x), 'sum'))
       |     * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))),
       |  6) AS sim6
       | FROM embeddings e, exq WHERE e.vec_id <> exq.query_id),
       |exr AS (SELECT query_id, neighbor_id, row_number() OVER (
       |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM exp),
       |ex AS (SELECT query_id, neighbor_id FROM exr WHERE rn <= 3),
       |h AS (SELECT x.query_id, count(*) AS c FROM ex x JOIN pq
       |  ON x.query_id = pq.query_id AND x.neighbor_id = pq.neighbor_id GROUP BY 1)
       |SELECT e.query_id, CAST(count(*) AS BIGINT) AS k,
       |  CAST(coalesce(any_value(h.c), 0) AS BIGINT) AS n_hit
       |FROM ex e LEFT JOIN h ON e.query_id = h.query_id
       |GROUP BY e.query_id""".stripMargin

  // s12: same recall composition with the s04 IVF oracle as the approx
  // side — the third index family audited by the same contract.
  private lazy val s12OracleSql: String =
    s"""WITH iv AS (SELECT query_id, neighbor_id FROM ($s04OracleSql) z),
       |exq AS (SELECT vec_id AS query_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id < 10),
       |exp AS (SELECT exq.query_id, e.vec_id AS neighbor_id,
       |  round(${sqlDotF("exq.q_emb", "e.embedding")}
       |    / (sqrt(list_aggregate(list_transform(exq.q_emb, x -> CAST(x AS DOUBLE) * x), 'sum'))
       |     * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))),
       |  6) AS sim6
       | FROM embeddings e, exq WHERE e.vec_id <> exq.query_id),
       |exr AS (SELECT query_id, neighbor_id, row_number() OVER (
       |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM exp),
       |ex AS (SELECT query_id, neighbor_id FROM exr WHERE rn <= 3),
       |h AS (SELECT x.query_id, count(*) AS c FROM ex x JOIN iv
       |  ON x.query_id = iv.query_id AND x.neighbor_id = iv.neighbor_id GROUP BY 1)
       |SELECT e.query_id, CAST(count(*) AS BIGINT) AS k,
       |  CAST(coalesce(any_value(h.c), 0) AS BIGINT) AS n_hit
       |FROM ex e LEFT JOIN h ON e.query_id = h.query_id
       |GROUP BY e.query_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "s04_ann_ivf" -> s04OracleSql,
    "d12_semdedup" -> d12OracleSql,
    "s05_ann_pq" -> s05OracleSql,
    "s06_ann_pq_served" -> s05OracleSql,
    "s11_ann_pq_recall" -> s11OracleSql,
    "s12_ann_ivf_recall" -> s12OracleSql,
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice * (1 - l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS n_rows
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_top_revenue_parts" ->
      """SELECT p_partkey, p_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name
        |ORDER BY revenue DESC, p_partkey LIMIT 10""".stripMargin,
    "q04_shipping_priority" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY o_orderkey, odate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q05_local_supplier_volume" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q06_customer_order_gaps" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q07_waiting_orders" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin,
    "q08_idle_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q09_small_quantity_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l
        |WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    "q10_rank_in_segment" ->
      """SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal, rn
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) t
        |WHERE rn <= 3""".stripMargin,
    "q11_order_value_delta" ->
      """SELECT o_custkey, o_orderkey,
        | round(o_totalprice - lag(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
        |FROM orders""".stripMargin,
    // q12: money sums in DECIMAL(18,2) on BOTH engines — exact and
    // associative, which is what lets the Spark side regroup the fold
    // into bucket partials + offsets without ulp drift
    "q12_running_revenue" ->
      """WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM orders GROUP BY 1)
        |SELECT odate, round(CAST(sum(rev) OVER (ORDER BY odate
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS cum_rev
        |FROM d""".stripMargin,
    "q13_distinct_parts_per_order" ->
      """SELECT l_orderkey, count(DISTINCT l_partkey) AS n_parts,
        | count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q14_set_ops" ->
      """SELECT k FROM (
        | SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        | UNION
        | SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000) u
        |EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q15_status_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS rev_f
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q16_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q17_name_buckets" ->
      """SELECT p_partkey, upper(substr(p_name, 1, 8)) AS prefix,
        | CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_bucket,
        | length(p_name) AS name_len
        |FROM part""".stripMargin,
    "q18_big_segments" ->
      """SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer GROUP BY c_mktsegment HAVING count(*) > 20""".stripMargin,
    "q20_value_quantiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90
        |FROM events GROUP BY event_type""".stripMargin,
    "q21_cdc_latest_state" ->
      """SELECT user_id, event_type, round(value, 2) AS value, ts_us
        |FROM (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q22_cdc_delta" ->
      """SELECT event_id, user_id,
        | round(value - lag(value) OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(ts), event_id), 2) AS delta
        |FROM events""".stripMargin,
    "q23_tumbling_hour" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q24_sliding_window" ->
      """SELECT strftime(date_trunc('hour', ts) - h * INTERVAL 1 HOUR,
        |   '%Y-%m-%d %H:%M:%S') AS window_start,
        | count(*) AS n, round(sum(value), 2) AS total
        |FROM events, (VALUES (0), (1)) t(h) GROUP BY 1""".stripMargin,
    "q25_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events),
        |m AS (SELECT user_id, tsu, event_id,
        |  CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) IS NULL
        |         OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new FROM e),
        |s AS (SELECT user_id, tsu,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(tsu) AS session_start, max(tsu) AS session_end
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q26_asof_join" ->
      """SELECT e.event_id,
        | (SELECT max(o.o_orderkey) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
        |     AND epoch_us(o.o_orderdate) = (SELECT max(epoch_us(o2.o_orderdate))
        |       FROM orders o2 WHERE o2.o_custkey = e.user_id
        |         AND epoch_us(o2.o_orderdate) <= epoch_us(e.ts))) AS asof_orderkey
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin,
    "q89_asof_enrich" ->
      """SELECT e.event_id AS event_id, epoch_us(v.vd) AS v_ts_us, v.price AS v_price
        |FROM events e ASOF JOIN (
        |  SELECT o_custkey AS k, o_orderdate AS vd, max(o_totalprice) AS price
        |  FROM orders GROUP BY 1, 2) v
        |ON e.user_id = v.k AND e.ts >= v.vd""".stripMargin,
    "q90_mad_robust" ->
      """WITH m AS (SELECT lang, median(n_chars) AS med FROM documents GROUP BY lang)
        |SELECT d.lang AS lang, any_value(m.med) AS med,
        |  median(abs(d.n_chars - m.med)) AS mad, count(*) AS n
        |FROM documents d JOIN m ON d.lang = m.lang GROUP BY d.lang""".stripMargin,
    "q27_feed_compaction" ->
      """WITH o AS (SELECT user_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
        | FROM events)
        |SELECT user_id, count(*) AS n_changes,
        | round(sum(CASE WHEN rn_a = 1 THEN value END), 2) AS first_value,
        | round(sum(CASE WHEN rn_d = 1 THEN value END), 2) AS last_value,
        | round(sum(CASE WHEN rn_d = 1 THEN value END)
        |     - sum(CASE WHEN rn_a = 1 THEN value END), 2) AS net_delta
        |FROM o GROUP BY user_id""".stripMargin,
    "q28_funnel" ->
      """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT s.user_id, s.signup_ts, count(e.event_id) AS purchases_after
        |FROM s LEFT JOIN events e ON e.user_id = s.user_id
        |  AND e.event_type = 'purchase' AND epoch_us(e.ts) > s.signup_ts
        |GROUP BY s.user_id, s.signup_ts""".stripMargin,
    "q29_json_props" ->
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q30_hourly_top_users" ->
      """WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  user_id, round(sum(value), 2) AS total FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY hour_start
        |  ORDER BY total DESC, user_id) AS rn FROM h)
        |SELECT hour_start, user_id, total, rn FROM r WHERE rn <= 3""".stripMargin,
    "q31_cube_revenue" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS rev,
        | count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q32_ntile_percent_rank" ->
      """SELECT c_custkey, c_mktsegment,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | round(percent_rank() OVER w, 6) AS pr
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,
    "q33_trailing_revenue" ->
      """SELECT o_orderkey, round(sum(o_totalprice) OVER (
        |  PARTITION BY o_custkey
        |  ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rev_30d
        |FROM orders""".stripMargin,
    "q34_status_listagg" ->
      """SELECT o_custkey, string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q35_big_spenders" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal, round(t.total, 2) AS total
        |FROM customer JOIN (SELECT o_custkey, sum(o_totalprice) AS total
        |  FROM orders GROUP BY o_custkey) t ON t.o_custkey = c_custkey
        |WHERE t.total > 10 * c_acctbal""".stripMargin,
    "q36_weighted_avg_discount" ->
      """SELECT l_returnflag,
        | round(sum(l_discount * l_extendedprice) / sum(l_extendedprice), 6) AS wavg_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q37_price_quantity_corr" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q38_decayed_sum" ->
      """WITH t AS (SELECT user_id, value, epoch_us(ts) AS tsu,
        |  max(epoch_us(ts)) OVER (PARTITION BY user_id) AS mx FROM events)
        |SELECT user_id,
        | round(sum(value * exp(-CAST(mx - tsu AS DOUBLE) / 604800000000.0)), 4) AS decayed
        |FROM t GROUP BY user_id""".stripMargin,
    "q39_event_pattern" ->
      """SELECT user_id,
        | string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id) AS seq,
        | regexp_matches(string_agg(substr(event_type, 1, 1), ''
        |   ORDER BY epoch_us(ts), event_id), 's[vc]*p') AS has_funnel
        |FROM events GROUP BY user_id""".stripMargin,
    "q40_asof_state" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu FROM events),
        |v AS (SELECT user_id, event_type, value, tsu AS valid_from_us,
        |  lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS valid_to_us FROM e),
        |t AS (SELECT (min(tsu) + max(tsu)) // 2 AS as_of_us FROM e)
        |SELECT user_id, event_type, round(value, 2) AS value, valid_from_us, valid_to_us, as_of_us
        |FROM v, t
        |WHERE valid_from_us <= as_of_us AND (valid_to_us IS NULL OR valid_to_us > as_of_us)""".stripMargin,
    "q41_multiset_ops" ->
      """SELECT pk FROM (
        | SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'R'
        | INTERSECT ALL
        | SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'A') t
        |EXCEPT ALL
        |SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'N'""".stripMargin,
    "t05_unigram_logprob" ->
      """WITH dw AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |f AS (SELECT w, count(*) AS wc FROM dw GROUP BY w),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM dw)
        |SELECT dw.doc_id, round(avg(log10(f.wc / t.total)), 4) AS avg_logprob,
        | count(*) AS n_words
        |FROM dw JOIN f ON dw.w = f.w CROSS JOIN t
        |GROUP BY dw.doc_id""".stripMargin,
    // the df <= 100 boilerplate cap is PART of the operator's semantic
    // (grams above it are treated as non-discriminative), so the oracle
    // replays it — the r10 sf1 run caught the unreplayed cap: at 10× the
    // same grams cross the threshold and the exact pair set diverges
    "d02_dedup_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
        |    i -> array_to_string(words[i:i+2], ' '))) AS g FROM w) t),
        |gdf AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
        |shr AS (SELECT sh.doc_id, sh.g FROM sh JOIN gdf USING (g) WHERE gdf.df <= 100),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM shr x JOIN shr y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT ov.doc_a, ov.doc_b,
        | round(CAST(common AS DOUBLE) / (a.n + b.n - common), 4) AS jaccard
        |FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b
        |WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5""".stripMargin,
    // d03's oracle is the EXACT J>=0.5 pair set: 16x2 banding (r10; the
    // sf1 run showed 8 bands miss J~0.67 short-doc pairs) has miss
    // probability (1-J^2)^16 <= 7e-5 at the lowest J any probed corpus
    // produces — and the minhash seeds are fixed, so the output is
    // deterministic and verified equal before wiring this oracle.
    "d03_dedup_minhash_lsh" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT ov.doc_a, ov.doc_b,
        | round(CAST(common AS DOUBLE) / (a.n + b.n - common), 4) AS jaccard
        |FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b
        |WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5""".stripMargin,
    // d06's oracle reuses d03's exact pair set (proven equal to the LSH
    // output on this corpus — see the d03 comment) and computes TRUE
    // connected-component min labels via a recursive CTE (reachability
    // closure, then min per doc) — a fixpoint, matching the Spark side's
    // run-to-fixpoint label propagation independent of round counts.
    "d06_dedup_clusters" ->
      """WITH RECURSIVE w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT ov.doc_a, ov.doc_b
        |  FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b
        |  WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5),
        |e AS (SELECT doc_a, doc_b FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc_id, label) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM e
        |  UNION
        |  SELECT e.doc_a, r.label FROM e JOIN reach r ON r.doc_id = e.doc_b)
        |SELECT doc_id, min(label) AS cluster, doc_id = min(label) AS is_keeper
        |FROM reach GROUP BY doc_id""".stripMargin,
    // d13's oracle re-derives the exact d06 clusters (5-word-shingle
    // Jaccard >= 0.5 pairs -> recursive-CTE connected components), then
    // applies the keep rule: max n_chars, ties to the lowest doc_id
    "d13_canonical_selection" ->
      """WITH RECURSIVE w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT ov.doc_a, ov.doc_b
        |  FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b
        |  WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5),
        |e AS (SELECT doc_a, doc_b FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc_id, label) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM e
        |  UNION
        |  SELECT e.doc_a, r.label FROM e JOIN reach r ON r.doc_id = e.doc_b),
        |lab AS (SELECT doc_id, min(label) AS cluster FROM reach GROUP BY doc_id),
        |sized AS (SELECT lab.cluster, lab.doc_id, d.n_chars
        |  FROM lab JOIN documents d USING (doc_id)),
        |st AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars FROM sized GROUP BY 1)
        |SELECT st.cluster, min(s.doc_id) AS keeper, st.n_docs, st.max_chars
        |FROM st JOIN sized s ON s.cluster = st.cluster AND s.n_chars = st.max_chars
        |GROUP BY 1, 3, 4""".stripMargin,
    // d14's oracle re-derives the exact verified J >= 0.5 pair set and
    // counts pairs per unordered source pair
    "d14_cross_source_leakage" ->
      """WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT ov.doc_a, ov.doc_b
        |  FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b
        |  WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5)
        |SELECT least(wa.source, wb.source) AS source_a,
        |  greatest(wa.source, wb.source) AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM pairs
        |JOIN w wa ON wa.doc_id = pairs.doc_a
        |JOIN w wb ON wb.doc_id = pairs.doc_b
        |GROUP BY 1, 2""".stripMargin,
    // d15: coverage verified by an INDEPENDENT formulation — the oracle
    // counts DISTINCT covered token positions (window start + offset)
    // where the Spark side folds sorted intervals; same exact integer.
    "d15_substring_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |win AS (SELECT doc_id, i - 1 AS pos, array_to_string(words[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS i FROM w) t),
        |dg AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd FROM win GROUP BY g) x
        |  WHERE nd >= 2),
        |dw AS (SELECT win.doc_id, win.pos FROM win JOIN dg USING (g)),
        |cov AS (SELECT doc_id, count(*) AS dup_tokens FROM (
        |  SELECT DISTINCT dw.doc_id, dw.pos + k.k AS p
        |  FROM dw CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k) u GROUP BY doc_id),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows FROM dw GROUP BY doc_id),
        |sz AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens FROM w)
        |SELECT agg.doc_id, sz.n_tokens, agg.n_dup_windows,
        |  CAST(cov.dup_tokens AS BIGINT) AS dup_tokens,
        |  CAST(cov.dup_tokens AS DOUBLE) / CAST(sz.n_tokens AS DOUBLE) AS dup_frac
        |FROM agg JOIN cov USING (doc_id) JOIN sz USING (doc_id)""".stripMargin,
    // q112: the oracle replays the WHOLE composition — d16's rewrite
    // chain, t13's gate, q104's recursive-CTE clusters — and applies
    // the same md5 split/shard rules; one statement, every stage
    // independently stated.
    "q112_clean_corpus" ->
      """WITH RECURSIVE w AS (SELECT doc_id, text,
        |    regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
        |win AS (SELECT doc_id, i - 1 AS pos, array_to_string(words[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS i FROM w) t),
        |own AS (SELECT g, min(doc_id) AS owner FROM win GROUP BY g
        |  HAVING count(DISTINCT doc_id) >= 2),
        |rem AS (SELECT win.doc_id, win.pos FROM win JOIN own USING (g)
        |  WHERE win.doc_id <> own.owner),
        |cov AS (SELECT DISTINCT rem.doc_id, rem.pos + k.k AS p
        |  FROM rem CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k),
        |tok AS (SELECT doc_id, i - 1 AS p, words[i] AS tk
        |  FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM w) t),
        |kept AS (SELECT t.doc_id, t.p, t.tk FROM tok t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p WHERE c.p IS NULL),
        |rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
        |  string_agg(tk, ' ' ORDER BY p) AS clean_text FROM kept GROUP BY doc_id),
        |rw AS (SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(rb.kept_tokens, 0) AS BIGINT) AS kept_tokens,
        |  coalesce(rb.clean_text, '') AS clean_text
        |  FROM w LEFT JOIN rb ON w.doc_id = rb.doc_id),
        |gm AS (SELECT doc_id,
        |  len(words) AS n_words,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(words) AS mean_len,
        |  CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE) / len(words) AS sym_r,
        |  CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |    / len(words) AS alpha_f,
        |  len(list_filter(words, x ->
        |    regexp_matches(x, '^(the|be|to|of|and|that|have|with)$'))) AS n_stop
        |  FROM w),
        |gate AS (SELECT doc_id FROM gm WHERE n_words >= 50 AND n_words <= 100000
        |  AND mean_len >= 3.0 AND mean_len <= 10.0 AND sym_r <= 0.1
        |  AND alpha_f >= 0.8 AND n_stop >= 2),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |nsz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT ov.doc_a, ov.doc_b
        |  FROM ov JOIN nsz a ON a.doc_id = ov.doc_a JOIN nsz b ON b.doc_id = ov.doc_b
        |  WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5),
        |e AS (SELECT doc_a, doc_b FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc_id, label) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM e
        |  UNION
        |  SELECT e.doc_a, r.label FROM e JOIN reach r ON r.doc_id = e.doc_b),
        |cl AS (SELECT doc_id, min(label) AS cluster FROM reach GROUP BY doc_id)
        |SELECT rw.doc_id,
        |  CASE WHEN substr(md5(CAST(coalesce(cl.cluster, rw.doc_id) AS VARCHAR)), 1, 4) < 'e666'
        |       THEN 'train' ELSE 'eval' END AS split,
        |  CAST((strpos('0123456789abcdef', substr(md5(CAST(rw.doc_id AS VARCHAR)), 1, 1)) - 1) % 8
        |    AS BIGINT) AS shard,
        |  rw.kept_tokens, rw.clean_text
        |FROM rw JOIN gate USING (doc_id) LEFT JOIN cl ON rw.doc_id = cl.doc_id
        |WHERE (rw.n_tokens - rw.kept_tokens) * 2 < rw.n_tokens""".stripMargin,
    // d18: the oracle never sees the PNG bytes — it replays the
    // closed-form cell-gray layout (the m01 discipline), derives the
    // same four 16-bit dHash chunks, and does the BRUTE-FORCE all-pairs
    // hamming scan: the compare proves both the encode→decode→hash path
    // (one corrupted pixel flips a chunk) and that the banded bucketing
    // is COMPLETE (finds every pair brute force finds).
    "d18_image_dedup" ->
      """WITH par AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id % 50 = 1 THEN doc_id - 1 ELSE doc_id END AS base,
        |    CASE WHEN doc_id % 50 = 1 THEN 1 ELSE 0 END AS pert,
        |    doc_id % 9 AS c0, doc_id % 8 AS r0
        |  FROM documents),
        |cells AS (
        |  SELECT p.id, cc.c, rr.r,
        |    (((((p.base * 1103515245 + 12345) % 2147483647) + cc.c * 8 + rr.r + 17)
        |        * (((p.base * 1103515245 + 12345) % 2147483647) + cc.c * 8 + rr.r + 17)
        |        % 2147483647 % 251)
        |      + CASE WHEN p.pert = 1 AND cc.c = p.c0 AND rr.r = p.r0
        |             THEN 100 ELSE 0 END) % 251 AS g
        |  FROM par p,
        |    (SELECT unnest(range(9)) AS c) cc,
        |    (SELECT unnest(range(8)) AS r) rr),
        |bits AS (
        |  SELECT a.id, a.r, a.c,
        |    CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b ON a.id = b.id AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c < 8),
        |chunks AS (
        |  SELECT id, r // 2 AS k,
        |    CAST(sum(bit * (1 << ((r % 2) * 8 + c))) AS BIGINT) AS cv
        |  FROM bits GROUP BY 1, 2),
        |hashes AS (
        |  SELECT id,
        |    max(CASE WHEN k = 0 THEN cv END) AS h0,
        |    max(CASE WHEN k = 1 THEN cv END) AS h1,
        |    max(CASE WHEN k = 2 THEN cv END) AS h2,
        |    max(CASE WHEN k = 3 THEN cv END) AS h3
        |  FROM chunks GROUP BY id)
        |SELECT a.id AS doc_a, b.id AS doc_b,
        |  CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |     + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) AS BIGINT)
        |    AS hamming
        |FROM hashes a JOIN hashes b ON a.id < b.id
        |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3""".stripMargin,
    // t27: the d02 3-gram construction, scored per DOC against the
    // corpus gram-df table (novelty = df-1 share, integer permille).
    "t27_gram_novelty" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
        |    i -> array_to_string(words[i:i+2], ' '))) AS g FROM w) t),
        |gdf AS (SELECT g, count(*) AS df FROM sh GROUP BY g)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
        |    AS novelty_permille
        |FROM sh JOIN gdf USING (g) GROUP BY doc_id""".stripMargin,
    // t28: the t03/t12 regex token classes, folded per language;
    // chars_per_token in exact e4 (nonneg DIV).
    "t28_token_fertility" ->
      """WITH d AS (SELECT lang,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS toks,
        |    length(regexp_replace(text, '\s', '', 'g')) AS chars
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(chars) AS BIGINT) AS n_chars,
        |  CAST(sum(chars) * 10000 // sum(toks) AS BIGINT) AS chars_per_token_e4
        |FROM d GROUP BY lang""".stripMargin,
    // q143: positional phrase adjacency replayed on the oracle side via
    // positional bigram/trigram list_filter — same whitespace split.
    "q143_phrase_match" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |h2 AS (SELECT doc_id, len(list_filter(range(1, len(words)),
        |    i -> words[i] = 'spark' AND words[i+1] = 'stream')) AS n_hits FROM w),
        |h3 AS (SELECT doc_id, len(list_filter(range(1, len(words) - 1),
        |    i -> words[i] = 'the' AND words[i+1] = 'fast' AND words[i+2] = 'key')) AS n_hits FROM w)
        |SELECT 'spark stream' AS phrase, doc_id, CAST(n_hits AS BIGINT) AS n_hits
        |FROM h2 WHERE n_hits > 0
        |UNION ALL
        |SELECT 'the fast key' AS phrase, doc_id, CAST(n_hits AS BIGINT) AS n_hits
        |FROM h3 WHERE n_hits > 0""".stripMargin,
    // q144: the Morton interleave is replayed bit-by-bit. Both dims are
    // clamped nonnegative on BOTH sides (pmod-equivalent for a, floor
    // clamp for b) so negative user values can't diverge Spark's
    // truncating DIV from DuckDB's flooring // before the bit packing.
    "q144_zorder_layout" ->
      """WITH e AS (SELECT ((user_id % 256) + 256) % 256 AS a,
        |    least(greatest(CAST(round(value * 10000) AS BIGINT) // 400, 0), 255) AS b
        |  FROM events),
        |z AS (SELECT a, b,
        |  list_aggregate(list_transform(range(8), i ->
        |    ((a >> i) & 1) * (1 << (2 * i)) + ((b >> i) & 1) * (1 << (2 * i + 1))),
        |    'sum') AS zc
        |  FROM e)
        |SELECT CAST(zc // 64 AS BIGINT) AS zbucket, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
        |  CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max,
        |  CAST((max(a) - min(a) + 1) * (max(b) - min(b) + 1) AS BIGINT) AS span_area
        |FROM z GROUP BY 1""".stripMargin,
    // q149: the oracle states the 2-D skyline as the textbook single
    // sorted sweep (two RANGE windows) — the compare proves the banded
    // decomposition equals the global sort.
    "q149_skyline_parts" ->
      """WITH p AS (SELECT p_partkey,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |    CAST(p_size AS BIGINT) AS size FROM part),
        |m AS (SELECT p_partkey, price_c, size,
        |    max(size) OVER (ORDER BY price_c
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
        |    max(size) OVER (ORDER BY price_c
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m2
        |  FROM p)
        |SELECT p_partkey AS partkey, price_c, size FROM m
        |WHERE NOT (coalesce(m1, -1) >= size OR m2 > size)""".stripMargin,
    // q150: lower weighted median as the textbook per-group cumulative
    // window — the compare proves the banded carry equals it.
    "q150_weighted_median" ->
      """WITH v AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT flag, CAST(sum(w) AS BIGINT) AS tw,
        |    CAST(count(*) AS BIGINT) AS n_values FROM v GROUP BY 1),
        |c AS (SELECT flag, price_c,
        |    sum(w) OVER (PARTITION BY flag ORDER BY price_c) AS cum FROM v)
        |SELECT t.flag, CAST(min(c.price_c) AS BIGINT) AS wmedian_price_c,
        |  t.tw AS total_weight, t.n_values
        |FROM c JOIN t USING (flag) WHERE c.cum * 2 >= t.tw
        |GROUP BY t.flag, t.tw, t.n_values""".stripMargin,
    // q145: the closed rank form in HUGEINT (Spark DECIMAL(38,0)); the
    // numerator is nonnegative by Chebyshev, so // ≡ DIV.
    "q145_gini_concentration" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x2
        |  FROM orders GROUP BY 1),
        |rk AS (SELECT c.c_nationkey AS nationkey, s.x2,
        |    row_number() OVER (PARTITION BY c.c_nationkey ORDER BY s.x2, s.o_custkey) AS rk
        |  FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey),
        |agg AS (SELECT nationkey, count(*) AS n_customers,
        |    CAST(sum(x2) AS BIGINT) AS total_spend_e2,
        |    sum(CAST(rk AS HUGEINT) * x2) AS rx
        |  FROM rk GROUP BY 1)
        |SELECT nationkey, CAST(n_customers AS BIGINT) AS n_customers, total_spend_e2,
        |  CAST((2 * rx - (n_customers + 1) * CAST(total_spend_e2 AS HUGEINT)) * 1000000
        |    // (CAST(n_customers AS HUGEINT) * total_spend_e2) AS BIGINT) AS gini_e6
        |FROM agg""".stripMargin,
    // q146: word-fold replay — 63-bit words (1 << 63 is the ANSI sign
    // trap), bit_or per value, AND+popcount in word space.
    "q146_bitmap_intersect" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderpriority AS pr, o_orderstatus AS st,
        |    o_orderkey // 63 AS w, (CAST(1 AS BIGINT) << CAST(o_orderkey % 63 AS INTEGER)) AS bit
        |  FROM orders),
        |p AS (SELECT pr, w, bit_or(bit) AS pbits FROM o GROUP BY 1, 2),
        |s AS (SELECT st, w, bit_or(bit) AS sbits FROM o GROUP BY 1, 2),
        |bc AS (SELECT pr, st, CAST(sum(bit_count(pbits & sbits)) AS BIGINT) AS n_bitmap
        |  FROM p JOIN s USING (w) GROUP BY 1, 2),
        |ex AS (SELECT pr, st, count(*) AS n_exact FROM o GROUP BY 1, 2)
        |SELECT coalesce(bc.pr, ex.pr) AS priority, coalesce(bc.st, ex.st) AS status,
        |  CAST(coalesce(n_bitmap, 0) AS BIGINT) AS n_bitmap,
        |  CAST(coalesce(n_exact, 0) AS BIGINT) AS n_exact
        |FROM bc FULL JOIN ex ON bc.pr = ex.pr AND bc.st = ex.st""".stripMargin,
    // q147: the q146 word-fold over the LIVE feed's final corpus in
    // closed form (deletes filtered, the mod-13 priority moves applied)
    // — the Spark side reaches this state only through incremental
    // bitmap updateBatch folds; hash equality proves live ≡ rebuild.
    "q147_bitmap_live" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 13 = 5 THEN '5-LOW' ELSE o_orderpriority END AS pr,
        |    o_orderstatus AS st,
        |    o_orderkey // 63 AS w,
        |    (CAST(1 AS BIGINT) << CAST(o_orderkey % 63 AS INTEGER)) AS bit
        |  FROM orders WHERE o_orderkey % 17 <> 3),
        |p AS (SELECT pr, w, bit_or(bit) AS pbits FROM o GROUP BY 1, 2),
        |s AS (SELECT st, w, bit_or(bit) AS sbits FROM o GROUP BY 1, 2)
        |SELECT pr AS priority, st AS status,
        |  CAST(sum(bit_count(pbits & sbits)) AS BIGINT) AS n_bitmap
        |FROM p JOIN s USING (w) GROUP BY 1, 2
        |HAVING sum(bit_count(pbits & sbits)) > 0""".stripMargin,
    // q148: q143's phrase SQL over the live feed's closed-form final
    // corpus (deletes filtered, the mod-11 " spark stream" appends
    // applied) — the Spark side reaches this state only through
    // incremental posting updateBatch folds.
    "q148_phrase_live" ->
      """WITH d2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN text || ' spark stream' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 3),
        |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM d2),
        |h2 AS (SELECT doc_id, len(list_filter(range(1, len(words)),
        |    i -> words[i] = 'spark' AND words[i+1] = 'stream')) AS n_hits FROM w),
        |h3 AS (SELECT doc_id, len(list_filter(range(1, len(words) - 1),
        |    i -> words[i] = 'the' AND words[i+1] = 'fast' AND words[i+2] = 'key')) AS n_hits FROM w)
        |SELECT 'spark stream' AS phrase, doc_id, CAST(n_hits AS BIGINT) AS n_hits
        |FROM h2 WHERE n_hits > 0
        |UNION ALL
        |SELECT 'the fast key' AS phrase, doc_id, CAST(n_hits AS BIGINT) AS n_hits
        |FROM h3 WHERE n_hits > 0""".stripMargin,
    // d20: the oracle replays the per-frame cell arithmetic (never the
    // PNG bytes) and brute-forces all pairs — proves every frame's
    // encode→decode→hash round trip and the frame-chunk bucketing.
    "d20_video_dedup" ->
      """WITH par AS (
        |  SELECT doc_id AS id,
        |    (CASE WHEN doc_id % 50 = 1 THEN doc_id - 1 ELSE doc_id END
        |      * 1103515245 + 12345) % 2147483647 AS h,
        |    CASE WHEN doc_id % 50 = 1 THEN 1 ELSE 0 END AS pert,
        |    doc_id % 9 AS c0, doc_id % 8 AS r0, doc_id % 4 AS p0
        |  FROM documents),
        |cells AS (
        |  SELECT p.id, ff.f, cc.c, rr.r,
        |    ((((p.h + cc.c * 8 + rr.r + 17) * (p.h + cc.c * 8 + rr.r + 17)
        |        % 2147483647 % 251 + 13 * ff.f) % 251)
        |      + CASE WHEN p.pert = 1 AND ff.f = p.p0 AND cc.c = p.c0 AND rr.r = p.r0
        |             THEN 100 ELSE 0 END) % 251 AS g
        |  FROM par p, (SELECT unnest(range(4)) AS f) ff,
        |    (SELECT unnest(range(9)) AS c) cc, (SELECT unnest(range(8)) AS r) rr),
        |bits AS (
        |  SELECT a.id, a.f, a.r, a.c, CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b ON a.id = b.id AND a.f = b.f AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c < 8 AND a.r % 2 = 0),
        |chunks AS (
        |  SELECT id, f, CAST(sum(bit * (1 << ((r // 2) * 8 + c))) AS BIGINT) AS cv
        |  FROM bits GROUP BY 1, 2),
        |hashes AS (SELECT id,
        |    max(CASE WHEN f = 0 THEN cv END) AS h0,
        |    max(CASE WHEN f = 1 THEN cv END) AS h1,
        |    max(CASE WHEN f = 2 THEN cv END) AS h2,
        |    max(CASE WHEN f = 3 THEN cv END) AS h3
        |  FROM chunks GROUP BY id)
        |SELECT a.id AS doc_a, b.id AS doc_b,
        |  CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |     + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) AS BIGINT)
        |    AS hamming
        |FROM hashes a JOIN hashes b ON a.id < b.id
        |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3""".stripMargin,
    // d19: the oracle never sees the WAV bytes — it replays the tone
    // program arithmetically (energy = 64·amp, crossings = 63 // hp per
    // frame), derives the same 64 gradient bits / four 16-bit chunks,
    // and brute-forces all pairs: proves the encode→decode→frame path
    // AND the completeness of the chunk-bucket join.
    "d19_audio_dedup" ->
      """WITH par AS (
        |  SELECT doc_id AS id,
        |    (CASE WHEN doc_id % 50 = 1 THEN doc_id - 1 ELSE doc_id END
        |      * 1103515245 + 12345) % 2147483647 AS h,
        |    CASE WHEN doc_id % 50 = 1 THEN 1 ELSE 0 END AS pert,
        |    doc_id % 33 AS p0
        |  FROM documents),
        |fr AS (
        |  SELECT p.id, f.f,
        |    (1000 + (p.h + f.f * 31) * (p.h + f.f * 31) % 2147483647 % 17000
        |      + CASE WHEN p.pert = 1 AND f.f = p.p0 THEN 500 ELSE 0 END) * 64 AS energy,
        |    63 // (1 + (p.h + f.f * 7) % 8) AS zc
        |  FROM par p, (SELECT unnest(range(33)) AS f) f),
        |bits AS (
        |  SELECT a.id, a.f,
        |    CASE WHEN a.energy < b.energy THEN 1 ELSE 0 END AS ebit,
        |    CASE WHEN a.zc < b.zc THEN 1 ELSE 0 END AS zbit
        |  FROM fr a JOIN fr b ON a.id = b.id AND b.f = a.f + 1
        |  WHERE a.f < 32),
        |chunks AS (
        |  SELECT id,
        |    CAST(sum(CASE WHEN f < 16 THEN ebit * (1 << (f % 16)) ELSE 0 END) AS BIGINT) AS h0,
        |    CAST(sum(CASE WHEN f >= 16 THEN ebit * (1 << (f % 16)) ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(sum(CASE WHEN f < 16 THEN zbit * (1 << (f % 16)) ELSE 0 END) AS BIGINT) AS h2,
        |    CAST(sum(CASE WHEN f >= 16 THEN zbit * (1 << (f % 16)) ELSE 0 END) AS BIGINT) AS h3
        |  FROM bits GROUP BY id)
        |SELECT a.id AS doc_a, b.id AS doc_b,
        |  CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |     + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) AS BIGINT)
        |    AS hamming
        |FROM chunks a JOIN chunks b ON a.id < b.id
        |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3""".stripMargin,
    // d17: the sweep replays d02's overlap (rare-gram common counts,
    // full-set denominators) and fans each pair over the same literal
    // threshold list; empty thresholds report 0 through the left joins.
    "d17_threshold_sweep" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
        |    i -> array_to_string(words[i:i+2], ' '))) AS g FROM w) t),
        |gdf AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
        |shr AS (SELECT sh.doc_id, sh.g FROM sh JOIN gdf USING (g) WHERE gdf.df <= 100),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM shr x JOIN shr y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pj AS (SELECT ov.doc_a, ov.doc_b,
        |  CAST(common AS DOUBLE) / (a.n + b.n - common) AS j
        |  FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b),
        |th AS (SELECT unnest([30, 40, 50, 60, 70, 80, 90]) AS threshold_pct),
        |sw AS (SELECT th.threshold_pct, pj.doc_a, pj.doc_b
        |  FROM pj JOIN th ON pj.j * 100 >= th.threshold_pct),
        |np AS (SELECT threshold_pct, count(*) AS n_pairs FROM sw GROUP BY 1),
        |nd AS (SELECT threshold_pct, count(DISTINCT d) AS n_docs FROM (
        |  SELECT threshold_pct, doc_a AS d FROM sw
        |  UNION ALL SELECT threshold_pct, doc_b FROM sw) u GROUP BY 1)
        |SELECT CAST(th.threshold_pct AS BIGINT) AS threshold_pct,
        |  CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs
        |FROM th LEFT JOIN np USING (threshold_pct) LEFT JOIN nd USING (threshold_pct)""".stripMargin,
    // d16: the rewrite is cross-checked, not replayed — the oracle
    // rebuilds each cleaned text with string_agg(… ORDER BY p), an
    // independent ordered-concat, against Spark's sort+transform
    "d16_dedup_rewrite" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |win AS (SELECT doc_id, i - 1 AS pos, array_to_string(words[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS i FROM w) t),
        |own AS (SELECT g, min(doc_id) AS owner FROM win GROUP BY g
        |  HAVING count(DISTINCT doc_id) >= 2),
        |rem AS (SELECT win.doc_id, win.pos FROM win JOIN own USING (g)
        |  WHERE win.doc_id <> own.owner),
        |cov AS (SELECT DISTINCT rem.doc_id, rem.pos + k.k AS p
        |  FROM rem CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k),
        |tok AS (SELECT doc_id, i - 1 AS p, words[i] AS tk
        |  FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM w) t),
        |kept AS (SELECT t.doc_id, t.p, t.tk FROM tok t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p WHERE c.p IS NULL),
        |rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
        |  string_agg(tk, ' ' ORDER BY p) AS clean_text FROM kept GROUP BY doc_id),
        |sz AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens FROM w)
        |SELECT sz.doc_id, sz.n_tokens,
        |  CAST(coalesce(rb.kept_tokens, 0) AS BIGINT) AS kept_tokens,
        |  CAST(sz.n_tokens - coalesce(rb.kept_tokens, 0) AS BIGINT) AS removed_tokens,
        |  coalesce(rb.clean_text, '') AS clean_text
        |FROM sz LEFT JOIN rb USING (doc_id)""".stripMargin,
    "t14_length_histogram" ->
      """WITH t AS (SELECT lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT lang, least(n // 64, 15) AS band,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens
        |FROM t GROUP BY 1, 2""".stripMargin,
    // BM25 with k1=1.2 b=0.75 and the +1-smoothed IDF, replayed term for
    // term; the cut is deterministic (score DESC, doc_id)
    "t15_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok2
        |  WHERE tok IN ('spark', 'vector', 'stream') GROUP BY doc_id, tok),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
        |SELECT tf.doc_id,
        |  round(sum(ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
        |    * tf.tf * 2.2
        |    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (CAST(stats.tot_dl AS DOUBLE) / stats.n_docs)))), 4) AS bm25
        |FROM tf JOIN dl USING (doc_id) JOIN dft USING (tok) CROSS JOIN stats
        |GROUP BY tf.doc_id
        |ORDER BY bm25 DESC, tf.doc_id LIMIT 10""".stripMargin,
    "t16_lexical_diversity" ->
      """WITH tok2 AS (
        |  SELECT source, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, count(*) AS cnt FROM tok2 WHERE tok <> '' GROUP BY source, tok)
        |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  round(count(*) / CAST(sum(cnt) AS DOUBLE), 6) AS ttr
        |FROM c GROUP BY source""".stripMargin,
    // t17: KL(source ‖ corpus) in the same exact-integer micro-nat
    // discipline as q91 — the per-term log-ratio rounds ONCE to BIGINT,
    // the reported figure is the integer Σ n_st·k, so the compare never
    // races a float sum
    "t17_source_divergence" ->
      """WITH tb AS (
        |  SELECT source, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, count(*) AS n_st FROM tb WHERE tok <> '' GROUP BY source, tok),
        |stot AS (SELECT source, sum(n_st) AS n_s FROM st GROUP BY source),
        |ttot AS (SELECT tok, sum(n_st) AS n_t FROM st GROUP BY tok),
        |ctot AS (SELECT sum(n_t) AS n FROM ttot)
        |SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_st * CAST(round(1000000.0 *
        |    ln((CAST(n_st AS DOUBLE) * CAST(n AS DOUBLE))
        |       / (CAST(n_s AS DOUBLE) * CAST(n_t AS DOUBLE)))) AS BIGINT)) AS BIGINT)
        |    AS kl_unats_scaled
        |FROM st JOIN ttot USING (tok) JOIN stot USING (source) CROSS JOIN ctot
        |GROUP BY source""".stripMargin,
    // t18: vocabulary growth — exact integers; the band formula is pure
    // integer arithmetic in both engines (DIV vs //)
    "t18_vocab_growth" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        |db AS (SELECT least(doc_id * 10 // (mx + 1), 9) AS band, count(*) AS n_docs
        |  FROM documents CROSS JOIN mx GROUP BY 1),
        |tb AS (SELECT least(doc_id * 10 // (mx + 1), 9) AS band, count(*) AS n_tokens
        |  FROM tk CROSS JOIN mx GROUP BY 1),
        |ty AS (SELECT least(fd * 10 // (mx + 1), 9) AS band, count(*) AS new_types
        |  FROM (SELECT tok, min(doc_id) AS fd FROM tk GROUP BY tok) f CROSS JOIN mx GROUP BY 1)
        |SELECT CAST(band AS BIGINT) AS band,
        |  CAST(sum(coalesce(n_docs, 0)) OVER (ORDER BY band) AS BIGINT) AS docs_cum,
        |  CAST(sum(coalesce(n_tokens, 0)) OVER (ORDER BY band) AS BIGINT) AS tokens_cum,
        |  CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY band) AS BIGINT) AS types_cum
        |FROM db FULL OUTER JOIN tb USING (band) FULL OUTER JOIN ty USING (band)""".stripMargin,
    // q91: DSIR importance weights replayed bucket for bucket — md5-hex
    // 256-bucket hashed unigrams, +0.5-smoothed LMs, per-bucket log-ratio
    // rounded ONCE to integer micro-nats so the per-doc score is an
    // order-independent integer sum; cut is (score DESC, doc_id)
    "q91_dsir_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, source, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |tb AS (SELECT doc_id, source,
        |  CAST(('0x' || substr(md5(tok), 1, 2))::UBIGINT AS INTEGER) AS b
        |  FROM toks WHERE tok <> ''),
        |braw AS (SELECT b, count(*) AS n_raw FROM tb GROUP BY b),
        |btgt AS (SELECT b, count(*) AS n_tgt FROM tb WHERE source = 'src0' GROUP BY b),
        |tot AS (SELECT count(*) AS raw_total,
        |  sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tgt_total FROM tb),
        |kt AS (SELECT braw.b,
        |  CAST(round(1000000.0 * (ln((coalesce(n_tgt, 0) + 0.5) / (tgt_total + 128.0))
        |                        - ln((n_raw + 0.5) / (raw_total + 128.0)))) AS BIGINT) AS k_unats
        |  FROM braw LEFT JOIN btgt USING (b) CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(k_unats) AS BIGINT) AS score_unats
        |FROM tb JOIN kt USING (b) WHERE source <> 'src0'
        |GROUP BY doc_id
        |ORDER BY score_unats DESC, doc_id LIMIT 100""".stripMargin,
    // q92: this DuckDB build has no GROUPS frames ("not implemented
    // yet"), so the oracle replays the STANDARD's GROUPS definition —
    // dense_rank assigns peer-group ordinals, RANGE over the ordinal is
    // the GROUPS frame, 2 PRECEDING..1 PRECEDING is EXCLUDE GROUP —
    // i.e. the same identity the Spark side is built on, evaluated by
    // an independent engine.
    "q92_groups_frame" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    dense_rank() OVER (PARTITION BY o_custkey
        |      ORDER BY (year(o_orderdate)*12 + month(o_orderdate))) AS grp
        |  FROM orders)
        |SELECT o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY grp
        |   RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rev_3grp,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY grp
        |   RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING), 2) AS rev_prior2
        |FROM r""".stripMargin,
    "q93_regr_linefit" ->
      """SELECT l_returnflag,
        | round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // t19: the injected contact strings are keyed on doc_id with moduli
    // coprime to the corpus's 20-way source striping; patterns stay in
    // the lookaround-free Java-regex ∩ RE2 subset so both engines match
    // identical spans.
    "t19_pii_scan" ->
      """WITH t AS (
        |  SELECT source,
        |    text
        |      || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        |      || CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |      || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE '' END AS txt
        |  FROM documents),
        |c AS (
        |  SELECT source,
        |    len(regexp_extract_all(txt, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS em,
        |    len(regexp_extract_all(txt, '\+1-[0-9]{3}-[0-9]{4}')) AS ph,
        |    len(regexp_extract_all(txt, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS ipc,
        |    length(regexp_replace(regexp_replace(regexp_replace(txt,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |      '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS redlen
        |  FROM t)
        |SELECT source, count(*) AS n_docs, CAST(sum(em) AS BIGINT) AS n_emails,
        |  CAST(sum(ph) AS BIGINT) AS n_phones, CAST(sum(ipc) AS BIGINT) AS n_ips,
        |  CAST(sum(CASE WHEN em+ph+ipc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
        |  CAST(sum(redlen) AS BIGINT) AS redacted_chars
        |FROM c GROUP BY source""".stripMargin,
    // q94: r = floor(sqrt(tok)*1e6) is identical on both engines (IEEE
    // sqrt is correctly rounded; same double in, same double out); all
    // arithmetic after it is exact integer DIV — no float crosses rows.
    "q94_mixture_weights" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tok
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, tok, CAST(floor(sqrt(tok) * 1000000) AS BIGINT) AS r FROM per),
        |tot AS (SELECT CAST(sum(tok) AS HUGEINT) AS total_tok,
        |               CAST(sum(r) AS HUGEINT) AS total_r FROM r)
        |SELECT source, tok AS tokens,
        |  CAST(tok::HUGEINT * 1000000 // total_tok AS BIGINT) AS share_ppm,
        |  CAST(r::HUGEINT * 1000000 // total_r AS BIGINT) AS weight_ppm,
        |  CAST((r::HUGEINT * 1000000 // total_r) * total_tok // tok AS BIGINT) AS epochs_ppm
        |FROM r, tot""".stripMargin,
    // q95: DuckDB evaluates the EXCLUDE clauses NATIVELY (its window
    // grammar has them; Spark's lacks them), so the oracle checks the
    // composed-from-plain-windows Spark build against an independent
    // first-class implementation. Money rides exact integer cents, the
    // RANGE+EXCLUDE GROUP column is tie-insensitive, and the ROWS frame
    // is ordered by (day, o_orderkey) — fully deterministic.
    "q95_exclude_frame" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS BIGINT)
        |    AS cents_30d_other_days,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW)
        |    AS n_neighbors
        |FROM o""".stripMargin,
    // q96: the oracle IS the textbook single-sort sweep (running sum
    // over one global ORDER BY t) — the Spark side decomposes the same
    // prefix sum into hour bands + broadcast band-total carry, so the
    // compare proves the banded decomposition equals the global sort.
    "q96_peak_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events),
        |m AS (SELECT user_id, tsu, event_id,
        |  CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) IS NULL
        |         OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new FROM e),
        |s AS (SELECT user_id, tsu,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM m),
        |sess AS (SELECT user_id, session_id, min(tsu) AS st, max(tsu) AS en
        |         FROM s GROUP BY 1, 2),
        |d AS (SELECT st AS t, 1 AS dd FROM sess
        |      UNION ALL SELECT en + 1 AS t, -1 AS dd FROM sess),
        |net AS (SELECT t, CAST(sum(dd) AS BIGINT) AS net FROM d GROUP BY t),
        |run AS (SELECT t, net,
        |  CAST(sum(net) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc FROM net)
        |SELECT (t // 3600000000) * 3600000000 AS hour_us,
        |  greatest(min_by(conc - net, t), max(conc)) AS peak_concurrent,
        |  count(*) AS n_deltas
        |FROM run GROUP BY 1""".stripMargin,
    // q97: DuckDB's correlated-scalar form of q26's as-of match, with
    // the 90-day tolerance as the same post-predicate the Spark side
    // applies to the carried (key, time) pair; lag_days is exact
    // integer microsecond division on both engines.
    "q97_asof_tolerance" ->
      """WITH m AS (
        |  SELECT e.event_id, epoch_us(e.ts) AS t,
        |    (SELECT max(epoch_us(o2.o_orderdate)) FROM orders o2
        |      WHERE o2.o_custkey = e.user_id
        |        AND epoch_us(o2.o_orderdate) <= epoch_us(e.ts)) AS a_t,
        |    (SELECT max(o.o_orderkey) FROM orders o
        |      WHERE o.o_custkey = e.user_id
        |        AND epoch_us(o.o_orderdate) = (SELECT max(epoch_us(o2.o_orderdate))
        |          FROM orders o2 WHERE o2.o_custkey = e.user_id
        |            AND epoch_us(o2.o_orderdate) <= epoch_us(e.ts))) AS a_key
        |  FROM events e WHERE e.event_type = 'purchase')
        |SELECT event_id,
        |  CASE WHEN a_t IS NOT NULL AND t - a_t <= 7776000000000 THEN a_key END
        |    AS asof_orderkey,
        |  CASE WHEN a_t IS NOT NULL AND t - a_t <= 7776000000000
        |       THEN (t - a_t) // 86400000000 END AS lag_days
        |FROM m""".stripMargin,
    // q98: the oracle replays q25's session derivation then takes the
    // same two in-session windows (full-partition first_value, strict-
    // prefix last non-purchase); the (first, last) aggregate is a tiny
    // exact count on both engines.
    "q98_session_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type FROM events),
        |m AS (SELECT user_id, tsu, event_id, event_type,
        |  CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) IS NULL
        |         OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new FROM e),
        |s AS (SELECT user_id, tsu, event_id, event_type,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM m),
        |t AS (SELECT event_type,
        |  first_value(event_type) OVER (PARTITION BY user_id, session_id
        |    ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id, session_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |  FROM s)
        |SELECT first_touch, last_touch, count(*) AS n_purchases
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY first_touch, last_touch""".stripMargin,
    // q100: the Q8-shape join expressed flat; volume in exact integer
    // 1e-4 money units (the q62 rule), share in integer ppm via
    // HUGEINT // (the q94 pairing for Spark's DECIMAL(38) DIV).
    "q100_market_share" ->
      """SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_6' THEN v.vol_e4 ELSE 0 END) AS BIGINT)
        |    AS nation_vol_e4,
        |  CAST(sum(v.vol_e4) AS BIGINT) AS total_vol_e4,
        |  CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_6' THEN v.vol_e4 ELSE 0 END) AS HUGEINT)
        |    * 1000000 // CAST(sum(v.vol_e4) AS HUGEINT) AS BIGINT) AS mkt_share_ppm
        |FROM (SELECT l_orderkey, l_partkey, l_suppkey,
        |        CAST(round(l_extendedprice * 100) AS BIGINT)
        |          * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol_e4
        |      FROM lineitem) v
        |JOIN part p ON v.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        |JOIN orders o ON v.l_orderkey = o.o_orderkey
        |  AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
        |JOIN supplier s ON v.l_suppkey = s.s_suppkey
        |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |GROUP BY 1""".stripMargin,
    // q101: four independent violation counts assembled into one row;
    // each count is an anti-join/aggregate both engines express
    // directly.
    "q101_integrity_audit" ->
      """SELECT
        |  (SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS orphan_lineitems,
        |  (SELECT count(*) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        |    AS childless_orders,
        |  (SELECT count(*) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |    AS orders_bad_custkey,
        |  (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) FROM
        |    (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
        |    AS dup_orderkey_rows""".stripMargin,
    // q102: the oracle states overlap as the direct inequality join —
    // the compare proves the within-key enumeration equals it.
    "q102_order_overlap" ->
      """WITH spans AS (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_us(o_orderdate) AS open_us,
        |    (SELECT max(epoch_us(l_shipdate)) FROM lineitem l
        |      WHERE l.l_orderkey = o.o_orderkey) AS close_us
        |  FROM orders o
        |  WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        |SELECT a.o_custkey,
        |  count(*) AS n_overlap_pairs,
        |  max(least(a.close_us, b.close_us) - greatest(a.open_us, b.open_us))
        |    AS max_overlap_us
        |FROM spans a JOIN spans b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        | AND a.open_us <= b.close_us AND b.open_us <= a.close_us
        |GROUP BY 1""".stripMargin,
    // q103: q86's shard rule restated as one window, then the t17-class
    // per-row-rounded micro-nat fold — n_s·H needs no float division.
    "q103_shard_entropy" ->
      """WITH s AS (SELECT doc_id, source,
        |    (row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 8 AS shard
        |  FROM documents),
        |c AS (SELECT shard, source, count(*) AS n_ss FROM s GROUP BY 1, 2),
        |t AS (SELECT shard, sum(n_ss) AS n_s FROM c GROUP BY 1)
        |SELECT c.shard, CAST(max(t.n_s) AS BIGINT) AS n_docs,
        |  CAST(sum(n_ss * CAST(round(1e6 * ln(CAST(t.n_s AS DOUBLE) / n_ss)) AS BIGINT))
        |    AS BIGINT) AS entropy_unats_scaled
        |FROM c JOIN t ON c.shard = t.shard
        |GROUP BY 1""".stripMargin,
    // q99: the oracle is the textbook global window (running max over
    // one ORDER BY event_id) — the compare proves the capped-band
    // decomposition equals it; percentiles via the q20 pairing
    // (percentile ↔ quantile_cont, rounded at 4 on integer operands).
    "q99_lateness_profile" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS tsu,
        |  (event_id // 10) * 10 + (9 - event_id % 10) AS arr FROM events),
        |l AS (SELECT event_type,
        |  greatest(0, coalesce(max(tsu) OVER (ORDER BY arr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), tsu) - tsu) AS late_us
        |  FROM e)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  round(quantile_cont(late_us, 0.5), 4) AS p50_late_us,
        |  round(quantile_cont(late_us, 0.95), 4) AS p95_late_us,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us
        |FROM l GROUP BY event_type""".stripMargin,
    // t20: words/sentences/syllables all count via the same regex
    // primitives on both engines; the Flesch figure is integer
    // micro-unit arithmetic on the aggregate sums (two integer DIVs),
    // so no float crosses the hash boundary.
    "t20_readability" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w,
        |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS words,
        |  CAST(sum(s) AS BIGINT) AS sentences,
        |  CAST(sum(y) AS BIGINT) AS syllables,
        |  CAST(206835000 - (1015 * (sum(w) * 1000000 // sum(s))) // 1000
        |    - (84600 * (sum(y) * 1000000 // sum(w))) // 1000 AS BIGINT) AS flesch_micro
        |FROM per GROUP BY source""".stripMargin,
    // t22: per-row-rounded micro-unit logs, normal equations in HUGEINT
    // (DuckDB) / DECIMAL(38) (Spark) — exact integers end-to-end; the
    // positive-operand DIV avoids truncate-vs-floor on negatives.
    "t22_zipf_slope" ->
      """WITH tb AS (
        |  SELECT source, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents),
        |tc AS (SELECT source, term, count(*) AS n FROM tb WHERE term <> '' GROUP BY 1, 2),
        |r AS (SELECT source, n,
        |    row_number() OVER (PARTITION BY source ORDER BY n DESC, term) AS rank
        |  FROM tc),
        |xy AS (SELECT source,
        |    CAST(CAST(round(1e6 * ln(CAST(rank AS DOUBLE))) AS BIGINT) AS HUGEINT) AS x,
        |    CAST(CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) AS HUGEINT) AS y
        |  FROM r WHERE rank <= 1000),
        |s AS (SELECT source, CAST(count(*) AS HUGEINT) AS m,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM xy GROUP BY 1)
        |SELECT source, CAST(m AS BIGINT) AS n_terms,
        |  CAST((sx * sy - m * sxy) * 1000000 // (m * sxx - sx * sx) AS BIGINT)
        |    AS zipf_neg_slope_micro
        |FROM s""".stripMargin,
    // q105: the oracle is the TEXTBOOK doubly-correlated Q21 form
    // (EXISTS + NOT EXISTS against the same fact table) — the compare
    // proves the two-aggregate decorrelation equals it, line counts and
    // all. numwait DESC, s_name is a total order (names unique), so the
    // LIMIT 20 cut is deterministic on both engines.
    "q105_sole_failing_supplier" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin,
    // q106: the oracle states the scores with plain global row_number
    // windows (it is allowed a single-node sort; the engine is not) and
    // the SAME floor((rank-1)*5/n)+1 cut + CASE ladder — the compare
    // proves the banded decomposition equals the global-sort statement.
    "q106_rfm_segments" ->
      """WITH r AS (SELECT o_custkey AS c_custkey,
        |    max(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS r_us,
        |    count(*) AS f,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT c_custkey,
        |    row_number() OVER (ORDER BY r_us, c_custkey) AS rr,
        |    row_number() OVER (ORDER BY f, c_custkey) AS rf,
        |    row_number() OVER (ORDER BY m_cents, c_custkey) AS rm,
        |    count(*) OVER () AS n
        |  FROM r),
        |s AS (SELECT c_custkey,
        |    ((rr - 1) * 5) // n + 1 AS r_score,
        |    ((rf - 1) * 5) // n + 1 AS f_score,
        |    ((rm - 1) * 5) // n + 1 AS m_score
        |  FROM t)
        |SELECT c_custkey, r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |       WHEN r_score >= 4 AND f_score >= 4 THEN 'loyal'
        |       WHEN r_score >= 4 THEN 'recent'
        |       WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
        |       WHEN r_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM s""".stripMargin,
    // t23: the oracle replays t05's unigram model with per-row-rounded
    // micro-unit log-probs (exact integer doc scores), then the SAME
    // total order (score/words DESC, doc_id) feeds the SQL-standard
    // ntile(3) on both engines — identical buckets by construction.
    "t23_perplexity_buckets" ->
      """WITH dw AS (SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |f AS (SELECT w, count(*) AS wc FROM dw GROUP BY w),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM dw),
        |pd AS (SELECT dw.doc_id, dw.lang,
        |    CAST(sum(CAST(round(1000000.0 * log10(f.wc / t.total)) AS BIGINT)) AS BIGINT)
        |      AS lp_micro,
        |    count(*) AS nw
        |  FROM dw JOIN f ON dw.w = f.w CROSS JOIN t
        |  GROUP BY dw.doc_id, dw.lang),
        |nb AS (SELECT lang, lp_micro, nw,
        |    ntile(3) OVER (PARTITION BY lang
        |      ORDER BY CAST(lp_micro AS DOUBLE) / nw DESC, doc_id) AS b
        |  FROM pd)
        |SELECT lang,
        |  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs,
        |  CAST(sum(lp_micro) AS BIGINT) AS lp_micro_sum,
        |  CAST(sum(nw) AS BIGINT) AS n_words
        |FROM nb GROUP BY 1, 2""".stripMargin,
    // q104: the oracle re-derives d06's exact clusters (recursive-CTE
    // connected components over the verified near-dup pairs), defaults
    // pairless docs to singleton clusters, and applies q42's md5 rule to
    // the CLUSTER id — the compare proves the distributed CC + keyed
    // join equals the declarative statement of "split by family".
    "q104_leakage_safe_split" ->
      """WITH RECURSIVE w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT ov.doc_a, ov.doc_b
        |  FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b
        |  WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5),
        |e AS (SELECT doc_a, doc_b FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc_id, label) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM e
        |  UNION
        |  SELECT e.doc_a, r.label FROM e JOIN reach r ON r.doc_id = e.doc_b),
        |cl AS (SELECT doc_id, min(label) AS cluster FROM reach GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, coalesce(cl.cluster, d.doc_id) AS cluster,
        |  CASE WHEN substr(md5(CAST(coalesce(cl.cluster, d.doc_id) AS VARCHAR)), 1, 4) < 'e666'
        |       THEN 'train' ELSE 'eval' END AS split
        |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id""".stripMargin,
    // d04's oracle recomputes the md5-digit simhash fingerprint and cross-
    // checks the EXACT hamming<=3 pair set — valid as a full equality
    // check because 16-bit chunk bucketing finds every hamming<=3 pair by
    // pigeonhole, so the Spark output IS that exact set.
    "d04_dedup_simhash" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 2),
        |    i -> array_to_string(words[i:i+3], ' '))) AS g FROM w) t),
        |hx AS (SELECT doc_id, md5(g) AS h FROM sh),
        |bits AS (SELECT doc_id, (r.i - 1) AS di, strpos('0123456789abcdef', substr(h, r.i, 1)) - 1 AS dv
        |         FROM hx CROSS JOIN range(1, 17) r(i)),
        |votes AS (SELECT doc_id, di * 4 + c.c AS b, sum((dv >> c.c) & 1) AS ones, count(*) AS n
        |          FROM bits CROSS JOIN range(0, 4) c(c) GROUP BY 1, 2),
        |chunks AS (SELECT doc_id, b // 16 AS k,
        |           CAST(sum(CASE WHEN ones * 2 > n THEN (1 << (b % 16)) ELSE 0 END) AS BIGINT) AS cv
        |           FROM votes GROUP BY 1, 2),
        |fp AS (SELECT doc_id,
        |       sum(CASE WHEN k = 0 THEN cv END) AS c0, sum(CASE WHEN k = 1 THEN cv END) AS c1,
        |       sum(CASE WHEN k = 2 THEN cv END) AS c2, sum(CASE WHEN k = 3 THEN cv END) AS c3
        |       FROM chunks GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
        |     + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
        |    + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 3""".stripMargin,
    // d05's oracle recomputes the deterministic sin-hyperplane bucket and
    // the in-bucket exact cosine — same in-index-order double arithmetic
    // as the Spark side (indexed transform + left-fold aggregate).
    "d05_dedup_embedding" ->
      ("""WITH b AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
        |  list_aggregate(list_transform(range(1, len(a.embedding) + 1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * c.embedding[i]), 'sum') / (a.norm * c.norm) AS cos
        | FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
        |SELECT vec_a, vec_b, round(cos, 4) AS cosine FROM p WHERE cos >= 0.25""".stripMargin),
    "d01_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies,
        | min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)""".stripMargin,
    // m01's oracle never sees the PNG bytes: it predicts the DECODED
    // stats arithmetically from the deterministic two-band layout
    // (w/h/g1/g2 are pure functions of doc_id and n_chars). The Spark
    // side really encodes (ImageIO.write) and really decodes
    // (ImageIO.read) — a corrupted round trip fails this hash. The
    // divides mirror the Spark arithmetic operand-for-operand
    // (integer numerator * h over w*h; stride-2 grid for the thumb) so
    // both engines round the identical IEEE double.
    "m01_multimodal_pipeline" ->
      """WITH p AS (SELECT doc_id,
        |  16 + (n_chars % 32) AS w, 16 + ((n_chars * 7) % 32) AS h,
        |  doc_id % 256 AS g1, (doc_id * 7 + 31) % 256 AS g2 FROM documents),
        |c AS (SELECT doc_id, w, h, g1, g2, w // 2 AS wl,
        |  (w + 1) // 2 AS ct, (h + 1) // 2 AS rt,
        |  ((w // 2) + 1) // 2 AS cl FROM p)
        |SELECT doc_id,
        | CAST(w AS INTEGER) AS img_w, CAST(h AS INTEGER) AS img_h,
        | round(CAST((wl * g1 + (w - wl) * g2) * h AS DOUBLE) / (w * h), 4) AS avg_luma,
        | round(CAST(rt * (cl * g1 + (ct - cl) * g2) AS DOUBLE) / (ct * rt), 4) AS thumb_avg,
        | CAST((h + 3) // 4 AS INTEGER) AS n_frames
        |FROM c""".stripMargin,
    // s02's oracle replays the ENTIRE approximate computation: the
    // deterministic sin-hyperplane bucket (same emulation d05's oracle
    // uses), the 9-probe flip-one-bit expansion, and the in-bucket exact
    // cosine top-k. Valid as a full equality check because every stage is
    // a pure function of the data — "approximate" here means approximate
    // RECALL vs s01 (covered by the recall spec), not nondeterminism.
    "s02_ann_lsh" ->
      ("""WITH b AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, bucket AS qb
        |  FROM b WHERE vec_id < 10),
        |probes AS (SELECT query_id, q_emb, q_norm,
        |  unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8),
        |          xor(qb, 16), xor(qb, 32), xor(qb, 64), xor(qb, 128)]) AS bucket FROM q),
        |p AS (SELECT pr.query_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(pr.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (pr.q_norm * e.norm), 6) AS sim6
        | FROM b e JOIN probes pr ON e.bucket = pr.bucket AND e.vec_id <> pr.query_id),
        |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p)
        |SELECT query_id, neighbor_id, round(sim6, 4) AS cosine, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3""".stripMargin),
    // s13: the s02 pipeline over the LIVE index's final corpus in closed
    // form — deletes filtered out, the mod-11 updates' negation applied.
    // The Spark side reaches this state ONLY through incremental
    // updateBatch folds (inserts in chunks, replays, bucket-moving
    // updates, deletes); hash equality proves live ≡ batch rebuild.
    "s13_ann_live_index" ->
      ("""WITH e0 AS (SELECT vec_id,
        |  CASE WHEN vec_id % 11 = 5 THEN list_transform(embedding, x -> -x)
        |       ELSE embedding END AS embedding
        |  FROM embeddings WHERE vec_id % 7 <> 3),
        |b AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM e0),
        |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, bucket AS qb
        |  FROM b WHERE vec_id < 10),
        |probes AS (SELECT query_id, q_emb, q_norm,
        |  unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8),
        |          xor(qb, 16), xor(qb, 32), xor(qb, 64), xor(qb, 128)]) AS bucket FROM q),
        |p AS (SELECT pr.query_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(pr.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (pr.q_norm * e.norm), 6) AS sim6
        | FROM b e JOIN probes pr ON e.bucket = pr.bucket AND e.vec_id <> pr.query_id),
        |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p)
        |SELECT query_id, neighbor_id, round(sim6, 4) AS cosine, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3""".stripMargin),
    // q151: LIVE hybrid retrieval — the q148 phrase leg (closed-form
    // final docs corpus) fused with the s13 LSH leg (closed-form final
    // embeddings corpus, query = doc 0) by exact-integer RRF; hash
    // equality proves both maintained stores AND the fusion.
    "q151_hybrid_live" ->
      ("""WITH d2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN text || ' spark stream' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 3),
        |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM d2),
        |h2 AS (SELECT doc_id, len(list_filter(range(1, len(words)),
        |    i -> words[i] = 'spark' AND words[i+1] = 'stream')) AS n_hits FROM w),
        |lex_top AS (SELECT doc_id, n_hits FROM h2 WHERE n_hits > 0 AND doc_id <> 0
        |  ORDER BY n_hits DESC, doc_id LIMIT 20),
        |lex AS (SELECT a.doc_id, CAST(count(b.doc_id) + 1 AS BIGINT) AS lex_rank
        |  FROM lex_top a LEFT JOIN lex_top b
        |    ON b.n_hits > a.n_hits OR (b.n_hits = a.n_hits AND b.doc_id < a.doc_id)
        |  GROUP BY a.doc_id),
        |e0 AS (SELECT vec_id,
        |  CASE WHEN vec_id % 11 = 5 THEN list_transform(embedding, x -> -x)
        |       ELSE embedding END AS embedding
        |  FROM embeddings WHERE vec_id % 7 <> 3),
        |b AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM e0),
        |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, bucket AS qb
        |  FROM b WHERE vec_id = 0),
        |probes AS (SELECT query_id, q_emb, q_norm,
        |  unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8),
        |          xor(qb, 16), xor(qb, 32), xor(qb, 64), xor(qb, 128)]) AS bucket FROM q),
        |p AS (SELECT pr.query_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(pr.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (pr.q_norm * e.norm), 6) AS sim6
        | FROM b e JOIN probes pr ON e.bucket = pr.bucket AND e.vec_id <> pr.query_id),
        |r AS (SELECT neighbor_id, row_number() OVER (
        |  ORDER BY sim6 DESC, neighbor_id) AS rn FROM p),
        |vec AS (SELECT neighbor_id AS doc_id, CAST(rn AS BIGINT) AS vec_rank
        |  FROM r WHERE rn <= 20),
        |f AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank
        |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
        |SELECT doc_id, lex_rank, vec_rank,
        |  CAST(coalesce(1000000 // (60 + lex_rank), 0)
        |     + coalesce(1000000 // (60 + vec_rank), 0) AS BIGINT) AS rrf_e6
        |FROM f ORDER BY rrf_e6 DESC, doc_id LIMIT 10""".stripMargin),
    // q152: BM25 from the LIVE posting store — the oracle recomputes
    // tf/df/dl/stats over the closed-form final docs corpus at the
    // STORE's tokenization (whitespace, q148's form) and replays the
    // t15 scoring formula.
    "q152_bm25_live" ->
      """WITH d2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN text || ' spark stream' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 3),
        |toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM d2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('spark', 'stream', 'key') GROUP BY doc_id, tok),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
        |SELECT tf.doc_id,
        |  round(sum(ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
        |    * tf.tf * 2.2
        |    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (CAST(stats.tot_dl AS DOUBLE) / stats.n_docs)))), 4) AS bm25
        |FROM tf JOIN dl USING (doc_id) JOIN dft USING (tok) CROSS JOIN stats
        |GROUP BY tf.doc_id
        |ORDER BY bm25 DESC, tf.doc_id LIMIT 10""".stripMargin,
    // s15: the live IVF index — pinned centroids replayed round-for-
    // round over the ORIGINAL corpus (the s04 fixed-point Lloyd
    // scaffolding), then the closed-form FINAL corpus (mod-11 negation,
    // mod-7 deletes) assigned at those centroids and probed nprobe=2.
    // Hash equality proves the maintained store ≡ the batch rebuild at
    // the same pinned quantizer.
    "s15_ann_ivf_live" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
         |  ${sqlMicro("embedding")} AS xi
         |  FROM embeddings),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, xi AS ci, ${sqlDotI("xi", "xi")} AS c2
         |  FROM e WHERE vec_id < 16),
         |${ivfAssignSql("c0", "a1")},
         |${ivfRecomputeSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfRecomputeSql("a2", "c2t")},
         |ef0 AS (SELECT vec_id,
         |  CASE WHEN vec_id % 11 = 5 THEN list_transform(embedding, x -> -x)
         |       ELSE embedding END AS embedding
         |  FROM embeddings WHERE vec_id % 7 <> 3),
         |ef AS (SELECT vec_id, embedding,
         |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
         |  ${sqlMicro("embedding")} AS xi
         |  FROM ef0),
         |${ivfAssignSql("c2t", "cells", "ef")},
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, xi AS q_xi
         |  FROM cells WHERE vec_id < 10),
         |pr_s AS (SELECT q.query_id, q.q_emb, q.q_norm, c.cid,
         |  row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY 2 * ${sqlDotI("q.q_xi", "c.ci")} - c.c2 DESC, c.cid) AS prn
         |  FROM q, c2t c),
         |pr AS (SELECT query_id, q_emb, q_norm, cid FROM pr_s WHERE prn <= 2),
         |p AS (SELECT pr.query_id, e2.vec_id AS neighbor_id,
         |  round(${sqlDotF("pr.q_emb", "e2.embedding")} / (pr.q_norm * e2.norm), 6) AS sim6
         |  FROM cells e2 JOIN pr ON e2.cid = pr.cid AND e2.vec_id <> pr.query_id),
         |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
         |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p)
         |SELECT query_id, neighbor_id, round(sim6, 4) AS cosine, CAST(rn AS BIGINT) AS rn
         |FROM r WHERE rn <= 3""".stripMargin,
    // s16: the live PQ index — pinned codebooks replayed round-for-
    // round over the ORIGINAL corpus (the s05 fixed-point Lloyd
    // scaffolding), then the closed-form FINAL corpus (mod-11 negation,
    // mod-7 deletes) ENCODED at those codebooks and probed via ADC +
    // exact rerank. Hash equality proves the maintained code table ≡
    // the batch re-encode at the same pinned quantizer.
    "s16_ann_pq_live" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
         |  len(embedding) // 4 AS d FROM embeddings),
         |subs AS (SELECT vec_id, j,
         |  ${sqlMicro("embedding[j * d + 1 : (j + 1) * d]")} AS svi
         |  FROM e, (SELECT unnest(range(0, 4)) AS j) t),
         |cb0 AS (SELECT j, CAST(vec_id AS INT) AS code, svi AS cvi, ${sqlDotI("svi", "svi")} AS c2
         |  FROM subs WHERE vec_id < 16),
         |${pqAssignSql("cb0", "a1")},
         |${pqRecomputeSql("a1", "cb1")},
         |${pqAssignSql("cb1", "a2")},
         |${pqRecomputeSql("a2", "cb2")},
         |ef AS (SELECT vec_id,
         |  CASE WHEN vec_id % 11 = 5 THEN list_transform(embedding, x -> -x)
         |       ELSE embedding END AS embedding,
         |  norm, d
         |  FROM e WHERE vec_id % 7 <> 3),
         |subsf AS (SELECT vec_id, j,
         |  ${sqlMicro("embedding[j * d + 1 : (j + 1) * d]")} AS svi
         |  FROM ef, (SELECT unnest(range(0, 4)) AS j) t),
         |${pqAssignSql("cb2", "codes", "subsf")},
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, d
         |  FROM ef WHERE vec_id < 10),
         |lut AS (SELECT q.query_id, q.q_norm, c.j, c.code,
         |  ${sqlDotI(sqlMicro("q.q_emb[c.j * q.d + 1 : (c.j + 1) * q.d]"), "c.cvi")} AS pdot
         |  FROM q, cb2 c),
         |cand_s AS (SELECT l.query_id, co.vec_id AS neighbor_id,
         |  sum(l.pdot) AS adot, any_value(l.q_norm) AS q_norm
         |  FROM codes co JOIN lut l ON co.j = l.j AND co.code = l.code
         |  WHERE co.vec_id <> l.query_id
         |  GROUP BY l.query_id, co.vec_id),
         |cand AS (SELECT c.*, e2.norm AS n_norm, e2.embedding AS n_emb,
         |  row_number() OVER (PARTITION BY c.query_id ORDER BY c.adot DESC, c.neighbor_id) AS arn
         |  FROM cand_s c JOIN ef e2 ON c.neighbor_id = e2.vec_id),
         |rr AS (SELECT c.query_id, c.neighbor_id,
         |  round(${sqlDotF("q.q_emb", "c.n_emb")} / (c.q_norm * c.n_norm), 6) AS sim6
         |  FROM cand c JOIN q ON c.query_id = q.query_id WHERE c.arn <= 60),
         |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
         |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM rr)
         |SELECT query_id, neighbor_id, round(sim6, 4) AS approx_cosine, CAST(rn AS BIGINT) AS rn
         |FROM r WHERE rn <= 3""".stripMargin,
    // s09: s02's oracle with the label folded into the bucket join —
    // the filter-key-partitions-the-index identity evaluated
    // independently.
    "s09_ann_filtered" ->
      ("""WITH b AS (SELECT vec_id, label, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label, embedding AS q_emb, norm AS q_norm, bucket AS qb
        |  FROM b WHERE vec_id < 10),
        |probes AS (SELECT query_id, label, q_emb, q_norm,
        |  unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8),
        |          xor(qb, 16), xor(qb, 32), xor(qb, 64), xor(qb, 128)]) AS bucket FROM q),
        |p AS (SELECT pr.query_id, pr.label, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(pr.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (pr.q_norm * e.norm), 6) AS sim6
        | FROM b e JOIN probes pr ON e.label = pr.label AND e.bucket = pr.bucket
        |   AND e.vec_id <> pr.query_id),
        |r AS (SELECT query_id, label, neighbor_id, sim6, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p)
        |SELECT query_id, label, neighbor_id, round(sim6, 4) AS cosine, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3""".stripMargin),
    // q107: the Q11-shape value-concentration cut — exact 1e-4-dollar
    // integers, 1.5×-average threshold by integer cross-multiply on
    // both engines.
    "q107_important_parts" ->
      """WITH v AS (SELECT l_partkey,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
        |    AS value_e4
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(value_e4) AS BIGINT) AS total_e4, count(*) AS n_parts FROM v)
        |SELECT l_partkey, value_e4 FROM v, t
        |WHERE value_e4 * n_parts * 10 > total_e4 * 15""".stripMargin,
    // q108: the Q22 shape — the oracle states it with NOT EXISTS over the
    // date-filtered orders and the same exact-cents cross-multiplied
    // threshold; the compare proves the broadcast-scalar + anti-join
    // decorrelation.
    "q108_dormant_balance" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
        |s AS (SELECT count(*) AS n_pos, CAST(sum(bal_cents) AS BIGINT) AS sum_pos_cents
        |  FROM c WHERE bal_cents > 0)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM c, s
        |WHERE bal_cents * n_pos > sum_pos_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    // t24: in-doc trigram duplication — the oracle rebuilds the grams
    // with the d15 slice pattern (words[i:i+2] = 3 tokens) and the same
    // integer 20% cross-multiply; docs under 3 words survive the LEFT
    // join with zero totals on both engines.
    "t24_dup_ngrams" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
        |    i -> array_to_string(words[i:i+2], ' '))) AS g FROM w),
        |pg AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
        |pd AS (SELECT doc_id, sum(c) AS total_grams,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_grams FROM pg GROUP BY 1)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(pd.total_grams, 0)) AS BIGINT) AS total_grams,
        |  CAST(sum(coalesce(pd.dup_grams, 0)) AS BIGINT) AS dup_grams,
        |  CAST(sum(CASE WHEN coalesce(pd.dup_grams, 0) * 5 > coalesce(pd.total_grams, 0)
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |GROUP BY 1""".stripMargin,
    // q109: the Q15 shape — quarter revenue per supplier, keep the tied
    // maximum; exact 1e-4-dollar integers make the tie test identical.
    "q109_top_supplier" ->
      """WITH r AS (SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
        |    AS total_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1),
        |m AS (SELECT max(total_e4) AS max_e4 FROM r)
        |SELECT s.s_suppkey, s.s_name, r.total_e4
        |FROM r CROSS JOIN m JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_e4 = m.max_e4""".stripMargin,
    // q110: the oracle IS the textbook double negation (no region
    // without a qualifying shipment) — the compare proves the counting
    // decorrelation equals FOR ALL.
    "q110_region_coverage" ->
      """SELECT s.s_suppkey, s.s_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM region) AS n_regions
        |FROM supplier s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM region r WHERE NOT EXISTS (
        |    SELECT 1 FROM lineitem l
        |    JOIN orders o ON l.l_orderkey = o.o_orderkey
        |    JOIN customer c ON o.o_custkey = c.c_custkey
        |    JOIN nation n ON c.c_nationkey = n.n_nationkey
        |    WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
        |      AND l.l_quantity >= 49 AND n.n_regionkey = r.r_regionkey))""".stripMargin,
    // q114: the oracle votes each (user, day) into its 7 window-end
    // days the same way — exact integer pair, no ratio crosses the hash.
    "q114_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM ud GROUP BY 1),
        |wau AS (SELECT day + CAST(o AS INTEGER) AS wday,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS wau7
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o) t GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau7
        |FROM dau JOIN wau ON dau.day = wau.wday""".stripMargin,
    // q113: Q13's count-of-counts — the ON-clause filter (not WHERE)
    // keeps the zero-order customers in the zero bucket on both engines.
    "q113_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY 1) t
        |GROUP BY c_count""".stripMargin,
    // q118: Q7's flat form — the disjunctive nation-pair predicate
    // states both directions; year from the ship date; exact e4 money.
    "q118_nation_pair_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,
    // q119: Q9's profit expression across three tables inside one
    // aggregate; cost basis = retail × qty (no partsupp in this schema).
    "q119_nation_profit" ->
      """SELECT n.n_name, CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
        |    - CAST(round(p.p_retailprice * 100) AS BIGINT) * 100
        |      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_e4
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    // q120: Q10's returned-item ranking; both fact filters in the
    // textbook WHERE; deterministic top-20 (revenue DESC, custkey).
    "q120_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS lost_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY lost_e4 DESC, c.c_custkey
        |LIMIT 20""".stripMargin,
    // q121: Q12's conditional priority counts per shipping class (the
    // class here: capped 180-day lateness bands, exact integer days off
    // midnight-aligned epochs — ship before order clamps to band 0).
    "q121_lateness_priority" ->
      """SELECT least(greatest(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate), 0)
        |    // 86400000000 // 180, 4) AS late_band,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_low
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    // q122: Q14's indicator join — every line must find its part to
    // classify promo; share in ppm via HUGEINT // (the q100 pairing).
    "q122_promo_share" ->
      """SELECT strftime(l.l_shipdate, '%Y-%m') AS month,
        |  CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) ELSE 0 END) AS BIGINT)
        |    AS promo_e4,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS total_e4,
        |  CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |      THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |        * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) ELSE 0 END) AS HUGEINT)
        |    * 1000000 // CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS HUGEINT) AS BIGINT)
        |    AS promo_ppm
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1""".stripMargin,
    // q123: Q16's NOT IN blacklist in the textbook form; supplier pairs
    // from the fact table, distinct inside the per-class count.
    "q123_supplier_breadth" ->
      """SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_size <= 30
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    // q124: Q19's OR-of-ANDs spanning both join sides, stated verbatim.
    "q124_disjunctive_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |        AND l.l_quantity BETWEEN 1 AND 20)
        |   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 25
        |        AND l.l_quantity BETWEEN 10 AND 30)
        |   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 20 AND 35
        |        AND l.l_quantity BETWEEN 20 AND 40)""".stripMargin,
    // q125: per-column profile — the oracle computes the same stats
    // column-by-column and UNION ALLs one row per column; numeric
    // min/max in exact integer units (raw / e4 / epoch-µs), lexical
    // bounds for strings. Every count CAST to BIGINT (HUGEINT trap).
    "q125_column_profile" ->
      """WITH b AS (SELECT count(*) AS n,
        |  count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
        |    min(o_orderkey) AS mn1, max(o_orderkey) AS mx1,
        |  count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
        |    min(o_custkey) AS mn2, max(o_custkey) AS mx2,
        |  count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS nd3,
        |    min(o_orderstatus) AS ms3, max(o_orderstatus) AS mxs3,
        |  count(o_totalprice) AS nn4, count(DISTINCT o_totalprice) AS nd4,
        |    CAST(round(min(o_totalprice) * 10000) AS BIGINT) AS mn4,
        |    CAST(round(max(o_totalprice) * 10000) AS BIGINT) AS mx4,
        |  count(o_orderdate) AS nn5, count(DISTINCT o_orderdate) AS nd5,
        |    epoch_us(min(o_orderdate)) AS mn5, epoch_us(max(o_orderdate)) AS mx5,
        |  count(o_orderpriority) AS nn6, count(DISTINCT o_orderpriority) AS nd6,
        |    min(o_orderpriority) AS ms6, max(o_orderpriority) AS mxs6
        |FROM orders)
        |SELECT 'o_orderkey' AS col_name, CAST(n AS BIGINT) AS n_rows,
        |  CAST(n - nn1 AS BIGINT) AS n_nulls, CAST(nd1 AS BIGINT) AS n_distinct,
        |  CAST(mn1 AS BIGINT) AS min_num, CAST(mx1 AS BIGINT) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM b
        |UNION ALL SELECT 'o_custkey', CAST(n AS BIGINT), CAST(n - nn2 AS BIGINT),
        |  CAST(nd2 AS BIGINT), CAST(mn2 AS BIGINT), CAST(mx2 AS BIGINT),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM b
        |UNION ALL SELECT 'o_orderstatus', CAST(n AS BIGINT), CAST(n - nn3 AS BIGINT),
        |  CAST(nd3 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), ms3, mxs3 FROM b
        |UNION ALL SELECT 'o_totalprice', CAST(n AS BIGINT), CAST(n - nn4 AS BIGINT),
        |  CAST(nd4 AS BIGINT), mn4, mx4, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM b
        |UNION ALL SELECT 'o_orderdate', CAST(n AS BIGINT), CAST(n - nn5 AS BIGINT),
        |  CAST(nd5 AS BIGINT), CAST(mn5 AS BIGINT), CAST(mx5 AS BIGINT),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM b
        |UNION ALL SELECT 'o_orderpriority', CAST(n AS BIGINT), CAST(n - nn6 AS BIGINT),
        |  CAST(nd6 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), ms6, mxs6 FROM b""".stripMargin,
    // q126: chi-square contingency — the oracle folds the same exact
    // integer cross-multiplies in HUGEINT and truncating //; outputs
    // CAST to BIGINT.
    "q126_source_mix_chisq" ->
      """WITH cells AS (SELECT lang, source, count(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, sum(o) AS r FROM cells GROUP BY 1),
        |c AS (SELECT source, sum(o) AS c FROM cells GROUP BY 1),
        |t AS (SELECT sum(o) AS n FROM cells)
        |SELECT cells.lang, cells.source, CAST(cells.o AS BIGINT) AS n_obs,
        |  CAST(CAST(r.r AS HUGEINT) * c.c * 1000000 // t.n AS BIGINT) AS expected_e6,
        |  CAST((CAST(cells.o AS HUGEINT) * t.n - CAST(r.r AS HUGEINT) * c.c)
        |    * (CAST(cells.o AS HUGEINT) * t.n - CAST(r.r AS HUGEINT) * c.c)
        |    * 1000000 // (CAST(r.r AS HUGEINT) * c.c * t.n) AS BIGINT) AS chi2_ppm
        |FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t""".stripMargin,
    // q127: snapshot diff — the oracle materializes the two trailing-
    // window LWW states with row_number() and classifies the full
    // outer join; payload from the surviving side (t2 for I/U, the
    // retired t1 state for D).
    "q127_snapshot_diff" ->
      """WITH s1 AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |    CAST(round(value * 10000) AS BIGINT) AS value_e4 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE ts > TIMESTAMP '2024-01-15' - INTERVAL 1 DAY
        |    AND ts <= TIMESTAMP '2024-01-15') WHERE rn = 1),
        |s2 AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |    CAST(round(value * 10000) AS BIGINT) AS value_e4 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE ts > TIMESTAMP '2024-01-30' - INTERVAL 1 DAY
        |    AND ts <= TIMESTAMP '2024-01-30') WHERE rn = 1)
        |SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
        |  CASE WHEN s1.user_id IS NULL THEN 'I'
        |       WHEN s2.user_id IS NULL THEN 'D' ELSE 'U' END AS op,
        |  coalesce(s2.event_type, s1.event_type) AS event_type,
        |  coalesce(s2.value_e4, s1.value_e4) AS value_e4,
        |  coalesce(s2.ts_us, s1.ts_us) AS ts_us
        |FROM s1 FULL JOIN s2 ON s1.user_id = s2.user_id
        |WHERE s1.user_id IS NULL OR s2.user_id IS NULL
        |   OR s1.event_id <> s2.event_id""".stripMargin,
    // q128: CUSUM — the oracle runs the SEQUENTIAL closed form in one
    // window pass (prefix sum + prefix min per type); agreement with
    // the banded Spark decomposition is exactly the associativity
    // property the integer fixed point guarantees. µ via the same
    // offset-shifted division as the Spark side (positive numerator →
    // floor ≡ trunc, engine-free even for negative means).
    "q128_cusum_drift" ->
      """WITH v AS (SELECT event_type, ts, event_id,
        |    CAST(round(value * 10000) AS BIGINT) AS v4 FROM events),
        |m AS (SELECT event_type,
        |    (sum(v4) + 1000000000 * count(*)) // count(*) - 1000000000 AS mean4
        |  FROM v GROUP BY 1),
        |p AS (SELECT v.event_type, ts, event_id,
        |    sum(v4 - mean4 - 100000) OVER (PARTITION BY v.event_type
        |      ORDER BY epoch_us(ts), event_id) AS pf
        |  FROM v JOIN m USING (event_type)),
        |s AS (SELECT event_type, ts,
        |    pf - least(0, min(pf) OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id)) AS cus
        |  FROM p)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(cus) AS BIGINT) AS max_cusum_e4,
        |  CAST(sum(CASE WHEN cus > 2000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |  CAST(min(CASE WHEN cus > 2000000 THEN epoch_us(ts) END) AS BIGINT)
        |    AS first_alarm_us
        |FROM s GROUP BY 1""".stripMargin,
    // q129: KMV bottom-k overlap — the oracle replays the whole sketch
    // pipeline (per-type k-min signatures, pair-union k-min, matched
    // count) plus the exact audit; deterministic because bottom-k of a
    // fixed hash has no RNG.
    "q129_kmv_overlap" ->
      """WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
        |uh AS (SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM ut),
        |sig AS (SELECT event_type, h FROM (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM uh) WHERE rn <= 128),
        |types AS (SELECT DISTINCT event_type FROM sig),
        |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM types a JOIN types b ON a.event_type < b.event_type),
        |un AS (SELECT DISTINCT ta, tb, h FROM (
        |  SELECT p.ta, p.tb, s.h FROM pairs p JOIN sig s ON s.event_type = p.ta
        |  UNION ALL
        |  SELECT p.ta, p.tb, s.h FROM pairs p JOIN sig s ON s.event_type = p.tb)),
        |unk AS (SELECT ta, tb, h FROM (
        |  SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        |  FROM un) WHERE rn <= 128),
        |est AS (SELECT unk.ta, unk.tb,
        |    sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END) AS matched,
        |    count(*) AS kk
        |  FROM unk
        |  LEFT JOIN sig sa ON sa.event_type = unk.ta AND sa.h = unk.h
        |  LEFT JOIN sig sb ON sb.event_type = unk.tb AND sb.h = unk.h
        |  GROUP BY 1, 2),
        |pt AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
        |inter AS (SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS n_inter
        |  FROM ut x JOIN ut y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type GROUP BY 1, 2)
        |SELECT est.ta, est.tb, CAST(est.matched AS BIGINT) AS matched,
        |  CAST(est.matched * 1000000 // est.kk AS BIGINT) AS jaccard_est_ppm,
        |  CAST(coalesce(inter.n_inter, 0) AS BIGINT) AS n_inter,
        |  CAST(coalesce(inter.n_inter, 0) * 1000000
        |    // (na.n + nb.n - coalesce(inter.n_inter, 0)) AS BIGINT) AS jaccard_exact_ppm
        |FROM est
        |LEFT JOIN inter ON inter.ta = est.ta AND inter.tb = est.tb
        |JOIN pt na ON na.event_type = est.ta
        |JOIN pt nb ON nb.event_type = est.tb""".stripMargin,
    // q138: association rules — the oracle rebuilds the in-basket pair
    // counts, supports, and the same integer ppm rules (HUGEINT //).
    "q138_association_rules" ->
      """WITH b AS (SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS ps
        |  FROM lineitem GROUP BY 1),
        |pr AS (SELECT unnest(flatten(list_transform(ps, (x, i) ->
        |    list_transform(ps[i+1:], y -> struct_pack(a := x, b := y))))) AS p
        |  FROM b),
        |pairs AS (SELECT p.a AS part_a, p.b AS part_b, count(*) AS n_orders
        |  FROM pr GROUP BY 1, 2 HAVING count(*) >= 3),
        |items AS (SELECT l_partkey AS item, count(DISTINCT l_orderkey) AS n_item
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM lineitem),
        |d AS (SELECT part_a AS antecedent, part_b AS consequent, n_orders FROM pairs
        |  UNION ALL SELECT part_b, part_a, n_orders FROM pairs)
        |SELECT d.antecedent, d.consequent, CAST(d.n_orders AS BIGINT) AS n_both,
        |  CAST(CAST(d.n_orders AS HUGEINT) * 1000000 // na.n_item AS BIGINT) AS confidence_ppm,
        |  CAST(CAST(d.n_orders AS HUGEINT) * tot.n_baskets * 1000000
        |    // (CAST(na.n_item AS HUGEINT) * nc.n_item) AS BIGINT) AS lift_ppm
        |FROM d JOIN items na ON na.item = d.antecedent
        |JOIN items nc ON nc.item = d.consequent CROSS JOIN tot""".stripMargin,
    // q142: data card — every stat refolded in the same exact-integer
    // vocabulary; whitespace token counts match the q43 convention.
    "q142_data_card" ->
      """WITH b AS (SELECT doc_id, lang, source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS toks,
        |    md5(text) AS h
        |  FROM documents),
        |core AS (SELECT count(*) AS n_docs, sum(toks) AS n_tokens,
        |    count(DISTINCT lang) AS n_langs, count(DISTINCT source) AS n_sources
        |  FROM b),
        |dup AS (SELECT sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_docs
        |  FROM (SELECT h, count(*) AS c FROM b GROUP BY 1)),
        |tl AS (SELECT max(n) AS top_lang_docs
        |  FROM (SELECT lang, count(*) AS n FROM b GROUP BY 1))
        |SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_langs AS BIGINT) AS n_langs, CAST(n_sources AS BIGINT) AS n_sources,
        |  CAST(dup_docs AS BIGINT) AS dup_docs,
        |  CAST(dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ppm,
        |  CAST(n_tokens // n_docs AS BIGINT) AS mean_doc_tokens,
        |  CAST(top_lang_docs * 1000000 // n_docs AS BIGINT) AS top_lang_ppm
        |FROM core CROSS JOIN dup CROSS JOIN tl""".stripMargin,
    // q141: linear-interpolation gap fill — the oracle expands the same
    // spans and folds the identical offset-shifted integer division.
    "q141_gapfill_linear" ->
      """WITH last_tick AS (SELECT user_id, h, v4 FROM (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    CAST(round(value * 10000) AS BIGINT) AS v4,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1),
        |spans AS (SELECT user_id, h, v4,
        |    lead(h) OVER (PARTITION BY user_id ORDER BY h) AS nh,
        |    lead(v4) OVER (PARTITION BY user_id ORDER BY h) AS nv4
        |  FROM last_tick),
        |g AS (SELECT user_id, h, v4, nv4,
        |    coalesce((epoch_us(nh) - epoch_us(h)) // 3600000000, 1) AS n,
        |    unnest(generate_series(h, coalesce(nh - INTERVAL 1 HOUR, h),
        |      INTERVAL 1 HOUR)) AS gh
        |  FROM spans)
        |SELECT user_id, strftime(gh, '%Y-%m-%d %H:%M:%S') AS grid_hour,
        |  CAST(CASE WHEN nv4 IS NULL THEN v4
        |    ELSE v4 + ((nv4 - v4) * ((epoch_us(gh) - epoch_us(h)) // 3600000000)
        |      + 1000000000 * n) // n - 1000000000 END AS BIGINT) AS value_interp_e4
        |FROM g""".stripMargin,
    // q140: BFS distance — the oracle unrolls the same 3 frontier rounds
    // as CTE levels (the q80 fixed-point oracle discipline).
    "q140_bfs_distance" ->
      """WITH b AS (SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS ps
        |  FROM lineitem GROUP BY 1),
        |pr AS (SELECT unnest(flatten(list_transform(ps, (x, i) ->
        |    list_transform(ps[i+1:], y -> struct_pack(a := x, b := y))))) AS p
        |  FROM b),
        |pairs AS (SELECT p.a AS part_a, p.b AS part_b FROM pr
        |  GROUP BY 1, 2),
        |e AS (SELECT part_a AS src, part_b AS dst FROM pairs
        |  UNION ALL SELECT part_b, part_a FROM pairs),
        |d0 AS (SELECT min(src) AS part, 0 AS dist FROM e),
        |r1 AS (SELECT part, dist FROM d0
        |  UNION ALL SELECT DISTINCT e.dst, 1 FROM d0 JOIN e ON e.src = d0.part),
        |m1 AS (SELECT part, min(dist) AS dist FROM r1 GROUP BY 1),
        |r2 AS (SELECT part, dist FROM m1
        |  UNION ALL SELECT DISTINCT e.dst, 2 FROM m1 JOIN e ON e.src = m1.part
        |    WHERE m1.dist = 1),
        |m2 AS (SELECT part, min(dist) AS dist FROM r2 GROUP BY 1),
        |r3 AS (SELECT part, dist FROM m2
        |  UNION ALL SELECT DISTINCT e.dst, 3 FROM m2 JOIN e ON e.src = m2.part
        |    WHERE m2.dist = 2),
        |m3 AS (SELECT part, min(dist) AS dist FROM r3 GROUP BY 1)
        |SELECT part, CAST(dist AS BIGINT) AS dist FROM m3""".stripMargin,
    // q139: seasonal-naive backtest — the oracle lags the same daily
    // series by 7 days and folds identical integer error sums.
    "q139_seasonal_backtest" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    sum(CAST(round(value * 10000) AS BIGINT)) AS tot4
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT a.event_type, a.tot4 AS actual4, b.tot4 AS fc4
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.day = a.day - 7)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval_days,
        |  CAST(sum(abs(actual4 - fc4)) AS BIGINT) AS sum_abs_err_e4,
        |  CAST(sum(abs(actual4 - fc4)) // count(*) AS BIGINT) AS mae_e4,
        |  CAST(CAST(sum(abs(actual4 - fc4)) AS HUGEINT) * 1000000
        |    // sum(actual4) AS BIGINT) AS wape_ppm
        |FROM s GROUP BY 1""".stripMargin,
    // q137: timed funnel — the oracle is the textbook correlated
    // min-after-within chain.
    "q137_timed_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase')),
        |t1 AS (SELECT user_id, min(tsu) AS t1_us FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT ev.user_id, min(tsu) AS t2_us FROM ev JOIN t1 USING (user_id)
        |  WHERE event_type = 'click' AND tsu > t1_us
        |    AND tsu <= t1_us + 172800000000 GROUP BY 1),
        |t3 AS (SELECT ev.user_id, min(tsu) AS t3_us FROM ev JOIN t2 USING (user_id)
        |  WHERE event_type = 'purchase' AND tsu > t2_us
        |    AND tsu <= t2_us + 172800000000 GROUP BY 1)
        |SELECT t1.user_id, t1.t1_us, t2.t2_us, t3.t3_us,
        |  CAST(1 + (CASE WHEN t2.t2_us IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN t3.t3_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage
        |FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)""".stripMargin,
    // q136: PSI drift — integers inside the ln (the t17 discipline);
    // zero buckets smooth to 1 on both sides.
    "q136_psi_drift" ->
      """WITH b AS (SELECT
        |    CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 'ref' ELSE 'cur' END AS win,
        |    least(greatest(CAST(round(value * 10000) AS BIGINT) // 100000, 0), 15) AS bucket
        |  FROM events),
        |cells AS (SELECT bucket,
        |    sum(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS n_ref,
        |    sum(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS n_cur
        |  FROM b GROUP BY 1),
        |t AS (SELECT sum(n_ref) AS nr, sum(n_cur) AS nc FROM cells)
        |SELECT cells.bucket, CAST(cells.n_ref AS BIGINT) AS n_ref,
        |  CAST(cells.n_cur AS BIGINT) AS n_cur,
        |  CAST(round(1000000.0 * ln(
        |    CAST(greatest(cells.n_ref, 1) * t.nc AS DOUBLE)
        |      / CAST(greatest(cells.n_cur, 1) * t.nr AS DOUBLE))) AS BIGINT) AS logratio_e6
        |FROM cells CROSS JOIN t""".stripMargin,
    // q135: hybrid RRF — the oracle replays the t15 BM25 leg and the s01
    // cosine leg verbatim, then the same integer fusion; rank ties break
    // by doc_id in both engines.
    "q135_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok2
        |  WHERE tok IN ('spark', 'vector', 'stream') GROUP BY doc_id, tok),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |lexs AS (SELECT tf.doc_id,
        |  round(sum(ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
        |    * tf.tf * 2.2
        |    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (CAST(stats.tot_dl AS DOUBLE) / stats.n_docs)))), 4) AS bm25
        |  FROM tf JOIN dl USING (doc_id) JOIN dft USING (tok) CROSS JOIN stats
        |  GROUP BY tf.doc_id
        |  ORDER BY bm25 DESC, tf.doc_id LIMIT 20),
        |lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM lexs),
        |vq AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        |vs AS (SELECT e.vec_id AS doc_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(vq.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (sqrt(list_aggregate(list_transform(vq.q_emb, x -> CAST(x AS DOUBLE) * x), 'sum'))
        |     * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))),
        |  6) AS sim6
        |  FROM embeddings e, vq WHERE e.vec_id <> 0
        |  ORDER BY sim6 DESC, doc_id LIMIT 20),
        |vec AS (SELECT doc_id, row_number() OVER (ORDER BY sim6 DESC, doc_id) AS vec_rank FROM vs)
        |SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
        |  CAST(lex.lex_rank AS BIGINT) AS lex_rank,
        |  CAST(vec.vec_rank AS BIGINT) AS vec_rank,
        |  CAST(coalesce(1000000 // (60 + lex.lex_rank), 0)
        |     + coalesce(1000000 // (60 + vec.vec_rank), 0) AS BIGINT) AS rrf_e6
        |FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id
        |ORDER BY rrf_e6 DESC, doc_id LIMIT 10""".stripMargin,
    // q134: count-min sketch — deterministic md5 cells, so the oracle
    // replays build + probe exactly; top-10 ties broken by user_id.
    "q134_cms_counts" ->
      (s"""WITH ev AS (SELECT user_id FROM events),
        |pos AS (SELECT user_id, r.r,
        |    ${hexValSql("md5(CAST(r.r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))", 1, 3)} AS cell
        |  FROM ev CROSS JOIN range(0, 4) r(r)),
        |cells AS (SELECT r, cell, count(*) AS c FROM pos GROUP BY 1, 2),
        |exact AS (SELECT user_id, count(*) AS true_count FROM ev GROUP BY 1
        |  ORDER BY true_count DESC, user_id LIMIT 10),
        |probe AS (SELECT e.user_id, e.true_count, r.r,
        |    ${hexValSql("md5(CAST(r.r AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR))", 1, 3)} AS cell
        |  FROM exact e CROSS JOIN range(0, 4) r(r))
        |SELECT p.user_id, CAST(p.true_count AS BIGINT) AS true_count,
        |  CAST(min(c.c) AS BIGINT) AS cms_est,
        |  CAST(min(c.c) - p.true_count AS BIGINT) AS overshoot
        |FROM probe p JOIN cells c ON c.r = p.r AND c.cell = p.cell
        |GROUP BY p.user_id, p.true_count""".stripMargin),
    // q132: walk-forward splits — day-granular boundaries (midnight
    // aligned), the oracle refolds the same per-(user, day) cells.
    "q132_walkforward_splits" ->
      """WITH cells AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |fs AS (SELECT user_id, min(day) AS first_day FROM cells GROUP BY 1),
        |folds AS (SELECT r.f AS fold, 19730 + r.f * 5 AS ted FROM range(0, 4) r(f))
        |SELECT fo.fold,
        |  strftime(DATE '1970-01-01' + fo.ted * INTERVAL 1 DAY, '%Y-%m-%d') AS train_end,
        |  CAST(sum(CASE WHEN c.day < fo.ted THEN c.n ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN c.day >= fo.ted AND c.day < fo.ted + 5 THEN c.n ELSE 0 END)
        |    AS BIGINT) AS n_test,
        |  CAST(count(DISTINCT CASE WHEN c.day >= fo.ted AND c.day < fo.ted + 5
        |    THEN c.user_id END) AS BIGINT) AS n_test_users,
        |  CAST(count(DISTINCT CASE WHEN c.day >= fo.ted AND c.day < fo.ted + 5
        |    AND fs.first_day >= fo.ted THEN c.user_id END) AS BIGINT) AS n_cold_users
        |FROM folds fo CROSS JOIN (cells c JOIN fs USING (user_id))
        |GROUP BY 1, 2""".stripMargin,
    // q133: table digest — the oracle re-renders each row canonically
    // (integer units only), folds the same XOR and mod-2^61 sums.
    "q133_table_digest" ->
      s"""WITH c AS (SELECT strftime(l_shipdate, '%Y-%m') AS part,
        |  md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(round(l_quantity) AS BIGINT),
        |    CAST(round(l_extendedprice * 100) AS BIGINT),
        |    CAST(round(l_discount * 100) AS BIGINT),
        |    l_returnflag, l_linestatus,
        |    strftime(l_shipdate, '%Y-%m-%d'))) AS h
        |  FROM lineitem),
        |r AS (SELECT part, ${hexValSql("h", 1, 15)} AS rh FROM c)
        |SELECT part, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(rh) AS BIGINT) AS xor_digest,
        |  CAST(sum(CAST(rh AS HUGEINT)) % 2305843009213693952 AS BIGINT) AS sum_digest
        |FROM r GROUP BY 1""".stripMargin,
    // q131: nearest-direction as-of — the oracle is the textbook LATERAL
    // nearest-neighbor lookup (order by distance, backward on ties);
    // agreement proves the two-direction carry decomposition.
    "q131_asof_nearest" ->
      """WITH r AS (SELECT user_id AS k, epoch_us(ts) AS t, min(event_id) AS ref_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id AS k, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, c.ref_id AS nearest_error_id, c.dir AS direction,
        |  CAST(c.dd AS BIGINT) AS dist_min
        |FROM p LEFT JOIN LATERAL (
        |  SELECT r.ref_id, CASE WHEN r.t <= p.t THEN 'B' ELSE 'F' END AS dir,
        |    abs(r.t - p.t) // 60000000 AS dd
        |  FROM r WHERE r.k = p.k AND abs(r.t - p.t) <= 86400000000
        |  ORDER BY abs(r.t - p.t), (r.t > p.t), r.ref_id LIMIT 1) c ON TRUE""".stripMargin,
    // q130: bloom semi-join — the oracle rebuilds the identical bitmap
    // (md5 hex digits 1-5 / 6-10 as bit positions) and re-derives the
    // candidate and true-match counts.
    "q130_bloom_semijoin" ->
      s"""WITH cust AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |ch AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS h FROM cust),
        |cpos AS (SELECT ${hexValSql("h", 1, 5)} AS pos FROM ch
        |  UNION ALL SELECT ${hexValSql("h", 6, 5)} FROM ch),
        |bm AS (SELECT pos // 63 AS word,
        |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
        |  FROM cpos GROUP BY 1),
        |oh AS (SELECT o_orderkey, o_custkey, md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
        |op AS (SELECT o_orderkey, o_custkey,
        |  ${hexValSql("h", 1, 5)} AS pos1, ${hexValSql("h", 6, 5)} AS pos2 FROM oh),
        |cand AS (SELECT o_orderkey, o_custkey FROM op
        |  LEFT JOIN bm b1 ON op.pos1 // 63 = b1.word
        |  LEFT JOIN bm b2 ON op.pos2 // 63 = b2.word
        |  WHERE (coalesce(b1.bits, 0) & (CAST(1 AS BIGINT) << CAST(op.pos1 % 63 AS INTEGER))) <> 0
        |    AND (coalesce(b2.bits, 0) & (CAST(1 AS BIGINT) << CAST(op.pos2 % 63 AS INTEGER))) <> 0),
        |agg AS (SELECT
        |  (SELECT count(*) FROM orders) AS n_probe,
        |  (SELECT count(*) FROM cand) AS n_bloom_pass,
        |  (SELECT count(*) FROM cand WHERE o_custkey IN (SELECT c_custkey FROM cust)) AS n_true_match)
        |SELECT CAST(n_probe AS BIGINT) AS n_probe,
        |  CAST(n_bloom_pass AS BIGINT) AS n_bloom_pass,
        |  CAST(n_true_match AS BIGINT) AS n_true_match,
        |  CAST((n_bloom_pass - n_true_match) * 1000000 // n_bloom_pass AS BIGINT) AS fp_ppm
        |FROM agg""".stripMargin,
    // t26: hashed linear classifier — the oracle regenerates the same
    // md5-derived weight table over range(4096) and refolds the scores.
    "t26_hash_classifier" ->
      s"""WITH w AS (SELECT r.b AS bucket,
        |    ${hexValSql("md5(CAST(r.b AS VARCHAR))", 1, 4)} % 2001 - 1000 AS w_e3
        |  FROM range(0, 4096) r(b)),
        |toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        |f AS (SELECT doc_id, ${hexValSql("md5(tok)", 1, 3)} AS bucket, count(*) AS c
        |  FROM tk GROUP BY 1, 2),
        |s AS (SELECT doc_id, sum(c) AS n_tokens, sum(c * w_e3) AS score_e3
        |  FROM f JOIN w USING (bucket) GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(score_e3 AS BIGINT) AS score_e3,
        |  CASE WHEN score_e3 > 0 THEN 'keep' ELSE 'drop' END AS label
        |FROM s""".stripMargin,
    // q115: the oracle IS the textbook Q2 correlated scalar MIN whose
    // inner is the full multi-join, re-executed per outer row — the
    // compare proves the keyed-aggregate + join-back decorrelation
    // computes the same (ties kept) set. Money in integer cents.
    "q115_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p.p_partkey, s.s_name, n.n_name, o.cost_c,
        |  CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents
        |FROM part p
        |JOIN offers o ON o.partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = o.suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
        |WHERE p.p_type = 'STANDARD' AND p.p_size <= 25
        |  AND o.cost_c = (
        |    SELECT min(o2.cost_c) FROM offers o2
        |    JOIN supplier s2 ON s2.s_suppkey = o2.suppkey
        |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey AND r2.r_name = 'EUROPE'
        |    WHERE o2.partkey = p.p_partkey)""".stripMargin,
    // q116: the oracle IS the textbook Q18 form — the IN re-aggregates
    // lineitem inside the subquery and the outer query aggregates it
    // AGAIN; the compare proves the single-aggregate plan equals it.
    "q116_large_qty_orders" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
        |  CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    // q117: the oracle IS the textbook Q20 doubly nested IN with the
    // correlated scalar sum threshold — including its NULL rule (a pair
    // with no 1997 shipments yields NULL, the > is NULL, excluded);
    // the Spark side's conditional sum is NULL for exactly those pairs.
    "q117_excess_stock" ->
      """SELECT s.s_suppkey, s.s_name, n.n_name
        |FROM supplier s
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        | AND n.n_name IN ('NATION_2', 'NATION_6')
        |WHERE s.s_suppkey IN (
        |  SELECT pr.l_suppkey FROM (
        |    SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty_all
        |    FROM lineitem GROUP BY 1, 2) pr
        |  WHERE pr.l_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |    AND pr.qty_all > (
        |      SELECT 2 * CAST(sum(l2.l_quantity) AS BIGINT) FROM lineitem l2
        |      WHERE l2.l_partkey = pr.l_partkey AND l2.l_suppkey = pr.l_suppkey
        |        AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
        |        AND l2.l_shipdate < TIMESTAMP '1998-01-01'))""".stripMargin,
    // q111: the oracle IS the textbook correlated NOT-EXISTS dominance
    // self-join — the compare proves the bounded-price-grid window
    // decorrelation computes the same frontier.
    "q111_pareto_parts" ->
      """SELECT p.p_partkey, p.p_name,
        |  CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents,
        |  CAST(p.p_size AS BIGINT) AS p_size
        |FROM part p WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin,
    // t25: char-bigram entropy — the oracle enumerates bigrams by string
    // slice (s[i:i+1] = 2 chars, i < len) and folds the same per-row
    // integer micro-nat fixed point; ln operands are ≥ 1 so the rounded
    // log never goes negative.
    "t25_char_entropy" ->
      """WITH ch AS (SELECT source, unnest(list_transform(range(1, len(s)),
        |    i -> s[i:i+1])) AS bg
        |  FROM (SELECT source, lower(text) AS s FROM documents)),
        |c AS (SELECT source, bg, count(*) AS c FROM ch GROUP BY 1, 2),
        |t AS (SELECT source, sum(c) AS n_s FROM c GROUP BY 1)
        |SELECT c.source, CAST(max(t.n_s) AS BIGINT) AS n_bigrams,
        |  CAST(count(*) AS BIGINT) AS distinct_bigrams,
        |  CAST(sum(c.c * CAST(round(1000000.0 * ln(CAST(t.n_s AS DOUBLE) / c.c)) AS BIGINT))
        |    AS BIGINT) AS entropy_unats_scaled
        |FROM c JOIN t ON c.source = t.source
        |GROUP BY 1""".stripMargin,
    // s10: recall@3 of the 8-plane multi-probe LSH index vs the exact
    // baseline — the oracle replays BOTH pipelines (s02's bucketed CTEs,
    // s01's brute force) and intersects the top-3 sets per query.
    "s10_ann_recall" ->
      ("""WITH b AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, bucket AS qb
        |  FROM b WHERE vec_id < 10),
        |probes AS (SELECT query_id, q_emb, q_norm,
        |  unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8),
        |          xor(qb, 16), xor(qb, 32), xor(qb, 64), xor(qb, 128)]) AS bucket FROM q),
        |lp AS (SELECT pr.query_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(pr.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (pr.q_norm * e.norm), 6) AS sim6
        | FROM b e JOIN probes pr ON e.bucket = pr.bucket AND e.vec_id <> pr.query_id),
        |lr AS (SELECT query_id, neighbor_id, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM lp),
        |lshk AS (SELECT query_id, neighbor_id FROM lr WHERE rn <= 3),
        |ep AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (q.q_norm * e.norm), 6) AS sim6
        | FROM b e, q WHERE e.vec_id <> q.query_id),
        |er AS (SELECT query_id, neighbor_id, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM ep),
        |ex AS (SELECT query_id, neighbor_id FROM er WHERE rn <= 3),
        |h AS (SELECT x.query_id, count(*) AS c FROM ex x JOIN lshk l
        |  ON x.query_id = l.query_id AND x.neighbor_id = l.neighbor_id GROUP BY 1)
        |SELECT e.query_id, CAST(count(*) AS BIGINT) AS k,
        |  CAST(coalesce(any_value(h.c), 0) AS BIGINT) AS n_hit
        |FROM ex e LEFT JOIN h ON e.query_id = h.query_id
        |GROUP BY e.query_id""".stripMargin),
    "s01_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
        |  FROM embeddings WHERE vec_id < 10),
        |p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (sqrt(list_aggregate(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * x), 'sum'))
        |     * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))),
        |  6) AS sim6
        | FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p)
        |SELECT query_id, neighbor_id, round(sim6, 4) AS cosine, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5""".stripMargin,
    "t01_langid" ->
      """WITH w AS (SELECT doc_id, lang AS declared_lang,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS words FROM documents),
        |s AS (SELECT doc_id, declared_lang,
        |  len(list_filter(words, x -> x IN ('der','die','und','das','ist','ein'))) AS score_de,
        |  len(list_filter(words, x -> x IN ('the','a','of','and','to','is'))) AS score_en,
        |  len(list_filter(words, x -> x IN ('el','la','de','que','y','los'))) AS score_es,
        |  len(list_filter(words, x -> x IN ('le','la','de','et','les','un'))) AS score_fr
        | FROM w)
        |SELECT doc_id, declared_lang,
        | CASE WHEN score_de = greatest(score_de, score_en, score_es, score_fr) AND score_de > 0 THEN 'de'
        |      WHEN score_en = greatest(score_de, score_en, score_es, score_fr) AND score_en > 0 THEN 'en'
        |      WHEN score_es = greatest(score_de, score_en, score_es, score_fr) AND score_es > 0 THEN 'es'
        |      WHEN score_fr = greatest(score_de, score_en, score_es, score_fr) AND score_fr > 0 THEN 'fr'
        |      ELSE 'und' END AS pred_lang,
        | score_de, score_en, score_es, score_fr
        |FROM s""".stripMargin,
    "s03_embedding_stats" ->
      """SELECT label, count(*) AS n,
        | round(avg(sqrt(list_aggregate(
        |   list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))), 4) AS avg_norm,
        | round(avg(len(embedding)), 4) AS avg_dim
        |FROM embeddings GROUP BY label""".stripMargin,
    "t02_quality" ->
      """SELECT doc_id,
        | round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |   / length(text), 4) AS alpha_ratio,
        | round(CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |   / length(text), 4) AS space_ratio,
        | round(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |   / len(regexp_split_to_array(trim(text), '\s+')), 4) AS avg_word_len,
        | length(text) AS len_chars
        |FROM documents""".stripMargin,
    "t03_tokens" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents""".stripMargin,
    "t04_fingerprint" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents)
        |SELECT doc_id,
        | CASE WHEN len(words) >= 5 THEN list_aggregate(
        |   list_transform(range(1, len(words) - 3),
        |     i -> md5(array_to_string(words[i:i+4], ' '))), 'min')
        | END AS fingerprint
        |FROM w""".stripMargin,
    // q42+: training-data curation. Determinism contract: every split/
    // sample decision derives from md5-hex prefixes of the stable key, so
    // the oracle replays the identical draw.
    "q42_train_test_split" ->
      """SELECT doc_id, lang,
        | CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |      THEN 'train' ELSE 'eval' END AS split
        |FROM documents""".stripMargin,
    "q43_sequence_packing" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, source, n_tokens,
        | (CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
        |   - n_tokens) // 2048 AS pack_id
        |FROM t""".stripMargin,
    "q44_contamination" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 50),
        |train AS (SELECT doc_id, g FROM sh WHERE doc_id >= 50),
        |sz AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id),
        |hit AS (SELECT t.doc_id, count(*) AS n_shared
        |  FROM train t JOIN bench b ON t.g = b.g GROUP BY t.doc_id)
        |SELECT h.doc_id, h.n_shared, s.n_grams,
        | CAST(h.n_shared AS DOUBLE) / s.n_grams AS ratio
        |FROM hit h JOIN sz s ON s.doc_id = h.doc_id""".stripMargin,
    "q45_normalize_text" ->
      """WITH c AS (SELECT doc_id, text,
        |  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS clean
        |  FROM documents)
        |SELECT doc_id, md5(clean) AS clean_hash,
        | length(text) - length(clean) AS removed_chars,
        | len(regexp_split_to_array(clean, ' ')) AS n_tokens
        |FROM c""".stripMargin,
    "q46_range_join" ->
      """SELECT err.event_id,
        | CAST(count(e.event_id) AS BIGINT) AS n_after
        |FROM events err LEFT JOIN events e
        |  ON epoch_us(e.ts) > epoch_us(err.ts)
        | AND epoch_us(e.ts) <= epoch_us(err.ts) + 300000000
        |WHERE err.event_type = 'error'
        |GROUP BY err.event_id""".stripMargin,
    "q47_frequent_shingles" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
        |    i -> array_to_string(words[i:i+2], ' '))) AS g FROM w) t)
        |SELECT g AS shingle, count(*) AS df
        |FROM sh GROUP BY g ORDER BY df DESC, g LIMIT 20""".stripMargin,
    "q48_stratified_sample" ->
      """WITH r AS (SELECT doc_id, lang, CAST(row_number() OVER (
        |  PARTITION BY lang
        |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id) AS BIGINT) AS r
        |  FROM documents)
        |SELECT doc_id, lang, r FROM r WHERE r <= 25""".stripMargin,
    // q53: DuckDB's GROUPING() takes explicit columns; Spark's bare
    // grouping_id() is the same bitmap over the GROUP BY columns in order.
    "q53_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        | CAST(grouping(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        | round(sum(o_totalprice), 2) AS total, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "q51_anomalies" ->
      """WITH s AS (SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd, count(*) AS n
        |  FROM events GROUP BY user_id)
        |SELECT e.user_id, e.event_id, round(e.value, 2) AS value,
        | round((e.value - s.mu) / s.sd, 2) AS z
        |FROM events e JOIN s ON e.user_id = s.user_id
        |WHERE s.n >= 10 AND s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 3.0""".stripMargin,
    "q52_cohort_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
        | count(*) AS n_users
        |FROM d JOIN c ON d.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    // q50 composes d01's exact-keeper set with d06's recursive-CTE
    // component labels: the surviving corpus is exact keepers minus
    // near-dup cluster losers.
    "q50_dedup_corpus" ->
      """WITH RECURSIVE w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        |  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT ov.doc_a, ov.doc_b
        |  FROM ov JOIN sz a ON a.doc_id = ov.doc_a JOIN sz b ON b.doc_id = ov.doc_b
        |  WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5),
        |e AS (SELECT doc_a, doc_b FROM pairs
        |      UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc_id, label) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM e
        |  UNION
        |  SELECT e.doc_a, r.label FROM e JOIN reach r ON r.doc_id = e.doc_b),
        |losers AS (SELECT doc_id FROM reach GROUP BY doc_id
        |  HAVING doc_id <> min(label)),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d
        |JOIN keepers k ON k.doc_id = d.doc_id
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    "q49_mixture_sample" ->
      """WITH s AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |t AS (SELECT sum(cnt) AS total FROM s),
        |rate AS (SELECT lang, 0.2 / (CAST(cnt AS DOUBLE) / total) AS rate FROM s, t),
        |hx AS (SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
        |  FROM documents)
        |SELECT hx.doc_id, hx.lang, round(rate.rate, 6) AS rate
        |FROM hx JOIN rate ON hx.lang = rate.lang
        |WHERE ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096.0
        |     + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256.0
        |     + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16.0
        |     + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) / 65536.0 < rate.rate""".stripMargin,
    "q54_part_cooccurrence" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
        |FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "q55_unpivot_metrics" ->
      """WITH m AS (SELECT o_orderpriority, round(sum(o_totalprice), 2) AS sum_price,
        |  round(avg(o_totalprice), 2) AS avg_price, CAST(count(*) AS DOUBLE) AS n_orders
        | FROM orders GROUP BY 1)
        |SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS metric_value FROM m
        |UNION ALL SELECT o_orderpriority, 'avg_price', avg_price FROM m
        |UNION ALL SELECT o_orderpriority, 'n_orders', n_orders FROM m""".stripMargin,
    // q56: mode/median are engine builtins on BOTH sides, but with
    // arrival-order tie-breaks — so the portable contract is count+rank
    // with an explicit tiebreak and the percentile_disc cume_dist form.
    "q56_mode_median" ->
      """WITH m AS (SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY n DESC, user_id) AS rn FROM m),
        |cd AS (SELECT event_type, value, cume_dist() OVER (PARTITION BY event_type
        |  ORDER BY value) AS cd FROM events),
        |med AS (SELECT event_type, round(min(value), 4) AS median_value
        |  FROM cd WHERE cd >= 0.5 GROUP BY 1)
        |SELECT r.event_type, r.user_id AS mode_user, r.n AS mode_n, med.median_value
        |FROM r JOIN med ON med.event_type = r.event_type WHERE r.rn = 1""".stripMargin,
    "q57_window_navigation" ->
      """SELECT o_custkey, o_orderkey,
        | round(first_value(o_totalprice) OVER w, 2) AS first_price,
        | round(last_value(o_totalprice) OVER w, 2) AS last_price,
        | round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
        | round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_custkey), 6)
        |   AS share_of_customer
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "t06_repetition" ->
      """WITH dw AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, w, count(*) AS n FROM dw GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words, count(*) AS n_distinct_words,
        |  max(n) AS top_word_n FROM h GROUP BY 1)
        |SELECT doc_id, n_words, n_distinct_words, top_word_n,
        | round(CAST(top_word_n AS DOUBLE) / n_words, 4) AS top_word_ratio,
        | round(1.0 - CAST(n_distinct_words AS DOUBLE) / n_words, 4) AS dup_ratio
        |FROM a""".stripMargin,
    "t07_bigram_logprob" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
        |  FROM documents),
        |db AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
        |  i -> array_to_string(words[i:i+1], ' '))) AS b FROM w),
        |f AS (SELECT b, count(*) AS bc FROM db GROUP BY b),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM db)
        |SELECT db.doc_id, round(avg(log10(f.bc / t.total)), 4) AS avg_logprob,
        | count(*) AS n_bigrams
        |FROM db JOIN f ON db.b = f.b CROSS JOIN t
        |GROUP BY db.doc_id""".stripMargin,
    // d07: the oracle replays both tiers — corpus hash index for exact,
    // new-batch x corpus posting join for near — and the same best-match
    // tiebreak (jaccard DESC, corpus_doc ASC; the ratio is exact-int
    // arithmetic, so cross-engine ordering is deterministic).
    "d07_dedup_incremental" ->
      """WITH nd AS (SELECT doc_id, text FROM documents WHERE source IN ('src18', 'src19')),
        |cp AS (SELECT doc_id, text FROM documents WHERE source NOT IN ('src18', 'src19')),
        |eh AS (SELECT n.doc_id, min(c.doc_id) AS exact_match
        |  FROM nd n JOIN cp c ON md5(n.text) = md5(c.text) GROUP BY n.doc_id),
        |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |np AS (SELECT sh.doc_id, g FROM sh JOIN nd ON nd.doc_id = sh.doc_id),
        |cpp AS (SELECT sh.doc_id, g FROM sh JOIN cp ON cp.doc_id = sh.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT np.doc_id, cpp.doc_id AS corpus_doc, count(*) AS common
        |  FROM np JOIN cpp ON np.g = cpp.g GROUP BY 1, 2),
        |j AS (SELECT ov.doc_id, ov.corpus_doc,
        |   CAST(common AS DOUBLE) / (a.n + b.n - common) AS jac
        |  FROM ov JOIN sz a ON a.doc_id = ov.doc_id JOIN sz b ON b.doc_id = ov.corpus_doc
        |  WHERE CAST(common AS DOUBLE) / (a.n + b.n - common) >= 0.5),
        |best AS (SELECT doc_id, corpus_doc, jac,
        |   row_number() OVER (PARTITION BY doc_id ORDER BY jac DESC, corpus_doc) AS rn FROM j)
        |SELECT nd.doc_id,
        | CASE WHEN eh.doc_id IS NOT NULL THEN 'exact_dup'
        |      WHEN b.doc_id IS NOT NULL THEN 'near_dup' ELSE 'novel' END AS verdict,
        | coalesce(eh.exact_match, b.corpus_doc) AS match_doc,
        | CASE WHEN eh.doc_id IS NULL THEN round(b.jac, 4) END AS jaccard
        |FROM nd LEFT JOIN eh ON eh.doc_id = nd.doc_id
        |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_id = nd.doc_id""".stripMargin,
    // q58: same sin-hyperplane bucket emulation as d05/s02's oracles, then
    // the q48-style deterministic hash-rank draw inside each bucket.
    "q58_diversity_sample" ->
      ("""WITH b AS (SELECT vec_id, label,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM embeddings),
        |r AS (SELECT vec_id, label, bucket, CAST(row_number() OVER (
        |  PARTITION BY bucket
        |  ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 4), vec_id) AS BIGINT) AS r
        |  FROM b)
        |SELECT vec_id, label, bucket, r FROM r WHERE r <= 4""".stripMargin),
    // q60: Efraimidis–Spirakis exponential keys from the same 32-bit md5
    // uniform Spark derives via conv(substr(md5, 1, 8), 16, 10)
    "q60_weighted_sample" ->
      """SELECT doc_id, lang, n_chars, round(ekey, 6) AS ekey FROM (
        |  SELECT doc_id, lang, n_chars,
        |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1.0)
        |        / 4294967297.0) / n_chars AS ekey
        |  FROM documents)
        |ORDER BY round(ekey, 12), doc_id LIMIT 64""".stripMargin,
    "q61_zscore_outliers" ->
      """WITH s AS (SELECT c_mktsegment, avg(c_acctbal) AS mu, stddev_samp(c_acctbal) AS sigma
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_custkey, c.c_mktsegment, c_acctbal,
        | round((c_acctbal - mu) / sigma, 4) AS zscore
        |FROM customer c JOIN s ON c.c_mktsegment = s.c_mktsegment
        |WHERE abs((c_acctbal - mu) / sigma) > 2.0""".stripMargin,
    // q62: the salt changes partitioning, never results — the oracle is
    // the PLAIN join the salted plan must agree with
    // DECIMAL money sum, mirroring the Spark side (order-independent
    // exact cents — double sums drift past round-boundaries at sf1)
    "q62_salted_join" ->
      """SELECT p_brand,
        | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "t08_tfidf" ->
      """WITH dw AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM dw GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |r AS (SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs / df.df) AS score,
        |  CAST(row_number() OVER (PARTITION BY tf.doc_id
        |    ORDER BY tf.tf * ln(n.n_docs / df.df) DESC, tf.term) AS BIGINT) AS rn
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, round(score, 4) AS score, rn FROM r WHERE rn <= 3""".stripMargin,
    // q63: delta whose latest op is 'error' deletes the key; everything
    // else is a plain full-outer coalesce of two pre-folded sides
    "q63_merge_upsert" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu FROM events),
        |m AS (SELECT (min(tsu) + max(tsu)) // 2 AS mid_us FROM e),
        |s AS (SELECT user_id, event_type AS s_type, value AS s_value, tsu AS s_ts FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY tsu DESC, event_id DESC) AS rn
        |  FROM e, m WHERE tsu <= mid_us) WHERE rn = 1),
        |d AS (SELECT user_id, event_type AS d_type, value AS d_value, tsu AS d_ts FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY tsu DESC, event_id DESC) AS rn
        |  FROM e, m WHERE tsu > mid_us) WHERE rn = 1)
        |SELECT coalesce(s.user_id, d.user_id) AS user_id,
        | coalesce(d_type, s_type) AS event_type,
        | round(coalesce(d_value, s_value), 2) AS value,
        | coalesce(d_ts, s_ts) AS ts_us,
        | CASE WHEN d_type IS NULL THEN 'keep'
        |      WHEN s_type IS NULL THEN 'insert' ELSE 'update' END AS action
        |FROM s FULL JOIN d ON s.user_id = d.user_id
        |WHERE d_type IS NULL OR d_type <> 'error'""".stripMargin,
    "q64_activity_streaks" ->
      """WITH bd AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |i AS (SELECT user_id, day,
        |  day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island FROM bd),
        |r AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks,
        | CAST(sum(len) AS BIGINT) AS active_days
        |FROM r GROUP BY user_id""".stripMargin,
    "q65_interval_merge" ->
      """WITH sp AS (SELECT o_custkey AS k, epoch_us(o_orderdate) // 86400000000 AS s,
        |  epoch_us(o_orderdate) // 86400000000 + 30 AS e, o_orderkey AS okey FROM orders),
        |x AS (SELECT k, s, e, okey, max(e) OVER (PARTITION BY k ORDER BY s, e, okey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM sp),
        |y AS (SELECT k, s, e, okey,
        |  CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni FROM x),
        |z AS (SELECT k, s, e, sum(ni) OVER (PARTITION BY k ORDER BY s, e, okey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM y),
        |isl AS (SELECT k, island, min(s) AS st, max(e) AS en, count(*) AS n_orders
        |  FROM z GROUP BY 1, 2)
        |SELECT k AS custkey, count(*) AS n_spans,
        | CAST(sum(en - st) AS BIGINT) AS covered_days,
        | CAST(sum(n_orders) AS BIGINT) AS n_orders
        |FROM isl GROUP BY k""".stripMargin,
    // q66: the oracle is the window form the bounded aggregate replaces
    "q66_topk_per_group" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |  FROM customer) WHERE rn <= 3""".stripMargin,
    // d08: zipped unnests emulate Spark's posexplode(transform(sequence));
    // keeper = first (doc_id, idx) occurrence of each passage
    "d08_passage_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
        |w2 AS (SELECT doc_id, words, (len(words) + 7) // 8 AS nch FROM w),
        |c AS (SELECT doc_id, nch, unnest(range(0, nch)) AS idx,
        |  unnest(list_transform(range(0, nch),
        |    i -> array_to_string(words[i*8+1 : i*8+8], ' '))) AS passage
        |  FROM w2),
        |k AS (SELECT doc_id, idx, passage, nch,
        |  row_number() OVER (PARTITION BY passage ORDER BY doc_id, idx) AS rn FROM c)
        |SELECT doc_id, string_agg(passage, ' ' ORDER BY idx) AS clean_text,
        | count(*) AS n_kept, CAST(any_value(nch) - count(*) AS BIGINT) AS n_dropped
        |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin,
    "t09_bpe_pairs" ->
      """WITH wd AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents),
        |wc AS (SELECT word, count(*) AS wn FROM wd GROUP BY word),
        |p AS (SELECT unnest(list_transform(range(1, length(word)),
        |    i -> substr(word, i, 2))) AS pair, wn
        |  FROM wc WHERE length(word) >= 2),
        |g AS (SELECT pair, CAST(sum(wn) AS BIGINT) AS cnt FROM p GROUP BY pair)
        |SELECT pair, cnt, rn FROM (SELECT pair, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rn FROM g)
        |WHERE rn <= 20""".stripMargin,
    "q67_conversion_delay" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
        |s AS (SELECT user_id, min(tsu) AS s_ts FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |f AS (SELECT s.user_id, s.s_ts, min(p.tsu) AS first_p
        |  FROM s JOIN e p ON p.user_id = s.user_id
        |  WHERE p.event_type = 'purchase' AND p.tsu > s.s_ts
        |  GROUP BY s.user_id, s.s_ts),
        |d AS (SELECT user_id, s_ts // 86400000000 AS cohort_day, first_p - s_ts AS delay_us FROM f),
        |r AS (SELECT cohort_day, delay_us,
        |  row_number() OVER (PARTITION BY cohort_day ORDER BY delay_us, user_id) AS rn,
        |  count(*) OVER (PARTITION BY cohort_day) AS n FROM d)
        |SELECT cohort_day, max(n) AS n_converted,
        | max(CASE WHEN rn = (n + 1) // 2 THEN delay_us END) AS p50_delay_us,
        | max(CASE WHEN rn = (9 * n + 9) // 10 THEN delay_us END) AS p90_delay_us
        |FROM r GROUP BY cohort_day""".stripMargin,
    // t11: the t01 scorer aggregated to the (declared, predicted) matrix
    "t11_lang_agreement" ->
      """WITH w AS (SELECT doc_id, lang AS declared_lang,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS words FROM documents),
        |s AS (SELECT doc_id, declared_lang,
        |  len(list_filter(words, x -> x IN ('der','die','und','das','ist','ein'))) AS score_de,
        |  len(list_filter(words, x -> x IN ('the','a','of','and','to','is'))) AS score_en,
        |  len(list_filter(words, x -> x IN ('el','la','de','que','y','los'))) AS score_es,
        |  len(list_filter(words, x -> x IN ('le','la','de','et','les','un'))) AS score_fr
        | FROM w),
        |p AS (SELECT declared_lang,
        | CASE WHEN score_de = greatest(score_de, score_en, score_es, score_fr) AND score_de > 0 THEN 'de'
        |      WHEN score_en = greatest(score_de, score_en, score_es, score_fr) AND score_en > 0 THEN 'en'
        |      WHEN score_es = greatest(score_de, score_en, score_es, score_fr) AND score_es > 0 THEN 'es'
        |      WHEN score_fr = greatest(score_de, score_en, score_es, score_fr) AND score_fr > 0 THEN 'fr'
        |      ELSE 'und' END AS pred_lang
        |FROM s),
        |g AS (SELECT declared_lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
        |t AS (SELECT declared_lang, sum(n) AS tot FROM g GROUP BY 1)
        |SELECT g.declared_lang, pred_lang, n,
        | round(CAST(n AS DOUBLE) / tot, 4) AS share
        |FROM g JOIN t ON g.declared_lang = t.declared_lang""".stripMargin,
    // d09: blocked self-join + identical Levenshtein on both engines
    "d09_fuzzy_match" ->
      """WITH p AS (SELECT p_partkey, p_name, p_type,
        |  str_split(p_name, ' ')[1] AS blk FROM part)
        |SELECT a.p_type, a.blk, a.p_partkey AS key_a, b.p_partkey AS key_b,
        | a.p_name AS name_a, b.p_name AS name_b,
        | CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        |FROM p a JOIN p b ON a.p_type = b.p_type AND a.blk = b.blk
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,
    // q69: identical IEEE double bin arithmetic on both engines
    "q69_price_histogram" ->
      """WITH m AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
        |b AS (SELECT least(9, CAST(floor((o_totalprice - lo) / ((hi - lo) / 10.0)) AS BIGINT)) AS bin
        |  FROM orders, m),
        |g AS (SELECT bin, count(*) AS n FROM b GROUP BY bin),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
        |SELECT bin, n, round(CAST(n AS DOUBLE) / tot, 4) AS share FROM g, t""".stripMargin,
    // q70: q25's island sessionization + per-session funnel fold
    "q70_session_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id FROM events),
        |m AS (SELECT user_id, event_type, tsu, event_id,
        |  CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) IS NULL
        |         OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new FROM e),
        |s AS (SELECT user_id, event_type, tsu,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM m),
        |g AS (SELECT user_id, session_id,
        |  min(CASE WHEN event_type = 'view' THEN tsu END) AS first_view,
        |  max(CASE WHEN event_type = 'purchase' THEN tsu END) AS last_purchase
        | FROM s GROUP BY user_id, session_id),
        |c AS (SELECT user_id,
        |  CASE WHEN first_view IS NOT NULL AND last_purchase > first_view THEN 1 ELSE 0 END AS converted
        | FROM g)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(converted) AS BIGINT) AS n_converting,
        | round(CAST(sum(converted) AS DOUBLE) / count(*), 4) AS conv_share
        |FROM c GROUP BY user_id""".stripMargin,
    // d10: one-sided coverage of the smaller doc's 3-word shingles
    "d10_containment" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
        |    i -> array_to_string(words[i:i+2], ' '))) AS g FROM w) t),
        |df AS (SELECT g FROM (SELECT g, count(*) AS c FROM sh GROUP BY g) WHERE c <= 100),
        |p AS (SELECT sh.doc_id, sh.g FROM sh JOIN df ON sh.g = df.g),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM p a JOIN p b ON a.g = b.g AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / x.n, 4) AS coverage,
        | x.n AS n_a, y.n AS n_b
        |FROM ov JOIN sz x ON x.doc_id = ov.doc_a JOIN sz y ON y.doc_id = ov.doc_b
        |WHERE common >= 0.9 * x.n AND x.n < y.n""".stripMargin,
    // t12: the oracle replays the whole Unicode path in DuckDB — the
    // variant list is THE SAME Scala value the Spark side plants (so the
    // NFD row is decomposed by construction on both sides), nfc_normalize
    // is utf8proc NFC vs the JVM's java.text.Normalizer NFC (both
    // implement UAX#15 — byte-equal outputs or the hash column fails),
    // and the CJK class is spelled as explicit codepoint ranges valid in
    // both Java regex and RE2.
    "t12_unicode_tokens" -> {
      val lits = graft.operators.TextAnalysis.mixedScriptVariants
        .map(v => "'" + v + "'").mkString("[", ", ", "]")
      s"""WITH v AS (SELECT doc_id, text || ' ' || ($lits)[(doc_id % 6) + 1] AS t2
        |  FROM documents),
        |n AS (SELECT doc_id, t2, nfc_normalize(t2) AS nt FROM v),
        |s AS (SELECT doc_id, t2, nt,
        |  trim(regexp_replace(regexp_replace(nt, '\\p{Z}+', ' ', 'g'),
        |    '([\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}])',
        |    ' \\1 ', 'g')) AS seg
        |  FROM n)
        |SELECT doc_id,
        | len(regexp_split_to_array(seg, '\\s+')) AS n_utokens,
        | len(regexp_extract_all(nt,
        |   '[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}]')) AS n_cjk,
        | md5(nt) AS norm_hash,
        | len(regexp_split_to_array(trim(t2), '\\s+')) AS n_ws_tokens
        |FROM s""".stripMargin
    },
    "q71_correlated_exists" ->
      """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + 8640000000000
        |    AND l.l_extendedprice > o.o_totalprice * 0.3)""".stripMargin,
    // s07: the oracle replays the ENTIRE graph pipeline — LSH-seeded
    // top-g graph, one NN-Descent 2-hop refinement, entry + 1-hop query
    // expansion, exact-cosine top-k. Valid as a full equality check for
    // the same reason as s02/d05: every stage is a pure deterministic
    // function of the data (same in-index-order double sums, same
    // round(·,6)+id tiebreaks). The multiply-referenced CTEs (b ×10,
    // seed/g1/graph ×2–3) are AS MATERIALIZED: inlining duplicates the
    // whole NN-Descent chain per reference, which the r10 sf1 gate
    // showed going super-linear in DuckDB while the staged execution of
    // the identical stages finishes in seconds.
    "s07_ann_graph" -> {
      def dotOf(x: String, y: String) =
        s"list_aggregate(list_transform(range(1, len($x.embedding) + 1), " +
          s"i -> CAST($x.embedding[i] AS DOUBLE) * $y.embedding[i]), 'sum')"
      ("""WITH b AS MATERIALIZED (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + s"""  FROM embeddings),
        |nv AS (SELECT count(*) AS n_vec FROM embeddings),
        |cand0 AS (
        |  SELECT a.vec_id AS src, c.vec_id AS dst
        |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
        |  UNION
        |  SELECT vec_id AS src, (vec_id * 37 + j.j * 101) % n_vec AS dst
        |  FROM b CROSS JOIN nv CROSS JOIN range(1, 5) j(j)
        |  WHERE (vec_id * 37 + j.j * 101) % n_vec <> vec_id),
        |seed0 AS (SELECT c.src, c.dst,
        |   round(${dotOf("s", "d")} / (s.norm * d.norm), 6) AS sim6
        |  FROM cand0 c JOIN b s ON s.vec_id = c.src JOIN b d ON d.vec_id = c.dst),
        |seed AS MATERIALIZED (SELECT src, dst, sim6 FROM (SELECT *, row_number() OVER (
        |  PARTITION BY src ORDER BY sim6 DESC, dst) AS rn FROM seed0) WHERE rn <= 8),
        |cand1 AS (SELECT DISTINCT src, dst FROM (
        |  SELECT e1.src AS src, e2.dst AS dst FROM seed e1
        |    JOIN seed e2 ON e1.dst = e2.src WHERE e1.src <> e2.dst
        |  UNION ALL SELECT src, dst FROM seed)),
        |sc1 AS (SELECT c.src, c.dst,
        |   round(${dotOf("s", "d")} / (s.norm * d.norm), 6) AS sim6
        |  FROM cand1 c JOIN b s ON s.vec_id = c.src JOIN b d ON d.vec_id = c.dst),
        |g1 AS MATERIALIZED (SELECT src, dst, sim6 FROM (SELECT *, row_number() OVER (
        |  PARTITION BY src ORDER BY sim6 DESC, dst) AS rn FROM sc1) WHERE rn <= 8),
        |cand2 AS (SELECT DISTINCT src, dst FROM (
        |  SELECT e1.src AS src, e2.dst AS dst FROM g1 e1
        |    JOIN g1 e2 ON e1.dst = e2.src WHERE e1.src <> e2.dst
        |  UNION ALL SELECT src, dst FROM g1)),
        |sc2 AS (SELECT c.src, c.dst,
        |   round(${dotOf("s", "d")} / (s.norm * d.norm), 6) AS sim6
        |  FROM cand2 c JOIN b s ON s.vec_id = c.src JOIN b d ON d.vec_id = c.dst),
        |graph AS MATERIALIZED (SELECT src, dst, sim6 FROM (SELECT *, row_number() OVER (
        |  PARTITION BY src ORDER BY sim6 DESC, dst) AS rn FROM sc2) WHERE rn <= 8),
        |entry AS (SELECT src AS query_id, dst AS cand FROM graph WHERE src < 10),
        |hop2 AS (SELECT e.query_id, g.dst AS cand FROM entry e JOIN graph g ON g.src = e.cand),
        |hop3 AS (SELECT h.query_id, g.dst AS cand FROM hop2 h JOIN graph g ON g.src = h.cand),
        |allc AS (SELECT DISTINCT query_id, cand FROM
        |  (SELECT query_id, cand FROM entry UNION ALL SELECT query_id, cand FROM hop2
        |   UNION ALL SELECT query_id, cand FROM hop3)
        |  WHERE cand <> query_id),
        |fin AS (SELECT a.query_id, a.cand AS neighbor_id,
        |   round(${dotOf("q", "n")} / (q.norm * n.norm), 6) AS sim6
        |  FROM allc a JOIN b q ON q.vec_id = a.query_id JOIN b n ON n.vec_id = a.cand),
        |r AS (SELECT query_id, neighbor_id, sim6, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM fin)
        |SELECT query_id, neighbor_id, round(sim6, 4) AS cosine, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3""".stripMargin)
    },
    // d11: the NFC/NFD pair of variants MUST collapse to one norm_hash
    // with n_spellings = 2 — same shared variant list as t12
    "d11_unicode_dedup" -> {
      val lits = graft.operators.TextAnalysis.mixedScriptVariants
        .map(v => "'" + v + "'").mkString("[", ", ", "]")
      s"""WITH p AS (SELECT doc_id, ($lits)[(doc_id % 6) + 1] AS s FROM documents),
        |h AS (SELECT doc_id, md5(nfc_normalize(s)) AS norm_hash, md5(s) AS raw_hash FROM p)
        |SELECT norm_hash, count(*) AS n_copies,
        | count(DISTINCT raw_hash) AS n_spellings, min(doc_id) AS keeper
        |FROM h GROUP BY norm_hash""".stripMargin
    },
    "q73_not_in_nullaware" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_totalprice < 0 THEN NULL ELSE o_custkey END
        |  FROM orders WHERE o_orderstatus = 'F')""".stripMargin,
    "q72_lateral_aggregate" ->
      """SELECT c.c_custkey, t.n_big_orders, t.big_total,
        |  CASE WHEN t.big_total > 50 * c.c_acctbal THEN 1 ELSE 0 END AS over_balance
        |FROM customer c,
        |LATERAL (
        |  SELECT count(*) AS n_big_orders,
        |         round(coalesce(sum(o.o_totalprice), 0), 2) AS big_total
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) t""".stripMargin,
    // s08: full bucketed self-join replay — every stage is a pure
    // function of the data (fixed hyperplanes, exact cosines, id
    // tiebreaks), so equality holds exactly, as in s02/s07. The 8-plane
    // emulation matches autoPlanes' floor at every oracle-gate corpus.
    "s08_knn_join" ->
      ("""WITH b AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM embeddings),
        |p AS (SELECT a.vec_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (a.norm * e.norm), 6) AS sim6
        | FROM b a JOIN b e ON a.bucket = e.bucket AND e.vec_id <> a.vec_id),
        |r AS (SELECT vec_id, neighbor_id, sim6, row_number() OVER (
        |  PARTITION BY vec_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p)
        |SELECT vec_id, neighbor_id, sim6 AS cosine, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3""".stripMargin),
    // s14: s08's in-bucket knn replayed to rank 1, then the reciprocal
    // self-join — mutuality is deterministic because knn ties break by
    // neighbor_id in both engines.
    "s14_mutual_nn" ->
      ("""WITH b AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm,
        |""".stripMargin
        + (0 until 8).map { j =>
          s"""  CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1),
             |    k -> CAST(embedding[k] AS DOUBLE) * sin(${j * 131}.0 + (k - 1) * 0.7)), 'sum') > 0
             |  THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("", " +\n", " AS bucket\n")
        + """  FROM embeddings),
        |p AS (SELECT a.vec_id, e.vec_id AS neighbor_id,
        |  round(
        |    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * e.embedding[i]), 'sum')
        |    / (a.norm * e.norm), 6) AS sim6
        | FROM b a JOIN b e ON a.bucket = e.bucket AND e.vec_id <> a.vec_id),
        |r AS (SELECT vec_id, neighbor_id, sim6, row_number() OVER (
        |  PARTITION BY vec_id ORDER BY sim6 DESC, neighbor_id) AS rn FROM p),
        |m AS (SELECT vec_id, neighbor_id, sim6 FROM r WHERE rn = 1)
        |SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b, a.sim6 AS cosine
        |FROM m a JOIN m b ON a.neighbor_id = b.vec_id AND b.neighbor_id = a.vec_id
        |  AND a.vec_id < b.vec_id""".stripMargin),
    // q74: the oracle states the SPEC (one global rank) directly; the
    // Spark side decomposes it band-wise — the decile formula is spelled
    // arithmetically (integer //) so both engines compute the same split
    "q74_quality_deciles" ->
      """WITH s AS (SELECT doc_id,
        |  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |    / length(text), 4) AS score FROM documents),
        |r AS (SELECT doc_id, score,
        |  row_number() OVER (ORDER BY score DESC, doc_id) AS rn,
        |  count(*) OVER () AS n FROM s)
        |SELECT doc_id, score, CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile
        |FROM r""".stripMargin,
    "q75_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks,
        |  CASE WHEN len(toks) <= 64 THEN 1
        |       ELSE (len(toks) - 64 + 47) // 48 + 1 END AS n_chunks FROM t),
        |e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text
        |FROM e""".stripMargin,
    // q86: the oracle states the global order directly; Spark computes
    // the identical rank via the band prefix-sum (no SinglePartition)
    "q86_global_shard_ids" ->
      """SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS seq,
        |  (row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 8 AS shard
        |FROM documents""".stripMargin,
    // q87: nearest benchmark item per corpus vector + threshold verdict;
    // max_by tiebreak (sim6 desc, bench_id asc) restated as rn = 1. The
    // output cosine rounds the RAW double ONCE (round(sim6, 4) would
    // re-round grid halves, where decimal HALF_UP vs binary rounding
    // diverge — the r10 sf1 find); sim6 stays the order/threshold key.
    "q87_semantic_contamination" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |  sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) AS norm
         |  FROM embeddings),
         |b AS (SELECT vec_id AS bench_id, embedding AS b_emb, norm AS b_norm FROM e WHERE vec_id < 10),
         |p AS (SELECT c.vec_id, b.bench_id,
         |  ${sqlDotF("c.embedding", "b.b_emb")} / (c.norm * b.b_norm) AS sim
         |  FROM e c, b WHERE c.vec_id >= 10),
         |p6 AS (SELECT vec_id, bench_id, sim, round(sim, 6) AS sim6 FROM p),
         |r AS (SELECT vec_id, bench_id, sim, sim6,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY sim6 DESC, bench_id) AS rn FROM p6)
         |SELECT vec_id, bench_id, round(sim, 4) AS cosine, sim6 >= 0.25 AS contaminated
         |FROM r WHERE rn = 1""".stripMargin,
    // q76: DuckDB supports DISTINCT window aggregates natively — the
    // oracle states the semantics directly; Spark computes it via the
    // max-dense_rank identity
    "q76_windowed_distinct" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(count(DISTINCT o_orderpriority)
        |    OVER (PARTITION BY o_custkey) AS BIGINT) AS n_priorities
        |FROM orders""".stripMargin,
    "q77_hierarchy_rollup" ->
      """WITH RECURSIVE up (node, part, rev) AS (
        |  SELECT p.p_partkey // 10, p.p_partkey, r.rev
        |  FROM part p JOIN (
        |    SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |    FROM lineitem GROUP BY l_partkey) r
        |    ON r.l_partkey = p.p_partkey
        |  UNION ALL
        |  SELECT node // 10, part, rev FROM up WHERE node > 0
        |)
        |SELECT node, count(*) AS parts_below,
        |  CAST(round(sum(rev), 2) AS DOUBLE) AS subtree_rev
        |FROM up GROUP BY node""".stripMargin,
    "t13_gopher_quality" ->
      """WITH w AS (SELECT doc_id, text,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |m AS (SELECT doc_id,
        |  len(ws) AS n_words,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(ws) AS mean_len,
        |  CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE) / len(ws) AS sym_r,
        |  CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |    / len(ws) AS alpha_f,
        |  len(list_filter(ws, x ->
        |    regexp_matches(x, '^(the|be|to|of|and|that|have|with)$'))) AS n_stop
        |  FROM w)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(mean_len, 4) AS mean_word_len,
        |  round(sym_r, 6) AS symbol_ratio,
        |  round(alpha_f, 6) AS alpha_word_frac,
        |  CAST(n_stop AS BIGINT) AS n_stopwords,
        |  CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
        |    AND mean_len >= 3.0 AND mean_len <= 10.0
        |    AND sym_r <= 0.1 AND alpha_f >= 0.8 AND n_stop >= 2
        |    THEN 1 ELSE 0 END AS INT) AS passes_gopher
        |FROM m""".stripMargin,
    // q88: LOCF gap-fill — per-hour last tick (row_number desc), lead()
    // to the next observed hour, generate_series over the half-open
    // span; the value is carried verbatim so the hash is bit-exact.
    "q88_gapfill_locf" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h,
        |  epoch_us(ts) AS tsu, event_id, value FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, h
        |    ORDER BY tsu DESC, event_id DESC) AS rn FROM e),
        |s AS (SELECT user_id, h, value,
        |  lead(h) OVER (PARTITION BY user_id ORDER BY h) AS nh
        |  FROM r WHERE rn = 1)
        |SELECT user_id,
        |  strftime(unnest(generate_series(h,
        |    coalesce(nh - INTERVAL 1 HOUR, h), INTERVAL 1 HOUR)),
        |    '%Y-%m-%d %H:%M:%S') AS grid_hour,
        |  value AS value_locf
        |FROM s""".stripMargin,
    "q83_ohlc_hourly" ->
      """WITH e AS (SELECT user_id,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  epoch_us(ts) AS tsu, event_id, value FROM events),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY user_id, hour_start
        |    ORDER BY tsu, event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY user_id, hour_start
        |    ORDER BY tsu DESC, event_id DESC) AS rn_d FROM e)
        |SELECT user_id, hour_start,
        |  round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
        |  round(max(value), 2) AS high,
        |  round(min(value), 2) AS low,
        |  round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
        |  count(*) AS n_ticks
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q82_twap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events),
        |d AS (SELECT user_id, value,
        |  lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) - tsu AS dt_us
        |  FROM e)
        |SELECT user_id,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6)) * dt_us) AS DOUBLE)
        |    / CAST(sum(dt_us) AS DOUBLE), 4) AS twap,
        |  CAST(sum(dt_us) AS BIGINT) AS span_us, count(*) AS n_intervals
        |FROM d WHERE dt_us IS NOT NULL GROUP BY user_id
        |HAVING sum(dt_us) > 0""".stripMargin,
    "q81_sliding_distinct" ->
      """SELECT strftime(date_trunc('hour', ts) - h * INTERVAL 1 HOUR,
        |   '%Y-%m-%d %H:%M:%S') AS window_start,
        | count(DISTINCT user_id) AS distinct_users
        |FROM events, (SELECT unnest(range(0, 6)) AS h) t GROUP BY 1""".stripMargin,
    // q80: each PageRank round MATERIALIZED as a temp table (previous
    // round dropped) instead of one 4-level nested CTE — the nested form
    // kept every round's hash joins live at once and exhausted DuckDB's
    // temp disk at sf1; round-at-a-time bounds the oracle's working set
    // to one |edges| join. Fixed-point integer arithmetic makes every
    // level engine-exact (// == div on the all-positive scores).
    // Multi-statement: the driver's con.execute(sql).fetchdf() runs all
    // statements and fetches the final SELECT (verified on duckdb 1.0).
    "q80_part_pagerank" ->
      """CREATE OR REPLACE TEMP TABLE g80_edges AS
        |  WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |  pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |    FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |    GROUP BY 1, 2 HAVING count(*) >= 2)
        |  SELECT pa AS s, pb AS d FROM pairs UNION ALL SELECT pb, pa FROM pairs;
        |CREATE OR REPLACE TEMP TABLE g80_deg AS
        |  SELECT s AS node, count(*) AS deg FROM g80_edges GROUP BY s;
        |CREATE OR REPLACE TEMP TABLE g80_r0 AS
        |  SELECT node, CAST(1000000 AS BIGINT) AS r FROM g80_deg;
        |CREATE OR REPLACE TEMP TABLE g80_r1 AS
        |  SELECT dd.node, CAST(150000 + coalesce(i.c, 0) * 85 // 100 AS BIGINT) AS r
        |  FROM g80_deg dd LEFT JOIN (SELECT e.d AS node, sum(r.r // g.deg) AS c
        |    FROM g80_edges e JOIN g80_r0 r ON r.node = e.s JOIN g80_deg g ON g.node = e.s
        |    GROUP BY e.d) i USING (node);
        |DROP TABLE g80_r0;
        |CREATE OR REPLACE TEMP TABLE g80_r2 AS
        |  SELECT dd.node, CAST(150000 + coalesce(i.c, 0) * 85 // 100 AS BIGINT) AS r
        |  FROM g80_deg dd LEFT JOIN (SELECT e.d AS node, sum(r.r // g.deg) AS c
        |    FROM g80_edges e JOIN g80_r1 r ON r.node = e.s JOIN g80_deg g ON g.node = e.s
        |    GROUP BY e.d) i USING (node);
        |DROP TABLE g80_r1;
        |CREATE OR REPLACE TEMP TABLE g80_r3 AS
        |  SELECT dd.node, CAST(150000 + coalesce(i.c, 0) * 85 // 100 AS BIGINT) AS r
        |  FROM g80_deg dd LEFT JOIN (SELECT e.d AS node, sum(r.r // g.deg) AS c
        |    FROM g80_edges e JOIN g80_r2 r ON r.node = e.s JOIN g80_deg g ON g.node = e.s
        |    GROUP BY e.d) i USING (node);
        |DROP TABLE g80_r2; DROP TABLE g80_edges; DROP TABLE g80_deg;
        |SELECT node AS part, r AS rank_micro FROM g80_r3""".stripMargin,
    // q84: forward-edge (a<b) triangle enumeration — every triangle
    // produced once; wedge counts exact (deg·(deg−1) is even)
    "q84_triangle_stats" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tpn AS (SELECT part, count(*) AS n_triangles FROM (
        |    SELECT x AS part FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) t
        |  GROUP BY 1),
        |deg AS (SELECT part, count(*) AS degree FROM (
        |    SELECT a AS part FROM e UNION ALL SELECT b FROM e) d GROUP BY 1)
        |SELECT deg.part, deg.degree, coalesce(tpn.n_triangles, 0) AS n_triangles,
        |  CAST(deg.degree * (deg.degree - 1) / 2 AS BIGINT) AS n_wedges
        |FROM deg LEFT JOIN tpn ON deg.part = tpn.part""".stripMargin,
    // q85: integer-permille skew factors; deterministic top-N via the
    // (n DESC, key) tiebreak on both engines
    "q85_skew_diagnostics" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
        |s AS (SELECT sum(n) AS total, count(*) AS n_keys FROM c)
        |SELECT c.l_suppkey, c.n,
        |  CAST(c.n * s.n_keys * 1000 // CAST(s.total AS BIGINT) AS BIGINT) AS skew_permille
        |FROM c, s ORDER BY c.n DESC, c.l_suppkey LIMIT 20""".stripMargin,
    // m03: oracle predicts the luma mean over the SAMPLED (every-2nd)
    // frames arithmetically from the animated two-band layout
    "m03_video_pipeline" ->
      """WITH p AS (SELECT doc_id,
        |  16 + (n_chars % 32) AS w, 16 + ((n_chars * 7) % 32) AS h,
        |  doc_id % 256 AS g1, (doc_id * 7 + 31) % 256 AS g2,
        |  4 + doc_id % 5 AS nf FROM documents),
        |c AS (SELECT doc_id, w, h, nf, (nf + 1) // 2 AS ns,
        |  list_aggregate(list_transform(list_filter(range(0, nf), f -> f % 2 = 0),
        |    f -> h * ((w // 2) * ((g1 + 5 * f) % 256)
        |            + (w - w // 2) * ((g2 + 11 * f) % 256))), 'sum') AS lsum
        |  FROM p)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, CAST(ns AS BIGINT) AS n_sampled,
        |  CAST(w AS BIGINT) AS vid_w, CAST(h AS BIGINT) AS vid_h,
        |  round(CAST(lsum AS DOUBLE) / (ns * w * h), 4) AS avg_luma
        |FROM c""".stripMargin,
    // m02: like m01, the oracle predicts the DECODED stats arithmetically
    // from the deterministic waveform layout — a corrupted WAV round trip
    // (encode, container parse, sample decode) fails the hash
    "m02_audio_pipeline" ->
      """WITH p AS (SELECT doc_id,
        |  2048 + (n_chars * 31) % 2048 AS n,
        |  8000 + (doc_id % 4) * 4000 AS rate,
        |  16 + doc_id % 48 AS hp,
        |  1000 + (doc_id * 13) % 20000 AS a1,
        |  1000 + (n_chars * 17) % 20000 AS a2 FROM documents)
        |SELECT doc_id,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
        |  CAST(greatest(a1, a2) AS BIGINT) AS peak,
        |  round(CAST((n // 2) * a1 + (n - n // 2) * a2 AS DOUBLE) / n, 4) AS mean_abs,
        |  CAST((n - 1) // hp AS BIGINT) AS n_zero_cross,
        |  CAST((n + 255) // 256 AS BIGINT) AS n_windows
        |FROM p""".stripMargin,
    // q79: the stage compositions restated — d01 keepers, q44 overlap,
    // t02 score — in one SQL pipeline, same thresholds
    "q79_curation_pipeline" ->
      """WITH k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |    i -> array_to_string(words[i:i+4], ' '))) AS g FROM w) t),
        |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 50),
        |bad AS (SELECT t.doc_id FROM (SELECT doc_id, g FROM sh WHERE doc_id >= 50) t
        |  JOIN bench b ON t.g = b.g GROUP BY t.doc_id
        |  HAVING CAST(count(*) AS DOUBLE) /
        |    (SELECT count(*) FROM sh s2 WHERE s2.doc_id = t.doc_id) >= 0.5)
        |SELECT d.doc_id, d.lang,
        |  round(CAST(length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |    / length(d.text), 4) AS alpha_ratio,
        |  d.n_chars
        |FROM documents d
        |JOIN k ON k.doc_id = d.doc_id
        |WHERE d.doc_id >= 50
        |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)
        |  AND round(CAST(length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |    / length(d.text), 4) >= 0.81""".stripMargin,
    "q78_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS next_type FROM events),
        |c AS (SELECT event_type AS src, next_type AS dst, count(*) AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
        |FROM c""".stripMargin,
  )
}
