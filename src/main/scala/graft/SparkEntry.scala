package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` keys correspond 1:1 to SURVEY.md §2's operator inventory;
  * `oracleSql` holds the DuckDB-equivalent SQL for each hash-compared
  * entry (rows-only entries are intentionally absent from `oracleSql`).
  *
  * Reference: `diewaldnicole/dsia_big_data` — at the mirrored revision
  * the repo holds only its README (/root/reference/README.md:1-2,
  * "project for big data processing, dsia.bbm.19"); the capability
  * surface is reconstructed in SURVEY.md §1 and implemented
  * Spark-first throughout.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03ShippingPriority(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> Relational.q01PricingSummary _,
    "q02_filter_project"    -> Relational.q02FilterProject _,
    "q03_shipping_priority" -> Relational.q03ShippingPriority _,
    "q04_order_priority"    -> Relational.q04OrderPriority _,
    "q05_local_supplier"    -> Relational.q05LocalSupplier _,
    "q06_forecast_revenue"  -> Relational.q06ForecastRevenue _,
    "q07_no_order_customers" -> Relational.q07NoOrderCustomers _,
    "q08_topk_orders"       -> Relational.q08TopkOrders _,
    "q09_window_rank"       -> Relational.q09WindowRank _,
    "q10_window_running"    -> Relational.q10WindowRunning _,
    "q11_distinct_agg"      -> Relational.q11DistinctAgg _,
    "q12_conditional_agg"   -> Relational.q12ConditionalAgg _,
    "q13_order_histogram"   -> Relational.q13OrderHistogram _,
    "q14_above_avg_parts"   -> Relational.q14AboveAvgParts _,
    "q15_union_segments"    -> Relational.q15UnionSegments _,
    "q16_rollup_sales"      -> Relational.q16RollupSales _,
    "q17_cube_sales"        -> Relational.q17CubeSales _,
    "q18_pivot_status"      -> Relational.q18PivotStatus _,
    "q19_exists_big_orders" -> Relational.q19ExistsBigOrders _,
    "q20_string_ops"        -> Relational.q20StringOps _,
    "q21_monthly_revenue"   -> Relational.q21MonthlyRevenue _,
    "q22_multi_sort"        -> Relational.q22MultiSort _,
    "q23_percentiles"       -> Relational.q23Percentiles _,
    "q24_topk_agg"          -> Relational.q24TopkAgg _,
    "q25_set_ops"           -> Relational.q25SetOps _,
    "q26_full_outer"        -> Relational.q26FullOuter _,
    "q27_window_suite"      -> Relational.q27WindowSuite _,
    "q28_range_join"        -> Relational.q28RangeJoin _,
    "q29_sql_surface"       -> Relational.q29SqlSurface _,
    "q30_typed_api"         -> Relational.q30TypedApi _,
    "q31_above_segment_avg" -> Relational.q31AboveSegmentAvg _,
    "tx11_stopword_filter"  -> Text.tx11StopwordFilter _,
    "ev01_tumbling_counts"  -> Events.ev01TumblingCounts _,
    "ev02_sessionize"       -> Events.ev02Sessionize _,
    "ev03_funnel"           -> Events.ev03Funnel _,
    "ev04_retention"        -> Events.ev04Retention _,
    "ev05_json_props"       -> Events.ev05JsonProps _,
    "ev06_asof_join"        -> Events.ev06AsofJoin _,
    "ev07_event_dedup"      -> Events.ev07EventDedup _,
    "ev08_salted_agg"       -> Events.ev08SaltedAgg _,
    "ev09_asof_native"      -> Events.ev09AsofNative _,
    "tx01_token_stats"      -> Text.tx01TokenStats _,
    "tx02_quality_score"    -> Text.tx02QualityScore _,
    "tx03_langid"           -> Text.tx03Langid _,
    "tx04_fingerprint"      -> Text.tx04Fingerprint _,
    "tx05_bigram_freq"      -> Text.tx05BigramFreq _,
    "tx06_token_count"      -> Text.tx06TokenCount _,
    "tx07_hash_sample"      -> Text.tx07HashSample _,
    "tx08_tfidf"            -> Text.tx08Tfidf _,
    "dd06_dup_clusters"     -> Dedup.dd06DupClusters _,
    "dd07_keep_best"        -> Dedup.dd07KeepBest _,
    "dd01_exact"            -> Dedup.dd01Exact _,
    "dd02_minhash_lsh"      -> Dedup.dd02MinhashLsh _,
    "dd03_simhash"          -> Dedup.dd03Simhash _,
    "dd04_ngram_jaccard"    -> Dedup.dd04NgramJaccard _,
    "dd05_embed_neardup"    -> Dedup.dd05EmbedNeardup _,
    "ss01_brute_topk"       -> Similarity.ss01BruteTopk _,
    "ss02_lsh_topk"         -> Similarity.ss02LshTopk _,
    "ss03_centroid_outliers" -> Similarity.ss03CentroidOutliers _,
    "ss04_knn_classify"     -> Similarity.ss04KnnClassify _,
    "ss05_ivf_topk"         -> Similarity.ss05IvfTopk _,
    "ev10_sliding_windows"  -> Events.ev10SlidingWindows _,
    "ev11_upsert_merge"     -> Events.ev11UpsertMerge _,
    "ev12_user_features"    -> Events.ev12UserFeatures _,
    "tx09_normalize"        -> Text.tx09Normalize _,
    "tx10_rolling_hash"     -> Text.tx10RollingHash _,
    "mm04_feature_extract"  -> Multimodal.mm04FeatureExtract _,
    "mm01_binary_meta"      -> Multimodal.mm01BinaryMeta _,
    "mm02_frame_sample"     -> Multimodal.mm02FrameSample _,
    "mm03_chunking"         -> Multimodal.mm03Chunking _,
    "pp01_training_pipeline" -> Pipelines.pp01TrainingPipeline _,
    "q32_grouping_sets"     -> Relational.q32GroupingSets _,
    "q33_argminmax"         -> Relational.q33ArgMinMax _,
    "q34_array_agg"         -> Relational.q34ArrayAgg _,
    "q35_gaps_islands"      -> Relational.q35GapsIslands _,
    "q36_ratio_to_report"   -> Relational.q36RatioToReport _,
    "ev13_transitions"      -> Events.ev13Transitions _,
    "ev14_rolling_7d"       -> Events.ev14Rolling7dActive _,
    "ev15_top_gaps"         -> Events.ev15TopGaps _,
    "tx12_pii_redact"       -> Text.tx12PiiRedact _,
    "tx13_word_dedup"       -> Text.tx13WordDedup _,
    "tx14_char_ngrams"      -> Text.tx14CharNgrams _,
    "tx15_vocab_coverage"   -> Text.tx15VocabCoverage _,
    "dd08_chunk_dup"        -> Dedup.dd08ChunkDup _,
    "dd12_token_windows"    -> Dedup.dd12TokenWindowDup _,
    "dd13_threshold_curve"  -> Dedup.dd13ThresholdCurve _,
    "ev32_seasonality"      -> Events.ev32Seasonality _,
    "tx25_source_quality"   -> Text.tx25SourceQuality _,
    "ss06_range_search"     -> Similarity.ss06RangeSearch _,
    "ss07_mips_topk"        -> Similarity.ss07MipsTopk _,
    "mm05_size_histogram"   -> Multimodal.mm05SizeHistogram _,
    "pp02_chunk_audit"      -> Pipelines.pp02ChunkDedupAudit _,
    "sk01_hll_users"        -> Sketches.sk01HllUsers _,
    "sk02_quantile_sketch"  -> Sketches.sk02QuantileSketch _,
    "sk03_cms_tokens"       -> Sketches.sk03CmsTokenCounts _,
    "q37_notin_antijoin"    -> Relational.q37NotinAntijoin _,
    "q38_rank_suite"        -> Relational.q38RankSuite _,
    "ev16_windowed_funnel"  -> Events.ev16WindowedFunnel _,
    "ev17_rfm_scores"       -> Events.ev17RfmScores _,
    "tx16_length_band"      -> Text.tx16LengthBand _,
    "pp03_audited_set"      -> Pipelines.pp03AuditedTrainingSet _,
    "ev18_asof_tolerance"   -> Events.ev18AsofTolerance _,
    "gr01_triangle_count"   -> Graph.gr01TriangleCount _,
    "gr02_degree_dist"      -> Graph.gr02DegreeDist _,
    "tx17_rare_bigrams"     -> Text.tx17RareBigrams _,
    "ev19_out_of_order"     -> Events.ev19OutOfOrder _,
    "ev20_validity_intervals" -> Events.ev20ValidityIntervals _,
    "dd09_minhash_est"      -> Dedup.dd09MinhashEstimate _,
    "gr03_pagerank"         -> Graph.gr03PageRank _,
    "ev21_funnel_latency"   -> Events.ev21FunnelLatency _,
    "q39_moving_avg"        -> Relational.q39MovingAvg _,
    "ss08_sq8_rerank"       -> Similarity.ss08Sq8Rerank _,
    "sk04_kll_quantiles"    -> Sketches.sk04KllQuantiles _,
    "ev22_top_paths"        -> Events.ev22TopPaths _,
    "mm06_chunk_manifest"   -> Multimodal.mm06ChunkManifest _,
    "ev23_type_lift"        -> Events.ev23TypeLift _,
    "tx18_char_classes"     -> Text.tx18CharClasses _,
    "ev24_time_range_join"  -> Events.ev24TimeRangeJoin _,
    "q40_lateral_explode"   -> Relational.q40LateralExplode _,
    "dd10_containment"      -> Dedup.dd10Containment _,
    "mm07_magic_bytes"      -> Multimodal.mm07MagicBytes _,
    "sk05_bloom_prejoin"    -> Sketches.sk05BloomPrejoin _,
    "q41_range_frame"       -> Relational.q41RangeFrame _,
    "ss09_ann_recall"       -> Similarity.ss09AnnRecall _,
    "ss10_pq_topk"          -> Similarity.ss10PqTopk _,
    "ss11_embedding_audit"  -> Similarity.ss11EmbeddingAudit _,
    "pp04_session_features" -> Pipelines.pp04UserSessionFeatures _,
    "gr04_common_neighbors" -> Graph.gr04CommonNeighbors _,
    "gr15_wedge_audit"      -> Graph.gr15WedgeAudit _,
    "q42_bag_set_ops"       -> Relational.q42BagSetOps _,
    "ev25_anomaly_days"     -> Events.ev25AnomalyDays _,
    "tx19_dedup_impact"     -> Text.tx19DedupImpact _,
    "q43_join_skew_audit"   -> Relational.q43JoinSkewAudit _,
    "q44_bucketed_join"     -> Relational.q44BucketedJoin _,
    "ev26_watermark_horizon" -> Events.ev26WatermarkHorizon _,
    "dd11_index_stats"      -> Dedup.dd11IndexStats _,
    "ev27_cohort_ltv"       -> Events.ev27CohortLtv _,
    "ev28_decay_scores"     -> Events.ev28DecayScores _,
    "ev29_session_durations" -> Events.ev29SessionDurations _,
    "ev30_stickiness"       -> Events.ev30Stickiness _,
    "ev31_multistep_funnel" -> Events.ev31MultiStepFunnel _,
    "tx23_repetition"       -> Text.tx23RepetitionScore _,
    "tx24_lang_confusion"   -> Text.tx24LangConfusion _,
    "pp05_incremental_ingest" -> Pipelines.pp05IncrementalIngest _,
    "gr05_kcore"            -> Graph.gr05KCore _,
    "tx20_ttr"              -> Text.tx20TypeTokenRatio _,
    "tx21_bigram_lm"        -> Text.tx21BigramLm _,
    "tx22_zipf_head"        -> Text.tx22ZipfHead _,
    "q45_decimal_money"     -> Relational.q45DecimalMoney _,
    "q46_window_distinct"   -> Relational.q46WindowDistinct _,
    "tx26_novelty"          -> Text.tx26Novelty _,
    "mm08_sig_neardup"      -> Multimodal.mm08SigNeardup _,
    "sk06_theta_sets"       -> Sketches.sk06ThetaSets _,
    "pp06_training_mix"     -> Pipelines.pp06TrainingMix _,
    "tx27_gopher_rules"     -> Text.tx27GopherRules _,
    "ev33_interarrival"     -> Events.ev33InterArrival _,
    "pp07_decontam"         -> Pipelines.pp07Decontam _,
    "pp08_stratified_sample" -> Pipelines.pp08StratifiedSample _,
    "sk07_hll_rollup"       -> Sketches.sk07HllRollup _,
    "q47_higher_order"      -> Relational.q47HigherOrder _,
    "gr06_minlabel"         -> Graph.gr06MinLabel _,
    "pp09_quality_gate"     -> Pipelines.pp09QualityGate _,
    "ss12_mmr_topk"         -> Similarity.ss12MmrTopk _,
    "tx28_vocab_growth"     -> Text.tx28VocabGrowth _,
    "mm09_gc_audit"         -> Multimodal.mm09GcAudit _,
    "q48_calendar_ops"      -> Relational.q48CalendarOps _,
    "q49_hot_cold_join"     -> Relational.q49HotColdJoin _,
    "sk08_bottomk_sample"   -> Sketches.sk08BottomkSample _,
    "tx29_bigram_coverage"  -> Text.tx29BigramCoverage _,
    "q50_null_semantics"    -> Relational.q50NullSemantics _,
    "dd14_simhash_precision" -> Dedup.dd14SimhashPrecision _,
    "ev34_weekday_anomaly"  -> Events.ev34WeekdayAnomaly _,
    "dd15_edit_neardup"     -> Dedup.dd15EditNearDup _,
    "tx30_boilerplate"      -> Text.tx30Boilerplate _,
    "pp10_temperature_mix"  -> Pipelines.pp10TemperatureMix _,
    "gr07_personalized_pr"  -> Graph.gr07PersonalizedPr _,
    "tx31_adaptive_stopwords" -> Text.tx31AdaptiveStopwords _,
    "ev35_attribution"      -> Events.ev35Attribution _,
    "gr08_link_predict"     -> Graph.gr08LinkPredict _,
    "pp11_drop_reasons"     -> Pipelines.pp11DropReasons _,
    "pp12_column_profile"   -> Pipelines.pp12ColumnProfile _,
    "q51_dpp_join"          -> Relational.q51DppJoin _,
    "dd16_semantic_dedup"   -> Dedup.dd16SemanticDedup _,
    "tx32_rare_tokens"      -> Text.tx32RareTokens _,
    "ev36_peak_concurrency" -> Events.ev36PeakConcurrency _,
    "sk09_heavy_hitters"    -> Sketches.sk09HeavyHitters _,
    "pp13_pack_manifest"    -> Pipelines.pp13PackManifest _,
    "pp14_shard_plan"       -> Pipelines.pp14ShardPlan _,
    "pp15_quality_weighted" -> Pipelines.pp15QualityWeighted _,
    "tx33_bpe_pairs"        -> Text.tx33BpePairs _,
    "tx34_source_divergence" -> Text.tx34SourceDivergence _,
    "ev37_burst_days"       -> Events.ev37BurstDays _,
    "ev38_linear_attribution" -> Events.ev38LinearAttribution _,
    "pp16_split_leakage"    -> Pipelines.pp16SplitLeakage _,
    "tx35_token_ids"        -> Text.tx35TokenIds _,
    "q52_merge_clauses"     -> Relational.q52MergeClauses _,
    "ss13_filtered_topk"    -> Similarity.ss13FilteredTopk _,
    "mm10_cdc_chunks"       -> Multimodal.mm10CdcChunks _,
    "q53_recursive_cte"     -> Relational.q53RecursiveCte _,
    "q54_unpivot"           -> Relational.q54Unpivot _,
    "ev39_twap"             -> Events.ev39Twap _,
    "ev40_ohlc"             -> Events.ev40Ohlc _,
    "gr09_cluster_coeff"    -> Graph.gr09ClusterCoeff _,
    "sk10_power_sums"       -> Sketches.sk10PowerSums _,
    "tx36_sentence_stats"   -> Text.tx36SentenceStats _,
    "ev41_locf"             -> Events.ev41Locf _,
    "q55_variant"           -> Relational.q55Variant _,
    "q56_shuffle_hash_hint" -> Relational.q56ShuffleHashHint _,
    "q57_try_ops"           -> Relational.q57TryOps _,
    "gr10_modularity"       -> Graph.gr10Modularity _,
    "q58_map_surface"       -> Relational.q58MapSurface _,
    "ev42_cusum_drift"      -> Events.ev42CusumDrift _,
    "tx37_simpson"          -> Text.tx37Simpson _,
    "pp17_epoch_schedule"   -> Pipelines.pp17EpochSchedule _,
    "q59_sufficient_stats"  -> Relational.q59SufficientStats _,
    "q60_nullsafe_join"     -> Relational.q60NullsafeJoin _,
    "ev43_streaks"          -> Events.ev43Streaks _,
    "dd17_prefix_dups"      -> Dedup.dd17PrefixDups _,
    "pp18_snapshot_diff"    -> Pipelines.pp18SnapshotDiff _,
    "tx38_readability"      -> Text.tx38Readability _,
    "gr11_assortativity"    -> Graph.gr11Assortativity _,
    "ev44_pareto"           -> Events.ev44Pareto _,
    "mm11_placement"        -> Multimodal.mm11PlacementPlan _,
    "ss14_ivfpq_topk"       -> Similarity.ss14IvfPqTopk _,
    "ev45_markov"           -> Events.ev45Markov _,
    "pp19_token_budget"     -> Pipelines.pp19TokenBudget _,
    "tx39_bigram_lift"      -> Text.tx39BigramLift _,
    "q61_percentile_disc"   -> Relational.q61PercentileDisc _,
    "ev46_alert_episodes"   -> Events.ev46AlertEpisodes _,
    "tx40_skipgrams"        -> Text.tx40Skipgrams _,
    "gr12_coengagement"     -> Graph.gr12Coengagement _,
    "dd18_winnowing"        -> Dedup.dd18Winnowing _,
    "ev47_growth_accounting" -> Events.ev47GrowthAccounting _,
    "ev48_autocorr"         -> Events.ev48Autocorr _,
    "tx41_compressibility"  -> Text.tx41Compressibility _,
    "ss15_kmeans"           -> Similarity.ss15Kmeans _,
    "dd19_bow_dedup"        -> Dedup.dd19BowDedup _,
    "pp20_refresh_set"      -> Pipelines.pp20RefreshSet _,
    "dd20_ppjoin"           -> Dedup.dd20PpjoinJaccard _,
    "sk11_bootstrap"        -> Sketches.sk11Bootstrap _,
    "q62_only_late_supplier" -> Relational.q62OnlyLateSupplier _,
    "gr13_hits"             -> Graph.gr13Hits _,
    "ev49_browse_no_buy"    -> Events.ev49BrowseNoBuy _,
    "pp21_curriculum"       -> Pipelines.pp21Curriculum _,
    "pp22_sequence_packing" -> Pipelines.pp22SequencePacking _,
    "pp23_weighted_sample"  -> Pipelines.pp23WeightedSample _,
    "tx42_ngram_novelty"    -> Text.tx42NgramNovelty _,
    "tx43_signal_sweep"     -> Text.tx43SignalSweep _,
    "pp24_run_manifest"     -> Pipelines.pp24RunManifest _,
    "q63_lead_time_sla"     -> Relational.q63LeadTimeSla _,
    "q64_auto_salt"         -> Relational.q64AutoSalt _,
    "pp25_k_anonymity"      -> Pipelines.pp25KAnonymity _,
    "dd21_semantic_clusters" -> Dedup.dd21SemanticClusters _,
    "dd22_span_dedup"       -> Dedup.dd22SpanDedup _,
    "gr14_bfs_distances"    -> Graph.gr14BfsDistances _,
    "ev50_user_diversity"   -> Events.ev50UserDiversity _,
    "tx44_commonness"       -> Text.tx44Commonness _,
    "tx45_bpe_merges"       -> Text.tx45BpeMerges _,
    "tx46_bpe_encode"       -> Text.tx46BpeEncode _,
    "ss16_nprobe_curve"     -> Similarity.ss16NprobeCurve _,
    "ss17_index_refresh"    -> Similarity.ss17IndexRefresh _,
    "pp26_mix_rebalance"    -> Pipelines.pp26MixRebalance _,
    "mm12_dedup_savings"    -> Multimodal.mm12DedupSavings _,
    "gr16_cc_twostar"       -> Graph.gr16CcTwostar _,
    "tx47_surprise"         -> Text.tx47Surprise _,
    "dd23_batch_dedup"      -> Dedup.dd23BatchDedup _,
    "ss18_knn_join"         -> Similarity.ss18KnnJoin _,
    "q65_mv_rewrite"        -> Relational.q65MvRewrite _,
    "dd24_lsh_tuner"        -> Dedup.dd24LshTuner _,
    "dd25_dup_weights"      -> Dedup.dd25DupWeights _,
    "pp27_fuzzy_decontam"   -> Pipelines.pp27FuzzyDecontam _,
    "tx48_bigram_surprise"  -> Text.tx48BigramSurprise _,
    "mm13_interleave_pack"  -> Multimodal.mm13InterleavePack _,
    "gr17_ktruss"           -> Graph.gr17KTruss _,
    "tx49_code_detect"      -> Text.tx49CodeDetect _,
    "pp28_contam_report"    -> Pipelines.pp28ContamReport _,
    "ev51_pattern_negation" -> Events.ev51PatternNegation _,
    "gr18_truss_communities" -> Graph.gr18TrussCommunities _,
    "ss19_hybrid_rrf"       -> Similarity.ss19HybridRrf _,
    "ev52_conversion_curve" -> Events.ev52ConversionCurve _,
    "q66_runtime_bloom"     -> Relational.q66RuntimeBloom _,
    "q67_skyline"           -> Relational.q67Skyline _,
    "ev53_seasonal_naive"   -> Events.ev53SeasonalNaive _,
    "tx50_subword_vocab"    -> Text.tx50SubwordVocab _,
    "pp29_inference_batches" -> Pipelines.pp29InferenceBatches _,
    "ss20_quota_topk"       -> Similarity.ss20QuotaTopk _,
    "ss21_bm25_topk"        -> Similarity.ss21Bm25Topk _,
    "ss22_nsw_topk"         -> Similarity.ss22NswTopk _,
    "pp30_data_constrained" -> Pipelines.pp30DataConstrained _,
    "pp31_soft_mix"         -> Pipelines.pp31SoftMix _,
    "pp32_purge_impact"     -> Pipelines.pp32PurgeImpact _,
    "ev54_bot_detect"       -> Events.ev54BotDetect _,
    "pp33_domain_caps"      -> Pipelines.pp33DomainCaps _,
    "ss23_hybrid_bm25"      -> Similarity.ss23HybridBm25 _,
    "dd26_chain_risk"       -> Dedup.dd26ChainRisk _,
    "dd27_safe_clusters"    -> Dedup.dd27SafeClusters _,
    "pp34_cap_curve"        -> Pipelines.pp34CapCurve _,
    "sk12_sliding_hll"      -> Sketches.sk12SlidingHll _,
    "dd28_safe_keep_best"   -> Dedup.dd28SafeKeepBest _,
    "ev55_churn_cohorts"    -> Events.ev55ChurnCohorts _,
    "mm14_repair_plan"      -> Multimodal.mm14RepairPlan _,
    "pp35_temp_curve"       -> Pipelines.pp35TempCurve _,
    "q71_contingency"       -> Relational.q71Contingency _,
    "pp36_worker_schedule"  -> Pipelines.pp36WorkerSchedule _,
    "tx51_hapax_profile"    -> Text.tx51HapaxProfile _,
    "q68_equidepth_hist"    -> Relational.q68EquidepthHist _,
    "q69_assoc_rules"       -> Relational.q69AssocRules _,
    "q70_dq_expectations"   -> Relational.q70DqExpectations _,
    "pp37_patch_postings"   -> Pipelines.pp37PatchPostings _,
    "pp38_patch_ivf"        -> Pipelines.pp38PatchIvf _,
    "pp39_patch_clusters"   -> Pipelines.pp39PatchClusters _,
    "q72_selectivity"       -> Relational.q72SelectivityCorrect _,
    "q73_stats_routed_join" -> Relational.q73StatsRoutedJoin _,
    "ss24_hybrid_walk"      -> Similarity.ss24HybridWalk _,
    "ss25_knn_upsert"       -> Similarity.ss25KnnUpsert _,
    "ss26_knn_purge"        -> Similarity.ss26KnnPurge _,
    "ev56_gated_features"   -> Events.ev56GatedFeatures _,
    "ev57_gated_rfm"        -> Events.ev57GatedRfm _,
    "pp42_gated_sessions"   -> Pipelines.pp42GatedSessions _,
    "pp43_cluster_upsert"   -> Pipelines.pp43ClusterUpsert _,
    "pp44_upsert_lexicon"   -> Pipelines.pp44UpsertLexicon _,
    "pp45_patch_safe"       -> Pipelines.pp45PatchSafe _,
    "pp40_patch_lexicon"    -> Pipelines.pp40PatchLexicon _,
    "mm15_purge_chunks"     -> Multimodal.mm15PurgeChunks _,
    "pp41_index_upsert"     -> Pipelines.pp41IndexUpsert _,
    "dd29_dup_inflation"    -> Dedup.dd29DupInflation _,
    "dd30_cap_audit"        -> Dedup.dd30CapAudit _,
    "ev58_second_order"     -> Events.ev58SecondOrderPaths _,
    "pp46_dedup_quota"      -> Pipelines.pp46DedupQuota _,
    "dd31_lsh_recall"       -> Dedup.dd31LshRecall _,
    "ev59_mad_anomaly"      -> Events.ev59MadAnomaly _,
    "pp47_cluster_split"    -> Pipelines.pp47ClusterSplit _,
    "pp48_dataset_card"     -> Pipelines.pp48DatasetCard _,
    "sk13_ams_f2"           -> Sketches.sk13AmsF2 _,
    "dd32_cross_source"     -> Dedup.dd32CrossSourceDups _,
    "dd33_banding_advisor"  -> Dedup.dd33BandingAdvisor _,
    "gr19_two_hop"          -> Graph.gr19TwoHopReach _,
    "mm16_tier_plan"        -> Multimodal.mm16TierPlan _,
    "sk14_ams_route"        -> Sketches.sk14AmsRoute _,
    "dd34_prod_recall"      -> Dedup.dd34ProdRecall _,
    "ss27_filtered_route"   -> Similarity.ss27FilteredRoute _,
    "dd35_cluster_cohesion" -> Dedup.dd35ClusterCohesion _,
    "sk15_theta_diff"       -> Sketches.sk15ThetaDiff _,
    "ss28_keep_curve"       -> Similarity.ss28KeepCurve _,
    "dd36_keeper_policy"    -> Dedup.dd36KeeperPolicy _,
    "pp49_upsert_safe"      -> Pipelines.pp49UpsertSafe _,
    "pp50_policy_training_set" -> Pipelines.pp50PolicyTrainingSet _,
    "dd37_policy_curve"     -> Dedup.dd37PolicyCurve _,
    "pp51_patch_policy"     -> Pipelines.pp51PatchPolicy _,
    "ss29_pq_m_curve"       -> Similarity.ss29PqMCurve _,
    "ev60_cuped"            -> Events.ev60Cuped _,
    "ev61_srm_check"        -> Events.ev61SrmCheck _,
    "ev62_diff_in_diff"     -> Events.ev62DiffInDiff _,
    "dd38_bbit_minhash"     -> Dedup.dd38BbitMinhash _,
  )

  /** ss22's NSW walk replayed hop by hop (the kNN-join graph
    * symmetrized, dual entries, 3 unrolled expand-and-prune rounds on
    * (cosine DESC, vec_id) beams of 8) through the final-beam CTE
    * `b3` — shared by ss22 (top-5 cut) and ss24 (top-8 vector tier). */
  private lazy val nswWalkCtes: String =
    s"""WITH knn AS ($knnJoinSql),
       |e0 AS (SELECT qid AS src, neighbor_id AS dst FROM knn
       |       WHERE qid >= 10 AND neighbor_id >= 10),
       |edges AS (SELECT DISTINCT src, dst FROM
       |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
       |q AS (SELECT vec_id AS qid, embedding AS qe
       |      FROM embeddings WHERE vec_id < 10),
       |entry AS (SELECT min(vec_id) AS vec_id FROM embeddings
       |          WHERE vec_id >= 10),
       |cx AS (SELECT vec_id, label, i,
       |       CAST(embedding[i+1] AS DOUBLE) AS x
       |     FROM embeddings, range(64) r(i)),
       |cc AS (SELECT label AS cell, i, avg(x) AS c FROM cx GROUP BY 1, 2),
       |cvc AS (SELECT cx.vec_id, cc.cell,
       |         sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS ccos
       |       FROM cx JOIN cc ON cx.i = cc.i GROUP BY 1, 2),
       |casg AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY ccos DESC, cell) AS crk FROM cvc) z WHERE crk = 1),
       |qc AS (SELECT vec_id AS qid, cell FROM casg WHERE vec_id < 10),
       |ecell AS (SELECT qid, vec_id FROM (
       |    SELECT qc.qid, casg.vec_id, row_number() OVER (
       |        PARTITION BY qc.qid
       |        ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC,
       |                 casg.vec_id) AS rk
       |    FROM qc JOIN casg ON casg.cell = qc.cell AND casg.vec_id >= 10
       |    JOIN embeddings c ON c.vec_id = casg.vec_id
       |    JOIN q ON q.qid = qc.qid) z WHERE rk = 1),
       |b0 AS (SELECT DISTINCT qid, vec_id FROM (
       |    SELECT q.qid, entry.vec_id FROM q CROSS JOIN entry
       |    UNION ALL
       |    SELECT qid, vec_id FROM ecell) u),
       |x1 AS (SELECT DISTINCT qid, vec_id FROM (
       |    SELECT qid, vec_id FROM b0
       |    UNION ALL
       |    SELECT b0.qid, e.dst AS vec_id FROM b0
       |    JOIN edges e ON e.src = b0.vec_id)),
       |b1 AS (SELECT qid, vec_id FROM (
       |    SELECT x1.qid, x1.vec_id, row_number() OVER (PARTITION BY x1.qid
       |      ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC,
       |               x1.vec_id) AS rk
       |    FROM x1 JOIN embeddings c ON c.vec_id = x1.vec_id
       |    JOIN q ON q.qid = x1.qid) z WHERE rk <= 8),
       |x2 AS (SELECT DISTINCT qid, vec_id FROM (
       |    SELECT qid, vec_id FROM b1
       |    UNION ALL
       |    SELECT b1.qid, e.dst AS vec_id FROM b1
       |    JOIN edges e ON e.src = b1.vec_id)),
       |b2 AS (SELECT qid, vec_id FROM (
       |    SELECT x2.qid, x2.vec_id, row_number() OVER (PARTITION BY x2.qid
       |      ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC,
       |               x2.vec_id) AS rk
       |    FROM x2 JOIN embeddings c ON c.vec_id = x2.vec_id
       |    JOIN q ON q.qid = x2.qid) z WHERE rk <= 8),
       |x3 AS (SELECT DISTINCT qid, vec_id FROM (
       |    SELECT qid, vec_id FROM b2
       |    UNION ALL
       |    SELECT b2.qid, e.dst AS vec_id FROM b2
       |    JOIN edges e ON e.src = b2.vec_id)),
       |b3 AS (SELECT qid, vec_id FROM (
       |    SELECT x3.qid, x3.vec_id, row_number() OVER (PARTITION BY x3.qid
       |      ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC,
       |               x3.vec_id) AS rk
       |    FROM x3 JOIN embeddings c ON c.vec_id = x3.vec_id
       |    JOIN q ON q.qid = x3.qid) z WHERE rk <= 8)""".stripMargin

  /** The walk's final ranked beam, cut at `k` — ss22's output shape. */
  private def nswWalkSql(k: Int): String =
    s"""$nswWalkCtes
       |SELECT qid, vec_id AS neighbor_id, CAST(rk AS BIGINT) AS rk FROM (
       |    SELECT b3.qid, b3.vec_id, row_number() OVER (PARTITION BY b3.qid
       |      ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC,
       |               b3.vec_id) AS rk
       |    FROM b3 JOIN embeddings c ON c.vec_id = b3.vec_id
       |    JOIN q ON q.qid = b3.qid) z WHERE rk <= $k""".stripMargin

  /** sk11's 16 replicate-sum columns, generated once for the oracle. */
  private val bootstrapRepSql: String = (0 until 16).map { b =>
    s"CAST(sum(vd * (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) " +
      s"|| '#$b'), 1, 6)) AS INTEGER) % 3)) AS BIGINT) AS r$b"
  }.mkString(",\n    ")
  private val bootstrapRepList: String =
    (0 until 16).map(b => s"r$b").mkString(", ")

  /** Shared SimHash candidate+verify CTE chain (through the `pairs`
    * frame) — used by dd03 (hamming filter) and dd14 (precision
    * aggregate). */
  private val simhashPairsSql: String =
    """t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |hx AS (SELECT doc_id, md5(s) AS hh FROM sh),
        |hv AS (SELECT doc_id,
        |    list_sum(list_transform(range(0,8), k ->
        |      CAST(strpos('0123456789abcdef', substr(hh, k+1, 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << (4*(7-k))))) AS hi,
        |    list_sum(list_transform(range(0,8), k ->
        |      CAST(strpos('0123456789abcdef', substr(hh, 9+k, 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << (4*(7-k))))) AS lo
        |  FROM hx),
        |bits AS (SELECT doc_id, b,
        |    sum(CASE WHEN ((CASE WHEN b < 32 THEN lo >> b
        |                    ELSE hi >> (b-32) END) & 1) = 1
        |        THEN 1 ELSE -1 END) AS sm
        |  FROM hv CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb
        |  GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN sm > 0 AND b < 32
        |      THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS sig_lo,
        |    CAST(sum(CASE WHEN sm > 0 AND b >= 32
        |      THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INT)) ELSE 0 END) AS BIGINT) AS sig_hi
        |  FROM bits GROUP BY 1),
        |bd AS (SELECT doc_id, sig_lo, sig_hi,
        |    unnest([sig_lo & 65535, (sig_lo >> 16) & 65535,
        |            sig_hi & 65535, (sig_hi >> 16) & 65535]) AS band,
        |    unnest([0, 1, 2, 3]) AS band_idx
        |  FROM sig),
        |bsz AS (SELECT band_idx, band, count(*) AS n
        |        FROM bd GROUP BY 1, 2),
        |bds AS (SELECT bd.* FROM bd JOIN bsz USING (band_idx, band)
        |        WHERE bsz.n <= 128),
        |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
        |    CAST(bit_count(xor(x.sig_lo, y.sig_lo)) +
        |         bit_count(xor(x.sig_hi, y.sig_hi)) AS INTEGER) AS hamming
        |  FROM bds x JOIN bds y ON x.band_idx = y.band_idx AND x.band = y.band
        |    AND x.doc_id < y.doc_id)""".stripMargin

  /** dd02's LSH+verify output is semantically identical to dd04's exact
    * pair set (verification removes all false positives; 16-band recall
    * at the planted J≈0.97 near-dups is ~1), so both share one oracle.
    * `extra` narrows the document universe (pp39's purged-corpus
    * rebuild appends the tombstone exclusion). */
  private def ngramJaccardSqlFrom(extra: String): String =
    s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
      |           FROM documents
      |           WHERE len(string_split(trim(text),' ')) >= 3$extra),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, len(tk)-1),
      |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
      |       FROM t),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |j AS (SELECT d1, d2,
      |        round(shared * 1.0 / (x.n + y.n - shared), 4) AS jaccard
      |      FROM pairs JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id)
      |SELECT d1, d2, jaccard FROM j WHERE jaccard >= 0.6""".stripMargin
  private val ngramJaccardSql: String = ngramJaccardSqlFrom("")

  /** dd09's oracle: the portable Kirsch–Mitzenmacher MinHash replayed
    * end to end — per-shingle (h1, h2) = the md5 halves, 32 min-slots
    * g_j = h1 + j·h2, LSH candidates as slot-pair equality over the 16
    * bands (bucket equality ⟺ both banded slots equal, modulo a ~2⁻⁶⁴
    * xxhash64 bucket collision), agreement count, /32 estimate (exact
    * dyadic). */
  private val minhashEstSql: String = {
    val slots = (0 until 32).map(j =>
      if (j == 0) "min(h1) AS m0" else s"min(h1 + $j * h2) AS m$j")
      .mkString(", ")
    val bandEq = (0 until 16).map(b =>
      s"(a.m${2 * b} = b.m${2 * b} AND a.m${2 * b + 1} = b.m${2 * b + 1})")
      .mkString(" OR ")
    val agree = (0 until 32).map(j =>
      s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
       |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |         range(1, len(tk)-1),
       |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
       |       FROM t),
       |hs AS (SELECT doc_id,
       |         ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
       |         ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2 FROM sh),
       |sig AS (SELECT doc_id, $slots FROM hs GROUP BY doc_id),
       |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |           CAST($agree AS BIGINT) AS n_agree
       |         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |         WHERE $bandEq)
       |SELECT d1, d2, n_agree, n_agree / 32.0 AS est_sim FROM cand"""
      .stripMargin
  }

  /** dd38's oracle: dd09's K–M signature replay with the three b-bit
    * collision sums as column arithmetic on the same signature join,
    * unpivoted to one row per (pair, b). Slots are non-negative
    * (< 2³⁷), so `%` agrees across engines. */
  private val bbitMinhashSql: String = {
    val slots = (0 until 32).map(j =>
      if (j == 0) "min(h1) AS m0" else s"min(h1 + $j * h2) AS m$j")
      .mkString(", ")
    val bandEq = (0 until 16).map(b =>
      s"(a.m${2 * b} = b.m${2 * b} AND a.m${2 * b + 1} = b.m${2 * b + 1})")
      .mkString(" OR ")
    val agree = (0 until 32).map(j =>
      s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
    def coll(pw: Int) = (0 until 32).map(j =>
      s"CASE WHEN a.m$j % $pw = b.m$j % $pw THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
       |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |         range(1, len(tk)-1),
       |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
       |       FROM t),
       |hs AS (SELECT doc_id,
       |         ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
       |         ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2 FROM sh),
       |sig AS (SELECT doc_id, $slots FROM hs GROUP BY doc_id),
       |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |           CAST($agree AS BIGINT) AS n_full,
       |           CAST(${coll(2)} AS BIGINT) AS c1,
       |           CAST(${coll(4)} AS BIGINT) AS c2,
       |           CAST(${coll(16)} AS BIGINT) AS c4
       |         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |         WHERE $bandEq),
       |u AS (SELECT d1, d2, n_full, 1 AS b_bits, 2 AS pw, c1 AS n_collide
       |        FROM cand
       |      UNION ALL SELECT d1, d2, n_full, 2, 4, c2 FROM cand
       |      UNION ALL SELECT d1, d2, n_full, 4, 16, c4 FROM cand)
       |SELECT d1, d2, CAST(b_bits AS BIGINT) AS b_bits,
       |  CAST(n_collide AS BIGINT) AS n_collide,
       |  greatest(0, n_collide * pw - 32) * 10000 // (32 * (pw - 1))
       |    AS est_bp,
       |  n_full * 10000 // 32 AS est_full_bp
       |FROM u""".stripMargin
  }

  /** dd06's oracle, also the cluster CTE of dd07's; `extra` narrows
    * the document universe for pp39's purged-corpus rebuild. */
  private def dupClustersSqlFrom(extra: String): String =
    s"""WITH pairs AS (${ngramJaccardSqlFrom(extra)}),
       |bi AS (SELECT d1 AS a, d2 AS b FROM pairs
       |       UNION ALL SELECT d2, d1 FROM pairs),
       |reach AS (
       |  WITH RECURSIVE r(a, b) AS (
       |    SELECT a, b FROM bi
       |    UNION
       |    SELECT r.a, bi.b FROM r JOIN bi ON r.b = bi.a)
       |  SELECT * FROM r)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |FROM reach GROUP BY a""".stripMargin
  private val dupClustersSql: String = dupClustersSqlFrom("")

  /** gr17's oracle: the fixed 3-round 3-truss peel over the
    * co-purchase backbone (pairs co-bought in ≥2 distinct orders),
    * unrolled, with the IDENTICAL wedge hub rule as the Spark kernel
    * (support counted through deg ≤ 64 centers only; edges touching a
    * deg > 64 hub kept without enumeration) so outputs hash-match on
    * any corpus. */
  private object KtrussOracle {
    def round(i: Int): String = {
      val p = i - 1
      s"""b$i AS (SELECT d1 AS m, d2 AS n FROM e$p
         |        UNION ALL SELECT d2, d1 FROM e$p),
         |dg$i AS (SELECT m, count(*) AS deg FROM b$i GROUP BY 1),
         |s$i AS (SELECT x.n AS a, y.n AS b, count(*) AS common
         |        FROM b$i x JOIN dg$i dx ON x.m = dx.m
         |        JOIN b$i y ON x.m = y.m AND x.n < y.n
         |        WHERE dx.deg <= 64 GROUP BY 1, 2)""".stripMargin
    }
    def peel(i: Int): String = {
      val p = i - 1
      s"""e$i AS (SELECT e.d1, e.d2 FROM e$p e
         |        JOIN dg$i da ON e.d1 = da.m JOIN dg$i db ON e.d2 = db.m
         |        LEFT JOIN s$i ON s$i.a = e.d1 AND s$i.b = e.d2
         |        WHERE da.deg > 64 OR db.deg > 64
         |           OR coalesce(s$i.common, 0) >= 1)""".stripMargin
    }
    val rounds = (1 to 3).map(i => round(i) + ",\n" + peel(i)).mkString(",\n")
    /** The shared CTE chain through the converged edge set `e3`. */
    val ctes: String =
      s"""pp AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e0 AS MATERIALIZED (SELECT d1, d2 FROM (
         |  SELECT x.pk AS d1, y.pk AS d2, count(*) AS w
         |  FROM pp x JOIN pp y ON x.ok = y.ok AND x.pk < y.pk
         |  GROUP BY 1, 2) z WHERE w >= 2),
         |$rounds""".stripMargin
  }

  private val ktrussSql: String =
    s"""WITH ${KtrussOracle.ctes},
       |${KtrussOracle.round(4)}
       |SELECT e.d1, e.d2,
       |  CAST(coalesce(s4.common, 0) AS BIGINT) AS support,
       |  CASE WHEN da.deg > 64 OR db.deg > 64 THEN 'hub' ELSE 'exact' END
       |    AS tier
       |FROM e3 e JOIN dg4 da ON e.d1 = da.m JOIN dg4 db ON e.d2 = db.m
       |LEFT JOIN s4 ON s4.a = e.d1 AND s4.b = e.d2""".stripMargin

  /** gr18's oracle: ALGORITHM-INDEPENDENT components of the gr17 truss
    * edge set (the fixed point is the true partition — gr16's oracle
    * convention): recursive-CTE min reachable id + community sizes,
    * over the identical unrolled truss CTE chain. */
  private val trussCommunitiesSql: String =
    s"""WITH ${KtrussOracle.ctes},
       |bi AS (SELECT d1 AS a, d2 AS b FROM e3 UNION ALL SELECT d2, d1 FROM e3),
       |reach AS (
       |  WITH RECURSIVE r(a, b) AS (
       |    SELECT a, b FROM bi
       |    UNION
       |    SELECT r.a, bi.b FROM r JOIN bi ON r.b = bi.a)
       |  SELECT * FROM r),
       |lbl AS (SELECT a AS part_id, least(a, min(b)) AS community_id
       |        FROM reach GROUP BY a),
       |cs AS (SELECT community_id, CAST(count(*) AS BIGINT) AS community_size
       |       FROM lbl GROUP BY 1)
       |SELECT part_id, community_id, community_size
       |FROM lbl JOIN cs USING (community_id)""".stripMargin

  /** gr13's oracle: the fixed 5-round integer HITS unrolled (hub pass
    * + authority pass per round, the authority vector renormalized to
    * an L1 mass of 2²⁰ by exact integer division — the same
    * fixed-point chain the Spark plan applies, so the hash compares
    * exactly with no float in sight). */
  private val hitsSql: String = {
    val rounds = (1 to 5).map { i =>
      s"h$i AS (SELECT c, CAST(sum(a) AS BIGINT) AS h " +
        s"FROM cp JOIN a${i - 1} USING (p) GROUP BY 1),\n" +
        s"r$i AS (SELECT p, CAST(sum(h) AS BIGINT) AS ar " +
        s"FROM cp JOIN h$i USING (c) GROUP BY 1),\n" +
        s"a$i AS (SELECT p, CAST(ar * 1048576 // " +
        s"(SELECT sum(ar) FROM r$i) AS BIGINT) AS a FROM r$i)"
    }.mkString(",\n")
    s"""WITH cp AS MATERIALIZED (
       |    SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |a0 AS (SELECT DISTINCT p, CAST(1 AS BIGINT) AS a FROM cp),
       |$rounds,
       |nb AS (SELECT p, CAST(count(*) AS BIGINT) AS n_buyers
       |       FROM cp GROUP BY 1)
       |SELECT a5.p AS p_partkey, a5.a AS authority, nb.n_buyers
       |FROM a5 JOIN nb USING (p)
       |ORDER BY authority DESC, p_partkey LIMIT 20""".stripMargin
  }

  /** gr03's oracle: the FIXED 10-iteration PageRank unrolled as ten
    * chained CTEs (standard SQL — and DuckDB — forbids aggregates in a
    * recursive CTE's recursive term, so the fixed loop is spelled
    * out). All arithmetic forced to DOUBLE to match Spark (DuckDB
    * numeric literals default to DECIMAL); ranks rounded to 6 dp on
    * both engines — summation-order ulps sit ~1e-10 below that grid. */
  private val pageRankSql: String = {
    val iters = (1 to 10).map { i =>
      s"r$i AS (SELECT b.dst AS node, " +
        "CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * sum(r.rank / d.deg) AS rank " +
        s"FROM bi b JOIN r${i - 1} r ON b.src = r.node " +
        "JOIN deg d ON b.src = d.src GROUP BY 1)"
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED ($ngramJaccardSql),
       |bi AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs
       |       UNION ALL SELECT d2, d1 FROM pairs),
       |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM bi GROUP BY 1),
       |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg),
       |$iters
       |SELECT node AS doc_id, round(rank, 6) AS rank FROM r10""".stripMargin
  }

  /** gr07's oracle: the gr03 unroll with the teleport mass restricted
    * to the seed set (node ≡ 0 mod 3). */
  private val personalizedPrSql: String = {
    val tele = "CASE WHEN %s %% 3 = 0 THEN CAST(1.0 AS DOUBLE) " +
      "ELSE CAST(0.0 AS DOUBLE) END"
    val iters = (1 to 10).map { i =>
      s"r$i AS (SELECT b.dst AS node, " +
        s"CAST(0.15 AS DOUBLE) * ${tele.format("b.dst")} + " +
        "CAST(0.85 AS DOUBLE) * sum(r.rank / d.deg) AS rank " +
        s"FROM bi b JOIN r${i - 1} r ON b.src = r.node " +
        "JOIN deg d ON b.src = d.src GROUP BY 1)"
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED ($ngramJaccardSql),
       |bi AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs
       |       UNION ALL SELECT d2, d1 FROM pairs),
       |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM bi GROUP BY 1),
       |r0 AS (SELECT src AS node, ${tele.format("src")} AS rank FROM deg),
       |$iters
       |SELECT node AS doc_id, round(rank, 6) AS rank FROM r10""".stripMargin
  }

  /** gr05's oracle: 10 unrolled peel rounds (peeling is idempotent
    * once stable, so the fixed unroll is exact). */
  private val kCoreSql: String = {
    // MATERIALIZED: each peel round references the previous round 3×;
    // inlined CTEs would expand the chain exponentially (DuckDB runs
    // out of file handles re-opening the parquet per reference)
    val iters = (1 to 10).map { i =>
      s"k$i AS MATERIALIZED (SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= 2),\n" +
        s"e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e " +
        s"JOIN k$i a ON e.src = a.src JOIN k$i b ON e.dst = b.src)"
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED ($ngramJaccardSql),
       |e0 AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs
       |       UNION ALL SELECT d2, d1 FROM pairs),
       |$iters
       |SELECT src AS doc_id, count(*) AS core_degree FROM e10 GROUP BY 1"""
      .stripMargin
  }

  /** tx02's oracle, also the score CTE of dd07's. */
  private val qualityScoreSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(trim(text),' ') AS tk
      |           FROM documents),
      |x AS (SELECT doc_id,
      |  len(tk) AS n_tokens,
      |  len(list_filter(tk, s -> s IN ('the','a','of','and','to','in'))) AS stop_cnt,
      |  length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS punct_cnt,
      |  round(length(regexp_replace(trim(text), ' ', '', 'g')) * 1.0 / len(tk), 4)
      |    AS avg_token_len
      |  FROM t)
      |SELECT doc_id, n_tokens, stop_cnt, punct_cnt, avg_token_len,
      |  round(stop_cnt * 0.5 / n_tokens +
      |    CASE WHEN n_tokens BETWEEN 5 AND 200 THEN 0.5 ELSE 0.0 END, 4) AS score
      |FROM x""".stripMargin

  /** DuckDB replica of ss02's multi-probe list: exact bucket + every
    * 1-bit flip. */
  private def probeListSql(b: String): String =
    s"""list_transform(range(0, ${Similarity.bitsPerTable + 1}), i ->
       | CASE WHEN i = 0 THEN $b
       | ELSE substr($b, 1, CAST(i - 1 AS BIGINT)) ||
       |      (CASE WHEN substr($b, CAST(i AS BIGINT), 1) = '1'
       |            THEN '0' ELSE '1' END) ||
       |      substr($b, CAST(i + 1 AS BIGINT))
       | END)""".stripMargin

  /** ss01's oracle, also the neighbor CTE of ss04's. */
  private val bruteTopkSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT qid, e.vec_id AS neighbor_id,
      |        list_cosine_similarity(qe, e.embedding) AS cos
      |      FROM q, embeddings e WHERE e.vec_id != qid),
      |r AS (SELECT qid, neighbor_id,
      |        row_number() OVER (PARTITION BY qid
      |          ORDER BY cos DESC, neighbor_id) AS rk
      |      FROM c)
      |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin

  /** ss12's oracle: the greedy MMR selection unrolled as 5 CTE rounds —
    * round 1 takes the best 0.7·score, each later round re-scores the
    * remaining candidates against the chosen set (max-sim penalty,
    * aggregate max is order-independent) and takes the arg-max with
    * the same (value DESC, cid) tie-break the Spark kernel applies. */
  private val mmrTopkSql: String = {
    def pick(r: Int): String =
      if (r == 1)
        """ch1 AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (
          |  PARTITION BY qid ORDER BY 0.7 * score DESC, cid) AS rn FROM t)
          |  WHERE rn = 1),
          |u1 AS (SELECT qid, cid, 1 AS rk FROM ch1)""".stripMargin
      else
        s"""m$r AS (SELECT c.qid, c.cid, c.score, max(p.sim) AS ms
           |  FROM t c JOIN p ON p.qid = c.qid AND p.ci = c.cid
           |  JOIN u${r - 1} h ON h.qid = p.qid AND h.cid = p.cj
           |  WHERE NOT EXISTS (SELECT 1 FROM u${r - 1} x
           |                    WHERE x.qid = c.qid AND x.cid = c.cid)
           |  GROUP BY 1, 2, 3),
           |ch$r AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (
           |  PARTITION BY qid ORDER BY 0.7 * score - 0.3 * ms DESC, cid) AS rn
           |  FROM m$r) WHERE rn = 1),
           |u$r AS (SELECT * FROM u${r - 1}
           |        UNION ALL SELECT qid, cid, $r AS rk FROM ch$r)""".stripMargin
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
       |           FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT qid, e.vec_id AS cid,
       |        list_cosine_similarity(qe, e.embedding) AS score,
       |        e.embedding AS ce
       |      FROM q, embeddings e WHERE e.vec_id != qid),
       |t AS (SELECT qid, cid, score, ce FROM (SELECT *, row_number() OVER (
       |        PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM c)
       |      WHERE rn <= 20),
       |p AS (SELECT a.qid, a.cid AS ci, b.cid AS cj,
       |        list_cosine_similarity(a.ce, b.ce) AS sim
       |      FROM t a JOIN t b ON a.qid = b.qid AND a.cid != b.cid),
       |${pick(1)},
       |${pick(2)},
       |${pick(3)},
       |${pick(4)},
       |${pick(5)}
       |SELECT qid, rk, cid AS neighbor_id FROM u5""".stripMargin
  }

  /** ss15's oracle: the 3-round SQ12 fixed-point Lloyd chain unrolled
    * as CTEs — the same floor(v·4096) quantization, per-(vec, cell)
    * integer d² via zipped unnest, lexicographic (d2, cell) argmin,
    * and the truncate-toward-zero centroid update spelled
    * sign-explicitly so DuckDB's // semantics cannot drift from
    * Spark's div. All arithmetic int64-exact on both engines. */
  private val kmeansSql: String = {
    def round(r: Int): String = {
      val prevC = if (r == 1) "c0" else s"c${r - 1}"
      val stats =
        s"""a$r AS (SELECT e.vec_id, c.cell, unnest(e.x) AS xv, unnest(c.cent) AS cv
           |        FROM em e CROSS JOIN $prevC c),
           |d$r AS (SELECT vec_id, cell, CAST(sum((xv - cv) * (xv - cv)) AS BIGINT) AS d2
           |        FROM a$r GROUP BY 1, 2),
           |s$r AS (SELECT vec_id, cell, d2 FROM (SELECT *, row_number() OVER (
           |          PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d$r)
           |        WHERE rn = 1),
           |g$r AS (SELECT cell, count(*) AS n_vecs, CAST(sum(d2) AS BIGINT) AS ci
           |        FROM s$r GROUP BY 1),
           |st$r AS (SELECT CAST($r AS BIGINT) AS iter,
           |          CAST(count(*) AS BIGINT) AS n_cells,
           |          CAST(sum(ci) AS BIGINT) AS total_inertia,
           |          CAST(max(n_vecs) AS BIGINT) AS largest_cell,
           |          CAST(min(n_vecs) AS BIGINT) AS smallest_cell FROM g$r)""".stripMargin
      val update =
        s""",
           |u$r AS (SELECT cell, i, CAST(sum(xv) AS BIGINT) AS sv, count(*) AS cnt
           |        FROM (SELECT s.cell, unnest(e.x) AS xv, unnest(range(1, 65)) AS i
           |              FROM s$r s JOIN em e USING (vec_id))
           |        GROUP BY 1, 2),
           |c$r AS (SELECT cell, list(CASE WHEN sv >= 0 THEN sv // cnt
           |                           ELSE -((-sv) // cnt) END ORDER BY i) AS cent
           |        FROM u$r GROUP BY 1)""".stripMargin
      if (r < 3) stats + update else stats
    }
    s"""WITH em AS (SELECT vec_id,
       |    list_transform(embedding,
       |      v -> CAST(floor(CAST(v AS DOUBLE) * 4096.0) AS BIGINT)) AS x
       |  FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cell, x AS cent
       |       FROM em WHERE vec_id < 8),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT * FROM st1 UNION ALL SELECT * FROM st2
       |UNION ALL SELECT * FROM st3""".stripMargin
  }

  /** tx45/tx46's shared oracle chain: the 10-round BPE trainer
    * unrolled as CTEs — wrapped-symbol strings, lateral-unnest pair
    * counts weighted by word-type frequency, (cnt DESC, pa, pb) argmax,
    * and the same non-overlapping `replace` merge Spark applies. */
  private val bpeChainSql: String = {
    def round(r: Int): String =
      s"""e$r AS (SELECT wc, string_split(substr(syms, 2, length(syms) - 2), '><') AS arr
         |        FROM w${r - 1}),
         |p$r AS (SELECT arr[i] AS pa, arr[i + 1] AS pb, CAST(sum(wc) AS BIGINT) AS cnt
         |        FROM e$r, unnest(range(1, len(arr))) AS t(i)
         |        GROUP BY 1, 2),
         |b$r AS (SELECT pa, pb, cnt FROM p$r ORDER BY cnt DESC, pa, pb LIMIT 1),
         |w$r AS (SELECT w, wc, replace(syms, '<' || b.pa || '><' || b.pb || '>',
         |                 '<' || b.pa || b.pb || '>') AS syms
         |        FROM w${r - 1} CROSS JOIN b$r b)""".stripMargin
    s"""tkx AS (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
       |w0 AS (SELECT w, count(*) AS wc,
       |         array_to_string(list_transform(range(1, length(w) + 1),
       |           j -> '<' || substr(w, j, 1) || '>'), '') AS syms
       |       FROM tkx WHERE length(w) >= 1 GROUP BY w),
       |${(1 to 10).map(round).mkString(",\n")}""".stripMargin
  }

  private val bpeMergesSql: String =
    s"""WITH $bpeChainSql
       |${(1 to 10).map(r =>
        s"SELECT CAST($r AS BIGINT) AS merge_rank, pa AS left_sym, " +
          s"pb AS right_sym, cnt AS pair_count FROM b$r")
        .mkString("\nUNION ALL\n")}""".stripMargin

  private val bpeEncodeSql: String = {
    def enc(r: Int): String =
      s"""en$r AS (SELECT doc_id, pos, replace(syms, '<' || b.pa || '><' || b.pb || '>',
         |           '<' || b.pa || b.pb || '>') AS syms
         |         FROM en${r - 1} CROSS JOIN b$r b)""".stripMargin
    s"""WITH $bpeChainSql,
       |dt AS (SELECT doc_id, i AS pos, tk[i] AS w
       |       FROM (SELECT doc_id, string_split(trim(text), ' ') AS tk
       |             FROM documents),
       |            unnest(range(1, least(len(tk), 8) + 1)) AS t(i)
       |       WHERE length(tk[i]) >= 1),
       |en0 AS (SELECT doc_id, pos, array_to_string(list_transform(
       |          range(1, length(w) + 1),
       |          j -> '<' || substr(w, j, 1) || '>'), '') AS syms FROM dt),
       |${(1 to 10).map(enc).mkString(",\n")}
       |SELECT doc_id, CAST(sum(len(ps)) AS BIGINT) AS n_pieces,
       |  string_agg(array_to_string(ps, ','), ',' ORDER BY pos) AS pieces
       |FROM (SELECT doc_id, pos,
       |        string_split(substr(syms, 2, length(syms) - 2), '><') AS ps
       |      FROM en10)
       |GROUP BY doc_id""".stripMargin
  }

  /** ss17's oracle: 2 fixed-point Lloyd rounds on the standing corpus
    * (vec_id % 4 ≠ 0), then the arriving batch assigned to the frozen
    * cells and folded in by pure sufficient-statistic merge — the same
    * int64 arithmetic chain Spark runs, unrolled as CTEs. */
  private val indexRefreshSql: String = {
    def round(r: Int, src: String, prevC: String): String =
      s"""a$r AS (SELECT e.vec_id, c.cell, unnest(e.x) AS xv, unnest(c.cent) AS cv
         |        FROM $src e CROSS JOIN $prevC c),
         |d$r AS (SELECT vec_id, cell, CAST(sum((xv - cv) * (xv - cv)) AS BIGINT) AS d2
         |        FROM a$r GROUP BY 1, 2),
         |s$r AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER (
         |          PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d$r)
         |        WHERE rn = 1),
         |u$r AS (SELECT cell, i, CAST(sum(xv) AS BIGINT) AS sv
         |        FROM (SELECT s.cell, unnest(e.x) AS xv, unnest(range(1, 65)) AS i
         |              FROM s$r s JOIN em e USING (vec_id))
         |        GROUP BY 1, 2),
         |n$r AS (SELECT cell, count(*) AS cnt FROM s$r GROUP BY 1),
         |c$r AS (SELECT u$r.cell, list(CASE WHEN sv >= 0 THEN sv // cnt
         |                           ELSE -((-sv) // cnt) END ORDER BY i) AS cent
         |        FROM u$r JOIN n$r USING (cell) GROUP BY u$r.cell)""".stripMargin
    s"""WITH em AS (SELECT vec_id,
       |    list_transform(embedding,
       |      v -> CAST(floor(CAST(v AS DOUBLE) * 4096.0) AS BIGINT)) AS x
       |  FROM embeddings),
       |emo AS (SELECT * FROM em WHERE vec_id % 4 != 0),
       |emn AS (SELECT * FROM em WHERE vec_id % 4 = 0),
       |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cell, x AS cent
       |       FROM emo WHERE vec_id < 8),
       |${round(1, "emo", "c0")},
       |${round(2, "emo", "c1")},
       |${round(3, "emn", "c2")},
       |tot AS (SELECT n2.cell, n2.cnt AS ocnt, coalesce(n3.cnt, 0) AS ncnt,
       |          n2.cnt + coalesce(n3.cnt, 0) AS tcnt
       |        FROM n2 LEFT JOIN n3 USING (cell)),
       |mrg AS (SELECT u2.cell, u2.i, u2.sv + coalesce(u3.sv, 0) AS sv
       |        FROM u2 LEFT JOIN u3 USING (cell, i)),
       |mc AS (SELECT m.cell, m.i,
       |         CASE WHEN m.sv >= 0 THEN m.sv // t.tcnt
       |              ELSE -((-m.sv) // t.tcnt) END AS ncv
       |       FROM mrg m JOIN tot t USING (cell)),
       |oc AS (SELECT cell, unnest(cent) AS ocv, unnest(range(1, 65)) AS i
       |       FROM c2),
       |dr AS (SELECT mc.cell, CAST(sum(abs(mc.ncv - oc.ocv)) AS BIGINT)
       |         AS drift_l1
       |       FROM mc JOIN oc ON oc.cell = mc.cell AND oc.i = mc.i
       |       GROUP BY 1)
       |SELECT t.cell, CAST(t.ocnt AS BIGINT) AS n_old,
       |  CAST(t.ncnt AS BIGINT) AS n_new, CAST(t.tcnt AS BIGINT) AS n_total,
       |  dr.drift_l1
       |FROM tot t JOIN dr USING (cell)""".stripMargin
  }

  /** DuckDB replica of ss02's LSH bucket ids: the same seed-42 planes
    * inlined as list literals (sign noise at the 0-boundary is
    * measure-zero for these data). One expression per hash table. */
  private def lshBucketSqlExpr(table: Int): String =
    (table * Similarity.bitsPerTable until (table + 1) * Similarity.bitsPerTable)
      .map { p =>
        val arr = Similarity.planes(p).mkString("[", ",", "]")
        s"(CASE WHEN list_sum(list_transform(range(64), i -> embedding[i+1] * ($arr)[i+1])) >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")

  /** Shared chunk stream (mm03's CTE body): hex-encoded payload sliced
    * 64 hex chars (= 32 bytes) per chunk. */
  private val chunksSql: String =
    """SELECT doc_id,
      |  md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) AS chunk_md5
      |FROM (SELECT doc_id, hex(encode(text)) AS hx,
      |        unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)))
      |          AS chunk_idx
      |      FROM documents)""".stripMargin

  /** ev02's oracle, reused by pp04's session rollup. */
  private val sessionizeSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |x AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN prev_ts IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT)
      |              - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM t),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM x)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events,
      |  CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start,
      |  CAST(date_trunc('second', max(ts)) AS TIMESTAMP) AS session_end
      |FROM s GROUP BY 1, 2""".stripMargin

  /** ss02's oracle, reused by ss09's recall audit. */
  // kNN JOIN via the ss05 IVF replay chain, query set = every
  // vector, k=3 — shared by ss18 (direct), ss22 (as the NSW graph
  // substrate) and, with filters, the ss25/ss26 lifecycle rebuilds:
  // `centFilter` restricts the QUANTIZER's training set (the
  // pre-change corpus — quantizer immutable under upsert/purge, the
  // pp38 convention) and `memberFilter` restricts graph MEMBERSHIP
  // (queries, candidates, assignments alike).
  private def knnJoinSqlWhere(centFilter: String,
      memberFilter: String): String =
    s"""WITH ex AS (SELECT vec_id, label, i,
        |       CAST(embedding[i+1] AS DOUBLE) AS x
        |     FROM embeddings, range(64) t(i)),
        |cent AS (SELECT label AS cell, i, avg(x) AS c FROM ex
        |         $centFilter GROUP BY 1, 2),
        |vc AS (SELECT ex.vec_id, cent.cell,
        |         sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS ccos
        |       FROM ex JOIN cent ON ex.i = cent.i
        |       $memberFilter
        |       GROUP BY 1, 2),
        |assigned AS (SELECT vec_id, cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
        |  FROM vc) WHERE crk = 1),
        |probes AS (SELECT vec_id AS qid, cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
        |  FROM vc) WHERE crk <= 2),
        |cand AS (SELECT p.qid, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(qe.embedding, e.embedding) AS cos
        |  FROM probes p
        |  JOIN assigned a ON a.cell = p.cell AND a.vec_id != p.qid
        |  JOIN embeddings qe ON qe.vec_id = p.qid
        |  JOIN embeddings e ON e.vec_id = a.vec_id),
        |r AS (SELECT qid, neighbor_id,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY cos DESC, neighbor_id) AS rk
        |      FROM cand)
        |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 3""".stripMargin

  private val knnJoinSql: String = knnJoinSqlWhere("", "")

  private val ss02Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
         |             ${lshBucketSqlExpr(0)} AS b0,
         |             ${lshBucketSqlExpr(1)} AS b1
         |           FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, b0 AS qb0, b1 AS qb1
         |      FROM e WHERE vec_id < 10),
         |p0 AS (SELECT qid, qe, unnest(${probeListSql("qb0")}) AS probe FROM q),
         |p1 AS (SELECT qid, qe, unnest(${probeListSql("qb1")}) AS probe FROM q),
         |u AS (SELECT p0.qid, e.vec_id, p0.qe, e.embedding AS emb
         |      FROM p0 JOIN e ON e.b0 = p0.probe
         |      UNION
         |      SELECT p1.qid, e.vec_id, p1.qe, e.embedding
         |      FROM p1 JOIN e ON e.b1 = p1.probe),
         |c AS (SELECT DISTINCT qid, vec_id AS neighbor_id, qe, emb
         |      FROM u WHERE vec_id != qid),
         |r AS (SELECT qid, neighbor_id,
         |        row_number() OVER (PARTITION BY qid
         |          ORDER BY list_cosine_similarity(qe, emb) DESC, neighbor_id) AS rk
         |      FROM c)
         |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin

  /** The safe-keeper chain's shared CTE list (verified pairs →
    * triangle support → supported-core reachability → safe members +
    * clusters + quality scores) — shared by the dd28 entry, dd36/pp50's
    * routed-policy replays, pp49's rebuild oracle, and (in the purged
    * variant) pp51's. `pairWhere` filters the verified pair set,
    * `docExtra` the clustering's document source — pp45's tombstone
    * rule, parameterized. */
  private def safeChainCtesFrom(pairWhere: String, docExtra: String): String =
    s"""j AS (SELECT * FROM ($ngramJaccardSql) z$pairWhere),
       |bi AS (SELECT d1 AS m, d2 AS n FROM j UNION ALL SELECT d2, d1 FROM j),
       |deg AS (SELECT m, count(*) AS deg FROM bi GROUP BY 1),
       |safe AS (SELECT bi.m, bi.n FROM bi JOIN deg USING (m)
       |         WHERE deg.deg <= 64),
       |cn AS (SELECT x.n AS a, y.n AS b, CAST(count(*) AS BIGINT) AS common
       |       FROM safe x JOIN safe y ON x.m = y.m AND x.n < y.n
       |       GROUP BY 1, 2),
       |es AS (SELECT j.d1, j.d2, coalesce(cn.common, 0) AS support
       |       FROM j LEFT JOIN cn ON cn.a = j.d1 AND cn.b = j.d2),
       |sup AS (SELECT d1, d2 FROM es WHERE support > 0),
       |sbi AS (SELECT d1 AS a, d2 AS b FROM sup
       |        UNION ALL SELECT d2, d1 FROM sup),
       |sreach AS (
       |  WITH RECURSIVE r(a, b) AS (
       |    SELECT a, b FROM sbi
       |    UNION
       |    SELECT r.a, sbi.b FROM r JOIN sbi ON r.b = sbi.a)
       |  SELECT * FROM r),
       |sc AS (SELECT a AS doc_id, least(a, min(b)) AS safe_id
       |       FROM sreach GROUP BY a),
       |clusters AS (${dupClustersSqlFrom(docExtra)}),
       |mem AS (SELECT c.doc_id, c.cluster_id,
       |          coalesce(sc.safe_id, c.doc_id) AS safe_id
       |        FROM clusters c LEFT JOIN sc ON sc.doc_id = c.doc_id),
       |scores AS ($qualityScoreSql)""".stripMargin

  private val safeChainCtes: String = safeChainCtesFrom("", "")

  /** dd36's routed-keeper CTE block (appended after [[safeChainCtes]]):
    * dd07's rule (k07), dd28's rule (k28), realized density and the
    * 5000 bp route (rt) — shared by the dd36 entry and pp50's
    * policy-routed training set. */
  private val keeperPolicyCtes: String =
    """r28 AS (SELECT mem.cluster_id, mem.safe_id, mem.doc_id,
      |        row_number() OVER (PARTITION BY mem.safe_id
      |          ORDER BY s.score DESC, mem.doc_id) AS rk,
      |        count(*) OVER (PARTITION BY mem.safe_id) AS n_members
      |      FROM mem JOIN scores s USING (doc_id)),
      |k28 AS (SELECT cluster_id, safe_id, doc_id AS keeper_id,
      |          CAST(n_members AS BIGINT) AS n_members
      |        FROM r28 WHERE rk = 1),
      |r07 AS (SELECT c.cluster_id, c.doc_id,
      |        row_number() OVER (PARTITION BY c.cluster_id
      |          ORDER BY s.score DESC, c.doc_id) AS rk,
      |        count(*) OVER (PARTITION BY c.cluster_id) AS n_members
      |      FROM clusters c JOIN scores s USING (doc_id)),
      |k07 AS (SELECT cluster_id, cluster_id AS safe_id,
      |          doc_id AS keeper_id, CAST(n_members AS BIGINT)
      |            AS n_members
      |        FROM r07 WHERE rk = 1),
      |intra AS (SELECT a.cluster_id,
      |    CAST(count(*) AS BIGINT) AS n_intra_pairs
      |  FROM j JOIN clusters a ON j.d1 = a.doc_id
      |  JOIN clusters b ON j.d2 = b.doc_id
      |  WHERE a.cluster_id = b.cluster_id GROUP BY 1),
      |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_m
      |       FROM clusters GROUP BY 1),
      |dens AS (SELECT sz.cluster_id,
      |    CAST(coalesce(n_intra_pairs, 0) * 10000
      |      // greatest(1, n_m * (n_m - 1) // 2) AS BIGINT)
      |      AS density_bp
      |  FROM sz LEFT JOIN intra USING (cluster_id)),
      |rt AS (SELECT cluster_id, density_bp,
      |         CASE WHEN density_bp >= 5000 THEN 'aggressive'
      |              ELSE 'conservative' END AS route
      |       FROM dens)""".stripMargin

  /** ev54's detector chain — shared by the ev54 entry and the
    * ev56 bot-gate consumer. */
  private val botDetectSql: String =
    """WITH g AS (SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      |  FROM events),
      |h AS (SELECT user_id, gap_s, CAST(count(*) AS BIGINT) AS cnt
      |      FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
      |st AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_gaps,
      |         CAST(count(*) AS BIGINT) AS n_distinct_gaps
      |       FROM h GROUP BY 1),
      |tp AS (SELECT user_id, gap_s AS modal_gap_s, cnt AS modal_cnt
      |       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |           ORDER BY cnt DESC, gap_s) AS rk FROM h) z
      |       WHERE rk = 1)
      |SELECT st.user_id, n_gaps + 1 AS n_events, n_distinct_gaps,
      |  modal_gap_s,
      |  CAST(modal_cnt * 1000000 // n_gaps AS BIGINT) AS modal_share_ppm,
      |  (modal_cnt * 1000000 // n_gaps >= 500000
      |    OR n_distinct_gaps <= 2) AS is_bot
      |FROM st JOIN tp ON tp.user_id = st.user_id
      |WHERE n_gaps >= 19""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q32_grouping_sets" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS o_orderstatus,
        | coalesce(o_orderpriority,'ALL') AS o_orderpriority,
        | count(*) AS cnt, round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())""".stripMargin,

    "q33_argminmax" ->
      """WITH r AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment,
        |  max(CASE WHEN rmax=1 THEN o_orderkey END) AS top_order,
        |  max(CASE WHEN rmin=1 THEN o_orderkey END) AS bottom_order,
        |  round(max(CASE WHEN rmax=1 THEN o_totalprice END),2) AS top_price
        |FROM r GROUP BY 1""".stripMargin,

    "q34_array_agg" ->
      """SELECT o_custkey,
        | array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
        |   AS priorities,
        | count(DISTINCT o_orderpriority) AS n_priorities
        |FROM orders GROUP BY 1""".stripMargin,

    "q35_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT o_custkey,
        |    CAST(date_trunc('day', o_orderdate) AS DATE) AS day FROM orders),
        |x AS (SELECT o_custkey, day,
        |  date_diff('day', DATE '1970-01-01', day)
        |    - row_number() OVER (PARTITION BY o_custkey ORDER BY day) AS grp
        |  FROM days)
        |SELECT o_custkey, min(day) AS island_start, count(*) AS n_days
        |FROM x GROUP BY o_custkey, grp HAVING count(*) >= 2""".stripMargin,

    "q36_ratio_to_report" ->
      """WITH c AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(price_c * 10000 // sum(price_c) OVER (PARTITION BY o_custkey)
        |    AS BIGINT) AS share_bp
        |FROM c""".stripMargin,

    "q37_notin_antijoin" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, -1) FROM orders
        |   WHERE o_totalprice > 450000)""".stripMargin,

    "q38_rank_suite" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(dense_rank() OVER w AS BIGINT) AS drk,
        | percent_rank() OVER w AS prk,
        | cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,

    "ev16_windowed_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT DISTINCT e.user_id AS c_user
        |      FROM events e JOIN su ON e.user_id = su.user_id
        |        AND e.ts >= su.s_ts AND e.ts <= su.s_ts + INTERVAL 7 DAY
        |      WHERE e.event_type = 'purchase')
        |SELECT count(*) AS n_signup, count(c_user) AS n_converted_7d
        |FROM su LEFT JOIN c ON su.user_id = c.c_user""".stripMargin,

    // ev57: the detection chain replayed, the flagged users' events
    // removed, then ev17's exact-ntile RFM over the HUMAN population —
    // horizon and quartile boundaries recompute over gated events.
    "ev57_gated_rfm" ->
      s"""WITH b AS ($botDetectSql),
        |ge AS (SELECT * FROM events
        |       WHERE user_id NOT IN (SELECT user_id FROM b WHERE is_bot)),
        |pu AS (SELECT user_id,
        |    max(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
        |    count(CASE WHEN event_type='purchase' THEN 1 END) AS frequency,
        |    round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0.0 END), 2)
        |      AS monetary
        |  FROM ge GROUP BY 1),
        |mx AS (SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS corpus_max
        |       FROM ge)
        |SELECT user_id,
        |  CAST(date_diff('day', last_day, corpus_max) AS INTEGER) AS recency_days,
        |  frequency, monetary,
        |  CAST(ntile(4) OVER (ORDER BY date_diff('day', last_day, corpus_max),
        |    user_id) AS INTEGER) AS r_score,
        |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INTEGER)
        |    AS f_score,
        |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INTEGER)
        |    AS m_score
        |FROM pu CROSS JOIN mx""".stripMargin,

    "ev17_rfm_scores" ->
      """WITH pu AS (SELECT user_id,
        |    max(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
        |    count(CASE WHEN event_type='purchase' THEN 1 END) AS frequency,
        |    round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0.0 END), 2)
        |      AS monetary
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS corpus_max
        |       FROM events)
        |SELECT user_id,
        |  CAST(date_diff('day', last_day, corpus_max) AS INTEGER) AS recency_days,
        |  frequency, monetary,
        |  CAST(ntile(4) OVER (ORDER BY date_diff('day', last_day, corpus_max),
        |    user_id) AS INTEGER) AS r_score,
        |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INTEGER)
        |    AS f_score,
        |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INTEGER)
        |    AS m_score
        |FROM pu CROSS JOIN mx""".stripMargin,

    "tx16_length_band" ->
      """WITH d AS (SELECT doc_id, len(string_split(trim(text),' ')) AS n_tokens
        |           FROM documents),
        |b AS (SELECT quantile_cont(n_tokens, 0.05) AS p05,
        |        quantile_cont(n_tokens, 0.95) AS p95 FROM d)
        |SELECT doc_id, n_tokens FROM d CROSS JOIN b
        |WHERE n_tokens >= p05 AND n_tokens <= p95""".stripMargin,

    "ev13_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "ev14_rolling_7d" ->
      """WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    user_id FROM events),
        |spine AS (SELECT DISTINCT day AS d0 FROM du)
        |SELECT d0 AS day, count(DISTINCT user_id) AS active_7d
        |FROM du JOIN spine ON du.day BETWEEN d0 - 6 AND d0
        |GROUP BY 1""".stripMargin,

    "ev15_top_gaps" ->
      """WITH t AS (SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT)
        |    AS gap_s,
        |  CAST(date_trunc('second', prev_ts) AS TIMESTAMP) AS gap_start
        |FROM t WHERE prev_ts IS NOT NULL
        |ORDER BY gap_s DESC, user_id, gap_start LIMIT 20""".stripMargin,

    "tx12_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'ref ' || CAST(doc_id * 7919 AS VARCHAR) || ' '
        |           || substr(trim(text), 1, 30)
        |      ELSE string_split(trim(text), ' ')[1] || '@' || source
        |           || '.example.com ref ' || CAST(doc_id * 7919 AS VARCHAR)
        |           || ' ' || substr(trim(text), 1, 30)
        |    END AS profile
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(profile, '[A-Za-z0-9.]+@[A-Za-z0-9.]+'))
        |    AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(profile, '[0-9]+')) AS INTEGER) AS n_numbers,
        |  md5(regexp_replace(regexp_replace(profile,
        |    '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g')) AS redacted_hash
        |FROM p""".stripMargin,

    "tx13_word_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(tk) AS tok, unnest(range(len(tk))) AS pos FROM t),
        |m AS (SELECT doc_id, tok, min(pos) AS mp FROM p GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_unique,
        |  md5(array_to_string(list(tok ORDER BY mp), ' ')) AS dedup_hash
        |FROM m GROUP BY doc_id""".stripMargin,

    "tx14_char_ngrams" ->
      """WITH g AS (SELECT unnest(list_transform(range(1, length(text)-1),
        |    i -> substr(text, i, 3))) AS trigram
        |  FROM documents WHERE length(text) >= 3)
        |SELECT trigram, count(*) AS cnt FROM g GROUP BY 1
        |ORDER BY cnt DESC, trigram LIMIT 20""".stripMargin,

    "tx15_vocab_coverage" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text),' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, 1 AS iv FROM (
        |  SELECT tok, count(*) AS cnt FROM t GROUP BY 1
        |  ORDER BY cnt DESC, tok LIMIT 50)),
        |j AS (SELECT t.doc_id, v.iv FROM t LEFT JOIN v USING (tok))
        |SELECT doc_id, count(*) AS n_tokens, count(iv) AS n_in_vocab,
        |  count(iv) * 10000 // count(*) AS coverage_bp
        |FROM j GROUP BY 1""".stripMargin,

    "dd08_chunk_dup" ->
      s"""WITH h AS ($chunksSql)
         |SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs,
         |  count(*) AS n_occurrences
         |FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "ss06_range_search" ->
      """SELECT q.vec_id AS qid, e.vec_id AS neighbor_id
        |FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
        |WHERE q.vec_id < 10
        |  AND list_cosine_similarity(q.embedding, e.embedding) >= 0.25""".stripMargin,

    "ss07_mips_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT qid, e.vec_id AS neighbor_id,
        |    list_inner_product(CAST(qe AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[])) AS dot
        |  FROM q, embeddings e WHERE e.vec_id != qid),
        |r AS (SELECT qid, neighbor_id,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot DESC, neighbor_id) AS rk
        |  FROM c)
        |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin,

    "mm06_chunk_manifest" ->
      """WITH c AS (
        |  SELECT doc_id, chunk_idx,
        |    md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) AS chunk_md5
        |  FROM (SELECT doc_id, hex(encode(text)) AS hx,
        |          unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)))
        |            AS chunk_idx
        |        FROM documents))
        |SELECT doc_id, count(*) AS n_chunks,
        |  md5(array_to_string(list(chunk_md5 ORDER BY chunk_idx), '')) AS manifest_md5
        |FROM c GROUP BY doc_id""".stripMargin,

    "mm05_size_histogram" ->
      """SELECT source,
        | CAST(octet_length(encode(text)) AS BIGINT) // 50 AS bucket,
        | count(*) AS n_docs,
        | min(CAST(octet_length(encode(text)) AS BIGINT)) AS min_bytes,
        | max(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "pp02_chunk_audit" ->
      s"""WITH h AS ($chunksSql),
         |dup AS (SELECT chunk_md5, 1 AS is_dup FROM h
         |        GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) > 1)
         |SELECT doc_id, count(*) AS n_chunks, count(is_dup) AS n_shared,
         |  count(is_dup) * 10000 // count(*) AS shared_bp
         |FROM h LEFT JOIN dup USING (chunk_md5)
         |GROUP BY doc_id""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),2) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice*(1-l_discount),4) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount > 0.08 AND l_quantity >= 45""".stripMargin,

    "q03_shipping_priority" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,

    "q05_local_supplier" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_no_order_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin,

    "q08_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q09_window_rank" ->
      """SELECT * FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,

    "q10_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
        |FROM orders""".stripMargin,

    "q11_distinct_agg" ->
      """SELECT c_mktsegment,
        | count(DISTINCT c_nationkey) AS n_nations,
        | count(*) AS n_customers,
        | round(sum(c_acctbal),2) AS total_bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "q12_conditional_agg" ->
      """SELECT l_returnflag,
        | count(CASE WHEN l_quantity > 25 THEN 1 END) AS high_qty,
        | count(CASE WHEN l_quantity <= 25 THEN 1 END) AS low_qty,
        | round(sum(CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0.0 END),2)
        |   AS high_revenue
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q13_order_histogram" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q14_above_avg_parts" ->
      """SELECT p_partkey, p_name, round(p_retailprice,2) AS p_retailprice
        |FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)""".stripMargin,

    "q15_union_segments" ->
      """SELECT 'high' AS tier, o_orderstatus, count(*) AS cnt,
        |  round(sum(o_totalprice),2) AS total
        |FROM orders WHERE o_totalprice > 400000 GROUP BY o_orderstatus
        |UNION ALL
        |SELECT 'low' AS tier, o_orderstatus, count(*) AS cnt,
        |  round(sum(o_totalprice),2) AS total
        |FROM orders WHERE o_totalprice < 50000 GROUP BY o_orderstatus""".stripMargin,

    "q16_rollup_sales" ->
      """SELECT coalesce(n_name,'ALL') AS n_name,
        | coalesce(c_mktsegment,'ALL') AS c_mktsegment,
        | count(*) AS cnt, round(sum(c_acctbal),2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin,

    "q17_cube_sales" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS o_orderstatus,
        | coalesce(o_orderpriority,'ALL') AS o_orderpriority,
        | count(*) AS cnt, round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q18_pivot_status" ->
      """SELECT c_mktsegment,
        | count(CASE WHEN o_orderstatus='O' THEN 1 END) AS cnt_o,
        | count(CASE WHEN o_orderstatus='F' THEN 1 END) AS cnt_f,
        | count(CASE WHEN o_orderstatus='P' THEN 1 END) AS cnt_p
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q19_exists_big_orders" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_totalprice > (SELECT avg(o_totalprice)*1.5 FROM orders))""".stripMargin,

    "q20_string_ops" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        | substr(p_name,1,8) AS name8,
        | p_type || '#' || p_brand AS typetag,
        | length(p_name) AS name_len,
        | regexp_extract(p_name, '[a-z]+') AS first_word
        |FROM part WHERE p_name LIKE '%a%'""".stripMargin,

    "q21_monthly_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY 1""".stripMargin,

    "q22_multi_sort" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q23_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q24_topk_agg" ->
      """SELECT o_orderstatus, CAST(rk AS INTEGER) AS rk, price FROM (
        | SELECT o_orderstatus, o_totalprice AS price,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |                     ORDER BY o_totalprice DESC) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,

    "q25_set_ops" ->
      """SELECT 'both' AS tag, o_custkey FROM (
        | SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        | INTERSECT
        | SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |UNION ALL
        |SELECT 'only_high' AS tag, o_custkey FROM (
        | SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        | EXCEPT
        | SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin,

    "q26_full_outer" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_customers
        |           FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey, count(*) AS n_suppliers
        |      FROM supplier GROUP BY 1)
        |SELECT n_name,
        | coalesce(n_customers, 0) AS n_customers,
        | coalesce(n_suppliers, 0) AS n_suppliers
        |FROM nation
        |LEFT JOIN c ON n_nationkey = c_nationkey
        |FULL OUTER JOIN s ON n_nationkey = s_nationkey""".stripMargin,

    "q27_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | first_value(o_totalprice) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        | last_value(o_totalprice) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        | ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q28_range_join" ->
      """WITH tiers(tier, lo, hi) AS (VALUES
        |  ('low', 0.0, 100000.0),
        |  ('mid', 100000.0, 300000.0),
        |  ('high', 300000.0, 1e12))
        |SELECT tier, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM orders JOIN tiers
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier""".stripMargin,

    "q30_typed_api" ->
      """SELECT o_orderstatus, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q31_above_segment_avg" ->
      """WITH pc AS (
        |  SELECT c_custkey, c_mktsegment, count(*) AS n_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_custkey, c_mktsegment),
        |sa AS (SELECT c_mktsegment AS seg, avg(n_orders) AS seg_avg
        |       FROM pc GROUP BY 1)
        |SELECT c_custkey, c_mktsegment, n_orders
        |FROM pc JOIN sa ON c_mktsegment = seg
        |WHERE n_orders > seg_avg""".stripMargin,

    "tx11_stopword_filter" ->
      """SELECT doc_id,
        | CAST(len(string_split(trim(text),' '))
        |   - len(list_filter(string_split(trim(text),' '),
        |         t -> NOT t IN ('the','a','of','and','to','in'))) AS INTEGER)
        |   AS n_removed,
        | md5(array_to_string(list_filter(string_split(trim(text),' '),
        |       t -> NOT t IN ('the','a','of','and','to','in')), ' '))
        |   AS filtered_hash
        |FROM documents""".stripMargin,

    "q29_sql_surface" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderpriority""".stripMargin,

    "tx08_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(trim(text),' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tfidf,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY tfidf DESC, term) AS rk
        |      FROM scored)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tfidf
        |FROM r WHERE rk <= 3""".stripMargin,

    "ev08_salted_agg" ->
      """SELECT user_id, count(*) AS n_events,
        | round(sum(value),2) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,

    "tx06_token_count" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
        | round(length(text) * 1.0 / len(regexp_extract_all(text, '\w+|[^\w\s]')), 4)
        |   AS chars_per_token
        |FROM documents""".stripMargin,

    "ev01_tumbling_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        | event_type, count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "ev02_sessionize" -> sessionizeSql,

    "ev29_session_durations" ->
      s"""WITH sess AS ($sessionizeSql),
         |x AS (SELECT CAST(floor(epoch(session_end)) AS BIGINT)
         |        - CAST(floor(epoch(session_start)) AS BIGINT) AS dur_s
         |      FROM sess)
         |SELECT CAST(length(bin(dur_s + 1)) - 1 AS INTEGER) AS bucket,
         |  count(*) AS n_sessions, min(dur_s) AS min_s, max(dur_s) AS max_s
         |FROM x GROUP BY 1""".stripMargin,

    "tx23_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents
        |           WHERE len(string_split(trim(text),' ')) >= 3),
        |g AS (SELECT doc_id, list_transform(range(1, len(tk)-1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tg FROM t)
        |SELECT doc_id, CAST(len(tg) AS INTEGER) AS n_trigrams,
        |  CAST(len(list_distinct(tg)) AS INTEGER) AS n_distinct,
        |  CAST((len(tg) - len(list_distinct(tg))) * 1000000 // len(tg) AS BIGINT)
        |    AS repetition_ppm
        |FROM g""".stripMargin,

    "pp05_incremental_ingest" ->
      s"""WITH j AS ($ngramJaccardSql),
         |sym AS (SELECT d1, d2 FROM j UNION ALL SELECT d2, d1 FROM j),
         |nd AS (SELECT doc_id FROM documents WHERE source = 'src0'),
         |fl AS (SELECT s.d1 AS doc_id,
         |    max(CASE WHEN dd.source <> 'src0' THEN 1 ELSE 0 END) AS has_old,
         |    max(CASE WHEN dd.source = 'src0' AND s.d2 < s.d1 THEN 1 ELSE 0 END)
         |      AS has_prior_new
         |  FROM sym s JOIN nd ON s.d1 = nd.doc_id
         |  JOIN documents dd ON s.d2 = dd.doc_id
         |  GROUP BY 1)
         |SELECT nd.doc_id,
         |  CASE WHEN fl.has_old = 1 THEN 'dup_old'
         |       WHEN fl.has_prior_new = 1 THEN 'dup_new'
         |       ELSE 'kept' END AS status
         |FROM nd LEFT JOIN fl ON nd.doc_id = fl.doc_id""".stripMargin,

    "q41_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | count(*) OVER (PARTITION BY o_custkey
        |   ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |   RANGE BETWEEN 2592000 PRECEDING AND 1 PRECEDING) AS n_prior_30d
        |FROM orders""".stripMargin,

    "ss16_nprobe_curve" ->
      s"""WITH ex AS (SELECT vec_id, label, i,
         |       CAST(embedding[i+1] AS DOUBLE) AS x
         |     FROM embeddings, range(64) t(i)),
         |cent AS (SELECT label AS cell, i, avg(x) AS c FROM ex GROUP BY 1, 2),
         |vc AS (SELECT ex.vec_id, cent.cell,
         |         sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS ccos
         |       FROM ex JOIN cent ON ex.i = cent.i
         |       GROUP BY 1, 2),
         |assigned AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
         |  FROM vc) WHERE crk = 1),
         |probes AS (SELECT vec_id AS qid, cell AS probe_cell, crk AS pr FROM (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
         |  FROM vc WHERE vec_id < 10) WHERE crk <= 3),
         |cand AS (SELECT p.qid, p.pr, a.vec_id AS neighbor_id,
         |    list_cosine_similarity(qe.embedding, e.embedding) AS cos
         |  FROM probes p
         |  JOIN assigned a ON a.cell = p.probe_cell AND a.vec_id != p.qid
         |  JOIN embeddings qe ON qe.vec_id = p.qid
         |  JOIN embeddings e ON e.vec_id = a.vec_id),
         |nps AS (SELECT unnest([1, 2, 3]) AS np),
         |r AS (SELECT n.np, c.qid, c.neighbor_id,
         |        row_number() OVER (PARTITION BY n.np, c.qid
         |          ORDER BY c.cos DESC, c.neighbor_id) AS rk
         |      FROM nps n JOIN cand c ON c.pr <= n.np),
         |approx AS (SELECT np, qid, neighbor_id FROM r WHERE rk <= 5),
         |exact AS ($bruteTopkSql),
         |ec AS (SELECT n.np, e.qid, e.neighbor_id FROM nps n CROSS JOIN exact e)
         |SELECT CAST(ec.np AS BIGINT) AS nprobe, ec.qid,
         |  count(a.neighbor_id) AS n_hit,
         |  CAST(count(a.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_bp
         |FROM ec LEFT JOIN approx a
         |  ON a.np = ec.np AND a.qid = ec.qid AND a.neighbor_id = ec.neighbor_id
         |GROUP BY 1, 2""".stripMargin,

    "ss09_ann_recall" ->
      s"""WITH e AS ($bruteTopkSql),
         |l AS ($ss02Sql)
         |SELECT e.qid, count(*) AS k, count(l.neighbor_id) AS n_hit,
         |  CAST(count(l.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_bp
         |FROM e LEFT JOIN l ON e.qid = l.qid AND e.neighbor_id = l.neighbor_id
         |GROUP BY e.qid""".stripMargin,

    // pp42: pp04's per-user-closed chain with ev54's flags anti-joined
    // on the OUTPUT (per-user closure makes that exactly the gated
    // recomputation — the Spark side reuses the verified pp04 plan).
    "pp42_gated_sessions" ->
      s"""WITH b AS ($botDetectSql),
         |s AS ($sessionizeSql),
         |sess AS (SELECT user_id, count(*) AS n_sessions,
         |    CAST(sum(n_events) * 10000 // count(*) AS BIGINT)
         |      AS events_per_session_bp,
         |    CAST(sum(CAST(floor(epoch(session_end)) AS BIGINT)
         |      - CAST(floor(epoch(session_start)) AS BIGINT)) AS BIGINT)
         |      AS total_session_s
         |  FROM s GROUP BY 1),
         |f AS (SELECT user_id, count(*) AS n_events,
         |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
         |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
         |      AS purchase_value
         |  FROM events GROUP BY user_id)
         |SELECT f.user_id, f.n_events, f.n_purchases, f.purchase_value,
         |  sess.n_sessions, sess.events_per_session_bp, sess.total_session_s
         |FROM f JOIN sess USING (user_id)
         |WHERE f.user_id NOT IN (SELECT user_id FROM b WHERE is_bot)""".stripMargin,

    "pp04_session_features" ->
      s"""WITH s AS ($sessionizeSql),
         |sess AS (SELECT user_id, count(*) AS n_sessions,
         |    CAST(sum(n_events) * 10000 // count(*) AS BIGINT)
         |      AS events_per_session_bp,
         |    CAST(sum(CAST(floor(epoch(session_end)) AS BIGINT)
         |      - CAST(floor(epoch(session_start)) AS BIGINT)) AS BIGINT)
         |      AS total_session_s
         |  FROM s GROUP BY 1),
         |f AS (SELECT user_id, count(*) AS n_events,
         |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
         |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
         |      AS purchase_value
         |  FROM events GROUP BY user_id)
         |SELECT f.user_id, f.n_events, f.n_purchases, f.purchase_value,
         |  sess.n_sessions, sess.events_per_session_bp, sess.total_session_s
         |FROM f JOIN sess USING (user_id)""".stripMargin,

    "ev03_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT e.user_id AS u, min(e.ts) AS p_ts
        |       FROM events e JOIN su ON e.user_id = su.user_id AND e.ts >= su.s_ts
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT count(*) AS n_signup, count(p_ts) AS n_converted
        |FROM su LEFT JOIN pu ON su.user_id = pu.u""".stripMargin,

    "ev04_retention" ->
      """WITH f AS (SELECT user_id,
        |             CAST(min(date_trunc('day', ts)) AS DATE) AS cohort
        |           FROM events GROUP BY 1)
        |SELECT cohort,
        |  CAST(date_diff('day', cohort, CAST(date_trunc('day', e.ts) AS DATE)) AS INTEGER)
        |    AS day_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "ev05_json_props" ->
      """SELECT CAST(regexp_extract(props, '[0-9]+') AS INTEGER) % 10 AS k_bucket,
        | count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1""".stripMargin,

    "ev06_asof_join" ->
      """SELECT p.event_id, p.user_id,
        | CAST(date_trunc('second', p.ts) AS TIMESTAMP) AS p_ts,
        | CAST(date_trunc('second', max(v.ts)) AS TIMESTAMP) AS prior_view_ts
        |FROM events p LEFT JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts""".stripMargin,

    "ev09_asof_native" ->
      """SELECT p.event_id, p.user_id,
        | CAST(date_trunc('second', p.ts) AS TIMESTAMP) AS p_ts,
        | CAST(date_trunc('second', max(v.ts)) AS TIMESTAMP) AS prior_view_ts
        |FROM events p LEFT JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts""".stripMargin,

    "ev18_asof_tolerance" ->
      """SELECT p.event_id, p.user_id,
        | CAST(date_trunc('second', p.ts) AS TIMESTAMP) AS p_ts,
        | CAST(date_trunc('second', max(v.ts)) AS TIMESTAMP) AS prior_view_ts
        |FROM events p LEFT JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        |  AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts""".stripMargin,

    "ev07_event_dedup" ->
      """SELECT user_id, event_type,
        | CAST(date_trunc('minute', ts) AS TIMESTAMP) AS bucket,
        | min(event_id) AS keep_id, count(*) AS n_dups
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "tx01_token_stats" ->
      """SELECT doc_id,
        | len(string_split(trim(text),' ')) AS n_tokens,
        | len(list_distinct(string_split(trim(text),' '))) AS n_distinct,
        | length(text) AS n_text_chars
        |FROM documents""".stripMargin,

    "tx02_quality_score" -> qualityScoreSql,

    "tx03_langid" ->
      """WITH x AS (SELECT doc_id, lang,
        |  len(list_filter(string_split(trim(text),' '),
        |      s -> s IN ('the','a','of','and','to','in'))) AS stop_cnt
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN stop_cnt >= 2 THEN 'en' ELSE 'unk' END AS pred_lang,
        |  (CASE WHEN stop_cnt >= 2 THEN 'en' ELSE 'unk' END) = lang AS is_match
        |FROM x""".stripMargin,

    "tx04_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(string_split(trim(text),' '))), ' '))
        |   AS fingerprint
        |FROM documents""".stripMargin,

    "tx05_bigram_freq" ->
      """WITH t AS (SELECT string_split(trim(text),' ') AS tk FROM documents
        |           WHERE len(string_split(trim(text),' ')) >= 2),
        |b AS (SELECT unnest(list_transform(range(1, len(tk)),
        |        i -> tk[i] || ' ' || tk[i+1])) AS bigram FROM t)
        |SELECT bigram, count(*) AS cnt FROM b GROUP BY 1
        |ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,

    "dd01_exact" ->
      """SELECT md5(lower(trim(text))) AS text_hash,
        | min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dd04_ngram_jaccard" -> ngramJaccardSql,
    "dd09_minhash_est" -> minhashEstSql,
    "dd38_bbit_minhash" -> bbitMinhashSql,

    // sk06's oracle replays the KMV sketch exactly: same 60-bit md5
    // hash, same k-th order statistic, same integer floor-divided
    // estimate (HUGEINT intermediate, BIGINT result).
    "sk06_theta_sets" ->
      """WITH h AS (SELECT DISTINCT event_type, user_id FROM events),
        |hv AS (SELECT event_type,
        |        ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |          AS hv
        |      FROM h),
        |seg AS (SELECT 'a' AS s, hv FROM hv WHERE event_type = 'purchase'
        |        UNION SELECT 'b' AS s, hv FROM hv WHERE event_type = 'view'
        |        UNION SELECT 'u' AS s, hv FROM hv
        |          WHERE event_type IN ('purchase', 'view')),
        |r AS (SELECT s, hv, row_number() OVER (PARTITION BY s ORDER BY hv)
        |        AS rn FROM seg),
        |est AS (SELECT s,
        |         CASE WHEN count(*) < 128 THEN CAST(count(*) AS BIGINT)
        |              ELSE CAST((127::HUGEINT * 1152921504606846976::HUGEINT)
        |                // max(CASE WHEN rn = 128 THEN hv END)::HUGEINT
        |                AS BIGINT)
        |         END AS est
        |       FROM r GROUP BY s)
        |SELECT
        |  max(CASE WHEN s = 'a' THEN est END) AS est_purchasers,
        |  max(CASE WHEN s = 'b' THEN est END) AS est_viewers,
        |  max(CASE WHEN s = 'u' THEN est END) AS est_union,
        |  max(CASE WHEN s = 'a' THEN est END)
        |    + max(CASE WHEN s = 'b' THEN est END)
        |    - max(CASE WHEN s = 'u' THEN est END) AS est_overlap
        |FROM est""".stripMargin,
    // sk15: sk06's KMV replay over the 60-bit normalized-text doc
    // identity, segmented batch/standing/union; difference and
    // overlap are integer arithmetic on the three estimates.
    "sk15_theta_diff" ->
      """WITH h AS (SELECT DISTINCT source,
        |    ('0x' || substring(md5(lower(trim(text))), 1, 15))::BIGINT AS key
        |  FROM documents),
        |hv AS (SELECT source,
        |    ('0x' || substring(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM h),
        |seg AS (SELECT 'a' AS s, hv FROM hv WHERE source = 'src0'
        |        UNION SELECT 'b', hv FROM hv WHERE source != 'src0'
        |        UNION SELECT 'u', hv FROM hv),
        |r AS (SELECT s, hv, row_number() OVER (PARTITION BY s ORDER BY hv)
        |        AS rn FROM seg),
        |est AS (SELECT s,
        |         CASE WHEN count(*) < 128 THEN CAST(count(*) AS BIGINT)
        |              ELSE CAST((127::HUGEINT * 1152921504606846976::HUGEINT)
        |                // max(CASE WHEN rn = 128 THEN hv END)::HUGEINT
        |                AS BIGINT)
        |         END AS est
        |       FROM r GROUP BY s)
        |SELECT
        |  max(CASE WHEN s = 'a' THEN est END) AS est_batch,
        |  max(CASE WHEN s = 'b' THEN est END) AS est_standing,
        |  max(CASE WHEN s = 'u' THEN est END) AS est_union,
        |  max(CASE WHEN s = 'a' THEN est END)
        |    + max(CASE WHEN s = 'b' THEN est END)
        |    - max(CASE WHEN s = 'u' THEN est END) AS est_overlap,
        |  max(CASE WHEN s = 'u' THEN est END)
        |    - max(CASE WHEN s = 'b' THEN est END) AS est_new
        |FROM est""".stripMargin,

    // dd20 is dd04 with prefix filtering — provably the same output,
    // so it shares dd04's oracle verbatim
    "dd20_ppjoin" -> ngramJaccardSql,
    "dd02_minhash_lsh"   -> ngramJaccardSql,
    "gr03_pagerank"      -> pageRankSql,
    "gr07_personalized_pr" -> personalizedPrSql,
    "gr05_kcore"         -> kCoreSql,

    "ev30_stickiness" ->
      """WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    user_id FROM events),
        |days AS (SELECT DISTINCT day AS d FROM du),
        |a AS (SELECT day AS d, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
        |m AS (SELECT d, count(DISTINCT user_id) AS mau
        |      FROM du JOIN days ON du.day <= days.d AND du.day >= days.d - 27
        |      GROUP BY 1)
        |SELECT a.d AS day, a.dau, m.mau,
        |  CAST(a.dau * 10000 // m.mau AS BIGINT) AS stickiness_bp
        |FROM a JOIN m ON a.d = m.d""".stripMargin,

    "ev31_multistep_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |s1 AS (SELECT user_id, min(ts_s) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts_s) AS t2 FROM e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'view' AND ts_s > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts_s) AS t3 FROM e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND ts_s > t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_viewed_after,
        |       (SELECT count(*) FROM s3) AS n_purchased_after""".stripMargin,

    "ev32_seasonality" ->
      """WITH e AS (SELECT CAST(hour(ts) AS INTEGER) AS hour,
        |    dayofweek(ts) IN (0, 6) AS is_weekend,
        |    CAST(round(value * 100, 0) AS BIGINT) AS vc
        |  FROM events),
        |c AS (SELECT hour, is_weekend, count(*) AS n_events,
        |    CAST(sum(vc) AS BIGINT) AS value_c FROM e GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS n_total FROM c)
        |SELECT hour, is_weekend, n_events, value_c,
        |  CAST(n_events * 10000 // n_total AS BIGINT) AS share_bp
        |FROM c CROSS JOIN t""".stripMargin,

    "tx25_source_quality" ->
      s"""WITH q AS ($qualityScoreSql),
         |j AS (SELECT q.doc_id, q.n_tokens, q.score, d.source
         |      FROM q JOIN documents d ON q.doc_id = d.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens,
         |  CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS pass_bp
         |FROM j GROUP BY 1""".stripMargin,

    "dd13_threshold_curve" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |j AS (SELECT d1, d2,
        |        round(shared * 1.0 / (x.n + y.n - shared), 4) AS jaccard
        |      FROM pairs JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |      WHERE round(shared * 1.0 / (x.n + y.n - shared), 4) >= 0.5),
        |tt AS (SELECT CAST(unnest([0.50,0.55,0.60,0.65,0.70,0.75,0.80,0.85,0.90])
        |         AS DOUBLE) AS thresh)
        |SELECT thresh, count(*) AS n_pairs
        |FROM j CROSS JOIN tt WHERE jaccard >= thresh
        |GROUP BY 1""".stripMargin,

    // dd24: per-pair detect probability rounded onto the ppm integer
    // grid BEFORE averaging (integer sum div count) — float summation
    // order cannot touch the hash; pow/round on identical doubles is
    // the tx08 precedent. Pair generation rides the hot-shingle df
    // cap (> 128 dropped), mirroring Dedup.discriminative.
    "dd24_lsh_tuner" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 128),
        |shc AS (SELECT doc_id, s FROM sh
        |        WHERE s NOT IN (SELECT s FROM hot)),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |j AS (SELECT round(shared * 1.0 / (x.n + y.n - shared), 4) AS jaccard
        |      FROM pairs JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |      WHERE round(shared * 1.0 / (x.n + y.n - shared), 4) >= 0.5),
        |cfg AS (SELECT * FROM (VALUES (1, 32), (2, 16), (4, 8), (8, 4))
        |        c(rows_per_band, n_bands)),
        |dp AS (SELECT rows_per_band, n_bands,
        |         CAST(round((1 - pow(1 - pow(jaccard, rows_per_band),
        |           n_bands)) * 1000000.0, 0) AS BIGINT) AS detect_ppm
        |       FROM j CROSS JOIN cfg)
        |SELECT rows_per_band, n_bands, count(*) AS n_pairs,
        |  CAST(sum(detect_ppm) // count(*) AS BIGINT) AS mean_detect_ppm,
        |  CAST(min(detect_ppm) AS BIGINT) AS min_detect_ppm
        |FROM dp GROUP BY 1, 2""".stripMargin,

    "tx24_lang_confusion" ->
      """WITH x AS (SELECT doc_id, lang,
        |  len(list_filter(string_split(trim(text),' '),
        |      s -> s IN ('the','a','of','and','to','in'))) AS stop_cnt
        |  FROM documents),
        |p AS (SELECT lang,
        |  CASE WHEN stop_cnt >= 2 THEN 'en' ELSE 'unk' END AS pred_lang FROM x)
        |SELECT lang, pred_lang, count(*) AS n_docs FROM p GROUP BY 1, 2""".stripMargin,

    "dd03_simhash" ->
      s"""WITH $simhashPairsSql
         |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 12""".stripMargin,

    "dd14_simhash_precision" ->
      s"""WITH $simhashPairsSql
         |SELECT count(*) AS n_candidates,
         |  CAST(sum(CASE WHEN hamming <= 12 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_verified,
         |  CAST(sum(CASE WHEN hamming <= 12 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 10000 // count(*) AS precision_bp
         |FROM pairs""".stripMargin,

    "ev34_weekday_anomaly" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1),
        |wd AS (SELECT day, n_events, dayofweek(day) + 1 AS weekday
        |  FROM daily),
        |r AS (SELECT weekday, n_events, day,
        |    row_number() OVER (PARTITION BY weekday
        |      ORDER BY n_events, day) AS rn,
        |    count(*) OVER (PARTITION BY weekday) AS n_days
        |  FROM wd),
        |med AS (SELECT weekday, n_events AS wd_median FROM r
        |  WHERE rn = (n_days + 1) // 2)
        |SELECT w.day, w.weekday, w.n_events, m.wd_median,
        |  abs(w.n_events - m.wd_median) * 10000 // m.wd_median AS dev_bp,
        |  CASE WHEN abs(w.n_events - m.wd_median) * 10000 // m.wd_median
        |    > 3000 THEN 1 ELSE 0 END AS is_anomaly
        |FROM wd w JOIN med m USING (weekday)""".stripMargin,

    "q50_null_semantics" ->
      """WITH o AS (SELECT nullif(o_custkey % 7, 0) AS x, o_totalprice
        |  FROM orders),
        |grouped AS (SELECT x, count(*) AS n_rows, count(x) AS n_x,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS total_c
        |  FROM o GROUP BY x),
        |dim AS (SELECT x AS y, n_rows AS dim_rows FROM grouped)
        |SELECT g.x, g.n_rows, g.n_x, g.total_c,
        |  (d.dim_rows = g.n_rows) AS nullsafe_match
        |FROM grouped g LEFT JOIN dim d ON g.x IS NOT DISTINCT FROM d.y""".stripMargin,

    "dd12_token_windows" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents
        |           WHERE len(string_split(trim(text),' ')) >= 20),
        |w AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-20+2),
        |         i -> md5(array_to_string(list_slice(tk, i, i+19), ' '))))) AS win_hash
        |      FROM t)
        |SELECT win_hash, count(*) AS n_docs FROM w GROUP BY 1
        |HAVING count(*) >= 2""".stripMargin,

    "ss11_embedding_audit" ->
      """WITH x AS (SELECT label,
        |    sqrt(list_sum(list_transform(embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  round(min(nrm), 6) AS min_norm,
        |  round(max(nrm), 6) AS max_norm,
        |  CAST(sum(CASE WHEN abs(nrm - 1.0) < 0.01 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unit,
        |  CAST(sum(CASE WHEN nrm < 0.001 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_degenerate
        |FROM x GROUP BY 1""".stripMargin,

    "q46_window_distinct" ->
      """WITH f AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN row_number() OVER (
        |      PARTITION BY o_custkey, o_orderpriority
        |      ORDER BY o_orderdate, o_orderkey) = 1 THEN 1 ELSE 0 END AS is_first
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(sum(is_first) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_distinct_prio
        |FROM f""".stripMargin,

    "tx26_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |shared AS (SELECT s FROM sh GROUP BY s
        |           HAVING count(DISTINCT doc_id) > 1)
        |SELECT sh.doc_id, count(*) AS n_trigrams,
        |  CAST(count(*) - count(shared.s) AS BIGINT) AS n_unique,
        |  CAST((count(*) - count(shared.s)) * 1000000 // count(*) AS BIGINT)
        |    AS novelty_ppm
        |FROM sh LEFT JOIN shared ON sh.s = shared.s
        |GROUP BY 1""".stripMargin,

    "q45_decimal_money" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_c,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS min_c,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS max_c,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,

    "ev28_decay_scores" ->
      """WITH mx AS (SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS corpus_max
        |            FROM events),
        |w AS (SELECT user_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS value_c,
        |    date_diff('day', CAST(date_trunc('day', ts) AS DATE), corpus_max) // 7
        |      AS age_w
        |  FROM events CROSS JOIN mx)
        |SELECT user_id,
        |  CAST(sum(value_c * (CASE WHEN age_w <= 5
        |    THEN (CAST(1 AS BIGINT) << CAST(5 - age_w AS INT))
        |    ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS decay_score_c32,
        |  count(*) AS n_events
        |FROM w GROUP BY 1""".stripMargin,

    // tx48: add-1-smoothed bigram surprise — the micro-nat value is
    // ln of a double both engines derive from the same three int64s
    // (c1, V, c12); per-doc aggregation is integer-only.
    "tx48_bigram_surprise" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents
        |           WHERE len(string_split(trim(text),' ')) >= 2),
        |bi AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
        |  FROM t),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (
        |        SELECT unnest(string_split(trim(text),' ')) AS tok
        |        FROM documents) u),
        |sp AS (SELECT c12.w1, c12.w2,
        |    CAST(round(ln((c1 + v) * 1.0 / (c12 + 1)) * 1000000.0, 0)
        |      AS BIGINT) AS snat
        |  FROM c12 JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(snat) // count(*) AS BIGINT) AS mean_surprise2_unat
        |FROM bi JOIN sp ON bi.w1 = sp.w1 AND bi.w2 = sp.w2
        |GROUP BY 1""".stripMargin,

    // ev52: conversion CDF — first purchase at-or-after first signup;
    // cumulative counts against the full signup cohort per day offset.
    "ev52_conversion_curve" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch(ts) AS BIGINT) AS ts_s FROM events),
        |su AS (SELECT user_id, min(ts_s) AS su FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (SELECT e.user_id, min(e.ts_s - su.su) AS delta_s
        |         FROM e JOIN su USING (user_id)
        |         WHERE e.event_type = 'purchase' AND e.ts_s >= su.su
        |         GROUP BY 1),
        |cohort AS (SELECT su.user_id, conv.delta_s // 86400 AS off_days
        |           FROM su LEFT JOIN conv USING (user_id)),
        |spine AS (SELECT unnest(range(0, 8)) AS k)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(sum(CASE WHEN off_days IS NOT NULL AND off_days <= k
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CAST(sum(CASE WHEN off_days IS NOT NULL AND off_days <= k
        |       THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS conv_bp
        |FROM cohort CROSS JOIN spine GROUP BY 1""".stripMargin,

    // ev51: CEP negation pattern — conditional mins over the identical
    // [1 FOLLOWING, ∞) frame; row-local integer match rule; an error
    // sharing the purchase's second blocks (total, engine-agnostic).
    "ev51_pattern_negation" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(epoch(ts) AS BIGINT) AS s FROM events),
        |x AS (SELECT user_id, event_type, s,
        |    min(CASE WHEN event_type = 'purchase' THEN s END) OVER w AS np,
        |    min(CASE WHEN event_type = 'error' THEN s END) OVER w AS ne
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |v AS (SELECT user_id,
        |    CASE WHEN np IS NOT NULL AND np - s <= 7200
        |          AND NOT (ne IS NOT NULL AND ne <= np)
        |         THEN 1 ELSE 0 END AS m
        |  FROM x WHERE event_type = 'view')
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_views,
        |  CAST(sum(m) AS BIGINT) AS n_matches,
        |  CAST(sum(m) * 10000 // count(*) AS BIGINT) AS match_bp
        |FROM v GROUP BY 1""".stripMargin,

    "tx21_bigram_lm" ->
      """WITH t AS (SELECT string_split(trim(text),' ') AS tk FROM documents
        |           WHERE len(string_split(trim(text),' ')) >= 2),
        |b AS (SELECT
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
        |  FROM t),
        |c AS (SELECT w1, w2, count(*) AS cnt FROM b GROUP BY 1, 2),
        |r AS (SELECT w1, w2, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY w1) AS BIGINT) AS total,
        |    row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS rk
        |  FROM c)
        |SELECT w1, w2 AS top_w2, CAST(cnt AS BIGINT) AS top_cnt,
        |  CAST(cnt * 1000000 // total AS BIGINT) AS prob_ppm
        |FROM r WHERE rk = 1 AND total >= 10""".stripMargin,

    "tx22_zipf_head" ->
      """WITH t AS (SELECT unnest(string_split(trim(text),' ')) AS token
        |           FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1),
        |k AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 30)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
        |  token, CAST(cnt AS BIGINT) AS cnt
        |FROM k""".stripMargin,

    "mm08_sig_neardup" ->
      """WITH p AS (SELECT doc_id, encode(text) AS payload FROM documents
        |           WHERE octet_length(encode(text)) >= 16),
        |x AS (SELECT doc_id, hex(payload) AS h, octet_length(payload) AS n FROM p),
        |v AS (SELECT doc_id, list_transform(range(0, 16), j ->
        |    (strpos('0123456789ABCDEF', substr(h, (j * n // 16) * 2 + 1, 1)) - 1) * 16 +
        |    (strpos('0123456789ABCDEF', substr(h, (j * n // 16) * 2 + 2, 1)) - 1)) AS vals
        |  FROM x),
        |m AS (SELECT doc_id, vals, list_sum(vals) // 16 AS m FROM v),
        |sg AS (SELECT array_to_string(list_transform(vals,
        |    v -> CASE WHEN v > m THEN '1' ELSE '0' END), '') AS sig FROM m)
        |SELECT sig, count(*) AS n_docs FROM sg GROUP BY 1
        |HAVING count(*) >= 2""".stripMargin,

    "q44_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_c4
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    "tx07_hash_sample" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')""".stripMargin,

    "dd06_dup_clusters" -> dupClustersSql,

    // dd25: soft-dedup sampling weights — cluster membership from the
    // dd06 recursive-CTE fixed point; docs outside any cluster are
    // their own singleton. All-integer (count + integer div), so the
    // hash is grid-exact.
    "dd25_dup_weights" ->
      s"""WITH clusters AS ($dupClustersSql),
         |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |       FROM clusters GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
         |  CAST(coalesce(cs.cluster_size, 1) AS BIGINT) AS cluster_size,
         |  CAST(1000000 // coalesce(cs.cluster_size, 1) AS BIGINT) AS weight_ppm
         |FROM documents d
         |LEFT JOIN clusters c ON d.doc_id = c.doc_id
         |LEFT JOIN cs ON c.cluster_id = cs.cluster_id""".stripMargin,

    // dd29: the removed set is dd07's complement (non-keeper cluster
    // members), replayed through the dd06 recursive-CTE fixed point +
    // the keep-best window; inflation on the bp grid (nonneg div).
    "dd29_dup_inflation" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |  SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk
         |  FROM j) WHERE rk = 1),
         |removed AS (SELECT c.doc_id FROM clusters c
         |            JOIN keep k ON c.cluster_id = k.cluster_id
         |            WHERE c.doc_id != k.keeper_id),
         |dt AS (SELECT doc_id, source,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removed,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
         |  CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN n_tokens ELSE 0 END)
         |    AS BIGINT) AS tokens_removed,
         |  CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 10000 // count(*) AS BIGINT) AS doc_inflation_bp,
         |  CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN n_tokens ELSE 0 END)
         |    * 10000 // sum(n_tokens) AS BIGINT) AS token_inflation_bp
         |FROM dt LEFT JOIN removed r USING (doc_id)
         |GROUP BY source""".stripMargin,

    // dd30: one postings aggregate; the 128 literal mirrors the
    // default spark.graft.dedup.maxDf (the cap dd10/dd24 apply).
    "dd30_cap_audit" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |p AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
        |SELECT CAST(max(df) AS BIGINT) AS max_df,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN df > 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hot_shingles,
        |  CAST(sum(df) AS BIGINT) AS postings_total,
        |  CAST(sum(CASE WHEN df > 128 THEN df ELSE 0 END) AS BIGINT)
        |    AS postings_dropped,
        |  CAST(sum(df * (df - 1) // 2) AS BIGINT) AS pair_rows_exact,
        |  CAST(sum(CASE WHEN df <= 128 THEN df * (df - 1) // 2 ELSE 0 END)
        |    AS BIGINT) AS pair_rows_capped
        |FROM p""".stripMargin,

    // ev58: both lags share one (user, ts, event_id) window; ppm
    // conditional on the integer grid; the (cnt DESC, prev2, prev1,
    // next_type) order makes the top-25 cut deterministic.
    "ev58_second_order" ->
      """WITH l AS (SELECT user_id, event_type AS next_type,
        |    lag(event_type, 1) OVER w AS prev1,
        |    lag(event_type, 2) OVER w AS prev2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tri AS (SELECT prev2, prev1, next_type FROM l
        |        WHERE prev2 IS NOT NULL),
        |ctx AS (SELECT prev2, prev1, CAST(count(*) AS BIGINT) AS ctx_n
        |        FROM tri GROUP BY 1, 2),
        |c AS (SELECT prev2, prev1, next_type, CAST(count(*) AS BIGINT)
        |        AS cnt FROM tri GROUP BY 1, 2, 3)
        |SELECT c.prev2, c.prev1, c.next_type, c.cnt, ctx.ctx_n,
        |  CAST(c.cnt * 1000000 // ctx.ctx_n AS BIGINT) AS cond_ppm
        |FROM c JOIN ctx USING (prev2, prev1)
        |ORDER BY cnt DESC, prev2, prev1, next_type
        |LIMIT 25""".stripMargin,

    // pp46: pp19's largest-remainder allocation with the dd07 removed
    // set filtered out of the token mass first.
    "pp46_dedup_quota" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |  SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk
         |  FROM j) WHERE rk = 1),
         |removed AS (SELECT c.doc_id FROM clusters c
         |            JOIN keep k ON c.cluster_id = k.cluster_id
         |            WHERE c.doc_id != k.keeper_id),
         |s AS (SELECT source,
         |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents doc
         |  WHERE NOT EXISTS (SELECT 1 FROM removed r
         |                    WHERE r.doc_id = doc.doc_id)
         |  GROUP BY 1),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM s),
         |q AS (SELECT source, n_tokens,
         |    CAST(1000000 * n_tokens // t AS BIGINT) AS base,
         |    CAST((1000000 * n_tokens) % t AS BIGINT) AS rem
         |  FROM s CROSS JOIN t),
         |dft AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS deficit
         |        FROM q),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
         |      AS BIGINT) AS rk FROM q)
         |SELECT source, n_tokens,
         |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
         |    AS alloc_tokens
         |FROM r CROSS JOIN dft""".stripMargin,

    // dd31: the truth side is dd04's pair pipeline verbatim (rounded
    // jaccard >= 0.6) with the band label re-derived as the INTEGER
    // floor shared*10 // union; the candidate test is dd09's portable
    // K–M slot-pair band equality.
    "dd31_lsh_recall" -> {
      val slots = (0 until 32).map(j =>
        if (j == 0) "min(h1) AS m0" else s"min(h1 + $j * h2) AS m$j")
        .mkString(", ")
      val bandEq = (0 until 16).map(b =>
        s"(a.m${2 * b} = b.m${2 * b} AND a.m${2 * b + 1} = b.m${2 * b + 1})")
        .mkString(" OR ")
      s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
         |           FROM documents
         |           WHERE len(string_split(trim(text),' ')) >= 3),
         |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |         range(1, len(tk)-1),
         |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
         |       FROM t),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |truth AS (SELECT d1, d2,
         |    least(shared * 10 // (x.n + y.n - shared), 9) AS j_band
         |  FROM pairs JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         |  WHERE round(shared * 1.0 / (x.n + y.n - shared), 4) >= 0.6),
         |hs AS (SELECT doc_id,
         |         ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
         |         ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2 FROM sh),
         |sig AS (SELECT doc_id, $slots FROM hs GROUP BY doc_id),
         |probe AS (SELECT t.j_band,
         |    CASE WHEN $bandEq THEN 1 ELSE 0 END AS caught
         |  FROM truth t JOIN sig a ON t.d1 = a.doc_id
         |  JOIN sig b ON t.d2 = b.doc_id)
         |SELECT CAST(j_band AS BIGINT) AS j_band,
         |  CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(caught) AS BIGINT) AS n_caught,
         |  CAST(sum(caught) * 10000 // count(*) AS BIGINT) AS recall_bp
         |FROM probe GROUP BY 1""".stripMargin
    },

    // ev59: exact order statistics (percentile_disc) over the daily
    // count frame — med, MAD and deviations all integer.
    "ev59_mad_anomaly" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS n FROM events GROUP BY 1),
        |m AS (SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
        |        AS BIGINT) AS med FROM daily),
        |dv AS (SELECT day, CAST(n AS BIGINT) AS n, med,
        |         abs(n - med) AS adev FROM daily CROSS JOIN m),
        |md AS (SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)
        |         AS BIGINT) AS mad FROM dv)
        |SELECT day, n, med, mad, CAST(adev AS BIGINT) AS deviation,
        |  adev > mad * 3 AS is_anomaly
        |FROM dv CROSS JOIN md""".stripMargin,

    // ev60: every division that can see a negative dividend is spelled
    // truncate-toward-zero on both engines (Spark `div` truncates,
    // DuckDB `//` floors — the sign-explicit CASE makes them agree).
    "ev60_cuped" ->
      """WITH sp AS (SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
        |             CAST(max(date_trunc('day', ts)) AS DATE) AS d1
        |           FROM events),
        |pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN date_diff('day', sp.d0,
        |        CAST(date_trunc('day', ts) AS DATE)) * 2
        |        < date_diff('day', sp.d0, sp.d1) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN date_diff('day', sp.d0,
        |        CAST(date_trunc('day', ts) AS DATE)) * 2
        |        < date_diff('day', sp.d0, sp.d1) THEN 0 ELSE 1 END)
        |      AS BIGINT) AS y
        |  FROM events CROSS JOIN sp GROUP BY 1),
        |pooled AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pu),
        |th AS (SELECT n, sx,
        |    CASE WHEN (n * sxy - sx * sy) >= 0
        |      THEN ((n * sxy - sx * sy) * 10000)
        |        // greatest(1, n * sxx - sx * sx)
        |      ELSE -(((-(n * sxy - sx * sy)) * 10000)
        |        // greatest(1, n * sxx - sx * sx)) END AS theta_bp
        |  FROM pooled),
        |arms AS (SELECT user_id % 2 AS arm,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(x) AS BIGINT) AS sum_pre,
        |    CAST(sum(y) AS BIGINT) AS sum_post
        |  FROM pu GROUP BY 1),
        |j AS (SELECT a.arm, a.n_users, a.sum_pre, a.sum_post, th.theta_bp,
        |    a.sum_post * 10000 // a.n_users AS mean_post_bp,
        |    a.sum_pre * 10000 // a.n_users - th.sx * 10000 // th.n AS dx_bp
        |  FROM arms a CROSS JOIN th)
        |SELECT arm, n_users, sum_pre, sum_post, mean_post_bp, theta_bp,
        |  mean_post_bp - (CASE WHEN theta_bp * dx_bp >= 0
        |    THEN (theta_bp * dx_bp) // 10000
        |    ELSE -((-(theta_bp * dx_bp)) // 10000) END) AS mean_adj_bp
        |FROM j""".stripMargin,

    // ev61: the dividend is a square, so plain // is already the
    // truncation both engines agree on.
    "ev61_srm_check" ->
      """WITH u AS (SELECT event_type, user_id FROM events
        |    WHERE event_type != '_overall'
        |  UNION SELECT '_overall' AS event_type, user_id FROM events),
        |a AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_arm0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_arm1
        |  FROM u GROUP BY 1)
        |SELECT event_type, n_arm0, n_arm1,
        |  (n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000
        |    // greatest(1, n_arm0 + n_arm1) AS stat_milli,
        |  (n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000
        |    // greatest(1, n_arm0 + n_arm1) > 3841 AS srm_flag
        |FROM a""".stripMargin,

    // ev62: subtractions only AFTER the non-negative floor divisions —
    // no sign case anywhere.
    "ev62_diff_in_diff" ->
      """WITH sp AS (SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
        |             CAST(max(date_trunc('day', ts)) AS DATE) AS d1
        |           FROM events),
        |pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN date_diff('day', sp.d0,
        |        CAST(date_trunc('day', ts) AS DATE)) * 2
        |        < date_diff('day', sp.d0, sp.d1) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN date_diff('day', sp.d0,
        |        CAST(date_trunc('day', ts) AS DATE)) * 2
        |        < date_diff('day', sp.d0, sp.d1) THEN 0 ELSE 1 END)
        |      AS BIGINT) AS y
        |  FROM events CROSS JOIN sp GROUP BY 1),
        |arms AS (SELECT user_id % 2 AS arm,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(x) AS BIGINT) AS sum_pre,
        |    CAST(sum(y) AS BIGINT) AS sum_post
        |  FROM pu GROUP BY 1),
        |m AS (SELECT arm, n_users, sum_pre, sum_post,
        |    sum_pre * 10000 // n_users AS mean_pre_bp,
        |    sum_post * 10000 // n_users AS mean_post_bp,
        |    sum_post * 10000 // n_users - sum_pre * 10000 // n_users
        |      AS delta_bp
        |  FROM arms),
        |dd AS (SELECT CAST(sum(CASE WHEN arm = 1 THEN delta_bp
        |         ELSE -delta_bp END) AS BIGINT) AS did_bp FROM m)
        |SELECT m.*, dd.did_bp FROM m CROSS JOIN dd""".stripMargin,

    // pp47: split hash over the dup-cluster representative (dd06's
    // recursive-CTE fixed point; singletons are their own rep) — the
    // same md5 first-hex-digit rule as pp16/pp08.
    "pp47_cluster_split" ->
      s"""WITH clusters AS ($dupClustersSql),
         |r AS (SELECT d.doc_id, d.source,
         |    CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS n_tokens,
         |    coalesce(c.cluster_id, d.doc_id) AS rep_id
         |  FROM documents d LEFT JOIN clusters c USING (doc_id)),
         |sp AS (SELECT *,
         |    CASE substr(md5(CAST(rep_id AS VARCHAR)), 1, 1)
         |      WHEN 'f' THEN 'test' WHEN 'e' THEN 'val' ELSE 'train'
         |    END AS split
         |  FROM r)
         |SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT rep_id) AS BIGINT) AS n_groups,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens
         |FROM sp GROUP BY 1, 2""".stripMargin,

    // pp48: the dataset card — volume (exact median doc length), dup
    // membership, langid and quality gates, all integer.
    "pp48_dataset_card" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT d.source, s.n_tokens, s.stop_cnt, s.score,
         |    CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
         |  FROM documents d JOIN scores s USING (doc_id)
         |  LEFT JOIN clusters c USING (doc_id))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
         |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)
         |    AS BIGINT) AS p50_tokens,
         |  CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
         |  CAST(sum(CASE WHEN stop_cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_en,
         |  CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality,
         |  CAST(sum(is_dup) * 10000 // count(*) AS BIGINT) AS dup_bp,
         |  CAST(sum(CASE WHEN stop_cnt >= 2 THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS en_bp,
         |  CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS quality_bp
         |FROM j GROUP BY 1""".stripMargin,

    // sk13: the AMS signs, group means and median replay exactly — the
    // ±1 signs are md5 bits, everything else integer arithmetic.
    "sk13_ams_f2" -> {
      val xs = (0 until 40).map(i =>
        s"CAST(sum(('0x' || substring(md5('e$i#' || CAST(user_id AS VARCHAR)), 1, 1))::BIGINT % 2 * 2 - 1) AS BIGINT) AS x$i")
        .mkString(",\n|    ")
      val gs = (0 until 5).map(j =>
        "(" + (8 * j until 8 * j + 8).map(i => s"x$i * x$i")
          .mkString(" + ") + s") // 8 AS g$j").mkString(",\n|    ")
      s"""WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
         |x AS (SELECT
         |    $xs
         |  FROM e),
         |g AS (SELECT
         |    $gs
         |  FROM x),
         |m AS (SELECT list_sort([g0, g1, g2, g3, g4])[3] AS ams_est FROM g),
         |f AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM
         |  (SELECT count(*) AS c FROM e GROUP BY user_id))
         |SELECT f2_exact, CAST(ams_est AS BIGINT) AS ams_est,
         |  CAST(abs(ams_est - f2_exact) * 10000 // f2_exact AS BIGINT)
         |    AS err_bp
         |FROM f CROSS JOIN m""".stripMargin
    },

    // sk14: the AMS estimator replayed per candidate key column —
    // ONE md5 per row per column, estimator i's ±1 sign = bit (i%4)
    // of hex char (1 + i//4) of that digest; means of 8, median of 5,
    // the eff = n²//F̂2 threshold rule, and the strategy-invariant
    // exact (n_keys, max_freq) — the route column proves the router
    // decided identically cross-engine.
    "sk14_ams_route" -> {
      val xs = (0 until 40).map(i =>
        s"CAST(sum(('0x' || substring(hh, ${1 + i / 4}, 1))::BIGINT // ${1 << (i % 4)} % 2 * 2 - 1) AS BIGINT) AS x$i")
        .mkString(", ")
      val gs = (0 until 5).map(j =>
        "(" + (8 * j until 8 * j + 8).map(i => s"x$i * x$i")
          .mkString(" + ") + s") // 8 AS g$j").mkString(", ")
      val cols = Seq("event_type" -> 1, "user_id" -> 2, "event_id" -> 3)
      val ctes = cols.map { case (c, i) =>
        s"""e$i AS (SELECT md5('s14#' || CAST($c AS VARCHAR)) AS hh,
           |          CAST($c AS VARCHAR) AS k FROM events
           |        WHERE user_id IS NOT NULL),
           |x$i AS (SELECT CAST(count(*) AS BIGINT) AS n, $xs FROM e$i),
           |g$i AS (SELECT n, $gs FROM x$i),
           |m$i AS (SELECT n, CAST(greatest(1, list_sort([g0, g1, g2, g3, g4])[3])
           |          AS BIGINT) AS ams_est FROM g$i),
           |r$i AS (SELECT n, ams_est,
           |          CAST(n * n // ams_est AS BIGINT) AS eff_keys FROM m$i),
           |k$i AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |          CAST(max(c) AS BIGINT) AS max_freq
           |        FROM (SELECT count(*) AS c FROM e$i GROUP BY k) _t$i),
           |b$i AS (SELECT '$c' AS key_col, n AS n_rows, ams_est, eff_keys,
           |          CASE WHEN eff_keys <= 1000 THEN 'salted'
           |               ELSE 'plain' END AS route, n_keys, max_freq
           |        FROM r$i CROSS JOIN k$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ctes}
         |SELECT * FROM b1
         |UNION ALL SELECT * FROM b2
         |UNION ALL SELECT * FROM b3""".stripMargin
    },

    // dd35: every verified pair lies inside one component, so intra =
    // pairs joined to the cluster table on both endpoints; means and
    // density are integer floors on the shared 4-dp Jaccard grid.
    "dd35_cluster_cohesion" ->
      s"""WITH nd AS ($ngramJaccardSql),
         |cl AS ($dupClustersSql),
         |intra AS (SELECT a.cluster_id,
         |    CAST(count(*) AS BIGINT) AS n_intra_pairs,
         |    CAST(CAST(sum(CAST(round(nd.jaccard * 10000, 0) AS BIGINT))
         |      AS BIGINT) // count(*) AS BIGINT) AS mean_j_bp
         |  FROM nd JOIN cl a ON nd.d1 = a.doc_id
         |  JOIN cl b ON nd.d2 = b.doc_id
         |  WHERE a.cluster_id = b.cluster_id GROUP BY 1),
         |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
         |       FROM cl GROUP BY 1)
         |SELECT sz.cluster_id, n_members,
         |  coalesce(n_intra_pairs, 0) AS n_intra_pairs,
         |  coalesce(mean_j_bp, 0) AS mean_j_bp,
         |  CAST(coalesce(n_intra_pairs, 0) * 10000
         |    // greatest(1, n_members * (n_members - 1) // 2)
         |    AS BIGINT) AS density_bp
         |FROM sz LEFT JOIN intra USING (cluster_id)""".stripMargin,

    // dd32: the verified pair set keyed by unordered source pair; the
    // docs_a/docs_b sides follow the src_a/src_b orientation.
    "dd32_cross_source" ->
      s"""WITH nd AS ($ngramJaccardSql),
         |j AS (SELECT nd.d1, nd.d2, a.source AS s1, b.source AS s2
         |      FROM nd JOIN documents a ON nd.d1 = a.doc_id
         |      JOIN documents b ON nd.d2 = b.doc_id)
         |SELECT least(s1, s2) AS src_a, greatest(s1, s2) AS src_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT CASE WHEN s1 <= s2 THEN d1 ELSE d2 END)
         |    AS BIGINT) AS n_docs_a,
         |  CAST(count(DISTINCT CASE WHEN s1 <= s2 THEN d2 ELSE d1 END)
         |    AS BIGINT) AS n_docs_b
         |FROM j GROUP BY 1, 2""".stripMargin,

    // dd33: the same squaring chains (floor after every step) emitted
    // for DuckDB — pure grid arithmetic, no corpus read.
    "dd33_banding_advisor" -> {
      val blocks = (0 to 4).map { a =>
        val r = 1 << a
        val b = 32 / r
        val jr = graft.ops.Dedup.sqChainPpm("j_ppm", a, "//")
        val miss = graft.ops.Dedup.sqChainPpm(s"(1000000 - $jr)", 5 - a, "//")
        s"""SELECT CAST(j_ppm // 100 AS BIGINT) AS j_bp,
           |  CAST($r AS BIGINT) AS r, CAST($b AS BIGINT) AS b,
           |  CAST($jr AS BIGINT) AS band_hit_ppm,
           |  CAST(1000000 - $miss AS BIGINT) AS recall_ppm
           |FROM (SELECT 500000 + unnest(range(10)) * 50000 AS j_ppm)"""
          .stripMargin
      }
      blocks.mkString("\nUNION ALL\n")
    },

    // gr19: identical hub rule as the Spark kernel — middles enumerated
    // only where deg <= 64; one row per node with the new-at-2 count
    // (0 on clique families) and the ≤2-hop radius.
    "gr19_two_hop" ->
      s"""WITH e AS ($ngramJaccardSql),
         |bi AS (SELECT d1, d2 FROM e UNION ALL SELECT d2, d1 FROM e),
         |deg AS (SELECT d1, count(*) AS deg FROM bi GROUP BY 1),
         |safe AS (SELECT bi.d1, bi.d2 FROM bi
         |         JOIN deg ON bi.d1 = deg.d1 WHERE deg.deg <= 64),
         |th AS (SELECT a.d1 AS x, s.d2 AS y
         |       FROM bi a JOIN safe s ON a.d2 = s.d1
         |       WHERE a.d1 != s.d2),
         |reach AS (SELECT x, count(DISTINCT y) AS n_reach FROM
         |  (SELECT x, y FROM th
         |   UNION ALL SELECT d1 AS x, d2 AS y FROM bi) u GROUP BY 1),
         |new2 AS (SELECT x, count(DISTINCT y) AS n_2hop_new FROM th
         |  WHERE NOT EXISTS (SELECT 1 FROM bi n
         |                    WHERE n.d1 = th.x AND n.d2 = th.y)
         |  GROUP BY 1)
         |SELECT r.x AS doc_id, CAST(deg.deg AS BIGINT) AS degree,
         |  CAST(coalesce(new2.n_2hop_new, 0) AS BIGINT) AS n_2hop_new,
         |  CAST(r.n_reach AS BIGINT) AS n_reach
         |FROM reach r JOIN deg ON r.x = deg.d1
         |LEFT JOIN new2 ON r.x = new2.x""".stripMargin,

    // mm16: the mm03 chunk stream rolled to per-tier footprint.
    "mm16_tier_plan" ->
      """WITH c AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)))
        |      AS chunk_idx
        |  FROM documents),
        |ch AS (SELECT
        |    md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) AS chunk_md5,
        |    CAST(length(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) // 2
        |      AS BIGINT) AS chunk_bytes
        |  FROM c),
        |r AS (SELECT chunk_md5, count(*) AS refs, max(chunk_bytes) AS bytes
        |      FROM ch GROUP BY 1),
        |t AS (SELECT CASE WHEN refs >= 4 THEN 'hot'
        |             WHEN refs >= 2 THEN 'warm' ELSE 'cold' END AS tier,
        |        refs, bytes FROM r),
        |p AS (SELECT tier, CAST(count(*) AS BIGINT) AS n_chunks,
        |        CAST(sum(bytes) AS BIGINT) AS physical_bytes,
        |        CAST(sum(refs) AS BIGINT) AS n_refs
        |      FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(physical_bytes) AS BIGINT) AS total_bytes
        |        FROM p)
        |SELECT tier, n_chunks, physical_bytes, n_refs,
        |  CAST(physical_bytes * 10000 // total_bytes AS BIGINT) AS bytes_bp
        |FROM p CROSS JOIN tot""".stripMargin,

    "gr17_ktruss" -> ktrussSql,

    "gr18_truss_communities" -> trussCommunitiesSql,

    "gr01_triangle_count" ->
      s"""WITH j AS ($ngramJaccardSql)
         |SELECT count(*) AS n_triangles
         |FROM j a JOIN j b ON a.d2 = b.d1
         |JOIN j c ON a.d1 = c.d1 AND b.d2 = c.d2""".stripMargin,

    "gr04_common_neighbors" ->
      s"""WITH j AS ($ngramJaccardSql),
         |bi AS (SELECT d1 AS m, d2 AS n FROM j UNION ALL SELECT d2, d1 FROM j),
         |deg AS (SELECT m, count(*) AS deg FROM bi GROUP BY 1),
         |safe AS (SELECT bi.m, bi.n FROM bi JOIN deg USING (m)
         |         WHERE deg.deg <= 64),
         |cn AS (SELECT x.n AS a, y.n AS b, count(*) AS common
         |       FROM safe x JOIN safe y ON x.m = y.m AND x.n < y.n
         |       GROUP BY 1, 2)
         |SELECT a, b, common,
         |  CASE WHEN EXISTS (SELECT 1 FROM j WHERE j.d1 = cn.a AND j.d2 = cn.b)
         |       THEN 1 ELSE 0 END AS is_edge
         |FROM cn""".stripMargin,

    "ev27_cohort_ltv" ->
      """WITH f AS (SELECT user_id,
        |    CAST(min(date_trunc('month', ts)) AS DATE) AS cohort_month
        |  FROM events GROUP BY 1)
        |SELECT cohort_month,
        |  CAST(datediff('month', cohort_month,
        |    CAST(date_trunc('month', e.ts) AS DATE)) AS INTEGER) AS month_offset,
        |  count(DISTINCT e.user_id) AS n_payers,
        |  round(sum(e.value), 2) AS total_value
        |FROM events e JOIN f USING (user_id)
        |WHERE e.event_type = 'purchase'
        |GROUP BY 1, 2""".stripMargin,

    "tx20_ttr" ->
      """SELECT doc_id,
        | len(string_split(trim(text),' ')) AS n_tokens,
        | len(list_distinct(string_split(trim(text),' '))) AS n_types,
        | CAST(len(list_distinct(string_split(trim(text),' '))) * 10000
        |   // len(string_split(trim(text),' ')) AS BIGINT) AS ttr_bp
        |FROM documents""".stripMargin,

    "q43_join_skew_audit" ->
      """WITH k AS (SELECT l_orderkey, count(*) AS n_rows
        |           FROM lineitem GROUP BY 1
        |           ORDER BY n_rows DESC, l_orderkey LIMIT 10),
        |t AS (SELECT count(*) AS n_total FROM lineitem)
        |SELECT l_orderkey, n_rows,
        |  CAST(n_rows * 1000000 // n_total AS BIGINT) AS share_ppm
        |FROM k CROSS JOIN t""".stripMargin,

    "ev26_watermark_horizon" ->
      """WITH t AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max_s
        |  FROM events),
        |l AS (SELECT prior_max_s - ts_s AS late_s FROM t
        |      WHERE ts_s < prior_max_s),
        |st AS (SELECT count(*) AS n FROM l),
        |h AS (SELECT late_s, count(*) AS c FROM l GROUP BY 1),
        |hc AS (SELECT late_s, sum(c) OVER (ORDER BY late_s) AS cum FROM h),
        |v AS (SELECT
        |    min(CASE WHEN cum >= (50*(n-1))//100 + 1 THEN late_s END) AS v50lo,
        |    min(CASE WHEN cum >= (50*(n-1)+99)//100 + 1 THEN late_s END) AS v50hi,
        |    min(CASE WHEN cum >= (95*(n-1))//100 + 1 THEN late_s END) AS v95lo,
        |    min(CASE WHEN cum >= (95*(n-1)+99)//100 + 1 THEN late_s END) AS v95hi,
        |    max(late_s) AS max_late_s
        |  FROM hc CROSS JOIN st)
        |SELECT st.n AS n_late,
        |  v50lo * (100 - (50*(st.n-1)) % 100) + v50hi * ((50*(st.n-1)) % 100)
        |    AS p50_late_cs,
        |  v95lo * (100 - (95*(st.n-1)) % 100) + v95hi * ((95*(st.n-1)) % 100)
        |    AS p95_late_cs,
        |  max_late_s
        |FROM v CROSS JOIN st""".stripMargin,

    "dd11_index_stats" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |p AS (SELECT s, count(*) AS postings FROM sh GROUP BY 1)
        |SELECT postings, count(*) AS n_shingles FROM p GROUP BY 1""".stripMargin,

    "q42_bag_set_ops" ->
      """WITH high AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
        |recent AS (SELECT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
        |u AS (
        |  SELECT 'high_minus_recent' AS tag, o_custkey FROM
        |    (SELECT o_custkey FROM high EXCEPT ALL SELECT o_custkey FROM recent)
        |  UNION ALL
        |  SELECT 'both' AS tag, o_custkey FROM
        |    (SELECT o_custkey FROM high INTERSECT ALL SELECT o_custkey FROM recent))
        |SELECT tag, o_custkey, count(*) AS multiplicity
        |FROM u GROUP BY 1, 2""".stripMargin,

    "ev25_anomaly_days" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT day, n,
        |    sum(n) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_sum,
        |    count(*) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_n
        |  FROM daily)
        |SELECT day, n, CAST(trail_sum AS BIGINT) AS trail_sum,
        |  CAST(n * 7 - trail_sum AS BIGINT) AS dev7,
        |  n * 70 > trail_sum * 12 AS is_spike
        |FROM t WHERE trail_n = 7""".stripMargin,

    "tx19_dedup_impact" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |r AS (SELECT cluster_id, count(*) AS n_members FROM j GROUP BY 1),
         |tot AS (SELECT count(*) AS n_docs FROM documents),
         |cl AS (SELECT count(*) AS n_clustered FROM clusters),
         |dr AS (SELECT CAST(coalesce(sum(n_members - 1), 0) AS BIGINT)
         |         AS n_dropped FROM r)
         |SELECT n_docs, n_clustered, n_dropped,
         |  CAST(n_dropped * 10000 // n_docs AS BIGINT) AS reduction_bp
         |FROM tot CROSS JOIN cl CROSS JOIN dr""".stripMargin,

    "gr02_degree_dist" ->
      s"""WITH j AS ($ngramJaccardSql),
         |deg AS (SELECT doc, count(*) AS degree FROM (
         |  SELECT d1 AS doc FROM j UNION ALL SELECT d2 FROM j)
         |  GROUP BY 1)
         |SELECT degree, count(*) AS n_docs FROM deg GROUP BY 1""".stripMargin,

    // pp43: the oracle is dd07's full-corpus rebuild VERBATIM — Spark
    // folds the src0 batch into the standing keeper table, so the hash
    // match is a cross-engine upsert ≡ rebuild proof (welds included).
    "pp43_cluster_upsert" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |r AS (SELECT cluster_id, doc_id, score,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY score DESC, doc_id) AS rk,
         |        count(*) OVER (PARTITION BY cluster_id) AS n_members
         |      FROM j)
         |SELECT cluster_id, doc_id AS keeper_id, n_members
         |FROM r WHERE rk = 1""".stripMargin,

    "dd07_keep_best" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |r AS (SELECT cluster_id, doc_id, score,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY score DESC, doc_id) AS rk,
         |        count(*) OVER (PARTITION BY cluster_id) AS n_members
         |      FROM j)
         |SELECT cluster_id, doc_id AS keeper_id, n_members
         |FROM r WHERE rk = 1""".stripMargin,

    "pp01_training_pipeline" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |  SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk
         |  FROM j) WHERE rk = 1),
         |removed AS (SELECT c.doc_id FROM clusters c
         |            JOIN keep k ON c.cluster_id = k.cluster_id
         |            WHERE c.doc_id != k.keeper_id)
         |SELECT d.doc_id,
         |  CASE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
         |    WHEN 'f' THEN 'test' WHEN 'e' THEN 'val' ELSE 'train' END AS split,
         |  s.score
         |FROM documents d
         |JOIN scores s ON d.doc_id = s.doc_id
         |WHERE NOT EXISTS (SELECT 1 FROM removed r WHERE r.doc_id = d.doc_id)
         |  AND s.score >= 0.5""".stripMargin,

    "pp03_audited_set" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |  SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk
         |  FROM j) WHERE rk = 1),
         |removed AS (SELECT c.doc_id FROM clusters c
         |            JOIN keep k ON c.cluster_id = k.cluster_id
         |            WHERE c.doc_id != k.keeper_id),
         |kept AS (SELECT d.doc_id,
         |  CASE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
         |    WHEN 'f' THEN 'test' WHEN 'e' THEN 'val' ELSE 'train' END AS split,
         |  s.score
         |  FROM documents d
         |  JOIN scores s ON d.doc_id = s.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM removed r WHERE r.doc_id = d.doc_id)
         |    AND s.score >= 0.5),
         |h AS ($chunksSql),
         |dup AS (SELECT chunk_md5, 1 AS is_dup FROM h
         |        GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) > 1),
         |audit AS (SELECT doc_id, count(*) AS n_chunks,
         |    count(is_dup) * 10000 // count(*) AS shared_bp
         |  FROM h LEFT JOIN dup USING (chunk_md5)
         |  GROUP BY doc_id)
         |SELECT k.doc_id, k.split, k.score, a.n_chunks, a.shared_bp
         |FROM kept k JOIN audit a ON k.doc_id = a.doc_id""".stripMargin,

    "pp06_training_mix" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |  SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk
         |  FROM j) WHERE rk = 1),
         |removed AS (SELECT c.doc_id FROM clusters c
         |            JOIN keep k ON c.cluster_id = k.cluster_id
         |            WHERE c.doc_id != k.keeper_id),
         |kept AS (SELECT d.doc_id,
         |  CASE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
         |    WHEN 'f' THEN 'test' WHEN 'e' THEN 'val' ELSE 'train' END AS split
         |  FROM documents d
         |  JOIN scores s ON d.doc_id = s.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM removed r WHERE r.doc_id = d.doc_id)
         |    AND s.score >= 0.5),
         |t2 AS (SELECT doc_id, string_split(trim(text),' ') AS tk
         |       FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
         |sh2 AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |          range(1, len(tk)-1),
         |          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
         |        FROM t2),
         |shared2 AS (SELECT s FROM sh2 GROUP BY s
         |            HAVING count(DISTINCT doc_id) > 1),
         |nov AS (SELECT sh2.doc_id,
         |    CAST((count(*) - count(shared2.s)) * 1000000 // count(*) AS BIGINT)
         |      AS novelty_ppm
         |  FROM sh2 LEFT JOIN shared2 ON sh2.s = shared2.s GROUP BY 1),
         |e AS (SELECT d.lang, k.split,
         |    1 + CASE WHEN n.novelty_ppm >= 400000 THEN 1 ELSE 0 END
         |      + CASE WHEN s.stop_cnt * 10000 // s.n_tokens >= 700 THEN 1 ELSE 0 END
         |      AS epochs,
         |    s.n_tokens
         |  FROM kept k
         |  JOIN scores s ON k.doc_id = s.doc_id
         |  JOIN nov n ON k.doc_id = n.doc_id
         |  JOIN documents d ON k.doc_id = d.doc_id)
         |SELECT lang, split, epochs, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
         |  CAST(sum(n_tokens * epochs) AS BIGINT) AS weighted_tokens
         |FROM e GROUP BY 1, 2, 3""".stripMargin,

    "dd05_embed_neardup" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3""".stripMargin,

    "ss01_brute_topk" -> bruteTopkSql,

    // ss27: the exact filtered top-5 is route-invariant; the oracle
    // replays the integer selectivity rule so the route column proves
    // both engines picked the same physical branch.
    "ss27_filtered_route" ->
      """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS t
        |            FROM embeddings WHERE vec_id >= 10),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS nf FROM embeddings
        |      WHERE vec_id >= 10 AND label = 1),
        |sel AS (SELECT CAST(nf * 10000 // greatest(1, t) AS BIGINT) AS sel_bp,
        |          CASE WHEN nf * 10000 // greatest(1, t) <= 2000
        |               THEN 'broadcast_corpus'
        |               ELSE 'scan_in_place' END AS route
        |        FROM tot, f),
        |q AS (SELECT vec_id AS qid, embedding AS qe
        |      FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT qid, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qe, e.embedding) AS cos
        |      FROM q, embeddings e
        |      WHERE e.vec_id >= 10 AND e.label = 1 AND e.vec_id != qid),
        |r AS (SELECT qid, neighbor_id,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY cos DESC, neighbor_id) AS rk
        |      FROM c)
        |SELECT qid, neighbor_id, rk, route, sel_bp
        |FROM r CROSS JOIN sel WHERE rk <= 5""".stripMargin,
    "ss12_mmr_topk" -> mmrTopkSql,
    "ss15_kmeans" -> kmeansSql,
    "ss17_index_refresh" -> indexRefreshSql,

    // ss19: hybrid RRF — rank-only fusion on the 10⁶ div (60+rank)
    // integer grid, so the float cosine only ever influences RANKS
    // (ss01's proven replay) and the fusion is hash-exact.
    "ss19_hybrid_rrf" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |vc AS (SELECT qid, e.vec_id AS nid,
        |         list_cosine_similarity(qe, e.embedding) AS cos
        |       FROM q, embeddings e WHERE e.vec_id != qid),
        |vtop AS (SELECT qid, nid, rk FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rk FROM vc) z WHERE rk <= 20),
        |dt AS (SELECT doc_id, unnest(list_distinct(
        |         string_split(trim(text), ' '))) AS tok FROM documents),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |inf AS (SELECT tok FROM dt CROSS JOIN nd GROUP BY tok, n_docs
        |        HAVING count(*) * 10 <= n_docs),
        |qt AS (SELECT q.qid, dt.tok FROM q JOIN dt ON dt.doc_id = q.qid
        |       JOIN inf ON inf.tok = dt.tok),
        |lx AS (SELECT qt.qid, dt.doc_id AS nid, count(*) AS shared
        |       FROM qt JOIN dt ON qt.tok = dt.tok AND dt.doc_id != qt.qid
        |       GROUP BY 1, 2),
        |ltop AS (SELECT qid, nid, rk FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY shared DESC, nid) AS rk FROM lx) z WHERE rk <= 20),
        |f AS (SELECT coalesce(v.qid, l.qid) AS qid,
        |        coalesce(v.nid, l.nid) AS nid,
        |        CAST(coalesce(v.rk, 0) AS BIGINT) AS rank_vec,
        |        CAST(coalesce(l.rk, 0) AS BIGINT) AS rank_lex,
        |        CAST((CASE WHEN v.rk IS NULL THEN 0
        |               ELSE 1000000 // (60 + v.rk) END)
        |           + (CASE WHEN l.rk IS NULL THEN 0
        |               ELSE 1000000 // (60 + l.rk) END) AS BIGINT) AS rrf_score
        |      FROM vtop v FULL OUTER JOIN ltop l
        |        ON v.qid = l.qid AND v.nid = l.nid)
        |SELECT qid, nid AS neighbor_id, rank_vec, rank_lex, rrf_score,
        |  CAST(rk_fused AS BIGINT) AS rk_fused
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY rrf_score DESC, nid) AS rk_fused FROM f) z
        |WHERE rk_fused <= 5""".stripMargin,

    "ss04_knn_classify" ->
      s"""WITH knn AS ($bruteTopkSql),
         |v AS (SELECT knn.qid, e.label, count(*) AS votes
         |      FROM knn JOIN embeddings e ON knn.neighbor_id = e.vec_id
         |      GROUP BY 1, 2),
         |b AS (SELECT qid, label,
         |        row_number() OVER (PARTITION BY qid
         |          ORDER BY votes DESC, label) AS rk2
         |      FROM v)
         |SELECT b.qid, b.label AS pred_label, t.label AS true_label,
         |  b.label = t.label AS is_correct
         |FROM b JOIN embeddings t ON b.qid = t.vec_id
         |WHERE rk2 = 1""".stripMargin,

    "ss05_ivf_topk" ->
      """WITH ex AS (SELECT vec_id, label, i,
        |       CAST(embedding[i+1] AS DOUBLE) AS x
        |     FROM embeddings, range(64) t(i)),
        |cent AS (SELECT label AS cell, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |vc AS (SELECT ex.vec_id, cent.cell,
        |         sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS ccos
        |       FROM ex JOIN cent ON ex.i = cent.i
        |       GROUP BY 1, 2),
        |assigned AS (SELECT vec_id, cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
        |  FROM vc) WHERE crk = 1),
        |probes AS (SELECT vec_id AS qid, cell AS probe_cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
        |  FROM vc WHERE vec_id < 10) WHERE crk <= 2),
        |cand AS (SELECT p.qid, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(qe.embedding, e.embedding) AS cos
        |  FROM probes p
        |  JOIN assigned a ON a.cell = p.probe_cell AND a.vec_id != p.qid
        |  JOIN embeddings qe ON qe.vec_id = p.qid
        |  JOIN embeddings e ON e.vec_id = a.vec_id),
        |r AS (SELECT qid, neighbor_id,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY cos DESC, neighbor_id) AS rk
        |      FROM cand)
        |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin,

    // ss18 reuses ss05's proven replay chain with the query set widened
    // to EVERY vector (the kNN-join shape) and k=3; the engine-side
    // shuffle-vs-broadcast strategy is invisible to the result.
    "ss18_knn_join" -> knnJoinSql,

    // ss22: NSW beam search replayed hop by hop — the kNN-join graph
    // (ss18's proven SQL) symmetrized, one shared entry point, 3
    // unrolled expand-and-prune rounds on (cosine DESC, vec_id) beams
    // of 8, final top-5. Rank-only, the ss05 float discipline.
    "ss22_nsw_topk" -> nswWalkSql(5),

    // ss08's oracle replays the SQ8 pipeline exactly: the integer code
    // dot is exact in both engines (|dot| ≤ 64·127² ≪ 2^53, DuckDB's
    // list_dot_product returns it as an exact double); round() is
    // half-away-from-zero on both; the exact re-rank is ss01's proven
    // list_cosine_similarity replay.
    "ss08_sq8_rerank" ->
      """WITH b AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |codes AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) / nrm * 127) AS BIGINT)) AS qv
        |  FROM b),
        |q AS (SELECT vec_id AS qid, qv AS qqv FROM codes WHERE vec_id < 10),
        |sc AS (SELECT qid, c.vec_id AS cid,
        |        list_dot_product(qqv, c.qv) AS dot
        |      FROM q, codes c WHERE c.vec_id != qid),
        |c100 AS (SELECT qid, cid FROM (SELECT qid, cid,
        |          row_number() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rn
        |        FROM sc) WHERE rn <= 100),
        |rr AS (SELECT c.qid, c.cid,
        |        list_cosine_similarity(qe.embedding, e.embedding) AS cos
        |      FROM c100 c
        |      JOIN embeddings qe ON qe.vec_id = c.qid
        |      JOIN embeddings e ON e.vec_id = c.cid),
        |r AS (SELECT qid, cid AS neighbor_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |      FROM rr)
        |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin,

    // ss10's oracle replays the PQ pipeline: codebook = label-centroid
    // sub-vectors (the avg(x) replay ss05 proved), per-(vec, sub-space)
    // argmin-L2 code with the same (d2, cell) tie-break Spark's
    // strict-improvement fold applies, ADC = sum of the 8 per-sub-space
    // lookup dots, then ss01's exact cosine re-rank on the top-100.
    "ss10_pq_topk" ->
      """WITH ex AS (SELECT vec_id, label, i, i // 8 AS m,
        |       CAST(embedding[i+1] AS DOUBLE) AS x
        |     FROM embeddings, range(64) t(i)),
        |cent AS (SELECT label AS cell, i, i // 8 AS m, avg(x) AS c
        |         FROM ex GROUP BY 1, 2, 3),
        |l2 AS (SELECT e.vec_id, e.m, ct.cell,
        |         sum((e.x - ct.c) * (e.x - ct.c)) AS d2
        |       FROM ex e JOIN cent ct ON ct.i = e.i
        |       GROUP BY 1, 2, 3),
        |enc AS (SELECT vec_id, m, cell FROM (SELECT vec_id, m, cell,
        |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cell) AS rn
        |       FROM l2) WHERE rn = 1),
        |ltab AS (SELECT e.vec_id AS qid, e.m, ct.cell, sum(e.x * ct.c) AS v
        |         FROM ex e JOIN cent ct ON ct.i = e.i
        |         WHERE e.vec_id < 10
        |         GROUP BY 1, 2, 3),
        |adc AS (SELECT lt.qid, en.vec_id AS cid, sum(lt.v) AS adc
        |        FROM enc en JOIN ltab lt ON lt.m = en.m AND lt.cell = en.cell
        |        WHERE en.vec_id != lt.qid
        |        GROUP BY 1, 2),
        |c100 AS (SELECT qid, cid FROM (SELECT qid, cid,
        |          row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |        FROM adc) WHERE rn <= 100),
        |rr AS (SELECT c.qid, c.cid,
        |        list_cosine_similarity(qe.embedding, e.embedding) AS cos
        |      FROM c100 c
        |      JOIN embeddings qe ON qe.vec_id = c.qid
        |      JOIN embeddings e ON e.vec_id = c.cid),
        |r AS (SELECT qid, cid AS neighbor_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |      FROM rr)
        |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin,

    // ss14's oracle composes ss05's IVF replay (assigned cell + 3-probe
    // cells by centroid cosine) with ss10's PQ replay (codes, ADC) and
    // the shared exact re-rank.
    "ss14_ivfpq_topk" ->
      """WITH ex AS (SELECT vec_id, label, i, i // 8 AS m,
        |       CAST(embedding[i+1] AS DOUBLE) AS x
        |     FROM embeddings, range(64) t(i)),
        |cent AS (SELECT label AS cell, i, i // 8 AS m, avg(x) AS c
        |         FROM ex GROUP BY 1, 2, 3),
        |vc AS (SELECT e.vec_id, ct.cell,
        |         sum(e.x * ct.c) / (sqrt(sum(e.x * e.x)) * sqrt(sum(ct.c * ct.c))) AS ccos
        |       FROM ex e JOIN cent ct ON ct.i = e.i
        |       GROUP BY 1, 2),
        |assigned AS (SELECT vec_id, cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
        |  FROM vc) WHERE crk = 1),
        |probes AS (SELECT vec_id AS qid, cell AS probe_cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crk
        |  FROM vc WHERE vec_id < 10) WHERE crk <= 3),
        |l2 AS (SELECT e.vec_id, e.m, ct.cell,
        |         sum((e.x - ct.c) * (e.x - ct.c)) AS d2
        |       FROM ex e JOIN cent ct ON ct.i = e.i
        |       GROUP BY 1, 2, 3),
        |enc AS (SELECT vec_id, m, cell FROM (SELECT vec_id, m, cell,
        |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cell) AS rn
        |       FROM l2) WHERE rn = 1),
        |ltab AS (SELECT e.vec_id AS qid, e.m, ct.cell, sum(e.x * ct.c) AS v
        |         FROM ex e JOIN cent ct ON ct.i = e.i
        |         WHERE e.vec_id < 10
        |         GROUP BY 1, 2, 3),
        |adc AS (SELECT p.qid, a.vec_id AS cid, sum(lt.v) AS adc
        |        FROM probes p
        |        JOIN assigned a ON a.cell = p.probe_cell AND a.vec_id != p.qid
        |        JOIN enc en ON en.vec_id = a.vec_id
        |        JOIN ltab lt ON lt.qid = p.qid AND lt.m = en.m AND lt.cell = en.cell
        |        GROUP BY 1, 2),
        |c100 AS (SELECT qid, cid FROM (SELECT qid, cid,
        |          row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
        |        FROM adc) WHERE rn <= 100),
        |rr AS (SELECT c.qid, c.cid,
        |        list_cosine_similarity(qe.embedding, e.embedding) AS cos
        |      FROM c100 c
        |      JOIN embeddings qe ON qe.vec_id = c.qid
        |      JOIN embeddings e ON e.vec_id = c.cid),
        |r AS (SELECT qid, cid AS neighbor_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |      FROM rr)
        |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin,

    "ev10_sliding_windows" ->
      """WITH w AS (
        |  SELECT user_id,
        |    unnest([CAST(date_trunc('hour', ts) AS TIMESTAMP),
        |            CAST(date_trunc('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR])
        |      AS window_start
        |  FROM events)
        |SELECT window_start, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM w GROUP BY 1""".stripMargin,

    "ev11_upsert_merge" ->
      """SELECT user_id, event_type, latest_event_id, latest_ts, latest_value
        |FROM (
        |  SELECT user_id, event_type, event_id AS latest_event_id,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS latest_ts,
        |    round(value, 2) AS latest_value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |WHERE rk = 1""".stripMargin,

    "ev12_user_features" ->
      """SELECT user_id,
        | count(*) AS n_events,
        | count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
        | count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
        | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
        |   AS purchase_value,
        | CAST(date_trunc('second', max(ts)) AS TIMESTAMP) AS last_seen,
        | count(DISTINCT date_trunc('day', ts)) AS active_days
        |FROM events GROUP BY user_id""".stripMargin,

    "tx17_rare_bigrams" ->
      """WITH db AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |  FROM (SELECT doc_id, string_split(trim(text),' ') AS tk FROM documents)
        |  WHERE len(tk) >= 2),
        |rare AS (SELECT bigram, 1 AS is_rare FROM db
        |         GROUP BY bigram HAVING count(*) < 3)
        |SELECT doc_id, count(*) AS n_bigrams, count(is_rare) AS n_rare,
        |  count(is_rare) * 10000 // count(*) AS rare_bp
        |FROM db LEFT JOIN rare USING (bigram)
        |GROUP BY doc_id""".stripMargin,

    "q40_lateral_explode" ->
      """SELECT word, count(DISTINCT p_brand) AS n_brands, count(*) AS n_parts
        |FROM (SELECT p_brand, unnest(string_split(p_name, ' ')) AS word
        |      FROM part)
        |GROUP BY word
        |ORDER BY n_brands DESC, word LIMIT 25""".stripMargin,

    // dd10: the hot-shingle df cap (> 128 → dropped from candidate
    // generation, sizes stay full) mirrors Dedup.discriminative.
    "dd10_containment" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 128),
        |shc AS (SELECT doc_id, s FROM sh
        |        WHERE s NOT IN (SELECT s FROM hot)),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |c AS (SELECT d1, d2,
        |        CAST(shared * 10000 // x.n AS BIGINT) AS contain_1_bp,
        |        CAST(shared * 10000 // y.n AS BIGINT) AS contain_2_bp
        |      FROM pairs JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id)
        |SELECT d1, d2, contain_1_bp, contain_2_bp FROM c
        |WHERE contain_1_bp >= 5000 OR contain_2_bp >= 5000""".stripMargin,

    "mm07_magic_bytes" ->
      """SELECT substr(hex(encode(text)), 1, 4) AS magic,
        | count(*) AS n_docs,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents WHERE octet_length(encode(text)) >= 2
        |GROUP BY 1""".stripMargin,

    "ev24_time_range_join" ->
      """WITH p AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS v_s
        |      FROM events WHERE event_type = 'view')
        |SELECT p.event_id, count(v.v_s) AS n_recent_views
        |FROM p LEFT JOIN v ON v.v_s >= p.ts_s - 300 AND v.v_s < p.ts_s
        |GROUP BY p.event_id""".stripMargin,

    "ev23_type_lift" ->
      """WITH u AS (SELECT user_id, event_type, count(*) AS n_ut
        |           FROM events GROUP BY 1, 2),
        |ut AS (SELECT user_id, count(*) AS n_u FROM events GROUP BY 1),
        |g AS (SELECT event_type, count(*) AS n_t FROM events GROUP BY 1),
        |a AS (SELECT count(*) AS n_all FROM events)
        |SELECT u.user_id, u.event_type,
        |  CAST(n_ut * 10000 // n_u AS BIGINT) AS user_bp,
        |  CAST(n_t * 10000 // n_all AS BIGINT) AS global_bp
        |FROM u JOIN ut USING (user_id) JOIN g USING (event_type)
        |CROSS JOIN a""".stripMargin,

    // tx49: code-vs-prose router — symbol density on the bp grid +
    // reserved-word token hits; corpus-free thresholds.
    "tx49_code_detect" ->
      """WITH x AS (SELECT doc_id,
        |  length(text) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text,
        |    '[{}\[\]();=<>]', '', 'g')) AS BIGINT) AS sym_cnt,
        |  CAST(len(list_filter(string_split(trim(text),' '),
        |    t -> t IN ('def','return','var','let','void','class','import',
        |               'public','static','function','const','elif')))
        |    AS BIGINT) AS kw_hits
        |  FROM documents),
        |y AS (SELECT *,
        |  CAST(CASE WHEN n_chars > 0 THEN sym_cnt * 10000 // n_chars
        |       ELSE 0 END AS BIGINT) AS sym_bp FROM x)
        |SELECT doc_id, n_chars, sym_cnt, kw_hits, sym_bp,
        |  CASE WHEN sym_bp >= 300 OR kw_hits >= 3 THEN 1 ELSE 0 END AS is_code
        |FROM y""".stripMargin,

    "tx18_char_classes" ->
      """SELECT doc_id,
        | length(text) AS n_chars,
        | length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
        |   AS n_alpha,
        | length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |   AS n_digit,
        | length(text) - length(regexp_replace(text, ' ', '', 'g'))
        |   AS n_space
        |FROM documents""".stripMargin,

    "ev22_top_paths" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |x AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT)
        |              - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM t),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x),
        |p AS (
        |  SELECT array_to_string(
        |    list_slice(list(event_type ORDER BY ts, event_id), 1, 3), '>') AS path
        |  FROM s GROUP BY user_id, session_id)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,

    "ev21_funnel_latency" ->
      """WITH su AS (SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS s_s
        |            FROM events WHERE event_type = 'signup' GROUP BY 1),
        |lat AS (SELECT e.user_id,
        |    min(CAST(floor(epoch(e.ts)) AS BIGINT) - su.s_s) AS latency_s
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= su.s_s
        |  GROUP BY 1),
        |st AS (SELECT count(*) AS n FROM lat),
        |h AS (SELECT latency_s, count(*) AS c FROM lat GROUP BY 1),
        |hc AS (SELECT latency_s, sum(c) OVER (ORDER BY latency_s) AS cum FROM h),
        |v AS (SELECT
        |    min(CASE WHEN cum >= (50*(n-1))//100 + 1 THEN latency_s END) AS v50lo,
        |    min(CASE WHEN cum >= (50*(n-1)+99)//100 + 1 THEN latency_s END) AS v50hi,
        |    min(CASE WHEN cum >= (90*(n-1))//100 + 1 THEN latency_s END) AS v90lo,
        |    min(CASE WHEN cum >= (90*(n-1)+99)//100 + 1 THEN latency_s END) AS v90hi
        |  FROM hc CROSS JOIN st)
        |SELECT st.n AS n_converted,
        |  v50lo * (100 - (50*(st.n-1)) % 100) + v50hi * ((50*(st.n-1)) % 100)
        |    AS p50_cs,
        |  v90lo * (100 - (90*(st.n-1)) % 100) + v90hi * ((90*(st.n-1)) % 100)
        |    AS p90_cs
        |FROM v CROSS JOIN st""".stripMargin,

    "q39_moving_avg" ->
      """WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(sum(price_c) OVER w // count(*) OVER w AS BIGINT) AS avg_price_c
        |FROM c
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "ev20_validity_intervals" ->
      """SELECT user_id, event_type, event_id,
        | CAST(date_trunc('second', ts) AS TIMESTAMP) AS valid_from,
        | CAST(date_trunc('second',
        |   lead(ts) OVER (PARTITION BY user_id, event_type
        |                  ORDER BY ts, event_id)) AS TIMESTAMP) AS valid_to,
        | lead(ts) OVER (PARTITION BY user_id, event_type
        |                ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events""".stripMargin,

    "ev19_out_of_order" ->
      """WITH t AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max_s
        |  FROM events),
        |x AS (SELECT user_id, ts_s,
        |    CASE WHEN ts_s < prior_max_s THEN prior_max_s - ts_s END AS late_s
        |  FROM t)
        |SELECT user_id, count(*) AS n_events, count(late_s) AS n_late,
        |  coalesce(max(late_s), 0) AS max_late_s
        |FROM x GROUP BY 1""".stripMargin,

    "tx10_rolling_hash" ->
      """SELECT doc_id,
        | list_reduce(string_split(trim(text),' '),
        |             (x, y) -> md5(x || y)) AS rolling_hash
        |FROM documents""".stripMargin,

    "tx09_normalize" ->
      """SELECT doc_id,
        | length(trim(regexp_replace(regexp_replace(lower(text),
        |   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_len,
        | md5(trim(regexp_replace(regexp_replace(lower(text),
        |   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash
        |FROM documents""".stripMargin,

    "ss02_lsh_topk" -> ss02Sql,

    "ss03_centroid_outliers" ->
      """WITH ex AS (
        |  SELECT vec_id, label, i,
        |    CAST(embedding[i+1] AS DOUBLE) AS x
        |  FROM embeddings, range(64) t(i)),
        |cent AS (SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |cos AS (
        |  SELECT vec_id, ex.label,
        |    sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS cos
        |  FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
        |  GROUP BY 1, 2),
        |r AS (SELECT label, vec_id,
        |        row_number() OVER (PARTITION BY label
        |          ORDER BY cos ASC, vec_id) AS rk
        |      FROM cos)
        |SELECT label, CAST(rk AS INTEGER) AS rk, vec_id
        |FROM r WHERE rk <= 2""".stripMargin,

    "mm01_binary_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | sha256(text) AS content_hash,
        | 'text/plain' AS mime
        |FROM documents""".stripMargin,

    "mm03_chunking" ->
      """WITH c AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)))
        |      AS chunk_idx
        |  FROM documents)
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) AS chunk_md5,
        |  CAST(length(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) // 2 AS INTEGER)
        |    AS chunk_bytes
        |FROM c""".stripMargin,

    // mm04's "model" stub is md5-derived, so the oracle can replay it:
    // byte i of md5(text) → ((b-128)/128)², summed left-to-right, sqrt.
    // (x*x, not pow(x,2) — pow need not be bit-exact for squares.)
    "mm04_feature_extract" ->
      """SELECT doc_id, 8 AS dim,
        | sqrt(list_sum(list_transform(range(8), i ->
        |   ((CAST(('0x' || substr(md5(text), CAST(i*2+1 AS BIGINT), 2)) AS INTEGER)
        |     - 128) / 128.0)
        |   * ((CAST(('0x' || substr(md5(text), CAST(i*2+1 AS BIGINT), 2)) AS INTEGER)
        |     - 128) / 128.0)))) AS norm
        |FROM documents""".stripMargin,

    "mm02_frame_sample" ->
      """WITH f AS (SELECT doc_id, text, unnest(range(n_chars % 5 + 1)) AS i
        |           FROM documents)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        | md5(text || '#' || CAST(i AS VARCHAR)) AS frame_hash
        |FROM f""".stripMargin,

    "tx27_gopher_rules" ->
      """WITH x AS (SELECT doc_id, trim(text) AS tt,
        |             string_split(trim(text),' ') AS tk FROM documents),
        |y AS (SELECT doc_id, len(tk) AS n_tokens,
        |  (length(tt) - (len(tk) - 1)) * 100 // len(tk) AS mwl_c,
        |  CAST(len(list_distinct(tk)) AS BIGINT) * 1000000 // len(tk)
        |    AS uniq_ppm,
        |  len(list_filter(tk,
        |    t -> t IN ('the','a','of','and','to','in'))) AS stop_cnt
        |  FROM x),
        |z AS (SELECT *,
        |  CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END AS r_short,
        |  CASE WHEN mwl_c < 250 OR mwl_c > 800 THEN 1 ELSE 0 END AS r_mwl,
        |  CASE WHEN stop_cnt < 2 THEN 1 ELSE 0 END AS r_stop,
        |  CASE WHEN uniq_ppm < 350000 THEN 1 ELSE 0 END AS r_rep
        |  FROM y)
        |SELECT doc_id, n_tokens, mwl_c, uniq_ppm, stop_cnt,
        |  r_short, r_mwl, r_stop, r_rep,
        |  CASE WHEN r_short + r_mwl + r_stop + r_rep = 0 THEN 1 ELSE 0 END
        |    AS keep
        |FROM z""".stripMargin,

    "ev33_interarrival" ->
      """WITH g AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |          PARTITION BY user_id, event_type
        |          ORDER BY ts, event_id) AS gap_s
        |  FROM events),
        |g2 AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
        |r AS (SELECT event_type, gap_s,
        |    row_number() OVER (PARTITION BY event_type ORDER BY gap_s) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM g2)
        |SELECT event_type, max(n) AS n_gaps,
        |  min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s,
        |  CAST(sum(CASE WHEN rn = (50*(n-1)) // 100 + 1
        |      THEN gap_s * (100 - (50*(n-1)) % 100) ELSE 0 END)
        |    + sum(CASE WHEN rn = (50*(n-1)+99) // 100 + 1
        |      THEN gap_s * ((50*(n-1)) % 100) ELSE 0 END) AS BIGINT) AS p50_cs,
        |  CAST(sum(CASE WHEN rn = (90*(n-1)) // 100 + 1
        |      THEN gap_s * (100 - (90*(n-1)) % 100) ELSE 0 END)
        |    + sum(CASE WHEN rn = (90*(n-1)+99) // 100 + 1
        |      THEN gap_s * ((90*(n-1)) % 100) ELSE 0 END) AS BIGINT) AS p90_cs
        |FROM r GROUP BY event_type""".stripMargin,

    "pp07_decontam" ->
      """WITH t AS (SELECT doc_id,
        |    substr(md5(text), 1, 1) IN ('0','1') AS is_eval,
        |    string_split(trim(text),' ') AS tk
        |  FROM documents
        |  WHERE len(string_split(trim(text),' ')) >= 15),
        |w AS (SELECT doc_id, is_eval, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-15+2),
        |         i -> md5(array_to_string(list_slice(tk, i, i+14), ' '))))) AS wh
        |      FROM t)
        |SELECT tr.doc_id,
        |  count(DISTINCT tr.wh) AS n_shared_windows,
        |  count(DISTINCT ev.doc_id) AS n_eval_docs
        |FROM w tr JOIN w ev ON tr.wh = ev.wh
        |WHERE NOT tr.is_eval AND ev.is_eval
        |GROUP BY tr.doc_id""".stripMargin,

    // pp27: fuzzy decontamination — trigram containment of each eval
    // doc inside each train doc, exact bp grid (integer div), ≥3000 bp
    // floor; same eval carve as pp07.
    "pp27_fuzzy_decontam" ->
      """WITH t AS (SELECT doc_id,
        |    substr(md5(text), 1, 1) IN ('0','1') AS is_eval,
        |    string_split(trim(text),' ') AS tk
        |  FROM documents
        |  WHERE len(string_split(trim(text),' ')) >= 3),
        |sh AS (SELECT doc_id, is_eval, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM t),
        |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE is_eval),
        |sz AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1),
        |tr AS (SELECT doc_id, s FROM sh WHERE NOT is_eval),
        |shared AS (SELECT tr.doc_id, ev.eval_id, count(*) AS shared
        |           FROM tr JOIN ev USING (s) GROUP BY 1, 2),
        |p AS (SELECT doc_id, shared * 10000 // n_eval AS contain_bp
        |      FROM shared JOIN sz USING (eval_id)
        |      WHERE shared * 10000 // n_eval >= 3000)
        |SELECT doc_id, CAST(max(contain_bp) AS BIGINT) AS max_contain_bp,
        |  CAST(count(*) AS BIGINT) AS n_eval_partners
        |FROM p GROUP BY 1""".stripMargin,

    // pp28: per-eval-item contamination severity — pp07's verbatim
    // windows and pp27's fuzzy containment aggregated per EVAL doc,
    // every eval item reported (clean included).
    "pp28_contam_report" ->
      """WITH f AS (SELECT doc_id, text,
        |    substr(md5(text), 1, 1) IN ('0','1') AS is_eval FROM documents),
        |w AS (SELECT doc_id, is_eval, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-15+2),
        |         i -> md5(array_to_string(list_slice(tk, i, i+14), ' ')))))
        |         AS wh
        |      FROM (SELECT doc_id, is_eval, string_split(trim(text),' ') AS tk
        |            FROM f WHERE len(string_split(trim(text),' ')) >= 15) t),
        |verb AS (SELECT ev.doc_id AS eval_id,
        |           count(DISTINCT tr.doc_id) AS n_verbatim_train
        |         FROM w tr JOIN w ev ON tr.wh = ev.wh
        |         WHERE NOT tr.is_eval AND ev.is_eval GROUP BY 1),
        |sh AS (SELECT doc_id, is_eval, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |       FROM (SELECT doc_id, is_eval, string_split(trim(text),' ') AS tk
        |             FROM f WHERE len(string_split(trim(text),' ')) >= 3) t),
        |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE is_eval),
        |sz AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1),
        |tr AS (SELECT doc_id, s FROM sh WHERE NOT is_eval),
        |shared AS (SELECT tr.doc_id, ev.eval_id, count(*) AS shared
        |           FROM tr JOIN ev USING (s) GROUP BY 1, 2),
        |fuzzy AS (SELECT eval_id, count(*) AS n_fuzzy_train
        |          FROM shared JOIN sz USING (eval_id)
        |          WHERE shared * 10000 // n_eval >= 3000 GROUP BY 1)
        |SELECT f.doc_id AS eval_id,
        |  CAST(coalesce(verb.n_verbatim_train, 0) AS BIGINT)
        |    AS n_verbatim_train,
        |  CAST(coalesce(fuzzy.n_fuzzy_train, 0) AS BIGINT) AS n_fuzzy_train,
        |  CASE WHEN coalesce(verb.n_verbatim_train, 0) > 0 THEN 'verbatim'
        |       WHEN coalesce(fuzzy.n_fuzzy_train, 0) > 0 THEN 'fuzzy'
        |       ELSE 'clean' END AS severity
        |FROM f LEFT JOIN verb ON f.doc_id = verb.eval_id
        |LEFT JOIN fuzzy ON f.doc_id = fuzzy.eval_id
        |WHERE f.is_eval""".stripMargin,

    // q66: the bloom runtime filter is semantically transparent, so
    // the oracle is the plain join — hash match = transparency proof.
    "q66_runtime_bloom" ->
      """SELECT o.o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS revenue_c
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,

    // q67: 2-D skyline via the per-distinct-price cumulative max —
    // dominated ⇔ a strictly cheaper price reaches the size, or the
    // part's own price bucket strictly exceeds it.
    "q67_skyline" ->
      """WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |    CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c
        |  FROM part),
        |pp AS (SELECT price_c, max(p_size) AS max_here FROM p GROUP BY 1),
        |cm AS (SELECT price_c, max_here,
        |    max(max_here) OVER (ORDER BY price_c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_cheaper
        |  FROM pp)
        |SELECT p.p_partkey, p.p_size, p.price_c
        |FROM p JOIN cm USING (price_c)
        |WHERE NOT (coalesce(cm.max_cheaper, -9223372036854775807 - 1)
        |             >= p.p_size
        |           OR cm.max_here > p.p_size)""".stripMargin,

    // ev53: causal same-weekday trailing-mean forecast backtest;
    // DuckDB dayofweek is 0-based — +1 matches Spark (ev34 precedent).
    "ev53_seasonal_naive" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1),
        |t AS (SELECT day, n_events, dayofweek(day) + 1 AS weekday FROM daily),
        |h AS (SELECT day, weekday, n_events,
        |    sum(n_events) OVER w AS hist_sum,
        |    count(*) OVER w AS hist_n
        |  FROM t WINDOW w AS (PARTITION BY weekday ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT day, weekday, n_events,
        |  CAST(hist_sum // hist_n AS BIGINT) AS forecast,
        |  CAST(abs(n_events - hist_sum // hist_n) AS BIGINT) AS abs_err,
        |  CAST(abs(n_events - hist_sum // hist_n) * 10000
        |    // (hist_sum // hist_n) AS BIGINT) AS err_bp
        |FROM h WHERE hist_n >= 1""".stripMargin,

    // tx50: corpus piece frequencies under the tx45-learned merges —
    // the chain's final word-type frame (w10) segmented and exploded.
    "tx50_subword_vocab" ->
      s"""WITH $bpeChainSql,
         |px AS (SELECT w, wc, unnest(string_split(
         |         substr(syms, 2, length(syms) - 2), '><')) AS piece
         |       FROM w10)
         |SELECT piece, CAST(count(DISTINCT w) AS BIGINT) AS n_word_types,
         |  CAST(sum(wc) AS BIGINT) AS n_occurrences,
         |  CAST(length(piece) AS BIGINT) AS piece_len
         |FROM px GROUP BY piece""".stripMargin,

    // pp29: power-of-2 length bands via the same 10-row band spine,
    // FFD row_number inside each band, padding waste to the batch max.
    "pp29_inference_batches" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |bands AS (SELECT CAST(power(2, i) AS BIGINT) AS band
        |          FROM unnest(range(4, 14)) AS t(i)),
        |bd AS (SELECT doc_id, n_tok, coalesce(min(band), 8192) AS band
        |       FROM d LEFT JOIN bands ON band >= greatest(n_tok, 16)
        |       GROUP BY 1, 2),
        |rn AS (SELECT band, doc_id, n_tok, row_number() OVER (
        |    PARTITION BY band ORDER BY n_tok DESC, doc_id) AS rn FROM bd),
        |b AS (SELECT band, (rn - 1) // 32 AS batch_id, n_tok FROM rn)
        |SELECT band, CAST(batch_id AS BIGINT) AS batch_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(n_tok) AS BIGINT) AS max_len,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(count(*) * max(n_tok) AS BIGINT) AS padded_tokens,
        |  CAST((count(*) * max(n_tok) - sum(n_tok)) * 10000
        |    // (count(*) * max(n_tok)) AS BIGINT) AS waste_bp
        |FROM b GROUP BY 1, 2""".stripMargin,

    // q68: 7 interior percentile_disc boundaries (one aggregate),
    // row-local bucket = count of boundaries <= value.
    "q68_equidepth_hist" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |             AS c FROM lineitem),
        |cuts AS (SELECT
        |    percentile_disc(0.125) WITHIN GROUP (ORDER BY c) AS b1,
        |    percentile_disc(0.250) WITHIN GROUP (ORDER BY c) AS b2,
        |    percentile_disc(0.375) WITHIN GROUP (ORDER BY c) AS b3,
        |    percentile_disc(0.500) WITHIN GROUP (ORDER BY c) AS b4,
        |    percentile_disc(0.625) WITHIN GROUP (ORDER BY c) AS b5,
        |    percentile_disc(0.750) WITHIN GROUP (ORDER BY c) AS b6,
        |    percentile_disc(0.875) WITHIN GROUP (ORDER BY c) AS b7
        |  FROM v),
        |b AS (SELECT c,
        |    (CASE WHEN c >= b1 THEN 1 ELSE 0 END) +
        |    (CASE WHEN c >= b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN c >= b3 THEN 1 ELSE 0 END) +
        |    (CASE WHEN c >= b4 THEN 1 ELSE 0 END) +
        |    (CASE WHEN c >= b5 THEN 1 ELSE 0 END) +
        |    (CASE WHEN c >= b6 THEN 1 ELSE 0 END) +
        |    (CASE WHEN c >= b7 THEN 1 ELSE 0 END) AS bucket
        |  FROM v, cuts)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(c) AS BIGINT) AS min_c,
        |  CAST(max(c) AS BIGINT) AS max_c
        |FROM b GROUP BY 1""".stripMargin,

    // q69: brand-level baskets, directed pairs, min-support 50 before
    // the metric joins; division order replayed exactly for lift.
    "q69_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
        |            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT count(*) AS n_orders FROM orders),
        |bc AS (SELECT b, count(*) AS cnt FROM li GROUP BY 1),
        |pr AS (SELECT x.b AS ante, y.b AS cons, count(*) AS pair_cnt
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.b != y.b
        |       GROUP BY 1, 2 HAVING count(*) >= 50)
        |SELECT ante, cons, CAST(pair_cnt AS BIGINT) AS pair_cnt,
        |  CAST(pair_cnt * 1000000 // n_orders AS BIGINT) AS support_ppm,
        |  CAST(pair_cnt * 10000 // a.cnt AS BIGINT) AS confidence_bp,
        |  CAST((pair_cnt * n_orders // a.cnt) * 10000 // c.cnt AS BIGINT)
        |    AS lift_bp
        |FROM pr JOIN bc a ON pr.ante = a.b
        |JOIN bc c ON pr.cons = c.b CROSS JOIN n""".stripMargin,

    // q70: five expectation rules as data; lineitem rules share one
    // scan (RI rides a LEFT join), ppm guarded for empty inputs.
    "q70_dq_expectations" ->
      """WITH li AS (SELECT l.l_quantity, l.l_shipdate, o.o_orderkey AS ook
        |            FROM lineitem l
        |            LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |              ON l.l_orderkey = o.o_orderkey),
        |a AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_quantity <= 0 OR l_quantity > 100
        |        THEN 1 ELSE 0 END) AS v_range,
        |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_null,
        |    sum(CASE WHEN ook IS NULL THEN 1 ELSE 0 END) AS v_ri
        |  FROM li),
        |u AS (SELECT coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS v_uniq,
        |        coalesce(sum(c), 0) AS n
        |      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)),
        |o2 AS (SELECT count(*) AS n,
        |    sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS v_neg
        |  FROM orders),
        |rules AS (
        |  SELECT 'lineitem_quantity_range' AS rule, n, v_range AS v FROM a
        |  UNION ALL
        |  SELECT 'lineitem_shipdate_complete', n, v_null FROM a
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_resolves', n, v_ri FROM a
        |  UNION ALL
        |  SELECT 'orders_orderkey_unique', n, v_uniq FROM u
        |  UNION ALL
        |  SELECT 'orders_totalprice_nonneg', n, v_neg FROM o2)
        |SELECT rule, CAST(n AS BIGINT) AS n_checked,
        |  CAST(v AS BIGINT) AS n_violations,
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE v * 1000000 // n END AS BIGINT)
        |    AS viol_ppm
        |FROM rules""".stripMargin,

    // pp30: exact dedup scoped within source; keeper token count is the
    // hash-group min (copies share text); 4-epoch effective cap.
    "pp30_data_constrained" ->
      """WITH d AS (SELECT source, md5(text) AS h,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |g AS (SELECT source, h, count(*) AS n_copies, min(n_tok) AS n_tok
        |      FROM d GROUP BY 1, 2)
        |SELECT source,
        |  CAST(sum(n_copies * n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_tok) AS BIGINT) AS unique_tokens,
        |  CAST(sum(n_copies * n_tok) * 10000 // sum(n_tok) AS BIGINT)
        |    AS epochs_bp,
        |  CAST(least(sum(n_copies * n_tok), sum(n_tok) * 4) AS BIGINT)
        |    AS effective_tokens
        |FROM g GROUP BY 1""".stripMargin,

    // pp31: dd25's weights applied — soft/hard/raw token mass per
    // source; per-doc integer weighting replayed exactly, signed
    // soft-vs-hard delta kept as a subtraction (negative division is
    // the one integer op the engines disagree on).
    "pp31_soft_mix" ->
      s"""WITH clusters AS ($dupClustersSql),
         |cs AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM clusters GROUP BY 1),
         |w AS (SELECT d.doc_id,
         |    coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         |    CAST(1000000 // coalesce(cs.cluster_size, 1) AS BIGINT)
         |      AS weight_ppm
         |  FROM documents d
         |  LEFT JOIN clusters c ON d.doc_id = c.doc_id
         |  LEFT JOIN cs ON c.cluster_id = cs.cluster_id),
         |k AS (SELECT cluster_id, min(doc_id) AS keeper_id FROM w GROUP BY 1),
         |d2 AS (SELECT doc_id, source,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |m AS (SELECT d2.source,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
         |    CAST(sum(n_tok * weight_ppm // 1000000) AS BIGINT) AS soft_tokens,
         |    CAST(sum(CASE WHEN w.doc_id = k.keeper_id THEN n_tok ELSE 0 END)
         |      AS BIGINT) AS hard_tokens
         |  FROM d2 JOIN w ON d2.doc_id = w.doc_id
         |  JOIN k ON w.cluster_id = k.cluster_id
         |  GROUP BY 1)
         |SELECT source, n_docs, raw_tokens, soft_tokens, hard_tokens,
         |  CAST((raw_tokens - soft_tokens) * 10000 // raw_tokens AS BIGINT)
         |    AS soft_discount_bp,
         |  soft_tokens - hard_tokens AS soft_minus_hard_tokens
         |FROM m""".stripMargin,

    // pp32: purge blast radius — the three derived-artifact replays
    // (ss21 truncated postings, ss05 cell assignment, dd06 clusters)
    // each reduced to one distinct-count pair; planted doc_id % 97
    // tombstone rule, affected share in exact bp.
    "pp32_purge_impact" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
         |             AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
         |post AS (SELECT tok, doc_id FROM (
         |    SELECT tok, doc_id, row_number() OVER (PARTITION BY tok
         |      ORDER BY tf DESC, doc_id) AS prk FROM tf) z WHERE prk <= 64),
         |lex AS (SELECT 'postings_terms' AS artifact,
         |    CAST(count(DISTINCT CASE WHEN doc_id % 97 = 0 THEN tok END)
         |      AS BIGINT) AS n_affected,
         |    CAST(count(DISTINCT tok) AS BIGINT) AS n_total FROM post),
         |ex AS (SELECT vec_id, label, i,
         |       CAST(embedding[i+1] AS DOUBLE) AS x
         |     FROM embeddings, range(64) r(i)),
         |cent AS (SELECT label AS cell, i, avg(x) AS c FROM ex GROUP BY 1, 2),
         |vc AS (SELECT ex.vec_id, cent.cell,
         |         sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS ccos
         |       FROM ex JOIN cent ON ex.i = cent.i GROUP BY 1, 2),
         |assigned AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cell) AS crk FROM vc) WHERE crk = 1),
         |cel AS (SELECT 'ivf_cells' AS artifact,
         |    CAST(count(DISTINCT CASE WHEN vec_id % 97 = 0 THEN cell END)
         |      AS BIGINT) AS n_affected,
         |    CAST(count(DISTINCT cell) AS BIGINT) AS n_total FROM assigned),
         |clusters AS ($dupClustersSql),
         |clu AS (SELECT 'dup_clusters' AS artifact,
         |    CAST(count(DISTINCT CASE WHEN doc_id % 97 = 0 THEN cluster_id END)
         |      AS BIGINT) AS n_affected,
         |    CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_total
         |  FROM clusters),
         |u AS (SELECT * FROM lex UNION ALL SELECT * FROM cel
         |      UNION ALL SELECT * FROM clu)
         |SELECT artifact, n_affected, n_total,
         |  CAST(CASE WHEN n_total = 0 THEN 0
         |       ELSE n_affected * 10000 // n_total END AS BIGINT)
         |    AS affected_bp
         |FROM u""".stripMargin,

    // dd26: per-cluster chain-collapse risk — edges with zero triangle
    // support through the SAME wedge-safe (deg ≤ 64 center) kernel as
    // gr04, aggregated per dd06 cluster; bp share exact.
    "dd26_chain_risk" ->
      s"""WITH j AS ($ngramJaccardSql),
         |bi AS (SELECT d1 AS m, d2 AS n FROM j UNION ALL SELECT d2, d1 FROM j),
         |deg AS (SELECT m, count(*) AS deg FROM bi GROUP BY 1),
         |safe AS (SELECT bi.m, bi.n FROM bi JOIN deg USING (m)
         |         WHERE deg.deg <= 64),
         |cn AS (SELECT x.n AS a, y.n AS b, CAST(count(*) AS BIGINT) AS common
         |       FROM safe x JOIN safe y ON x.m = y.m AND x.n < y.n
         |       GROUP BY 1, 2),
         |es AS (SELECT j.d1, j.d2, coalesce(cn.common, 0) AS support
         |       FROM j LEFT JOIN cn ON cn.a = j.d1 AND cn.b = j.d2),
         |clusters AS ($dupClustersSql),
         |ce AS (SELECT c.cluster_id, es.support
         |       FROM es JOIN clusters c ON c.doc_id = es.d1),
         |agg AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_edges,
         |          CAST(sum(CASE WHEN support = 0 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_bridge_edges
         |        FROM ce GROUP BY 1),
         |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
         |       FROM clusters GROUP BY 1)
         |SELECT sz.cluster_id, n_members, n_edges, n_bridge_edges,
         |  CAST(n_bridge_edges * 10000 // n_edges AS BIGINT)
         |    AS bridge_share_bp
         |FROM sz JOIN agg ON agg.cluster_id = sz.cluster_id""".stripMargin,

    // dd27: min-label components over the triangle-supported edge
    // subset (bridges dropped), reported per original dd06 cluster;
    // members with no supported edge stay as their own singleton.
    "dd27_safe_clusters" ->
      s"""WITH j AS ($ngramJaccardSql),
         |bi AS (SELECT d1 AS m, d2 AS n FROM j UNION ALL SELECT d2, d1 FROM j),
         |deg AS (SELECT m, count(*) AS deg FROM bi GROUP BY 1),
         |safe AS (SELECT bi.m, bi.n FROM bi JOIN deg USING (m)
         |         WHERE deg.deg <= 64),
         |cn AS (SELECT x.n AS a, y.n AS b, CAST(count(*) AS BIGINT) AS common
         |       FROM safe x JOIN safe y ON x.m = y.m AND x.n < y.n
         |       GROUP BY 1, 2),
         |es AS (SELECT j.d1, j.d2, coalesce(cn.common, 0) AS support
         |       FROM j LEFT JOIN cn ON cn.a = j.d1 AND cn.b = j.d2),
         |sup AS (SELECT d1, d2 FROM es WHERE support > 0),
         |sbi AS (SELECT d1 AS a, d2 AS b FROM sup
         |        UNION ALL SELECT d2, d1 FROM sup),
         |sreach AS (
         |  WITH RECURSIVE r(a, b) AS (
         |    SELECT a, b FROM sbi
         |    UNION
         |    SELECT r.a, sbi.b FROM r JOIN sbi ON r.b = sbi.a)
         |  SELECT * FROM r),
         |sc AS (SELECT a AS doc_id, least(a, min(b)) AS safe_id
         |       FROM sreach GROUP BY a),
         |clusters AS ($dupClustersSql),
         |mem AS (SELECT c.doc_id, c.cluster_id,
         |          coalesce(sc.safe_id, c.doc_id) AS safe_id
         |        FROM clusters c LEFT JOIN sc ON sc.doc_id = c.doc_id),
         |ssz AS (SELECT cluster_id, safe_id, CAST(count(*) AS BIGINT) AS sz
         |        FROM mem GROUP BY 1, 2)
         |SELECT cluster_id, CAST(sum(sz) AS BIGINT) AS n_members,
         |  CAST(count(*) AS BIGINT) AS n_safe_clusters,
         |  CAST(max(sz) AS BIGINT) AS largest_safe,
         |  count(*) > 1 AS split
         |FROM ssz GROUP BY 1""".stripMargin,

    // tx51: per-source hapax (frequency-1) vocabulary share — exact
    // counts, bp grids.
    "tx51_hapax_profile" ->
      """WITH t AS (SELECT source,
        |    unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
        |       FROM t GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000 // count(*)
        |    AS BIGINT) AS hapax_share_bp,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000
        |    // CAST(sum(n) AS BIGINT) AS BIGINT) AS hapax_mass_bp
        |FROM st GROUP BY 1""".stripMargin,

    // pp36: 16 shards striped onto 4 workers by descending token
    // load; overrun clamped at 0 (negative numerators divide
    // differently across engines).
    "pp36_worker_schedule" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(trim(text),' ')) AS BIGINT) AS n_tokens,
        |    list_sum(list_transform(range(0,4), k ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5('shard:' || CAST(doc_id AS VARCHAR)), k+1, 1)) - 1
        |        AS BIGINT) * (CAST(1 AS BIGINT) << (4*(3-k))))) % 16
        |      AS shard_id
        |  FROM documents),
        |g AS (SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_bytes
        |  FROM d GROUP BY 1),
        |a AS (SELECT *, (row_number() OVER (
        |    ORDER BY n_tokens DESC, shard_id) - 1) % 4 AS worker FROM g),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM g)
        |SELECT CAST(worker AS BIGINT) AS worker,
        |  CAST(count(*) AS BIGINT) AS n_shards,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
        |  CAST(sum(n_tokens) * 10000 // t_tokens AS BIGINT) AS load_bp,
        |  CAST(greatest(0, (sum(n_tokens) * 4 - t_tokens) * 10000
        |    // t_tokens) AS BIGINT) AS overrun_bp
        |FROM a CROSS JOIN tot GROUP BY worker, t_tokens""".stripMargin,

    // q71: independence deviation per contingency cell; abs + flag
    // because Spark div truncates and DuckDB // floors (they agree
    // only on nonnegative numerators).
    "q71_contingency" ->
      """WITH cells AS (SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS BIGINT) AS observed
        |  FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS r_tot
        |       FROM lineitem GROUP BY 1),
        |ct AS (SELECT l_linestatus, CAST(count(*) AS BIGINT) AS c_tot
        |       FROM lineitem GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem)
        |SELECT cells.l_returnflag, cells.l_linestatus, observed,
        |  r_tot, c_tot,
        |  CAST(r_tot * c_tot * 1000 // n AS BIGINT) AS expected_milli,
        |  CAST(CASE WHEN r_tot * c_tot * 1000 // n = 0 THEN 0
        |    ELSE abs(observed * 1000 - r_tot * c_tot * 1000 // n) * 10000
        |      // (r_tot * c_tot * 1000 // n) END AS BIGINT) AS abs_dev_bp,
        |  observed * 1000 > r_tot * c_tot * 1000 // n AS over_represented
        |FROM cells JOIN rt USING (l_returnflag)
        |JOIN ct USING (l_linestatus) CROSS JOIN n""".stripMargin,

    // pp35: temperature curve on the sqrt-chain micro grid (IEEE sqrt
    // is correctly rounded on both engines; pow is not).
    "pp35_temp_curve" ->
      """WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |t AS (
        |  SELECT 'raw' AS tau, source, n_docs,
        |    CAST(round(n_docs * 1000000.0) AS BIGINT) AS w_micro FROM n
        |  UNION ALL
        |  SELECT 'sqrt', source, n_docs,
        |    CAST(round(sqrt(n_docs) * 1000000) AS BIGINT) FROM n
        |  UNION ALL
        |  SELECT 'fourth_root', source, n_docs,
        |    CAST(round(sqrt(sqrt(n_docs)) * 1000000) AS BIGINT) FROM n),
        |tot AS (SELECT tau, CAST(sum(w_micro) AS BIGINT) AS w_tot
        |        FROM t GROUP BY 1)
        |SELECT t.tau, t.source, n_docs, w_micro,
        |  CAST(w_micro * 1000000 // w_tot AS BIGINT) AS share_ppm
        |FROM t JOIN tot USING (tau)""".stripMargin,

    // mm14: rendezvous repair plan for failed node 7 — target = each
    // affected chunk's rank-4 node; mm11's scoring replayed.
    "mm14_repair_plan" ->
      """WITH c AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0)
        |      AS BIGINT))) AS chunk_idx
        |  FROM documents),
        |ch AS (SELECT
        |    md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64))
        |      AS chunk_md5,
        |    CAST(length(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64))
        |      // 2 AS BIGINT) AS chunk_bytes
        |  FROM c),
        |u AS (SELECT chunk_md5, max(chunk_bytes) AS chunk_bytes
        |      FROM ch GROUP BY 1),
        |p AS (SELECT chunk_md5, chunk_bytes, unnest(range(16)) AS node
        |      FROM u),
        |r AS (SELECT chunk_md5, chunk_bytes, node,
        |    md5(chunk_md5 || '#' || CAST(node AS VARCHAR)) AS score
        |  FROM p),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY chunk_md5
        |    ORDER BY score DESC, node) AS rk FROM r),
        |aff AS (SELECT chunk_md5, rk = 1 AS lost_primary
        |        FROM rk WHERE rk <= 3 AND node = 7),
        |tgt AS (SELECT chunk_md5, CAST(node AS BIGINT) AS node,
        |          chunk_bytes
        |        FROM rk WHERE rk = 4)
        |SELECT tgt.node, CAST(count(*) AS BIGINT) AS n_repairs,
        |  CAST(sum(chunk_bytes) AS BIGINT) AS repair_bytes,
        |  CAST(sum(CASE WHEN lost_primary THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lost_primary
        |FROM aff JOIN tgt USING (chunk_md5) GROUP BY 1""".stripMargin,

    // ev55: recency churn per signup cohort — horizon = corpus max
    // day, churned = silent > 14 days, lower-median silence.
    "ev55_churn_cohorts" ->
      """WITH h AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
        |u AS (SELECT user_id,
        |        CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week,
        |        max(CAST(ts AS DATE)) AS last_day
        |      FROM events GROUP BY 1),
        |ux AS (SELECT u.*, date_diff('day', last_day, h.h) AS days_silent
        |       FROM u CROSS JOIN h),
        |tot AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users,
        |          CAST(sum(CASE WHEN days_silent > 14 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_churned
        |        FROM ux GROUP BY 1),
        |hist AS (SELECT cohort_week, days_silent, count(*) AS cnt
        |         FROM ux GROUP BY 1, 2),
        |ch AS (SELECT cohort_week, days_silent,
        |        CAST(sum(cnt) OVER (PARTITION BY cohort_week
        |          ORDER BY days_silent) AS BIGINT) AS cum
        |      FROM hist),
        |med AS (SELECT ch.cohort_week,
        |          min(CASE WHEN cum * 2 >= n_users THEN days_silent END)
        |            AS median_days_silent
        |        FROM ch JOIN tot USING (cohort_week) GROUP BY 1)
        |SELECT tot.cohort_week, n_users, n_churned,
        |  CAST(n_churned * 10000 // n_users AS BIGINT) AS churn_bp,
        |  CAST(median_days_silent AS BIGINT) AS median_days_silent
        |FROM tot JOIN med ON med.cohort_week = tot.cohort_week"""
        .stripMargin,

    // dd28: one keeper per SAFE sub-cluster (dd27's partition), dd07's
    // quality rule; |keepers per original cluster| = n_safe_clusters.
    // pp45: the oracle rebuilds dd28's whole chain (support, bridges,
    // safe components, keep-best) on the SURVIVOR corpus; Spark
    // patches only the affected clusters' subgraphs — hash match =
    // patch ≡ rebuild for the chain-weld-conservative keeper table,
    // retiring the fail-closed purge marker.
    "pp45_patch_safe" ->
      s"""WITH ${safeChainCtesFrom(
          " WHERE z.d1 % 97 <> 0 AND z.d2 % 97 <> 0",
          " AND doc_id % 97 <> 0")},
         |r AS (SELECT mem.cluster_id, mem.safe_id, mem.doc_id,
         |        row_number() OVER (PARTITION BY mem.safe_id
         |          ORDER BY s.score DESC, mem.doc_id) AS rk,
         |        count(*) OVER (PARTITION BY mem.safe_id) AS n_members
         |      FROM mem JOIN scores s USING (doc_id))
         |SELECT cluster_id, safe_id, doc_id AS keeper_id, n_members
         |FROM r WHERE rk = 1""".stripMargin,

    // pp51: the policy purge patch is hash-proven ≡ dd36 rebuilt from
    // scratch on the purged corpus — the same chain + policy CTEs over
    // the tombstone-filtered pair/document sources.
    "pp51_patch_policy" ->
      s"""WITH ${safeChainCtesFrom(
          " WHERE z.d1 % 97 <> 0 AND z.d2 % 97 <> 0",
          " AND doc_id % 97 <> 0")},
         |$keeperPolicyCtes
         |SELECT rt.cluster_id, k.n_members, rt.density_bp, rt.route,
         |  k.safe_id, k.keeper_id
         |FROM rt JOIN k07 k USING (cluster_id)
         |WHERE rt.route = 'aggressive'
         |UNION ALL
         |SELECT rt.cluster_id, k.n_members, rt.density_bp, rt.route,
         |  k.safe_id, k.keeper_id
         |FROM rt JOIN k28 k USING (cluster_id)
         |WHERE rt.route = 'conservative'""".stripMargin,

    "dd28_safe_keep_best" ->
      s"""WITH $safeChainCtes,
         |r AS (SELECT mem.cluster_id, mem.safe_id, mem.doc_id,
         |        row_number() OVER (PARTITION BY mem.safe_id
         |          ORDER BY s.score DESC, mem.doc_id) AS rk,
         |        count(*) OVER (PARTITION BY mem.safe_id) AS n_members
         |      FROM mem JOIN scores s USING (doc_id))
         |SELECT cluster_id, safe_id, doc_id AS keeper_id, n_members
         |FROM r WHERE rk = 1""".stripMargin,

    // pp49: the safe-keeper UPSERT patch is hash-proven ≡ dd28
    // rebuilt from scratch on the FULL corpus (standing ∪ src0 batch)
    // — dd28's own oracle, verbatim; the patch ≡ rebuild discipline
    // (pp43/pp45's proof shape, arrival direction).
    "pp49_upsert_safe" ->
      s"""WITH $safeChainCtes,
         |r AS (SELECT mem.cluster_id, mem.safe_id, mem.doc_id,
         |        row_number() OVER (PARTITION BY mem.safe_id
         |          ORDER BY s.score DESC, mem.doc_id) AS rk,
         |        count(*) OVER (PARTITION BY mem.safe_id) AS n_members
         |      FROM mem JOIN scores s USING (doc_id))
         |SELECT cluster_id, safe_id, doc_id AS keeper_id, n_members
         |FROM r WHERE rk = 1""".stripMargin,

    // dd36: the routed keeper terminal replayed — dd35's density on
    // the shared verified-pair set, the 5000 bp floor, dd07's rule on
    // dense clusters, dd28's safe rule on the rest; the route column
    // proves both engines decided every cluster identically.
    "dd36_keeper_policy" ->
      s"""WITH $safeChainCtes,
         |$keeperPolicyCtes
         |SELECT rt.cluster_id, k.n_members, rt.density_bp, rt.route,
         |  k.safe_id, k.keeper_id
         |FROM rt JOIN k07 k USING (cluster_id)
         |WHERE rt.route = 'aggressive'
         |UNION ALL
         |SELECT rt.cluster_id, k.n_members, rt.density_bp, rt.route,
         |  k.safe_id, k.keeper_id
         |FROM rt JOIN k28 k USING (cluster_id)
         |WHERE rt.route = 'conservative'""".stripMargin,

    // dd37: the policy-threshold curve replayed — dd35's density and
    // dd27's safe decomposition joined per cluster, counted under each
    // candidate floor.
    "dd37_policy_curve" ->
      s"""WITH $safeChainCtes,
         |$keeperPolicyCtes,
         |d27 AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |          CAST(count(DISTINCT safe_id) AS BIGINT) AS n_safe
         |        FROM mem GROUP BY 1),
         |thr AS (SELECT CAST(unnest([2500, 5000, 7500]) AS BIGINT)
         |          AS thr_bp)
         |SELECT thr_bp,
         |  CAST(sum(CASE WHEN density_bp >= thr_bp THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_aggressive,
         |  CAST(sum(CASE WHEN density_bp < thr_bp THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_conservative,
         |  CAST(sum(CASE WHEN density_bp >= thr_bp THEN 1 ELSE n_safe END)
         |    AS BIGINT) AS n_keepers,
         |  CAST(sum(CASE WHEN density_bp >= thr_bp THEN n_members - 1
         |           ELSE n_members - n_safe END) AS BIGINT) AS n_discarded
         |FROM dens JOIN d27 USING (cluster_id) CROSS JOIN thr
         |GROUP BY 1""".stripMargin,

    // pp50: the routed terminal consumed — pp01's quality gate and
    // split hash verbatim, removals from dd36's policy keepers, the
    // surviving route as an audit column.
    "pp50_policy_training_set" ->
      s"""WITH $safeChainCtes,
         |$keeperPolicyCtes,
         |pk AS (SELECT k.cluster_id, k.keeper_id
         |       FROM rt JOIN k07 k USING (cluster_id)
         |       WHERE rt.route = 'aggressive'
         |       UNION ALL
         |       SELECT k.cluster_id, k.keeper_id
         |       FROM rt JOIN k28 k USING (cluster_id)
         |       WHERE rt.route = 'conservative'),
         |removed AS (SELECT c.doc_id FROM clusters c
         |            WHERE c.doc_id NOT IN (SELECT keeper_id FROM pk))
         |SELECT d.doc_id,
         |  CASE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
         |    WHEN 'f' THEN 'test' WHEN 'e' THEN 'val' ELSE 'train'
         |    END AS split,
         |  s.score,
         |  coalesce(rt2.route, 'unclustered') AS dedup_route
         |FROM documents d
         |JOIN scores s ON s.doc_id = d.doc_id
         |LEFT JOIN clusters c ON c.doc_id = d.doc_id
         |LEFT JOIN rt rt2 ON rt2.cluster_id = c.cluster_id
         |WHERE s.score >= 0.5
         |  AND d.doc_id NOT IN (SELECT doc_id FROM removed)""".stripMargin,

    // pp34: the cap sweep re-ranks only the ≤160-row/source top list;
    // saturated = sources whose doc count exceeds the cap.
    "pp34_cap_curve" ->
      """WITH caps AS (SELECT CAST(unnest([10,20,40,60,80,160]) AS BIGINT)
        |               AS cap),
        |r AS (SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents),
        |k AS (SELECT cap, CAST(count(*) AS BIGINT) AS docs_kept,
        |        CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |      FROM r JOIN caps ON r.rk <= caps.cap GROUP BY 1),
        |srcs AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |         FROM documents GROUP BY 1),
        |sat AS (SELECT cap, CAST(sum(CASE WHEN n > cap THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_saturated
        |        FROM srcs CROSS JOIN caps GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS t_docs,
        |          CAST(sum(n_chars) AS BIGINT) AS t_chars FROM documents)
        |SELECT k.cap, docs_kept, chars_kept, n_saturated,
        |  CAST(docs_kept * 1000000 // t_docs AS BIGINT) AS docs_kept_ppm,
        |  CAST(chars_kept * 1000000 // t_chars AS BIGINT) AS chars_kept_ppm
        |FROM k JOIN sat ON sat.cap = k.cap CROSS JOIN tot""".stripMargin,

    // ev54: per-user inter-arrival regularity on the integer second
    // grid (ev33's timestamp convention); modal gap ties to the
    // smallest value, thresholds ≥20 events / ≥50% modal share / ≤2
    // distinct deltas.
    "ev54_bot_detect" -> botDetectSql,

    // ev56: ev12's per-user features minus ev54's bot flags — the
    // detector's consumer; NOT IN is null-safe here (user_id is a
    // key column on both sides).
    "ev56_gated_features" ->
      s"""WITH b AS ($botDetectSql)
         |SELECT user_id,
         | count(*) AS n_events,
         | count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
         | count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
         | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
         | round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
         |   AS purchase_value,
         | CAST(date_trunc('second', max(ts)) AS TIMESTAMP) AS last_seen,
         | count(DISTINCT date_trunc('day', ts)) AS active_days
         |FROM events
         |WHERE user_id NOT IN (SELECT user_id FROM b WHERE is_bot)
         |GROUP BY user_id""".stripMargin,



    // pp33: per-source cap at 60 docs by (n_chars DESC, doc_id) —
    // the same deterministic rank the Spark TopKPairAggregator keeps.
    "pp33_domain_caps" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents),
        |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |        CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |      FROM r WHERE rk <= 60 GROUP BY 1),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_chars) AS BIGINT) AS chars_total
        |      FROM documents GROUP BY 1)
        |SELECT a.source, n_docs, n_kept, n_docs - n_kept AS n_dropped,
        |  chars_total, chars_kept,
        |  CAST(CASE WHEN chars_total = 0 THEN 0
        |       ELSE chars_kept * 1000000 // chars_total END AS BIGINT)
        |    AS kept_ppm
        |FROM a JOIN k ON k.source = a.source""".stripMargin,

    // ss23: RRF fusion of the BM25 tier (ss21's truncated
    // impact-ordered index, top-20) with the brute cosine tier
    // (top-20); rank-only fusion on the integer grid, final top-5.
    "ss23_hybrid_bm25" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
        |             AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(100 * CAST(sum(dl) AS BIGINT) // count(*) AS BIGINT) AS a_c
        |  FROM dl),
        |idf AS (SELECT tok,
        |    CAST(round(ln(CAST(n_docs * 2 + 2 AS DOUBLE)
        |      / CAST(df * 2 + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS idf_micro,
        |    a_c
        |  FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1) x
        |  CROSS JOIN tot),
        |post AS (SELECT tok, doc_id, tf FROM (
        |    SELECT tok, doc_id, tf, row_number() OVER (PARTITION BY tok
        |      ORDER BY tf DESC, doc_id) AS prk FROM tf) z WHERE prk <= 64),
        |qt AS (SELECT tf.doc_id AS qid, tf.tok, idf.idf_micro, idf.a_c
        |       FROM tf JOIN idf ON idf.tok = tf.tok WHERE tf.doc_id < 10),
        |sc AS (SELECT qt.qid, post.doc_id,
        |    CAST(sum(qt.idf_micro * 22 * post.tf * qt.a_c
        |      // (10 * qt.a_c * post.tf + 3 * qt.a_c + 900 * dl.dl))
        |      AS BIGINT) AS bm25_micro
        |  FROM qt JOIN post ON post.tok = qt.tok AND post.doc_id != qt.qid
        |  JOIN dl ON dl.doc_id = post.doc_id
        |  GROUP BY 1, 2),
        |btop AS (SELECT qid, doc_id AS nid, rk FROM (
        |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
        |      ORDER BY bm25_micro DESC, doc_id) AS rk FROM sc) z
        |    WHERE rk <= 20),
        |q AS (SELECT vec_id AS qid, embedding AS qe
        |      FROM embeddings WHERE vec_id < 10),
        |vc AS (SELECT qid, e.vec_id AS nid,
        |         list_cosine_similarity(qe, e.embedding) AS cos
        |       FROM q, embeddings e WHERE e.vec_id != qid),
        |vtop AS (SELECT qid, nid, rk FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rk FROM vc) z WHERE rk <= 20),
        |f AS (SELECT coalesce(v.qid, b.qid) AS qid,
        |        coalesce(v.nid, b.nid) AS nid,
        |        CAST(coalesce(v.rk, 0) AS BIGINT) AS rank_vec,
        |        CAST(coalesce(b.rk, 0) AS BIGINT) AS rank_bm25,
        |        CAST((CASE WHEN v.rk IS NULL THEN 0
        |               ELSE 1000000 // (60 + v.rk) END)
        |           + (CASE WHEN b.rk IS NULL THEN 0
        |               ELSE 1000000 // (60 + b.rk) END) AS BIGINT)
        |          AS rrf_score
        |      FROM vtop v FULL OUTER JOIN btop b
        |        ON v.qid = b.qid AND v.nid = b.nid)
        |SELECT qid, nid AS neighbor_id, rank_vec, rank_bm25, rrf_score,
        |  CAST(rk_fused AS BIGINT) AS rk_fused
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY rrf_score DESC, nid) AS rk_fused FROM f) z
        |WHERE rk_fused <= 5""".stripMargin,

    // ss21: integer BM25 — Lucene-positive micro-nat idf (the tx08 ln
    // grid), the k1/b saturation cleared to one integer division per
    // (doc, term), per-term postings statically truncated to the
    // top-64 by (tf DESC, doc_id); scores exact int64 on both engines.
    "ss21_bm25_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
        |             AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(100 * CAST(sum(dl) AS BIGINT) // count(*) AS BIGINT) AS a_c
        |  FROM dl),
        |idf AS (SELECT tok,
        |    CAST(round(ln(CAST(n_docs * 2 + 2 AS DOUBLE)
        |      / CAST(df * 2 + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS idf_micro,
        |    a_c
        |  FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1) x
        |  CROSS JOIN tot),
        |post AS (SELECT tok, doc_id, tf FROM (
        |    SELECT tok, doc_id, tf, row_number() OVER (PARTITION BY tok
        |      ORDER BY tf DESC, doc_id) AS prk FROM tf) z WHERE prk <= 64),
        |qt AS (SELECT tf.doc_id AS qid, tf.tok, idf.idf_micro, idf.a_c
        |       FROM tf JOIN idf ON idf.tok = tf.tok WHERE tf.doc_id < 10),
        |sc AS (SELECT qt.qid, post.doc_id,
        |    CAST(sum(qt.idf_micro * 22 * post.tf * qt.a_c
        |      // (10 * qt.a_c * post.tf + 3 * qt.a_c + 900 * dl.dl))
        |      AS BIGINT) AS bm25_micro
        |  FROM qt JOIN post ON post.tok = qt.tok AND post.doc_id != qt.qid
        |  JOIN dl ON dl.doc_id = post.doc_id
        |  GROUP BY 1, 2)
        |SELECT qid, doc_id AS neighbor_id, bm25_micro,
        |  CAST(rk AS BIGINT) AS rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY bm25_micro DESC, doc_id) AS rk FROM sc) z
        |WHERE rk <= 10""".stripMargin,

    // ss28: the posting-truncation curve replayed end-to-end — posting
    // rank via row_number per term, per-keep scores as rank-filtered
    // re-sums, the truth tier over the FULL posting lists, recall@10
    // per (keep, qid) on the exact bp grid.
    "ss28_keep_curve" -> {
      val keepTiers = Seq(16, 32, 64).map { k =>
        s"""s$k AS (SELECT qt.qid, rp.doc_id,
           |    CAST(sum(qt.idf_micro * 22 * rp.tf * qt.a_c
           |      // (10 * qt.a_c * rp.tf + 3 * qt.a_c + 900 * dl.dl))
           |      AS BIGINT) AS bm25_micro
           |  FROM qt JOIN rp ON rp.tok = qt.tok AND rp.doc_id != qt.qid
           |    AND rp.pr <= $k
           |  JOIN dl ON dl.doc_id = rp.doc_id
           |  GROUP BY 1, 2),
           |a$k AS (SELECT qid, doc_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY bm25_micro DESC, doc_id) AS rk FROM s$k) z
           |  WHERE rk <= 10),
           |r$k AS (SELECT CAST($k AS BIGINT) AS keep, f.qid,
           |    CAST(count(a$k.doc_id) AS BIGINT) AS n_hit,
           |    CAST(count(a$k.doc_id) * 10000 // count(*) AS BIGINT)
           |      AS recall_bp
           |  FROM f10 f LEFT JOIN a$k
           |    ON a$k.qid = f.qid AND a$k.doc_id = f.doc_id
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
         |             AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |       FROM t GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(100 * CAST(sum(dl) AS BIGINT) // count(*) AS BIGINT) AS a_c
         |  FROM dl),
         |idf AS (SELECT tok,
         |    CAST(round(ln(CAST(n_docs * 2 + 2 AS DOUBLE)
         |      / CAST(df * 2 + 1 AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS idf_micro,
         |    a_c
         |  FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1) x
         |  CROSS JOIN tot),
         |qt AS (SELECT tf.doc_id AS qid, tf.tok, idf.idf_micro, idf.a_c
         |       FROM tf JOIN idf ON idf.tok = tf.tok WHERE tf.doc_id < 10),
         |rp AS (SELECT tok, doc_id, tf, row_number() OVER (PARTITION BY tok
         |         ORDER BY tf DESC, doc_id) AS pr FROM tf),
         |scf AS (SELECT qt.qid, tf.doc_id,
         |    CAST(sum(qt.idf_micro * 22 * tf.tf * qt.a_c
         |      // (10 * qt.a_c * tf.tf + 3 * qt.a_c + 900 * dl.dl))
         |      AS BIGINT) AS bm25_micro
         |  FROM qt JOIN tf ON tf.tok = qt.tok AND tf.doc_id != qt.qid
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  GROUP BY 1, 2),
         |f10 AS (SELECT qid, doc_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY bm25_micro DESC, doc_id) AS rk FROM scf) z
         |  WHERE rk <= 10),
         |$keepTiers
         |SELECT * FROM r16
         |UNION ALL SELECT * FROM r32
         |UNION ALL SELECT * FROM r64""".stripMargin
    },

    // ss29: ss10's PQ replay generalized over the sub-space widths
    // (m = i // w per tier); recall join is ss16's proven shape. The
    // float ADC only ORDERS candidates (rank-100 cut + rank-5 rerank
    // cut) — the graded recall_bp is integer.
    "ss29_pq_m_curve" ->
      s"""WITH ws AS (SELECT * FROM (VALUES (2, 32), (4, 16), (8, 8))
         |            t(pm, w)),
         |ex AS (SELECT vec_id, label, i, CAST(embedding[i+1] AS DOUBLE) AS x
         |     FROM embeddings, range(64) t(i)),
         |cent AS (SELECT label AS cell, i, avg(x) AS c FROM ex GROUP BY 1, 2),
         |l2 AS (SELECT ws.pm, e.vec_id, e.i // ws.w AS m, ct.cell,
         |         sum((e.x - ct.c) * (e.x - ct.c)) AS d2
         |       FROM ex e JOIN cent ct ON ct.i = e.i CROSS JOIN ws
         |       GROUP BY 1, 2, 3, 4),
         |enc AS (SELECT pm, vec_id, m, cell FROM (SELECT pm, vec_id, m, cell,
         |         row_number() OVER (PARTITION BY pm, vec_id, m
         |           ORDER BY d2, cell) AS rn
         |       FROM l2) WHERE rn = 1),
         |ltab AS (SELECT ws.pm, e.vec_id AS qid, e.i // ws.w AS m, ct.cell,
         |           sum(e.x * ct.c) AS v
         |         FROM ex e JOIN cent ct ON ct.i = e.i CROSS JOIN ws
         |         WHERE e.vec_id < 10
         |         GROUP BY 1, 2, 3, 4),
         |adc AS (SELECT en.pm, lt.qid, en.vec_id AS cid, sum(lt.v) AS adc
         |        FROM enc en JOIN ltab lt ON lt.pm = en.pm AND lt.m = en.m
         |          AND lt.cell = en.cell
         |        WHERE en.vec_id != lt.qid
         |        GROUP BY 1, 2, 3),
         |c100 AS (SELECT pm, qid, cid FROM (SELECT pm, qid, cid,
         |          row_number() OVER (PARTITION BY pm, qid
         |            ORDER BY adc DESC, cid) AS rn
         |        FROM adc) WHERE rn <= 100),
         |rr AS (SELECT c.pm, c.qid, c.cid,
         |        list_cosine_similarity(qe.embedding, e.embedding) AS cos
         |      FROM c100 c
         |      JOIN embeddings qe ON qe.vec_id = c.qid
         |      JOIN embeddings e ON e.vec_id = c.cid),
         |appr AS (SELECT pm, qid, cid FROM (
         |      SELECT pm, qid, cid,
         |        row_number() OVER (PARTITION BY pm, qid
         |          ORDER BY cos DESC, cid) AS rk
         |      FROM rr) WHERE rk <= 5),
         |exact AS ($bruteTopkSql),
         |ec AS (SELECT ws.pm, e.qid, e.neighbor_id FROM ws CROSS JOIN exact e)
         |SELECT CAST(ec.pm AS BIGINT) AS pq_m, ec.qid,
         |  count(a.cid) AS n_hit,
         |  CAST(count(a.cid) * 10000 // count(*) AS BIGINT) AS recall_bp
         |FROM ec LEFT JOIN appr a
         |  ON a.pm = ec.pm AND a.qid = ec.qid AND a.cid = ec.neighbor_id
         |GROUP BY 1, 2""".stripMargin,

    // ss20: per-(query, source) top-2 then global top-10 — rank-only
    // output, float cosine only orders (ss01's contract).
    "ss20_quota_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT qid, e.vec_id AS cid, d.source,
        |        list_cosine_similarity(qe, e.embedding) AS cos
        |      FROM q, embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |      WHERE e.vec_id != qid),
        |r2 AS (SELECT qid, cid, source, cos, row_number() OVER (
        |    PARTITION BY qid, source ORDER BY cos DESC, cid) AS sr FROM c),
        |k AS (SELECT qid, cid, source, cos FROM r2 WHERE sr <= 2),
        |g AS (SELECT qid, cid, source, row_number() OVER (
        |    PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM k)
        |SELECT qid, cid AS neighbor_id, source, CAST(rk AS BIGINT) AS rk
        |FROM g WHERE rk <= 10""".stripMargin,

    "q49_hot_cold_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS revenue_c
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,

    "sk08_bottomk_sample" ->
      """WITH h AS (SELECT event_type, event_id,
        |    md5(CAST(event_id AS VARCHAR)) AS hh
        |  FROM events),
        |v AS (SELECT event_type, event_id,
        |    CAST(list_sum(list_transform(range(0,8), k ->
        |      CAST(strpos('0123456789abcdef', substr(hh, k+1, 1)) - 1
        |        AS BIGINT) * (CAST(1 AS BIGINT) << (4*(7-k))))) AS BIGINT)
        |      AS hv
        |  FROM h),
        |r AS (SELECT event_type, event_id, row_number() OVER (
        |    PARTITION BY event_type ORDER BY hv, event_id) AS rk
        |  FROM v)
        |SELECT event_type, rk, event_id FROM r WHERE rk <= 5""".stripMargin,

    "tx29_bigram_coverage" ->
      """WITH bg AS (SELECT doc_id, unnest(list_transform(
        |      range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |  FROM (SELECT doc_id, string_split(trim(text),' ') AS tk
        |        FROM documents)
        |  WHERE len(tk) >= 2),
        |vocab AS (SELECT bigram FROM bg GROUP BY bigram
        |  ORDER BY count(*) DESC, bigram LIMIT 200)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN v.bigram IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_in_lm,
        |  CAST(sum(CASE WHEN v.bigram IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    * 10000 // count(*) AS coverage_bp
        |FROM bg b LEFT JOIN vocab v ON b.bigram = v.bigram
        |GROUP BY b.doc_id""".stripMargin,

    "tx28_vocab_growth" ->
      """WITH tc AS (SELECT source, tok, count(*) AS cnt
        |  FROM (SELECT source, unnest(string_split(trim(text),' ')) AS tok
        |        FROM documents)
        |  GROUP BY source, tok),
        |agg AS (SELECT source,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types,
        |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax
        |  FROM tc GROUP BY source)
        |SELECT source, n_tokens, n_types, n_hapax,
        |  n_types * 10000 // n_tokens AS ttr_bp,
        |  n_hapax * 10000 // n_types AS hapax_bp
        |FROM agg""".stripMargin,

    "mm09_gc_audit" -> {
      s"""WITH refs AS ($chunksSql),
         |rules AS (SELECT doc_id,
         |    len(string_split(trim(text),' ')) AS n_tokens,
         |    (length(trim(text)) - (len(string_split(trim(text),' ')) - 1))
         |      * 100 // len(string_split(trim(text),' ')) AS mwl_c,
         |    CAST(len(list_distinct(string_split(trim(text),' '))) AS BIGINT)
         |      * 1000000 // len(string_split(trim(text),' ')) AS uniq_ppm,
         |    len(list_filter(string_split(trim(text),' '),
         |      t -> t IN ('the','a','of','and','to','in'))) AS stop_cnt
         |  FROM documents),
         |live AS (SELECT doc_id FROM rules
         |  WHERE n_tokens >= 20 AND mwl_c BETWEEN 250 AND 800
         |    AND stop_cnt >= 2 AND uniq_ppm >= 350000),
         |flags AS (SELECT r.chunk_md5,
         |    CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END AS lv
         |  FROM refs r LEFT JOIN live l ON r.doc_id = l.doc_id),
         |blobs AS (SELECT chunk_md5, max(lv) AS has_live, min(lv) AS all_live,
         |    count(*) AS n_refs
         |  FROM flags GROUP BY chunk_md5)
         |SELECT CASE WHEN has_live = 0 THEN 'garbage'
         |            WHEN all_live = 1 THEN 'live_only'
         |            ELSE 'mixed' END AS status,
         |  count(*) AS n_blobs, CAST(sum(n_refs) AS BIGINT) AS n_refs
         |FROM blobs GROUP BY 1""".stripMargin
    },

    "q48_calendar_ops" ->
      """WITH x AS (SELECT o_orderkey, o_orderdate,
        |    date_trunc('quarter', o_orderdate) AS qtr_start,
        |    last_day(o_orderdate + INTERVAL 3 MONTH) AS due_eom
        |  FROM orders)
        |SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
        |  count(*) AS n_orders,
        |  max(date_diff('day', qtr_start, o_orderdate)) AS max_days_into_q,
        |  min(due_eom) AS min_due_eom, max(due_eom) AS max_due_eom
        |FROM x GROUP BY 1, 2""".stripMargin,

    "gr06_minlabel" -> {
      val rounds = (1 to 5).map { k =>
        s"""l$k AS (SELECT l.node, least(l.lbl, min(nb.lbl)) AS lbl
           |  FROM l${k - 1} l JOIN e ON e.src = l.node
           |  JOIN l${k - 1} nb ON nb.node = e.dst
           |  GROUP BY l.node, l.lbl)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
         |    FROM lineitem x JOIN lineitem y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         |$rounds
         |SELECT node AS part_id, lbl AS component_id FROM l5""".stripMargin
    },

    "pp09_quality_gate" ->
      """SELECT 'orders' AS table_name, 'fk_custkey' AS check_name,
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_violations, count(*) AS n_rows
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'lineitem', 'fk_orderkey',
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT), count(*)
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'lineitem', 'qty_range',
        |  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1
        |    ELSE 0 END) AS BIGINT), count(*) FROM lineitem
        |UNION ALL
        |SELECT 'events', 'null_user',
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*) FROM events
        |UNION ALL
        |SELECT 'customer', 'pk_unique',
        |  count(*) - count(DISTINCT c_custkey), count(*) FROM customer
        |UNION ALL
        |SELECT 'documents', 'chars_consistent',
        |  CAST(sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)
        |    AS BIGINT), count(*) FROM documents
        |UNION ALL
        |SELECT 'embeddings', 'dim_consistent',
        |  CAST(sum(CASE WHEN len(embedding) != 64 THEN 1 ELSE 0 END)
        |    AS BIGINT), count(*) FROM embeddings""".stripMargin,

    "q47_higher_order" ->
      """WITH a AS (SELECT l_orderkey,
        |    list_sort(list(CAST(l_quantity AS INTEGER))) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  len(qs) AS n_items,
        |  CAST(list_sum(qs) AS BIGINT) AS sum_q,
        |  len(list_filter(qs, x -> x > 25)) AS n_big,
        |  CASE WHEN len(list_filter(qs, x -> x = 50)) > 0 THEN 1 ELSE 0 END
        |    AS has_50,
        |  CAST(list_sum(list_transform(qs, x -> CAST(x AS BIGINT) * x))
        |    AS BIGINT) AS sum_sq
        |FROM a""".stripMargin,

    "pp08_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang,
        |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |q AS (SELECT lang, count(*) * 2 // 5 AS quota FROM h GROUP BY lang),
        |r AS (SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang ORDER BY hk, doc_id) AS rn
        |  FROM h)
        |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
        |WHERE r.rn <= q.quota""".stripMargin,

    "dd15_edit_neardup" ->
      """WITH t AS (SELECT doc_id, trim(text) AS tx,
        |             string_split(trim(text), ' ') AS tk FROM documents),
        |b AS (SELECT doc_id, tx, tk[1] AS tok1, len(tk) // 16 AS band FROM t)
        |SELECT a.doc_id AS d1, c.doc_id AS d2,
        |  CAST(levenshtein(a.tx, c.tx) AS BIGINT) AS dist
        |FROM b a JOIN b c ON a.tok1 = c.tok1 AND a.band = c.band
        |  AND a.doc_id < c.doc_id
        |WHERE levenshtein(a.tx, c.tx) * 100
        |  <= 20 * greatest(len(a.tx), len(c.tx))""".stripMargin,

    "tx30_boilerplate" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents),
        |p AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |        CASE WHEN len(tk) >= 8
        |             THEN array_to_string(list_slice(tk, 1, 8), ' ') END AS prefix
        |      FROM t),
        |bp AS (SELECT prefix FROM p WHERE prefix IS NOT NULL
        |       GROUP BY 1 HAVING count(*) >= 3)
        |SELECT p.doc_id, p.n_tokens,
        |  (bp.prefix IS NOT NULL) AS is_boilerplate,
        |  CASE WHEN bp.prefix IS NOT NULL THEN p.n_tokens - 8
        |       ELSE p.n_tokens END AS n_tokens_clean
        |FROM p LEFT JOIN bp ON p.prefix = bp.prefix""".stripMargin,

    "pp10_temperature_mix" ->
      """WITH h AS (SELECT doc_id, source,
        |    md5('mix10:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |q AS (SELECT source, least(count(*),
        |    CAST(floor(sqrt(count(*)) * 4) AS BIGINT)) AS quota
        |  FROM h GROUP BY source),
        |r AS (SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source ORDER BY hk, doc_id) AS rn
        |  FROM h)
        |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        |WHERE r.rn <= q.quota""".stripMargin,

    "tx31_adaptive_stopwords" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(trim(text),' ')) AS tok
        |           FROM documents),
        |top AS (SELECT tok FROM (
        |  SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1
        |  ORDER BY df DESC, tok LIMIT 30)),
        |g AS (SELECT doc_id, count(*) AS n_tokens,
        |    count(*) FILTER (WHERE tok IN (SELECT tok FROM top)) AS n_stop
        |  FROM tk GROUP BY 1)
        |SELECT doc_id, n_tokens, n_stop,
        |  n_stop * 1000000 // n_tokens AS stop_ppm FROM g""".stripMargin,

    "ev35_attribution" ->
      """WITH t AS (SELECT user_id, ts, event_id, event_type, value,
        |    last_value(CASE WHEN event_type != 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events)
        |SELECT coalesce(last_touch, 'direct') AS channel,
        |  count(*) AS n_purchases, round(sum(value), 2) AS revenue
        |FROM t WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    "gr08_link_predict" ->
      s"""WITH j AS ($ngramJaccardSql),
         |bi AS (SELECT d1 AS m, d2 AS n FROM j UNION ALL SELECT d2, d1 FROM j),
         |deg AS (SELECT m, count(*) AS deg FROM bi GROUP BY 1),
         |safe AS (SELECT bi.m, bi.n FROM bi JOIN deg USING (m)
         |         WHERE deg.deg <= 64),
         |w AS (SELECT x.n AS a, y.n AS b, count(*) AS common,
         |        CAST(sum(1000000 // d.deg) AS BIGINT) AS ra_ppm
         |      FROM safe x JOIN safe y ON x.m = y.m AND x.n < y.n
         |      JOIN deg d ON d.m = x.m GROUP BY 1, 2)
         |SELECT w.a, w.b, w.common,
         |  CAST(w.common * 1000000 // (da.deg + db.deg - w.common) AS BIGINT)
         |    AS jaccard_ppm,
         |  w.ra_ppm,
         |  CASE WHEN EXISTS (SELECT 1 FROM j WHERE j.d1 = w.a AND j.d2 = w.b)
         |       THEN 1 ELSE 0 END AS is_edge
         |FROM w JOIN deg da ON da.m = w.a JOIN deg db ON db.m = w.b"""
        .stripMargin,

    "pp11_drop_reasons" ->
      s"""WITH clusters AS ($dupClustersSql),
         |scores AS ($qualityScoreSql),
         |jj AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |  SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk
         |  FROM jj) WHERE rk = 1),
         |removed AS (SELECT c.doc_id FROM clusters c
         |            JOIN keep k ON c.cluster_id = k.cluster_id
         |            WHERE c.doc_id != k.keeper_id),
         |tt AS (SELECT doc_id,
         |    substr(md5(text), 1, 1) IN ('0','1') AS is_eval,
         |    string_split(trim(text),' ') AS tk
         |  FROM documents
         |  WHERE len(string_split(trim(text),' ')) >= 15),
         |ww AS (SELECT doc_id, is_eval, unnest(list_distinct(list_transform(
         |         range(1, len(tk)-15+2),
         |         i -> md5(array_to_string(list_slice(tk, i, i+14), ' ')))))
         |         AS wh
         |      FROM tt),
         |contam AS (SELECT DISTINCT tr.doc_id
         |           FROM ww tr JOIN ww ev ON tr.wh = ev.wh
         |           WHERE NOT tr.is_eval AND ev.is_eval),
         |base AS (SELECT d.doc_id, d.lang,
         |    CAST(len(string_split(trim(d.text),' ')) AS BIGINT) AS n_tokens,
         |    s.score
         |  FROM documents d JOIN scores s ON d.doc_id = s.doc_id),
         |lab AS (SELECT lang, n_tokens,
         |  CASE WHEN doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
         |       WHEN doc_id IN (SELECT doc_id FROM removed) THEN 'duplicate'
         |       WHEN score < 0.5 THEN 'low_quality' ELSE 'kept' END AS reason
         |  FROM base)
         |SELECT lang, reason, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
         |FROM lab GROUP BY 1, 2""".stripMargin,

    "pp12_column_profile" -> {
      val profiled = Seq("l_orderkey", "l_partkey", "quantity_c", "price_c",
        "shipdate_d")
      val branches = profiled.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS BIGINT) AS min_v,
           |  CAST(max($c) AS BIGINT) AS max_v
           |FROM l""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH l AS (SELECT l_orderkey, l_partkey,
         |  CAST(round(l_quantity * 100, 0) AS BIGINT) AS quantity_c,
         |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
         |  CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
         |    AS BIGINT) AS shipdate_d
         |  FROM lineitem)
         |$branches""".stripMargin
    },

    "q51_dpp_join" ->
      """WITH intake AS (SELECT
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER)
        |      AS mon,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS intake_c
        |  FROM orders GROUP BY 1),
        |bar AS (SELECT CAST(sum(intake_c) // count(*) AS BIGINT)
        |    AS bar_c FROM intake),
        |hot AS (SELECT mon, intake_c FROM intake, bar
        |       WHERE intake_c > bar_c AND intake_c > 0)
        |SELECT h.mon, count(*) AS n_items,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) *
        |    (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS BIGINT)
        |    AS revenue_c4
        |FROM lineitem l JOIN hot h
        |  ON CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate) AS INTEGER)
        |     = h.mon
        |GROUP BY 1""".stripMargin,

    "dd16_semantic_dedup" ->
      """WITH ex AS (SELECT vec_id, label, i,
        |       CAST(embedding[i+1] AS DOUBLE) AS x
        |     FROM embeddings, range(64) t(i)),
        |cent AS (SELECT label AS cell, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |vc AS (SELECT ex.vec_id, cent.cell,
        |         sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS ccos
        |       FROM ex JOIN cent ON ex.i = cent.i
        |       GROUP BY 1, 2),
        |assigned AS (SELECT vec_id, cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell)
        |      AS crk
        |  FROM vc) WHERE crk = 1)
        |SELECT a.vec_id AS v1, b.vec_id AS v2, CAST(a.cell AS BIGINT) AS cell
        |FROM assigned a JOIN assigned b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        |JOIN embeddings ea ON ea.vec_id = a.vec_id
        |JOIN embeddings eb ON eb.vec_id = b.vec_id
        |WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= 0.3"""
        .stripMargin,

    "tx32_rare_tokens" ->
      """WITH tk AS (SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(trim(text),' ')) AS tok
        |    FROM documents)),
        |df AS (SELECT tok, count(*) AS df FROM tk GROUP BY 1),
        |r AS (SELECT t.doc_id, t.tok, df.df,
        |        row_number() OVER (PARTITION BY t.doc_id
        |          ORDER BY df.df, t.tok) AS rk
        |      FROM tk t JOIN df USING (tok))
        |SELECT doc_id, rk, tok, df FROM r WHERE rk <= 3""".stripMargin,

    "ev36_peak_concurrency" ->
      s"""WITH s AS ($sessionizeSql),
         |seg0 AS (SELECT session_start, session_end,
         |    unnest(range(CAST(date_diff('day', CAST(session_start AS DATE),
         |      CAST(session_end AS DATE)) AS BIGINT) + 1)) AS i
         |  FROM s),
         |segs AS (SELECT
         |    CAST(session_start AS DATE) + CAST(i AS INTEGER) AS day,
         |    greatest(session_start,
         |      CAST(CAST(session_start AS DATE) + CAST(i AS INTEGER)
         |        AS TIMESTAMP)) AS seg_start,
         |    least(session_end,
         |      CAST(CAST(session_start AS DATE) + CAST(i AS INTEGER)
         |        AS TIMESTAMP) + INTERVAL 1 DAY - INTERVAL 1 SECOND)
         |      AS seg_end
         |  FROM seg0),
         |deltas AS (SELECT day, seg_start AS ts, 1 AS delta FROM segs
         |           UNION ALL
         |           SELECT day, seg_end + INTERVAL 1 SECOND, -1 FROM segs),
         |r AS (SELECT day, delta,
         |        sum(delta) OVER (PARTITION BY day ORDER BY ts, delta
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |      FROM deltas)
         |SELECT day, CAST(max(run) AS BIGINT) AS peak_concurrency,
         |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sessions
         |FROM r GROUP BY 1""".stripMargin,

    "sk09_heavy_hitters" ->
      """WITH tk AS (SELECT unnest(string_split(trim(text),' ')) AS tok
        |            FROM documents),
        |t AS (SELECT count(*) AS n_total FROM tk)
        |SELECT tok, count(*) AS n FROM tk, t
        |GROUP BY tok, n_total HAVING count(*) * 65 > n_total""".stripMargin,

    "pp13_pack_manifest" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(trim(text),' ')) AS BIGINT) AS n
        |  FROM documents),
        |o AS (SELECT doc_id, n,
        |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS off
        |  FROM t),
        |sp AS (SELECT doc_id, n, off, off // 2048 AS p0,
        |    (off + n - 1) // 2048 AS p1 FROM o),
        |x AS (SELECT doc_id, n, off, p0, p1,
        |    unnest(range(p0, p1 + 1)) AS pack_id FROM sp)
        |SELECT CAST(pack_id AS BIGINT) AS pack_id, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN p0 <> p1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_spanning_docs,
        |  CAST(sum(least(2048 * (pack_id + 1), off + n)
        |    - greatest(2048 * pack_id, off)) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM x GROUP BY 1""".stripMargin,

    "pp14_shard_plan" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(trim(text),' ')) AS BIGINT) AS n_tokens,
        |    list_sum(list_transform(range(0,4), k ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5('shard:' || CAST(doc_id AS VARCHAR)), k+1, 1)) - 1
        |        AS BIGINT) * (CAST(1 AS BIGINT) << (4*(3-k))))) % 16
        |      AS shard_id
        |  FROM documents),
        |g AS (SELECT shard_id, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_bytes
        |  FROM d GROUP BY 1)
        |SELECT CAST(shard_id AS BIGINT) AS shard_id, n_docs, n_tokens,
        |  n_bytes,
        |  CAST(n_tokens * 10000 // (SELECT sum(n_tokens) FROM g) AS BIGINT)
        |    AS load_bp
        |FROM g""".stripMargin,

    "pp15_quality_weighted" ->
      s"""WITH q AS ($qualityScoreSql),
         |d AS (SELECT doc_id, lang,
         |    CAST(len(string_split(trim(text),' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |j AS (SELECT d.lang, d.n_tokens, s.score,
         |    list_sum(list_transform(range(0,4), k ->
         |      CAST(strpos('0123456789abcdef',
         |        substr(md5('qw:' || CAST(d.doc_id AS VARCHAR)), k+1, 1)) - 1
         |        AS BIGINT) * (CAST(1 AS BIGINT) << (4*(3-k))))) AS draw
         |  FROM d JOIN q s ON d.doc_id = s.doc_id)
         |SELECT lang, count(*) AS n_candidates,
         |  CAST(sum(CASE WHEN draw < score * 65536 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN draw < score * 65536 THEN n_tokens ELSE 0 END)
         |    AS BIGINT) AS kept_tokens
         |FROM j GROUP BY 1""".stripMargin,

    "tx33_bpe_pairs" ->
      """WITH ww AS (SELECT unnest(string_split(trim(text),' ')) AS w
        |            FROM documents),
        |p AS (SELECT unnest(list_transform(range(1, len(w)),
        |    i -> substr(w, i, 2))) AS pair
        |  FROM ww WHERE len(w) >= 2)
        |SELECT pair, count(*) AS cnt FROM p GROUP BY 1
        |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "tx34_source_divergence" ->
      """WITH tk AS (SELECT source, unnest(string_split(trim(text),' '))
        |    AS tok FROM documents),
        |tot AS (SELECT count(*) AS c_tot FROM tk),
        |v AS (SELECT tok, count(*) AS c_cnt FROM tk GROUP BY 1
        |      ORDER BY c_cnt DESC, tok LIMIT 100),
        |vp AS (SELECT tok, CAST(c_cnt * 1000000 // c_tot AS BIGINT)
        |    AS ppm_c FROM v, tot),
        |st AS (SELECT source, count(*) AS n_tokens FROM tk GROUP BY 1),
        |sc AS (SELECT source, tok, count(*) AS s_cnt FROM tk
        |       WHERE tok IN (SELECT tok FROM v) GROUP BY 1, 2),
        |g AS (SELECT st.source, st.n_tokens, vp.tok, vp.ppm_c,
        |    CAST(coalesce(sc.s_cnt, 0) * 1000000 // st.n_tokens AS BIGINT)
        |      AS ppm_s
        |  FROM st CROSS JOIN vp
        |  LEFT JOIN sc ON sc.source = st.source AND sc.tok = vp.tok)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sum(abs(ppm_s - ppm_c)) AS BIGINT) AS tv_ppm
        |FROM g GROUP BY 1, 2""".stripMargin,

    "ev37_burst_days" ->
      """WITH dly AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n_events,
        |    CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |      AS sum_prev,
        |    CAST(count(n_events) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |      AS n_prev
        |  FROM dly)
        |SELECT event_type, day, n_events, n_prev, sum_prev
        |FROM w WHERE n_prev >= 3
        |  AND 20 * n_events * n_prev > 21 * sum_prev""".stripMargin,

    "ev38_linear_attribution" ->
      """WITH p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS t_user, ts AS t_ts, event_type AS channel
        |      FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.p_id, p.cents, t.channel FROM p LEFT JOIN t
        |      ON p.p_user = t.t_user AND t.t_ts <= p.p_ts
        |         AND t.t_ts > p.p_ts - INTERVAL 7 DAY),
        |c AS (SELECT p_id, cents, channel, count(channel) AS n_ch
        |      FROM j GROUP BY 1, 2, 3),
        |tt AS (SELECT p_id, CAST(sum(n_ch) AS BIGINT) AS n_tot
        |       FROM c GROUP BY 1),
        |cr AS (SELECT c.channel,
        |         c.n_ch * (1000000 // tt.n_tot) AS p_micro,
        |         c.n_ch * ((c.cents * 1000000) // tt.n_tot) AS r_micro
        |       FROM c JOIN tt ON c.p_id = tt.p_id WHERE c.n_ch > 0
        |       UNION ALL
        |       SELECT 'direct', 1000000, c.cents * 1000000
        |       FROM c JOIN tt ON c.p_id = tt.p_id WHERE tt.n_tot = 0)
        |SELECT channel, CAST(sum(p_micro) AS BIGINT) AS purchases_micro,
        |  CAST(sum(r_micro) AS BIGINT) AS revenue_micro
        |FROM cr GROUP BY 1""".stripMargin,

    "pp16_split_leakage" ->
      s"""WITH nd AS ($ngramJaccardSql),
         |sp AS (SELECT d1, d2,
         |    CASE substr(md5(CAST(d1 AS VARCHAR)), 1, 1)
         |      WHEN 'f' THEN 'test' WHEN 'e' THEN 'val' ELSE 'train'
         |    END AS s1,
         |    CASE substr(md5(CAST(d2 AS VARCHAR)), 1, 1)
         |      WHEN 'f' THEN 'test' WHEN 'e' THEN 'val' ELSE 'train'
         |    END AS s2
         |  FROM nd)
         |SELECT least(s1, s2) AS split_a, greatest(s1, s2) AS split_b,
         |  count(*) AS n_leaky_pairs,
         |  count(DISTINCT CASE WHEN s1 < s2 THEN d1 ELSE d2 END)
         |    AS n_docs_a,
         |  count(DISTINCT CASE WHEN s1 < s2 THEN d2 ELSE d1 END)
         |    AS n_docs_b
         |FROM sp WHERE s1 != s2 GROUP BY 1, 2""".stripMargin,

    "tx35_token_ids" ->
      """WITH c AS (SELECT unnest(string_split(trim(text),' ')) AS tok
        |           FROM documents),
        |cc AS (SELECT tok, count(*) AS cnt FROM c GROUP BY 1),
        |v AS (SELECT tok, id FROM (
        |  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS id
        |  FROM cc) WHERE id <= 256),
        |tk AS (SELECT doc_id, string_split(trim(text),' ') AS tks
        |       FROM documents),
        |f AS (SELECT doc_id, unnest(tks[1:16]) AS tok,
        |    unnest(range(1, least(len(tks), 16) + 1)) AS pos
        |  FROM tk),
        |j AS (SELECT f.doc_id, f.pos, coalesce(v.id, 0) AS tid
        |      FROM f LEFT JOIN v USING (tok))
        |SELECT doc_id,
        |  array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos), ',')
        |    AS token_ids
        |FROM j GROUP BY 1""".stripMargin,

    "q52_merge_clauses" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |mx AS (SELECT max(o_orderkey) AS mx FROM o),
        |ins AS (SELECT o.o_orderkey + mx.mx + 1 AS o_orderkey, o.cents
        |        FROM o, mx WHERE o.o_orderkey % 10 = 3),
        |kept AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 IN (1, 2)
        |      THEN cents + cents // 20 ELSE cents END AS cents
        |  FROM o WHERE o_orderkey % 10 != 0),
        |res AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
        |SELECT (SELECT count(*) FROM o) AS n_target,
        |  (SELECT count(*) FROM o WHERE o_orderkey % 10 = 0) AS n_deleted,
        |  (SELECT count(*) FROM o WHERE o_orderkey % 10 IN (1, 2))
        |    AS n_updated,
        |  (SELECT count(*) FROM ins) AS n_inserted,
        |  count(*) AS n_result,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM res""".stripMargin,

    "ss13_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe, label
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT qid, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qe, e.embedding) AS cos
        |      FROM q JOIN embeddings e
        |        ON e.vec_id != q.qid AND e.label = q.label),
        |r AS (SELECT qid, neighbor_id,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY cos DESC, neighbor_id) AS rk
        |      FROM c)
        |SELECT qid, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin,

    "mm10_cdc_chunks" ->
      """WITH t AS (SELECT doc_id, trim(text) AS tx FROM documents),
        |b AS (SELECT doc_id, tx,
        |    CASE WHEN length(tx) >= 8 THEN
        |      list_filter(range(8, length(tx) + 1),
        |        i -> substr(md5(substr(tx, i - 7, 8)), 1, 1) = '0')
        |    ELSE [] END AS bnds
        |  FROM t),
        |s AS (SELECT doc_id, tx,
        |    list_concat([1], list_transform(bnds, x -> x + 1)) AS starts,
        |    list_concat(bnds, [length(tx)]) AS ends
        |  FROM b),
        |c AS (SELECT doc_id, unnest(list_filter(
        |    list_transform(range(1, len(starts) + 1),
        |      j -> substr(tx, starts[j], ends[j] - starts[j] + 1)),
        |    ch -> length(ch) > 0)) AS chunk
        |  FROM s)
        |SELECT md5(chunk) AS chunk_md5, count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_occurrences
        |FROM c GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "mm12_dedup_savings" ->
      """WITH c AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)))
        |      AS chunk_idx
        |  FROM documents),
        |ck AS (SELECT doc_id,
        |    md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) AS chunk_md5,
        |    length(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64)) // 2
        |      AS chunk_bytes
        |  FROM c),
        |cs AS (SELECT ck.doc_id, ck.chunk_md5, ck.chunk_bytes, d.source
        |       FROM ck JOIN documents d USING (doc_id)),
        |own AS (SELECT chunk_md5, min(doc_id) AS doc_id,
        |          max(chunk_bytes) AS cb FROM cs GROUP BY 1),
        |osrc AS (SELECT o.chunk_md5, o.cb, d.source
        |         FROM own o JOIN documents d USING (doc_id)),
        |lg AS (SELECT source, count(*) AS n_chunks,
        |         CAST(sum(chunk_bytes) AS BIGINT) AS logical_bytes
        |       FROM cs GROUP BY 1),
        |uq AS (SELECT source, count(*) AS n_unique_chunks,
        |         CAST(sum(cb) AS BIGINT) AS unique_bytes
        |       FROM osrc GROUP BY 1)
        |SELECT lg.source, lg.n_chunks, lg.logical_bytes,
        |  CAST(coalesce(uq.n_unique_chunks, 0) AS BIGINT) AS n_unique_chunks,
        |  CAST(coalesce(uq.unique_bytes, 0) AS BIGINT) AS unique_bytes,
        |  CAST((lg.logical_bytes - coalesce(uq.unique_bytes, 0)) * 10000
        |    // lg.logical_bytes AS BIGINT) AS savings_bp
        |FROM lg LEFT JOIN uq USING (source)""".stripMargin,

    "pp26_mix_rebalance" ->
      """WITH src AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(trim(text),' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot,
        |        count(*) AS n_sources FROM src)
        |SELECT source, n_docs, tokens,
        |  CAST(tokens * 10000 // tot AS BIGINT) AS share_bp,
        |  CAST(tot // n_sources AS BIGINT) AS target_tokens,
        |  CAST((tot // n_sources) * 10000 // tokens AS BIGINT) AS factor_bp,
        |  CASE WHEN (tot // n_sources) * 10000 // tokens > 10000
        |         THEN 'oversample'
        |       WHEN (tot // n_sources) * 10000 // tokens < 10000
        |         THEN 'undersample'
        |       ELSE 'keep' END AS action
        |FROM src, t""".stripMargin,

    "ev50_user_diversity" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
        |           FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |        CAST(count(*) AS BIGINT) AS n_types,
        |        CAST(sum(c * (c - 1)) AS BIGINT) AS pair_sum
        |      FROM c GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |  CAST(CASE WHEN n_events < 2 THEN 0
        |       ELSE pair_sum * 10000 // (n_events * (n_events - 1))
        |       END AS BIGINT) AS simpson_bp
        |FROM u""".stripMargin,

    "tx45_bpe_merges" -> bpeMergesSql,

    "tx46_bpe_encode" -> bpeEncodeSql,

    "tx44_commonness" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text),' ')) AS tok
        |           FROM documents),
        |tot AS (SELECT count(*) AS tot FROM t),
        |f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
        |fp AS (SELECT tok, CAST(cnt * 1000000 // tot AS BIGINT) AS ppm
        |       FROM f, tot)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(ppm) // count(*) AS BIGINT) AS mean_ppm
        |FROM t JOIN fp USING (tok) GROUP BY 1""".stripMargin,

    "gr14_bfs_distances" ->
      s"""WITH RECURSIVE
         |pairs AS MATERIALIZED ($ngramJaccardSql),
         |bi AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |       UNION ALL SELECT d2, d1 FROM pairs),
         |reach(node, hops) AS (
         |  SELECT DISTINCT src AS node, 0 AS hops FROM bi WHERE src % 10 = 0
         |  UNION ALL
         |  SELECT DISTINCT bi.dst, r.hops + 1
         |  FROM reach r JOIN bi ON bi.src = r.node
         |  WHERE r.hops < 4)
         |SELECT node, CAST(min(hops) AS BIGINT) AS min_hops
         |FROM reach GROUP BY node""".stripMargin,

    "q53_recursive_cte" ->
      """WITH RECURSIVE
        |e0 AS (SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
        |       FROM lineitem x JOIN lineitem y
        |         ON x.l_orderkey = y.l_orderkey
        |        AND x.l_partkey < y.l_partkey),
        |edges AS (SELECT src, dst FROM e0
        |          UNION ALL
        |          SELECT dst AS src, src AS dst FROM e0),
        |reach(p, hops) AS (
        |  SELECT DISTINCT src AS p, 0 AS hops FROM edges WHERE src % 100 = 0
        |  UNION ALL
        |  SELECT DISTINCT e.dst, r.hops + 1
        |  FROM reach r JOIN edges e ON e.src = r.p
        |  WHERE r.hops < 2)
        |SELECT p, CAST(min(hops) AS BIGINT) AS min_hops
        |FROM reach GROUP BY p""".stripMargin,

    "q54_unpivot" ->
      """WITH w AS (SELECT o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS total_c
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM w
        |UNION ALL
        |SELECT o_orderpriority, 'n_customers', n_customers FROM w
        |UNION ALL
        |SELECT o_orderpriority, 'total_c', total_c FROM w""".stripMargin,

    "ev39_twap" ->
      """WITH g AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
        |    CAST(round(value * 100, 0) AS BIGINT) AS vc,
        |    lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS next_t
        |  FROM events),
        |i AS (SELECT user_id, vc, next_t - t_s AS dur_s
        |      FROM g WHERE next_t IS NOT NULL)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dur_s) AS BIGINT) AS held_s,
        |  CAST(sum(vc * dur_s) AS BIGINT) AS vsum_cs,
        |  CAST(sum(vc * dur_s) // sum(dur_s) AS BIGINT) AS twap_c
        |FROM i GROUP BY 1 HAVING sum(dur_s) > 0""".stripMargin,

    "ev40_ohlc" ->
      """WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    event_type, ts, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS vc FROM events),
        |w AS (SELECT day, event_type, vc,
        |    first_value(vc) OVER (PARTITION BY day, event_type
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS open_c,
        |    first_value(vc) OVER (PARTITION BY day, event_type
        |      ORDER BY ts DESC, event_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS close_c
        |  FROM e)
        |SELECT day, event_type, count(*) AS n_events, max(open_c) AS open_c,
        |  max(vc) AS high_c, min(vc) AS low_c, max(close_c) AS close_c
        |FROM w GROUP BY 1, 2""".stripMargin,

    "gr09_cluster_coeff" ->
      s"""WITH j AS ($ngramJaccardSql),
         |bi AS (SELECT d1 AS m, d2 AS n FROM j UNION ALL SELECT d2, d1 FROM j),
         |deg AS (SELECT m, count(*) AS degree FROM bi GROUP BY 1),
         |safe AS (SELECT bi.m, bi.n FROM bi JOIN deg USING (m)
         |         WHERE deg.degree <= 64),
         |tri AS (SELECT x.m, count(*) AS n_tri
         |        FROM safe x JOIN safe y ON x.m = y.m AND x.n < y.n
         |        JOIN j e ON e.d1 = x.n AND e.d2 = y.n
         |        GROUP BY 1)
         |SELECT d.m AS doc_id, CAST(d.degree AS BIGINT) AS degree,
         |  CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
         |  CAST(coalesce(t.n_tri, 0) * 2 * 1000000
         |       // (d.degree * (d.degree - 1)) AS BIGINT) AS coeff_ppm
         |FROM deg d LEFT JOIN tri t ON d.m = t.m
         |WHERE d.degree >= 2 AND d.degree <= 64""".stripMargin,

    "gr15_wedge_audit" ->
      s"""WITH j AS ($ngramJaccardSql),
         |bi AS (SELECT d1 AS m, d2 AS n FROM j UNION ALL SELECT d2, d1 FROM j),
         |deg AS (SELECT m, count(*) AS deg FROM bi GROUP BY 1)
         |SELECT
         |  CAST(coalesce(sum(CASE WHEN deg <= 64 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_centers_exact,
         |  CAST(coalesce(sum(CASE WHEN deg > 64 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_hubs,
         |  CAST(coalesce(sum(CASE WHEN deg <= 64
         |    THEN deg * (deg - 1) // 2 ELSE 0 END), 0)
         |    AS BIGINT) AS exact_wedges,
         |  CAST(coalesce(sum(CASE WHEN deg > 64
         |    THEN deg * (deg - 1) // 2 ELSE 0 END), 0)
         |    AS BIGINT) AS hub_wedges_skipped
         |FROM deg""".stripMargin,

    // q65's oracle computes from RAW lineitem — the hash match proves
    // the engine's MV reroute (SummaryRewrite) is lossless.
    "q65_mv_rewrite" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    // dd23's oracle restates the SEMANTICS (dd02-equivalent pairs
    // filtered to batch involvement, then the pp05 status rule) — the
    // bucket-restricted candidate generation is the ENGINE's cost
    // optimization, provably lossless for batch-involving pairs (any
    // such pair shares one of the batch's own buckets).
    "dd23_batch_dedup" -> {
      val jac = ngramJaccardSql
      s"""WITH j AS ($jac),
         |newdocs AS (SELECT doc_id FROM documents WHERE source = 'src0'),
         |sym AS (SELECT d1 AS a, d2 AS b FROM j
         |        UNION ALL SELECT d2 AS a, d1 AS b FROM j),
         |x AS (SELECT s.a AS doc_id, s.b AS partner, d.source AS psrc
         |      FROM sym s JOIN newdocs n ON s.a = n.doc_id
         |      JOIN documents d ON s.b = d.doc_id),
         |agg AS (SELECT doc_id,
         |    CAST(sum(CASE WHEN psrc != 'src0' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup_old,
         |    CAST(sum(CASE WHEN psrc = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup_new,
         |    max(CASE WHEN psrc = 'src0' AND partner < doc_id
         |        THEN 1 ELSE 0 END) AS prior
         |  FROM x GROUP BY 1)
         |SELECT n.doc_id,
         |  coalesce(a.n_dup_old, 0) AS n_dup_old,
         |  coalesce(a.n_dup_new, 0) AS n_dup_new,
         |  CASE WHEN coalesce(a.n_dup_old, 0) > 0 THEN 'dup_old'
         |       WHEN coalesce(a.prior, 0) = 1 THEN 'dup_new'
         |       ELSE 'kept' END AS status
         |FROM newdocs n LEFT JOIN agg a ON n.doc_id = a.doc_id""".stripMargin
    },

    "tx47_surprise" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |tot AS (SELECT count(*) AS c_tot FROM toks),
        |sn AS (SELECT tok,
        |    CAST(round(ln(c_tot * 1.0 / count(*)) * 1000000.0, 0) AS BIGINT)
        |      AS snat
        |  FROM toks CROSS JOIN tot GROUP BY tok, c_tot),
        |per_doc AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    CAST(sum(s.snat) // count(*) AS BIGINT) AS mean_surprise_unat
        |  FROM toks t JOIN sn s USING (tok) GROUP BY 1),
        |thr AS (SELECT
        |    quantile_disc(mean_surprise_unat, 1.0/3) AS t1,
        |    quantile_disc(mean_surprise_unat, 2.0/3) AS t2
        |  FROM per_doc)
        |SELECT doc_id, n_tokens, mean_surprise_unat,
        |  CASE WHEN mean_surprise_unat <= t1 THEN 'head'
        |       WHEN mean_surprise_unat <= t2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_band
        |FROM per_doc CROSS JOIN thr""".stripMargin,

    // gr16 runs two-star to CONVERGENCE, and the two-star fixed point
    // is the true component partition (label = component minimum), so
    // the oracle states the SEMANTICS — min reachable id via a
    // recursive CTE — instead of replaying the algorithm's rounds.
    "gr16_cc_twostar" ->
      """WITH RECURSIVE
        |e0 AS (SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
        |    FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |e AS (SELECT src, dst FROM e0
        |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |r AS (SELECT src AS node, src AS lbl FROM e
        |      UNION
        |      SELECT e.src AS node, r.lbl
        |      FROM e JOIN r ON r.node = e.dst)
        |SELECT node AS part_id, min(lbl) AS component_id
        |FROM r GROUP BY node""".stripMargin,

    "sk10_power_sums" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100, 0) AS BIGINT) // 100 AS vd FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(vd) AS BIGINT) AS s1,
        |  CAST(sum(vd * vd) AS BIGINT) AS s2,
        |  CAST(sum(vd * vd * vd) AS BIGINT) AS s3,
        |  CAST(sum(vd * vd * vd * vd) AS BIGINT) AS s4
        |FROM e GROUP BY 1""".stripMargin,

    "tx36_sentence_stats" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split_regex(trim(text), '[.!?]+'), x -> trim(x)),
        |      x -> regexp_matches(x, '[a-zA-Z0-9]')) AS sents
        |  FROM documents),
        |f AS (SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sentences,
        |    CAST(list_sum(list_transform(sents,
        |      x -> len(string_split_regex(x, ' +')))) AS BIGINT) AS n_words
        |  FROM t WHERE len(sents) > 0)
        |SELECT doc_id, n_sentences, n_words,
        |  CAST(n_words * 100 // n_sentences AS BIGINT) AS words_per_sent_x100
        |FROM f""".stripMargin,

    "ev41_locf" ->
      """SELECT event_id, user_id, event_type,
        |  coalesce(last_value(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100, 0) AS BIGINT) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
        |    AS last_purchase_c
        |FROM events""".stripMargin,

    "q55_variant" ->
      """WITH e AS (SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS INT) AS k,
        |    json_extract(props, '$.missing') AS absent
        |  FROM events)
        |SELECT event_type, k % 10 AS k_mod, count(*) AS n_events,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(sum(CASE WHEN absent IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_miss
        |FROM e GROUP BY 1, 2""".stripMargin,

    "q56_shuffle_hash_hint" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_price_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q57_try_ops" ->
      """WITH t AS (SELECT l_returnflag,
        |    CASE WHEN l_linenumber = 1 THEN NULL
        |         ELSE CAST(l_quantity AS BIGINT) / (l_linenumber - 1) END AS td,
        |    TRY_CAST(CASE WHEN l_linenumber = 1 THEN '42'
        |             ELSE l_returnflag END AS INT) AS tc,
        |    TRY_CAST(l_returnflag AS TIMESTAMP) AS tt
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN td IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_div_null,
        |  CAST(sum(CAST(floor(td) AS BIGINT)) AS BIGINT) AS div_floor_sum,
        |  CAST(sum(tc) AS BIGINT) AS cast_sum,
        |  CAST(sum(CASE WHEN tt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ts_null
        |FROM t GROUP BY 1""".stripMargin,

    "gr10_modularity" -> {
      val rounds = (1 to 5).map { k =>
        s"""l$k AS (SELECT l.node, least(l.lbl, min(nb.lbl)) AS lbl
           |  FROM l${k - 1} l JOIN e ON e.src = l.node
           |  JOIN l${k - 1} nb ON nb.node = e.dst
           |  GROUP BY l.node, l.lbl)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
         |    FROM lineitem x JOIN lineitem y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         |$rounds,
         |comp AS (SELECT node AS part_id, lbl AS component_id FROM l5),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
         |mm AS (SELECT count(*) AS m FROM e0),
         |ec AS (SELECT c1.component_id AS cid, count(*) AS intra
         |       FROM e0 JOIN comp c1 ON c1.part_id = e0.src
         |       JOIN comp c2 ON c2.part_id = e0.dst
         |       WHERE c1.component_id = c2.component_id GROUP BY 1),
         |dc AS (SELECT c.component_id AS cid,
         |       CAST(sum(d.deg) AS BIGINT) AS degree_sum,
         |       count(*) AS n_nodes
         |       FROM comp c JOIN deg d ON d.node = c.part_id GROUP BY 1)
         |SELECT dc.cid AS component_id, dc.n_nodes,
         |  CAST(coalesce(ec.intra, 0) AS BIGINT) AS intra_edges,
         |  dc.degree_sum,
         |  CAST(coalesce(ec.intra, 0) * 1000000 // m
         |    - (dc.degree_sum * dc.degree_sum // m) * 1000000 // (4 * m)
         |    AS BIGINT) AS q_ppm
         |FROM dc LEFT JOIN ec ON ec.cid = dc.cid CROSS JOIN mm""".stripMargin
    },

    "q58_map_surface" ->
      """WITH f AS (SELECT o_orderpriority, o_orderstatus, count(*) AS c
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_statuses,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN c END), 0)
        |    AS BIGINT) AS open_cnt,
        |  CAST(sum(c) AS BIGINT) AS total_cnt,
        |  CAST(sum(CASE WHEN c >= 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_big_statuses
        |FROM f GROUP BY 1""".stripMargin,

    "ev42_cusum_drift" ->
      """WITH dly AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n_events,
        |    CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS cum_events,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS day_idx,
        |    CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS total_events,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
        |  FROM dly)
        |SELECT event_type, day, n_events, cum_events,
        |  cum_events * n_days - day_idx * total_events AS dev,
        |  abs(cum_events * n_days - day_idx * total_events) * 20
        |    > total_events * n_days AS is_drift
        |FROM w""".stripMargin,

    "tx37_simpson" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
        |    AS tok FROM documents),
        |f AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        |a AS (SELECT doc_id,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep_pairs,
        |    CAST(sum(c) AS BIGINT) AS n_tokens
        |  FROM f GROUP BY 1)
        |SELECT doc_id, n_tokens, rep_pairs,
        |  CAST(rep_pairs * 1000000 // (n_tokens * (n_tokens - 1)) AS BIGINT)
        |    AS simpson_ppm
        |FROM a WHERE n_tokens >= 2""".stripMargin,

    "pp17_epoch_schedule" ->
      """WITH q AS (SELECT source,
        |    len(string_split(trim(text), ' ')) AS n_tokens,
        |    len(list_filter(string_split(trim(text), ' '),
        |      t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS stop_cnt
        |  FROM documents),
        |d AS (SELECT source, n_tokens,
        |    stop_cnt * 5000 // n_tokens
        |      + CASE WHEN n_tokens BETWEEN 5 AND 200 THEN 5000 ELSE 0 END
        |      AS q_bp
        |  FROM q),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    CAST(sum(q_bp) // count(*) AS BIGINT) AS mean_q_bp
        |  FROM d GROUP BY 1),
        |r AS (SELECT *, least(1 + mean_q_bp // 3000, 4) AS repeat_epochs,
        |    CAST(n_tokens * least(1 + mean_q_bp // 3000, 4) AS BIGINT)
        |      AS effective_tokens
        |  FROM s)
        |SELECT source, n_docs, n_tokens, mean_q_bp,
        |  CAST(repeat_epochs AS BIGINT) AS repeat_epochs, effective_tokens,
        |  CAST(effective_tokens * 10000
        |    // (SELECT sum(effective_tokens) FROM r) AS BIGINT) AS share_bp
        |FROM r""".stripMargin,

    "q59_sufficient_stats" ->
      """WITH g AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_discount * 10000, 0) AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |    CAST(sum(x * x) AS BIGINT) AS sum_xx,
        |    CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |    CAST(sum(y * y) AS BIGINT) AS sum_yy
        |  FROM g GROUP BY 1)
        |SELECT l_returnflag, n, sum_x, sum_y, sum_xx, sum_xy, sum_yy,
        |  CAST(sign(n * sum_xy - sum_x * sum_y) AS BIGINT) AS cov_sign
        |FROM a""".stripMargin,

    "q60_nullsafe_join" ->
      """WITH c AS (SELECT nullif(c_mktsegment, 'BUILDING') AS nseg,
        |    c_acctbal FROM customer),
        |d AS (SELECT nseg AS dim_nseg,
        |    CAST(sum(round(c_acctbal * 100, 0)) AS BIGINT) AS seg_bal_cents
        |  FROM c GROUP BY 1)
        |SELECT c.nseg, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(max(seg_bal_cents) AS BIGINT) AS seg_bal_cents
        |FROM c JOIN d ON c.nseg IS NOT DISTINCT FROM d.dim_nseg
        |GROUP BY 1""".stripMargin,

    "ev43_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |mx AS (SELECT max(day) AS max_day FROM days),
        |runs AS (SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INTEGER) AS anchor
        |  FROM days),
        |st AS (SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak_len,
        |    max(day) AS streak_end FROM runs GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(streak_len) AS BIGINT) AS n_active_days,
        |  CAST(max(streak_len) AS BIGINT) AS longest_streak,
        |  CAST(max(CASE WHEN streak_end = max_day THEN streak_len
        |    ELSE 0 END) AS BIGINT) AS current_streak
        |FROM st CROSS JOIN mx GROUP BY 1""".stripMargin,

    "dd17_prefix_dups" ->
      """SELECT a.doc_id AS short_id, b.doc_id AS long_id,
        |  CAST(length(a.text) AS BIGINT) AS short_len,
        |  CAST(length(b.text) AS BIGINT) AS long_len
        |FROM documents a JOIN documents b
        |  ON substr(a.text, 1, 16) = substr(b.text, 1, 16)
        |  AND length(a.text) >= 16
        |  AND length(b.text) > length(a.text)
        |  AND substr(b.text, 1, CAST(length(a.text) AS INTEGER)) = a.text""".stripMargin,

    "pp18_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |kept AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' (rev 2)' ELSE text END
        |      AS text
        |  FROM v1 WHERE doc_id % 17 <> 0),
        |added AS (SELECT doc_id + 10000000 AS doc_id,
        |    'added snapshot doc ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM v1 WHERE doc_id % 23 = 0),
        |v2 AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
        |j AS (SELECT md5(a.text) AS h1, md5(b.text) AS h2,
        |    length(a.text) AS chars1, length(b.text) AS chars2
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT CASE WHEN h1 IS NULL THEN 'added'
        |    WHEN h2 IS NULL THEN 'removed'
        |    WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS status,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(chars1, 0)) AS BIGINT) AS chars_v1,
        |  CAST(sum(coalesce(chars2, 0)) AS BIGINT) AS chars_v2
        |FROM j GROUP BY 1""".stripMargin,

    "tx38_readability" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS w,
        |    CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |      x -> trim(x) != '')) AS BIGINT) AS sr,
        |    CAST(len(regexp_split_to_array(lower(text), '[aeiou]+')) - 1
        |      AS BIGINT) AS v
        |  FROM documents),
        |c AS (SELECT doc_id, w, greatest(sr, 1) AS sn, v FROM b
        |  WHERE w >= 1)
        |SELECT doc_id, w AS n_words, sn AS n_sents, v AS n_vowel_runs,
        |  CASE WHEN 206835 * sn * w - 1015 * w * w - 84600 * v * sn
        |      >= 60000 * sn * w THEN 'easy'
        |    WHEN 206835 * sn * w - 1015 * w * w - 84600 * v * sn
        |      >= 30000 * sn * w THEN 'medium'
        |    ELSE 'hard' END AS band
        |FROM c""".stripMargin,

    "gr11_assortativity" ->
      s"""WITH j AS ($ngramJaccardSql),
         |bi AS (SELECT d1 AS src, d2 AS dst FROM j
         |       UNION ALL SELECT d2, d1 FROM j),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM bi GROUP BY 1),
         |p AS (SELECT dx.deg AS x, dy.deg AS y FROM bi
         |      JOIN deg dx ON bi.src = dx.node
         |      JOIN deg dy ON bi.dst = dy.node),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sum_x,
         |    CAST(sum(y) AS BIGINT) AS sum_y,
         |    CAST(sum(x * x) AS BIGINT) AS sum_xx,
         |    CAST(sum(x * y) AS BIGINT) AS sum_xy,
         |    CAST(sum(y * y) AS BIGINT) AS sum_yy
         |  FROM p)
         |SELECT n, sum_x, sum_y, sum_xx, sum_xy, sum_yy,
         |  CAST(sign(n * sum_xy - sum_x * sum_y) AS BIGINT) AS cov_sign
         |FROM a""".stripMargin,

    "ev44_pareto" ->
      """WITH uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total_users,
        |    CAST(sum(c) AS BIGINT) AS total_events FROM uc),
        |r AS (SELECT c,
        |    CAST(sum(c) OVER (ORDER BY c DESC, user_id) AS BIGINT) AS cum,
        |    CAST(row_number() OVER (ORDER BY c DESC, user_id) AS BIGINT)
        |      AS rn
        |  FROM uc)
        |SELECT total_users, total_events,
        |  CAST(min(CASE WHEN 5 * cum >= 4 * total_events THEN rn END)
        |    AS BIGINT) AS users_p80,
        |  CAST(min(CASE WHEN 5 * cum >= 4 * total_events THEN rn END)
        |    * 10000 // total_users AS BIGINT) AS top_share_bp
        |FROM r CROSS JOIN t GROUP BY 1, 2""".stripMargin,

    "mm11_placement" ->
      """WITH c AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0)
        |      AS BIGINT))) AS chunk_idx
        |  FROM documents),
        |ch AS (SELECT
        |    md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64))
        |      AS chunk_md5,
        |    CAST(length(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64))
        |      // 2 AS BIGINT) AS chunk_bytes
        |  FROM c),
        |u AS (SELECT chunk_md5, max(chunk_bytes) AS chunk_bytes
        |      FROM ch GROUP BY 1),
        |p AS (SELECT chunk_md5, chunk_bytes, unnest(range(16)) AS node
        |      FROM u),
        |r AS (SELECT chunk_md5, chunk_bytes, node,
        |    md5(chunk_md5 || '#' || CAST(node AS VARCHAR)) AS score
        |  FROM p),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY chunk_md5
        |    ORDER BY score DESC, node) AS rk FROM r)
        |SELECT CAST(node AS BIGINT) AS node,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_primary,
        |  CAST(sum(chunk_bytes) AS BIGINT) AS total_bytes
        |FROM rk WHERE rk <= 3 GROUP BY 1""".stripMargin,

    "ev45_markov" ->
      """WITH t AS (SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |tr AS (SELECT prev_type, event_type AS next_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_n
        |       FROM tr GROUP BY 1),
        |m AS (SELECT tr.prev_type AS src, next_type AS dst,
        |    CAST(n * 1000000 // row_n AS BIGINT) AS m_ppm
        |  FROM tr JOIN rt USING (prev_type)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM events),
        |v0 AS (SELECT event_type,
        |    CAST(count(*) * 1000000 // (SELECT tot FROM tot) AS BIGINT)
        |      AS v_ppm
        |  FROM events GROUP BY 1),
        |v1 AS (SELECT dst AS event_type,
        |    CAST(sum(v_ppm * m_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v0 JOIN m ON v0.event_type = m.src GROUP BY 1),
        |v2 AS (SELECT dst AS event_type,
        |    CAST(sum(v_ppm * m_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v1 JOIN m ON v1.event_type = m.src GROUP BY 1),
        |v3 AS (SELECT dst AS event_type,
        |    CAST(sum(v_ppm * m_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v2 JOIN m ON v2.event_type = m.src GROUP BY 1),
        |v4 AS (SELECT dst AS event_type,
        |    CAST(sum(v_ppm * m_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v3 JOIN m ON v3.event_type = m.src GROUP BY 1),
        |v5 AS (SELECT dst AS event_type,
        |    CAST(sum(v_ppm * m_ppm) // 1000000 AS BIGINT) AS v_ppm
        |  FROM v4 JOIN m ON v4.event_type = m.src GROUP BY 1)
        |SELECT v0.event_type, v0.v_ppm AS v0_ppm, v5.v_ppm AS v5_ppm,
        |  v5.v_ppm - v0.v_ppm AS drift_ppm
        |FROM v0 JOIN v5 USING (event_type)""".stripMargin,

    "pp19_token_budget" ->
      """WITH s AS (SELECT source,
        |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM s),
        |q AS (SELECT source, n_tokens,
        |    CAST(1000000 * n_tokens // t AS BIGINT) AS base,
        |    CAST((1000000 * n_tokens) % t AS BIGINT) AS rem
        |  FROM s CROSS JOIN t),
        |d AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS deficit
        |      FROM q),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
        |      AS BIGINT) AS rk FROM q)
        |SELECT source, n_tokens,
        |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_tokens
        |FROM r CROSS JOIN d""".stripMargin,

    "tx39_bigram_lift" ->
      """WITH tk AS (SELECT unnest(string_split(trim(text), ' ')) AS tok
        |            FROM documents),
        |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
        |        FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM tk),
        |t AS (SELECT string_split(trim(text), ' ') AS a FROM documents
        |      WHERE len(string_split(trim(text), ' ')) >= 2),
        |pr AS (SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT)
        |      AS c_xy
        |  FROM (SELECT unnest(list_transform(range(1, len(a)),
        |        i -> [a[i], a[i+1]])) AS p FROM t)
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT w1, w2, c_xy,
        |  CAST(c_xy * n_tokens * 1000000 // (ux.c * uy.c) AS BIGINT)
        |    AS lift_ppm
        |FROM pr JOIN uni ux ON pr.w1 = ux.tok
        |JOIN uni uy ON pr.w2 = uy.tok CROSS JOIN tot
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 20""".stripMargin,

    "q61_percentile_disc" ->
      """SELECT l_returnflag,
        |  CAST(quantile_disc(l_quantity, 0.25) AS BIGINT) AS p25_qty,
        |  CAST(quantile_disc(l_quantity, 0.5) AS BIGINT) AS p50_qty,
        |  CAST(quantile_disc(l_quantity, 0.75) AS BIGINT) AS p75_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,

    "ev46_alert_episodes" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS total,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_days
        |  FROM daily),
        |hot AS (SELECT event_type, day,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM w WHERE n_events * 5 * n_days > total * 6),
        |runs AS (SELECT event_type, day - CAST(rn AS INTEGER) AS anchor,
        |    CAST(count(*) AS BIGINT) AS run_len
        |  FROM hot GROUP BY 1, 2),
        |ep AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_episodes,
        |    CAST(sum(run_len) AS BIGINT) AS alert_days,
        |    CAST(max(run_len) AS BIGINT) AS longest_episode
        |  FROM runs WHERE run_len >= 3 GROUP BY 1)
        |SELECT t.event_type,
        |  CAST(coalesce(n_episodes, 0) AS BIGINT) AS n_episodes,
        |  CAST(coalesce(alert_days, 0) AS BIGINT) AS alert_days,
        |  CAST(coalesce(longest_episode, 0) AS BIGINT) AS longest_episode
        |FROM (SELECT DISTINCT event_type FROM events) t
        |LEFT JOIN ep USING (event_type)""".stripMargin,

    "tx40_skipgrams" ->
      """WITH t AS (SELECT string_split(trim(text), ' ') AS a
        |           FROM documents),
        |p AS (SELECT unnest(list_concat(
        |    list_transform(range(1, len(a)), i -> [a[i], a[i+1]]),
        |    list_transform(range(1, len(a) - 1), i -> [a[i], a[i+2]])))
        |      AS pr
        |  FROM t WHERE len(a) >= 2)
        |SELECT pr[1] AS w1, pr[2] AS w2, CAST(count(*) AS BIGINT) AS n_cooc
        |FROM p GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY n_cooc DESC, w1, w2 LIMIT 20""".stripMargin,

    "gr12_coengagement" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT x.event_type AS t1, y.event_type AS t2,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM ut x JOIN ut y
        |  ON x.user_id = y.user_id AND x.event_type < y.event_type
        |GROUP BY 1, 2""".stripMargin,

    "dd18_winnowing" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS tk
        |           FROM documents
        |           WHERE len(string_split(trim(text), ' ')) >= 6),
        |g AS (SELECT doc_id, list_transform(range(1, len(tk) - 1),
        |        i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
        |          AS grams
        |      FROM t),
        |f AS (SELECT doc_id, unnest(list_distinct(
        |        list_transform(range(1, len(grams) - 2),
        |          j -> list_min(grams[j:j+3])))) AS fp
        |      FROM g)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "ev47_growth_accounting" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |st AS (SELECT user_id, week,
        |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_w,
        |    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_w
        |  FROM uw),
        |bw AS (SELECT week,
        |    CAST(sum(CASE WHEN prev_w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(sum(CASE WHEN prev_w = week - 7 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN prev_w IS NOT NULL AND prev_w < week - 7
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM st GROUP BY 1),
        |mx AS (SELECT max(week) AS max_week FROM uw),
        |ch AS (SELECT week + 7 AS week, CAST(count(*) AS BIGINT)
        |      AS n_churned
        |  FROM st CROSS JOIN mx
        |  WHERE (next_w IS NULL OR next_w > week + 7)
        |    AND week + 7 <= max_week
        |  GROUP BY 1)
        |SELECT coalesce(bw.week, ch.week) AS week,
        |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
        |  CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
        |  CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
        |FROM bw FULL OUTER JOIN ch ON bw.week = ch.week""".stripMargin,

    "ev48_autocorr" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS lag_k, x,
        |    lead(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM daily
        |  UNION ALL
        |  SELECT event_type, CAST(7 AS BIGINT), x,
        |    lead(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM daily),
        |f AS (SELECT * FROM l WHERE y IS NOT NULL),
        |a AS (SELECT event_type, lag_k, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |    CAST(sum(x * x) AS BIGINT) AS sum_xx,
        |    CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |    CAST(sum(y * y) AS BIGINT) AS sum_yy
        |  FROM f GROUP BY 1, 2)
        |SELECT event_type, lag_k, n_pairs, sum_x, sum_y, sum_xx, sum_xy,
        |  sum_yy,
        |  CAST(sign(n_pairs * sum_xy - sum_x * sum_y) AS BIGINT) AS cov_sign
        |FROM a""".stripMargin,

    "dd19_bow_dedup" ->
      """SELECT md5(list_aggregate(list_sort(string_split(trim(text), ' ')),
        |    'string_agg', ' ')) AS bow_hash,
        |  min(doc_id) AS keeper_id,
        |  CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(count(DISTINCT md5(lower(trim(text)))) AS BIGINT)
        |    AS n_exact_forms
        |FROM documents
        |GROUP BY 1""".stripMargin,

    "pp20_refresh_set" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |kept AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' (rev 2)' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 17 <> 0),
        |added AS (SELECT doc_id + 10000000 AS doc_id,
        |    'refresh' AS source,
        |    'added snapshot doc ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM v1 WHERE doc_id % 23 = 0),
        |v2 AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
        |cand AS (SELECT v2.* FROM v2 LEFT JOIN v1 ON v2.doc_id = v1.doc_id
        |  WHERE v1.doc_id IS NULL OR md5(v2.text) <> md5(v1.text)),
        |bow AS (SELECT *, md5(list_aggregate(
        |    list_sort(string_split(trim(text), ' ')), 'string_agg', ' '))
        |      AS bow_hash FROM cand),
        |bk AS (SELECT bow_hash, min(doc_id) AS keeper_id
        |       FROM bow GROUP BY 1),
        |staged AS (SELECT bow.*, bow.doc_id <> bk.keeper_id AS bow_dropped
        |  FROM bow JOIN bk USING (bow_hash)),
        |longs AS (SELECT substr(text, 1, 16) AS p16, doc_id AS long_id,
        |    text AS long_text
        |  FROM v2 WHERE length(text) >= 16),
        |pd AS (SELECT DISTINCT s.doc_id FROM staged s JOIN longs l
        |    ON substr(s.text, 1, 16) = l.p16 AND l.long_id <> s.doc_id
        |    AND length(s.text) >= 16
        |    AND length(l.long_text) > length(s.text)
        |    AND substr(l.long_text, 1, CAST(length(s.text) AS INTEGER))
        |      = s.text),
        |m AS (SELECT s.source, s.bow_dropped,
        |    (NOT s.bow_dropped) AND (pd.doc_id IS NOT NULL)
        |      AS prefix_dropped,
        |    CAST(len(string_split(trim(s.text), ' ')) AS BIGINT) AS w,
        |    greatest(CAST(len(list_filter(
        |      regexp_split_to_array(s.text, '[.!?]+'),
        |      x -> trim(x) != '')) AS BIGINT), 1) AS sn,
        |    CAST(len(regexp_split_to_array(lower(s.text), '[aeiou]+')) - 1
        |      AS BIGINT) AS v
        |  FROM staged s LEFT JOIN pd ON s.doc_id = pd.doc_id),
        |f AS (SELECT source, bow_dropped, prefix_dropped, w,
        |    (206835 * sn * w - 1015 * w * w - 84600 * v * sn
        |      < 30000 * sn * w) AS is_hard
        |  FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN bow_dropped THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bow_dropped,
        |  CAST(sum(CASE WHEN prefix_dropped THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_prefix_dropped,
        |  CAST(sum(CASE WHEN NOT bow_dropped AND NOT prefix_dropped
        |    AND is_hard THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
        |  CAST(sum(CASE WHEN NOT bow_dropped AND NOT prefix_dropped
        |    AND NOT is_hard THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN NOT bow_dropped AND NOT prefix_dropped
        |    AND NOT is_hard THEN w ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM f GROUP BY 1""".stripMargin,

    "sk11_bootstrap" ->
      s"""WITH w AS (SELECT event_type, event_id,
         |    CAST(round(value * 100, 0) AS BIGINT) // 100 AS vd
         |  FROM events),
         |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(vd) AS BIGINT) AS point_sum,
         |    $bootstrapRepSql
         |  FROM w GROUP BY 1)
         |SELECT event_type, n, point_sum,
         |  CAST(least($bootstrapRepList) AS BIGINT) AS rep_min,
         |  CAST(greatest($bootstrapRepList) AS BIGINT) AS rep_max,
         |  CAST(greatest($bootstrapRepList)
         |    - least($bootstrapRepList) AS BIGINT) AS spread
         |FROM a""".stripMargin,

    "q62_only_late_supplier" ->
      """WITH f AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |         THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |po AS (SELECT ok, count(DISTINCT sk) AS n_supps,
        |    count(DISTINCT CASE WHEN late = 1 THEN sk END) AS n_late,
        |    max(CASE WHEN late = 1 THEN sk END) AS late_supp
        |  FROM f GROUP BY 1)
        |SELECT late_supp AS s_suppkey,
        |  CAST(count(*) AS BIGINT) AS n_blocked_orders, s_name
        |FROM po JOIN supplier ON late_supp = s_suppkey
        |WHERE n_supps >= 2 AND n_late = 1
        |GROUP BY 1, 3
        |ORDER BY n_blocked_orders DESC, s_suppkey LIMIT 10""".stripMargin,

    "gr13_hits" -> hitsSql,

    "ev49_browse_no_buy" ->
      """WITH ud AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM events GROUP BY 1, 2),
        |dy AS (SELECT day,
        |    CAST(sum(CASE WHEN v = 1 AND c = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS engaged,
        |    CAST(sum(CASE WHEN v = 1 AND c = 1 AND b = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS abandoned
        |  FROM ud GROUP BY 1)
        |SELECT day, engaged, abandoned,
        |  CAST(CASE WHEN engaged = 0 THEN 0
        |       ELSE abandoned * 1000000 // engaged END AS BIGINT)
        |    AS abandon_ppm
        |FROM dy""".stripMargin,

    "pp22_sequence_packing" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok,
        |    ('0x' || substring(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS draw
        |  FROM documents),
        |b AS (SELECT source, n_tok,
        |    CAST((sum(n_tok) OVER (PARTITION BY source ORDER BY draw, doc_id
        |       ROWS UNBOUNDED PRECEDING) - n_tok) // 512 AS BIGINT) AS bin_id
        |  FROM t)
        |SELECT source, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        |FROM b GROUP BY 1, 2""".stripMargin,

    // mm13: interleaved multimodal packing — pp22's prefix-sum rule on
    // the COMBINED text+media cost; all integer.
    "mm13_interleave_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok,
        |    CAST(n_chars // 96 AS BIGINT) AS n_media
        |  FROM documents),
        |c AS (SELECT *, n_tok + 64 * n_media AS cost FROM t),
        |b AS (SELECT source, n_tok, n_media,
        |    CAST((sum(cost) OVER (PARTITION BY source ORDER BY doc_id
        |       ROWS UNBOUNDED PRECEDING) - cost) // 2048 AS BIGINT) AS bin_id
        |  FROM c)
        |SELECT source, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS text_tokens,
        |  CAST(sum(n_media) AS BIGINT) AS n_media,
        |  CAST(sum(n_media) * 64 AS BIGINT) AS media_tokens,
        |  CAST((sum(n_tok) + sum(n_media) * 64) * 10000 // 2048 AS BIGINT)
        |    AS fill_bp
        |FROM b GROUP BY 1, 2""".stripMargin,

    "pp23_weighted_sample" ->
      """WITH tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tot_w
        |             FROM documents)
        |SELECT doc_id, n_chars,
        |  ('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |    ::BIGINT AS draw
        |FROM documents, tot
        |WHERE ('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |    ::BIGINT * tot_w < 100 * n_chars * 4294967296""".stripMargin,

    "tx42_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS tk
        |           FROM documents
        |           WHERE len(string_split(trim(text),' ')) >= 8),
        |w AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(tk)-8+2),
        |         i -> md5(array_to_string(list_slice(tk, i, i+7), ' '))))) AS sh
        |      FROM t),
        |own AS (SELECT sh, min(doc_id) AS first_doc FROM w GROUP BY 1)
        |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN own.first_doc = w.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN own.first_doc = w.doc_id THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS novel_ppm
        |FROM w JOIN own USING (sh)
        |GROUP BY 1""".stripMargin,

    "tx43_signal_sweep" ->
      """WITH x AS (SELECT doc_id, n_chars, trim(text) AS t,
        |    string_split(trim(text), ' ') AS tk
        |  FROM documents),
        |y AS (SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
        |    CAST(len(list_filter(tk, w -> w IN
        |      ('the','a','of','and','to','in'))) AS BIGINT) AS stop_cnt,
        |    CAST(len(regexp_replace(t, '[a-z0-9 ]', '', 'g')) AS BIGINT)
        |      AS punct_cnt,
        |    CAST(least(3, n_chars // 150) AS BIGINT) AS len_band,
        |    ('0x' || substring(md5(t), 1, 8))::BIGINT AS fp
        |  FROM x)
        |SELECT doc_id, n_tokens, n_distinct, stop_cnt, punct_cnt,
        |  len_band, fp,
        |  CAST(n_distinct * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
        |  CAST(CASE WHEN n_tokens BETWEEN 5 AND 200
        |       AND stop_cnt * 10 >= n_tokens THEN 1 ELSE 0 END AS BIGINT)
        |    AS kept
        |FROM y""".stripMargin,

    "q64_auto_salt" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS qty_c2,
        |  CAST(min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS min_price_c2,
        |  CAST(max(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS max_price_c2
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q63_lead_time_sla" ->
      """WITH l AS (SELECT o_orderpriority,
        |    CAST(date_diff('day', o_orderdate, max(l_shipdate)) AS BIGINT)
        |      AS lead_days
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY o_orderkey, o_orderpriority, o_orderdate),
        |r AS (SELECT o_orderpriority, lead_days,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY lead_days) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM l)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_orders,
        |  min(lead_days) AS min_days, max(lead_days) AS max_days,
        |  CAST(sum(CASE WHEN rn = (50*(n-1)) // 100 + 1
        |      THEN lead_days * (100 - (50*(n-1)) % 100) ELSE 0 END)
        |    + sum(CASE WHEN rn = (50*(n-1)+99) // 100 + 1
        |      THEN lead_days * ((50*(n-1)) % 100) ELSE 0 END) AS BIGINT)
        |    AS p50_cd,
        |  CAST(sum(CASE WHEN rn = (90*(n-1)) // 100 + 1
        |      THEN lead_days * (100 - (90*(n-1)) % 100) ELSE 0 END)
        |    + sum(CASE WHEN rn = (90*(n-1)+99) // 100 + 1
        |      THEN lead_days * ((90*(n-1)) % 100) ELSE 0 END) AS BIGINT)
        |    AS p90_cd
        |FROM r GROUP BY o_orderpriority""".stripMargin,

    "dd21_semantic_clusters" -> {
      val rounds = (1 to 5).map { k =>
        s"""l$k AS (SELECT l.node, least(l.lbl, min(nb.lbl)) AS lbl
           |  FROM l${k - 1} l JOIN e ON e.src = l.node
           |  JOIN l${k - 1} nb ON nb.node = e.dst
           |  GROUP BY l.node, l.lbl)""".stripMargin
      }.mkString(",\n")
      s"""WITH p AS (SELECT a.vec_id AS v1, b.vec_id AS v2
         |    FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3),
         |e AS (SELECT v1 AS src, v2 AS dst FROM p
         |      UNION ALL SELECT v2 AS src, v1 AS dst FROM p),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         |$rounds
         |SELECT node AS vec_id, lbl AS cluster_id FROM l5""".stripMargin
    },

    // dd22: the window inverted index, the duplicated-window semi-join,
    // and the q35-style island merge all replay on exact integers; the
    // md5 window key is byte-identical on both engines (UTF-8 text).
    "dd22_span_dedup" ->
      """WITH tt AS (SELECT doc_id, string_split(trim(text), ' ') AS tk
        |    FROM documents),
        |tw AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens
        |       FROM tt WHERE len(tk) >= 8),
        |wins AS (SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS i,
        |         md5(array_to_string(tk[i:i+7], ' ')) AS wh
        |       FROM tw, unnest(range(1, len(tk) - 6)) AS u(i)),
        |dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
        |st AS (SELECT w.doc_id, w.n_tokens, w.i
        |       FROM wins w JOIN dup USING (wh)),
        |pe AS (SELECT doc_id, n_tokens, i,
        |         max(i + 7) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_end
        |       FROM st),
        |isl AS (SELECT doc_id, n_tokens, i,
        |         sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1
        |             THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY i) AS span_id
        |        FROM pe),
        |sp AS (SELECT doc_id, n_tokens, span_id,
        |         min(i) AS s0, max(i + 7) AS e0
        |       FROM isl GROUP BY 1, 2, 3)
        |SELECT doc_id, n_tokens, count(*) AS n_spans,
        |  CAST(sum(e0 - s0 + 1) AS BIGINT) AS tokens_removed,
        |  CAST(sum(e0 - s0 + 1) AS BIGINT) * 10000 // n_tokens
        |    AS removed_bp
        |FROM sp GROUP BY doc_id, n_tokens""".stripMargin,

    "pp25_k_anonymity" ->
      """WITH qi AS (SELECT c_nationkey, c_mktsegment,
        |    (CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) // 100000
        |      AS bal_band
        |  FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, bal_band,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM qi GROUP BY 1, 2, 3)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(k * count(*) AS BIGINT) AS n_rows,
        |  CAST(CASE WHEN k < 5 THEN 1 ELSE 0 END AS BIGINT)
        |    AS re_identifiable
        |FROM g GROUP BY k""".stripMargin,

    "pp24_run_manifest" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok,
        |    ('0x' || substring(md5(trim(text)), 1, 8))::BIGINT
        |      % 2147483648 AS fp
        |  FROM documents),
        |j AS (SELECT d.*, e.vec_id FROM d
        |      LEFT JOIN embeddings e ON d.doc_id = e.vec_id)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(fp) AS BIGINT) AS content_checksum,
        |  CAST(sum(CASE WHEN vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_with_embedding
        |FROM j GROUP BY ROLLUP (source)""".stripMargin,

    "pp21_curriculum" ->
      """WITH x AS (SELECT doc_id,
        |    CAST(least(3, n_chars // 150) AS BIGINT) AS band,
        |    ('0x' || substring(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS draw
        |  FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY band, draw, doc_id)
        |    AS BIGINT) AS position,
        |  doc_id, band, draw
        |FROM x ORDER BY position LIMIT 100""".stripMargin,

    // pp37: the oracle REBUILDS the truncated postings from scratch on
    // the purged corpus — a hash match against Spark's incremental
    // patch (pass-through unaffected terms + re-derive affected) is a
    // cross-engine proof that patch ≡ rebuild. Membership replays the
    // planted batch the PurgeLedger round-trips (doc_id % 97).
    "pp37_patch_postings" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
        |             AS tok FROM documents WHERE doc_id % 97 <> 0),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2)
        |SELECT tok, doc_id, tf FROM (
        |    SELECT tok, doc_id, tf, row_number() OVER (PARTITION BY tok
        |      ORDER BY tf DESC, doc_id) AS prk FROM tf) z
        |WHERE prk <= 64""".stripMargin,

    // pp41: the oracle is the FULL-corpus postings build — Spark folds
    // the src0 arrival batch into the standing (non-src0) index by
    // touched-terms-only re-derivation; hash match proves
    // upsert ≡ rebuild.
    "pp41_index_upsert" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
        |             AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2)
        |SELECT tok, doc_id, tf FROM (
        |    SELECT tok, doc_id, tf, row_number() OVER (PARTITION BY tok
        |      ORDER BY tf DESC, doc_id) AS prk FROM tf) z
        |WHERE prk <= 64""".stripMargin,

    // mm15: chunk-level purge reclaim — deletable vs retained_shared
    // classification of every chunk the tombstone batch references,
    // replayed over the proven mm03 chunk grid with the planted batch.
    "mm15_purge_chunks" ->
      """WITH c AS (SELECT doc_id,
        |    md5(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64))
        |      AS chunk_md5,
        |    CAST(length(substr(hx, CAST(chunk_idx*64 + 1 AS BIGINT), 64))
        |      // 2 AS BIGINT) AS chunk_bytes
        |  FROM (SELECT doc_id, hex(encode(text)) AS hx,
        |          unnest(range(CAST(ceil(octet_length(encode(text)) / 32.0)
        |            AS BIGINT))) AS chunk_idx
        |        FROM documents)),
        |pc AS (SELECT DISTINCT chunk_md5 FROM c WHERE doc_id % 97 = 0),
        |ar AS (SELECT c.chunk_md5, c.chunk_bytes,
        |         CASE WHEN c.doc_id % 97 = 0 THEN 0 ELSE 1 END AS survivor
        |       FROM c JOIN pc ON pc.chunk_md5 = c.chunk_md5),
        |cls AS (SELECT chunk_md5, CAST(max(chunk_bytes) AS BIGINT)
        |          AS chunk_bytes,
        |          max(survivor) AS has_survivor,
        |          CAST(count(*) AS BIGINT) AS n_refs
        |        FROM ar GROUP BY 1)
        |SELECT CASE WHEN has_survivor = 1 THEN 'retained_shared'
        |       ELSE 'deletable' END AS status,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(n_refs) AS BIGINT) AS n_refs,
        |  CAST(sum(chunk_bytes) AS BIGINT) AS n_bytes
        |FROM cls GROUP BY 1""".stripMargin,

    // pp44: the oracle rebuilds the lexicon on the FULL corpus; Spark
    // ADDS the arrival batch's sufficient statistics to the standing
    // lexicon — hash match proves upsert ≡ rebuild (pp40's twin).
    "pp44_upsert_lexicon" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
        |             AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(100 * CAST(sum(dl) AS BIGINT) // count(*) AS BIGINT) AS a_c
        |  FROM dl)
        |SELECT tok, CAST(df AS BIGINT) AS df,
        |  CAST(round(ln(CAST(n_docs * 2 + 2 AS DOUBLE)
        |    / CAST(df * 2 + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |    AS idf_micro,
        |  a_c
        |FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1) x
        |CROSS JOIN tot""".stripMargin,

    // pp40: the oracle rebuilds the lexicon (df, idf, avgdl) from
    // scratch on the purged corpus; Spark patches by subtracting the
    // purged docs' sufficient statistics — hash match proves
    // patch ≡ rebuild for the statistics half pp37 leaves stale.
    "pp40_patch_lexicon" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
        |             AS tok FROM documents WHERE doc_id % 97 <> 0),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(100 * CAST(sum(dl) AS BIGINT) // count(*) AS BIGINT) AS a_c
        |  FROM dl)
        |SELECT tok, CAST(df AS BIGINT) AS df,
        |  CAST(round(ln(CAST(n_docs * 2 + 2 AS DOUBLE)
        |    / CAST(df * 2 + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |    AS idf_micro,
        |  a_c
        |FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1) x
        |CROSS JOIN tot""".stripMargin,

    // pp38: rebuild of the IVF assignment on the FULL corpus (the
    // coarse quantizer is immutable under purge), counted before /
    // purged / after per cell — the integer half of the sufficient
    // stats; the float vsum patch is spec-verified ≡ rebuild.
    "pp38_patch_ivf" ->
      """WITH ex AS (SELECT vec_id, label, i,
        |       CAST(embedding[i+1] AS DOUBLE) AS x
        |     FROM embeddings, range(64) r(i)),
        |cent AS (SELECT label AS cell, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |vc AS (SELECT ex.vec_id, cent.cell,
        |         sum(x*c) / (sqrt(sum(x*x)) * sqrt(sum(c*c))) AS ccos
        |       FROM ex JOIN cent ON ex.i = cent.i GROUP BY 1, 2),
        |assigned AS (SELECT vec_id, cell FROM (
        |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ccos DESC, cell) AS crk FROM vc) z WHERE crk = 1)
        |SELECT cell, CAST(count(*) AS BIGINT) AS cnt_before,
        |  CAST(sum(CASE WHEN vec_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purged,
        |  CAST(sum(CASE WHEN vec_id % 97 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS cnt_after
        |FROM assigned GROUP BY 1""".stripMargin,

    // pp39: dd07's keeper table rebuilt from scratch on the purged
    // corpus (clusters re-derived over the surviving document set —
    // splits and dropouts fall out naturally); hash match against
    // Spark's affected-clusters-only patch proves patch ≡ rebuild.
    "pp39_patch_clusters" ->
      s"""WITH clusters AS (${dupClustersSqlFrom(" AND doc_id % 97 <> 0")}),
         |scores AS ($qualityScoreSql),
         |j AS (SELECT c.cluster_id, c.doc_id, s.score
         |      FROM clusters c JOIN scores s USING (doc_id)),
         |r AS (SELECT cluster_id, doc_id, score,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY score DESC, doc_id) AS rk,
         |        count(*) OVER (PARTITION BY cluster_id) AS n_members
         |      FROM j)
         |SELECT cluster_id, doc_id AS keeper_id, n_members
         |FROM r WHERE rk = 1""".stripMargin,

    // q73: the router — the oracle replays q72's corrected estimate,
    // the absolute 5000-row broadcast threshold, and the plain join's
    // per-cell aggregates (strategy-invariant values); the hash proves
    // the Spark router decided every cell identically cross-engine.
    "q73_stats_routed_join" ->
      """WITH joint AS (SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS BIGINT) AS joint_rows
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS q_rows
        |  FROM lineitem),
        |e AS (SELECT l_returnflag, l_linestatus,
        |        CAST(joint_rows * q_rows * 1000 // n AS BIGINT)
        |          AS est_corr_milli
        |      FROM joint CROSS JOIN tot),
        |r AS (SELECT l.l_returnflag, l.l_linestatus, o.o_custkey
        |      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      WHERE l.l_quantity > 25),
        |g AS (SELECT l_returnflag, l_linestatus,
        |        CAST(count(*) AS BIGINT) AS n_rows,
        |        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys
        |      FROM r GROUP BY 1, 2)
        |SELECT g.l_returnflag, g.l_linestatus, e.est_corr_milli,
        |  CASE WHEN e.est_corr_milli <= 5000000 THEN 'broadcast'
        |       ELSE 'shuffle' END AS strategy,
        |  g.n_rows, g.n_custkeys
        |FROM g JOIN e USING (l_returnflag, l_linestatus)""".stripMargin,

    // q72: the q71 consumer — per-cell conjunctive-predicate row
    // estimates under independence vs contingency-corrected, errors in
    // exact bp; division order written identically to the Spark plan
    // (all operands nonnegative, so div and // agree).
    "q72_selectivity" ->
      """WITH joint AS (SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS BIGINT) AS joint_rows,
        |    CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS actual_rows
        |  FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS r_tot
        |       FROM lineitem GROUP BY 1),
        |ct AS (SELECT l_linestatus, CAST(count(*) AS BIGINT) AS c_tot
        |       FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS q_rows
        |  FROM lineitem),
        |e AS (SELECT j.l_returnflag, j.l_linestatus, actual_rows,
        |        CAST((r_tot * c_tot // n) * q_rows * 1000 // n AS BIGINT)
        |          AS est_indep_milli,
        |        CAST(joint_rows * q_rows * 1000 // n AS BIGINT)
        |          AS est_corr_milli
        |      FROM joint j JOIN rt USING (l_returnflag)
        |      JOIN ct USING (l_linestatus) CROSS JOIN tot),
        |f AS (SELECT *,
        |        CAST(CASE WHEN actual_rows = 0 THEN 0
        |          ELSE abs(est_indep_milli - actual_rows * 1000) * 10
        |            // actual_rows END AS BIGINT) AS err_indep_bp,
        |        CAST(CASE WHEN actual_rows = 0 THEN 0
        |          ELSE abs(est_corr_milli - actual_rows * 1000) * 10
        |            // actual_rows END AS BIGINT) AS err_corr_bp
        |      FROM e)
        |SELECT l_returnflag, l_linestatus, actual_rows, est_indep_milli,
        |  est_corr_milli, err_indep_bp, err_corr_bp,
        |  err_corr_bp <= err_indep_bp AS corr_improves
        |FROM f""".stripMargin,

    // ss25: the oracle REBUILDS the kNN graph on corpus+batch under
    // the STANDING quantizer (label centroids trained without the
    // src0 arrivals — immutable under upsert); Spark folds the batch
    // into the standing edges, so the hash is an upsert ≡ rebuild
    // proof for the graph family.
    "ss25_knn_upsert" -> knnJoinSqlWhere(
      "WHERE vec_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src0')",
      ""),

    // ss26: the oracle rebuilds the graph on the SURVIVOR corpus under
    // the full-corpus quantizer (immutable under purge, pp38's
    // convention); Spark re-derives only survivors that lost a top-3
    // neighbor — hash = patch ≡ rebuild.
    "ss26_knn_purge" -> knnJoinSqlWhere("", "WHERE ex.vec_id % 97 <> 0"),

    // ss24: the fully-bounded hybrid — the NSW walk's final beam
    // (top-8, the shared nswWalkCtes replay) as the vector tier, ss23's
    // BM25 top-20 as the lexical tier, the shared RRF fusion tail.
    "ss24_hybrid_walk" ->
      s"""$nswWalkCtes,
         |vw AS (SELECT qid, vec_id AS nid, rk FROM (
         |    SELECT b3.qid, b3.vec_id, row_number() OVER (PARTITION BY b3.qid
         |      ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC,
         |               b3.vec_id) AS rk
         |    FROM b3 JOIN embeddings c ON c.vec_id = b3.vec_id
         |    JOIN q ON q.qid = b3.qid) z WHERE rk <= 8),
         |dt AS (SELECT doc_id, unnest(string_split(trim(text), ' '))
         |             AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM dt GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |       FROM dt GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(100 * CAST(sum(dl) AS BIGINT) // count(*) AS BIGINT) AS a_c
         |  FROM dl),
         |idf AS (SELECT tok,
         |    CAST(round(ln(CAST(n_docs * 2 + 2 AS DOUBLE)
         |      / CAST(df * 2 + 1 AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS idf_micro,
         |    a_c
         |  FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1) x
         |  CROSS JOIN tot),
         |post AS (SELECT tok, doc_id, tf FROM (
         |    SELECT tok, doc_id, tf, row_number() OVER (PARTITION BY tok
         |      ORDER BY tf DESC, doc_id) AS prk FROM tf) z WHERE prk <= 64),
         |qt AS (SELECT tf.doc_id AS qid, tf.tok, idf.idf_micro, idf.a_c
         |       FROM tf JOIN idf ON idf.tok = tf.tok WHERE tf.doc_id < 10),
         |sc AS (SELECT qt.qid, post.doc_id,
         |    CAST(sum(qt.idf_micro * 22 * post.tf * qt.a_c
         |      // (10 * qt.a_c * post.tf + 3 * qt.a_c + 900 * dl.dl))
         |      AS BIGINT) AS bm25_micro
         |  FROM qt JOIN post ON post.tok = qt.tok AND post.doc_id != qt.qid
         |  JOIN dl ON dl.doc_id = post.doc_id
         |  GROUP BY 1, 2),
         |btop AS (SELECT qid, doc_id AS nid, rk FROM (
         |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY bm25_micro DESC, doc_id) AS rk FROM sc) z
         |    WHERE rk <= 20),
         |f AS (SELECT coalesce(v.qid, b.qid) AS qid,
         |        coalesce(v.nid, b.nid) AS nid,
         |        CAST(coalesce(v.rk, 0) AS BIGINT) AS rank_vec,
         |        CAST(coalesce(b.rk, 0) AS BIGINT) AS rank_bm25,
         |        CAST((CASE WHEN v.rk IS NULL THEN 0
         |               ELSE 1000000 // (60 + v.rk) END)
         |           + (CASE WHEN b.rk IS NULL THEN 0
         |               ELSE 1000000 // (60 + b.rk) END) AS BIGINT)
         |          AS rrf_score
         |      FROM vw v FULL OUTER JOIN btop b
         |        ON v.qid = b.qid AND v.nid = b.nid)
         |SELECT qid, nid AS neighbor_id, rank_vec, rank_bm25, rrf_score,
         |  CAST(rk_fused AS BIGINT) AS rk_fused
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY rrf_score DESC, nid) AS rk_fused FROM f) z
         |WHERE rk_fused <= 5""".stripMargin,
  )
}
