package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 appears in [[queries]]; where the
  * semantics are ANSI-SQL-expressible the matching DuckDB oracle is in
  * [[oracleSql]] (column names aligned — the driver sorts columns by name
  * and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.regionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / operator surface (SURVEY §2.3, 2.6–2.9)
    "q_pricing_summary" -> (RelationalQueries.pricingSummary _),
    "q_region_revenue" -> (RelationalQueries.regionRevenue _),
    "q_segment_revenue" -> (RelationalQueries.segmentRevenue _),
    "q_scan_prune" -> (RelationalQueries.scanPrune _),
    "q_top_orders" -> (RelationalQueries.topOrders _),
    "q_set_ops" -> (RelationalQueries.setOps _),
    "q_bit_or" -> (RelationalQueries.bitOrSizes _),
    "q_running_offsets" -> (RelationalQueries.runningOffsets _),
    "q_user_day_stats" -> (RelationalQueries.userDayStats _),
    "q_retention_cohorts" -> (RelationalQueries.retentionCohorts _),
    "q_funnel_steps" -> (RelationalQueries.funnelSteps _),
    "q_interval_join" -> (RelationalQueries.intervalJoin _),
    "q_semi_anti_join" -> (RelationalQueries.semiAntiJoin _),
    "q_time_travel" -> (RelationalQueries.timeTravel _),
    "q_period_list" -> (RelationalQueries.periodList _),
    // signal processing on tables (SURVEY §2.4–2.5)
    "q_threshold_events" -> ((s: SparkSession, d: String) =>
      SignalQueries.thresholdEvents(s, d)),
    "q_percentiles" -> (RelationalQueries.percentiles _),
    "q_power_spectrum" -> (SignalQueries.powerSpectrum _),
    "q_matched_filter" -> (SignalQueries.matchedFilter _),
    "q_welch_psd" -> (SignalQueries.welchPsd _),
    "q_threshold_events_expr" -> ((s: SparkSession, d: String) =>
      SignalQueries.thresholdEventsExpr(s, d)),
    "q_threshold_events_differential" -> ((s: SparkSession, d: String) =>
      SignalQueries.thresholdEventsDifferential(s, d)),
    "q_threshold_events_differential_expr" -> ((s: SparkSession, d: String) =>
      SignalQueries.thresholdEventsDifferentialExpr(s, d)),
    // DAQ pipeline: generator → event formation → frame assembly → NeXus
    // tables (SURVEY §2.1 S7, §2.4–2.6, §1.4; every detector FSM chain is
    // oracle-backed on the closed-form fixtures — gaps-and-islands SQL
    // for D1/D2, a recursive phase-walk for D3)
    "q_trace_to_events" -> (PipelineQueries.traceToEvents _),
    "q_trace_to_events_differential" -> (PipelineQueries.traceToEventsDifferential _),
    "q_trace_to_events_advanced" -> (PipelineQueries.traceToEventsAdvanced _),
    "q_trace_to_events_banded" -> (PipelineQueries.traceToEventsBanded _),
    "q_trace_to_events_advanced_expr" -> (PipelineQueries.traceToEventsAdvancedExpr _),
    "q_frame_assembly" -> (PipelineQueries.frameAssembly _),
    "q_nexus_frame_table" -> (PipelineQueries.nexusFrameTable _),
    "q_nexus_event_table" -> (PipelineQueries.nexusEventTable _),
    "q_wire_roundtrip" -> (PipelineQueries.wireRoundtrip _),
    "q_wire_runstart" -> (PipelineQueries.wireRunStart _),
    "q_run_intervals" -> (PipelineQueries.runIntervals _),
    "q_pipeline_e2e" -> (PipelineQueries.pipelineE2e _),
    "q_wire_e2e" -> (PipelineQueries.wireE2e _),
    "q_sim_schedule" -> (PipelineQueries.simSchedule _),
    "q_trace_file_scan" -> (PipelineQueries.traceFileScan _),
    "q_trace_file_roundtrip" -> (PipelineQueries.traceFileRoundtrip _),
    "q_stream_frame_assembly" -> (StreamingQueries.streamFrameAssembly _),
    "q_stream_windowed_counts" -> (StreamingQueries.streamWindowedCounts _),
    "q_stream_dedup" -> (StreamingQueries.streamDedup _),
    "q_stream_join" -> (StreamingQueries.streamJoin _),
    "q_stream_session_window" -> (StreamingQueries.streamSessionWindow _),
    "q_stream_running_totals" -> (StreamingQueries.streamRunningTotals _),
    "q_stream_trace_to_events" -> (StreamingQueries.streamTraceToEvents _),
    "q_stream_enrich" -> (StreamingQueries.streamEnrich _),
    "q_stream_minhash_dedup" -> (StreamingQueries.streamMinhashDedup _),
    "q_stream_cdc_apply" -> (StreamingQueries.streamCdcApply _),
    "q_stream_bitmap_distinct" -> (StreamingQueries.streamBitmapDistinct _),
    // log streams, scalar functions, diagnostics (SURVEY §2.3, 2.6, 2.7, 2.9)
    "q_json_props" -> (LogQueries.jsonProps _),
    "q_selog_expand" -> (LogQueries.selogExpand _),
    "q_runlog_typed" -> (LogQueries.runlogTyped _),
    "q_alarm_severity" -> (LogQueries.alarmSeverity _),
    "q_nexus_runlog_table" -> (LogQueries.nexusRunlogTable _),
    "q_gps_round_trip" -> (LogQueries.gpsRoundTrip _),
    "q_spectrum_map" -> (LogQueries.spectrumMap _),
    "q_trace_event_attach" -> (LogQueries.traceEventAttach _),
    "q_digitiser_stats" -> (LogQueries.digitiserStats _),
    // LLM-data-pipeline ops
    "q_dedup_exact" -> (TextQueries.dedupExact _),
    "q_text_stats" -> (TextQueries.textStats _),
    "q_corpus_profile" -> (TextQueries.corpusProfile _),
    "q_minhash_pairs" -> ((s: SparkSession, d: String) => DedupQueries.minhashPairs(s, d)),
    "q_simhash_docs" -> (DedupQueries.simhashDocs _),
    "q_simhash_pairs" -> ((s: SparkSession, d: String) => DedupQueries.simhashPairs(s, d)),
    "q_dedup_clusters" -> ((s: SparkSession, d: String) => DedupQueries.dedupClusters(s, d)),
    "q_corpus_curation" -> (DedupQueries.corpusCuration _),
    "q_ngram_jaccard" -> (DedupQueries.ngramJaccard _),
    "q_containment_dedup" -> (DedupQueries.containmentDedup _),
    "q_bigram_jaccard" -> (DedupQueries.bigramJaccard _),
    "q_fingerprints" -> (DedupQueries.fingerprints _),
    "q_language_id" -> (DedupQueries.languageId _),
    "q_token_counts" -> (DedupQueries.tokenCounts _),
    "q_repetition_stats" -> (CurationQueries.repetitionStats _),
    "q_boilerplate_ngrams" -> (CurationQueries.boilerplateNgrams _),
    "q_hash_split" -> (CurationQueries.hashSplit _),
    "q_stratified_sample" -> (CurationQueries.stratifiedSample _),
    "q_text_normalize" -> (CurationQueries.textNormalize _),
    "q_tfidf_terms" -> (CurationQueries.tfidfTerms _),
    "q_lang_mixture" -> (CurationQueries.langMixture _),
    "q_domain_mixture" -> (CurationQueries.domainMixture _),
    "q_source_profile" -> (CurationQueries.sourceProfile _),
    "q_length_histogram" -> (CurationQueries.lengthHistogram _),
    "q_ngram_novelty" -> (CurationQueries.ngramNovelty _),
    "q_substring_dedup" -> (CurationQueries.substringDedup _),
    "q_line_dedup" -> ((s: SparkSession, d: String) => CurationQueries.lineDedup(s, d)),
    "q_sequence_pack" -> (CurationQueries.sequencePack _),
    "q_doc_chunk" -> (CurationQueries.docChunk _),
    "q_blocklist_scan" -> (CurationQueries.blocklistScan _),
    "q_bpe_train" -> ((s: SparkSession, d: String) => CurationQueries.bpeTrain(s, d)),
    "q_bpe_encode" -> ((s: SparkSession, d: String) => CurationQueries.bpeEncode(s, d)),
    "q_epoch_shuffle" -> (CurationQueries.epochShuffle _),
    "q_token_budget" -> ((s: SparkSession, d: String) => CurationQueries.tokenBudget(s, d)),
    "q_dedup_sweep" -> ((s: SparkSession, d: String) => DedupQueries.dedupSweep(s, d)),
    "q_incremental_dedup" -> ((s: SparkSession, d: String) => DedupQueries.incrementalDedup(s, d)),
    "q_decontaminate" -> (CurationQueries.decontaminate _),
    "q_bloom_prune" -> (CurationQueries.bloomPrune _),
    "q_quality_score" -> (CurationQueries.qualityScore _),
    "q_top_ngrams" -> (CurationQueries.topNgrams _),
    "q_cosine_topk" -> ((s: SparkSession, d: String) => VectorQueries.cosineTopK(s, d)),
    "q_dedup_embedding" -> ((s: SparkSession, d: String) => VectorQueries.dedupEmbedding(s, d)),
    "q_pii_scrub" -> (PiiQueries.piiScrub _),
    "q_bm25_search" -> ((s: SparkSession, d: String) => SearchQueries.bm25Search(s, d)),
    "q_lm_perplexity" -> (SearchQueries.lmPerplexity _),
    "q_pagerank" -> ((s: SparkSession, d: String) => GraphQueries.pagerank(s, d)),
    "q_triangle_count" -> ((s: SparkSession, d: String) => GraphQueries.triangleCount(s, d)),
    "q_label_propagation" -> ((s: SparkSession, d: String) => GraphQueries.labelPropagation(s, d)),
    "q_neighborhood" -> ((s: SparkSession, d: String) => GraphQueries.neighborhood(s, d)),
    "q_link_prediction" -> ((s: SparkSession, d: String) => GraphQueries.linkPrediction(s, d)),
    "q_scd2_intervals" -> (RelationalQueries.scd2Intervals _),
    "q_rfm_segments" -> (RelationalQueries.rfmSegments _),
    "q_fuzzy_match" -> ((s: SparkSession, d: String) => RelationalQueries.fuzzyMatch(s, d)),
    // exact-distinct mode for the oracle; the library default is the
    // no-Expand approx_count_distinct path (the 100-TB mode)
    "q_data_profile" -> ((s: SparkSession, d: String) =>
      RelationalQueries.dataProfile(s, d, approxDistinct = false)),
    "q_quality_checks" -> (RelationalQueries.qualityChecks _),
    "q_chi2_assoc" -> (TextQueries.chi2Assoc _),
    "q_readability" -> (TextQueries.readability _),
    "q_incremental_agg" -> ((s: SparkSession, d: String) => SignalQueries.incrementalAgg(s, d)),
    "q_seasonal_profile" -> (SignalQueries.seasonalProfile _),
    "q_knn_classify" -> ((s: SparkSession, d: String) => VectorQueries.knnClassify(s, d)),
    "q_kcore" -> ((s: SparkSession, d: String) => GraphQueries.kcore(s, d)),
    "q_gini_concentration" -> ((s: SparkSession, d: String) =>
      RelationalQueries.giniConcentration(s, d)),
    "q_cohort_ltv" -> (RelationalQueries.cohortLtv _),
    "q_ab_ttest" -> (RelationalQueries.abTtest _),
    "q_winsorized_stats" -> (RelationalQueries.winsorizedStats _),
    "q_iqr_outliers" -> (RelationalQueries.iqrOutliers _),
    "q_collocations" -> ((s: SparkSession, d: String) => SearchQueries.collocations(s, d)),
    "q_seasonal_decompose" -> (SignalQueries.seasonalDecompose _),
    "q_vocab_growth" -> ((s: SparkSession, d: String) => SearchQueries.vocabGrowth(s, d)),
    "q_weighted_sample" -> ((s: SparkSession, d: String) => SearchQueries.weightedSample(s, d)),
    "q_media_dedup" -> ((s: SparkSession, d: String) => DedupQueries.mediaDedup(s, d)),
    "q_lsh_ann" -> ((s: SparkSession, d: String) => VectorQueries.lshAnn(s, d)),
    "q_ivf_ann" -> ((s: SparkSession, d: String) => VectorQueries.ivfAnn(s, d)),
    "q_ivfpq_ann" -> ((s: SparkSession, d: String) => VectorQueries.ivfPqAnn(s, d)),
    "q_pq_codes" -> ((s: SparkSession, d: String) => VectorQueries.pqCodes(s, d)),
    "q_cluster_assign" -> (VectorQueries.clusterAssign _),
    "q_semdedup" -> ((s: SparkSession, d: String) => VectorQueries.semDedup(s, d)),
    "q_embedding_outliers" -> ((s: SparkSession, d: String) =>
      VectorQueries.embeddingOutliers(s, d)),
    "q_ann_recall" -> ((s: SparkSession, d: String) => VectorQueries.annRecall(s, d)),
    "q_ann_sweep" -> ((s: SparkSession, d: String) => VectorQueries.annSweep(s, d)),
    "q_random_projection" -> ((s: SparkSession, d: String) =>
      VectorQueries.randomProjection(s, d)),
    "q_sq8_codes" -> (VectorQueries.sq8Codes _),
    "q_pivot_event_matrix" -> (RelationalQueries.pivotEventMatrix _),
    "q_time_resample" -> (RelationalQueries.timeResample _),
    "q_user_ewma" -> (RelationalQueries.userEwma _),
    "q_hopping_counts" -> (RelationalQueries.hoppingCounts _),
    "q_engagement_corr" -> (RelationalQueries.engagementCorr _),
    "q_markov_transitions" -> (RelationalQueries.markovTransitions _),
    "q_anomaly_mad" -> (RelationalQueries.anomalyMad _),
    "q_cusum_changepoint" -> (SignalQueries.cusumChangepoint _),
    "q_holt_forecast" -> (SignalQueries.holtForecast _),
    "q_autocorrelation" -> ((s: SparkSession, d: String) => SignalQueries.autocorrelation(s, d)),
    "q_active_users" -> (RelationalQueries.activeUsers _),
    "q_user_features" -> (RelationalQueries.userFeatures _),
    "q_event_pmi" -> (RelationalQueries.eventPmi _),
    "q_touch_attribution" -> (RelationalQueries.touchAttribution _),
    "q_zipf_slope" -> (SearchQueries.zipfSlope _),
    "q_source_divergence" -> (SearchQueries.sourceDivergence _),
    "q_kmv_distinct" -> ((s: SparkSession, d: String) => SketchQueries.kmvDistinct(s, d)),
    "q_hll_distinct" -> ((s: SparkSession, d: String) => SketchQueries.hllDistinct(s, d)),
    "q_heavy_hitters" -> ((s: SparkSession, d: String) => SketchQueries.heavyHitters(s, d)),
    "q_quantile_sketch" -> (SketchQueries.quantileSketch _),
    "q_bitmap_distinct" -> (SketchQueries.bitmapDistinct _),
    "q_kmv_setops" -> ((s: SparkSession, d: String) => SketchQueries.kmvSetOps(s, d)),
    "q_hll_rollup" -> ((s: SparkSession, d: String) => SketchQueries.hllRollup(s, d)),
    "q_inverted_index" -> (SearchQueries.invertedIndex _),
    "q_phrase_search" -> (SearchQueries.phraseSearch _),
    "q_sessionize" -> (RelationalQueries.sessionize _),
    "q_session_window" -> (RelationalQueries.sessionWindow _),
    "q_asof_join" -> (RelationalQueries.asofJoin _),
    "q_asof_join_custom" -> (RelationalQueries.asofJoinCustom _),
    "q_rollup_revenue" -> (RelationalQueries.rollupRevenue _),
    "q_cube_revenue" -> (RelationalQueries.cubeRevenue _),
    "q_latest_by_key" -> (RelationalQueries.latestByKey _),
    "q_user_deciles" -> (RelationalQueries.userDeciles _),
    "q_skyline" -> (CurationQueries.skylineDocs _),
    // multimodal binary columns (decode/feature stubbed on the synthetic
    // payload; resize is a real byte-level nearest-neighbor downsample)
    "q_media_features" -> (MultimodalQueries.mediaFeatures _),
    "q_media_resize" -> ((s: SparkSession, d: String) => MultimodalQueries.mediaResize(s, d)),
    "q_media_frame_sample" -> ((s: SparkSession, d: String) =>
      MultimodalQueries.mediaFrameSample(s, d)),
    "q_media_mixdown" -> (MultimodalQueries.mediaMixdown _),
    // data-engineering / OLAP batch 2
    "q_cdc_apply" -> (RelationalQueries.cdcApply _),
    "q_benford" -> (RelationalQueries.benfordDigits _),
    "q_concurrency" -> (RelationalQueries.concurrency _),
    "q_grouping_sets" -> (RelationalQueries.groupingSets _),
    "q_overlap_join" -> ((s: SparkSession, d: String) => RelationalQueries.overlapJoin(s, d)),
    "q_weighted_quantiles" -> ((s: SparkSession, d: String) =>
      RelationalQueries.weightedQuantiles(s, d)),
    "q_interpolate" -> ((s: SparkSession, d: String) => RelationalQueries.interpolateSeries(s, d)),
    "q_incremental_join" -> ((s: SparkSession, d: String) =>
      RelationalQueries.incrementalJoin(s, d)),
    "q_zorder_layout" -> (RelationalQueries.zorderLayout _),
    "q_top_per_group" -> ((s: SparkSession, d: String) =>
      RelationalQueries.topPerGroup(s, d))
  )

  /** Oracles whose SQL must inline data-dependent constants (the IVF
    * centroids) are derived ONCE here, at the moment [[Verify]] provides
    * the session + data dir, and memoized as plain strings — later
    * [[oracleSql]] evaluations never re-run Spark work and stay valid
    * after the session stops. Absent a call, those entries are omitted
    * and the driver falls back to a rows-only check.
    */
  @volatile private var dynamicOracleSql: Map[String, String] = Map.empty
  def deriveDataOracles(s: SparkSession, dir: String): Unit = {
    dynamicOracleSql = {
      val cents = VectorQueries.trainCentroids(s, dir) // shared: IVF + clustering
      Map(
        "q_ivf_ann" -> VectorQueries.ivfAnnSql(cents),
        "q_ivfpq_ann" -> VectorQueries.ivfPqAnnSql(
          cents, VectorQueries.trainResidualPq(s, dir, cents)),
        "q_cluster_assign" -> VectorQueries.clusterAssignSql(cents),
        "q_semdedup" -> VectorQueries.semDedupSql(cents),
        "q_embedding_outliers" -> VectorQueries.embeddingOutliersSql(cents),
        "q_pq_codes" -> VectorQueries.pqCodesSql(VectorQueries.trainPqCentroids(s, dir)),
        "q_ann_recall" -> VectorQueries.annRecallSql(cents),
        "q_ann_sweep" -> VectorQueries.annSweepSql(cents))
    }
    require(dynamicOracleSql.keySet == dynamicOracleNames,
      "dynamicOracleNames out of sync with deriveDataOracles")
  }

  /** Names whose oracle SQL inlines data-dependent constants and only
    * exists after [[deriveDataOracles]]. Kept as a static set so the
    * oracle-coverage count ([[oracleNames]]) is derivable without a
    * SparkSession — DocLintSpec checks the documented counts against it.
    */
  val dynamicOracleNames: Set[String] = Set(
    "q_ivf_ann", "q_ivfpq_ann", "q_cluster_assign", "q_semdedup",
    "q_embedding_outliers", "q_pq_codes", "q_ann_recall", "q_ann_sweep")

  /** Every query name with an exact DuckDB oracle (static or derived). */
  def oracleNames: Set[String] = staticOracleSql.keySet ++ dynamicOracleNames

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = staticOracleSql ++ dynamicOracleSql

  private def staticOracleSql: Map[String, String] = Map(
    "q_pricing_summary" -> RelationalQueries.pricingSummarySql,
    "q_region_revenue" -> RelationalQueries.regionRevenueSql,
    "q_segment_revenue" -> RelationalQueries.segmentRevenueSql,
    "q_scan_prune" -> RelationalQueries.scanPruneSql,
    "q_top_orders" -> RelationalQueries.topOrdersSql,
    "q_set_ops" -> RelationalQueries.setOpsSql,
    "q_bit_or" -> RelationalQueries.bitOrSizesSql,
    "q_running_offsets" -> RelationalQueries.runningOffsetsSql,
    "q_user_day_stats" -> RelationalQueries.userDayStatsSql,
    "q_retention_cohorts" -> RelationalQueries.retentionCohortsSql,
    "q_funnel_steps" -> RelationalQueries.funnelStepsSql,
    "q_interval_join" -> RelationalQueries.intervalJoinSql,
    "q_semi_anti_join" -> RelationalQueries.semiAntiJoinSql,
    "q_time_travel" -> RelationalQueries.timeTravelSql,
    "q_period_list" -> RelationalQueries.periodListSql,
    "q_threshold_events" -> SignalQueries.thresholdEventsSql,
    "q_percentiles" -> RelationalQueries.percentilesSql,
    "q_power_spectrum" -> SignalQueries.powerSpectrumSql,
    "q_matched_filter" -> SignalQueries.matchedFilterSql,
    "q_welch_psd" -> SignalQueries.welchPsdSql,
    "q_threshold_events_expr" -> SignalQueries.thresholdEventsSql,
    "q_threshold_events_differential" -> SignalQueries.thresholdEventsDifferentialSql,
    "q_threshold_events_differential_expr" -> SignalQueries.thresholdEventsDifferentialSql,
    "q_dedup_exact" -> TextQueries.dedupExactSql,
    "q_text_stats" -> TextQueries.textStatsSql,
    "q_corpus_profile" -> TextQueries.corpusProfileSql,
    "q_ngram_jaccard" -> DedupQueries.ngramJaccardSql,
    "q_containment_dedup" -> DedupQueries.containmentDedupSql,
    "q_bigram_jaccard" -> DedupQueries.bigramJaccardSql,
    "q_language_id" -> DedupQueries.languageIdSql,
    "q_token_counts" -> DedupQueries.tokenCountsSql,
    "q_repetition_stats" -> CurationQueries.repetitionStatsSql,
    "q_boilerplate_ngrams" -> CurationQueries.boilerplateNgramsSql,
    "q_hash_split" -> CurationQueries.hashSplitSql,
    "q_stratified_sample" -> CurationQueries.stratifiedSampleSql,
    "q_text_normalize" -> CurationQueries.textNormalizeSql,
    "q_tfidf_terms" -> CurationQueries.tfidfTermsSql,
    "q_lang_mixture" -> CurationQueries.langMixtureSql,
    "q_domain_mixture" -> CurationQueries.domainMixtureSql,
    "q_source_profile" -> CurationQueries.sourceProfileSql,
    "q_length_histogram" -> CurationQueries.lengthHistogramSql,
    "q_ngram_novelty" -> CurationQueries.ngramNoveltySql,
    "q_substring_dedup" -> CurationQueries.substringDedupSql,
    "q_line_dedup" -> CurationQueries.lineDedupSql(),
    "q_sequence_pack" -> CurationQueries.sequencePackSql,
    "q_doc_chunk" -> CurationQueries.docChunkSql,
    "q_blocklist_scan" -> CurationQueries.blocklistScanSql,
    "q_bpe_train" -> CurationQueries.bpeTrainSql,
    "q_bpe_encode" -> CurationQueries.bpeEncodeSql,
    "q_epoch_shuffle" -> CurationQueries.epochShuffleSql,
    "q_token_budget" -> CurationQueries.tokenBudgetSql(),
    "q_dedup_sweep" -> DedupQueries.dedupSweepSql(),
    "q_incremental_dedup" -> DedupQueries.incrementalDedupSql(),
    "q_decontaminate" -> CurationQueries.decontaminateSql,
    "q_bloom_prune" -> CurationQueries.bloomPruneSql,
    "q_quality_score" -> CurationQueries.qualityScoreSql,
    "q_top_ngrams" -> CurationQueries.topNgramsSql,
    "q_cosine_topk" -> VectorQueries.cosineTopKSql,
    "q_dedup_embedding" -> VectorQueries.dedupEmbeddingSql,
    "q_lsh_ann" -> VectorQueries.lshAnnSql,
    "q_random_projection" -> VectorQueries.randomProjectionSql,
    "q_sq8_codes" -> VectorQueries.sq8CodesSql,
    "q_pii_scrub" -> PiiQueries.piiScrubSql,
    "q_bm25_search" -> SearchQueries.bm25SearchSql(),
    "q_lm_perplexity" -> SearchQueries.lmPerplexitySql,
    "q_pagerank" -> GraphQueries.pagerankSql(),
    "q_triangle_count" -> GraphQueries.triangleCountSql(),
    "q_label_propagation" -> GraphQueries.labelPropagationSql(),
    "q_neighborhood" -> GraphQueries.neighborhoodSql(),
    "q_link_prediction" -> GraphQueries.linkPredictionSql(),
    "q_scd2_intervals" -> RelationalQueries.scd2IntervalsSql,
    "q_rfm_segments" -> RelationalQueries.rfmSegmentsSql,
    "q_fuzzy_match" -> RelationalQueries.fuzzyMatchSql(),
    "q_data_profile" -> RelationalQueries.dataProfileSql,
    "q_quality_checks" -> RelationalQueries.qualityChecksSql,
    "q_chi2_assoc" -> TextQueries.chi2AssocSql,
    "q_readability" -> TextQueries.readabilitySql,
    "q_incremental_agg" -> SignalQueries.incrementalAggSql(),
    "q_seasonal_profile" -> SignalQueries.seasonalProfileSql,
    "q_knn_classify" -> VectorQueries.knnClassifySql(),
    "q_kcore" -> GraphQueries.kcoreSql(),
    "q_gini_concentration" -> RelationalQueries.giniConcentrationSql,
    "q_cohort_ltv" -> RelationalQueries.cohortLtvSql,
    "q_ab_ttest" -> RelationalQueries.abTtestSql,
    "q_winsorized_stats" -> RelationalQueries.winsorizedStatsSql,
    "q_iqr_outliers" -> RelationalQueries.iqrOutliersSql,
    "q_collocations" -> SearchQueries.collocationsSql(),
    "q_seasonal_decompose" -> SignalQueries.seasonalDecomposeSql,
    "q_vocab_growth" -> SearchQueries.vocabGrowthSql(),
    "q_weighted_sample" -> SearchQueries.weightedSampleSql(),
    "q_media_dedup" -> DedupQueries.mediaDedupSql,
    "q_json_props" -> LogQueries.jsonPropsSql,
    "q_stream_windowed_counts" -> StreamingQueries.streamWindowedCountsSql,
    "q_stream_dedup" -> StreamingQueries.streamDedupSql,
    "q_stream_join" -> StreamingQueries.streamJoinSql,
    "q_stream_session_window" -> StreamingQueries.streamSessionWindowSql,
    "q_stream_running_totals" -> StreamingQueries.streamRunningTotalsSql,
    "q_stream_trace_to_events" -> StreamingQueries.streamTraceToEventsSql,
    "q_stream_enrich" -> StreamingQueries.streamEnrichSql,
    "q_stream_minhash_dedup" -> StreamingQueries.streamMinhashDedupSql,
    "q_stream_cdc_apply" -> StreamingQueries.streamCdcApplySql,
    "q_stream_bitmap_distinct" -> StreamingQueries.streamBitmapDistinctSql,
    "q_stream_frame_assembly" -> StreamingQueries.streamFrameAssemblySql,
    "q_sessionize" -> RelationalQueries.sessionizeSql,
    "q_session_window" -> RelationalQueries.sessionWindowSql,
    "q_asof_join" -> RelationalQueries.asofJoinSql,
    // the custom-operator path must match the identical oracle
    "q_asof_join_custom" -> RelationalQueries.asofJoinSql,
    "q_rollup_revenue" -> RelationalQueries.rollupRevenueSql,
    "q_cube_revenue" -> RelationalQueries.cubeRevenueSql,
    "q_latest_by_key" -> RelationalQueries.latestByKeySql,
    "q_user_deciles" -> RelationalQueries.userDecilesSql,
    "q_skyline" -> CurationQueries.skylineDocsSql,
    "q_pivot_event_matrix" -> RelationalQueries.pivotEventMatrixSql,
    "q_time_resample" -> RelationalQueries.timeResampleSql,
    "q_user_ewma" -> RelationalQueries.userEwmaSql,
    "q_hopping_counts" -> RelationalQueries.hoppingCountsSql,
    "q_engagement_corr" -> RelationalQueries.engagementCorrSql,
    "q_markov_transitions" -> RelationalQueries.markovTransitionsSql,
    "q_anomaly_mad" -> RelationalQueries.anomalyMadSql,
    "q_cusum_changepoint" -> SignalQueries.cusumChangepointSql,
    "q_holt_forecast" -> SignalQueries.holtForecastSql,
    "q_autocorrelation" -> SignalQueries.autocorrelationSql(),
    "q_active_users" -> RelationalQueries.activeUsersSql,
    "q_user_features" -> RelationalQueries.userFeaturesSql,
    "q_event_pmi" -> RelationalQueries.eventPmiSql,
    "q_touch_attribution" -> RelationalQueries.touchAttributionSql,
    "q_zipf_slope" -> SearchQueries.zipfSlopeSql,
    "q_source_divergence" -> SearchQueries.sourceDivergenceSql,
    "q_kmv_distinct" -> SketchQueries.kmvDistinctSql(),
    "q_hll_distinct" -> SketchQueries.hllDistinctSql(),
    "q_heavy_hitters" -> SketchQueries.heavyHittersSql(),
    "q_quantile_sketch" -> SketchQueries.quantileSketchSql(),
    "q_bitmap_distinct" -> SketchQueries.bitmapDistinctSql,
    "q_kmv_setops" -> SketchQueries.kmvSetOpsSql(),
    "q_hll_rollup" -> SketchQueries.hllRollupSql(),
    "q_inverted_index" -> SearchQueries.invertedIndexSql,
    "q_phrase_search" -> SearchQueries.phraseSearchSql,
    // sketch ops: DuckDB re-derives every hash from the text (mod-prime
    // universal family — see TextHash scaladoc)
    "q_minhash_pairs" -> DedupQueries.minhashPairsSql,
    "q_simhash_docs" -> DedupQueries.simhashDocsSql,
    "q_simhash_pairs" -> DedupQueries.simhashPairsSql,
    "q_dedup_clusters" -> DedupQueries.dedupClustersSql,
    "q_corpus_curation" -> DedupQueries.corpusCurationSql,
    "q_fingerprints" -> DedupQueries.fingerprintsSql,
    // log-stream fixtures regenerated in SQL with range()
    "q_selog_expand" -> LogQueries.selogExpandSql,
    "q_runlog_typed" -> LogQueries.runlogTypedSql,
    "q_alarm_severity" -> LogQueries.alarmSeveritySql,
    "q_nexus_runlog_table" -> LogQueries.nexusRunlogTableSql,
    "q_frame_assembly" -> PipelineQueries.frameAssemblySql,
    "q_nexus_frame_table" -> PipelineQueries.nexusFrameTableSql,
    "q_nexus_event_table" -> PipelineQueries.nexusEventTableSql,
    "q_trace_file_scan" -> PipelineQueries.traceFileScanSql,
    "q_trace_file_roundtrip" -> PipelineQueries.traceFileRoundtripSql,
    "q_trace_to_events" -> PipelineQueries.traceToEventsSql,
    "q_trace_to_events_differential" -> PipelineQueries.traceToEventsDifferentialSql,
    "q_trace_to_events_advanced" -> PipelineQueries.traceToEventsAdvancedSql,
    "q_trace_to_events_banded" -> PipelineQueries.traceToEventsBandedSql,
    "q_trace_to_events_advanced_expr" -> PipelineQueries.traceToEventsAdvancedSql,
    "q_sim_schedule" -> PipelineQueries.simScheduleSql,
    "q_wire_roundtrip" -> PipelineQueries.wireRoundtripSql,
    "q_wire_runstart" -> PipelineQueries.wireRunStartSql,
    "q_run_intervals" -> PipelineQueries.runIntervalsSql,
    // multimodal plumbing on the closed-form synthetic payload
    "q_media_features" -> MultimodalQueries.mediaFeaturesSql,
    "q_media_frame_sample" -> MultimodalQueries.mediaFrameSampleSql,
    "q_media_resize" -> MultimodalQueries.mediaResizeSql,
    "q_media_mixdown" -> MultimodalQueries.mediaMixdownSql,
    "q_cdc_apply" -> RelationalQueries.cdcApplySql,
    "q_benford" -> RelationalQueries.benfordDigitsSql,
    "q_concurrency" -> RelationalQueries.concurrencySql,
    "q_grouping_sets" -> RelationalQueries.groupingSetsSql,
    "q_overlap_join" -> RelationalQueries.overlapJoinSql,
    "q_weighted_quantiles" -> RelationalQueries.weightedQuantilesSql,
    "q_interpolate" -> RelationalQueries.interpolateSeriesSql(),
    "q_incremental_join" -> RelationalQueries.incrementalJoinSql,
    "q_zorder_layout" -> RelationalQueries.zorderLayoutSql,
    "q_top_per_group" -> RelationalQueries.topPerGroupSql(),
    // trace→event FSM chain over the closed-form TraceFixtures grid:
    // DuckDB re-derives the detector output with gaps-and-islands
    "q_spectrum_map" -> LogQueries.spectrumMapSql,
    "q_trace_event_attach" -> LogQueries.traceEventAttachSql,
    "q_digitiser_stats" -> LogQueries.digitiserStatsSql,
    "q_gps_round_trip" -> LogQueries.gpsRoundTripSql
  )
}
