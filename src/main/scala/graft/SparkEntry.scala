package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, EventOps}
import graft.scale.{Dedup, Similarity, TextAnalysis, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is an implemented operator from SURVEY.md §2 with
  * a matching DuckDB oracle in `oracleSql` (same column names, same
  * deterministic ordering) unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.topSpenders(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_top_spenders"    -> ((s, d) => Analytics.topSpenders(s, d)),
    "q_filter_project"  -> ((s, d) => Analytics.filterProject(s, d)),
    "q_agg_pricing"     -> ((s, d) => Analytics.aggPricingSummary(s, d)),
    "q_topk_per_group"  -> ((s, d) => Analytics.topOrdersPerPriority(s, d)),
    // same semantics via the custom TopKPerKey physical operator
    // (partial per-partition heaps below the exchange)
    "q_topk_native"     -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.plans.TopKPerKey(
          graft.sources.Tables.orders(s, d)
            .select("o_orderpriority", "o_orderkey", "o_totalprice"),
          3, keys = Seq(col("o_orderpriority")),
          order = Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .orderBy("o_orderpriority", "o_orderkey")
    }),
    "q_recent_form"     -> ((s, d) => Analytics.recentForm(s, d)),
    "q_standings"       -> ((s, d) => Analytics.nationRevenueStandings(s, d)),
    "q_pct_rank"        -> ((s, d) => Analytics.spendPercentile(s, d)),
    "q_h2h_pairs"       -> ((s, d) => Analytics.nationPairTrade(s, d)),
    "q_anti_join"       -> ((s, d) => Analytics.customersWithoutUrgentOrders(s, d)),
    "q_semi_join"       -> ((s, d) => Analytics.customersWithUrgentOrders(s, d)),
    "q_union_distinct"  -> ((s, d) => Analytics.activeNations(s, d)),
    "q_dedup_firstwins" -> ((s, d) => Analytics.dedupLineitems(s, d)),
    "q_running_total"   -> ((s, d) => Analytics.runningSpend(s, d)),
    "q_histogram"       -> ((s, d) => Analytics.priceHistogram(s, d)),
    "q_global_stats"    -> ((s, d) => Analytics.globalStats(s, d)),
    "q_parse_ids"       -> ((s, d) => Analytics.parseCustomerIds(s, d)),
    "q_fuzzy_match"     -> ((s, d) => Analytics.fuzzyBestMatch(s, d)),
    "q_trend"           -> ((s, d) => Analytics.customerTrend(s, d)),
    "q_form_string"     -> ((s, d) => Analytics.formString(s, d)),
    "q_rollup"          -> ((s, d) => Analytics.pricingRollup(s, d)),
    "q_cube"            -> ((s, d) => Analytics.pricingCube(s, d)),
    "q_argmax_segment"  -> ((s, d) => Analytics.bestSegment(s, d)),
    "q_segment_median"  -> ((s, d) => Analytics.segmentMedian(s, d)),
    "q_region_summary"  -> ((s, d) => Analytics.regionSummary(s, d)),
    "q_latest_event"    -> ((s, d) => EventOps.latestEventPerUser(s, d)),
    "q_asof_view"       -> ((s, d) => EventOps.purchasesWithPriorView(s, d)),
    "q_scd2"            -> ((s, d) => EventOps.userValueScd2(s, d)),
    "q_json_props"      -> ((s, d) => EventOps.jsonPropsStats(s, d)),
    "q_upsert_merge"    -> ((s, d) => EventOps.upsertCoalesceMerge(s, d)),
    "q_weekly_rollup"   -> ((s, d) => EventOps.weeklyEventRollup(s, d)),
    "q_open_close"      -> ((s, d) => EventOps.openCloseDaily(s, d)),
    "q_funnel"          -> ((s, d) => EventOps.funnel(s, d)),
    "q_sliding_window"  -> ((s, d) => EventOps.slidingDailyActivity(s, d)),
    "q_cohort"          -> ((s, d) => EventOps.cohortRetention(s, d)),
    "q_sessions"        -> ((s, d) => EventOps.userSessions(s, d)),
    "q_text_stats"      -> ((s, d) => TextAnalysis.docStats(s, d)),
    "q_lang_stats"      -> ((s, d) => TextAnalysis.langStats(s, d)),
    "q_quality_filter"  -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    "q_jaccard_pairs"   -> ((s, d) => Dedup.jaccardPairs(s, d)),
    "q_minhash_pairs"   -> ((s, d) => Dedup.minhashPairs(s, d)),
    "q_knn_cosine"      -> ((s, d) => Similarity.knnBruteForce(s, d)),
    "q_knn_batch"       -> ((s, d) => Similarity.knnBatch(s, d, Seq(0L, 1L, 2L))),
    "q_cosine_dups"     -> ((s, d) => Similarity.cosineDupRoundTrip(s, d)),
    "q_sample_split"    -> ((s, d) => graft.scale.TrainingData.sampleSplit(s, d)),
    "q_seq_pack"        -> ((s, d) => graft.scale.TrainingData.sequencePack(s, d)),
    "q_contamination"   -> ((s, d) => graft.scale.TrainingData.contamination(s, d)),
    "q_curation"        -> ((s, d) => graft.scale.TrainingData.curationPipeline(s, d)),
    "q_match_stats"     -> ((s, d) => graft.sources.FbrefStats.matchStatsFromLineitem(s, d)),
    "q_team_stats"      -> ((s, d) => graft.sources.FbrefStats.teamStatsFromSuppliers(s, d)),
    "q_transfers"       -> ((s, d) => graft.sources.RoundTrip.transfersFromCustomers(s, d)),
    "q_squad"           -> ((s, d) => graft.sources.RoundTrip.squadFromCustomers(s, d)),
    "q_injuries"        -> ((s, d) => graft.sources.RoundTrip.injuriesFromCustomers(s, d)),
    "q_idmap_mapping"   -> ((s, d) => graft.sources.RoundTrip.idmapMapping(s, d)),
    "q_idmap_conflicts" -> ((s, d) => graft.sources.RoundTrip.idmapConflicts(s, d)),
    "q_simhash_pairs"   -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q_dup_clusters"    -> ((s, d) => Dedup.dupClusters(s, d)),
    "q_chunks"          -> ((s, d) => graft.scale.TrainingData.chunkDocs(s, d)),
    "q_pii_redact"      -> ((s, d) => TextAnalysis.piiRedact(s, d)),
    "q_source_mix"      -> ((s, d) => graft.scale.TrainingData.sourceMix(s, d)),
    "q_inverted_index"  -> ((s, d) => graft.scale.Search.invertedIndexQuery(s, d)),
    "q_bm25"            -> ((s, d) => graft.scale.Search.bm25Query(s, d)),
    "q_top_ngrams"      -> ((s, d) => graft.scale.Search.topNgrams(s, d)),
    "q_span_dedup"      -> ((s, d) => graft.scale.Search.spanDedupQuery(s, d)),
    "q_token_stats"     -> ((s, d) => TextAnalysis.tokenStats(s, d)),
    "q_group_sample"    -> ((s, d) => graft.scale.TrainingData.groupSample(s, d)),
    "q_quality_trim"    -> ((s, d) => TextAnalysis.qualityTrim(s, d)),
    "q_range_join"      -> ((s, d) => graft.operators.RangeJoin.nearbyOrders(s, d)),
    "q_bloom_prune"     -> ((s, d) => graft.operators.BloomJoin.cleanMonthlyRevenue(s, d)),
    "q_repetition"      -> ((s, d) => TextAnalysis.repetitionStats(s, d)),
    "q_vocab"           -> ((s, d) => graft.scale.Search.vocabQuery(s, d)),
    "q_pivot"           -> ((s, d) => Analytics.statusPivot(s, d)),
    "q_ntile"           -> ((s, d) => Analytics.spendDeciles(s, d)),
    "q_range_frame"     -> ((s, d) => Analytics.trailingSpend(s, d)),
    "q_outliers"        -> ((s, d) => Analytics.segmentOutliers(s, d)),
    "q_interval_overlap" -> ((s, d) => graft.operators.RangeJoin.overlappingOrderWindows(s, d)),
    "q_frames"          -> ((s, d) => graft.scale.Multimodal.frameIndex(s, d)),
    "q_incr_agg"        -> ((s, d) => Analytics.incrementalGold(s, d)),
    "q_url_stats"       -> ((s, d) => TextAnalysis.urlStats(s, d)),
    "q_grouping_sets"   -> ((s, d) => Analytics.statusPrioritySets(s, d)),
    "q_weighted_sample" -> ((s, d) => graft.scale.TrainingData.weightedSample(s, d)),
    "q_share"           -> ((s, d) => Analytics.revenueShare(s, d)),
    "q_mad"             -> ((s, d) => Analytics.madOutliers(s, d)),
    "q_streaks"         -> ((s, d) => EventOps.activityStreaks(s, d)),
    "q_bpe_merges"      -> ((s, d) => graft.scale.Bpe.mergesQuery(s, d)),
    "q_lm_counts"       -> ((s, d) => graft.scale.LmScore.countsQuery(s, d)),
    "q_career_stats"    -> ((s, d) => graft.sources.RoundTrip.careerFromCustomers(s, d)),
    "q_market_value"    -> ((s, d) => graft.sources.RoundTrip.marketValueFromCustomers(s, d)),
    "q_odds"            -> ((s, d) => graft.sources.RoundTrip.oddsFromCustomers(s, d)),
    "q_fixtures"        -> ((s, d) => graft.sources.RoundTrip.fixturesFromCustomers(s, d)),
    "q_matchday"        -> ((s, d) => graft.sources.RoundTrip.matchdayFromCustomers(s, d)),
    "q_clubs"           -> ((s, d) => graft.sources.RoundTrip.clubsFromCustomers(s, d)),
    "q_clubs_json"      -> ((s, d) => graft.sources.RoundTrip.clubsJsonFromNations(s, d)),
    "q_game_json"       -> ((s, d) => graft.sources.RoundTrip.gameJsonFromCustomers(s, d)),
    "q_live_norm"       -> ((s, d) => graft.sources.RoundTrip.liveNormFromCustomers(s, d)),
    "q_stream_upsert"   -> ((s, d) => graft.streaming.StreamReplay.streamUpsertQuery(s, d)),
    "q_stream_window"   -> ((s, d) => graft.streaming.StreamReplay.streamWindowQuery(s, d)),
    "q_rest_teams"      -> ((s, d) => graft.sources.RoundTrip.restTeamsFromCustomers(s, d)),
    "q_rest_players"    -> ((s, d) => graft.sources.RoundTrip.restPlayersFromCustomers(s, d)),
    "q_rest_matches"    -> ((s, d) => graft.sources.RoundTrip.restMatchesFromCustomers(s, d)),
    "q_game_enrich"     -> ((s, d) => graft.sources.RoundTrip.gameEnrichFromCustomers(s, d)),
    "q_ml_labels"       -> ((s, d) => graft.ml.Models.labelIndexQuery(s, d)),
    "q_exact_dups"      -> ((s, d) => graft.scale.Dedup.exactDupQuery(s, d)),
    "q_lang_id"         -> ((s, d) => graft.scale.TextAnalysis.langIdQuery(s, d)),
    "q_entity_type"     -> ((s, d) => graft.sources.RoundTrip.entityTypeFromCustomers(s, d)),
    "q_normalize"       -> ((s, d) => graft.sources.RoundTrip.normalizeFromCustomers(s, d)),
    "q_fuzzy_ratio"     -> ((s, d) => graft.sources.RoundTrip.fuzzyRatioFromCustomers(s, d)),
    "q_term_map"        -> ((s, d) => graft.sources.RoundTrip.termMapFromCustomers(s, d)),
    "q_fuzzy_approx"    -> ((s, d) => graft.sources.RoundTrip.fuzzyApproxFromCustomers(s, d)),
    "q_jaro_winkler"    -> ((s, d) => graft.sources.RoundTrip.jaroWinklerFromCustomers(s, d)),
    "q_skyline"         -> ((s, d) => graft.operators.Skyline.skylineQuery(s, d)),
    "q_prefix_join"     -> ((s, d) => Dedup.prefixJoinQuery(s, d)),
    "q_winnow_pairs"    -> ((s, d) => TextAnalysis.winnowPairsQuery(s, d)),
    "q_regression"      -> ((s, d) => graft.operators.Regression.regressionQuery(s, d)),
    "q_union_byname"    -> ((s, d) => graft.operators.Merge.schemaDriftQuery(s, d)),
    "q_table_diff"      -> ((s, d) => graft.operators.Reconcile.tableDiffQuery(s, d)),
    "q_triangles"       -> ((s, d) => graft.operators.Triangles.triangleQuery(s, d)),
    "q_moments"         -> ((s, d) => graft.operators.Regression.momentsQuery(s, d)),
    "q_unpivot"         -> ((s, d) => graft.operators.Reshape.unpivotQuery(s, d)),
    "q_set_ops"         -> ((s, d) => graft.operators.Reshape.setOpsQuery(s, d)),
    "q_heavy_hitters"   -> ((s, d) => graft.operators.Approx.heavyTokensQuery(s, d)),
    "q_zorder"          -> ((s, d) => graft.scale.Layout.zvalueQuery(s, d)),
    "q_salted_join"     -> ((s, d) => graft.operators.Skew.saltedOrdersQuery(s, d)),
    "q_validate"        -> ((s, d) => graft.operators.Validate.quarantineQuery(s, d)),
    "q_cdc_apply"       -> ((s, d) => graft.operators.Cdc.cdcApplyQuery(s, d)),
    "q_incr_join"       -> ((s, d) => graft.operators.Incremental.incrJoinQuery(s, d)),
    "q_embed_stats"     -> ((s, d) => graft.scale.EmbedStats.embedStatsQuery(s, d)),
    "q_hilbert"         -> ((s, d) => graft.scale.Layout.hilbertQuery(s, d)),
    "q_bpe_encode"      -> ((s, d) => graft.scale.Bpe.encodeQuery(s, d)),
    "q_temp_mix"        -> ((s, d) => graft.scale.TrainingData.temperatureMix(s, d)),
    "q_novelty"         -> ((s, d) => TextAnalysis.noveltyCurve(s, d)),
    "q_source_overlap"  -> ((s, d) => TextAnalysis.sourceOverlap(s, d)),
    "q_length_buckets"  -> ((s, d) => graft.scale.TrainingData.lengthBuckets(s, d)),
    "q_pagerank"        -> ((s, d) => graft.operators.PageRank.pagerankQuery(s, d)),
    "q_semantic_keep"   -> ((s, d) => Similarity.semanticKeep(s, d)),
    "q_importance"      -> ((s, d) => graft.scale.TrainingData.importanceScores(s, d)),
    "q_skew_profile"    -> ((s, d) => graft.operators.Skew.skewProfileQuery(s, d)),
    "q_kcore"           -> ((s, d) => graft.operators.KCore.kcoreQuery(s, d)),
    "q_bfs"             -> ((s, d) => graft.operators.KCore.bfsQuery(s, d)),
    "q_shuffle"         -> ((s, d) => graft.scale.TrainingData.shuffleQuery(s, d)),
    "q_join_size"       -> ((s, d) => graft.operators.Skew.joinSizeQuery(s, d)),
    "q_gap_fill"        -> ((s, d) => EventOps.gapFillDaily(s, d)),
    "q_transitions"     -> ((s, d) => EventOps.eventTransitions(s, d)),
    "q_decay"           -> ((s, d) => EventOps.decayedUserValue(s, d)),
    "q_pmi"             -> ((s, d) => graft.scale.Search.pmiQuery(s, d)),
    "q_oov"             -> ((s, d) => graft.scale.Search.oovQuery(s, d)),
    "q_profile"         -> ((s, d) => graft.operators.Profile.lineitemProfile(s, d)),
    "q_containment"     -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q_table_digest"    -> ((s, d) => graft.operators.Reconcile.tableDigestQuery(s, d)),
    "q_log2_hist"       -> ((s, d) => graft.operators.Approx.log2Histogram(s, d)),
    "q_sorted_neighborhood" -> ((s, d) => graft.operators.Joins.sortedNeighborhoodQuery(s, d)),
    "q_kmeans"          -> ((s, d) => graft.operators.KMeans.kmeansQuery(s, d)),
    "q_cluster_purity"  -> ((s, d) => graft.operators.KMeans.clusterPurityQuery(s, d)),
    "q_tfidf"           -> ((s, d) => graft.scale.Search.tfidfQuery(s, d)),
    "q_interval_union"  -> ((s, d) => EventOps.intervalUnion(s, d)),
    "q_autocorr"        -> ((s, d) => graft.operators.Regression.autocorrQuery(s, d)),
    "q_degree_dist"     -> ((s, d) => graft.operators.KCore.degreeDistQuery(s, d)),
    "q_dataset_card"    -> ((s, d) => graft.scale.TrainingData.datasetCardQuery(s, d)),
    "q_wow"             -> ((s, d) => Analytics.weekOverWeek(s, d)),
    "q_mode"            -> ((s, d) => Analytics.modalPriority(s, d)),
    "q_fano"            -> ((s, d) => EventOps.dailyFano(s, d)),
    "q_dup_rate"        -> ((s, d) => Dedup.dupRateBySource(s, d)),
    "q_hist2d"          -> ((s, d) => graft.operators.Approx.hist2d(s, d)),
    "q_conv_lag"        -> ((s, d) => EventOps.conversionLag(s, d)),
    "q_seasonality"     -> ((s, d) => EventOps.weekdaySeasonality(s, d)),
    "q_ab_lift"         -> ((s, d) => EventOps.abLift(s, d)),
    "q_bipartite"       -> ((s, d) => graft.operators.Joins.bipartiteProjectionQuery(s, d)),
    "q_simpson"         -> ((s, d) => TextAnalysis.languageSimpson(s, d)),
    "q_rfm"             -> ((s, d) => EventOps.rfmSegments(s, d)),
    "q_time_travel"     -> ((s, d) => EventOps.timeTravel(s, d)),
    "q_graph_jaccard"   -> ((s, d) => graft.operators.Joins.graphJaccardQuery(s, d)),
    "q_coverage"        -> ((s, d) => graft.scale.Search.coverageQuery(s, d)),
    "q_keyness"         -> ((s, d) => graft.scale.Search.keynessQuery(s, d)),
    "q_paths"           -> ((s, d) => EventOps.frequentPaths(s, d)),
    "q_churn"           -> ((s, d) => EventOps.churn(s, d)),
    "q_purchase_gaps"   -> ((s, d) => EventOps.purchaseGaps(s, d)),
    "q_anomaly_days"    -> ((s, d) => EventOps.anomalousDays(s, d)),
    "q_basket_lift"     -> ((s, d) => Analytics.basketLift(s, d)),
    "q_movers"          -> ((s, d) => Analytics.rankMovers(s, d)),
    "q_clustering"      -> ((s, d) => graft.operators.Triangles.clusteringQuery(s, d)),
    "q_assortativity"   -> ((s, d) => graft.operators.Triangles.assortativityQuery(s, d)),
    "q_hhi"             -> ((s, d) => Analytics.revenueHhi(s, d)),
    "q_gini"            -> ((s, d) => Analytics.spendGini(s, d)),
    "q_boxplot"         -> ((s, d) => Analytics.segmentBoxplot(s, d)),
    "q_benford"         -> ((s, d) => Analytics.benfordDigits(s, d)),
    "q_pareto"          -> ((s, d) => Analytics.paretoCurve(s, d)),
    "q_growth_accounting" -> ((s, d) => EventOps.growthAccounting(s, d)),
    "q_stickiness"      -> ((s, d) => EventOps.stickiness(s, d)),
    "q_label_balance"   -> ((s, d) => graft.scale.EmbedStats.labelBalanceQuery(s, d)),
    "q_ks"              -> ((s, d) => graft.operators.Distribution.ksTest(s, d)),
    "q_chi2"            -> ((s, d) => graft.operators.Distribution.chi2Contingency(s, d)),
    "q_percentile_bands" -> ((s, d) => graft.operators.Distribution.percentileBands(s, d)),
    "q_cum_distinct"    -> ((s, d) => graft.operators.TimeSeries.cumulativeDistinctUsers(s, d)),
    "q_bollinger"       -> ((s, d) => graft.operators.TimeSeries.bollingerBands(s, d)),
    "q_ewma"            -> ((s, d) => graft.operators.TimeSeries.ewmaRevenue(s, d)),
    "q_debounce"        -> ((s, d) => EventOps.debounceStats(s, d)),
    "q_nearest_event"   -> ((s, d) => EventOps.nearestViewToPurchase(s, d)),
    "q_minhash_acc"     -> ((s, d) => Dedup.minhashCalibration(s, d)),
    "q_local_clustering" -> ((s, d) => graft.operators.Triangles.localClusteringQuery(s, d)),
    "q_cusum"           -> ((s, d) => graft.operators.TimeSeries.cusumChangepoint(s, d)),
    "q_fk_audit"        -> ((s, d) => graft.operators.Profile.fkAudit(s, d)),
    "q_runs"            -> ((s, d) => graft.operators.TimeSeries.runsTest(s, d)),
    "q_ooo_rate"        -> ((s, d) => EventOps.outOfOrderRate(s, d)),
    "q_langid_eval"     -> ((s, d) => TextAnalysis.langIdEval(s, d)),
    "q_boilerplate"     -> ((s, d) => TextAnalysis.boilerplatePrefixes(s, d)),
    "q_dedup_savings"   -> ((s, d) => TextAnalysis.dedupSavings(s, d)),
    "q_allocation"      -> ((s, d) => TrainingData.budgetAllocation(s, d)),
    "q_split_leakage"   -> ((s, d) => TrainingData.splitLeakage(s, d)),
    "q_psi_drift"       -> ((s, d) => graft.operators.Distribution.distributionDrift(s, d)),
    "q_cohort_ltv"      -> ((s, d) => EventOps.cohortLtv(s, d)),
    "q_dwell"           -> ((s, d) => EventOps.dwellStats(s, d)),
    "q_neg_sample"      -> ((s, d) => TrainingData.negativeSampling(s, d)),
    "q_feature_hash"    -> ((s, d) => TrainingData.featureHashProfile(s, d)),
    "q_heaps"           -> ((s, d) => graft.scale.Search.heapsCurve(s, d)),
    "q_k_anon"          -> ((s, d) => graft.operators.Profile.kAnonymity(s, d)),
    "q_abc"             -> ((s, d) => Analytics.abcAnalysis(s, d)),
    "q_error_bound"     -> ((s, d) => EventOps.errorRateBounds(s, d)),
    "q_weighted_median" -> ((s, d) => graft.operators.Distribution.weightedMedian(s, d)),
    "q_simpsons_paradox" -> ((s, d) => graft.operators.Distribution.simpsonsParadox(s, d)),
    "q_ship_latency"    -> ((s, d) => graft.operators.TimeSeries.shipLatency(s, d)),
    "q_backlog"         -> ((s, d) => graft.operators.TimeSeries.backlogCurve(s, d)),
    "q_abandonment"     -> ((s, d) => EventOps.abandonment(s, d)),
    "q_concurrency"     -> ((s, d) => EventOps.peakConcurrency(s, d)),
    "q_double_charge"   -> ((s, d) => Analytics.doubleCharge(s, d)),
    "q_recs"            -> ((s, d) => Analytics.itemRecommendations(s, d)),
    "q_brand_margin"    -> ((s, d) => Analytics.brandMargin(s, d)),
    "q_single_source"   -> ((s, d) => Analytics.singleSourceRisk(s, d)),
    "q_quant_error"     -> ((s, d) => graft.scale.EmbedStats.quantErrorQuery(s, d)),
    "q_delta_bits"      -> ((s, d) => graft.scale.Layout.deltaEncodingProfile(s, d)),
    "q_mannwhitney"     -> ((s, d) => graft.operators.Distribution.mannWhitney(s, d)),
    "q_dim_variance"    -> ((s, d) => graft.scale.EmbedStats.dimVarianceQuery(s, d)),
    "q_spearman"        -> ((s, d) => graft.operators.Distribution.spearman(s, d)),
    "q_benford_gof"     -> ((s, d) => Analytics.benfordGof(s, d)),
    "q_srm"             -> ((s, d) => EventOps.sampleRatioMismatch(s, d)),
    "q_prop_test"       -> ((s, d) => graft.operators.Distribution.twoProportionTest(s, d)),
    "q_anova"           -> ((s, d) => graft.operators.Distribution.anovaWeekday(s, d)),
    "q_winsorized"      -> ((s, d) => graft.operators.Distribution.winsorizedMean(s, d)),
    "q_gini_segments"   -> ((s, d) => Analytics.giniBySegment(s, d)),
    "q_welch"           -> ((s, d) => graft.operators.Distribution.welchTTest(s, d)),
    "q_kendall"         -> ((s, d) => graft.operators.Distribution.kendallTau(s, d)),
    "q_grubbs"          -> ((s, d) => graft.operators.Distribution.grubbsTest(s, d)),
    "q_corr_matrix"     -> ((s, d) => graft.operators.Regression.corrMatrix(s, d)),
    "q_shards"          -> ((s, d) => TrainingData.balancedShards(s, d)),
    "q_attribution"     -> ((s, d) => EventOps.attribution(s, d)),
    "q_sax"             -> ((s, d) => graft.operators.TimeSeries.saxSymbols(s, d)),
    "q_basket3"         -> ((s, d) => Analytics.tripleItemsets(s, d)),
    "q_fertility"       -> ((s, d) => graft.scale.TextAnalysis.fertilityByLang(s, d)),
    "q_auc"             -> ((s, d) => graft.ml.Eval.aucQuery(s, d)),
    "q_calibration"     -> ((s, d) => graft.ml.Eval.calibrationQuery(s, d)),
    "q_decompose"       -> ((s, d) => graft.operators.TimeSeries.weekdayDecomposition(s, d)),
    "q_cms"             -> ((s, d) => graft.operators.Approx.countMinSketch(s, d)),
    "q_hll"             -> ((s, d) => graft.operators.Approx.hllEstimate(s, d)),
    "q_lorenz"          -> ((s, d) => Analytics.lorenzCurve(s, d)),
    "q_hazard"          -> ((s, d) => graft.operators.TimeSeries.reorderHazard(s, d)),
    "q_backtest"        -> ((s, d) => graft.operators.TimeSeries.seasonalNaiveBacktest(s, d)),
    "q_kmv"             -> ((s, d) => graft.operators.Approx.kmvEstimate(s, d)),
    "q_bootstrap"       -> ((s, d) => graft.operators.Distribution.poissonBootstrap(s, d)),
    "q_price_index"     -> ((s, d) => Analytics.priceIndices(s, d)),
    "q_pca_power"       -> ((s, d) => graft.scale.EmbedStats.pcaPowerQuery(s, d)),
    "q_modularity"      -> ((s, d) => graft.operators.Triangles.modularityQuery(s, d)),
    "q_f1"              -> ((s, d) => graft.scale.TextAnalysis.f1Report(s, d)),
    "q_polyfit"         -> ((s, d) => graft.operators.Regression.polyfitQuery(s, d)),
    "q_theil_sen"       -> ((s, d) => graft.operators.Regression.theilSenQuery(s, d)),
    "q_wasserstein"     -> ((s, d) => graft.operators.Distribution.wassersteinDistance(s, d)),
    "q_stationary"      -> ((s, d) => EventOps.stationaryDistribution(s, d)),
    "q_did"             -> ((s, d) => graft.operators.Distribution.diffInDiff(s, d)),
    "q_pca_project"     -> ((s, d) => graft.scale.EmbedStats.pcaProjectionQuery(s, d)),
    "q_ipf"             -> ((s, d) => graft.operators.Distribution.ipfRaking(s, d)),
    "q_cramers_v"       -> ((s, d) => graft.operators.Distribution.cramersV(s, d)),
    "q_mcnemar"         -> ((s, d) => graft.operators.Distribution.mcnemarTest(s, d)),
    "q_kappa"           -> ((s, d) => graft.scale.TextAnalysis.cohenKappa(s, d)),
    "q_partial_corr"    -> ((s, d) => graft.operators.Regression.partialCorrQuery(s, d)),
    "q_hits"            -> ((s, d) => graft.operators.PageRank.hitsQuery(s, d)),
    "q_label_prop"      -> ((s, d) => graft.operators.PageRank.labelPropQuery(s, d)),
    "q_component_sizes" -> ((s, d) => Dedup.componentSizeDist(s, d)),
    "q_mann_kendall"    -> ((s, d) => graft.operators.TimeSeries.mannKendall(s, d)),
    "q_rbo"             -> ((s, d) => graft.scale.Search.rboQuery(s, d)),
    "q_xval_folds"      -> ((s, d) => TrainingData.xvalFolds(s, d)),
    "q_centroid_classify" -> ((s, d) => graft.scale.EmbedStats.centroidClassifyQuery(s, d)),
    "q_markov_acc"      -> ((s, d) => EventOps.markovAccuracy(s, d)),
    "q_mde"             -> ((s, d) => graft.operators.Distribution.mdeQuery(s, d)),
    "q_kmv_union"       -> ((s, d) => graft.operators.Approx.kmvUnion(s, d)),
    "q_stylometry"      -> ((s, d) => TextAnalysis.burrowsDelta(s, d)),
    "q_grid_cluster"    -> ((s, d) => graft.scale.EmbedStats.gridClusterQuery(s, d)),
    "q_textrank"        -> ((s, d) => graft.scale.Search.textrankQuery(s, d)),
    "q_phonetic"        -> ((s, d) => graft.operators.EntityResolution.phoneticBlocksQuery(s, d)),
    "q_mmr"             -> ((s, d) => Similarity.mmrSelect(s, d)),
    "q_hbos"            -> ((s, d) => graft.scale.EmbedStats.hbosQuery(s, d)),
    "q_ndcg"            -> ((s, d) => graft.ml.Eval.ndcgQuery(s, d)),
    "q_conformal"       -> ((s, d) => graft.ml.Eval.conformalQuery(s, d)),
    "q_friedman"        -> ((s, d) => graft.operators.Distribution.friedmanQuery(s, d)),
    "q_cochran_q"       -> ((s, d) => graft.operators.Distribution.cochranQ(s, d)),
    "q_stump"           -> ((s, d) => graft.ml.Eval.stumpQuery(s, d)),
    "q_silhouette"      -> ((s, d) => graft.scale.EmbedStats.silhouetteQuery(s, d)),
    "q_kcenter"         -> ((s, d) => Similarity.kcenterSelect(s, d)),
    "q_sssp"            -> ((s, d) => graft.operators.KCore.ssspQuery(s, d)),
    "q_cdc_chunks"      -> ((s, d) => TextAnalysis.cdcChunksQuery(s, d)),
    "q_hhi"             -> ((s, d) => graft.operators.Analytics.hhiQuery(s, d)),
    "q_hist_median"     -> ((s, d) => graft.operators.Approx.histMedianQuery(s, d)),
    "q_ann_recall"      -> ((s, d) => Similarity.annRecallQuery(s, d)),
    "q_walks"           -> ((s, d) => graft.operators.KCore.walksQuery(s, d)),
    "q_link_pred"       -> ((s, d) => graft.operators.KCore.linkPredQuery(s, d)),
    "q_cuped"           -> ((s, d) => graft.operators.Distribution.cupedQuery(s, d)),
    "q_tv_drift"        -> ((s, d) => graft.operators.Distribution.tvDriftQuery(s, d)),
    "q_max_cover"       -> ((s, d) => TrainingData.maxCoverSelect(s, d)),
    "q_budget_select"   -> ((s, d) => TrainingData.budgetSelect(s, d)),
    "q_join_size"       -> ((s, d) => graft.operators.Profile.joinSizeQuery(s, d)),
    "q_kn_counts"       -> ((s, d) => graft.scale.LmScore.knCountsQuery(s, d)),
    "q_phrase_search"   -> ((s, d) => graft.scale.Search.phraseSearchQuery(s, d)),
    "q_rendezvous"      -> ((s, d) => TrainingData.rendezvousQuery(s, d)),
    "q_weak_labels"     -> ((s, d) => TrainingData.weakLabelsQuery(s, d)),
    "q_pr_curve"        -> ((s, d) => graft.ml.Eval.prCurveQuery(s, d)),
    "q_fleiss"          -> ((s, d) => graft.ml.Eval.fleissKappaQuery(s, d)),
    "q_effective_dim"   -> ((s, d) => graft.scale.EmbedStats.effectiveDimQuery(s, d)),
    "q_padding_waste"   -> ((s, d) => TrainingData.paddingWasteQuery(s, d)),
    "q_quantile_norm"   -> ((s, d) => TextAnalysis.quantileNormQuery(s, d)),
    "q_bh_fdr"          -> ((s, d) => graft.operators.Distribution.bhFdrQuery(s, d)),
    "q_holm"            -> ((s, d) => graft.operators.Distribution.holmQuery(s, d)),
    "q_degree_central"  -> ((s, d) => graft.operators.KCore.degreeCentralizationQuery(s, d)),
    "q_blocking_eval"   -> ((s, d) => graft.scale.Dedup.blockingEvalQuery(s, d)),
    "q_hurst_rs"        -> ((s, d) => graft.operators.TimeSeries.hurstRsQuery(s, d)),
    "q_youden"          -> ((s, d) => graft.ml.Eval.youdenQuery(s, d)),
    "q_vocab_coverage"  -> ((s, d) => graft.scale.Search.vocabCoverageQuery(s, d)),
    "q_jl_distortion"   -> ((s, d) => graft.scale.EmbedStats.jlDistortionQuery(s, d)),
    "q_diameter"        -> ((s, d) => graft.operators.KCore.diameterQuery(s, d)),
    "q_burstiness"      -> ((s, d) => graft.operators.EventOps.burstinessQuery(s, d)),
    "q_neyman"          -> ((s, d) => graft.operators.Distribution.neymanQuery(s, d)),
    "q_fisher"          -> ((s, d) => graft.scale.EmbedStats.fisherQuery(s, d)),
    "q_dim_corr"        -> ((s, d) => graft.scale.EmbedStats.dimCorrQuery(s, d)),
    "q_compaction"      -> ((s, d) => graft.scale.Layout.compactionPlanQuery(s, d)),
    "q_perm_test"       -> ((s, d) => graft.operators.Distribution.permTestQuery(s, d)),
    "q_mattr"           -> ((s, d) => TextAnalysis.mattrQuery(s, d)),
    "q_wilson"          -> ((s, d) => graft.operators.Distribution.wilsonQuery(s, d)),
    "q_jackknife"       -> ((s, d) => graft.operators.Distribution.jackknifeQuery(s, d)),
    "q_seq3"            -> ((s, d) => graft.operators.EventOps.seq3Query(s, d)),
    "q_dedup_sweep"     -> ((s, d) => graft.scale.Dedup.dedupSweepQuery(s, d)),
    "q_qq"              -> ((s, d) => graft.operators.Distribution.qqQuery(s, d)),
    "q_smd"             -> ((s, d) => graft.operators.Distribution.smdQuery(s, d)),
    "q_vad_spans"       -> ((s, d) => graft.scale.Multimodal.vadSpansQuery(s, d)),
    "q_icc"             -> ((s, d) => graft.operators.Distribution.iccQuery(s, d)),
    "q_mark_recapture"  -> ((s, d) => graft.operators.Approx.markRecaptureQuery(s, d)),
    "q_chao1"           -> ((s, d) => graft.scale.Search.chao1Query(s, d)),
    "q_good_turing"     -> ((s, d) => graft.scale.Search.goodTuringQuery(s, d)),
    "q_ca_trend"        -> ((s, d) => graft.operators.Distribution.caTrendQuery(s, d)),
    "q_band_sweep"      -> ((s, d) => graft.scale.Dedup.bandSweepQuery(s, d)),
    "q_cvm"             -> ((s, d) => graft.operators.Distribution.cvmTest(s, d)),
    "q_paired_t"        -> ((s, d) => graft.operators.Distribution.pairedTQuery(s, d)),
    "q_gk_lambda"       -> ((s, d) => graft.operators.Distribution.gkLambdaQuery(s, d)),
    "q_changepoint"     -> ((s, d) => graft.operators.TimeSeries.changepointQuery(s, d)),
    "q_drawdown"        -> ((s, d) => graft.operators.TimeSeries.drawdownQuery(s, d)),
    "q_l_diversity"     -> ((s, d) => graft.operators.Profile.lDiversity(s, d)),
    "q_t_closeness"     -> ((s, d) => graft.operators.Profile.tCloseness(s, d)),
    "q_pacf"            -> ((s, d) => graft.operators.Regression.pacfQuery(s, d)),
    "q_mahalanobis"     -> ((s, d) => graft.operators.Distribution.mahalanobisQuery(s, d)),
    "q_readability"     -> ((s, d) => graft.scale.TextAnalysis.readabilityQuery(s, d)),
    "q_zipf"            -> ((s, d) => graft.scale.TextAnalysis.zipfQuery(s, d)),
    "q_zonemap"         -> ((s, d) => graft.scale.Layout.zonemapQuery(s, d)),
    "q_scene_cuts"      -> ((s, d) => graft.scale.Multimodal.sceneCutsQuery(s, d)),
    "q_dbscan_core"     -> ((s, d) => graft.scale.EmbedStats.dbscanCoreQuery(s, d)),
    "q_rrf"             -> ((s, d) => graft.scale.Search.rrfQuery(s, d)),
    "q_kruskal"         -> ((s, d) => graft.operators.Distribution.kruskalQuery(s, d)),
    "q_cronbach"        -> ((s, d) => graft.operators.Distribution.cronbachQuery(s, d)),
    "q_dispersion"      -> ((s, d) => graft.operators.TimeSeries.dispersionQuery(s, d)),
    "q_pps_sample"      -> ((s, d) => graft.scale.TrainingData.ppsSampleQuery(s, d)),
    "q_levene"          -> ((s, d) => graft.operators.Distribution.leveneQuery(s, d)),
    "q_tukey"           -> ((s, d) => graft.operators.Distribution.tukeyQuery(s, d)),
    "q_pettitt"         -> ((s, d) => graft.operators.Distribution.pettittQuery(s, d)),
    "q_rich_club"       -> ((s, d) => graft.operators.KCore.richClubQuery(s, d)),
    "q_peaks"           -> ((s, d) => graft.operators.TimeSeries.peaksQuery(s, d)),
    "q_cmh"             -> ((s, d) => graft.operators.Distribution.cmhQuery(s, d)),
    "q_tail_dep"        -> ((s, d) => graft.operators.Distribution.tailDepQuery(s, d)),
    "q_mutual_knn"      -> ((s, d) => graft.scale.Similarity.mutualKnnQuery(s, d)),
    "q_mmd"             -> ((s, d) => graft.scale.EmbedStats.mmdQuery(s, d)),
    "q_calinski"        -> ((s, d) => graft.scale.EmbedStats.calinskiQuery(s, d)),
    "q_xcorr"           -> ((s, d) => graft.operators.Regression.xcorrQuery(s, d)),
    "q_jarque_bera"     -> ((s, d) => graft.operators.Distribution.jarqueBera(s, d)),
    "q_eb_shrinkage"    -> ((s, d) => graft.operators.Distribution.ebShrinkage(s, d)),
    "q_durbin_watson"   -> ((s, d) => graft.operators.TimeSeries.durbinWatson(s, d)),
    "q_rsi"             -> ((s, d) => graft.operators.TimeSeries.rsi(s, d)),
    "q_closeness"       -> ((s, d) => graft.operators.KCore.closenessQuery(s, d)),
    "q_harmonic"        -> ((s, d) => graft.operators.KCore.harmonicQuery(s, d)),
    "q_lof"             -> ((s, d) => graft.scale.Similarity.lofQuery(s, d)),
    "q_moran"           -> ((s, d) => graft.operators.KCore.moranQuery(s, d)),
    "q_geary"           -> ((s, d) => graft.operators.KCore.gearyQuery(s, d)),
    "q_katz"            -> ((s, d) => graft.operators.KCore.katzQuery(s, d)),
    "q_cliffs_delta"    -> ((s, d) => graft.operators.Distribution.cliffsDelta(s, d)),
    "q_hodges_lehmann"  -> ((s, d) => graft.operators.Distribution.hodgesLehmann(s, d)),
    "q_strat_ate"       -> ((s, d) => graft.operators.Distribution.stratAte(s, d)),
    "q_granger"         -> ((s, d) => graft.operators.Regression.grangerQuery(s, d)),
    "q_var_es"          -> ((s, d) => graft.operators.TimeSeries.varEs(s, d)),
    "q_mcc"             -> ((s, d) => graft.ml.Eval.mccQuery(s, d)),
    "q_cooks"           -> ((s, d) => graft.operators.Regression.cooksQuery(s, d)),
    "q_oaxaca"          -> ((s, d) => graft.operators.Regression.oaxacaQuery(s, d)),
    "q_atkinson"        -> ((s, d) => graft.operators.Distribution.atkinsonQuery(s, d)),
    "q_constraint"      -> ((s, d) => graft.operators.KCore.constraintQuery(s, d)),
    "q_ljung_box"       -> ((s, d) => graft.operators.Regression.ljungBoxQuery(s, d)),
    "q_elasticity"      -> ((s, d) => graft.operators.Analytics.elasticityQuery(s, d)),
    "q_pvm"             -> ((s, d) => graft.operators.Analytics.pvmQuery(s, d)),
    "q_hellinger"       -> ((s, d) => graft.operators.Distribution.hellingerQuery(s, d)),
    "q_spectrum"        -> ((s, d) => graft.operators.TimeSeries.spectrumQuery(s, d)),
    "q_graph_churn"     -> ((s, d) => graft.operators.KCore.graphChurnQuery(s, d)),
    "q_pref_attach"     -> ((s, d) => graft.operators.KCore.prefAttachQuery(s, d)),
    "q_nelson_aalen"    -> ((s, d) => graft.operators.TimeSeries.nelsonAalen(s, d)),
    "q_huber"           -> ((s, d) => graft.operators.Distribution.huberQuery(s, d)),
    "q_iv_wald"         -> ((s, d) => graft.operators.Regression.ivWaldQuery(s, d)),
    "q_knn_acc"         -> ((s, d) => graft.scale.Similarity.knnAccQuery(s, d)),
    "q_dunn"            -> ((s, d) => graft.scale.EmbedStats.dunnQuery(s, d)),
    "q_davies_bouldin"  -> ((s, d) => graft.scale.EmbedStats.daviesBouldinQuery(s, d)),
    "q_ari"             -> ((s, d) => graft.scale.EmbedStats.ariQuery(s, d)),
    "q_chow"            -> ((s, d) => graft.operators.Regression.chowQuery(s, d)),
    "q_median_polish"   -> ((s, d) => graft.operators.TimeSeries.medianPolish(s, d)),
    "q_dtw"             -> ((s, d) => graft.operators.TimeSeries.dtwQuery(s, d)),
    "q_matrix_profile"  -> ((s, d) => graft.operators.TimeSeries.matrixProfile(s, d)),
    "q_haar"            -> ((s, d) => graft.operators.TimeSeries.haarQuery(s, d)),
    "q_rdd"             -> ((s, d) => graft.operators.Regression.rddQuery(s, d)),
    "q_gini_between"    -> ((s, d) => graft.operators.Distribution.giniBetweenQuery(s, d)),
    "q_xyz"             -> ((s, d) => graft.operators.Analytics.xyzQuery(s, d)),
    "q_safety_stock"    -> ((s, d) => graft.operators.Analytics.safetyStockQuery(s, d)),
    "q_dq_scorecard"    -> ((s, d) => graft.operators.Profile.dqScorecard(s, d)),
    "q_p_chart"         -> ((s, d) => graft.operators.TimeSeries.pChartQuery(s, d)),
    "q_cpk"             -> ((s, d) => graft.operators.Distribution.cpkQuery(s, d)),
    "q_risk_metrics"    -> ((s, d) => graft.operators.TimeSeries.riskMetrics(s, d)),
    "q_segment_migration" -> ((s, d) => graft.operators.Analytics.segmentMigrationQuery(s, d)),
    "q_nrr"             -> ((s, d) => graft.operators.Analytics.nrrQuery(s, d)),
    "q_abc_xyz"         -> ((s, d) => graft.operators.Analytics.abcXyzQuery(s, d)),
    "q_ktruss"          -> ((s, d) => graft.operators.KCore.ktrussQuery(s, d)),
    "q_gk_gamma"        -> ((s, d) => graft.operators.Distribution.gkGammaQuery(s, d)),
    "q_logrank"         -> ((s, d) => graft.operators.TimeSeries.logrankQuery(s, d)),
    "q_breslow_day"     -> ((s, d) => graft.operators.Distribution.breslowDayQuery(s, d)),
    "q_xbar_r"          -> ((s, d) => graft.operators.TimeSeries.xbarRQuery(s, d)),
    "q_meta_fixed"      -> ((s, d) => graft.operators.Distribution.metaFixedQuery(s, d)),
    "q_seasonal_anomaly" -> ((s, d) => graft.operators.TimeSeries.seasonalAnomaly(s, d)),
    "q_hoover"          -> ((s, d) => graft.operators.Distribution.hooverQuery(s, d)),
    "q_palma"           -> ((s, d) => graft.operators.Distribution.palmaQuery(s, d)),
    "q_lorenz_asym"     -> ((s, d) => graft.operators.Distribution.lorenzAsymQuery(s, d)),
    "q_group_sequential" -> ((s, d) => graft.operators.Distribution.groupSequentialQuery(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_top_spenders" ->
      """SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
        |       count(*) AS order_cnt,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_spend
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1, 2, 3
        |HAVING count(*) >= 5
        |ORDER BY total_spend DESC, c.c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       year(l_shipdate) AS ship_year,
        |       CASE WHEN l_quantity < 20 THEN 'small'
        |            WHEN l_quantity < 35 THEN 'medium'
        |            ELSE 'large' END AS size_class
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '2000-12-31'
        |  AND l_returnflag = 'N' AND l_quantity > 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |      FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q_recent_form" ->
      """SELECT o_custkey,
        |       count(*) AS recent_cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS recent_spend,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS recent_avg
        |FROM (SELECT o_custkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn <= 5
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q_standings" ->
      """SELECT region_name, nation_name, revenue,
        |       rank() OVER (PARTITION BY region_name
        |                    ORDER BY revenue DESC, nation_name ASC) AS position
        |FROM (SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |      FROM orders o
        |      JOIN customer c ON o.o_custkey = c.c_custkey
        |      JOIN nation n ON c.c_nationkey = n.n_nationkey
        |      JOIN region r ON n.n_regionkey = r.r_regionkey
        |      GROUP BY 1, 2)
        |ORDER BY region_name, position, nation_name""".stripMargin,

    "q_pct_rank" ->
      """SELECT o_custkey, total_spend,
        |       percent_rank() OVER (ORDER BY total_spend ASC, o_custkey ASC) AS spend_pct_rank
        |FROM (SELECT o_custkey,
        |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |      FROM orders GROUP BY o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q_h2h_pairs" ->
      """SELECT least(c.c_nationkey, s.s_nationkey) AS nation_lo,
        |       greatest(c.c_nationkey, s.s_nationkey) AS nation_hi,
        |       count(*) AS trade_cnt,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS trade_value
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY trade_value DESC, nation_lo ASC, nation_hi ASC
        |LIMIT 25""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT u.nationkey, n.n_name
        |FROM (SELECT c_nationkey AS nationkey FROM customer
        |      UNION
        |      SELECT s_nationkey FROM supplier) u
        |JOIN nation n ON u.nationkey = n.n_nationkey
        |ORDER BY u.nationkey""".stripMargin,

    "q_dedup_firstwins" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
        |FROM (SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        |             row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |                                ORDER BY l_linenumber ASC, l_quantity ASC, l_extendedprice ASC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey, l_partkey""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_histogram" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'p0_under_1k'
        |            WHEN o_totalprice < 5000 THEN 'p1_1k_5k'
        |            WHEN o_totalprice < 20000 THEN 'p2_5k_20k'
        |            ELSE 'p3_over_20k' END AS price_bucket,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |FROM orders
        |GROUP BY 1
        |ORDER BY price_bucket""".stripMargin,

    "q_global_stats" ->
      """SELECT count(*) AS row_cnt,
        |       count(DISTINCT l_orderkey) AS order_cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(count(*) AS DOUBLE) / count(DISTINCT l_orderkey) AS lines_per_order
        |FROM lineitem""".stripMargin,

    "q_parse_ids" ->
      """SELECT c_custkey,
        |       CAST(regexp_extract(c_name, '#([0-9]+)', 1) AS BIGINT) AS parsed_id,
        |       lower(c_mktsegment) AS segment_lc
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_fuzzy_match" ->
      """SELECT s_suppkey, c_custkey, ratio
        |FROM (SELECT s.s_suppkey, c.c_custkey,
        |             CAST(round(100 * (1 - CAST(levenshtein(s.s_name, c.c_name) AS DOUBLE)
        |                  / greatest(length(s.s_name), length(c.c_name)))) AS INT) AS ratio,
        |             row_number() OVER (PARTITION BY s.s_suppkey
        |                                ORDER BY CAST(round(100 * (1 - CAST(levenshtein(s.s_name, c.c_name) AS DOUBLE)
        |                                     / greatest(length(s.s_name), length(c.c_name)))) AS INT) DESC,
        |                                         c.c_custkey ASC) AS rn
        |      FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey)
        |WHERE rn = 1
        |ORDER BY s_suppkey""".stripMargin,

    "q_trend" ->
      """WITH a AS (SELECT o_custkey, count(*) AS n,
        |                  CAST(sum(CAST(year(o_orderdate) AS BIGINT)) AS BIGINT) AS sx,
        |                  CAST(sum(CAST(year(o_orderdate) AS BIGINT) * CAST(year(o_orderdate) AS BIGINT)) AS BIGINT) AS sxx,
        |                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |                  CAST(sum(CAST(year(o_orderdate) AS BIGINT) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |                  -- VARCHAR round-trip: DuckDB's int128-decimal->double cast is not
        |                  -- correctly rounded above 2^53 unscaled units; string->double is.
        |                  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy
        |           FROM orders GROUP BY 1 HAVING count(*) >= 5)
        |SELECT o_custkey, n,
        |       CASE WHEN n*sxx - sx*sx <> 0
        |            THEN (n*sxy - sx*sy) / CAST(n*sxx - sx*sx AS DOUBLE) END AS trend_slope,
        |       sqrt((n*syy - sy*sy) / CAST(n*(n-1) AS DOUBLE)) AS consistency_sd
        |FROM a
        |ORDER BY o_custkey""".stripMargin,

    "q_form_string" ->
      """SELECT o_custkey, count(*) AS recent_cnt,
        |       string_agg(substring(o_orderstatus, 1, 1), '' ORDER BY rn) AS form
        |FROM (SELECT o_custkey, o_orderstatus,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn <= 5
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_argmax_segment" ->
      """SELECT segment, cnt, bal_sum / cnt AS avg_bal
        |FROM (SELECT c_mktsegment AS segment, count(*) AS cnt,
        |             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        |      FROM customer GROUP BY 1)
        |ORDER BY avg_bal DESC, segment ASC
        |LIMIT 1""".stripMargin,

    "q_segment_median" ->
      """SELECT c_mktsegment AS segment, count(*) AS cnt,
        |       quantile_cont(c_acctbal, 0.5) AS median_bal,
        |       min(c_acctbal) AS min_bal,
        |       max(c_acctbal) AS max_bal
        |FROM customer
        |GROUP BY 1
        |ORDER BY segment""".stripMargin,

    "q_region_summary" ->
      """SELECT r.r_name AS region_name,
        |       count(DISTINCT n.n_nationkey) AS nation_cnt,
        |       count(DISTINCT c.c_custkey) AS customer_cnt,
        |       count(*) AS order_cnt,
        |       CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_cnt,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       CAST(CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |         / count(*) * 100 AS urgent_pct,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_value
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1
        |ORDER BY region_name""".stripMargin,

    "q_latest_event" ->
      """SELECT user_id, event_id, event_type, value, ts_ms
        |FROM (SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q_asof_view" ->
      """WITH p AS (SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.value, p.ts_ms,
        |       v.event_id AS asof_event_id, v.value AS asof_value, v.ts_ms AS asof_ts_ms,
        |       p.ts_ms - v.ts_ms AS gap_ms
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts_ms < p.ts_ms
        |ORDER BY p.event_id""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id, value, valid_from, valid_to,
        |       (valid_to IS NULL) AS is_current
        |FROM (SELECT user_id, event_id, value, epoch_ms(ts) AS valid_from,
        |             lead(epoch_ms(ts)) OVER (PARTITION BY user_id
        |                                      ORDER BY epoch_ms(ts), event_id) AS valid_to
        |      FROM events)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_json_props" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
        |       count(DISTINCT user_id) AS user_cnt,
        |       CAST(CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS DOUBLE)
        |         / count(CAST(props->>'k' AS BIGINT)) AS k_avg
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_upsert_merge" ->
      """WITH e AS (SELECT user_id, value, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |cur AS (SELECT user_id, value, ts_ms
        |        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                           ORDER BY ts_ms DESC, event_id DESC) AS rn
        |              FROM e WHERE ts_ms < 1705708800000)
        |        WHERE rn = 1),
        |stg AS (SELECT user_id,
        |               CASE WHEN value < 50 THEN NULL ELSE value END AS value, ts_ms
        |        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                           ORDER BY ts_ms DESC, event_id DESC) AS rn
        |              FROM e WHERE ts_ms >= 1705708800000)
        |        WHERE rn = 1)
        |SELECT coalesce(stg.user_id, cur.user_id) AS user_id,
        |       coalesce(stg.value, cur.value) AS value,
        |       coalesce(stg.ts_ms, cur.ts_ms) AS ts_ms
        |FROM cur FULL JOIN stg ON cur.user_id = stg.user_id
        |ORDER BY user_id""".stripMargin,

    "q_weekly_rollup" ->
      """SELECT epoch_ms(ts) // 604800000 AS week_bucket, event_type,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY week_bucket, event_type""".stripMargin,

    "q_open_close" ->
      """WITH e AS (SELECT user_id, value, epoch_ms(ts) AS tm, event_id,
        |                  epoch_ms(ts) // 86400000 AS day
        |           FROM events),
        |r AS (SELECT *,
        |             row_number() OVER (PARTITION BY user_id, day
        |                                ORDER BY tm ASC, event_id ASC) AS rna,
        |             row_number() OVER (PARTITION BY user_id, day
        |                                ORDER BY tm DESC, event_id DESC) AS rnd
        |      FROM e)
        |SELECT user_id, day,
        |       max(CASE WHEN rna = 1 THEN value END) AS open_value,
        |       max(CASE WHEN rnd = 1 THEN value END) AS close_value,
        |       count(*) AS ticks
        |FROM r
        |GROUP BY 1, 2
        |ORDER BY user_id, day""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tm FROM events),
        |v AS (SELECT user_id, min(tm) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.tm) AS t1
        |      FROM e JOIN v ON e.user_id = v.user_id AND e.tm > v.t0
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.tm) AS t2
        |      FROM e JOIN c ON e.user_id = c.user_id AND e.tm > c.t1
        |      WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS viewed,
        |       (SELECT count(*) FROM c) AS clicked,
        |       (SELECT count(*) FROM p) AS purchased,
        |       CAST((SELECT count(*) FROM c) AS DOUBLE) / (SELECT count(*) FROM v) AS click_rate,
        |       CAST((SELECT count(*) FROM p) AS DOUBLE) / (SELECT count(*) FROM c) AS purchase_rate""".stripMargin,

    "q_sliding_window" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events)
        |SELECT e.day - o.off AS window_start_day, count(*) AS events_in_window,
        |       count(DISTINCT e.user_id) AS active_users
        |FROM e CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o
        |GROUP BY 1
        |ORDER BY window_start_day""".stripMargin,

    "q_cohort" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 604800000 AS week FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
        |sizes AS (SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
        |          FROM cohorts GROUP BY 1),
        |active AS (SELECT c.cohort_week, e.week - c.cohort_week AS weeks_since,
        |                  count(DISTINCT e.user_id) AS active_users
        |           FROM e JOIN cohorts c ON e.user_id = c.user_id
        |           GROUP BY 1, 2)
        |SELECT a.cohort_week, a.weeks_since, a.active_users, s.cohort_size,
        |       CAST(a.active_users AS DOUBLE) / s.cohort_size AS retention
        |FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
        |ORDER BY a.cohort_week, a.weeks_since""".stripMargin,

    "q_sessions" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ms(ts) AS tm FROM events),
        |f AS (SELECT *, CASE WHEN lag(tm) OVER w IS NULL
        |                       OR tm - lag(tm) OVER w > 3600000 THEN 1 ELSE 0 END AS nf
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tm, event_id)),
        |g AS (SELECT *, CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY tm, event_id
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                AS BIGINT) AS session_seq
        |      FROM f)
        |SELECT user_id, session_seq, count(*) AS event_cnt,
        |       min(tm) AS start_ms, max(tm) AS end_ms,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
        |       max(tm) - min(tm) AS duration_ms
        |FROM g
        |GROUP BY 1, 2
        |ORDER BY user_id, session_seq""".stripMargin,

    "q_text_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       len(toks) AS token_cnt,
        |       len(list_distinct(toks)) AS uniq_cnt,
        |       CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS avg_token_len,
        |       CAST(len(list_filter(toks, s -> s = 'the' OR s = 'a' OR s = 'of' OR s = 'and'
        |            OR s = 'in' OR s = 'to' OR s = 'is')) AS DOUBLE) / len(toks) AS stop_ratio,
        |       (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
        |         * (1.0 - CAST(len(list_filter(toks, s -> s = 'the' OR s = 'a' OR s = 'of'
        |            OR s = 'and' OR s = 'in' OR s = 'to' OR s = 'is')) AS DOUBLE) / len(toks)) AS quality_score,
        |       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM t
        |ORDER BY doc_id""".stripMargin,

    "q_lang_stats" ->
      """SELECT lang, count(*) AS cnt,
        |       CAST(sum(n_chars) AS BIGINT) AS char_sum,
        |       count(DISTINCT source) AS source_cnt,
        |       CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q_quality_filter" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |f AS (SELECT doc_id,
        |             CAST(len(toks) AS DOUBLE) AS n_words,
        |             CAST(list_sum(list_transform(toks, s -> length(s))) AS DOUBLE)
        |               / len(toks) AS mean_len,
        |             CAST(length(text) - length(regexp_replace(text, '[#…]|\.\.\.', '', 'g')) AS DOUBLE) AS symbol_cnt,
        |             CAST(len(list_filter(toks, s -> regexp_matches(s, '\p{L}'))) AS DOUBLE) AS alpha_words,
        |             len(list_filter(toks, s -> s = 'the' OR s = 'a' OR s = 'of' OR s = 'and'
        |                 OR s = 'in' OR s = 'to' OR s = 'is')) AS stop_hits
        |      FROM t)
        |SELECT doc_id,
        |       (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
        |       (mean_len >= 3.0 AND mean_len <= 10.0) AS mean_word_len_ok,
        |       (symbol_cnt / n_words <= 0.1) AS symbol_ratio_ok,
        |       (alpha_words / n_words >= 0.8) AS alpha_ratio_ok,
        |       (stop_hits >= 2) AS stopword_ok,
        |       ((n_words >= 50 AND n_words <= 100000)
        |        AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |        AND (symbol_cnt / n_words <= 0.1)
        |        AND (alpha_words / n_words >= 0.8)
        |        AND (stop_hits >= 2)) AS pass
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    "q_jaccard_pairs" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s0 AS (SELECT doc_id, lang,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in generate_series(1, len(toks)-2)])) AS sh
        |      FROM t),
        |keep AS (SELECT sh FROM s0 GROUP BY sh HAVING count(*) <= 50),
        |s AS (SELECT s0.* FROM s0 JOIN keep USING (sh)),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter_cnt
        |          FROM s a JOIN s b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT d1, d2, inter_cnt,
        |       CAST(inter_cnt AS DOUBLE) / (x.n + y.n - inter_cnt) AS jaccard
        |FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |WHERE CAST(inter_cnt AS DOUBLE) / (x.n + y.n - inter_cnt) >= 0.5
        |ORDER BY d1, d2""".stripMargin,

    "q_minhash_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in generate_series(1, len(toks)-2)])) AS sh
        |      FROM t),
        |sig AS (SELECT doc_id,
        |               min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
        |               min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
        |               min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
        |               min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
        |        FROM s GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, md5(m0 || m1) AS bucket FROM sig
        |          UNION ALL SELECT doc_id, 1, md5(m2 || m3) FROM sig
        |          UNION ALL SELECT doc_id, 2, md5(m4 || m5) FROM sig
        |          UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM sig),
        |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |         FROM bands x JOIN bands y
        |           ON x.bucket = y.bucket AND x.band = y.band AND x.doc_id < y.doc_id)
        |SELECT d1, d2,
        |       CAST((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS est_sim
        |FROM cand JOIN sig sa ON d1 = sa.doc_id JOIN sig sb ON d2 = sb.doc_id
        |WHERE CAST((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END
        |           + CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END) AS DOUBLE) / 8 >= 0.5
        |ORDER BY d1, d2""".stripMargin,

    "q_knn_cosine" ->
      """WITH e AS (SELECT vec_id, label,
        |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT e.vec_id, e.label, round(list_cosine_similarity(e.v, q.qv), 6) AS cos_sim
        |FROM e, q
        |WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, e.vec_id ASC
        |LIMIT 10""".stripMargin,

    "q_knn_batch" ->
      """WITH e AS (SELECT vec_id, label,
        |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2))
        |SELECT query_id, vec_id, label, cos_sim, rk
        |FROM (SELECT q.query_id, e.vec_id, e.label,
        |             round(list_cosine_similarity(e.v, q.qv), 6) AS cos_sim,
        |             row_number() OVER (PARTITION BY q.query_id
        |                                ORDER BY round(list_cosine_similarity(e.v, q.qv), 6) DESC,
        |                                         e.vec_id ASC) AS rk
        |      FROM e, q WHERE e.vec_id <> q.query_id)
        |WHERE rk <= 3
        |ORDER BY query_id, rk""".stripMargin,

    // Embedding near-dup via banded sign-LSH + exact cosine verify; the
    // planted ±0.01 perturbation and the sign-band keys are
    // engine-portable, so the oracle reruns the whole algorithm.
    "q_cosine_dups" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |pert AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         [v[i] + CASE WHEN (i - 1) % 2 = 0 THEN 0.01 ELSE -0.01 END
        |          for i in generate_series(1, len(v))] AS v
        |  FROM base WHERE vec_id % 10 = 0),
        |e AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |chunks AS (
        |  SELECT vec_id, v, b AS band,
        |         SUM(CASE WHEN v[8 * b + i + 1] >= 0 THEN (1 << i) ELSE 0 END) AS bkey
        |  FROM e, (SELECT unnest(range(4)) AS b) bs, (SELECT unnest(range(8)) AS i) bits
        |  GROUP BY 1, 2, 3),
        |pairs AS (
        |  SELECT DISTINCT x.vec_id AS d1, y.vec_id AS d2,
        |         round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
        |  FROM chunks x JOIN chunks y
        |    ON x.bkey = y.bkey AND x.band = y.band AND x.vec_id < y.vec_id)
        |SELECT d1, d2, cos_sim FROM pairs WHERE cos_sim >= 0.9
        |ORDER BY d1, d2""".stripMargin,

    "q_topk_native" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    // Round-trip oracle for the FBref data-stat parser: Spark synthesizes
    // match pages from lineitem and parses them back; DuckDB computes the
    // expected typed stats directly from lineitem. Any defect in table
    // selection, row keying, last-wins merge, or _to_number coercion
    // breaks the hash match.
    "q_match_stats" ->
      """WITH src AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |         CAST(max(l_quantity) AS INTEGER) AS qty,
        |         CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS price
        |  FROM lineitem WHERE l_orderkey <= 500 GROUP BY 1, 2)
        |SELECT 'p' || ok || '-' || ln AS player_id,
        |       CAST(CASE WHEN ln = 7 THEN 92 ELSE ln * 10 END AS BIGINT) AS minutes,
        |       CAST(qty + 1 AS BIGINT) AS shots_total,
        |       CAST(floor(qty / 2) AS BIGINT) AS shots_on_target,
        |       CASE WHEN ln % 2 = 0 THEN CAST(price AS DOUBLE) END AS xg,
        |       CAST(NULL AS BIGINT) AS fouls_committed,
        |       CAST(CASE WHEN ln % 2 = 0 THEN 5 ELSE 4 END AS BIGINT) AS n_keys
        |FROM src
        |ORDER BY player_id""".stripMargin,

    // Team-table round trip: sh-vs-shots synonym precedence, crs corners,
    // percent possession, comma-decimal xg, squad-href keying.
    "q_team_stats" ->
      """SELECT 't' || s_suppkey AS fbref_team_id,
        |       CAST(s_suppkey % 100 AS DOUBLE) AS possession,
        |       CAST(s_suppkey % 20 + 1 AS BIGINT) AS shots_total,
        |       CAST(s_suppkey % 15 AS BIGINT) AS corners,
        |       CAST(CAST(abs(s_acctbal) AS DECIMAL(12,2)) AS DOUBLE) AS xg
        |FROM supplier
        |ORDER BY fbref_team_id""".stripMargin,

    // Round-trip oracle for the Transfermarkt transfers parser (S9):
    // Spark synthesizes in/out transfer pages per nation from customer
    // rows and parses them back; DuckDB computes the expected typed rows
    // directly from customer.
    "q_transfers" ->
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN 'in' ELSE 'out' END AS direction,
        |       c_name AS player_name,
        |       ['GK','DF','MF','FW'][(c_custkey % 4) + 1] AS position,
        |       CAST(18 + c_custkey % 30 AS INTEGER) AS age,
        |       CASE c_custkey % 3 WHEN 0 THEN 'free' WHEN 1 THEN 'loan'
        |            ELSE 'transfer_fee' END AS fee_type,
        |       CASE WHEN c_custkey % 3 = 2
        |            THEN CAST(CAST(abs(c_acctbal) AS DECIMAL(12,2)) AS DOUBLE) * 1e6
        |       END AS fee_amount,
        |       'Nation ' || c_nationkey AS club_name,
        |       DATE '2023-07-01' + CAST(c_custkey % 60 AS INTEGER) AS transfer_date
        |FROM customer
        |ORDER BY player_name""".stripMargin,

    // Squad-table round trip (S8): positional cells, dd.MM.yyyy dates,
    // EUR-millions market values, header-row drop.
    "q_squad" ->
      """SELECT CAST(c_custkey % 98 + 1 AS INTEGER) AS number,
        |       c_name AS name,
        |       ['GK','DF','MF','FW'][(c_custkey % 4) + 1] AS position,
        |       DATE '1980-01-01' + CAST(c_custkey % 8000 AS INTEGER) AS birth_date,
        |       'Nation ' || c_nationkey AS nationality,
        |       CAST(c_custkey % 90 + 1 AS DOUBLE) * 1e6 AS market_value
        |FROM customer
        |ORDER BY name""".stripMargin,

    // Injuries-table round trip (S10): absence typing from reason text.
    "q_injuries" ->
      """SELECT c_name AS player_name,
        |       ['Hamstring injury','Rotsperre','Krank','National team duty'][(c_custkey % 4) + 1] AS reason,
        |       DATE '2024-01-01' + CAST(c_custkey % 300 AS INTEGER) AS start_date,
        |       DATE '2024-01-15' + CAST(c_custkey % 300 AS INTEGER) AS end_or_expected,
        |       CAST(c_custkey % 12 AS INTEGER) AS missed_games,
        |       CASE c_custkey % 4 WHEN 0 THEN 'injury' WHEN 1 THEN 'suspension'
        |            WHEN 2 THEN 'illness' ELSE 'national_duty' END AS absence_type
        |FROM customer
        |ORDER BY player_name""".stripMargin,

    // J7 external-id registry, exercised through ExternalIdMap.register:
    // current = min custkey per custkey%500 residue; staged = o_custkey
    // claims keyed by o_orderkey%700 (intra-batch + cross-registry
    // conflicts); registry keeps one internal id per external key.
    "q_idmap_mapping" ->
      """WITH current AS (
        |  SELECT 'reg' AS source, CAST(c_custkey % 500 AS VARCHAR) AS external_id,
        |         min(c_custkey) AS internal_id
        |  FROM customer GROUP BY 2),
        |staged AS (
        |  SELECT DISTINCT 'reg' AS source, CAST(o_orderkey % 700 AS VARCHAR) AS external_id,
        |         o_custkey AS internal_id
        |  FROM orders WHERE o_orderkey <= 2000),
        |winners AS (
        |  SELECT source, external_id, min(internal_id) AS internal_id
        |  FROM staged GROUP BY 1, 2),
        |fresh AS (
        |  SELECT w.* FROM winners w
        |  LEFT JOIN current c USING (source, external_id)
        |  WHERE c.internal_id IS NULL)
        |SELECT source, external_id, internal_id FROM current
        |UNION ALL
        |SELECT source, external_id, internal_id FROM fresh
        |ORDER BY source, external_id, internal_id""".stripMargin,

    "q_idmap_conflicts" ->
      """WITH current AS (
        |  SELECT 'reg' AS source, CAST(c_custkey % 500 AS VARCHAR) AS external_id,
        |         min(c_custkey) AS internal_id
        |  FROM customer GROUP BY 2),
        |staged AS (
        |  SELECT DISTINCT 'reg' AS source, CAST(o_orderkey % 700 AS VARCHAR) AS external_id,
        |         o_custkey AS internal_id
        |  FROM orders WHERE o_orderkey <= 2000),
        |winners AS (
        |  SELECT source, external_id, min(internal_id) AS win_id,
        |         count(DISTINCT internal_id) AS n_ids
        |  FROM staged GROUP BY 1, 2),
        |intra AS (
        |  SELECT s.source, s.external_id,
        |         s.internal_id AS claimed_internal_id, w.win_id AS existing_internal_id
        |  FROM staged s JOIN winners w USING (source, external_id)
        |  WHERE w.n_ids > 1 AND s.internal_id <> w.win_id),
        |cur AS (
        |  SELECT w.source, w.external_id,
        |         w.win_id AS claimed_internal_id, c.internal_id AS existing_internal_id
        |  FROM winners w JOIN current c USING (source, external_id)
        |  WHERE c.internal_id <> w.win_id)
        |SELECT * FROM intra
        |UNION ALL
        |SELECT * FROM cur
        |ORDER BY source, external_id, claimed_internal_id""".stripMargin,

    // Deterministic md5-bucket split: stable under corpus growth, exact
    // across engines.
    "q_sample_split" ->
      """SELECT lang,
        |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
        |            ELSE 'test' END AS split,
        |       count(*) AS docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM (SELECT lang, n_chars,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
        |      FROM documents)
        |GROUP BY 1, 2
        |ORDER BY lang, split""".stripMargin,

    // Token-budget sequence packing: contiguous greedy bins from a
    // per-stratum running token sum.
    "q_seq_pack" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, tokens,
        |         sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |                           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM d)
        |SELECT lang, CAST(floor((cum_tokens - tokens) / 2048) AS BIGINT) AS seq_id,
        |       count(*) AS docs, CAST(sum(tokens) AS BIGINT) AS tokens
        |FROM c
        |GROUP BY 1, 2
        |ORDER BY lang, seq_id""".stripMargin,

    // Benchmark contamination: training docs sharing any 3-gram shingle
    // with the held-out set (doc_id % 97 = 0).
    "q_contamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in generate_series(1, len(toks)-2)])) AS sh
        |      FROM t),
        |bench AS (SELECT DISTINCT sh FROM s WHERE doc_id % 97 = 0)
        |SELECT s.doc_id, count(DISTINCT s.sh) AS shared_shingles
        |FROM s JOIN bench USING (sh)
        |WHERE s.doc_id % 97 <> 0
        |GROUP BY 1
        |ORDER BY s.doc_id""".stripMargin,

    // The composed curation pipeline: every stage's oracle piece reused
    // verbatim (quality CTEs from q_quality_filter, the lang vote from
    // q_lang_id, the simhash-cluster recursive CTE from q_dup_clusters,
    // the shingle-overlap CTEs from q_contamination) plus the
    // fingerprint keep-first window — one per-document verdict row.
    "q_curation" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, text, source FROM documents),
        |qt AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM t),
        |qf AS (SELECT doc_id,
        |             CAST(len(toks) AS DOUBLE) AS n_words,
        |             CAST(list_sum(list_transform(toks, s -> length(s))) AS DOUBLE)
        |               / len(toks) AS mean_len,
        |             CAST(length(text) - length(regexp_replace(text, '[#…]|\.\.\.', '', 'g')) AS DOUBLE) AS symbol_cnt,
        |             CAST(len(list_filter(toks, s -> regexp_matches(s, '\p{L}'))) AS DOUBLE) AS alpha_words,
        |             len(list_filter(toks, s -> s = 'the' OR s = 'a' OR s = 'of' OR s = 'and'
        |                 OR s = 'in' OR s = 'to' OR s = 'is')) AS stop_hits
        |      FROM qt),
        |q AS (SELECT doc_id,
        |             ((n_words >= 50 AND n_words <= 100000)
        |              AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |              AND (symbol_cnt / n_words <= 0.1)
        |              AND (alpha_words / n_words >= 0.8)
        |              AND (stop_hits >= 2)) AS q_pass
        |      FROM qf),
        |lt AS (SELECT doc_id,
        |              list_distinct(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS ltoks,
        |              regexp_matches(text, '[\p{Hiragana}\p{Katakana}]') AS kana,
        |              regexp_matches(text, '\p{Han}') AS han
        |       FROM t),
        |lv AS (SELECT doc_id, kana, han,
        |              len(list_intersect(ltoks, ['the','and','of','is','with','for'])) AS he,
        |              len(list_intersect(ltoks, ['der','die','das','und','nicht','mit'])) AS hd,
        |              len(list_intersect(ltoks, ['le','la','les','et','est','dans'])) AS hf,
        |              len(list_intersect(ltoks, ['el','los','las','es','y','en'])) AS hs
        |       FROM lt),
        |l AS (SELECT doc_id,
        |             (CASE WHEN kana THEN 'ja'
        |              WHEN han THEN 'zh'
        |                   WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |                   WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |                   WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
        |                   WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |                   ELSE 'de' END) = 'en' AS lang_ok
        |      FROM lv),
        |e AS (SELECT doc_id,
        |             row_number() OVER (
        |               PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |               ORDER BY doc_id) = 1 AS exact_keep
        |      FROM t),
        |stoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM t),
        |th AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM stoks),
        |votes AS (SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |          FROM th, (SELECT unnest(range(60)) AS b) bits GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |               SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
        |        FROM votes GROUP BY 1),
        |chunks AS (SELECT doc_id, sig, c AS band, (sig >> (c * 15)) & 32767 AS chunk
        |           FROM sig, (SELECT unnest(range(4)) AS c) cs),
        |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |          FROM chunks x JOIN chunks y
        |            ON x.chunk = y.chunk AND x.band = y.band AND x.doc_id < y.doc_id
        |          WHERE bit_count(xor(x.sig, y.sig)) <= 3),
        |sym AS (SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach(node, r) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |  UNION
        |  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node),
        |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
        |noncanon AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id),
        |csh AS (SELECT doc_id,
        |               unnest(list_distinct([array_to_string(ctoks[i:i+2], ' ')
        |                                     for i in generate_series(1, len(ctoks)-2)])) AS sh
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ctoks FROM t)),
        |bench AS (SELECT DISTINCT sh FROM csh WHERE doc_id % 97 = 0),
        |contaminated AS (SELECT csh.doc_id FROM csh JOIN bench USING (sh)
        |                 WHERE csh.doc_id % 97 <> 0
        |                 GROUP BY 1 HAVING count(DISTINCT csh.sh) >= 3)
        |SELECT t.doc_id, t.source, q.q_pass, l.lang_ok, e.exact_keep,
        |       noncanon.doc_id IS NULL AS near_keep,
        |       (contaminated.doc_id IS NULL AND t.doc_id % 97 <> 0) AS decon_ok,
        |       (q.q_pass AND l.lang_ok AND e.exact_keep AND noncanon.doc_id IS NULL
        |        AND contaminated.doc_id IS NULL AND t.doc_id % 97 <> 0) AS kept
        |FROM t
        |JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN e USING (doc_id)
        |LEFT JOIN noncanon ON t.doc_id = noncanon.doc_id
        |LEFT JOIN contaminated ON t.doc_id = contaminated.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // The simhash token hash is md5-derived (first 15 hex chars = 60
    // bits) precisely so this oracle can recompute signatures, banding,
    // and Hamming verification entirely in SQL.
    "q_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |th AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
        |votes AS (
        |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, (SELECT unnest(range(60)) AS b) bits
        |  GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id,
        |         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
        |  FROM votes GROUP BY 1),
        |chunks AS (
        |  SELECT doc_id, sig, c AS band, (sig >> (c * 15)) & 32767 AS chunk
        |  FROM sig, (SELECT unnest(range(4)) AS c) cs),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
        |         CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
        |  FROM chunks x JOIN chunks y
        |    ON x.chunk = y.chunk AND x.band = y.band AND x.doc_id < y.doc_id)
        |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY d1, d2""".stripMargin,

    // Transitive closure of the simhash near-dup pairs: the oracle
    // recomputes the same edge set in SQL, then min-label reachability via
    // a recursive CTE (feasible at oracle scale; the Spark side is the
    // O(log n)-round large-star/small-star algorithm).
    "q_dup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |th AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
        |votes AS (
        |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, (SELECT unnest(range(60)) AS b) bits
        |  GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id,
        |         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
        |  FROM votes GROUP BY 1),
        |chunks AS (
        |  SELECT doc_id, sig, c AS band, (sig >> (c * 15)) & 32767 AS chunk
        |  FROM sig, (SELECT unnest(range(4)) AS c) cs),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |  FROM chunks x JOIN chunks y
        |    ON x.chunk = y.chunk AND x.band = y.band AND x.doc_id < y.doc_id
        |  WHERE bit_count(xor(x.sig, y.sig)) <= 3),
        |sym AS (SELECT d1 AS u, d2 AS v FROM pairs
        |        UNION SELECT d2, d1 FROM pairs),
        |reach(node, r) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |  UNION
        |  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node),
        |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
        |SELECT l.doc_id, l.cluster_id, sz.cluster_size,
        |       l.doc_id = l.cluster_id AS is_canonical
        |FROM lab l JOIN sz USING (cluster_id)
        |ORDER BY l.doc_id""".stripMargin,

    // Token-budget chunking with overlap (budget 100, overlap 10 → step
    // 90): start offsets from generate_series bounded at n-overlap-1 (a
    // later start would duplicate its predecessor's content), chunk
    // content verified by md5 of the token slice.
    "q_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
        |s AS (SELECT doc_id, toks, n_tokens,
        |             unnest(generate_series(0, greatest(n_tokens - 11, 0), 90)) AS start_tok
        |      FROM n)
        |SELECT doc_id,
        |       start_tok // 90 AS chunk_id,
        |       start_tok,
        |       least(100, n_tokens - start_tok) AS chunk_tokens,
        |       md5(array_to_string(toks[CAST(start_tok + 1 AS INTEGER)
        |                                : CAST(start_tok + 100 AS INTEGER)], ' ')) AS chunk_md5
        |FROM s
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // PII-redaction round trip: deterministic synthetic PII injected per
    // doc, scrubbed with the same RE2-safe patterns in both engines
    // (email -> ip -> phone order); md5 of the redacted text is the
    // cross-engine witness.
    "q_pii_redact" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |         text || ' contact p' || doc_id || '@mail.example.com now from 10.0.'
        |              || (doc_id % 256) || '.' || (doc_id % 100)
        |              || ' or call +1555000' || doc_id AS txt
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, txt,
        |         regexp_replace(regexp_replace(regexp_replace(txt,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |           '\+\d[\d ]{6,14}\d', '<PHONE>', 'g') AS redacted
        |  FROM inj)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(txt,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(txt,
        |         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |       CAST(len(regexp_extract_all(txt,
        |         '\+\d[\d ]{6,14}\d')) AS BIGINT) AS n_phones,
        |       md5(redacted) AS redacted_md5,
        |       CAST(length(redacted) AS BIGINT) AS redacted_len
        |FROM red
        |ORDER BY doc_id""".stripMargin,

    // Source-mixing: per-source token budget (800) via deterministic
    // md5-bucket downsampling; keep_pct = floor(100*target/total) capped
    // at 100. The single double division matches IEEE-exactly across
    // engines.
    "q_source_mix" ->
      """WITH d AS (SELECT source, doc_id,
        |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |           FROM documents),
        |rate AS (SELECT source,
        |                least(1.0, 800.0 / CAST(sum(tokens) AS DOUBLE)) AS keep_rate
        |         FROM d GROUP BY source),
        |kept AS (SELECT d.source, r.keep_rate, d.tokens
        |         FROM d JOIN rate r USING (source)
        |         WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13) AS BIGINT)
        |               / 4503599627370496.0 < r.keep_rate)
        |SELECT source, keep_rate, count(*) AS docs_kept,
        |       CAST(sum(tokens) AS BIGINT) AS tokens_kept
        |FROM kept
        |GROUP BY source, keep_rate
        |ORDER BY source""".stripMargin,

    // Inverted index: one row per term with document frequency and the
    // sorted posting list as a scalar CSV witness (the array column is
    // the library export shape; the relational (term, doc_id, tf) core
    // is Search.termFrequencies). Scalar because the harness's
    // sort/factorize comparison cannot hash array cells.
    "q_inverted_index" ->
      """WITH td AS (SELECT DISTINCT t.term, d.doc_id
        |            FROM documents d,
        |                 unnest(string_split(d.text, ' ')) AS t(term))
        |SELECT term, count(*) AS df,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings_csv
        |FROM td
        |GROUP BY term
        |ORDER BY term""".stripMargin,

    // BM25 top-20 for terms (spark, window, hash): log-free rational idf
    // (N-df+0.5)/(df+0.5) — division-only so both engines round
    // identically (ln is not correctly-rounded); per-term scores summed
    // in fixed textual order; score rounded to 6 decimals.
    "q_bm25" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS BIGINT) AS tf_0,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'window')) AS BIGINT) AS tf_1,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'hash')) AS BIGINT) AS tf_2
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n, sum(dl) AS sum_dl,
        |         sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
        |         sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
        |         sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
        |  FROM base),
        |scored AS (
        |  SELECT b.doc_id,
        |    (CASE WHEN b.tf_0 > 0 THEN
        |      ((CAST(s.n AS DOUBLE) - CAST(s.df_0 AS DOUBLE) + 0.5) / (CAST(s.df_0 AS DOUBLE) + 0.5))
        |      * (CAST(b.tf_0 AS DOUBLE) * 2.2)
        |      / (CAST(b.tf_0 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(b.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |     ELSE 0.0 END
        |    +
        |     CASE WHEN b.tf_1 > 0 THEN
        |      ((CAST(s.n AS DOUBLE) - CAST(s.df_1 AS DOUBLE) + 0.5) / (CAST(s.df_1 AS DOUBLE) + 0.5))
        |      * (CAST(b.tf_1 AS DOUBLE) * 2.2)
        |      / (CAST(b.tf_1 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(b.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |     ELSE 0.0 END)
        |    +
        |     CASE WHEN b.tf_2 > 0 THEN
        |      ((CAST(s.n AS DOUBLE) - CAST(s.df_2 AS DOUBLE) + 0.5) / (CAST(s.df_2 AS DOUBLE) + 0.5))
        |      * (CAST(b.tf_2 AS DOUBLE) * 2.2)
        |      / (CAST(b.tf_2 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(b.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |     ELSE 0.0 END AS raw_score,
        |    b.tf_0, b.tf_1, b.tf_2
        |  FROM base b CROSS JOIN stats s)
        |SELECT doc_id, round(raw_score, 6) AS score
        |FROM scored
        |WHERE tf_0 > 0 OR tf_1 > 0 OR tf_2 > 0
        |ORDER BY score DESC, doc_id ASC
        |LIMIT 20""".stripMargin,

    // Corpus bigram frequency, top 50 (count desc, ngram asc tiebreak).
    "q_top_ngrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT toks[i] || ' ' || toks[i + 1] AS ngram
        |      FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i))
        |SELECT ngram, count(*) AS cnt
        |FROM g
        |GROUP BY ngram
        |ORDER BY cnt DESC, ngram ASC
        |LIMIT 50""".stripMargin,

    // C4-style duplicated-span removal: 10-token spans, global first
    // occurrence wins (doc_id, span_idx order), documents reassembled
    // from surviving spans; md5 of the cleaned text is the witness.
    "q_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |seg AS (
        |  SELECT doc_id, u.i AS span_idx,
        |         array_to_string(toks[CAST(u.i * 10 + 1 AS INTEGER)
        |                              : CAST(u.i * 10 + 10 AS INTEGER)], ' ') AS span
        |  FROM t, unnest(generate_series(0, CAST(floor((len(toks) - 1) / 10) AS BIGINT))) AS u(i)),
        |ranked AS (
        |  SELECT doc_id, span_idx, span,
        |         row_number() OVER (PARTITION BY span ORDER BY doc_id ASC, span_idx ASC) AS rn
        |  FROM seg),
        |totals AS (SELECT doc_id, count(*) AS n_spans FROM seg GROUP BY doc_id),
        |kept AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         string_agg(span, ' ' ORDER BY span_idx) AS clean_text
        |  FROM ranked WHERE rn = 1 GROUP BY doc_id)
        |SELECT t.doc_id, t.n_spans,
        |       coalesce(k.n_kept, 0) AS n_kept,
        |       md5(coalesce(k.clean_text, '')) AS clean_md5
        |FROM totals t LEFT JOIN kept k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // Whitespace vs BPE-ish token accounting: deterministic mixed-content
    // suffix injected per doc (the corpus is pure lowercase words, where
    // the tokenizers agree); the BPE-ish pre-tokenizer regex is RE2-safe
    // so both engines count identically. fertility = chars per BPE-ish
    // token, rounded to 6.
    "q_token_stats" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |         text || ' v' || (doc_id % 10) || '.' || (doc_id % 7)
        |              || ', cost $' || (doc_id % 100) || '!' AS txt
        |  FROM documents),
        |cnt AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(txt, ' ')) AS BIGINT) AS ws_tokens,
        |         CAST(len(regexp_extract_all(txt,
        |           ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS bpe_tokens,
        |         CAST(length(txt) AS BIGINT) AS chars
        |  FROM inj)
        |SELECT doc_id, ws_tokens, bpe_tokens, chars,
        |       round(CAST(chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE), 6) AS fertility
        |FROM cnt
        |ORDER BY doc_id""".stripMargin,

    // Deterministic stratified sample: 5 docs with the smallest md5 hash
    // per language (corpus-growth-stable, engine-portable); the Spark
    // side executes through the custom TopKPerKey operator.
    "q_group_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id, h
        |FROM r
        |WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin,

    // Percentile-based quality trimming: per lang, survivors of dropping
    // the bottom 20% by quality score (percent_rank ordered by score
    // alone — ties share a rank identically in both engines).
    "q_quality_trim" ->
      """WITH q AS (
        |  SELECT lang, doc_id,
        |         (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |            / len(string_split(text, ' ')))
        |         * (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |              s -> s = 'the' OR s = 'a' OR s = 'of' OR s = 'and'
        |                OR s = 'in' OR s = 'to' OR s = 'is')) AS DOUBLE)
        |              / len(string_split(text, ' '))) AS qs
        |  FROM documents),
        |p AS (
        |  SELECT lang, qs,
        |         percent_rank() OVER (PARTITION BY lang ORDER BY qs) AS pr
        |  FROM q)
        |SELECT lang,
        |       count(*) AS docs_total,
        |       CAST(sum(CASE WHEN pr >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
        |       round(min(CASE WHEN pr >= 0.2 THEN qs END), 6) AS min_kept_score
        |FROM p
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // Binned point-in-interval self join: orders of the same priority
    // within ±7 days. The Spark side is the bin-bucketed equi-join
    // (RangeJoin.pointInInterval); the oracle states the naive
    // inequality-join semantics directly.
    "q_range_join" ->
      """SELECT a.o_orderkey, count(*) AS nearby_cnt
        |FROM orders a JOIN orders b
        |  ON b.o_orderpriority = a.o_orderpriority
        | AND b.o_orderkey <> a.o_orderkey
        | AND b.o_orderdate >= a.o_orderdate - INTERVAL 7 DAY
        | AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Bloom-prefiltered anti join ≡ plain anti join (the Bloom pass only
    // prunes; exact verification removes false positives).
    "q_bloom_prune" ->
      """SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ship_month,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p
        |                  WHERE p.p_partkey = l.l_partkey AND p.p_size >= 45)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Gopher repetition signals; ratios are single long/long IEEE
    // divisions (correctly rounded → exact cross-engine).
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g1 AS (SELECT doc_id, unnest(toks) AS g FROM t),
        |c1 AS (SELECT doc_id, g, count(*) AS c FROM g1 GROUP BY 1, 2),
        |a1 AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_word_frac
        |       FROM c1 GROUP BY 1),
        |g2 AS (SELECT doc_id, unnest([array_to_string(toks[i:i+1], ' ')
        |                              for i in generate_series(1, len(toks)-1)]) AS g FROM t),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |a2 AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
        |       FROM c2 GROUP BY 1),
        |g3 AS (SELECT doc_id, unnest([array_to_string(toks[i:i+2], ' ')
        |                              for i in generate_series(1, len(toks)-2)]) AS g FROM t),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |a3 AS (SELECT doc_id, CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_trigram_frac
        |       FROM c3 GROUP BY 1)
        |SELECT a1.doc_id, top_word_frac, top_bigram_frac, dup_trigram_frac
        |FROM a1 JOIN a2 USING (doc_id) JOIN a3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Frequency-ranked unigram+bigram vocabulary with contiguous ids
    // assigned over the unique (cnt desc, gram asc) order. The Spark side
    // is the distributed two-pass rank; the oracle is the window form.
    "q_vocab" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT unnest(toks) AS gram, CAST(1 AS BIGINT) AS n FROM t
        |      UNION ALL
        |      SELECT unnest([array_to_string(toks[i:i+1], ' ')
        |                     for i in generate_series(1, len(toks)-1)]) AS gram,
        |             CAST(2 AS BIGINT) AS n FROM t),
        |c AS (SELECT gram, n, count(*) AS cnt FROM g GROUP BY 1, 2
        |      HAVING count(*) >= 2)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS BIGINT) AS token_id,
        |       gram, n, CAST(cnt AS BIGINT) AS cnt
        |FROM c
        |ORDER BY token_id""".stripMargin,

    // Pivot / crosstab: one conditional-aggregate pass (the Spark side is
    // groupBy().pivot() with an explicit value list — compiles to exactly
    // these CASE aggregates, no value-discovery job).
    "q_pivot" ->
      """SELECT o_orderpriority AS priority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F'
        |                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS f_spend,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O'
        |                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS o_spend,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P'
        |                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_spend
        |FROM orders
        |GROUP BY 1
        |ORDER BY priority""".stripMargin,

    // Rank-based spend deciles. The Spark side computes the global rank
    // with the two-pass distributed rank (no single-partition window);
    // the oracle states the window form over the same unique order.
    // Decile formula ((rn-1)*10) div n + 1 is deliberately rank-width
    // (documented) rather than NTILE's remainder-to-front sizing.
    "q_ntile" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT spend_dec,
        |         row_number() OVER (ORDER BY spend_dec ASC, o_custkey ASC) AS rn,
        |         count(*) OVER () AS n
        |  FROM per)
        |SELECT ((rn - 1) * 10) // n + 1 AS decile,
        |       count(*) AS cnt,
        |       CAST(min(spend_dec) AS DOUBLE) AS min_spend,
        |       CAST(max(spend_dec) AS DOUBLE) AS max_spend,
        |       CAST(sum(spend_dec) AS DOUBLE) AS decile_spend
        |FROM r
        |GROUP BY 1
        |ORDER BY decile""".stripMargin,

    // Value-based RANGE frame: trailing 30-day spend per customer,
    // excluding the order's own day (frame = value interval, so same-day
    // peers need no tiebreak; empty frame → NULL in both engines).
    "q_range_frame" ->
      """SELECT o_custkey, o_orderkey, d,
        |       CAST(sum(sp) OVER (PARTITION BY o_custkey ORDER BY d
        |                          RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING)
        |            AS DOUBLE) AS trailing_spend
        |FROM (SELECT o_custkey, o_orderkey,
        |             date_diff('day', DATE '1970-01-01',
        |                       CAST(o_orderdate AS DATE)) AS d,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS sp
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // Per-segment z-score outliers from exact decimal sums (n, Σx, Σx²);
    // the double expressions are identical in both engines, so z matches
    // bitwise. No stddev_samp (its merge order is engine-specific).
    "q_outliers" ->
      """WITH stats AS (
        |  SELECT c_mktsegment AS segment,
        |         count(*) AS n,
        |         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
        |                  * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS ss
        |  FROM customer GROUP BY 1),
        |z AS (
        |  SELECT c.c_custkey, st.segment, c.c_acctbal,
        |         (c.c_acctbal - st.s / st.n)
        |           / sqrt((st.ss - st.s * st.s / st.n) / (st.n - 1)) AS z
        |  FROM customer c JOIN stats st ON c.c_mktsegment = st.segment)
        |SELECT c_custkey, segment, c_acctbal, z
        |FROM z
        |WHERE abs(z) >= 2.0
        |ORDER BY c_custkey""".stripMargin,

    // Interval-overlap self join: pairs of a customer's orders whose
    // ±3-day windows intersect. The Spark side is the binned equi-join
    // with algebraic pair dedup (emit at the overlap-start bin); the
    // oracle states the naive inequality-join semantics.
    "q_interval_overlap" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         date_diff('day', DATE '1970-01-01',
        |                   CAST(o_orderdate AS DATE)) AS d
        |  FROM orders)
        |SELECT a.o_custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
        |       least(a.d, b.d) - greatest(a.d, b.d) + 7 AS overlap_days
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey
        | AND a.o_orderkey < b.o_orderkey
        | AND a.d - 3 <= b.d + 3 AND b.d - 3 <= a.d + 3
        |ORDER BY a.o_custkey, k1, k2""".stripMargin,

    // Multimodal frame-sampling index: video rows (doc_id mod 3 = 2 under
    // the kind synthesis), duration = n_chars*10 ms, one row per 1000 ms
    // sample offset. generate_series/sequence are both stop-inclusive.
    "q_frames" ->
      """SELECT doc_id AS media_id,
        |       unnest(generate_series(0, n_chars * 10 - 1, 1000)) AS frame_ts_ms
        |FROM documents
        |WHERE (doc_id % 3) = 2 AND n_chars > 0
        |ORDER BY media_id, frame_ts_ms""".stripMargin,

    // Incremental gold maintenance: the Spark side builds the gold table
    // from pre-1999 history and merges ONE delta batch additively
    // (Merge.additiveUpsert, exact decimal accumulators); the oracle is
    // the full recompute the increment must equal bitwise.
    "q_incr_agg" ->
      """SELECT o_custkey,
        |       count(*) AS order_cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders
        |GROUP BY 1
        |ORDER BY o_custkey""".stripMargin,

    // URL canonicalization round trip: same synthesized URLs, same
    // RE2-safe host/path/query regexes, same tracking-param filter —
    // the crawl-frontier dedup-key path recomputed end-to-end in SQL.
    "q_url_stats" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
        |           || source || '.example.com/' || lang || '/doc-' || doc_id
        |           || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || (doc_id % 7)
        |                   WHEN doc_id % 3 = 1 THEN '?id=' || (doc_id % 7) || '&utm_campaign=x&ref=kept'
        |                   ELSE '' END
        |           || '#frag' AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |         regexp_replace(lower(regexp_extract(url,
        |           '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), '^www\.', '') AS domain,
        |         regexp_extract(url,
        |           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS p,
        |         coalesce(array_to_string(list_filter(
        |           string_split(regexp_extract(url, '^[^#]*?\?([^#]*)', 1), '&'),
        |           x -> NOT regexp_matches(x,
        |                  '^(utm_[^=]*|fbclid|gclid|msclkid|ref_src)=')
        |                AND x <> ''), '&'), '') AS q
        |  FROM u),
        |canon AS (
        |  SELECT doc_id, domain,
        |         CASE WHEN domain = '' THEN NULL
        |              ELSE 'https://' || domain
        |                || CASE WHEN p = '' THEN '/' ELSE p END
        |                || CASE WHEN q = '' THEN '' ELSE '?' || q END END AS canon
        |  FROM parts)
        |SELECT domain, count(*) AS doc_cnt,
        |       count(DISTINCT canon) AS distinct_urls,
        |       CAST(sum(CASE WHEN contains(canon, '?') THEN 1 ELSE 0 END) AS BIGINT) AS with_params
        |FROM canon
        |GROUP BY 1
        |ORDER BY domain""".stripMargin,

    // Arbitrary GROUPING SETS: two independent one-column summaries in
    // one pass (non-hierarchical — neither rollup nor cube).
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    // Deterministic weighted Bernoulli sampling: uniform = first 13 md5
    // hex chars (52 bits, exact in a double) / 2^52 — one IEEE division,
    // identical in both engines, so kept MEMBERSHIP matches exactly.
    "q_weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN lang = 'en' THEN CAST(0.3 AS DOUBLE)
        |              WHEN lang = 'de' THEN CAST(0.5 AS DOUBLE)
        |              ELSE CAST(0.9 AS DOUBLE) END AS w,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |           / 4503599627370496.0 AS u
        |  FROM documents)
        |SELECT lang, w, count(*) AS docs_kept,
        |       min(u) AS min_u, max(u) AS max_u
        |FROM d
        |WHERE u < w
        |GROUP BY 1, 2
        |ORDER BY lang""".stripMargin,

    // Ratio-to-report: nation share of region revenue — share computed as
    // one IEEE division of exact-decimal-cast doubles.
    "q_share" ->
      """WITH nr AS (
        |  SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT region_name, sum(rev_dec) AS tot_dec FROM nr GROUP BY 1)
        |SELECT nr.region_name, nr.nation_name,
        |       CAST(nr.rev_dec AS DOUBLE) AS revenue,
        |       CAST(nr.rev_dec AS DOUBLE) / CAST(rt.tot_dec AS DOUBLE) AS region_share
        |FROM nr JOIN rt ON nr.region_name = rt.region_name
        |ORDER BY nr.region_name, nr.nation_name""".stripMargin,

    // Median/MAD robust outliers: exact interpolated percentiles
    // (Spark `percentile` ≡ DuckDB `quantile_cont`), deviations and the
    // robust z as single IEEE ops.
    "q_mad" ->
      """WITH med AS (
        |  SELECT c_mktsegment AS segment,
        |         quantile_cont(c_acctbal, 0.5) AS med
        |  FROM customer GROUP BY 1),
        |dev AS (
        |  SELECT c.c_custkey, m.segment, c.c_acctbal,
        |         abs(c.c_acctbal - m.med) AS dev
        |  FROM customer c JOIN med m ON c.c_mktsegment = m.segment),
        |mad AS (SELECT segment, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT d.c_custkey, d.segment, d.c_acctbal, d.dev / m.mad AS robust_z
        |FROM dev d JOIN mad m ON d.segment = m.segment
        |WHERE d.dev > CAST(3.0 AS DOUBLE) * m.mad
        |ORDER BY d.c_custkey""".stripMargin,

    // Gaps-and-islands: per-user consecutive-day streaks via the
    // day − row_number island key.
    "q_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        |  FROM events),
        |islands AS (
        |  SELECT user_id,
        |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |runs AS (
        |  SELECT user_id, grp, count(*) AS len
        |  FROM islands GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        |       max(len) AS longest_streak, count(*) AS n_streaks
        |FROM runs
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin,

    // BPE merge table after 8 exact rounds: the oracle replays training
    // as unrolled CTE stages. Symbol sequences ride as DOUBLE-space-
    // joined strings padded with spaces, so applying a merge is one
    // plain (non-regex) replace of ' a  b ' with ' ab ': each match
    // consumes one space from each side's double-space separator and
    // the replacement restores it, which makes left-to-right
    // non-overlapping replace EXACTLY the greedy merge fold ('a a a'
    // under (a,a) -> 'aa a'). Pair counting splits on the double space.
    "q_bpe_merges" -> bpeMergesOracle(8),
    "q_bpe_encode" -> bpeEncodeOracle(8),

    // S14-depth round trip: career-table rows (3 per player; the short
    // decoy row is dropped by the >=3-cells filter, the '-' goals cell
    // in season 3 by the isdigit guard) + season-stat grid fields
    // (Einsätze/Tore/Laufdistanz rows; Sprints only via stat-box; the
    // stat-box Tore value must lose to the grid row). Oracle recomputes
    // the synthesis arithmetic straight from customer.
    "q_career_stats" ->
      """WITH seasons AS (
        |  SELECT * FROM (VALUES (1, '2021/22'), (2, '2022/23'), (3, '2023/24'))
        |  AS s(i, season))
        |SELECT c.c_custkey AS ck,
        |       s.season,
        |       'Nation ' || c.c_nationkey AS team,
        |       'Liga ' || (c.c_custkey % 3) AS league,
        |       CAST((c.c_custkey + s.i) % 40 AS INT) AS appearances,
        |       CASE WHEN s.i = 3 THEN NULL
        |            ELSE CAST((c.c_custkey * s.i) % 20 AS INT) END AS goals,
        |       CAST((c.c_custkey + 7 * s.i) % 15 AS INT) AS assists,
        |       CAST(c.c_custkey % 40 AS INT) AS cur_appearances,
        |       CAST(c.c_custkey % 20 AS INT) AS cur_goals,
        |       CAST(c.c_custkey % 90 AS INT) AS cur_sprints,
        |       CAST((c.c_custkey % 400) || '.' || (c.c_custkey % 10) AS DOUBLE)
        |         AS cur_distance_km
        |FROM customer c, seasons s
        |ORDER BY ck, s.season""".stripMargin,

    // S11 round trip: German market-value formats (comma decimal Mio.,
    // Tsd., bare euros), /beraterfirma/ agent link, Letzte-Änderung
    // date. Value strings are built identically on both sides, so the
    // double parse is bit-equal.
    "q_market_value" ->
      """SELECT c_custkey AS ck,
        |       'Agentur ' || (c_custkey % 50) AS agent_name,
        |       DATE '2024-01-01' + CAST(c_custkey % 365 AS INTEGER) AS valuation_date,
        |       CASE CAST(c_custkey % 3 AS INTEGER)
        |         WHEN 0 THEN CAST(((c_custkey % 90) + 1) || '.' || (c_custkey % 10) AS DOUBLE) * 1e6
        |         WHEN 1 THEN CAST((c_custkey % 900) + 100 AS DOUBLE) * 1e3
        |         ELSE CAST((c_custkey % 5000) + 1 AS DOUBLE) END AS value_eur,
        |       'EUR' AS currency
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // S12/S13 round trip: bet365 (two team elements) + bwin (joined
    // "A - B") selector configs over the same synthesized odds; the
    // plain-decimal guard nulls the fractional "1/2" home price (every
    // 3rd customer) and the "evens" draw (every 5th).
    "q_odds" ->
      """WITH v AS (
        |  SELECT c_custkey AS ck,
        |         (c_custkey % 80) + 11 AS h,
        |         (c_custkey % 60) + 21 AS d,
        |         (c_custkey % 90) + 12 AS a
        |  FROM customer)
        |SELECT bm.bookmaker, v.ck,
        |       'Home ' || v.ck AS home_team,
        |       'Away ' || v.ck AS away_team,
        |       CASE WHEN v.ck % 3 = 0 THEN NULL
        |            ELSE CAST((v.h // 10) || '.' || (v.h % 10) AS DOUBLE) END AS odds_home,
        |       CASE WHEN v.ck % 5 = 0 THEN NULL
        |            ELSE CAST((v.d // 10) || '.' || (v.d % 10) AS DOUBLE) END AS odds_draw,
        |       CAST((v.a // 10) || '.' || (v.a % 10) AS DOUBLE) AS odds_away
        |FROM v, (VALUES ('bet365'), ('bwin')) AS bm(bookmaker)
        |ORDER BY bm.bookmaker, v.ck""".stripMargin,

    // S4/S6 round trip: FBref Scores & Fixtures pattern-sniffing —
    // /en/matches/<id>/ report link, ISO date cell, h-a score cell
    // (absent for every 9th customer -> null goals), /en/squads/ team
    // links; the decoy stats_misc table must be skipped by the id
    // filter.
    "q_fixtures" ->
      """SELECT c_custkey AS ck,
        |       'm' || c_custkey AS match_id,
        |       '/en/matches/m' || c_custkey || '/report' AS match_url,
        |       DATE '2024-03-01' + CAST(c_custkey % 28 AS INTEGER) AS match_date,
        |       CASE WHEN c_custkey % 9 = 0 THEN NULL
        |            ELSE CAST(c_custkey % 7 AS INT) END AS home_goals,
        |       CASE WHEN c_custkey % 9 = 0 THEN NULL
        |            ELSE CAST(c_custkey % 5 AS INT) END AS away_goals,
        |       'Home ' || c_custkey AS home_team,
        |       'Away ' || c_custkey AS away_team
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // S15 round trip: ld+json SportsEvent extraction with its fallback
    // ladder cycled by custkey mod 3 — full JSON / crew-scan + body
    // score / title + labeled facts. Person names come from a fixed
    // 5-name list (the referee regex rejects digits).
    "q_matchday" ->
      """SELECT c_custkey AS ck,
        |       'Home ' || c_custkey AS home_team,
        |       'Away ' || c_custkey AS away_team,
        |       CAST(c_custkey % 5 AS INT) AS home_score,
        |       CAST(c_custkey % 4 AS INT) AS away_score,
        |       CASE WHEN c_custkey % 3 = 0 THEN '2024-05-04T18:30:00Z' END AS kickoff_utc,
        |       'Arena ' || c_nationkey AS stadium,
        |       CASE CAST(c_custkey % 5 AS INT)
        |         WHEN 0 THEN 'Anna Berg' WHEN 1 THEN 'Max Hofer'
        |         WHEN 2 THEN 'Lena Vogt' WHEN 3 THEN 'Paul Krause'
        |         ELSE 'Mia Steiner' END AS referee,
        |       'bundesliga' AS source
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // S14 stage-1 round trip: club detail parsing (h1 name, labeled
    // fact rows, first kader link).
    "q_clubs" ->
      """SELECT c_custkey AS ck,
        |       'Club ' || c_custkey AS name,
        |       CAST(1900 + c_custkey % 120 AS INT) AS founded_year,
        |       'Arena ' || c_nationkey AS stadium,
        |       CASE CAST(c_custkey % 5 AS INT)
        |         WHEN 0 THEN 'Anna Berg' WHEN 1 THEN 'Max Hofer'
        |         WHEN 2 THEN 'Lena Vogt' WHEN 3 THEN 'Paul Krause'
        |         ELSE 'Mia Steiner' END AS coach,
        |       '/de/bundesliga/clubs/c' || c_custkey || '/kader' AS squad_url
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // S20 round trip: static multi-line JSON club documents written to
    // disk and read back through Bronze.readJsonSnapshots; the oracle
    // recomputes the document fields straight from nation.
    "q_clubs_json" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS club_id,
        |       'FC ' || n_name AS name,
        |       CAST(1900 + n_nationkey % 120 AS BIGINT) AS founded,
        |       CAST(n_regionkey AS BIGINT) AS region,
        |       n_nationkey % 2 = 0 AS active
        |FROM nation
        |ORDER BY club_id""".stripMargin,

    // S16/F25/F26 round trip: every supported game-node JSON shape
    // (4 team layouts x 3 score layouts) flattens to one canonical
    // record the oracle recomputes directly.
    "q_game_json" ->
      """SELECT c_custkey AS ck,
        |       'g' || c_custkey AS game_id,
        |       'Home ' || c_custkey AS home,
        |       'Away ' || c_custkey AS away,
        |       'h' || c_custkey AS home_id,
        |       'a' || c_custkey AS away_id,
        |       CAST(c_custkey % 7 AS INT) AS home_score,
        |       CAST(c_custkey % 6 AS INT) AS away_score
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // S2/S3 round trip: live-score normalization — score split over
    // "h-a"/"h:a"/unparseable, case-insensitive F12 status ladder,
    // F29 sha-256 external id (DuckDB sha256 = Spark sha2(..,256),
    // both lowercase hex).
    "q_live_norm" ->
      """SELECT c_custkey AS ck,
        |       'Home ' || c_custkey AS home_team,
        |       'Away ' || c_custkey AS away_team,
        |       CASE WHEN c_custkey % 4 = 2 THEN NULL
        |            ELSE CAST(c_custkey % 9 AS INT) END AS home_score,
        |       CASE WHEN c_custkey % 4 = 2 THEN NULL
        |            ELSE CAST(c_custkey % 8 AS INT) END AS away_score,
        |       CASE CAST(c_custkey % 6 AS INTEGER)
        |         WHEN 0 THEN 'live' WHEN 1 THEN 'live'
        |         WHEN 2 THEN 'finished' WHEN 3 THEN 'finished'
        |         WHEN 4 THEN 'scheduled' ELSE 'live' END AS status,
        |       sha256('Home ' || c_custkey || '_Away ' || c_custkey || '_' ||
        |              CASE WHEN c_custkey % 2 = 0 THEN 'flashscore'
        |                   ELSE 'sofascore' END) AS external_id
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // Batch replay of the streaming K1 upsert (StreamReplay): the final
    // last-writer-wins state over micro-batched file drops equals the
    // arg-max-per-user row — (ts_ms, event_id) is a total version order,
    // so the merge is slicing-invariant and a batch window reproduces it.
    "q_stream_upsert" ->
      """SELECT event_id, user_id, event_type, value, ts_ms FROM (
        |  SELECT event_id, user_id, event_type, value,
        |         epoch_ms(ts) AS ts_ms,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // Watermarked tumbling-window replay: append mode emits exactly the
    // epoch-aligned 7-day windows whose end <= max event time - 1 day
    // delay (the final watermark); no row is late under time-span
    // slicing, so each emitted aggregate equals the batch GROUP BY.
    "q_stream_window" ->
      """WITH e AS (
        |  SELECT epoch_ms(ts) AS ts_ms, event_type,
        |         CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events),
        |wm AS (SELECT max(ts_ms) - 86400000 AS wm FROM e),
        |agg AS (
        |  SELECT (ts_ms // 604800000) * 604800000 AS w_start, event_type,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(v) AS BIGINT) AS sum_v
        |  FROM e GROUP BY 1, 2)
        |SELECT w_start, event_type, n_events, sum_v
        |FROM agg, wm
        |WHERE w_start + 604800000 <= wm
        |ORDER BY w_start, event_type""".stripMargin,

    // LM bigram/history count tables (integer face of the CCNet-style
    // scorer; the ln-based perplexity stays spec-gated): c12 per (w1,w2),
    // c1 = sum of c12 over w2 (history count — document-final tokens
    // start no bigram), tail trimmed at c12 >= 5.
    "q_lm_counts" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split(text, ' '),
        |                     x -> length(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks, unnest(range(1, len(t))) AS r(i)
        |  WHERE len(t) >= 2),
        |bi AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bi GROUP BY w1)
        |SELECT b.w1, b.w2, b.c12, u.c1
        |FROM bi b JOIN uni u USING (w1)
        |WHERE b.c12 >= 5
        |ORDER BY b.w1, b.w2""".stripMargin,

    // S18/S19 REST-collector round trips: Spark synthesizes
    // football-data.org-shaped response JSON per nation from customer
    // rows, runs the collectors' field/status-enum mapping, and DuckDB
    // recomputes the expected typed rows directly from customer
    // (football_data_api_collector.py:55-151 semantics).
    "q_rest_teams" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS team_id,
        |       c_name AS name,
        |       CASE WHEN c_custkey % 13 <> 0 THEN 'Nation ' || c_nationkey END AS country,
        |       CASE WHEN c_custkey % 5 <> 0 THEN 1900 + c_custkey % 120 END AS founded,
        |       CASE WHEN c_custkey % 3 <> 0 THEN substring(c_name, 1, 8) ELSE '' END AS short_name,
        |       CASE WHEN c_custkey % 4 <> 0 THEN 'T' || (c_custkey % 26) ELSE '' END AS tla
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_rest_players" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS player_id,
        |       CASE WHEN c_custkey % 11 IN (0, 5) THEN 'Unknown'
        |            WHEN c_custkey % 4 = 0 THEN 'F' || c_custkey || ' L' || c_custkey
        |            ELSE c_name END AS name,
        |       CASE WHEN c_custkey % 7 <> 0
        |            THEN DATE '1980-01-01' + CAST(c_custkey % 8000 AS INTEGER) END AS birth_date,
        |       'Nation ' || c_nationkey AS nationality,
        |       CASE WHEN c_custkey % 6 IN (0, 1) THEN NULL
        |            ELSE ['GK','DF','MF','FW'][(c_custkey % 4) + 1] END AS position
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_rest_matches" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS match_id,
        |       CAST(c_custkey AS VARCHAR) AS home_team_id,
        |       CAST(c_custkey + 1 AS VARCHAR) AS away_team_id,
        |       CAST(DATE '2024-01-01' + CAST(c_custkey % 365 AS INTEGER) AS VARCHAR)
        |         || ' ' || lpad(CAST(c_custkey % 24 AS VARCHAR), 2, '0')
        |         || ':' || lpad(CAST(c_custkey % 60 AS VARCHAR), 2, '0')
        |         || ':00' AS utc_datetime,
        |       CASE CAST(c_custkey % 10 AS INTEGER)
        |         WHEN 1 THEN 'live' WHEN 2 THEN 'live' WHEN 3 THEN 'live'
        |         WHEN 4 THEN 'finished' WHEN 5 THEN 'postponed'
        |         WHEN 6 THEN 'cancelled' WHEN 7 THEN 'suspended'
        |         ELSE 'scheduled' END AS status,
        |       CAST(c_nationkey AS VARCHAR) AS competition,
        |       '2024' AS season,
        |       CASE WHEN c_custkey % 3 = 0 THEN 'Arena ' || c_nationkey END AS venue,
        |       CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey % 34 + 1 AS VARCHAR)
        |            ELSE 'Stage ' || (c_custkey % 5) END AS round_label
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    // S16 completeness gate + enrichment coalesce-merge round trip:
    // ck%4 cycles the gate cases (0 complete — capture passes through
    // untouched even though a page exists; 1 xor-score; 2 missing away;
    // 3 no score evidence); pages exist for ck%11<>3; the page's
    // home_id is absent for ck%8=1 (capture id survives the coalesce).
    "q_game_enrich" ->
      """SELECT c_custkey AS ck,
        |       'g' || c_custkey AS id,
        |       CASE WHEN c_custkey % 4 <> 0 AND c_custkey % 11 <> 3
        |            THEN 'PgHome ' || c_custkey
        |            ELSE 'CapHome ' || c_custkey END AS home,
        |       CASE WHEN c_custkey % 4 = 0 THEN 'CapAway ' || c_custkey
        |            WHEN c_custkey % 11 <> 3 THEN 'PgAway ' || c_custkey
        |            WHEN c_custkey % 4 = 2 THEN NULL
        |            ELSE 'CapAway ' || c_custkey END AS away,
        |       CASE WHEN c_custkey % 4 <> 0 AND c_custkey % 11 <> 3
        |                 AND c_custkey % 8 <> 1
        |            THEN 'ph' || c_custkey
        |            ELSE 'ch' || c_custkey END AS home_id,
        |       CASE WHEN c_custkey % 4 = 0 THEN 'ca' || c_custkey
        |            WHEN c_custkey % 11 <> 3 THEN 'pa' || c_custkey
        |            WHEN c_custkey % 4 = 2 THEN NULL
        |            ELSE 'ca' || c_custkey END AS away_id,
        |       CASE WHEN c_custkey % 4 = 0 THEN CAST(c_custkey % 9 AS INTEGER)
        |            WHEN c_custkey % 11 <> 3 THEN CAST(c_custkey % 7 AS INTEGER)
        |            WHEN c_custkey % 4 = 1 THEN CAST(c_custkey % 5 AS INTEGER)
        |            END AS home_score,
        |       CASE WHEN c_custkey % 4 = 0 THEN CAST(c_custkey % 8 AS INTEGER)
        |            WHEN c_custkey % 11 <> 3 THEN CAST(c_custkey % 6 AS INTEGER)
        |            END AS away_score,
        |       c_custkey % 4 <> 0 AS needed_enrichment
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // §2.11 ML substrate: the fitted StringIndexer (alphabetAsc) label
    // mapping applied per row ≡ dense_rank over sorted distinct labels
    // − 1. randomSplit/HashingTF have no DuckDB-replayable witness
    // (XORShiftRandom / murmur3) and are spec-pinned instead — see
    // Models.labelIndexQuery scaladoc.
    "q_ml_labels" ->
      """SELECT p_partkey, p_type,
        |       CAST(dense_rank() OVER (ORDER BY p_type) - 1 AS BIGINT) AS label_index
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    // Exact dedup by md5 fingerprint of whitespace-collapsed lowercase
    // text, with planted duplicates (doc_id % 7 = 0 re-keyed +10M) —
    // the fingerprint normalization replays verbatim in DuckDB.
    "q_exact_dups" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 7 = 0),
        |fp AS (
        |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |         doc_id
        |  FROM all_docs)
        |SELECT fingerprint, count(*) AS dup_cnt, min(doc_id) AS first_doc
        |FROM fp
        |GROUP BY fingerprint
        |HAVING count(*) > 1
        |ORDER BY fingerprint""".stripMargin,

    // Language-ID vote replay: distinct letter-run tokens ∩ marker
    // lists, argmax with the Spark struct tie-break (highest hits, then
    // lexicographically LARGEST code → the CASE ladder tests fr, es,
    // en, de in that order). CJK check precedes the vote.
    "q_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS toks,
        |         regexp_matches(text, '[\p{Hiragana}\p{Katakana}]') AS kana,
        |         regexp_matches(text, '\p{Han}') AS han
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, kana, han,
        |         len(list_intersect(toks, ['the','and','of','is','with','for'])) AS he,
        |         len(list_intersect(toks, ['der','die','das','und','nicht','mit'])) AS hd,
        |         len(list_intersect(toks, ['le','la','les','et','est','dans'])) AS hf,
        |         len(list_intersect(toks, ['el','los','las','es','y','en'])) AS hs
        |  FROM t)
        |SELECT doc_id,
        |       CASE WHEN kana THEN 'ja'
        |              WHEN han THEN 'zh'
        |            WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |            WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |            WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
        |            WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |            ELSE 'de' END AS lang_id
        |FROM v
        |ORDER BY doc_id""".stripMargin,

    // F27 dispatch round trip: expected type derived arithmetically from
    // the synthesized segment (the ladder's precedence, not path
    // position: a prepended /verein/ only wins for otherwise-unknown
    // rows). The host carries a kind token to pin the host-strip guard.
    "q_entity_type" ->
      """SELECT c_custkey AS ck,
        |       'https://spieler-markt.de' ||
        |       CASE WHEN c_custkey % 5 = 0 THEN '/verein/c' || c_custkey ELSE '' END ||
        |       CASE WHEN c_custkey % 13 < 12
        |            THEN '/' || ['match','spiel','referee','schiedsrichter',
        |                         'stadium','stadion','player','spieler',
        |                         'coach','trainer','team','verein']
        |                        [CAST(c_custkey % 13 AS INTEGER) + 1]
        |                 || '/p' || c_custkey
        |            ELSE '/news/' || c_custkey END AS url,
        |       CASE WHEN c_custkey % 13 = 12 AND c_custkey % 5 = 0 THEN 'team'
        |            WHEN c_custkey % 13 IN (0, 1) THEN 'match'
        |            WHEN c_custkey % 13 IN (2, 3) THEN 'referee'
        |            WHEN c_custkey % 13 IN (4, 5) THEN 'stadium'
        |            WHEN c_custkey % 13 IN (6, 7) THEN 'player'
        |            WHEN c_custkey % 13 IN (8, 9) THEN 'coach'
        |            WHEN c_custkey % 13 IN (10, 11) THEN 'team'
        |            ELSE 'unknown' END AS entity_type
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // F17 matching-normalization round trip over an accent alphabet
    // where Java NFD-mark-strip ≡ DuckDB ICU strip_accents (ø/ß-class
    // divergers excluded by construction).
    "q_normalize" ->
      """WITH raw AS (
        |  SELECT c_custkey AS ck,
        |         ['Café','Über','Àgua','Señor','Çois'][CAST(c_custkey % 5 AS INTEGER) + 1]
        |           || ['-','/','!!','  ','_'][CAST(c_custkey % 5 AS INTEGER) + 1]
        |           || c_name || ' ' || c_custkey AS raw
        |  FROM customer)
        |SELECT ck, raw,
        |       trim(regexp_replace(lower(strip_accents(raw)),
        |                           '[^a-z0-9]+', ' ', 'g')) AS normalized
        |FROM raw
        |ORDER BY ck""".stripMargin,

    // F19 cross-engine replay: the substitution-cost-2 edit-distance DP
    // unrolled as a recursive CTE (one step per DP cell; `prev` is row
    // i−1, `curr` the growing prefix of row i — 1-based list indexing:
    // dp[i−1][j] = prev[j+1]); ratio = round_even(100·(n+m−D₂)/(n+m)),
    // both engines computing the same double expression and rounding
    // HALF-TO-EVEN (DuckDB round_even ≡ JVM Math.rint ≡ Python round),
    // matching thefuzz's int(round(x)) on exact-.5 scores.
    "q_fuzzy_ratio" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT c_custkey AS ck, c_name AS a,
        |         CASE CAST(c_custkey % 4 AS INTEGER)
        |           WHEN 0 THEN c_name
        |           WHEN 1 THEN substr(c_name, 1, p - 1) || substr(c_name, p + 1)
        |           WHEN 2 THEN substr(c_name, 1, p - 1) || 'x' || substr(c_name, p + 1)
        |           ELSE substr(c_name, 1, p) || substr(c_name, p) END AS b
        |  FROM (SELECT c_custkey, c_name,
        |               CAST(c_custkey % (length(c_name) - 2) AS INTEGER) + 2 AS p
        |        FROM customer)),
        |dp AS (
        |  SELECT ck, a, b, 1 AS i, 0 AS j,
        |         range(0, len(b) + 1) AS prev,
        |         [1] AS curr
        |  FROM pairs
        |  UNION ALL
        |  SELECT ck, a, b,
        |    CASE WHEN j < len(b) THEN i ELSE i + 1 END,
        |    CASE WHEN j < len(b) THEN j + 1 ELSE 0 END,
        |    CASE WHEN j < len(b) THEN prev ELSE curr END,
        |    CASE WHEN j < len(b)
        |         THEN list_append(curr, least(
        |                curr[j + 1] + 1,
        |                prev[j + 2] + 1,
        |                prev[j + 1] + CASE WHEN substr(a, i, 1) = substr(b, j + 1, 1)
        |                              THEN 0 ELSE 2 END))
        |         ELSE [i + 1] END
        |  FROM dp
        |  WHERE NOT (i = len(a) AND j = len(b)))
        |SELECT ck, a, b,
        |       CAST(round_even(100.0 * (len(a) + len(b) - curr[len(b) + 1])
        |                  / (len(a) + len(b)), 0) AS INTEGER) AS ratio
        |FROM dp
        |WHERE i = len(a) AND j = len(b)
        |ORDER BY ck""".stripMargin,

    // Cross-engine check of the codegen JaroWinkler expression against
    // DuckDB's OWN jaro_winkler_similarity (RapidFuzz-derived) — raw
    // doubles compared, no rounding witness; the Scala evaluation order
    // is pinned bit-exact to DuckDB's (fuzz-verified, 20k cases).
    "q_jaro_winkler" ->
      """WITH pairs AS (
        |  SELECT c_custkey AS ck, c_name AS a,
        |         CASE CAST(c_custkey % 6 AS INTEGER)
        |           WHEN 0 THEN c_name
        |           WHEN 1 THEN substr(c_name, 1, p - 1) || substr(c_name, p + 1)
        |           WHEN 2 THEN substr(c_name, 1, p - 1) || 'x' || substr(c_name, p + 1)
        |           WHEN 3 THEN substr(c_name, 1, p) || substr(c_name, p)
        |           WHEN 4 THEN reverse(c_name)
        |           ELSE '' END AS b
        |  FROM (SELECT c_custkey, c_name,
        |               CAST(c_custkey % (length(c_name) - 2) AS INTEGER) + 2 AS p
        |        FROM customer))
        |SELECT ck, a, b, jaro_winkler_similarity(a, b) AS jw
        |FROM pairs
        |ORDER BY ck""".stripMargin,

    // Independent dominance semantics: the Spark side is the two-phase
    // mapPartitions skyline, the oracle the classic NOT EXISTS query —
    // two entirely different algorithms, same frontier. Comparisons
    // only, no double arithmetic.
    "q_skyline" ->
      """SELECT p_partkey AS partkey, p_retailprice AS price,
        |       CAST(p_size AS BIGINT) AS size
        |FROM part t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part d
        |  WHERE d.p_retailprice <= t.p_retailprice AND d.p_size >= t.p_size
        |    AND (d.p_retailprice < t.p_retailprice OR d.p_size > t.p_size))
        |ORDER BY partkey""".stripMargin,

    // Losslessness proof for the PPJoin prefix filter: the oracle runs
    // the EXACT all-pairs token-join Jaccard with NO prefix filter —
    // agreement means the filter dropped nothing. The md5 plant coin
    // keys on the ORIGINAL doc_id (both engines compute it before the
    // +20M re-key). τ as exact integers (5·|∩| ≥ 3·|∪|); jac is one
    // IEEE division of exact ints.
    "q_prefix_join" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |planted AS (
        |  -- base.doc_id qualified: DuckDB's lateral alias would otherwise
        |  -- shadow doc_id with the +20M re-key inside the lambda coin.
        |  SELECT base.doc_id + 20000000 AS doc_id,
        |         array_to_string(list_filter(list_distinct(string_split(text, ' ')),
        |           t -> substr(md5(CAST(base.doc_id AS VARCHAR) || '|' || t), 1, 1)
        |                NOT IN ('0','1','2','3')), ' ') AS text
        |  FROM base WHERE base.doc_id % 20 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |         FROM corpus),
        |sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |                 CAST(count(*) AS BIGINT) AS inter_cnt
        |          FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT d1, d2, inter_cnt,
        |       CAST(inter_cnt AS DOUBLE) / (s1.n + s2.n - inter_cnt) AS jac
        |FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE 5 * inter_cnt >= 3 * (s1.n + s2.n - inter_cnt)
        |ORDER BY d1, d2""".stripMargin,

    // Winnowing (MOSS) fingerprints replayed positionally: md5 over each
    // 6-token gram, per-window minimum via a 8-wide ROWS frame (frames
    // that would run past the end are cut by the i <= m-7 start filter),
    // distinct per doc, df-capped, self-joined. The planted mutation
    // keeps token ORDER (list_filter, no list_distinct) — winnowing is
    // positional, unlike the set-semantics q_prefix_join plant.
    "q_winnow_pairs" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |planted AS (
        |  SELECT base.doc_id + 30000000 AS doc_id,
        |         array_to_string(list_filter(string_split(text, ' '),
        |           t -> substr(md5(CAST(base.doc_id AS VARCHAR) || '|' || t), 1, 1)
        |                <> '0'), ' ') AS text
        |  FROM base WHERE base.doc_id % 20 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        |grams AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t) - 5)) AS i,
        |         len(t) - 5 AS m, t
        |  FROM toks),
        |hashed AS (
        |  SELECT doc_id, i, m, md5(array_to_string(t[i:i+5], ' ')) AS h
        |  FROM grams),
        |wins AS (
        |  SELECT doc_id, i, m,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
        |  FROM hashed),
        |fps AS (
        |  SELECT DISTINCT doc_id, fp FROM wins WHERE m >= 8 AND i <= m - 7),
        |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        |keyed AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |         CAST(count(*) AS BIGINT) AS shared
        |  FROM keyed a JOIN keyed b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT d1, d2, shared FROM pairs ORDER BY d1, d2""".stripMargin,

    // OLS from exact integer moments: both engines accumulate Σx, Σy,
    // Σxy, Σx², Σy² exactly (Spark decimal(38,0), DuckDB HUGEINT), then
    // derive slope/intercept/corr with the same final IEEE sequence.
    // HUGEINT→DOUBLE routed through VARCHAR (DuckDB's direct cast
    // mis-rounds above 2^53 — the q_trend ruling).
    "q_regression" ->
      """WITH c AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls,
        |         CAST(l_quantity AS BIGINT) AS x,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT rf, ls, CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
        |  FROM c GROUP BY rf, ls),
        |d AS (
        |  SELECT rf, ls, n,
        |    CAST(CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS VARCHAR) AS DOUBLE) AS num,
        |    CAST(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS VARCHAR) AS DOUBLE) AS den_x,
        |    CAST(CAST(CAST(n AS HUGEINT)*syy - sy*sy AS VARCHAR) AS DOUBLE) AS den_y,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx_d,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy_d
        |  FROM s)
        |SELECT rf, ls, n,
        |       num / den_x AS slope,
        |       (sy_d - CAST(CAST((num / den_x) * sx_d AS VARCHAR) AS DOUBLE))
        |         / CAST(n AS DOUBLE) AS intercept,
        |       num / sqrt(den_x * den_y) AS corr
        |FROM d ORDER BY rf, ls""".stripMargin,

    // Schema-drift union: DuckDB's independent UNION ALL BY NAME
    // null-fills exactly like unionByName(allowMissingColumns=true).
    "q_union_byname" ->
      """SELECT * FROM (
        |  SELECT o_orderkey AS ok, o_custkey AS ck,
        |         o_totalprice AS totalprice, 'v1' AS batch
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderkey AS ok, o_custkey AS ck,
        |         o_orderstatus AS status, 'api' AS channel, 'v2' AS batch
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |ORDER BY ok""".stripMargin,

    // Soundness+completeness check for the Merkle reconciliation: the
    // Spark side finds drift via bucket checksums then compares only
    // drifted buckets; the oracle computes the TRUE diff brute-force
    // (full outer join, no buckets). Agreement proves the checksum
    // pruning dropped nothing. Price witnessed as exact cents.
    "q_table_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey AS k,
        |         concat_ws('|', o_orderkey,
        |           CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus) AS fp
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey AS k,
        |         concat_ws('|', o_orderkey,
        |           CAST(round(CASE WHEN o_orderkey % 97 = 0
        |                           THEN o_totalprice + 1.0
        |                           ELSE o_totalprice END * 100) AS BIGINT),
        |           o_orderstatus) AS fp
        |  FROM orders WHERE o_orderkey % 131 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT max(o_orderkey) FROM orders) AS k,
        |         concat_ws('|', o_orderkey + (SELECT max(o_orderkey) FROM orders),
        |           CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus) AS fp
        |  FROM orders WHERE o_orderkey % 113 = 0)
        |SELECT COALESCE(a.k, b.k) AS k,
        |       CASE WHEN a.k IS NULL THEN 'only_b'
        |            WHEN b.k IS NULL THEN 'only_a'
        |            WHEN a.fp <> b.fp THEN 'changed' END AS status
        |FROM a FULL OUTER JOIN b ON a.k = b.k
        |WHERE (a.k IS NULL OR b.k IS NULL OR a.fp <> b.fp)
        |ORDER BY k""".stripMargin,

    // Independent formulations: Spark counts triangles degree-ordered
    // (one apex per triangle, arboricity-bounded wedges); the oracle is
    // the id-canonical a<b<c three-way join with no degrees at all.
    "q_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT i.l_partkey AS x, j.l_partkey AS y
        |  FROM lineitem i JOIN lineitem j
        |    ON i.l_orderkey = j.l_orderkey AND i.l_partkey < j.l_partkey),
        |tri AS (
        |  SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |  FROM e e1 JOIN e e2 ON e2.x = e1.y
        |       JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |nodes AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
        |FROM nodes GROUP BY node ORDER BY node""".stripMargin,

    // Skew/kurtosis from exact central-moment identities (A2/A3/A4 in
    // HUGEINT, VARCHAR-routed to double); the 3/2 power is A2·√A2, not
    // pow(x,1.5) — pow is not correctly rounded, sqrt and ·/÷ are.
    "q_moments" ->
      """WITH c AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls,
        |         CAST(l_quantity AS BIGINT) AS x
        |  FROM lineitem),
        |s AS (
        |  SELECT rf, ls, CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
        |         sum(x*x*x*x) AS s4
        |  FROM c GROUP BY rf, ls),
        |d AS (
        |  SELECT rf, ls, n,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
        |    CAST(CAST(CAST(n AS HUGEINT)*s2 - s1*s1 AS VARCHAR) AS DOUBLE) AS a2,
        |    CAST(CAST(CAST(n AS HUGEINT)*n*s3 - 3*CAST(n AS HUGEINT)*s1*s2
        |              + 2*s1*s1*s1 AS VARCHAR) AS DOUBLE) AS a3,
        |    CAST(CAST(CAST(n AS HUGEINT)*n*n*s4 - 4*CAST(n AS HUGEINT)*n*s1*s3
        |              + 6*CAST(n AS HUGEINT)*s1*s1*s2
        |              - 3*s1*s1*s1*s1 AS VARCHAR) AS DOUBLE) AS a4
        |  FROM s)
        |SELECT rf, ls, n,
        |       s1d / CAST(n AS DOUBLE) AS mean,
        |       a3 / (a2 * sqrt(a2)) AS skew,
        |       a4 / (a2 * a2) - 3.0 AS kurt
        |FROM d ORDER BY rf, ls""".stripMargin,

    // Wide->long reshaping vs DuckDB's independent UNPIVOT.
    "q_unpivot" ->
      """WITH cust AS (SELECT c_nationkey AS nk1, CAST(count(*) AS BIGINT) AS customers
        |              FROM customer GROUP BY 1),
        |supp AS (SELECT s_nationkey AS nk2, CAST(count(*) AS BIGINT) AS suppliers
        |         FROM supplier GROUP BY 1),
        |wide AS (SELECT n_name AS nation,
        |                COALESCE(customers, 0) AS customers,
        |                COALESCE(suppliers, 0) AS suppliers
        |         FROM nation LEFT JOIN cust ON n_nationkey = nk1
        |                     LEFT JOIN supp ON n_nationkey = nk2)
        |SELECT nation, metric, value
        |FROM wide UNPIVOT (value FOR metric IN (customers, suppliers))
        |ORDER BY nation, metric""".stripMargin,

    // Spark intersect/except (distinct set semantics) vs native SQL
    // INTERSECT/EXCEPT.
    "q_set_ops" ->
      """WITH o AS (SELECT o_custkey AS ck, year(o_orderdate) AS y,
        |                  month(o_orderdate) AS m
        |           FROM orders),
        |h1 AS (SELECT ck FROM o WHERE y = 1995 AND m <= 6),
        |h2 AS (SELECT ck FROM o WHERE y = 1995 AND m > 6)
        |SELECT ck, 'both' AS tag
        |FROM (SELECT ck FROM h1 INTERSECT SELECT ck FROM h2)
        |UNION ALL
        |SELECT ck, 'h1_only' AS tag
        |FROM (SELECT ck FROM h1 EXCEPT SELECT ck FROM h2)
        |ORDER BY ck, tag""".stripMargin,

    // F18 normalize-then-lookup: expected codes derived arithmetically
    // from the synonym cycle; "Links" (a footedness synonym) and the
    // unknown both fall to the null default under the positions map.
    "q_term_map" ->
      """SELECT c_custkey AS ck,
        |       ['Goalkeeper!!','TORWART',' cb ','Links','  Striker',
        |        'Mittelfeld','??unknown??','RB'][CAST(c_custkey % 8 AS INTEGER) + 1]
        |         AS raw_term,
        |       CASE CAST(c_custkey % 8 AS INTEGER)
        |         WHEN 0 THEN 'GK' WHEN 1 THEN 'GK' WHEN 2 THEN 'DF'
        |         WHEN 4 THEN 'FW' WHEN 5 THEN 'MF' WHEN 7 THEN 'DF'
        |         END AS position_code
        |FROM customer
        |ORDER BY ck""".stripMargin,

    // F19 blocking pre-filter: unit-cost Levenshtein ratio — both
    // engines' levenshtein and half-away-from-zero rounding agree.
    "q_fuzzy_approx" ->
      """WITH pairs AS (
        |  SELECT c_custkey AS ck, c_name AS a,
        |         CASE CAST(c_custkey % 4 AS INTEGER)
        |           WHEN 0 THEN c_name
        |           WHEN 1 THEN substr(c_name, 1, p - 1) || substr(c_name, p + 1)
        |           WHEN 2 THEN substr(c_name, 1, p - 1) || 'x' || substr(c_name, p + 1)
        |           ELSE substr(c_name, 1, p) || substr(c_name, p) END AS b
        |  FROM (SELECT c_custkey, c_name,
        |               CAST(c_custkey % (length(c_name) - 2) AS INTEGER) + 2 AS p
        |        FROM customer))
        |SELECT ck, a, b,
        |       CASE WHEN greatest(length(a), length(b)) = 0 THEN 100
        |            ELSE CAST(round(100.0 * (1.0 - levenshtein(a, b)
        |                 / greatest(length(a), length(b)))) AS INTEGER)
        |       END AS approx_ratio
        |FROM pairs
        |ORDER BY ck""".stripMargin,

    // The sketch-then-verify two-pass is EXACT (the sketch's superset
    // guarantee means the verified+filtered output equals the plain
    // GROUP BY ... HAVING answer, whatever extra candidates the sketch
    // proposed), so the oracle is that plain answer. The threshold
    // multiply is forced to DOUBLE on both sides — DuckDB would
    // otherwise compare against an exact DECIMAL product, which can
    // disagree with IEEE doubles within one ulp of an integer count.
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
        |     n AS (SELECT count(*) AS total FROM t)
        |SELECT item, CAST(count(*) AS BIGINT) AS cnt
        |FROM t, n
        |GROUP BY item, n.total
        |HAVING count(*) > CAST(0.005 AS DOUBLE) * n.total
        |ORDER BY item""".stripMargin,

    "q_zorder" -> zorderOracleSql,
    "q_hilbert" -> hilbertOracleSql,

    // Salting is an execution-layout change only; the oracle is the
    // plain join it must be result-identical to.
    "q_salted_join" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
        |       c.c_name, c.c_nationkey
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    // Validate's violation array is a CASE ladder in rule order with
    // nulls compacted — replayed literally (NOT COALESCE(pred, FALSE)
    // per rule, list_filter for the compaction). The not-null rule on
    // event_id never fires, pinning that passing rules stay absent.
    "q_validate" ->
      """WITH q AS (
        |  SELECT event_id, event_type, value,
        |         list_filter([
        |           CASE WHEN NOT COALESCE(event_id IS NOT NULL, FALSE)
        |                THEN 'event_id_null' ELSE NULL END,
        |           CASE WHEN NOT COALESCE(event_type IS NULL OR event_type
        |                  IN ('click', 'view', 'purchase', 'signup'), FALSE)
        |                THEN 'event_type_domain' ELSE NULL END,
        |           CASE WHEN NOT COALESCE(value IS NULL OR value >= 1.0, FALSE)
        |                THEN 'value_min' ELSE NULL END
        |         ], x -> x IS NOT NULL) AS viol_list
        |  FROM events)
        |SELECT event_id, event_type, value,
        |       array_to_string(viol_list, ',') AS violations
        |FROM q
        |WHERE len(viol_list) > 0
        |ORDER BY event_id""".stripMargin,

    // CDC apply: the changelog compaction is replayed as a ranked
    // window (the SEMANTIC spec; the engine's argmax aggregate must
    // agree), the apply as a full-outer coalesce with the D filter.
    // Same synthetic feed: seq = o_orderkey, every 17th record D,
    // every 13th an I under a +500000 key offset, the rest U.
    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_custkey + CASE WHEN o_orderkey % 13 = 0
        |                          THEN 500000 ELSE 0 END AS cust_key,
        |         o_orderkey AS seq,
        |         CASE WHEN o_orderkey % 17 = 0 THEN 'D'
        |              WHEN o_orderkey % 13 = 0 THEN 'I'
        |              ELSE 'U' END AS op,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |  FROM orders),
        |latest AS (
        |  SELECT cust_key, op, acctbal FROM log
        |  QUALIFY row_number() OVER (PARTITION BY cust_key ORDER BY seq DESC) = 1),
        |base AS (
        |  SELECT c_custkey AS cust_key,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |  FROM customer)
        |SELECT COALESCE(b.cust_key, l.cust_key) AS cust_key,
        |       COALESCE(l.acctbal, b.acctbal) AS acctbal,
        |       CASE WHEN l.cust_key IS NULL THEN 'base' ELSE 'cdc' END AS src
        |FROM base b FULL OUTER JOIN latest l ON b.cust_key = l.cust_key
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY cust_key""".stripMargin,

    // Incremental join maintenance: the oracle is the MONOLITHIC join
    // with the factorization term recomputed as a CASE over the split
    // predicates — result identity proves the four delta terms are
    // disjoint and total, not merely count-preserving.
    "q_incr_join" ->
      """SELECT o.o_orderkey, o.o_custkey AS cust_key,
        |       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
        |       c.c_name,
        |       CASE WHEN o.o_orderkey % 10 = 0 AND c.c_custkey % 7 = 0 THEN 'both_delta'
        |            WHEN o.o_orderkey % 10 = 0 THEN 'a_delta'
        |            WHEN c.c_custkey % 7 = 0 THEN 'b_delta'
        |            ELSE 'old' END AS via
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // Embedding per-dim stats: float→double widening is exact, ×1e6 and
    // floor are identical IEEE ops, so the scaled integer sum is
    // bit-stable under any partitioning; min/max are exact selections.
    // generate_subscripts and unnest zip positionally in DuckDB.
    "q_embed_stats" ->
      """SELECT CAST(dim AS BIGINT) AS dim,
        |       count(*) AS n_vals,
        |       CAST(min(v) AS DOUBLE) AS min_v,
        |       CAST(max(v) AS DOUBLE) AS max_v,
        |       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS scaled_sum,
        |       CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |FROM (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |             unnest(embedding) AS v
        |      FROM embeddings)
        |GROUP BY 1 ORDER BY dim""".stripMargin,

    // Temperature mixing: sqrt is correctly-rounded IEEE (portable,
    // unlike general pow); the normalizer is an exact integer sum of
    // quantized weights; the rate is the same fixed op sequence
    // min(1, target*sq/den/n); membership is the md5 52-bit uniform.
    "q_temp_mix" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT) AS sq
        |  FROM documents GROUP BY source),
        |den AS (SELECT CAST(sum(sq) AS BIGINT) AS den FROM c),
        |r AS (SELECT c.source, c.n_docs, c.sq,
        |             LEAST(CAST(1.0 AS DOUBLE),
        |                   CAST(300 AS DOUBLE) * CAST(c.sq AS DOUBLE)
        |                     / CAST(den.den AS DOUBLE)
        |                     / CAST(c.n_docs AS DOUBLE)) AS rate
        |      FROM c, den)
        |SELECT d.source, r.n_docs, r.sq, r.rate, count(*) AS docs_kept
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |        / 4503599627370496.0 < r.rate
        |GROUP BY 1, 2, 3, 4
        |ORDER BY d.source""".stripMargin,

    // Shingle novelty: first occurrence = min(doc_id) per distinct word
    // 3-gram; per-doc novel count = count of shingles first seen there.
    // All-integer until the single final division. Docs with < 3 tokens
    // carry no shingles and are absent from both engines' group-bys.
    "q_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[CAST(u.i AS INTEGER)
        |                              : CAST(u.i + 2 AS INTEGER)], ' ') AS sh
        |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
        |  WHERE len(toks) >= 3),
        |perdoc AS (SELECT doc_id, count(*) AS n_shingles FROM g GROUP BY doc_id),
        |novel AS (
        |  SELECT first_doc AS doc_id, count(*) AS n_novel
        |  FROM (SELECT sh, min(doc_id) AS first_doc FROM g GROUP BY sh)
        |  GROUP BY first_doc)
        |SELECT p.doc_id, p.n_shingles,
        |       CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
        |       CAST(coalesce(n.n_novel, 0) AS DOUBLE) / p.n_shingles AS novelty
        |FROM perdoc p LEFT JOIN novel n USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,

    // Pairwise source shingle Jaccard. The oracle self-joins on the
    // shingle (fine at oracle scale); the engine collects the bounded
    // per-shingle source set instead. Zero-intersection pairs absent on
    // both sides.
    "q_source_overlap" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT DISTINCT source,
        |         array_to_string(toks[CAST(u.i AS INTEGER)
        |                              : CAST(u.i + 2 AS INTEGER)], ' ') AS sh
        |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
        |  WHERE len(toks) >= 3),
        |per AS (SELECT source, count(*) AS n_sh FROM g GROUP BY source),
        |icnt AS (
        |  SELECT a.source AS s1, b.source AS s2, count(*) AS inter
        |  FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.s1, i.s2,
        |       p1.n_sh AS n1, p2.n_sh AS n2, i.inter,
        |       CAST(i.inter AS DOUBLE) / (p1.n_sh + p2.n_sh - i.inter) AS jac
        |FROM icnt i
        |JOIN per p1 ON i.s1 = p1.source
        |JOIN per p2 ON i.s2 = p2.source
        |ORDER BY i.s1, i.s2""".stripMargin,

    // Length-bucketed batch construction: band = tokens // 32, in-band
    // order (tokens desc, doc_id), batches of 8; padding waste is exact
    // integer arithmetic.
    "q_length_buckets" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |b AS (SELECT doc_id, tokens, tokens // 32 AS bucket FROM d),
        |r AS (
        |  SELECT bucket, tokens,
        |         row_number() OVER (PARTITION BY bucket
        |                            ORDER BY tokens DESC, doc_id ASC) - 1 AS rn
        |  FROM b)
        |SELECT bucket, rn // 8 AS batch_id,
        |       count(*) AS n_docs,
        |       max(tokens) AS max_tokens,
        |       CAST(sum(tokens) AS BIGINT) AS sum_tokens,
        |       CAST(count(*) * max(tokens) - sum(tokens) AS BIGINT) AS padding_waste
        |FROM r GROUP BY 1, 2
        |ORDER BY bucket, batch_id""".stripMargin,

    // Integer-quantized PageRank: the iterative recurrence replayed as
    // unrolled CTE rounds (see PageRank scaladoc — all-Long arithmetic,
    // so both engines are bit-identical at every round).
    "q_pagerank" -> pagerankOracleSql,

    // k-core peeling: 6 unrolled peel rounds (degree count → survivors →
    // edge filter), exact integer degrees at every round.
    "q_kcore" -> kcoreOracleSql,

    // Multi-source BFS: 4 unrolled min-plus relaxations (MATERIALIZED
    // for the same CTE-inlining reason as q_kcore).
    "q_bfs" -> bfsOracleSql,

    // Deterministic epoch shuffle: md5-keyed permutation with contiguous
    // positions; the hash and the (key, doc_id) total order replay
    // identically in DuckDB.
    "q_shuffle" ->
      """SELECT doc_id,
        |       md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |       CAST(row_number() OVER (
        |         ORDER BY md5('epoch1:' || CAST(doc_id AS VARCHAR)) ASC,
        |                  doc_id ASC) AS BIGINT) AS pos
        |FROM documents
        |ORDER BY pos""".stripMargin,

    // Join-size prediction identity: Σ cntA·cntB over common keys must
    // equal the measured join size, in both engines.
    "q_join_size" ->
      """WITH ca AS (SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1),
        |cb AS (SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1),
        |p AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys_common,
        |         CAST(sum(ca * cb) AS BIGINT) AS predicted_rows
        |  FROM ca JOIN cb USING (k)),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS actual_rows
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
        |SELECT p.n_keys_common, p.predicted_rows, a.actual_rows FROM p, a""".stripMargin,

    // Gap-fill to a daily grid with forward fill: close-of-day value is
    // the ordered-last aggregate (same (ts_ms, event_id) total order as
    // the engine's max_by), the spine is generate_series over each
    // user's [min, max] day, and the carry is IGNORE NULLS last_value.
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         epoch_ms(ts) // 86400000 AS day, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, last(value ORDER BY ts_ms, event_id) AS value
        |  FROM e GROUP BY user_id, day),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY user_id),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM bounds),
        |j AS (
        |  SELECT s.user_id, s.day, d.value
        |  FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, day,
        |       last_value(value IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY day) AS filled_value,
        |       value IS NOT NULL AS is_observed
        |FROM j
        |ORDER BY user_id, day""".stripMargin,

    // SemDeDup-shaped keep-one: the q_cosine_dups pair pipeline (same
    // planted corpus, same banding, same rounded-cosine threshold)
    // feeding a recursive-CTE connected components; keep = min vec_id
    // per cluster, singletons kept. Full-corpus keep decisions.
    "q_semantic_keep" ->
      """WITH RECURSIVE base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |pert AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |         [v[i] + CASE WHEN (i - 1) % 2 = 0 THEN 0.01 ELSE -0.01 END
        |          for i in generate_series(1, len(v))] AS v
        |  FROM base WHERE vec_id % 10 = 0),
        |e AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |chunks AS (
        |  SELECT vec_id, v, b AS band,
        |         SUM(CASE WHEN v[8 * b + i + 1] >= 0 THEN (1 << i) ELSE 0 END) AS bkey
        |  FROM e, (SELECT unnest(range(4)) AS b) bs, (SELECT unnest(range(8)) AS i) bits
        |  GROUP BY 1, 2, 3),
        |pairs AS (
        |  SELECT d1, d2 FROM (
        |    SELECT DISTINCT x.vec_id AS d1, y.vec_id AS d2,
        |           round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
        |    FROM chunks x JOIN chunks y
        |      ON x.bkey = y.bkey AND x.band = y.band AND x.vec_id < y.vec_id)
        |  WHERE cos_sim >= 0.9),
        |sym AS (SELECT d1 AS u, d2 AS v FROM pairs
        |        UNION SELECT d2, d1 FROM pairs),
        |reach(node, r) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |  UNION
        |  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node),
        |lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
        |l2 AS (
        |  SELECT a.vec_id, coalesce(l.cluster_id, a.vec_id) AS cluster_id
        |  FROM (SELECT vec_id FROM e) a LEFT JOIN lab l ON a.vec_id = l.node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM l2 GROUP BY 1)
        |SELECT v.vec_id, v.cluster_id, s.cluster_size,
        |       v.vec_id = v.cluster_id AS is_kept
        |FROM l2 v JOIN sz s USING (cluster_id)
        |ORDER BY v.vec_id""".stripMargin,

    // DSIR-shaped importance scores with rational quantized weights —
    // all-integer (products in HUGEINT, matching Spark's decimal(38,0)),
    // so the replay is exact. Target slice = lang = 'en'.
    "q_importance" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |fc AS (
        |  SELECT tok, count(*) AS cr,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |  FROM toks GROUP BY tok),
        |tot AS (
        |  SELECT CAST(sum(cr) AS HUGEINT) AS tr,
        |         CAST(sum(ct) AS HUGEINT) AS tt
        |  FROM fc),
        |w AS (
        |  SELECT tok,
        |         CAST((1000000 * (CAST(ct AS HUGEINT) + 1) * tr)
        |              // ((CAST(cr AS HUGEINT) + 1) * tt) AS BIGINT) AS w
        |  FROM fc, tot)
        |SELECT dt.doc_id,
        |       CAST(sum(dt.c) AS BIGINT) AS n_tokens,
        |       CAST(sum(dt.c * w.w) AS BIGINT) AS score,
        |       CAST(sum(dt.c * w.w) // sum(dt.c) AS BIGINT) AS mean_w
        |FROM dt JOIN w USING (tok)
        |GROUP BY dt.doc_id
        |ORDER BY dt.doc_id""".stripMargin,

    // Exact key-distribution profile: positional percentiles over the
    // (cnt, key)-sorted counts — a unique total order, so both engines
    // select the same row; ⌈p·n/100⌉ in exact integer arithmetic.
    "q_skew_profile" ->
      """WITH c AS (
        |  SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT k, cnt,
        |         row_number() OVER (ORDER BY cnt ASC, k ASC) AS rank,
        |         count(*) OVER () AS n
        |  FROM c),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(sum(cnt) AS BIGINT) AS total_rows,
        |         max(cnt) AS max_cnt
        |  FROM c),
        |p50 AS (SELECT cnt AS p50 FROM r WHERE rank = (n * 50 + 99) // 100),
        |p90 AS (SELECT cnt AS p90 FROM r WHERE rank = (n * 90 + 99) // 100),
        |p99 AS (SELECT cnt AS p99 FROM r WHERE rank = (n * 99 + 99) // 100)
        |SELECT a.n_keys, a.total_rows, a.max_cnt, p50.p50, p90.p90, p99.p99,
        |       CAST((1000 * a.max_cnt * a.n_keys) // a.total_rows AS BIGINT)
        |         AS skew_x1000
        |FROM agg a, p50, p90, p99""".stripMargin,

    // Markov transitions: adjacent-pair lead over the engine's
    // (ts_ms, event_id) total order; p = one IEEE division of exact longs.
    "q_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
        |  FROM events),
        |nx AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts_ms, event_id) AS next_type
        |  FROM e),
        |pairs AS (
        |  SELECT event_type AS prev_type, next_type,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, sum(cnt) AS total FROM pairs GROUP BY 1)
        |SELECT p.prev_type, p.next_type, p.cnt,
        |       CAST(p.cnt AS DOUBLE) / t.total AS p
        |FROM pairs p JOIN tot t USING (prev_type)
        |ORDER BY p.prev_type, p.next_type""".stripMargin,

    // Half-life decay: exact power-of-two weights over the per-user
    // recency rank; floor(value*100) and the final division are the only
    // IEEE ops, both single and engine-identical.
    "q_decay" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |         CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, cents,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts_ms DESC, event_id DESC) AS r
        |  FROM e),
        |f AS (
        |  SELECT user_id, cents, CAST(1 AS BIGINT) << (16 - r) AS wgt
        |  FROM r WHERE r <= 16)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_recent,
        |       CAST(sum(wgt * cents) AS BIGINT) AS wsum,
        |       CAST(sum(wgt) AS BIGINT) AS wtot,
        |       CAST(sum(wgt * cents) AS DOUBLE) / sum(wgt) AS decayed_cents
        |FROM f GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // PMI-shaped collocations: score = c_xy·N/(c_x·c_y) from exact longs
    // (log omitted — monotone), cast-and-divide is the only IEEE step.
    "q_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM uni),
        |bi AS (
        |  SELECT t[i] || ' ' || t[i + 1] AS bigram,
        |         CAST(count(*) AS BIGINT) AS c_xy
        |  FROM toks, unnest(range(1, len(t))) AS r(i)
        |  GROUP BY 1 HAVING count(*) >= 5)
        |SELECT b.bigram, b.c_xy, u1.cnt AS c1, u2.cnt AS c2,
        |       CAST(b.c_xy * tot.n_total AS DOUBLE)
        |         / CAST(u1.cnt * u2.cnt AS DOUBLE) AS score
        |FROM bi b
        |JOIN uni u1 ON u1.tok = split_part(b.bigram, ' ', 1)
        |JOIN uni u2 ON u2.tok = split_part(b.bigram, ' ', 2)
        |CROSS JOIN tot
        |ORDER BY score DESC, bigram ASC
        |LIMIT 100""".stripMargin,

    // OOV rate vs the corpus-built vocab (global count >= 3); the rate is
    // one IEEE division of exact longs.
    "q_oov" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |vocab AS (
        |  SELECT term FROM tf GROUP BY term HAVING sum(tf) >= 3)
        |SELECT t.doc_id,
        |       CAST(sum(t.tf) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN v.term IS NULL THEN t.tf ELSE 0 END)
        |            AS BIGINT) AS n_oov,
        |       CAST(sum(CASE WHEN v.term IS NULL THEN t.tf ELSE 0 END)
        |            AS DOUBLE) / sum(t.tf) AS oov_rate
        |FROM tf t LEFT JOIN vocab v USING (term)
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // Column profiling through the canonical VARCHAR cast; min/max are
    // lexicographic on the string form (int + string columns only, where
    // the cast is engine-identical).
    "q_profile" ->
      """WITH u AS (
        |  SELECT 'l_orderkey' AS col_name, CAST(l_orderkey AS VARCHAR) AS val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', l_returnflag FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', l_linestatus FROM lineitem)
        |SELECT col_name,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_nulls,
        |       CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
        |       min(val) AS min_val, max(val) AS max_val
        |FROM u GROUP BY col_name
        |ORDER BY col_name""".stripMargin,

    // Asymmetric containment: same df-capped shingle machinery as
    // q_jaccard_pairs; exact integer threshold (inter·5 ≥ 4·min(n1,n2)),
    // containment emitted as one IEEE division.
    "q_containment" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s0 AS (SELECT doc_id, lang,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in generate_series(1, len(toks)-2)])) AS sh
        |      FROM t),
        |keep AS (SELECT sh FROM s0 GROUP BY sh HAVING count(*) <= 50),
        |s AS (SELECT s0.* FROM s0 JOIN keep USING (sh)),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter_cnt
        |          FROM s a JOIN s b
        |            ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT d1, d2, inter_cnt, x.n AS n1, y.n AS n2,
        |       CAST(inter_cnt AS DOUBLE) / least(x.n, y.n) AS containment
        |FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
        |WHERE inter_cnt * 5 >= least(x.n, y.n) * 4
        |ORDER BY d1, d2""".stripMargin,

    // Merkle bucket digest: brute-force replay of the md5-prefix bucket
    // routing and the order-insensitive xor checksum fold.
    "q_table_digest" ->
      """WITH s AS (
        |  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 64 AS bucket,
        |         CAST('0x' || substr(md5(concat_ws('|', o_orderkey,
        |                CAST(round(o_totalprice * 100) AS BIGINT),
        |                o_orderstatus)), 1, 15) AS BIGINT) AS rh
        |  FROM orders)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(bit_xor(rh) AS BIGINT) AS checksum
        |FROM s GROUP BY bucket
        |ORDER BY bucket""".stripMargin,

    // Power-of-two histogram: bucket = bit length of the floored value
    // (printf('%b') length ≡ Spark's bin() length); all quantile flags
    // are exact integer cross-multiplies.
    "q_log2_hist" ->
      """WITH b AS (
        |  SELECT CAST(length(printf('%b', CAST(floor(o_totalprice) AS BIGINT)))
        |              AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT x.bucket, x.cnt, CAST(sum(y.cnt) AS BIGINT) AS cum
        |  FROM b x JOIN b y ON y.bucket <= x.bucket
        |  GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM b)
        |SELECT bucket, cnt, cum,
        |       CAST(1 AS BIGINT) << CAST(bucket - 1 AS INTEGER) AS lo,
        |       cum * 100 >= total * 50 AND (cum - cnt) * 100 < total * 50 AS is_p50,
        |       cum * 100 >= total * 90 AND (cum - cnt) * 100 < total * 90 AS is_p90,
        |       cum * 100 >= total * 99 AND (cum - cnt) * 100 < total * 99 AS is_p99
        |FROM c, t
        |ORDER BY bucket""".stripMargin,

    // Sorted-neighborhood blocking: rank = row_number over the unique
    // (name, id) order; candidates = the w=2 successors; plain
    // Levenshtein cut at 2 (ASCII keys — engine-portable).
    "q_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT c_custkey, c_name,
        |         CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT)
        |           AS rnk
        |  FROM customer)
        |SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |       a.c_name AS name1, b.c_name AS name2,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM r a JOIN r b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 2
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id1, id2""".stripMargin,

    // Quantized Lloyd's k-means — 4 unrolled MATERIALIZED rounds (the
    // same CTE-inlining hazard as q_kcore); every round is exact integer
    // arithmetic so the replay is bit-exact.
    "q_kmeans" -> kmeansOracle(iters = 4, k = 8),

    // Same replayed rounds, evaluated against the ground-truth labels;
    // majority tie-break (cnt DESC, label ASC) matches the engine's
    // min-struct on (−cnt, label).
    "q_cluster_purity" -> clusterPurityOracle(iters = 4, k = 8),

    // Rational-idf tf-idf top-3 per doc: score = tf·N/df from exact
    // longs, row_number (score DESC, term ASC) ≡ the TopKPerKey order.
    "q_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |s AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |         CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS score
        |  FROM tf t JOIN dfq d USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, term ASC) AS rn
        |  FROM s)
        |SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3
        |ORDER BY doc_id, term""".stripMargin,

    // Interval union sweep: distinct starts make the per-user order
    // total; running-max-end flags merged-run starts.
    "q_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, s, s + 300000 AS e
        |  FROM (SELECT DISTINCT user_id, epoch_ms(ts) AS s FROM events)),
        |f AS (
        |  SELECT user_id, s, e,
        |         max(e) OVER (PARTITION BY user_id ORDER BY s
        |                      ROWS BETWEEN UNBOUNDED PRECEDING
        |                        AND 1 PRECEDING) AS maxe
        |  FROM iv),
        |g AS (
        |  SELECT user_id, s, e,
        |         sum(CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY s
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW) AS island
        |  FROM f),
        |i AS (SELECT user_id, island, min(s) AS i_start, max(e) AS i_end
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |       CAST(sum(i_end - i_start) AS BIGINT) AS covered_ms
        |FROM i GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // Lag-1 autocorrelation: exact daily cents series, equi-join lag
    // pairing, then the same exact-moment OLS replay as q_regression
    // (VARCHAR-routed HUGEINT→DOUBLE casts — see q_trend pitfall note).
    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |p AS (
        |  SELECT a.prio, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON a.prio = b.prio AND b.day = a.day + 1),
        |s AS (
        |  SELECT prio, CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         -- HUGEINT-widened BEFORE the product: daily cents at the
        |         -- 10x corpus put x*x past INT64
        |         sum(CAST(x AS HUGEINT)*x) AS sxx,
        |         sum(CAST(x AS HUGEINT)*y) AS sxy,
        |         sum(CAST(y AS HUGEINT)*y) AS syy
        |  FROM p GROUP BY prio),
        |d AS (
        |  SELECT prio, n,
        |    CAST(CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS VARCHAR) AS DOUBLE) AS num,
        |    CAST(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS VARCHAR) AS DOUBLE) AS den_x,
        |    CAST(CAST(CAST(n AS HUGEINT)*syy - sy*sy AS VARCHAR) AS DOUBLE) AS den_y,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx_d,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy_d
        |  FROM s)
        |SELECT prio, n,
        |       num / den_x AS slope,
        |       (sy_d - CAST(CAST((num / den_x) * sx_d AS VARCHAR) AS DOUBLE))
        |         / CAST(n AS DOUBLE) AS intercept,
        |       num / sqrt(den_x * den_y) AS corr
        |FROM d ORDER BY prio""".stripMargin,

    // Degree distribution of the co-trading graph in log2 buckets.
    "q_degree_dist" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS node FROM pairs
        |        UNION ALL SELECT b AS node FROM pairs)
        |  GROUP BY node)
        |SELECT CAST(length(printf('%b', deg)) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_nodes,
        |       CAST(sum(deg) AS BIGINT) AS sum_deg,
        |       min(deg) AS min_deg, max(deg) AS max_deg
        |FROM deg GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    // Per-source dataset card; language spread via the distinct
    // subselect, avg_tokens exact integer division.
    "q_dataset_card" ->
      """WITH d AS (
        |  SELECT source, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_en
        |  FROM d GROUP BY source),
        |l AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_langs
        |  FROM (SELECT DISTINCT source, lang FROM d) GROUP BY source)
        |SELECT b.source, b.n_docs, b.n_tokens, l.n_langs,
        |       CAST(b.n_tokens // b.n_docs AS BIGINT) AS avg_tokens,
        |       CAST(b.n_en AS DOUBLE) / b.n_docs AS en_share
        |FROM base b JOIN l USING (source)
        |ORDER BY b.source""".stripMargin,

    // Week-over-week growth: exact weekly cents series + lag equi-join;
    // pct is the single IEEE division.
    "q_wow" ->
      """WITH weekly AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(o_orderdate) // 604800000 AS week,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2)
        |SELECT a.prio, a.week + 1 AS week, a.v AS v_prev, b.v AS v_cur,
        |       b.v - a.v AS delta,
        |       CAST(b.v - a.v AS DOUBLE) / a.v AS pct
        |FROM weekly a JOIN weekly b
        |  ON a.prio = b.prio AND b.week = a.week + 1
        |ORDER BY a.prio, week""".stripMargin,

    // Per-group exact mode; row_number (cnt DESC, prio ASC) ≡ the
    // engine's min-struct on (−cnt, prio).
    "q_mode" ->
      """WITH c AS (
        |  SELECT n.n_name AS nation_name, o.o_orderpriority AS prio,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
        |       JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY nation_name
        |                               ORDER BY cnt DESC, prio ASC) AS rn,
        |         sum(cnt) OVER (PARTITION BY nation_name) AS n_orders
        |  FROM c)
        |SELECT nation_name, prio AS mode_priority, cnt AS mode_cnt,
        |       CAST(n_orders AS BIGINT) AS n_orders,
        |       CAST(cnt AS DOUBLE) / n_orders AS share
        |FROM r WHERE rn = 1
        |ORDER BY nation_name""".stripMargin,

    // Fano factor from exact integer moments of the daily count series.
    "q_fano" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x*x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sx,
        |       CAST(sx AS DOUBLE) / n_days AS mean,
        |       CAST(n_days * sxx - sx * sx AS DOUBLE) / (n_days * sx) AS fano
        |FROM s ORDER BY event_type""".stripMargin,

    // Per-source exact-dup mass, same fingerprint normalization and
    // planted-duplicate fixture as q_exact_dups ('mirror' source).
    "q_dup_rate" ->
      """WITH d AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, 'mirror', text
        |  FROM documents WHERE doc_id % 7 = 0),
        |f AS (
        |  SELECT doc_id, source,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM d),
        |c AS (SELECT fp, count(*) AS cnt FROM f GROUP BY 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup_docs,
        |       CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS dup_share
        |FROM f JOIN c USING (fp)
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // 2-D power-of-two heatmap over (quantity, extendedprice).
    "q_hist2d" ->
      """SELECT CAST(length(printf('%b', CAST(floor(l_quantity) AS BIGINT)))
        |            AS BIGINT) AS qty_bucket,
        |       CAST(length(printf('%b', CAST(floor(l_extendedprice) AS BIGINT)))
        |            AS BIGINT) AS price_bucket,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY qty_bucket, price_bucket""".stripMargin,

    // Conversion lag by purchase weekday: DuckDB's native ASOF JOIN
    // replays the engine's union-sort as-of; dow by epoch arithmetic
    // (calendar functions are engine/locale-dependent, epoch math isn't).
    "q_conv_lag" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, epoch_ms(ts) AS ts_ms
        |           FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT (p.ts_ms // 86400000 + 3) % 7 AS dow,
        |         p.ts_ms - v.ts_ms AS lag_ms
        |  FROM p ASOF JOIN v
        |    ON p.user_id = v.user_id AND v.ts_ms < p.ts_ms)
        |SELECT dow, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(lag_ms) // count(*) AS BIGINT) AS mean_ms,
        |       quantile_cont(lag_ms, 0.5) AS median_ms,
        |       CAST(max(lag_ms) AS BIGINT) AS max_ms
        |FROM j GROUP BY dow
        |ORDER BY dow""".stripMargin,

    // Weekday seasonality: per-(type, dow) counts + share of type total.
    "q_seasonality" ->
      """WITH cells AS (
        |  SELECT event_type, (epoch_ms(ts) // 86400000 + 3) % 7 AS dow,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, sum(cnt) AS total FROM cells GROUP BY 1)
        |SELECT c.event_type, c.dow, c.cnt,
        |       CAST(c.cnt AS DOUBLE) / t.total AS share
        |FROM cells c JOIN t USING (event_type)
        |ORDER BY c.event_type, c.dow""".stripMargin,

    // Deterministic A/B arms by md5 parity of the user id; exact cents
    // mass per arm, ratios as single IEEE divisions.
    "q_ab_lift" ->
      """WITH p AS (
        |  SELECT CAST('0x' || substr(md5('ab:' || user_id), 1, 15)
        |              AS BIGINT) % 2 AS arm,
        |         CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS sum_a,
        |         CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS sum_b
        |  FROM p)
        |SELECT n_a, n_b, sum_a, sum_b,
        |       CAST(sum_a AS DOUBLE) / n_a AS mean_a,
        |       CAST(sum_b AS DOUBLE) / n_b AS mean_b,
        |       (CAST(sum_b AS DOUBLE) / n_b - CAST(sum_a AS DOUBLE) / n_a)
        |         / (CAST(sum_a AS DOUBLE) / n_a) AS lift
        |FROM s""".stripMargin,

    // Bipartite projection onto suppliers, weight = shared customers.
    "q_bipartite" ->
      """WITH cs AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS s
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT a.s AS s1, b.s AS s2,
        |       CAST(count(*) AS BIGINT) AS shared_customers
        |FROM cs a JOIN cs b ON a.cust = b.cust AND a.s < b.s
        |GROUP BY 1, 2
        |ORDER BY shared_customers DESC, s1, s2
        |LIMIT 50""".stripMargin,

    // Simpson language-concentration index per source.
    "q_simpson" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |s AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |         CAST(count(*) AS BIGINT) AS n_langs,
        |         CAST(sum(c*(c-1)) AS BIGINT) AS num
        |  FROM c GROUP BY source)
        |SELECT source, n_docs, n_langs,
        |       CAST(num AS DOUBLE) / (n_docs * (n_docs - 1)) AS simpson
        |FROM s WHERE n_docs > 1
        |ORDER BY source""".stripMargin,

    // RFM terciles against exact interpolated percentile thresholds
    // (quantile_cont ≡ Spark's percentile); codes by plain comparisons.
    "q_rfm" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |         CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, max(day) AS last_day,
        |         CAST(count(*) AS BIGINT) AS f_cnt,
        |         CAST(sum(cents) AS BIGINT) AS m_cents
        |  FROM p GROUP BY user_id),
        |h AS (SELECT max(last_day) AS h FROM u),
        |r AS (SELECT user_id, h.h - last_day AS r_days, f_cnt, m_cents
        |      FROM u, h),
        |th AS (
        |  SELECT quantile_cont(r_days, 0.33) AS r1, quantile_cont(r_days, 0.67) AS r2,
        |         quantile_cont(f_cnt, 0.33) AS f1, quantile_cont(f_cnt, 0.67) AS f2,
        |         quantile_cont(m_cents, 0.33) AS m1, quantile_cont(m_cents, 0.67) AS m2
        |  FROM r),
        |coded AS (
        |  SELECT user_id, r_days, f_cnt, m_cents,
        |    CAST(CASE WHEN r_days <= r1 THEN 1 WHEN r_days <= r2 THEN 2
        |              ELSE 3 END AS BIGINT) AS r_code,
        |    CAST(CASE WHEN f_cnt <= f1 THEN 3 WHEN f_cnt <= f2 THEN 2
        |              ELSE 1 END AS BIGINT) AS f_code,
        |    CAST(CASE WHEN m_cents <= m1 THEN 3 WHEN m_cents <= m2 THEN 2
        |              ELSE 1 END AS BIGINT) AS m_code
        |  FROM r, th)
        |SELECT user_id, r_days, f_cnt, m_cents, r_code, f_code, m_code,
        |       r_code * 100 + f_code * 10 + m_code AS rfm_code
        |FROM coded
        |ORDER BY user_id""".stripMargin,

    // Point-in-time snapshot from the SCD2 window (same lead replay as
    // q_scd2) at the mid-corpus cutoff.
    "q_time_travel" ->
      """SELECT user_id, event_id, value, valid_from
        |FROM (SELECT user_id, event_id, value, epoch_ms(ts) AS valid_from,
        |             lead(epoch_ms(ts)) OVER (PARTITION BY user_id
        |                                      ORDER BY epoch_ms(ts), event_id)
        |               AS valid_to
        |      FROM events)
        |WHERE valid_from <= 1705708800000
        |  AND (valid_to IS NULL OR valid_to > 1705708800000)
        |ORDER BY user_id""".stripMargin,

    // Neighbor-set Jaccard over the bipartite projection; exact integer
    // threshold (shared·4 ≥ union) before the one IEEE division.
    "q_graph_jaccard" ->
      """WITH cs AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS s
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM cs GROUP BY s),
        |sh AS (
        |  SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS shared
        |  FROM cs a JOIN cs b ON a.cust = b.cust AND a.s < b.s
        |  GROUP BY 1, 2)
        |SELECT sh.s1, sh.s2, sh.shared, x.d AS d1, y.d AS d2,
        |       CAST(sh.shared AS DOUBLE) / (x.d + y.d - sh.shared) AS jaccard
        |FROM sh JOIN deg x ON sh.s1 = x.s JOIN deg y ON sh.s2 = y.s
        |WHERE sh.shared * 4 >= x.d + y.d - sh.shared
        |ORDER BY jaccard DESC, s1, s2
        |LIMIT 50""".stripMargin,

    // Zipf coverage curve: row_number (cnt DESC, tok) ≡ the distributed
    // global rank; conditional sums per cutoff.
    "q_coverage" ->
      """WITH c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1),
        |r AS (
        |  SELECT tok, cnt,
        |         CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rnk
        |  FROM c),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |cuts AS (SELECT CAST(unnest([100, 1000, 10000]) AS BIGINT) AS cutoff),
        |sel AS (
        |  SELECT cutoff,
        |         CAST(sum(CASE WHEN rnk <= cutoff THEN cnt ELSE 0 END)
        |              AS BIGINT) AS covered
        |  FROM r, cuts GROUP BY cutoff)
        |SELECT cutoff, covered, CAST(covered AS DOUBLE) / t.total AS share
        |FROM sel, t
        |ORDER BY cutoff""".stripMargin,

    // Keyness: smoothed relative risk of the English slice, exact longs,
    // one cast-and-divide.
    "q_keyness" ->
      """WITH tok AS (
        |  SELECT tok,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS b
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY tok),
        |t AS (SELECT CAST(sum(a) AS BIGINT) AS n_en,
        |             CAST(sum(b) AS BIGINT) AS n_rest FROM tok)
        |SELECT tok, a, b,
        |       CAST(a * (t.n_rest + 1) AS DOUBLE)
        |         / CAST((b + 1) * t.n_en AS DOUBLE) AS score
        |FROM tok, t
        |WHERE a + b >= 20
        |ORDER BY score DESC, tok
        |LIMIT 50""".stripMargin,

    // Order-2 event paths: two leads over the (ts_ms, event_id) order.
    "q_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
        |  FROM events),
        |p AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS t3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
        |SELECT t1 || '>' || t2 || '>' || t3 AS path,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM p WHERE t3 IS NOT NULL
        |GROUP BY 1
        |ORDER BY cnt DESC, path
        |LIMIT 20""".stripMargin,

    // Churn flag vs the corpus horizon; exact integer comparison.
    "q_churn" ->
      """WITH u AS (
        |  SELECT user_id, max(epoch_ms(ts) // 86400000) AS last_day,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id),
        |h AS (SELECT max(last_day) AS max_day FROM u)
        |SELECT user_id, last_day, n_events,
        |       last_day <= max_day - 30 AS churned
        |FROM u, h
        |ORDER BY user_id""".stripMargin,

    // Inter-purchase gaps: per-user lag, one global stats row; exact
    // mean division, interpolated exact percentiles.
    "q_purchase_gaps" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
        |                                  ORDER BY ts_ms, event_id) AS gap_ms
        |  FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n_gaps,
        |       CAST(sum(gap_ms) // count(*) AS BIGINT) AS mean_ms,
        |       quantile_cont(gap_ms, 0.5) AS p50_ms,
        |       quantile_cont(gap_ms, 0.9) AS p90_ms,
        |       CAST(max(gap_ms) AS BIGINT) AS max_ms
        |FROM g WHERE gap_ms IS NOT NULL""".stripMargin,

    // Exact 2-sigma day flags: z² > 4 with both sides ×n² — pure
    // integer arithmetic, no σ, no sqrt, no FP.
    "q_anomaly_days" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x*x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, d.x
        |FROM daily d JOIN m USING (event_type)
        |WHERE (m.n * d.x - m.sx) * (m.n * d.x - m.sx)
        |        > 4 * (m.n * m.sxx - m.sx * m.sx)
        |ORDER BY d.event_type, d.day""".stripMargin,

    // Market-basket lift: the PMI rational over order baskets.
    "q_basket_lift" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM op),
        |pc AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY p),
        |pairs AS (
        |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT pairs.p1, pairs.p2, pairs.c_ab, x.c AS c1, y.c AS c2,
        |       CAST(pairs.c_ab * n.n_orders AS DOUBLE)
        |         / CAST(x.c * y.c AS DOUBLE) AS lift
        |FROM pairs JOIN pc x ON pairs.p1 = x.p
        |     JOIN pc y ON pairs.p2 = y.p
        |     CROSS JOIN n
        |ORDER BY lift DESC, p1, p2
        |LIMIT 50""".stripMargin,

    // Rank movers between corpus halves; row_number over the 25-row
    // per-half aggregate ≡ the engine's counting self-join rank.
    "q_movers" ->
      """WITH o AS (
        |  SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
        |hv AS (
        |  SELECT n.n_name AS nation_name,
        |         CASE WHEN o.day * 2 <= b.d0 + b.d1 THEN 'h1' ELSE 'h2' END AS half,
        |         CAST(sum(o.p) * 100 AS BIGINT) AS v
        |  FROM o CROSS JOIN b
        |       JOIN customer c ON o.o_custkey = c.c_custkey
        |       JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT nation_name, half, v,
        |         CAST(row_number() OVER (PARTITION BY half
        |                                 ORDER BY v DESC, nation_name)
        |              AS BIGINT) AS rnk
        |  FROM hv)
        |SELECT a.nation_name, a.v AS v_h1, c.v AS v_h2,
        |       a.rnk AS rank_h1, c.rnk AS rank_h2,
        |       a.rnk - c.rnk AS rank_delta
        |FROM r a JOIN r c ON a.nation_name = c.nation_name
        |     AND a.half = 'h1' AND c.half = 'h2'
        |ORDER BY a.nation_name""".stripMargin,

    // Global clustering coefficient: independent formulations (engine:
    // degree-ordered per-node counts summed; oracle: id-canonical
    // 3-join) + wedge count from degrees.
    "q_clustering" ->
      """WITH e AS (
        |  SELECT DISTINCT i.l_partkey AS x, j.l_partkey AS y
        |  FROM lineitem i JOIN lineitem j
        |    ON i.l_orderkey = j.l_orderkey AND i.l_partkey < j.l_partkey),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT x AS node FROM e UNION ALL SELECT y AS node FROM e)
        |  GROUP BY node),
        |ds AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |         CAST(sum(d) // 2 AS BIGINT) AS n_edges,
        |         CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS wedges
        |  FROM deg),
        |tri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS t
        |  FROM e e1 JOIN e e2 ON e2.x = e1.y
        |       JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
        |SELECT ds.n_nodes, ds.n_edges, ds.wedges, tri.t AS triangles,
        |       CAST(3 * tri.t AS DOUBLE) / ds.wedges AS global_coef
        |FROM ds, tri""".stripMargin,

    // Degree assortativity: exact-moment OLS over endpoint degrees of
    // the symmetrized co-trading edge list (q_regression replay).
    "q_assortativity" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l.l_suppkey AS x, -(o.o_custkey + 1) AS y
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |sym AS (SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs),
        |deg AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
        |sc AS (
        |  SELECT 'all' AS g, dx.d AS x, dy.d AS y
        |  FROM sym JOIN deg dx ON sym.x = dx.v JOIN deg dy ON sym.y = dy.v),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
        |  FROM sc GROUP BY g),
        |d AS (
        |  SELECT g, n,
        |    CAST(CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS VARCHAR) AS DOUBLE) AS num,
        |    CAST(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS VARCHAR) AS DOUBLE) AS den_x,
        |    CAST(CAST(CAST(n AS HUGEINT)*syy - sy*sy AS VARCHAR) AS DOUBLE) AS den_y,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx_d,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy_d
        |  FROM s)
        |SELECT g, n,
        |       num / den_x AS slope,
        |       (sy_d - CAST(CAST((num / den_x) * sx_d AS VARCHAR) AS DOUBLE))
        |         / CAST(n AS DOUBLE) AS intercept,
        |       num / sqrt(den_x * den_y) AS corr
        |FROM d""".stripMargin,

    // HHI: exact HUGEINT sums of squared cents, VARCHAR-routed casts.
    "q_hhi" ->
      """WITH bySupp AS (
        |  SELECT s.s_nationkey, l.l_suppkey,
        |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100
        |              AS HUGEINT) AS v
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |         CAST(sum(v) AS BIGINT) AS total_cents,
        |         sum(v * v) AS num,
        |         sum(v) * sum(v) AS den
        |  FROM bySupp GROUP BY 1)
        |SELECT n.n_name AS nation_name, a.n_suppliers, a.total_cents,
        |       CAST(CAST(a.num AS VARCHAR) AS DOUBLE)
        |         / CAST(CAST(a.den AS VARCHAR) AS DOUBLE) AS hhi
        |FROM agg a JOIN nation n ON a.s_nationkey = n.n_nationkey
        |ORDER BY nation_name""".stripMargin,

    // Gini from the closed positional form; i·v sums in HUGEINT with
    // VARCHAR-routed double casts; row_number ≡ the distributed rank.
    "q_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v, o_custkey)
        |            AS BIGINT) AS i
        |  FROM spend),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |         CAST(sum(v) AS BIGINT) AS total_cents,
        |         sum(CAST(i AS HUGEINT) * v) AS siv,
        |         sum(CAST(v AS HUGEINT)) AS sv
        |  FROM r)
        |SELECT n_customers, total_cents,
        |       CAST(CAST(2 * siv - (n_customers + 1) * sv AS VARCHAR) AS DOUBLE)
        |         / CAST(CAST(CAST(n_customers AS HUGEINT) * sv AS VARCHAR)
        |                AS DOUBLE) AS gini
        |FROM s""".stripMargin,

    // Box-plot stats: exact interpolated quartiles, Tukey fences in
    // identical double arithmetic, outlier tally via the broadcast-back.
    "q_boxplot" ->
      """WITH c AS (SELECT c_mktsegment AS segment, c_acctbal FROM customer),
        |st AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |         quantile_cont(c_acctbal, 0.25) AS p25,
        |         quantile_cont(c_acctbal, 0.75) AS p75
        |  FROM c GROUP BY 1),
        |f AS (SELECT segment, n, p25, p75, p75 - p25 AS iqr,
        |             p25 - 1.5 * (p75 - p25) AS lo_fence,
        |             p75 + 1.5 * (p75 - p25) AS hi_fence
        |      FROM st)
        |SELECT f.segment, f.n, f.p25, f.p75, f.iqr, f.lo_fence, f.hi_fence,
        |       CAST(sum(CASE WHEN c.c_acctbal < f.lo_fence
        |                       OR c.c_acctbal > f.hi_fence
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM c JOIN f USING (segment)
        |GROUP BY f.segment, f.n, f.p25, f.p75, f.iqr, f.lo_fence, f.hi_fence
        |ORDER BY f.segment""".stripMargin,

    // Benford first digits from the integer's decimal string (double
    // formatting is not engine-portable; integer formatting is).
    "q_benford" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
        |                1, 1) AS digit
        |  FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt
        |      FROM d WHERE digit <> '0' GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM g)
        |SELECT digit, cnt, CAST(cnt AS DOUBLE) / t.total AS share
        |FROM g, t
        |ORDER BY digit""".stripMargin,

    // Pareto curve: ⌈p·n/100⌉ cutoffs in exact integers over the ranked
    // spend table; conditional sums per cutoff.
    "q_pareto" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v DESC, o_custkey)
        |            AS BIGINT) AS i
        |  FROM spend),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(v) AS BIGINT) AS total FROM r),
        |cuts AS (SELECT CAST(unnest([1, 5, 20]) AS BIGINT) AS pct),
        |sel AS (
        |  SELECT pct, (pct * t.n + 99) // 100 AS k, t.total AS total,
        |         CAST(sum(CASE WHEN i <= (pct * t.n + 99) // 100
        |                  THEN v ELSE 0 END) AS BIGINT) AS top_cents
        |  FROM r, cuts, t GROUP BY 1, 2, 3)
        |SELECT pct, CAST(k AS BIGINT) AS top_k, top_cents,
        |       CAST(top_cents AS DOUBLE) / total AS share
        |FROM sel
        |ORDER BY pct""".stripMargin,

    // Weekly growth accounting: lag equi-join for previous-week
    // presence, shifted anti-join for churn, full outer stitch.
    "q_growth_accounting" ->
      """WITH uw AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS w
        |            FROM events),
        |f AS (SELECT user_id, min(w) AS w0 FROM uw GROUP BY 1),
        |sh AS (SELECT user_id, w + 1 AS w FROM uw),
        |cls AS (
        |  SELECT uw.w,
        |         CASE WHEN uw.w = f.w0 THEN 1 ELSE 0 END AS is_new,
        |         CASE WHEN sh.user_id IS NOT NULL AND uw.w <> f.w0
        |              THEN 1 ELSE 0 END AS is_retained,
        |         CASE WHEN sh.user_id IS NULL AND uw.w <> f.w0
        |              THEN 1 ELSE 0 END AS is_resurrected
        |  FROM uw JOIN f USING (user_id)
        |       LEFT JOIN sh ON uw.user_id = sh.user_id AND uw.w = sh.w),
        |c1 AS (SELECT w, CAST(sum(is_new) AS BIGINT) AS n_new,
        |              CAST(sum(is_retained) AS BIGINT) AS n_retained,
        |              CAST(sum(is_resurrected) AS BIGINT) AS n_resurrected
        |       FROM cls GROUP BY w),
        |ch AS (SELECT sh.w, CAST(count(*) AS BIGINT) AS n_churned
        |       FROM sh LEFT JOIN uw ON sh.user_id = uw.user_id AND sh.w = uw.w
        |       WHERE uw.user_id IS NULL GROUP BY sh.w),
        |b AS (SELECT max(w) AS wmax FROM uw)
        |SELECT COALESCE(c1.w, ch.w) AS w,
        |       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
        |       CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
        |       CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
        |       CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned
        |FROM c1 FULL OUTER JOIN ch ON c1.w = ch.w CROSS JOIN b
        |-- clipped to the corpus horizon (no phantom churn week)
        |WHERE COALESCE(c1.w, ch.w) <= b.wmax
        |ORDER BY w""".stripMargin,

    // Trailing-window stickiness: constant-factor window fan-out +
    // exact distinct per anchor, clipped to the corpus day range.
    "q_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        |            FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
        |w7 AS (
        |  SELECT anchor, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM (SELECT user_id, unnest(generate_series(day, day + 6)) AS anchor
        |        FROM ud)
        |  GROUP BY 1),
        |w28 AS (
        |  SELECT anchor, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM (SELECT user_id, unnest(generate_series(day, day + 27)) AS anchor
        |        FROM ud)
        |  GROUP BY 1)
        |-- w28 is the spine; a 7-day-silent anchor reports wau=0, not a hole
        |SELECT w28.anchor AS day, COALESCE(wau, 0) AS wau, mau,
        |       CAST(COALESCE(wau, 0) AS DOUBLE) / mau AS stickiness
        |FROM w28 LEFT JOIN w7 USING (anchor) CROSS JOIN b
        |WHERE anchor >= b.d0 AND anchor <= b.d1
        |ORDER BY day""".stripMargin,

    // Class balance of the embeddings labels.
    "q_label_balance" ->
      """WITH c AS (SELECT CAST(label AS BIGINT) AS label,
        |                  CAST(count(*) AS BIGINT) AS cnt
        |           FROM embeddings GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, max(cnt) AS mx FROM c)
        |SELECT label, cnt, CAST(cnt AS DOUBLE) / t.total AS share,
        |       cnt = t.mx AS is_majority
        |FROM c, t
        |ORDER BY label""".stripMargin,

    // Two-sample KS distance in exact integers: cumulative counts per
    // distinct cents value, D·nA·nB = max |ca·nB − cb·nA|, one final
    // division. Argmax ties resolve to the smallest threshold.
    "q_ks" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS ib
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |per AS (SELECT v, CAST(sum(ia) AS BIGINT) AS a,
        |               CAST(sum(ib) AS BIGINT) AS b
        |        FROM o GROUP BY v),
        |cum AS (SELECT v, CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
        |               CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
        |        FROM per),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
        |               CAST(sum(b) AS BIGINT) AS n_b FROM per),
        |d AS (SELECT v, abs(ca * n_b - cb * n_a) AS dn
        |      FROM cum CROSS JOIN tot),
        |best AS (SELECT dn, v FROM d ORDER BY dn DESC, v LIMIT 1)
        |SELECT n_a, n_b, CAST(dn AS BIGINT) AS d_num,
        |       v AS at_cents,
        |       CAST(CAST(dn AS BIGINT) AS DOUBLE) /
        |         CAST(n_a * n_b AS DOUBLE) AS ks
        |FROM best CROSS JOIN tot""".stripMargin,

    // Chi-square contingency cells: integer cell/row/col totals, per-cell
    // e = rt·ct/N and (o−e)²/e as a fixed tree of single IEEE ops.
    "q_chi2" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |         CAST(count(*) AS BIGINT) AS obs
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT segment, CAST(sum(obs) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT priority, CAST(sum(obs) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
        |e AS (
        |  SELECT segment, priority, obs,
        |         CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expect
        |  FROM cells JOIN rt USING (segment) JOIN ct USING (priority)
        |       CROSS JOIN n)
        |SELECT segment, priority, obs, expect,
        |       (CAST(obs AS DOUBLE) - expect) * (CAST(obs AS DOUBLE) - expect)
        |         / expect AS chi2_term
        |FROM e
        |ORDER BY segment, priority""".stripMargin,

    // Exact discrete percentile bands: cumulative (segment, cents) counts,
    // band_p = min v with cum ≥ ⌈p·n/100⌉ — all integer arithmetic.
    "q_percentile_bands" ->
      """WITH per AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT segment, v,
        |               CAST(sum(cnt) OVER (PARTITION BY segment ORDER BY v)
        |                    AS BIGINT) AS cum
        |        FROM per),
        |tot AS (SELECT segment, CAST(sum(cnt) AS BIGINT) AS n
        |        FROM per GROUP BY 1)
        |SELECT segment, n,
        |       min(CASE WHEN cum >= (25 * n + 99) // 100 THEN v END) AS p25_cents,
        |       min(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END) AS p50_cents,
        |       min(CASE WHEN cum >= (75 * n + 99) // 100 THEN v END) AS p75_cents,
        |       min(CASE WHEN cum >= (90 * n + 99) // 100 THEN v END) AS p90_cents
        |FROM cum JOIN tot USING (segment)
        |GROUP BY segment, n
        |ORDER BY segment""".stripMargin,

    // Adoption curve: each customer collapses to a first-order day, then
    // a cumulative sum over the calendar-bounded daily frame.
    "q_cum_distinct" ->
      """WITH f AS (SELECT o_custkey,
        |                  min(epoch_ms(o_orderdate) // 86400000) AS day
        |           FROM orders GROUP BY 1),
        |p AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new
        |      FROM f GROUP BY 1)
        |SELECT day, n_new,
        |       CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_customers
        |FROM p ORDER BY day""".stripMargin,

    // Bollinger bands: exact rolling Σx/Σx² over full 7-observation
    // windows; variance via 7·Σx²−(Σx)² in HUGEINT, VARCHAR-routed to
    // double (int128→double casts mis-round above 2^53), then the fixed
    // mean/sd/band op tree. sqrt is IEEE-correctly-rounded → portable.
    "q_bollinger" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT prio, day, v,
        |         count(*) OVER w AS n_w,
        |         CAST(sum(v) OVER w AS BIGINT) AS s,
        |         sum(CAST(v AS HUGEINT) * v) OVER w AS q
        |  FROM daily
        |  WINDOW w AS (PARTITION BY prio ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT prio, day, v AS day_cents,
        |         CAST(s AS DOUBLE) / 7.0 AS mean_cents,
        |         sqrt(CAST(CAST(7 * q - CAST(s AS HUGEINT) * s AS VARCHAR)
        |                   AS DOUBLE) / 42.0) AS sd_cents
        |  FROM r WHERE n_w = 7)
        |SELECT prio, day, day_cents, mean_cents, sd_cents,
        |       mean_cents + 2.0 * sd_cents AS upper,
        |       mean_cents - 2.0 * sd_cents AS lower
        |FROM b
        |ORDER BY prio, day""".stripMargin,

    // Truncated-horizon EWMA: exact integer weighted sum over the last
    // 10 observations (weight 2^(9−k)), one final division.
    "q_ewma" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |l AS (
        |  SELECT prio, day, v,
        |         lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
        |         lag(v, 3) OVER w AS l3, lag(v, 4) OVER w AS l4,
        |         lag(v, 5) OVER w AS l5, lag(v, 6) OVER w AS l6,
        |         lag(v, 7) OVER w AS l7, lag(v, 8) OVER w AS l8,
        |         lag(v, 9) OVER w AS l9
        |  FROM daily
        |  WINDOW w AS (PARTITION BY prio ORDER BY day))
        |SELECT prio, day, v AS day_cents,
        |       CAST(v * 512 + COALESCE(l1, 0) * 256 + COALESCE(l2, 0) * 128
        |        + COALESCE(l3, 0) * 64 + COALESCE(l4, 0) * 32
        |        + COALESCE(l5, 0) * 16 + COALESCE(l6, 0) * 8
        |        + COALESCE(l7, 0) * 4 + COALESCE(l8, 0) * 2
        |        + COALESCE(l9, 0) AS BIGINT) AS ewma_num,
        |       CAST(512 + CASE WHEN l1 IS NULL THEN 0 ELSE 256 END
        |        + CASE WHEN l2 IS NULL THEN 0 ELSE 128 END
        |        + CASE WHEN l3 IS NULL THEN 0 ELSE 64 END
        |        + CASE WHEN l4 IS NULL THEN 0 ELSE 32 END
        |        + CASE WHEN l5 IS NULL THEN 0 ELSE 16 END
        |        + CASE WHEN l6 IS NULL THEN 0 ELSE 8 END
        |        + CASE WHEN l7 IS NULL THEN 0 ELSE 4 END
        |        + CASE WHEN l8 IS NULL THEN 0 ELSE 2 END
        |        + CASE WHEN l9 IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |         AS ewma_den,
        |       CAST(v * 512 + COALESCE(l1, 0) * 256 + COALESCE(l2, 0) * 128
        |        + COALESCE(l3, 0) * 64 + COALESCE(l4, 0) * 32
        |        + COALESCE(l5, 0) * 16 + COALESCE(l6, 0) * 8
        |        + COALESCE(l7, 0) * 4 + COALESCE(l8, 0) * 2
        |        + COALESCE(l9, 0) AS DOUBLE) /
        |       CAST(512 + CASE WHEN l1 IS NULL THEN 0 ELSE 256 END
        |        + CASE WHEN l2 IS NULL THEN 0 ELSE 128 END
        |        + CASE WHEN l3 IS NULL THEN 0 ELSE 64 END
        |        + CASE WHEN l4 IS NULL THEN 0 ELSE 32 END
        |        + CASE WHEN l5 IS NULL THEN 0 ELSE 16 END
        |        + CASE WHEN l6 IS NULL THEN 0 ELSE 8 END
        |        + CASE WHEN l7 IS NULL THEN 0 ELSE 4 END
        |        + CASE WHEN l8 IS NULL THEN 0 ELSE 2 END
        |        + CASE WHEN l9 IS NULL THEN 0 ELSE 1 END AS DOUBLE)
        |         AS ewma_cents
        |FROM l
        |ORDER BY prio, day""".stripMargin,

    // Gap-based debounce audit: lag within (user, type), kept iff the
    // gap to the previous same-type event is >= 5 minutes.
    "q_debounce" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
        |  FROM events),
        |l AS (
        |  SELECT event_type, ts_ms,
        |         lag(ts_ms, 1) OVER (PARTITION BY user_id, event_type
        |                             ORDER BY ts_ms, event_id) AS prev_ts
        |  FROM e),
        |k AS (SELECT event_type,
        |             CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts >= 300000
        |                  THEN 1 ELSE 0 END AS kept
        |      FROM l)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
        |       CAST(sum(kept) AS BIGINT) AS n_kept,
        |       CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
        |       CAST(count(*) - sum(kept) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         AS drop_rate
        |FROM k GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Nearest view to each purchase: running max of view-times behind and
    // running min ahead over the per-user ordered stream, closest wins
    // (ties to the earlier view).
    "q_nearest_event" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |w AS (
        |  SELECT *,
        |         max(CASE WHEN event_type = 'view' THEN ts_ms END)
        |           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_view,
        |         min(CASE WHEN event_type = 'view' THEN ts_ms END)
        |           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |           AS next_view
        |  FROM e),
        |p AS (
        |  SELECT event_id, user_id, ts_ms,
        |         CASE WHEN next_view IS NULL THEN prev_view
        |              WHEN prev_view IS NULL THEN next_view
        |              WHEN ts_ms - prev_view <= next_view - ts_ms
        |                THEN prev_view
        |              ELSE next_view END AS view_ts
        |  FROM w
        |  WHERE event_type = 'purchase'
        |    AND (prev_view IS NOT NULL OR next_view IS NOT NULL))
        |SELECT event_id, user_id, ts_ms, view_ts,
        |       view_ts - ts_ms AS delta_ms
        |FROM p ORDER BY event_id""".stripMargin,

    // MinHash calibration: the q_minhash_pairs candidates re-scored with
    // their exact shingle Jaccard; err = est − jac.
    "q_minhash_acc" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in generate_series(1, len(toks)-2)])) AS sh
        |      FROM t),
        |sig AS (SELECT doc_id,
        |               min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
        |               min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
        |               min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
        |               min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
        |        FROM s GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, md5(m0 || m1) AS bucket FROM sig
        |          UNION ALL SELECT doc_id, 1, md5(m2 || m3) FROM sig
        |          UNION ALL SELECT doc_id, 2, md5(m4 || m5) FROM sig
        |          UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM sig),
        |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |         FROM bands x JOIN bands y
        |           ON x.bucket = y.bucket AND x.band = y.band AND x.doc_id < y.doc_id),
        |est AS (
        |  SELECT d1, d2,
        |         CAST((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END
        |             + CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END
        |             + CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END
        |             + CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END
        |             + CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END
        |             + CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END
        |             + CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END
        |             + CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END) AS DOUBLE) / 8
        |           AS est_sim
        |  FROM cand JOIN sig sa ON d1 = sa.doc_id JOIN sig sb ON d2 = sb.doc_id),
        |pairs AS (SELECT * FROM est WHERE est_sim >= 0.5),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |          FROM s GROUP BY doc_id),
        |i AS (SELECT p.d1, p.d2, CAST(count(*) AS BIGINT) AS inter
        |      FROM pairs p JOIN s a ON p.d1 = a.doc_id
        |                   JOIN s b ON p.d2 = b.doc_id AND a.sh = b.sh
        |      GROUP BY p.d1, p.d2)
        |SELECT p.d1, p.d2, p.est_sim,
        |       COALESCE(i.inter, 0) AS inter,
        |       na.n + nb.n - COALESCE(i.inter, 0) AS uni,
        |       CAST(COALESCE(i.inter, 0) AS DOUBLE) /
        |         CAST(na.n + nb.n - COALESCE(i.inter, 0) AS DOUBLE) AS jac,
        |       p.est_sim - CAST(COALESCE(i.inter, 0) AS DOUBLE) /
        |         CAST(na.n + nb.n - COALESCE(i.inter, 0) AS DOUBLE) AS err
        |FROM pairs p
        |LEFT JOIN i ON p.d1 = i.d1 AND p.d2 = i.d2
        |JOIN sizes na ON p.d1 = na.doc_id
        |JOIN sizes nb ON p.d2 = nb.doc_id
        |ORDER BY p.d1, p.d2""".stripMargin,

    // Per-node local clustering: tri/(d(d−1)/2) for deg ≥ 2 nodes of the
    // co-order part graph; triangle counts as in q_triangles.
    "q_local_clustering" ->
      """WITH e AS (
        |  SELECT DISTINCT i.l_partkey AS x, j.l_partkey AS y
        |  FROM lineitem i JOIN lineitem j
        |    ON i.l_orderkey = j.l_orderkey AND i.l_partkey < j.l_partkey),
        |tri AS (
        |  SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |  FROM e e1 JOIN e e2 ON e2.x = e1.y
        |       JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |tn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
        |  FROM (SELECT a AS node FROM tri
        |        UNION ALL SELECT b FROM tri
        |        UNION ALL SELECT c FROM tri)
        |  GROUP BY node),
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT x AS v FROM e UNION ALL SELECT y FROM e)
        |  GROUP BY v)
        |SELECT v AS node, deg, deg * (deg - 1) // 2 AS wedges_v,
        |       COALESCE(tri_cnt, 0) AS tri_cnt,
        |       CAST(COALESCE(tri_cnt, 0) AS DOUBLE) /
        |         CAST(deg * (deg - 1) // 2 AS DOUBLE) AS lcc
        |FROM deg LEFT JOIN tn ON deg.v = tn.node
        |WHERE deg >= 2
        |ORDER BY node""".stripMargin,

    // Integer CUSUM changepoint: argmax |n·cum_i − i·total| over the
    // daily revenue series, exact in HUGEINT; ties to the earliest day.
    "q_cusum" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT day,
        |         CAST(sum(v) OVER (ORDER BY day) AS BIGINT) AS cum_v,
        |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
        |  FROM daily),
        |t AS (SELECT CAST(sum(v) AS BIGINT) AS total_cents,
        |             CAST(count(*) AS BIGINT) AS n_days FROM daily),
        |s AS (SELECT day,
        |             abs(CAST(cum_v AS HUGEINT) * n_days -
        |                 CAST(i AS HUGEINT) * total_cents) AS s
        |      FROM c CROSS JOIN t),
        |best AS (SELECT day, s FROM s ORDER BY s DESC, day LIMIT 1)
        |SELECT n_days, total_cents, day AS at_day,
        |       CAST(s AS BIGINT) AS s_num,
        |       CAST(CAST(s AS BIGINT) AS DOUBLE) /
        |         CAST(n_days * total_cents AS DOUBLE) AS rel
        |FROM best CROSS JOIN t""".stripMargin,

    // Referential-integrity audit: per FK edge, child count + orphan
    // count from one left join each.
    "q_fk_audit" ->
      """WITH edges AS (
        |  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk,
        |         CAST(count(*) AS BIGINT) AS n_child,
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part.p_partkey',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer.c_custkey',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'customer.c_nationkey->nation.n_nationkey',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  UNION ALL
        |  SELECT 'supplier.s_nationkey->nation.n_nationkey',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  UNION ALL
        |  SELECT 'nation.n_regionkey->region.r_regionkey',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey)
        |SELECT fk, n_child, n_orphans,
        |       CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE)
        |         AS orphan_rate
        |FROM edges ORDER BY fk""".stripMargin,

    // Wald–Wolfowitz runs test over daily revenue direction: exact
    // up/down/flat and run counts; E[R]/Var[R]/z as a fixed IEEE tree.
    "q_runs" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, v,
        |             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
        |      FROM daily),
        |s AS (SELECT b.i,
        |             CASE WHEN b.v > a.v THEN 1
        |                  WHEN b.v < a.v THEN -1 ELSE 0 END AS sign
        |      FROM r a JOIN r b ON b.i = a.i + 1),
        |nz AS (SELECT sign,
        |              CAST(row_number() OVER (ORDER BY i) AS BIGINT) AS j
        |       FROM s WHERE sign <> 0),
        |ch AS (SELECT CAST(sum(CASE WHEN a.sign <> b.sign THEN 1 ELSE 0 END)
        |                   AS BIGINT) AS n_changes
        |       FROM nz a JOIN nz b ON b.j = a.j + 1),
        |c AS (SELECT CAST(sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS n_up,
        |             CAST(sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS n_down,
        |             CAST(sum(CASE WHEN sign = 0 THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS n_flat
        |      FROM s),
        |e AS (SELECT n_up, n_down, n_flat, n_changes + 1 AS n_runs,
        |             1.0 + CAST(2 * n_up * n_down AS DOUBLE) /
        |                   CAST(n_up + n_down AS DOUBLE) AS expected_runs
        |      FROM c CROSS JOIN ch)
        |SELECT n_up, n_down, n_flat, n_runs, expected_runs,
        |       (CAST(n_runs AS DOUBLE) - expected_runs) /
        |       sqrt(CAST(2 * n_up * n_down *
        |                 (2 * n_up * n_down - n_up - n_down) AS DOUBLE) /
        |            CAST((n_up + n_down) * (n_up + n_down) *
        |                 (n_up + n_down - 1) AS DOUBLE)) AS z
        |FROM e""".stripMargin,

    // Out-of-order arrival audit: event-time vs the arrival-order
    // high-water mark per (user, type); max lateness sizes a watermark.
    "q_ooo_rate" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |w AS (
        |  SELECT event_type, ts_ms,
        |         max(ts_ms) OVER (PARTITION BY user_id, event_type
        |                          ORDER BY event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND 1 PRECEDING) AS hwm
        |  FROM e),
        |f AS (
        |  SELECT event_type,
        |         CASE WHEN hwm IS NOT NULL AND ts_ms < hwm
        |              THEN 1 ELSE 0 END AS late,
        |         CASE WHEN hwm IS NOT NULL AND ts_ms < hwm
        |              THEN hwm - ts_ms END AS lateness
        |  FROM w)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(late) AS BIGINT) AS n_late,
        |       COALESCE(max(lateness), 0) AS max_lateness_ms,
        |       CAST(sum(late) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         AS late_rate
        |FROM f GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Language-ID confusion matrix: the q_lang_id ladder joined back to
    // the labeled lang; per-cell share of its true-label row.
    "q_langid_eval" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS toks,
        |         regexp_matches(text, '[\p{Hiragana}\p{Katakana}]') AS kana,
        |         regexp_matches(text, '\p{Han}') AS han
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, kana, han,
        |         len(list_intersect(toks, ['the','and','of','is','with','for'])) AS he,
        |         len(list_intersect(toks, ['der','die','das','und','nicht','mit'])) AS hd,
        |         len(list_intersect(toks, ['le','la','les','et','est','dans'])) AS hf,
        |         len(list_intersect(toks, ['el','los','las','es','y','en'])) AS hs
        |  FROM t),
        |p AS (
        |  SELECT doc_id,
        |         CASE WHEN kana THEN 'ja'
        |              WHEN han THEN 'zh'
        |              WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |              WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |              WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
        |              WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |              ELSE 'de' END AS pred
        |  FROM v),
        |cells AS (
        |  SELECT d.lang, p.pred, CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
        |       FROM cells GROUP BY 1)
        |SELECT lang, pred, n, lang = pred AS is_correct,
        |       CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE) AS recall_share
        |FROM cells JOIN rt USING (lang)
        |ORDER BY lang, pred""".stripMargin,

    // Boilerplate prefixes: repeated 5-token openings, two-level
    // aggregate for the distinct-source count.
    "q_boilerplate" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks, source, n_chars
        |           FROM documents),
        |f AS (SELECT array_to_string(toks[1:5], ' ') AS prefix, source, n_chars
        |      FROM t WHERE len(toks) >= 5),
        |l1 AS (SELECT prefix, source, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(n_chars) AS BIGINT) AS chars
        |       FROM f GROUP BY 1, 2),
        |p AS (SELECT prefix, CAST(sum(n) AS BIGINT) AS n_docs,
        |             CAST(count(*) AS BIGINT) AS n_sources,
        |             CAST(sum(chars) AS BIGINT) AS total_chars
        |      FROM l1 GROUP BY 1)
        |SELECT prefix, n_docs, n_sources, total_chars
        |FROM p WHERE n_docs >= 2
        |ORDER BY n_docs DESC, prefix LIMIT 20""".stripMargin,

    // Keep-first dedup survivorship: per source, docs/chars deleted
    // under the min-doc_id keeper policy.
    "q_dedup_savings" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents),
        |k AS (SELECT fp, min(doc_id) AS keep_id FROM d GROUP BY 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_removed,
        |       CAST(sum(CASE WHEN doc_id <> keep_id THEN n_chars ELSE 0 END)
        |            AS BIGINT) AS chars_saved,
        |       CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
        |            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS removal_rate
        |FROM d JOIN k USING (fp)
        |GROUP BY source ORDER BY source""".stripMargin,

    // Hamilton largest-remainder allocation: base = floor(k·n/N), the
    // k−Σbase leftovers to the biggest remainders (counting-join rank).
    "q_allocation" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
        |wb AS (SELECT source, n_docs,
        |              (10000 * n_docs) // n_total AS base,
        |              10000 * n_docs - ((10000 * n_docs) // n_total) * n_total
        |                AS rem
        |       FROM c CROSS JOIN t),
        |r AS (SELECT a.source, a.n_docs, a.base, a.rem,
        |             CAST(count(b.source) AS BIGINT) AS n_better
        |      FROM wb a LEFT JOIN wb b
        |        ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
        |      GROUP BY a.source, a.n_docs, a.base, a.rem),
        |l AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS leftover FROM wb)
        |SELECT source, n_docs, CAST(base AS BIGINT) AS base,
        |       CAST(rem AS BIGINT) AS rem,
        |       n_better < leftover AS extra,
        |       CAST(base + CASE WHEN n_better < leftover THEN 1 ELSE 0 END
        |            AS BIGINT) AS alloc
        |FROM r CROSS JOIN l
        |ORDER BY source""".stripMargin,

    // Split-leakage audit: fingerprints present in >1 hash split.
    "q_split_leakage" ->
      """WITH d AS (
        |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |                        AS BIGINT) % 100 < 80 THEN 'train'
        |              WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |                        AS BIGINT) % 100 < 90 THEN 'valid'
        |              ELSE 'test' END AS split
        |  FROM documents),
        |cells AS (SELECT fp, split, CAST(count(*) AS BIGINT) AS n
        |          FROM d GROUP BY 1, 2),
        |fs AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_splits
        |       FROM cells GROUP BY 1)
        |SELECT split, CAST(sum(n) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN n_splits > 1 THEN n ELSE 0 END) AS BIGINT)
        |         AS n_leaked_docs,
        |       CAST(sum(CASE WHEN n_splits > 1 THEN n ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(n) AS DOUBLE) AS leak_rate
        |FROM cells JOIN fs USING (fp)
        |GROUP BY split ORDER BY split""".stripMargin,

    // Decile drift: reference-half deciles code both halves; per-bucket
    // shares, shift, and χ² term (the log-free PSI stand-in).
    "q_psi_drift" ->
      """WITH o AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders),
        |bd AS (SELECT (min(day) + max(day)) // 2 AS mid FROM o),
        |tg AS (SELECT v, day <= mid AS is_ref FROM o CROSS JOIN bd),
        |rp AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt
        |       FROM tg WHERE is_ref GROUP BY v),
        |rc AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
        |       FROM rp),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM rp),
        |th AS (SELECT
        |         min(CASE WHEN cum >= (1 * n + 9) // 10 THEN v END) AS t1,
        |         min(CASE WHEN cum >= (2 * n + 9) // 10 THEN v END) AS t2,
        |         min(CASE WHEN cum >= (3 * n + 9) // 10 THEN v END) AS t3,
        |         min(CASE WHEN cum >= (4 * n + 9) // 10 THEN v END) AS t4,
        |         min(CASE WHEN cum >= (5 * n + 9) // 10 THEN v END) AS t5,
        |         min(CASE WHEN cum >= (6 * n + 9) // 10 THEN v END) AS t6,
        |         min(CASE WHEN cum >= (7 * n + 9) // 10 THEN v END) AS t7,
        |         min(CASE WHEN cum >= (8 * n + 9) // 10 THEN v END) AS t8,
        |         min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS t9
        |       FROM rc CROSS JOIN nn),
        |cd AS (SELECT CAST(1
        |         + (CASE WHEN v > t1 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t2 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t3 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t4 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t5 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t6 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t7 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t8 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v > t9 THEN 1 ELSE 0 END) AS BIGINT) AS bucket,
        |              is_ref
        |       FROM tg CROSS JOIN th),
        |cn AS (SELECT bucket,
        |              CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
        |                AS n_ref,
        |              CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
        |                AS n_cur
        |       FROM cd GROUP BY bucket),
        |tt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
        |              CAST(sum(n_cur) AS BIGINT) AS tot_cur FROM cn),
        |sp AS (SELECT unnest(generate_series(1, 10)) AS bucket),
        |j AS (SELECT sp.bucket, COALESCE(n_ref, 0) AS n_ref,
        |             COALESCE(n_cur, 0) AS n_cur
        |      FROM sp LEFT JOIN cn USING (bucket)),
        |e AS (SELECT bucket, n_ref, n_cur,
        |             CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE)
        |               AS ref_share,
        |             CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE)
        |               AS cur_share,
        |             CAST(tot_cur * n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE)
        |               AS expect
        |      FROM j CROSS JOIN tt)
        |SELECT bucket, n_ref, n_cur, ref_share, cur_share,
        |       cur_share - ref_share AS shift,
        |       (CAST(n_cur AS DOUBLE) - expect) *
        |       (CAST(n_cur AS DOUBLE) - expect) / expect AS chi2_term
        |FROM e ORDER BY bucket""".stripMargin,

    // Cohort LTV: purchases tagged with their user's first-seen week,
    // exact cents cells, per-cohort cumulative revenue, per-user LTV.
    "q_cohort_ltv" ->
      """WITH f AS (SELECT user_id, min(epoch_ms(ts) // 604800000) AS cw
        |           FROM events GROUP BY 1),
        |p AS (SELECT user_id, epoch_ms(ts) // 604800000 AS w, value
        |      FROM events WHERE event_type = 'purchase'),
        |cells AS (
        |  SELECT f.cw, p.w - f.cw AS age,
        |         CAST(count(*) AS BIGINT) AS n_purchases,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS rev_cents
        |  FROM p JOIN f USING (user_id) GROUP BY 1, 2),
        |cs AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_users
        |       FROM f GROUP BY 1),
        |c AS (SELECT cw, age, n_purchases, rev_cents,
        |             CAST(sum(rev_cents) OVER (PARTITION BY cw ORDER BY age)
        |                  AS BIGINT) AS cum_rev_cents
        |      FROM cells)
        |SELECT c.cw AS cohort_week, c.age AS age_week, cs.n_users,
        |       n_purchases, rev_cents, cum_rev_cents,
        |       CAST(cum_rev_cents AS DOUBLE) / CAST(cs.n_users AS DOUBLE)
        |         AS ltv_cents
        |FROM c JOIN cs USING (cw)
        |ORDER BY cohort_week, age_week""".stripMargin,

    // Dwell time: lead gap to the user's next event, exact-ms stats per
    // type; terminal events counted, not dropped.
    "q_dwell" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |l AS (
        |  SELECT event_type,
        |         lead(ts_ms, 1) OVER (PARTITION BY user_id
        |                              ORDER BY ts_ms, event_id) - ts_ms
        |           AS dwell_ms
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN dwell_ms IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_terminal,
        |       CAST(sum(dwell_ms) AS BIGINT) AS dwell_sum_ms,
        |       min(dwell_ms) AS dwell_min_ms,
        |       max(dwell_ms) AS dwell_max_ms,
        |       CAST(sum(dwell_ms) AS DOUBLE) /
        |         CAST(count(*) - sum(CASE WHEN dwell_ms IS NULL THEN 1 ELSE 0 END)
        |              AS DOUBLE) AS dwell_mean_ms
        |FROM l GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Deterministic negative sampling: md5("u|p|i") candidate parts,
    // observed positives anti-joined out.
    "q_neg_sample" ->
      """WITH pos AS (
        |  SELECT DISTINCT o_custkey AS "user", l_partkey AS part
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |mp AS (SELECT max(p_partkey) AS max_part FROM part),
        |c AS (
        |  SELECT "user", part, i,
        |         CAST('0x' || substr(md5("user" || '|' || part || '|' || i),
        |                             1, 15) AS BIGINT) % max_part + 1
        |           AS neg_part
        |  FROM pos CROSS JOIN mp
        |       CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS i))
        |SELECT c."user", c.part, CAST(c.i AS BIGINT) AS i, c.neg_part
        |FROM c LEFT JOIN pos p2
        |  ON c."user" = p2."user" AND c.neg_part = p2.part
        |WHERE p2."user" IS NULL
        |ORDER BY c."user", c.part, c.i""".stripMargin,

    // Hashing-trick collision profile: vocab → 64 buckets, bucket-load
    // histogram with the empty-bucket row from totals.
    "q_feature_hash" ->
      """WITH toks AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |t2 AS (SELECT tok FROM toks WHERE tok <> ''),
        |ld AS (
        |  SELECT CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64
        |           AS bucket,
        |         CAST(count(*) AS BIGINT) AS load
        |  FROM t2 GROUP BY 1),
        |h AS (SELECT load, CAST(count(*) AS BIGINT) AS n_buckets
        |      FROM ld GROUP BY 1),
        |z AS (SELECT CAST(0 AS BIGINT) AS load,
        |             64 - CAST(sum(n_buckets) AS BIGINT) AS n_buckets
        |      FROM h)
        |SELECT load, n_buckets FROM h
        |UNION ALL
        |SELECT load, n_buckets FROM z WHERE n_buckets > 0
        |ORDER BY load""".stripMargin,

    // Heaps vocabulary-growth curve: types collapse to their first
    // containing doc's rank; decile readings off the cumulative counts.
    "q_heaps" ->
      """WITH r AS (SELECT doc_id,
        |                  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT)
        |                    AS r
        |           FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |fr AS (
        |  SELECT tok, min(r.r) AS fr
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t
        |  JOIN r USING (doc_id)
        |  WHERE tok <> '' GROUP BY tok),
        |pr AS (SELECT fr, CAST(count(*) AS BIGINT) AS c FROM fr GROUP BY 1),
        |cm AS (SELECT fr, CAST(sum(c) OVER (ORDER BY fr) AS BIGINT) AS cum
        |       FROM pr),
        |d AS (SELECT unnest(generate_series(1, 10)) AS decile)
        |SELECT d.decile,
        |       (d.decile * n_docs + 9) // 10 AS docs_cutoff,
        |       COALESCE(max(CASE WHEN cum >= 0 AND fr <= (d.decile * n_docs + 9) // 10
        |                         THEN cum END), 0) AS vocab_size
        |FROM d CROSS JOIN n LEFT JOIN cm ON true
        |GROUP BY d.decile, n_docs
        |ORDER BY d.decile""".stripMargin,

    // k-anonymity audit over the (segment, nation) quasi-identifier.
    "q_k_anon" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(5 AS BIGINT) AS k,
        |       CAST(sum(cnt) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_small_groups,
        |       CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
        |         AS n_rows_at_risk,
        |       min(cnt) AS min_group,
        |       CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(cnt) AS DOUBLE) AS risk_share
        |FROM g""".stripMargin,

    // ABC classification: cumulative revenue share in exact integers
    // (100·cum vs 80/95·total), per-class rollup.
    "q_abc" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT v,
        |             CAST(sum(v) OVER (ORDER BY v DESC, l_partkey)
        |                  AS BIGINT) AS cum
        |      FROM rev),
        |t AS (SELECT CAST(sum(v) AS BIGINT) AS total FROM rev),
        |cls AS (
        |  SELECT v,
        |         CASE WHEN CAST(cum AS HUGEINT) * 100 <=
        |                   CAST(total AS HUGEINT) * 80 THEN 'A'
        |              WHEN CAST(cum AS HUGEINT) * 100 <=
        |                   CAST(total AS HUGEINT) * 95 THEN 'B'
        |              ELSE 'C' END AS cls, total
        |  FROM c CROSS JOIN t)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(v) AS BIGINT) AS rev_cents,
        |       CAST(sum(v) AS DOUBLE) / CAST(total AS DOUBLE) AS rev_share
        |FROM cls GROUP BY cls, total
        |ORDER BY cls""".stripMargin,

    // Wilson error-rate interval per hour of day: exact counts, the
    // score interval as a fixed +,−,×,÷,sqrt tree. The z literal is
    // CAST(1.96 AS DOUBLE): bare 1.96 parses as DECIMAL in DuckDB, so
    // 1.96·1.96 would fold to exact 3.8416 instead of the double
    // product 3.8415999999999997 Spark computes — a last-ulp trap.
    "q_error_bound" ->
      """WITH c AS (
        |  SELECT (epoch_ms(ts) // 3600000) % 24 AS hour_of_day,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS errors
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT hour_of_day, n, errors,
        |         CAST(errors AS DOUBLE) / CAST(n AS DOUBLE) AS share
        |  FROM c),
        |z AS (SELECT CAST(1.96 AS DOUBLE) AS zv),
        |w AS (
        |  SELECT *,
        |         share + (zv * zv) / (2.0 * CAST(n AS DOUBLE)) AS center,
        |         zv * sqrt((share * (1.0 - share) +
        |                    (zv * zv) / (4.0 * CAST(n AS DOUBLE)))
        |                   / CAST(n AS DOUBLE)) AS margin,
        |         1.0 + (zv * zv) / CAST(n AS DOUBLE) AS denom
        |  FROM s CROSS JOIN z)
        |SELECT hour_of_day, n, errors, share,
        |       (center - margin) / denom AS wilson_low,
        |       (center + margin) / denom AS wilson_high
        |FROM w ORDER BY hour_of_day""".stripMargin,

    // Quantity-weighted median price per return flag: 2·cumQty ≥ totQty
    // over the (flag, cents) aggregate — integer-exact selection.
    "q_weighted_median" ->
      """WITH per AS (
        |  SELECT l_returnflag AS rf,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT rf, v, qty,
        |               CAST(sum(qty) OVER (PARTITION BY rf ORDER BY v)
        |                    AS BIGINT) AS cum_qty
        |        FROM per),
        |tot AS (SELECT rf, CAST(sum(n) AS BIGINT) AS n_rows,
        |               CAST(sum(qty) AS BIGINT) AS total_qty
        |        FROM per GROUP BY 1)
        |SELECT rf, n_rows, total_qty,
        |       min(CASE WHEN cum_qty * 2 >= total_qty THEN v END)
        |         AS wmedian_cents
        |FROM cum JOIN tot USING (rf)
        |GROUP BY rf, n_rows, total_qty
        |ORDER BY rf""".stripMargin,

    // Simpson's-paradox detector: per-segment vs aggregate direction of
    // mean price between calendar halves, all cross-multiplied integer
    // comparisons.
    "q_simpsons_paradox" ->
      """WITH o AS (
        |  SELECT c_mktsegment AS segment,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |b AS (SELECT (min(day) + max(day)) // 2 AS mid FROM o),
        |t AS (SELECT segment, v, day > mid AS h2 FROM o CROSS JOIN b),
        |ps AS (
        |  SELECT segment,
        |         CAST(sum(CASE WHEN h2 THEN 0 ELSE v END) AS BIGINT) AS s1,
        |         CAST(sum(CASE WHEN h2 THEN 0 ELSE 1 END) AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN h2 THEN v ELSE 0 END) AS BIGINT) AS s2,
        |         CAST(sum(CASE WHEN h2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM t GROUP BY 1),
        |ov AS (
        |  SELECT CAST(sum(s2) AS HUGEINT) * CAST(sum(n1) AS HUGEINT) >
        |         CAST(sum(s1) AS HUGEINT) * CAST(sum(n2) AS HUGEINT)
        |           AS overall_up
        |  FROM ps)
        |SELECT segment, n1, n2,
        |       CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS avg1_cents,
        |       CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS avg2_cents,
        |       CAST(s2 AS HUGEINT) * n1 > CAST(s1 AS HUGEINT) * n2 AS seg_up,
        |       overall_up,
        |       (CAST(s2 AS HUGEINT) * n1 > CAST(s1 AS HUGEINT) * n2)
        |         <> overall_up AS disagrees
        |FROM ps CROSS JOIN ov
        |ORDER BY segment""".stripMargin,

    // Ship latency per priority: epoch-day subtraction, exact mean and
    // cumulative-count median over the (prio, days) aggregate.
    "q_ship_latency" ->
      """WITH per AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(l_shipdate) // 86400000 -
        |         epoch_ms(o_orderdate) // 86400000 AS days,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT prio, days, cnt,
        |               CAST(sum(cnt) OVER (PARTITION BY prio ORDER BY days)
        |                    AS BIGINT) AS cum
        |        FROM per),
        |tot AS (SELECT prio, CAST(sum(cnt) AS BIGINT) AS n,
        |               CAST(sum(days * cnt) AS BIGINT) AS day_sum,
        |               max(days) AS max_days
        |        FROM per GROUP BY 1)
        |SELECT prio, n,
        |       CAST(day_sum AS DOUBLE) / CAST(n AS DOUBLE) AS mean_days,
        |       min(CASE WHEN cum * 2 >= n THEN days END) AS median_days,
        |       max_days
        |FROM cum JOIN tot USING (prio)
        |GROUP BY prio, n, day_sum, max_days
        |ORDER BY prio""".stripMargin,

    // Backlog curve: +1 at placement, −1 at last-ship day, cumulative
    // delta = open orders at each changepoint.
    "q_backlog" ->
      """WITH ends AS (
        |  SELECT l_orderkey,
        |         max(epoch_ms(l_shipdate) // 86400000) AS end_day
        |  FROM lineitem GROUP BY 1),
        |spans AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS start_day, end_day
        |  FROM orders JOIN ends ON o_orderkey = l_orderkey),
        |deltas AS (
        |  SELECT day, CAST(sum(d) AS BIGINT) AS delta
        |  FROM (SELECT start_day AS day, 1 AS d FROM spans
        |        UNION ALL SELECT end_day, -1 FROM spans)
        |  GROUP BY day)
        |SELECT day, delta,
        |       CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) AS n_open
        |FROM deltas ORDER BY day""".stripMargin,

    // Cart abandonment: running min of upcoming purchase times per user
    // (one ordered pass), views converted iff a purchase follows in 24h.
    "q_abandonment" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |w AS (
        |  SELECT *,
        |         min(CASE WHEN event_type = 'purchase' THEN ts_ms END)
        |           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |           AS next_purchase
        |  FROM e),
        |v AS (
        |  SELECT ts_ms // 86400000 AS day,
        |         CASE WHEN next_purchase IS NOT NULL
        |                   AND next_purchase - ts_ms <= 86400000
        |              THEN 1 ELSE 0 END AS converted
        |  FROM w WHERE event_type = 'view')
        |SELECT day, CAST(count(*) AS BIGINT) AS n_views,
        |       CAST(sum(converted) AS BIGINT) AS n_converted,
        |       CAST(count(*) - sum(converted) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE) AS abandon_rate
        |FROM v GROUP BY day ORDER BY day""".stripMargin,

    // Peak session concurrency: 1h-gap sessions → ±1 delta encoding →
    // max cumulative (ties to the earliest instant).
    "q_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
        |l AS (
        |  SELECT user_id, event_id, ts_ms,
        |         lag(ts_ms, 1) OVER (PARTITION BY user_id
        |                             ORDER BY ts_ms, event_id) AS prev
        |  FROM e),
        |m AS (
        |  SELECT user_id, event_id, ts_ms,
        |         CASE WHEN prev IS NULL OR ts_ms - prev > 3600000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM l),
        |s AS (
        |  SELECT user_id, ts_ms,
        |         CAST(sum(brk) OVER (PARTITION BY user_id
        |                             ORDER BY ts_ms, event_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING
        |                                  AND CURRENT ROW) AS BIGINT)
        |           AS session_seq
        |  FROM m),
        |sess AS (
        |  SELECT user_id, session_seq, min(ts_ms) AS start_ms,
        |         max(ts_ms) AS end_ms
        |  FROM s GROUP BY 1, 2),
        |deltas AS (
        |  SELECT t, CAST(sum(d) AS BIGINT) AS delta
        |  FROM (SELECT start_ms AS t, 1 AS d FROM sess
        |        UNION ALL SELECT end_ms + 1, -1 FROM sess)
        |  GROUP BY t),
        |cum AS (
        |  SELECT t, CAST(sum(delta) OVER (ORDER BY t) AS BIGINT) AS c
        |  FROM deltas),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM sess),
        |best AS (SELECT c, t FROM cum ORDER BY c DESC, t LIMIT 1)
        |SELECT n_sessions, c AS peak_concurrent, t AS at_ms
        |FROM best CROSS JOIN ns""".stripMargin,

    // Duplicate-order audit: same (customer, day, exact cents) groups;
    // every 97th order planted as a re-keyed resubmission (q_exact_dups
    // precedent) so the firing path is what gets checked.
    "q_double_charge" ->
      """WITH all_o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT o_custkey,
        |       epoch_ms(o_orderdate) // 86400000 AS day,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         AS cents,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       min(o_orderkey) AS first_order
        |FROM all_o
        |GROUP BY 1, 2, 3
        |HAVING count(*) > 1
        |ORDER BY o_custkey, day, cents""".stripMargin,

    // Item-item recommendations: symmetrized co-purchase pairs, top-3
    // per source by (c_ab DESC, rec ASC) — exact-integer ordering.
    "q_recs" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM op),
        |pc AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY 1),
        |pairs AS (
        |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |d AS (
        |  SELECT p1 AS src, p2 AS rec, c_ab FROM pairs
        |  UNION ALL
        |  SELECT p2, p1, c_ab FROM pairs),
        |j AS (
        |  SELECT d.src, d.rec, d.c_ab, cs.c AS c_src, cr.c AS c_rec
        |  FROM d JOIN pc cs ON d.src = cs.p JOIN pc cr ON d.rec = cr.p),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY src
        |                 ORDER BY c_ab DESC, rec) AS BIGINT) AS rk
        |  FROM j)
        |SELECT src, rk, rec, c_ab,
        |       CAST(c_ab AS DOUBLE) / CAST(c_src AS DOUBLE) AS conf,
        |       CAST(c_ab * n_orders AS DOUBLE) /
        |         CAST(c_src * c_rec AS DOUBLE) AS lift
        |FROM r CROSS JOIN n
        |WHERE rk <= 3
        |ORDER BY src, rk""".stripMargin,

    // Brand margin: exact decimal gross/discount accumulation in
    // micro-dollars (scale-6 products ⇒ ×10⁶ is integer-valued; ×100
    // would round in DuckDB and truncate in Spark), one final ratio.
    "q_brand_margin" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS gross,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(18,4)) AS disc
        |  FROM lineitem)
        |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(gross) * 1000000 AS BIGINT) AS gross_micro,
        |       CAST(sum(disc) * 1000000 AS BIGINT) AS disc_micro,
        |       CAST(sum(gross) * 1000000 AS BIGINT) -
        |         CAST(sum(disc) * 1000000 AS BIGINT) AS net_micro,
        |       CAST(CAST(sum(disc) * 1000000 AS BIGINT) AS DOUBLE) /
        |         CAST(CAST(sum(gross) * 1000000 AS BIGINT) AS DOUBLE)
        |         AS discount_rate
        |FROM li JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY brand""".stripMargin,

    // Single-source risk: supplier-count histogram over distinct
    // (part, supplier) pairs.
    "q_single_source" ->
      """WITH pp AS (
        |  SELECT l_partkey, CAST(count(DISTINCT l_suppkey) AS BIGINT)
        |           AS n_suppliers
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM pp)
        |SELECT n_suppliers, CAST(count(*) AS BIGINT) AS n_parts_bucket,
        |       CAST(count(*) AS DOUBLE) / CAST(n_parts AS DOUBLE) AS share,
        |       n_suppliers = 1 AS at_risk
        |FROM pp CROSS JOIN t
        |GROUP BY n_suppliers, n_parts
        |ORDER BY n_suppliers""".stripMargin,

    // Int8-quantization error per dimension: fixed round/clip/abs tree
    // (round half-up == half-away for non-negative args), integer sum
    // witness Σ floor(err·10⁹), max as a selection.
    "q_quant_error" ->
      """WITH vals AS (
        |  SELECT CAST(dim - 1 AS BIGINT) AS dim, CAST(v AS DOUBLE) AS v
        |  FROM (SELECT unnest(embedding) AS v,
        |               generate_subscripts(embedding, 1) AS dim
        |        FROM embeddings)),
        |stats AS (SELECT dim, min(v) AS mn, max(v) AS mx
        |          FROM vals GROUP BY 1),
        |e AS (
        |  SELECT vals.dim,
        |         CASE WHEN mx = mn THEN 0.0
        |              ELSE abs(v - (mn + least(255.0, greatest(0.0,
        |                     round((v - mn) / ((mx - mn) / 255.0)))) *
        |                     ((mx - mn) / 255.0))) END AS err
        |  FROM vals JOIN stats USING (dim)),
        |agg AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n_vals,
        |         max(err) AS max_err,
        |         CAST(sum(CAST(floor(err * 1000000000.0) AS BIGINT))
        |              AS BIGINT) AS scaled_err_sum
        |  FROM e GROUP BY 1)
        |SELECT agg.dim, n_vals, (mx - mn) / 255.0 AS scale,
        |       max_err, scaled_err_sum
        |FROM agg JOIN stats ON agg.dim = stats.dim
        |ORDER BY agg.dim""".stripMargin,

    // Delta+varint profile: adjacent sorted-column deltas by bit length
    // (printf('%b') mirrors Spark bin()), varint cost = ceil(bits/7).
    "q_delta_bits" ->
      """WITH vals AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         o_orderkey AS k
        |  FROM orders),
        |r AS (SELECT v, CAST(row_number() OVER (ORDER BY v, k) AS BIGINT)
        |             AS i
        |      FROM vals),
        |d AS (SELECT b.v - a.v AS d FROM r a JOIN r b ON b.i = a.i + 1),
        |g AS (SELECT CAST(length(printf('%b', d)) AS BIGINT) AS bits,
        |             CAST(count(*) AS BIGINT) AS n_deltas,
        |             CAST(sum(d) AS BIGINT) AS delta_sum
        |      FROM d GROUP BY 1)
        |SELECT bits, n_deltas, delta_sum,
        |       n_deltas * ((bits + 6) // 7) AS varint_bytes,
        |       n_deltas * 8 AS raw_bytes
        |FROM g ORDER BY bits""".stripMargin,

    // Mann–Whitney U with tie correction: doubled midranks keep every
    // rank integer; z/Cliff's δ are the fixed tree over exact sums.
    "q_mannwhitney" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS ib
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |per AS (SELECT v, CAST(sum(ia) AS BIGINT) AS a,
        |               CAST(sum(ib) AS BIGINT) AS b,
        |               CAST(sum(ia) + sum(ib) AS BIGINT) AS t
        |        FROM o GROUP BY v),
        |cum AS (SELECT v, a, b, t,
        |               CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS cum_t
        |        FROM per),
        |agg AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS n_a,
        |         CAST(sum(b) AS BIGINT) AS n_b,
        |         sum(CAST(a AS HUGEINT) * (2 * CAST(cum_t AS HUGEINT) - t + 1))
        |           AS rank2_a,
        |         sum(CAST(t AS HUGEINT) * t * t - t) AS tie_sum
        |  FROM cum),
        |s AS (
        |  SELECT n_a, n_b,
        |         CAST(rank2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT)
        |           AS u2,
        |         n_a + n_b AS n, tie_sum
        |  FROM agg),
        |f AS (
        |  SELECT n_a, n_b, u2,
        |         CAST(u2 AS DOUBLE) / 2.0 AS u,
        |         CAST(u2 AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) - 1.0
        |           AS cliffs_delta,
        |         CAST(n_a * n_b AS DOUBLE) / 2.0 AS mean,
        |         (CAST(n + 1 AS DOUBLE) -
        |          CAST(tie_sum AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))
        |           AS tie_inner
        |  FROM s)
        |SELECT n_a, n_b, u2, u, cliffs_delta,
        |       (u - mean) /
        |       sqrt(CAST(n_a * n_b AS DOUBLE) * tie_inner / 12.0) AS z
        |FROM f""".stripMargin,

    // Per-dimension variance on the floor(v·10⁶) grid: exact integer
    // n·Σq²−(Σq)² numerator, one division; anisotropy broadcast back.
    "q_dim_variance" ->
      """WITH q AS (
        |  SELECT CAST(dim - 1 AS BIGINT) AS dim,
        |         CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM (SELECT unnest(embedding) AS v,
        |               generate_subscripts(embedding, 1) AS dim
        |        FROM embeddings)),
        |per AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS sq,
        |         sum(CAST(q AS HUGEINT) * q) AS sqq
        |  FROM q GROUP BY 1),
        |v AS (
        |  SELECT dim, n, sq,
        |         CAST(CAST(n * sqq - CAST(sq AS HUGEINT) * sq AS VARCHAR)
        |              AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS variance
        |  FROM per),
        |b AS (SELECT max(variance) AS mx, min(variance) AS mn FROM v)
        |SELECT dim, n, sq, variance,
        |       variance / mx AS rel_variance,
        |       mx / mn AS anisotropy
        |FROM v CROSS JOIN b
        |ORDER BY dim""".stripMargin,

    // Spearman over tie-broken unique ranks: integer Σd², one fixed
    // tree for ρ (n(n²−1) in HUGEINT).
    "q_spearman" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS spend
        |  FROM orders GROUP BY 1),
        |base AS (
        |  SELECT c_custkey,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS bal,
        |         COALESCE(spend, 0) AS spend
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |r AS (
        |  SELECT c_custkey,
        |         CAST(row_number() OVER (ORDER BY bal, c_custkey) AS BIGINT)
        |           AS r_bal,
        |         CAST(row_number() OVER (ORDER BY spend, c_custkey) AS BIGINT)
        |           AS r_spend
        |  FROM base),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST((r_bal - r_spend) * (r_bal - r_spend) AS HUGEINT))
        |           AS sum_d2
        |  FROM r)
        |SELECT n, CAST(sum_d2 AS BIGINT) AS sum_d2,
        |       1.0 - CAST(CAST(6 * sum_d2 AS VARCHAR) AS DOUBLE) /
        |             CAST(CAST(CAST(n AS HUGEINT) *
        |                       (CAST(n AS HUGEINT) * n - 1) AS VARCHAR)
        |                  AS DOUBLE) AS rho
        |FROM agg""".stripMargin,

    // Benford goodness-of-fit: the nine log10(1+1/d) constants as
    // DOUBLE-cast literals (identical strings to the Spark side; bare
    // decimals would parse as DECIMAL — the q_error_bound trap), then
    // the fixed (o−e)²/e tree over exact counts.
    "q_benford_gof" ->
      """WITH bf(digit, p) AS (VALUES
        |  ('1', CAST(0.3010299956639812 AS DOUBLE)),
        |  ('2', CAST(0.17609125905568124 AS DOUBLE)),
        |  ('3', CAST(0.12493873660829992 AS DOUBLE)),
        |  ('4', CAST(0.09691001300805642 AS DOUBLE)),
        |  ('5', CAST(0.07918124604762482 AS DOUBLE)),
        |  ('6', CAST(0.06694678963061322 AS DOUBLE)),
        |  ('7', CAST(0.05799194697768673 AS DOUBLE)),
        |  ('8', CAST(0.05115252244738129 AS DOUBLE)),
        |  ('9', CAST(0.04575749056067514 AS DOUBLE))),
        |d AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
        |                1, 1) AS digit,
        |         CAST(count(*) AS BIGINT) AS obs
        |  FROM orders
        |  WHERE substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
        |               1, 1) <> '0'
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM d),
        |e AS (
        |  SELECT bf.digit, COALESCE(d.obs, 0) AS obs, bf.p,
        |         CAST(total AS DOUBLE) * bf.p AS expect
        |  FROM bf LEFT JOIN d ON bf.digit = d.digit CROSS JOIN t)
        |SELECT digit, obs, p, expect,
        |       (CAST(obs AS DOUBLE) - expect) * (CAST(obs AS DOUBLE) - expect)
        |         / expect AS chi2_term
        |FROM e ORDER BY digit""".stripMargin,

    // Sample-ratio mismatch: user-grain arm counts, two fixed-order χ²
    // cell terms, literal 3.841 critical value.
    "q_srm" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |a AS (
        |  SELECT CAST('0x' || substr(md5('ab:' || user_id), 1, 15)
        |              AS BIGINT) % 2 AS arm
        |  FROM u),
        |c AS (
        |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_a,
        |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_b
        |  FROM a),
        |e AS (SELECT n_a, n_b,
        |             CAST(n_a + n_b AS DOUBLE) / 2.0 AS expect
        |      FROM c)
        |SELECT n_a, n_b, expect,
        |       (CAST(n_a AS DOUBLE) - expect) * (CAST(n_a AS DOUBLE) - expect)
        |         / expect +
        |       (CAST(n_b AS DOUBLE) - expect) * (CAST(n_b AS DOUBLE) - expect)
        |         / expect AS chi2,
        |       ((CAST(n_a AS DOUBLE) - expect) * (CAST(n_a AS DOUBLE) - expect)
        |         / expect +
        |        (CAST(n_b AS DOUBLE) - expect) * (CAST(n_b AS DOUBLE) - expect)
        |         / expect) > CAST(3.841 AS DOUBLE) AS srm_detected
        |FROM e""".stripMargin,

    // Two-proportion z-test on return rates: exact counts, fixed tree,
    // correctly-rounded sqrt.
    "q_prop_test" ->
      """WITH li AS (
        |  SELECT c_mktsegment AS seg, l_returnflag = 'R' AS ret
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN seg = 'BUILDING' AND ret THEN 1 ELSE 0 END)
        |         AS BIGINT) AS r_a,
        |    CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN seg = 'MACHINERY' AND ret THEN 1 ELSE 0 END)
        |         AS BIGINT) AS r_b
        |  FROM li),
        |p AS (
        |  SELECT *,
        |         CAST(r_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
        |         CAST(r_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
        |         CAST(r_a + r_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
        |           AS p_pool
        |  FROM a)
        |SELECT n_a, r_a, n_b, r_b, p_a, p_b, p_pool,
        |       (p_a - p_b) /
        |       sqrt(p_pool * (1.0 - p_pool) *
        |            (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |         AS z
        |FROM p""".stripMargin,

    // One-way ANOVA (weekday → order value): exact pivoted sums, the
    // fixed 7-term Σ S_d²/n_d tree, VARCHAR-routed HUGEINT casts.
    "q_anova" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         (epoch_ms(o_orderdate) // 86400000) % 7 AS dow
        |  FROM orders),
        |w AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(v AS HUGEINT)) AS s,
        |         sum(CAST(v AS HUGEINT) * v) AS q,
        |         sum(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS n0,
        |         sum(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS n1,
        |         sum(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS n2,
        |         sum(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS n3,
        |         sum(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS n4,
        |         sum(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS n5,
        |         sum(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS n6,
        |         sum(CASE WHEN dow = 0 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s0,
        |         sum(CASE WHEN dow = 1 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s1,
        |         sum(CASE WHEN dow = 2 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s2,
        |         sum(CASE WHEN dow = 3 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s3,
        |         sum(CASE WHEN dow = 4 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s4,
        |         sum(CASE WHEN dow = 5 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s5,
        |         sum(CASE WHEN dow = 6 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s6
        |  FROM o),
        |t AS (
        |  SELECT n,
        |         -- n*X products pinned by VARCHAR round-trips before -S^2
        |         -- (FMA-contraction barrier, the q_polyfit device)
        |         CAST(CAST(CAST(n AS DOUBLE) *
        |           (CAST(CAST(s0 * s0 AS VARCHAR) AS DOUBLE) / CAST(n0 AS DOUBLE)
        |          + CAST(CAST(s1 * s1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE)
        |          + CAST(CAST(s2 * s2 AS VARCHAR) AS DOUBLE) / CAST(n2 AS DOUBLE)
        |          + CAST(CAST(s3 * s3 AS VARCHAR) AS DOUBLE) / CAST(n3 AS DOUBLE)
        |          + CAST(CAST(s4 * s4 AS VARCHAR) AS DOUBLE) / CAST(n4 AS DOUBLE)
        |          + CAST(CAST(s5 * s5 AS VARCHAR) AS DOUBLE) / CAST(n5 AS DOUBLE)
        |          + CAST(CAST(s6 * s6 AS VARCHAR) AS DOUBLE) / CAST(n6 AS DOUBLE))
        |           AS VARCHAR) AS DOUBLE)
        |          - CAST(CAST(s * s AS VARCHAR) AS DOUBLE) AS ssb_n,
        |         CAST(CAST(CAST(n AS DOUBLE) * CAST(CAST(q AS VARCHAR) AS DOUBLE)
        |           AS VARCHAR) AS DOUBLE)
        |          - CAST(CAST(s * s AS VARCHAR) AS DOUBLE) AS sst_n
        |  FROM w),
        |e AS (SELECT n, ssb_n / sst_n AS eta_sq FROM t)
        |SELECT n, eta_sq,
        |       eta_sq / (1.0 - eta_sq) * (CAST(n - 7 AS DOUBLE) / 6.0)
        |         AS f_stat
        |FROM e""".stripMargin,

    // Winsorized mean: exact [p5,p95] integer clamp over the
    // (segment, cents) aggregate; both means single divisions.
    "q_winsorized" ->
      """WITH per AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT segment, v, cnt,
        |               CAST(sum(cnt) OVER (PARTITION BY segment ORDER BY v)
        |                    AS BIGINT) AS cum
        |        FROM per),
        |tot AS (SELECT segment, CAST(sum(cnt) AS BIGINT) AS n
        |        FROM per GROUP BY 1),
        |th AS (
        |  SELECT segment, n,
        |         min(CASE WHEN cum >= (5 * n + 99) // 100 THEN v END)
        |           AS lo_cents,
        |         min(CASE WHEN cum >= (95 * n + 99) // 100 THEN v END)
        |           AS hi_cents
        |  FROM cum JOIN tot USING (segment)
        |  GROUP BY segment, n)
        |SELECT per.segment, n, lo_cents, hi_cents,
        |       CAST(sum(v * cnt) AS DOUBLE) / CAST(n AS DOUBLE) AS raw_mean,
        |       CAST(sum(least(greatest(v, lo_cents), hi_cents) * cnt)
        |            AS DOUBLE) / CAST(n AS DOUBLE) AS wins_mean
        |FROM per JOIN th ON per.segment = th.segment
        |GROUP BY per.segment, n, lo_cents, hi_cents
        |ORDER BY per.segment""".stripMargin,

    // Per-segment Gini: rank-weighted exact sums within each segment,
    // VARCHAR-routed HUGEINT casts (the q_gini device, segment-keyed).
    "q_gini_segments" ->
      """WITH spend AS (
        |  SELECT c_mktsegment AS segment, o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT segment, v,
        |         CAST(row_number() OVER (PARTITION BY segment
        |                                 ORDER BY v, o_custkey) AS BIGINT)
        |           AS i
        |  FROM spend),
        |s AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
        |         CAST(sum(v) AS BIGINT) AS total_cents,
        |         sum(CAST(i AS HUGEINT) * v) AS siv,
        |         sum(CAST(v AS HUGEINT)) AS sv
        |  FROM r GROUP BY 1)
        |SELECT segment, n_customers, total_cents,
        |       CAST(CAST(2 * siv - (n_customers + 1) * sv AS VARCHAR)
        |            AS DOUBLE) /
        |       CAST(CAST(CAST(n_customers AS HUGEINT) * sv AS VARCHAR)
        |            AS DOUBLE) AS gini
        |FROM s ORDER BY segment""".stripMargin,

    // Welch t: exact (n, Σv, Σv²) per arm, then the same fixed IEEE
    // tree (means, variances, t, Welch–Satterthwaite df, Cohen's d).
    "q_welch" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS ib
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |agg AS (
        |  SELECT CAST(sum(ia) AS BIGINT) AS n_a, CAST(sum(ib) AS BIGINT) AS n_b,
        |         sum(CAST(ia * v AS HUGEINT)) AS s_a,
        |         sum(CAST(ib * v AS HUGEINT)) AS s_b,
        |         sum(CAST(ia AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT))
        |           AS q_a,
        |         sum(CAST(ib AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT))
        |           AS q_b
        |  FROM o),
        |d AS (
        |  SELECT n_a, n_b,
        |         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |         CAST(CAST(s_a AS VARCHAR) AS DOUBLE) AS sad,
        |         CAST(CAST(s_b AS VARCHAR) AS DOUBLE) AS sbd,
        |         CAST(CAST(q_a AS VARCHAR) AS DOUBLE) AS qad,
        |         CAST(CAST(q_b AS VARCHAR) AS DOUBLE) AS qbd
        |  FROM agg),
        |m AS (
        |  SELECT n_a, n_b, nad, nbd, sad / nad AS ma, sbd / nbd AS mb,
        |         (qad - sad * sad / nad) / (nad - 1.0) AS va,
        |         (qbd - sbd * sbd / nbd) / (nbd - 1.0) AS vb
        |  FROM d),
        |se AS (SELECT *, va / nad AS sea, vb / nbd AS seb FROM m)
        |SELECT n_a, n_b, ma / 100.0 AS mean_a, mb / 100.0 AS mean_b,
        |       (ma - mb) / sqrt(sea + seb) AS t_welch,
        |       (sea + seb) * (sea + seb) /
        |         (sea * sea / (nad - 1.0) + seb * seb / (nbd - 1.0)) AS df_welch,
        |       (ma - mb) / sqrt(((nad - 1.0) * va + (nbd - 1.0) * vb) /
        |                        (nad + nbd - 2.0)) AS cohens_d
        |FROM se""".stripMargin,

    // Kendall tau-b: exact pair classification over the 25-row nation
    // aggregate; the one sqrt+division is the only IEEE step.
    "q_kendall" ->
      """WITH bn AS (
        |  SELECT c_nationkey AS nk,
        |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS HUGEINT) AS x,
        |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |p AS (
        |  SELECT a.x - b.x AS dx, CAST(a.y AS HUGEINT) - b.y AS dy
        |  FROM bn a JOIN bn b ON a.nk < b.nk),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(CASE WHEN dx <> 0 AND dy <> 0
        |                        AND ((dx > 0) = (dy > 0)) THEN 1 ELSE 0 END)
        |              AS BIGINT) AS concordant,
        |         CAST(sum(CASE WHEN dx <> 0 AND dy <> 0
        |                        AND ((dx > 0) <> (dy > 0)) THEN 1 ELSE 0 END)
        |              AS BIGINT) AS discordant,
        |         CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS tied_x,
        |         CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS tied_y
        |  FROM p)
        |SELECT n_pairs, concordant, discordant, tied_x, tied_y,
        |       CAST(concordant - discordant AS DOUBLE) /
        |       sqrt(CAST(n_pairs - tied_x AS DOUBLE) *
        |            CAST(n_pairs - tied_y AS DOUBLE)) AS tau_b
        |FROM agg""".stripMargin,

    // Grubbs: exact per-segment sufficient stats; per-row |v−μ| is one
    // double subtraction and max is accumulation-order-free.
    "q_grubbs" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM customer),
        |st AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(v AS HUGEINT)) AS s,
        |         sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q
        |  FROM c GROUP BY 1),
        |st2 AS (
        |  SELECT segment, n,
        |         CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |         sqrt((CAST(CAST(q AS VARCHAR) AS DOUBLE) -
        |               CAST(CAST(s AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) /
        |              (CAST(n AS DOUBLE) - 1.0)) AS sd
        |  FROM st),
        |mx AS (
        |  SELECT c.segment, max(abs(CAST(v AS DOUBLE) - mu)) AS max_dev
        |  FROM c JOIN st2 ON c.segment = st2.segment GROUP BY 1)
        |SELECT st2.segment, n, mu / 100.0 AS mean_bal, sd / 100.0 AS sd_bal,
        |       max_dev / 100.0 AS max_dev, max_dev / sd AS grubbs_g
        |FROM st2 JOIN mx ON st2.segment = mx.segment
        |ORDER BY st2.segment""".stripMargin,

    // Pearson triangle from one exact moment row; each corr is the
    // same num/√(dx·dy) tree as q_regression.
    "q_corr_matrix" ->
      """WITH li AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x1,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS x2,
        |         CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |           AS x3
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
        |         sum(CAST(x3 AS HUGEINT)) AS s3,
        |         sum(CAST(x1 AS HUGEINT) * x1) AS q11,
        |         sum(CAST(x2 AS HUGEINT) * x2) AS q22,
        |         sum(CAST(x3 AS HUGEINT) * x3) AS q33,
        |         sum(CAST(x1 AS HUGEINT) * x2) AS q12,
        |         sum(CAST(x1 AS HUGEINT) * x3) AS q13,
        |         sum(CAST(x2 AS HUGEINT) * x3) AS q23
        |  FROM li),
        |c AS (
        |  SELECT n,
        |    CAST(CAST(CAST(n AS HUGEINT) * q12 - s1 * s2 AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(CAST(CAST(n AS HUGEINT) * q11 - s1 * s1 AS VARCHAR)
        |                AS DOUBLE) *
        |           CAST(CAST(CAST(n AS HUGEINT) * q22 - s2 * s2 AS VARCHAR)
        |                AS DOUBLE)) AS c12,
        |    CAST(CAST(CAST(n AS HUGEINT) * q13 - s1 * s3 AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(CAST(CAST(n AS HUGEINT) * q11 - s1 * s1 AS VARCHAR)
        |                AS DOUBLE) *
        |           CAST(CAST(CAST(n AS HUGEINT) * q33 - s3 * s3 AS VARCHAR)
        |                AS DOUBLE)) AS c13,
        |    CAST(CAST(CAST(n AS HUGEINT) * q23 - s2 * s3 AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(CAST(CAST(n AS HUGEINT) * q22 - s2 * s2 AS VARCHAR)
        |                AS DOUBLE) *
        |           CAST(CAST(CAST(n AS HUGEINT) * q33 - s3 * s3 AS VARCHAR)
        |                AS DOUBLE)) AS c23
        |  FROM m)
        |SELECT 'quantity' AS var_x, 'extendedprice' AS var_y, n, c12 AS corr FROM c
        |UNION ALL
        |SELECT 'quantity', 'discount', n, c13 FROM c
        |UNION ALL
        |SELECT 'extendedprice', 'discount', n, c23 FROM c
        |ORDER BY var_x, var_y""".stripMargin,

    // Balanced shards: round-robin over the size-descending rank.
    "q_shards" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |              AS BIGINT) AS r
        |  FROM documents),
        |s AS (
        |  SELECT (r - 1) % 8 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         CAST(min(n_chars) AS BIGINT) AS min_chars,
        |         CAST(max(n_chars) AS BIGINT) AS max_chars
        |  FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(total_chars) AS BIGINT) AS grand FROM s)
        |SELECT shard, n_docs, total_chars, min_chars, max_chars,
        |       CAST(total_chars * 8 AS DOUBLE) / CAST(grand AS DOUBLE)
        |         AS balance_ratio
        |FROM s CROSS JOIN t ORDER BY shard""".stripMargin,

    // Linear + last-touch attribution with integer micro-credits
    // (1000000 // k is engine-identical truncation; no float 1/k sums).
    "q_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |p AS (SELECT event_id AS pid, user_id, ts_ms AS pts
        |      FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS tid, event_type AS touch_type,
        |             ts_ms AS tts
        |      FROM e WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT pid, tid, touch_type, tts
        |  FROM p JOIN t USING (user_id)
        |  WHERE tts < pts AND tts >= pts - 604800000),
        |pt AS (SELECT pid, touch_type, CAST(count(*) AS BIGINT) AS c
        |       FROM j GROUP BY 1, 2),
        |k AS (SELECT pid, CAST(sum(c) AS BIGINT) AS k FROM pt GROUP BY 1),
        |lin AS (
        |  SELECT touch_type, CAST(sum(c) AS BIGINT) AS touches,
        |         CAST(count(DISTINCT pid) AS BIGINT) AS purchases_touched,
        |         CAST(sum(c * (1000000 // k)) AS BIGINT) AS linear_micro
        |  FROM pt JOIN k USING (pid) GROUP BY 1),
        |last AS (
        |  SELECT touch_type, CAST(count(*) AS BIGINT) AS last_touch_wins
        |  FROM (SELECT touch_type,
        |               row_number() OVER (PARTITION BY pid
        |                                  ORDER BY tts DESC, tid DESC) AS rn
        |        FROM j)
        |  WHERE rn = 1 GROUP BY 1)
        |SELECT touch_type, touches, purchases_touched, linear_micro,
        |       COALESCE(last_touch_wins, 0) AS last_touch_wins
        |FROM lin LEFT JOIN last USING (touch_type)
        |ORDER BY touch_type""".stripMargin,

    // SAX: integer day→segment assignment off broadcast bounds, exact
    // PAA/μ/σ sums, literal-pinned ±0.6745 breakpoints.
    "q_sax" ->
      """WITH daily AS (
        |  SELECT epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS v
        |  FROM orders GROUP BY 1),
        |st AS (
        |  SELECT CAST(min(day) AS BIGINT) AS d0, CAST(max(day) AS BIGINT) AS d1,
        |         CAST(count(*) AS BIGINT) AS n_days,
        |         sum(CAST(v AS HUGEINT)) AS s,
        |         sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q
        |  FROM daily),
        |st2 AS (
        |  SELECT d0, d1,
        |         CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE)
        |           AS mu,
        |         sqrt((CAST(CAST(q AS VARCHAR) AS DOUBLE) -
        |               CAST(CAST(s AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(s AS VARCHAR) AS DOUBLE) /
        |               CAST(n_days AS DOUBLE)) /
        |              (CAST(n_days AS DOUBLE) - 1.0)) AS sd
        |  FROM st),
        |seg AS (
        |  SELECT ((day - d0) * 16) // (d1 - d0 + 1) AS seg,
        |         CAST(count(*) AS BIGINT) AS n_days_seg,
        |         CAST(sum(v) AS BIGINT) AS total_cents,
        |         any_value(mu) AS mu, any_value(sd) AS sd
        |  FROM daily CROSS JOIN st2 GROUP BY 1),
        |z AS (
        |  SELECT seg, n_days_seg, total_cents,
        |         CAST(total_cents AS DOUBLE) / CAST(n_days_seg AS DOUBLE) AS paa,
        |         (CAST(total_cents AS DOUBLE) / CAST(n_days_seg AS DOUBLE) - mu)
        |           / sd AS z
        |  FROM seg)
        |SELECT seg, n_days_seg, total_cents, paa, z,
        |       CASE WHEN z < -0.6745 THEN 'a'
        |            WHEN z < 0.0 THEN 'b'
        |            WHEN z < 0.6745 THEN 'c'
        |            ELSE 'd' END AS symbol
        |FROM z ORDER BY seg""".stripMargin,

    // Frequent triples: order-keyed double self-join, exact support
    // counts, unique (cnt DESC, p1, p2, p3) top-k order.
    "q_basket3" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
        |SELECT a.p AS p1, b.p AS p2, c.p AS p3,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM op a
        |JOIN op b ON a.o = b.o AND a.p < b.p
        |JOIN op c ON b.o = c.o AND b.p < c.p
        |GROUP BY 1, 2, 3
        |HAVING count(*) >= 2
        |ORDER BY cnt DESC, p1, p2, p3
        |LIMIT 20""".stripMargin,

    // Tokenizer fertility per language: exact token/char sums, two
    // terminal divisions.
    "q_fertility" ->
      """WITH inj AS (
        |  SELECT lang,
        |         text || ' v' || (doc_id % 10) || '.' || (doc_id % 7)
        |              || ', cost $' || (doc_id % 100) || '!' AS txt
        |  FROM documents),
        |cnt AS (
        |  SELECT lang,
        |         CAST(len(string_split(txt, ' ')) AS BIGINT) AS ws,
        |         CAST(len(regexp_extract_all(txt,
        |           ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS bpe,
        |         CAST(length(txt) AS BIGINT) AS chars
        |  FROM inj)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |       CAST(sum(chars) AS BIGINT) AS chars,
        |       CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE)
        |         AS tokens_per_word,
        |       CAST(sum(chars) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE)
        |         AS chars_per_token
        |FROM cnt GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // AUC via the rank-sum identity over doubled midranks (exact ints,
    // one terminal division) — the q_mannwhitney device.
    "q_auc" ->
      """WITH lbl AS (
        |  SELECT o.o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
        |  FROM orders o LEFT JOIN (
        |    SELECT DISTINCT l_orderkey
        |    FROM lineitem WHERE l_returnflag = 'R') r
        |  ON o.o_orderkey = r.l_orderkey),
        |per AS (
        |  SELECT v, CAST(sum(y) AS BIGINT) AS a,
        |         CAST(sum(1 - y) AS BIGINT) AS b,
        |         CAST(count(*) AS BIGINT) AS t
        |  FROM lbl GROUP BY v),
        |cum AS (SELECT v, a, b, t,
        |               CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS cum_t
        |        FROM per),
        |agg AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS n_pos,
        |         CAST(sum(b) AS BIGINT) AS n_neg,
        |         sum(CAST(a AS HUGEINT) *
        |             (2 * CAST(cum_t AS HUGEINT) - t + 1)) AS rank2_pos
        |  FROM cum)
        |SELECT n_pos, n_neg,
        |       CAST(rank2_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)
        |         AS u2,
        |       CAST(CAST(rank2_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1)
        |                 AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(2 * CAST(n_pos AS HUGEINT) * n_neg AS VARCHAR)
        |            AS DOUBLE) AS auc
        |FROM agg""".stripMargin,

    // Calibration/gains: integer decile assignment off the unique
    // (v DESC, custkey) rank; every rate is a ratio of exact counts.
    "q_calibration" ->
      """WITH lbl AS (
        |  SELECT o.o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
        |  FROM orders o LEFT JOIN (
        |    SELECT DISTINCT l_orderkey
        |    FROM lineitem WHERE l_returnflag = 'R') r
        |  ON o.o_orderkey = r.l_orderkey),
        |rk AS (
        |  SELECT y, CAST(row_number() OVER (ORDER BY v DESC, o_orderkey)
        |                 AS BIGINT) AS r,
        |         CAST(count(*) OVER () AS BIGINT) AS n_all
        |  FROM lbl),
        |d AS (
        |  SELECT ((r - 1) * 10) // n_all AS decile,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM rk GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n,
        |             CAST(sum(n_pos) AS BIGINT) AS tot_pos FROM d),
        |c AS (SELECT decile, n, n_pos,
        |             CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT)
        |               AS cum_pos
        |      FROM d)
        |SELECT decile, n, n_pos,
        |       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |       CAST(n_pos * tot_n AS DOUBLE) / CAST(n * tot_pos AS DOUBLE)
        |         AS lift,
        |       CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS gain
        |FROM c CROSS JOIN t ORDER BY decile""".stripMargin,

    // Weekday decomposition in ×7-scaled integers: rolling 7-day SUM
    // via the offset spine, residual 7v−S7 exact, one division per dow.
    "q_decompose" ->
      """WITH daily AS (
        |  SELECT epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS v
        |  FROM orders GROUP BY 1),
        |s7 AS (
        |  SELECT d.day + o.off AS center, CAST(count(*) AS BIGINT) AS w_n,
        |         CAST(sum(d.v) AS BIGINT) AS s7
        |  FROM daily d CROSS JOIN (
        |    SELECT unnest(generate_series(-3, 3)) AS off) o
        |  GROUP BY 1 HAVING count(*) = 7),
        |r AS (
        |  SELECT (day + 3) % 7 AS dow, v * 7 - s7 AS resid7
        |  FROM daily JOIN s7 ON day = center)
        |SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(resid7) AS BIGINT) AS sum_resid7,
        |       CAST(sum(resid7) AS DOUBLE) / CAST(count(*) * 7 AS DOUBLE)
        |         AS seasonal_cents
        |FROM r GROUP BY dow
        |ORDER BY dow""".stripMargin,

    // Count-Min Sketch built from the part-count table (identical cells
    // at d×|parts| cost); md5-prefix hashes seeded per row.
    "q_cms" ->
      """WITH counts AS (
        |  SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |e AS (
        |  SELECT p, c, j,
        |         CAST('0x' || substr(md5(j || '|' || CAST(p AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 256 AS b
        |  FROM counts CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)),
        |sk AS (SELECT j, b, CAST(sum(c) AS BIGINT) AS cms FROM e GROUP BY 1, 2),
        |top AS (SELECT p, c FROM counts ORDER BY c DESC, p LIMIT 20)
        |SELECT t.p AS part_key, t.c AS true_cnt,
        |       CAST(min(cms) AS BIGINT) AS est_cnt,
        |       CAST(min(cms) - t.c AS BIGINT) AS overest
        |FROM top t
        |JOIN e ON e.p = t.p
        |JOIN sk ON sk.j = e.j AND sk.b = e.b
        |GROUP BY 1, 2
        |ORDER BY true_cnt DESC, part_key""".stripMargin,

    // Deterministic 64-register HLL: ρ via bin() length, harmonic sum
    // scaled by 2^55 into an exact BIGINT, α·m²·2^55/S terminal.
    "q_hll" ->
      """WITH h AS (
        |  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
        |              AS BIGINT) AS h
        |  FROM orders),
        |r AS (
        |  SELECT h % 64 AS j, h // 64 AS v FROM h),
        |regs AS (
        |  SELECT j, CAST(max(CASE WHEN v = 0 THEN 55
        |                          ELSE 55 - length(bin(v)) END) AS BIGINT) AS reg
        |  FROM r GROUP BY 1),
        |filled AS (
        |  SELECT s.j, COALESCE(reg, 0) AS reg
        |  FROM (SELECT unnest(generate_series(0, 63)) AS j) s
        |  LEFT JOIN regs ON s.j = regs.j),
        |agg AS (
        |  SELECT CAST(sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS nonzero_regs,
        |         CAST(sum(CAST(1 AS BIGINT) << CAST(55 - reg AS INTEGER))
        |              AS BIGINT) AS s_scaled
        |  FROM filled),
        |t AS (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT)
        |        AS true_distinct FROM orders)
        |SELECT CAST(64 AS BIGINT) AS m, nonzero_regs, s_scaled,
        |       CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) *
        |         CAST(36028797018963968.0 AS DOUBLE) /
        |         CAST(s_scaled AS DOUBLE) AS est,
        |       true_distinct,
        |       (CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) *
        |          CAST(36028797018963968.0 AS DOUBLE) /
        |          CAST(s_scaled AS DOUBLE) - CAST(true_distinct AS DOUBLE)) /
        |         CAST(true_distinct AS DOUBLE) AS rel_err
        |FROM agg CROSS JOIN t""".stripMargin,

    // Lorenz curve: integer decile off the ascending spend rank, window
    // sums over the 10-row decile frame, shares as exact-count ratios.
    "q_lorenz" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS v
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v, o_custkey) AS BIGINT)
        |           AS r,
        |         CAST(count(*) OVER () AS BIGINT) AS n_all
        |  FROM spend),
        |d AS (
        |  SELECT ((r - 1) * 10) // n_all AS decile,
        |         CAST(count(*) AS BIGINT) AS n_customers,
        |         CAST(sum(v) AS BIGINT) AS decile_cents
        |  FROM rk GROUP BY 1),
        |c AS (
        |  SELECT decile, n_customers, decile_cents,
        |         CAST(sum(decile_cents) OVER (ORDER BY decile) AS BIGINT)
        |           AS cum_cents,
        |         CAST(sum(n_customers) OVER (ORDER BY decile) AS BIGINT)
        |           AS cum_n
        |  FROM d),
        |t AS (SELECT CAST(sum(n_customers) AS BIGINT) AS tot_n,
        |             CAST(sum(decile_cents) AS BIGINT) AS tot_cents FROM d)
        |SELECT decile, n_customers, decile_cents, cum_cents,
        |       CAST(cum_cents AS DOUBLE) / CAST(tot_cents AS DOUBLE)
        |         AS cum_share,
        |       CAST(cum_n AS DOUBLE) / CAST(tot_n AS DOUBLE) AS pop_share
        |FROM c CROSS JOIN t ORDER BY decile""".stripMargin,

    // Reorder hazard: integer event/censor weeks, suffix risk set via
    // total − cum + cnt, hazard = events/at_risk.
    "q_hazard" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck,
        |         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day
        |  FROM orders),
        |f AS (SELECT ck, CAST(min(day) AS BIGINT) AS d1 FROM o GROUP BY 1),
        |s AS (SELECT o.ck, CAST(min(day) AS BIGINT) AS d2
        |      FROM o JOIN f ON o.ck = f.ck WHERE day > d1 GROUP BY 1),
        |hz AS (SELECT CAST(max(day) AS BIGINT) AS dmax FROM o),
        |pc AS (
        |  SELECT CASE WHEN d2 IS NOT NULL THEN (d2 - d1) // 7
        |              ELSE (dmax - d1) // 7 END AS w,
        |         d2 IS NOT NULL AS is_event
        |  FROM f LEFT JOIN s ON f.ck = s.ck CROSS JOIN hz),
        |h AS (
        |  SELECT w,
        |         CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_events,
        |         CAST(sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT)
        |           AS n_censored
        |  FROM pc GROUP BY 1),
        |c AS (
        |  SELECT w, n_events, n_censored,
        |         n_events + n_censored AS cnt,
        |         CAST(sum(n_events + n_censored) OVER (ORDER BY w) AS BIGINT)
        |           AS cum
        |  FROM h),
        |t AS (SELECT CAST(sum(n_events + n_censored) AS BIGINT) AS total FROM h)
        |SELECT w, total - cum + cnt AS n_at_risk, n_events, n_censored,
        |       CAST(n_events AS DOUBLE) / CAST(total - cum + cnt AS DOUBLE)
        |         AS hazard
        |FROM c CROSS JOIN t ORDER BY w""".stripMargin,

    // Seasonal-naive backtest: exact |v − v_lag7| cent sums, two
    // terminal means per priority.
    "q_backtest" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS v
        |  FROM orders GROUP BY 1, 2),
        |j AS (
        |  SELECT a.prio, a.v, b.v AS v_lag7
        |  FROM daily a JOIN daily b
        |    ON a.prio = b.prio AND a.day = b.day + 7)
        |SELECT prio, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(abs(v - v_lag7)) AS BIGINT) AS abs_err_cents,
        |       CAST(sum(v - v_lag7) AS BIGINT) AS bias_cents,
        |       CAST(sum(abs(v - v_lag7)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         AS mae_cents,
        |       CAST(sum(v - v_lag7) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         AS mean_bias_cents
        |FROM j GROUP BY prio
        |ORDER BY prio""".stripMargin,

    // KMV: bottom-k of the 52-bit md5 uniform hash, est = (k−1)/h_k.
    "q_kmv" ->
      """WITH u AS (
        |  SELECT DISTINCT o_orderkey,
        |         CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)
        |                   AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS h
        |  FROM orders),
        |bk AS (SELECT o_orderkey, h FROM u
        |       ORDER BY h, o_orderkey LIMIT 64),
        |kth AS (SELECT max(h) AS h_k, CAST(count(*) AS BIGINT) AS k_got
        |        FROM bk),
        |t AS (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT)
        |        AS true_distinct FROM orders)
        |SELECT k_got AS k, h_k,
        |       (CAST(k_got AS DOUBLE) - 1.0) / h_k AS est,
        |       true_distinct,
        |       ((CAST(k_got AS DOUBLE) - 1.0) / h_k -
        |          CAST(true_distinct AS DOUBLE)) /
        |         CAST(true_distinct AS DOUBLE) AS rel_err
        |FROM kth CROSS JOIN t""".stripMargin,

    // Poisson bootstrap: md5-uniform(orderkey|b) cut at literal
    // Poisson(1) CDF thresholds; exact weighted sums, one mean each.
    "q_bootstrap" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders),
        |e AS (
        |  SELECT b, v,
        |         CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
        |                    || '|' || b), 1, 13) AS BIGINT) AS DOUBLE)
        |           / 4503599627370496.0 AS u
        |  FROM o CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)),
        |w AS (
        |  SELECT b, v,
        |         CASE WHEN u < CAST(0.3679 AS DOUBLE) THEN 0
        |              WHEN u < CAST(0.7358 AS DOUBLE) THEN 1
        |              WHEN u < CAST(0.9197 AS DOUBLE) THEN 2
        |              WHEN u < CAST(0.9810 AS DOUBLE) THEN 3
        |              ELSE 4 END AS w
        |  FROM e)
        |SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
        |       CAST(sum(w * v) AS BIGINT) AS sum_cents,
        |       CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
        |         AS mean_cents
        |FROM w GROUP BY b
        |ORDER BY b""".stripMargin,

    // Price indices: integer milli-price (cents·1000 div qty), exact
    // Σ price·qty products, one division per index + Fisher sqrt.
    "q_price_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS p,
        |         epoch_ms(CAST(l_shipdate AS TIMESTAMP)) // 86400000 AS day,
        |         CAST(l_quantity AS BIGINT) AS q,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM lineitem),
        |b AS (SELECT CAST(min(day) AS BIGINT) AS d0,
        |             CAST(max(day) AS BIGINT) AS d1 FROM li),
        |ph AS (
        |  SELECT p, CASE WHEN day * 2 <= d0 + d1 THEN 0 ELSE 1 END AS half,
        |         CAST(sum(q) AS BIGINT) AS qty,
        |         CAST(sum(cents) AS BIGINT) AS cents
        |  FROM li CROSS JOIN b GROUP BY 1, 2),
        |pm AS (SELECT p, half, qty, (cents * 1000) // qty AS price_milli
        |       FROM ph),
        |j AS (
        |  SELECT a.p, a.qty AS q0, a.price_milli AS p0,
        |         c.qty AS q1, c.price_milli AS p1
        |  FROM pm a JOIN pm c ON a.p = c.p AND a.half = 0 AND c.half = 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
        |         sum(CAST(p1 AS HUGEINT) * q0) AS l_num,
        |         sum(CAST(p0 AS HUGEINT) * q0) AS l_den,
        |         sum(CAST(p1 AS HUGEINT) * q1) AS p_num,
        |         sum(CAST(p0 AS HUGEINT) * q1) AS p_den
        |  FROM j)
        |SELECT n_parts,
        |       CAST(CAST(l_num AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(l_den AS VARCHAR) AS DOUBLE) AS laspeyres,
        |       CAST(CAST(p_num AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(p_den AS VARCHAR) AS DOUBLE) AS paasche,
        |       sqrt((CAST(CAST(l_num AS VARCHAR) AS DOUBLE) /
        |             CAST(CAST(l_den AS VARCHAR) AS DOUBLE)) *
        |            (CAST(CAST(p_num AS VARCHAR) AS DOUBLE) /
        |             CAST(CAST(p_den AS VARCHAR) AS DOUBLE))) AS fisher
        |FROM agg""".stripMargin,

    "q_pca_power" -> pcaRoundsCtes(12),
    "q_pca_project" -> pcaProjectCtes(12),
    "q_ipf" -> ipfRoundsCtes(6),

    // Modularity with cleared denominators: per-community numerator
    // 4m·e_c − a_c² exact HUGEINT, ONE division by 4m² per emitted value.
    "q_modularity" ->
      """WITH so AS (
        |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.s AS x, b.s AS y
        |  FROM so a JOIN so b ON a.o = b.o AND a.s < b.s),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT x AS v FROM e UNION ALL SELECT y FROM e)
        |  GROUP BY 1),
        |ac AS (
        |  SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_suppliers,
        |         CAST(sum(d) AS BIGINT) AS a_c
        |  FROM deg JOIN supplier ON v = s_suppkey GROUP BY 1),
        |ec AS (
        |  SELECT nx.s_nationkey AS nk, CAST(count(*) AS BIGINT) AS e_in
        |  FROM e JOIN supplier nx ON e.x = nx.s_suppkey
        |         JOIN supplier ny ON e.y = ny.s_suppkey
        |  WHERE nx.s_nationkey = ny.s_nationkey GROUP BY 1),
        |per AS (
        |  SELECT ac.nk, n_suppliers, COALESCE(e_in, 0) AS e_in, a_c,
        |         4 * CAST(m.m AS HUGEINT) * COALESCE(e_in, 0) -
        |           CAST(a_c AS HUGEINT) * a_c AS num
        |  FROM ac LEFT JOIN ec ON ac.nk = ec.nk CROSS JOIN m),
        |q AS (
        |  SELECT CAST(CAST(sum(num) AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(4 * CAST(m.m AS HUGEINT) * m.m AS VARCHAR)
        |              AS DOUBLE) AS modularity
        |  FROM per CROSS JOIN m GROUP BY m.m)
        |SELECT n_name AS nation_name, n_suppliers, e_in, a_c,
        |       CAST(CAST(num AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(4 * CAST(m.m AS HUGEINT) * m.m AS VARCHAR)
        |              AS DOUBLE) AS contribution,
        |       modularity
        |FROM per JOIN nation ON nk = n_nationkey
        |CROSS JOIN m CROSS JOIN q
        |ORDER BY nation_name""".stripMargin,

    // Per-class P/R/F1 over the langid confusion cells; F1 as
    // 2tp/(2tp+fp+fn) — one division, no chained floats.
    "q_f1" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS toks,
        |         regexp_matches(text, '[\p{Hiragana}\p{Katakana}]') AS kana,
        |         regexp_matches(text, '\p{Han}') AS han
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, kana, han,
        |         len(list_intersect(toks, ['the','and','of','is','with','for'])) AS he,
        |         len(list_intersect(toks, ['der','die','das','und','nicht','mit'])) AS hd,
        |         len(list_intersect(toks, ['le','la','les','et','est','dans'])) AS hf,
        |         len(list_intersect(toks, ['el','los','las','es','y','en'])) AS hs
        |  FROM t),
        |p AS (
        |  SELECT doc_id,
        |         CASE WHEN kana THEN 'ja'
        |              WHEN han THEN 'zh'
        |              WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |              WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |              WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
        |              WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |              ELSE 'de' END AS pred
        |  FROM v),
        |cells AS (
        |  SELECT d.lang, p.pred, CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2),
        |bt AS (
        |  SELECT lang AS label,
        |         CAST(sum(CASE WHEN lang = pred THEN n ELSE 0 END) AS BIGINT)
        |           AS tp,
        |         CAST(sum(CASE WHEN lang <> pred THEN n ELSE 0 END) AS BIGINT)
        |           AS fn
        |  FROM cells GROUP BY 1),
        |bp AS (
        |  SELECT pred AS label, CAST(sum(n) AS BIGINT) AS fp
        |  FROM cells WHERE lang <> pred GROUP BY 1)
        |SELECT label, tp, COALESCE(fp, 0) AS fp, fn,
        |       CASE WHEN tp + COALESCE(fp, 0) > 0
        |            THEN CAST(tp AS DOUBLE) /
        |                 CAST(tp + COALESCE(fp, 0) AS DOUBLE)
        |            END AS precision,
        |       CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
        |       CAST(2 * tp AS DOUBLE) /
        |         CAST(2 * tp + COALESCE(fp, 0) + fn AS DOUBLE) AS f1
        |FROM bt LEFT JOIN bp USING (label)
        |ORDER BY label""".stripMargin,

    // Quadratic fit by Cramer on exact HUGEINT moment determinants;
    // the three coefficient divisions are the only IEEE steps.
    "q_polyfit" ->
      """WITH daily AS (
        |  SELECT epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS y
        |  FROM orders GROUP BY 1),
        |d0 AS (SELECT CAST(min(day) AS BIGINT) AS d0 FROM daily),
        |m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS s0,
        |         sum(CAST(day - d0 AS HUGEINT)) AS s1,
        |         sum(CAST(day - d0 AS HUGEINT) * (day - d0)) AS s2,
        |         sum(CAST(day - d0 AS HUGEINT) * (day - d0) * (day - d0))
        |           AS s3,
        |         sum(CAST(day - d0 AS HUGEINT) * (day - d0) * (day - d0)
        |             * (day - d0)) AS s4,
        |         sum(CAST(y AS HUGEINT)) AS t0,
        |         sum(CAST(day - d0 AS HUGEINT) * y) AS t1,
        |         sum(CAST(day - d0 AS HUGEINT) * (day - d0) * y) AS t2
        |  FROM daily CROSS JOIN d0),
        |mn AS (
        |  -- exact x-side minors (calendar-bounded); y-moments stay exact;
        |  -- numerators close through the SAME fixed double tree as Spark
        |  -- (corpus-scaled products overflow 128-bit integers at 10x)
        |  SELECT s0, t0, t1, t2,
        |    s2*s4 - s3*s3 AS a1, s1*s4 - s2*s3 AS a2, s1*s3 - s2*s2 AS a3,
        |    s0*s4 - s2*s2 AS a4, s0*s3 - s1*s2 AS a5, s0*s2 - s1*s1 AS a6,
        |    s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s2*s3) + s2*(s1*s3 - s2*s2)
        |      AS den
        |  FROM m),
        |p AS (
        |  -- each t*a product pinned by its own VARCHAR round-trip BEFORE
        |  -- the +- chain: bare p +- q*r invites FMA contraction (the
        |  -- q_ndcg 1-ulp find); round-tripping an already-rounded double
        |  -- is exact, so this only fixes the rounding points
        |  SELECT s0, CAST(CAST(den AS VARCHAR) AS DOUBLE) AS dend,
        |    CAST(CAST(CAST(CAST(t0 AS VARCHAR) AS DOUBLE) * CAST(CAST(a1 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p01,
        |    CAST(CAST(CAST(CAST(t1 AS VARCHAR) AS DOUBLE) * CAST(CAST(a2 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p12,
        |    CAST(CAST(CAST(CAST(t2 AS VARCHAR) AS DOUBLE) * CAST(CAST(a3 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p23,
        |    CAST(CAST(CAST(CAST(t1 AS VARCHAR) AS DOUBLE) * CAST(CAST(a4 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p14,
        |    CAST(CAST(CAST(CAST(t0 AS VARCHAR) AS DOUBLE) * CAST(CAST(a2 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p02,
        |    CAST(CAST(CAST(CAST(t2 AS VARCHAR) AS DOUBLE) * CAST(CAST(a5 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p25,
        |    CAST(CAST(CAST(CAST(t0 AS VARCHAR) AS DOUBLE) * CAST(CAST(a3 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p03,
        |    CAST(CAST(CAST(CAST(t1 AS VARCHAR) AS DOUBLE) * CAST(CAST(a5 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p15,
        |    CAST(CAST(CAST(CAST(t2 AS VARCHAR) AS DOUBLE) * CAST(CAST(a6 AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DOUBLE) AS p26
        |  FROM mn),
        |d AS (
        |  SELECT s0, dend,
        |    p03 - p15 + p26 AS num_a,
        |    p14 - p02 - p25 AS num_b,
        |    p01 - p12 + p23 AS num_c
        |  FROM p)
        |SELECT CAST(s0 AS BIGINT) AS n_days,
        |       num_a / dend AS a_quad,
        |       num_b / dend AS b_lin,
        |       num_c / dend AS c_const
        |FROM d""".stripMargin,

    // Theil–Sen: exact-operand slope doubles, rank-selected medians.
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS y
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT a.day AS di, b.day AS dj,
        |         CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
        |           AS slope
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |r AS (
        |  SELECT slope,
        |         CAST(row_number() OVER (ORDER BY slope, di, dj) AS BIGINT)
        |           AS r,
        |         CAST(count(*) OVER () AS BIGINT) AS np
        |  FROM p),
        |med AS (SELECT slope AS med_slope, np AS n_pairs FROM r
        |        WHERE r * 2 = np OR r * 2 = np + 1),
        |res AS (
        |  SELECT day,
        |         CAST(y AS DOUBLE) - med_slope * CAST(day AS DOUBLE) AS b0,
        |         med_slope, n_pairs
        |  FROM daily CROSS JOIN med),
        |r2 AS (
        |  SELECT b0, med_slope, n_pairs,
        |         CAST(row_number() OVER (ORDER BY b0, day) AS BIGINT) AS r,
        |         CAST(count(*) OVER () AS BIGINT) AS nd
        |  FROM res)
        |SELECT nd AS n_days, n_pairs, med_slope AS slope_cents_per_day,
        |       b0 AS intercept_cents
        |FROM r2 WHERE r * 2 = nd OR r * 2 = nd + 1""".stripMargin,

    // Wasserstein-1: cross-multiplied integer CDF gaps × successor
    // value gaps (rank+1 join), one division by na·nb.
    "q_wasserstein" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS ib
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |per AS (SELECT v, CAST(sum(ia) AS BIGINT) AS a,
        |               CAST(sum(ib) AS BIGINT) AS b
        |        FROM o GROUP BY v),
        |cum AS (
        |  SELECT v, CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
        |         CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cum_b,
        |         CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS r
        |  FROM per),
        |t AS (SELECT CAST(sum(a) AS BIGINT) AS na,
        |             CAST(sum(b) AS BIGINT) AS nb FROM per),
        |g AS (SELECT x.cum_a, x.cum_b, x.v, y.v AS v_next
        |      FROM cum x JOIN cum y ON y.r = x.r + 1),
        |agg AS (
        |  SELECT na, nb,
        |         sum(abs(CAST(cum_a AS HUGEINT) * nb -
        |                 CAST(cum_b AS HUGEINT) * na) * (v_next - v)) AS num
        |  FROM g CROSS JOIN t GROUP BY 1, 2)
        |SELECT na, nb,
        |       CAST(CAST(num AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(CAST(na AS HUGEINT) * nb AS VARCHAR) AS DOUBLE)
        |         AS emd_cents
        |FROM agg""".stripMargin,

    "q_stationary" -> stationaryRoundsCtes(12),

    // DiD: four exact (n, Σ) cells from one conditional pass; the
    // estimate is a fixed four-division tree.
    "q_did" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day,
        |         c_mktsegment = 'BUILDING' AS is_t
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |b AS (SELECT CAST(min(day) AS BIGINT) AS d0,
        |             CAST(max(day) AS BIGINT) AS d1 FROM o),
        |f AS (SELECT v, is_t, day * 2 > d0 + d1 AS is_post
        |      FROM o CROSS JOIN b),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN is_t AND NOT is_post THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_tpre,
        |    sum(CASE WHEN is_t AND NOT is_post THEN CAST(v AS HUGEINT)
        |             ELSE 0 END) AS s_tpre,
        |    CAST(sum(CASE WHEN is_t AND is_post THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_tpost,
        |    sum(CASE WHEN is_t AND is_post THEN CAST(v AS HUGEINT)
        |             ELSE 0 END) AS s_tpost,
        |    CAST(sum(CASE WHEN NOT is_t AND NOT is_post THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_cpre,
        |    sum(CASE WHEN NOT is_t AND NOT is_post THEN CAST(v AS HUGEINT)
        |             ELSE 0 END) AS s_cpre,
        |    CAST(sum(CASE WHEN NOT is_t AND is_post THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_cpost,
        |    sum(CASE WHEN NOT is_t AND is_post THEN CAST(v AS HUGEINT)
        |             ELSE 0 END) AS s_cpost
        |  FROM f)
        |SELECT n_tpre, n_tpost, n_cpre, n_cpost,
        |  CAST(CAST(s_tpre AS VARCHAR) AS DOUBLE) / CAST(n_tpre AS DOUBLE)
        |    AS mean_t_pre,
        |  CAST(CAST(s_tpost AS VARCHAR) AS DOUBLE) / CAST(n_tpost AS DOUBLE)
        |    AS mean_t_post,
        |  CAST(CAST(s_cpre AS VARCHAR) AS DOUBLE) / CAST(n_cpre AS DOUBLE)
        |    AS mean_c_pre,
        |  CAST(CAST(s_cpost AS VARCHAR) AS DOUBLE) / CAST(n_cpost AS DOUBLE)
        |    AS mean_c_post,
        |  (CAST(CAST(s_tpost AS VARCHAR) AS DOUBLE) / CAST(n_tpost AS DOUBLE) -
        |   CAST(CAST(s_tpre AS VARCHAR) AS DOUBLE) / CAST(n_tpre AS DOUBLE)) -
        |  (CAST(CAST(s_cpost AS VARCHAR) AS DOUBLE) / CAST(n_cpost AS DOUBLE) -
        |   CAST(CAST(s_cpre AS VARCHAR) AS DOUBLE) / CAST(n_cpre AS DOUBLE))
        |    AS did_cents
        |FROM cells""".stripMargin,

    // Cramér's V: per-cell χ² terms as exact-decimal rationals floored at
    // 1e-9 into an order-free integer sum (floor-witness device); V is a
    // terminal fixed chain. VARCHAR-routed HUGEINT→DOUBLE casts.
    "q_cramers_v" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |         CAST(count(*) AS BIGINT) AS obs
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT segment, CAST(sum(obs) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT priority, CAST(sum(obs) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
        |d AS (
        |  SELECT
        |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * obs -
        |              CAST(rt AS DECIMAL(38,0)) * ct AS VARCHAR) AS DOUBLE)
        |      AS dev,
        |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * rt * ct AS VARCHAR)
        |         AS DOUBLE) AS den
        |  FROM cells JOIN rt USING (segment) JOIN ct USING (priority)
        |       CROSS JOIN n),
        |s AS (SELECT CAST(sum(CAST(floor(dev * dev / den * 1000000000.0)
        |                           AS BIGINT)) AS BIGINT) AS chi2_e9
        |      FROM d),
        |k AS (SELECT CAST(count(DISTINCT segment) AS BIGINT) AS r,
        |             CAST(count(DISTINCT priority) AS BIGINT) AS c
        |      FROM cells)
        |SELECT n, r, c, chi2_e9,
        |       sqrt(CAST(chi2_e9 AS DOUBLE) / 1000000000.0 /
        |            (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE)))
        |         AS v
        |FROM n CROSS JOIN s CROSS JOIN k""".stripMargin,

    // McNemar: per-order paired flags, four exact cells, the statistic is
    // one integer square over the discordant counts and one division.
    "q_mcnemar" ->
      """WITH f AS (
        |  SELECT l_orderkey,
        |         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS a,
        |         max(CASE WHEN CAST(l_discount AS DECIMAL(18,6)) >
        |                  CAST('0.05' AS DECIMAL(18,6))
        |             THEN 1 ELSE 0 END) AS b
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n00,
        |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n01,
        |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n10,
        |    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n11
        |  FROM f)
        |SELECT n00, n01, n10, n11,
        |       CASE WHEN n01 + n10 > 0 THEN
        |         CAST((n01 - n10) * (n01 - n10) AS DOUBLE) /
        |         CAST(n01 + n10 AS DOUBLE) END AS mcnemar
        |FROM c""".stripMargin,

    // Cohen's kappa over the langID confusion cells: κ =
    // (n·diag − Σrt·ct)/(n² − Σrt·ct), one division of exact integers.
    "q_kappa" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS toks,
        |         regexp_matches(text, '[\p{Hiragana}\p{Katakana}]') AS kana,
        |         regexp_matches(text, '\p{Han}') AS han
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, kana, han,
        |         len(list_intersect(toks, ['the','and','of','is','with','for'])) AS he,
        |         len(list_intersect(toks, ['der','die','das','und','nicht','mit'])) AS hd,
        |         len(list_intersect(toks, ['le','la','les','et','est','dans'])) AS hf,
        |         len(list_intersect(toks, ['el','los','las','es','y','en'])) AS hs
        |  FROM t),
        |p AS (
        |  SELECT doc_id,
        |         CASE WHEN kana THEN 'ja'
        |              WHEN han THEN 'zh'
        |              WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |              WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |              WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
        |              WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |              ELSE 'de' END AS pred
        |  FROM v),
        |cells AS (
        |  SELECT d.lang, p.pred, CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2),
        |rt AS (SELECT lang AS label, CAST(sum(n) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT pred AS label, CAST(sum(n) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN lang = pred THEN n ELSE 0 END) AS BIGINT)
        |           AS diag
        |  FROM cells),
        |e AS (
        |  SELECT CAST(COALESCE(sum(CAST(rt AS DECIMAL(38,0)) * ct), 0)
        |              AS BIGINT) AS sum_e
        |  FROM rt JOIN ct USING (label))
        |SELECT n, diag, sum_e,
        |       CAST(diag AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        |       CAST(sum_e AS DOUBLE) /
        |         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
        |       CAST(CAST(CAST(n AS DECIMAL(38,0)) * diag - sum_e AS VARCHAR)
        |            AS DOUBLE) /
        |       CAST(CAST(CAST(n AS DECIMAL(38,0)) * n - sum_e AS VARCHAR)
        |            AS DOUBLE) AS kappa
        |FROM tot CROSS JOIN e""".stripMargin,

    // Partial correlation: the corr_matrix moment pass + the
    // confounder-adjustment fixed tree over the three pairwise r's.
    "q_partial_corr" ->
      """WITH li AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x1,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS x2,
        |         CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |           AS x3
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
        |         sum(CAST(x3 AS HUGEINT)) AS s3,
        |         sum(CAST(x1 AS HUGEINT) * x1) AS q11,
        |         sum(CAST(x2 AS HUGEINT) * x2) AS q22,
        |         sum(CAST(x3 AS HUGEINT) * x3) AS q33,
        |         sum(CAST(x1 AS HUGEINT) * x2) AS q12,
        |         sum(CAST(x1 AS HUGEINT) * x3) AS q13,
        |         sum(CAST(x2 AS HUGEINT) * x3) AS q23
        |  FROM li),
        |c AS (
        |  SELECT n,
        |    CAST(CAST(CAST(n AS HUGEINT) * q12 - s1 * s2 AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(CAST(CAST(n AS HUGEINT) * q11 - s1 * s1 AS VARCHAR)
        |                AS DOUBLE) *
        |           CAST(CAST(CAST(n AS HUGEINT) * q22 - s2 * s2 AS VARCHAR)
        |                AS DOUBLE)) AS r12,
        |    CAST(CAST(CAST(n AS HUGEINT) * q13 - s1 * s3 AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(CAST(CAST(n AS HUGEINT) * q11 - s1 * s1 AS VARCHAR)
        |                AS DOUBLE) *
        |           CAST(CAST(CAST(n AS HUGEINT) * q33 - s3 * s3 AS VARCHAR)
        |                AS DOUBLE)) AS r13,
        |    CAST(CAST(CAST(n AS HUGEINT) * q23 - s2 * s3 AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(CAST(CAST(n AS HUGEINT) * q22 - s2 * s2 AS VARCHAR)
        |                AS DOUBLE) *
        |           CAST(CAST(CAST(n AS HUGEINT) * q33 - s3 * s3 AS VARCHAR)
        |                AS DOUBLE)) AS r23
        |  FROM m)
        |SELECT n, r12, r13, r23,
        |       (r12 - r13 * r23) /
        |       sqrt((1.0 - r13 * r13) * (1.0 - r23 * r23)) AS partial_r
        |FROM c""".stripMargin,

    "q_hits" -> hitsOracleSql,
    "q_label_prop" -> labelPropOracleSql,

    // Component-size histogram of the SimHash near-dup graph: the
    // q_dup_clusters recursive closure, collapsed to sizes.
    "q_component_sizes" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |th AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
        |votes AS (
        |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, (SELECT unnest(range(60)) AS b) bits
        |  GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id,
        |         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
        |  FROM votes GROUP BY 1),
        |chunks AS (
        |  SELECT doc_id, sig, c AS band, (sig >> (c * 15)) & 32767 AS chunk
        |  FROM sig, (SELECT unnest(range(4)) AS c) cs),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |  FROM chunks x JOIN chunks y
        |    ON x.chunk = y.chunk AND x.band = y.band AND x.doc_id < y.doc_id
        |  WHERE bit_count(xor(x.sig, y.sig)) <= 3),
        |sym AS (SELECT d1 AS u, d2 AS v FROM pairs
        |        UNION SELECT d2, d1 FROM pairs),
        |reach(node, r) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |  UNION
        |  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node),
        |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
        |       FROM lab GROUP BY 1)
        |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(sz * count(*) AS BIGINT) AS n_docs
        |FROM sz GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Mann–Kendall: integer S over the week-pair frame, exact tie
    // correction, z as one fixed tree.
    "q_mann_kendall" ->
      """WITH weekly AS (
        |  SELECT epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 604800000 AS week,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS v
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT CAST(COALESCE(sum(CASE WHEN b.v > a.v THEN 1
        |                                WHEN b.v < a.v THEN -1
        |                                ELSE 0 END), 0) AS BIGINT) AS s
        |  FROM weekly a JOIN weekly b ON a.week < b.week),
        |ties AS (
        |  SELECT CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
        |           AS tie_term
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM weekly GROUP BY v)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks FROM weekly),
        |w AS (
        |  SELECT n_weeks, s,
        |         n_weeks * (n_weeks - 1) * (2 * n_weeks + 5) - tie_term AS var18
        |  FROM n CROSS JOIN s CROSS JOIN ties)
        |SELECT n_weeks, s, var18,
        |       CASE WHEN var18 = 0 THEN 0.0
        |            WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) /
        |                            sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |            WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) /
        |                            sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |            ELSE 0.0 END AS z
        |FROM w""".stripMargin,

    // RBO(p=1/2, k=10): per-half top-10 via ORDER/LIMIT, counting-join
    // ranks, depth-spine overlaps, exact 2^10·2520-scaled integer sum.
    "q_rbo" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day
        |  FROM orders),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
        |ph AS (
        |  SELECT l_partkey AS part,
        |         CASE WHEN day * 2 <= d0 + d1 THEN 'h1' ELSE 'h2' END AS half,
        |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN o ON l_orderkey = o_orderkey CROSS JOIN b
        |  GROUP BY 1, 2),
        |ta AS (SELECT part, rev FROM ph WHERE half = 'h1'
        |       ORDER BY rev DESC, part ASC LIMIT 10),
        |tb AS (SELECT part, rev FROM ph WHERE half = 'h2'
        |       ORDER BY rev DESC, part ASC LIMIT 10),
        |ra AS (
        |  SELECT a.part, CAST(count(b2.part) + 1 AS BIGINT) AS r
        |  FROM ta a LEFT JOIN ta b2
        |    ON b2.rev > a.rev OR (b2.rev = a.rev AND b2.part < a.part)
        |  GROUP BY a.part),
        |rb AS (
        |  SELECT a.part, CAST(count(b2.part) + 1 AS BIGINT) AS r
        |  FROM tb a LEFT JOIN tb b2
        |    ON b2.rev > a.rev OR (b2.rev = a.rev AND b2.part < a.part)
        |  GROUP BY a.part),
        |common AS (
        |  SELECT ra.part, greatest(ra.r, rb.r) AS dmin
        |  FROM ra JOIN rb USING (part)),
        |spine AS (SELECT unnest(range(1, 11)) AS d),
        |ov AS (
        |  SELECT d, CAST(count(c.part) AS BIGINT) AS ov
        |  FROM spine s LEFT JOIN common c ON c.dmin <= s.d
        |  GROUP BY d),
        |t AS (SELECT d, ov,
        |             (2520 // d) * (1 << CAST(10 - d AS INTEGER)) * ov AS term
        |      FROM ov)
        |SELECT CAST(10 AS BIGINT) AS k,
        |       max(CASE WHEN d = 10 THEN ov END) AS overlap_at_k,
        |       CAST(sum(term) AS BIGINT) AS rbo_scaled,
        |       CAST(sum(term) AS DOUBLE) / 2580480.0 AS rbo
        |FROM t""".stripMargin,

    // k-fold audit: (md5 % 100) % 5 fold id + per-fold class balance.
    "q_xval_folds" ->
      """WITH f AS (
        |  SELECT lang,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 5 AS fold,
        |         n_chars
        |  FROM documents),
        |g AS (
        |  SELECT fold, lang, CAST(count(*) AS BIGINT) AS docs,
        |         CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM f GROUP BY 1, 2),
        |t AS (SELECT fold, CAST(sum(docs) AS BIGINT) AS fold_docs
        |      FROM g GROUP BY 1)
        |SELECT fold, lang, docs, chars, fold_docs,
        |       CAST(docs AS DOUBLE) / CAST(fold_docs AS DOUBLE) AS lang_share
        |FROM g JOIN t USING (fold)
        |ORDER BY fold, lang""".stripMargin,

    // Nearest-centroid confusion: 10⁴-grid quantization, truncating-mean
    // centroids, exact long distances, min-struct argmin.
    "q_centroid_classify" ->
      """WITH qv AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS j,
        |         CAST(floor((CAST(x AS DOUBLE) + 1) * 10000) AS BIGINT) AS q
        |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
        |               generate_subscripts(embedding, 1) AS dim
        |        FROM embeddings)),
        |cent AS (
        |  SELECT label AS clabel, j, CAST(sum(q) // count(*) AS BIGINT) AS c
        |  FROM qv GROUP BY 1, 2),
        |dist AS (
        |  SELECT qv.vec_id, qv.label, cent.clabel,
        |         CAST(sum((qv.q - cent.c) * (qv.q - cent.c)) AS BIGINT) AS d2
        |  FROM qv JOIN cent USING (j) GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT vec_id, label, clabel AS pred FROM (
        |    SELECT vec_id, label, clabel,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY d2 ASC, clabel ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |cells AS (
        |  SELECT label, pred, CAST(count(*) AS BIGINT) AS n
        |  FROM pred GROUP BY 1, 2),
        |rt AS (SELECT label, CAST(sum(n) AS BIGINT) AS n_label
        |       FROM cells GROUP BY 1)
        |SELECT label, pred, n, label = pred AS is_correct,
        |       CAST(n AS DOUBLE) / CAST(n_label AS DOUBLE) AS recall_share
        |FROM cells JOIN rt USING (label)
        |ORDER BY label, pred""".stripMargin,

    // Order-1 Markov next-event baseline: argmax next type per prev type
    // ((cnt DESC, type ASC) — the min-struct device), exact-count accuracy.
    "q_markov_acc" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
        |  FROM events),
        |nx AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts_ms, event_id) AS next_type
        |  FROM e),
        |pairs AS (
        |  SELECT event_type AS prev_type, next_type,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |pred AS (
        |  SELECT prev_type, next_type AS pred_next FROM (
        |    SELECT prev_type, next_type,
        |           row_number() OVER (PARTITION BY prev_type
        |                              ORDER BY cnt DESC, next_type ASC) AS rn
        |    FROM pairs) WHERE rn = 1)
        |SELECT p.prev_type, d.pred_next,
        |       CAST(sum(p.cnt) AS BIGINT) AS n_pairs,
        |       CAST(sum(CASE WHEN p.next_type = d.pred_next THEN p.cnt
        |                     ELSE 0 END) AS BIGINT) AS n_correct,
        |       CAST(sum(CASE WHEN p.next_type = d.pred_next THEN p.cnt
        |                     ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(p.cnt) AS DOUBLE) AS accuracy
        |FROM pairs p JOIN pred d USING (prev_type)
        |GROUP BY 1, 2
        |ORDER BY p.prev_type""".stripMargin,

    // Minimum detectable effect: Grubbs sufficient-stats tree + the
    // pinned 2.8 = z_{0.025}+z_{0.20} literal.
    "q_mde" ->
      """WITH s AS (
        |  SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT) AS HUGEINT)) AS s,
        |         sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT) AS HUGEINT) *
        |             CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT) AS HUGEINT)) AS q
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |t AS (
        |  SELECT segment, n,
        |         CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |         sqrt((CAST(CAST(q AS VARCHAR) AS DOUBLE) -
        |               CAST(CAST(s AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(s AS VARCHAR) AS DOUBLE) /
        |               CAST(n AS DOUBLE)) /
        |              (CAST(n AS DOUBLE) - 1.0)) AS sd
        |  FROM s),
        |m AS (
        |  SELECT segment, n, mu, sd,
        |         2.8 * sd * sqrt(2.0 / CAST(n AS DOUBLE)) AS mde_cents
        |  FROM t)
        |SELECT segment, n, mu / 100.0 AS mean_price, sd / 100.0 AS sd_price,
        |       mde_cents / 100.0 AS mde, mde_cents / mu AS mde_rel
        |FROM m
        |ORDER BY segment""".stripMargin,

    // KMV sketch union: per-source bottom-k over the 52-bit md5 uniform,
    // merged sketch = bottom-k of the two sketches' union.
    "q_kmv_union" ->
      """WITH d AS (
        |  SELECT source, md5(text) AS fp FROM documents
        |  WHERE source IN ('src1', 'src2')),
        |h AS (
        |  SELECT DISTINCT source, fp,
        |         CAST('0x' || substr(fp, 1, 13) AS BIGINT) /
        |           4503599627370496.0 AS h
        |  FROM d),
        |ska AS (SELECT fp, h FROM h WHERE source = 'src1'
        |        ORDER BY h, fp LIMIT 16),
        |skb AS (SELECT fp, h FROM h WHERE source = 'src2'
        |        ORDER BY h, fp LIMIT 16),
        |mrg AS (SELECT DISTINCT fp, h FROM
        |          (SELECT * FROM ska UNION ALL SELECT * FROM skb)
        |        ORDER BY h, fp LIMIT 16),
        |ea AS (SELECT max(h) AS h_a, CAST(count(*) AS BIGINT) AS k_a FROM ska),
        |eb AS (SELECT max(h) AS h_b, CAST(count(*) AS BIGINT) AS k_b FROM skb),
        |eu AS (SELECT max(h) AS h_u, CAST(count(*) AS BIGINT) AS k_union
        |       FROM mrg),
        |tr AS (SELECT CAST(count(DISTINCT fp) AS BIGINT) AS true_union FROM d)
        |SELECT k_union,
        |       (CAST(k_a AS DOUBLE) - 1.0) / h_a AS est_a,
        |       (CAST(k_b AS DOUBLE) - 1.0) / h_b AS est_b,
        |       (CAST(k_union AS DOUBLE) - 1.0) / h_u AS est_union,
        |       true_union,
        |       ((CAST(k_union AS DOUBLE) - 1.0) / h_u -
        |        CAST(true_union AS DOUBLE)) /
        |         CAST(true_union AS DOUBLE) AS rel_err
        |FROM eu CROSS JOIN ea CROSS JOIN eb CROSS JOIN tr""".stripMargin,

    // Burrows' delta: 10⁹-grid relative frequencies, exact per-term
    // moments, z fixed tree, floor-witness |Δz| sums.
    "q_stylometry" ->
      """WITH st AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
        |      FROM st GROUP BY 1, 2),
        |top AS (SELECT term FROM (
        |          SELECT term, sum(c) AS tc FROM c GROUP BY 1
        |          ORDER BY tc DESC, term ASC LIMIT 20)),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
        |rq AS (
        |  SELECT tot.source, top.term,
        |         CAST((COALESCE(c.c, 0) * 1000000000) // tot.t AS BIGINT) AS rq
        |  FROM tot CROSS JOIN top
        |       LEFT JOIN c ON c.source = tot.source AND c.term = top.term),
        |pt AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(rq) AS BIGINT) AS s,
        |         sum(CAST(rq AS HUGEINT) * rq) AS qq
        |  FROM rq GROUP BY 1),
        |pv AS (
        |  SELECT term, n, s,
        |         CAST(n AS HUGEINT) * qq - CAST(s AS HUGEINT) * s AS vnum
        |  FROM pt),
        |z AS (
        |  SELECT rq.source, rq.term,
        |         CAST(CAST(CAST(p.n AS HUGEINT) * rq.rq - p.s AS VARCHAR)
        |              AS DOUBLE) /
        |           sqrt(CAST(CAST(p.vnum AS VARCHAR) AS DOUBLE)) AS z
        |  FROM rq JOIN pv p ON rq.term = p.term
        |  WHERE p.vnum > 0)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(count(*) AS BIGINT) AS n_terms,
        |       CAST(sum(CAST(floor(abs(a.z - b.z) * 1000000.0) AS BIGINT))
        |            AS BIGINT) AS delta_e6,
        |       CAST(sum(CAST(floor(abs(a.z - b.z) * 1000000.0) AS BIGINT))
        |            AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE) AS delta
        |FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
        |GROUP BY 1, 2
        |ORDER BY src_a, src_b""".stripMargin,

    // Grid-density clustering: 11×11 cell counts, cross-multiplied core
    // test, 8-offset adjacency, recursive min-label components.
    "q_grid_cluster" ->
      """WITH RECURSIVE pts AS (
        |  SELECT CAST(floor((CAST(embedding[1] AS DOUBLE) + 1) * 5)
        |              AS BIGINT) AS gx,
        |         CAST(floor((CAST(embedding[2] AS DOUBLE) + 1) * 5)
        |              AS BIGINT) AS gy
        |  FROM embeddings),
        |cells AS (SELECT gx, gy, CAST(count(*) AS BIGINT) AS cnt
        |          FROM pts GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_pts,
        |               CAST(count(*) AS BIGINT) AS n_cells FROM cells),
        |core AS (
        |  SELECT gx, gy, cnt, gx * 100 + gy AS id
        |  FROM cells CROSS JOIN tot
        |  WHERE cnt * n_cells >= 2 * n_pts),
        |off AS (
        |  SELECT dx.dx, dy.dy
        |  FROM (SELECT unnest(range(-1, 2)) AS dx) dx,
        |       (SELECT unnest(range(-1, 2)) AS dy) dy
        |  WHERE NOT (dx.dx = 0 AND dy.dy = 0)),
        |e AS (
        |  SELECT a.id AS u, b.id AS v
        |  FROM core a CROSS JOIN off
        |       JOIN core b ON b.gx = a.gx + off.dx AND b.gy = a.gy + off.dy
        |  WHERE a.id < b.id),
        |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        |reach(node, r) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |  UNION
        |  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node),
        |lab AS (SELECT node AS id, min(r) AS comp FROM reach GROUP BY 1),
        |cl AS (
        |  SELECT COALESCE(l.comp, c.id) AS cluster_id, c.cnt
        |  FROM core c LEFT JOIN lab l ON c.id = l.id),
        |summary AS (
        |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
        |         CAST(sum(cnt) AS BIGINT) AS n_points
        |  FROM cl GROUP BY 1),
        |noise AS (
        |  SELECT CAST(-1 AS BIGINT) AS cluster_id,
        |         CAST(count(*) AS BIGINT) AS n_cells,
        |         CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS n_points
        |  FROM cells CROSS JOIN tot
        |  WHERE cnt * n_cells < 2 * n_pts)
        |SELECT * FROM summary
        |UNION ALL
        |SELECT * FROM noise WHERE n_cells > 0
        |ORDER BY cluster_id""".stripMargin,

    "q_textrank" -> textrankOracleSql,
    "q_mmr" -> mmrOracleSql,

    // Simplified-Soundex collision groups: the identical translate +
    // six-pass run-collapse + zero-strip chain (RE2 has no backrefs, so
    // the collapse is one literal regexp per digit class in both engines).
    "q_phonetic" ->
      """WITH terms AS (
        |  SELECT DISTINCT term FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents
        |    UNION ALL
        |    SELECT unnest(string_split(p_name, ' ')) AS term FROM part)),
        |k AS (
        |  SELECT term, upper(term) AS up,
        |         translate(upper(term),
        |           'AEIOUYHWBFPVCGJKQSXZDTLMNR',
        |           '00000000111122222222334556') AS codes
        |  FROM terms),
        |c AS (
        |  SELECT term, up,
        |         regexp_replace(regexp_replace(regexp_replace(
        |           regexp_replace(regexp_replace(regexp_replace(
        |             codes, '11+', '1', 'g'), '22+', '2', 'g'),
        |             '33+', '3', 'g'), '44+', '4', 'g'),
        |             '55+', '5', 'g'), '66+', '6', 'g') AS collapsed
        |  FROM k),
        |ky AS (
        |  SELECT term,
        |         substr(up, 1, 1) ||
        |           rpad(substr(translate(substr(collapsed, 2, 1000), '0', ''),
        |                       1, 3), 3, '0') AS code
        |  FROM c)
        |SELECT code, CAST(count(*) AS BIGINT) AS n_terms,
        |       string_agg(term, ',' ORDER BY term) AS terms_csv
        |FROM ky GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY code""".stripMargin,

    // HBOS outliers: grid bins over the first 4 dims, exact per-(dim,bin)
    // counts, rarity = exact integer product (monotone stand-in for the
    // log-density sum), string witness for the hugeint/decimal cell.
    "q_hbos" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |b AS MATERIALIZED (
        |  SELECT vec_id, d, CAST(floor((v[d] + 1) * 5) AS BIGINT) AS bin
        |  FROM e, unnest(range(1, 5)) AS r(d)),
        |h AS MATERIALIZED (
        |  SELECT d, bin, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1, 2),
        |p AS (
        |  SELECT b.vec_id,
        |         max(CASE WHEN b.d = 1 THEN h.cnt END) AS c1,
        |         max(CASE WHEN b.d = 2 THEN h.cnt END) AS c2,
        |         max(CASE WHEN b.d = 3 THEN h.cnt END) AS c3,
        |         max(CASE WHEN b.d = 4 THEN h.cnt END) AS c4
        |  FROM b JOIN h ON b.d = h.d AND b.bin = h.bin
        |  GROUP BY 1),
        |r AS (
        |  SELECT vec_id, c1, c2, c3, c4,
        |         CAST(c1 AS HUGEINT) * c2 * c3 * c4 AS rarity
        |  FROM p)
        |SELECT vec_id, c1, c2, c3, c4, CAST(rarity AS VARCHAR) AS rarity
        |FROM r ORDER BY r.rarity ASC, vec_id ASC LIMIT 20""".stripMargin,

    // NDCG@10: exact cent relevance, 10x10 rank joins, the fixed
    // 10-term discount tree with pinned 1/log2(i+1) literals.
    "q_ndcg" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey AS custkey,
        |         CAST(sum(CASE WHEN o_orderdate < DATE '1998-01-01'
        |           THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS pred,
        |         CAST(sum(CASE WHEN o_orderdate >= DATE '1998-01-01'
        |           THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS rel
        |  FROM orders GROUP BY 1),
        |pt AS MATERIALIZED (
        |  SELECT custkey, pred, rel FROM per
        |  ORDER BY pred DESC, custkey ASC LIMIT 10),
        |pr AS (
        |  SELECT a.custkey, a.rel, CAST(count(b.bc) + 1 AS BIGINT) AS rk
        |  FROM pt a LEFT JOIN (SELECT pred AS bo, custkey AS bc FROM pt) b
        |    ON b.bo > a.pred OR (b.bo = a.pred AND b.bc < a.custkey)
        |  GROUP BY 1, 2),
        |it AS MATERIALIZED (
        |  SELECT custkey, rel FROM per
        |  ORDER BY rel DESC, custkey ASC LIMIT 10),
        |ir AS (
        |  SELECT a.custkey, a.rel, CAST(count(b.bc) + 1 AS BIGINT) AS rk
        |  FROM it a LEFT JOIN (SELECT rel AS bo, custkey AS bc FROM it) b
        |    ON b.bo > a.rel OR (b.bo = a.rel AND b.bc < a.custkey)
        |  GROUP BY 1, 2),
        |-- integer-pinned discounts (scale 10^16): exact HUGEINT weighted
        |-- sum, no float addition chain (FMA contraction diverged 1 ulp
        |-- from Spark at the 10x corpus); only the closing divisions are IEEE
        |d AS (SELECT
        |  CAST(COALESCE(max(CASE WHEN rk = 1 THEN rel END), 0) AS HUGEINT) * 10000000000000000
        |  + CAST(COALESCE(max(CASE WHEN rk = 2 THEN rel END), 0) AS HUGEINT) * 6309297535714575
        |  + CAST(COALESCE(max(CASE WHEN rk = 3 THEN rel END), 0) AS HUGEINT) * 5000000000000000
        |  + CAST(COALESCE(max(CASE WHEN rk = 4 THEN rel END), 0) AS HUGEINT) * 4306765580733931
        |  + CAST(COALESCE(max(CASE WHEN rk = 5 THEN rel END), 0) AS HUGEINT) * 3868528072345416
        |  + CAST(COALESCE(max(CASE WHEN rk = 6 THEN rel END), 0) AS HUGEINT) * 3562071871080222
        |  + CAST(COALESCE(max(CASE WHEN rk = 7 THEN rel END), 0) AS HUGEINT) * 3333333333333333
        |  + CAST(COALESCE(max(CASE WHEN rk = 8 THEN rel END), 0) AS HUGEINT) * 3154648767857288
        |  + CAST(COALESCE(max(CASE WHEN rk = 9 THEN rel END), 0) AS HUGEINT) * 3010299956639812
        |  + CAST(COALESCE(max(CASE WHEN rk = 10 THEN rel END), 0) AS HUGEINT) * 2890648263178879
        |  AS dcg_w FROM pr),
        |i AS (SELECT
        |  CAST(COALESCE(max(CASE WHEN rk = 1 THEN rel END), 0) AS HUGEINT) * 10000000000000000
        |  + CAST(COALESCE(max(CASE WHEN rk = 2 THEN rel END), 0) AS HUGEINT) * 6309297535714575
        |  + CAST(COALESCE(max(CASE WHEN rk = 3 THEN rel END), 0) AS HUGEINT) * 5000000000000000
        |  + CAST(COALESCE(max(CASE WHEN rk = 4 THEN rel END), 0) AS HUGEINT) * 4306765580733931
        |  + CAST(COALESCE(max(CASE WHEN rk = 5 THEN rel END), 0) AS HUGEINT) * 3868528072345416
        |  + CAST(COALESCE(max(CASE WHEN rk = 6 THEN rel END), 0) AS HUGEINT) * 3562071871080222
        |  + CAST(COALESCE(max(CASE WHEN rk = 7 THEN rel END), 0) AS HUGEINT) * 3333333333333333
        |  + CAST(COALESCE(max(CASE WHEN rk = 8 THEN rel END), 0) AS HUGEINT) * 3154648767857288
        |  + CAST(COALESCE(max(CASE WHEN rk = 9 THEN rel END), 0) AS HUGEINT) * 3010299956639812
        |  + CAST(COALESCE(max(CASE WHEN rk = 10 THEN rel END), 0) AS HUGEINT) * 2890648263178879
        |  AS idcg_w FROM ir),
        |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM pt
        |      WHERE custkey IN (SELECT custkey FROM it))
        |SELECT CAST(CAST(d.dcg_w AS VARCHAR) AS DOUBLE) / 1e16 AS dcg,
        |       CAST(CAST(i.idcg_w AS VARCHAR) AS DOUBLE) / 1e16 AS idcg,
        |       CAST(CAST(d.dcg_w AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(i.idcg_w AS VARCHAR) AS DOUBLE) AS ndcg,
        |       h.n_hits
        |FROM d CROSS JOIN i CROSS JOIN h""".stripMargin,

    // Split-conformal: train-fold segment means (VARCHAR-routed hugeint
    // cast), exact rank selection of the 90% calibration residual,
    // exact-count test coverage.
    "q_conformal" ->
      """WITH base AS MATERIALIZED (
        |  SELECT o_orderkey, c_mktsegment AS segment,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         o_orderkey % 3 AS fold
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |mu AS (
        |  SELECT segment,
        |         CAST(CAST(sum(CAST(v AS HUGEINT)) AS VARCHAR) AS DOUBLE) /
        |           CAST(count(*) AS DOUBLE) AS mu
        |  FROM base WHERE fold = 0 GROUP BY 1),
        |cal AS (
        |  SELECT b.o_orderkey, abs(CAST(b.v AS DOUBLE) - m.mu) AS r
        |  FROM base b JOIN mu m USING (segment) WHERE b.fold = 1),
        |rk AS (
        |  SELECT r, row_number() OVER (ORDER BY r, o_orderkey) AS rk,
        |         count(*) OVER () AS n
        |  FROM cal),
        |qh AS (
        |  SELECT r AS q_hat, CAST(n AS BIGINT) AS n_cal
        |  -- ceiling quantile index (finite-sample-valid split conformal)
        |  FROM rk WHERE rk = (9 * (n + 1) + 9) // 10),
        |tst AS (
        |  SELECT abs(CAST(b.v AS DOUBLE) - m.mu) AS r
        |  FROM base b JOIN mu m USING (segment) WHERE b.fold = 2)
        |SELECT q.n_cal, q.q_hat, CAST(count(*) AS BIGINT) AS n_test,
        |       CAST(sum(CASE WHEN t.r <= q.q_hat THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_covered,
        |       CAST(sum(CASE WHEN t.r <= q.q_hat THEN 1 ELSE 0 END)
        |            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
        |FROM tst t CROSS JOIN qh q
        |GROUP BY 1, 2""".stripMargin,

    // Friedman across three eras blocked by nation: float-free ranks via
    // cross-multiplied exact sums (HUGEINT), k=3 closed form.
    "q_friedman" ->
      """WITH base AS (
        |  SELECT c.c_nationkey AS nation,
        |         CASE WHEN o.o_orderdate < DATE '1997-01-01' THEN 1
        |              WHEN o.o_orderdate < DATE '1999-01-01' THEN 2
        |              ELSE 3 END AS era,
        |         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |per0 AS (
        |  SELECT nation,
        |         sum(CASE WHEN era = 1 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s1,
        |         sum(CASE WHEN era = 1 THEN CAST(1 AS HUGEINT) ELSE 0 END) AS n1,
        |         sum(CASE WHEN era = 2 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s2,
        |         sum(CASE WHEN era = 2 THEN CAST(1 AS HUGEINT) ELSE 0 END) AS n2,
        |         sum(CASE WHEN era = 3 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s3,
        |         sum(CASE WHEN era = 3 THEN CAST(1 AS HUGEINT) ELSE 0 END) AS n3
        |  FROM base GROUP BY 1),
        |per AS (SELECT * FROM per0 WHERE n1 > 0 AND n2 > 0 AND n3 > 0),
        |r AS (
        |  SELECT
        |    1 + (CASE WHEN s2*n1 > s1*n2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN s3*n1 > s1*n3 THEN 1 ELSE 0 END) AS r1,
        |    1 + (CASE WHEN s1*n2 > s2*n1 OR s1*n2 = s2*n1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN s3*n2 > s2*n3 THEN 1 ELSE 0 END) AS r2,
        |    1 + (CASE WHEN s1*n3 > s3*n1 OR s1*n3 = s3*n1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN s2*n3 > s3*n2 OR s2*n3 = s3*n2 THEN 1 ELSE 0 END) AS r3
        |  FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(r1) AS BIGINT) AS rank_sum1,
        |       CAST(sum(r2) AS BIGINT) AS rank_sum2,
        |       CAST(sum(r3) AS BIGINT) AS rank_sum3,
        |       CAST(sum(r1)*sum(r1) + sum(r2)*sum(r2) + sum(r3)*sum(r3)
        |            AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         - CAST(12 * count(*) AS DOUBLE) AS q
        |FROM r""".stripMargin,

    // Cochran's Q, k=3 closed form: exact column totals and row-sum
    // moments from one per-order flag reduction, one terminal division.
    "q_cochran_q" ->
      """WITH flags AS (
        |  SELECT l_orderkey,
        |         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x1,
        |         max(CASE WHEN CAST(l_discount AS DECIMAL(18,6)) >
        |             CAST('0.05' AS DECIMAL(18,6)) THEN 1 ELSE 0 END) AS x2,
        |         max(CASE WHEN CAST(l_quantity AS DECIMAL(18,2)) >=
        |             CAST('30' AS DECIMAL(18,2)) THEN 1 ELSE 0 END) AS x3
        |  FROM lineitem GROUP BY 1),
        |agg AS (
        |  SELECT CAST(sum(x1) AS BIGINT) AS c1, CAST(sum(x2) AS BIGINT) AS c2,
        |         CAST(sum(x3) AS BIGINT) AS c3,
        |         CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sum_r2
        |  FROM flags),
        |w AS (SELECT c1, c2, c3, sum_r2, c1 + c2 + c3 AS t FROM agg)
        |SELECT c1, c2, c3, sum_r2,
        |       CAST(2 * (3 * (c1*c1 + c2*c2 + c3*c3) - t*t) AS BIGINT) AS q_num,
        |       CAST(3 * t - sum_r2 AS BIGINT) AS q_den,
        |       CASE WHEN 3 * t - sum_r2 > 0
        |            THEN CAST(2 * (3 * (c1*c1 + c2*c2 + c3*c3) - t*t) AS DOUBLE)
        |                 / CAST(3 * t - sum_r2 AS DOUBLE) END AS q
        |FROM w""".stripMargin,

    // Decision stump on the price-decile split: exact prefix counts off
    // the calibration decile frame, score = sum of two exact-ratio
    // divisions, argmax (score DESC, d ASC).
    "q_stump" ->
      """WITH r AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |           GROUP BY 1),
        |lab AS (
        |  SELECT o.o_orderkey,
        |         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
        |  FROM orders o LEFT JOIN r ON o.o_orderkey = r.l_orderkey),
        |rk AS (
        |  SELECT y, row_number() OVER (ORDER BY v DESC, o_orderkey ASC) AS r,
        |         count(*) OVER () AS tot
        |  FROM lab),
        |bd AS MATERIALIZED (
        |  SELECT ((r - 1) * 10) // tot AS decile,
        |         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        |  FROM rk GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |             CAST(sum(pos) AS BIGINT) AS pp FROM bd),
        |cand AS (
        |  SELECT s.d, CAST(sum(b.n) AS BIGINT) AS n_left,
        |         CAST(sum(b.pos) AS BIGINT) AS pos_left
        |  FROM (SELECT unnest(range(0, 9)) AS d) s JOIN bd b ON b.decile <= s.d
        |  GROUP BY 1),
        |sc AS (
        |  SELECT c.d, c.n_left, c.pos_left,
        |         t.nn - c.n_left AS n_right, t.pp - c.pos_left AS pos_right
        |  FROM cand c CROSS JOIN t),
        |scored AS MATERIALIZED (
        |  SELECT d, n_left, pos_left, n_right, pos_right,
        |         CAST(pos_left*pos_left + (n_left-pos_left)*(n_left-pos_left)
        |              AS DOUBLE) / CAST(n_left AS DOUBLE)
        |         + CAST(pos_right*pos_right +
        |                (n_right-pos_right)*(n_right-pos_right)
        |              AS DOUBLE) / CAST(n_right AS DOUBLE) AS score
        |  FROM sc),
        |best AS (SELECT d AS bd FROM scored ORDER BY score DESC, d ASC LIMIT 1)
        |SELECT s.d, s.n_left, s.pos_left, s.n_right, s.pos_right, s.score,
        |       s.d = b.bd AS is_best
        |FROM scored s CROSS JOIN best b
        |ORDER BY s.d""".stripMargin,

    // Centroid silhouette: exact grid distances (shared with
    // q_centroid_classify), s = one division of exact longs, per-label
    // mean via the floor witness.
    "q_silhouette" ->
      """WITH qv AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS j,
        |         CAST(floor((CAST(x AS DOUBLE) + 1) * 10000) AS BIGINT) AS q
        |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
        |               generate_subscripts(embedding, 1) AS dim
        |        FROM embeddings)),
        |cent AS (
        |  SELECT label AS clabel, j, CAST(sum(q) // count(*) AS BIGINT) AS c
        |  FROM qv GROUP BY 1, 2),
        |dist AS MATERIALIZED (
        |  SELECT qv.vec_id, qv.label, cent.clabel,
        |         CAST(sum((qv.q - cent.c) * (qv.q - cent.c)) AS BIGINT) AS d2
        |  FROM qv JOIN cent USING (j) GROUP BY 1, 2, 3),
        |a AS (SELECT vec_id, label, d2 AS a2 FROM dist WHERE clabel = label),
        |b AS (SELECT vec_id, CAST(min(d2) AS BIGINT) AS b2 FROM dist
        |      WHERE clabel <> label GROUP BY 1),
        |s AS (
        |  SELECT a.label,
        |         CASE WHEN greatest(a.a2, b.b2) = 0 THEN 0.0
        |              ELSE CAST(b.b2 - a.a2 AS DOUBLE) /
        |                   CAST(greatest(a.a2, b.b2) AS DOUBLE) END AS s
        |  FROM a JOIN b USING (vec_id))
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN s > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |       CAST(sum(CAST(floor(s * 1000000.0) AS BIGINT)) AS BIGINT)
        |         AS s_witness,
        |       CAST(sum(CAST(floor(s * 1000000.0) AS BIGINT)) AS DOUBLE) /
        |         (1000000.0 * CAST(count(*) AS DOUBLE)) AS mean_s
        |FROM s GROUP BY 1
        |ORDER BY label""".stripMargin,

    "q_kcenter" -> kcenterOracleSql,
    "q_sssp" -> ssspOracleSql,

    // CDC chunking profile: md5-trigram boundary test, exclusive running
    // boundary counts per doc (0-based positions both engines).
    "q_cdc_chunks" ->
      """WITH toks AS (
        |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |  FROM documents),
        |flag AS (
        |  SELECT source, doc_id, pos,
        |         CASE WHEN pos >= 2 AND
        |           CAST('0x' || substr(md5(lag(tok, 2) OVER w || ' ' ||
        |             lag(tok, 1) OVER w || ' ' || tok), 1, 8) AS BIGINT)
        |             % 32 = 0
        |           THEN 1 ELSE 0 END AS cut
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |cidx AS (
        |  SELECT source, doc_id,
        |         COALESCE(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS chunk_idx
        |  FROM flag),
        |chunks AS (
        |  SELECT source, doc_id, chunk_idx, CAST(count(*) AS BIGINT) AS len
        |  FROM cidx GROUP BY 1, 2, 3)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(len) AS BIGINT) AS n_tokens,
        |       CAST(max(len) AS BIGINT) AS max_len,
        |       CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_len
        |FROM chunks GROUP BY 1
        |ORDER BY source""".stripMargin,

    // HHI concentration: exact cent revenues, numerator/denominator as
    // exact wide integers, VARCHAR-routed casts for the >2^53 squares.
    "q_hhi" ->
      """WITH rev AS (
        |  SELECT r.r_name AS region, l.l_suppkey,
        |         CAST(sum(CAST(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |           * 100 AS BIGINT) AS HUGEINT)) AS BIGINT) AS rev
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT region, CAST(count(*) AS BIGINT) AS n_suppliers,
        |         sum(CAST(rev AS HUGEINT)) AS tot,
        |         sum(CAST(rev AS HUGEINT) * rev) AS sumsq,
        |         CAST(max(rev) AS BIGINT) AS max_rev
        |  FROM rev GROUP BY 1)
        |SELECT region, n_suppliers,
        |       CAST(CAST(sumsq AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(tot * tot AS VARCHAR) AS DOUBLE) AS hhi,
        |       CAST(max_rev AS DOUBLE) /
        |         CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS top_share
        |FROM agg
        |ORDER BY region""".stripMargin,

    // Mergeable-histogram median vs the exact rank-selected median.
    "q_hist_median" ->
      """WITH d AS (SELECT doc_id, n_chars, source FROM documents),
        |b AS (SELECT CAST(min(n_chars) AS BIGINT) AS lo,
        |             CAST(max(n_chars) AS BIGINT) AS hi FROM d),
        |ps AS (
        |  SELECT source, ((n_chars - lo) * 20) // (hi - lo + 1) AS bin
        |  FROM d CROSS JOIN b),
        |psh AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS cnt
        |        FROM ps GROUP BY 1, 2),
        |m AS MATERIALIZED (
        |  SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM psh GROUP BY 1),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM m),
        |cum AS (
        |  SELECT a.bin, a.cnt, CAST(sum(x.c2) AS BIGINT) AS cum
        |  FROM m a JOIN (SELECT bin AS b2, cnt AS c2 FROM m) x
        |    ON x.b2 <= a.bin
        |  GROUP BY 1, 2),
        |mb AS (
        |  SELECT bin AS med_bin, cnt AS bin_count FROM (
        |    SELECT c.bin, c.cnt FROM cum c CROSS JOIN nn
        |    WHERE c.cum >= (nn.n + 1) // 2
        |    ORDER BY c.bin ASC LIMIT 1)),
        |ex AS (
        |  SELECT n_chars AS exact_median, n FROM (
        |    SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) AS r,
        |           count(*) OVER () AS n
        |    FROM d) rk WHERE r = (n + 1) // 2)
        |SELECT CAST(ex.n AS BIGINT) AS n, (ex.n + 1) // 2 AS k, mb.med_bin,
        |       mb.bin_count, ex.exact_median,
        |       ((ex.exact_median - b.lo) * 20) // (b.hi - b.lo + 1) = mb.med_bin
        |         AS in_bin
        |FROM ex CROSS JOIN mb CROSS JOIN b""".stripMargin,

    // ANN recall audit: portable sign-band bucket (dims 1-8 sign bits),
    // both round-6 top-10 arms replayed, exact-count recall.
    "q_ann_recall" ->
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
        |            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
        |            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
        |            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
        |            + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
        |            + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
        |            + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
        |            + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END)
        |           AS BIGINT) AS bkey
        |  FROM embeddings),
        |q AS (SELECT v AS qv, bkey AS qkey FROM e WHERE vec_id = 0),
        |ex AS MATERIALIZED (
        |  SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS s
        |  FROM e, q WHERE e.vec_id <> 0
        |  ORDER BY s DESC, e.vec_id ASC LIMIT 10),
        |bucket AS MATERIALIZED (
        |  SELECT e.vec_id, e.v, q.qv FROM e JOIN q ON e.bkey = q.qkey
        |  WHERE e.vec_id <> 0),
        |ap AS MATERIALIZED (
        |  SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS s
        |  FROM bucket ORDER BY s DESC, vec_id ASC LIMIT 10),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM bucket),
        |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM ap
        |      WHERE vec_id IN (SELECT vec_id FROM ex))
        |SELECT nc.n_candidates, CAST(10 AS BIGINT) AS k, h.n_hits,
        |       CAST(h.n_hits AS DOUBLE) / 10.0 AS recall
        |FROM nc CROSS JOIN h""".stripMargin,

    "q_walks" -> walksOracleSql,

    // RA link prediction: integer 10^6 div deg weights, df-capped
    // wedges, existing edges anti-joined away.
    "q_link_pred" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs)),
        |deg AS (SELECT a AS z, CAST(count(*) AS BIGINT) AS deg
        |        FROM edges GROUP BY 1),
        |nbrs AS MATERIALIZED (
        |  SELECT e.a AS z, e.b AS nbr, 1000000 // d.deg AS w
        |  FROM edges e JOIN deg d ON e.a = d.z WHERE d.deg <= 64),
        |sc AS (
        |  SELECT x.nbr AS u, y.nbr AS v, CAST(sum(x.w) AS BIGINT) AS ra_score,
        |         CAST(count(*) AS BIGINT) AS n_common
        |  FROM nbrs x JOIN nbrs y ON x.z = y.z AND x.nbr < y.nbr
        |  GROUP BY 1, 2)
        |SELECT u, v, ra_score, n_common
        |FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM edges e
        |                  WHERE e.a = sc.u AND e.b = sc.v)
        |ORDER BY ra_score DESC, u ASC, v ASC LIMIT 20""".stripMargin,

    // CUPED: exact moment sums, cleared-denominator cov/var numerators,
    // theta and rho^2 as fixed IEEE trees over VARCHAR-routed casts.
    "q_cuped" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         sum(CASE WHEN o_orderdate < DATE '1998-01-01'
        |           THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           ELSE 0 END) AS x,
        |         sum(CASE WHEN o_orderdate >= DATE '1998-01-01'
        |           THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           ELSE 0 END) AS y
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx,
        |         sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM per),
        |t AS (
        |  SELECT n,
        |         CAST(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS VARCHAR)
        |              AS DOUBLE) AS cov_num,
        |         CAST(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS VARCHAR)
        |              AS DOUBLE) AS varx_num,
        |         CAST(CAST(CAST(n AS HUGEINT) * syy - sy * sy AS VARCHAR)
        |              AS DOUBLE) AS vary_num
        |  FROM m)
        |SELECT n, cov_num / varx_num AS theta,
        |       cov_num * cov_num / (varx_num * vary_num) AS reduction
        |FROM t""".stripMargin,

    // Total-variation drift: cleared denominators, exact integer witness,
    // one terminal division.
    "q_tv_drift" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(sum(CASE WHEN o_orderdate < DATE '1998-01-01'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN o_orderdate >= DATE '1998-01-01'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
        |               CAST(sum(b) AS BIGINT) AS tb FROM cells),
        |w AS (
        |  SELECT c.priority,
        |         abs(CAST(c.a AS HUGEINT) * t.tb - CAST(c.b AS HUGEINT) * t.ta)
        |           AS w, t.ta, t.tb
        |  FROM cells c CROSS JOIN tot t)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells, ta, tb,
        |       CAST(sum(w) AS VARCHAR) AS tv_witness,
        |       CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(2 * CAST(ta AS HUGEINT) * tb AS VARCHAR) AS DOUBLE)
        |         AS tv
        |FROM w GROUP BY ta, tb""".stripMargin,

    "q_max_cover" -> maxCoverOracleSql,

    // Greedy knapsack under the 20% token budget: one-division ratios,
    // inclusive cumulative cost under the unique (ratio, doc_id) order.
    "q_budget_select" ->
      """WITH docs AS MATERIALIZED (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS cost,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |           AS v,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |           CAST(len(string_split(text, ' ')) AS DOUBLE) AS ratio
        |  FROM documents),
        |b AS (SELECT CAST(sum(cost) // 5 AS BIGINT) AS budget FROM docs),
        |cum AS (
        |  SELECT source, cost, v,
        |         sum(cost) OVER (ORDER BY ratio DESC, doc_id ASC) AS cum_cost
        |  FROM docs)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_selected,
        |       CAST(sum(cost) AS BIGINT) AS tokens_used,
        |       CAST(sum(v) AS BIGINT) AS value_sum
        |FROM cum CROSS JOIN b WHERE cum_cost <= budget
        |GROUP BY 1
        |ORDER BY source""".stripMargin,

    // Join-size planner witness: full-corpus sum-of-squares estimate plus
    // the bounded-subset estimate proven equal to the executed join.
    "q_join_size" ->
      """WITH li AS (SELECT l_partkey FROM lineitem),
        |f AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |      FROM li GROUP BY 1),
        |fe AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(max(c) AS BIGINT) AS max_key_cnt,
        |         CAST(sum(CAST(c AS HUGEINT) * c) AS VARCHAR) AS est_full
        |  FROM f),
        |sk AS (SELECT p_partkey FROM part WHERE p_size = 1),
        |sub AS MATERIALIZED (
        |  SELECT l.l_partkey FROM li l JOIN sk ON l.l_partkey = sk.p_partkey),
        |se AS (
        |  SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS est_sub
        |  FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |        FROM sub GROUP BY 1)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS actual_sub
        |      FROM sub x JOIN sub y ON x.l_partkey = y.l_partkey)
        |SELECT fe.n_keys, fe.max_key_cnt, fe.est_full, se.est_sub,
        |       a.actual_sub, se.est_sub = a.actual_sub AS est_exact
        |FROM fe CROSS JOIN se CROSS JOIN a""".stripMargin,

    // Kneser-Ney continuation counts over the bigram-type frame.
    "q_kn_counts" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bi AS MATERIALIZED (
        |  SELECT t[i] AS w1, t[i + 1] AS w2, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks, unnest(range(1, len(t))) AS r(i) GROUP BY 1, 2),
        |ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bi),
        |co AS (SELECT w2 AS word, CAST(count(*) AS BIGINT) AS n_cont
        |       FROM bi GROUP BY 1),
        |su AS (SELECT w1 AS word, CAST(count(*) AS BIGINT) AS n_succ
        |       FROM bi GROUP BY 1),
        |uni AS (
        |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS raw_cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1)
        |SELECT u.word, u.raw_cnt,
        |       CAST(COALESCE(co.n_cont, 0) AS BIGINT) AS n_cont,
        |       CAST(COALESCE(su.n_succ, 0) AS BIGINT) AS n_succ,
        |       CAST(COALESCE(co.n_cont, 0) AS DOUBLE) /
        |         CAST(ty.n_types AS DOUBLE) AS continuation_p,
        |       CAST(COALESCE(co.n_cont, 0) AS DOUBLE) /
        |         CAST(u.raw_cnt AS DOUBLE) AS ratio
        |FROM uni u LEFT JOIN co USING (word) LEFT JOIN su USING (word)
        |     CROSS JOIN ty
        |ORDER BY raw_cnt DESC, word ASC LIMIT 30""".stripMargin,

    // Positional-index phrase search, self-witnessed by the plain
    // n-gram count of the same bigram.
    "q_phrase_search" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents),
        |bg AS (
        |  SELECT t[i] || ' ' || t[i + 1] AS ngram,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks, unnest(range(1, len(t))) AS r(i) GROUP BY 1),
        |ph AS (SELECT ngram AS phrase, cnt AS witness_count FROM bg
        |       ORDER BY cnt DESC, ngram ASC LIMIT 1),
        |pos AS MATERIALIZED (
        |  SELECT doc_id, unnest(t) AS term,
        |         generate_subscripts(t, 1) - 1 AS pos
        |  FROM toks),
        |p1 AS (
        |  SELECT pos.doc_id, pos.pos, ph.phrase, ph.witness_count
        |  FROM pos CROSS JOIN ph
        |  WHERE pos.term = split_part(ph.phrase, ' ', 1)),
        |m AS (
        |  SELECT p1.* FROM p1
        |  JOIN pos p2 ON p1.doc_id = p2.doc_id AND p2.pos - 1 = p1.pos
        |  WHERE p2.term = split_part(p1.phrase, ' ', 2))
        |SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS total_occurrences, witness_count,
        |       CAST(count(*) AS BIGINT) = witness_count AS index_exact
        |FROM m GROUP BY phrase, witness_count""".stripMargin,

    "q_rendezvous" -> rendezvousOracleSql,
    "q_weak_labels" -> weakLabelsOracleSql,

    // Top-k precision/recall curve off the unique (score desc, key) rank;
    // every metric one division of exact longs.
    "q_pr_curve" ->
      """WITH lbl AS (
        |  SELECT o.o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
        |  FROM orders o LEFT JOIN (
        |    SELECT DISTINCT l_orderkey
        |    FROM lineitem WHERE l_returnflag = 'R') r
        |  ON o.o_orderkey = r.l_orderkey),
        |ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY v DESC, o_orderkey ASC)
        |              AS BIGINT) AS k, y
        |  FROM lbl),
        |tot AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos FROM ranked),
        |top AS (SELECT k, CAST(sum(y) OVER (ORDER BY k) AS BIGINT) AS tp
        |        FROM ranked WHERE k <= 50)
        |SELECT k, tp,
        |       CAST(tp AS DOUBLE) / CAST(k AS DOUBLE) AS "precision",
        |       CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) AS recall,
        |       CAST(2 * tp AS DOUBLE) / CAST(k + n_pos AS DOUBLE) AS f1
        |FROM top CROSS JOIN tot
        |ORDER BY k""".stripMargin,

    // Fleiss' kappa, exact-rational form: kappa = (A*E - C*B)/(B*(E - C))
    // with A = S - 3N, B = 6N, C = T1^2 + T0^2, E = 9N^2. VARCHAR-routed
    // HUGEINT->DOUBLE casts (the q_trend device).
    "q_fleiss" ->
      """WITH votes AS (
        |  SELECT (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END +
        |          CASE WHEN len(string_split(text, ' ')) >= 50
        |               THEN 1 ELSE 0 END +
        |          CASE WHEN contains(text, 'the') THEN 1 ELSE 0 END)
        |           AS n1
        |  FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_items,
        |         CAST(sum(n1 * n1 + (3 - n1) * (3 - n1)) AS BIGINT) AS s,
        |         CAST(sum(n1) AS BIGINT) AS t1
        |  FROM votes),
        |f AS (
        |  SELECT n_items, t1,
        |         CAST(s - 3 * n_items AS HUGEINT) AS a,
        |         CAST(6 * n_items AS HUGEINT) AS b,
        |         CAST(t1 AS HUGEINT) * t1 +
        |           CAST(3 * n_items - t1 AS HUGEINT) *
        |           (3 * n_items - t1) AS c,
        |         CAST(3 * n_items AS HUGEINT) *
        |           (3 * n_items) AS e
        |  FROM agg)
        |SELECT n_items, t1,
        |       CAST(CAST(a AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(b AS VARCHAR) AS DOUBLE) AS p_bar,
        |       CAST(CAST(c AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(e AS VARCHAR) AS DOUBLE) AS p_e,
        |       CAST(CAST(a * e - c * b AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(b * (e - c) AS VARCHAR) AS DOUBLE) AS kappa
        |FROM f""".stripMargin,

    // Participation ratio over integer-witnessed per-dim variances;
    // VARCHAR-routed HUGEINT->DOUBLE (var_num and sv^2 exceed 2^53).
    "q_effective_dim" ->
      """WITH vals AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
        |              AS BIGINT) AS q
        |  FROM embeddings),
        |per AS (
        |  SELECT CAST(dim AS BIGINT) AS dim,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS sq,
        |         sum(CAST(q AS HUGEINT) * q) AS sqq
        |  FROM vals GROUP BY 1),
        |lam AS (
        |  SELECT dim,
        |         CAST(floor(
        |           CAST(CAST(CAST(n AS HUGEINT) * sqq -
        |                     CAST(sq AS HUGEINT) * sq AS VARCHAR) AS DOUBLE)
        |           / CAST(n * (n - 1) AS DOUBLE)) AS BIGINT) AS lam
        |  FROM per),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS width,
        |         CAST(sum(lam) AS BIGINT) AS sv,
        |         sum(CAST(lam AS HUGEINT) * lam) AS svv,
        |         CAST(max(lam) AS BIGINT) AS mx
        |  FROM lam)
        |SELECT width, sv,
        |       CAST(CAST(CAST(sv AS HUGEINT) * sv AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(svv AS VARCHAR) AS DOUBLE) AS pr_dims,
        |       CAST(mx AS DOUBLE) / CAST(sv AS DOUBLE) AS top_share
        |FROM agg""".stripMargin,

    // Padding waste under arrival-order vs length-sorted batching;
    // exact token integers, one terminal division per strategy.
    "q_padding_waste" ->
      """WITH docs AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
        |           AS n_tok
        |  FROM documents),
        |arr AS (SELECT CAST(row_number() OVER (ORDER BY doc_id)
        |                    AS BIGINT) AS r, n_tok FROM docs),
        |srt AS (SELECT CAST(row_number() OVER (ORDER BY n_tok, doc_id)
        |                    AS BIGINT) AS r, n_tok FROM docs),
        |ab AS (SELECT (r - 1) // 16 AS batch, CAST(count(*) AS BIGINT)
        |                AS cnt,
        |              CAST(max(n_tok) AS BIGINT) AS mx,
        |              CAST(sum(n_tok) AS BIGINT) AS toks
        |       FROM arr GROUP BY 1),
        |sb AS (SELECT (r - 1) // 16 AS batch, CAST(count(*) AS BIGINT)
        |                AS cnt,
        |              CAST(max(n_tok) AS BIGINT) AS mx,
        |              CAST(sum(n_tok) AS BIGINT) AS toks
        |       FROM srt GROUP BY 1),
        |u AS (
        |  SELECT 'arrival' AS strategy, CAST(count(*) AS BIGINT)
        |           AS n_batches,
        |         CAST(sum(toks) AS BIGINT) AS total_tokens,
        |         CAST(sum(cnt * mx) AS BIGINT) AS padded_tokens
        |  FROM ab
        |  UNION ALL
        |  SELECT 'sorted', CAST(count(*) AS BIGINT),
        |         CAST(sum(toks) AS BIGINT), CAST(sum(cnt * mx) AS BIGINT)
        |  FROM sb)
        |SELECT strategy, n_batches, total_tokens, padded_tokens,
        |       padded_tokens - total_tokens AS waste_tokens,
        |       CAST(total_tokens AS DOUBLE) / CAST(padded_tokens AS DOUBLE)
        |         AS efficiency
        |FROM u ORDER BY strategy""".stripMargin,

    // Quantile normalization: within-source rank -> cross-source mean
    // length at that rank; exact longs, one division per rank.
    "q_quantile_norm" ->
      """WITH within AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(row_number() OVER (PARTITION BY source
        |                                 ORDER BY n_chars, doc_id)
        |              AS BIGINT) AS r
        |  FROM documents),
        |ref AS (
        |  SELECT r, CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) /
        |              CAST(count(*) AS DOUBLE) AS norm_len
        |  FROM within GROUP BY r)
        |SELECT source, r, doc_id, n_chars, norm_len
        |FROM within JOIN ref USING (r)
        |ORDER BY source, r""".stripMargin,

    // Benjamini-Hochberg step-up over per-brand 2x2 chi^2 p-proxies;
    // chi^2 exact integer fraction (VARCHAR-routed), BH on the
    // 25-row brand frame.
    "q_bh_fdr" ->
      """WITH cells AS (
        |  SELECT p_brand AS brand,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS c1,
        |               CAST(sum(b) AS BIGINT) AS c0,
        |               CAST(count(*) AS BIGINT) AS m FROM cells),
        |st AS (
        |  SELECT brand, a, b, m,
        |         CAST(CAST(CAST(c1 + c0 AS HUGEINT) *
        |                   (CAST(a AS HUGEINT) * (c0 - b) -
        |                    CAST(b AS HUGEINT) * (c1 - a)) *
        |                   (CAST(a AS HUGEINT) * (c0 - b) -
        |                    CAST(b AS HUGEINT) * (c1 - a)) AS VARCHAR)
        |              AS DOUBLE) /
        |         CAST(CAST(CAST(a + b AS HUGEINT) *
        |                   (c1 - a + c0 - b) * c1 * c0 AS VARCHAR)
        |              AS DOUBLE) AS chi2
        |  FROM cells CROSS JOIN tot),
        |p AS (
        |  SELECT brand, a, b, m, chi2,
        |         CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + chi2) AS p
        |  FROM st),
        |r AS (
        |  SELECT brand, a, b, chi2, p,
        |         CAST(row_number() OVER (ORDER BY p ASC, brand ASC)
        |              AS BIGINT) AS i,
        |         p * CAST(m AS DOUBLE) / CAST(row_number()
        |           OVER (ORDER BY p ASC, brand ASC) AS DOUBLE) AS padj_raw
        |  FROM p)
        |SELECT brand, a, b, chi2, p, i,
        |       min(padj_raw) OVER (ORDER BY i DESC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS padj,
        |       min(padj_raw) OVER (ORDER BY i DESC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         <= CAST(0.1 AS DOUBLE) AS reject
        |FROM r ORDER BY i""".stripMargin,

    // Holm-Bonferroni step-down over the same per-brand chi^2
    // p-proxies: padj = running max of min(1, (m-i+1)*p), FWER alpha
    // 0.05; shares the exact-integer chi^2 CTEs with q_bh_fdr.
    "q_holm" ->
      """WITH cells AS (
        |  SELECT p_brand AS brand,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS c1,
        |               CAST(sum(b) AS BIGINT) AS c0,
        |               CAST(count(*) AS BIGINT) AS m FROM cells),
        |st AS (
        |  SELECT brand, a, b, m,
        |         CAST(CAST(CAST(c1 + c0 AS HUGEINT) *
        |                   (CAST(a AS HUGEINT) * (c0 - b) -
        |                    CAST(b AS HUGEINT) * (c1 - a)) *
        |                   (CAST(a AS HUGEINT) * (c0 - b) -
        |                    CAST(b AS HUGEINT) * (c1 - a)) AS VARCHAR)
        |              AS DOUBLE) /
        |         CAST(CAST(CAST(a + b AS HUGEINT) *
        |                   (c1 - a + c0 - b) * c1 * c0 AS VARCHAR)
        |              AS DOUBLE) AS chi2
        |  FROM cells CROSS JOIN tot),
        |p AS (
        |  SELECT brand, a, b, m, chi2,
        |         CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + chi2) AS p
        |  FROM st),
        |r AS (
        |  SELECT brand, a, b, chi2, p,
        |         CAST(row_number() OVER (ORDER BY p ASC, brand ASC)
        |              AS BIGINT) AS i,
        |         least(CAST(1 AS DOUBLE),
        |               p * CAST(m - row_number()
        |                 OVER (ORDER BY p ASC, brand ASC) + 1
        |                 AS DOUBLE)) AS padj_raw
        |  FROM p)
        |SELECT brand, a, b, chi2, p, i,
        |       max(padj_raw) OVER (ORDER BY i ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS padj,
        |       max(padj_raw) OVER (ORDER BY i ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         <= CAST(0.05 AS DOUBLE) AS reject
        |FROM r ORDER BY i""".stripMargin,

    // Freeman degree centralization: n*dmax - sum(deg) over (n-1)(n-2),
    // exact longs until one division.
    "q_degree_central" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_suppkey AS a, -(o_custkey + 1) AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS node FROM pairs
        |        UNION ALL SELECT b FROM pairs)
        |  GROUP BY node),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |         CAST(sum(deg) AS BIGINT) AS sum_deg,
        |         CAST(max(deg) AS BIGINT) AS max_deg
        |  FROM deg)
        |SELECT n_nodes, sum_deg // 2 AS n_edges, max_deg,
        |       CAST(n_nodes * max_deg - sum_deg AS DOUBLE) /
        |         CAST((n_nodes - 1) * (n_nodes - 2) AS DOUBLE)
        |         AS centralization
        |FROM agg""".stripMargin,

    // LSH-banding blocking quality: candidates = raw band-bucket
    // collisions; truth = exact shingle Jaccard >= 1/2 (all-pairs
    // shingle join in the oracle; the Spark side uses the lossless
    // prefix filter). PC and RR one division each.
    "q_blocking_eval" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in generate_series(1, len(toks)-2)]))
        |               AS sh
        |      FROM t),
        |sig AS (SELECT doc_id,
        |               min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
        |               min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
        |               min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
        |               min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
        |        FROM s GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, md5(m0 || m1) AS bucket FROM sig
        |          UNION ALL SELECT doc_id, 1, md5(m2 || m3) FROM sig
        |          UNION ALL SELECT doc_id, 2, md5(m4 || m5) FROM sig
        |          UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM sig),
        |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |         FROM bands x JOIN bands y
        |           ON x.bucket = y.bucket AND x.band = y.band
        |              AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |          FROM s GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |                 CAST(count(*) AS BIGINT) AS i
        |          FROM s a JOIN s b
        |            ON a.sh = b.sh AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |truth AS (SELECT d1, d2
        |          FROM inter JOIN sizes s1 ON d1 = s1.doc_id
        |                     JOIN sizes s2 ON d2 = s2.doc_id
        |          WHERE 2 * i >= 1 * (s1.n + s2.n - i)),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_pairs FROM cand),
        |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM truth),
        |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
        |      FROM cand JOIN truth USING (d1, d2)),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT n_docs, (n_docs * (n_docs - 1)) // 2 AS total_pairs,
        |       n_cand_pairs, n_true_pairs, n_hit,
        |       CAST(n_hit AS DOUBLE) / CAST(n_true_pairs AS DOUBLE)
        |         AS pair_completeness,
        |       CAST((n_docs * (n_docs - 1)) // 2 - n_cand_pairs AS DOUBLE) /
        |         CAST((n_docs * (n_docs - 1)) // 2 AS DOUBLE)
        |         AS reduction_ratio
        |FROM nd CROSS JOIN c CROSS JOIN tr CROSS JOIN h""".stripMargin,

    // R/S table: integer running deviations devn = n*cum - i*S, R and
    // sigma one division (+ portable sqrt) each, floor-witnessed mean.
    "q_hurst_rs" ->
      """WITH daily AS (
        |  SELECT CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000
        |              AS BIGINT) AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, v,
        |             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS r
        |      FROM daily),
        |ws AS (SELECT unnest([8, 16, 32, 64]) AS w),
        |g AS (SELECT w, (r - 1) // w AS win, v,
        |             CAST(row_number() OVER (PARTITION BY w, ((r - 1) // w)
        |                                     ORDER BY r) AS BIGINT) AS i,
        |             CAST(sum(v) OVER (PARTITION BY w, ((r - 1) // w)
        |                               ORDER BY r
        |                               ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND CURRENT ROW) AS BIGINT) AS cv
        |      FROM r CROSS JOIN ws),
        |tot AS (SELECT w, win, CAST(count(*) AS BIGINT) AS cnt,
        |               CAST(sum(v) AS BIGINT) AS s,
        |               sum(CAST(v AS HUGEINT) * v) AS ss
        |        FROM g GROUP BY 1, 2),
        |dev AS (SELECT g.w, g.win,
        |               CAST(cnt AS HUGEINT) * cv - CAST(i AS HUGEINT) * s
        |                 AS devn
        |        FROM g JOIN tot USING (w, win) WHERE cnt = w),
        |rs AS (SELECT d.w, d.win, max(d.devn) AS mx, min(d.devn) AS mn,
        |              any_value(t.cnt) AS cnt, any_value(t.s) AS s,
        |              any_value(t.ss) AS ss
        |       FROM dev d JOIN tot t USING (w, win) GROUP BY 1, 2),
        |f AS (SELECT w, win,
        |             CAST(CAST(mx - mn AS VARCHAR) AS DOUBLE) /
        |               CAST(cnt AS DOUBLE) AS rng,
        |             sqrt(CAST(CAST(CAST(cnt AS HUGEINT) * ss -
        |                            CAST(s AS HUGEINT) * s AS VARCHAR)
        |                       AS DOUBLE) /
        |                  CAST(cnt * (cnt - 1) AS DOUBLE)) AS std
        |      FROM rs
        |      WHERE CAST(cnt AS HUGEINT) * ss - CAST(s AS HUGEINT) * s > 0)
        |SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n_windows,
        |       CAST(sum(CAST(floor((rng / std) * 1000) AS BIGINT)) AS BIGINT)
        |         AS rs_witness,
        |       CAST(sum(CAST(floor((rng / std) * 1000) AS BIGINT)) AS DOUBLE) /
        |         (CAST(1000 AS DOUBLE) * CAST(count(*) AS DOUBLE)) AS mean_rs
        |FROM f GROUP BY w ORDER BY w""".stripMargin,

    // Youden's J argmax on the integer objective tp*N - fp*P; winner by
    // (j_num desc, threshold desc), metrics one division each.
    "q_youden" ->
      """WITH lbl AS (
        |  SELECT o.o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
        |  FROM orders o LEFT JOIN (
        |    SELECT DISTINCT l_orderkey
        |    FROM lineitem WHERE l_returnflag = 'R') r
        |  ON o.o_orderkey = r.l_orderkey),
        |per AS (
        |  SELECT v, CAST(sum(y) AS BIGINT) AS a,
        |         CAST(sum(1 - y) AS BIGINT) AS b
        |  FROM lbl GROUP BY v),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_pos,
        |               CAST(sum(b) AS BIGINT) AS n_neg FROM per),
        |cum AS (SELECT v, CAST(sum(a) OVER (ORDER BY v DESC) AS BIGINT)
        |                 AS tp,
        |               CAST(sum(b) OVER (ORDER BY v DESC) AS BIGINT) AS fp
        |        FROM per),
        |best AS (
        |  SELECT v AS threshold, tp, fp, n_pos - tp AS fn, n_neg - fp AS tn,
        |         n_pos, n_neg
        |  FROM cum CROSS JOIN tot
        |  ORDER BY CAST(tp AS HUGEINT) * n_neg - CAST(fp AS HUGEINT) * n_pos
        |             DESC,
        |           v DESC
        |  LIMIT 1)
        |SELECT threshold, tp, fp, fn, tn,
        |       CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) AS tpr,
        |       CAST(fp AS DOUBLE) / CAST(n_neg AS DOUBLE) AS fpr,
        |       CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) -
        |         CAST(fp AS DOUBLE) / CAST(n_neg AS DOUBLE) AS j
        |FROM best""".stripMargin,

    // Top-k type coverage at power-of-two vocabulary budgets; exact
    // longs, one division per emitted row.
    "q_vocab_coverage" ->
      """WITH types AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT tok, cnt,
        |         CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC)
        |              AS BIGINT) AS k,
        |         CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok ASC)
        |              AS BIGINT) AS cum_cnt
        |  FROM types),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_toks,
        |               CAST(count(*) AS BIGINT) AS n_types FROM types)
        |SELECT k, tok AS kth_type, cnt AS kth_cnt, cum_cnt, n_types,
        |       total_toks,
        |       CAST(cum_cnt AS DOUBLE) / CAST(total_toks AS DOUBLE)
        |         AS coverage
        |FROM ranked CROSS JOIN tot
        |WHERE (k & (k - 1)) = 0 AND k > 0
        |ORDER BY k""".stripMargin,

    // JL distortion: deterministic md5-sign +-1 projection, exact
    // integer distances, VARCHAR-routed ratio, floor-witnessed mean.
    "q_jl_distortion" ->
      """WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
        |              AS BIGINT) AS q
        |  FROM embeddings),
        |js AS (SELECT unnest(generate_series(0, 15)) AS j),
        |proj AS (
        |  SELECT vec_id, j,
        |         CAST(sum(CASE WHEN substr(md5(CAST(j AS VARCHAR) || '|' ||
        |                                    CAST(i AS VARCHAR)), 1, 1)
        |                       IN ('0','1','2','3','4','5','6','7')
        |                  THEN q ELSE -q END) AS BIGINT) AS p
        |  FROM q CROSS JOIN js GROUP BY 1, 2),
        |do2 AS (SELECT a.vec_id AS pid,
        |               sum(CAST(a.q - b.q AS HUGEINT) * (a.q - b.q)) AS d2
        |        FROM q a JOIN q b
        |          ON b.vec_id = a.vec_id + 1 AND a.i = b.i
        |        WHERE a.vec_id % 2 = 0 GROUP BY 1),
        |dp2 AS (SELECT a.vec_id AS pid,
        |               sum(CAST(a.p - b.p AS HUGEINT) * (a.p - b.p)) AS d2
        |        FROM proj a JOIN proj b
        |          ON b.vec_id = a.vec_id + 1 AND a.j = b.j
        |        WHERE a.vec_id % 2 = 0 GROUP BY 1),
        |r AS (SELECT do2.pid,
        |             CAST(CAST(dp2.d2 AS VARCHAR) AS DOUBLE) /
        |               CAST(CAST(16 * do2.d2 AS VARCHAR) AS DOUBLE) AS ratio
        |      FROM do2 JOIN dp2 USING (pid) WHERE do2.d2 > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |       min(ratio) AS min_ratio, max(ratio) AS max_ratio,
        |       CAST(sum(CAST(floor(ratio * 1000000) AS BIGINT)) AS BIGINT)
        |         AS ratio_witness,
        |       CAST(sum(CAST(floor(ratio * 1000000) AS BIGINT)) AS DOUBLE) /
        |         (CAST(1000000 AS DOUBLE) * CAST(count(*) AS DOUBLE))
        |         AS mean_ratio
        |FROM r""".stripMargin,

    "q_diameter" -> diameterOracleSql,

    // Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) over
    // per-(type, user) inter-arrival gaps; exact integer moments,
    // VARCHAR-routed variance numerator, portable sqrt.
    "q_burstiness" ->
      """WITH e AS (
        |  SELECT event_type, user_id, event_id, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |         ts_ms - lag(ts_ms) OVER (PARTITION BY event_type, user_id
        |                                  ORDER BY ts_ms, event_id) AS g
        |  FROM e),
        |agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |         CAST(sum(g) AS BIGINT) AS s,
        |         sum(CAST(g AS HUGEINT) * g) AS ss
        |  FROM g WHERE g IS NOT NULL GROUP BY 1),
        |m AS (
        |  SELECT event_type, n_gaps,
        |         CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_ms,
        |         sqrt(CAST(CAST(CAST(n_gaps AS HUGEINT) * ss -
        |                        CAST(s AS HUGEINT) * s AS VARCHAR) AS DOUBLE)
        |              / CAST(n_gaps * (n_gaps - 1) AS DOUBLE)) AS sd_gap_ms
        |  FROM agg WHERE n_gaps >= 2)
        |SELECT event_type, n_gaps, mean_gap_ms, sd_gap_ms,
        |       (sd_gap_ms - mean_gap_ms) / (sd_gap_ms + mean_gap_ms)
        |         AS burstiness
        |FROM m ORDER BY event_type""".stripMargin,

    // Neyman allocation: integer witness w = floor(N_h * sigma_h),
    // shares by exact integer division of the witness sums.
    "q_neyman" ->
      """WITH per AS (
        |  SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS s,
        |         sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT) AS HUGEINT) *
        |             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS ss
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |sg AS (
        |  SELECT segment, n,
        |         sqrt(CAST(CAST(CAST(n AS HUGEINT) * ss -
        |                        CAST(s AS HUGEINT) * s AS VARCHAR) AS DOUBLE)
        |              / CAST(n * (n - 1) AS DOUBLE)) AS sigma
        |  FROM per),
        |wv AS (SELECT segment, n, sigma,
        |              CAST(floor(CAST(n AS DOUBLE) * sigma) AS BIGINT) AS w
        |       FROM sg),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
        |               CAST(sum(n) AS BIGINT) AS tn FROM wv)
        |SELECT segment, n, sigma, w,
        |       (1000 * w) // tw AS n_neyman,
        |       (1000 * n) // tn AS n_proportional
        |FROM wv CROSS JOIN tot ORDER BY segment""".stripMargin,

    "q_fisher" -> fisherOracleSql,

    // Pearson correlation between embedding axes on the integer grid;
    // two-sqrt overflow-proof tree, VARCHAR-routed HUGEINT casts.
    "q_dim_corr" ->
      """WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
        |              AS BIGINT) AS x
        |  FROM embeddings),
        |per AS (
        |  SELECT CAST(i AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x) -
        |           CAST(sum(x) AS HUGEINT) * CAST(sum(x) AS BIGINT) AS vn
        |  FROM q GROUP BY 1),
        |pairs AS (
        |  SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
        |         sum(CAST(a.x AS HUGEINT) * b.x) AS sxy
        |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i < b.i
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT p.i, p.j,
        |         CAST(CAST(CAST(pi.n AS HUGEINT) * p.sxy -
        |                   CAST(pi.sx AS HUGEINT) * pj.sx AS VARCHAR)
        |              AS DOUBLE) /
        |           sqrt(CAST(CAST(pi.vn AS VARCHAR) AS DOUBLE)) /
        |           sqrt(CAST(CAST(pj.vn AS VARCHAR) AS DOUBLE)) AS corr
        |  FROM pairs p JOIN per pi ON p.i = pi.d JOIN per pj ON p.j = pj.d)
        |SELECT i, j, corr FROM c
        |ORDER BY abs(corr) DESC, i ASC, j ASC LIMIT 20""".stripMargin,

    // Greedy first-fit compaction groups: grp = cum-before div target,
    // exact longs end to end.
    "q_compaction" ->
      """WITH parts AS (
        |  SELECT epoch_ms(l_shipdate) // 86400000 // 30 AS part_id,
        |         CAST(count(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT part_id, n_rows,
        |             CAST(sum(n_rows) OVER (ORDER BY part_id) AS BIGINT)
        |               AS cum
        |      FROM parts)
        |SELECT (cum - n_rows) // 5000 AS grp,
        |       CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(min(part_id) AS BIGINT) AS from_part,
        |       CAST(max(part_id) AS BIGINT) AS to_part,
        |       CAST(sum(n_rows) AS BIGINT) AS rows_out,
        |       CAST(sum(n_rows) AS BIGINT) > 5000 AS over_target
        |FROM c GROUP BY 1 ORDER BY grp""".stripMargin,

    "q_perm_test" -> permTestOracleSql,

    // MATTR via the O(n) difference-array form: a repeated token is a
    // within-window duplicate for windows ending in [p, prev+W-1] ->
    // +1 at p, -1 at prev+W, one running sum gives every window's
    // duplicate count. W = 25.
    "q_mattr" ->
      """WITH tp AS (
        |  SELECT doc_id, source,
        |         unnest(string_split(text, ' ')) AS term,
        |         CAST(generate_subscripts(string_split(text, ' '), 1) - 1
        |              AS BIGINT) AS p
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, p,
        |         lag(p) OVER (PARTITION BY doc_id, term ORDER BY p) AS prev
        |  FROM tp),
        |gf AS (SELECT doc_id, p, prev FROM g
        |       WHERE prev IS NOT NULL AND p - prev <= 24),
        |deltas AS (
        |  SELECT doc_id, p AS pos, 1 AS d FROM gf
        |  UNION ALL
        |  SELECT doc_id, prev + 25, -1 FROM gf),
        |dag AS (SELECT doc_id, pos, CAST(sum(d) AS BIGINT) AS d
        |        FROM deltas GROUP BY 1, 2),
        |du AS (
        |  SELECT tp.source, tp.doc_id, tp.p AS pos,
        |         CAST(sum(COALESCE(dag.d, 0)) OVER (
        |           PARTITION BY tp.doc_id ORDER BY tp.p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS dup
        |  FROM tp LEFT JOIN dag
        |    ON tp.doc_id = dag.doc_id AND tp.p = dag.pos),
        |agg AS (
        |  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |         CAST(count(*) AS BIGINT) AS n_windows,
        |         CAST(sum(25 - dup) AS BIGINT) AS sum_distinct
        |  FROM du WHERE pos >= 24 GROUP BY 1)
        |SELECT source, n_docs, n_windows, sum_distinct,
        |       CAST(sum_distinct AS DOUBLE) /
        |         CAST(25 * n_windows AS DOUBLE) AS mattr
        |FROM agg ORDER BY source""".stripMargin,

    // Wilson interval with pinned z = 1.96 / z^2 = 3.8416 literals; the
    // identical fixed IEEE tree in both engines.
    "q_wilson" ->
      """WITH cells AS (
        |  SELECT p_brand AS brand,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS k,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |t AS (
        |  SELECT brand, k, n,
        |         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |         CAST(1 AS DOUBLE) + 3.8416 / CAST(n AS DOUBLE) AS denom,
        |         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) +
        |           3.8416 / (CAST(2 AS DOUBLE) * CAST(n AS DOUBLE))
        |           AS center,
        |         1.96 * sqrt(
        |           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) *
        |             (CAST(1 AS DOUBLE) -
        |              CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) /
        |             CAST(n AS DOUBLE) +
        |           3.8416 / (CAST(4 AS DOUBLE) * CAST(n AS DOUBLE) *
        |                     CAST(n AS DOUBLE))) AS half
        |  FROM cells)
        |SELECT brand, k, n, p AS rate,
        |       (center - half) / denom AS lo,
        |       (center + half) / denom AS hi
        |FROM t ORDER BY brand""".stripMargin,

    // Leave-one-source-out means: complement sums are total minus own,
    // one exact division per emitted mean.
    "q_jackknife" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS s
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
        |               CAST(sum(s) AS BIGINT) AS ts FROM per)
        |SELECT source, n_docs,
        |       CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE) AS own_mean,
        |       CAST(ts - s AS DOUBLE) / CAST(tn - n_docs AS DOUBLE)
        |         AS loo_mean,
        |       CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) AS full_mean,
        |       CAST(ts - s AS DOUBLE) / CAST(tn - n_docs AS DOUBLE) -
        |         CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) AS influence
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,

    // Consecutive event-type triples per user via two leads; support
    // one division against the broadcast triple total.
    "q_seq3" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
        |  FROM events),
        |tri AS (
        |  SELECT user_id, event_type AS e1,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |                                   ORDER BY ts_ms, event_id) AS e2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |                                   ORDER BY ts_ms, event_id) AS e3
        |  FROM e),
        |c AS (
        |  SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS cnt,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT e1, e2, e3, cnt, n_users,
        |       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS support
        |FROM c CROSS JOIN tot
        |ORDER BY cnt DESC, e1 ASC, e2 ASC, e3 ASC LIMIT 20""".stripMargin,

    // Threshold sweep over ONE exact pair set (tau >= 0.3, unfiltered
    // all-pairs replay); per-threshold rows by LEFT JOIN so empty
    // thresholds still emit zero counts (matching Spark's agg-on-empty).
    "q_dedup_sweep" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id,
        |                unnest(list_distinct(string_split(text, ' '))) AS tok
        |         FROM base),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |          FROM toks GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |                 CAST(count(*) AS BIGINT) AS i
        |          FROM toks a JOIN toks b
        |            ON a.tok = b.tok AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2, i, s1.n + s2.n - i AS u
        |          FROM inter JOIN sizes s1 ON d1 = s1.doc_id
        |                     JOIN sizes s2 ON d2 = s2.doc_id
        |          WHERE 10 * i >= 3 * (s1.n + s2.n - i)),
        |ts AS (SELECT unnest([3, 4, 5, 6, 7, 8, 9]) AS t10)
        |SELECT CAST(t10 AS DOUBLE) / CAST(10 AS DOUBLE) AS tau,
        |       CAST(count(d1) AS BIGINT) AS n_pairs,
        |       CAST(count(DISTINCT d2) AS BIGINT) AS n_victims
        |FROM ts LEFT JOIN pairs ON 10 * i >= t10 * u
        |GROUP BY t10 ORDER BY tau""".stripMargin,

    // Decile Q-Q table: percentile_disc by integer rank arithmetic per
    // segment, one ratio per row.
    "q_qq" ->
      """WITH o AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |per AS (SELECT segment, v, CAST(count(*) AS BIGINT) AS cnt
        |        FROM o GROUP BY 1, 2),
        |cum AS (SELECT segment, v,
        |               CAST(sum(cnt) OVER (PARTITION BY segment ORDER BY v)
        |                    AS BIGINT) AS cum
        |        FROM per),
        |tot AS (SELECT segment, CAST(count(*) AS BIGINT) AS n
        |        FROM o GROUP BY 1),
        |pcts AS (SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90]) AS p),
        |q AS (SELECT c.segment, p.p,
        |             min(CASE WHEN c.cum >= (p.p * t.n + 99) // 100
        |                      THEN c.v END) AS qv
        |      FROM cum c JOIN tot t USING (segment) CROSS JOIN pcts p
        |      GROUP BY 1, 2)
        |SELECT CAST(a.p AS BIGINT) AS pct, a.qv AS v_a, b.qv AS v_b,
        |       CAST(a.qv AS DOUBLE) / CAST(b.qv AS DOUBLE) AS ratio
        |FROM q a JOIN q b ON a.p = b.p
        |WHERE a.segment = 'BUILDING' AND b.segment = 'MACHINERY'
        |ORDER BY pct""".stripMargin,

    "q_smd" -> smdOracleSql,

    // VAD span merge over 100 ms frames with a deterministic md5 energy
    // gate; gaps-and-islands per media item, exact integer voiced-ms.
    "q_vad_spans" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
        |  FROM documents WHERE doc_id % 3 = 1 AND n_chars * 10 > 0),
        |fr AS (
        |  SELECT media_id, duration_ms,
        |         unnest(range(0, duration_ms, 100)) AS ts
        |  FROM m),
        |v AS (
        |  SELECT media_id, duration_ms, ts
        |  FROM fr
        |  WHERE CAST('0x' || substr(md5(CAST(media_id AS VARCHAR) || ':' ||
        |             CAST(ts AS VARCHAR)), 1, 15) AS BIGINT) % 100 >= 55),
        |isl AS (
        |  SELECT media_id, duration_ms, ts,
        |         ts // 100 - row_number() OVER (PARTITION BY media_id
        |                                        ORDER BY ts) AS island
        |  FROM v),
        |sp AS (SELECT media_id, duration_ms, island,
        |              CAST(count(*) AS BIGINT) AS frames
        |       FROM isl GROUP BY 1, 2, 3)
        |SELECT media_id, duration_ms,
        |       CAST(count(*) AS BIGINT) AS n_spans,
        |       CAST(sum(frames) * 100 AS BIGINT) AS voiced_ms,
        |       CAST(max(frames) * 100 AS BIGINT) AS longest_span_ms,
        |       CAST(CAST(sum(frames) * 100 AS BIGINT) AS DOUBLE) /
        |         CAST(duration_ms AS DOUBLE) AS voiced_share
        |FROM sp GROUP BY 1, 2 ORDER BY media_id""".stripMargin,

    // ICC(1) with the exact integer-division between-group witness
    // Sum_c (S_c^2 div n_c); k0 unequal-size correction.
    "q_icc" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_c,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS s_c,
        |         sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT) AS HUGEINT) *
        |             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS q_c
        |  FROM orders GROUP BY 1 HAVING count(*) >= 2),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS g,
        |         CAST(sum(n_c) AS BIGINT) AS n,
        |         CAST(sum(n_c * n_c) AS BIGINT) AS nn2,
        |         sum(CAST(s_c AS HUGEINT)) AS s,
        |         sum(q_c) AS q2,
        |         sum(CAST(s_c AS HUGEINT) * s_c // n_c) AS bw
        |  FROM per),
        |t AS (
        |  SELECT g, n,
        |         CAST(CAST(bw AS VARCHAR) AS DOUBLE) -
        |           CAST(CAST(s * s AS VARCHAR) AS DOUBLE) /
        |             CAST(n AS DOUBLE) AS ssb,
        |         CAST(CAST(q2 AS VARCHAR) AS DOUBLE) -
        |           CAST(CAST(bw AS VARCHAR) AS DOUBLE) AS ssw,
        |         (CAST(n AS DOUBLE) -
        |            CAST(nn2 AS DOUBLE) / CAST(n AS DOUBLE)) /
        |           (CAST(g AS DOUBLE) - CAST(1 AS DOUBLE)) AS k0
        |  FROM agg)
        |SELECT g AS n_groups, n AS n_orders, ssb, ssw, k0,
        |       (ssb / (CAST(g AS DOUBLE) - CAST(1 AS DOUBLE)) -
        |        ssw / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE))) /
        |       (ssb / (CAST(g AS DOUBLE) - CAST(1 AS DOUBLE)) +
        |        (k0 - CAST(1 AS DOUBLE)) *
        |          (ssw / (CAST(n AS DOUBLE) - CAST(g AS DOUBLE)))) AS icc
        |FROM t""".stripMargin,

    // Chapman mark-recapture over the pre/post-1998 capture occasions.
    "q_mark_recapture" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(max(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS in1,
        |         CAST(max(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS in2
        |  FROM orders GROUP BY 1),
        |agg AS (
        |  SELECT CAST(sum(in1) AS BIGINT) AS n1,
        |         CAST(sum(in2) AS BIGINT) AS n2,
        |         CAST(sum(in1 * in2) AS BIGINT) AS m,
        |         CAST(count(*) AS BIGINT) AS true_n
        |  FROM per)
        |SELECT n1, n2, m, true_n,
        |       CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE)
        |         - CAST(1 AS DOUBLE) AS chapman_est,
        |       (CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE)
        |         - CAST(1 AS DOUBLE) - CAST(true_n AS DOUBLE)) /
        |         CAST(true_n AS DOUBLE) AS rel_err
        |FROM agg""".stripMargin,

    // Bias-corrected Chao1 + Good coverage over bigram types.
    "q_chao1" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT t[i] || ' ' || t[i + 1] AS g,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks, unnest(range(1, len(t))) AS r(i) GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS s_obs,
        |         CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS f1,
        |         CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS f2
        |  FROM bi)
        |SELECT s_obs, n_tokens, f1, f2,
        |       CAST(s_obs AS DOUBLE) +
        |         CAST(f1 * (f1 - 1) AS DOUBLE) /
        |           CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
        |       CAST(1 AS DOUBLE) -
        |         CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |         AS coverage_hat
        |FROM agg""".stripMargin,

    // Good-Turing adjusted counts over the bigram frequency-of-
    // frequencies; r* one exact division per row.
    "q_good_turing" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT t[i] || ' ' || t[i + 1] AS g,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks, unnest(range(1, len(t))) AS r(i) GROUP BY 1),
        |fof AS (
        |  SELECT cnt AS r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM bi WHERE cnt <= 11 GROUP BY 1)
        |SELECT a.r, a.n_r,
        |       CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r1,
        |       CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE) /
        |         CAST(a.n_r AS DOUBLE) AS r_star,
        |       CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE) /
        |         CAST(a.n_r AS DOUBLE) / CAST(a.r AS DOUBLE) AS discount
        |FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
        |WHERE a.r <= 10
        |ORDER BY a.r""".stripMargin,

    // Cochran-Armitage trend z^2 with cleared denominators: exact
    // HUGEINT arithmetic until one VARCHAR-routed division.
    "q_ca_trend" ->
      """WITH rows_ AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |w AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS a,
        |         CAST(sum(s) AS BIGINT) AS sn,
        |         CAST(sum(s * s) AS BIGINT) AS s2n,
        |         CAST(sum(s * y) AS BIGINT) AS sa
        |  FROM rows_)
        |SELECT n, a, sn, sa,
        |       CAST(CAST(CAST(n AS HUGEINT) *
        |                 (CAST(n AS HUGEINT) * sa - CAST(a AS HUGEINT) * sn) *
        |                 (CAST(n AS HUGEINT) * sa - CAST(a AS HUGEINT) * sn)
        |                 AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(a AS HUGEINT) * (n - a) *
        |                 (CAST(n AS HUGEINT) * s2n -
        |                  CAST(sn AS HUGEINT) * sn) AS VARCHAR) AS DOUBLE)
        |         AS z2
        |FROM w""".stripMargin,

    // Three bandings of the same 8-hash signatures vs exact shingle
    // truth; recall per config, candidates per config.
    "q_band_sweep" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in generate_series(1, len(toks)-2)]))
        |               AS sh
        |      FROM t),
        |sig AS (SELECT doc_id,
        |               min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
        |               min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
        |               min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
        |               min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
        |        FROM s GROUP BY doc_id),
        |b2 AS (SELECT doc_id, 0 AS band, md5(m0 || m1) AS bucket FROM sig
        |       UNION ALL SELECT doc_id, 1, md5(m2 || m3) FROM sig
        |       UNION ALL SELECT doc_id, 2, md5(m4 || m5) FROM sig
        |       UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM sig),
        |b4 AS (SELECT doc_id, 0 AS band, md5(m0 || m1 || m2 || m3) AS bucket
        |       FROM sig
        |       UNION ALL SELECT doc_id, 1, md5(m4 || m5 || m6 || m7) FROM sig),
        |b8 AS (SELECT doc_id, 0 AS band,
        |              md5(m0 || m1 || m2 || m3 || m4 || m5 || m6 || m7)
        |                AS bucket
        |       FROM sig),
        |c2 AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM b2 x
        |       JOIN b2 y ON x.bucket = y.bucket AND x.band = y.band
        |                AND x.doc_id < y.doc_id),
        |c4 AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM b4 x
        |       JOIN b4 y ON x.bucket = y.bucket AND x.band = y.band
        |                AND x.doc_id < y.doc_id),
        |c8 AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM b8 x
        |       JOIN b8 y ON x.bucket = y.bucket AND x.band = y.band
        |                AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |          FROM s GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |                 CAST(count(*) AS BIGINT) AS i
        |          FROM s a JOIN s b
        |            ON a.sh = b.sh AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |truth AS (SELECT d1, d2
        |          FROM inter JOIN sizes s1 ON d1 = s1.doc_id
        |                     JOIN sizes s2 ON d2 = s2.doc_id
        |          WHERE 2 * i >= 1 * (s1.n + s2.n - i)),
        |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM truth),
        |u AS (
        |  SELECT CAST(2 AS BIGINT) AS row_width, CAST(4 AS BIGINT) AS n_bands,
        |         (SELECT CAST(count(*) AS BIGINT) FROM c2) AS n_cand_pairs,
        |         (SELECT CAST(count(*) AS BIGINT)
        |          FROM c2 JOIN truth USING (d1, d2)) AS n_hit
        |  UNION ALL
        |  SELECT 4, 2,
        |         (SELECT CAST(count(*) AS BIGINT) FROM c4),
        |         (SELECT CAST(count(*) AS BIGINT)
        |          FROM c4 JOIN truth USING (d1, d2))
        |  UNION ALL
        |  SELECT 8, 1,
        |         (SELECT CAST(count(*) AS BIGINT) FROM c8),
        |         (SELECT CAST(count(*) AS BIGINT)
        |          FROM c8 JOIN truth USING (d1, d2)))
        |SELECT row_width, n_bands, n_cand_pairs, n_true_pairs, n_hit,
        |       CAST(n_hit AS DOUBLE) / CAST(n_true_pairs AS DOUBLE)
        |         AS pair_completeness
        |FROM u CROSS JOIN tr ORDER BY row_width""".stripMargin,

    // Two-sample Cramér–von Mises: exact integer numerator (sum of
    // squared ECDF gaps over pooled points), one division.
    "q_cvm" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS ib
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |per AS (SELECT v, CAST(sum(ia) AS BIGINT) AS a,
        |               CAST(sum(ib) AS BIGINT) AS b
        |        FROM o GROUP BY v),
        |cum AS (SELECT a, b,
        |               CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
        |               CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
        |        FROM per),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
        |               CAST(sum(b) AS BIGINT) AS n_b FROM per),
        |s AS (SELECT n_a, n_b,
        |             sum(CAST(a + b AS HUGEINT) *
        |                 (CAST(ca AS HUGEINT) * n_b -
        |                  CAST(cb AS HUGEINT) * n_a) *
        |                 (CAST(ca AS HUGEINT) * n_b -
        |                  CAST(cb AS HUGEINT) * n_a)) AS tn
        |      FROM cum CROSS JOIN tot GROUP BY n_a, n_b)
        |SELECT n_a, n_b, CAST(CAST(tn AS VARCHAR) AS DOUBLE) AS t_num,
        |       CAST(CAST(tn AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(n_a AS HUGEINT) * n_b * (n_a + n_b) *
        |                 (n_a + n_b) AS VARCHAR) AS DOUBLE) AS cvm
        |FROM s""".stripMargin,

    // Paired t² over per-customer year-over-year spend differences:
    // exact cents sufficient statistics, one VARCHAR-routed division.
    "q_paired_t" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CASE WHEN year(o_orderdate) = 1996
        |                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
        |         sum(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
        |           AS na,
        |         CAST(sum(CASE WHEN year(o_orderdate) = 1997
        |                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT) ELSE 0 END) AS BIGINT) AS sb,
        |         sum(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END)
        |           AS nb
        |  FROM orders
        |  WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY o_custkey),
        |d AS (SELECT sa - sb AS d FROM per WHERE na > 0 AND nb > 0),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(d) AS BIGINT) AS sum_d,
        |             sum(CAST(d AS HUGEINT) * d) AS sd2
        |      FROM d)
        |SELECT n, sum_d,
        |       CAST(CAST(CAST(n - 1 AS HUGEINT) * sum_d * sum_d
        |            AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(n AS HUGEINT) * sd2 -
        |                 CAST(sum_d AS HUGEINT) * sum_d
        |            AS VARCHAR) AS DOUBLE) AS t2
        |FROM s""".stripMargin,

    // Goodman–Kruskal lambda both directions: all-integer PRE measure,
    // two single divisions (log-free association).
    "q_gk_lambda" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS rf, CAST(month(l_shipdate) AS BIGINT) AS md,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |bm AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_max_per_mode
        |       FROM (SELECT max(c) AS mx FROM cells GROUP BY md)),
        |br AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_max_per_rf
        |       FROM (SELECT max(c) AS mx FROM cells GROUP BY rf)),
        |rt AS (SELECT CAST(max(t) AS BIGINT) AS max_rf_tot,
        |              CAST(sum(t) AS BIGINT) AS n
        |       FROM (SELECT sum(c) AS t FROM cells GROUP BY rf)),
        |ct AS (SELECT CAST(max(t) AS BIGINT) AS max_mode_tot
        |       FROM (SELECT sum(c) AS t FROM cells GROUP BY md))
        |SELECT n, sum_max_per_mode, sum_max_per_rf, max_rf_tot, max_mode_tot,
        |       CAST(sum_max_per_mode - max_rf_tot AS DOUBLE) /
        |         CAST(n - max_rf_tot AS DOUBLE) AS lambda_rf,
        |       CAST(sum_max_per_rf - max_mode_tot AS DOUBLE) /
        |         CAST(n - max_mode_tot AS DOUBLE) AS lambda_mode
        |FROM bm CROSS JOIN br CROSS JOIN rt CROSS JOIN ct""".stripMargin,

    // Binary-segmentation change point: between-segment SS maximized
    // with exact prefix sums; score is one division, argmax is top-1.
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT day,
        |               CAST(sum(v) OVER (ORDER BY day) AS BIGINT) AS cv,
        |               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
        |        FROM daily),
        |tot AS (SELECT CAST(sum(v) AS BIGINT) AS s,
        |               CAST(count(*) AS BIGINT) AS nd FROM daily),
        |sc AS (
        |  SELECT day, t AS n_left, nd - t AS n_right, cv, s,
        |         CAST(CAST((CAST(cv AS HUGEINT) * nd - CAST(t AS HUGEINT) * s) *
        |                   (CAST(cv AS HUGEINT) * nd - CAST(t AS HUGEINT) * s)
        |              AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(CAST(t AS HUGEINT) * (nd - t) AS VARCHAR) AS DOUBLE)
        |           AS score
        |  FROM cum CROSS JOIN tot WHERE t < nd)
        |SELECT day AS split_day, n_left, n_right,
        |       CAST(cv AS DOUBLE) / CAST(n_left AS DOUBLE) AS mean_left_cents,
        |       CAST(s - cv AS DOUBLE) / CAST(n_right AS DOUBLE)
        |         AS mean_right_cents,
        |       score
        |FROM sc ORDER BY score DESC, day LIMIT 1""".stripMargin,

    // Max drawdown of the mean-adjusted cumulative-revenue walk: exact
    // integer path P_t·N, integer argmax, two emitted divisions.
    "q_drawdown" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT day,
        |               CAST(sum(v) OVER (ORDER BY day) AS BIGINT) AS cv,
        |               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
        |        FROM daily),
        |tot AS (SELECT CAST(sum(v) AS BIGINT) AS s,
        |               CAST(count(*) AS BIGINT) AS nd FROM daily),
        |path AS (SELECT day,
        |                CAST(cv AS HUGEINT) * nd - CAST(t AS HUGEINT) * s
        |                  AS pn, nd
        |         FROM cum CROSS JOIN tot),
        |dd AS (SELECT day, pn, nd,
        |              max(pn) OVER (ORDER BY day) AS peak_pn
        |       FROM path),
        |worst AS (SELECT day AS trough_day, peak_pn, peak_pn - pn AS dd_num,
        |                 nd
        |          FROM dd ORDER BY peak_pn - pn DESC, day LIMIT 1)
        |SELECT (SELECT min(p.day) FROM path p
        |        WHERE p.pn = w.peak_pn AND p.day <= w.trough_day) AS peak_day,
        |       trough_day,
        |       CAST(CAST(dd_num AS VARCHAR) AS DOUBLE) AS dd_num,
        |       CAST(CAST(dd_num AS VARCHAR) AS DOUBLE) / CAST(nd AS DOUBLE)
        |         AS dd_cents
        |FROM worst w""".stripMargin,

    // l-diversity rollup over (segment, nation) QI groups with
    // account-balance bands as the sensitive attribute.
    "q_l_diversity" ->
      """WITH b AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         CAST(floor(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |                    AS BIGINT) AS DOUBLE) / 200000.0) AS BIGINT)
        |           AS band
        |  FROM customer),
        |pb AS (SELECT c_mktsegment, c_nationkey, band, count(*) AS cnt
        |       FROM b GROUP BY 1, 2, 3),
        |g AS (SELECT c_mktsegment, c_nationkey,
        |             CAST(sum(cnt) AS BIGINT) AS k,
        |             CAST(count(*) AS BIGINT) AS l
        |      FROM pb GROUP BY 1, 2)
        |SELECT CAST(3 AS BIGINT) AS l_req,
        |       CAST(sum(k) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_groups,
        |       min(l) AS min_l,
        |       CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_weak_groups,
        |       CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
        |         AS n_rows_at_risk,
        |       CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(k) AS DOUBLE) AS risk_share
        |FROM g""".stripMargin,

    // t-closeness: per-QI-group ordered EMD against the global
    // balance-band histogram, exact integers until one division.
    "q_t_closeness" ->
      """WITH b AS (
        |  SELECT c_mktsegment AS seg, c_nationkey AS nat,
        |         CAST(floor(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |                    AS BIGINT) AS DOUBLE) / 200000.0) AS BIGINT)
        |           AS band
        |  FROM customer),
        |cells AS (SELECT seg, nat, band, CAST(count(*) AS BIGINT) AS c
        |          FROM b GROUP BY 1, 2, 3),
        |groups AS (SELECT seg, nat, CAST(sum(c) AS BIGINT) AS n_g
        |           FROM cells GROUP BY 1, 2),
        |gb AS (SELECT band, CAST(sum(c) AS BIGINT) AS g
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(g) AS BIGINT) AS m,
        |               CAST(count(*) AS BIGINT) AS n_bands FROM gb),
        |grid AS (SELECT gr.seg, gr.nat, gr.n_g, gl.band, gl.g,
        |                coalesce(c.c, 0) AS c
        |         FROM groups gr CROSS JOIN gb gl
        |         LEFT JOIN cells c
        |           ON c.seg = gr.seg AND c.nat = gr.nat AND c.band = gl.band),
        |cd AS (SELECT seg, nat, n_g, band, m, n_bands,
        |              sum(CAST(c AS HUGEINT) * m - CAST(g AS HUGEINT) * n_g)
        |                OVER (PARTITION BY seg, nat ORDER BY band) AS cum_diff
        |       FROM grid CROSS JOIN tot),
        |e AS (SELECT seg, nat, n_g, m, n_bands,
        |             sum(abs(cum_diff)) AS emd_num
        |      FROM cd GROUP BY 1, 2, 3, 4, 5)
        |SELECT seg, nat, n_g,
        |       CAST(CAST(emd_num AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(n_g AS HUGEINT) * m * (n_bands - 1)
        |            AS VARCHAR) AS DOUBLE) AS emd
        |FROM e ORDER BY seg, nat""".stripMargin,

    // PACF lags 1-3 via Durbin–Levinson over three exact lag-k Pearson
    // correlations (cleared denominators, VARCHAR-routed, one sqrt each).
    "q_pacf" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(a.v) AS BIGINT) AS sx,
        |              CAST(sum(b.v) AS BIGINT) AS sy,
        |              sum(CAST(a.v AS HUGEINT) * a.v) AS sxx,
        |              sum(CAST(a.v AS HUGEINT) * b.v) AS sxy,
        |              sum(CAST(b.v AS HUGEINT) * b.v) AS syy
        |       FROM daily a JOIN daily b ON b.day = a.day + 1),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(a.v) AS BIGINT) AS sx,
        |              CAST(sum(b.v) AS BIGINT) AS sy,
        |              sum(CAST(a.v AS HUGEINT) * a.v) AS sxx,
        |              sum(CAST(a.v AS HUGEINT) * b.v) AS sxy,
        |              sum(CAST(b.v AS HUGEINT) * b.v) AS syy
        |       FROM daily a JOIN daily b ON b.day = a.day + 2),
        |s3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(a.v) AS BIGINT) AS sx,
        |              CAST(sum(b.v) AS BIGINT) AS sy,
        |              sum(CAST(a.v AS HUGEINT) * a.v) AS sxx,
        |              sum(CAST(a.v AS HUGEINT) * b.v) AS sxy,
        |              sum(CAST(b.v AS HUGEINT) * b.v) AS syy
        |       FROM daily a JOIN daily b ON b.day = a.day + 3),
        |r AS (SELECT
        |  (SELECT n FROM s1) AS n1,
        |  (SELECT CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS VARCHAR) AS DOUBLE) /
        |          sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |                         CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(CAST(n AS HUGEINT) * syy -
        |                         CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |   FROM s1) AS r1,
        |  (SELECT CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS VARCHAR) AS DOUBLE) /
        |          sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |                         CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(CAST(n AS HUGEINT) * syy -
        |                         CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |   FROM s2) AS r2,
        |  (SELECT CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS VARCHAR) AS DOUBLE) /
        |          sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |                         CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(CAST(n AS HUGEINT) * syy -
        |                         CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |   FROM s3) AS r3),
        |c1 AS (SELECT n1, r1, r2, r3,
        |              (r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2
        |       FROM r),
        |c2 AS (SELECT n1, r1, r2, r3, pacf2,
        |              r1 * (1.0 - pacf2) AS phi21
        |       FROM c1)
        |SELECT n1, r1, r2, r3, r1 AS pacf1, pacf2,
        |       (r3 - phi21 * r2 - pacf2 * r1) /
        |         (1.0 - phi21 * r1 - pacf2 * r2) AS pacf3
        |FROM c2""".stripMargin,

    // Mahalanobis outliers: exact integer moments, cleared-denominator
    // deviations, fixed IEEE score tree, deterministic top-k.
    "q_mahalanobis" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx,
        |             CAST(sum(y) AS BIGINT) AS sy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy,
        |             sum(CAST(y AS HUGEINT) * y) AS syy
        |      FROM per),
        |c AS (SELECT n, sx, sy,
        |             CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |               AS cxx,
        |             CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS cxy,
        |             CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
        |               AS cyy
        |      FROM m),
        |sc AS (
        |  SELECT l_orderkey, x AS x_cents, y AS n_lines,
        |         CAST(CAST(CAST(n AS HUGEINT) * x - sx AS VARCHAR) AS DOUBLE)
        |           AS dx,
        |         CAST(CAST(CAST(n AS HUGEINT) * y - sy AS VARCHAR) AS DOUBLE)
        |           AS dy,
        |         CAST(CAST(cxx AS VARCHAR) AS DOUBLE) AS cxx_d,
        |         CAST(CAST(cxy AS VARCHAR) AS DOUBLE) AS cxy_d,
        |         CAST(CAST(cyy AS VARCHAR) AS DOUBLE) AS cyy_d
        |  FROM per CROSS JOIN c),
        |s2 AS (
        |  SELECT l_orderkey, x_cents, n_lines,
        |         cyy_d * dx * dx - 2.0 * cxy_d * dx * dy + cxx_d * dy * dy
        |           AS score,
        |         cxx_d * cyy_d - cxy_d * cxy_d AS det
        |  FROM sc)
        |SELECT l_orderkey, x_cents, n_lines, score, score / det AS md2
        |FROM s2 ORDER BY score DESC, l_orderkey LIMIT 15""".stripMargin,

    // Flesch–Kincaid buckets: exact word/syllable/sentence counts, a
    // fixed per-doc IEEE formula, bucket floor, integer rollup.
    "q_readability" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              t -> t <> '')) AS BIGINT) AS w,
        |         CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
        |           AS syl,
        |         greatest(CAST(1 AS BIGINT),
        |           CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
        |           AS s
        |  FROM documents),
        |f AS (SELECT doc_id, w, syl,
        |             0.39 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE)) +
        |               11.8 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) -
        |               15.59 AS fk
        |      FROM d WHERE w > 0),
        |b AS (SELECT CAST(floor(fk / 5.0) AS BIGINT) AS bucket, w, syl
        |      FROM f),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM f)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(w) AS BIGINT) AS sum_words,
        |       CAST(sum(syl) AS BIGINT) AS sum_syllables,
        |       CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
        |FROM b CROSS JOIN t GROUP BY bucket, n_total
        |ORDER BY bucket""".stripMargin,

    // Zipf head table: exact rank/freq integers, rank·freq constancy
    // witness, consecutive-rank decay ratio (no logs on the board).
    "q_zipf" ->
      """WITH c AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE token <> '' GROUP BY 1),
        |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 30),
        |r AS (SELECT token, cnt,
        |             CAST(row_number() OVER (ORDER BY cnt DESC, token)
        |                  AS BIGINT) AS rank,
        |             lag(cnt) OVER (ORDER BY cnt DESC, token) AS prev_cnt
        |      FROM top)
        |SELECT rank, token, cnt, rank * cnt AS zipf_c,
        |       CAST(cnt AS DOUBLE) / CAST(prev_cnt AS DOUBLE) AS decay
        |FROM r ORDER BY rank""".stripMargin,

    "q_zonemap" -> zonemapOracleSql,

    // Scene cuts: lag-delta gate on the deterministic md5 frame score,
    // cut-count islands, per-item rollup (the video sibling of VAD).
    "q_scene_cuts" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
        |  FROM documents WHERE doc_id % 3 = 2 AND n_chars * 10 > 0),
        |fr AS (
        |  SELECT media_id, duration_ms,
        |         unnest(range(0, duration_ms, 1000)) AS ts
        |  FROM m),
        |e AS (
        |  SELECT media_id, duration_ms, ts,
        |         CAST('0x' || substr(md5(CAST(media_id AS VARCHAR) || ':' ||
        |              CAST(ts AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS energy
        |  FROM fr),
        |c AS (SELECT media_id, duration_ms, ts, energy,
        |             lag(energy) OVER (PARTITION BY media_id ORDER BY ts)
        |               AS prev
        |      FROM e),
        |f AS (SELECT media_id, duration_ms, ts,
        |             CASE WHEN prev IS NOT NULL AND abs(energy - prev) >= 40
        |                  THEN 1 ELSE 0 END AS cut
        |      FROM c),
        |sc AS (SELECT media_id, duration_ms, ts,
        |              sum(cut) OVER (PARTITION BY media_id ORDER BY ts)
        |                AS scene
        |       FROM f),
        |g AS (SELECT media_id, duration_ms, scene,
        |             CAST(count(*) AS BIGINT) AS frames
        |      FROM sc GROUP BY 1, 2, 3)
        |SELECT media_id, duration_ms, CAST(count(*) AS BIGINT) AS n_scenes,
        |       CAST(sum(frames) AS BIGINT) AS n_frames,
        |       CAST(max(frames) * 1000 AS BIGINT) AS longest_scene_ms,
        |       CAST(duration_ms AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         AS mean_scene_ms
        |FROM g GROUP BY 1, 2 ORDER BY media_id""".stripMargin,

    // DBSCAN density triage: the oracle brute-forces the SAME exact
    // distance filter the engine grid-bounds (double literals pinned).
    "q_dbscan_core" ->
      """WITH p AS (
        |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
        |         CAST(embedding[2] AS DOUBLE) AS y
        |  FROM embeddings),
        |nb AS (SELECT a.vec_id AS a, CAST(count(*) AS BIGINT) AS cnt
        |       FROM p a JOIN p b
        |         ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |            <= CAST(0.02 AS DOUBLE) * CAST(0.02 AS DOUBLE)
        |       GROUP BY 1),
        |core AS (SELECT a FROM nb WHERE cnt >= 5),
        |brd AS (SELECT CAST(count(*) AS BIGINT) AS n_border FROM (
        |  SELECT DISTINCT a.vec_id AS av
        |  FROM p a JOIN p b
        |    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |       <= CAST(0.02 AS DOUBLE) * CAST(0.02 AS DOUBLE)
        |   AND a.vec_id <> b.vec_id
        |  JOIN core c ON c.a = b.vec_id
        |  WHERE a.vec_id NOT IN (SELECT a FROM core)))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM nb) AS n_points,
        |       (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
        |       n_border,
        |       (SELECT CAST(count(*) AS BIGINT) FROM nb) -
        |         (SELECT CAST(count(*) AS BIGINT) FROM core) - n_border
        |         AS n_noise
        |FROM brd""".stripMargin,

    // Reciprocal-rank fusion of the BM25 top-50 and the cosine top-50:
    // rank-based merge, two single divisions per fused doc.
    "q_rrf" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS BIGINT) AS tf_0,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'window')) AS BIGINT) AS tf_1,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'hash')) AS BIGINT) AS tf_2
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n, sum(dl) AS sum_dl,
        |         sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
        |         sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
        |         sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
        |  FROM base),
        |scored AS (
        |  SELECT b.doc_id,
        |    (CASE WHEN b.tf_0 > 0 THEN
        |      ((CAST(s.n AS DOUBLE) - CAST(s.df_0 AS DOUBLE) + 0.5) / (CAST(s.df_0 AS DOUBLE) + 0.5))
        |      * (CAST(b.tf_0 AS DOUBLE) * 2.2)
        |      / (CAST(b.tf_0 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(b.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |     ELSE 0.0 END
        |    +
        |     CASE WHEN b.tf_1 > 0 THEN
        |      ((CAST(s.n AS DOUBLE) - CAST(s.df_1 AS DOUBLE) + 0.5) / (CAST(s.df_1 AS DOUBLE) + 0.5))
        |      * (CAST(b.tf_1 AS DOUBLE) * 2.2)
        |      / (CAST(b.tf_1 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(b.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |     ELSE 0.0 END)
        |    +
        |     CASE WHEN b.tf_2 > 0 THEN
        |      ((CAST(s.n AS DOUBLE) - CAST(s.df_2 AS DOUBLE) + 0.5) / (CAST(s.df_2 AS DOUBLE) + 0.5))
        |      * (CAST(b.tf_2 AS DOUBLE) * 2.2)
        |      / (CAST(b.tf_2 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(b.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |     ELSE 0.0 END AS raw_score,
        |    b.tf_0, b.tf_1, b.tf_2
        |  FROM base b CROSS JOIN stats s),
        |lex AS (SELECT doc_id, round(raw_score, 6) AS score
        |        FROM scored WHERE tf_0 > 0 OR tf_1 > 0 OR tf_2 > 0
        |        ORDER BY score DESC, doc_id LIMIT 50),
        |lexr AS (SELECT doc_id,
        |                CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |                     AS BIGINT) AS r_lex
        |         FROM lex),
        |e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |sem AS (SELECT e.vec_id AS doc_id,
        |               round(list_cosine_similarity(e.v, q.qv), 6) AS cs
        |        FROM e, q WHERE e.vec_id <> 0
        |        ORDER BY cs DESC, e.vec_id LIMIT 50),
        |semr AS (SELECT doc_id,
        |                CAST(row_number() OVER (ORDER BY cs DESC, doc_id)
        |                     AS BIGINT) AS r_sem
        |         FROM sem),
        |f AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
        |             l.r_lex, s.r_sem
        |      FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
        |SELECT doc_id, r_lex, r_sem,
        |       coalesce(1.0 / (60.0 + CAST(r_lex AS DOUBLE)), 0.0) +
        |         coalesce(1.0 / (60.0 + CAST(r_sem AS DOUBLE)), 0.0) AS rrf
        |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // Kruskal–Wallis with doubled midranks (exact under ties) and the
    // tie-corrected H; five fixed-order divisions, two scalar ones.
    "q_kruskal" ->
      """WITH rows_ AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g
        |  FROM orders),
        |per AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |               CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |               CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |               CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |               CAST(sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
        |        FROM rows_ GROUP BY v),
        |cum AS (SELECT t, c1, c2, c3, c4, c5,
        |               CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS cum_t
        |        FROM per),
        |m AS (SELECT t, c1, c2, c3, c4, c5, 2 * cum_t - t + 1 AS m2
        |      FROM cum),
        |a AS (SELECT CAST(sum(t) AS BIGINT) AS n,
        |             sum(CAST(t AS HUGEINT) * t * t - t) AS ties,
        |             CAST(sum(c1) AS BIGINT) AS n1,
        |             sum(CAST(m2 AS HUGEINT) * c1) AS r2_1,
        |             CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(CAST(m2 AS HUGEINT) * c2) AS r2_2,
        |             CAST(sum(c3) AS BIGINT) AS n3,
        |             sum(CAST(m2 AS HUGEINT) * c3) AS r2_3,
        |             CAST(sum(c4) AS BIGINT) AS n4,
        |             sum(CAST(m2 AS HUGEINT) * c4) AS r2_4,
        |             CAST(sum(c5) AS BIGINT) AS n5,
        |             sum(CAST(m2 AS HUGEINT) * c5) AS r2_5
        |      FROM m),
        |h0 AS (
        |  SELECT n, CAST(CAST(ties AS VARCHAR) AS DOUBLE) AS tie_term,
        |         12.0 * (CAST(CAST(r2_1 * r2_1 AS VARCHAR) AS DOUBLE) /
        |                   CAST(CAST(4 * CAST(n1 AS HUGEINT) AS VARCHAR) AS DOUBLE) +
        |                 CAST(CAST(r2_2 * r2_2 AS VARCHAR) AS DOUBLE) /
        |                   CAST(CAST(4 * CAST(n2 AS HUGEINT) AS VARCHAR) AS DOUBLE) +
        |                 CAST(CAST(r2_3 * r2_3 AS VARCHAR) AS DOUBLE) /
        |                   CAST(CAST(4 * CAST(n3 AS HUGEINT) AS VARCHAR) AS DOUBLE) +
        |                 CAST(CAST(r2_4 * r2_4 AS VARCHAR) AS DOUBLE) /
        |                   CAST(CAST(4 * CAST(n4 AS HUGEINT) AS VARCHAR) AS DOUBLE) +
        |                 CAST(CAST(r2_5 * r2_5 AS VARCHAR) AS DOUBLE) /
        |                   CAST(CAST(4 * CAST(n5 AS HUGEINT) AS VARCHAR) AS DOUBLE)) /
        |           CAST(CAST(CAST(n AS HUGEINT) * (n + 1) AS VARCHAR) AS DOUBLE) -
        |           3.0 * CAST(n + 1 AS DOUBLE) AS h,
        |         1.0 - CAST(CAST(ties AS VARCHAR) AS DOUBLE) /
        |           CAST(CAST(CAST(n AS HUGEINT) * n * n - CAST(n AS HUGEINT)
        |                AS VARCHAR) AS DOUBLE) AS c_ties
        |  FROM a)
        |SELECT n, tie_term, h, c_ties, h / c_ties AS h_adj
        |FROM h0""".stripMargin,

    // Cronbach alpha over the day x priority revenue grid: exact
    // cleared-denominator variances, one division inside a fixed tree.
    "q_cronbach" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) = 1
        |                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS v1,
        |         CAST(sum(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) = 2
        |                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS v2,
        |         CAST(sum(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) = 3
        |                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS v3,
        |         CAST(sum(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) = 4
        |                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS v4,
        |         CAST(sum(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) = 5
        |                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS v5
        |  FROM orders GROUP BY 1),
        |g AS (SELECT v1, v2, v3, v4, v5,
        |             v1 + v2 + v3 + v4 + v5 AS tot
        |      FROM daily),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(tot) AS BIGINT) AS st,
        |             sum(CAST(tot AS HUGEINT) * tot) AS qt,
        |             CAST(sum(v1) AS BIGINT) AS s1,
        |             sum(CAST(v1 AS HUGEINT) * v1) AS q1,
        |             CAST(sum(v2) AS BIGINT) AS s2,
        |             sum(CAST(v2 AS HUGEINT) * v2) AS q2,
        |             CAST(sum(v3) AS BIGINT) AS s3,
        |             sum(CAST(v3 AS HUGEINT) * v3) AS q3,
        |             CAST(sum(v4) AS BIGINT) AS s4,
        |             sum(CAST(v4 AS HUGEINT) * v4) AS q4,
        |             CAST(sum(v5) AS BIGINT) AS s5,
        |             sum(CAST(v5 AS HUGEINT) * v5) AS q5
        |      FROM g)
        |SELECT n AS n_days, CAST(5 AS BIGINT) AS k,
        |       1.25 * (1.0 -
        |         (CAST(CAST(CAST(n AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1 AS VARCHAR) AS DOUBLE) +
        |          CAST(CAST(CAST(n AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2 AS VARCHAR) AS DOUBLE) +
        |          CAST(CAST(CAST(n AS HUGEINT) * q3 - CAST(s3 AS HUGEINT) * s3 AS VARCHAR) AS DOUBLE) +
        |          CAST(CAST(CAST(n AS HUGEINT) * q4 - CAST(s4 AS HUGEINT) * s4 AS VARCHAR) AS DOUBLE) +
        |          CAST(CAST(CAST(n AS HUGEINT) * q5 - CAST(s5 AS HUGEINT) * s5 AS VARCHAR) AS DOUBLE)) /
        |         CAST(CAST(CAST(n AS HUGEINT) * qt - CAST(st AS HUGEINT) * st
        |              AS VARCHAR) AS DOUBLE)) AS alpha
        |FROM a""".stripMargin,

    // Poisson dispersion index of daily arrival counts: one division,
    // one further multiply for the chi-square form.
    "q_dispersion" ->
      """WITH d AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |             CAST(sum(c) AS BIGINT) AS sum_c,
        |             sum(CAST(c AS HUGEINT) * c) AS sum_c2
        |      FROM d),
        |t AS (SELECT n_days, sum_c,
        |             CAST(CAST(CAST(n_days AS HUGEINT) * sum_c2 -
        |                       CAST(sum_c AS HUGEINT) * sum_c
        |                  AS VARCHAR) AS DOUBLE) /
        |             CAST(CAST(CAST(n_days - 1 AS HUGEINT) * sum_c
        |                  AS VARCHAR) AS DOUBLE) AS dispersion
        |      FROM a)
        |SELECT n_days, sum_c, dispersion,
        |       CAST(n_days - 1 AS DOUBLE) * dispersion AS chi2
        |FROM t""".stripMargin,

    // Poisson-PPS sampling audit: deterministic hash coin against the
    // exact inclusion probability; HT estimate is an integer identity.
    "q_pps_sample" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(v) AS BIGINT) AS big_v,
        |               CAST(count(*) AS BIGINT) AS n FROM per),
        |s AS (SELECT v, big_v, n,
        |             CASE WHEN CAST(100 AS HUGEINT) * v >= CAST(big_v AS HUGEINT)
        |                  THEN 'cert'
        |                  WHEN CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13))
        |                       AS BIGINT) / 4503599627370496.0 <
        |                       CAST(CAST(CAST(100 AS HUGEINT) * v AS VARCHAR) AS DOUBLE) /
        |                       CAST(CAST(CAST(big_v AS HUGEINT) AS VARCHAR) AS DOUBLE)
        |                  THEN 'sampled' ELSE 'out' END AS status
        |      FROM per CROSS JOIN tot),
        |r AS (SELECT big_v, n,
        |             CAST(sum(CASE WHEN status = 'cert' THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS n_cert,
        |             CAST(sum(CASE WHEN status = 'cert' THEN v ELSE 0 END)
        |                  AS BIGINT) AS cert_v,
        |             CAST(sum(CASE WHEN status = 'sampled' THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS n_sampled
        |      FROM s GROUP BY 1, 2)
        |SELECT n, n_cert, n_sampled, big_v AS true_total_cents,
        |       CAST(CAST(CAST(100 AS HUGEINT) * cert_v +
        |                 CAST(n_sampled AS HUGEINT) * big_v
        |            AS VARCHAR) AS DOUBLE) / 100.0 AS est_cents,
        |       CAST(CAST(CAST(100 AS HUGEINT) * cert_v +
        |                 CAST(n_sampled AS HUGEINT) * big_v -
        |                 CAST(100 AS HUGEINT) * big_v
        |            AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(100 AS HUGEINT) * big_v AS VARCHAR) AS DOUBLE)
        |         AS rel_err
        |FROM r""".stripMargin,

    // Brown–Forsythe: exact lower medians from one cumulative pass over
    // the value domain, then cleared-denominator ANOVA on |v - med|.
    "q_levene" ->
      """WITH rows_ AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g
        |  FROM orders),
        |per AS (SELECT v,
        |               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |               CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |               CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |               CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |               CAST(sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
        |        FROM rows_ GROUP BY v),
        |cum AS (SELECT v,
        |               CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum_c1,
        |               CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum_c2,
        |               CAST(sum(c3) OVER (ORDER BY v) AS BIGINT) AS cum_c3,
        |               CAST(sum(c4) OVER (ORDER BY v) AS BIGINT) AS cum_c4,
        |               CAST(sum(c5) OVER (ORDER BY v) AS BIGINT) AS cum_c5
        |        FROM per),
        |tots AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |                CAST(sum(c2) AS BIGINT) AS n2,
        |                CAST(sum(c3) AS BIGINT) AS n3,
        |                CAST(sum(c4) AS BIGINT) AS n4,
        |                CAST(sum(c5) AS BIGINT) AS n5
        |         FROM per),
        |med AS (SELECT min(CASE WHEN 2 * cum_c1 >= n1 THEN v END) AS med1,
        |               min(CASE WHEN 2 * cum_c2 >= n2 THEN v END) AS med2,
        |               min(CASE WHEN 2 * cum_c3 >= n3 THEN v END) AS med3,
        |               min(CASE WHEN 2 * cum_c4 >= n4 THEN v END) AS med4,
        |               min(CASE WHEN 2 * cum_c5 >= n5 THEN v END) AS med5
        |        FROM cum CROSS JOIN tots),
        |z AS (SELECT g,
        |             abs(v - CASE g WHEN 1 THEN med1 WHEN 2 THEN med2
        |                            WHEN 3 THEN med3 WHEN 4 THEN med4
        |                            WHEN 5 THEN med5 END) AS z
        |      FROM rows_ CROSS JOIN med),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(z AS HUGEINT)) AS s,
        |             sum(CAST(z AS HUGEINT) * z) AS q,
        |             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS zn1,
        |             sum(CASE WHEN g = 1 THEN CAST(z AS HUGEINT) ELSE 0 END) AS zs1,
        |             CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS zn2,
        |             sum(CASE WHEN g = 2 THEN CAST(z AS HUGEINT) ELSE 0 END) AS zs2,
        |             CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS zn3,
        |             sum(CASE WHEN g = 3 THEN CAST(z AS HUGEINT) ELSE 0 END) AS zs3,
        |             CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS zn4,
        |             sum(CASE WHEN g = 4 THEN CAST(z AS HUGEINT) ELSE 0 END) AS zs4,
        |             CAST(sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS zn5,
        |             sum(CASE WHEN g = 5 THEN CAST(z AS HUGEINT) ELSE 0 END) AS zs5
        |      FROM z),
        |t AS (SELECT n,
        |             CAST(CAST(zs1 * zs1 AS VARCHAR) AS DOUBLE) / CAST(zn1 AS DOUBLE) +
        |             CAST(CAST(zs2 * zs2 AS VARCHAR) AS DOUBLE) / CAST(zn2 AS DOUBLE) +
        |             CAST(CAST(zs3 * zs3 AS VARCHAR) AS DOUBLE) / CAST(zn3 AS DOUBLE) +
        |             CAST(CAST(zs4 * zs4 AS VARCHAR) AS DOUBLE) / CAST(zn4 AS DOUBLE) +
        |             CAST(CAST(zs5 * zs5 AS VARCHAR) AS DOUBLE) / CAST(zn5 AS DOUBLE)
        |               AS inner_,
        |             CAST(CAST(s * s AS VARCHAR) AS DOUBLE) AS ss_d,
        |             CAST(CAST(q AS VARCHAR) AS DOUBLE) AS q_d
        |      FROM a),
        |f AS (SELECT n,
        |             inner_ - ss_d / CAST(n AS DOUBLE) AS ssb,
        |             q_d - inner_ AS ssw
        |      FROM t)
        |SELECT n, med1, med2, med3, med4, med5,
        |       ssb / 4.0 / (ssw / CAST(n - 5 AS DOUBLE)) AS w
        |FROM f CROSS JOIN med""".stripMargin,

    // Tukey–Kramer: ten pair rows from the 5-row group frame; pinned
    // studentized-range critical value; floor-witnessed MSW inner sum.
    "q_tukey" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g
        |  FROM orders),
        |groups_ AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |                   sum(CAST(v AS HUGEINT)) AS sg,
        |                   sum(CAST(v AS HUGEINT) * v) AS qg
        |            FROM o GROUP BY g),
        |w AS (SELECT
        |  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  sum(CASE WHEN g = 1 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s1,
        |  sum(CASE WHEN g = 1 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q1,
        |  CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  sum(CASE WHEN g = 2 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s2,
        |  sum(CASE WHEN g = 2 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q2,
        |  CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |  sum(CASE WHEN g = 3 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s3,
        |  sum(CASE WHEN g = 3 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q3,
        |  CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
        |  sum(CASE WHEN g = 4 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s4,
        |  sum(CASE WHEN g = 4 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q4,
        |  CAST(sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
        |  sum(CASE WHEN g = 5 THEN CAST(v AS HUGEINT) ELSE 0 END) AS s5,
        |  sum(CASE WHEN g = 5 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q5
        | FROM o),
        |msw AS (SELECT
        |  (CAST(CAST(CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE) +
        |   CAST(CAST(CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS VARCHAR) AS DOUBLE) / CAST(n2 AS DOUBLE) +
        |   CAST(CAST(CAST(n3 AS HUGEINT) * q3 - s3 * s3 AS VARCHAR) AS DOUBLE) / CAST(n3 AS DOUBLE) +
        |   CAST(CAST(CAST(n4 AS HUGEINT) * q4 - s4 * s4 AS VARCHAR) AS DOUBLE) / CAST(n4 AS DOUBLE) +
        |   CAST(CAST(CAST(n5 AS HUGEINT) * q5 - s5 * s5 AS VARCHAR) AS DOUBLE) / CAST(n5 AS DOUBLE)) /
        |  CAST(n1 + n2 + n3 + n4 + n5 - 5 AS DOUBLE) AS msw
        | FROM w)
        |SELECT a.g AS g1, b.g AS g2,
        |       CAST(CAST(a.sg * CAST(b.ng AS HUGEINT) -
        |                 b.sg * CAST(a.ng AS HUGEINT) AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(a.ng AS HUGEINT) * b.ng AS VARCHAR) AS DOUBLE)
        |         AS diff_cents,
        |       sqrt(m.msw / 2.0 * (1.0 / CAST(a.ng AS DOUBLE) +
        |                           1.0 / CAST(b.ng AS DOUBLE))) AS se,
        |       abs(CAST(CAST(a.sg * CAST(b.ng AS HUGEINT) -
        |                 b.sg * CAST(a.ng AS HUGEINT) AS VARCHAR) AS DOUBLE) /
        |           CAST(CAST(CAST(a.ng AS HUGEINT) * b.ng AS VARCHAR) AS DOUBLE))
        |         > 3.858 * sqrt(m.msw / 2.0 * (1.0 / CAST(a.ng AS DOUBLE) +
        |                                       1.0 / CAST(b.ng AS DOUBLE)))
        |         AS significant
        |FROM groups_ a JOIN groups_ b ON a.g < b.g CROSS JOIN msw m
        |ORDER BY g1, g2""".stripMargin,

    // Pettitt: rank-based change point, exact integer K_t and argmax.
    "q_pettitt" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day,
        |             CAST(row_number() OVER (ORDER BY v, day) AS BIGINT)
        |               AS rank,
        |             CAST(count(*) OVER () AS BIGINT) AS n
        |      FROM daily),
        |cum AS (SELECT day, n,
        |               CAST(sum(rank) OVER (ORDER BY day) AS BIGINT)
        |                 AS cum_rank,
        |               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
        |        FROM r),
        |k AS (SELECT day,
        |             abs(CAST(2 AS HUGEINT) * cum_rank -
        |                 CAST(t AS HUGEINT) * (n + 1)) AS k2, n
        |      FROM cum WHERE t < n)
        |SELECT day AS split_day, CAST(k2 AS BIGINT) AS k_stat,
        |       n AS n_days,
        |       CAST(CAST(k2 AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(n AS HUGEINT) * (n + 1) AS VARCHAR) AS DOUBLE)
        |         * 2.0 AS k_norm
        |FROM k ORDER BY k2 DESC, day LIMIT 1""".stripMargin,

    // Rich-club ladder: one annotated edge pass serves all four
    // cutoffs; one division per rung.
    "q_rich_club" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS node FROM pairs
        |        UNION ALL SELECT b AS node FROM pairs)
        |  GROUP BY node),
        |ann AS (SELECT da.deg AS da, db.deg AS db
        |        FROM pairs JOIN deg da ON pairs.a = da.node
        |                   JOIN deg db ON pairs.b = db.node),
        |ks(k) AS (VALUES (2), (4), (8), (16)),
        |nr AS (SELECT k, CAST(count(*) AS BIGINT) AS c
        |       FROM ks JOIN deg ON deg > k GROUP BY k),
        |er AS (SELECT k, CAST(count(*) AS BIGINT) AS c
        |       FROM ks JOIN ann ON da > k AND db > k GROUP BY k)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |       CAST(coalesce(nr.c, 0) AS BIGINT) AS n_rich,
        |       CAST(coalesce(er.c, 0) AS BIGINT) AS e_rich,
        |       CAST(2 * coalesce(er.c, 0) AS DOUBLE) /
        |         CAST(coalesce(nr.c, 0) * (coalesce(nr.c, 0) - 1) AS DOUBLE)
        |         AS phi
        |FROM ks LEFT JOIN nr ON nr.k = ks.k LEFT JOIN er ON er.k = ks.k
        |ORDER BY 1""".stripMargin,

    // Daily-revenue local peaks by prominence: lag/lead on the
    // calendar frame, exact integer ordering.
    "q_peaks" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |x AS (SELECT day, v,
        |             lag(v) OVER (ORDER BY day) AS prev,
        |             lead(v) OVER (ORDER BY day) AS next
        |      FROM daily)
        |SELECT day, v AS v_cents, v - greatest(prev, next) AS prominence
        |FROM x
        |WHERE prev IS NOT NULL AND next IS NOT NULL
        |  AND v > prev AND v >= next
        |ORDER BY prominence DESC, day LIMIT 10""".stripMargin,

    "q_cmh" -> cmhOracleSql,

    // Upper/lower tail dependence from decile ranks: exact counts,
    // one division per lambda.
    "q_tail_dep" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |r AS (SELECT o_custkey,
        |             CAST(row_number() OVER (ORDER BY x, o_custkey)
        |                  AS BIGINT) AS rx,
        |             CAST(row_number() OVER (ORDER BY y, o_custkey)
        |                  AS BIGINT) AS ry,
        |             CAST(count(*) OVER () AS BIGINT) AS n
        |      FROM per),
        |f AS (SELECT n, rx > (9 * n) // 10 AS hx, ry > (9 * n) // 10 AS hy,
        |             rx <= n // 10 AS lx, ry <= n // 10 AS ly
        |      FROM r)
        |SELECT n,
        |       CAST(sum(CASE WHEN hx THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_x,
        |       CAST(sum(CASE WHEN hx AND hy THEN 1 ELSE 0 END) AS BIGINT)
        |         AS both_hi,
        |       CAST(sum(CASE WHEN hx AND hy THEN 1 ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(CASE WHEN hx THEN 1 ELSE 0 END) AS DOUBLE)
        |         AS lambda_u,
        |       CAST(sum(CASE WHEN lx THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_x,
        |       CAST(sum(CASE WHEN lx AND ly THEN 1 ELSE 0 END) AS BIGINT)
        |         AS both_lo,
        |       CAST(sum(CASE WHEN lx AND ly THEN 1 ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(CASE WHEN lx THEN 1 ELSE 0 END) AS DOUBLE)
        |         AS lambda_l
        |FROM f GROUP BY n""".stripMargin,

    // Mutual-kNN fraction: brute-force k=5 edges per point, exact
    // mutuality self-join, one division.
    "q_mutual_knn" ->
      """WITH e AS (SELECT vec_id,
        |                  list_transform(embedding, x -> CAST(x AS DOUBLE))
        |                    AS v
        |           FROM embeddings),
        |s AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |             round(list_cosine_similarity(a.v, b.v), 6) AS sim
        |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |t AS (SELECT src, dst FROM (
        |        SELECT src, dst,
        |               row_number() OVER (PARTITION BY src
        |                                  ORDER BY sim DESC, dst) AS rn
        |        FROM s) WHERE rn <= 5),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_mutual
        |      FROM t x JOIN t y ON x.src = y.dst AND x.dst = y.src),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM t),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM e)
        |SELECT n_points, CAST(5 AS BIGINT) AS k, n_edges, n_mutual,
        |       CAST(n_mutual AS DOUBLE) / CAST(n_edges AS DOUBLE)
        |         AS mutual_frac
        |FROM p CROSS JOIN c CROSS JOIN m""".stripMargin,

    // Linear-kernel MMD between label populations: per-dim scaled-int
    // sums, cross-multiplied gap, second integer witness for the
    // 64-dim square sum.
    "q_mmd" ->
      """WITH ex AS (
        |  SELECT label, i AS dim, embedding[i] AS v
        |  FROM embeddings, unnest(generate_series(1, len(embedding)))
        |    AS g(i)
        |  WHERE label IN (0, 1)),
        |per AS (
        |  SELECT dim,
        |         CAST(sum(CASE WHEN label = 0
        |                  THEN CAST(floor(CAST(v AS DOUBLE) * 1000000)
        |                       AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
        |         CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS na,
        |         CAST(sum(CASE WHEN label = 1
        |                  THEN CAST(floor(CAST(v AS DOUBLE) * 1000000)
        |                       AS BIGINT) ELSE 0 END) AS BIGINT) AS sb,
        |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS nb
        |  FROM ex GROUP BY dim),
        |g AS (SELECT na, nb,
        |             CAST(CAST(CAST(sa AS HUGEINT) * nb -
        |                       CAST(sb AS HUGEINT) * na AS VARCHAR) AS DOUBLE) /
        |             CAST(CAST(CAST(na AS HUGEINT) * nb AS VARCHAR) AS DOUBLE)
        |               AS gap
        |      FROM per),
        |h AS (SELECT na, nb, CAST(count(*) AS BIGINT) AS n_dims,
        |             CAST(sum(CAST(floor(gap * gap * 1000000.0) AS BIGINT))
        |                  AS BIGINT) AS mmd2_w
        |      FROM g GROUP BY na, nb)
        |SELECT na AS n_a, nb AS n_b, n_dims, mmd2_w,
        |       CAST(mmd2_w AS DOUBLE) / 1000000.0 AS mmd2
        |FROM h""".stripMargin,

    // Calinski–Harabasz: fully exact scatter sums on scaled ints, one
    // per-label division witnessed to integers, final fixed tree.
    "q_calinski" ->
      """WITH pts AS (
        |  SELECT label, i AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
        |              AS BIGINT) AS u
        |  FROM embeddings, unnest(generate_series(1, len(embedding)))
        |    AS g(i)),
        |cells AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS nc,
        |                 CAST(sum(u) AS BIGINT) AS su,
        |                 sum(CAST(u AS HUGEINT) * u) AS qu
        |          FROM pts GROUP BY 1, 2),
        |perLabel AS (SELECT label, min(nc) AS nc,
        |                    sum(CAST(nc AS HUGEINT) * qu -
        |                        CAST(su AS HUGEINT) * su) AS wnum
        |             FROM cells GROUP BY 1),
        |gcells AS (SELECT dim, CAST(count(*) AS BIGINT) AS ng,
        |                  CAST(sum(u) AS BIGINT) AS sg,
        |                  sum(CAST(u AS HUGEINT) * u) AS qg
        |           FROM pts GROUP BY 1),
        |tss AS (SELECT ng, sum(CAST(ng AS HUGEINT) * qg -
        |                       CAST(sg AS HUGEINT) * sg) AS tnum
        |        FROM gcells GROUP BY 1),
        |wss AS (SELECT CAST(sum(CAST(floor(
        |                 CAST(CAST(wnum AS VARCHAR) AS DOUBLE) /
        |                   CAST(nc AS DOUBLE)) AS BIGINT)) AS BIGINT)
        |                 AS wss_w,
        |               CAST(count(*) AS BIGINT) AS k,
        |               CAST(sum(nc) AS BIGINT) AS n
        |        FROM perLabel)
        |SELECT k, n,
        |       CAST(CAST(tnum AS VARCHAR) AS DOUBLE) / CAST(ng AS DOUBLE)
        |         AS tss,
        |       CAST(wss_w AS DOUBLE) AS wss,
        |       ((CAST(CAST(tnum AS VARCHAR) AS DOUBLE) / CAST(ng AS DOUBLE) -
        |         CAST(wss_w AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
        |       (CAST(wss_w AS DOUBLE) / CAST(n - k AS DOUBLE)) AS ch
        |FROM wss CROSS JOIN tss""".stripMargin,

    "q_xcorr" -> xcorrOracleSql,

    // Jarque–Bera: exact long power sums Σq..Σq⁴, then the central
    // moments and JB as one fixed IEEE tree (m2^1.5 written m2·√m2 —
    // sqrt is correctly rounded, pow is not portable).
    "q_jarque_bera" ->
      """WITH s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS s1,
        |         CAST(sum(q * q) AS BIGINT) AS s2,
        |         CAST(sum(q * q * q) AS BIGINT) AS s3,
        |         CAST(sum(q * q * q * q) AS BIGINT) AS s4
        |  FROM (SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem)),
        |m AS (
        |  SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
        |         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
        |         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
        |  FROM s),
        |c AS (
        |  SELECT n, e2 - mu * mu AS m2,
        |         e3 - 3.0 * mu * e2 + 2.0 * mu * mu * mu AS m3,
        |         e4 - 4.0 * mu * e3 + 6.0 * mu * mu * e2 -
        |           3.0 * mu * mu * mu * mu AS m4
        |  FROM m),
        |k AS (
        |  SELECT n, m3 / (m2 * sqrt(m2)) AS skewness,
        |         m4 / (m2 * m2) AS kurtosis
        |  FROM c)
        |SELECT n, skewness, kurtosis,
        |       CAST(n AS DOUBLE) / 6.0 *
        |         (skewness * skewness +
        |          (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0) AS jb
        |FROM k""".stripMargin,

    // Empirical-Bayes shrinkage: per-supplier (n, x) exact, scaled-int
    // rate witnesses u = (10⁶x) div n, method-of-moments Beta prior as
    // one fixed tree, per-row posterior mean.
    "q_eb_shrinkage" ->
      """WITH per AS (
        |  SELECT l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |per2 AS (SELECT *, (1000000 * x) // n AS u FROM per),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS g,
        |               CAST(sum(u) AS BIGINT) AS su,
        |               CAST(sum(u * u) AS BIGINT) AS qu
        |        FROM per2),
        |pr AS (SELECT g,
        |              CAST(su AS DOUBLE) / CAST(g AS DOUBLE) / 1000000.0
        |                AS m,
        |              (CAST(g AS DOUBLE) * CAST(qu AS DOUBLE) -
        |               CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) /
        |                (CAST(g AS DOUBLE) * (CAST(g AS DOUBLE) - 1.0)) /
        |                1000000000000.0 AS v
        |       FROM mom),
        |pr2 AS (SELECT g, m, v, m * (1.0 - m) / v - 1.0 AS c FROM pr),
        |pr3 AS (SELECT g AS n_groups, m * c AS alpha, (1.0 - m) * c AS beta
        |        FROM pr2)
        |SELECT p.s_suppkey, p.n, p.x, pr3.n_groups, pr3.alpha, pr3.beta,
        |       CAST(p.x AS DOUBLE) / CAST(p.n AS DOUBLE) AS raw_rate,
        |       (CAST(p.x AS DOUBLE) + pr3.alpha) /
        |         (CAST(p.n AS DOUBLE) + pr3.alpha + pr3.beta) AS shrunk_rate
        |FROM per2 p CROSS JOIN pr3
        |ORDER BY p.s_suppkey""".stripMargin,

    // Durbin–Watson per priority: n-scaled residuals r = n·v − S keep
    // num/den exact (HUGEINT ↔ decimal(38,0)); VARCHAR-routed terminal
    // division.
    "q_durbin_watson" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT prio, CAST(sum(v) AS HUGEINT) AS s,
        |               CAST(count(*) AS BIGINT) AS nd
        |        FROM daily GROUP BY 1),
        |r AS (SELECT d.prio, d.day, t.nd,
        |             CAST(t.nd AS HUGEINT) * CAST(d.v AS HUGEINT) - t.s AS r
        |      FROM daily d JOIN tot t ON d.prio = t.prio),
        |rr AS (SELECT prio, nd, r,
        |              lag(r) OVER (PARTITION BY prio ORDER BY day) AS r_prev
        |       FROM r),
        |agg AS (SELECT prio, max(nd) AS n_days,
        |               sum(CASE WHEN r_prev IS NOT NULL
        |                   THEN (r - r_prev) * (r - r_prev)
        |                   ELSE CAST(0 AS HUGEINT) END) AS num,
        |               sum(r * r) AS den
        |        FROM rr GROUP BY 1)
        |SELECT prio, n_days,
        |       CAST(CAST(num AS VARCHAR) AS DOUBLE) /
        |         CAST(CAST(den AS VARCHAR) AS DOUBLE) AS dw
        |FROM agg ORDER BY prio""".stripMargin,

    // Cutler RSI-14 per priority: exact long deltas and trailing sums,
    // full windows only, one terminal division (0/0 → neutral 50).
    "q_rsi" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |d2 AS (SELECT prio, day, v,
        |              v - lag(v) OVER (PARTITION BY prio ORDER BY day)
        |                AS delta
        |       FROM daily),
        |d3 AS (SELECT * FROM d2 WHERE delta IS NOT NULL),
        |d4 AS (SELECT prio, day, v,
        |              count(*) OVER w AS n_w,
        |              CAST(sum(greatest(delta, 0)) OVER w AS BIGINT)
        |                AS sum_gain,
        |              CAST(sum(greatest(-delta, 0)) OVER w AS BIGINT)
        |                AS sum_loss
        |       FROM d3
        |       WINDOW w AS (PARTITION BY prio ORDER BY day
        |                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT prio, day, v AS day_cents, sum_gain, sum_loss,
        |       CASE WHEN sum_gain + sum_loss = 0 THEN 50.0
        |            ELSE 100.0 * CAST(sum_gain AS DOUBLE) /
        |                 CAST(sum_gain + sum_loss AS DOUBLE) END AS rsi
        |FROM d4 WHERE n_w = 14
        |ORDER BY prio, day""".stripMargin,

    "q_closeness" -> closenessOracleSql,
    "q_harmonic" -> harmonicOracleSql,
    "q_moran" -> moranOracleSql("moran"),
    "q_geary" -> moranOracleSql("geary"),
    "q_katz" -> katzOracleSql,

    // Cliff's delta: bounded-domain pair counting (≤50×50), exact longs,
    // one terminal division.
    "q_cliffs_delta" ->
      """WITH counts AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS cr,
        |         CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS cn
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |g AS (SELECT CAST(sum(CASE WHEN a.q > b.q THEN a.cr * b.cn
        |                   ELSE 0 END) AS BIGINT) AS n_gt,
        |             CAST(sum(CASE WHEN a.q < b.q THEN a.cr * b.cn
        |                   ELSE 0 END) AS BIGINT) AS n_lt
        |      FROM counts a CROSS JOIN counts b),
        |ns AS (SELECT CAST(sum(cr) AS BIGINT) AS n_r,
        |              CAST(sum(cn) AS BIGINT) AS n_n FROM counts)
        |SELECT n_r, n_n, n_gt, n_lt,
        |       CAST(n_gt - n_lt AS DOUBLE) / CAST(n_r * n_n AS DOUBLE)
        |         AS cliffs_delta
        |FROM ns CROSS JOIN g""".stripMargin,

    // Hodges–Lehmann: counts convolution over the ±49 difference
    // domain, exact cumulative selection, midpoint is the one IEEE op.
    "q_hodges_lehmann" ->
      """WITH counts AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS cr,
        |         CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS cn
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |diffs AS (SELECT a.q - b.q AS d,
        |                 CAST(sum(a.cr * b.cn) AS BIGINT) AS w
        |          FROM counts a CROSS JOIN counts b GROUP BY 1
        |          HAVING sum(a.cr * b.cn) > 0),
        |cum AS (SELECT d, CAST(sum(w) OVER (ORDER BY d
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                AS BIGINT) AS cum
        |        FROM diffs),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS t_pairs FROM diffs),
        |lo AS (SELECT min(d) AS hl_lo FROM cum, tot
        |       WHERE cum >= (t_pairs + 1) // 2),
        |hi AS (SELECT min(d) AS hl_hi FROM cum, tot
        |       WHERE cum >= t_pairs // 2 + 1)
        |SELECT t_pairs, hl_lo, hl_hi,
        |       CAST(hl_lo + hl_hi AS DOUBLE) / 2.0 AS hl_shift
        |FROM tot CROSS JOIN lo CROSS JOIN hi""".stripMargin,

    // Stratified ATE: per-segment exact (n, n_t, Σy) — per-stratum
    // means are the only divisions, no cross-stratum accumulation.
    "q_strat_ate" ->
      """SELECT c.c_mktsegment AS segment,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |       CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |                 AS BIGINT) ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |              THEN 1 ELSE 0 END) AS DOUBLE) AS mean_t_cents,
        |       CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
        |            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |                 AS BIGINT) ELSE 0 END) AS DOUBLE) /
        |         CAST(count(*) - sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |              THEN 1 ELSE 0 END) AS DOUBLE) AS mean_c_cents,
        |       CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |                 AS BIGINT) ELSE 0 END) AS DOUBLE) /
        |         CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |              THEN 1 ELSE 0 END) AS DOUBLE) -
        |       CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
        |            THEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |                 AS BIGINT) ELSE 0 END) AS DOUBLE) /
        |         CAST(count(*) - sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |              THEN 1 ELSE 0 END) AS DOUBLE) AS ate_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Granger F: cleared-denominator centered moments (HUGEINT ↔
    // decimal(38,0), VARCHAR-routed), Cramer 2×2 fixed tree.
    "q_granger" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS y,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |t AS (SELECT a.y AS y, b.y AS y1, b.x AS x1
        |      FROM daily a JOIN daily b ON a.day = b.day + 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(y) AS HUGEINT) AS sy,
        |             CAST(sum(y1) AS HUGEINT) AS sy1,
        |             CAST(sum(x1) AS HUGEINT) AS sx1,
        |             sum(CAST(y AS HUGEINT) * y) AS syy,
        |             sum(CAST(y1 AS HUGEINT) * y1) AS sy1y1,
        |             sum(CAST(x1 AS HUGEINT) * x1) AS sx1x1,
        |             sum(CAST(y AS HUGEINT) * y1) AS syy1,
        |             sum(CAST(y AS HUGEINT) * x1) AS syx1,
        |             sum(CAST(y1 AS HUGEINT) * x1) AS sy1x1
        |      FROM t),
        |c AS (SELECT n,
        |  CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS cyy,
        |  CAST(CAST(n * sy1y1 - sy1 * sy1 AS VARCHAR) AS DOUBLE) AS c11,
        |  CAST(CAST(n * sx1x1 - sx1 * sx1 AS VARCHAR) AS DOUBLE) AS c22,
        |  CAST(CAST(n * syy1 - sy * sy1 AS VARCHAR) AS DOUBLE) AS cy1,
        |  CAST(CAST(n * syx1 - sy * sx1 AS VARCHAR) AS DOUBLE) AS cy2,
        |  CAST(CAST(n * sy1x1 - sy1 * sx1 AS VARCHAR) AS DOUBLE) AS c12
        |  FROM s),
        |f AS (SELECT n, cyy - cy1 * cy1 / c11 AS rss_r,
        |             c11 * c22 - c12 * c12 AS det, cyy, cy1, cy2, c11,
        |             c12, c22
        |      FROM c),
        |b AS (SELECT n, rss_r,
        |             (c22 * cy1 - c12 * cy2) / det AS b1,
        |             (c11 * cy2 - c12 * cy1) / det AS b2,
        |             cyy, cy1, cy2
        |      FROM f),
        |u AS (SELECT n, b1, b2, rss_r,
        |             cyy - (b1 * cy1 + b2 * cy2) AS rss_u
        |      FROM b)
        |SELECT n, b1, b2,
        |       (rss_r - rss_u) / (rss_u / CAST(n - 3 AS DOUBLE))
        |         AS f_granger
        |FROM u""".stripMargin,

    // MCC at the exact-mean threshold: integer threshold compare,
    // one conditional aggregate, HUGEINT four-factor denominator.
    "q_mcc" ->
      """WITH lbl AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
        |  FROM orders o LEFT JOIN (
        |    SELECT DISTINCT l_orderkey
        |    FROM lineitem WHERE l_returnflag = 'R') r
        |  ON o.o_orderkey = r.l_orderkey),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(v) AS BIGINT) AS s FROM lbl),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * v >= t.s AND y = 1
        |         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * v >= t.s AND y = 0
        |         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * v < t.s AND y = 0
        |         THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * v < t.s AND y = 1
        |         THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM lbl, tot t)
        |SELECT tp, fp, tn, fn,
        |       CAST(CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
        |            AS VARCHAR) AS DOUBLE) /
        |       sqrt(CAST(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) *
        |            (tn + fp) * (tn + fn) AS VARCHAR) AS DOUBLE)) AS mcc
        |FROM cells""".stripMargin,

    // Cook's distance: cleared-denominator moments, exact scaled
    // residual R = Cxx·v − Cxy·u, closed-form RSS — per-row fixed tree.
    "q_cooks" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS y,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS HUGEINT) AS sx,
        |             CAST(sum(y) AS HUGEINT) AS sy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy,
        |             sum(CAST(y AS HUGEINT) * y) AS syy
        |      FROM daily),
        |c AS (SELECT n, sx, sy,
        |             n * sxx - sx * sx AS cxx,
        |             n * sxy - sx * sy AS cxy,
        |             n * syy - sy * sy AS cyy
        |      FROM s),
        |c2 AS (SELECT n, sx, sy, cxx, cxy,
        |              CAST(n AS DOUBLE) AS nd,
        |              CAST(CAST(cxx AS VARCHAR) AS DOUBLE) AS cxxd,
        |              (CAST(CAST(cyy AS VARCHAR) AS DOUBLE) -
        |               CAST(CAST(cxy AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(cxy AS VARCHAR) AS DOUBLE) /
        |               CAST(CAST(cxx AS VARCHAR) AS DOUBLE)) /
        |              (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS rss
        |       FROM c),
        |c3 AS (SELECT *, rss / (nd - 2.0) AS s2 FROM c2),
        |rows_ AS (
        |  SELECT d.day, d.x, d.y, c3.nd, c3.cxxd, c3.s2,
        |         CAST(c3.n AS HUGEINT) * d.x - c3.sx AS u,
        |         c3.cxx * (CAST(c3.n AS HUGEINT) * d.y - c3.sy) -
        |           c3.cxy * (CAST(c3.n AS HUGEINT) * d.x - c3.sx) AS r
        |  FROM daily d, c3),
        |eh AS (SELECT day, x, y, s2,
        |              CAST(CAST(r AS VARCHAR) AS DOUBLE) / (nd * cxxd) AS e,
        |              1.0 / nd +
        |                CAST(CAST(u AS VARCHAR) AS DOUBLE) *
        |                CAST(CAST(u AS VARCHAR) AS DOUBLE) / (nd * cxxd)
        |                AS h
        |       FROM rows_)
        |SELECT day, x, y, h AS leverage,
        |       (e * e * h) / ((2.0 * s2) * ((1.0 - h) * (1.0 - h)))
        |         AS cooks_d
        |FROM eh
        |ORDER BY cooks_d DESC, day LIMIT 20""".stripMargin,

    // Blinder–Oaxaca: one conditional aggregate for both groups' exact
    // moments, per-group closed-form slope, fixed decomposition tree.
    "q_oaxaca" ->
      """WITH li AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x
        |            FROM lineitem GROUP BY 1),
        |base AS (
        |  SELECT c.c_mktsegment = 'BUILDING' AS in_a, li.x,
        |         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS y
        |  FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
        |       JOIN customer c ON o.o_custkey = c.c_custkey),
        |s AS (SELECT
        |  CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN in_a THEN x ELSE 0 END) AS BIGINT) AS sx_a,
        |  CAST(sum(CASE WHEN in_a THEN y ELSE 0 END) AS BIGINT) AS sy_a,
        |  sum(CASE WHEN in_a THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_a,
        |  sum(CASE WHEN in_a THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_a,
        |  CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN NOT in_a THEN x ELSE 0 END) AS BIGINT) AS sx_b,
        |  CAST(sum(CASE WHEN NOT in_a THEN y ELSE 0 END) AS BIGINT) AS sy_b,
        |  sum(CASE WHEN NOT in_a THEN CAST(x AS HUGEINT) * x ELSE 0 END)
        |    AS sxx_b,
        |  sum(CASE WHEN NOT in_a THEN CAST(x AS HUGEINT) * y ELSE 0 END)
        |    AS sxy_b
        |  FROM base),
        |g AS (SELECT n_a, n_b,
        |  CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mxa,
        |  CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mya,
        |  CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mxb,
        |  CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS myb,
        |  CAST(CAST(CAST(n_a AS HUGEINT) * sxy_a -
        |       CAST(sx_a AS HUGEINT) * sy_a AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(CAST(n_a AS HUGEINT) * sxx_a -
        |       CAST(sx_a AS HUGEINT) * sx_a AS VARCHAR) AS DOUBLE) AS ba,
        |  CAST(CAST(CAST(n_b AS HUGEINT) * sxy_b -
        |       CAST(sx_b AS HUGEINT) * sy_b AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(CAST(n_b AS HUGEINT) * sxx_b -
        |       CAST(sx_b AS HUGEINT) * sx_b AS VARCHAR) AS DOUBLE) AS bb
        |  FROM s)
        |SELECT n_a, n_b, mya - myb AS gap_cents,
        |       bb * (mxa - mxb) AS explained_cents,
        |       (mya - myb) - bb * (mxa - mxb) AS unexplained_cents,
        |       ba AS b_a, bb AS b_b
        |FROM g""".stripMargin,

    // Atkinson(ε=0.5): floor-scaled √spend accumulates exactly; EDE/μ
    // close as a fixed tree.
    "q_atkinson" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS sy,
        |               CAST(sum(CAST(floor(sqrt(CAST(y AS DOUBLE)) * 1000.0)
        |                    AS BIGINT)) AS BIGINT) AS sr
        |        FROM spend)
        |SELECT n,
        |       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
        |       (CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0)) *
        |         (CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0))
        |         AS ede_cents,
        |       1.0 - (CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0)) *
        |             (CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0)) /
        |             (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS atkinson
        |FROM agg""".stripMargin,

    // Burt's constraint: floor-scaled integer weights, wedge join over
    // the robust-tie (support ≥ 5) co-supply graph, exact squared-term
    // sums, one division.
    "q_constraint" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |sup AS MATERIALIZED (
        |  SELECT x.l_suppkey AS a, y.l_suppkey AS b,
        |         CAST(count(*) AS BIGINT) AS support
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_suppkey < y.l_suppkey
        |  GROUP BY 1, 2),
        |thr AS (SELECT greatest(CAST(5 AS BIGINT),
        |                        sum(support) // count(*)) AS t FROM sup),
        |e AS MATERIALIZED (
        |  SELECT a, b FROM sup, thr WHERE support >= t),
        |und AS MATERIALIZED (
        |  SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |deg AS MATERIALIZED (
        |  SELECT a AS node, CAST(count(*) AS BIGINT) AS deg,
        |         1000000 // count(*) AS p
        |  FROM und GROUP BY 1),
        |wedges AS (
        |  SELECT w1.a AS i, w2.b AS j, CAST(sum(dq.p) AS BIGINT) AS cn
        |  FROM und w1 JOIN und w2 ON w1.b = w2.a AND w1.a <> w2.b
        |       JOIN deg dq ON w1.b = dq.node AND dq.deg <= 1024
        |  GROUP BY 1, 2),
        |terms AS (
        |  SELECT u.a AS i, d.deg,
        |         1000000000000 // d.deg +
        |           (1000000 * coalesce(w.cn, 0)) // d.deg AS term12
        |  FROM und u LEFT JOIN wedges w ON u.a = w.i AND u.b = w.j
        |       JOIN deg d ON u.a = d.node),
        |cw AS (SELECT i AS node, deg,
        |              sum(CAST(term12 AS HUGEINT) * term12) AS c_w
        |       FROM terms GROUP BY 1, 2)
        |SELECT node, deg,
        |       CAST(CAST(c_w AS VARCHAR) AS DOUBLE) / 1e24 AS burt_constraint
        |FROM cw
        |ORDER BY burt_constraint DESC, node LIMIT 20""".stripMargin,

    // Ljung–Box Q over the first three lag-join cleared-denominator
    // autocorrelations; fixed tree over (n, r1, r2, r3).
    "q_ljung_box" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(a.v) AS BIGINT) AS sx,
        |              CAST(sum(b.v) AS BIGINT) AS sy,
        |              sum(CAST(a.v AS HUGEINT) * a.v) AS sxx,
        |              sum(CAST(a.v AS HUGEINT) * b.v) AS sxy,
        |              sum(CAST(b.v AS HUGEINT) * b.v) AS syy
        |       FROM daily a JOIN daily b ON b.day = a.day + 1),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(a.v) AS BIGINT) AS sx,
        |              CAST(sum(b.v) AS BIGINT) AS sy,
        |              sum(CAST(a.v AS HUGEINT) * a.v) AS sxx,
        |              sum(CAST(a.v AS HUGEINT) * b.v) AS sxy,
        |              sum(CAST(b.v AS HUGEINT) * b.v) AS syy
        |       FROM daily a JOIN daily b ON b.day = a.day + 2),
        |s3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(a.v) AS BIGINT) AS sx,
        |              CAST(sum(b.v) AS BIGINT) AS sy,
        |              sum(CAST(a.v AS HUGEINT) * a.v) AS sxx,
        |              sum(CAST(a.v AS HUGEINT) * b.v) AS sxy,
        |              sum(CAST(b.v AS HUGEINT) * b.v) AS syy
        |       FROM daily a JOIN daily b ON b.day = a.day + 3),
        |r AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
        |  (SELECT CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS VARCHAR) AS DOUBLE) /
        |          sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |                         CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(CAST(n AS HUGEINT) * syy -
        |                         CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |   FROM s1) AS r1,
        |  (SELECT CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS VARCHAR) AS DOUBLE) /
        |          sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |                         CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(CAST(n AS HUGEINT) * syy -
        |                         CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |   FROM s2) AS r2,
        |  (SELECT CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS VARCHAR) AS DOUBLE) /
        |          sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |                         CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
        |               CAST(CAST(CAST(n AS HUGEINT) * syy -
        |                         CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |   FROM s3) AS r3)
        |SELECT n_days, r1, r2, r3,
        |       CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0) *
        |         (r1 * r1 / (CAST(n_days AS DOUBLE) - 1.0) +
        |          r2 * r2 / (CAST(n_days AS DOUBLE) - 2.0) +
        |          r3 * r3 / (CAST(n_days AS DOUBLE) - 3.0)) AS q_lb
        |FROM r""".stripMargin,

    // Arc elasticity per brand: unit-price denominators cancel, exact
    // HUGEINT products, one terminal division per brand.
    "q_elasticity" ->
      """WITH be AS (
        |  SELECT p.p_brand AS brand,
        |    CAST(sum(CASE WHEN l.l_shipdate < TIMESTAMP '1998-01-01'
        |         THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS q1,
        |    CAST(sum(CASE WHEN l.l_shipdate < TIMESTAMP '1998-01-01'
        |         THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01'
        |         THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS q2,
        |    CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01'
        |         THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) ELSE 0 END) AS BIGINT) AS s2
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1
        |  HAVING q1 > 0 AND q2 > 0)
        |SELECT brand, q1, q2,
        |       CAST(CAST(CAST(q2 - q1 AS HUGEINT) *
        |            (CAST(s2 AS HUGEINT) * q1 + CAST(s1 AS HUGEINT) * q2)
        |            AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(q2 + q1 AS HUGEINT) *
        |            (CAST(s2 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * q2)
        |            AS VARCHAR) AS DOUBLE) AS elasticity
        |FROM be ORDER BY brand""".stripMargin,

    // Price-volume-mix bridge per brand: exact cleared-fraction volume
    // effect, price effect closes the bridge to Δrev exactly.
    "q_pvm" ->
      """WITH be AS (
        |  SELECT p.p_brand AS brand,
        |    CAST(sum(CASE WHEN l.l_shipdate < TIMESTAMP '1998-01-01'
        |         THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS q1,
        |    CAST(sum(CASE WHEN l.l_shipdate < TIMESTAMP '1998-01-01'
        |         THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01'
        |         THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS q2,
        |    CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01'
        |         THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) ELSE 0 END) AS BIGINT) AS s2
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1
        |  HAVING q1 > 0 AND q2 > 0)
        |SELECT brand, s1 AS rev1_cents, s2 AS rev2_cents,
        |       CAST(s2 - s1 AS BIGINT) AS delta_cents,
        |       CAST(CAST(CAST(q2 - q1 AS HUGEINT) * s1 AS VARCHAR) AS DOUBLE)
        |         / CAST(q1 AS DOUBLE) AS volume_effect,
        |       CAST(s2 - s1 AS DOUBLE) -
        |         CAST(CAST(CAST(q2 - q1 AS HUGEINT) * s1 AS VARCHAR) AS DOUBLE)
        |           / CAST(q1 AS DOUBLE) AS price_effect
        |FROM be ORDER BY brand""".stripMargin,

    // Bhattacharyya/Hellinger: floor-scaled per-bin √(cr·cn) over the
    // bounded quantity domain, fixed closing tree.
    "q_hellinger" ->
      """WITH counts AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS cr,
        |         CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS cn
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |agg AS (SELECT CAST(sum(cr) AS BIGINT) AS n_r,
        |               CAST(sum(cn) AS BIGINT) AS n_n,
        |               CAST(sum(CAST(floor(sqrt(CAST(cr * cn AS DOUBLE)) *
        |                    1000.0) AS BIGINT)) AS BIGINT) AS sb
        |        FROM counts)
        |SELECT n_r, n_n,
        |       CAST(sb AS DOUBLE) /
        |         (1000.0 * sqrt(CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE)))
        |         AS bhattacharyya,
        |       sqrt(1.0 - CAST(sb AS DOUBLE) /
        |         (1000.0 * sqrt(CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))))
        |         AS hellinger
        |FROM agg""".stripMargin,

    // Weekly DFT bin: pinned floor-scaled twiddle integers, n-scaled
    // exact residuals, Parseval-normalized share.
    "q_spectrum" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(v) AS HUGEINT) AS s,
        |               CAST(count(*) AS BIGINT) AS n FROM daily),
        |tw AS (SELECT * FROM (VALUES
        |  (0, CAST(1000000 AS HUGEINT), CAST(0 AS HUGEINT)),
        |  (1, CAST(623489 AS HUGEINT), CAST(781831 AS HUGEINT)),
        |  (2, CAST(-222521 AS HUGEINT), CAST(974927 AS HUGEINT)),
        |  (3, CAST(-900969 AS HUGEINT), CAST(433883 AS HUGEINT)),
        |  (4, CAST(-900969 AS HUGEINT), CAST(-433884 AS HUGEINT)),
        |  (5, CAST(-222521 AS HUGEINT), CAST(-974928 AS HUGEINT)),
        |  (6, CAST(623489 AS HUGEINT), CAST(-781832 AS HUGEINT)))
        |  t(k, c, si)),
        |sums AS (
        |  SELECT max(t.n) AS n_days,
        |         sum((CAST(t.n AS HUGEINT) * d.v - t.s) * tw.c) AS a,
        |         sum((CAST(t.n AS HUGEINT) * d.v - t.s) * tw.si) AS b,
        |         sum((CAST(t.n AS HUGEINT) * d.v - t.s) *
        |             (CAST(t.n AS HUGEINT) * d.v - t.s)) AS rr
        |  FROM daily d, tot t, tw
        |  WHERE tw.k = d.day % 7)
        |SELECT n_days,
        |       (CAST(CAST(a AS VARCHAR) AS DOUBLE) *
        |          CAST(CAST(a AS VARCHAR) AS DOUBLE) +
        |        CAST(CAST(b AS VARCHAR) AS DOUBLE) *
        |          CAST(CAST(b AS VARCHAR) AS DOUBLE)) /
        |       (1e12 * CAST(n_days AS DOUBLE) *
        |        CAST(CAST(rr AS VARCHAR) AS DOUBLE)) AS weekly_share
        |FROM sums""".stripMargin,

    "q_ktruss" -> ktrussOracleSql,

    // Group-sequential: exact day-fifth cuts, cumulative Welch z per
    // look, pinned O'Brien–Fleming boundary literals.
    "q_group_sequential" ->
      """WITH base AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         o_orderpriority = '1-URGENT' AS z,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v
        |  FROM orders),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM base),
        |slices AS (
        |  SELECT least(5, ((day - s.d0) * 5) // (s.d1 - s.d0 + 1) + 1)
        |           AS slice,
        |         CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |         CAST(sum(CASE WHEN z THEN v ELSE 0 END) AS BIGINT) AS st,
        |         sum(CASE WHEN z THEN CAST(v AS HUGEINT) * v ELSE 0 END)
        |           AS qt,
        |         CAST(sum(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT)
        |           AS nc,
        |         CAST(sum(CASE WHEN NOT z THEN v ELSE 0 END) AS BIGINT)
        |           AS sc,
        |         sum(CASE WHEN NOT z THEN CAST(v AS HUGEINT) * v
        |             ELSE 0 END) AS qc
        |  FROM base, span s GROUP BY 1),
        |cum AS (
        |  SELECT l.look,
        |         CAST(sum(nt) AS BIGINT) AS nt,
        |         CAST(sum(st) AS BIGINT) AS st,
        |         sum(qt) AS qt,
        |         CAST(sum(nc) AS BIGINT) AS nc,
        |         CAST(sum(sc) AS BIGINT) AS sc,
        |         sum(qc) AS qc
        |  FROM slices JOIN (SELECT unnest(generate_series(1, 5)) AS look) l
        |    ON slices.slice <= l.look
        |  GROUP BY 1),
        |zc AS (
        |  SELECT look, nt AS n_t, nc AS n_c,
        |         (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) -
        |          CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) /
        |         sqrt(((CAST(CAST(qt AS VARCHAR) AS DOUBLE) -
        |                CAST(st AS DOUBLE) * CAST(st AS DOUBLE) /
        |                CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0)) /
        |              CAST(nt AS DOUBLE) +
        |              ((CAST(CAST(qc AS VARCHAR) AS DOUBLE) -
        |                CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) /
        |                CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0)) /
        |              CAST(nc AS DOUBLE)) AS z,
        |         CAST(CASE look WHEN 1 THEN 4.8769 WHEN 2 THEN 3.3569
        |              WHEN 3 THEN 2.6803 WHEN 4 THEN 2.2898
        |              ELSE 2.0310 END AS DOUBLE) AS of_boundary
        |  FROM cum)
        |SELECT look, n_t, n_c, z, of_boundary,
        |       abs(z) > of_boundary AS crossed
        |FROM zc ORDER BY look""".stripMargin,

    // Hoover index: exact Σ|n·y − S|, one division.
    "q_hoover" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM spend)
        |SELECT t.n, t.s AS total_cents,
        |       CAST(CAST(sum(abs(CAST(t.n AS HUGEINT) * y - t.s))
        |            AS VARCHAR) AS DOUBLE) /
        |         (2.0 * CAST(t.n AS DOUBLE) * CAST(t.s AS DOUBLE))
        |         AS hoover
        |FROM spend, tot t GROUP BY t.n, t.s""".stripMargin,

    // Palma ratio: exact rank-cut tail sums, one division.
    "q_palma" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |r AS (SELECT y, row_number() OVER (ORDER BY y, o_custkey) AS r,
        |             count(*) OVER () AS nn
        |      FROM spend)
        |SELECT CAST(max(nn) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN r > nn - (nn + 9) // 10 THEN y ELSE 0 END)
        |            AS BIGINT) AS top10_cents,
        |       CAST(sum(CASE WHEN r <= (4 * nn) // 10 THEN y ELSE 0 END)
        |            AS BIGINT) AS bottom40_cents,
        |       CAST(sum(CASE WHEN r > nn - (nn + 9) // 10 THEN y ELSE 0 END)
        |            AS DOUBLE) /
        |       CAST(sum(CASE WHEN r <= (4 * nn) // 10 THEN y ELSE 0 END)
        |            AS DOUBLE) AS palma
        |FROM r""".stripMargin,

    // Lorenz asymmetry: exact integer mean compares, fixed tree.
    "q_lorenz_asym" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS s FROM spend)
        |SELECT t.n,
        |       CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * y < t.s
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |       CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * y < t.s
        |            THEN y ELSE 0 END) AS BIGINT) AS s_below,
        |       CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * y < t.s
        |            THEN 1 ELSE 0 END) AS DOUBLE) / CAST(t.n AS DOUBLE) +
        |       CAST(sum(CASE WHEN CAST(t.n AS HUGEINT) * y < t.s
        |            THEN y ELSE 0 END) AS DOUBLE) / CAST(t.s AS DOUBLE)
        |         AS lorenz_asymmetry
        |FROM spend, tot t GROUP BY t.n, t.s""".stripMargin,

    // Weekday-adjusted anomalies: n_w-scaled residual z per weekday,
    // exact moments, stable top-10 by |z|.
    "q_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         epoch_ms(o_orderdate) // 86400000 % 7 AS weekday,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT weekday, CAST(count(*) AS BIGINT) AS nw,
        |             CAST(sum(v) AS BIGINT) AS sw,
        |             sum(CAST(v AS HUGEINT) * v) AS qw
        |      FROM daily GROUP BY 1),
        |z AS (SELECT d.day, d.weekday, d.v AS day_cents,
        |             CAST(CAST(CAST(m.nw AS HUGEINT) * d.v - m.sw
        |                  AS VARCHAR) AS DOUBLE) /
        |             sqrt(CAST(m.nw AS DOUBLE) *
        |                  CAST(CAST(CAST(m.nw AS HUGEINT) * m.qw -
        |                       CAST(m.sw AS HUGEINT) * m.sw AS VARCHAR)
        |                       AS DOUBLE) /
        |                  CAST(m.nw - 1 AS DOUBLE)) AS z
        |      FROM daily d JOIN m ON d.weekday = m.weekday)
        |SELECT day, weekday, day_cents, z
        |FROM z ORDER BY abs(z) DESC, day LIMIT 10""".stripMargin,

    // X̄–R chart: exact weekly sums/ranges, pinned n=7 constants,
    // fixed limit trees, full chart emitted.
    "q_xbar_r" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |weeks AS (
        |  SELECT day // 7 AS week, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(v) AS BIGINT) AS s,
        |         CAST(max(v) - min(v) AS BIGINT) AS r
        |  FROM daily GROUP BY 1 HAVING count(*) = 7),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks,
        |             CAST(sum(s) AS BIGINT) AS ss,
        |             CAST(sum(r) AS BIGINT) AS sr FROM weeks),
        |f AS (SELECT w.week,
        |             CAST(w.s AS DOUBLE) / 7.0 AS xbar,
        |             CAST(w.r AS DOUBLE) AS r,
        |             CAST(c.ss AS DOUBLE) / CAST(c.n_weeks * 7 AS DOUBLE)
        |               AS x_center,
        |             CAST(c.sr AS DOUBLE) / CAST(c.n_weeks AS DOUBLE)
        |               AS r_center
        |      FROM weeks w, c)
        |SELECT week, xbar, r, x_center, r_center,
        |       x_center - 0.419 * r_center AS x_lcl,
        |       x_center + 0.419 * r_center AS x_ucl,
        |       0.076 * r_center AS r_lcl,
        |       1.924 * r_center AS r_ucl,
        |       xbar < x_center - 0.419 * r_center OR
        |       xbar > x_center + 0.419 * r_center OR
        |       r < 0.076 * r_center OR r > 1.924 * r_center
        |         AS out_of_control
        |FROM f ORDER BY week""".stripMargin,

    // Fixed-effect meta-analysis: exact per-stratum moments,
    // floor-scaled weights/effects for the exact pooled sums.
    "q_meta_fixed" ->
      """WITH base AS (
        |  SELECT c.c_mktsegment AS segment,
        |         o.o_orderpriority = '1-URGENT' AS z,
        |         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |per AS (
        |  SELECT segment,
        |         CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |         CAST(sum(CASE WHEN z THEN y ELSE 0 END) AS BIGINT) AS st,
        |         sum(CASE WHEN z THEN CAST(y AS HUGEINT) * y ELSE 0 END)
        |           AS qt,
        |         CAST(sum(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT)
        |           AS nc,
        |         CAST(sum(CASE WHEN NOT z THEN y ELSE 0 END) AS BIGINT)
        |           AS sc,
        |         sum(CASE WHEN NOT z THEN CAST(y AS HUGEINT) * y ELSE 0 END)
        |           AS qc
        |  FROM base GROUP BY 1),
        |eff AS (
        |  SELECT segment, nt, nc,
        |         CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) -
        |           CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS effect_cents,
        |         CAST(CAST(CAST(nt AS HUGEINT) * qt -
        |              CAST(st AS HUGEINT) * st AS VARCHAR) AS DOUBLE) /
        |           CAST(nt * (nt - 1) AS DOUBLE) / CAST(nt AS DOUBLE) +
        |         CAST(CAST(CAST(nc AS HUGEINT) * qc -
        |              CAST(sc AS HUGEINT) * sc AS VARCHAR) AS DOUBLE) /
        |           CAST(nc * (nc - 1) AS DOUBLE) / CAST(nc AS DOUBLE)
        |           AS var_effect
        |  FROM per),
        |scaled AS (
        |  SELECT *, CAST(floor(1e15 / var_effect) AS BIGINT) AS w_w,
        |         CAST(floor(effect_cents) AS BIGINT) AS e_w
        |  FROM eff),
        |pooled AS (SELECT CAST(sum(w_w * e_w) AS DOUBLE) /
        |                  CAST(sum(w_w) AS DOUBLE) AS pooled_effect_cents
        |           FROM scaled)
        |SELECT s.segment, s.nt AS n_t, s.nc AS n_c, s.effect_cents,
        |       s.var_effect, p.pooled_effect_cents,
        |       CAST(s.w_w AS DOUBLE) / 1e15 *
        |         (s.effect_cents - p.pooled_effect_cents) *
        |         (s.effect_cents - p.pooled_effect_cents) AS q_contrib
        |FROM scaled s, pooled p ORDER BY s.segment""".stripMargin,

    // Breslow–Day: floor-scaled MH odds ratio, per-stratum quadratic
    // root + χ² contribution as fixed trees.
    "q_breslow_day" ->
      """WITH returned AS (
        |  SELECT DISTINCT l_orderkey FROM lineitem
        |  WHERE l_returnflag = 'R'),
        |base AS (
        |  SELECT c.c_mktsegment AS segment,
        |         o.o_orderpriority = '1-URGENT' AS z,
        |         r.l_orderkey IS NOT NULL AS y
        |  FROM orders o
        |       LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
        |       JOIN customer c ON o.o_custkey = c.c_custkey),
        |cells AS (
        |  SELECT segment,
        |         CAST(sum(CASE WHEN z AND y THEN 1 ELSE 0 END) AS BIGINT)
        |           AS a,
        |         CAST(sum(CASE WHEN z AND NOT y THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b,
        |         CAST(sum(CASE WHEN NOT z AND y THEN 1 ELSE 0 END)
        |              AS BIGINT) AS c,
        |         CAST(sum(CASE WHEN NOT z AND NOT y THEN 1 ELSE 0 END)
        |              AS BIGINT) AS d
        |  FROM base GROUP BY 1),
        |cells2 AS (SELECT *, a + b + c + d AS n FROM cells),
        |orr AS (SELECT CAST(sum((1000000 * a * d) // n) AS DOUBLE) /
        |               CAST(sum((1000000 * b * c) // n) AS DOUBLE)
        |                 AS or_mh
        |        FROM cells2),
        |t AS (SELECT segment, a, b, c, d, or_mh,
        |             CAST(a + b AS DOUBLE) AS m1,
        |             CAST(a + c AS DOUBLE) AS n1,
        |             CAST(n AS DOUBLE) AS nd
        |      FROM cells2, orr),
        |q AS (SELECT segment, a, b, c, d, or_mh, m1, n1, nd,
        |             or_mh - 1.0 AS qa,
        |             -- OR*(m1+n1) pinned by a VARCHAR round-trip before
        |             -- the + (FMA-contraction barrier)
        |             0.0 - (CAST(CAST(or_mh * (m1 + n1) AS VARCHAR) AS DOUBLE)
        |                    + (nd - m1 - n1)) AS qb,
        |             or_mh * m1 * n1 AS qc
        |      FROM t),
        |e AS (SELECT segment, a, b, c, d, or_mh, m1, n1, nd,
        |             (0.0 - qb - sqrt(
        |                CAST(CAST(qb * qb AS VARCHAR) AS DOUBLE) -
        |                CAST(CAST(4.0 * qa * qc AS VARCHAR) AS DOUBLE))) /
        |               (2.0 * qa) AS e_a
        |      FROM q)
        |SELECT segment, a, b, c, d, or_mh, e_a,
        |       (CAST(a AS DOUBLE) - e_a) * (CAST(a AS DOUBLE) - e_a) *
        |         (1.0 / e_a + 1.0 / (m1 - e_a) + 1.0 / (n1 - e_a) +
        |          1.0 / (nd - m1 - n1 + e_a)) AS bd_chi2
        |FROM e ORDER BY segment""".stripMargin,

    // GK gamma / Somers' D: bounded 5×50 contingency, exact pair sums
    // over strictly-greater cell pairs, per-column tie squares.
    "q_gk_gamma" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS x,
        |         CAST(l.l_quantity AS BIGINT) AS y,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |cd AS (SELECT
        |  CAST(sum(CASE WHEN p.y < q.y THEN p.n * q.n ELSE 0 END)
        |       AS BIGINT) AS c,
        |  CAST(sum(CASE WHEN p.y > q.y THEN p.n * q.n ELSE 0 END)
        |       AS BIGINT) AS d
        |  FROM cells p JOIN cells q ON p.x < q.x),
        |ty AS (SELECT CAST(sum((ty * ty - tyy) // 2) AS BIGINT) AS t_y
        |       FROM (SELECT CAST(sum(n) AS BIGINT) AS ty,
        |                    CAST(sum(n * n) AS BIGINT) AS tyy
        |             FROM cells GROUP BY y))
        |SELECT c AS n_concordant, d AS n_discordant, t_y AS n_tied_y,
        |       CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE) AS gamma,
        |       CAST(c - d AS DOUBLE) / CAST(c + d + t_y AS DOUBLE)
        |         AS somers_d
        |FROM cd CROSS JOIN ty""".stripMargin,

    // Log-rank: floor-scaled exact O−E and hypergeometric-variance
    // terms summed over event times, one fixed χ² tree.
    "q_logrank" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         min(epoch_ms(o_orderdate) // 86400000) AS first_day,
        |         max(epoch_ms(o_orderdate) // 86400000) AS last_day
        |  FROM orders GROUP BY 1),
        |life AS (
        |  SELECT p.last_day - p.first_day AS t,
        |         c.c_mktsegment = 'BUILDING' AS g1,
        |         CASE WHEN p.last_day <
        |           (SELECT max(last_day) FROM per) - 90 THEN 1 ELSE 0 END
        |           AS event
        |  FROM per p JOIN customer c ON p.o_custkey = c.c_custkey),
        |grid AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt,
        |                CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
        |                  AS cnt1,
        |                CAST(sum(event) AS BIGINT) AS d,
        |                CAST(sum(CASE WHEN g1 THEN event ELSE 0 END)
        |                     AS BIGINT) AS d1
        |         FROM life GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
        |               CAST(sum(cnt1) AS BIGINT) AS n1_total FROM grid),
        |risk AS (
        |  SELECT t, cnt, cnt1, d, d1,
        |         (SELECT n_total FROM tot) -
        |           (CAST(sum(cnt) OVER w AS BIGINT) - cnt) AS n_t,
        |         (SELECT n1_total FROM tot) -
        |           (CAST(sum(cnt1) OVER w AS BIGINT) - cnt1) AS n1_t
        |  FROM grid
        |  WINDOW w AS (ORDER BY t
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |terms AS (
        |  SELECT 1000000 * d1 - (1000000 * d * n1_t) // n_t AS oe_w,
        |         CAST(CAST(1000000000000 AS HUGEINT) * d * n1_t *
        |              (n_t - n1_t) * (n_t - d) AS HUGEINT) //
        |           (n_t * n_t * (n_t - 1)) AS v_w
        |  FROM risk WHERE d > 0),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_event_times,
        |             CAST(sum(oe_w) AS BIGINT) AS u_w,
        |             CAST(sum(v_w) AS BIGINT) AS v_sum
        |      FROM terms)
        |SELECT t.n_total, t.n1_total, s.n_event_times,
        |       (CAST(u_w AS DOUBLE) / 1e6) * (CAST(u_w AS DOUBLE) / 1e6) /
        |         (CAST(v_sum AS DOUBLE) / 1e12) AS chi2_logrank
        |FROM s, tot t""".stripMargin,

    // ABC × XYZ: exact cumulative-share and CV classifications joined
    // into the 9-cell grid.
    "q_abc_xyz" ->
      """WITH li AS MATERIALIZED (
        |  SELECT l_partkey,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS cents,
        |         CAST(l_quantity AS BIGINT) AS q,
        |         epoch_ms(l_shipdate) // 604800000 AS week
        |  FROM lineitem),
        |rev AS (SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS v
        |        FROM li GROUP BY 1),
        |cum AS (SELECT l_partkey, v,
        |               CAST(sum(v) OVER (ORDER BY v DESC, l_partkey
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                 AS BIGINT) AS cum_v
        |        FROM rev),
        |tot AS (SELECT CAST(sum(v) AS BIGINT) AS total,
        |               CAST(count(*) AS BIGINT) AS n_parts_total FROM rev),
        |abc AS (SELECT l_partkey,
        |               CASE WHEN CAST(cum_v AS HUGEINT) * 100 <=
        |                         CAST(total AS HUGEINT) * 80 THEN 'A'
        |                    WHEN CAST(cum_v AS HUGEINT) * 100 <=
        |                         CAST(total AS HUGEINT) * 95 THEN 'B'
        |                    ELSE 'C' END AS abc
        |        FROM cum, tot),
        |weekly AS (SELECT l_partkey, week, CAST(sum(q) AS BIGINT) AS q
        |           FROM li GROUP BY 1, 2),
        |per AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(q) AS BIGINT) AS sq,
        |               CAST(sum(q * q) AS BIGINT) AS sqq
        |        FROM weekly GROUP BY 1),
        |xyz AS (SELECT l_partkey,
        |               CASE WHEN 4 * (n * sqq - sq * sq) <= sq * sq THEN 'X'
        |                    WHEN n * sqq - sq * sq <= sq * sq THEN 'Y'
        |                    ELSE 'Z' END AS xyz
        |        FROM per)
        |SELECT a.abc, x.xyz, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(count(*) AS DOUBLE) / CAST(t.n_parts_total AS DOUBLE)
        |         AS part_share
        |FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey, tot t
        |GROUP BY a.abc, x.xyz, t.n_parts_total
        |ORDER BY 1, 2""".stripMargin,

    // Spend-class migration: exact lower-median splits per era, full
    // outer join, 3×3 transition counts.
    "q_segment_migration" ->
      """WITH e1 AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS y
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1),
        |e2 AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS y
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  GROUP BY 1),
        |m1 AS (SELECT y AS m FROM (
        |         SELECT y, row_number() OVER (ORDER BY y) AS r,
        |                count(*) OVER () AS nn FROM e1)
        |       WHERE r = (nn + 1) // 2),
        |m2 AS (SELECT y AS m FROM (
        |         SELECT y, row_number() OVER (ORDER BY y) AS r,
        |                count(*) OVER () AS nn FROM e2)
        |       WHERE r = (nn + 1) // 2),
        |c1 AS (SELECT o_custkey,
        |              CASE WHEN y > m THEN 'HIGH' ELSE 'LOW' END AS cls_e1
        |       FROM e1, m1),
        |c2 AS (SELECT o_custkey,
        |              CASE WHEN y > m THEN 'HIGH' ELSE 'LOW' END AS cls_e2
        |       FROM e2, m2)
        |SELECT coalesce(c1.cls_e1, 'NONE') AS from_class,
        |       coalesce(c2.cls_e2, 'NONE') AS to_class,
        |       CAST(count(*) AS BIGINT) AS n_customers
        |FROM c1 FULL OUTER JOIN c2 ON c1.o_custkey = c2.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // NRR: per-customer era revenue pair, exact sums, two divisions.
    "q_nrr" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |              THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                   AS BIGINT) ELSE 0 END) AS BIGINT) AS rev1,
        |         CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |              THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                   AS BIGINT) ELSE 0 END) AS BIGINT) AS rev2
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(sum(rev1) AS BIGINT) AS base_rev,
        |             CAST(sum(CASE WHEN rev1 > 0 THEN rev2 ELSE 0 END)
        |                  AS BIGINT) AS retained_rev,
        |             CAST(sum(CASE WHEN rev1 = 0 THEN rev2 ELSE 0 END)
        |                  AS BIGINT) AS new_rev,
        |             CAST(sum(CASE WHEN rev1 > 0 AND rev2 > 0 THEN 1
        |                  ELSE 0 END) AS BIGINT) AS n_retained,
        |             CAST(sum(CASE WHEN rev1 > 0 THEN 1 ELSE 0 END)
        |                  AS BIGINT) AS n_base
        |      FROM per)
        |SELECT base_rev, retained_rev, new_rev, n_base, n_retained,
        |       CAST(retained_rev AS DOUBLE) / CAST(base_rev AS DOUBLE)
        |         AS nrr,
        |       CAST(n_retained AS DOUBLE) / CAST(n_base AS DOUBLE)
        |         AS logo_retention
        |FROM s""".stripMargin,

    // p-chart: exact weekly (x, n) + exact totals, fixed 3σ limit
    // tree, out-of-control weeks only.
    "q_p_chart" ->
      """WITH weekly AS (
        |  SELECT epoch_ms(l_shipdate) // 604800000 AS week,
        |         CAST(count(*) AS BIGINT) AS n_w,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS x_w
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS nn,
        |               CAST(sum(x_w) AS BIGINT) AS xx FROM weekly),
        |f AS (SELECT week, n_w, x_w,
        |             CAST(x_w AS DOUBLE) / CAST(n_w AS DOUBLE) AS p_week,
        |             CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) AS p_bar,
        |             CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) -
        |               3.0 * sqrt(CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) *
        |                 (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)) /
        |                 CAST(n_w AS DOUBLE)) AS lcl,
        |             CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) +
        |               3.0 * sqrt(CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) *
        |                 (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)) /
        |                 CAST(n_w AS DOUBLE)) AS ucl
        |      FROM weekly, tot)
        |SELECT week, n_w, x_w, p_week, p_bar, lcl, ucl,
        |       p_week < lcl OR p_week > ucl AS out_of_control
        |FROM f
        |ORDER BY week""".stripMargin,

    // Cpk: exact power sums, pinned spec limits, fixed capability tree.
    "q_cpk" ->
      """WITH s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS s1,
        |         CAST(sum(q * q) AS BIGINT) AS s2
        |  FROM (SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem)),
        |m AS (SELECT n,
        |             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |             -- products pinned by VARCHAR round-trips before the
        |             -- subtraction (FMA-contraction barrier)
        |             sqrt((CAST(CAST(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |                        AS VARCHAR) AS DOUBLE) -
        |                   CAST(CAST(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |                        AS VARCHAR) AS DOUBLE)) /
        |                  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |               AS sd
        |      FROM s)
        |SELECT n, mu AS mean_q, sd AS sd_q,
        |       (50.0 - 1.0) / (6.0 * sd) AS cp,
        |       least(50.0 - mu, mu - 1.0) / (3.0 * sd) AS cpk
        |FROM m""".stripMargin,

    // Sharpe/Sortino/Kelly: rank-join deltas, exact moment sums,
    // three fixed ratio trees.
    "q_risk_metrics" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, v, row_number() OVER (ORDER BY day) AS i
        |      FROM daily),
        |d AS (SELECT b.v - a.v AS d FROM r a JOIN r b ON b.i = a.i + 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(d) AS BIGINT) AS sd,
        |             sum(CAST(d AS HUGEINT) * d) AS sdd,
        |             sum(CASE WHEN d < 0 THEN CAST(d AS HUGEINT) * d
        |                 ELSE CAST(0 AS HUGEINT) END) AS sdn
        |      FROM d),
        |m AS (SELECT n,
        |             CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |             CAST(CAST(sdd AS VARCHAR) AS DOUBLE) /
        |               CAST(n AS DOUBLE) -
        |               (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) *
        |               (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) AS varp,
        |             sqrt(CAST(CAST(sdn AS VARCHAR) AS DOUBLE) /
        |               CAST(n AS DOUBLE)) AS ddev
        |      FROM s)
        |SELECT n AS n_deltas, mu AS mean_delta_cents,
        |       mu / sqrt(varp) AS sharpe,
        |       mu / ddev AS sortino,
        |       mu / varp AS kelly
        |FROM m""".stripMargin,

    // XYZ classification: exact-integer CV threshold compares, 3-row
    // class table.
    "q_xyz" ->
      """WITH weekly AS (
        |  SELECT l_partkey,
        |         epoch_ms(l_shipdate) // 604800000 AS week,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |per AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS sq,
        |         CAST(sum(q * q) AS BIGINT) AS sqq
        |  FROM weekly GROUP BY 1),
        |cls AS (
        |  SELECT *,
        |         CASE WHEN 4 * (n * sqq - sq * sq) <= sq * sq THEN 'X'
        |              WHEN n * sqq - sq * sq <= sq * sq THEN 'Y'
        |              ELSE 'Z' END AS cls
        |  FROM per),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_parts_total FROM per)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(sq) AS BIGINT) AS total_units,
        |       CAST(sum(n) AS BIGINT) AS total_weeks,
        |       CAST(count(*) AS DOUBLE) / CAST(t.n_parts_total AS DOUBLE)
        |         AS part_share
        |FROM cls, tot t GROUP BY cls, t.n_parts_total
        |ORDER BY cls""".stripMargin,

    // Safety stock: cleared-denominator σ, pinned z and √7, stable
    // top-20 ranking.
    "q_safety_stock" ->
      """WITH dd AS (
        |  SELECT l_partkey,
        |         epoch_ms(l_shipdate) // 86400000 AS day,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |per AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(q) AS BIGINT) AS sq,
        |         sum(CAST(q AS HUGEINT) * q) AS sqq
        |  FROM dd GROUP BY 1 HAVING count(*) >= 2),
        |s AS (
        |  SELECT l_partkey AS p_partkey, n_days,
        |         CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE)
        |           AS mean_daily_units,
        |         1.645 * sqrt(
        |           CAST(CAST(CAST(n_days AS HUGEINT) * sqq -
        |                CAST(sq AS HUGEINT) * sq AS VARCHAR) AS DOUBLE) /
        |           CAST(n_days * (n_days - 1) AS DOUBLE)) * sqrt(7.0)
        |           AS safety_stock
        |  FROM per)
        |SELECT p_partkey, n_days, mean_daily_units, safety_stock
        |FROM s ORDER BY safety_stock DESC, p_partkey LIMIT 20""".stripMargin,

    // DQ scorecard: pure-comparison conditional counts per value rule.
    "q_dq_scorecard" ->
      """WITH sj AS (
        |  SELECT l.l_shipdate, o.o_orderdate
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT * FROM (
        |  SELECT 'lineitem.quantity_positive' AS rule,
        |         CAST(count(*) AS BIGINT) AS n_total,
        |         CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_violations,
        |         CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
        |              AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |           AS violation_rate
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.discount_in_0_0.5', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
        |              THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
        |              THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.tax_in_0_0.5', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.5
        |              THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.5
        |              THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.returnflag_domain', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
        |              THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
        |              THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.ship_not_before_order', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN l_shipdate < o_orderdate
        |              THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(CASE WHEN l_shipdate < o_orderdate
        |              THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM sj
        |  UNION ALL
        |  SELECT 'orders.totalprice_positive', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |              AS BIGINT),
        |         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |              AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders.priority_domain', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
        |              '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        |              THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
        |              '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        |              THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'customer.acctbal_not_null', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT),
        |         CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
        |              AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM customer)
        |ORDER BY rule""".stripMargin,

    "q_dtw" -> dtwOracleSql,
    "q_matrix_profile" -> matrixProfileOracleSql,
    "q_haar" -> haarOracleSql,

    // Sharp RDD at the corpus midpoint: per-side closed-form OLS over
    // cleared-denominator moments, intercept gap at the cutoff.
    "q_rdd" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 -
        |           epoch_ms(TIMESTAMP '1998-01-01') // 86400000 AS x,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |f AS (SELECT x, y, x >= 0 AS r FROM daily
        |      WHERE x >= -180 AND x < 180),
        |s AS (SELECT
        |  CAST(sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
        |  CAST(sum(CASE WHEN NOT r THEN x ELSE 0 END) AS BIGINT) AS sx_l,
        |  CAST(sum(CASE WHEN NOT r THEN y ELSE 0 END) AS BIGINT) AS sy_l,
        |  sum(CASE WHEN NOT r THEN CAST(x AS HUGEINT) * x ELSE 0 END)
        |    AS sxx_l,
        |  sum(CASE WHEN NOT r THEN CAST(x AS HUGEINT) * y ELSE 0 END)
        |    AS sxy_l,
        |  CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        |  CAST(sum(CASE WHEN r THEN x ELSE 0 END) AS BIGINT) AS sx_r,
        |  CAST(sum(CASE WHEN r THEN y ELSE 0 END) AS BIGINT) AS sy_r,
        |  sum(CASE WHEN r THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_r,
        |  sum(CASE WHEN r THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_r
        |  FROM f),
        |b AS (SELECT n_l, n_r, sx_l, sy_l, sx_r, sy_r,
        |  CAST(CAST(CAST(n_l AS HUGEINT) * sxy_l -
        |       CAST(sx_l AS HUGEINT) * sy_l AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(CAST(n_l AS HUGEINT) * sxx_l -
        |       CAST(sx_l AS HUGEINT) * sx_l AS VARCHAR) AS DOUBLE) AS b_left,
        |  CAST(CAST(CAST(n_r AS HUGEINT) * sxy_r -
        |       CAST(sx_r AS HUGEINT) * sy_r AS VARCHAR) AS DOUBLE) /
        |  CAST(CAST(CAST(n_r AS HUGEINT) * sxx_r -
        |       CAST(sx_r AS HUGEINT) * sx_r AS VARCHAR) AS DOUBLE) AS b_right
        |  FROM s),
        |a AS (SELECT n_l, n_r, b_left, b_right,
        |  CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE) -
        |    b_left * (CAST(sx_l AS DOUBLE) / CAST(n_l AS DOUBLE)) AS a_left,
        |  CAST(sy_r AS DOUBLE) / CAST(n_r AS DOUBLE) -
        |    b_right * (CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE)) AS a_right
        |  FROM b)
        |SELECT n_l, n_r, a_left, a_right, b_left, b_right,
        |       a_right - a_left AS rdd_effect_cents
        |FROM a""".stripMargin,

    // Between-group Gini: cleared rational means make the pair sum an
    // exact integer; one terminal division.
    "q_gini_between" ->
      """WITH seg AS (
        |  SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS s
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |               CAST(sum(s) AS BIGINT) AS st,
        |               CAST(count(*) AS BIGINT) AS n_segments FROM seg),
        |ps AS (SELECT sum(abs(CAST(a.s AS HUGEINT) * b.n -
        |                     CAST(b.s AS HUGEINT) * a.n)) AS psum
        |       FROM seg a CROSS JOIN seg b)
        |SELECT n_segments, nt AS n,
        |       CAST(CAST(psum AS VARCHAR) AS DOUBLE) /
        |         (2.0 * CAST(nt AS DOUBLE) * CAST(st AS DOUBLE))
        |         AS gini_between
        |FROM tot CROSS JOIN ps""".stripMargin,

    // Chow break test: three closed-form RSS off one conditional
    // aggregate; fixed F tree.
    "q_chow" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         o_orderdate < TIMESTAMP '1998-01-01' AS era1,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS y,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT
        |  CAST(count(*) AS BIGINT) AS n_p,
        |  CAST(sum(x) AS HUGEINT) AS sx_p, CAST(sum(y) AS HUGEINT) AS sy_p,
        |  sum(CAST(x AS HUGEINT) * x) AS sxx_p,
        |  sum(CAST(x AS HUGEINT) * y) AS sxy_p,
        |  sum(CAST(y AS HUGEINT) * y) AS syy_p,
        |  CAST(sum(CASE WHEN era1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN era1 THEN x ELSE 0 END) AS HUGEINT) AS sx_a,
        |  CAST(sum(CASE WHEN era1 THEN y ELSE 0 END) AS HUGEINT) AS sy_a,
        |  sum(CASE WHEN era1 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_a,
        |  sum(CASE WHEN era1 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_a,
        |  sum(CASE WHEN era1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy_a,
        |  CAST(sum(CASE WHEN NOT era1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN NOT era1 THEN x ELSE 0 END) AS HUGEINT) AS sx_b,
        |  CAST(sum(CASE WHEN NOT era1 THEN y ELSE 0 END) AS HUGEINT) AS sy_b,
        |  sum(CASE WHEN NOT era1 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
        |    AS sxx_b,
        |  sum(CASE WHEN NOT era1 THEN CAST(x AS HUGEINT) * y ELSE 0 END)
        |    AS sxy_b,
        |  sum(CASE WHEN NOT era1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
        |    AS syy_b
        |  FROM daily),
        |r AS (SELECT n_p, n_a, n_b,
        |  (CAST(CAST(CAST(n_p AS HUGEINT) * syy_p - sy_p * sy_p AS VARCHAR)
        |        AS DOUBLE) -
        |   CAST(CAST(CAST(n_p AS HUGEINT) * sxy_p - sx_p * sy_p AS VARCHAR)
        |        AS DOUBLE) *
        |   CAST(CAST(CAST(n_p AS HUGEINT) * sxy_p - sx_p * sy_p AS VARCHAR)
        |        AS DOUBLE) /
        |   CAST(CAST(CAST(n_p AS HUGEINT) * sxx_p - sx_p * sx_p AS VARCHAR)
        |        AS DOUBLE)) /
        |  (CAST(n_p AS DOUBLE) * CAST(n_p AS DOUBLE)) AS rss_p,
        |  (CAST(CAST(CAST(n_a AS HUGEINT) * syy_a - sy_a * sy_a AS VARCHAR)
        |        AS DOUBLE) -
        |   CAST(CAST(CAST(n_a AS HUGEINT) * sxy_a - sx_a * sy_a AS VARCHAR)
        |        AS DOUBLE) *
        |   CAST(CAST(CAST(n_a AS HUGEINT) * sxy_a - sx_a * sy_a AS VARCHAR)
        |        AS DOUBLE) /
        |   CAST(CAST(CAST(n_a AS HUGEINT) * sxx_a - sx_a * sx_a AS VARCHAR)
        |        AS DOUBLE)) /
        |  (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)) AS rss_a,
        |  (CAST(CAST(CAST(n_b AS HUGEINT) * syy_b - sy_b * sy_b AS VARCHAR)
        |        AS DOUBLE) -
        |   CAST(CAST(CAST(n_b AS HUGEINT) * sxy_b - sx_b * sy_b AS VARCHAR)
        |        AS DOUBLE) *
        |   CAST(CAST(CAST(n_b AS HUGEINT) * sxy_b - sx_b * sy_b AS VARCHAR)
        |        AS DOUBLE) /
        |   CAST(CAST(CAST(n_b AS HUGEINT) * sxx_b - sx_b * sx_b AS VARCHAR)
        |        AS DOUBLE)) /
        |  (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)) AS rss_b
        |  FROM s)
        |SELECT n_p AS n, n_a, n_b, rss_p, rss_a, rss_b,
        |       ((rss_p - (rss_a + rss_b)) / 2.0) /
        |       ((rss_a + rss_b) / CAST(n_p - 4 AS DOUBLE)) AS f_chow
        |FROM r""".stripMargin,

    // One-sweep median polish: exact rank-selected cell medians,
    // sorted-array element selections for row/column effects.
    "q_median_polish" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |wd AS (SELECT prio, day % 7 AS weekday, day, v FROM daily),
        |cells AS (
        |  SELECT weekday, prio, v AS cell_median FROM (
        |    SELECT weekday, prio, v,
        |           row_number() OVER (PARTITION BY weekday, prio
        |                              ORDER BY v, day) AS r,
        |           count(*) OVER (PARTITION BY weekday, prio) AS nn
        |    FROM wd) WHERE r = (nn + 1) // 2),
        |re AS (SELECT weekday,
        |              list_sort(list(cell_median))[3] AS row_effect
        |       FROM cells GROUP BY 1),
        |cen AS (SELECT c.prio, c.weekday, c.cell_median, re.row_effect,
        |               c.cell_median - re.row_effect AS c2
        |        FROM cells c JOIN re ON c.weekday = re.weekday),
        |ce AS (SELECT prio, list_sort(list(c2))[4] AS col_effect
        |       FROM cen GROUP BY 1)
        |SELECT cen.weekday, cen.prio, cen.cell_median, cen.row_effect,
        |       ce.col_effect,
        |       CAST(cen.c2 - ce.col_effect AS BIGINT) AS residual
        |FROM cen JOIN ce ON cen.prio = ce.prio
        |ORDER BY cen.weekday, cen.prio""".stripMargin,

    // Leave-one-out 5-NN accuracy: exact integer distances, majority
    // with min-label tiebreak, one terminal division.
    "q_knn_acc" ->
      """WITH u AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, i AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
        |              AS BIGINT) AS u
        |  FROM embeddings, unnest(generate_series(1, len(embedding)))
        |    AS g(i)),
        |d AS (SELECT a.vec_id AS src, a.label AS src_label,
        |             b.vec_id AS dst, b.label AS dst_label,
        |             CAST(sum((a.u - b.u) * (a.u - b.u)) AS BIGINT) AS d2
        |      FROM u a JOIN u b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        |      GROUP BY 1, 2, 3, 4),
        |e AS (SELECT src, src_label, dst_label FROM (
        |        SELECT src, src_label, dst_label,
        |               row_number() OVER (PARTITION BY src
        |                                  ORDER BY d2, dst) AS rn
        |        FROM d) WHERE rn <= 5),
        |v AS (SELECT src, src_label, dst_label,
        |             CAST(count(*) AS BIGINT) AS cnt
        |      FROM e GROUP BY 1, 2, 3),
        |p AS (SELECT src_label, dst_label AS pred FROM (
        |        SELECT src_label, dst_label,
        |               row_number() OVER (PARTITION BY src
        |                 ORDER BY cnt DESC, dst_label) AS rn
        |        FROM v) WHERE rn = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN src_label = pred THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_correct,
        |       CAST(sum(CASE WHEN src_label = pred THEN 1 ELSE 0 END)
        |            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
        |FROM p""".stripMargin,

    // Dunn index: exact integer pair distances, min/max selections,
    // two correctly-rounded √ and one division.
    "q_dunn" ->
      """WITH u AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, i AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
        |              AS BIGINT) + 1000000 AS u
        |  FROM embeddings, unnest(generate_series(1, len(embedding)))
        |    AS g(i)),
        |d AS (SELECT a.label AS li, b.label AS lj,
        |             CAST(sum((a.u - b.u) * (a.u - b.u)) AS BIGINT) AS d2
        |      FROM u a JOIN u b ON a.dim = b.dim AND a.vec_id < b.vec_id
        |      GROUP BY a.vec_id, b.vec_id, a.label, b.label)
        |SELECT CAST(min(CASE WHEN li <> lj THEN d2 END) AS BIGINT)
        |         AS min_inter_d2,
        |       CAST(max(CASE WHEN li = lj THEN d2 END) AS BIGINT)
        |         AS max_intra_d2,
        |       sqrt(CAST(min(CASE WHEN li <> lj THEN d2 END) AS DOUBLE)) /
        |       sqrt(CAST(max(CASE WHEN li = lj THEN d2 END) AS DOUBLE))
        |         AS dunn
        |FROM d""".stripMargin,

    // Davies–Bouldin: floor-mean integer centroids (offset keeps sums
    // non-negative — // vs div parity), floored scatter sums, max-by
    // ratio with greatest-label tiebreak.
    "q_davies_bouldin" ->
      """WITH u AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, i AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
        |              AS BIGINT) + 1000000 AS u
        |  FROM embeddings, unnest(generate_series(1, len(embedding)))
        |    AS g(i)),
        |cent AS (SELECT label, dim, CAST(sum(u) AS BIGINT) //
        |                CAST(count(*) AS BIGINT) AS c
        |         FROM u GROUP BY 1, 2),
        |scat AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(w) AS BIGINT) AS sw
        |  FROM (SELECT u.vec_id, u.label,
        |               CAST(floor(sqrt(CAST(sum((u.u - c.c) * (u.u - c.c))
        |                    AS DOUBLE))) AS BIGINT) AS w
        |        FROM u JOIN cent c ON u.label = c.label AND u.dim = c.dim
        |        GROUP BY 1, 2)
        |  GROUP BY 1),
        |s AS (SELECT label, n, CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) AS s
        |      FROM scat),
        |cd AS (SELECT a.label AS li, b.label AS lj,
        |              CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS cd2
        |       FROM cent a JOIN cent b ON a.dim = b.dim
        |         AND a.label <> b.label
        |       GROUP BY 1, 2),
        |r AS (SELECT cd.li, cd.lj, si.n AS n_i, si.s AS s_i,
        |             (si.s + sj.s) / sqrt(CAST(cd.cd2 AS DOUBLE)) AS ratio
        |      FROM cd JOIN s si ON cd.li = si.label
        |           JOIN s sj ON cd.lj = sj.label)
        |SELECT li AS label, n_i AS n, s_i, lj AS nearest_label,
        |       ratio AS db_i
        |FROM (SELECT *, row_number() OVER (PARTITION BY li
        |        ORDER BY ratio DESC, lj DESC) AS rn FROM r)
        |WHERE rn = 1 ORDER BY label""".stripMargin,

    // ARI vs the 2-D grid clustering: exact contingency pair counts,
    // cleared-fraction adjustment, one division.
    "q_ari" ->
      """WITH pts AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |         CAST(floor((CAST(embedding[1] AS DOUBLE) + 1) * 5)
        |              AS BIGINT) * 100 +
        |         CAST(floor((CAST(embedding[2] AS DOUBLE) + 1) * 5)
        |              AS BIGINT) AS cell
        |  FROM embeddings),
        |cells AS (SELECT label, cell, CAST(count(*) AS BIGINT) AS nij
        |          FROM pts GROUP BY 1, 2),
        |sij AS (SELECT CAST(sum((nij * (nij - 1)) // 2) AS BIGINT) AS sc
        |        FROM cells),
        |sa AS (SELECT CAST(sum((ai * (ai - 1)) // 2) AS BIGINT) AS a,
        |              CAST(sum(ai) AS BIGINT) AS n
        |       FROM (SELECT CAST(sum(nij) AS BIGINT) AS ai
        |             FROM cells GROUP BY label)),
        |sb AS (SELECT CAST(sum((bj * (bj - 1)) // 2) AS BIGINT) AS b
        |       FROM (SELECT CAST(sum(nij) AS BIGINT) AS bj
        |             FROM cells GROUP BY cell)),
        |f AS (SELECT n, sc, a, b, (n * (n - 1)) // 2 AS t
        |      FROM sa CROSS JOIN sb CROSS JOIN sij)
        |SELECT n, sc, a, b, CAST(t AS BIGINT) AS t,
        |       CAST(CAST(2 * CAST(t AS HUGEINT) * sc -
        |            2 * CAST(a AS HUGEINT) * b AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(t AS HUGEINT) * (a + b) -
        |            2 * CAST(a AS HUGEINT) * b AS VARCHAR) AS DOUBLE)
        |         AS ari
        |FROM f""".stripMargin,

    // Temporal graph churn: era-split distinct edge sets, exact
    // intersection count, fixed tree.
    "q_graph_churn" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT l.l_suppkey AS a, -(o.o_custkey + 1) AS b,
        |         o.o_orderdate < TIMESTAMP '1998-01-01' AS era1
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e1 AS MATERIALIZED (SELECT DISTINCT a, b FROM pairs WHERE era1),
        |e2 AS MATERIALIZED (SELECT DISTINCT a, b FROM pairs WHERE NOT era1),
        |c1 AS (SELECT CAST(count(*) AS BIGINT) AS e1 FROM e1),
        |c2 AS (SELECT CAST(count(*) AS BIGINT) AS e2 FROM e2),
        |cc AS (SELECT CAST(count(*) AS BIGINT) AS common
        |       FROM e1 JOIN e2 ON e1.a = e2.a AND e1.b = e2.b)
        |SELECT e1, e2, common,
        |       CAST(common AS DOUBLE) / CAST(e1 + e2 - common AS DOUBLE)
        |         AS jaccard,
        |       CAST(e2 - common AS DOUBLE) / CAST(e2 AS DOUBLE) AS new_frac
        |FROM c1 CROSS JOIN c2 CROSS JOIN cc""".stripMargin,

    // Preferential attachment: old-degree vs new-edge-count Pearson,
    // cleared-denominator exact; zero-padded left join.
    "q_pref_attach" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT l.l_suppkey AS a, -(o.o_custkey + 1) AS b,
        |         o.o_orderdate < TIMESTAMP '1998-01-01' AS era1
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e1 AS MATERIALIZED (SELECT DISTINCT a, b FROM pairs WHERE era1),
        |e2 AS MATERIALIZED (SELECT DISTINCT a, b FROM pairs WHERE NOT era1),
        |ne AS MATERIALIZED (
        |  SELECT e2.a, e2.b FROM e2 ANTI JOIN e1
        |    ON e2.a = e1.a AND e2.b = e1.b),
        |deg1 AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |           SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1)
        |         GROUP BY 1),
        |nc AS (SELECT node, CAST(count(*) AS BIGINT) AS nc FROM (
        |         SELECT a AS node FROM ne UNION ALL SELECT b FROM ne)
        |       GROUP BY 1),
        |base AS (SELECT d.deg AS x, coalesce(n.nc, 0) AS y
        |         FROM deg1 d LEFT JOIN nc n ON d.node = n.node),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_new_edges FROM ne),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx,
        |             CAST(sum(y) AS BIGINT) AS sy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy,
        |             sum(CAST(y AS HUGEINT) * y) AS syy
        |      FROM base)
        |SELECT s.n AS n_nodes, tot.n_new_edges,
        |       CAST(CAST(CAST(s.n AS HUGEINT) * sxy -
        |            CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE) /
        |       sqrt(CAST(CAST(CAST(s.n AS HUGEINT) * sxx -
        |                 CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
        |            CAST(CAST(CAST(s.n AS HUGEINT) * syy -
        |                 CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |         AS r_pref
        |FROM s CROSS JOIN tot""".stripMargin,

    // Nelson–Aalen: exact floor-scaled hazard terms (10⁹·d) div n,
    // risk sets and the cumulative hazard from window cumsums.
    "q_nelson_aalen" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         min(epoch_ms(o_orderdate) // 86400000) AS first_day,
        |         max(epoch_ms(o_orderdate) // 86400000) AS last_day
        |  FROM orders GROUP BY 1),
        |life AS (
        |  SELECT last_day - first_day AS t,
        |         CASE WHEN last_day <
        |           (SELECT max(last_day) FROM per) - 90 THEN 1 ELSE 0 END
        |           AS event
        |  FROM per),
        |grid AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt,
        |                CAST(sum(event) AS BIGINT) AS d
        |         FROM life GROUP BY 1),
        |risk AS (
        |  SELECT t, cnt, d,
        |         (SELECT CAST(sum(cnt) AS BIGINT) FROM grid) -
        |           (CAST(sum(cnt) OVER (ORDER BY t
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) - cnt) AS n_risk
        |  FROM grid),
        |haz AS (SELECT t, n_risk, d,
        |               (1000000000 * d) // n_risk AS h
        |        FROM risk),
        |cum AS (SELECT t, n_risk, d,
        |               CAST(sum(h) OVER (ORDER BY t
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                 AS BIGINT) AS cum_h
        |        FROM haz)
        |SELECT t, n_risk, d,
        |       CAST(cum_h AS DOUBLE) / 1e9 AS na_cum_hazard
        |FROM cum WHERE d > 0 ORDER BY t""".stripMargin,

    // One-step Huber: exact rank-selected median/MAD anchors, integer
    // clip bounds, exact clipped sum, one division.
    "q_huber" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |med AS (SELECT y AS m FROM (
        |          SELECT y, row_number() OVER (ORDER BY y) AS r,
        |                 count(*) OVER () AS nn
        |          FROM spend) WHERE r = (nn + 1) // 2),
        |mad AS (SELECT ad AS mad FROM (
        |          SELECT abs(y - m) AS ad,
        |                 row_number() OVER (ORDER BY abs(y - m)) AS r,
        |                 count(*) OVER () AS nn
        |          FROM spend, med) WHERE r = (nn + 1) // 2),
        |clipped AS (
        |  SELECT m, mad,
        |         greatest(m - (3 * mad) // 2,
        |                  least(m + (3 * mad) // 2, y)) AS cy
        |  FROM spend, med, mad)
        |SELECT CAST(count(*) AS BIGINT) AS n, m AS median_cents,
        |       mad AS mad_cents,
        |       CAST(CAST(sum(cy) AS BIGINT) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE) AS huber_cents
        |FROM clipped GROUP BY m, mad""".stripMargin,

    // Wald IV vs OLS: cancelled-denominator arm contrast and
    // cleared-denominator moment slope off one conditional aggregate.
    "q_iv_wald" ->
      """WITH f AS (
        |  SELECT CAST(l.l_quantity AS BIGINT) AS x,
        |         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS y,
        |         o.o_orderpriority = '1-URGENT' AS z
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |s AS (SELECT
        |  CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |  CAST(sum(CASE WHEN z THEN x ELSE 0 END) AS BIGINT) AS sx1,
        |  CAST(sum(CASE WHEN NOT z THEN x ELSE 0 END) AS BIGINT) AS sx0,
        |  CAST(sum(CASE WHEN z THEN y ELSE 0 END) AS BIGINT) AS sy1,
        |  CAST(sum(CASE WHEN NOT z THEN y ELSE 0 END) AS BIGINT) AS sy0,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  sum(CAST(x AS HUGEINT) * x) AS sxx,
        |  sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM f)
        |SELECT n1, n0,
        |       CAST(CAST(CAST(n AS HUGEINT) * sxy -
        |            CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |            CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) AS b_ols,
        |       CAST(CAST(CAST(sy1 AS HUGEINT) * n0 -
        |            CAST(sy0 AS HUGEINT) * n1 AS VARCHAR) AS DOUBLE) /
        |       CAST(CAST(CAST(sx1 AS HUGEINT) * n0 -
        |            CAST(sx0 AS HUGEINT) * n1 AS VARCHAR) AS DOUBLE)
        |         AS b_wald
        |FROM s""".stripMargin,

    // Historical VaR/ES: k-th order statistic (k = ⌈n/20⌉) and exact
    // tail sum over rank-selected deltas; one terminal division.
    "q_var_es" ->
      """WITH daily AS (
        |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, v, row_number() OVER (ORDER BY day) AS i
        |      FROM daily),
        |d AS (SELECT b.day AS day, b.v - a.v AS delta
        |      FROM r a JOIN r b ON b.i = a.i + 1),
        |rk AS (SELECT day, delta,
        |              row_number() OVER (ORDER BY delta, day) AS r
        |       FROM d),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS n_deltas,
        |             CAST((count(*) + 19) // 20 AS BIGINT) AS k
        |      FROM rk)
        |SELECT k.n_deltas, k.k, CAST(max(delta) AS BIGINT) AS var_cents,
        |       CAST(CAST(sum(delta) AS BIGINT) AS DOUBLE) /
        |         CAST(k.k AS DOUBLE) AS es_cents
        |FROM rk, k WHERE rk.r <= k.k GROUP BY k.n_deltas, k.k""".stripMargin,

    // LOF k=5: µ-scaled integer coordinates → exact pairwise d², exact
    // reach-dist floors, integer-division lrd, ONE terminal division.
    "q_lof" ->
      """WITH u AS (
        |  SELECT vec_id, i AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
        |              AS BIGINT) AS u
        |  FROM embeddings, unnest(generate_series(1, len(embedding)))
        |    AS g(i)),
        |d AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |             CAST(sum((a.u - b.u) * (a.u - b.u)) AS BIGINT) AS d2
        |      FROM u a JOIN u b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        |      GROUP BY 1, 2),
        |e AS (SELECT src, dst, d2 FROM (
        |        SELECT src, dst, d2,
        |               row_number() OVER (PARTITION BY src
        |                                  ORDER BY d2, dst) AS rn
        |        FROM d) WHERE rn <= 5),
        |kd AS (SELECT src AS o, CAST(max(d2) AS BIGINT) AS kd2
        |       FROM e GROUP BY 1),
        |sw AS (SELECT e.src,
        |              CAST(sum(CAST(floor(sqrt(CAST(greatest(kd.kd2, e.d2)
        |                   AS DOUBLE))) AS BIGINT)) AS BIGINT) AS sum_w
        |       FROM e JOIN kd ON e.dst = kd.o GROUP BY 1),
        |l AS (SELECT src, sum_w, 5000000000000000 // greatest(sum_w, 1) AS lrdu
        |      FROM sw),
        |s AS (SELECT e.src, CAST(sum(lo.lrdu) AS BIGINT) AS sum_lrdu
        |      FROM e JOIN l lo ON e.dst = lo.src GROUP BY 1)
        |SELECT s.src AS vec_id, lp.sum_w, lp.lrdu,
        |       CAST(s.sum_lrdu AS DOUBLE) / CAST(5 * lp.lrdu AS DOUBLE)
        |         AS lof
        |FROM s JOIN l lp ON s.src = lp.src
        |ORDER BY lof DESC, vec_id LIMIT 20""".stripMargin
  )

  /** Shared CTE prefix for the labeled-BFS centrality oracles: 4 min-plus
    * relaxation rounds over (seed, node) state, seeds = the 4 lowest
    * supplier keys — the DuckDB replay of `KCore.labeledBfs`. */
  private def labeledBfsCtes(rounds: Int): String = {
    val relax = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT seed, node, min(dist) AS dist FROM (
         |    SELECT seed, node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT d.seed, e.b AS node, d.dist + 1 AS dist
         |    FROM und e JOIN d${i - 1} d ON e.a = d.node)
         |  GROUP BY seed, node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs)),
       |d0 AS MATERIALIZED (
       |  SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist FROM (
       |    SELECT CAST(s_suppkey AS BIGINT) AS seed FROM supplier
       |    ORDER BY s_suppkey LIMIT 4)),
       |$relax""".stripMargin
  }

  /** DuckDB replay of the supplier co-supply network-autocorrelation
    * frame shared by q_moran / q_geary: n-scaled residuals (HUGEINT),
    * edge sums, VARCHAR-routed terminal tree. */
  private def moranOracleSql(which: String): String = {
    val tail =
      if (which == "moran")
        """SELECT den.n AS n_nodes, es.e AS n_edges,
          |       -1.0 / CAST(den.n - 1 AS DOUBLE) AS expected_i,
          |       (CAST(den.n AS DOUBLE) *
          |          CAST(CAST(es.num2 AS VARCHAR) AS DOUBLE)) /
          |       (CAST(es.e AS DOUBLE) *
          |          CAST(CAST(den.den AS VARCHAR) AS DOUBLE)) AS moran_i
          |FROM den CROSS JOIN es""".stripMargin
      else
        """SELECT den.n AS n_nodes, es.e AS n_edges,
          |       (CAST(den.n - 1 AS DOUBLE) *
          |          CAST(CAST(es.gnum AS VARCHAR) AS DOUBLE)) /
          |       ((2.0 * CAST(es.e AS DOUBLE)) *
          |          CAST(CAST(den.den AS VARCHAR) AS DOUBLE)) AS geary_c
          |FROM den CROSS JOIN es""".stripMargin
    s"""WITH li AS MATERIALIZED (
       |  SELECT l_orderkey, l_suppkey,
       |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
       |              AS BIGINT) AS cents
       |  FROM lineitem),
       |vals AS (SELECT l_suppkey AS node, CAST(sum(cents) AS BIGINT) AS v
       |         FROM li GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(v) AS HUGEINT) AS s FROM vals),
       |z AS MATERIALIZED (
       |  SELECT node, CAST(t.n AS HUGEINT) * CAST(v AS HUGEINT) - t.s AS z,
       |         t.n
       |  FROM vals, tot t),
       |edges AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
       |          FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
       |            AND x.l_suppkey < y.l_suppkey),
       |es AS (SELECT CAST(count(*) AS BIGINT) AS e,
       |              sum(za.z * zb.z) AS num2,
       |              sum((za.z - zb.z) * (za.z - zb.z)) AS gnum
       |       FROM edges JOIN z za ON edges.a = za.node
       |                  JOIN z zb ON edges.b = zb.node),
       |den AS (SELECT max(n) AS n, sum(z * z) AS den FROM z)
       |$tail""".stripMargin
  }

  /** DuckDB replay of `KCore.katzQuery`: 4 unrolled walk-count rounds,
    * exact 4⁴-scaled attenuation weights, no division anywhere. */
  private def katzOracleSql: String = {
    val rounds = 4
    val walks = (1 to rounds).map { i =>
      s"""w$i AS MATERIALIZED (
         |  SELECT e.a AS node, CAST(sum(w.w) AS BIGINT) AS w
         |  FROM und e JOIN w${i - 1} w ON e.b = w.node GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val joins = (2 to rounds)
      .map(i => s"JOIN w$i ON w1.node = w$i.node").mkString(" ")
    val weighted = (1 to rounds)
      .map(l => s"w$l.w * ${1L << (2 * (rounds - l))}").mkString(" + ")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs)),
       |w0 AS MATERIALIZED (
       |  SELECT DISTINCT a AS node, CAST(1 AS BIGINT) AS w FROM und),
       |$walks
       |SELECT CAST(w1.node AS BIGINT) AS node,
       |       w1.w AS w1, w2.w AS w2, w3.w AS w3, w4.w AS w4,
       |       CAST($weighted AS BIGINT) AS katz_w
       |FROM w1 $joins
       |ORDER BY katz_w DESC, node LIMIT 20""".stripMargin
  }

  /** DuckDB replay of `TimeSeries.dtwQuery`: the 7×7 DP unrolled as 49
    * chained CTE columns in row-major order — exact long min-plus. */
  private def dtwOracleSql: String = {
    def cell(k: Int) =
      s"""CAST(sum(CASE WHEN wd = $k AND prio = '1-URGENT' THEN p
         |     ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS a$k,
         |CAST(sum(CASE WHEN wd = $k AND prio = '5-LOW' THEN p
         |     ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS b$k"""
        .stripMargin
    val pivot = (0 to 6).map(cell).mkString(",\n")
    val steps = new StringBuilder
    var prev = "w0"
    for (i <- 0 to 6; j <- 0 to 6) {
      val c = s"abs(a$i - b$j)"
      val d =
        if (i == 0 && j == 0) c
        else if (i == 0) s"$c + d0_${j - 1}"
        else if (j == 0) s"$c + d${i - 1}_0"
        else s"$c + least(d${i - 1}_$j, d${i}_${j - 1}, d${i - 1}_${j - 1})"
      val name = s"s${i}_$j"
      steps.append(s",\n$name AS (SELECT *, $d AS d${i}_$j FROM $prev)")
      prev = name
    }
    val l1 = (0 to 6).map(k => s"abs(a$k - b$k)").mkString(" + ")
    s"""WITH prof AS (
       |  SELECT epoch_ms(o_orderdate) // 86400000 % 7 AS wd,
       |         o_orderpriority AS prio,
       |         CAST(o_totalprice AS DECIMAL(18,2)) AS p
       |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
       |w0 AS (SELECT
       |$pivot
       |FROM prof)$steps
       |SELECT CAST(d6_6 AS BIGINT) AS dtw_cents,
       |       CAST($l1 AS BIGINT) AS l1_cents
       |FROM $prev""".stripMargin
  }

  /** DuckDB replay of `KCore.ktrussQuery`: 3 unrolled wedge-count +
    * filter rounds over the support-≥5 robust-tie co-supply graph. */
  private def ktrussOracleSql: String = {
    val rounds = 3
    val k = 4
    val steps = (1 to rounds).map { r =>
      s"""u$r AS MATERIALIZED (
         |  SELECT a, b FROM e${r - 1}
         |  UNION ALL SELECT b AS a, a AS b FROM e${r - 1}),
         |s$r AS (SELECT w1.b AS a, w2.b AS b,
         |               CAST(count(*) AS BIGINT) AS n_wedges
         |        FROM u$r w1 JOIN u$r w2 ON w1.a = w2.a AND w1.b < w2.b
         |        GROUP BY 1, 2),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b, s.n_wedges AS support
         |  FROM e${r - 1} e JOIN s$r s ON e.a = s.a AND e.b = s.b
         |  WHERE s.n_wedges >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |sup AS MATERIALIZED (
       |  SELECT x.l_suppkey AS a, y.l_suppkey AS b,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
       |    AND x.l_suppkey < y.l_suppkey
       |  GROUP BY 1, 2),
       |thr AS (SELECT greatest(CAST(5 AS BIGINT),
       |                        sum(cnt) // count(*)) AS t FROM sup),
       |e00 AS MATERIALIZED (
       |  SELECT a, b FROM sup, thr WHERE cnt >= t),
       |und0 AS (SELECT a, b FROM e00 UNION ALL SELECT b AS a, a AS b FROM e00),
       |deg0 AS MATERIALIZED (
       |  SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
       |  FROM und0 GROUP BY 1),
       |e0 AS MATERIALIZED (
       |  SELECT e.a, e.b FROM e00 e
       |  JOIN deg0 da ON e.a = da.node AND da.deg <= 1024
       |  JOIN deg0 db ON e.b = db.node AND db.deg <= 1024),
       |$steps
       |SELECT a, b, support FROM e$rounds ORDER BY a, b""".stripMargin
  }

  /** DuckDB replay of `TimeSeries.haarQuery`: 5 unrolled halving
    * levels, exact integer sums/details, HUGEINT energies. */
  private def haarOracleSql: String = {
    val levels = 5
    val steps = (1 to levels).map { l =>
      s"""p$l AS MATERIALIZED (
         |  SELECT k // 2 AS k2, count(*) AS cnt,
         |         CAST(sum(CASE WHEN k % 2 = 0 THEN v ELSE 0 END)
         |              AS BIGINT) AS ev,
         |         CAST(sum(CASE WHEN k % 2 = 1 THEN v ELSE 0 END)
         |              AS BIGINT) AS ov
         |  FROM l${l - 1} GROUP BY 1 HAVING count(*) = 2),
         |e$l AS (SELECT CAST($l AS BIGINT) AS level,
         |               CAST(count(*) AS BIGINT) AS n_pairs,
         |               CAST(CAST(sum(CAST(ev - ov AS HUGEINT) * (ev - ov))
         |                    AS VARCHAR) AS DOUBLE) AS detail_energy
         |        FROM p$l),
         |l$l AS (SELECT k2 AS k, ev + ov AS v FROM p$l)""".stripMargin
    }.mkString(",\n")
    val union = (1 to levels).map(l => s"SELECT * FROM e$l")
      .mkString(" UNION ALL ")
    s"""WITH daily AS (
       |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
       |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
       |              AS BIGINT) AS v
       |  FROM orders GROUP BY 1),
       |l0 AS (SELECT row_number() OVER (ORDER BY day) - 1 AS k, v
       |       FROM daily),
       |$steps
       |$union ORDER BY level""".stripMargin
  }

  /** DuckDB replay of `TimeSeries.matrixProfile`: rank-join windows,
    * exact HUGEINT pair distances, per-window nearest by (d², rank). */
  private def matrixProfileOracleSql: String = {
    val m = 7
    val joins = (1 until m)
      .map(k => s"JOIN r r$k ON r$k.i = r0.i + $k").mkString(" ")
    val xs = (0 until m).map(k => s"r$k.v AS x$k").mkString(", ")
    val d2 = (0 until m)
      .map(k => s"CAST(a.x$k - b.x$k AS HUGEINT) * (a.x$k - b.x$k)")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
       |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
       |              AS BIGINT) AS v
       |  FROM orders GROUP BY 1),
       |r AS (SELECT day, v, row_number() OVER (ORDER BY day) AS i
       |      FROM daily),
       |w AS MATERIALIZED (
       |  SELECT r0.i AS ti, r0.day, $xs
       |  FROM r r0 $joins),
       |p AS (SELECT a.ti, a.day, b.ti AS tj, $d2 AS d2
       |      FROM w a JOIN w b ON abs(a.ti - b.ti) >= ${m / 2}),
       |nn AS (SELECT ti, day, tj, d2,
       |              row_number() OVER (PARTITION BY ti
       |                                 ORDER BY d2, tj) AS rn
       |       FROM p)
       |SELECT day, CAST(CAST(d2 AS VARCHAR) AS DOUBLE) AS mp_d2,
       |       CAST(tj AS BIGINT) AS nn_rank
       |FROM nn WHERE rn = 1
       |ORDER BY mp_d2 DESC, day LIMIT 10""".stripMargin
  }

  private def closenessOracleSql: String =
    s"""${labeledBfsCtes(4)}
       |SELECT seed, n_reached, sum_dist,
       |       CAST(n_reached - 1 AS DOUBLE) / CAST(sum_dist AS DOUBLE)
       |         AS closeness
       |FROM (SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
       |             CAST(sum(dist) AS BIGINT) AS sum_dist
       |      FROM d4 GROUP BY seed)
       |ORDER BY seed""".stripMargin

  private def harmonicOracleSql: String =
    s"""${labeledBfsCtes(4)}
       |SELECT seed, n1, n2, n3, n4,
       |       CAST(n1 AS DOUBLE) / 1.0 + CAST(n2 AS DOUBLE) / 2.0 +
       |         CAST(n3 AS DOUBLE) / 3.0 + CAST(n4 AS DOUBLE) / 4.0
       |         AS harmonic
       |FROM (SELECT seed,
       |             CAST(sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END)
       |                  AS BIGINT) AS n1,
       |             CAST(sum(CASE WHEN dist = 2 THEN 1 ELSE 0 END)
       |                  AS BIGINT) AS n2,
       |             CAST(sum(CASE WHEN dist = 3 THEN 1 ELSE 0 END)
       |                  AS BIGINT) AS n3,
       |             CAST(sum(CASE WHEN dist = 4 THEN 1 ELSE 0 END)
       |                  AS BIGINT) AS n4
       |      FROM d4 GROUP BY seed)
       |ORDER BY seed""".stripMargin

  /** DuckDB replay of [[graft.operators.Regression.xcorrQuery]]: one
    * union arm per fixed lag, each the same cleared-denominator
    * Pearson — generated from the shared lag range. */
  private def xcorrOracleSql: String = {
    val arms = (-3 to 3).map { l =>
      s"""SELECT CAST($l AS BIGINT) AS lag, n,
         |       CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
         |            AS VARCHAR) AS DOUBLE) /
         |       sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx -
         |                      CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) *
         |            CAST(CAST(CAST(n AS HUGEINT) * syy -
         |                      CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
         |         AS r
         |FROM (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(x) AS BIGINT) AS sx,
         |             CAST(sum(y) AS BIGINT) AS sy,
         |             sum(CAST(x AS HUGEINT) * x) AS sxx,
         |             sum(CAST(x AS HUGEINT) * y) AS sxy,
         |             sum(CAST(y AS HUGEINT) * y) AS syy
         |      FROM (SELECT a.c AS x, b.v AS y
         |            FROM daily a JOIN daily b ON b.day = a.day + $l))""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT epoch_ms(o_orderdate) // 86400000 AS day,
       |         CAST(count(*) AS BIGINT) AS c,
       |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
       |              AS BIGINT) AS v
       |  FROM orders GROUP BY 1)
       |$arms
       |ORDER BY lag""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.Distribution.cmhQuery]]: the 28
    * stratum cells as one conditional-aggregate row, then the same
    * fixed-order Σ_k trees — generated from the one shared year range
    * so the term order is identical by construction. */
  private def cmhOracleSql: String = {
    val years = (1995 to 2001).toSeq
    val cells = years.flatMap { y => Seq(
      s"CAST(sum(CASE WHEN y = $y AND e AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a$y",
      s"CAST(sum(CASE WHEN y = $y AND e AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b$y",
      s"CAST(sum(CASE WHEN y = $y AND NOT e AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c$y",
      s"CAST(sum(CASE WHEN y = $y AND NOT e AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d$y")
    }.mkString(",\n  ")
    def n(y: Int) = s"(a$y + b$y + c$y + d$y)"
    val num = years.map { y =>
      s"(CAST(a$y AS DOUBLE) - CAST(CAST(CAST(a$y + b$y AS HUGEINT) * " +
        s"(a$y + c$y) AS VARCHAR) AS DOUBLE) / CAST(${n(y)} AS DOUBLE))"
    }.mkString(" +\n   ")
    val vr = years.map { y =>
      s"(CAST(CAST(CAST(a$y + b$y AS HUGEINT) * (c$y + d$y) * (a$y + c$y) * " +
        s"(b$y + d$y) AS VARCHAR) AS DOUBLE) / " +
        s"CAST(CAST(CAST(${n(y)} AS HUGEINT) * ${n(y)} * (${n(y)} - 1) " +
        s"AS VARCHAR) AS DOUBLE))"
    }.mkString(" +\n   ")
    val ad = years.map { y =>
      s"(CAST(CAST(CAST(a$y AS HUGEINT) * d$y AS VARCHAR) AS DOUBLE) / " +
        s"CAST(${n(y)} AS DOUBLE))"
    }.mkString(" +\n   ")
    val bc = years.map { y =>
      s"(CAST(CAST(CAST(b$y AS HUGEINT) * c$y AS VARCHAR) AS DOUBLE) / " +
        s"CAST(${n(y)} AS DOUBLE))"
    }.mkString(" +\n   ")
    s"""WITH ret AS (SELECT DISTINCT l_orderkey AS o_orderkey, 1 AS r
       |             FROM lineitem WHERE l_returnflag = 'R'),
       |rows_ AS (
       |  SELECT year(o_orderdate) AS y,
       |         c_mktsegment = 'BUILDING' AS e,
       |         CAST(coalesce(r, 0) AS BIGINT) AS o
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  LEFT JOIN ret USING (o_orderkey)
       |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
       |wide AS (SELECT
       |  $cells
       | FROM rows_),
       |t AS (SELECT
       |  ($num) AS num,
       |  ($vr) AS var_,
       |  ($ad) AS ad,
       |  ($bc) AS bc
       | FROM wide)
       |SELECT CAST(${years.length} AS BIGINT) AS n_strata,
       |       num * num / var_ AS cmh,
       |       ad / bc AS or_mh
       |FROM t""".stripMargin
  }

  /** DuckDB replay of [[graft.scale.Layout.zonemapQuery]]: identical
    * shard assignment (row_number under the same unique orders, the
    * same (rn−1)·S div n bucketing) and the same probe-month epoch-day
    * literals, interpolated from the ONE shared constant table. */
  private def zonemapOracleSql: String = {
    val probes = graft.scale.Layout.ZonemapProbes
      .map { case (m, lo, hi) => s"($m, $lo, $hi)" }
      .mkString(",\n        ")
    s"""WITH rows_ AS (
       |  SELECT l_orderkey, l_linenumber,
       |         epoch_ms(l_shipdate) // 86400000 AS d
       |  FROM lineitem),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS nr FROM rows_),
       |znat AS (
       |  SELECT shard, min(d) AS min_d, max(d) AS max_d FROM (
       |    SELECT ((rn - 1) * 64) // nr AS shard, d FROM (
       |      SELECT d, row_number() OVER (ORDER BY l_orderkey, l_linenumber)
       |               AS rn
       |      FROM rows_) CROSS JOIN nc)
       |  GROUP BY 1),
       |zsort AS (
       |  SELECT shard, min(d) AS min_d, max(d) AS max_d FROM (
       |    SELECT ((rn - 1) * 64) // nr AS shard, d FROM (
       |      SELECT d, row_number() OVER (ORDER BY d, l_orderkey,
       |                                   l_linenumber) AS rn
       |      FROM rows_) CROSS JOIN nc)
       |  GROUP BY 1),
       |probes(m, lo, hi) AS (VALUES
       |        $probes),
       |rm AS (SELECT m, CAST(count(*) AS BIGINT) AS c
       |       FROM probes JOIN rows_ ON d >= lo AND d < hi GROUP BY 1),
       |sn AS (SELECT m, CAST(count(*) AS BIGINT) AS c
       |       FROM probes JOIN znat ON min_d < hi AND max_d >= lo
       |       GROUP BY 1),
       |ss AS (SELECT m, CAST(count(*) AS BIGINT) AS c
       |       FROM probes JOIN zsort ON min_d < hi AND max_d >= lo
       |       GROUP BY 1)
       |SELECT CAST(p.m AS BIGINT) AS probe_month,
       |       CAST(coalesce(rm.c, 0) AS BIGINT) AS rows_matched,
       |       CAST(coalesce(sn.c, 0) AS BIGINT) AS shards_natural,
       |       CAST(coalesce(ss.c, 0) AS BIGINT) AS shards_sorted,
       |       CAST(64 AS BIGINT) AS n_shards
       |FROM probes p
       |LEFT JOIN rm ON rm.m = p.m
       |LEFT JOIN sn ON sn.m = p.m
       |LEFT JOIN ss ON ss.m = p.m
       |ORDER BY 1""".stripMargin
  }

  /** DuckDB replay of `Layout.zvalue` over lineitem: the same
    * floor-then-clamp bucketization in the same IEEE operation order
    * ((c - lo) / span * maxBucket, span floored at MIN_NORMAL), the bit
    * interleave unrolled as shift/mask terms (disjoint bits, so + ≡ OR).
    * Ranges are recomputed by min/max in SQL — min/max of doubles is
    * exact selection, so both engines bucketize against identical
    * layout parameters. */
  /** DuckDB replay of `PageRank.pagerankQuery`: the quantized power
    * iteration unrolled round by round (r0 … r5). Every step is Long
    * arithmetic — `//` (DuckDB) ≡ `div` (Spark) on the non-negative
    * operands here — so the replay is exact, not approximate. */
  private def pagerankOracleSql: String = {
    val init = graft.operators.PageRank.Init
    val base = init * 15L / 100L
    val iters = 5
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST($base + (85 * coalesce(i$i.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank // d.outdeg) AS s
         |    FROM edges e
         |    JOIN r${i - 1} r ON e.src = r.node
         |    JOIN outdeg d ON e.src = d.src
         |    GROUP BY e.dst) i$i ON n.node = i$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT l.l_suppkey AS s, -(o.o_custkey + 1) AS c
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT s AS src, c AS dst FROM pairs
       |    UNION ALL
       |    SELECT c AS src, s AS dst FROM pairs)),
       |nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges
       |    UNION ALL SELECT dst FROM edges)),
       |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST($init AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT CAST(node AS BIGINT) AS node, rank
       |FROM r$iters ORDER BY node""".stripMargin
  }

  /** DuckDB replay of `Search.textrankQuery`: the SAME quantized
    * PageRank recurrence as `pagerankOracleSql`, over the word-adjacency
    * graph (distinct adjacent token pairs, self-loops dropped, both
    * directions) — 3 unrolled rounds, top-30 by (rank DESC, term ASC). */
  private def textrankOracleSql: String = {
    val init = graft.operators.PageRank.Init
    val base = init * 15L / 100L
    val iters = 3
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST($base + (85 * coalesce(i$i.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank // d.outdeg) AS s
         |    FROM edges e
         |    JOIN r${i - 1} r ON e.src = r.node
         |    JOIN outdeg d ON e.src = d.src
         |    GROUP BY e.dst) i$i ON n.node = i$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
       |bi AS (
       |  SELECT DISTINCT t[i] AS w1, t[i + 1] AS w2
       |  FROM toks, unnest(range(1, len(t))) AS r(i)
       |  WHERE t[i] <> t[i + 1]),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT w1 AS src, w2 AS dst FROM bi
       |    UNION ALL
       |    SELECT w2 AS src, w1 AS dst FROM bi)),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges
       |    UNION ALL SELECT dst FROM edges)),
       |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST($init AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT node AS term, rank
       |FROM r$iters ORDER BY rank DESC, term ASC LIMIT 30""".stripMargin
  }

  /** DuckDB replay of `Similarity.mmrSelect`: round-6 relevance pool of
    * 12, round-6 pairwise matrix, then the greedy MMR selection UNROLLED
    * to 5 rounds — λ = 0.7 and (1−λ) pinned to Scala's computed double
    * literal 0.30000000000000004 so the score arithmetic is identical. */
  private def mmrOracleSql: String = {
    val k = 5
    val rounds = (2 to k).map { i =>
      val selected = (1 until i).map(j => s"SELECT vec_id FROM s$j")
        .mkString(" UNION ALL ")
      s"""s$i AS MATERIALIZED (
         |  SELECT c.vec_id, c.rel,
         |         c.rel * 0.7 - m.msim * 0.30000000000000004 AS mmr_score,
         |         CAST($i AS BIGINT) AS pick
         |  FROM cand c JOIN (
         |    SELECT id, max(sim) AS msim FROM pw
         |    WHERE sid IN ($selected) GROUP BY id) m
         |    ON c.vec_id = m.id
         |  WHERE c.vec_id NOT IN ($selected)
         |  ORDER BY mmr_score DESC, c.vec_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val all = (1 to k).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |cand AS MATERIALIZED (
       |  SELECT e.vec_id, e.v,
       |         round(list_cosine_similarity(e.v, q.qv), 6) AS rel
       |  FROM e, q WHERE e.vec_id <> 0
       |  ORDER BY rel DESC, e.vec_id ASC LIMIT 12),
       |pw AS MATERIALIZED (
       |  SELECT a.vec_id AS id, b.vec_id AS sid,
       |         round(list_cosine_similarity(a.v, b.v), 6) AS sim
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |s1 AS MATERIALIZED (
       |  SELECT vec_id, rel, rel AS mmr_score, CAST(1 AS BIGINT) AS pick
       |  FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1),
       |$rounds
       |SELECT pick, vec_id, rel, mmr_score FROM ($all)
       |ORDER BY pick""".stripMargin
  }

  /** DuckDB replay of `Similarity.kcenterSelect`: Gonzalez greedy
    * k-center unrolled to 5 rounds — per round the max-min round-6
    * cosine distance to the selected set, ties by vec_id. */
  private def kcenterOracleSql: String = {
    val k = 5
    val rounds = (2 to k).map { i =>
      val selected = (1 until i).map(j => s"SELECT vec_id FROM s$j")
        .mkString(" UNION ALL ")
      s"""s$i AS MATERIALIZED (
         |  SELECT e.vec_id,
         |         min(1.0 - round(list_cosine_similarity(e.v, c.v), 6)) AS dmin,
         |         CAST($i AS BIGINT) AS pick
         |  FROM e JOIN e c ON c.vec_id IN ($selected)
         |  WHERE e.vec_id NOT IN ($selected)
         |  GROUP BY e.vec_id
         |  ORDER BY dmin DESC, e.vec_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val all = (1 to k).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |s1 AS (SELECT vec_id, 0.0 AS dmin, CAST(1 AS BIGINT) AS pick
       |       FROM e WHERE vec_id = 0),
       |$rounds
       |SELECT pick, vec_id, dmin FROM ($all)
       |ORDER BY pick""".stripMargin
  }

  /** DuckDB replay of `KCore.walksQuery`: 3 unrolled hash-seeded walk
    * steps — per step the (md5(cur:t:dst), dst) argmin over the
    * frontier's neighbors. */
  private def walksOracleSql: String = {
    val steps = (1 to 3).map { t =>
      s"""w$t AS MATERIALIZED (
         |  SELECT start, dst AS cur FROM (
         |    SELECT w.start, e.dst,
         |           row_number() OVER (PARTITION BY w.start
         |             ORDER BY md5(w.cur || ':' || $t || ':' || e.dst),
         |                      e.dst) AS rn
         |    FROM w${t - 1} w JOIN edges e ON w.cur = e.src) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT a AS src, b AS dst FROM pairs
       |    UNION ALL SELECT b, a FROM pairs)),
       |w0 AS (SELECT CAST(s_suppkey AS BIGINT) AS start,
       |              CAST(s_suppkey AS BIGINT) AS cur FROM supplier),
       |$steps
       |SELECT start, cur AS end_node FROM w3
       |ORDER BY start""".stripMargin
  }

  /** DuckDB replay of `TrainingData.rendezvousQuery`: least-of-md5
    * rendezvous owner (all 8 nodes, then node 0 removed), per-node
    * before/after counts and the minimal-movement witness. */
  private def rendezvousOracleSql: String = {
    val n = 8
    def h(i: Int) = s"md5(doc_id || ':' || $i)"
    def caseChain(m: String, ns: Seq[Int]) =
      "CAST(CASE " + ns.map(i => s"WHEN ${h(i)} = $m THEN $i").mkString(" ") +
        " END AS BIGINT)"
    s"""WITH hm AS (
       |  SELECT doc_id,
       |         least(${(0 until n).map(h).mkString(", ")}) AS m,
       |         least(${(1 until n).map(h).mkString(", ")}) AS m2
       |  FROM documents),
       |o AS (
       |  SELECT doc_id,
       |         ${caseChain("m", 0 until n)} AS node,
       |         ${caseChain("m2", 1 until n)} AS node_after
       |  FROM hm),
       |b AS (SELECT node, CAST(count(*) AS BIGINT) AS n_docs FROM o GROUP BY 1),
       |a AS (SELECT node_after AS node, CAST(count(*) AS BIGINT) AS n_after
       |      FROM o GROUP BY 1)
       |SELECT b.node, b.n_docs,
       |       CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
       |       (COALESCE(a.n_after, 0) >= b.n_docs OR b.node = 0) AS only_grows
       |FROM b LEFT JOIN a USING (node)
       |ORDER BY node""".stripMargin
  }

  /** DuckDB replay of `TrainingData.weakLabelsQuery`: the three vote
    * columns, then one aggregate block per (lf_a ≤ lf_b) pair. */
  private def weakLabelsOracleSql: String = {
    val blocks = (for { a <- 1 to 3; b <- a to 3 } yield
      s"""SELECT lf_a, lf_b, n_overlap, n_conflict,
         |       CASE WHEN n_overlap > 0
         |            THEN CAST(n_conflict AS DOUBLE) / CAST(n_overlap AS DOUBLE)
         |       END AS conflict_rate
         |FROM (
         |  SELECT 'l$a' AS lf_a, 'l$b' AS lf_b,
         |         CAST(sum(CASE WHEN l$a <> 0 AND l$b <> 0 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_overlap,
         |         CAST(sum(CASE WHEN l$a <> 0 AND l$b <> 0 AND l$a <> l$b
         |              THEN 1 ELSE 0 END) AS BIGINT) AS n_conflict
         |  FROM v)""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH v AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS l1,
       |         CASE WHEN n_chars > 400 THEN 1
       |              WHEN n_chars < 250 THEN -1 ELSE 0 END AS l2,
       |         CASE WHEN len(string_split(text, ' ')) > 80 THEN 1
       |              WHEN len(string_split(text, ' ')) < 50 THEN -1
       |              ELSE 0 END AS l3
       |  FROM documents)
       |$blocks
       |ORDER BY lf_a, lf_b""".stripMargin
  }

  /** DuckDB replay of `TrainingData.maxCoverSelect`: 5 unrolled greedy
    * max-coverage rounds — per round the uncovered-term gain count and
    * the (gain DESC, doc_id ASC) argmax; saturation yields fewer rows
    * in BOTH engines identically. */
  private def maxCoverOracleSql: String = {
    val k = 5
    val rounds = (1 to k).map { i =>
      val selDocs = (1 to i - 1).map(j => s"SELECT doc_id FROM s$j")
        .mkString(" UNION ALL ")
      val notCovered = if (i == 1) ""
        else
          s"""WHERE term NOT IN (
             |    SELECT DISTINCT term FROM d
             |    WHERE doc_id IN ($selDocs)) """.stripMargin
      s"""g$i AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM d
         |  $notCovered GROUP BY 1),
         |s$i AS MATERIALIZED (
         |  SELECT doc_id, gain, CAST($i AS BIGINT) AS pick FROM g$i
         |  ORDER BY gain DESC, doc_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val all = (1 to k).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
       |              FROM documents),
       |d AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest(
       |    [t[i] || ' ' || t[i + 1] for i in generate_series(1, len(t) - 1)])
       |    AS term
       |  FROM toks WHERE len(t) >= 2),
       |$rounds
       |SELECT pick, doc_id, gain FROM ($all)
       |ORDER BY pick""".stripMargin
  }

  /** DuckDB replay of `KCore.ssspQuery`: 4 unrolled Bellman–Ford
    * relaxation rounds over the weighted co-trading graph — integer
    * weights 10⁶ div count, min-reduce per node, exact both engines. */
  private def ssspOracleSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.b AS node, d.dist + e.w AS dist
         |    FROM edges e JOIN d${i - 1} d ON e.a = d.node)
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT l.l_suppkey AS a, -(o.o_custkey + 1) AS b,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2),
       |edges AS MATERIALIZED (
       |  SELECT a, b, 1000000 // cnt AS w FROM pairs
       |  UNION ALL
       |  SELECT b, a, 1000000 // cnt FROM pairs),
       |seed AS (SELECT CAST(min(s_suppkey) AS BIGINT) AS node FROM supplier),
       |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seed),
       |$rounds
       |SELECT CAST(node AS BIGINT) AS node, dist FROM d4
       |ORDER BY node""".stripMargin
  }

  /** DuckDB replay of `PageRank.hitsQuery`: 3 quantized HITS rounds
    * unrolled — per round the authority sum+renorm and the hub
    * sum+renorm, all integer (`//` on non-negative operands ≡ Spark's
    * truncating `div`). MATERIALIZED per level (each referenced twice). */
  private def hitsOracleSql: String = {
    val iters = 3
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (
         |  SELECT e.dst AS node, sum(h.h) AS raw
         |  FROM edges e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1),
         |am$i AS MATERIALIZED (SELECT max(raw) AS mx FROM ar$i),
         |a$i AS MATERIALIZED (
         |  SELECT n.node,
         |         CAST(CASE WHEN m.mx IS NULL THEN 0
         |              ELSE (COALESCE(r.raw, 0) * 10000) // m.mx END
         |              AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN ar$i r ON n.node = r.node
         |       CROSS JOIN am$i m),
         |hr$i AS MATERIALIZED (
         |  SELECT e.src AS node, sum(a.a) AS raw
         |  FROM edges e JOIN a$i a ON e.dst = a.node GROUP BY 1),
         |hm$i AS MATERIALIZED (SELECT max(raw) AS mx FROM hr$i),
         |h$i AS MATERIALIZED (
         |  SELECT n.node,
         |         CAST(CASE WHEN m.mx IS NULL THEN 0
         |              ELSE (COALESCE(r.raw, 0) * 10000) // m.mx END
         |              AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN hr$i r ON n.node = r.node
         |       CROSS JOIN hm$i m)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT DISTINCT l.l_suppkey AS src, -(o.o_custkey + 1) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
       |h0 AS (SELECT node, CAST(10000 AS BIGINT) AS h FROM nodes),
       |$rounds
       |SELECT CAST(h.node AS BIGINT) AS node, h.h AS hub, a.a AS authority
       |FROM h$iters h JOIN a$iters a ON h.node = a.node
       |ORDER BY node""".stripMargin
  }

  /** DuckDB replay of `PageRank.labelPropQuery`: 4 synchronous LPA
    * rounds unrolled — per round the neighbor-label vote count and the
    * (c DESC, label ASC) argmax; community sizes at the end. */
  private def labelPropOracleSql: String = {
    val iters = 4
    val rounds = (1 to iters).map { i =>
      s"""v$i AS MATERIALIZED (
         |  SELECT e.dst AS node, l.label, CAST(count(*) AS BIGINT) AS c
         |  FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |p$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |           row_number() OVER (PARTITION BY node
         |                              ORDER BY c DESC, label ASC) AS rn
         |    FROM v$i) WHERE rn = 1),
         |l$i AS MATERIALIZED (
         |  SELECT n.node, COALESCE(p.label, n.node) AS label
         |  FROM nodes n LEFT JOIN p$i p ON n.node = p.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l.l_suppkey AS s, -(o.o_custkey + 1) AS c
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT s AS src, c AS dst FROM pairs
       |    UNION ALL SELECT c, s FROM pairs)),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds,
       |sz AS (SELECT label, CAST(count(*) AS BIGINT) AS comm_size
       |       FROM l$iters GROUP BY 1)
       |SELECT CAST(l.node AS BIGINT) AS node, CAST(l.label AS BIGINT) AS label,
       |       sz.comm_size
       |FROM l$iters l JOIN sz USING (label)
       |ORDER BY node""".stripMargin
  }

  /** DuckDB replay of `KCore.kcoreQuery`: 6 peel rounds unrolled — per
    * round a degree count, the ≥3 survivor set, and the two-sided edge
    * filter. Exact integer arithmetic throughout. The per-round CTEs are
    * MATERIALIZED: DuckDB inlines plain CTEs per reference, and each
    * round references its predecessor several times — uninlined, the
    * 6-round chain expands to thousands of base-table scans (observed as
    * an fd-exhaustion failure, not just slowness). */
  private def kcoreOracleSql: String = {
    val (k, rounds) = (3, 6)
    val peels = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM e${i - 1}
         |    UNION ALL SELECT b FROM e${i - 1})
         |  GROUP BY node),
         |a$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN a$i x ON e.a = x.node
         |  JOIN a$i y ON e.b = y.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l.l_suppkey AS s, -(o.o_custkey + 1) AS c
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(s, c) AS a, GREATEST(s, c) AS b FROM pairs),
       |$peels
       |SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS deg
       |FROM (SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds)
       |GROUP BY node
       |ORDER BY node""".stripMargin
  }

  /** DuckDB replay of `KCore.bfsQuery`: 4 min-plus relaxation rounds
    * unrolled as MATERIALIZED CTEs. All-integer. */
  private def bfsOracleSql: String = {
    val rounds = 4
    val relax = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.b AS node, d.dist + 1 AS dist
         |    FROM und e JOIN d${i - 1} d ON e.a = d.node)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs)),
       |d0 AS MATERIALIZED (
       |  SELECT CAST(s_suppkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
       |  FROM supplier
       |  WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)),
       |$relax
       |SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
       |FROM d$rounds ORDER BY node""".stripMargin
  }

  /** DuckDB replay of `Distribution.smdQuery`: one covariate block per
    * measure, each the exact-moment pattern (VARCHAR-routed variance
    * numerator, fixed SMD tree). */
  private def smdOracleSql: String = {
    def block(name: String, x: String): String =
      s"""SELECT '$name' AS covariate, a.n AS n_a, b.n AS n_b,
         |       a.mean AS mean_a, b.mean AS mean_b,
         |       (a.mean - b.mean) / sqrt((a.var + b.var) / CAST(2 AS DOUBLE))
         |         AS smd
         |FROM (SELECT * FROM g_$x WHERE in_a) a
         |CROSS JOIN (SELECT * FROM g_$x WHERE NOT in_a) b""".stripMargin
    def g(x: String): String =
      s"""g_$x AS (
         |  SELECT in_a, CAST(count(*) AS BIGINT) AS n,
         |         CAST(CAST(sum($x) AS BIGINT) AS DOUBLE) /
         |           CAST(count(*) AS DOUBLE) AS mean,
         |         CAST(CAST(CAST(count(*) AS HUGEINT) *
         |                   sum(CAST($x AS HUGEINT) * $x) -
         |                   CAST(sum($x) AS HUGEINT) * CAST(sum($x) AS BIGINT)
         |                   AS VARCHAR) AS DOUBLE) /
         |           CAST(count(*) * (count(*) - 1) AS DOUBLE) AS var
         |  FROM base GROUP BY 1)""".stripMargin
    s"""WITH li AS (
       |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
       |  FROM lineitem GROUP BY 1),
       |base AS (
       |  SELECT c_mktsegment = 'BUILDING' AS in_a,
       |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |           AS price_cents,
       |         COALESCE(li.n_items, 0) AS basket_size,
       |         CASE WHEN o_orderpriority LIKE '1-%'
       |                OR o_orderpriority LIKE '2-%'
       |              THEN 1 ELSE 0 END AS urgent
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  LEFT JOIN li ON o_orderkey = li.l_orderkey
       |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
       |${g("price_cents")},
       |${g("basket_size")},
       |${g("urgent")}
       |SELECT * FROM (
       |  ${block("price_cents", "price_cents")}
       |  UNION ALL
       |  ${block("basket_size", "basket_size")}
       |  UNION ALL
       |  ${block("urgent", "urgent")})
       |ORDER BY covariate""".stripMargin
  }

  /** DuckDB replay of `Distribution.permTestQuery`: all 32 md5-coin
    * relabelings as pivoted conditional HUGEINT sums in one pass, the
    * vote count as a left-associated 32-term tree of exact
    * cross-multiplied comparisons. */
  private def permTestOracleSql: String = {
    val perms = 32
    val hexA = "('0','1','2','3','4','5','6','7')"
    val piv = (0 until perms).map { k =>
      s"""sum(CASE WHEN substr(md5('$k|' || CAST(o_orderkey AS VARCHAR)), 1, 1)
         |              IN $hexA THEN 1 ELSE 0 END) AS n$k,
         |         sum(CASE WHEN substr(md5('$k|' || CAST(o_orderkey AS VARCHAR)), 1, 1)
         |              IN $hexA THEN CAST(v AS HUGEINT) ELSE 0 END) AS s$k""".stripMargin
    }.mkString(",\n|         ")
    def a(sc: String, nc: String) = s"abs($sc * CAST(n AS HUGEINT) - CAST($nc AS HUGEINT) * s)"
    def b(nc: String) = s"(CAST($nc AS HUGEINT) * (n - $nc))"
    val votes = (0 until perms).map { k =>
      s"""CASE WHEN ${a(s"s$k", s"n$k")} * ${b("n_obs")} >=
         |               ${a("s_obs", "n_obs")} * ${b(s"n$k")}
         |          THEN 1 ELSE 0 END""".stripMargin
    }.mkString("\n|         + ")
    s"""WITH rows_ AS (
       |  SELECT o_orderkey,
       |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
       |         c_mktsegment = 'BUILDING' AS in_a
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
       |w AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(v AS HUGEINT)) AS s,
       |         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_obs,
       |         sum(CASE WHEN in_a THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_obs,
       |         $piv
       |  FROM rows_),
       |v AS (
       |  SELECT n, n_obs,
       |         ${a("s_obs", "n_obs")} AS a0, ${b("n_obs")} AS b0,
       |         CAST($votes AS BIGINT) AS n_ge
       |  FROM w)
       |SELECT n, n_obs AS n_a, n - n_obs AS n_b,
       |       CAST(CAST(a0 AS VARCHAR) AS DOUBLE) /
       |         CAST(CAST(b0 AS VARCHAR) AS DOUBLE) AS obs_gap_cents,
       |       CAST($perms AS BIGINT) AS n_perms, n_ge,
       |       CAST(n_ge + 1 AS DOUBLE) / CAST(${perms + 1} AS DOUBLE)
       |         AS p_value
       |FROM v""".stripMargin
  }

  /** DuckDB replay of `EmbedStats.fisherQuery`: the q_anova pivoted
    * fixed-domain device per embedding dimension — per-class sums as 10
    * conditional aggregates, the Σ S_c²/n_c term a left-associated
    * 10-term tree of VARCHAR-routed single divisions. */
  private def fisherOracleSql: String = {
    val ns = (0 until 10).map(c =>
      s"sum(CASE WHEN label = $c THEN 1 ELSE 0 END) AS n$c").mkString(",\n|         ")
    val ss = (0 until 10).map(c =>
      s"sum(CASE WHEN label = $c THEN CAST(x AS HUGEINT) ELSE 0 END) AS s$c")
      .mkString(",\n|         ")
    val inner = (0 until 10).map(c =>
      s"""CASE WHEN n$c > 0 THEN
         |             CAST(CAST(s$c * s$c AS VARCHAR) AS DOUBLE) /
         |               CAST(n$c AS DOUBLE)
         |           ELSE CAST(0 AS DOUBLE) END""".stripMargin)
      .mkString("\n|         + ")
    s"""WITH q AS (
       |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
       |              AS BIGINT) AS x
       |  FROM embeddings),
       |w AS (
       |  SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(x AS HUGEINT)) AS s,
       |         sum(CAST(x AS HUGEINT) * x) AS q2,
       |         $ns,
       |         $ss
       |  FROM q GROUP BY 1),
       |t AS (
       |  SELECT dim, n,
       |         -- n*X products pinned by VARCHAR round-trips before -S^2
       |         -- (FMA-contraction barrier, the q_polyfit device)
       |         CAST(CAST(CAST(n AS DOUBLE) * CAST(CAST(q2 AS VARCHAR) AS DOUBLE)
       |           AS VARCHAR) AS DOUBLE) -
       |           CAST(CAST(s * s AS VARCHAR) AS DOUBLE) AS sst_n,
       |         CAST(CAST(CAST(n AS DOUBLE) *
       |           ($inner)
       |           AS VARCHAR) AS DOUBLE)
       |           - CAST(CAST(s * s AS VARCHAR) AS DOUBLE) AS ssb_n
       |  FROM w)
       |SELECT dim, n, ssb_n / sst_n AS eta_sq,
       |       ssb_n / (sst_n - ssb_n) AS fisher
       |FROM t ORDER BY dim""".stripMargin
  }

  /** DuckDB replay of `KCore.diameterQuery`: both BFS sweeps unrolled
    * (the bfsOracleSql device, twice), the farthest-node pick as the
    * same (dist desc, node asc) top-1, eccentricity + reach counts as
    * scalar subqueries. */
  private def diameterOracleSql: String = {
    val rounds = 4
    def relax(p: String): String = (1 to rounds).map { i =>
      s"""$p$i AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM $p${i - 1}
         |    UNION ALL
         |    SELECT e.b AS node, d.dist + 1 AS dist
         |    FROM und e JOIN $p${i - 1} d ON e.a = d.node)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l.l_suppkey AS a, -(o.o_custkey + 1) AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs)),
       |d0 AS MATERIALIZED (
       |  SELECT CAST(s_suppkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
       |  FROM supplier
       |  WHERE s_suppkey = (SELECT min(s_suppkey) FROM supplier)),
       |${relax("d")},
       |far AS MATERIALIZED (
       |  SELECT node, dist FROM d$rounds ORDER BY dist DESC, node ASC LIMIT 1),
       |e0 AS MATERIALIZED (
       |  SELECT node, CAST(0 AS BIGINT) AS dist FROM far),
       |${relax("e")}
       |SELECT CAST(far.node AS BIGINT) AS far_node,
       |       CAST(far.dist AS BIGINT) AS far_dist,
       |       (SELECT CAST(max(dist) AS BIGINT) FROM e$rounds)
       |         AS est_diameter,
       |       (SELECT CAST(count(*) AS BIGINT) FROM d$rounds)
       |         AS n_reached1,
       |       (SELECT CAST(count(*) AS BIGINT) FROM e$rounds)
       |         AS n_reached2
       |FROM far""".stripMargin
  }

  private def zorderOracleSql: String = {
    val bits = graft.scale.Layout.DefaultBits
    val maxB = (1L << bits) - 1
    val minNormal = "2.2250738585072014e-308"
    def bucket(c: String, lo: String, span: String) =
      s"LEAST(GREATEST(CAST(floor(($c - $lo) / $span * $maxB) AS BIGINT), 0), $maxB)"
    val terms = (0 until bits).flatMap(i =>
      Seq(s"(((b0 >> $i) & 1) << ${2 * i})", s"(((b1 >> $i) & 1) << ${2 * i + 1})"))
    s"""WITH r AS (SELECT min(l_quantity) AS lo0,
       |                  GREATEST(max(l_quantity) - min(l_quantity), $minNormal) AS span0,
       |                  min(l_extendedprice) AS lo1,
       |                  GREATEST(max(l_extendedprice) - min(l_extendedprice), $minNormal) AS span1
       |           FROM lineitem),
       |b AS (SELECT l_orderkey, l_linenumber,
       |             ${bucket("l_quantity", "lo0", "span0")} AS b0,
       |             ${bucket("l_extendedprice", "lo1", "span1")} AS b1
       |      FROM lineitem, r)
       |SELECT l_orderkey, l_linenumber,
       |       CAST(${terms.mkString(" + ")} AS BIGINT) AS z
       |FROM b
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** DuckDB replay of `Layout.hilbertIndex` over lineitem: identical
    * bucketization to the z-order oracle, then one chained CTE per bit
    * level running the same rotate-and-reflect state machine (the CASE
    * ladders mirror the Spark staged projections term for term; all
    * integer arithmetic, so agreement is exact). */
  private def hilbertOracleSql: String = {
    val bits = graft.scale.Layout.DefaultBits
    val maxB = (1L << bits) - 1
    val n = 1L << bits
    val minNormal = "2.2250738585072014e-308"
    def bucket(c: String, lo: String, span: String) =
      s"LEAST(GREATEST(CAST(floor(($c - $lo) / $span * $maxB) AS BIGINT), 0), $maxB)"
    val sb = new StringBuilder
    sb.append(
      s"""WITH r AS (SELECT min(l_quantity) AS lo0,
         |                  GREATEST(max(l_quantity) - min(l_quantity), $minNormal) AS span0,
         |                  min(l_extendedprice) AS lo1,
         |                  GREATEST(max(l_extendedprice) - min(l_extendedprice), $minNormal) AS span1
         |           FROM lineitem),
         |h0 AS (SELECT l_orderkey, l_linenumber,
         |              ${bucket("l_quantity", "lo0", "span0")} AS x,
         |              ${bucket("l_extendedprice", "lo1", "span1")} AS y,
         |              CAST(0 AS BIGINT) AS d
         |       FROM lineitem, r)""".stripMargin)
    var s = n / 2
    var k = 0
    while (s > 0) {
      k += 1
      sb.append(s""",
         |h$k AS (
         |  SELECT p.l_orderkey, p.l_linenumber,
         |    CASE WHEN (p.y & $s) > 0 THEN p.x
         |         WHEN (p.x & $s) > 0 THEN ${n - 1} - p.y
         |         ELSE p.y END AS x,
         |    CASE WHEN (p.y & $s) > 0 THEN p.y
         |         WHEN (p.x & $s) > 0 THEN ${n - 1} - p.x
         |         ELSE p.x END AS y,
         |    p.d + ${s * s} * (CASE WHEN (p.x & $s) > 0 AND (p.y & $s) > 0 THEN 2
         |                           WHEN (p.x & $s) > 0 THEN 3
         |                           WHEN (p.y & $s) > 0 THEN 1 ELSE 0 END) AS d
         |  FROM h${k - 1} p)""".stripMargin)
      s /= 2
    }
    sb.append(s"""
         |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS h
         |FROM h$k
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    sb.toString
  }

  /** Generated DuckDB SQL replaying `n` exact BPE rounds (see the
    * q_bpe_merges comment for the double-space-padding invariant that
    * makes plain `replace` the greedy merge fold). Each round k: count
    * adjacent pairs weighted by word freq (c_k), pick the argmax with
    * the (cnt DESC, pair ASC) tiebreak and the min-pair-count 2 cut
    * (m_k), apply it to every word (w_k). An exhausted round leaves m_k
    * empty; the LEFT JOIN keeps w_k = w_{k-1} (words pass through
    * unmerged, so the ENCODE oracle still emits the vocabulary) and
    * every later m_j stays empty too — unchanged words produce the same
    * sub-threshold pair counts — matching Bpe.train's early stop. */
  private def bpeRoundsCtes(n: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH wf AS (
        |  SELECT w, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0
        |  GROUP BY w),
        |w0 AS (
        |  SELECT w, '  ' || array_to_string(
        |           list_append(regexp_extract_all(w, '(?s).'), '</w>'), '  ')
        |         || '  ' AS sym, freq
        |  FROM wf)""".stripMargin)
    for (k <- 1 to n) {
      sb.append(s""",
        |p$k AS (
        |  SELECT s.syms[r.i] || ' ' || s.syms[r.i + 1] AS pair, s.freq
        |  FROM (SELECT string_split(trim(sym), '  ') AS syms, freq FROM w${k - 1}) s,
        |       unnest(range(1, len(s.syms))) AS r(i)),
        |c$k AS (
        |  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM p$k GROUP BY pair HAVING sum(freq) >= 2),
        |m$k AS (
        |  SELECT CAST($k AS BIGINT) AS merge_rank,
        |         split_part(pair, ' ', 1) AS left_sym,
        |         split_part(pair, ' ', 2) AS right_sym,
        |         cnt AS pair_cnt
        |  FROM c$k ORDER BY cnt DESC, pair ASC LIMIT 1),
        |w$k AS (
        |  SELECT w.w, COALESCE(replace(w.sym,
        |           ' ' || m.left_sym || '  ' || m.right_sym || ' ',
        |           ' ' || m.left_sym || m.right_sym || ' '), w.sym) AS sym, w.freq
        |  FROM w${k - 1} w LEFT JOIN m$k m ON TRUE)""".stripMargin)
    }
    sb.toString
  }

  private def bpeMergesOracle(n: Int): String =
    bpeRoundsCtes(n) + (1 to n).map(k => s"SELECT * FROM m$k").mkString(
      "\nSELECT merge_rank, left_sym, right_sym, pair_cnt FROM (\n",
      "\nUNION ALL ", "\n) ORDER BY merge_rank")

  /** Encode-apply oracle: the final round-table w_n of the merges
    * replay IS the fully-encoded vocabulary — every distinct corpus
    * word with its subword segmentation after all `n` merges. The
    * double-space padding collapses back to single-space tokens. */
  private def bpeEncodeOracle(n: Int): String =
    bpeRoundsCtes(n) + s"""
      |SELECT w, array_to_string(string_split(trim(sym), '  '), ' ') AS sym,
      |       CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS n_sub
      |FROM w$n
      |ORDER BY w""".stripMargin

  /** Generated DuckDB SQL replaying `iters` exact k-means rounds (see
    * graft.operators.KMeans): quantize to floor((x+1)·10⁴), assign by
    * min (dist, cid) — the row_number tiebreak matches the engine's
    * min-struct argmin — and update centroids by per-position
    * `sum // count` (all operands nonnegative, so `//` ≡ Spark's `div`).
    * Every per-round CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    * reference and the round chain otherwise re-expands the whole prefix
    * per round (same hazard as the k-core oracle). */
  private def kmeansOracle(iters: Int, k: Int): String =
    kmeansRoundsCtes(iters, k) + s"""
      |, m AS (
      |  SELECT cid, g.i AS pos, CAST(sum(q[g.i]) // count(*) AS BIGINT) AS comp
      |  FROM a$iters, unnest(generate_series(1, len(q))) AS g(i)
      |  GROUP BY cid, g.i),
      |fp AS (
      |  SELECT cid, CAST(sum(pos * comp) AS BIGINT) AS centroid_fp
      |  FROM m GROUP BY cid)
      |SELECT a.cid, CAST(count(*) AS BIGINT) AS n_members,
      |       CAST(sum(vec_id) AS BIGINT) AS sum_vec_id,
      |       CAST(sum(dist) AS BIGINT) AS inertia,
      |       any_value(fp.centroid_fp) AS centroid_fp
      |FROM a$iters a JOIN fp ON a.cid = fp.cid
      |GROUP BY a.cid
      |ORDER BY a.cid""".stripMargin

  /** Same replayed rounds as [[kmeansOracle]], final select = per-cluster
    * majority ground-truth label + purity. */
  private def clusterPurityOracle(iters: Int, k: Int): String =
    kmeansRoundsCtes(iters, k) + s"""
      |, bl AS (
      |  SELECT a.cid, CAST(e.label AS BIGINT) AS label, count(*) AS cnt
      |  FROM a$iters a JOIN embeddings e ON a.vec_id = e.vec_id
      |  GROUP BY 1, 2),
      |mj AS (
      |  SELECT cid, label, cnt,
      |         row_number() OVER (PARTITION BY cid
      |                            ORDER BY cnt DESC, label ASC) AS rn,
      |         sum(cnt) OVER (PARTITION BY cid) AS n_members
      |  FROM bl)
      |SELECT cid, CAST(n_members AS BIGINT) AS n_members,
      |       label AS majority_label, CAST(cnt AS BIGINT) AS majority_cnt,
      |       CAST(cnt AS DOUBLE) / n_members AS purity
      |FROM mj WHERE rn = 1
      |ORDER BY cid""".stripMargin

  /** Unrolled power-iteration oracle for q_pca_power — the
    * kmeansRoundsCtes device applied to the scatter-matrix eigenvector:
    * exact HUGEINT moments, per-round sign·((|y|·10⁴) // max|y|)
    * renormalization (floor on the non-negative operand ≡ Spark's
    * truncating `div`), Rayleigh quotient as the one terminal division. */
  private def pcaRoundsCtes(iters: Int): String =
    pcaCtePrefix(iters) + s""",
      |num AS (SELECT sum(CAST(xj.x AS HUGEINT) * a.a * xk.x) AS num
      |        FROM a JOIN x$iters xj ON a.j = xj.j
      |               JOIN x$iters xk ON a.k = xk.j),
      |den AS (SELECT sum(x * x) AS den FROM x$iters)
      |SELECT xf.j AS dim, CAST(xf.x AS BIGINT) AS component,
      |       CAST(CAST(num AS VARCHAR) AS DOUBLE) /
      |         CAST(CAST(den AS VARCHAR) AS DOUBLE) AS rayleigh
      |FROM x$iters xf CROSS JOIN num CROSS JOIN den
      |ORDER BY dim""".stripMargin

  /** q_pca_project oracle: the shared power-iteration prefix + the
    * exact integer projection and per-label moment rollup. */
  private def pcaProjectCtes(iters: Int): String =
    pcaCtePrefix(iters) + s""",
      |proj AS (
      |  SELECT qv.vec_id, qv.label,
      |         CAST(sum(CAST(qv.q AS HUGEINT) * x.x) AS BIGINT) AS p
      |  FROM qv JOIN x$iters x ON qv.j = x.j
      |  GROUP BY 1, 2),
      |per AS (
      |  SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
      |         sum(CAST(p AS HUGEINT)) AS s,
      |         sum(CAST(p AS HUGEINT) * p) AS q2
      |  FROM proj GROUP BY 1)
      |SELECT label, n,
      |       CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
      |         / CAST(10000.0 AS DOUBLE) AS mean_proj,
      |       (CAST(CAST(q2 AS VARCHAR) AS DOUBLE) -
      |        CAST(CAST(s AS VARCHAR) AS DOUBLE) *
      |        CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) /
      |         (CAST(n AS DOUBLE) - 1.0) / CAST(100000000.0 AS DOUBLE)
      |         AS var_proj
      |FROM per ORDER BY label""".stripMargin

  private def pcaCtePrefix(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH qv AS MATERIALIZED (
      |  SELECT vec_id, label, g.i AS j,
      |         CAST(floor((CAST(embedding[g.i] AS DOUBLE) + 1) * 10000)
      |              AS BIGINT) AS q
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
      |s AS MATERIALIZED (
      |  SELECT a.j AS j, b.j AS k, sum(CAST(a.q AS HUGEINT) * b.q) AS s_jk
      |  FROM qv a JOIN qv b USING (vec_id) GROUP BY 1, 2),
      |m AS MATERIALIZED (
      |  SELECT j, sum(CAST(q AS HUGEINT)) AS mj, CAST(count(*) AS BIGINT) AS n
      |  FROM qv GROUP BY 1),
      |a AS MATERIALIZED (
      |  SELECT s.j, s.k, CAST(m1.n AS HUGEINT) * s.s_jk - m1.mj * m2.mj AS a
      |  FROM s JOIN m m1 ON s.j = m1.j JOIN m m2 ON s.k = m2.j),
      |x0 AS MATERIALIZED (SELECT j, CAST(10000 AS HUGEINT) AS x FROM m)""".stripMargin)
    for (r <- 1 to iters) {
      sb.append(s""",
        |y$r AS MATERIALIZED (
        |  SELECT a.j, sum(a.a * x.x) AS y
        |  FROM a JOIN x${r - 1} x ON a.k = x.j GROUP BY 1),
        |x$r AS MATERIALIZED (
        |  SELECT j, CAST(CASE WHEN y < 0 THEN -1 ELSE 1 END AS HUGEINT) *
        |            ((abs(y) * 10000) // (SELECT max(abs(y)) FROM y$r)) AS x
        |  FROM y$r)""".stripMargin)
    }
    sb.toString
  }

  /** Unrolled IPF oracle for q_ipf: integer micro-unit weights, two
    * truncating `(w·tgt)//margin` half-steps per round. */
  private def ipfRoundsCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH cells AS MATERIALIZED (
      |  SELECT c_mktsegment AS segment, o_orderpriority AS prio,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
      |w0 AS MATERIALIZED (
      |  SELECT segment, prio, c,
      |         (CAST(n AS HUGEINT) * 1000000) // 5 AS tgt,
      |         CAST(c AS HUGEINT) * 1000000 AS w
      |  FROM cells CROSS JOIN n)""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s""",
        |r$k AS MATERIALIZED (
        |  SELECT segment, CAST(sum(w) AS HUGEINT) AS rs
        |  FROM w${k - 1} GROUP BY 1),
        |wr$k AS MATERIALIZED (
        |  SELECT segment, prio, c, tgt, (w * tgt) // rs AS w
        |  FROM w${k - 1} JOIN r$k USING (segment)),
        |c$k AS MATERIALIZED (
        |  SELECT prio, CAST(sum(w) AS HUGEINT) AS cs
        |  FROM wr$k GROUP BY 1),
        |w$k AS MATERIALIZED (
        |  SELECT segment, prio, c, tgt, (w * tgt) // cs AS w
        |  FROM wr$k JOIN c$k USING (prio))""".stripMargin)
    }
    sb.append(s"""
      |SELECT segment, prio, c, CAST(w AS BIGINT) AS w_micro,
      |       CAST(w AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS fitted
      |FROM w$rounds ORDER BY segment, prio""".stripMargin)
    sb.toString
  }

  /** Unrolled π=πP power-iteration oracle for q_stationary: per-cell
    * truncating mass flow (x·c)//r on non-negative operands, 10⁶
    * renormalization per round, zero-filled state spine. */
  private def stationaryRoundsCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH e AS MATERIALIZED (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
      |  FROM events),
      |pr AS MATERIALIZED (
      |  SELECT event_type AS src,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts_ms, event_id) AS dst
      |  FROM e),
      |c AS MATERIALIZED (
      |  SELECT src, dst, CAST(count(*) AS BIGINT) AS c
      |  FROM pr WHERE dst IS NOT NULL GROUP BY 1, 2),
      |p AS MATERIALIZED (
      |  SELECT c.src, c.dst, c.c, r.r
      |  FROM c JOIN (SELECT src, CAST(sum(c) AS BIGINT) AS r
      |               FROM c GROUP BY 1) r USING (src)
      |  UNION ALL
      |  -- sink states (dst-only): self-loop so their mass is retained
      |  SELECT DISTINCT dst AS src, dst, CAST(1 AS BIGINT) AS c,
      |         CAST(1 AS BIGINT) AS r
      |  FROM c WHERE dst NOT IN (SELECT src FROM c)),
      |s AS MATERIALIZED (
      |  SELECT DISTINCT t
      |  FROM (SELECT src AS t FROM c UNION ALL SELECT dst FROM c)),
      |x0 AS MATERIALIZED (SELECT t, CAST(1000000 AS BIGINT) AS x FROM s)""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(s""",
        |y$k AS MATERIALIZED (
        |  SELECT dst AS t, CAST(sum((x.x * p.c) // p.r) AS BIGINT) AS y
        |  FROM p JOIN x${k - 1} x ON p.src = x.t GROUP BY 1),
        |f$k AS MATERIALIZED (
        |  SELECT s.t, COALESCE(y, 0) AS y FROM s LEFT JOIN y$k USING (t)),
        |x$k AS MATERIALIZED (
        |  SELECT t, (y * 1000000) // (SELECT sum(y) FROM f$k) AS x
        |  FROM f$k)""".stripMargin)
    }
    sb.append(s"""
      |SELECT t AS event_type, CAST(x AS BIGINT) AS pi_micro,
      |       CAST(x AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS pi
      |FROM x$iters ORDER BY event_type""".stripMargin)
    sb.toString
  }

  private def kmeansRoundsCtes(iters: Int, k: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH v AS MATERIALIZED (
      |  SELECT vec_id,
      |         [CAST(floor((CAST(x AS DOUBLE) + 1) * 10000) AS BIGINT)
      |          for x in embedding] AS q
      |  FROM embeddings),
      |c0 AS MATERIALIZED (
      |  SELECT vec_id AS cid, q AS c FROM v WHERE vec_id < $k)""".stripMargin)
    for (r <- 1 to iters) {
      sb.append(s""",
        |d$r AS MATERIALIZED (
        |  SELECT vec_id, q, cid, dist,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY dist, cid) AS rn
        |  FROM (
        |    SELECT v.vec_id, v.q, c.cid,
        |           list_sum([(v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
        |                     for i in generate_series(1, len(v.q))]) AS dist
        |    FROM v, c${r - 1} c)),
        |a$r AS MATERIALIZED (
        |  SELECT vec_id, q, cid, dist FROM d$r WHERE rn = 1)""".stripMargin)
      if (r < iters) {
        sb.append(s""",
          |u$r AS MATERIALIZED (
          |  SELECT cid, g.i AS pos, CAST(sum(q[g.i]) // count(*) AS BIGINT) AS comp
          |  FROM a$r, unnest(generate_series(1, len(q))) AS g(i)
          |  GROUP BY cid, g.i),
          |c$r AS MATERIALIZED (
          |  SELECT p.cid, coalesce(u.c, p.c) AS c
          |  FROM c${r - 1} p LEFT JOIN
          |    (SELECT cid, list(comp ORDER BY pos) AS c FROM u$r GROUP BY cid) u
          |    ON p.cid = u.cid)""".stripMargin)
      }
    }
    sb.toString
  }
}
