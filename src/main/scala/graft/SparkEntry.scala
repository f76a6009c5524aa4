package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one implemented operator family from
  * SURVEY.md §2; [[oracleSql]] holds the DuckDB-equivalent SQL the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_top_orders" -> (Relational.q3TopOrders _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "w_topk_per_group" -> (Windows.topkPerGroup _),
    "w_lag_diff" -> (Windows.lagDiff _),
    "w_rolling_mean" -> (Windows.rollingMean _),
    "w_last_per_group" -> (Windows.lastPerGroup _),
    "e_daily_rollup" -> (Events.dailyRollup _),
    "e_value_histogram" -> (Events.valueHistogram _),
    "e_active_users" -> (Events.activeUsers _),
    "t_dedup_exact" -> (TextOps.dedupExact _),
    "t_token_stats" -> (TextOps.tokenStats _),
    "t_quality_score" -> (TextOps.qualityScore _),
    "e_props_json" -> (Events.propsExtract _),
    "j_left_outer_orders" -> (Joins.leftOuterOrders _),
    "j_semi_anti" -> (Joins.semiAntiCustomers _),
    "j_grid_densify" -> (Joins.gridDensify _),
    "j_share_of_spend" -> (Joins.shareOfCustomerSpend _),
    "a_quantiles" -> (Aggregates.quantiles _),
    "a_quantiles_approx" -> (Aggregates.quantilesApprox _), // rows-only: sketch
    "a_correlation" -> (Aggregates.correlation _),
    "a_gamma_moments" -> (Aggregates.gammaMoments _),
    "a_collect_types" -> (Aggregates.collectTypes _),
    "a_cumulative_spend" -> (Aggregates.cumulativeSpend _),
    "a_sessionize" -> (Aggregates.sessionize _),
    "a_rollup" -> (Aggregates.rollupSummary _),
    "a_pivot" -> (Aggregates.pivotSpend _),
    "u_set_ops" -> (Aggregates.setOpsCustomers _),
    "j_asof_last_view" -> (TemporalJoins.asofLastView _),
    "j_range_pairs" -> (TemporalJoins.rangePairs _),
    "t_repetition" -> (TextOps.repetitionStats _),
    "t_hash_sample" -> (TextOps.hashSample _),
    "t_top_ngrams" -> (TextOps.topNgrams _),
    "a_approx_ndv" -> (Events.approxNdv _), // rows-only: HLL sketch
    "d_dup_clusters" -> (graft.dedup.Dedup.dupClusters _),
    "d_minhash_lsh" -> (graft.dedup.Dedup.minhashLsh _),
    "d_lsh_jaccard" -> (graft.dedup.Dedup.lshJaccard _),
    // xxhash64 production fast paths: no DuckDB twin (rows-only check);
    // benched alongside the md5-parity forms as the documented 100 TB path
    "d_minhash_lsh_fast" -> (graft.dedup.Dedup.minhashLshFast _),
    "d_lsh_jaccard_fast" -> (graft.dedup.Dedup.lshJaccardFast _),
    "d_simhash" -> (graft.dedup.Dedup.simhashDup _),
    "s_ann_topk" -> (graft.similarity.Ann.bruteForceTopK _),
    "s_lsh_pairs" -> (graft.similarity.Ann.lshPairs _),
    "s_ivf_topk" -> (graft.similarity.Ann.ivfTopK _),
    "d_embedding_dup" -> (graft.similarity.Ann.embeddingDup _),
    "f_fingerprint" -> (graft.functions.TextFunctions.fingerprint _),
    "f_langid" -> (graft.functions.TextFunctions.langId _),
    "f_bpe_tokens" -> (graft.functions.TextFunctions.bpeTokenCount _),
    "m_payload_stats" -> (graft.multimodal.Multimodal.payloadStats _),
    "s_math_funcs" -> (Scalars.mathFuncs _),
    "s_string_funcs" -> (Scalars.stringFuncs _),
    "s_date_funcs" -> (Scalars.dateFuncs _),
    "s_conditional_update" -> (Scalars.conditionalUpdate _),
    "a_weighted_mean" -> (Scalars.weightedMean _),
    "w_centered_rolling" -> (Scalars.centeredRolling _),
    "q4_order_priority" -> (Relational.q4OrderPriority _),
    "q13_custdist" -> (Relational.q13CustDist _),
    "a_grouping_sets" -> (Aggregates.groupingSetsSummary _),
    "w_range_window" -> (Windows.rangeWindow _),
    "w_rank_stats" -> (Windows.rankStats _),
    "e_funnel" -> (Events.funnel _),
    "j_bloom_prune" -> (Joins.bloomPrunedJoin _),
    "t_pack_sequences" -> (TextOps.packSequences _),
    "t_stratified_sample" -> (TextOps.stratifiedSample _),
    "t_training_mix" -> (TextOps.trainingMix _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1Sql,
    "q3_top_orders" -> Relational.q3Sql,
    "q5_region_revenue" -> Relational.q5Sql,
    "q6_forecast_revenue" -> Relational.q6Sql,
    "w_topk_per_group" -> Windows.topkSql,
    "w_lag_diff" -> Windows.lagDiffSql,
    "w_rolling_mean" -> Windows.rollingMeanSql,
    "w_last_per_group" -> Windows.lastPerGroupSql,
    "e_daily_rollup" -> Events.dailyRollupSql,
    "e_value_histogram" -> Events.valueHistogramSql,
    "e_active_users" -> Events.activeUsersSql,
    "t_dedup_exact" -> TextOps.dedupExactSql,
    "t_token_stats" -> TextOps.tokenStatsSql,
    "t_quality_score" -> TextOps.qualityScoreSql,
    "e_props_json" -> Events.propsExtractSql,
    "j_left_outer_orders" -> Joins.leftOuterOrdersSql,
    "j_semi_anti" -> Joins.semiAntiCustomersSql,
    "j_grid_densify" -> Joins.gridDensifySql,
    "j_share_of_spend" -> Joins.shareOfCustomerSpendSql,
    "a_quantiles" -> Aggregates.quantilesSql,
    "a_correlation" -> Aggregates.correlationSql,
    "a_gamma_moments" -> Aggregates.gammaMomentsSql,
    "a_collect_types" -> Aggregates.collectTypesSql,
    "a_cumulative_spend" -> Aggregates.cumulativeSpendSql,
    "a_sessionize" -> Aggregates.sessionizeSql,
    "a_rollup" -> Aggregates.rollupSummarySql,
    "a_pivot" -> Aggregates.pivotSpendSql,
    "u_set_ops" -> Aggregates.setOpsCustomersSql,
    "j_asof_last_view" -> TemporalJoins.asofLastViewSql,
    "j_range_pairs" -> TemporalJoins.rangePairsSql,
    "t_repetition" -> TextOps.repetitionStatsSql,
    "t_hash_sample" -> TextOps.hashSampleSql,
    "t_top_ngrams" -> TextOps.topNgramsSql,
    "d_dup_clusters" -> graft.dedup.Dedup.dupClustersSql,
    "d_minhash_lsh" -> graft.dedup.Dedup.minhashLshSql,
    "d_lsh_jaccard" -> graft.dedup.Dedup.lshJaccardSql,
    "d_simhash" -> graft.dedup.Dedup.simhashDupSql,
    "s_ann_topk" -> graft.similarity.Ann.bruteForceTopKSql,
    "s_lsh_pairs" -> graft.similarity.Ann.lshPairsSql,
    "s_ivf_topk" -> graft.similarity.Ann.ivfTopKSql,
    "d_embedding_dup" -> graft.similarity.Ann.embeddingDupSql,
    "f_fingerprint" -> graft.functions.TextFunctions.fingerprintSql,
    "f_langid" -> graft.functions.TextFunctions.langIdSql,
    "f_bpe_tokens" -> graft.functions.TextFunctions.bpeTokenCountSql,
    "m_payload_stats" -> graft.multimodal.Multimodal.payloadStatsSql,
    "s_math_funcs" -> Scalars.mathFuncsSql,
    "s_string_funcs" -> Scalars.stringFuncsSql,
    "s_date_funcs" -> Scalars.dateFuncsSql,
    "s_conditional_update" -> Scalars.conditionalUpdateSql,
    "a_weighted_mean" -> Scalars.weightedMeanSql,
    "w_centered_rolling" -> Scalars.centeredRollingSql,
    "q4_order_priority" -> Relational.q4Sql,
    "q13_custdist" -> Relational.q13Sql,
    "a_grouping_sets" -> Aggregates.groupingSetsSummarySql,
    "w_range_window" -> Windows.rangeWindowSql,
    "w_rank_stats" -> Windows.rankStatsSql,
    "e_funnel" -> Events.funnelSql,
    "j_bloom_prune" -> Joins.bloomPrunedJoinSql,
    "t_pack_sequences" -> TextOps.packSequencesSql,
    "t_stratified_sample" -> TextOps.stratifiedSampleSql,
    "t_training_mix" -> TextOps.trainingMixSql,
  )
}
