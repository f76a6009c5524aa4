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
    "t_quality_classifier" -> (TextOps.qualityClassifier _),
    "t_chunk_docs" -> (TextOps.chunkDocs _),
    "t_span_scrub" -> (TextOps.spanScrub _),
    "t_span_scrub_guarded" -> (TextOps.spanScrubGuarded _),
    "t_decontam_scrub" -> (TextOps.decontamScrub _),
    // ExactSubstr self-dedup (Lee et al. 2022): duplicated windows keep
    // only their globally FIRST occurrence — redundancy out, content kept
    "t_selfdedup_scrub" -> (TextOps.selfDedupScrub _),
    "t_selfdedup_guarded" -> (TextOps.selfDedupScrubGuarded _),
    // crawl-batched form against a persistent window-owner store; the
    // one-shot SQL gates it, proving sequential-incremental ≡ global
    "t_selfdedup_incremental" -> (TextOps.selfDedupIncremental _),
    // group-cohesive split: dup groups never straddle train/val/test
    "t_leakage_split" -> (graft.ops.DataSelection.leakageSplit _),
    "t_leakage_split_near" -> (graft.ops.DataSelection.leakageSplitClustered _),
    // the near split's cohesion law as a GATED answer: DuckDB replays the
    // clusters + split rule and independently verifies zero cross-split
    // verified-dup pairs
    "t_leakage_split_gate" -> (graft.ops.DataSelection.leakageSplitGate _),
    // per-source cap through the top-k rewrite (heap, not window skew)
    "t_domain_cap" -> (graft.ops.DataSelection.domainCap _),
    // codegen NFC normalizer with planted decomposed/composed twins
    "t_nfc_normalize" -> (TextOps.nfcNormalize _),
    // exact dedup over NFC-normalized bytes: composition variants collapse
    "t_dedup_nfc" -> (TextOps.dedupNfc _),
    "t_doc_keywords" -> (TextOps.docKeywords _),
    "e_props_json" -> (Events.propsExtract _),
    "j_left_outer_orders" -> (Joins.leftOuterOrders _),
    "j_semi_anti" -> (Joins.semiAntiCustomers _),
    "j_grid_densify" -> (Joins.gridDensify _),
    "j_share_of_spend" -> (Joins.shareOfCustomerSpend _),
    "a_quantiles" -> (Aggregates.quantiles _),
    "a_quantiles_approx" -> (Aggregates.quantilesApprox _), // rows-only: sketch
    "a_kmv_overlap" -> ((s, d) => graft.ops.Sketches.kmvUserOverlap(s, d)), // rows-only: sketch
    "t_perplexity" -> ((s, d) => { // rows-only: ln/exp floats are engine-specific
      val docs = graft.Tables.documents(s, d)
      TextOps.perplexityScores(docs, docs)
    }),
    "t_perplexity_core" -> (TextOps.perplexityCore _),
    "a_correlation" -> (Aggregates.correlation _),
    "a_gamma_moments" -> (Aggregates.gammaMoments _),
    "a_collect_types" -> (Aggregates.collectTypes _),
    "a_cumulative_spend" -> (Aggregates.cumulativeSpend _),
    "a_sessionize" -> (Aggregates.sessionize _),
    "w_scd2_intervals" -> (Windows.scd2Intervals _),
    "s_zorder_key" -> (graft.ops.ZOrder.zKeyQuery _),
    "a_rollup" -> (Aggregates.rollupSummary _),
    "a_pivot" -> (Aggregates.pivotSpend _),
    "u_set_ops" -> (Aggregates.setOpsCustomers _),
    // snapshot-versioned store: a v1 read after v2 lands sees only v1
    "s_time_travel" -> (graft.sources.VersionedStore.timeTravelDemo _),
    // manifest zone maps: file-level skipping before any footer is opened
    "s_zonemap_prune" -> (graft.sources.VersionedStore.zonemapPruneDemo _),
    "j_asof_last_view" -> (TemporalJoins.asofLastView _),
    // same oracle through the custom LogicalPlan/Strategy/SparkPlan path
    "j_asof_native" -> (TemporalJoins.asofLastViewNative _),
    "j_train_examples" -> (TemporalJoins.trainExamples _),
    // as-of + staleness horizon: the feature-store TTL rule
    "j_asof_tolerance" -> (TemporalJoins.asofTolerance _),
    "j_range_pairs" -> (TemporalJoins.rangePairs _),
    "t_repetition" -> (TextOps.repetitionStats _),
    "t_hash_sample" -> (TextOps.hashSample _),
    "t_top_ngrams" -> (TextOps.topNgrams _),
    "a_approx_ndv" -> (Events.approxNdv _), // rows-only: HLL sketch
    "d_dup_clusters" -> (graft.dedup.Dedup.dupClusters _),
    // quality-aware canonical: longest member survives, not min-id
    "d_canonical_best" -> (graft.dedup.Dedup.canonicalBest _),
    "d_minhash_lsh" -> (graft.dedup.Dedup.minhashLsh _),
    // r11: the default d_lsh_jaccard serves the bucketed layout (like
    // the gram family); d_lsh_inline keeps the layout-free form gated
    "d_lsh_jaccard" -> (graft.dedup.Dedup.lshJaccard _),
    "d_lsh_inline" -> (graft.dedup.Dedup.lshJaccardInline _),
    "d_lsh_bucketed" -> ((s, dir) => graft.dedup.Dedup.lshJaccardBucketedAttach(s, dir)),
    // xxhash64 production fast paths: no DuckDB twin (rows-only check);
    // benched alongside the md5-parity forms as the documented 100 TB path
    "d_minhash_lsh_fast" -> (graft.dedup.Dedup.minhashLshFast _),
    "d_lsh_jaccard_fast" -> (graft.dedup.Dedup.lshJaccardFast _),
    // + hot-bucket cap (the x-scale rehearsal's finding): bounded
    // band-bucket join, verified-dup recall pinned by DedupSpec
    "d_minhash_capped" -> ((s, dir) => graft.dedup.Dedup.minhashLshCapped(s, dir)),
    "d_lsh_jaccard_capped" -> ((s, dir) => graft.dedup.Dedup.lshJaccardCapped(s, dir)),
    "d_simhash" -> (graft.dedup.Dedup.simhashDup _),
    // 56-bit width: the 32-bit false-positive floor grows quadratically
    // in corpus size (measured in SCALE_r5.json); rows-only (wide
    // md5-simhash has no DuckDB twin)
    "d_simhash_wide" -> (graft.dedup.Dedup.simhashDupWide _),
    "s_ann_topk" -> ((s, dir) => graft.similarity.Ann.bruteForceTopK(s, dir)),
    // metadata-filtered vector search: predicate pre-filters candidates
    "s_ann_filtered" -> ((s, dir) => graft.similarity.Ann.bruteForceTopKFiltered(s, dir)),
    "s_lsh_pairs" -> (graft.similarity.Ann.lshPairs _),
    "s_ivf_topk" -> (graft.similarity.Ann.ivfTopK _),
    // persisted-index twins: train once into a cache, time ONLY the query
    // (the production serve path); results pinned identical to the
    // inline paths, so the same oracles gate them
    "s_ivf_upsert" -> (graft.similarity.Ann.ivfUpsertServe _),
    "s_ivf_topk_indexed" -> (graft.similarity.Ann.ivfTopKCached _),
    "s_pq_topk_indexed" -> (graft.similarity.Ann.pqTopKCached _),
    "s_pq_topk_versioned" -> (graft.similarity.Ann.pqVersionedServe _),
    "d_embedding_dup" -> (graft.similarity.Ann.embeddingDup _),
    // SemDeDup: k-means cells + within-cell cosine pruning (arXiv:2303.09540)
    "d_semantic_dedup" -> (graft.similarity.Ann.semanticDedup _),
    // scale path: corpus-scaled LSH cells, map-only assignment (rows-only)
    "d_semantic_scaled" -> ((s, dir) => graft.similarity.Ann.semanticDedupScaled(s, dir)),
    // capped hyperplane buckets (scale-rehearsal finding; rows-only)
    "d_embedding_capped" -> ((s, dir) => graft.similarity.Ann.embeddingDupCapped(s, dir)),
    // corpus-scaled multi-table LSH (planes grow with log n; rows-only)
    "d_embedding_scaled" -> ((s, dir) => graft.similarity.Ann.embeddingDupScaled(s, dir)),
    "f_fingerprint" -> (graft.functions.TextFunctions.fingerprint _),
    "f_langid" -> (graft.functions.TextFunctions.langId _),
    "f_bpe_tokens" -> (graft.functions.TextFunctions.bpeTokenCount _),
    "t_bpe_encode" -> (graft.ops.Bpe.bpeEncode _),
    "m_payload_stats" -> (graft.multimodal.Multimodal.payloadStats _),
    "s_math_funcs" -> (Scalars.mathFuncs _),
    "s_string_funcs" -> (Scalars.stringFuncs _),
    "s_date_funcs" -> (Scalars.dateFuncs _),
    "s_conditional_update" -> (Scalars.conditionalUpdate _),
    "a_weighted_mean" -> (Scalars.weightedMean _),
    "w_centered_rolling" -> (Scalars.centeredRolling _),
    "q4_order_priority" -> (Relational.q4OrderPriority _),
    "q13_custdist" -> (Relational.q13CustDist _),
    "q18_big_orders" -> (Relational.q18BigOrders _),
    "q21_late_suppliers" -> (Relational.q21LateSuppliers _),
    "q17_small_quantity" -> (Relational.q17SmallQuantity _),
    "q7_shipping_volume" -> (Relational.q7ShippingVolume _),
    "q8_market_share" -> (Relational.q8MarketShare _),
    "q22_no_orders" -> (Relational.q22NoOrders _),
    "a_grouping_sets" -> (Aggregates.groupingSetsSummary _),
    "w_range_window" -> (Windows.rangeWindow _),
    "w_rank_stats" -> (Windows.rankStats _),
    "e_funnel" -> (Events.funnel _),
    "e_retention" -> (Events.retention _),
    "a_mode_per_user" -> (Aggregates.modePerUser _),
    "a_outlier_stats" -> (Aggregates.outlierStats _),
    "a_psi_bins" -> (Drift.psiBins _),
    "t_normalize" -> (TextOps.normalizeText _),
    "t_freq_tokens" -> (TextOps.freqTokens _),
    "t_freq_tokens_exact" -> (TextOps.freqTokensExact _),
    "j_salted_type" -> (Skew.saltedTypeJoin _),
    "d_decontaminate" -> (graft.dedup.Dedup.decontaminate _),
    "j_bloom_prune" -> (Joins.bloomPrunedJoin _),
    "t_pack_sequences" -> (TextOps.packSequences _),
    "t_stratified_sample" -> (TextOps.stratifiedSample _),
    "t_training_mix" -> (TextOps.trainingMix _),
    "s_kmeans_ivf" -> (graft.similarity.Ann.kmeansIvf _),
    "s_pq_topk" -> (graft.similarity.Ann.pqTopK _),
    "t_pipeline_audit" -> (graft.pipelines.TrainingPipeline.pipelineAudit _),
    "t_pipeline_scrub" -> (graft.pipelines.TrainingPipeline.pipelineScrubAudit _),
    "t_pii_redact" -> (TextOps.piiRedact _),
    "d_incremental_admit" -> ((s: org.apache.spark.sql.SparkSession, d: String) => graft.dedup.IncrementalDedup.incrementalAdmit(s, d)),
    "d_incremental_admit_fast" -> ((s: org.apache.spark.sql.SparkSession, d: String) => graft.dedup.IncrementalDedup.incrementalAdmitFast(s, d)),
    "w_resample_locf" -> (Windows.resampleLocf _),
    // linear-interpolation gap fill: both neighbors in one window pass
    "w_interpolate" -> (Windows.resampleInterpolate _),
    // recursive smoother unrolled to a bounded integer-exact lag frame
    "w_ewma" -> (Windows.ewma _),
    // exact windowed median via in-row sort of the bounded frame
    "w_rolling_median" -> (Windows.rollingMedian _),
    // MERGE INTO: one full-outer join + first-true-wins clause chain
    "s_merge_upsert" -> (Merge.mergeUpsert _),
    // lossless text-format sources: hash-gated against the parquet original
    "s_jsonl_roundtrip" -> (graft.sources.TextFormats.jsonlRoundtrip _),
    "s_csv_roundtrip" -> (graft.sources.TextFormats.csvRoundtrip _),
    "s_orc_roundtrip" -> (graft.sources.TextFormats.orcRoundtrip _),
    // 3-step path mining: one lag window, no adjacent-rank self-joins
    "e_top_paths" -> (Events.topPaths _),
    // per-cell chi-square contingency: integer counts, one shared-shape
    // double expression at the end
    "a_chi2_cells" -> (Aggregates.chi2Cells _),
    // last/first-touch conversion credit via one ignore-nulls LOCF window
    "e_attribution" -> (Events.attribution _),
    // PageRank iterations as join+agg rounds; integer ppb ranks
    "g_copurchase_rank" -> (graft.ops.Graph.copurchaseRank _),
    // personalized PageRank: restart mass on one seed (recommender form)
    "g_personalized_rank" -> (graft.ops.Graph.personalizedRank _),
    // r11: the DEFAULT gram-family entries serve through the bucketed
    // layout (reuse = true — build once per process, then pure serve);
    // the `_inline` twins keep the layout-free form oracle-green and the
    // `_bucketed` twins measure a layout-fresh rebuild each run
    "d_ngram_jaccard" -> (graft.dedup.Dedup.ngramJaccard _),
    "d_ngram_inline" -> (graft.dedup.Dedup.ngramJaccardInline _),
    "d_ngram_jaccard_fast" -> (graft.dedup.Dedup.ngramJaccardFast _),
    "d_ngram_bucketed" -> ((s, dir) => graft.dedup.Dedup.ngramJaccardBucketedAttach(s, dir)),
    "d_ngram_incremental" -> (graft.dedup.NgramIndex.incrementalServe _),
    "d_ngram_indexed" -> (graft.dedup.NgramIndex.ngramJaccardCached _),
    // asymmetric-overlap dedup: |A∩B|/min — catches excerpts/quotes
    // that symmetric Jaccard structurally misses (planted both engines)
    "d_containment" -> (graft.dedup.Dedup.containment _),
    "d_containment_inline" -> (graft.dedup.Dedup.containmentInline _),
    "d_containment_bucketed" -> ((s, dir) => graft.dedup.Dedup.containmentBucketedAttach(s, dir)),
    "j_fuzzy_names" -> (Joins.fuzzyNameMatch _),
    "t_dq_audit" -> (Quality.dqAudit _),
    "a_cube" -> (Aggregates.cubeSummary _),
    "a_pivot_dynamic" -> (Aggregates.pivotDynamic _),
    "q2_min_cost_supplier" -> (TpchShapes.q2MinCostSupplier _),
    "q9_nation_profit" -> (TpchShapes.q9NationProfit _),
    "q10_returned_items" -> (TpchShapes.q10ReturnedItems _),
    "q11_important_parts" -> (TpchShapes.q11ImportantParts _),
    "q12_priority_lines" -> (TpchShapes.q12PriorityLines _),
    "q14_promo_share" -> (TpchShapes.q14PromoShare _),
    "q15_top_supplier" -> (TpchShapes.q15TopSupplier _),
    "q16_supplier_counts" -> (TpchShapes.q16SupplierCounts _),
    "q19_disjunctive" -> (TpchShapes.q19Disjunctive _),
    "q20_excess_suppliers" -> (TpchShapes.q20ExcessSuppliers _),
    // DSIR importance resampling: integer bucket core oracle-gated,
    // ln-weight step rows-only (libm) + spec vs a driver reference
    "t_dsir_bins" -> (DataSelection.dsirBins _),
    "t_curriculum_order" -> (DataSelection.curriculumOrder _),
    // corpus-scale curriculum: broadcast cut-points from the bounded
    // quality histogram replace the global ntile sort — EXACTLY
    // ntile-equal, gated by the UNMODIFIED inline oracle SQL
    "t_curriculum_scaled" -> (DataSelection.curriculumOrderScaled _),
    "t_dsir_weights" -> (DataSelection.dsirWeights _),
    // deterministic epoch shuffle → shards; per-shard order digest
    "t_shard_shuffle" -> (DataSelection.shardShuffle _),
    // temperature-scaled source quotas (n^0.5): IEEE sqrt/×/÷ are
    // correctly rounded, the one order-sensitive sum folds sorted
    "t_temperature_mix" -> (DataSelection.temperatureMix _),
    // day-of-week seasonal mean + integer-exact residuals
    "w_seasonal_decompose" -> (Events.seasonalDecompose _),
    // 2-sigma residual anomaly flags via integer cross-multiplication
    "e_anomaly_days" -> (Events.anomalyDays _),
    // exact 7-day rolling OLS slope via unrolled lags (trend detector)
    "w_rolling_slope" -> (Events.rollingSlope _),
    // hybrid retrieval: BM25 integer core + RRF fusion oracle-gated,
    // log-idf scoring rows-only + spec vs a scalar reference
    "s_bm25_core" -> (graft.similarity.Retrieval.bm25Core _),
    "s_bm25_topk" -> (graft.similarity.Retrieval.bm25TopK _),
    "s_bm25_nfc" -> (graft.similarity.Retrieval.bm25TopKNfcQuery _),
    // the NFC recipe's integer core — candidate generation + counts over
    // the canonicalized corpus, hash-gated like the raw family's
    "s_bm25_nfc_core" -> (graft.similarity.Retrieval.bm25NfcCore _),
    // persisted-inverted-index serve twin: results pinned bit-identical
    // to the inline form (PostingIndexSpec), entry times pure serve
    "s_bm25_topk_indexed" -> (graft.similarity.Retrieval.bm25TopKCached _),
    "s_hybrid_rrf" -> (graft.similarity.Retrieval.hybridRrf _),
    // offline ranking eval: hits@k + MRR in floor-micros, all integer
    "s_retrieval_metrics" -> (graft.similarity.Retrieval.retrievalMetrics _),
    // distributed PCA: one-pass Gram agg + driver Jacobi + codegen
    // projection; rows-only (eigensolvers have no cross-engine identity)
    "s_pca_project" -> (graft.ml.Pca.pcaProject _),
    // the PCA accumulator's integer core: (n, Σq, Σq·qᵀ) over quantized
    // vectors, every BIGINT sum replayed in DuckDB — only the driver
    // Jacobi eigen step stays rows-only
    "s_pca_gram_core" -> (graft.ml.Pca.pcaGramCore _),
    // leave-one-out categorical target encoding, integer-exact
    "j_target_encode" -> (Features.looTargetEncode _),
    // trailing 7-day distinct actives via bounded x7 fan-out (no range
    // self-join, no unbounded window state)
    "e_sliding_actives" -> (Events.slidingActives _),
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
    "t_quality_classifier" -> TextOps.qualityClassifierSql,
    "t_chunk_docs" -> TextOps.chunkDocsSql,
    "t_span_scrub" -> TextOps.spanScrubSql,
    "t_span_scrub_guarded" -> TextOps.spanScrubSql,
    "t_decontam_scrub" -> TextOps.decontamScrubSql,
    "t_selfdedup_scrub" -> TextOps.selfDedupScrubSql,
    // the guard changes the join ROUTE, not the answer: same oracle
    "t_selfdedup_guarded" -> TextOps.selfDedupScrubSql,
    // first-wins is prefix-stable, so batched ≡ one-shot — same oracle
    "t_selfdedup_incremental" -> TextOps.selfDedupScrubSql,
    // near-dup variant (t_leakage_split_near) is rows-only: connected
    // components aren't SQL-replayable; cohesion law is spec-gated
    "t_leakage_split" -> graft.ops.DataSelection.leakageSplitSql,
    "t_leakage_split_gate" -> graft.ops.DataSelection.leakageSplitGateSql,
    "t_domain_cap" -> graft.ops.DataSelection.domainCapSql,
    "t_nfc_normalize" -> TextOps.nfcNormalizeSql,
    "t_dedup_nfc" -> TextOps.dedupNfcSql,
    "t_doc_keywords" -> TextOps.docKeywordsSql,
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
    "w_scd2_intervals" -> Windows.scd2IntervalsSql,
    "s_zorder_key" -> graft.ops.ZOrder.zKeySql,
    "a_rollup" -> Aggregates.rollupSummarySql,
    "a_pivot" -> Aggregates.pivotSpendSql,
    "u_set_ops" -> Aggregates.setOpsCustomersSql,
    "s_time_travel" -> graft.sources.VersionedStore.timeTravelDemoSql,
    "s_zonemap_prune" -> graft.sources.VersionedStore.zonemapPruneDemoSql,
    "j_asof_last_view" -> TemporalJoins.asofLastViewSql,
    "j_asof_native" -> TemporalJoins.asofLastViewSql,
    "j_train_examples" -> TemporalJoins.trainExamplesSql,
    "j_asof_tolerance" -> TemporalJoins.asofToleranceSql,
    "j_range_pairs" -> TemporalJoins.rangePairsSql,
    "t_repetition" -> TextOps.repetitionStatsSql,
    "t_hash_sample" -> TextOps.hashSampleSql,
    "t_top_ngrams" -> TextOps.topNgramsSql,
    "t_freq_tokens_exact" -> TextOps.freqTokensExactSql,
    "d_dup_clusters" -> graft.dedup.Dedup.dupClustersSql,
    "d_canonical_best" -> graft.dedup.Dedup.canonicalBestSql,
    "d_minhash_lsh" -> graft.dedup.Dedup.minhashLshSql,
    "d_lsh_jaccard" -> graft.dedup.Dedup.lshJaccardSql,
    "d_lsh_inline" -> graft.dedup.Dedup.lshJaccardSql,
    // bit-identical result over bucketed storage — same oracle gates all
    "d_lsh_bucketed" -> graft.dedup.Dedup.lshJaccardSql,
    "d_simhash" -> graft.dedup.Dedup.simhashDupSql,
    "s_ann_topk" -> graft.similarity.Ann.bruteForceTopKSql,
    "s_ann_filtered" -> graft.similarity.Ann.bruteForceTopKFilteredSql,
    "s_lsh_pairs" -> graft.similarity.Ann.lshPairsSql,
    "s_ivf_topk" -> graft.similarity.Ann.ivfTopKSql,
    "s_ivf_topk_indexed" -> graft.similarity.Ann.ivfTopKSql,
    "s_ivf_upsert" -> graft.similarity.Ann.ivfTopKSql,
    "s_pq_topk_indexed" -> graft.similarity.Ann.pqTopKSql,
    "s_pq_topk_versioned" -> graft.similarity.Ann.pqTopKSql,
    "d_embedding_dup" -> graft.similarity.Ann.embeddingDupSql,
    "d_semantic_dedup" -> graft.similarity.Ann.semanticDedupSql,
    "f_fingerprint" -> graft.functions.TextFunctions.fingerprintSql,
    "f_langid" -> graft.functions.TextFunctions.langIdSql,
    "f_bpe_tokens" -> graft.functions.TextFunctions.bpeTokenCountSql,
    "t_bpe_encode" -> graft.ops.Bpe.bpeEncodeSql,
    "m_payload_stats" -> graft.multimodal.Multimodal.payloadStatsSql,
    "s_math_funcs" -> Scalars.mathFuncsSql,
    "s_string_funcs" -> Scalars.stringFuncsSql,
    "s_date_funcs" -> Scalars.dateFuncsSql,
    "s_conditional_update" -> Scalars.conditionalUpdateSql,
    "a_weighted_mean" -> Scalars.weightedMeanSql,
    "w_centered_rolling" -> Scalars.centeredRollingSql,
    "q4_order_priority" -> Relational.q4Sql,
    "q13_custdist" -> Relational.q13Sql,
    "q18_big_orders" -> Relational.q18Sql,
    "q21_late_suppliers" -> Relational.q21Sql,
    "q17_small_quantity" -> Relational.q17Sql,
    "q7_shipping_volume" -> Relational.q7Sql,
    "q8_market_share" -> Relational.q8Sql,
    "q22_no_orders" -> Relational.q22Sql,
    "a_grouping_sets" -> Aggregates.groupingSetsSummarySql,
    "w_range_window" -> Windows.rangeWindowSql,
    "w_rank_stats" -> Windows.rankStatsSql,
    "e_funnel" -> Events.funnelSql,
    "e_retention" -> Events.retentionSql,
    "a_mode_per_user" -> Aggregates.modePerUserSql,
    "a_outlier_stats" -> Aggregates.outlierStatsSql,
    "a_psi_bins" -> Drift.psiBinsSql,
    "t_normalize" -> TextOps.normalizeTextSql,
    "j_salted_type" -> Skew.saltedTypeJoinSql,
    "d_decontaminate" -> graft.dedup.Dedup.decontaminateSql,
    "j_bloom_prune" -> Joins.bloomPrunedJoinSql,
    "t_pack_sequences" -> TextOps.packSequencesSql,
    "t_stratified_sample" -> TextOps.stratifiedSampleSql,
    "t_training_mix" -> TextOps.trainingMixSql,
    "s_kmeans_ivf" -> graft.similarity.Ann.kmeansIvfSql,
    "s_pq_topk" -> graft.similarity.Ann.pqTopKSql,
    "t_pipeline_audit" -> graft.pipelines.TrainingPipeline.pipelineAuditSql,
    "t_pipeline_scrub" -> graft.pipelines.TrainingPipeline.pipelineScrubAuditSql,
    "t_pii_redact" -> TextOps.piiRedactSql,
    "d_incremental_admit" -> graft.dedup.IncrementalDedup.incrementalAdmitSql,
    "w_resample_locf" -> Windows.resampleLocfSql,
    "w_interpolate" -> Windows.resampleInterpolateSql,
    "w_ewma" -> Windows.ewmaSql,
    "w_rolling_median" -> Windows.rollingMedianSql,
    "s_merge_upsert" -> Merge.mergeUpsertSql,
    "s_jsonl_roundtrip" -> graft.sources.TextFormats.roundtripSql,
    "s_csv_roundtrip" -> graft.sources.TextFormats.roundtripSql,
    "s_orc_roundtrip" -> graft.sources.TextFormats.roundtripSql,
    "e_top_paths" -> Events.topPathsSql,
    "a_chi2_cells" -> Aggregates.chi2CellsSql,
    "e_attribution" -> Events.attributionSql,
    "g_copurchase_rank" -> graft.ops.Graph.copurchaseRankSql,
    "g_personalized_rank" -> graft.ops.Graph.personalizedRankSql,
    "d_ngram_jaccard" -> graft.dedup.Dedup.ngramJaccardSql,
    "d_ngram_inline" -> graft.dedup.Dedup.ngramJaccardSql,
    // the bucketed attach is gated by the SAME SQL as the inline form:
    // the hash proves the exchange-free layout changes the plan (which
    // d_ngram_jaccard now serves by default), not the answer
    "d_ngram_bucketed" -> graft.dedup.Dedup.ngramJaccardSql,
    "d_ngram_incremental" -> graft.dedup.Dedup.ngramJaccardSql,
    "d_ngram_indexed" -> graft.dedup.Dedup.ngramJaccardSql,
    "d_containment" -> graft.dedup.Dedup.containmentSql,
    "d_containment_inline" -> graft.dedup.Dedup.containmentSql,
    // bucketed attach changes the LAYOUT, not the answer: gated by the
    // same SQL, like d_ngram_bucketed
    "d_containment_bucketed" -> graft.dedup.Dedup.containmentSql,
    "j_fuzzy_names" -> Joins.fuzzyNameMatchSql,
    "t_dq_audit" -> Quality.dqAuditSql,
    "a_cube" -> Aggregates.cubeSummarySql,
    "a_pivot_dynamic" -> Aggregates.pivotDynamicSql,
    "q2_min_cost_supplier" -> TpchShapes.q2Sql,
    "q9_nation_profit" -> TpchShapes.q9Sql,
    "q10_returned_items" -> TpchShapes.q10Sql,
    "q11_important_parts" -> TpchShapes.q11Sql,
    "q12_priority_lines" -> TpchShapes.q12Sql,
    "q14_promo_share" -> TpchShapes.q14Sql,
    "q15_top_supplier" -> TpchShapes.q15Sql,
    "q16_supplier_counts" -> TpchShapes.q16Sql,
    "q19_disjunctive" -> TpchShapes.q19Sql,
    "q20_excess_suppliers" -> TpchShapes.q20Sql,
    "t_dsir_bins" -> DataSelection.dsirBinsSql,
    "t_curriculum_order" -> DataSelection.curriculumOrderSql,
    // the scaled path must reproduce the inline ntile result exactly —
    // same SQL, so the hash gate proves plan-equivalence
    "t_curriculum_scaled" -> DataSelection.curriculumOrderSql,
    "t_perplexity_core" -> TextOps.perplexityCoreSql,
    "t_shard_shuffle" -> DataSelection.shardShuffleSql,
    "w_seasonal_decompose" -> Events.seasonalDecomposeSql,
    "s_bm25_core" -> graft.similarity.Retrieval.bm25CoreSql,
    "s_bm25_nfc_core" -> graft.similarity.Retrieval.bm25NfcCoreSql,
    "s_hybrid_rrf" -> graft.similarity.Retrieval.hybridRrfSql,
    "j_target_encode" -> Features.looTargetEncodeSql,
    "e_sliding_actives" -> Events.slidingActivesSql,
    "s_retrieval_metrics" -> graft.similarity.Retrieval.retrievalMetricsSql,
    "e_anomaly_days" -> Events.anomalyDaysSql,
    "w_rolling_slope" -> Events.rollingSlopeSql,
    "t_temperature_mix" -> DataSelection.temperatureMixSql,
    "s_pca_gram_core" -> graft.ml.Pca.pcaGramCoreSql,
  )
}
