package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each `queries` entry is a thin binding of an operator from
  * `graft.operators.*` to the testdata tables; each `oracleSql` entry is
  * the DuckDB-ANSI equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {
  import Tables._

  private val Cutoff = "1998-01-01"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    StarSchema.factLineitem(lineitem(spark, dir), orders(spark, dir))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. cleaning / ETL
    "clean_events" -> ((s, d) => CleanOps.cleanEvents(events(s, d))),
    "parse_timestamps" -> ((s, d) => CleanOps.parseTimestamps(events(s, d))),
    "price_clean" -> ((s, d) => CleanOps.priceClean(orders(s, d))),
    "json_extract_props" -> ((s, d) => CleanOps.jsonExtractProps(events(s, d))),
    "json_key_profile" -> ((s, d) => CleanOps.jsonKeyProfile(events(s, d))),
    "geohash_encode" -> ((s, d) => CleanOps.geohashEncode(customer(s, d))),
    "null_profile" -> ((s, d) => CleanOps.nullProfile(
      CleanOps.priceClean(orders(s, d)),
      Seq("o_orderkey", "price_raw", "price"))),
    // B. star schema
    "dim_date" -> ((s, d) => StarSchema.dimDate(orders(s, d), lineitem(s, d))),
    "dim_customer_geo" -> ((s, d) =>
      StarSchema.dimCustomerGeo(customer(s, d), nation(s, d), region(s, d))),
    "dim_supplier_geo" -> ((s, d) =>
      StarSchema.dimSupplierGeo(supplier(s, d), nation(s, d), region(s, d))),
    "fact_orders" -> ((s, d) =>
      StarSchema.factOrders(orders(s, d), customer(s, d), nation(s, d))),
    "fact_lineitem" -> ((s, d) =>
      StarSchema.factLineitem(lineitem(s, d), orders(s, d))),
    "incremental_dim_load" -> ((s, d) =>
      StarSchema.incrementalDimLoad(orders(s, d), customer(s, d), Cutoff)),
    "incremental_fact_load" -> ((s, d) =>
      StarSchema.incrementalFactLoad(orders(s, d))),
    // C. warehouse analytics
    "agg_region_pct" -> ((s, d) =>
      Analytics.aggRegionPct(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "top_types_by_nation" -> ((s, d) =>
      Analytics.topTypesByNation(lineitem(s, d), supplier(s, d), nation(s, d), part(s, d))),
    "avg_duration_by_priority" -> ((s, d) =>
      Analytics.avgDurationByPriority(lineitem(s, d), orders(s, d))),
    "price_stats_by_region" -> ((s, d) =>
      Analytics.priceStatsByRegion(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "revenue_by_nation_segment" -> ((s, d) =>
      Analytics.revenueByNationSegment(orders(s, d), customer(s, d), nation(s, d))),
    "geo_join_counts" -> ((s, d) =>
      Analytics.geoJoinCounts(customer(s, d), supplier(s, d), nation(s, d), region(s, d))),
    "density_correlation" -> ((s, d) =>
      Analytics.densityCorrelation(orders(s, d), customer(s, d), supplier(s, d), nation(s, d))),
    "quarterly_trend" -> ((s, d) =>
      Analytics.quarterlyTrend(orders(s, d), customer(s, d), nation(s, d))),
    "weekend_pattern" -> ((s, d) =>
      Analytics.weekendPattern(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "pct_fast_fulfillment" -> ((s, d) =>
      Analytics.pctFastFulfillment(lineitem(s, d), orders(s, d))),
    "late_shipment_priority" -> ((s, d) =>
      Analytics.lateShipmentPriority(orders(s, d), lineitem(s, d))),
    "customer_order_distribution" -> ((s, d) =>
      Analytics.customerOrderDistribution(customer(s, d), orders(s, d))),
    "customer_spend_quartiles" -> ((s, d) =>
      Analytics.customerSpendQuartiles(orders(s, d), customer(s, d))),
    "pricing_summary" -> ((s, d) => Analytics.pricingSummary(lineitem(s, d))),
    "shipping_priority" -> ((s, d) =>
      Analytics.shippingPriority(lineitem(s, d), orders(s, d), customer(s, d))),
    "local_supplier_volume" -> ((s, d) =>
      Analytics.localSupplierVolume(lineitem(s, d), orders(s, d), customer(s, d),
        supplier(s, d), nation(s, d), region(s, d))),
    "quality_report" -> ((s, d) =>
      Analytics.qualityReport(orders(s, d), lineitem(s, d))),
    "top_customers_per_nation" -> ((s, d) =>
      Analytics.topCustomersPerNation(orders(s, d), customer(s, d), nation(s, d))),
    "rolling_order_volume" -> ((s, d) => Analytics.rollingOrderVolume(orders(s, d))),
    "status_pivot_by_region" -> ((s, d) =>
      Analytics.statusPivotByRegion(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "revenue_rollup" -> ((s, d) =>
      Analytics.revenueRollup(orders(s, d), customer(s, d), nation(s, d))),
    "correlation_density" -> ((s, d) =>
      Analytics.correlationDensity(orders(s, d), customer(s, d))),
    "stddev_order_value" -> ((s, d) =>
      Analytics.stddevOrderValue(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "median_order_value" -> ((s, d) =>
      Analytics.medianOrderValue(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "weekly_retention" -> ((s, d) => Analytics.weeklyRetention(events(s, d))),
    "hourly_anomalies" -> ((s, d) => Analytics.hourlyAnomalies(events(s, d))),
    "disjunctive_promo_revenue" -> ((s, d) =>
      Analytics.disjunctivePromoRevenue(lineitem(s, d), part(s, d))),
    "idle_rich_customers" -> ((s, d) =>
      Analytics.idleRichCustomers(customer(s, d), orders(s, d), nation(s, d))),
    "returned_item_customers" -> ((s, d) =>
      Analytics.returnedItemCustomers(lineitem(s, d), orders(s, d),
        customer(s, d), nation(s, d))),
    "small_qty_revenue" -> ((s, d) =>
      Analytics.smallQtyRevenue(lineitem(s, d), part(s, d))),
    "large_order_customers" -> ((s, d) =>
      Analytics.largeOrderCustomers(lineitem(s, d), orders(s, d), customer(s, d))),
    "volume_shipping" -> ((s, d) =>
      Analytics.volumeShipping(lineitem(s, d), orders(s, d), customer(s, d),
        supplier(s, d), nation(s, d))),
    "product_profit" -> ((s, d) =>
      Analytics.productProfit(lineitem(s, d), orders(s, d), part(s, d),
        supplier(s, d), nation(s, d))),
    "customer_sample_by_nation" -> ((s, d) =>
      Analytics.customerSampleByNation(customer(s, d), nation(s, d))),
    "discount_revenue_delta" -> ((s, d) =>
      Analytics.discountRevenueDelta(lineitem(s, d))),
    "market_share" -> ((s, d) =>
      Analytics.marketShare(lineitem(s, d), orders(s, d), customer(s, d),
        supplier(s, d), nation(s, d), region(s, d))),
    "promo_revenue_pct" -> ((s, d) =>
      Analytics.promoRevenuePct(lineitem(s, d), part(s, d))),
    "top_supplier" -> ((s, d) =>
      Analytics.topSupplier(lineitem(s, d), supplier(s, d))),
    "sole_late_supplier" -> ((s, d) =>
      Analytics.soleLateSupplier(lineitem(s, d), orders(s, d),
        supplier(s, d), nation(s, d))),
    "min_cost_supplier" -> ((s, d) =>
      Analytics.minCostSupplier(lineitem(s, d), part(s, d), supplier(s, d),
        nation(s, d), region(s, d))),
    "part_supplier_counts" -> ((s, d) =>
      Analytics.partSupplierCounts(lineitem(s, d), part(s, d), supplier(s, d))),
    "important_parts" -> ((s, d) =>
      Analytics.importantParts(lineitem(s, d), supplier(s, d), nation(s, d))),
    "late_priority_mix" -> ((s, d) =>
      Analytics.latePriorityMix(orders(s, d), lineitem(s, d))),
    "excess_share_suppliers" -> ((s, d) =>
      Analytics.excessShareSuppliers(lineitem(s, d), part(s, d),
        supplier(s, d), nation(s, d))),
    "order_gap_stats" -> ((s, d) => Analytics.orderGapStats(orders(s, d))),
    "customer_rfm_segments" -> ((s, d) =>
      Analytics.customerRfmSegments(orders(s, d))),
    "cohort_ltv" -> ((s, d) => Analytics.cohortLtv(orders(s, d))),
    "basket_affinity" -> ((s, d) =>
      Analytics.basketAffinity(lineitem(s, d), part(s, d))),
    "seasonality_index" -> ((s, d) => Analytics.seasonalityIndex(orders(s, d))),
    "new_vs_returning" -> ((s, d) => Analytics.newVsReturning(orders(s, d))),
    "token_budget_alloc" -> ((s, d) =>
      PipelineOps.tokenBudgetAlloc(documents(s, d))),
    "rolling_anomaly_flags" -> ((s, d) =>
      TrendOps.rollingAnomalyFlags(events(s, d))),
    "fk_orphans" -> ((s, d) => AuditOps.fkOrphans(lineitem(s, d), orders(s, d),
      part(s, d), supplier(s, d), customer(s, d), nation(s, d), region(s, d))),
    "benford_audit" -> ((s, d) =>
      AuditOps.benfordAudit(orders(s, d), lineitem(s, d))),
    "name_fuzzy_pairs" -> ((s, d) => AuditOps.nameFuzzyPairs(customer(s, d))),
    "quantile_sketch_audit" -> ((s, d) =>
      AuditOps.quantileSketchAudit(orders(s, d))),
    "join_size_estimate" -> ((s, d) =>
      AuditOps.joinSizeEstimate(orders(s, d), lineitem(s, d), customer(s, d))),
    "stats_drift" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val proj = orders(s, d).select(
        col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_cents"),
        datediff(col("o_orderdate"), to_date(lit("1992-01-01"))).cast("long")
          .as("order_day"),
        col("o_orderdate"))
      val cut = to_date(lit("1997-01-01"))
      AuditOps.statsDrift(
        proj.filter(col("o_orderdate") < cut).drop("o_orderdate"),
        proj.filter(col("o_orderdate") >= cut).drop("o_orderdate"),
        Seq("o_custkey", "price_cents", "order_day"))
    }),
    "join_plan_advisor" -> ((s, d) => AuditOps.joinPlanAdvisor(Seq(
      ("lineitem.l_orderkey=orders.o_orderkey",
        lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"),
      ("orders.o_custkey=customer.c_custkey",
        orders(s, d), "o_custkey", customer(s, d), "c_custkey"),
      ("customer.c_nationkey=nation.n_nationkey",
        customer(s, d), "c_nationkey", nation(s, d), "n_nationkey"),
      ("events.user_id=orders.o_custkey",
        events(s, d), "user_id", orders(s, d), "o_custkey")))),
    "nation_communities" -> ((s, d) =>
      GraphOps.nationCommunities(lineitem(s, d), orders(s, d),
        customer(s, d), supplier(s, d), nation(s, d))),
    "order_value_percentiles_cont" -> ((s, d) =>
      Analytics.orderValuePercentilesCont(orders(s, d))),
    "hll_merge_audit" -> ((s, d) => Analytics.hllMergeAudit(events(s, d))),
    "kmv_intersection" -> ((s, d) => Analytics.kmvIntersection(events(s, d))),
    "robust_price_stats" -> ((s, d) => Analytics.robustPriceStats(orders(s, d))),
    "rolling_distinct_users" -> ((s, d) =>
      Analytics.rollingDistinctUsers(events(s, d))),
    "equi_depth_histogram" -> ((s, d) =>
      Analytics.equiDepthHistogram(orders(s, d))),
    "rfm_segments" -> ((s, d) => Analytics.rfmSegments(orders(s, d))),
    "spend_decile_lift" -> ((s, d) => Analytics.spendDecileLift(orders(s, d))),
    "partition_stats" -> ((s, d) => AuditOps.partitionStats(lineitem(s, d))),
    "category_growth" -> ((s, d) =>
      Analytics.categoryGrowth(lineitem(s, d), part(s, d))),
    "snapshot_diff" -> ((s, d) => {
      val (old, neu) = ChangeOps.orderSnapshots(orders(s, d))
      ChangeOps.snapshotDiff(old, neu)
    }),
    "table_fingerprint" -> ((s, d) =>
      ChangeOps.tableFingerprint(orders(s, d), lineitem(s, d), customer(s, d))),
    "ols_revenue_trend" -> ((s, d) =>
      TrendOps.olsRevenueTrend(orders(s, d), customer(s, d), nation(s, d),
        region(s, d))),
    "daily_gapfill" -> ((s, d) => TrendOps.dailyGapfill(orders(s, d))),
    "acf_daily_revenue" -> ((s, d) => TrendOps.acfDailyRevenue(orders(s, d))),
    "holt_forecast" -> ((s, d) => TrendOps.holtForecast(orders(s, d))),
    "theil_sen_trend" -> ((s, d) => StatOps.theilSenTrend(orders(s, d))),
    "revenue_motifs" -> ((s, d) => StatOps.revenueMotifs(orders(s, d))),
    "bootstrap_ci_order_value" -> ((s, d) =>
      StatOps.bootstrapCiOrderValue(orders(s, d))),
    "ewma_daily_revenue" -> ((s, d) => TrendOps.ewmaDailyRevenue(orders(s, d))),
    "changepoint_cusum" -> ((s, d) => TrendOps.changepointCusum(orders(s, d))),
    "revenue_streaks" -> ((s, d) => TrendOps.revenueStreaks(orders(s, d))),
    "key_skew_report" -> ((s, d) => SkewOps.keySkewReport(Seq(
      ("orders.o_custkey", orders(s, d), "o_custkey"),
      ("lineitem.l_partkey", lineitem(s, d), "l_partkey"),
      ("lineitem.l_suppkey", lineitem(s, d), "l_suppkey"),
      ("events.user_id", events(s, d), "user_id"),
      ("events.event_type", events(s, d), "event_type")))),
    "order_backlog_timeline" -> ((s, d) =>
      TrendOps.orderBacklogTimeline(orders(s, d), lineitem(s, d))),
    "bloom_segment_revenue" -> ((s, d) =>
      BloomOps.bloomSegmentRevenue(orders(s, d), customer(s, d))),
    "cms_event_type_freq" -> ((s, d) =>
      Analytics.cmsEventTypeFreq(events(s, d))),
    "nation_trade_pagerank" -> ((s, d) =>
      GraphOps.nationTradePagerank(lineitem(s, d), orders(s, d),
        customer(s, d), supplier(s, d), nation(s, d))),
    "nation_trade_hits" -> ((s, d) =>
      GraphOps.nationTradeHits(lineitem(s, d), orders(s, d),
        customer(s, d), supplier(s, d), nation(s, d))),
    "trade_triangles" -> ((s, d) =>
      GraphOps.nationTradeTriangles(lineitem(s, d), orders(s, d),
        customer(s, d), supplier(s, d), nation(s, d))),
    "price_qty_skyline" -> ((s, d) =>
      SkylineOps.priceQuantityFrontier(lineitem(s, d))),
    "supplier_abc_classes" -> ((s, d) =>
      Analytics.supplierAbcClasses(lineitem(s, d))),
    "shipping_sla_percentiles" -> ((s, d) =>
      Analytics.shippingSlaPercentiles(lineitem(s, d), orders(s, d))),
    "segment_migration_matrix" -> ((s, d) =>
      Analytics.segmentMigrationMatrix(orders(s, d))),
    "windowed_conversion" -> ((s, d) =>
      Analytics.windowedConversion(events(s, d))),
    "mixture_temperature" -> ((s, d) =>
      PipelineOps.mixtureTemperature(documents(s, d))),
    "mixture_resample" -> ((s, d) =>
      PipelineOps.mixtureResample(documents(s, d))),
    "mixture_upsample" -> ((s, d) =>
      PipelineOps.mixtureUpsample(documents(s, d))),
    "embed_dim_stats" -> ((s, d) =>
      SimilarityOps.embedDimStats(embeddings(s, d))),
    "ivf_cell_balance" -> ((s, d) =>
      SimilarityOps.ivfCellBalance(embeddings(s, d))),
    "embed_centroid_drift" -> ((s, d) =>
      SimilarityOps.embedCentroidDrift(embeddings(s, d))),
    "embed_outliers" -> ((s, d) =>
      SimilarityOps.embedOutliers(embeddings(s, d))),
    "embed_kmeans" -> ((s, d) =>
      SimilarityOps.embedKmeans(embeddings(s, d))),
    "weekday_hour_heatmap" -> ((s, d) =>
      Analytics.weekdayHourHeatmap(events(s, d))),
    "order_value_deciles" -> ((s, d) => Analytics.orderValueDeciles(orders(s, d))),
    "nation_supplier_hhi" -> ((s, d) =>
      Analytics.nationSupplierHhi(lineitem(s, d), supplier(s, d), nation(s, d))),
    "nation_top_order_values" -> ((s, d) =>
      Analytics.nationTopOrderValues(orders(s, d), customer(s, d), nation(s, d))),
    "dedup_embed_cosine" -> ((s, d) => DedupOps.dedupEmbedCosine(embeddings(s, d))),
    "dedup_semantic" -> ((s, d) => DedupOps.dedupSemantic(embeddings(s, d))),
    "approx_distincts" -> ((s, d) => Analytics.approxDistincts(lineitem(s, d))),
    // D. training-data pipeline
    "dedup_exact" -> ((s, d) => DedupOps.dedupExact(documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => DedupOps.dedupNgramJaccard(documents(s, d))),
    "dedup_minhash_lsh" -> ((s, d) => DedupOps.dedupMinhashLsh(documents(s, d))),
    // continuous-ingestion split: doc_id % 10 >= 8 plays the incoming batch
    "dedup_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = documents(s, d)
      DedupOps.dedupIncremental(
        docs.filter(col("doc_id") % 10 >= 8),
        docs.filter(col("doc_id") % 10 < 8))
    }),
    "dedup_simhash" -> ((s, d) => DedupOps.dedupSimhash(documents(s, d))),
    "embed_cosine_topk" -> ((s, d) => SimilarityOps.bruteCosineTopK(embeddings(s, d))),
    "mmr_rerank" -> ((s, d) => SimilarityOps.mmrRerank(embeddings(s, d))),
    "embed_lsh_ann" -> ((s, d) => SimilarityOps.lshAnn(embeddings(s, d))),
    "ann_recall_report" -> ((s, d) =>
      SimilarityOps.annRecallReport(embeddings(s, d))),
    "ann_nprobe_sweep" -> ((s, d) =>
      SimilarityOps.annNprobeSweep(embeddings(s, d))),
    "embed_norm_check" -> ((s, d) =>
      SimilarityOps.embedNormCheck(embeddings(s, d))),
    "embed_ivf_ann" -> ((s, d) => SimilarityOps.ivfAnn(embeddings(s, d))),
    "embed_pq_ann" -> ((s, d) => SimilarityOps.pqAnn(embeddings(s, d))),
    "embed_ivfpq_ann" -> ((s, d) => SimilarityOps.ivfPqAnn(embeddings(s, d))),
    "embed_filtered_ann" -> ((s, d) =>
      SimilarityOps.filteredIvfPqAnn(embeddings(s, d))),
    "pq_recall_report" -> ((s, d) => SimilarityOps.pqRecallReport(embeddings(s, d))),
    "pq_trained_recall" -> ((s, d) => SimilarityOps.pqTrainedRecall(embeddings(s, d))),
    "opq_trained_recall" -> ((s, d) => SimilarityOps.opqTrainedRecall(embeddings(s, d))),
    "ivfadc_trained_recall" -> ((s, d) =>
      SimilarityOps.ivfadcTrainedRecall(embeddings(s, d))),
    "embed_pq_rerank" -> ((s, d) => SimilarityOps.pqRerankAnn(embeddings(s, d))),
    "hybrid_search_rrf" -> ((s, d) =>
      SimilarityOps.hybridSearchRrf(documents(s, d), embeddings(s, d))),
    "embed_quantize" -> ((s, d) => SimilarityOps.embedQuantize(embeddings(s, d))),
    "embed_knn_label" -> ((s, d) =>
      SimilarityOps.knnLabel(embeddings(s, d), documents(s, d))),
    "contrastive_pairs" -> ((s, d) =>
      SimilarityOps.contrastivePairs(embeddings(s, d))),
    "inverted_index" -> ((s, d) => TextOps.invertedIndex(documents(s, d))),
    "bpe_pair_counts" -> ((s, d) => TextOps.bpePairCounts(documents(s, d))),
    "lang_id" -> ((s, d) => TextOps.langId(documents(s, d))),
    "lang_confusion" -> ((s, d) => TextOps.langConfusion(documents(s, d))),
    "quality_score" -> ((s, d) => TextOps.qualityScore(documents(s, d))),
    "quality_gate" -> ((s, d) => TextOps.qualityGate(documents(s, d))),
    "quality_classifier_score" -> ((s, d) =>
      ClassifierOps.qualityClassifierScore(documents(s, d))),
    "quality_calibration" -> ((s, d) =>
      ClassifierOps.qualityCalibration(documents(s, d))),
    "multimodal_near_dedup" -> ((s, d) =>
      MultimodalOps.multimodalNearDedup(documents(s, d))),
    "mixture_cube" -> ((s, d) => PipelineOps.mixtureCube(documents(s, d))),
    "token_count" -> ((s, d) => TextOps.tokenCount(documents(s, d))),
    "doc_fingerprint" -> ((s, d) => TextOps.docFingerprint(documents(s, d))),
    "multimodal_meta" -> ((s, d) =>
      MultimodalOps.multimodalMeta(documents(s, d))),
    "bigram_topk" -> ((s, d) => TextOps.bigramTopK(documents(s, d))),
    "contamination_check" -> ((s, d) => TextOps.contaminationCheck(documents(s, d))),
    "decontaminated_corpus" -> ((s, d) => TextOps.decontaminatedCorpus(documents(s, d))),
    "k_anonymity_report" -> ((s, d) => AuditOps.kAnonymityReport(documents(s, d))),
    "l_diversity_report" -> ((s, d) => AuditOps.lDiversityReport(documents(s, d))),
    "dp_release_counts" -> ((s, d) => AuditOps.dpReleaseCounts(documents(s, d))),
    "gate_reason_breakdown" -> ((s, d) => TextOps.gateReasonBreakdown(documents(s, d))),
    "gate_sole_reason" -> ((s, d) => TextOps.gateSoleReason(documents(s, d))),
    "ngram_novelty" -> ((s, d) => TextOps.ngramNovelty(documents(s, d))),
    "heaps_law" -> ((s, d) => TextOps.heapsLaw(documents(s, d))),
    "dedup_cascade" -> ((s, d) => DedupOps.dedupCascade(documents(s, d))),
    "curriculum_phases" -> ((s, d) => PipelineOps.curriculumPhases(documents(s, d))),
    "rank_corr_quality_len" -> ((s, d) =>
      StatOps.rankCorrQualityLength(documents(s, d))),
    "embed_clip_bounds" -> ((s, d) => SimilarityOps.embedClipBounds(embeddings(s, d))),
    "error_click_context" -> ((s, d) => AsOfOps.errorClickContext(events(s, d))),
    "multimodal_dedup_clusters" -> ((s, d) =>
      MultimodalOps.multimodalDedupClusters(documents(s, d))),
    "rarity_score" -> ((s, d) => TextOps.rarityScore(documents(s, d))),
    "ngram_lm_score" -> ((s, d) => TextOps.ngramLmScore(documents(s, d))),
    "perplexity_buckets" -> ((s, d) => TextOps.perplexityBuckets(documents(s, d))),
    "corpus_stats" -> ((s, d) => TextOps.corpusStats(documents(s, d))),
    "bm25_search" -> ((s, d) => TextOps.bm25Search(documents(s, d))),
    "unigram_lm_vocab" -> ((s, d) =>
      UnigramLmOps.unigramLmVocab(documents(s, d))),
    "unigram_encode" -> ((s, d) =>
      UnigramLmOps.unigramEncode(documents(s, d))),
    "bpe_learn_merges" -> ((s, d) => TextOps.bpeLearnMerges(documents(s, d))),
    "bpe_encode" -> ((s, d) => TextOps.bpeEncode(documents(s, d))),
    "doc_keyterms" -> ((s, d) => TextOps.docKeyterms(documents(s, d))),
    "tfidf_doc_pairs" -> ((s, d) => TextOps.tfidfDocPairs(documents(s, d))),
    "template_fingerprint" -> ((s, d) =>
      TextOps.templateFingerprint(documents(s, d))),
    "dedup_containment" -> ((s, d) =>
      DedupOps.dedupContainment(documents(s, d))),
    "lsh_recall_report" -> ((s, d) =>
      DedupOps.lshRecallReport(documents(s, d))),
    "repetition_report" -> ((s, d) => TextOps.repetitionReport(documents(s, d))),
    "mixture_balance" -> ((s, d) => PipelineOps.mixtureBalance(documents(s, d))),
    "pii_redact" -> ((s, d) => TextOps.piiRedact(documents(s, d))),
    "dedup_clusters" -> ((s, d) => DedupOps.dedupClusters(documents(s, d))),
    "dedup_spans" -> ((s, d) => DedupOps.dedupSpans(documents(s, d))),
    "dedup_substrings" -> ((s, d) => DedupOps.dedupSubstrings(documents(s, d))),
    "substring_report" -> ((s, d) => DedupOps.substringReport(documents(s, d))),
    "dedup_survivors" -> ((s, d) => DedupOps.dedupSurvivors(documents(s, d))),
    "dedup_method_overlap" -> ((s, d) => DedupOps.dedupMethodOverlap(documents(s, d))),
    "source_overlap" -> ((s, d) => DedupOps.sourceOverlap(documents(s, d))),
    "lsh_band_tuning" -> ((s, d) => DedupOps.lshBandTuning(documents(s, d))),
    "dedup_degree_stats" -> ((s, d) => DedupOps.dedupDegreeStats(documents(s, d))),
    "jaccard_sim_histogram" -> ((s, d) =>
      DedupOps.jaccardSimHistogram(documents(s, d))),
    "split_leakage" -> ((s, d) => PipelineOps.splitLeakage(documents(s, d))),
    "dsir_weights" -> ((s, d) => TextOps.dsirWeights(documents(s, d))),
    "tokenizer_fertility" -> ((s, d) => TextOps.tokenizerFertility(documents(s, d))),
    "type_token_ratio" -> ((s, d) => TextOps.typeTokenRatio(documents(s, d))),
    "stratified_sample" -> ((s, d) => PipelineOps.stratifiedSample(documents(s, d))),
    "weighted_sample" -> ((s, d) => PipelineOps.weightedSample(documents(s, d))),
    "collocation_pmi" -> ((s, d) => TextOps.collocationPmi(documents(s, d))),
    "dataset_split" -> ((s, d) => PipelineOps.datasetSplit(documents(s, d))),
    "source_cap_sample" -> ((s, d) =>
      PipelineOps.sourceCapSample(documents(s, d))),
    "mixture_report" -> ((s, d) => PipelineOps.mixtureReport(documents(s, d))),
    "token_pack" -> ((s, d) => PipelineOps.tokenPack(documents(s, d))),
    "doc_chunk" -> ((s, d) => PipelineOps.docChunk(documents(s, d))),
    "vocab_coverage" -> ((s, d) => PipelineOps.vocabCoverage(documents(s, d))),
    "curated_corpus" -> ((s, d) => PipelineOps.curatedCorpus(documents(s, d))),
    "geo_neighbor_join" -> ((s, d) =>
      GeoOps.neighborJoin(customer(s, d), supplier(s, d), nation(s, d), region(s, d))),
    "geo_prefix_counts" -> ((s, d) =>
      GeoOps.geoPrefixCounts(customer(s, d), nation(s, d))),
    "heavy_hitter_types" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val hh = udaf(new graft.functions.HeavyHitters(16),
        org.apache.spark.sql.Encoders.STRING)
      events(s, d).agg(hh(col("event_type")).as("sketch"))
        .select(explode(col("sketch")).as(Seq("event_type", "n_events")))
    }),
    "multimodal_framesample" -> ((s, d) =>
      MultimodalOps.frameSample(documents(s, d))),
    "multimodal_resize" -> ((s, d) =>
      MultimodalOps.resizePlan(documents(s, d))),
    "multimodal_dedup" -> ((s, d) =>
      MultimodalOps.multimodalDedup(documents(s, d))),
    "events_asof_signup" -> ((s, d) =>
      AsOfOps.purchaseWithLastSignup(events(s, d))),
    "events_asof_recent" -> ((s, d) =>
      AsOfOps.purchaseWithRecentSignup(events(s, d))),
    "events_asof_physical" -> ((s, d) =>
      AsOfOps.purchaseLastSignupPhysical(events(s, d))),
    "event_funnel" -> ((s, d) => AsOfOps.signupPurchaseFunnel(events(s, d))),
    "conversion_latency_quartiles" -> ((s, d) =>
      AsOfOps.conversionLatencyQuartiles(events(s, d))),
    "window_funnel" -> ((s, d) => AsOfOps.windowFunnel(events(s, d))),
    "funnel_progress" -> ((s, d) => AsOfOps.funnelProgress(events(s, d))),
    "revenue_discords" -> ((s, d) => TrendOps.revenueDiscords(orders(s, d))),
    "seq_pattern_match" -> ((s, d) => PatternOps.seqPatternMatch(events(s, d))),
    "seq_pattern_progress" -> ((s, d) =>
      PatternOps.seqPatternProgress(events(s, d))),
    "linear_attribution" -> ((s, d) => AsOfOps.linearAttribution(events(s, d))),
    "purchase_attribution" -> ((s, d) =>
      AsOfOps.purchaseAttribution(events(s, d))),
    "event_transitions" -> ((s, d) => AsOfOps.eventTransitions(events(s, d))),
    "events_dedup_window" -> ((s, d) =>
      graft.streaming.EventStreams.debounceBatch(events(s, d))),
    "events_window_uniques" -> ((s, d) =>
      graft.streaming.EventStreams.windowUniquesBatch(events(s, d))),
    "segment_event_totals" -> ((s, d) =>
      SkewOps.segmentEventTotals(events(s, d), customer(s, d))),
    // E. streaming (batch-equivalent forms; true streaming in tests)
    "events_tumbling" -> ((s, d) =>
      graft.streaming.EventStreams.tumblingAggBatch(events(s, d))),
    "events_hopping" -> ((s, d) =>
      graft.streaming.EventStreams.hoppingAggBatch(events(s, d))),
    "events_sessionize" -> ((s, d) =>
      graft.streaming.EventStreams.sessionizeBatch(events(s, d))),
    "session_paths" -> ((s, d) =>
      graft.streaming.EventStreams.sessionPathsBatch(events(s, d))),
    "events_interval_join" -> ((s, d) =>
      graft.streaming.EventStreams.intervalJoinBatch(events(s, d))),
    "events_session_window" -> ((s, d) =>
      graft.streaming.EventStreams.sessionWindowBatch(events(s, d))),
    "scd2_customer_versions" -> ((s, d) =>
      StarSchema.scd2CustomerVersions(orders(s, d), customer(s, d))),
    "price_histogram" -> ((s, d) => Analytics.priceHistogram(orders(s, d))),
    // operator composition: line fact built by StarSchema feeds the
    // revenue summary directly (one fused plan, no materialization)
    "composed_revenue_report" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      StarSchema.factLineitem(lineitem(s, d), orders(s, d))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"),
          // factLineitem.revenue is a 4-decimal-rounded double; cast back
          // to exact decimal for the sum (order-independent), then project
          // the total as a rounded double (decimal outputs hash-unsafe)
          round(sum(col("revenue").cast("decimal(18,4)")).cast("double"), 4)
            .as("total_revenue"),
          min(col("days_to_ship")).as("min_days"),
          max(col("days_to_ship")).as("max_days"))
    }),
    // F. round-9: drift statistics, profiling audits, IVM, ER
    "ks_order_drift" -> ((s, d) => StatOps.ksOrderDrift(orders(s, d))),
    "order_arrival_dispersion" -> ((s, d) =>
      TrendOps.orderArrivalDispersion(orders(s, d))),
    "priority_mix_shift" -> ((s, d) => StatOps.priorityMixShift(orders(s, d))),
    "token_rank_octaves" -> ((s, d) => TextOps.tokenRankOctaves(documents(s, d))),
    "pii_detect_report" -> ((s, d) => TextOps.piiDetectReport(documents(s, d))),
    "doc_length_mad" -> ((s, d) => TextOps.docLengthMad(documents(s, d))),
    "vocab_simpson" -> ((s, d) => TextOps.vocabSimpson(documents(s, d))),
    "er_clusters" -> ((s, d) => AuditOps.erClusters(customer(s, d))),
    "fd_audit" -> ((s, d) => AuditOps.fdAudit(customer(s, d), part(s, d),
      orders(s, d), documents(s, d))),
    "grouping_sets_profile" -> ((s, d) => Analytics.groupingSetsProfile(
      orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "delta_join_maintenance" -> ((s, d) =>
      ChangeOps.deltaJoinMaintenance(orders(s, d), lineitem(s, d))),
    // G. round-10: rank statistics, concentration, keyness, backfill
    "mann_whitney_u" -> ((s, d) => StatOps.mannWhitneyU(lineitem(s, d))),
    "kendall_tau_daily" -> ((s, d) => StatOps.kendallTauDaily(orders(s, d))),
    "runs_test_daily" -> ((s, d) => StatOps.runsTestDaily(orders(s, d))),
    "spearman_daily" -> ((s, d) => StatOps.spearmanDaily(orders(s, d))),
    "priority_status_cramers_v" -> ((s, d) =>
      StatOps.priorityStatusCramersV(orders(s, d))),
    "gini_customer_concentration" -> ((s, d) =>
      Analytics.giniCustomerConcentration(orders(s, d))),
    "partition_backfill_plan" -> ((s, d) => AuditOps.backfillPlan(orders(s, d))),
    "source_term_lift" -> ((s, d) => TextOps.sourceTermLift(documents(s, d))),
    "embed_margin_audit" -> ((s, d) =>
      SimilarityOps.embedMarginAudit(embeddings(s, d))),
    "hodges_lehmann_daily" -> ((s, d) =>
      StatOps.hodgesLehmannDaily(orders(s, d))),
    // H. round-11: survival analysis, dispersion/stability tests,
    // lead-lag, graph distances, moment sketches
    "ccf_orders_revenue" -> ((s, d) => TrendOps.ccfOrdersRevenue(orders(s, d))),
    "levene_priority_dispersion" -> ((s, d) =>
      StatOps.levenePriorityDispersion(orders(s, d))),
    "jackknife_nation_revenue" -> ((s, d) =>
      StatOps.jackknifeNationRevenue(orders(s, d), customer(s, d), nation(s, d))),
    "nelson_aalen_conversion" -> ((s, d) =>
      SurvivalOps.nelsonAalenConversion(events(s, d))),
    "kaplan_meier_conversion" -> ((s, d) =>
      SurvivalOps.kaplanMeierConversion(events(s, d))),
    "nation_hop_distance" -> ((s, d) => GraphOps.nationHopDistance(
      lineitem(s, d), orders(s, d), customer(s, d), supplier(s, d), nation(s, d))),
    "ams_f2_user_activity" -> ((s, d) => Analytics.amsF2UserActivity(events(s, d))),
    "welch_weekend_revenue" -> ((s, d) => StatOps.welchWeekendRevenue(orders(s, d))),
    "kruskal_weekday_revenue" -> ((s, d) =>
      StatOps.kruskalWeekdayRevenue(orders(s, d))),
    "ab_conversion_logrank" -> ((s, d) =>
      SurvivalOps.logrankConversionAb(events(s, d))),
    "position_attribution" -> ((s, d) => AsOfOps.positionAttribution(events(s, d))),
    "ab_cuped_readout" -> ((s, d) => ExperimentOps.abCupedReadout(events(s, d))),
    "ab_wilson_bounds" -> ((s, d) => ExperimentOps.abWilsonBounds(events(s, d))),
    "weekday_revenue_envelope" -> ((s, d) =>
      TrendOps.weekdayRevenueEnvelope(orders(s, d))),
    "weekday_outlier_days" -> ((s, d) => TrendOps.weekdayOutlierDays(orders(s, d))),
    "median_polish_weekday" -> ((s, d) => TrendOps.medianPolishWeekday(orders(s, d))),
    "pacf_daily_revenue" -> ((s, d) => TrendOps.pacfDailyRevenue(orders(s, d))),
    "changepoint_single_split" -> ((s, d) =>
      TrendOps.changepointSingleSplit(orders(s, d)))
  )

  def oracleSql: Map[String, String] = Oracles.all
}
