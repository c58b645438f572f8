package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Compositions, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's public inventory: one entry per operator from
  * SURVEY.md §2 (plus the LLM-pipeline extensions), each paired with a
  * DuckDB oracle in `oracleSql` whose column names and arithmetic match
  * bit-for-bit (see graft.queries.Exact for why decimal accumulation).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §2C #33) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Compositions.fieldFrequency(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2C compositions — the reference's own demonstrated workloads
    "q01_field_freq"    -> (Compositions.fieldFrequency _),
    "q02_sum_by_key"    -> (Compositions.sumByKey _),
    "q03_wordcount"     -> (Compositions.wordCount _),
    "q04_multistep"     -> (Compositions.multiStep _),
    "q05_filtered"      -> (Compositions.filteredCount _),
    // §2A dataflow core run through the typed MR path (mapper → combiner →
    // hash+sort shuffle → sorted-run reducer) and the typed Aggregator
    "q06_mr_field_freq" -> (graft.mr.MrQueries.mrFieldFreq _),
    "q07_typed_agg"     -> (graft.mr.MrQueries.typedAgg _),
    "q08_mapside_join"  -> (graft.mr.MrQueries.mapSideJoin _),
    "q09_mr_multistep"  -> (graft.mr.MrQueries.mrMultiStep _),
    // Relational surface (user-space compositions in the MR model)
    "q10_join_broadcast" -> (Relational.joinBroadcast _),
    "q11_join_large"     -> (Relational.joinLarge _),
    "q12_semi_join"      -> (Relational.semiJoin _),
    "q13_anti_join"      -> (Relational.antiJoin _),
    "q14_distinct"       -> (Relational.distinctPairs _),
    "q15_topk_group"     -> (Relational.topKPerGroup _),
    "q16_topk_global"    -> (Relational.topKGlobal _),
    "q17_rollup"         -> (Relational.rollupAgg _),
    "q18_cube"           -> (Relational.cubeAgg _),
    "q19_setops"         -> (Relational.setOps _),
    "q20_pricing_summary"   -> (Relational.pricingSummary _),
    "q21_shipping_priority" -> (Relational.shippingPriority _),
    "q22_running_sum"    -> (Relational.runningSum _),
    "q23_scalar_funcs"   -> (Relational.scalarFunctions _),
    "q24_sessionize"     -> (Relational.sessionize _),
    "q25_histogram"      -> (Relational.histogram _),
    "q26_time_window"    -> (Relational.timeWindow _),
    "q27_asof_join"      -> (Relational.asofJoin _),
    "q28_pivot"          -> (Relational.pivotCounts _),
    "q29_distinct_counts" -> (Relational.distinctCounts _),
    "q30_hash_sample"    -> (Relational.hashSample _),
    "q31_salted_agg"     -> (Relational.saltedAgg _),
    "q32_fuzzy_pairs"    -> (Relational.fuzzyPairs _),
    "q33_discrete_median" -> (Relational.discreteMedian _),
    "q34_collect_types"  -> (Relational.collectTypes _),
    "q35_outer_join"     -> (Relational.outerJoin _),
    "q36_setops_all"     -> (Relational.setOpsAll _),
    "q37_null_group"     -> (Relational.nullGroup _),
    "q38_above_nation_avg" -> (Relational.aboveNationAvg _),
    "q39_session_window" -> (Relational.sessionWindowNative _),
    "q40_date_functions" -> (Relational.dateFunctions _),
    "q41_string_functions" -> (Relational.stringFunctions _),
    "q42_json_extract"   -> (Compositions.jsonExtractSum _),
    "q43_topk_custom_op" -> (Relational.topKCustomOp _),
    "q44_grouping_sets"  -> (Relational.groupingSets _),
    "q45_array_functions" -> (Relational.arrayFunctions _),
    "q46_stratified_sample" -> (Relational.stratifiedSample _),
    "q47_variant_json"   -> (Compositions.variantExtract _),
    // LLM-pipeline extensions: dedup, similarity, text analysis, multimodal
    "d01_dedup_exact"    -> (graft.llm.Dedup.exact _),
    "d02_dedup_minhash"  -> (graft.llm.Dedup.minhashLsh _),
    "d03_dedup_simhash"  -> (graft.llm.Dedup.simhash _),
    "d04_ngram_jaccard"  -> (graft.llm.Dedup.ngramJaccard _),
    "d05_knn_brute"      -> (graft.llm.Similarity.bruteKnn _),
    "d06_knn_lsh"        -> (graft.llm.Similarity.lshKnn _),
    "d07_embed_neardup"  -> (graft.llm.Similarity.embedNearDup _),
    "d08_dedup_pipeline" -> (graft.llm.DedupResolve.dedupPipeline _),
    "d09_knn_ivf"        -> (graft.llm.Similarity.ivfKnn _),
    "t01_doc_stats"      -> (graft.llm.TextAnalysis.docStats _),
    "t02_lang_dist"      -> (graft.llm.TextAnalysis.langDistribution _),
    "t03_token_counts"   -> (graft.llm.TextAnalysis.tokenCounts _),
    "t04_fingerprint"    -> (graft.llm.TextAnalysis.fingerprints _),
    "t05_quality_filter" -> (graft.llm.TextAnalysis.qualityFilter _),
    "t06_bigrams"        -> (graft.llm.TextAnalysis.bigramCounts _),
    "t07_term_importance" -> (graft.llm.TextAnalysis.termImportance _),
    "m01_media_stats"    -> (graft.llm.Multimodal.mediaStats _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_field_freq"    -> Compositions.fieldFrequencySql,
    "q02_sum_by_key"    -> Compositions.sumByKeySql,
    "q03_wordcount"     -> Compositions.wordCountSql,
    "q04_multistep"     -> Compositions.multiStepSql,
    "q05_filtered"      -> Compositions.filteredCountSql,
    "q06_mr_field_freq" -> graft.mr.MrQueries.mrFieldFreqSql,
    "q07_typed_agg"     -> graft.mr.MrQueries.typedAggSql,
    "q08_mapside_join"  -> graft.mr.MrQueries.mapSideJoinSql,
    "q09_mr_multistep"  -> graft.mr.MrQueries.mrMultiStepSql,
    "q10_join_broadcast" -> Relational.joinBroadcastSql,
    "q11_join_large"     -> Relational.joinLargeSql,
    "q12_semi_join"      -> Relational.semiJoinSql,
    "q13_anti_join"      -> Relational.antiJoinSql,
    "q14_distinct"       -> Relational.distinctPairsSql,
    "q15_topk_group"     -> Relational.topKPerGroupSql,
    "q16_topk_global"    -> Relational.topKGlobalSql,
    "q17_rollup"         -> Relational.rollupAggSql,
    "q18_cube"           -> Relational.cubeAggSql,
    "q19_setops"         -> Relational.setOpsSql,
    "q20_pricing_summary"   -> Relational.pricingSummarySql,
    "q21_shipping_priority" -> Relational.shippingPrioritySql,
    "q22_running_sum"    -> Relational.runningSumSql,
    "q23_scalar_funcs"   -> Relational.scalarFunctionsSql,
    "q24_sessionize"     -> Relational.sessionizeSql,
    "q25_histogram"      -> Relational.histogramSql,
    "q26_time_window"    -> Relational.timeWindowSql,
    "q27_asof_join"      -> Relational.asofJoinSql,
    "q28_pivot"          -> Relational.pivotCountsSql,
    "q29_distinct_counts" -> Relational.distinctCountsSql,
    "q30_hash_sample"    -> Relational.hashSampleSql,
    "q31_salted_agg"     -> Relational.saltedAggSql,
    "q32_fuzzy_pairs"    -> Relational.fuzzyPairsSql,
    "q33_discrete_median" -> Relational.discreteMedianSql,
    "q34_collect_types"  -> Relational.collectTypesSql,
    "q35_outer_join"     -> Relational.outerJoinSql,
    "q36_setops_all"     -> Relational.setOpsAllSql,
    "q37_null_group"     -> Relational.nullGroupSql,
    "q38_above_nation_avg" -> Relational.aboveNationAvgSql,
    "q39_session_window" -> Relational.sessionWindowNativeSql,
    "q40_date_functions" -> Relational.dateFunctionsSql,
    "q41_string_functions" -> Relational.stringFunctionsSql,
    "q42_json_extract"   -> Compositions.jsonExtractSumSql,
    "q43_topk_custom_op" -> Relational.topKCustomOpSql,
    "q44_grouping_sets"  -> Relational.groupingSetsSql,
    "q45_array_functions" -> Relational.arrayFunctionsSql,
    "q46_stratified_sample" -> Relational.stratifiedSampleSql,
    "q47_variant_json"   -> Compositions.variantExtractSql,
    "d01_dedup_exact"    -> graft.llm.Dedup.exactSql,
    "d02_dedup_minhash"  -> graft.llm.Dedup.minhashLshSql,
    "d03_dedup_simhash"  -> graft.llm.Dedup.simhashSql,
    "d04_ngram_jaccard"  -> graft.llm.Dedup.ngramJaccardSql,
    "d05_knn_brute"      -> graft.llm.Similarity.bruteKnnSql,
    // d06_knn_lsh: engine-side LSH bucketing isn't SQL-expressible in the
    // oracle → driver records the weaker rows-only check; recall vs brute
    // force is asserted in SimilaritySpec instead.
    "d07_embed_neardup"  -> graft.llm.Similarity.embedNearDupSql,
    "d08_dedup_pipeline" -> graft.llm.DedupResolve.dedupPipelineSql,
    "d09_knn_ivf"        -> graft.llm.Similarity.ivfKnnSql,
    "t01_doc_stats"      -> graft.llm.TextAnalysis.docStatsSql,
    "t02_lang_dist"      -> graft.llm.TextAnalysis.langDistributionSql,
    "t03_token_counts"   -> graft.llm.TextAnalysis.tokenCountsSql,
    "t04_fingerprint"    -> graft.llm.TextAnalysis.fingerprintsSql,
    "t05_quality_filter" -> graft.llm.TextAnalysis.qualityFilterSql,
    "t06_bigrams"        -> graft.llm.TextAnalysis.bigramCountsSql,
    "t07_term_importance" -> graft.llm.TextAnalysis.termImportanceSql,
    "m01_media_stats"    -> graft.llm.Multimodal.mediaStatsSql,
  )
}
