package graft

import graft.queries.{BucketedQueries => B, CdcQueries => C,
  PipelineQueries => P, RelationalQueries => R, SimilarityQueries => S,
  TextQueries => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an implemented operator family from
  * SURVEY §2; keys present in [[oracleSql]] are hash-checked against DuckDB
  * on the same parquet tables, the rest get rows-only checks (they use
  * engine-specific hashes or plans DuckDB cannot replicate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q5-shaped multi-join aggregate (SURVEY §7.2 step 2). */
  def entry(spark: SparkSession): DataFrame =
    R.q8Revenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_event_scan" -> (R.q1EventScan(_, _)),
    "q2_latest_state" -> (R.q2LatestState(_, _)),
    "q3_filter_combo" -> (R.q3FilterCombo(_, _)),
    "q4_join_agg" -> (R.q4JoinAgg(_, _)),
    "q5_anti_join" -> (R.q5AntiJoin(_, _)),
    "q6_doc_latest" -> (R.q6DocLatest(_, _)),
    "q7_except" -> (R.q7Except(_, _)),
    "q8_revenue" -> (R.q8Revenue(_, _)),
    "q9_top_order" -> (R.q9TopOrder(_, _)),
    "q10_counter" -> (R.q10Counter(_, _)),
    "q11_stalest" -> (R.q11Stalest(_, _)),
    "q12_distinct" -> (R.q12Distinct(_, _)),
    "q13_hash_dedup" -> (R.q13HashDedup(_, _)),
    "q14_coalesce" -> (R.q14Coalesce(_, _)),
    "q15_rollup" -> (R.q15Rollup(_, _)),
    "q16_union_priority" -> (R.q16UnionPriority(_, _)),
    "q17_running" -> (R.q17Running(_, _)),
    "q18_json" -> (R.q18Json(_, _)),
    "q19_hourly" -> (R.q19Hourly(_, _)),
    "q20_sessions" -> (R.q20Sessions(_, _)),
    "q21_text_stats" -> (T.q21TextStats(_, _)),
    "q22_exact_dedup" -> (T.q22ExactDedup(_, _)),
    "q23_cosine_knn" -> (S.q23CosineKnn(_, _)),
    "q24_snapshot" -> (R.q24Snapshot(_, _)),
    "q25_token_count" -> (T.q25TokenCount(_, _)),
    "q26_lang_id" -> (T.q26LangId(_, _)),
    "q27_quality" -> (T.q27Quality(_, _)),
    "q28_fingerprint" -> (T.q28Fingerprint(_, _)),
    "q29_minhash_sig" -> (T.q29MinhashSig(_, _)),
    "q30_minhash_pairs" -> (T.q30MinhashPairs(_, _)),
    "q31_simhash" -> (T.q31Simhash(_, _)),
    "q32_ngram_jaccard" -> (T.q32NgramJaccard(_, _)),
    "q33_emb_cos_pairs" -> (S.q33EmbCosPairs(_, _)),
    "q34_ann_ivf" -> (S.q34AnnIvf(_, _)),
    "q35_cdc_fold" -> (C.q35CdcFold(_, _)),
    "q36_parse_coin" -> (P.q36ParseCoin(_, _)),
    "q37_gzip_roundtrip" -> (P.q37GzipRoundtrip(_, _)),
    "q38_img_pipeline" -> (P.q38ImgPipeline(_, _)),
    "q39_approx_distinct" -> (R.q39ApproxDistinct(_, _)),
    "q40_nested" -> (R.q40Nested(_, _)),
    "q41_quality_ratios" -> (T.q41QualityRatios(_, _)),
    "q42_bpe_tokens" -> (T.q42BpeTokens(_, _)),
    "q43_winnowing" -> (T.q43Winnowing(_, _)),
    "q44_emb_lsh_pairs" -> (S.q44EmbLshPairs(_, _)),
    "q45_asof_join" -> (R.q45AsofJoin(_, _)),
    "q46_range_join" -> (R.q46RangeJoin(_, _)),
    "q47_stats" -> (R.q47Stats(_, _)),
    "q48_simhash_pairs" -> (T.q48SimhashPairs(_, _)),
    "q49_nested_deep" -> (R.q49NestedDeep(_, _)),
    "q50_revenue_bucketed" -> (B.q50RevenueBucketed(_, _)),
    "q51_minhash_pairs_md5" -> (T.q51MinhashPairsMd5(_, _)),
    "q52_winnow_md5" -> (T.q52WinnowMd5(_, _)),
    "q53_quantize_i8" -> (S.q53QuantizeI8(_, _)),
    "q54_hash_split" -> (T.q54HashSplit(_, _)),
    "q55_stratified_sample" -> (T.q55StratifiedSample(_, _)),
    "q56_top_suppliers" -> (R.q56TopSuppliers(_, _)),
    "q57_zorder_scan" -> (R.q57ZorderScan(_, _)),
    "q58_ann_recall" -> (S.q58AnnRecall(_, _)),
    "q59_pii_redact" -> (T.q59PiiRedact(_, _)),
    "q60_dup_ngrams" -> (T.q60DupNgrams(_, _)),
    "q61_variant_agg" -> (R.q61VariantAgg(_, _)),
    "q62_dup_clusters" -> (T.q62DupClusters(_, _)),
    "q63_corpus_mix" -> (T.q63CorpusMix(_, _)),
    "q64_decontaminate" -> (T.q64Decontaminate(_, _)),
    "q65_seq_pack" -> ((s, d) => T.q65SeqPack(s, d)),
    "q66_lm_xent" -> (T.q66LmXent(_, _)),
    "q67_semantic_dedup" -> (S.q67SemanticDedup(_, _)),
    "q68_tfidf_topk" -> ((s, d) => T.q68TfidfTopk(s, d)),
    "q69_filter_funnel" -> (T.q69FilterFunnel(_, _)),
    "q70_dup_sources" -> (T.q70DupSources(_, _)),
    "q71_len_profile" -> (T.q71LenProfile(_, _)),
    "q72_bpe_pairs" -> ((s, d) => T.q72BpePairs(s, d)),
    "q73_chunks" -> ((s, d) => T.q73Chunks(s, d)),
    "q74_containment" -> ((s, d) => T.q74Containment(s, d)),
    "q75_boilerplate" -> (T.q75Boilerplate(_, _)),
    "q76_decontaminate_bloom" -> ((s, d) => T.q76DecontaminateBloom(s, d)),
    "q77_bm25_topk" -> ((s, d) => T.q77Bm25Topk(s, d)),
    "q78_heavy_hitters" -> ((s, d) => T.q78HeavyHitters(s, d)),
    "q79_ann_pq" -> ((s, d) => S.q79AnnPq(s, d)),
    "q80_bpe_encode" -> ((s, d) => T.q80BpeEncode(s, d)),
    "q81_jl_audit" -> ((s, d) => S.q81JlAudit(s, d)),
    "q82_bm25_indexed" -> ((s, d) => T.q82Bm25Indexed(s, d)),
    "q83_split_leakage" -> ((s, d) => T.q83SplitLeakage(s, d)),
    "q84_pq_recall" -> ((s, d) => S.q84PqRecall(s, d)),
    "q85_train_quarantine" -> ((s, d) => T.q85TrainQuarantine(s, d)),
    "q86_pq_adc" -> ((s, d) => S.q86PqAdc(s, d)),
    "q87_pq_recall_pinned" -> ((s, d) => S.q87PqAdcRecall(s, d)),
    "q88_bm25_and" -> ((s, d) => T.q88Bm25And(s, d)),
    "q89_bm25_phrase" -> ((s, d) => T.q89Bm25Phrase(s, d)),
    "q90_qb_filter" -> (graft.api.QueryBuilder.q90QbFilter(_, _)),
    "q91_qb_nested" -> (graft.api.QueryBuilder.q91QbNested(_, _)),
    "q92_msg_counters" -> (C.q92MsgCounters(_, _)),
    "q93_hybrid_rrf" -> ((s, d) => T.q93HybridRrf(s, d)),
    "q94_classifier_score" -> (S.q94ClassifierScore(_, _)),
    "q95_repeated_spans" -> ((s, d) => T.q95RepeatedSpans(s, d)),
    "q96_span_redact" -> ((s, d) => T.q96SpanRedact(s, d)),
    "q97_qb_nested_deep" -> (graft.api.QueryBuilder.q97QbNestedDeep(_, _)),
    "q98_qb_child_args" -> (graft.api.QueryBuilder.q98QbChildArgs(_, _)),
    "q99_qb_wire" -> (graft.api.RequestCodec.q99QbWire(_, _)),
    "q100_qb_graphql" -> (graft.api.GraphQl.q100QbGraphql(_, _)),
    "q101_qb_ops" -> (graft.api.QueryBuilder.q101QbOps(_, _)),
    "q102_qb_distinct_on" -> (graft.api.QueryBuilder.q102QbDistinctOn(_, _)),
    "q103_qb_child_page" -> (graft.api.QueryBuilder.q103QbChildPage(_, _)),
    "q104_dhash_pairs" -> (P.q104DhashPairs(_, _)),
    "q105_qb_stat_aggs" -> (graft.api.QueryBuilder.q105QbStatAggs(_, _)),
    "q106_video_frame_dedup" -> (P.q106VideoFrameDedup(_, _)),
    "q107_audio_dedup" -> (P.q107AudioDedup(_, _)),
    "q108_incr_dhash_probe" -> (P.q108IncrDhashProbe(_, _)),
    "q109_av_soundtrack_dedup" -> (P.q109AvSoundtrackDedup(_, _)),
    "q110_soundtrack_match" -> (P.q110SoundtrackMatch(_, _)),
    "q111_hamming_knn" -> (P.q111HammingKnn(_, _)),
    "q112_image_dup_clusters" -> (P.q112ImageDupClusters(_, _)),
    "q113_video_repost" -> (P.q113VideoRepost(_, _)),
    "q114_audio_trim_dedup" -> (P.q114AudioTrimDedup(_, _)),
    "q115_audio_trim_verdict" -> (P.q115AudioTrimVerdict(_, _)),
    "q116_audio_knn" -> (P.q116AudioKnn(_, _)),
    "q117_audio_dup_clusters" -> (P.q117AudioDupClusters(_, _)),
    "q118_mutation_roundtrip" -> (graft.api.GraphQl.q118MutationRoundTrip(_, _)),
    "q119_video_dup_clusters" -> (P.q119VideoDupClusters(_, _)),
    "q120_upsert_roundtrip" -> (graft.api.GraphQl.q120UpsertRoundTrip(_, _)),
    "q121_root_aggregate" -> (graft.api.GraphQl.q121RootAggregate(_, _)),
    "q122_by_pk_read" -> (graft.api.GraphQl.q122ByPkRead(_, _)),
    "q123_by_pk_mutations" -> (graft.api.GraphQl.q123ByPkMutations(_, _)),
    "q124_mutation_returning" ->
      (graft.api.GraphQl.q124MutationReturning(_, _)),
    "q125_cross_decontam" -> (T.q125CrossDecontam(_, _)),
    "q126_knn_join" -> (S.q126KnnJoin(_, _)),
    "q127_ivf_knn_join" -> (S.q127IvfKnnJoin(_, _)),
    "q128_knn_join_recall" -> (S.q128KnnJoinRecall(_, _)),
    "q129_filtered_knn" -> (S.q129FilteredKnn(_, _)),
    "q130_regex_ops" -> (graft.api.GraphQl.q130RegexOps(_, _)),
    "q131_multi_table" -> (graft.api.GraphQl.q131MultiTable(_, _)),
    "q132_agg_nodes" -> (graft.api.GraphQl.q132AggregateNodes(_, _)),
    "q133_rel_pred" -> (graft.api.GraphQl.q133RelPred(_, _)),
    "q134_rel_pred_algebra" ->
      (graft.api.GraphQl.q134RelPredAlgebra(_, _)),
    "q135_agg_order" -> (graft.api.GraphQl.q135AggOrder(_, _)),
    "q136_pii_classes" -> (T.q136PiiClasses(_, _)),
    "q137_nfc_normalize" -> (T.q137NfcNormalize(_, _)),
    "q138_fuzzy_terms" -> (T.q138FuzzyTerms(_, _)),
    "q139_nulls_order" -> (T.q139NullsOrder(_, _)),
    "q140_role_scoped" ->
      (graft.api.Permissions.q140RoleScopedRead(_, _)),
    "q141_fuzzy_bm25" -> (T.q141FuzzyBm25(_, _)),
    "q142_script_mix" -> (T.q142ScriptMix(_, _)),
    "q143_label_outliers" -> (S.q143LabelOutliers(_, _)),
    "q144_sliced_aggregate" ->
      (graft.api.GraphQl.q144SlicedAggregate(_, _)),
    "q145_stream_pages" -> (graft.api.GraphQl.q145StreamPages(_, _)),
    "q146_nested_insert" -> (graft.api.GraphQl.q146NestedInsert(_, _)),
    "q147_update_many" -> (graft.api.GraphQl.q147UpdateMany(_, _)),
    "q148_jsonb_ops" -> (graft.api.GraphQl.q148JsonbOps(_, _)),
    "q149_aggrel_nodes" -> (graft.api.GraphQl.q149AggRelNodes(_, _)),
    "q150_retrieval_eval" -> (S.q150RetrievalEval(_, _)),
    "q151_dedup_retention" -> (T.q151DedupRetention(_, _)),
    "q152_incremental_agg" -> (R.q152IncrementalAgg(_, _)),
    "q153_object_rel" -> (graft.api.GraphQl.q153ObjectRel(_, _)),
    "q154_cohort_retention" -> (R.q154CohortRetention(_, _)),
    "q155_event_funnel" -> (R.q155EventFunnel(_, _)),
    "q156_change_feed" -> (R.q156ChangeFeed(_, _)),
    "q157_temperature_mix" -> (T.q157TemperatureMix(_, _)),
    "q158_phash_pairs" -> (P.q158PhashPairs(_, _)),
    "q159_langid_eval" -> (T.q159LangIdEval(_, _)),
    "q160_cascade_forget" -> (graft.api.GraphQl.q160CascadeForget(_, _)),
    "q161_salted_skew_join" -> (R.q161SaltedSkewJoin(_, _)),
    "q162_outlier_fences" -> (T.q162OutlierFences(_, _)),
    "q163_phash_dup_clusters" -> (P.q163PhashDupClusters(_, _)),
    "q164_phash_knn" -> (P.q164PhashKnn(_, _)),
    "q165_video_phash_dedup" -> (P.q165VideoPhashDedup(_, _)),
    "q166_kernel_agreement" -> (P.q166KernelAgreement(_, _)),
    "q167_introspection" -> (graft.api.GraphQl.q167Introspection(_, _)),
    "q168_audio_spectral_pairs" -> (P.q168AudioSpectralPairs(_, _)),
    "q169_audio_kernel_agreement" -> (P.q169AudioKernelAgreement(_, _)),
    "q170_store_search" -> (P.q170StoreSearch(_, _)),
    "q171_role_scoped_mutation" ->
      (graft.api.Permissions.q171RoleScopedMutation(_, _)),
    "q172_image_retention" -> (P.q172ImageRetention(_, _)),
    "q173_audio_retention" -> (P.q173AudioRetention(_, _)),
    "q174_aggregate_rel_filter" ->
      (graft.api.Permissions.q174AggregateRelFilter(_, _)),
    "q175_role_scoped_introspection" ->
      (graft.api.Permissions.q175RoleScopedIntrospection(_, _)),
    "q176_audio_store_search" -> (P.q176AudioStoreSearch(_, _)),
    "q177_incr_agreement_probe" -> (P.q177IncrAgreementProbe(_, _)),
    "q178_conditional_fields" ->
      (graft.api.GraphQl.q178ConditionalFields(_, _)),
    "q179_operation_name" ->
      (graft.api.GraphQl.q179OperationName(_, _)),
    "q180_source_profile" -> (T.q180SourceProfile(_, _)),
    "q181_video_retention" -> (P.q181VideoRetention(_, _)),
    "q182_partitioned_search" -> (P.q182PartitionedSearch(_, _)),
    "q183_stream_directives" ->
      (graft.api.GraphQl.q183StreamDirectives(_, _)),
    "q184_stream_rel_filter" ->
      (graft.api.Permissions.q184StreamRelFilter(_, _)),
    "q185_text_store_search" -> (T.q185TextStoreSearch(_, _)),
    "q186_simhash_store_search" -> (T.q186SimhashStoreSearch(_, _)),
    "q187_text_kernel_agreement" -> (T.q187TextKernelAgreement(_, _)),
    "q188_calibration_bins" -> (S.q188CalibrationBins(_, _)),
    "q189_export_manifest" -> (T.q189ExportManifest(_, _)),
    "q190_forget_compaction" -> (T.q190ForgetCompaction(_, _)),
    "q191_fragment_stream" ->
      (graft.api.GraphQl.q191FragmentStream(_, _)),
    "q192_fragment_aggregate" ->
      (graft.api.GraphQl.q192FragmentAggregate(_, _)),
    "q193_stream_live_rel_filter" ->
      (graft.api.Permissions.q193StreamLiveRelFilter(_, _)),
    "q194_pruned_forget" -> (T.q194PrunedForget(_, _)),
    "q195_filtered_order_agg" ->
      (graft.api.Permissions.q195FilteredOrderAgg(_, _)),
    "q196_agreement_retention" -> (T.q196AgreementRetention(_, _)),
    "q197_alias_read" -> (graft.api.GraphQl.q197AliasRead(_, _)),
    "q198_alias_stream" -> (graft.api.GraphQl.q198AliasStream(_, _)),
    "q199_sibling_rels" -> (graft.api.GraphQl.q199SiblingRels(_, _)),
    "q200_objrel_chain" -> (graft.api.GraphQl.q200ObjRelChain(_, _)),
    "q201_aliased_siblings" ->
      (graft.api.GraphQl.q201AliasedSiblings(_, _)),
    "q202_aggrel_aliases" ->
      (graft.api.GraphQl.q202AggRelAliases(_, _)),
    "q203_variable_defaults" ->
      (graft.api.GraphQl.q203VariableDefaults(_, _)),
    "q204_stream_rels" -> (graft.api.GraphQl.q204StreamRels(_, _)),
    "q205_introspect_inputs" ->
      (graft.api.GraphQl.q205IntrospectInputs(_, _)),
    "q207_lm_score" ->
      (graft.queries.TextQueries.q207LmScore(_, _)),
    "q211_introspect_mut_inputs" ->
      (graft.api.GraphQl.q211IntrospectMutInputs(_, _)),
    "q210_rel_only_read" ->
      (graft.api.GraphQl.q210RelOnlyRead(_, _)),
    "q209_returning_rels" ->
      (graft.api.GraphQl.q209ReturningRels(_, _)),
    "q208_multi_root" ->
      (graft.api.GraphQl.q208MultiRoot(_, _)),
    "q206_absent_objrel" ->
      (graft.api.GraphQl.q206AbsentObjRel(_, _)),
    "q212_mixed_stream_roots" ->
      (graft.api.GraphQl.q212MixedStreamRoots(_, _)),
    "q213_deep_insert" ->
      (graft.api.GraphQl.q213DeepInsert(_, _)),
    "q214_jsonb_updates" ->
      (graft.api.GraphQl.q214JsonbUpdates(_, _)),
    "q215_conditional_upsert" ->
      (graft.api.GraphQl.q215ConditionalUpsert(_, _)),
    "q216_directives" ->
      (graft.api.GraphQl.q216Directives(_, _)),
    "q217_ensemble_verdict" ->
      (graft.queries.TextQueries.q217EnsembleVerdict(_, _)),
    "q218_ensemble_funnel" ->
      (graft.queries.TextQueries.q218EnsembleFunnel(_, _)),
    "q219_relwhere_mutations" ->
      (graft.api.GraphQl.q219RelWhereMutations(_, _)),
    "q220_corpus_build" ->
      (graft.queries.TextQueries.q220CorpusBuild(_, _)),
    "q221_role_mixed_roots" ->
      (graft.api.Permissions.q221RoleScopedMixedRoots(_, _)),
    "q222_composite_pk" ->
      (graft.api.GraphQl.q222CompositePk(_, _)),
    "q223_cast_filter" ->
      (graft.api.GraphQl.q223CastFilter(_, _)),
    "q224_deprecation_surface" ->
      (graft.api.GraphQl.q224DeprecationSurface(_, _)),
    "q225_incremental_build" ->
      (graft.queries.TextQueries.q225IncrementalBuild(_, _)),
    "q226_verdict_store" ->
      (graft.queries.TextQueries.q226VerdictStore(_, _)),
    "q227_dedup_mix" ->
      (graft.queries.TextQueries.q227DedupMix(_, _)),
    "q228_store_build" ->
      (graft.queries.TextQueries.q228StoreDrivenBuild(_, _)),
    "q229_composite_cursor" ->
      (graft.api.GraphQl.q229CompositeCursorStream(_, _)),
    "q230_role_composite_by_pk" ->
      (graft.api.Permissions.q230RoleScopedCompositeByPk(_, _)),
    "q231_composite_live" ->
      (graft.api.GraphQl.q231CompositeLiveQuery(_, _)),
    "q232_model_rotation" ->
      (graft.queries.TextQueries.q232ModelRotation(_, _)),
    "q233_multimodal_build" ->
      (P.q233MultimodalBuild(_, _)),
    "q234_gdpr_chain" ->
      (graft.queries.TextQueries.q234GdprChain(_, _)),
    "q235_lookup_audit" ->
      (graft.queries.TextQueries.q235LookupAudit(_, _)),
    "q236_ivf_forget" ->
      (S.q236IvfForget(_, _)),
    "q237_manifest_feed" ->
      (graft.queries.TextQueries.q237ManifestFeed(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys use engine-specific hashes or
    * driver-trained state DuckDB cannot replicate (q30/q43 xxhash fast
    * paths — md5 twins q51/q52 replay the full pipelines; q37 gzip, q38
    * imageio, q39 HLL; q79/q84 trained-PQ — pinned-codebook twins
    * q86/q87 replay encode+ADC; q80 trained-BPE encode) → rows-only
    * check, covered by ScalaTest specs instead. */
  def oracleSql: Map[String, String] = OracleSql.all
}
