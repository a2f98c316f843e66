from .catalog import REGISTRY, Query, oracle_map, query_map, register

# Importing the modules populates REGISTRY via their @register decorators.
from . import batch  # noqa: E402,F401
from . import batch2  # noqa: E402,F401
from . import batch3  # noqa: E402,F401
from . import batch4  # noqa: E402,F401
from . import graphq  # noqa: E402,F401
from . import mlq  # noqa: E402,F401
from . import streamq  # noqa: E402,F401
from . import northstar2  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import stateful_probe  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import layout  # noqa: E402,F401
from . import batch5  # noqa: E402,F401
from . import batch6  # noqa: E402,F401
from . import batch7  # noqa: E402,F401
from . import batch8  # noqa: E402,F401
from . import batch9  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registration-order policy (round 15 rotation).
#
# The driver's CORRECTNESS sweep samples exactly 50 queries per round *in
# registration order*, so the order of this dict decides which queries get
# a hard driver-side oracle run. The r14 VERDICT prescribed rotating the
# window to the 27-entry stale cohort (last driver-certified <= r8) and
# the three entries whose code changed this round; this round's changes
# (ALS self-validation columns, key-derived state parallelism, replay
# mtime pinning, the g06 NULL-endpoint filter) fit INSIDE that window, so
# prescription and VERIFY_FIRST coincide for once:
#
#   1. _VERIFY_FIRST_R15 (50) = the exact driver window:
#      - the 27 stale entries (<= r8), including the now-self-validating
#        ALS family m01/m02/m05 and the two remaining rows-only entries
#        q17/q44 (deliberately windowed this round per the r14 VERDICT --
#        their driver record can only ever be rows>0, but the ALS rows now
#        carry validation columns worth recording);
#      - g06 (SEMANTICS: weighted edges drop NULL endpoints, r14 ADVICE);
#      - s10/s18/s19/s21/s22 (state parallelism now derived from key
#        cardinality -- physical change, results proven identical);
#      - the cents-policy wave (the r15 nullx axis replaced the
#        fail-loud cents cast with the bounded value-validity window,
#        changing 11 entries' sum semantics on hostile data): q08/q40/
#        s01/s06/s10/s11/s13/s15/s16/s17/s25 -- all inside the window;
#      - replay-staging consumers most sensitive to file replay order
#        (the mtime pinning is upstream of every streaming entry): the
#        watermark family s02/s03/s07/s08/s12/s14;
#      - d01/q48 (the ctrlchars axis changed their ORACLE strings to the
#        explicit whitespace class -- a changed oracle needs driver
#        re-certification; s09/s31 displaced to PATH_CHANGED head).
#      Every member re-verified MATCH (or rows-only valid) at sf0.001 and
#      sf0.01 on the shipped code before commit.
#   2. _PATH_CHANGED_R15 (14): the remaining streaming entries -- same
#      mtime-pinning path change, results proven identical, all
#      r13/r14-certified, so they queue right behind the window (led by
#      the entries later waves displaced from the fill slots:
#      s09/s31 then s24/s26/s29/s30/s33).
#   3. _FRESHNESS_TREADMILL (128): everyone else, stalest first (the
#      pre-r14-certified names in their prior relative order), entries
#      certified in the r14 window last.
#
# Every name appears in exactly one list and the cohort sizes are
# asserted in _apply_order (r14 ADVICE: the sizes can no longer drift
# from this comment), so the lists remain a PARTITION of the registry
# auditable by len() alone.
# ---------------------------------------------------------------------------

_VERIFY_FIRST_R15: list[str] = [
    "d05_embedding_near_dups",
    "d09_canonical_keep_best",
    "d10_incremental_index_dedup",
    "e03_knn_ivf",
    "m01_als_top5_recs",
    "m02_cold_start_fold_in",
    "m05_implicit_als_recs",
    "mm01_resize_plan",
    "q02_flagship_top_tokens",
    "q03_global_rank_customers",
    "q08_daily_events",
    "q10_dedup_pairs_histogram",
    "q11_set_ops_nationkeys",
    "q12_null_fill_activity",
    "q13_top_orders",
    "q17_sample_stats",
    "q18_range_lookup_tiers",
    "q38_robust_stats",
    "q44_hll_sketch_distinct",
    "q60_sequence_packing",
    "q61_source_quality_gate",
    "q63_epoch_shuffle_shards",
    "q64_vocab_coverage",
    "q65_bloom_prune_join",
    "q67_countmin_heavy_hitters",
    "q69_retention_cohorts",
    "q70_curation_pipeline_v2",
    "g06_weighted_pagerank_top100",
    "s10_stream_tws_counts",
    "s18_stream_tws_latest",
    "s19_stream_tws_buckets",
    "s21_stream_funnel_stages",
    "s22_stream_timer_sessions",
    "s01_stream_tumbling_counts",
    "s02_stream_sliding_counts",
    "s03_stream_session_counts",
    "s07_stream_stream_join",
    "s08_stream_dedup_watermark",
    "s12_stream_dynamic_session",
    "s13_stream_file_sink",
    "s14_stream_left_outer_join",
    "d01_exact_dedup_docs",
    "s15_incremental_rollup",
    "s17_stream_static_anti_join",
    "q40_gap_fill_daily",
    "q48_training_data_pipeline",
    "s06_stream_group_counts",
    "s11_stream_static_join",
    "s16_stream_quality_router",
    "s25_stream_jsonl_sink",
]

_PATH_CHANGED_R15: list[str] = [
    "s09_stream_longest_run",
    "s31_stream_ewma_anomaly",
    "s24_stream_upsert_snapshot",
    "s26_stream_lsh_dedup_probe",
    "s29_stream_semantic_dedup_probe",
    "s30_stream_cdc_dedup_probe",
    "s33_stream_ngram_jaccard_probe",
    "s23_stream_image_features",
    "s32_stream_contamination_probe",
    "s04_stream_dedup_counts",
    "s27_stream_psi_cells",
    "s28_stream_ivf_ingest",
    "s05_stream_latest_topk",
    "s20_stream_countmin_cells",
]

_FRESHNESS_TREADMILL: list[str] = [
    "d04_ngram_jaccard_dedup",
    "d06_contamination_check",
    "d07_near_dup_clusters",
    "d16_soft_dedup_weights",
    "g01_part_in_degrees",
    "g02_pagerank_top100",
    "g04_trade_triangles",
    "g07_kcore_summary",
    "g08_clustering_coefficient",
    "g09_label_propagation",
    "g10_graphframe_notebook_port",
    "e10_rrf_hybrid",
    "e05_knn_truncated_rerank",
    "mm04_audio_features",
    "m03_item_item_cosine",
    "mm07_scene_cuts",
    "d14_semantic_dedup",
    "d08_fuzzy_edit1_join",
    "q82_dsir_importance_weights",
    "e11_knn_sq8",
    "e12_index_tombstone_hygiene",
    "mm03_video_frame_plan",
    "q49_stratified_source_sample",
    "t07_pii_redaction",
    "q04_star_join_revenue",
    "q06_map_lookup_regions",
    "q14_running_spend",
    "q19_rollup_orders",
    "q20_cube_lineitem",
    "q22_salted_group_count",
    "q23_salted_join_revenue",
    "q29_semi_anti_customers",
    "q30_grouping_sets",
    "q31_small_qty_revenue",
    "q41_range_frame_trailing_spend",
    "q50_clustered_scan_pruning",
    "q51_zorder_scan_pruning",
    "q52_compaction_roundtrip",
    "q53_sql_engine_parity",
    "q54_schema_evolution_read",
    "q76_json_roundtrip",
    "q77_merge_upsert_apply",
    "e02_knn_lsh",
    "e09_knn_label_eval",
    "q39_udtf_doc_chunks",
    "q75_token_budget_curriculum",
    "g11_motif_open_trade_wedges",
    "g12_personalized_pagerank",
    "g13_bfs_trade_paths",
    "g14_scc_trade_components",
    "g15_parallel_personalized_pagerank",
    "m07_ranking_metrics",
    "q01_pricing_summary",
    "q05_balance_buckets",
    "q07_regex_brand_etl",
    "q09_quantiles",
    "q15_json_props",
    "q28_hash_sample_stats",
    "q35_unpivot_segment_metrics",
    "q42_try_arithmetic",
    "q56_batch_sessionization",
    "q62_bm25_topk",
    "q72_orc_roundtrip",
    "q80_source_score_calibration",
    "q85_classifier_quality_filter",
    "t01_text_quality",
    "t03_token_stats",
    "t04_tfidf_top_terms",
    "t08_bigram_cross_entropy",
    "t10_token_entropy",
    "q83_psi_drift",
    "mm02_image_features",
    "mm06_image_phash_dedup",
    "d11_canonical_url_dedup",
    "q73_event_transition_bigrams",
    "t09_bpe_pair_counts",
    "q74_cluster_aware_split",
    "d12_truncation_dedup",
    "q79_table_profile",
    "e07_knn_filtered",
    "q24_distinct_counts",
    "q25_pivot_status",
    "q26_rank_family",
    "q27_lag_lead_orders",
    "q32_full_outer_nation_coverage",
    "q34_lateral_top_customers",
    "q36_listagg_region_nations",
    "q37_variant_event_props",
    "q43_bitmap_distinct",
    "q46_array_hof_top3",
    "q47_map_type_roundtrip",
    "e04_knn_pq_adc",
    "e06_knn_ivfpq",
    "e08_mmr_diversified",
    "t11_zipf_fit",
    "t12_bpe_encode",
    "q84_token_budget_waterfill",
    "t13_bpe_train_merges",
    "q87_kanon_release",
    "q21_asof_click_attribution",
    "q33_group_regression",
    "d03_simhash_docs",
    "t02_lang_id_confusion",
    "e01_knn_bruteforce",
    "q16_segment_top_customers",
    "q58_equidepth_histogram",
    "q55_dq_expectations",
    "q57_weighted_sample",
    "mm05_shard_manifest",
    "q59_snapshot_diff",
    "e13_knn_nsw_beam",
    "q45_recursive_month_spine",
    "q66_interval_month_overlap",
    "q68_funnel_stages",
    "q71_kmv_sketch_setops",
    "q78_delete_propagation",
    "q81_dat_source_roundtrip",
    "q86_ewma_anomaly",
    "m06_cooccurrence_lift",
    "g03_component_histogram",
    "g05_bfs_level_histogram",
    "t05_doc_fingerprints",
    "t14_perplexity_filter",
    "mm08_audio_segments",
    "t06_repetition_metrics",
    "d13_duplicated_spans",
    "d15_cdc_chunk_dedup",
    "d02_minhash_near_dups",
]


def _apply_order() -> None:
    cohorts = [
        _VERIFY_FIRST_R15,
        _PATH_CHANGED_R15,
        _FRESHNESS_TREADMILL,
    ]
    # r14 ADVICE: assert the documented cohort sizes so the policy comment
    # cannot drift from the lists.
    assert len(_VERIFY_FIRST_R15) == 50, len(_VERIFY_FIRST_R15)
    assert len(_PATH_CHANGED_R15) == 14, len(_PATH_CHANGED_R15)
    assert len(_FRESHNESS_TREADMILL) == 128, len(_FRESHNESS_TREADMILL)
    flat = [n for lst in cohorts for n in lst]
    assert len(flat) == len(set(flat)), sorted(
        n for n in set(flat) if flat.count(n) > 1
    )
    order: list[str] = [n for n in _VERIFY_FIRST_R15 if n in REGISTRY]
    placed = set(flat)
    # New / unlisted queries: never driver-checked, so verify early.
    order += [n for n in REGISTRY if n not in placed]
    for lst in cohorts[1:]:
        order += [n for n in lst if n in REGISTRY]
    reordered = {n: REGISTRY[n] for n in order}
    assert len(reordered) == len(REGISTRY), "reorder dropped queries"
    REGISTRY.clear()
    REGISTRY.update(reordered)


_apply_order()

__all__ = ["REGISTRY", "Query", "register", "query_map", "oracle_map"]
