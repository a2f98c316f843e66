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
# Registration-order policy (round 11 rotation).
#
# The driver's CORRECTNESS sweep samples exactly 50 queries per round *in
# registration order* (r1-r10 each recorded 50), so the order of this dict
# decides which queries get a hard driver-side oracle run. Policy
# (documented so it survives refactors):
#
#   1. VERIFY_FIRST: queries whose EXECUTION PATH changed this round (they
#      must be re-greened under the driver, not just pytest), plus
#      brand-new entries. r11 promotes 15: s26 and s33, whose per-batch
#      verify joins now gate the CANDIDATE-side broadcast on the exact
#      pair-payload sum (the r10 ADVICE medium item) with a checkpointed
#      pair list -- same results (equivalence-tested + sim-matched),
#      different physical path; plus the ten integer-grid-mean
#      conversions not already in the window (q01/q09/q15/q42/q56/q72/
#      q80/q85/t01/t03 -- the r11 fresh-salt drift sweep caught t14's
#      round(avg(6dp-grid), 6) diverging at an exact half-microunit, and
#      the fix was applied to every mean over grid-aligned inputs; the
#      other four changed queries, t14/m07/d16/t08, sit inside the r7
#      prefix below). The cache-fingerprint keys and the money_mean_sql
#      interpolation are keying/provenance changes whose rendered plans
#      and oracle strings are byte-identical (q05/q07/q28/q35
#      sim-matched). Late-r11: t04/q62/e10 join after a dup-heavy
#      hostile variant exposed rank keys that were unrounded float
#      aggregates of grid values (see the list's inline note).
#   2. NEXT_R11 (9): the r6-cohort entries the 17-wide r10 VERIFY_FIRST
#      displaced from the r10 window (all in the judge-r9 sample, so the
#      displacement rule held); the r10 VERDICT's plan has them early.
#   3. FRESH_R7 (41 after q56's promotion): the stalest official cohort
#      (last driver records r7; every member re-verified by judge-r9 or
#      judge-r10 at sf0.01). Slots 15+9+26 = 50 fit its first 26
#      (through q51, including changed t14/m07/d16/t08); the displaced
#      tail fifteen (q52/q53/q54/q55/q57/mm05/q58/q59/s02-s07/s10 --
#      each in the judge-r9 or judge-r10 sample, per the displacement
#      rule) lead the r12 window.
#   4. FRESH_R8 / FRESH_R9 / FRESH_R10: re-checked oldest-first.
#      FRESH_R10 is the union of r10's VERIFY_FIRST (minus the two
#      re-promoted) and the r6 cohort re-greened in r10 -- the freshest
#      records, checked last.
#   5. Inherently rows-only samples (q17 Bernoulli, q44 HLL, m01/m02/m05
#      ALS training -- register(..., rows_only=True)) at the very end: a
#      window slot spent on them can never upgrade to a hash match, and
#      their `err: no_oracle` CORRECTNESS rows are by design (see
#      COVERAGE.md "Rows-only entries").
#
# Every name appears in exactly one list (asserted in _apply_order): the
# lists are a PARTITION of the registry, so the window arithmetic above
# is auditable by len() alone.
# ---------------------------------------------------------------------------

_VERIFY_FIRST: list[str] = [
    "s26_stream_lsh_dedup_probe",
    "s33_stream_ngram_jaccard_probe",
    # The r11 fresh-salt drift sweep caught t14's round(avg(6dp), 6)
    # diverging at an exact half-microunit; the fix (integer-grid means,
    # catalog.grid_mean_spark/_sql) was applied to every mean over
    # GRID-ALIGNED inputs in the catalog -- 14 queries. The four already
    # inside the window via the r7 cohort (t14/m07/d16/t08) stay there;
    # the other ten promote here. All 14 re-simmed MATCH at sf0.01
    # before the rotation (and at 3 scales + fresh drift after).
    "q01_pricing_summary",
    "q09_quantiles",
    "q15_json_props",
    "q42_try_arithmetic",
    "q56_batch_sessionization",
    "q72_orc_roundtrip",
    "q80_source_score_calibration",
    "q85_classifier_quality_filter",
    "t01_text_quality",
    "t03_token_stats",
    # A dup-heavy hostile variant (1/3 of docs sharing one text) caught
    # t04 swapping rank 1/2 between two terms whose tf-idf is
    # mathematically EQUAL: the rank key was the UNROUNDED float mean,
    # which lands one ulp apart per engine on tied groups. t04 now ranks
    # on the 8dp grid-mean of 9dp-rounded contributions; q62/e10 carried
    # the same latent class in their BM25 sum (rank on an unrounded
    # float sum of 9dp-grid contributions) and now rank on the exact
    # integer nano sum. All three re-verified at 3 scales + both drift
    # salts + the dup-heavy variant.
    "t04_tfidf_top_terms",
    "q62_bm25_topk",
    "e10_rrf_hybrid",
]

_NEXT_R11 = [
    "e05_knn_truncated_rerank",
    "mm04_audio_features",
    "g08_clustering_coefficient",
    "g04_trade_triangles",
    "m03_item_item_cosine",
    "s15_incremental_rollup",
    "mm07_scene_cuts",
    "d14_semantic_dedup",
    "d15_cdc_chunk_dedup",
]

# r10's VERIFY_FIRST (minus the two re-promoted) + the r6 cohort: all 48
# carry r10 driver records, the freshest in the catalog.
_FRESH_R10 = [
    "d04_ngram_jaccard_dedup",
    "s29_stream_semantic_dedup_probe",
    "s30_stream_cdc_dedup_probe",
    "s32_stream_contamination_probe",
    "g15_parallel_personalized_pagerank",
    "g11_motif_open_trade_wedges",
    "g12_personalized_pagerank",
    "g13_bfs_trade_paths",
    "g14_scc_trade_components",
    "q07_regex_brand_etl",
    "e04_knn_pq_adc",
    "e06_knn_ivfpq",
    "q05_balance_buckets",
    "q28_hash_sample_stats",
    "q35_unpivot_segment_metrics",
    "s24_stream_upsert_snapshot",
    "g09_label_propagation",
    "d13_duplicated_spans",
    "e08_mmr_diversified",
    "t11_zipf_fit",
    "t12_bpe_encode",
    "q84_token_budget_waterfill",
    "t13_bpe_train_merges",
    "e09_knn_label_eval",
    "q86_ewma_anomaly",
    "q87_kanon_release",
    "q21_asof_click_attribution",
    "q23_salted_join_revenue",
    "q29_semi_anti_customers",
    "q33_group_regression",
    "q40_gap_fill_daily",
    "q45_recursive_month_spine",
    "q48_training_data_pipeline",
    "s01_stream_tumbling_counts",
    "s14_stream_left_outer_join",
    "d01_exact_dedup_docs",
    "d02_minhash_near_dups",
    "d03_simhash_docs",
    "t02_lang_id_confusion",
    "e01_knn_bruteforce",
    "s11_stream_static_join",
    "s12_stream_dynamic_session",
    "g03_component_histogram",
]

_FRESH_R7 = [
    "d08_fuzzy_edit1_join",
    "s22_stream_timer_sessions",
    "q81_dat_source_roundtrip",
    "q82_dsir_importance_weights",
    "q83_psi_drift",
    "t10_token_entropy",
    "m07_ranking_metrics",
    "s27_stream_psi_cells",
    "g10_graphframe_notebook_port",
    "s31_stream_ewma_anomaly",
    "t14_perplexity_filter",
    "e11_knn_sq8",
    "mm08_audio_segments",
    "d16_soft_dedup_weights",
    "e12_index_tombstone_hygiene",
    "s16_stream_quality_router",
    "s17_stream_static_anti_join",
    "mm03_video_frame_plan",
    "t08_bigram_cross_entropy",
    "d06_contamination_check",
    "t06_repetition_metrics",
    "q49_stratified_source_sample",
    "t07_pii_redaction",
    "d07_near_dup_clusters",
    "q50_clustered_scan_pruning",
    "q51_zorder_scan_pruning",
    "q52_compaction_roundtrip",
    "q53_sql_engine_parity",
    "q54_schema_evolution_read",
    "q55_dq_expectations",
    "q57_weighted_sample",
    "mm05_shard_manifest",
    "q58_equidepth_histogram",
    "q59_snapshot_diff",
    "s02_stream_sliding_counts",
    "s03_stream_session_counts",
    "s04_stream_dedup_counts",
    "s05_stream_latest_topk",
    "s06_stream_group_counts",
    "s07_stream_stream_join",
    "s10_stream_tws_counts",
]

_FRESH_R8 = [
    "s13_stream_file_sink",
    "e13_knn_nsw_beam",
    "s18_stream_tws_latest",
    "s19_stream_tws_buckets",
    "g05_bfs_level_histogram",
    "s20_stream_countmin_cells",
    "q61_source_quality_gate",
    "q63_epoch_shuffle_shards",
    "q64_vocab_coverage",
    "q65_bloom_prune_join",
    "q66_interval_month_overlap",
    "q67_countmin_heavy_hitters",
    "q68_funnel_stages",
    "q69_retention_cohorts",
    "s21_stream_funnel_stages",
    "d09_canonical_keep_best",
    "q70_curation_pipeline_v2",
    "d10_incremental_index_dedup",
    "q60_sequence_packing",
    "s08_stream_dedup_watermark",
    "s09_stream_longest_run",
    "d05_embedding_near_dups",
    "e03_knn_ivf",
    "t05_doc_fingerprints",
    "mm01_resize_plan",
    "q02_flagship_top_tokens",
    "q38_robust_stats",
    "q03_global_rank_customers",
    "q04_star_join_revenue",
    "q06_map_lookup_regions",
    "q08_daily_events",
    "q10_dedup_pairs_histogram",
    "q11_set_ops_nationkeys",
    "q12_null_fill_activity",
    "q13_top_orders",
    "q14_running_spend",
    "q16_segment_top_customers",
    "q18_range_lookup_tiers",
    "q19_rollup_orders",
    "q20_cube_lineitem",
]

_FRESH_R9 = [
    "s25_stream_jsonl_sink",
    "s28_stream_ivf_ingest",
    "g06_weighted_pagerank_top100",
    "e02_knn_lsh",
    "mm02_image_features",
    "mm06_image_phash_dedup",
    "q71_kmv_sketch_setops",
    "d11_canonical_url_dedup",
    "q73_event_transition_bigrams",
    "t09_bpe_pair_counts",
    "q74_cluster_aware_split",
    "q75_token_budget_curriculum",
    "q76_json_roundtrip",
    "s23_stream_image_features",
    "q77_merge_upsert_apply",
    "m06_cooccurrence_lift",
    "q78_delete_propagation",
    "d12_truncation_dedup",
    "q79_table_profile",
    "e07_knn_filtered",
    "g07_kcore_summary",
    "q22_salted_group_count",
    "q24_distinct_counts",
    "q25_pivot_status",
    "q26_rank_family",
    "q27_lag_lead_orders",
    "q30_grouping_sets",
    "q31_small_qty_revenue",
    "q32_full_outer_nation_coverage",
    "q34_lateral_top_customers",
    "q36_listagg_region_nations",
    "q37_variant_event_props",
    "q41_range_frame_trailing_spend",
    "q43_bitmap_distinct",
    "q46_array_hof_top3",
    "q47_map_type_roundtrip",
    "q39_udtf_doc_chunks",
    "g01_part_in_degrees",
    "g02_pagerank_top100",
]

_ROWS_ONLY_TAIL = [
    "m01_als_top5_recs",
    "m02_cold_start_fold_in",
    "m05_implicit_als_recs",
    "q17_sample_stats",
    "q44_hll_sketch_distinct",
]

def _apply_order() -> None:
    cohorts = [
        _VERIFY_FIRST,
        _NEXT_R11,
        _FRESH_R7,
        _FRESH_R8,
        _FRESH_R9,
        _FRESH_R10,
        _ROWS_ONLY_TAIL,
    ]
    flat = [n for lst in cohorts for n in lst]
    assert len(flat) == len(set(flat)), sorted(
        n for n in set(flat) if flat.count(n) > 1
    )
    order: list[str] = [n for n in _VERIFY_FIRST if n in REGISTRY]
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
