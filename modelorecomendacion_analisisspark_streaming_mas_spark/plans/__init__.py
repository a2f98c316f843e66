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
# Registration-order policy (round 12 rotation).
#
# The driver's CORRECTNESS sweep samples exactly 50 queries per round *in
# registration order* (r1-r11 each recorded 50), so the order of this dict
# decides which queries get a hard driver-side oracle run. Policy
# (documented so it survives refactors):
#
#   1. VERIFY_FIRST: queries whose EXECUTION PATH changed this round (they
#      must be re-greened under the driver, not just pytest), plus
#      brand-new entries. r12 promotes 31: s26/s33 (the per-batch probe
#      gates now persist the pair list instead of eager-checkpointing it,
#      the batch gate is a scalar sum(psz), and s26 gates the candidate
#      broadcast on PROBE_BROADCAST_CAND_SHINGLE_LIMIT); q16 (rank key
#      moved from an unrounded sum(o_totalprice) to the exact integer
#      cents sum after the new window-sort-key lint flagged it -- the
#      t04/q62 rank-tie class, latent); t10 (its 9dp-quantized entropy
#      mean moved to the integer-grid fold after the new oracle lint
#      flagged it -- the t14 class, latent); and the 19 queries whose
#      plans carry the new grid-mean runtime exactness guard
#      (catalog._grid_guard: every grid_mean_spark/money_mean_spark
#      site), all re-simmed MATCH at sf0.01 before the rotation; plus
#      e09 and t14's NULL-predicate alignments (count(when) / try_divide),
#      both found by the r12 all-NULL hostile variant on first contact.
#   2. NEXT_R12 (15): the r7-cohort tail displaced from the r11 window
#      (q52-q59/mm05/s02-s07/s10) -- the stalest official records (r7),
#      every member re-verified by the judge's full-catalog r11 sweep,
#      per the displacement rule.
#   3. FRESH_R8 (39 after q16's promotion): the next-stalest cohort;
#      slots 31+13 leave room for its first 6 (s13..s20). The displaced
#      remainder leads the r13 window.
#   4. FRESH_R9 / FRESH_R10 / FRESH_R11: re-checked oldest-first.
#      FRESH_R11 is the union of r11's VERIFY_FIRST (minus the 13
#      re-promoted), the nine r10-displaced entries re-greened in r11,
#      and the first 26 of the old r7 cohort (minus the five promoted) --
#      the freshest records, checked last.
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
    "q16_segment_top_customers",
    "t10_token_entropy",
    "q01_pricing_summary",
    "q05_balance_buckets",
    "q07_regex_brand_etl",
    "q09_quantiles",
    "q15_json_props",
    "q28_hash_sample_stats",
    "q35_unpivot_segment_metrics",
    "q42_try_arithmetic",
    "q56_batch_sessionization",
    "q72_orc_roundtrip",
    "q80_source_score_calibration",
    "q85_classifier_quality_filter",
    "t01_text_quality",
    "t03_token_stats",
    "t04_tfidf_top_terms",
    "t08_bigram_cross_entropy",
    "t14_perplexity_filter",
    "m07_ranking_metrics",
    "d16_soft_dedup_weights",
    # e09/t14 NULL-predicate fixes (the r12 all-NULL hostile variant found
    # both): t14 already sits above; e09 promotes from the r9 cohort
    "e09_knn_label_eval",
    # the r12 single-row hostile variant's four first-contact findings
    # (q58 degenerate width_bucket stripe; q71 try_divide + coalesced
    # exact counts; s21 empty ListState put; m02 -- rows-only, stays in
    # the tail):
    "q58_equidepth_histogram",
    "q71_kmv_sketch_setops",
    "s21_stream_funnel_stages",
    # the r12 empty-tables hostile variant's fixes whose RENDERED plans
    # changed on real data too (q55 try_divide + vacuous-truth bounds,
    # incl. its oracle; s15/s24/s25 explicit-schema sink read-backs).
    # The other nine empty-variant fixes (q19/q20/q30 isEmpty standard
    # grand-total row, q62/e10/q64/d05/q51/t13 guard-only branches) are
    # byte-identical plans on non-empty data -- sim-matched, not
    # window-promoted, per the r11 keying-change precedent.
    "q55_dq_expectations",
    "s15_incremental_rollup",
    "s24_stream_upsert_snapshot",
    "s25_stream_jsonl_sink",
]

_NEXT_R12 = [
    "q52_compaction_roundtrip",
    "q53_sql_engine_parity",
    "q54_schema_evolution_read",
    "q57_weighted_sample",
    "mm05_shard_manifest",
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
    "q18_range_lookup_tiers",
    "q19_rollup_orders",
    "q20_cube_lineitem",
]

_FRESH_R9 = [
    "s28_stream_ivf_ingest",
    "g06_weighted_pagerank_top100",
    "e02_knn_lsh",
    "mm02_image_features",
    "mm06_image_phash_dedup",
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
    "e04_knn_pq_adc",
    "e06_knn_ivfpq",
    "g09_label_propagation",
    "d13_duplicated_spans",
    "e08_mmr_diversified",
    "t11_zipf_fit",
    "t12_bpe_encode",
    "q84_token_budget_waterfill",
    "t13_bpe_train_merges",
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

_FRESH_R11 = [
    "q62_bm25_topk",
    "e10_rrf_hybrid",
    "e05_knn_truncated_rerank",
    "mm04_audio_features",
    "g08_clustering_coefficient",
    "g04_trade_triangles",
    "m03_item_item_cosine",
    "mm07_scene_cuts",
    "d14_semantic_dedup",
    "d15_cdc_chunk_dedup",
    "d08_fuzzy_edit1_join",
    "s22_stream_timer_sessions",
    "q81_dat_source_roundtrip",
    "q82_dsir_importance_weights",
    "q83_psi_drift",
    "s27_stream_psi_cells",
    "g10_graphframe_notebook_port",
    "s31_stream_ewma_anomaly",
    "e11_knn_sq8",
    "mm08_audio_segments",
    "e12_index_tombstone_hygiene",
    "s16_stream_quality_router",
    "s17_stream_static_anti_join",
    "mm03_video_frame_plan",
    "d06_contamination_check",
    "t06_repetition_metrics",
    "q49_stratified_source_sample",
    "t07_pii_redaction",
    "d07_near_dup_clusters",
    "q50_clustered_scan_pruning",
    "q51_zorder_scan_pruning",
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
        _NEXT_R12,
        _FRESH_R8,
        _FRESH_R9,
        _FRESH_R10,
        _FRESH_R11,
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
