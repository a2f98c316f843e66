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
    # r4: every query has had >=1 driver run (VERDICT r3), so the front of
    # the window is (a) anything brand-new, (b) the stalest entries -- last
    # checked in r01/r02 -- rotating forward per the freshness policy.
    must_be_early = {
        "s10_stream_tws_counts",  # new in r4 (protobuf shim unlock)
        # last driver-checked in round 1:
        "s08_stream_dedup_watermark", "s09_stream_longest_run",
        "d04_ngram_jaccard_dedup", "d05_embedding_near_dups",
        "e03_knn_ivf", "t05_doc_fingerprints", "mm01_resize_plan",
        # oldest of the round-2-checked batch tail:
        "q01_pricing_summary", "q02_flagship_top_tokens",
        "q38_robust_stats",
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
    assert rows_only == {
        "q17_sample_stats",
        "e02_knn_lsh",
        "m01_als_top5_recs",
        "m02_cold_start_fold_in",
        "m05_implicit_als_recs",
        "mm02_image_features",
        "mm04_audio_features",
        "q44_hll_sketch_distinct",
    }, rows_only
