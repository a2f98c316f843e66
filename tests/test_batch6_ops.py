"""Semantics pins for the batch6 operator family beyond the driver oracle:
funnel tie-breaking on simultaneous events, Bloom no-false-negative law,
CMS overcount law, and the interval bin-rewrite on planted edge intervals.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_funnel_simultaneous_events_resolve_in_funnel_order(spark):
    """Events sharing a timestamp advance the machine in funnel order
    (sort key (ts, step_no)): a user whose view/click/purchase all carry
    the same ts completes the funnel; a click strictly BEFORE the first
    view does not count."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch6 import (
        funnel_user_stages,
    )

    rows = [
        # u1: all three at the same instant -> stage 3.
        (1, _ts("2024-01-01T10:00:00"), "view"),
        (1, _ts("2024-01-01T10:00:00"), "click"),
        (1, _ts("2024-01-01T10:00:00"), "purchase"),
        # u2: click before the first view -> only stage 1.
        (2, _ts("2024-01-01T09:00:00"), "click"),
        (2, _ts("2024-01-01T10:00:00"), "view"),
        # u3: purchase before click -> stage 2, not 3 (click at exactly
        # anchor+30min is IN window, inclusive bound).
        (3, _ts("2024-01-01T10:00:00"), "view"),
        (3, _ts("2024-01-01T10:15:00"), "purchase"),
        (3, _ts("2024-01-01T10:30:00"), "click"),
        # u4: no funnel events at all -> stage 0.
        (4, _ts("2024-01-01T10:00:00"), "error"),
        # u5: click in window, purchase 35min after the click -> window
        # expired, stays at stage 2.
        (5, _ts("2024-01-01T10:00:00"), "view"),
        (5, _ts("2024-01-01T10:20:00"), "click"),
        (5, _ts("2024-01-01T10:55:00"), "purchase"),
        # u6: first-touch anchoring -- a LATER view would put the click in
        # window, but the anchor is the FIRST view, so the click misses.
        (6, _ts("2024-01-01T10:00:00"), "view"),
        (6, _ts("2024-01-01T11:00:00"), "view"),
        (6, _ts("2024-01-01T11:05:00"), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: r["stage"]
        for r in funnel_user_stages(
            ev, ("view", "click", "purchase"), window_min=30
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2, 4: 0, 5: 2, 6: 1}
    # Unwindowed variant: u5 completes, u6 reaches 2.
    got_unbounded = {
        r["user_id"]: r["stage"]
        for r in funnel_user_stages(ev, ("view", "click", "purchase")).collect()
    }
    assert got_unbounded == {1: 3, 2: 1, 3: 2, 4: 0, 5: 3, 6: 2}


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    """CMS overcounts, Bloom filters over-ADMIT; neither may ever lose a
    true member. q65's output row carries the audit columns."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

    row = REGISTRY["q65_bloom_prune_join"].fn(spark, sf_dir).collect()[0]
    assert row["n_false_neg"] == 0
    assert row["n_pass"] >= row["n_members"]


def test_countmin_never_undercounts(spark, sf_dir):
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

    rows = REGISTRY["q67_countmin_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)


def test_interval_bin_rewrite_matches_naive_join_on_edge_intervals(spark):
    """Planted intervals that (a) end exactly on a month boundary,
    (b) span 3 months, (c) are zero-length: the bin explode must produce
    exactly the months the naive overlap predicate admits."""
    rows = [
        (1, _ts("2024-01-15T00:00:00"), _ts("2024-02-01T00:00:00"), 10.0),
        (2, _ts("2024-01-20T00:00:00"), _ts("2024-03-05T00:00:00"), 20.0),
        (3, _ts("2024-02-10T00:00:00"), _ts("2024-02-10T00:00:00"), 30.0),
    ]
    iv = spark.createDataFrame(rows, "k long, s timestamp, e timestamp, v double")
    binned = (
        iv.select(
            "k",
            F.explode(
                F.expr("sequence(date_trunc('month', s), e, interval 1 month)")
            ).alias("m"),
        )
        .groupBy("m")
        .agg(F.sort_array(F.collect_list("k")).alias("ks"))
    )
    got = {r["m"]: list(r["ks"]) for r in binned.collect()}
    assert got == {
        _ts("2024-01-01T00:00:00"): [1, 2],
        _ts("2024-02-01T00:00:00"): [1, 2, 3],
        _ts("2024-03-01T00:00:00"): [2],
    }


def test_funnel_machine_matches_python_reference_on_random_events(spark):
    """Differential test: 200 random users' event streams, the Spark HOF
    state machine vs a direct Python simulation of the same first-touch
    windowed-funnel semantics."""
    import random

    rng = random.Random(1234)
    steps = {"view": 1, "click": 2, "purchase": 3}
    types = ["view", "click", "purchase", "error", "signup"]
    rows, expected = [], {}
    for uid in range(200):
        n = rng.randint(0, 12)
        evs = sorted(
            (
                dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randint(0, 5000)),
                rng.choice(types),
            )
            for _ in range(n)
        )
        for ts, et in evs:
            rows.append((uid, ts, et))
        # Python reference: sort by (ts, step_no), greedy first-touch with
        # a 60-minute window for steps 2+.
        seq = sorted(
            ((ts, steps[et]) for ts, et in evs if et in steps),
            key=lambda p: (p[0], p[1]),
        )
        stage, anchor = 0, None
        for ts, s in seq:
            in_window = (
                s == 1
                or anchor is None
                or ts <= anchor + dt.timedelta(minutes=60)
            )
            if s == stage + 1 and in_window:
                stage, anchor = s, ts
        expected[uid] = stage
    # Users with zero events never enter the frame; drop them from the
    # expectation (the catalog query's distinct-users frame comes from the
    # same events table).
    present = {uid for uid, _, _ in rows}
    expected = {u: s for u, s in expected.items() if u in present}

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch6 import (
        funnel_user_stages,
    )

    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: r["stage"]
        for r in funnel_user_stages(
            ev, ("view", "click", "purchase"), window_min=60
        ).collect()
    }
    assert got == expected


def test_epoch_shuffle_shards_are_balanced_and_partition_all_docs(spark, sf_dir):
    """Round-robin striping: shard sizes differ by at most 1 and sum to
    the corpus size."""
    from pyspark.sql import functions as F
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import (
        load_table,
    )

    rows = REGISTRY["q63_epoch_shuffle_shards"].fn(spark, sf_dir).collect()
    sizes = [r["n_docs"] for r in rows]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(sizes) == n_docs
    assert max(sizes) - min(sizes) <= 1
    assert len(rows) == min(16, n_docs)
