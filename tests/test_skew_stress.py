"""Planted-skew stress tests for the bucketed self-joins (VERDICT r3
"Next round" item 3).

The one skew mode AQE cannot fix is a HOT BUCKET: n near-identical docs
in one LSH band bucket (or n equal values on one deletion variant) emit
n^2/2 candidate pairs from a single key -- task splitting parallelizes
that output, it does not shrink it. These tests plant exactly that storm
(thousands of identical rows) and pin the operator-level guard:
``bucket_cap`` flips hot buckets to a star topology (every member pairs
with the bucket representative), bounding candidates at O(cap * n) while
preserving the property dedup actually consumes -- cluster connectivity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.operators.dedup import (
    edit1_neighborhood_join,
    minhash_near_duplicates,
)

HOT_TEXT = "the same viral boilerplate page copied verbatim across the whole crawl"


def _corpus(spark, n_hot: int, n_bg: int):
    rows = [(i, HOT_TEXT) for i in range(n_hot)]
    rows += [
        (n_hot + i, f"unique background document number {i} token{i} filler{i * 7}")
        for i in range(n_bg)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_lsh_bucket_star_bounds_pair_volume(spark):
    """3000 identical docs: uncapped LSH would emit ~4.5M pairs from one
    bucket; with bucket_cap the output is exactly the 2999-star, every
    pair anchored at the representative (min doc_id) and verified at
    jaccard 1.0."""
    docs = _corpus(spark, n_hot=3000, n_bg=100)
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.8, bucket_cap=64
    ).collect()
    assert len(pairs) == 2999
    assert all(r["doc_a"] == 0 for r in pairs)
    assert sorted(r["doc_b"] for r in pairs) == list(range(1, 3000))
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_bucket_cap_preserves_clusters_vs_exact(spark):
    """Semantic guarantee of the cap: connected components of the pair
    graph -- what near-dup clustering (d07) consumes -- are IDENTICAL
    between exact all-pairs and capped star output; only the pair list
    inside hot buckets shrinks."""
    groups = {0: 50, 1000: 10, 2000: 5}  # start_id -> identical-copy count
    rows = []
    for start, n in groups.items():
        rows += [
            (start + i, f"group {start} shared text repeated for every member here")
            for i in range(n)
        ]
    rows += [(9000 + i, f"lonely doc {i} nothing like the others w{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def components(pairs):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            ra, rb = find(r["doc_a"]), find(r["doc_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out: dict[int, set] = {}
        for x in list(parent):
            out.setdefault(find(x), set()).add(x)
        return {frozenset(v) for v in out.values()}

    exact = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.8).collect()
    capped = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.8, bucket_cap=16
    ).collect()
    # exact emits the full n^2/2 inside each group; capped stars ONLY the
    # 50-group (above cap 16) and keeps the 10- and 5-groups all-pairs
    assert len(exact) == 50 * 49 // 2 + 10 * 9 // 2 + 5 * 4 // 2
    assert len(capped) == 49 + 10 * 9 // 2 + 5 * 4 // 2
    assert components(exact) == components(capped)


def test_small_buckets_unaffected_by_cap(spark):
    """A cap larger than every bucket must be a no-op: byte-identical
    pair set to the exact operator."""
    docs = _corpus(spark, n_hot=12, n_bg=30)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(docs, "doc_id", "text").collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", bucket_cap=1000
        ).collect()
    }
    assert capped == exact == {(a, b) for a in range(12) for b in range(a + 1, 12)}


def test_hot_deletion_variant_star_bounds_pair_volume(spark):
    """d08's hot-bucket twin: 2000 rows of the same name share every
    deletion variant; capped FastSS emits the 1999-star at dist 0 instead
    of ~2M pairs, and unrelated names are untouched."""
    rows = [(i, "acme corp") for i in range(2000)]
    rows += [(5000, "acme corpx"), (5001, "zzz unrelated"), (5002, "qqq other")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = edit1_neighborhood_join(df, "id", "name", bucket_cap=32).collect()
    star = [r for r in out if r["id_a"] == 0 and r["id_b"] < 2000]
    assert len(star) == 1999
    assert all(r["dist"] == 0 for r in star)
    # 'acme corpx' (one insert away) shares the hot 'acme corp' variant
    # bucket: the star keeps it attached to the cluster through the rep
    assert any(r["id_b"] == 5000 and r["dist"] == 1 for r in out)
    assert not any(r["id_a"] == 5001 or r["id_b"] == 5001 for r in out)


def test_fastss_cap_noop_below_threshold(spark):
    rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "unrelated")]
    df = spark.createDataFrame(rows, "id long, name string")
    exact = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit1_neighborhood_join(df, "id", "name").collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit1_neighborhood_join(df, "id", "name", bucket_cap=100).collect()
    }
    assert capped == exact == {(1, 2, 1), (2, 3, 1)}


def test_viral_batch_probe_index_cap_bounds_candidates(spark):
    """d10's incremental path meets the storm: a viral doc is ALREADY
    indexed n_hot times, and a new batch re-ingests it 40 more times.
    Uncapped, every band of every probe copy joins the whole hot bucket
    (~4 bands x 40 x n_hot pairs). index_bucket_cap must bound
    candidates at probe x cap while every probe doc still finds a
    representative match."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.dedup import (
        lsh_probe_index,
        minhash_signatures,
    )

    n_hot, n_probe, cap = 1500, 40, 8
    existing = _corpus(spark, n_hot, 50)
    probe = spark.createDataFrame(
        [(1_000_000 + i, HOT_TEXT) for i in range(n_probe)]
        + [(2_000_000 + i, f"fresh unseen probe doc {i} tok{i * 13}") for i in range(10)],
        "doc_id long, text string",
    )
    idx_sigs = minhash_signatures(existing, "doc_id", "text")
    probe_sigs = minhash_signatures(probe, "doc_id", "text")

    capped = lsh_probe_index(idx_sigs, probe_sigs, index_bucket_cap=cap).collect()
    # identical docs collapse to ONE bucket set; representatives are the
    # cap lowest ids, so each viral probe doc yields exactly cap pairs
    hot_pairs = [r for r in capped if r["doc_id"] >= 1_000_000 and r["doc_id"] < 2_000_000]
    assert len(hot_pairs) == n_probe * cap
    assert {r["dup_of"] for r in hot_pairs} == set(range(cap))
    # every viral probe doc still has candidates to verify against
    assert {r["doc_id"] for r in hot_pairs} == {1_000_000 + i for i in range(n_probe)}
    # fresh docs match nothing (no false fan-out added by the cap)
    assert not [r for r in capped if r["doc_id"] >= 2_000_000]


def test_probe_index_cap_none_is_complete(spark):
    """Default (None) must remain the complete candidate set the d10
    oracle hashes against -- the cap is opt-in for skew regimes."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.dedup import (
        lsh_probe_index,
        minhash_signatures,
    )

    existing = _corpus(spark, 30, 0)
    probe = spark.createDataFrame(
        [(500 + i, HOT_TEXT) for i in range(5)], "doc_id long, text string"
    )
    idx_sigs = minhash_signatures(existing, "doc_id", "text")
    probe_sigs = minhash_signatures(probe, "doc_id", "text")
    full = lsh_probe_index(idx_sigs, probe_sigs).collect()
    assert len(full) == 5 * 30  # every (probe, index) pair survives distinct


def test_fastss_position_verify_matches_levenshtein(spark):
    """The position-augmented verify (identity-variant match OR same-
    position deletions) must reproduce exact levenshtein<=1 semantics on
    a corpus built to stress it: repeated characters, insertions,
    deletions, substitutions, equal strings, and dist-2 traps that share
    a deletion variant at DIFFERENT positions (e.g. 'ab' vs 'ba')."""
    from pyspark.sql import functions as F

    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.dedup import (
        edit1_neighborhood_join,
    )

    rows = [
        (1, "kitten"), (2, "sitten"), (3, "kittten"), (4, "kiten"),
        (5, "kitten"), (6, "ab"), (7, "ba"), (8, "aab"), (9, "abb"),
        (10, "aaab"), (11, "abab"), (12, "x"), (13, ""), (14, "xy"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit1_neighborhood_join(df, "id", "name").collect()
    }
    import itertools

    def lev(a, b):
        if a == b:
            return 0
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    want = {
        (ia, ib, lev(na, nb))
        for (ia, na), (ib, nb) in itertools.combinations(rows, 2)
        if lev(na, nb) <= 1
    }
    assert got == want
