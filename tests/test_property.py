"""Property-based tests (hypothesis) for the pure-function operator cores.

Pattern: hypothesis generates the example set driver-side, ALL examples go
through Spark in ONE job (a single createDataFrame -> select -> collect),
and the invariant is checked per example in Python. This keeps the
per-example cost at dataframe-row level instead of Spark-job level, so
hypothesis can afford real example counts against a live session.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.functions.etl import (
    bucketize,
    range_lookup_join,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.plans.layout import zorder_key

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _deinterleave(z: int, bits: int) -> tuple[int, int]:
    """Python inverse of zorder_key's bit interleave."""
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i + 1)) & 1) << i
        b |= ((z >> (2 * i)) & 1) << i
    return a, b


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_key_is_invertible(spark, pairs):
    """Morton interleave must lose no bits: deinterleaving the key
    recovers both inputs exactly (the property row-group skipping on
    EITHER dimension rests on)."""
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select("a", "b", zorder_key(F.col("a"), F.col("b"), 16).alias("z")).collect()
    for r in rows:
        assert _deinterleave(r["z"], 16) == (r["a"], r["b"])


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_key_preserves_dominance_order(spark, quads):
    """If p dominates q on BOTH dimensions (a1<=a2, b1<=b2), the Morton
    key must not invert: z(p) <= z(q). This monotonicity is what makes a
    z-ordered sort cluster rectangle queries."""
    rows = [
        (min(a1, a2), min(b1, b2), max(a1, a2), max(b1, b2))
        for a1, b1, a2, b2 in quads
    ]
    df = spark.createDataFrame(rows, "a1 long, b1 long, a2 long, b2 long")
    got = df.select(
        zorder_key(F.col("a1"), F.col("b1"), 16).alias("zp"),
        zorder_key(F.col("a2"), F.col("b2"), 16).alias("zq"),
    ).collect()
    for r in got:
        assert r["zp"] <= r["zq"]


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=999), min_size=1, max_size=40),
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=999), st.integers(min_value=0, max_value=200)),
        min_size=1,
        max_size=10,
    ),
)
def test_range_lookup_join_matches_linear_scan(spark, keys, raw_ranges):
    """range_lookup_join (broadcast theta join) must agree with the
    obvious per-row linear scan over DISJOINT ranges -- the semantics of
    the reference's zip_to_state UDF it re-expresses."""
    # build disjoint [low, high] ranges from sorted unique starts
    ranges = []
    for lo, width in sorted(set(raw_ranges)):
        if ranges and lo <= ranges[-1][1]:
            continue
        ranges.append((lo, lo + width, f"v{lo}"))

    def scan(k: int) -> str:
        for lo, hi, v in ranges:
            if lo <= k <= hi:
                return v
        return "none"

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rdf = spark.createDataFrame(ranges, "lo long, hi long, val string")
    got = range_lookup_join(df, "k", rdf, "lo", "hi", "val", "out", default="none").collect()
    for r in got:
        assert r["out"] == scan(r["k"]), (r["k"], ranges)


@settings(**_SETTINGS)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=50))
def test_bucketize_covers_every_value(spark, values):
    """bucketize over a closed bin chain assigns every input exactly one
    label, and the label's bin actually contains the value."""
    bins = [(None, -100.0, "low"), (-100.0, 100.0, "mid"), (100.0, None, "high")]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    rows = df.select("x", bucketize(F.col("x"), bins).alias("lbl")).collect()
    for r in rows:
        x = r["x"]
        if x < -100.0:
            assert r["lbl"] == "low"
        elif x < 100.0:
            assert r["lbl"] == "mid", x
        else:
            assert r["lbl"] == "high"


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for arbitrary planted
    URLs -- canonicalization must be a projection."""
    from pyspark.sql import functions as F

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch7 import (
        canonical_url,
    )

    urls = [
        "HTTPS://Host.X/Path/Y?q=1#f",
        "http://a.b/",
        "ftp://U:p@H.com:21/Dir/",
        "https://h/deep/Path///",
        "https://h",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c2"))
    assert [r["c"] for r in once.collect()] == [r["c2"] for r in twice.collect()]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(min_value=-1000, max_value=1000),
                  st.integers(min_value=0, max_value=10_000)),
        min_size=1, max_size=120, unique_by=lambda t: t[1],
    ),
    st.integers(min_value=1, max_value=50),
)
def test_striped_rank_equals_sorted_position(spark, rows, width):
    """striped_global_row_number == the Python-sorted position, for ANY
    data and ANY stripe width (v // width coarsens the (v, id) order by
    construction), including duplicate v values straddling stripes."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.topk import (
        striped_global_row_number,
    )

    df = spark.createDataFrame(rows, "v int, id int")
    got = {
        (r["v"], r["id"]): r["rn"]
        for r in striped_global_row_number(
            df,
            [F.asc("v"), F.asc("id")],
            F.floor(F.col("v") / width).cast("long"),
            rank_col="rn",
        ).collect()
    }
    want = {t: i + 1 for i, t in enumerate(sorted(rows))}
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=12
    ),
    st.sampled_from(["a", "b", "aa", "ab", "ba"]),
    st.sampled_from(["a", "b", "aa", "ab", "ba"]),
)
def test_bpe_greedy_merge_matches_python_reference(spark, syms, lhs, rhs):
    """t13's JVM fold == the textbook greedy left-to-right
    non-overlapping merge for ARBITRARY symbol sequences and pairs --
    including same-symbol runs, pairs absent from the word, and merged
    symbols colliding with pair members."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch8 import (
        bpe_greedy_merge,
    )

    out: list[str] = []
    for s in syms:
        if out and out[-1] == lhs and s == rhs:
            out[-1] = lhs + rhs
        else:
            out.append(s)
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(bpe_greedy_merge(F.col("syms"), lhs, rhs).alias("m")).first()[
        "m"
    ]
    assert got == out, (syms, lhs, rhs, got, out)
