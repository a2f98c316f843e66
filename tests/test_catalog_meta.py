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
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import (
        _PATH_CHANGED_R15,
        _VERIFY_FIRST_R15,
    )

    _VERIFY_FIRST = _VERIFY_FIRST_R15
    # r15: the window IS the prescription (stale-27 cohort + this round's
    # changed plans); the path-changed cohort (remaining streaming entries
    # downstream of the replay mtime pinning, results proven identical)
    # queues right behind it.
    _NEXT_R13 = _PATH_CHANGED_R15

    window = list(REGISTRY)[:50]
    # r13: front of the window is anything brand-new or changed this
    # round (plan/oracle edits must re-green under the driver, not just
    # pytest) -- ALL of VERIFY_FIRST must fit inside the window -- then
    # the displaced r8-cohort remainder drains into the leftover slots.
    # Membership is asserted only for names actually REGISTERED -- some
    # registrations are conditional on host capabilities (e.g.
    # transformWithStateInPandas), and an absent query must skip the
    # slot, not fail the test.
    vf = [n for n in _VERIFY_FIRST if n in REGISTRY]
    if len(vf) >= 50:
        # r13: more changed plans than window slots -- the window must be
        # exactly the head of VERIFY_FIRST (newest wave first; overflow
        # entries carry sim evidence and lead the next round's window)
        assert window == vf[:50]
    else:
        missing = set(vf) - set(window)
        assert not missing, f"changed-plan queries outside driver window: {missing}"
        # The remaining window slots drain the stalest cohort strictly
        # oldest-first: the displaced-cohort entries inside the window
        # must form a prefix of the policy list, so adding new queries
        # pushes out the TAIL of the cohort, never skips its head.
        nxt_in_window = [n for n in window if n in set(_NEXT_R13)]
        nxt_registered = [n for n in _NEXT_R13 if n in REGISTRY]
        assert nxt_in_window == nxt_registered[: len(nxt_in_window)]
        # and the window is exactly VERIFY_FIRST + that prefix (no strays)
        assert set(window) == set(vf) | set(nxt_in_window)
    # r15 exception to the rows-only-last rule: the r14 VERDICT explicitly
    # prescribed windowing the five rows-only entries this round (the ALS
    # family is newly self-validating and m01/m02/m05/q17/q44 are all part
    # of the <=r8 stale cohort), so they live INSIDE _VERIFY_FIRST_R15 and
    # the registry's rows_only flags must agree with that placement.
    rows_only = {n for n, q in REGISTRY.items() if q.rows_only}
    assert rows_only <= set(_VERIFY_FIRST_R15), rows_only - set(_VERIFY_FIRST_R15)


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


def _balanced_arg(sql: str, start: int) -> str:
    """Return the balanced-paren argument text starting just inside an
    opening paren at ``start``."""
    depth, j = 1, start
    while depth and j < len(sql):
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
        j += 1
    return sql[start : j - 1]


def _expr_before(sql: str, pos: int) -> str:
    """Walk backwards from ``pos`` balancing parens to recover the full
    expression ending there (stops at a top-level comma/bracket)."""
    depth, i = 0, pos - 1
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                break
            depth -= 1
        elif c in ",[\n" and depth == 0:
            break
        i -= 1
    return sql[i + 1 : pos]


# Base-schema columns that lie on a fixed decimal grid: TPC-H money (2dp)
# and integer-valued quantities/counters. avg() over these is rational
# with denominator n * grid, so exact half-output-unit hits are a
# certainty over enough regenerations -- the t14 class.
GRID_BASE_COLUMNS = {
    "o_totalprice", "c_acctbal", "s_acctbal", "p_retailprice",
    "l_extendedprice", "l_discount", "l_tax", "l_quantity",
    "n_chars", "amount",
}


def test_no_round_avg_over_grid_aligned_oracle_inputs():
    """r11's t14 class, MECHANIZED (r11 VERDICT task 6a): round(avg(X), k)
    in oracle SQL diverges across engines when X lies on a fixed decimal
    grid -- the true mean hits exact half-output-units with ~1/n
    probability per group, and the two engines' float sums land one ulp
    either side. Such means must use catalog.grid_mean_sql (t14/t10 were
    both found exactly this way). X counts as grid-aligned when it is a
    bare identifier that (a) names a base-schema money/integer column, or
    (b) is aliased in the same SQL to a round(expr, j) / len(...) /
    count(...) expression. Varying-denominator rationals (ratios, per-doc
    sum/count means) are exempt: their exact half-grid hits are
    measure-zero."""
    import re

    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        sql = q.oracle.lower()
        for m in re.finditer(r"round\s*\(\s*avg\s*\(", sql):
            arg = _balanced_arg(sql, m.end()).strip()
            if not re.fullmatch(r"[a-z_][a-z0-9_.]*", arg):
                continue  # an expression (ratio etc.), not a bare column
            ident = arg.rsplit(".", 1)[-1]
            if ident in GRID_BASE_COLUMNS:
                bad.append((name, ident, "base grid column"))
                continue
            for dm in re.finditer(r"\bas\s+" + re.escape(ident) + r"\b", sql):
                expr = _expr_before(sql, dm.start()).strip()
                head = re.match(r"(round|len|count)\s*\(", expr)
                if not head:
                    continue
                # grid-aligned only when the alias IS the bare call (a
                # ratio like count(*)/sum(c) has a varying denominator)
                inner = _balanced_arg(expr, head.end())
                if head.end() + len(inner) + 1 == len(expr):
                    bad.append((name, ident, expr[:80]))
                    break
    assert not bad, (
        "round(avg(...)) over grid-aligned input -- use grid_mean_sql: "
        f"{bad}"
    )


def test_value_validity_bound_literal_matches_constant():
    """ADVICE r15: the value-validity bound is hand-inlined as a float
    literal in ~10 oracle SQL strings instead of composed from
    functions.numeric; if VALUE_VALID_MAX ever changes, those oracles
    would silently drift from the Spark side. Pin every inlined
    ``abs(value) <= X`` bound in every registered oracle (and in the
    plan sources) to repr(VALUE_VALID_MAX)."""
    import re

    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.numeric import (
        VALUE_VALID_MAX,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

    want = repr(VALUE_VALID_MAX)
    bad = []
    for name, q in REGISTRY.items():
        sql = q.oracle or ""
        for m in re.finditer(r"abs\(value\) <= ([0-9.e+]+)", sql):
            if m.group(1) != want:
                bad.append((name, m.group(1)))
    assert not bad, f"oracle value-validity bound drifted from {want}: {bad}"
