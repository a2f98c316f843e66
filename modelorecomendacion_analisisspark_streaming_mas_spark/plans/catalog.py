"""Query registry: every operator from SURVEY.md section 2 becomes a named
query with an optional DuckDB oracle-SQL twin (the driver's correctness
gate, __spark_entry__.py contract).

Conventions enforced here by construction:
  * every computed column is aliased identically in the Spark plan and the
    oracle SQL (the driver hashes values after sorting columns by name);
  * double-typed aggregates are rounded on BOTH sides so floating-point
    summation order (Spark partial aggs vs DuckDB) cannot flip the hash;
  * window/top-k orderings always include a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..compat.protobuf_shim import ensure_worker_shim
from ..shipping import ensure_package_shipped

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over pre-registered views; None -> rows-only check
    doc: str = ""
    # True for the five entries that are rows-only BY CONSTRUCTION (ALS
    # training m01/m02/m05, Bernoulli sample q17, HLL sketch q44): their
    # result is not SQL-expressible in DuckDB, so the driver reports
    # `err: no_oracle` for them in CORRECTNESS_r0N -- that row is
    # BY DESIGN, not a failure. Each has an exact-oracle twin and/or
    # acceptance tests (see COVERAGE.md "rows-only entries").
    rows_only: bool = False


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", rows_only: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if rows_only and oracle is not None:
            raise ValueError(f"{name}: rows_only entries must not carry an oracle")

        def shipped_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Workers must be able to import this package to deserialize
            # any Pandas-UDF stage (see shipping.py); no-op after the
            # first call per SparkContext, and harmless for pure-JVM plans.
            ensure_package_shipped(spark)
            # No-op unless the driver resolved protobuf via the vendored
            # runtime (compat/protobuf_shim.py) -- then workers need the
            # google/__init__.py alias zip too (stateful-v2 state client).
            ensure_worker_shim(spark)
            return fn(spark, sf_dir)

        shipped_fn.__name__ = fn.__name__
        shipped_fn.__doc__ = fn.__doc__
        REGISTRY[name] = Query(
            name=name,
            fn=shipped_fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            rows_only=rows_only,
        )
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_map() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


# Exactness bound for the integer-grid mean folds below: the double
# divisions are exact-decidable only while numerator 2*mul*|s| + n*r
# stays under 2^52 (exact double with an ulp margin below the 1/(2nr)
# gap to the nearest integer). Every catalog site holds through sf0.1
# with orders of magnitude to spare, but the precondition was previously
# documentation-only: money-scale sites (q09's cents over l_extendedprice
# reach ~4e14 at sf0.1) would cross it near sf1 and silently round one
# ulp wrong -- exactly the failure class these helpers exist to remove
# (r11 ADVICE). The guard rides inside the returned expression (an
# assert_true over the same aggregates -- no extra pass, no extra job)
# so an out-of-range site fails LOUDLY with this message instead.
GRID_EXACT_BOUND = 2**52


def _grid_guard(q, s, numer):
    """Gate the grid-mean quotient ``q`` on ``numer < 2^52``; NULL sums
    (empty / all-NULL groups) pass through to ``q``'s own NULL result.
    ``numer`` MUST be built in DOUBLE arithmetic (callers cast the sum
    to double before scaling): the r13 bigmoney hostile variant showed a
    LONG-built numerator overflowing at 2*mul*|s| > 2^63 and raising
    ANSI ARITHMETIC_OVERFLOW from the guard's own expression before this
    comparison ever ran -- loud, but the wrong diagnostic. In double the
    comparison saturates instead of overflowing, and rounding error near
    the 2^52 boundary is immaterial against its engineering margin. The
    quotient ``q`` itself stays in exact long arithmetic and is only
    evaluated when the guard passes (conditional branch), so it can
    never overflow."""
    from pyspark.sql import functions as F

    ok = s.isNull() | (numer.cast("double") < F.lit(float(GRID_EXACT_BOUND)))
    return F.when(
        F.assert_true(
            ok,
            F.lit(
                "grid_mean exactness bound 2^52 exceeded: split groups or "
                "widen the output grid (catalog.GRID_EXACT_BOUND)"
            ),
        ).isNull(),
        q,
    )


def money_sum_spark(col: str):
    """Exact sum of a 2dp money column: BIGINT cents sum + ONE division
    (a single correctly-rounded IEEE op -- bit-identical on every engine
    at any magnitude). Replaces round(sum(col), 2), whose double sum runs
    in engine partial-agg order: the r13 dupx sweep flipped q04's revenue
    cents between engines at x10 multiplicity, and at 100 TB group sizes
    a half-cent engine-ulp flip is the r10 money-mean class applied to
    sums. Off-scale input fails loudly at the cents cast (Spark ANSI; in
    DuckDB the BIGINT sum itself promotes to HUGEINT, so only the cast
    guards -- the asymmetry is documented in SCALING.md r13)."""
    from pyspark.sql import functions as F

    return F.sum(F.round(F.col(col) * 100).cast("long")) / F.lit(1e2)


def money_sum_sql(col: str) -> str:
    """DuckDB twin of :func:`money_sum_spark`."""
    return f"(sum(CAST(round({col} * 100) AS BIGINT)) / 1e2)"


def disc_money_sum_spark(price: str = "l_extendedprice", disc: str = "l_discount"):
    """sum(price * (1 - disc)) rounded to cents with exact arithmetic:
    the product of a 2dp price and a 2dp discount lies on the 1e-4 grid
    (recovered exactly per row -- both engines compute the identical
    IEEE product, so the rounded 1e-4 integer matches bit-for-bit), the
    BIGINT grid sum is order-independent, and the final cents rounding
    is the money_mean integer half-away construct, 2^52-guarded."""
    from pyspark.sql import functions as F

    x = F.col(price) * (1 - F.col(disc))
    s = F.sum(F.round(x * 10000).cast("long"))
    # INTEGER division (div), not a double floor-divide: exact for any
    # long numerator, so no 2^52 guard is needed -- the only failure mode
    # left is LONG overflow at 2|s| ~ 9.2e18 (4.6e14 money units per
    # group), which ANSI raises loudly. The dupx10 sweep showed q04's
    # x1000 fanout crossing 2^52 while still far inside long range.
    q = F.when(
        s >= 0, F.call_function("div", 2 * s + 100, F.lit(200))
    ).otherwise(-F.call_function("div", -2 * s + 100, F.lit(200)))
    return q / F.lit(1e2)


def disc_money_sum_sql(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    """DuckDB twin of :func:`disc_money_sum_spark`."""
    s = f"sum(CAST(round(({price} * (1 - {disc})) * 10000) AS BIGINT))"
    # // = integer division on DuckDB's HUGEINT sum: exact at any scale
    return (
        f"(CASE WHEN {s} >= 0 THEN ((2 * {s} + 100) // 200)"
        f" ELSE -(((-2 * {s}) + 100) // 200) END / 1e2)"
    )


def money_mean_spark(col: str):
    """Group mean of a 2dp money column, rounded to the cent with PURE
    INTEGER arithmetic -- engine-independent by construction.

    round(avg(x), 2) is unsafe twice over for money doubles: (a) avg()
    sums in each engine's own order, so group means one ulp apart round
    differently, and (b) even with bit-identical quotients, Spark's
    round (Java HALF_UP on the double's exact decimal expansion) and
    DuckDB's round disagree when the TRUE mean lands exactly on a
    half-cent (sum_cents odd * n even -- common in small groups; both
    observed under drift variants). Instead: exact integer cents sum,
    then half-away-from-zero integer rounding q = floor((2|s| + n) /
    (2n)) (the double divisions are exact-decidable here: numerators
    < 2^53 and any non-integer quotient is >= 1/(2n) away from an
    integer, far beyond one ulp), and one final division by 100 --
    identical bits on both engines, no double round() anywhere."""
    from pyspark.sql import functions as F

    s = F.sum(F.round(F.col(col) * 100).cast("long"))
    n = F.count(F.lit(1))
    q = F.when(s >= 0, F.floor((2 * s + n) / (2 * n))).otherwise(
        -F.floor((-2 * s + n) / (2 * n))
    )
    # guard numerator in DOUBLE: long arithmetic here can itself overflow
    # on a >2^61 cents sum, raising the wrong error (see _grid_guard)
    return _grid_guard(q, s, 2 * F.abs(s).cast("double") + n) / F.lit(1e2)


def money_mean_sql(col: str) -> str:
    """DuckDB twin of ``money_mean_spark`` -- the identical integer
    half-away-from-zero cents mean, for oracle SQL strings."""
    s = f"sum(CAST(round({col} * 100) AS BIGINT))"
    return (
        f"(CASE WHEN {s} >= 0"
        f" THEN floor((2 * {s} + count(*)) / (2e0 * count(*)))"
        f" ELSE -floor((-2 * {s} + count(*)) / (2e0 * count(*)))"
        f" END / 1e2)"
    )


def _grid_terms(in_scale: int, out_dp: int) -> tuple[int, int]:
    """Reduce the grid-mean rounding to small integer factors.

    With s = sum(col * in_scale) (exact longs) and non-null count n, the
    mean rounded half-away-from-zero to out_dp decimals is k / 10^out_dp
    where, writing m = 10^out_dp:
      * in_scale % m == 0 (input grid finer):  r = in_scale // m,
        k = floor((2s + n*r) / (2*n*r))
      * m % in_scale == 0 (input grid coarser): t = m // in_scale,
        k = floor((2*t*s + n) / (2*n))
    Returned as (mul, r): numerator 2*mul*s + n*r over denominator 2*n*r.
    Exactness needs 2*mul*|s| + n*r < 2^52 (exact double representation
    with an ulp margin below the 1/(2nr) gap to the nearest integer) --
    holds for every catalog site through sf0.1 with orders of magnitude
    to spare; at extreme scales split groups or widen the grid."""
    m = 10**out_dp
    if in_scale % m == 0:
        return 1, in_scale // m
    if m % in_scale == 0:
        return m // in_scale, 1
    raise ValueError(f"grid_mean needs in_scale {in_scale} | 10^{out_dp} or vice versa")


def grid_mean_spark(col, in_scale: int, out_dp: int):
    """Group mean of a column whose values lie EXACTLY on the 1/in_scale
    grid (integers: 1; 2dp money: 100; k-dp-rounded reals: 10^k;
    fifths: 5), rounded half-away-from-zero to ``out_dp`` decimals with
    PURE INTEGER arithmetic -- ``money_mean_spark`` generalized.

    Why (r11): a fresh-salt drift sweep caught t14's
    round(avg(6dp-grid values), 6) landing one ulp either side of an
    exact half-microunit -- the same two failure modes the money means
    hit in r10 (engine-order double sums, then the two engines' round()
    disagreeing on exact halves). For grid-aligned inputs the TRUE mean
    is rational with denominator n*in_scale, so exact halves occur at
    ~1/n probability per group -- a certainty over enough rounds. The
    round(col * in_scale) re-integerization is safe because stored
    doubles sit within ~ulp of their grid point, never near .5; NULLs
    follow avg() semantics via the non-null count."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    mul, r = _grid_terms(in_scale, out_dp)
    s = F.sum(F.round(c * in_scale).cast("long"))
    n = F.count(c)
    q = F.when(s >= 0, F.floor((2 * mul * s + n * r) / (2 * n * r))).otherwise(
        -F.floor((2 * mul * -s + n * r) / (2 * n * r))
    )
    # guard numerator in DOUBLE (2*mul*|s| overflows LONG on a bigmoney-
    # scale sum before the bound compare -- see _grid_guard)
    return _grid_guard(
        q, s, 2 * mul * F.abs(s).cast("double") + n * r
    ) / F.lit(float(10**out_dp))


def grid_mean_sql(col: str, in_scale: int, out_dp: int) -> str:
    """DuckDB twin of ``grid_mean_spark`` (identical integer arithmetic,
    e-notation divisor so the division runs in DOUBLE, not DECIMAL)."""
    mul, r = _grid_terms(in_scale, out_dp)
    s = f"sum(CAST(round(({col}) * {in_scale}) AS BIGINT))"
    n = f"count({col})"
    return (
        f"(CASE WHEN {s} >= 0"
        f" THEN floor((2 * {mul} * {s} + {n} * {r}) / (2e0 * {n} * {r}))"
        f" ELSE -floor((2 * {mul} * -{s} + {n} * {r}) / (2e0 * {n} * {r}))"
        f" END / 1e{out_dp})"
    )


def try_json_k_sql(col: str = "props", typ: str = "BIGINT") -> str:
    """DuckDB twin of Spark's ``try_variant_get(try_parse_json(col),
    '$.k', typ)`` -- the engine-wide malformed-JSON policy (r15 jsonx
    axis): anything VARIANT refuses (truncated, non-JSON, empty, lone
    surrogate, DUPLICATE KEYS) and any non-object/absent-k payload yields
    NULL. DuckDB's json_extract RAISES on malformed input and keeps the
    FIRST duplicate key (Spark VARIANT rejects the object), so the guard
    must check json_valid AND key uniqueness before extracting; the
    boundary is string-typed extraction of lone surrogates (Spark
    sanitizes to '?', DuckDB calls the document invalid), which no
    catalog query does -- every consumer casts k to an integer type,
    where both sides agree on NULL. Verified class-by-class in
    tests/test_data_drift.py::test_jsonx_k_extraction_semantics_matrix.
    """
    keys = f"json_keys({col})"
    return (
        f"(CASE WHEN json_valid({col}) AND len({keys}) = len(list_distinct({keys}))"
        f" THEN TRY_CAST(json_extract_string({col}, '$.k') AS {typ}) END)"
    )


def shingle_rows_sql(src: str, n: int, keys: str, tok: str = "t", out: str = "shw") -> str:
    """DuckDB CTE fragment emitting per-row word n-gram shingle ROWS
    (``_rid``, *keys*, ``g``) via lead() windows -- LINEAR in document
    length. Replaces the ``[array_to_string(t[i:i+k], ' ') for i in
    range(...)]`` slice comprehension, which DuckDB evaluates
    QUADRATICALLY in doc length (r14 longstr: 9.9 s -> 46 s for 20k ->
    40k tokens; whole oracles stalled on 1 MiB docs).

    ``src`` must expose ``_rid`` (a unique per-PHYSICAL-ROW id, from a
    MATERIALIZED ``row_number() OVER ()`` CTE so it is evaluated once --
    the t14 device), the pass-through ``keys`` columns, and a token-list
    column ``tok``. The window partitions on ``_rid``, never on doc_id:
    under exact-duplicate doc rows (the r13 dupx variant) a doc_id
    partition would interleave the copies' positions and build windows
    ACROSS row boundaries. Documents shorter than ``n`` tokens yield one
    whole-text shingle, matching functions.text.shingles. Shingle order
    within a row is NOT guaranteed; consumers must be order-invariant
    (set/list_distinct/count shapes -- all current callers are)."""
    lead_g = " || ' ' || ".join(
        ["_w"] + [f"lead(_w, {k}) OVER pw" for k in range(1, n)]
    )
    return f"""{out}_pos AS (
  SELECT _rid, {keys}, len({tok}) AS _n,
         generate_subscripts({tok}, 1) AS _i, unnest({tok}) AS _w
  FROM {src}
), {out} AS (
  SELECT _rid, {keys}, g FROM (
    SELECT _rid, {keys}, _i, _n, {lead_g} AS g
    FROM {out}_pos
    WINDOW pw AS (PARTITION BY _rid ORDER BY _i)
  ) WHERE _i + {n - 1} <= _n
  UNION ALL
  SELECT _rid, {keys}, array_to_string({tok}, ' ') AS g
  FROM {src} WHERE len({tok}) < {n}
)"""
