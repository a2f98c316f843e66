"""Scalar expression library (SURVEY.md sections 2.2-2.3: P1-P9, F1-F7, U1).

Everything here is a pure Column expression built from
``pyspark.sql.functions`` -- JVM-side, whole-stage-codegen friendly; no
row-at-a-time Python UDFs (the reference's one scalar UDF, the zip->state
range lookup at Explorativa/Explorativa1_pyspark.ipynb:268-280, is
re-expressed as a broadcast range join in :func:`range_lookup_join`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_year_from_title(col: Column | str) -> Column:
    """F1: year from a ``Title (YYYY)`` string
    (Explorativa/Explorativa1_pyspark.ipynb:91)."""
    return F.regexp_extract(col, r"\((\d{4})\)", 1).cast("int")


def strip_title_year(col: Column | str) -> Column:
    """F2: drop the trailing `` (YYYY)`` from a title
    (Explorativa/Explorativa1_pyspark.ipynb:92)."""
    return F.regexp_replace(col, r"\s*\(\d{4}\)\s*$", "")


def split_to_array(col: Column | str, sep: str = r"\|") -> Column:
    """F3+F6: split a delimited string to an array and drop empties
    (Explorativa/Explorativa1_pyspark.ipynb:93-94)."""
    return F.filter(F.split(col, sep), lambda x: x != F.lit(""))


def epoch_to_ddmmyyyy(col: Column | str) -> Column:
    """F4: unix seconds -> ``dd/MM/yyyy`` string
    (Explorativa/Explorativa1_pyspark.ipynb:360)."""
    return F.date_format(F.from_unixtime(col), "dd/MM/yyyy")


def ts_to_ddmmyyyy(col: Column | str) -> Column:
    """F4 on a native timestamp column."""
    return F.date_format(col, "dd/MM/yyyy")


def when_chain(col: Column, bins: Sequence[tuple[float | None, float | None, str]], otherwise: str | None = None) -> Column:
    """P4/P5: programmatic CASE WHEN bucketing, the generalized form of the
    age-bin chains at app3/live_counts.py:52-61 and the age-code mapping at
    Explorativa/Explorativa1_pyspark.ipynb:258-266.

    ``bins`` are ``(low, high, label)`` half-open ranges ``[low, high)``;
    ``None`` means unbounded on that side. Chained ``F.when`` stays inside
    codegen -- constant-folded by Catalyst.
    """
    expr: Column | None = None
    for low, high, label in bins:
        cond = None
        if low is not None:
            cond = col >= F.lit(low)
        if high is not None:
            c2 = col < F.lit(high)
            cond = c2 if cond is None else (cond & c2)
        if cond is None:
            cond = F.lit(True)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None, "need at least one bin"
    return expr.otherwise(otherwise) if otherwise is not None else expr


def bucketize(col: Column, bins: Sequence[tuple[float | None, float | None, str]], otherwise: str = "other") -> Column:
    """Convenience alias used by the query catalog."""
    return when_chain(col, bins, otherwise=otherwise)


def map_lookup(mapping: dict, key_col: Column | str) -> Column:
    """P6: literal-map lookup, ``F.create_map`` + ``element_at``
    (Explorativa/Explorativa1_pyspark.ipynb:252-256,283).

    Correct idiom for tiny driver-known code->label maps (occupation codes).
    For anything that grows with data, use a broadcast dim join instead.
    """
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.element_at(F.create_map(*pairs), F.col(key_col) if isinstance(key_col, str) else key_col)


# A map LITERAL is baked into the plan and shipped inside every task
# binary; past a few thousand entries a broadcast-hash join is strictly
# better (one broadcast, hashed probe, no plan bloat).
MAP_LITERAL_ROW_LIMIT = 10_000


def collect_lookup_map(
    df: DataFrame, key_col: str, value_col: str, max_rows: int = MAP_LITERAL_ROW_LIMIT
) -> dict:
    """Collect a dim table into a driver dict for ``map_lookup`` -- with the
    collect ENFORCED small, not assumed small (the same bounded limit+1
    probe as similarity.cosine_near_dup_matmul: never a full count of an
    unbounded frame). A dim that outgrew map-literal territory fails
    loudly toward the broadcast join instead of bloating every serialized
    task (or OOMing the driver) at 100 TB.
    """
    probe = df.select(key_col).limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"collect_lookup_map: dim exceeds {max_rows} rows; a map "
            f"literal ships with every task binary at that size. Use a "
            f"broadcast join instead: df.join(F.broadcast(dim), key)."
        )
    return {r[0]: r[1] for r in df.select(key_col, value_col).collect()}


def range_lookup_join(
    df: DataFrame,
    key_col: str,
    ranges: DataFrame,
    low_col: str,
    high_col: str,
    value_col: str,
    out_col: str,
    default: str | None = None,
    high_exclusive: bool = False,
) -> DataFrame:
    """U1 re-expressed: the reference's ``zip_to_state`` Python UDF
    (Explorativa/Explorativa1_pyspark.ipynb:268-287) scans 58 (low, high,
    state) ranges per row in Python. Here: broadcast the range table and do
    a non-equi theta join -- JVM-side, no Python in the hot path; at 100 TB
    this is a broadcast nested-loop over a 58-row build side, i.e. free.

    Rows matching no range get ``default`` (reference fills ``'Other'``).
    """
    b = F.broadcast(ranges.select(low_col, high_col, value_col))
    upper = (
        F.col(key_col) < F.col(high_col)
        if high_exclusive
        else F.col(key_col) <= F.col(high_col)
    )
    cond = (F.col(key_col) >= F.col(low_col)) & upper
    joined = df.join(b, cond, "left").drop(low_col, high_col)
    out = joined.withColumnRenamed(value_col, out_col)
    if default is not None:
        out = out.na.fill({out_col: default})
    return out
