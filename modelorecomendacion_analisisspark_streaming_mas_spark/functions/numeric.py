"""Exact numeric folds shared by batch plans and streaming helpers.

The events.value telemetry column ships on a 2-decimal grid (verified
off-grid residual < 4e-12 at every SF), which makes its sums money-like:
``round(sum(value), 2)`` is a DOUBLE sum in engine partial-aggregation
order, and the r13 ``extremes`` hostile variant showed exactly how that
degrades -- catastrophic absorption (1e308 + 71.54 - 1e308 = 0 in one
order, 71.54 in another) and order-dependent overflow (two 1e308s meet
before a -1e308 cancels -> inf on one engine, finite on the other).
Even on well-behaved data the double sum can land a half-cent on an
engine-dependent ulp (the r10 money-mean lesson applied to sums).

``cents_sum`` is the canonical replacement: an exact BIGINT cents sum
(order-independent in any grouping) followed by ONE division -- a single
correctly-rounded IEEE operation, bit-identical on every engine at any
magnitude. Off-scale inputs (1e308, inf, NaN) fail LOUDLY in BOTH
engines at the cents cast (Spark ANSI CAST_OVERFLOW / DuckDB conversion
error) instead of silently absorbing -- the repo's counted-limit idiom.
Headroom: BIGINT cents hold group sums to 9.2e16 value-units, far past
any 100 TB group over this domain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents_sum_spark(col: str = "value") -> Column:
    """Exact sum of a 2dp-grid double column; see module docstring.
    NULL-only / empty groups yield NULL, matching sum() semantics."""
    return F.sum(F.round(F.col(col) * 100).cast("long")) / F.lit(1e2)


def cents_sum_sql(col: str = "value") -> str:
    """DuckDB twin of :func:`cents_sum_spark` for oracle SQL strings."""
    return f"(sum(CAST(round({col} * 100) AS BIGINT)) / 1e2)"
