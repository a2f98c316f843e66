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
magnitude.

**Value-validity window (r15 nullx axis).** Real telemetry carries
garbage readings -- inf, NaN, absurd magnitudes -- and a pipeline that
dies on the first one is not production-grade, while any attempt to SUM
them is order-dependent by IEEE construction (the absorption example
above: no deterministic answer exists). So, exactly like the event-TIME
validity window the watermark family applies (pipelines.
bounded_event_time, r14 timex), value sums apply a VALUE validity
window: a reading is valid iff it is finite and |v| <= VALUE_VALID_MAX
(1e12 -- a 2dp-grid telemetry reading beyond a trillion is sensor
garbage, and the bound keeps every row's cents exactly representable
with 4 decimal orders of group-sum headroom: BIGINT cents hold group
sums to 9.2e16 value-units). Invalid readings are quarantined from the
SUM; row COUNTS still count them. Both engines express the same window,
so they stay hash-identical on hostile data instead of identically
dead. MONEY columns are different: silent exclusion of money is
disqualifying, so the money devices (catalog.money_sum / grid-mean
grid_guard) keep the fail-loud contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A 2dp telemetry reading beyond this magnitude is sensor garbage:
# quarantined from sums (counts unaffected), deterministically, in both
# engines. 1e12 * 100 cents = 1e14 per row -- BIGINT group sums keep
# ~9.2e4x headroom even if every row sits at the bound.
VALUE_VALID_MAX = 1e12


def valid_value_spark(col: str = "value") -> Column:
    """True iff the reading is inside the value-validity window (finite
    and |v| <= VALUE_VALID_MAX). NULL stays NULL (sum already skips it)."""
    c = F.col(col)
    # NaN fails both comparisons; +/-inf fails the abs bound -- no
    # separate isnan/isinf needed, and NULL propagates as NULL.
    return F.abs(c) <= F.lit(VALUE_VALID_MAX)


def valid_value_sql(col: str = "value") -> str:
    """DuckDB twin of :func:`valid_value_spark`."""
    # abs(NaN) <= bound is false in DuckDB? NO -- DuckDB treats NaN as
    # GREATER than everything in comparisons, so abs(NaN) <= 1e12 is
    # false, matching Spark's NaN-fails-comparison semantics here.
    return f"(abs({col}) <= {VALUE_VALID_MAX!r})"


def valid_cents_spark(col: str = "value") -> Column:
    """Per-row guarded exact-cents term for custom aggregations that keep
    LONG cents in flight (e.g. streaming incremental rollups that merge
    cents across micro-batches): NULL outside the validity window, exact
    cents inside it."""
    c = F.col(col)
    return F.when(valid_value_spark(col), F.round(c * 100).cast("long"))


def cents_sum_spark(col: str = "value") -> Column:
    """Exact sum of the VALID readings of a 2dp-grid double column; see
    module docstring. Groups with no valid reading yield NULL, matching
    sum() semantics in both engines."""
    c = F.col(col)
    return (
        F.sum(F.when(valid_value_spark(col), F.round(c * 100).cast("long")))
        / F.lit(1e2)
    )


def cents_sum_sql(col: str = "value") -> str:
    """DuckDB twin of :func:`cents_sum_spark` for oracle SQL strings.
    The per-row CASE keeps the cents cast off invalid rows (DuckDB
    evaluates aggregate inputs over every row of the group)."""
    return (
        f"(sum(CASE WHEN {valid_value_sql(col)} "
        f"THEN CAST(round({col} * 100) AS BIGINT) END) / 1e2)"
    )
