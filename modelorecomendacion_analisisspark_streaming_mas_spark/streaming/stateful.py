"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY section 2.9 "not present" row: the reference has no
mapGroupsWithState-class surface at all; its only per-key state is what
the driver-side pandas recomputes per poll, app3/live_counts.py:72-80).

The exemplar operator is gaps-and-islands sessionless run-length tracking:
per user, the longest consecutive run of identical ``event_type`` in event
order -- an inherently ORDER-dependent stateful computation that no
streaming ``groupBy`` aggregate can express (count/sum/min/max are all
order-insensitive), which is exactly when the custom-state escape hatch is
warranted.

ORDERING CONTRACT: rows are sorted by (ts, event_id) *within* each
micro-batch, but runs are stitched across batches in arrival order --
correct only when the source delivers each user's events in non-decreasing
ts across batch boundaries (single-batch availableNow replay, or a source
keyed by user such as Kafka with user_id partitioning). The operator
cannot re-order history it has already folded into state, so instead of
silently mis-counting it DETECTS violations: state carries the max event
time seen, and every event arriving below it increments the emitted
``ooo_events`` column. ``ooo_events == 0`` certifies the run counts;
``> 0`` means the cross-batch precondition was broken and downstream
should treat ``best_run`` as approximate (or re-run in batch).

Scale notes: state is O(1) per key (7 scalars), Arrow-batched per group;
shuffle partitions size the state-store parallelism just like any other
stateful operator.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, best_run bigint, best_type string, n_events bigint, ooo_events bigint"
)
STATE_SCHEMA = (
    "last_type string, cur_run bigint, best_run bigint, best_type string, "
    "n_events bigint, last_ts_us bigint, ooo_events bigint"
)


def _ts_micros(ts: pd.Series) -> pd.Series:
    """Event time as int64 epoch-micros regardless of arrow/pandas dtype.

    Normalizes through datetime64[us] explicitly: under pandas 2.x /
    Arrow the series can arrive as ns, us, or ms resolution, and a blind
    ``// 1000`` would be wrong for everything but ns (and the
    cross-batch ooo comparison only works if every batch lands on the
    same unit)."""
    if pd.api.types.is_datetime64_any_dtype(ts):
        return ts.astype("datetime64[us]").astype("int64")
    return ts.astype("int64")


def _longest_run_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_type, cur_run, best_run, best_type, n_events, last_ts_us, ooo = state.get
    else:
        last_type, cur_run, best_run, best_type, n_events, last_ts_us, ooo = (
            None, 0, 0, None, 0, None, 0,
        )
    rows = pd.concat(list(pdfs), ignore_index=True)
    # Deterministic event order: event time, unique id as tiebreak.
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    ts_us = _ts_micros(rows["ts"])
    if last_ts_us is not None and len(ts_us):
        # Events below the high-water mark arrived across a batch boundary
        # out of order -- state can't rewind, so count the violation.
        ooo += int((ts_us < last_ts_us).sum())
    if len(ts_us):
        hi = int(ts_us.max())
        last_ts_us = hi if last_ts_us is None else max(last_ts_us, hi)
    for et in rows["event_type"]:
        if et == last_type:
            cur_run += 1
        else:
            last_type, cur_run = et, 1
        # Strict > : ties keep the EARLIEST island (pinned by the oracle).
        if cur_run > best_run:
            best_run, best_type = cur_run, et
        n_events += 1
    state.update((last_type, cur_run, best_run, best_type, n_events, last_ts_us, ooo))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "best_run": [best_run],
            "best_type": [best_type],
            "n_events": [n_events],
            "ooo_events": [ooo],
        }
    )


def longest_run_per_user(stream: DataFrame) -> DataFrame:
    """Per-user longest consecutive same-``event_type`` run, maintained as
    custom streaming state. Emits one updated row per user per micro-batch;
    ``n_events`` strictly increases per emission, so the latest row per user
    is the one with max ``n_events``. ``ooo_events`` counts cross-batch
    event-time order violations (see module docstring) -- 0 certifies the
    run counts are exact.

    NULL user_id rows are excluded: no identity, no per-user state row
    (the rule every user-keyed stateful operator in this repo applies; a
    NULL key also floats the Arrow id column, silently changing emission
    dtypes -- r14 nullkeys find)."""
    from pyspark.sql import functions as F

    stream = stream.filter(F.col("user_id").isNotNull())
    # project BEFORE the Python boundary: the handler reads only (ts,
    # event_id, event_type); an opaque applyInPandasWithState over the
    # full row would ship value and the props MAP through Arrow per
    # batch and defeat scan pruning upstream (guide section 4 -- the
    # same fix as stateful_v2.running_count_sum_per_type, r16)
    stream = stream.select("user_id", "ts", "event_id", "event_type")
    return stream.groupBy("user_id").applyInPandasWithState(
        _longest_run_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
