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

Scale notes: state is O(1) per key (5 scalars), Arrow-batched per group;
shuffle partitions size the state-store parallelism just like any other
stateful operator. Rows within a micro-batch are sorted inside the UDF;
cross-batch ordering is the source's append order (file replay stages one
batch; on Kafka, per-partition order with keyed partitioning gives the
same guarantee).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, best_run bigint, best_type string, n_events bigint"
STATE_SCHEMA = "last_type string, cur_run bigint, best_run bigint, best_type string, n_events bigint"


def _longest_run_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_type, cur_run, best_run, best_type, n_events = state.get
    else:
        last_type, cur_run, best_run, best_type, n_events = None, 0, 0, None, 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    # Deterministic event order: event time, unique id as tiebreak.
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    for et in rows["event_type"]:
        if et == last_type:
            cur_run += 1
        else:
            last_type, cur_run = et, 1
        # Strict > : ties keep the EARLIEST island (pinned by the oracle).
        if cur_run > best_run:
            best_run, best_type = cur_run, et
        n_events += 1
    state.update((last_type, cur_run, best_run, best_type, n_events))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "best_run": [best_run],
            "best_type": [best_type],
            "n_events": [n_events],
        }
    )


def longest_run_per_user(stream: DataFrame) -> DataFrame:
    """Per-user longest consecutive same-``event_type`` run, maintained as
    custom streaming state. Emits one updated row per user per micro-batch;
    ``n_events`` strictly increases per emission, so the latest row per user
    is the one with max ``n_events``."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _longest_run_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
