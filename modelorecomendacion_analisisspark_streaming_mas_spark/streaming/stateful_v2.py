"""Spark 4 ``transformWithStateInPandas`` operators -- the successor API to
``applyInPandasWithState`` (stateful.py): typed named state variables
(ValueState/ListState/MapState), timers, TTL, and composable processors
instead of a single opaque state tuple.

RUNTIME GATE: transformWithStateInPandas drives its state server over
protobuf in BOTH the driver and the Python workers. Environments without
a protobuf wheel resolve it through compat/protobuf_shim.py (driver-side
redirect finder + addPyFile'd worker alias zip over the host's vendored
pure-python runtime); plans/stateful_probe.py registers the s10 catalog
entry iff some runtime (native or vendored) resolves, and
tests/test_streaming.py asserts the probe matches reality in both
directions. On a real cluster (protobuf ships with standard Spark
distros' Python env) this module works as-is with mode 'native'.

The exemplar mirrors s06's streaming group counts through the NEW API so
both stateful surfaces are exercised against the same oracle shape: per
``event_type``, a running (count, sum(value)) pair held in a ValueState.
Emissions are monotone in ``n_events`` (state only grows), so the
``max_by(n_events)`` reduction at the sink stays exact under any
micro-batch split -- the same idempotent-reducible emission discipline
stateful.py uses.

Scale notes: state is one (long, double) tuple per key in the state store;
parallelism = shuffle partitions at query start (pinned in the checkpoint,
see run_to_memory_sink). TTL (ttlDurationMs) and timers are available on
the same handle for eviction at 100 TB key cardinality -- not used here
because the oracle needs full retention.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = "event_type string, n_events bigint, sum_value double"


class RunningCountSum(StatefulProcessor):
    """Per-key running count + sum held in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n bigint, total double")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    def close(self) -> None:
        pass


def running_count_sum_per_type(stream: DataFrame) -> DataFrame:
    """Streaming per-``event_type`` (count, sum(value)) via
    transformWithStateInPandas in update mode. Latest row per key (max
    ``n_events``) equals the batch groupBy aggregate over everything
    consumed so far."""
    return stream.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningCountSum(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
