"""Streaming trigger metrics (T8).

The reference hand-times each foreachBatch callback with
``time.perf_counter`` and appends to a CSV
(apps_mediciones/live_counts_metrics.py:72-83). The idiomatic equivalent is
a StreamingQueryListener fed by Spark's own per-trigger progress events --
zero instrumentation inside the hot path, and the same mean/median stats
BASELINE.md records (Explorativa/Explorativa2.ipynb cells 6/9).
"""

from __future__ import annotations

import csv
import statistics
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class TriggerMetricsListener(StreamingQueryListener):
    """Collects per-trigger (epoch, rows, duration_ms, timestamp) like the
    reference's metrics CSVs (apps_mediciones/metrics_append.csv:1)."""

    def __init__(self) -> None:
        self.rows: list[dict[str, Any]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.rows.append(
            {
                "epoch_id": p.batchId,
                "count": p.numInputRows,
                "duration_ms": p.batchDuration,
                "timestamp": p.timestamp,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- the same stats the reference computes (mean + exact median) -------

    def summary(self, skip_first: int = 0) -> dict[str, float]:
        """Mean + exact median over non-empty triggers, optionally skipping
        the first ``skip_first`` (query-startup transients: state-store
        open, first-trigger codegen). The reference's means amortize those
        over 600+ triggers; a short measured window must drop them
        explicitly to measure the same steady state."""
        durations = [r["duration_ms"] for r in self.rows if r["count"] > 0]
        if len(durations) > 2 * skip_first:
            durations = durations[skip_first:]
        if not durations:
            return {"triggers": 0, "mean_ms": 0.0, "median_ms": 0.0}
        return {
            "triggers": len(durations),
            "mean_ms": round(statistics.fmean(durations), 2),
            "median_ms": round(statistics.median(durations), 2),
        }

    def to_csv(self, path: str) -> None:
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["epoch_id", "count", "duration_ms", "timestamp"])
            w.writeheader()
            w.writerows(self.rows)
