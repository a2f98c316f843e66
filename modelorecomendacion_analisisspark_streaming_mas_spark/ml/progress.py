"""M7: job-progress monitoring during long model fits.

The reference polls the Spark monitoring REST API
``/api/v1/applications/{id}/jobs`` from the driver while ``als.fit`` runs
(Modelo/Crear modelo.ipynb cells 9-10) to watch training progress. This is
the same surface: ``RestJobPoller`` samples the live application's job list
on an interval from a background thread, against the standard monitoring
API of whatever cluster the session runs on (local UI at
``sparkContext.uiWebUrl``; on a cluster the same path on the driver UI /
history server).

Requires ``spark.ui.enabled=true`` (the repo session factory gates it on
``SPARK_UI_ENABLED`` because the UI server costs ~200ms of session startup
in tests); the poller refuses loudly when the UI is off rather than
returning an empty sample list that looks like "no jobs ran".
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request


class RestJobPoller:
    """Background REST sampler of the application's job states.

    Usage::

        with RestJobPoller(spark) as poller:
            model = als.fit(ratings)
        assert poller.samples  # per-poll job lists, reference cell 10 shape
    """

    def __init__(self, spark, interval_s: float = 0.25) -> None:
        sc = spark.sparkContext
        ui = sc.uiWebUrl
        if not ui:
            raise RuntimeError(
                "Spark UI is disabled (spark.ui.enabled=false); the REST "
                "jobs API needs it -- set SPARK_UI_ENABLED=true for the "
                "repo session factory."
            )
        self._url = f"{ui}/api/v1/applications/{sc.applicationId}/jobs"
        self._interval = interval_s
        self.samples: list[dict] = []
        self.errors = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                with urllib.request.urlopen(self._url, timeout=2) as r:
                    jobs = json.load(r)
                self.samples.append(
                    {
                        "ts": time.time(),
                        "n_jobs": len(jobs),
                        "running": [
                            j["jobId"] for j in jobs if j.get("status") == "RUNNING"
                        ],
                        "jobs": jobs,
                    }
                )
            except Exception:
                # transient: UI not yet serving / between job submissions;
                # counted so a dead endpoint is visible, never silent
                self.errors += 1
            self._stop.wait(self._interval)

    def __enter__(self) -> "RestJobPoller":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    def running_samples(self) -> list[dict]:
        """Samples that caught >=1 job mid-flight (what the reference's
        progress cell prints)."""
        return [s for s in self.samples if s["running"]]
