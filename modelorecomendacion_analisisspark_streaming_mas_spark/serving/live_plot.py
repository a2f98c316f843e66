"""Live consumer of the streaming aggregate (app/plot_live.py analog).

The reference polls the ``demo_agg`` memory-sink table once a second and
redraws a matplotlib line (app/plot_live.py:15-26). Same loop here, split
from presentation: ``LiveCountsPoller`` polls a source -- either the
serving app's ``GET /counts`` endpoint or any callable returning rows --
and hands each non-empty snapshot to a pluggable ``render`` callback.
``ascii_bar_render`` is the built-in renderer (this container has no
matplotlib; a matplotlib consumer is the same callback shape:
``lambda rows: line.set_data(...)``).
"""

from __future__ import annotations

import json
import threading
import urllib.request
from typing import Callable, Sequence


def http_counts_fetch(base_url: str) -> Callable[[], list[dict]]:
    """Fetch callable over the serving app's /counts contract."""

    def fetch() -> list[dict]:
        with urllib.request.urlopen(f"{base_url}/counts", timeout=5) as r:
            return json.load(r)["counts"]

    return fetch


def ascii_bar_render(
    rows: Sequence[dict],
    label_key: str,
    value_key: str,
    width: int = 40,
    out: Callable[[str], None] = print,
) -> None:
    """Terminal bar chart of one snapshot (the plot surface without a
    display server)."""
    if not rows:
        return
    top = max(float(r[value_key]) for r in rows) or 1.0
    labels = [str(r[label_key]) for r in rows]
    pad = max(len(s) for s in labels)
    for r in rows:
        n = int(width * float(r[value_key]) / top)
        out(f"{str(r[label_key]):>{pad}} | {'#' * n} {r[value_key]}")


def matplotlib_bar_render(
    label_key: str, value_key: str, title: str = "live counts"
) -> Callable[[Sequence[dict]], None]:
    """The reference's presentation surface (app/plot_live.py:15-26):
    an interactive matplotlib figure redrawn per snapshot. Import-gated
    the same way as every optional dep in this repo -- raises ImportError
    where matplotlib is absent (this container), and the ASCII renderer
    remains the built-in. Returned callback has the same shape as
    ascii_bar_render, so swapping presentation is one argument."""
    import matplotlib.pyplot as plt  # gated: not in this container

    plt.ion()
    fig, ax = plt.subplots()
    fig.suptitle(title)

    def render(rows: Sequence[dict]) -> None:
        ax.clear()
        labels = [str(r[label_key]) for r in rows]
        values = [float(r[value_key]) for r in rows]
        ax.bar(labels, values)
        fig.canvas.draw_idle()
        plt.pause(0.001)

    return render


def png_bar_render(
    label_key: str,
    value_key: str,
    path: str,
    width: int = 320,
    height: int = 200,
) -> Callable[[Sequence[dict]], None]:
    """A REAL image presentation surface without matplotlib: rasterize
    each snapshot as a grayscale bar chart (pure numpy) and encode it
    with the in-house stdlib PNG encoder (functions/codecs_stdlib.py).
    The file is replaced atomically per snapshot, so a browser/file
    watcher pointed at ``path`` sees the same live-updating figure the
    reference gets from plt.ion (app/plot_live.py:15-26). Same callback
    shape as ascii_bar_render: swapping presentation is one argument."""
    import os
    import tempfile

    import numpy as np

    from ..functions.codecs_stdlib import encode_png

    margin = 12

    def render(rows: Sequence[dict]) -> None:
        if not rows:
            return
        values = [max(float(r[value_key]), 0.0) for r in rows]
        top = max(values) or 1.0
        canvas = np.full((height, width), 255, dtype=np.uint8)
        plot_h = height - 2 * margin
        plot_w = width - 2 * margin
        n = len(values)
        slot = plot_w // max(n, 1)
        bar_w = max(slot - 4, 1)
        for i, v in enumerate(values):
            bar_h = int(plot_h * v / top)
            x0 = margin + i * slot + 2
            y0 = height - margin - bar_h
            # alternate two grays so adjacent bars stay distinguishable
            canvas[y0 : height - margin, x0 : x0 + bar_w] = 80 if i % 2 else 140
        canvas[height - margin, margin : width - margin] = 0  # x axis
        canvas[margin : height - margin + 1, margin - 1] = 0  # y axis
        data = encode_png(canvas)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".png")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    return render


class LiveCountsPoller:
    """Poll-and-render loop (plt.ion analog), background-threaded.

    Keeps the latest snapshot and a bounded history so a consumer can
    also plot trends; empty/failed polls are retried on the same cadence
    (the reference's ``except: pdf = None`` branch)."""

    def __init__(
        self,
        fetch: Callable[[], list[dict]],
        render: Callable[[Sequence[dict]], None] | None = None,
        interval_s: float = 1.0,
        history: int = 300,
    ) -> None:
        self._fetch = fetch
        self._render = render
        self._interval = interval_s
        self._history = history
        self.snapshots: list[list[dict]] = []
        self.errors = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @property
    def latest(self) -> list[dict]:
        return self.snapshots[-1] if self.snapshots else []

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                rows = self._fetch()
            except Exception:
                rows = None
                self.errors += 1
            if rows:
                self.snapshots.append(rows)
                del self.snapshots[: -self._history]
                if self._render is not None:
                    try:
                        self._render(rows)
                    except Exception:
                        self.errors += 1
            self._stop.wait(self._interval)

    def __enter__(self) -> "LiveCountsPoller":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
