"""Serving veneer tests: the reference's HTTP contracts driven through a
real socket (app4 /recommend payload shape, app3 /counts, app2 /submit)."""

from __future__ import annotations

import json
import os
import tempfile
import threading
import urllib.request

import numpy as np
import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.serving import (
    CountsProvider,
    RecommenderState,
    make_server,
)


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(7)
    ids = np.arange(1, 51, dtype=np.int64)
    Y = np.abs(rng.standard_normal((50, 8)))
    titles = {int(i): f"Movie {i}" for i in ids}
    spool = os.path.join(tempfile.mkdtemp(prefix="mras_spool_"), "feedback.jsonl")

    class Rows:
        def __call__(self):
            return [{"gender": "Hombre", "n": 3}, {"gender": "Mujer", "n": 4}]

    srv = make_server(
        0,
        recommender=RecommenderState(ids, Y, titles),
        counts=CountsProvider(Rows()),
        spool_path=spool,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, spool
    srv.shutdown()


def _req(srv, path, payload=None):
    port = srv.server_address[1]
    url = f"http://127.0.0.1:{port}{path}"
    if payload is None:
        r = urllib.request.urlopen(url, timeout=10)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
        )
        r = urllib.request.urlopen(req, timeout=10)
    return r.status, json.loads(r.read())


def test_recommend_contract(server):
    srv, _ = server
    status, body = _req(
        srv, "/recommend", {"ratings": [{"filmId": 1, "rating": 5}, {"filmId": 2, "rating": 4}]}
    )
    assert status == 200
    recs = body["recommendations"]
    assert len(recs) == 5
    assert {"filmId", "title", "score"} <= set(recs[0])
    assert all(r["filmId"] not in (1, 2) for r in recs)  # rated items masked


def test_counts_endpoint(server):
    srv, _ = server
    status, body = _req(srv, "/counts")
    assert status == 200
    assert body["counts"] == [{"gender": "Hombre", "n": 3}, {"gender": "Mujer", "n": 4}]


def test_submit_spools_payload(server):
    srv, spool = server
    payload = {"gender": "Mujer", "age": 33, "ratings": [{"filmId": 3, "rating": 5}]}
    status, body = _req(srv, "/submit", payload)
    assert status == 200 and body["queued"]
    assert json.loads(open(spool).read().splitlines()[-1]) == payload


def test_submit_bare_filename_spool(tmp_path, monkeypatch):
    """A bare-filename spool path (empty dirname) must not crash makedirs."""
    monkeypatch.chdir(tmp_path)
    srv = make_server(0, spool_path="bare_spool.jsonl")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        status, body = _req(srv, "/submit", {"ok": 1})
        assert status == 200 and body["queued"]
        assert json.loads((tmp_path / "bare_spool.jsonl").read_text()) == {"ok": 1}
    finally:
        srv.shutdown()


def test_submit_concurrent_appends_keep_lines_intact(server):
    """ThreadingHTTPServer handles requests concurrently; the spool lock
    must keep every JSONL line parseable and complete under parallel
    large-payload submits."""
    srv, spool = server
    payload = {"blob": "x" * 50_000, "ratings": [{"filmId": i, "rating": 5} for i in range(50)]}
    errs = []

    def submit():
        try:
            _req(srv, "/submit", payload)
        except Exception as e:  # pragma: no cover - diagnostic only
            errs.append(e)

    threads = [threading.Thread(target=submit) for _ in range(16)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    lines = [ln for ln in open(spool).read().splitlines() if '"blob"' in ln]
    assert len(lines) == 16
    for ln in lines:
        assert json.loads(ln) == payload  # no interleaved/torn lines


def test_error_paths(server):
    srv, _ = server
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _req(srv, "/recommend", {"ratings": []})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(srv, "/recommend", {"ratings": [{"film": 1}]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(srv, "/nope")
    assert e.value.code == 404


def test_live_counts_poller_over_http(server):
    """app/plot_live.py analog: poll /counts on an interval, render each
    snapshot (ASCII fallback -- same callback shape as a matplotlib
    consumer)."""
    import time

    from modelorecomendacion_analisisspark_streaming_mas_spark.serving.live_plot import (
        LiveCountsPoller,
        ascii_bar_render,
        http_counts_fetch,
    )

    srv, _spool = server
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    lines: list[str] = []
    with LiveCountsPoller(
        http_counts_fetch(base),
        render=lambda rows: ascii_bar_render(rows, "gender", "n", out=lines.append),
        interval_s=0.05,
    ) as poller:
        t0 = time.time()
        while not poller.snapshots and time.time() - t0 < 10:
            time.sleep(0.05)
    assert poller.snapshots, "poller never captured a snapshot"
    assert poller.latest == poller.snapshots[-1]
    assert lines and any("#" in ln for ln in lines)


def test_live_counts_poller_survives_fetch_errors():
    import time

    from modelorecomendacion_analisisspark_streaming_mas_spark.serving.live_plot import (
        LiveCountsPoller,
    )

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("sink not up yet")
        return [{"k": "a", "n": calls["n"]}]

    with LiveCountsPoller(flaky, interval_s=0.02, history=5) as poller:
        t0 = time.time()
        while len(poller.snapshots) < 8 and time.time() - t0 < 10:
            time.sleep(0.02)
    assert poller.errors >= 2  # early failures counted, loop kept going
    assert len(poller.snapshots) <= 5  # history bound enforced
    assert poller.latest[0]["n"] == max(s[0]["n"] for s in poller.snapshots)


def test_matplotlib_render_gated_like_every_optional_dep():
    """matplotlib_bar_render: builds a live-redraw callback when
    matplotlib is importable, raises ImportError where it is not (this
    container) -- the ASCII renderer stays the built-in either way."""
    import pytest

    from modelorecomendacion_analisisspark_streaming_mas_spark.serving.live_plot import (
        matplotlib_bar_render,
    )

    try:
        import matplotlib  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            matplotlib_bar_render("gender", "n")
        return
    render = matplotlib_bar_render("gender", "n")
    render([{"gender": "Hombre", "n": 3}, {"gender": "Mujer", "n": 5}])


def test_png_bar_render_writes_decodable_chart(tmp_path):
    """The stdlib-PNG presentation surface: the rendered file must be a
    decodable image whose bar heights track the snapshot values."""
    import numpy as np

    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.codecs_stdlib import (
        decode_png,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.serving.live_plot import (
        png_bar_render,
    )

    path = str(tmp_path / "chart.png")
    render = png_bar_render("gender", "n", path, width=120, height=80)
    render([{"gender": "Hombre", "n": 30}, {"gender": "Mujer", "n": 10}])
    px = decode_png(open(path, "rb").read())
    assert px.shape == (80, 120)
    dark = px < 200
    # bar 1 (value 30) must paint ~3x the pixels of bar 2 (value 10)
    left = dark[:, : 120 // 2].sum()
    right = dark[:, 120 // 2 :].sum()
    assert left > right > 0
    # a second snapshot atomically replaces the file
    render([{"gender": "Hombre", "n": 1}, {"gender": "Mujer", "n": 1}])
    px2 = decode_png(open(path, "rb").read())
    assert px2.shape == (80, 120)
