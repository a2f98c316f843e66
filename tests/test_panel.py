"""Orchestration panel (app5 analog): bot process control + HTTP contract,
and the bot spool feeding the streaming parse path end-to-end."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.serving.panel import (
    BotSupervisor,
    make_panel_server,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.generators import (
    BOT_PROFILES,
    generate_profile_events,
)


def _wait(pred, timeout=30.0, every=0.1):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(every)
    return False


def test_profiles_match_reference_slices():
    """The five demographic slices the reference bots fix
    (bots/bot_*.py): revista = young women students, inserso = retired
    66-90, masculino = men 25-40, random/random50 = whole range."""
    assert set(BOT_PROFILES) == {"random", "random50", "revista", "inserso", "masculino"}
    for e in generate_profile_events("revista", 50, seed=7):
        assert e["gender"] == "Mujer" and 10 <= e["age"] <= 16
        assert e["occupation"] == "estudiante"
    for e in generate_profile_events("inserso", 50, seed=7):
        assert e["occupation"] == "jubilado" and 66 <= e["age"] <= 90
    for e in generate_profile_events("masculino", 50, seed=7):
        assert e["gender"] == "Hombre" and 25 <= e["age"] <= 40
    # rates mirror the reference defaults
    assert BOT_PROFILES["random50"]["rate"] == 50.0
    assert BOT_PROFILES["inserso"]["rate"] == 500.0


def test_bot_cli_bounded_run_writes_valid_spool(tmp_path):
    spool = str(tmp_path / "spool")
    out = subprocess.run(
        [
            sys.executable, "-m",
            "modelorecomendacion_analisisspark_streaming_mas_spark.sources.generators",
            "--bot", "revista", "--out", spool, "--rate", "40", "--count", "40",
        ],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PYTHONPATH="/root/repo"), cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1000:]
    files = [f for f in os.listdir(spool) if f.endswith(".jsonl")]
    assert files and not [f for f in os.listdir(spool) if f.endswith(".tmp")]
    rows = []
    for fn in files:
        with open(os.path.join(spool, fn)) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == 40
    assert all(r["gender"] == "Mujer" and r["occupation"] == "estudiante" for r in rows)


def test_supervisor_start_stop_status(tmp_path):
    sup = BotSupervisor(str(tmp_path / "spool"), rate=5)
    try:
        assert sup.status() == {}
        assert sup.start("random") == "ok"
        assert sup.start("random") == "ya_en_ejecucion"  # idempotent while live
        assert sup.status() == {"random": True}
        with pytest.raises(ValueError, match="unknown bot"):
            sup.start("nope")
        # the bot actually produces spool output while running (allow for
        # interpreter startup before the first tick lands)
        assert _wait(lambda: any((tmp_path / "spool").glob("*.jsonl")), timeout=20)
        assert sup.stop("random") == "ok"
        assert sup.stop("random") == "no_encontrado"
        assert sup.status() == {"random": False}
    finally:
        sup.stop_all()


def test_panel_http_contract(tmp_path):
    sup = BotSupervisor(str(tmp_path / "spool"), rate=5)
    server = make_panel_server(0, sup)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path):
        req = urllib.request.Request(f"{base}{path}", method="POST", data=b"")
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.load(r)
        except urllib.error.HTTPError as ex:
            return ex.code, json.load(ex)

    try:
        assert post("/start?bot=masculino") == (200, {"result": "ok"})
        assert post("/start?bot=masculino") == (200, {"result": "ya_en_ejecucion"})
        with urllib.request.urlopen(f"{base}/status") as r:
            assert json.load(r) == {"masculino": True}
        code, body = post("/start?bot=desconocido")
        assert code == 400 and "unknown bot" in body["error"]
        code, body = post("/start")
        assert code == 400
        assert post("/stop?bot=masculino") == (200, {"result": "ok"})
        assert post("/stop?bot=masculino") == (200, {"result": "no_encontrado"})
        with urllib.request.urlopen(f"{base}/status") as r:
            assert json.load(r) == {"masculino": False}
    finally:
        server.shutdown()
        sup.stop_all()
