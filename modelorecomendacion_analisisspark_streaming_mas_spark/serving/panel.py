"""Orchestration panel (app5/panel.py:41-68 analog): process control over
the load-generator bots behind the same stdlib-HTTP veneer the serving app
uses.

Contract mirrored from the reference panel:

* ``GET  /status``          -> {bot_name: running_bool} for every bot ever
  started (the reference's ``status()``)
* ``POST /start?bot=name``  -> {"result": "ok" | "ya_en_ejecucion"}
* ``POST /stop?bot=name``   -> {"result": "ok" | "no_encontrado"}

Differences (deliberate, broker-free): bots are ``python -m ...generators
--bot <name>`` subprocesses emitting to a JSONL spool directory instead of
confluent-kafka producers; the spool is what the repo's file-stream source
replays. Process management semantics are kept exactly: start is
idempotent while running, stop terminates then kills after a 5s grace.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..sources.generators import BOT_PROFILES

# Parent dir of the package: prepended to the child's PYTHONPATH so the
# `-m ...generators` bot subprocess imports regardless of the supervisor's
# cwd (same failure mode shipping.py fixes for Spark workers).
_PKG_PARENT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


class BotSupervisor:
    """Start/stop/status over generator-bot subprocesses."""

    def __init__(self, spool_dir: str, rate: float | None = None) -> None:
        self._spool = spool_dir
        self._rate = rate  # None -> each profile's reference rate
        self._procs: dict[str, subprocess.Popen] = {}
        self._lock = threading.Lock()

    def start(self, name: str) -> str:
        if name not in BOT_PROFILES:
            raise ValueError(f"unknown bot: {name!r} (known: {sorted(BOT_PROFILES)})")
        with self._lock:
            proc = self._procs.get(name)
            if proc is not None and proc.poll() is None:
                return "ya_en_ejecucion"
            argv = [
                sys.executable, "-m",
                "modelorecomendacion_analisisspark_streaming_mas_spark.sources.generators",
                "--bot", name, "--out", self._spool,
            ]
            if self._rate is not None:
                argv += ["--rate", str(self._rate)]
            env = dict(os.environ)
            env["PYTHONPATH"] = _PKG_PARENT + os.pathsep + env.get("PYTHONPATH", "")
            self._procs[name] = subprocess.Popen(
                argv, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env
            )
            return "ok"

    def stop(self, name: str) -> str:
        with self._lock:
            proc = self._procs.get(name)
            if proc is None or proc.poll() is not None:
                return "no_encontrado"
            proc.terminate()
            try:
                proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=5)
            return "ok"

    def status(self) -> dict[str, bool]:
        with self._lock:
            return {name: proc.poll() is None for name, proc in self._procs.items()}

    def stop_all(self) -> None:
        for name in list(self._procs):
            self.stop(name)


def make_panel_server(port: int, supervisor: BotSupervisor) -> ThreadingHTTPServer:
    """Build (not start) the panel HTTP server; port 0 picks a free port."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if urlparse(self.path).path == "/status":
                self._json(200, supervisor.status())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            parsed = urlparse(self.path)
            bot = parse_qs(parsed.query).get("bot", [None])[0]
            if parsed.path not in ("/start", "/stop"):
                self._json(404, {"error": "not found"})
                return
            if not bot:
                self._json(400, {"error": "missing ?bot="})
                return
            try:
                if parsed.path == "/start":
                    self._json(200, {"result": supervisor.start(bot)})
                else:
                    self._json(200, {"result": supervisor.stop(bot)})
            except ValueError as ex:
                self._json(400, {"error": str(ex)})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
