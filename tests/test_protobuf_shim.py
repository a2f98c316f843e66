"""compat/protobuf_shim contract tests.

The shim exists so transformWithStateInPandas (s10) can run where no
protobuf wheel is installed: google.protobuf.* is aliased onto a vendored
pure-python runtime found on the host (see compat/google_shim_src.py for
the aliasing design). These tests pin:

  * probe/registration agreement in both directions (the s10 catalog entry
    exists iff a runtime resolves);
  * a full protobuf wire round-trip through pyspark's generated
    StateMessage_pb2 (the exact gencode the state server speaks);
  * the worker-side delivery channels: the addPyFile zip layout and the
    PYTHONPATH dir, each carrying google_shim_src.py verbatim as
    google/__init__.py, and a fresh interpreter resolving protobuf through
    them exactly as a Spark python worker would.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.compat import (
    google_shim_src,
    protobuf_shim,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY


def test_probe_matches_registration_both_directions():
    """s10 registered <=> a protobuf runtime resolves. Neither a dark
    surface (registered but unrunnable) nor a silent gap (runnable but
    unregistered) is acceptable."""
    mode = protobuf_shim.install()
    assert (mode is not None) == ("s10_stream_tws_counts" in REGISTRY)
    if mode is not None:
        import google.protobuf  # must import after install

        assert google.protobuf is not None


def test_statemessage_wire_roundtrip():
    """Serialize/parse pyspark's StateMessage gencode through the resolved
    runtime: nested message, enum-ish ints, bytes and string fields."""
    if protobuf_shim.install() is None:
        pytest.skip("no protobuf runtime (native or vendored) on this host")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest()
    req.version = 2
    req.statefulProcessorCall.setHandleState.state = 1
    wire = req.SerializeToString()
    assert wire  # non-empty: fields actually encoded

    back = sm.StateRequest()
    back.ParseFromString(wire)
    assert back.version == 2
    assert back.statefulProcessorCall.setHandleState.state == 1
    assert back == req


def test_worker_zip_ships_shim_source_verbatim():
    """The addPyFile zip must contain exactly google/__init__.py with the
    same bytes as google_shim_src.py -- the dual-use contract."""
    if protobuf_shim.install() != "vendored":
        pytest.skip("worker shim only built in vendored mode")
    path = protobuf_shim._build_worker_zip()
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        assert names == [os.path.join("google", "__init__.py")]
        shipped = z.read(names[0])
    with open(google_shim_src.__file__, "rb") as f:
        assert shipped == f.read()


def test_fresh_interpreter_resolves_protobuf_via_pythonpath_dir():
    """Exactly what the planning-time 'driver worker' does: a brand-new
    interpreter whose only help is PYTHONPATH must import google.protobuf
    and load the pyspark gencode."""
    if protobuf_shim.install() != "vendored":
        pytest.skip("worker shim only built in vendored mode")
    shim_dir = protobuf_shim._build_worker_dir()
    env = dict(os.environ)
    env["PYTHONPATH"] = shim_dir
    code = (
        "import google.protobuf, sys\n"
        "import pyspark.sql.streaming.proto.StateMessage_pb2 as sm\n"
        "m = sm.StateRequest(); m.version = 7\n"
        "b = sm.StateRequest(); b.ParseFromString(m.SerializeToString())\n"
        "assert b.version == 7\n"
        "print('SHIM_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SHIM_OK" in out.stdout


def test_ensure_worker_shim_sets_env_and_pyfile(spark):
    """In vendored mode ensure_worker_shim must arm both channels on the
    live SparkContext: PYTHONPATH env for JVM-spawned python processes and
    the pyFiles include for task workers."""
    mode = protobuf_shim.install()
    if mode != "vendored":
        pytest.skip("channels only armed in vendored mode")
    protobuf_shim.ensure_worker_shim(spark)
    sc = spark.sparkContext
    pypath = sc.environment.get("PYTHONPATH", "")
    assert protobuf_shim._build_worker_dir() in pypath.split(os.pathsep)
    includes = [os.path.basename(p) for p in sc._python_includes]
    assert any(n.startswith("mras_pbshim_") for n in includes), includes
