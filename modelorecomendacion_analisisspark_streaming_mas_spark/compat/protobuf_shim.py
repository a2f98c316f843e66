"""Driver-side protobuf resolution + worker shim shipping.

``install()`` decides once per process how ``google.protobuf`` resolves:

  * ``"native"``   -- a real protobuf distribution is importable; do nothing.
  * ``"vendored"`` -- no native runtime, but a vendored pure-python runtime
    exists on this host (google_shim_src.vendor_root); the redirect finder
    is installed and, because pyspark workers are separate interpreters,
    ``ensure_worker_shim`` must also ship a ``google/__init__.py`` zip via
    ``addPyFile`` before any stateful-v2 query starts.
  * ``None``       -- no runtime at all; transformWithStateInPandas surfaces
    stay unregistered (plans/stateful_probe.py keeps them dark honestly).

The worker zip is built from google_shim_src.py's own source bytes -- the
file is written verbatim as ``google/__init__.py`` and its
``__name__ == "google"`` bootstrap does the worker-side install. See that
module's docstring for the aliasing design.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import types
import zipfile

from pyspark.sql import SparkSession

from . import google_shim_src

_MODE: str | None = None
_MODE_DECIDED = False
_ZIP_PATH: str | None = None
_DIR_PATH: str | None = None
_SHIPPED: set[str] = set()


@atexit.register
def _cleanup_zip() -> None:
    global _ZIP_PATH
    if _ZIP_PATH is not None:
        try:
            os.unlink(_ZIP_PATH)
        except OSError:
            pass
        _ZIP_PATH = None


def _native_available() -> bool:
    """True iff google.protobuf resolves WITHOUT our redirect finder."""
    if google_shim_src.finder_installed():
        # Finder already active: the pre-finder decision stands; recomputing
        # find_spec now would see the alias and misreport 'native'.
        return False
    try:
        import importlib.util

        return importlib.util.find_spec("google.protobuf") is not None
    except (ImportError, ModuleNotFoundError):
        return False


def install() -> str | None:
    """Resolve google.protobuf for THIS process; returns the mode."""
    global _MODE, _MODE_DECIDED
    if _MODE_DECIDED:
        return _MODE
    if _native_available():
        _MODE = "native"
    elif google_shim_src.install_finder():
        # The finder only redirects google.protobuf.*; the bare `google`
        # namespace package may not exist at all on this host -- synthesize
        # an empty one so `import google.protobuf` can bind its parent.
        import sys

        if "google" not in sys.modules:
            g = types.ModuleType("google")
            g.__path__ = []  # namespace-style: no real subpackage dirs
            sys.modules["google"] = g
        _MODE = "vendored"
    else:
        _MODE = None
    _MODE_DECIDED = True
    return _MODE


def mode() -> str | None:
    """Decided mode, without forcing a decision (None if undecided/absent)."""
    return _MODE


def _build_worker_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    fd, path = tempfile.mkstemp(prefix="mras_pbshim_", suffix=".zip")
    os.close(fd)
    src = os.path.abspath(google_shim_src.__file__)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(src, os.path.join("google", "__init__.py"))
    _ZIP_PATH = path
    return path


def _build_worker_dir() -> str:
    """Materialize the shim as an on-disk ``google/`` package dir.

    transformWithStateInPandas spawns THREE kinds of Python processes that
    all import protobuf: the driver (redirect finder handles it), task
    workers (addPyFile includes land on their sys.path), and a planning-time
    "driver worker" for state-schema validation that does NOT process
    pyFiles includes -- it only sees the PYTHONPATH its factory passes.
    A plain directory on PYTHONPATH covers that third kind (and, in local
    mode, the first two as well).
    """
    global _DIR_PATH
    if _DIR_PATH is not None and os.path.isdir(_DIR_PATH):
        return _DIR_PATH
    base = tempfile.mkdtemp(prefix="mras_pbshim_dir_")
    pkg = os.path.join(base, "google")
    os.mkdir(pkg)
    src = os.path.abspath(google_shim_src.__file__)
    with open(src, "rb") as f, open(os.path.join(pkg, "__init__.py"), "wb") as g:
        g.write(f.read())
    _DIR_PATH = base
    return base


def ensure_worker_shim(spark: SparkSession) -> None:
    """Make the vendored protobuf reachable from every worker interpreter.

    No-op unless install() chose 'vendored': in native mode workers get
    protobuf from their own site-packages, and shipping a shadowing
    ``google`` package would be wrong there. In vendored mode, two
    channels (both idempotent per SparkContext):

      * ``addPyFile`` of a google/__init__.py zip -- reaches ordinary task
        workers on any cluster manager;
      * ``sc.environment["PYTHONPATH"]`` prepended with an on-disk copy --
        flows into the env of every Python process the JVM spawns for this
        app, including the planning-time state-schema "driver worker" that
        skips pyFiles processing. Local-mode only by nature (the path must
        exist on the executor host); on a real cluster the equivalent is
        ``spark.executorEnv.PYTHONPATH`` + ``--py-files``.
    """
    if _MODE != "vendored":
        return
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(_build_worker_zip())
    # The driver worker skips pyFiles entirely, so its PYTHONPATH must carry
    # BOTH the protobuf shim and this package (it unpickles the
    # StatefulProcessor subclass by reference). The shipping zip is
    # zipimport-able as-is.
    from ..shipping import _build_zip as _package_zip

    for entry in (_build_worker_dir(), _package_zip()):
        existing = sc.environment.get("PYTHONPATH")
        if not existing:
            sc.environment["PYTHONPATH"] = entry
        elif entry not in existing.split(os.pathsep):
            sc.environment["PYTHONPATH"] = entry + os.pathsep + existing
    _SHIPPED.add(key)
