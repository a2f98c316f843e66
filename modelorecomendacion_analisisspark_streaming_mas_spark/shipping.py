"""Ship this package's source to Python workers via ``sc.addPyFile``.

Python workers do NOT inherit the driver's ``sys.path``: cloudpickle
serializes module-level functions (Pandas UDFs, ``applyInPandas`` /
``mapInPandas`` / ``applyInPandasWithState`` callables) *by reference*,
so every executor must be able to ``import`` this package when it
deserializes a task. On a real cluster that is what ``spark-submit
--py-files`` does; in local mode it usually works only by accident
(the worker's cwd happens to be the repo root). This module makes the
import work regardless of driver cwd or cluster layout by zipping the
package once per process and registering it with ``addPyFile`` once per
SparkContext -- the same mechanism either way, so behavior tested on
local[32] carries to 1000 executors unchanged.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)

# SparkContext ids already holding the zip (a context restart gets a fresh
# id, so a new session after stop() re-ships).
_SHIPPED: set[str] = set()
_ZIP_PATH: str | None = None


@atexit.register
def _cleanup_zip() -> None:
    global _ZIP_PATH
    if _ZIP_PATH is not None:
        try:
            os.unlink(_ZIP_PATH)
        except OSError:
            pass
        _ZIP_PATH = None


def _build_zip() -> str:
    """Zip the package source tree (py files only) once per process."""
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    fd, path = tempfile.mkstemp(prefix=f"{_PKG_NAME}_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(_PKG_DIR):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                z.write(full, arc)
    _ZIP_PATH = path
    return path


def ensure_package_shipped(spark: SparkSession) -> None:
    """Idempotently make this package importable on executors."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(_build_zip())
    _SHIPPED.add(key)
