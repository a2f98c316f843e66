"""Self-contained ``google.protobuf`` alias shim (dual-use source file).

Spark 4's ``transformWithStateInPandas`` drives its state server over
protobuf: ``pyspark/sql/streaming/proto/StateMessage_pb2.py`` needs a
``google.protobuf`` runtime in BOTH the driver and every Python worker.
This container has no protobuf wheel installed, but it does carry a
complete pure-Python protobuf runtime (4.23.2, ``internal/builder.py``
included) vendored inside the publicly distributed google-cloud-sdk under
the ``cloudsdk.google.protobuf`` package name. This module makes that
runtime importable under its canonical ``google.protobuf`` name without
copying a single file:

  * a ``sys.meta_path`` finder redirects any ``google.protobuf[.X]``
    import to ``cloudsdk.google.protobuf[.X]`` via an alias loader whose
    ``create_module`` returns the ALREADY-imported cloudsdk module object
    -- so exactly one copy of every runtime module exists per process
    (two ``descriptor_pool.Default()`` singletons would corrupt message
    building);
  * ``google.protobuf.runtime_version`` -- a module that only exists in
    protobuf >= 5.27, imported by pyspark's protoc-5.x gencode purely to
    validate gencode/runtime version pairs -- is synthesized with the two
    symbols the gencode uses (``Domain``, ``ValidateProtobufRuntimeVersion``).
    The 4.23 runtime predates the check but implements the same
    builder-based gencode ABI, which is what actually matters; the s10
    round-trip pytest (tests/test_stateful_v2.py) is the proof.

Dual use: imported normally as ``compat.google_shim_src`` this file only
defines functions (nothing runs). Written byte-for-byte into a zip as
``google/__init__.py`` and shipped to workers with ``addPyFile``
(compat/protobuf_shim.py), the ``__name__ == "google"`` bootstrap at the
bottom fires when a worker first executes ``import google``: it extends
``__path__`` with any real ``google/`` dirs found on ``sys.path`` (so a
host that DOES have native google namespace packages keeps them) and
installs the redirect only when no native ``google/protobuf`` exists.

The shim is only ever shipped when the driver itself resolved protobuf
via the vendored runtime (see protobuf_shim.ensure_worker_shim), so in
local mode -- the only mode this container runs -- driver and worker
decisions always agree.
"""

from __future__ import annotations

import enum
import importlib
import importlib.abc
import importlib.util
import os
import sys
import types

# Well-known locations of a vendored pure-python protobuf runtime exposing
# it under the `cloudsdk.google.protobuf` name. Extendable via env var so a
# differently-laid-out host can point at its own copy (path list, os.pathsep
# separated).
_VENDOR_ROOTS = ["/usr/lib/google-cloud-sdk/lib/third_party"]
_VENDOR_ENV = "MRAS_PROTOBUF_VENDOR_PATH"

# Present in the vendored tree only if the runtime speaks the modern
# builder-based gencode ABI that pyspark's generated _pb2 files target.
_MARKER = os.path.join("cloudsdk", "google", "protobuf", "internal", "builder.py")


def vendor_root() -> str | None:
    """First root whose vendored runtime supports builder-based gencode."""
    roots = list(_VENDOR_ROOTS)
    roots += [p for p in os.environ.get(_VENDOR_ENV, "").split(os.pathsep) if p]
    for root in roots:
        if os.path.isfile(os.path.join(root, _MARKER)):
            return root
    return None


class _AliasLoader(importlib.abc.Loader):
    """Loader that resolves a module by importing it under another name.

    ``create_module`` returning an existing module object makes the import
    system register that SAME object under the requested alias, which is
    the whole point: ``google.protobuf.descriptor`` and
    ``cloudsdk.google.protobuf.descriptor`` must be one module.
    """

    def __init__(self, target: str) -> None:
        self._target = target

    def create_module(self, spec):
        return importlib.import_module(self._target)

    def exec_module(self, module) -> None:  # already executed under real name
        pass


class _RuntimeVersionLoader(importlib.abc.Loader):
    """Synthesizes the protobuf-5.27+ ``runtime_version`` module surface."""

    def create_module(self, spec):
        mod = types.ModuleType(spec.name)

        class Domain(enum.Enum):
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        def ValidateProtobufRuntimeVersion(*args, **kwargs) -> None:
            # Gencode asks "is the runtime new enough?"; compatibility here
            # is established by the round-trip tests, not a version tuple.
            return None

        mod.Domain = Domain
        mod.ValidateProtobufRuntimeVersion = ValidateProtobufRuntimeVersion
        mod.VersionError = RuntimeError
        return mod

    def exec_module(self, module) -> None:
        pass


class _ProtobufRedirectFinder(importlib.abc.MetaPathFinder):
    """meta_path finder: google.protobuf[.X] -> cloudsdk.google.protobuf[.X]."""

    def find_spec(self, name, path=None, target=None):
        if name == "google.protobuf.runtime_version":
            # Must come before the generic redirect: the 4.23 vendored tree
            # has no runtime_version module to alias.
            return importlib.util.spec_from_loader(name, _RuntimeVersionLoader())
        if name == "google.protobuf" or name.startswith("google.protobuf."):
            return importlib.util.spec_from_loader(
                name, _AliasLoader("cloudsdk." + name)
            )
        return None


def finder_installed() -> bool:
    return any(isinstance(f, _ProtobufRedirectFinder) for f in sys.meta_path)


def install_finder() -> bool:
    """Idempotently install the redirect; False if no vendored runtime."""
    root = vendor_root()
    if root is None:
        return False
    if root not in sys.path:
        sys.path.append(root)  # append: never shadows real site-packages
    if not finder_installed():
        sys.meta_path.insert(0, _ProtobufRedirectFinder())
    # `from google.protobuf import runtime_version` resolves through
    # _handle_fromlist against the aliased module's REAL name
    # (`cloudsdk.google.protobuf.runtime_version`), which the finder does
    # not see -- so the stub must exist eagerly as a module attribute and
    # under both sys.modules names.
    pb = importlib.import_module("cloudsdk.google.protobuf")
    if not hasattr(pb, "runtime_version"):
        spec = importlib.util.spec_from_loader(
            "google.protobuf.runtime_version", _RuntimeVersionLoader()
        )
        stub = importlib.util.module_from_spec(spec)
        sys.modules["google.protobuf.runtime_version"] = stub
        sys.modules["cloudsdk.google.protobuf.runtime_version"] = stub
        pb.runtime_version = stub
    return True


def _bootstrap_as_google_package() -> None:
    """Runs only when this file IS ``google/__init__.py`` (worker zip)."""
    path = sys.modules[__name__].__path__  # set by the import system
    here = os.path.dirname(os.path.abspath(__file__))
    for entry in list(sys.path):
        cand = os.path.join(entry, "google")
        if os.path.isdir(cand) and os.path.abspath(cand) != here:
            path.append(cand)  # defer to any real google.* namespace pkgs
    native_pb = any(os.path.isdir(os.path.join(p, "protobuf")) for p in path)
    if not native_pb:
        install_finder()


if __name__ == "google":  # pragma: no cover - executes only inside workers
    _bootstrap_as_google_package()
