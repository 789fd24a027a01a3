"""Environment compatibility probes.

The container bakes in pyspark/pyarrow/pandas/numpy/duckdb but not the
``protobuf`` Python runtime, which Spark 4's transformWithState needs
for its Python-worker <-> JVM state-server protocol
(pyspark/sql/streaming/proto/StateMessage_pb2). Rather than skipping
that operator's execution forever, :func:`ensure_protobuf` probes for a
pure-Python protobuf runtime that IS already on the host — the Google
Cloud SDK vendors one under its App Engine platform tree — and exposes
ONLY ``google/protobuf`` through a private namespace-package shim (a
symlink in a temp dir), so none of the SDK's other vendored packages
can shadow anything.

Version-skew note: pyspark 4.1.2's gencode is built by protobuf 6.33;
the vendored runtime is 6.32 — one MINOR version older within the same
major, which protobuf's cross-version guarantee treats as
wire-compatible but its strict loader rejects. The loader's own
documented escape hatch (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``)
is set only when the shim is engaged, and engagement is validated
functionally: the TWS stream==batch law test executes the full state
protocol, so a real incompatibility fails loudly there, never silently.

MUST be called BEFORE the SparkSession starts: Python workers inherit
``PYTHONPATH`` and the env var from the JVM, which inherits them from
the driver process at launch.
"""

from __future__ import annotations

import importlib
import os
import sys
import tempfile

# Known locations of a complete pure-Python google/protobuf runtime on
# hosts without the pip package. Each entry is a dir whose child
# ``google/protobuf`` is the package.
_VENDORED_RUNTIME_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Make ``import google.protobuf`` work, if at all possible.

    Returns True when the runtime is importable (installed, or wired up
    via a vendored-runtime shim) AND pyspark's transformWithState proto
    gencode loads against it; False when the host has no runtime — the
    caller keeps its documented skip.
    """
    try:
        import google.protobuf  # noqa: F401

        return _pyspark_proto_loads()
    except ImportError:
        pass

    for root in _VENDORED_RUNTIME_ROOTS:
        pkg = os.path.join(root, "google", "protobuf")
        if not os.path.isdir(pkg):
            continue
        shim = os.path.join(
            tempfile.gettempdir(), "console_etl_spark_protobuf_shim", "pypath"
        )
        link = os.path.join(shim, "google", "protobuf")
        try:
            os.makedirs(os.path.join(shim, "google"), exist_ok=True)
            if os.path.islink(link) and os.path.realpath(link) != os.path.realpath(pkg):
                os.unlink(link)  # stale shim from another host layout
            if not os.path.exists(link):
                os.symlink(pkg, link)
        except OSError:
            continue
        # one-minor-version gencode/runtime skew: use the loader's own
        # escape hatch, scoped to this process tree (workers inherit)
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        if shim not in sys.path:
            sys.path.append(shim)
        os.environ["PYTHONPATH"] = (
            shim + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
        importlib.invalidate_caches()
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            continue
        if _pyspark_proto_loads():
            return True
    return False


def _pyspark_proto_loads() -> bool:
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False
