"""Environment compatibility probes.

The container bakes in pyspark/pyarrow/pandas/numpy/duckdb but not the
``protobuf`` Python runtime, which Spark 4's transformWithState needs
for its Python-worker <-> JVM state-server protocol
(pyspark/sql/streaming/proto/StateMessage_pb2). Rather than skipping
that operator's execution forever, :func:`ensure_protobuf` probes for a
pure-Python protobuf runtime that IS already on the host — the Google
Cloud SDK vendors one under its App Engine platform tree — and exposes
ONLY ``google/protobuf`` through a private namespace-package shim (a
symlink in a per-user 0700 directory — ownership- and mode-verified
before it ever reaches PYTHONPATH, so no other local user can plant
importable modules that Spark workers would inherit), so none of the
SDK's other vendored packages can shadow anything.

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


def _dir_is_private(path: str) -> bool:
    """True iff ``path`` is a directory owned by the current uid and not
    group/other-writable — the precondition for trusting it on
    PYTHONPATH (a foreign-owned or world-writable dir lets another
    local user plant importable modules that shadow site-packages in
    every Spark worker)."""
    try:
        st = os.lstat(path)
    except OSError:
        return False
    import stat as _stat

    return (
        _stat.S_ISDIR(st.st_mode)
        and st.st_uid == os.getuid()
        and not (st.st_mode & 0o022)
    )


def _shim_pypath() -> str | None:
    """Create (or reuse) a PRIVATE shim dir and return its pypath root.

    Preference order: a stable per-user cache path (so every process of
    this user shares one shim and workers inherit a constant PYTHONPATH),
    falling back to a fresh ``mkdtemp`` (random name, 0700 by
    construction) when the cache path can't be made trustworthy. Never
    returns a dir that fails :func:`_dir_is_private` — pre-creation by
    another user (the /tmp fixed-path attack: ``makedirs exist_ok=True``
    happily accepts a foreign-owned dir) yields the mkdtemp fallback
    instead of a poisoned import path."""
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    stable = os.path.join(cache, "console_etl_spark", "protobuf_shim", "pypath")
    # EVERY path component between the cache root and the shim must be
    # private: a foreign-owned or group-writable ancestor lets another
    # local user swap the verified leaf dir between this check and the
    # moment a Spark worker resolves PYTHONPATH (TOCTOU). The cache root
    # itself is only verified (it may legitimately be 0755); the
    # components this function creates are chmod'd to 0700 first.
    created = [
        os.path.join(cache, "console_etl_spark"),
        os.path.join(cache, "console_etl_spark", "protobuf_shim"),
        stable,
        os.path.join(stable, "google"),
    ]
    try:
        os.makedirs(created[-1], mode=0o700, exist_ok=True)
        # makedirs honors umask and accepts pre-existing dirs — re-assert
        # the mode, then verify ownership before trusting the path.
        for p in created:
            os.chmod(p, 0o700)
        if _dir_is_private(cache) and all(_dir_is_private(p) for p in created):
            return stable
    except OSError:
        pass
    try:
        fresh = tempfile.mkdtemp(prefix="console_etl_spark_pb_")
        os.makedirs(os.path.join(fresh, "google"), mode=0o700)
        return fresh
    except OSError:
        return None


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
        shim = _shim_pypath()
        if shim is None:
            continue
        link = os.path.join(shim, "google", "protobuf")
        try:
            if os.path.islink(link) and os.path.realpath(link) != os.path.realpath(pkg):
                os.unlink(link)  # stale shim from another host layout
            if not os.path.exists(link):
                try:
                    os.symlink(pkg, link)
                except FileExistsError:
                    # check-then-create race with a concurrent process of
                    # THIS user (the dir is 0700-private) on the stable
                    # cache path: the other side won; accept its link iff
                    # it points at the same runtime
                    pass
            if os.path.realpath(link) != os.path.realpath(pkg):
                continue
        except OSError:
            continue
        # Engage the shim, but UNDO every mutation if validation fails —
        # a half-working shim must not leave the version check disabled
        # or a stale path on PYTHONPATH for this process's children.
        prev_check = os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")
        prev_pypath = os.environ.get("PYTHONPATH")
        added_sys_path = shim not in sys.path
        # one-minor-version gencode/runtime skew: use the loader's own
        # escape hatch, scoped to this process tree (workers inherit)
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        if added_sys_path:
            sys.path.append(shim)
        os.environ["PYTHONPATH"] = (
            shim + os.pathsep + (prev_pypath or "")
        ).rstrip(os.pathsep)
        importlib.invalidate_caches()
        ok = False
        try:
            import google.protobuf  # noqa: F401

            ok = _pyspark_proto_loads()
        except ImportError:
            ok = False
        if ok:
            return True
        # roll back the failed engagement
        if added_sys_path and shim in sys.path:
            sys.path.remove(shim)
        if prev_pypath is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prev_pypath
        if prev_check is None:
            os.environ.pop("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None)
        else:
            os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = prev_check
    return False


def _pyspark_proto_loads() -> bool:
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False
