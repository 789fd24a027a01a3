"""Unit laws for the protobuf-shim path hygiene (compat._shim_pypath).

The shim dir lands on PYTHONPATH for every Spark worker, so every path
component between the cache root and the symlink must be private to the
current user (ADVICE r9 pinned the leaf; ADVICE r10 extends the check to
every ancestor — a foreign-owned or group-writable ancestor lets another
local user swap the verified leaf after the check and before a worker
resolves the path, the classic TOCTOU on fixed cache paths).

These tests drive _shim_pypath against disposable XDG_CACHE_HOME roots —
no SparkSession, no network, no mutation outside tmp_path (plus mkdtemp
fallbacks in $TMPDIR, which the tests also point into tmp_path).
"""

from __future__ import annotations

import os

from console_etl_spark.compat import _dir_is_private, _shim_pypath


def _isolate_tmp(tmp_path, monkeypatch):
    """Point both the cache root and the mkdtemp fallback into tmp_path
    so a fallback is detectable (and nothing leaks into /tmp)."""
    fallback = tmp_path / "fallback_tmp"
    fallback.mkdir(mode=0o700)
    monkeypatch.setenv("TMPDIR", str(fallback))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)  # re-read TMPDIR
    return fallback


def test_shim_pypath_happy_path_verifies_every_component(tmp_path, monkeypatch):
    """On a private cache root the stable path is used, and EVERY
    component this function created is 0700 and self-owned."""
    _isolate_tmp(tmp_path, monkeypatch)
    cache = tmp_path / "cache"
    cache.mkdir(mode=0o700)
    monkeypatch.setenv("XDG_CACHE_HOME", str(cache))

    got = _shim_pypath()
    expect = str(cache / "console_etl_spark" / "protobuf_shim" / "pypath")
    assert got == expect
    for p in (
        cache / "console_etl_spark",
        cache / "console_etl_spark" / "protobuf_shim",
        cache / "console_etl_spark" / "protobuf_shim" / "pypath",
        cache / "console_etl_spark" / "protobuf_shim" / "pypath" / "google",
    ):
        assert _dir_is_private(str(p)), p
        assert (os.lstat(p).st_mode & 0o777) == 0o700, p


def test_shim_pypath_group_writable_cache_root_falls_back(tmp_path, monkeypatch):
    """ADVICE r10 regression: the cache ROOT is verified but never
    chmod'd (it may be shared); a group/other-writable root means any
    component under it can be swapped wholesale, so the stable path
    must be REJECTED in favor of a fresh mkdtemp (random name, 0700 by
    construction, under the sticky-bit-protected temp root)."""
    fallback = _isolate_tmp(tmp_path, monkeypatch)
    cache = tmp_path / "cache"
    cache.mkdir(mode=0o700)
    os.chmod(cache, 0o777)
    monkeypatch.setenv("XDG_CACHE_HOME", str(cache))

    got = _shim_pypath()
    assert got is not None
    assert not got.startswith(str(cache))
    assert got.startswith(str(fallback))
    assert _dir_is_private(got)
    # root stays untouched: _shim_pypath must not chmod a shared root
    assert (os.lstat(cache).st_mode & 0o777) == 0o777


def test_shim_pypath_foreign_owned_ancestor_falls_back(tmp_path, monkeypatch):
    """ADVICE r10 regression (the TOCTOU the advisory named): an
    ancestor component (cache/console_etl_spark) owned by ANOTHER uid
    is untrusted even when the leaf dirs verify — chmod can repair
    mode, never ownership. Simulated uid-independently by pre-creating
    the ancestor and making every lstat under the cache root report a
    foreign owner for THAT path only."""
    fallback = _isolate_tmp(tmp_path, monkeypatch)
    cache = tmp_path / "cache"
    ancestor = cache / "console_etl_spark"
    ancestor.mkdir(mode=0o700, parents=True)
    monkeypatch.setenv("XDG_CACHE_HOME", str(cache))

    import console_etl_spark.compat as compat

    real_lstat = os.lstat
    # abspath, not realpath: realpath would re-enter the patched lstat
    foreign = os.path.abspath(str(ancestor))

    class _ForeignStat:
        def __init__(self, st):
            self._st = st

        def __getattr__(self, name):
            if name == "st_uid":
                return self._st.st_uid + 1
            return getattr(self._st, name)

    def fake_lstat(path, *a, **kw):
        st = real_lstat(path, *a, **kw)
        if isinstance(path, (str, bytes)) and os.path.abspath(
            os.fsdecode(path)
        ) == foreign:
            return _ForeignStat(st)
        return st

    monkeypatch.setattr(compat.os, "lstat", fake_lstat)
    got = _shim_pypath()
    assert got is not None
    assert not got.startswith(str(cache))
    assert got.startswith(str(fallback))


def test_dir_is_private_rejects_nondir_and_writable_and_missing(tmp_path):
    f = tmp_path / "plainfile"
    f.write_text("x")
    assert not _dir_is_private(str(f))
    d = tmp_path / "d"
    d.mkdir(mode=0o700)
    assert _dir_is_private(str(d))
    os.chmod(d, 0o720)  # group-writable
    assert not _dir_is_private(str(d))
    assert not _dir_is_private(str(tmp_path / "missing"))
