"""Snapshot store: partitioned Parquet + atomic manifest publication.

Re-expresses the reference's document store (T2/T3):

- Reference layout ``<cacheDir>/clustercatalogs/<catalog>/<ts>/<package>/
  <schema>/<name>.json`` (/root/reference/cache.go:107) becomes
  ``<root>/<catalog>/<version>/`` Hive-partitioned Parquet on
  (``package``, ``schema``) — same two-level pruning, columnar instead of
  per-row JSON files (per-row files are an anti-pattern at Spark scale;
  per-object addressability is preserved by filtering on the ``name``
  column, which Parquet row-group min/max stats make a skip-scan).
- Reference atomic publish (timestamped dir + symlink rename,
  /root/reference/cache.go:75-92) becomes: write the snapshot directory
  (Spark's job-commit protocol makes it all-or-nothing), then atomically
  flip a ``_CURRENT.json`` manifest via write-temp + ``os.replace``.
  Readers resolve the manifest first, so they always see a complete
  snapshot — never partial data. Unlike the reference (which errors on
  re-publishing the same Last-Modified, cache.go:84-86), re-publishing an
  existing version is an idempotent no-op.

At 100 TB the layout holds: partition columns bound each query's scan to
one ``(package, schema)`` subtree; snapshots are immutable so concurrent
readers never block writers; the manifest flip is O(1) regardless of
data size.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_CURRENT.json"
PARTITION_COLS = ("package", "schema")


@dataclass(frozen=True)
class SnapshotInfo:
    catalog: str
    version: str
    path: str
    published_at: float
    schema_json: str | None = None  # DDL-round-trippable StructType json


class ConcurrentPublishError(RuntimeError):
    """Another writer published between this writer's read of the
    current version and its manifest flip (optimistic-concurrency
    conflict — retry on top of the new current snapshot)."""


_UNGUARDED = object()  # publish(expected_current=...) sentinel: no CAS check


class SnapshotStore:
    """Versioned, partitioned Parquet store with atomic publish."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def _catalog_dir(self, catalog: str) -> str:
        return os.path.join(self.root, catalog)

    def snapshot_path(self, catalog: str, version: str) -> str:
        return os.path.join(self._catalog_dir(catalog), version)

    def _manifest_path(self, catalog: str) -> str:
        return os.path.join(self._catalog_dir(catalog), MANIFEST_NAME)

    # -- publish (T2 + T3) ----------------------------------------------
    def publish(
        self,
        df: DataFrame,
        catalog: str,
        version: str,
        partition_by: tuple[str, ...] = PARTITION_COLS,
        gate: DataFrame | None = None,
        evolution: str = "additive",
        expected_current: str | None | object = _UNGUARDED,
    ) -> SnapshotInfo:
        """Write ``df`` as snapshot ``version`` and atomically point
        ``_CURRENT`` at it. UNGUARDED republish of the already-current
        version is an idempotent no-op. A GUARDED publish (with
        ``expected_current`` set) raises ``ConcurrentPublishError``
        exactly when ``expected_current`` no longer matches the current
        version — so a crash-after-flip retry that replays the ORIGINAL
        arguments (expected_current = the pre-flip version) raises,
        because the CAS guard runs before the no-op check; a retry that
        re-derives ``expected_current`` as the now-current version (or
        retries unguarded) lands on the idempotent no-op and succeeds.

        ``gate``: an optional data-quality violations DataFrame (e.g. a
        filtered ``relational.dq_violations_report``); if it contains ANY
        row, publication aborts BEFORE the manifest flip — readers keep
        the previous snapshot, making quality enforcement part of the
        atomic-publish contract rather than a separate step that can be
        forgotten. The gate is evaluated first so a failing batch writes
        nothing.

        ``evolution``: schema policy against the CURRENT snapshot —
        ``"additive"`` (default: new nullable columns may appear, but
        dropping a column or changing a type aborts; readers written
        against the old schema keep working), ``"strict"`` (schemas
        must be identical), ``"any"`` (no check — migrations). Checked
        before any write, like the gate: a rejected schema publishes
        nothing.

        ``expected_current``: optimistic concurrency for multi-writer
        catalogs. Pass the version this writer derived from (or None
        for "expect never-published") and the manifest flip becomes a
        compare-and-swap: if another writer published in between,
        ``ConcurrentPublishError`` is raised, the manifest is left on
        the other writer's snapshot, and this writer's data directory
        stays orphaned for ``vacuum`` — a lost-update can no longer be
        silent. The check-and-flip pair is serialized by an OS file
        lock next to the manifest (single-host writers; a multi-host
        deployment would route flips through one committer process, as
        object-store table formats do). Default: unguarded last-wins,
        the reference's symlink semantics (cache.go:85-91).
        """
        if gate is not None:
            bad = gate.limit(5).collect()
            if bad:
                raise ValueError(
                    f"publish gate failed for {catalog}@{version}: "
                    f"{len(bad)}+ violation rows, first: {bad[0]}"
                )
        current = self.current(catalog)
        if expected_current is not _UNGUARDED:
            # Guard BEFORE the idempotent no-op: two racing writers both
            # derive from v1 and both compute next version "v2" — if the
            # loser short-circuited on current.version == version it
            # would "succeed" returning the WINNER's v2 (different data)
            # instead of raising.
            curv = current.version if current is not None else None
            if curv != expected_current:
                # fail fast BEFORE the expensive write — the flip-time
                # re-check below closes the remaining race window
                raise ConcurrentPublishError(
                    f"{catalog}: expected current={expected_current!r}, "
                    f"found {curv!r} before write"
                )
        if current is not None and current.version == version:
            return current
        if current is not None and evolution != "any":
            self._check_evolution(current, df.schema, evolution)

        path = self.snapshot_path(catalog, version)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            # Sort by `name` within each task so parquet row-group min/max
            # stats on the lookup key are tight — the 3-key point lookup
            # (Q4, main.go:268) then skips row groups instead of scanning
            # the partition. Task-local sort: no extra shuffle.
            writable = (
                df.sortWithinPartitions("name") if "name" in df.columns else df
            )
            (
                writable.write.mode("overwrite")
                .partitionBy(*partition_by)
                .parquet(path)
            )
        info = SnapshotInfo(catalog, version, path, time.time(), df.schema.json())
        if expected_current is _UNGUARDED:
            self._flip_manifest(info)
            return info
        # CAS flip: re-verify under the lock so check+flip is atomic
        # against other same-host writers
        with self._publish_lock(catalog):
            now = self.current(catalog)
            nowv = now.version if now is not None else None
            if nowv != expected_current:
                raise ConcurrentPublishError(
                    f"{catalog}: expected current={expected_current!r}, "
                    f"found {nowv!r} at flip time — snapshot "
                    f"{version} written but NOT published"
                )
            self._flip_manifest(info)
        return info

    @contextmanager
    def _publish_lock(self, catalog: str):
        """Exclusive OS file lock serializing check+flip pairs for one
        catalog — shared by publish() and rollback() so their CAS paths
        can't interleave (ADVICE r6: rollback's check-then-flip raced
        a concurrent guarded publish)."""
        import fcntl

        cat_dir = self._catalog_dir(catalog)
        os.makedirs(cat_dir, exist_ok=True)
        lock_path = os.path.join(cat_dir, ".publish.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    @staticmethod
    def _check_evolution(current: SnapshotInfo, new_schema, mode: str) -> None:
        """Compare ``new_schema`` to the published snapshot's schema
        under the given policy (see publish). Pure metadata — no data
        read; field order is irrelevant (columnar formats address by
        name)."""
        from pyspark.sql.types import StructType

        if mode not in ("strict", "additive"):
            raise ValueError(f"unknown evolution mode {mode!r}")
        if current.schema_json is None:
            # Manifest written before the schema field existed — there
            # is nothing to compare against, so the check is vacuous.
            # (Republishing records the schema; evolution='any' skips.)
            return
        old = StructType.fromJson(json.loads(current.schema_json))
        old_fields = {f.name: f for f in old.fields}
        new_fields = {f.name: f for f in new_schema.fields}
        problems = []
        for name, f in old_fields.items():
            if name not in new_fields:
                problems.append(f"column dropped: {name}")
            elif new_fields[name].dataType != f.dataType:
                problems.append(
                    f"type changed: {name} "
                    f"{f.dataType.simpleString()} -> "
                    f"{new_fields[name].dataType.simpleString()}"
                )
        added = sorted(set(new_fields) - set(old_fields))
        if mode == "strict" and added:
            # additive allows ANY addition (nullability included):
            # snapshots are immutable, so old readers simply don't
            # select the new column — there is no back-fill hazard
            problems.extend(f"column added: {n}" for n in added)
        if problems:
            raise ValueError(
                f"schema evolution rejected ({mode}) vs "
                f"{current.catalog}@{current.version}: " + "; ".join(problems)
            )

    def _flip_manifest(self, info: SnapshotInfo) -> None:
        """Atomic publish pointer — the symlink-rename analog
        (cache.go:85-91) via POSIX ``os.replace``."""
        cat_dir = self._catalog_dir(info.catalog)
        os.makedirs(cat_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cat_dir, prefix=".manifest-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "version": info.version,
                        "path": info.path,
                        "published_at": info.published_at,
                        "schema": info.schema_json,
                    },
                    f,
                )
            os.replace(tmp, self._manifest_path(info.catalog))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # -- read ------------------------------------------------------------
    def current(self, catalog: str) -> SnapshotInfo | None:
        """Resolve the published snapshot (or None if never published)."""
        try:
            with open(self._manifest_path(catalog)) as f:
                m = json.load(f)
        except FileNotFoundError:
            return None
        return SnapshotInfo(
            catalog, m["version"], m["path"], m["published_at"], m.get("schema")
        )

    def read_version(self, spark: SparkSession, catalog: str, version: str) -> DataFrame:
        """Time travel: read a specific (non-current) snapshot version.
        Snapshots are immutable, so any version still on disk (i.e. not
        vacuumed) is exactly what was published — the reference's
        timestamped directories gave the same property but no reader API
        for old versions."""
        path = self.snapshot_path(catalog, version)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise FileNotFoundError(
                f"catalog {catalog!r} has no snapshot version {version!r}"
            )
        return spark.read.parquet(path)

    def read(self, spark: SparkSession, catalog: str) -> DataFrame:
        """DataFrame over the current snapshot (partition-discovery read:
        filters on ``package``/``schema`` prune directories).

        The manifest's recorded schema is applied when present: it makes
        an EMPTY snapshot readable (an upstream catalog can legitimately
        be empty; parquet alone cannot infer a schema from zero files)
        and pins column types independent of what discovery would guess.
        """
        info = self.current(catalog)
        if info is None:
            raise FileNotFoundError(f"catalog {catalog!r} has no published snapshot")
        reader = spark.read
        if info.schema_json:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(info.schema_json)))
        return reader.parquet(info.path)

    def rollback(
        self,
        catalog: str,
        version: str,
        expected_current: str | None | object = _UNGUARDED,
    ) -> SnapshotInfo:
        """Point ``_CURRENT`` back at an existing (non-vacuumed)
        snapshot — the recovery move when a bad publish slipped past the
        gate. Pure manifest flip: no data is written, the bad snapshot
        stays on disk for forensics until ``vacuum``. The recorded
        schema is re-derived from the target snapshot's parquet footer
        so post-rollback reads pin the OLD schema, not the bad one.
        ``expected_current`` gives the same CAS semantics as publish:
        the current()-recheck and the flip run under the same
        ``.publish.lock`` flock publish() uses, and the (slow) pyarrow
        schema derivation happens BEFORE the lock so a concurrent CAS
        publish can't land in a check→flip window (ADVICE r6)."""
        path = self.snapshot_path(catalog, version)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise FileNotFoundError(
                f"catalog {catalog!r} has no snapshot version {version!r}"
            )
        import pyarrow.dataset as pads
        from pyspark.sql.pandas.types import from_arrow_schema

        schema_json = None
        try:
            ds = pads.dataset(path, format="parquet", partitioning="hive")
            schema_json = from_arrow_schema(ds.schema).json()
        except Exception:
            pass  # schema pin is best-effort; read() falls back to discovery
        info = SnapshotInfo(catalog, version, path, time.time(), schema_json)
        if expected_current is _UNGUARDED:
            self._flip_manifest(info)
            return info
        with self._publish_lock(catalog):
            cur = self.current(catalog)
            curv = cur.version if cur is not None else None
            if curv != expected_current:
                raise ConcurrentPublishError(
                    f"{catalog}: expected current={expected_current!r}, "
                    f"found {curv!r} at rollback"
                )
            self._flip_manifest(info)
        return info

    # -- lifecycle -------------------------------------------------------
    def versions(self, catalog: str) -> list[str]:
        cat_dir = self._catalog_dir(catalog)
        if not os.path.isdir(cat_dir):
            return []
        return sorted(
            d for d in os.listdir(cat_dir)
            if not d.startswith((".", "_")) and os.path.isdir(os.path.join(cat_dir, d))
        )

    def drop(self, catalog: str) -> None:
        """Remove all snapshots for a catalog (LRU-eviction side effect,
        the ``os.RemoveAll`` analog of cache.go:30-33)."""
        shutil.rmtree(self._catalog_dir(catalog), ignore_errors=True)

    def compact(
        self,
        spark: SparkSession,
        catalog: str,
        files_per_partition: int = 1,
        partition_by: tuple[str, ...] = PARTITION_COLS,
    ) -> SnapshotInfo:
        """Rewrite the current snapshot with ``files_per_partition``
        files per Hive partition and flip the manifest to the compacted
        copy — the small-files maintenance job.

        Continuous ingest (one snapshot per micro-batch) and large
        cluster writes (one file per task per partition) both fragment
        partitions; at scale a listing of millions of tiny files costs
        more than the scan. Readers are never disturbed: the compacted
        snapshot is a NEW version published by the same atomic manifest
        flip, and the old one remains until vacuum(). Row content is
        identical — only the file layout changes.
        """
        info = self.current(catalog)
        if info is None:
            raise FileNotFoundError(f"catalog {catalog!r} has no published snapshot")
        df = spark.read.parquet(info.path)
        compacted = df.repartition(files_per_partition, *partition_by)
        return self.publish(
            compacted, catalog, f"{info.version}-compact", partition_by
        )

    def optimize(
        self,
        spark: SparkSession,
        catalog: str,
        zorder_cols: tuple[str, ...],
        n_files: int = 8,
    ) -> SnapshotInfo:
        """OPTIMIZE ZORDER for the snapshot store: rewrite the current
        snapshot clustered on the Z-curve of ``zorder_cols`` (see
        layout.write_zordered), write a file-level zone map next to it,
        and publish the clustered copy as a new atomic version. Readers
        switch to the multi-dimensionally-prunable layout on the
        manifest flip; the old version stays until vacuum(). Row content
        is identical — only physical order changes, so every query
        answers the same and 2-dim range scans prune on both file-list
        (zone map) and row-group (parquet stats) levels."""
        from .layout import with_zorder_key, write_zonemap

        info = self.current(catalog)
        if info is None:
            raise FileNotFoundError(f"catalog {catalog!r} has no published snapshot")
        df = spark.read.parquet(info.path)
        keyed = with_zorder_key(df, list(zorder_cols))
        version = f"{info.version}-zorder"
        path = self.snapshot_path(catalog, version)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            (
                keyed.repartitionByRange(n_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
                .write.mode("overwrite")
                .parquet(path)
            )
            write_zonemap(path, list(zorder_cols))
        out = SnapshotInfo(catalog, version, path, time.time(), df.schema.json())
        self._flip_manifest(out)
        return out


    def delete_where(
        self,
        spark: SparkSession,
        catalog: str,
        predicate: "str | Column",
        partition_by: tuple[str, ...] = PARTITION_COLS,
    ) -> SnapshotInfo:
        """Row-level DELETE as file-granularity copy-on-write: rewrite
        ONLY the Hive partitions that contain matching rows; every
        untouched partition is hard-linked into the new snapshot
        (metadata-only, no data movement — parquet files are immutable,
        so versions safely share inodes until vacuum() unlinks them).
        This is the Iceberg/Delta copy-on-write DELETE shape: at 100 TB
        a delete touching one package must not rewrite the other ten
        thousand.

        The predicate may reference any column. Deletes are atomic: the
        new snapshot is fully written (rewritten partitions + links +
        _SUCCESS) before the manifest flips, and the old version stays
        readable for time travel until vacuumed. A predicate matching
        nothing returns the current snapshot unchanged (no version
        churn). Capability analog: the reference rebuilds its whole
        cache to drop anything (cache.go getCatalogFS); this deletes
        in-place at partition granularity."""
        info = self.current(catalog)
        if info is None:
            raise FileNotFoundError(f"catalog {catalog!r} has no published snapshot")
        df = spark.read.parquet(info.path)
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        sep = "\x1f"
        key = F.concat_ws(sep, *[F.col(c).cast("string") for c in partition_by])
        # bounded collect: one row per AFFECTED partition, never data-sized
        hit = {
            r.k
            for r in df.filter(cond).select(key.alias("k")).distinct().collect()
        }
        if not hit:
            return info
        version = f"{info.version}-delete"
        path = self.snapshot_path(catalog, version)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            # rewrite ONLY hit partitions (partition-pruned scan: the
            # isin filter is on partition columns, so untouched
            # partitions are never read), keeping surviving rows
            survivors = df.filter(key.isin(*hit)).filter(~cond)
            (
                survivors.write.mode("overwrite")
                .partitionBy(*partition_by)
                .parquet(path)
            )
            self._link_untouched(info.path, path, partition_by, hit, sep="\x1f")
            # the write above creates _SUCCESS; ensure it exists even if
            # every hit partition deleted to empty
            open(os.path.join(path, "_SUCCESS"), "a").close()
        out = SnapshotInfo(catalog, version, path, time.time(), df.schema.json())
        self._flip_manifest(out)
        return out


    def update_where(
        self,
        spark: SparkSession,
        catalog: str,
        predicate: "str | Column",
        assignments: dict,
        partition_by: tuple[str, ...] = PARTITION_COLS,
    ) -> SnapshotInfo:
        """Row-level UPDATE as the same file-granularity copy-on-write
        as delete_where: only partitions containing matching rows are
        rewritten (with each assignment applied under the predicate);
        untouched partitions hard-link into the new snapshot. Updating
        a partition column moves rows: the rewritten survivors land in
        their new Hive directories first, then untouched-partition
        links are added file-by-file next to them — the destination
        partition ends up holding its old files plus the moved rows,
        which tests pin. Completes the DML triad with apply_changes
        (MERGE) and delete_where (DELETE)."""
        info = self.current(catalog)
        if info is None:
            raise FileNotFoundError(f"catalog {catalog!r} has no published snapshot")
        df = spark.read.parquet(info.path)
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        sep = "\x1f"
        key = F.concat_ws(sep, *[F.col(c).cast("string") for c in partition_by])
        hit = {
            r.k
            for r in df.filter(cond).select(key.alias("k")).distinct().collect()
        }
        if not hit:
            return info
        version = f"{info.version}-update"
        path = self.snapshot_path(catalog, version)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            updated = df.filter(key.isin(*hit))
            for col, expr in assignments.items():
                new_val = F.expr(expr) if isinstance(expr, str) else expr
                updated = updated.withColumn(
                    col, F.when(cond, new_val).otherwise(F.col(col))
                )
            (
                updated.write.mode("overwrite")
                .partitionBy(*partition_by)
                .parquet(path)
            )
            self._link_untouched(info.path, path, partition_by, hit, sep=sep)
            open(os.path.join(path, "_SUCCESS"), "a").close()
        out = SnapshotInfo(catalog, version, path, time.time(), df.schema.json())
        self._flip_manifest(out)
        return out

    @staticmethod
    def _link_untouched(
        old_path: str,
        new_path: str,
        partition_by: tuple[str, ...],
        hit: set,
        sep: str,
    ) -> None:
        """Hard-link every partition directory of ``old_path`` whose
        partition-value tuple is NOT in ``hit`` into ``new_path``,
        preserving the Hive directory layout. Pure filesystem metadata:
        no byte of parquet is copied."""
        depth = len(partition_by)

        def walk(cur: str, vals: list) -> None:
            if len(vals) == depth:
                if sep.join(vals) in hit:
                    return
                dst = os.path.join(new_path, *[
                    f"{c}={v}" for c, v in zip(partition_by, vals)
                ])
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(cur):
                    sp_, dp = os.path.join(cur, f), os.path.join(dst, f)
                    if os.path.isfile(sp_) and not os.path.exists(dp):
                        os.link(sp_, dp)
                return
            for entry in sorted(os.listdir(cur)):
                full = os.path.join(cur, entry)
                if os.path.isdir(full) and "=" in entry:
                    walk(full, vals + [entry.split("=", 1)[1]])

        walk(old_path, [])

    def vacuum(self, catalog: str, keep: int = 2) -> list[str]:
        """Delete all but the newest ``keep`` non-current snapshot dirs."""
        cur = self.current(catalog)
        removable = [v for v in self.versions(catalog) if cur is None or v != cur.version]
        victims = removable[:-keep] if keep else removable
        for v in victims:
            shutil.rmtree(self.snapshot_path(catalog, v), ignore_errors=True)
        return victims


OP_COL = "_op"  # changeset operation column: 'upsert' | 'delete'
KEY_COLS = ("package", "schema", "name")


def apply_changes(
    current: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Merge a CDC changeset into a snapshot: rows keyed like the store
    with an ``_op`` column ('upsert' inserts-or-replaces, 'delete'
    removes). Returns the next snapshot's content.

    The reference can only re-materialize a whole catalog per refresh
    (cache.go:71-81); this is the incremental path — cost scales with
    |changes| + one co-partitioned full-outer join, not with catalog
    size re-parsed. Last occurrence wins within the changeset (same
    contract as shred_metas)."""
    from pyspark.sql import Window, functions as F

    if OP_COL not in changes.columns:
        raise ValueError(f"changeset needs an {OP_COL!r} column")
    bad = changes.filter(~F.col(OP_COL).isin("upsert", "delete")).limit(1).count()
    if bad:
        raise ValueError(f"{OP_COL!r} values must be 'upsert' or 'delete'")

    w = Window.partitionBy(*key_cols).orderBy(F.desc("_change_pos"))
    latest = (
        changes.withColumn("_change_pos", F.monotonically_increasing_id())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_change_pos")
    )
    keys = list(key_cols)
    data_cols = [c for c in current.columns if c not in keys]
    merged = current.alias("cur").join(latest.alias("chg"), keys, "full_outer")
    keep_current = F.col(f"chg.{OP_COL}").isNull()
    is_upsert = F.col(f"chg.{OP_COL}") == "upsert"
    out_cols = [F.col(k) for k in keys] + [
        F.when(keep_current, F.col(f"cur.{c}"))
        .otherwise(F.col(f"chg.{c}"))
        .alias(c)
        for c in data_cols
    ]
    return merged.filter(keep_current | is_upsert).select(*out_cols)


# --------------------------------------------------------------------------
# Incremental materialized-view maintenance (algebraic partial aggregates)
# --------------------------------------------------------------------------

MV_MEASURE_FIELDS = ("sum", "sumsq", "min", "max")


def mv_partials(
    df: DataFrame,
    keys: tuple[str, ...],
    measures: tuple[str, ...],
    distinct: tuple[str, ...] = (),
    quantiles: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group ALGEBRAIC partial state for an aggregate view: count +
    per-measure (sum, sum-of-squares, min, max). Every field is
    mergeable (sum-of-sums, min-of-mins…), which is what makes the view
    incrementally maintainable — avg and variance finalize from the
    partials without revisiting base rows.

    ``distinct`` columns get a Datasketches HLL sketch (Spark 4
    ``hll_sketch_agg``) as their partial state: COUNT(DISTINCT) is not
    algebraic (exact partials would need the full value set per group),
    but the sketch IS losslessly mergeable — the standard way an
    incrementally-maintained view supports distinct counts at 100 TB.

    ``quantiles`` columns get a Datasketches KLL sketch
    (``kll_sketch_agg_double``) as their partial state: percentiles are
    HOLISTIC — exact partials would need every value — but the KLL
    sketch is mergeable with a proven normalized-rank-error bound
    (~1.65% at the default k=200), so the view maintains p50/p90/p99
    the same way it maintains HLL NDV: O(sketch) state per group,
    refresh never revisits base rows. NULL semantics (ADVICE r9):
    ``kll_sketch_agg_double`` skips NULLs, so the sketch's exact row
    count (kll_sketch_get_n) equals the column's NON-NULL count, not
    the group's ``_cnt`` — each quantiles column therefore also carries
    a mergeable ``_n_{col}`` non-null-count partial, and the pinned
    n-exactness law is ``kll_sketch_get_n == _n_{col}`` through any
    merge tree."""
    from pyspark.sql import functions as F

    aggs = [F.count("*").alias("_cnt")]
    for m in measures:
        c = F.col(m).cast("double")
        aggs += [
            F.sum(c).alias(f"_sum_{m}"),
            F.sum(c * c).alias(f"_sumsq_{m}"),
            F.min(c).alias(f"_min_{m}"),
            F.max(c).alias(f"_max_{m}"),
        ]
    for d in distinct:
        aggs.append(F.hll_sketch_agg(d).alias(f"_hll_{d}"))
    for q in quantiles:
        aggs.append(
            F.kll_sketch_agg_double(F.col(q).cast("double")).alias(f"_kll_{q}")
        )
        aggs.append(F.count(q).alias(f"_n_{q}"))
    return df.groupBy(*keys).agg(*aggs)


def mv_merge(
    state: DataFrame,
    delta: DataFrame,
    keys: tuple[str, ...],
    measures: tuple[str, ...],
    distinct: tuple[str, ...] = (),
    quantiles: tuple[str, ...] = (),
) -> DataFrame:
    """Merge delta partials into view state: one union + one group-by on
    the view key. Refresh cost is O(|delta| + |groups|) — never O(base),
    the whole point of incremental view maintenance at 100 TB (the
    reference re-materializes everything per refresh, cache.go:71-81).
    HLL sketch columns merge with ``hll_union_agg`` (lossless for
    same-configured sketches); KLL quantile sketches merge with
    ``kll_merge_agg_double`` (error bound preserved, n exact).

    Legacy-state migration (ADVICE r10): state persisted by the
    pre-r10 schema carries ``_kll_{col}`` but not the ``_n_{col}``
    non-null-count partial that r9's NULL-semantics fix added. Rather
    than failing the union with an opaque missing-column
    AnalysisException, either side lacking ``_n_{col}`` is backfilled
    EXACTLY from its own sketch: ``kll_sketch_get_n_double`` returns
    the sketch's exact (not estimated) update count, and the sketch
    skips NULLs, so get_n IS the non-null count the partial would have
    recorded — a lossless schema upgrade, no base-row access."""
    from pyspark.sql import functions as F

    def _backfill_n(df: DataFrame) -> DataFrame:
        for q in quantiles:
            if f"_n_{q}" not in df.columns:
                # an all-NULL group has a NULL sketch: get_n(NULL) is
                # NULL, but the native F.count partial records 0 — and
                # a NULL partial would survive the merge SUM and break
                # the pinned get_n == _n exactness law
                df = df.withColumn(
                    f"_n_{q}",
                    F.coalesce(
                        F.kll_sketch_get_n_double(f"_kll_{q}"), F.lit(0)
                    ),
                )
        return df

    state = _backfill_n(state)
    delta = _backfill_n(delta)

    aggs = [F.sum("_cnt").alias("_cnt")]
    for m in measures:
        aggs += [
            F.sum(f"_sum_{m}").alias(f"_sum_{m}"),
            F.sum(f"_sumsq_{m}").alias(f"_sumsq_{m}"),
            F.min(f"_min_{m}").alias(f"_min_{m}"),
            F.max(f"_max_{m}").alias(f"_max_{m}"),
        ]
    for d in distinct:
        aggs.append(F.hll_union_agg(f"_hll_{d}").alias(f"_hll_{d}"))
    for q in quantiles:
        aggs.append(F.kll_merge_agg_double(f"_kll_{q}").alias(f"_kll_{q}"))
        aggs.append(F.sum(f"_n_{q}").alias(f"_n_{q}"))
    return state.unionByName(delta).groupBy(*keys).agg(*aggs)


def mv_finalize(
    partials: DataFrame,
    keys: tuple[str, ...],
    measures: tuple[str, ...],
    distinct: tuple[str, ...] = (),
    quantiles: tuple[str, ...] = (),
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Finalize partial state into the user-facing view: count, per
    measure sum/avg/min/max/population variance, per distinct column
    the HLL estimate, and per quantile column the KLL percentile
    estimates at ``probs`` — all computed from the algebraic fields,
    no base-table access."""
    from pyspark.sql import functions as F

    cols = [F.col(k) for k in keys] + [F.col("_cnt").alias("n_rows")]
    for m in measures:
        s, q, cnt = F.col(f"_sum_{m}"), F.col(f"_sumsq_{m}"), F.col("_cnt")
        mean = s / cnt
        cols += [
            s.alias(f"sum_{m}"),
            mean.alias(f"avg_{m}"),
            F.col(f"_min_{m}").alias(f"min_{m}"),
            F.col(f"_max_{m}").alias(f"max_{m}"),
            (q / cnt - mean * mean).alias(f"var_{m}"),
        ]
    for d in distinct:
        cols.append(F.hll_sketch_estimate(f"_hll_{d}").alias(f"approx_ndv_{d}"))
    for qc in quantiles:
        for p in probs:
            cols.append(
                F.kll_sketch_get_quantile_double(f"_kll_{qc}", F.lit(p)).alias(
                    f"p{int(round(p * 100)):02d}_{qc}"
                )
            )
    return partials.select(*cols)


class MaterializedView:
    """An incrementally-maintained aggregate view on top of
    SnapshotStore: partial-aggregate state is the stored relation, each
    refresh publishes a new atomic version (readers never see a half-
    merged view; time travel and vacuum come free from the store)."""

    def __init__(
        self,
        store: SnapshotStore,
        catalog: str,
        keys: tuple[str, ...],
        measures: tuple[str, ...],
        distinct: tuple[str, ...] = (),
        quantiles: tuple[str, ...] = (),
    ) -> None:
        self.store = store
        self.catalog = catalog
        self.keys = tuple(keys)
        self.measures = tuple(measures)
        self.distinct = tuple(distinct)
        self.quantiles = tuple(quantiles)

    def build(
        self,
        base: DataFrame,
        version: str = "v000001",
        epoch_tag: str | None = None,
    ) -> SnapshotInfo:
        """Initial full computation — the only base-sized pass. The
        optional ``epoch_tag`` suffixes the version (see refresh) so a
        replayed FIRST micro-batch is recognized and skipped too."""
        if epoch_tag is not None:
            version = f"{version}-{epoch_tag}"
        return self.store.publish(
            mv_partials(
                base, self.keys, self.measures, self.distinct, self.quantiles
            ),
            self.catalog,
            version,
            partition_by=(),
        )

    @staticmethod
    def _epoch_of(version: str) -> str | None:
        """The epoch tag riding in a version string (``v%06d[-<tag>]``),
        or None for an untagged version."""
        i = version.find("-")
        return version[i + 1:] if i >= 0 else None

    @staticmethod
    def _already_applied(last_tag: str | None, epoch_tag: str) -> bool:
        """True iff a replay carrying ``epoch_tag`` was already folded.

        Exact match covers the common crash-replay case; for the
        monotone ``[r<runid>-]e<digits>`` tags the streaming layer
        emits, any NUMERICALLY OLDER epoch FROM THE SAME RUN is also
        applied (foreachBatch replays only the last uncommitted epoch,
        so every same-run epoch <= the last applied one committed) —
        this is what makes the guard survive an untagged manual refresh
        landing between crash and replay. The run-id scope (ADVICE r12):
        the numeric-older rule assumed exactly one monotone epoch
        source per catalog, so a stream legitimately restarted with a
        FRESH checkpoint (epoch counter back at 0) or a second writer
        stream had its early epochs silently no-op'd and their deltas
        dropped. Tags now carry the emitting checkpoint's identity
        (``r<runid>-e<epoch>``, see stream_refresh_mv) and the
        numeric-older rule applies only when both run ids match —
        and a run id is EXACTLY eight lowercase hex digits (what
        checkpoint_run_id emits), so an arbitrary custom tag that
        merely looks run-shaped ('reload-e7') still falls back to
        equality-only instead of silently adopting monotone
        semantics. Across different runs — including one tagged,
        one legacy untagged — only full-string equality skips. Residual
        assumptions (documented, not enforced): wiping a checkpoint
        dir IN PLACE reuses its run id, so its reset epochs still
        no-op; and upgrading a CRASHED legacy-tagged stream re-folds
        its one uncommitted epoch under the new tag scheme — shut a
        stream down cleanly before changing its tag format.
        Non-numeric custom tags fall back to equality only."""
        if last_tag is None:
            return False
        if last_tag == epoch_tag:
            return True
        import re

        pat = r"(?:r([0-9a-f]{8})-)?e(\d+)"
        m_last = re.fullmatch(pat, last_tag)
        m_new = re.fullmatch(pat, epoch_tag)
        return bool(
            m_last
            and m_new
            and m_last.group(1) == m_new.group(1)
            and int(m_new.group(2)) <= int(m_last.group(2))
        )

    def refresh(
        self, delta: DataFrame, epoch_tag: str | None = None
    ) -> SnapshotInfo:
        """Fold an append-only delta into the view: aggregate the delta,
        merge with current state, publish the next version atomically.

        ``epoch_tag`` (streaming replay idempotence): when set, the tag
        rides in the published version string, and a refresh whose tag
        is already applied (equal to the current tag, or numerically
        older for the monotone ``e<digits>`` tags) is a no-op returning
        the current snapshot — so an at-least-once foreachBatch replay
        of an already-folded micro-batch (crash after publish, before
        the streaming checkpoint commit) cannot double-count the delta.
        The tag is part of the same atomic _CURRENT flip as the data,
        so there is no window where the fold landed but the tag did
        not. An UNTAGGED manual refresh carries the last applied tag
        forward into its own version string for the same reason: if it
        landed between the crash and the replay, the replayed epoch
        must still be recognized as applied (ADVICE r11)."""
        cur = self.store.current(self.catalog)
        if cur is None:
            return self.build(delta, epoch_tag=epoch_tag)
        last_tag = self._epoch_of(cur.version)
        if epoch_tag is not None and self._already_applied(last_tag, epoch_tag):
            return cur
        spark = delta.sparkSession
        state = self.store.read_version(spark, self.catalog, cur.version)
        merged = mv_merge(
            state,
            mv_partials(
                delta, self.keys, self.measures, self.distinct, self.quantiles
            ),
            self.keys,
            self.measures,
            self.distinct,
            self.quantiles,
        )
        import re

        n = int(re.match(r"v(\d+)", cur.version).group(1))
        carried = epoch_tag if epoch_tag is not None else last_tag
        nxt = f"v{n + 1:06d}" + (f"-{carried}" if carried else "")
        return self.store.publish(merged, self.catalog, nxt, partition_by=())

    def read(self, spark: SparkSession) -> DataFrame:
        """The finalized user-facing view at the current version."""
        return mv_finalize(
            self.store.read(spark, self.catalog),
            self.keys,
            self.measures,
            self.distinct,
            self.quantiles,
        )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Change-data diff between two snapshot versions: one co-partitioned
    full-outer join on the key, classifying each key as 'insert' (new
    only), 'delete' (old only), or 'update' (both sides present but any
    non-key column differs; identical rows are dropped). The inverse of
    apply_changes — diff(v1, v2) applied to v1 reproduces v2 — which
    turns the store's immutable version history into a CDC feed
    downstream consumers can subscribe to without rescanning snapshots.

    Column comparison is null-safe (eqNullSafe) per shared non-key
    column; at 100 TB the join shuffles both sides once on the key and
    everything else is a narrow projection."""
    from pyspark.sql import functions as F

    keys = list(key_cols)
    data_cols = [c for c in new.columns if c not in keys]
    shared = [c for c in data_cols if c in old.columns]
    # presence flags must not depend on nullable data columns: use a
    # sentinel from each side
    o2 = old.select(*keys, F.lit(True).alias("_in_old"), *[F.col(c).alias(f"_o_{c}") for c in shared])
    n2 = new.select(*keys, F.lit(True).alias("_in_new"), *[F.col(c).alias(f"_n_{c}") for c in data_cols])
    j = o2.join(n2, keys, "full_outer")
    same = F.lit(True)
    for c in shared:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("_op", op)
        .filter(F.col("_op").isNotNull())
        .select(
            *keys,
            "_op",
            *[
                F.when(F.col("_op") != "delete", F.col(f"_n_{c}"))
                .otherwise(F.col(f"_o_{c}") if c in shared else F.lit(None))
                .alias(c)
                for c in data_cols
            ],
        )
    )


def table_stats(store: SnapshotStore, catalog: str) -> dict:
    """Physical table report for the CURRENT snapshot — file count,
    total bytes, row count, row groups, per-file mean size — from
    parquet FOOTERS only (no data read, no Spark job): the maintenance
    signal that drives compact()/optimize() decisions (small-files
    pressure, row-group shape). Metadata-sized at any table size."""
    import glob

    import pyarrow.parquet as pq

    info = store.current(catalog)
    if info is None:
        raise FileNotFoundError(f"catalog {catalog!r} has no published snapshot")
    files = [
        f
        for f in glob.glob(os.path.join(info.path, "**", "*.parquet"), recursive=True)
    ]
    n_rows = n_groups = n_bytes = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        n_rows += meta.num_rows
        n_groups += meta.num_row_groups
        n_bytes += os.path.getsize(f)
    return {
        "catalog": catalog,
        "version": info.version,
        "n_files": len(files),
        "n_rows": n_rows,
        "n_row_groups": n_groups,
        "total_bytes": n_bytes,
        "mean_file_bytes": n_bytes // max(1, len(files)),
        "mean_rows_per_group": n_rows // max(1, n_groups),
    }
