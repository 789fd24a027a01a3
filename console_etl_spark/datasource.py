"""Custom Python Data Source (Spark 4 DataSource API): the reference's
concatenated-JSON meta stream as a first-class ``spark.read.format``.

The reference consumes ``all.json`` through a custom reader
(``declcfg.WalkMetasReader``, /root/reference/cache.go:96) rather than a
generic JSON parser, because the stream is concatenated/pretty-printed
documents, not JSON-lines. ``ingest.read_meta_stream`` re-expresses that
as text-read + mapInPandas; this module goes one step further and mounts
the same tokenizer behind Spark's native source extension point, so the
stream composes like any built-in format::

    spark.dataSource.register(MetaStreamDataSource)
    df = spark.read.format("console_meta").load("/path/to/dumps")

Execution model: one input partition per stream file (a concatenated
document can span arbitrary byte ranges, so files are the atomic split —
the same granularity Spark's own multiLine JSON uses). Each partition
walks its file with the depth-tracking splitter and emits byte-faithful
blobs plus envelope fields; ``_pos`` encodes (file, offset) so last-wins
dedup downstream (``shred_metas``) keeps the reference's sequential-
overwrite semantics across a multi-file directory listed in name order.
At cluster scale a dump directory fans out one task per file; truncated
documents raise (the reference propagates decode errors, cache.go:96-98)
instead of silently ingesting a partial catalog.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def register_meta_source(spark) -> None:
    """Register ``format("console_meta")`` on a session. Also enables
    ``spark.sql.python.filterPushdown.enabled`` (runtime-settable):
    Spark refuses to plan a reader implementing ``pushFilters`` while
    that conf is off, so registration and the conf travel together —
    correct on ANY session, vanilla included."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(MetaStreamDataSource)


class _FilePartition(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


META_STREAM_SCHEMA = (
    "schema string, package string, name string, blob string, _pos long"
)


class MetaStreamDataSource(DataSource):
    """``format("console_meta")`` — options: ``path`` (file or directory
    of stream files). Register via :func:`register_meta_source` (it also
    enables the runtime-settable Python-pushdown conf this reader needs)."""

    @classmethod
    def name(cls) -> str:
        return "console_meta"

    def schema(self) -> str:
        return META_STREAM_SCHEMA

    def reader(self, schema):
        return MetaStreamReader(self.options)

    def simpleStreamReader(self, schema):
        return MetaStreamSimpleStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return MetaStreamWriter(self.options, overwrite)


class MetaStreamReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("console_meta requires a path")
        self._pushed: list[tuple[str, str]] = []

    def pushFilters(self, filters):
        """Push envelope equality predicates into the scan (Spark 4.1
        DataSource pushdown): ``schema/package/name = literal`` skips
        non-matching documents at tokenize time, before any row reaches
        Spark — the catalog queries' dominant predicate shape (the
        3-key point lookup, main.go:268). Everything else is returned
        for Spark to evaluate post-scan."""
        from pyspark.sql.datasource import EqualTo

        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in ("schema", "package", "name")
                and (f.value is None or isinstance(f.value, str))
            ):
                self._pushed.append((f.attribute[0], f.value))
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        import os

        p = self.path
        if os.path.isdir(p):
            # isfile filter: a stray subdirectory inside a dump dir must
            # not become a partition whose open() dies at execution time
            files = sorted(
                fp
                for f in os.listdir(p)
                if not f.startswith((".", "_"))
                and os.path.isfile(fp := os.path.join(p, f))
            )
        else:
            files = [p]
        if not files:
            raise ValueError(f"console_meta: no stream files under {p}")
        return [_FilePartition(i, f) for i, f in enumerate(files)]

    def read(self, partition: _FilePartition):
        import json

        from console_etl_spark.ingest import split_concatenated_json

        with open(partition.path, encoding="utf-8") as fh:
            text = fh.read()
        base = partition.index << 32  # file-major stream position
        for seq, blob in enumerate(split_concatenated_json(text)):
            doc = json.loads(blob)
            # _pos stays the document's true stream position even when
            # pushdown skips rows — last-wins ordering is unaffected
            if any(doc.get(attr) != val for attr, val in self._pushed):
                continue
            yield (
                doc.get("schema"),
                doc.get("package"),
                doc.get("name"),
                blob,
                base + seq,
            )


def _list_stream_files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            fp
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
            and os.path.isfile(fp := os.path.join(path, f))
        )
    import os.path as osp

    return [path] if osp.isfile(path) else []


def _read_file_docs(path: str, file_index: int):
    import json

    from console_etl_spark.ingest import split_concatenated_json

    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    base = file_index << 32
    for seq, blob in enumerate(split_concatenated_json(text)):
        doc = json.loads(blob)
        yield (
            doc.get("schema"),
            doc.get("package"),
            doc.get("name"),
            blob,
            base + seq,
        )


class MetaStreamSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of ``format("console_meta")`` — the native analog
    of the reference's pull-based refresh (S3, cache.go:37-93): each
    micro-batch picks up newly-arrived dump files, the offset is the
    count of files consumed from the name-sorted listing (dumps are
    append-only: new dumps get later names, the fixture convention).
    ``readBetweenOffsets`` replays the exact file range, which is what
    makes checkpoint recovery exactly-once; rows carry the same
    file-major ``_pos`` as the batch reader so last-wins shredding is
    identical either way."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("console_meta requires a path")

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def read(self, start: dict):
        files = _list_stream_files(self.path)
        n0 = int(start["n_files"])
        rows: list[tuple] = []
        for i in range(n0, len(files)):
            rows.extend(_read_file_docs(files[i], i))
        return iter(rows), {"n_files": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_stream_files(self.path)
        rows: list[tuple] = []
        for i in range(int(start["n_files"]), int(end["n_files"])):
            rows.extend(_read_file_docs(files[i], i))
        return iter(rows)


# --------------------------------------------------------------------------
# Batch WRITE side: the dump-producer role (what the reference only
# consumes, this source can also emit) — df.write.format("console_meta")
# --------------------------------------------------------------------------


class _WroteFile(WriterCommitMessage):
    """Commit message: the file a task wrote (for abort cleanup)."""

    def __init__(self, path: str):
        self.path = path


class MetaStreamWriter(DataSourceWriter):
    """Per-task writer: each partition's rows become ONE concatenated-
    JSON dump file (``part-<pid>-<uuid>.json``) holding the byte-faithful
    ``blob`` of every row — the exact stream format the reader tokenizes,
    so read→write→read round-trips blob-identically. Commit drops a
    ``_SUCCESS`` marker (the atomic-visibility convention every consumer
    in this repo already respects); abort removes the written files."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("console_meta write requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        fname = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.json"
        )
        n = 0
        with open(fname, "w", encoding="utf-8") as fh:
            for row in iterator:
                blob = row["blob"]
                if blob is None:
                    continue
                fh.write(blob)
                fh.write("\n")
                n += 1
        if n == 0:
            os.remove(fname)
            return _WroteFile("")
        return _WroteFile(fname)

    def commit(self, messages):
        import os

        if self.overwrite:
            written = {m.path for m in messages if m and m.path}
            for f in os.listdir(self.path):
                fp = os.path.join(self.path, f)
                if (
                    os.path.isfile(fp)
                    and fp not in written
                    and not f.startswith("_")
                ):
                    os.remove(fp)
        open(os.path.join(self.path, "_SUCCESS"), "w").close()

    def abort(self, messages):
        import os

        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)
