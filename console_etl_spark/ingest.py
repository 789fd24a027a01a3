"""Ingest: semi-structured JSON meta stream → envelope-derived snapshot.

Re-expresses the reference's shred pipeline (S4 + T1 + T2,
/root/reference/cache.go:95-119): a concatenated stream of JSON "meta"
documents is parsed, the partition key is derived with a 3-way
conditional, and records land partitioned by (package, schema).

The reference walks the stream record-at-a-time in one goroutine
(cache.go:96-114); here the whole shred is a declarative plan —
``spark.read.json`` distributes the parse across executors, the
key-derivation is a Catalyst ``CASE WHEN`` (codegen'd, JVM-side), and the
partitioned write streams through the shuffle-free path (each task writes
its own partition files). Constant memory per task, scales with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA_PACKAGE = "olm.package"
GLOBAL_PACKAGE = "__global"

# Envelope of a meta record (cache.go:96-113): fixed typed columns +
# opaque JSON payload, schema-on-read.
META_ENVELOPE = T.StructType(
    [
        T.StructField("schema", T.StringType(), False),
        T.StructField("package", T.StringType(), True),
        T.StructField("name", T.StringType(), False),
        T.StructField("blob", T.StringType(), True),
    ]
)


def derive_partition_key(
    schema: Column, package: Column, name: Column, package_schema: str = SCHEMA_PACKAGE
) -> Column:
    """The reference's partition-key fallback triple (cache.go:100-106).

    Exactly its order of application:
      1. rows of schema ``package_schema`` (``olm.package`` in the
         reference) are keyed by their *name* — the package object IS
         the package;
      2. whatever key resulted, if empty/null → ``__global``.
    """
    key = F.when(schema == package_schema, name).otherwise(package)
    return (
        F.when(key.isNull() | (key == ""), F.lit(GLOBAL_PACKAGE))
        .otherwise(key)
    )


def add_blob_variant(df: DataFrame, src: str = "blob", out: str = "blob_v") -> DataFrame:
    """Derive a Spark 4 VARIANT column beside the byte-faithful blob
    string: ``parse_json`` shreds the JSON once at ingest into the
    binary VARIANT encoding, so every later path read is a
    ``variant_get`` over pre-tokenized bytes instead of re-parsing the
    string per query per path (the reference stores blobs verbatim and
    re-parses on demand, cache.go:111 / main.go:268 — at 100 TB that
    repeated tokenization dominates point-lookup cost).

    The string column stays: serving byte-faithful blobs (Q4) reads it
    untouched; schema-on-read queries use the VARIANT twin. Both survive
    the parquet snapshot round trip (store.publish / read_current)."""
    return df.withColumn(out, F.parse_json(F.col(src)))


def shred_metas(raw: DataFrame) -> DataFrame:
    """Derive the envelope: replace ``package`` with the partition key,
    and enforce the store invariant of one object per
    ``(package, schema, name)``.

    The reference writes ``<package>/<schema>/<name>.json`` per record
    (cache.go:107-114), so a duplicate key in the stream silently
    overwrites — last record wins. Here that is a windowed dedup: when the
    input carries a ``_pos`` stream-position column (``read_meta_stream``
    adds one) the highest position survives; otherwise ties break on
    ``blob`` so the result is still deterministic. The window shuffles on
    the same (package, schema) keys the snapshot write partitions by, so
    at scale the exchange is reused rather than added.
    """
    from pyspark.sql.window import Window

    df = raw.withColumn(
        "package",
        derive_partition_key(F.col("schema"), F.col("package"), F.col("name")),
    )
    order = [F.col("_pos").desc()] if "_pos" in df.columns else []
    order.append(F.col("blob").desc())
    w = Window.partitionBy("package", "schema", "name").orderBy(*order)
    df = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return df.drop("_pos") if "_pos" in df.columns else df


def parse_meta_lines(raw: DataFrame, text_col: str = "value") -> DataFrame:
    """Envelope extraction from raw JSON-document lines (one doc per row).

    Reads each line once: the envelope fields are extracted from the raw
    text with ``get_json_object`` so we keep byte-faithful blobs without a
    second pass or schema inference over arbitrary payloads. Works on any
    text-shaped DataFrame — the batch file read below and the streaming
    micro-batches in streaming.stream_ingest_metas share this path.
    """
    raw = raw.withColumnRenamed(text_col, "blob") if text_col != "blob" else raw
    raw = raw.filter(F.length(F.trim("blob")) > 0)
    return raw.select(
        F.get_json_object("blob", "$.schema").alias("schema"),
        F.get_json_object("blob", "$.package").alias("package"),
        F.get_json_object("blob", "$.name").alias("name"),
        F.col("blob"),
        # stream position for last-wins dedup in shred_metas: ids increase
        # with file offset, matching the reference's sequential overwrite
        F.monotonically_increasing_id().alias("_pos"),
    )


def split_concatenated_json(text: str) -> list[str]:
    """Split a CONCATENATED JSON stream into top-level documents.

    The reference's ``declcfg.WalkMetasReader`` (cache.go:96) consumes a
    raw ``all.json`` whose documents may be pretty-printed, span lines,
    or butt up against each other (``}{``) — not JSON-lines. This is the
    same tokenizer-level walk: track brace depth outside strings (with
    escape handling) and emit each depth-0 ``{...}`` span byte-faithfully.

    A stream that ends mid-document (truncated download, corrupt file)
    raises ``ValueError`` — the reference propagates decode errors
    (cache.go:96-98) and silently dropping the tail would ingest a
    partial catalog with no signal (ADVICE r2).
    """
    docs: list[str] = []
    depth = 0
    start = -1
    in_str = False
    esc = False
    for i, ch in enumerate(text):
        if esc:
            esc = False
        elif in_str:
            if ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}" and depth > 0:
            depth -= 1
            if depth == 0:
                docs.append(text[start : i + 1])
                start = -1
    if depth != 0 or in_str:
        raise ValueError(
            f"truncated JSON stream: document starting at byte {start} never closes"
        )
    return docs


def _probe_is_jsonl(path: str, sample_bytes: int = 65536) -> bool:
    """Head-probe a LOCAL stream file: JSON-lines iff every complete
    line in the sample is a standalone JSON document. Bounded read
    (one head block), driver-side by design — it inspects format, not
    data."""
    import json
    import os

    if not os.path.isfile(path):
        return False  # directory/glob: can't cheaply probe — use the splitter
    with open(path, encoding="utf-8", errors="replace") as f:
        sample = f.read(sample_bytes)
        truncated = bool(f.read(1))
    lines = sample.splitlines()
    if truncated and lines:
        lines = lines[:-1]  # drop the cut-off tail line
    lines = [ln for ln in lines if ln.strip()]
    if not lines:
        return False
    for ln in lines:
        try:
            json.loads(ln)
        except ValueError:
            return False
    return True


def read_meta_stream(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    """Parse a meta stream file (the ``all.json`` analog, cache.go:49)
    keeping each whole document as ``blob``.

    ``fmt='jsonl'``: strict one-doc-per-line — Spark splits WITHIN files,
    the fully-streamable scale path. ``fmt='concat'``: arbitrary
    concatenated/pretty-printed JSON — one task per file (the same
    execution model as Spark's own ``multiLine`` JSON source), documents
    split by the depth-tracking walker above inside ``mapInPandas``.
    ``fmt='auto'`` head-probes the file and picks: JSONL streams keep
    per-line parallelism, anything else gets the faithful splitter. The
    probe reads only the head, so a stream that is one-doc-per-line
    early but pretty-printed later would misclassify — the auto path
    therefore VALIDATES the JSONL parse (every non-empty line must be a
    standalone JSON document; a multi-line fragment is not) and falls
    back to the splitter on violation (ADVICE r2). Pass ``fmt='jsonl'``
    explicitly to skip the validation scan on trusted inputs.
    """
    if fmt == "auto":
        if _probe_is_jsonl(path):
            jsonl = parse_meta_lines(spark.read.text(path))
            bad = (
                jsonl.filter(F.get_json_object("blob", "$").isNull())
                .limit(1)
                .count()
            )
            if bad == 0:
                return jsonl
        fmt = "concat"
    if fmt == "jsonl":
        return parse_meta_lines(spark.read.text(path))
    if fmt != "concat":
        raise ValueError(f"unknown meta stream format {fmt!r}")

    import pandas as pd

    def split_batches(it):
        for pdf in it:
            out: list[str] = []
            for txt in pdf["value"]:
                out.extend(split_concatenated_json(txt))
            yield pd.DataFrame({"blob": pd.Series(out, dtype="object")})

    whole = spark.read.text(path, wholetext=True)
    return parse_meta_lines(whole.mapInPandas(split_batches, "blob string"), "blob")


def ingest_meta_stream(spark: SparkSession, path: str) -> DataFrame:
    """Full S4→T1 pipeline: parse stream, derive envelope. The result is
    ready for ``SnapshotStore.publish`` (T2/T3)."""
    return shred_metas(read_meta_stream(spark, path))
