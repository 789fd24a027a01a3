"""Source/sink format layer (SURVEY.md §2.2, file-format scans row).

The reference reads exactly one format — a concatenated JSON document
stream (/root/reference/cache.go:49,96) — and serves JSON files back
(/root/reference/main.go:268). This module generalizes the engine's edge
to the formats a Spark deployment actually meets: Parquet (the store
format), ORC, JSON-lines, and CSV, all through the built-in readers so
predicate pushdown / column pruning / partition discovery keep working.

Format notes (the rules that make round-trips lossless):
- CSV is schema-blind: a schema (or a sample DataFrame to borrow it
  from) is REQUIRED — inference would silently widen int32→int64 and
  parse timestamps local-time. Timestamps are pinned to a UTC ISO
  format on both sides.
- JSON-lines loses nothing Spark-side but encodes timestamps as
  strings; the same pinned format round-trips them.
- Parquet/ORC are self-describing; options pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # lossless to micros, UTC-pinned


def _format_options(fmt: str) -> dict[str, str]:
    if fmt == "csv":
        return {"header": "true", "timestampFormat": _TS_FMT, "escape": '"'}
    if fmt == "json":
        return {"timestampFormat": _TS_FMT}
    return {}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats (csv/json) should pass
    ``schema`` — see module doc; self-describing formats ignore it."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    if fmt == "csv" and schema is None:
        raise ValueError("csv requires an explicit schema (inference is lossy)")
    reader = spark.read.format(fmt).options(**{**_format_options(fmt), **options})
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    media_type_by_ext: dict[str, str] | None = None,
) -> DataFrame:
    """Read a directory of media files through Spark's built-in
    ``binaryFile`` source into the multimodal tier's binary-table shape
    (doc_id, payload, media_type, n_bytes) + the source path.

    The binaryFile source is the production front door for image/audio
    payloads: distributed listing, per-file rows, pushdown on
    path/modificationTime/length (a ``pathGlobFilter`` prunes at
    listing time, before any bytes move). doc_id is a deterministic
    content-address (xxhash64 of path) so re-ingests are stable;
    media_type is derived from the extension, overridable per-call.
    Feed the result straight to ``llmops.multimodal.extract_features``.
    """
    from pyspark.sql import functions as F

    ext_map = {
        "png": "image/png",
        "bmp": "image/bmp",
        "svg": "image/svg+xml",
        "jpg": "image/jpeg",
        "jpeg": "image/jpeg",
        "wav": "audio/wav",
        "mp4": "video/mp4",
        "m4a": "audio/mp4",
        **(media_type_by_ext or {}),
    }
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mt = F.coalesce(
        *[F.when(ext == k, F.lit(v)) for k, v in ext_map.items()],
        F.lit("application/octet-stream"),
    )
    return raw.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        mt.alias("media_type"),
        F.col("length").cast("int").alias("n_bytes"),
        "path",
    )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` to ``path`` as ``fmt`` (distributed task-parallel
    write; Spark's commit protocol keeps the output all-or-nothing)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    writer = df.write.format(fmt).options(**{**_format_options(fmt), **options}).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
