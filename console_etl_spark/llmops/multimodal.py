"""Multimodal / binary columns (X5): opaque binary payloads with typed
metadata, decode/feature-extract plumbing as Arrow-batched Pandas UDFs.

Mirrors the reference's only binary surface — the package icon
(``Icon{Data []byte, MediaType string}``, /root/reference/main.go:305-316)
— generalized to the image/audio/video columns a training-data pipeline
carries: BinaryType payload + media-type + size metadata, processed by
``mapInPandas`` so each Arrow batch crosses the JVM↔Python boundary once.

The actual media decoders (PIL/ffmpeg/librosa) are NOT in this
container, so the decode step is STUBBED: ``decode_image_batch`` raises
``NotImplementedError`` unless the deterministic fake decoder is
selected. The Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and tested; swapping the fake for a real decoder is
a one-function change.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Binary column construction (fixtures carry no real media, so documents
# are wrapped into binary payloads — the plumbing is what's under test)
# --------------------------------------------------------------------------

def binary_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes): the
    engine's canonical multimodal column layout (payload + typed
    metadata, the Icon model generalized)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.when(F.col("lang") == "zh", "text/plain; charset=utf-8")
        .otherwise("text/plain")
        .alias("media_type"),
        F.length(payload).alias("n_bytes"),
    )


@_register(
    "mm_binary_stats",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           base64(encode(substring(text, 1, 32))) AS head_b64,
           CASE WHEN lang = 'zh' THEN 'text/plain; charset=utf-8'
                ELSE 'text/plain' END AS media_type
    FROM documents
    """,
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata projection: byte length, base64 head,
    media type — the queryable surface of opaque payloads (X5)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.encode("text", "utf-8")).alias("n_bytes"),
        F.base64(F.encode(F.substring("text", 1, 32), "utf-8")).alias("head_b64"),
        F.when(F.col("lang") == "zh", "text/plain; charset=utf-8")
        .otherwise("text/plain")
        .alias("media_type"),
    )


# --------------------------------------------------------------------------
# Decode / feature-extraction plumbing (Pandas-UDF over mapInPandas)
# --------------------------------------------------------------------------

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a media decoder: fixed-dim features
    from byte statistics. Replace with PIL/librosa/ffmpeg in production."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 256),
        float(min(payload)),
        float(max(payload)),
        float(len(set(payload))),
        float(sum(payload) / n),
    ]


def extract_features(
    binary_df: DataFrame, decoder: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    ``decoder='fake'`` uses the deterministic byte-stat features;
    ``decoder='image'`` is the real-decoder slot and raises
    ``NotImplementedError`` (media libraries absent in this container).

    Arrow moves whole batches across the JVM↔Python boundary; the
    operator preserves partitioning (no shuffle) so at scale it is an
    embarrassingly-parallel map over executors.
    """
    if decoder == "image":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not available in this "
            "container; use decoder='fake' for the deterministic stand-in"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": [_fake_decode(bytes(p)) for p in pdf["payload"]],
                }
            )

    return binary_df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(
    binary_df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """"Frame sampling" over opaque payloads: slice each payload at a
    fixed byte stride (the video-frame-sampling plumbing, with byte
    slices standing in for decoded frames). Pure built-ins: sequence +
    transform + posexplode, no Python."""
    offsets = F.sequence(
        F.lit(1),
        F.least(F.length("payload"), F.lit(every_n_bytes * max_frames)),
        F.lit(every_n_bytes),
    )
    frames = F.transform(offsets, lambda o: F.col("payload").substr(o, F.lit(every_n_bytes)))
    return binary_df.select(
        "doc_id", F.posexplode(frames).alias("frame_idx", "frame_bytes")
    )


@_register("mm_feature_extract", None)  # rows-only: Pandas-UDF features not SQL-expressible
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary column → mapInPandas
    decode (deterministic fake) → fixed-dim feature vectors."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(binary_table(d))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("features", 8), 6).alias("mean_byte"),
        F.element_at("features", 7).alias("n_distinct_bytes"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_bytes", T.IntegerType()),
    ]
)


def resize_payload(
    binary_df: DataFrame, target_bytes: int = 64, resizer: str = "fake"
) -> DataFrame:
    """Resize plumbing (image thumbnail / audio downsample slot).

    ``resizer='fake'`` deterministically strides each payload down to
    ``target_bytes`` (every ceil(n/target)-th byte) — shape-correct
    plumbing for the real PIL/ffmpeg call, which goes in the same
    mapInPandas batch loop. Like decoding, the real resizer raises
    ``NotImplementedError`` here (media libs absent in this container).
    """
    if resizer == "image":
        raise NotImplementedError(
            "real media resizing requires PIL/ffmpeg — not available in this "
            "container; use resizer='fake' for the deterministic stand-in"
        )
    if resizer != "fake":
        raise ValueError(f"unknown resizer {resizer!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                raw = bytes(p)
                if len(raw) <= target_bytes:
                    out.append(raw)
                else:
                    step = -(-len(raw) // target_bytes)  # ceil div
                    out.append(raw[::step][:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "resized": out,
                    "out_bytes": [len(r) for r in out],
                }
            )

    return binary_df.mapInPandas(batches, RESIZED_SCHEMA)
