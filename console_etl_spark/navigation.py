"""Navigation tier mapped onto the driver fixtures (oracle-checkable).

The reference's query surface (Q1-Q5, T1) operates on the metas envelope
(package, schema, name, blob). The driver's oracle gate runs on the
TPC-H-ish fixture tables, so here we map fixtures onto that envelope —
``events``: user_id ≙ package, event_type ≙ schema, event_id ≙ name,
props ≙ blob (SURVEY.md §7.2) — and run the *actual engine functions*
from ``queries.py``/``ingest.py`` over them. Each query has matching
ANSI SQL for DuckDB, so the reference semantics themselves sit behind
the correctness gate, not just unit tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import queries as nav
from .ingest import GLOBAL_PACKAGE, derive_partition_key
from .session import load_table

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


def events_as_metas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the events fixture onto the metas envelope."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").cast("string").alias("package"),
        F.col("event_type").alias("schema"),
        F.col("event_id").cast("string").alias("name"),
        F.col("props").alias("blob"),
        F.col("user_id"),
        F.col("event_id"),
    )


def _min_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").agg(F.min("user_id").alias("user_id"))


@_register(
    "nav_list_packages",
    "SELECT DISTINCT CAST(user_id AS VARCHAR) AS package FROM events ORDER BY package",
)
def nav_list_packages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (main.go:124-164): distinct level-1 keys, sorted ascending."""
    return nav.list_packages(events_as_metas(spark, sf_dir))


@_register(
    "nav_list_schemas",
    """
    SELECT DISTINCT event_type AS schema FROM events
    WHERE user_id = (SELECT MIN(user_id) FROM events)
    ORDER BY schema
    """,
)
def nav_list_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (main.go:166-205): distinct level-2 keys under one level-1 key.

    The "which package" constant is resolved with a broadcast semi-join
    against a 1-row aggregate (no driver collect)."""
    metas = events_as_metas(spark, sf_dir)
    one = F.broadcast(_min_user(spark, sf_dir))
    scoped = metas.join(one, "user_id", "left_semi")
    return scoped.select("schema").distinct().orderBy("schema")


@_register(
    "nav_list_objects",
    """
    SELECT CAST(event_id AS VARCHAR) AS name FROM events
    WHERE user_id = (SELECT MIN(user_id) FROM events) AND event_type = 'purchase'
    ORDER BY name
    """,
)
def nav_list_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (main.go:207-247): name projection under (package, schema),
    sorted ascending (string sort, like the reference's sort.Strings)."""
    metas = events_as_metas(spark, sf_dir)
    one = F.broadcast(_min_user(spark, sf_dir))
    scoped = metas.join(one, "user_id", "left_semi")
    return nav.list_objects(scoped, F.col("package"), "purchase").orderBy("name")


@_register(
    "nav_point_lookup",
    """
    SELECT CAST(event_id AS VARCHAR) AS name, props AS blob FROM events
    WHERE user_id = (SELECT MIN(user_id) FROM events) AND event_type = 'purchase'
    ORDER BY event_id LIMIT 1
    """,
)
def nav_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (main.go:249-270): the blob at a fully-qualified key (here the
    first object of the (min-user, purchase) partition)."""
    metas = events_as_metas(spark, sf_dir)
    one = F.broadcast(_min_user(spark, sf_dir))
    return (
        metas.join(one, "user_id", "left_semi")
        .filter(F.col("schema") == "purchase")
        .orderBy("event_id")
        .limit(1)
        .select("name", "blob")
    )


@_register(
    "nav_derived_partition_key",
    f"""
    WITH keyed AS (
      SELECT CASE WHEN lang = 'es' THEN CAST(doc_id AS VARCHAR)
                  ELSE (CASE WHEN source = 'src0' THEN NULL ELSE source END)
             END AS raw_key
      FROM documents
    )
    SELECT CASE WHEN raw_key IS NULL OR raw_key = '' THEN '{GLOBAL_PACKAGE}'
                ELSE raw_key END AS package,
           COUNT(*) AS n
    FROM keyed GROUP BY 1
    """,
)
def nav_derived_partition_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (cache.go:100-106): the 3-way partition-key fallback, run by
    the engine's own ``derive_partition_key`` expression. Mapping:
    lang ≙ schema ('es' plays olm.package), source ≙ package (with
    'src0' nulled to exercise the __global fallback), doc_id ≙ name."""
    d = load_table(spark, sf_dir, "documents")
    key = derive_partition_key(
        F.col("lang"),
        F.nullif(F.col("source"), F.lit("src0")),
        F.col("doc_id").cast("string"),
        package_schema="es",
    )
    return d.groupBy(key.alias("package")).agg(F.count("*").alias("n"))


@_register(
    "nav_icon_extraction",
    """
    SELECT CAST(doc_id AS VARCHAR) AS package,
           base64(encode(substring(text, 1, 24))) AS icon_b64,
           'image/svg+xml' AS icon_mediatype
    FROM documents WHERE doc_id % 3 <> 0
    """,
)
def nav_icon_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (main.go:272-320): typed decode of an opaque JSON blob, nested
    null-guarded icon extraction, binary decode.

    Documents are wrapped into olm.package-shaped JSON blobs in-query
    (icon = first 24 text bytes, null for every third doc to exercise the
    404 path, main.go:310-313), then the engine's from_json → null-test →
    unbase64 pipeline extracts them back.
    """
    d = load_table(spark, sf_dir, "documents")
    icon = F.when(
        F.col("doc_id") % 3 != 0,
        F.struct(
            F.base64(F.encode(F.substring("text", 1, 24), "utf-8")).alias("base64data"),
            F.lit("image/svg+xml").alias("mediatype"),
        ),
    )
    metas = d.select(
        F.col("doc_id").cast("string").alias("package"),
        F.lit("olm.package").alias("schema"),
        F.col("doc_id").cast("string").alias("name"),
        F.to_json(
            F.struct(
                F.lit("olm.package").alias("schema"),
                F.col("doc_id").cast("string").alias("name"),
                F.lit("stable").alias("defaultChannel"),
                icon.alias("icon"),
            )
        ).alias("blob"),
    )
    doc = F.from_json("blob", nav.PACKAGE_BLOB_SCHEMA).alias("doc")
    return (
        metas.filter(F.col("schema") == "olm.package")
        .select(F.col("package"), doc)
        .where(F.col("doc.icon").isNotNull() & F.col("doc.icon.base64data").isNotNull())
        .select(
            "package",
            F.base64(F.unbase64(F.col("doc.icon.base64data"))).alias("icon_b64"),
            F.col("doc.icon.mediatype").alias("icon_mediatype"),
        )
    )


@_register(
    "nav_icon_variant",
    """
    WITH metas AS (
      SELECT CAST(doc_id AS VARCHAR) AS package,
             to_json(struct_pack(
               schema := 'olm.package',
               name := CAST(doc_id AS VARCHAR),
               defaultChannel := 'stable',
               icon := CASE WHEN doc_id % 3 <> 0 THEN struct_pack(
                 base64data := base64(encode(substring(text, 1, 24))),
                 mediatype := 'image/svg+xml') END
             )) AS blob
      FROM documents
    )
    SELECT package,
           json_extract_string(blob, '$.name') AS name,
           json_extract_string(blob, '$.defaultChannel') AS default_channel,
           json_extract_string(blob, '$.icon.base64data') AS icon_b64,
           json_extract_string(blob, '$.icon.mediatype') AS icon_mediatype
    FROM metas
    WHERE json_extract_string(blob, '$.icon.base64data') IS NOT NULL
    """,
)
def nav_icon_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 via Spark 4 VARIANT (main.go:272-320 semantics, cache.go:111
    data model): the opaque olm.package blob is parsed ONCE with
    ``parse_json`` into the shredded binary encoding, then all four
    nested paths are read with ``variant_get`` — no from_json schema
    declaration and no per-path JSON re-tokenization (the string twin
    nav_icon_extraction pays a from_json parse; at 100 TB repeated path
    extraction over stored VARIANT skips string parsing entirely).

    Same in-query blob synthesis as nav_icon_extraction (icon nulled for
    every third doc, the 404 path main.go:310-313); the oracle builds the
    identical JSON in DuckDB and extracts with json_extract_string."""
    d = load_table(spark, sf_dir, "documents")
    icon = F.when(
        F.col("doc_id") % 3 != 0,
        F.struct(
            F.base64(F.encode(F.substring("text", 1, 24), "utf-8")).alias("base64data"),
            F.lit("image/svg+xml").alias("mediatype"),
        ),
    )
    metas = d.select(
        F.col("doc_id").cast("string").alias("package"),
        F.to_json(
            F.struct(
                F.lit("olm.package").alias("schema"),
                F.col("doc_id").cast("string").alias("name"),
                F.lit("stable").alias("defaultChannel"),
                icon.alias("icon"),
            )
        ).alias("blob"),
    )
    v = metas.select("package", F.parse_json("blob").alias("v"))
    return (
        v.select(
            "package",
            F.variant_get("v", "$.name", "string").alias("name"),
            F.variant_get("v", "$.defaultChannel", "string").alias(
                "default_channel"
            ),
            F.variant_get("v", "$.icon.base64data", "string").alias("icon_b64"),
            F.variant_get("v", "$.icon.mediatype", "string").alias(
                "icon_mediatype"
            ),
        )
        .filter(F.col("icon_b64").isNotNull())
    )
