"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``console_etl_spark``; each module
registers (name → query fn) and (name → ANSI-SQL oracle) pairs:
- navigation.py — the reference's Q1-Q5/T1 surface mapped onto fixtures
- relational.py — joins / aggregations / windows / set ops / top-k (X7)
- llmops/ — dedup (X1/X2), similarity (X3), text analysis (X4),
  multimodal (X5), JSON extraction (X6 in relational.py)
Entries without oracle SQL (LSH tiers, Pandas-UDF features) get the
driver's rows-only check by design — their exact twins are oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from console_etl_spark import navigation, relational, sqlapi
from console_etl_spark.llmops import (
    dedup,
    multimodal,
    pipeline,
    similarity,
    sketches,
    textan,
)

_MODULES = (
    navigation,
    relational,
    sqlapi,
    dedup,
    textan,
    similarity,
    multimodal,
    sketches,
    pipeline,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the composed corpus
    curation pipeline (quality gate → normalized dedup → deterministic
    split → per-(split, lang) stats) — one Catalyst plan spanning the
    engine's text, dedup, and pipeline tiers. Driver checks rows>0."""
    return pipeline.curate_corpus_end_to_end(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
