"""Training-data pipeline plumbing: deterministic dataset splitting and
stratified sampling.

A 100 TB corpus can't be split with ``randomSplit`` — random assignment
is neither reproducible across runs nor stable under re-partitioning,
and a re-run would scatter documents across splits differently. The
standard trick is content-addressed assignment: hash a stable key (the
document id) with a cryptographic hash, and carve the hash space into
train/val/test bands. Every engine that can compute md5 agrees on the
assignment, forever, row by row — which also makes it oracle-checkable.

Reference parity note: the reference has no sampling/splitting at all
(SURVEY.md §2.2); these are extension-tier operators mandated by the
driver's LLM-pipeline north star.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


def hash_band(key: Column | str, pos: int = 1) -> Column:
    """One hex nibble of md5(key) — a uniform 16-bucket assignment that
    any engine reproduces bit-identically (UTF-8 bytes of the decimal
    rendering of the key). ``pos`` selects independent nibbles for
    independent decisions (split vs sample)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(col.cast("string").cast("binary")), pos, 1)


def split_column(key: Column | str) -> Column:
    """train/val/test by md5 nibble bands 0-b / c-d / e-f (75/12.5/12.5)."""
    h = hash_band(key, 1)
    return (
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
    )


@_register(
    "split_train_test_docs",
    """
    SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                ELSE 'test' END AS split
    FROM documents ORDER BY doc_id
    """,
)
def split_train_test_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test assignment per document.

    Pure projection — no shuffle, no state, no RNG; the assignment is a
    function of doc_id alone, so it is stable under re-runs, re-orders,
    re-partitioning, and engine changes (the oracle recomputes it in SQL
    and matches row for row).
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", split_column("doc_id").alias("split")).orderBy(
        "doc_id"
    )


@_register(
    "stratified_sample_docs",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 2, 1) <
          CASE WHEN lang = 'en' THEN '8' ELSE '4' END
    ORDER BY doc_id
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~50% of English documents
    and ~25% of every other language — per-stratum rates via a hash
    threshold that varies by the stratum column.

    Same content-addressed mechanism as the splitter (second md5 nibble,
    independent of the first), so sampling composes with splitting
    without correlation. This is the scale shape for corpus re-weighting:
    a filter, not a shuffle or a per-group reservoir.
    """
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", "8").otherwise("4")
    return (
        d.filter(hash_band("doc_id", 2) < rate)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )
