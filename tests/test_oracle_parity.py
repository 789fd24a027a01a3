"""Local replica of the driver's correctness gate (SURVEY.md §5.2 item 1).

For every oracle-declared query: run the Spark plan and the DuckDB SQL on
the same parquet, compare row count, column names, and order-insensitive
values EXACTLY (no tolerance — the query suite is engineered for
bit-identical results; see relational.py module doc).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_TEST

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize engine-specific dtypes, then sort rows and columns."""
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[ns]")
        elif s.dtype == object:
            s = s.map(
                lambda v: v.hex()
                if isinstance(v, (bytes, bytearray))
                else (float(v) if hasattr(v, "as_tuple") else v)
            )
        elif pd.api.types.is_extension_array_dtype(s):
            s = s.astype("float64") if s.dtype.kind == "f" else s.astype("object")
        out[col] = s
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), ignore_index=True)


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_names_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, oracle):
    sp = canonicalize(QUERIES[name](spark, SF_TEST).toPandas())
    dk = canonicalize(oracle.execute(ORACLE[name]).fetchdf())
    assert list(sp.columns) == list(dk.columns), (
        f"{name}: columns {list(sp.columns)} != {list(dk.columns)}"
    )
    assert len(sp) == len(dk), f"{name}: {len(sp)} rows vs oracle {len(dk)}"
    pd.testing.assert_frame_equal(sp, dk, check_dtype=False, check_exact=True, obj=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark):
    """Non-SQL-expressible ops at least produce a stable schema and rows."""
    df = QUERIES[name](spark, SF_TEST)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
