"""Format round-trip tests for the source/sink layer: every supported
format must reproduce rows AND types exactly (SURVEY.md §2.2)."""

from __future__ import annotations

import pandas as pd
import pytest

from console_etl_spark import sources
from console_etl_spark.session import load_table
from tests.conftest import SF_TEST


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, ignore_index=True)


@pytest.mark.parametrize("fmt", sources.SUPPORTED_FORMATS)
def test_roundtrip_orders(spark, tmp_path, fmt):
    """orders covers int64, double, string, and timestamp columns."""
    orig = load_table(spark, SF_TEST, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    sources.write_table(orig, path, fmt)
    back = sources.read_table(spark, path, fmt, schema=orig.schema)
    assert back.schema == orig.schema
    pd.testing.assert_frame_equal(_canon(back), _canon(orig))


def test_partitioned_write_prunes(spark, tmp_path):
    """A partitioned sink must produce a layout whose reads are
    partition-pruned (the store's two-level layout, generalized)."""
    docs = load_table(spark, SF_TEST, "documents")
    path = str(tmp_path / "docs_part")
    sources.write_table(docs, path, "parquet", partition_by=("lang",))
    back = sources.read_table(spark, path, "parquet").filter("lang = 'es'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    want = docs.filter("lang = 'es'").count()
    assert back.count() == want


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        sources.read_table(spark, str(tmp_path), "csv")


def test_unknown_format_rejected(spark, tmp_path):
    docs = load_table(spark, SF_TEST, "documents")
    with pytest.raises(ValueError, match="unsupported"):
        sources.write_table(docs, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported"):
        sources.read_table(spark, str(tmp_path), "avro")
