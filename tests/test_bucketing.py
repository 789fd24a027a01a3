"""Bucketed co-located joins: the plan must be exchange-free and the
results identical to the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from console_etl_spark import bucketing
from console_etl_spark.session import load_table
from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # saveAsTable uses the session's (static) warehouse dir —
    # ./spark-warehouse locally, gitignored; tables are dropped below.
    li = load_table(spark, SF_TEST, "lineitem")
    o = load_table(spark, SF_TEST, "orders")
    bucketing.write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    bucketing.write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", "l_orderkey", 8
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the test can't pass via a broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.cojoin(spark, left, right, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = (
        bucketing.cojoin(spark, left, right, "l_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("double").alias("q"),
        )
        .first()
    )
    li = load_table(spark, SF_TEST, "lineitem")
    o = load_table(spark, SF_TEST, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("double").alias("q"),
        )
        .first()
    )
    assert (got.n, got.q) == (want.n, want.q)
