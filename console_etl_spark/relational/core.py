"""Aggregations, joins, windows, set ops, events, temporal joins (split from relational.py, round 7).

See the package ``__init__`` for the tier-wide conventions doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..session import load_table
from ._base import ORACLE, QUERIES, QueryFn, _register, dec, one, rate

# --------------------------------------------------------------------------
# Aggregation suite
# --------------------------------------------------------------------------

@_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates.

    The shipdate filter is pushed into the parquet scan; aggregation is
    partial (map-side) then final — one shuffle on the 2 low-cardinality
    group keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (one() - rate("l_discount"))
    charge = disc_price * (one() + rate("l_tax"))
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(rate("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "q6_revenue_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — the pushdown showcase. All four
    predicates reach the parquet reader (PushedFilters); only 3 columns
    are read (ReadSchema)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(dec("l_extendedprice") * rate("l_discount"))).cast("double").alias("revenue"))
    )


@_register(
    "distinct_counts_lineitem",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def distinct_counts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (Catalyst expands to grouping-id plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@_register(
    "agg_rollup_returns",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-flag + per-pair)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@_register(
    "agg_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


@_register(
    "agg_grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent 1-d aggregations in one
    pass over the fact table)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@_register(
    "pivot_priority_by_status",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (o_orderstatus = 'P') AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a bounded, explicit value list (never pivot on
    unbounded cardinality at scale — it becomes one column per value)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


# --------------------------------------------------------------------------
# Join suite
# --------------------------------------------------------------------------

@_register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → broadcast join into the
    fact → aggregate → top-k (TakeOrderedAndProject, no global sort)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (one() - rate("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@_register(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. Every dimension side is
    broadcast; the only shuffle is the final group-by on n_name."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one() - rate("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


@_register(
    "top_customers_by_revenue",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + top-k with deterministic tiebreak."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


@_register(
    "semi_join_finished_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def semi_join_finished_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 finished order."""
    cust = load_table(spark, sf_dir, "customer")
    fin = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(fin, cust.c_custkey == fin.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@_register(
    "anti_join_orderless_customers",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Window suite
# --------------------------------------------------------------------------

@_register(
    "window_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scale-safe per-group top-k
    (row_number + filter, no per-group collect)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@_register(
    "window_running_quantity",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem WHERE l_suppkey <= 3
    """,
)
def window_running_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (prefix) sum per supplier over a total deterministic order."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("running_qty"),
    )


@_register(
    "window_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           DATE_DIFF('day',
                     LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    """,
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: days since the customer's previous order (NULL for first)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate").cast("date")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev).alias("gap_days"),
    )


@_register(
    "window_rank_parts_by_price",
    """
    SELECT p_brand, p_partkey, rnk, drnk FROM (
      SELECT p_brand, p_partkey,
             RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
      FROM part) t
    WHERE rnk <= 5
    """,
)
def window_rank_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK/DENSE_RANK semantics (ties share ranks — deterministic even
    without a tiebreak because rank depends only on the order key)."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


# --------------------------------------------------------------------------
# Set operations / top-k / scalar functions
# --------------------------------------------------------------------------

@_register(
    "setop_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@_register(
    "setop_except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # subtract = EXCEPT with set semantics (exceptAll would keep the
    # multiset difference — not what ANSI EXCEPT means).
    return cust.subtract(supp)


@_register(
    "setop_union_nations",
    """
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier) t
    GROUP BY nationkey
    """,
)
def setop_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionAll(supp).groupBy("nationkey").agg(F.count("*").alias("n"))


@_register(
    "topk_expensive_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@_register(
    "scalar_functions_showcase",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           CONCAT_WS('-', p_brand, p_type) AS brand_type,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE) AS marked_up,
           ABS(p_size - 25) AS size_dist,
           CASE WHEN p_size > 25 THEN 'large' WHEN p_size > 10 THEN 'medium' ELSE 'small' END AS size_class,
           REPLACE(p_brand, 'Brand', 'B') AS brand_short
    FROM part
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar expression coverage (string/math/conditional) — all
    JVM-side codegen'd built-ins, zero Python in the row path."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        (dec("p_retailprice") * F.lit(1.1).cast("decimal(3,1)"))
        .cast("double")
        .alias("marked_up"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.when(F.col("p_size") > 25, "large")
        .when(F.col("p_size") > 10, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.replace(F.col("p_brand"), F.lit("Brand"), F.lit("B")).alias("brand_short"),
    )


# --------------------------------------------------------------------------
# Events: time-series / semi-structured (S4/X6 analogs + streaming batch tier)
# --------------------------------------------------------------------------

@_register(
    "events_hourly_stats",
    """
    SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, batch form (streaming twin lives in
    streaming.py with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
        ).agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@_register(
    "events_sliding_windows",
    """
    WITH wins AS (
      SELECT UNNEST([CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR,
                     CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)]) AS window_start,
             value
      FROM events
    )
    SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM wins GROUP BY window_start
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide) via Spark's native window():
    each event lands in 2 overlapping windows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@_register(
    "events_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: schema-on-read JSON prop extraction at scale — the reference's
    opaque-blob model (cache.go:111) queried without pre-parsing."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@_register(
    "events_props_variant",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MAX(k) AS max_k,
           ROUND(AVG(k), 6) AS avg_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events) t
    WHERE k IS NOT NULL
    GROUP BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 via Spark 4 VARIANT: the schema-on-read props column parsed
    ONCE into the shredded binary encoding (``parse_json``), then every
    path read with ``variant_get`` — the 100 TB answer to repeated path
    extraction, vs. ``get_json_object`` re-tokenizing the JSON string on
    every call (events_json_extract is the string twin; this plan carries
    exactly one parseJson node, pinned in test_plans).

    Mirrors the reference's opaque-blob data model (cache.go:111,
    main.go:268: blobs stored verbatim, parsed on demand)."""
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        "event_type", F.parse_json("props").alias("v")
    ).select("event_type", F.variant_get("v", "$.k", "long").alias("k"))
    return (
        keyed.filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


@_register("events_props_schema_census", None)  # rows-only: engine-specific schema rendering
def events_props_schema_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-DRIFT census over the schema-on-read payload column: one
    row per distinct inferred payload shape (``schema_of_variant`` of
    the parsed VARIANT) with its document count — the audit a 100 TB
    pipeline runs when producers may change the payload contract (the
    reference's blobs are exactly such an uncontrolled contract,
    cache.go:111). A single-row result proves shape uniformity; new
    rows appearing ARE the drift alert.

    Scale shape: parse once per row, then an ordinary low-cardinality
    groupBy (distinct shapes ≪ rows) with map-side partial aggregation.
    Rows-only check: the schema STRING rendering is engine-specific
    (Spark ``OBJECT<k: BIGINT>`` vs DuckDB json_structure), so there is
    no portable oracle; the census' correctness law (fixture is
    single-shape; injected drift is counted exactly) is unit-tested."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.schema_of_variant(F.parse_json("props")).alias("payload_schema")
        )
        .groupBy("payload_schema")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "payload_schema")
    )


# --------------------------------------------------------------------------
# Temporal joins the reference (and stock Spark SQL) lack: as-of + range.
# Implemented as compositions of built-in ops (SURVEY.md §2.2 joins row) —
# never a cross join; the as-of is a single-shuffle union+window plan.
# --------------------------------------------------------------------------

@_register(
    "asof_join_purchase_view",
    """
    WITH unioned AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts_us, 0 AS side, event_id AS eid,
             event_id AS q_eid, CAST(ts AS TIMESTAMP) AS q_ts, value AS q_val,
             CAST(NULL AS DOUBLE) AS t_val
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id,
             NULL, NULL, NULL, value
      FROM events WHERE event_type = 'purchase'
    ), matched AS (
      SELECT user_id, ts_us, side, eid, t_val,
             LAST_VALUE(q_eid IGNORE NULLS) OVER w AS view_event,
             LAST_VALUE(q_ts IGNORE NULLS) OVER w AS view_ts,
             LAST_VALUE(q_val IGNORE NULLS) OVER w AS view_value
      FROM unioned
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT eid AS purchase_event, user_id, ts_us AS purchase_ts,
           t_val AS purchase_value, view_event, view_ts, view_value
    FROM matched WHERE side = 1
    """,
)
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the same user's most recent
    view at-or-before it (trades/quotes shape; no Spark built-in).

    Plan: union both sides with a marker, one window per user ordered by
    (ts, side, event_id), ``last(..., ignorenulls)`` carries the latest
    view forward. ONE shuffle on user_id, state is a single row per
    partition — scale-equivalent to a sort-merge as-of. The naive
    alternative (range join + max per pair) is O(n·m) per user; this is
    O(n+m). Ties: a view at exactly the purchase ts matches (side orders
    views first); equal-ts views resolve to the highest event_id.
    """
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("ts_us"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("eid"),
        F.col("event_id").alias("q_eid"),
        F.col("ts").alias("q_ts"),
        F.col("value").alias("q_val"),
        F.lit(None).cast("double").alias("t_val"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ts_us"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("eid"),
        F.lit(None).cast("long").alias("q_eid"),
        F.lit(None).cast("timestamp").alias("q_ts"),
        F.lit(None).cast("double").alias("q_val"),
        F.col("value").alias("t_val"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "side", "eid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("view_event", F.last("q_eid", ignorenulls=True).over(w))
        .withColumn("view_ts", F.last("q_ts", ignorenulls=True).over(w))
        .withColumn("view_value", F.last("q_val", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            F.col("eid").alias("purchase_event"),
            "user_id",
            F.col("ts_us").alias("purchase_ts"),
            F.col("t_val").alias("purchase_value"),
            "view_event",
            "view_ts",
            "view_value",
        )
    )


PRICE_BANDS = [
    ("low", 900.0, 905.0),
    ("mid", 905.0, 910.0),
    ("high", 910.0, 915.0),
    ("lux", 915.0, 10_000.0),
]


@_register(
    "range_join_price_bands",
    f"""
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    JOIN (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
         AS bands(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band ORDER BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: fact rows bucketed into a small interval table.

    The band side is a handful of rows, so the right physical plan is a
    broadcast nested-loop join on the range predicate — no shuffle of the
    fact table at all; ``F.broadcast`` pins it regardless of stats.
    """
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(dec("p_retailprice")).cast("double").alias("total_price"),
        )
        .orderBy("band")
    )


@_register(
    "range_join_purchase_after_signup",
    """
    SELECT s.user_id, s.event_id AS signup_event, p.event_id AS purchase_event,
           p.value AS purchase_value
    FROM events s JOIN events p
      ON s.user_id = p.user_id
     AND CAST(p.ts AS TIMESTAMP) > CAST(s.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(s.ts AS TIMESTAMP) + INTERVAL 24 HOURS
    WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
    """,
)
def range_join_purchase_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join with an equi-key: purchases within 24 h after a
    signup by the same user. The user_id equi-condition makes this a
    plain shuffled hash/sort-merge join with the time range as a join
    filter — the scale-safe shape (a pure range join with no equi-key
    would be a cross product; always carry the key)."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_event"), F.col("ts").alias("s_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        s.join(
            p,
            (s.user_id == p.p_user)
            & (p.p_ts > s.s_ts)
            & (p.p_ts <= s.s_ts + F.expr("INTERVAL 24 HOURS")),
        )
        .select("user_id", "signup_event", "purchase_event", "purchase_value")
    )


@_register(
    "events_user_enriched_stats",
    """
    SELECT n.n_name AS nation, e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def events_user_enriched_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream enrichment against slowly-changing dimensions: each
    event picks up its user's nation, then per-(nation, event_type)
    count + exact value sum. The dims are broadcast — the fact side
    never shuffles for the join, only for the final small aggregation —
    which is the 100 TB shape: enriching a firehose against
    dictionary-sized dimensions is a map-side operation. The streaming
    twin (same plan over readStream, stream-static broadcast join) is
    streaming.enrich_events."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dims = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey).select(
            F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation")
        )
    )
    return (
        e.join(dims, "user_id")
        .groupBy("nation", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@_register(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, event_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(event_id) AS first_event, MAX(event_id) AS last_event
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — lag + cumulative-sum session
    ids, all integer arithmetic (microsecond epochs) so it is exactly
    reproducible. The streaming twin is session_window in streaming.py."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


@_register(
    "dedup_events_debounce",
    """
    WITH keyed AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 600000000 AS win_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             event_id, value
      FROM events
    ), ranked AS (
      SELECT user_id, event_type, win_id, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, win_id
               ORDER BY us, event_id) AS rn,
             COUNT(*) OVER (
               PARTITION BY user_id, event_type, win_id) AS n_in_win
      FROM keyed
    )
    SELECT CAST(event_id AS BIGINT) AS event_id,
           user_id, event_type,
           CAST(win_id AS BIGINT) AS win_id,
           value AS kept_value,
           CAST(n_in_win - 1 AS BIGINT) AS n_suppressed
    FROM ranked WHERE rn = 1
    ORDER BY event_id
    """,
)
def dedup_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: keep the FIRST event per (user, event type)
    in each 10-minute tumbling window, reporting how many duplicates
    each kept event absorbed — the batch twin of the streaming
    watermark-dedup tier.

    Plan shape: pure partial-aggregable groupBy — the earliest event
    is a min over (ts, event_id, value) structs and the suppression
    count an ordinary count, so the debounce combines map-side and
    never plans a Window. Window ids come from integer microsecond
    floors (the exactness recipe both engines agree on)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts) DIV 600000000").alias("win_id"),
        )
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("k"),
            F.count("*").alias("n_in_win"),
        )
        .select(
            F.col("k.event_id").cast("bigint").alias("event_id"),
            "user_id",
            "event_type",
            F.col("win_id").cast("bigint").alias("win_id"),
            F.col("k.value").alias("kept_value"),
            (F.col("n_in_win") - 1).cast("bigint").alias("n_suppressed"),
        )
        .orderBy("event_id")
    )


