"""Relational extension tier (SURVEY.md §2.3 X7).

The reference has no joins, numeric aggregations, windows, or set ops
(SURVEY.md §2.2) — this module makes those absences concrete and testable
over the star-schema fixtures, as pure built-in DataFrame plans that
Catalyst/Tungsten optimize (broadcast joins for bounded dims, partial
aggregation, whole-stage codegen, AQE skew handling).

Oracle-parity conventions (every query here is DuckDB-hash-checked):
- Money arithmetic casts inputs to DECIMAL(18,2) *before* summing, then
  casts the exact result to DOUBLE — bit-identical across engines
  regardless of summation order (verified by calibration).
- Averages are written sum/count explicitly so both engines divide the
  same exact operands.
- Every LIMIT carries a total ORDER BY (ties broken by key) so top-k
  sets match exactly.

Scale notes (100 TB): filters precede joins so parquet pushdown bounds
the scan; dimension joins (region/nation/customer/supplier/part) are
broadcast — only the fact table shuffles, and only when an aggregation
key demands it; AQE coalesces post-shuffle partitions and splits skewed
ones at runtime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

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


# --------------------------------------------------------------------------
# TPC-H-derived suite (adapted to the fixture schema: no partsupp /
# commitdate / receiptdate — see FIXTURES.md). Each query adds a plan
# shape the suite didn't cover yet: nation-pair joins, case-when market
# share, HAVING-subquery semi joins, correlated-aggregate filters,
# disjunctive join predicates, scalar-subquery thresholds.
# --------------------------------------------------------------------------

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _rev() -> Column:
    """Exact per-line revenue: extendedprice * (1 - discount), decimal."""
    return dec("l_extendedprice") * (one() - rate("l_discount"))


@_register(
    "q7_volume_shipping",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
       OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    The nation table joins twice under different roles (supplier-side and
    customer-side); both nation joins and the supplier/customer dims are
    broadcast, so only lineitem->orders shuffles. The symmetric
    nation-pair disjunction is applied after the joins, exactly as Q7
    specifies.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.sn_key)
        .join(F.broadcast(cn), c.c_nationkey == cn.cn_key)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
             {_REV_SQL} AS volume, sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'EUROPE'
    ) nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's revenue
    per year — conditional aggregation (case-when inside sum) over a
    6-table join. Numerator and denominator stay exact decimals until the
    final double division, so the ratio is bit-identical to the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev().alias("volume")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.cn_key)
        .join(F.broadcast(r), cn.cn_region == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.sn_key)
        .filter(F.col("r_name") == "EUROPE")
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"), vol, "supp_nation"
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    national = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        zero
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(national).cast("double") / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_register(
    "q9_profit_by_nation_year",
    f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS o_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in the fixtures, so profit = revenue):
    product-line profit by supplier nation and ship year, with a LIKE
    pattern filter on part name. The part filter is applied before the
    join so the broadcast side is pre-pruned."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@_register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top 20 customers by revenue lost to returns in a
    6-month window. orderdate + returnflag filters push into the scans;
    the LIMIT plans as TakeOrderedAndProject (top-k without a full sort),
    with c_custkey breaking revenue ties deterministically."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-07-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment"
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_register(
    "q14_promo_revenue",
    f"""
    SELECT CAST(100 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of a quarter's revenue from PROMO parts —
    a global (no group-by) conditional-aggregation ratio. Partial
    aggregation reduces each partition to two decimals before the single
    final-merge; the date filter bounds the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(promo).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("promo_revenue")
        )
    )


@_register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue —
    an uncorrelated scalar subquery over an aggregate. The per-supplier
    revenue CTE is computed once and self-compared via a 1-row broadcast
    join on the exact decimal total (never the double projection), so
    ties and equality survive."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(
            F.broadcast(top), revenue.total_revenue == top.max_rev, "inner"
        )
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@_register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN (SELECT l_partkey AS agg_pk, SUM(l_quantity) AS sum_qty,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY l_partkey) agg
      ON agg_pk = l_partkey
    WHERE p_brand IN ('Brand#1', 'Brand#2')
      AND 5.0 * l_quantity * cnt < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually-small orders — lines with
    quantity below 20% of their part's average. The correlated aggregate
    subquery decorrelates into a per-part aggregate joined back to
    lineitem (the rewrite Catalyst itself applies to correlated
    scalar subqueries). ``qty < 0.2*avg`` is algebraized to
    ``5*qty*cnt < sum`` — all integral doubles, exact in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    )
    agg = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(agg, F.col("agg_pk") == li.l_partkey)
        .filter(
            F.lit(5.0) * F.col("l_quantity") * F.col("cnt") < F.col("sum_qty")
        )
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@_register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose orders exceed 300 total units — an IN
    subquery over a grouped HAVING, planned as a left-semi join of
    orders against the re-aggregated lineitem keys. l_quantity sums are
    integral doubles (exact); top-k is tie-broken by o_orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        o.join(big, o.o_orderkey == big.big_ok, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@_register(
    "q19_disjunctive_join",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive (OR-of-ANDs) predicates spanning both join
    sides. The equi-key join happens first; the disjunction is a
    post-join filter. Catalyst extracts the single-side conjuncts it can
    (brand/size union bounds the broadcast side) while the mixed
    quantity terms stay in the filter — the classic Q19 plan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@_register(
    "q22_idle_rich_customers",
    """
    WITH threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never
    ordered, by market segment (standing in for phone prefixes). Two
    subquery forms in one plan: an uncorrelated scalar threshold
    (broadcast 1-row cross join; the mean is computed exact-decimal
    then divided as double, identically in both engines) and a
    NOT EXISTS (left-anti join on o_custkey)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@_register(
    "q11_important_parts",
    f"""
    WITH per_part AS (
      SELECT l_partkey, SUM({_REV_SQL}) AS rev, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    ), tot AS (
      SELECT SUM(rev) AS total_rev, COUNT(*) AS n_parts FROM per_part
    )
    SELECT l_partkey, CAST(rev AS DOUBLE) AS part_revenue
    FROM per_part, tot
    WHERE rev * 2 * n_parts > 3 * total_rev
    ORDER BY part_revenue DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 1.5x the per-part
    average — a scalar-subquery threshold over an aggregate of an
    aggregate. ``rev > 1.5 * total/n`` is algebraized to
    ``2*rev*n > 3*total`` so the comparison happens in exact decimal
    arithmetic (no division, no doubles) in both engines. The threshold
    is scale-invariant: the fraction-of-total form in spec Q11 needs a
    per-SF constant; this one survives a 100x scale-up unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_rev()).alias("rev"), F.count("*").alias("cnt")
    )
    tot = per_part.agg(
        F.sum("rev").alias("total_rev"), F.count("*").alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(tot))
        .filter(
            F.col("rev") * F.lit(2) * F.col("n_parts")
            > F.lit(3) * F.col("total_rev")
        )
        .select("l_partkey", F.col("rev").cast("double").alias("part_revenue"))
        .orderBy(F.desc("part_revenue"), "l_partkey")
    )


@_register(
    "stats_aggregates_lineitem",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stats_aggregates_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate functions (stddev/variance/covariance/
    correlation/exact median). Results are rounded to 6 decimals before
    comparison — the moments algebra is engine-specific (Welford vs
    naive) and summation order differs, but agrees far past 6 places.
    ``percentile`` is Spark's exact linear-interpolated quantile, the
    same definition as the oracle's quantile_cont."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
                "cov_qty_disc"
            ),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Skew handling: explicit key salting
# --------------------------------------------------------------------------
# AQE's skew-join split covers sort-merge joins at runtime; explicit
# salting is the tool for the remaining shapes — a skewed groupBy key, or
# a shuffled hash join against a non-broadcastable side with hot keys.

def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread across ``n_salts``
    partitions per key.

    The large side gets a deterministic per-row salt (hash of all of its
    columns — content-derived, so reruns are stable); the small side is
    replicated once per salt value. Each (key, salt) shuffle bucket then
    holds ~1/n_salts of a hot key's rows. Replication multiplies the
    small side by n_salts — use only when the small side is modest but
    above the broadcast threshold and the large side's keys are skewed.
    """
    salt = (F.xxhash64(*[F.col(c) for c in large.columns]) % n_salts).cast("int")
    salted_large = large.withColumn("_salt", F.abs(salt))
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_small = small.withColumn("_salt", F.explode(salts))
    out = salted_large.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 32) -> DataFrame:
    """Two-phase count for a heavily skewed group key: pre-aggregate on
    (key, salt), then combine — the hot key's rows never converge on one
    reducer. (Spark's partial aggregation already does this for simple
    aggregates when map-side combine applies; the explicit form is for
    when it can't, e.g. after a preceding exchange on another key.)"""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % n_salts).cast("int")
    return (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )


@_register(
    "approx_distinct_events",
    None,  # approx sketches are engine-specific — tolerance-checked in unit tests
)
def approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per event type (the approx tier of
    distinct_counts_lineitem). At 100 TB the sketch is the only sane
    plan: fixed-size state, one pass, no exact-distinct shuffle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@_register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer — a LEFT OUTER join
    with an extra non-equi join condition (customers with zero qualifying
    orders must appear with c_count = 0, which an inner join would drop),
    then an aggregate of an aggregate. count(o_orderkey) counts non-null
    keys only, preserving the zero bucket."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@_register(
    "window_rank_functions_customers",
    """
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS quartile,
           DENSE_RANK() OVER w AS drank,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST() OVER w AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_functions_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window family: ntile / dense_rank / percent_rank /
    cume_dist per market segment. The ORDER BY carries c_custkey so the
    total order is unique — ntile buckets depend on row position, and a
    tie left to the engine would be nondeterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@_register(
    "date_functions_orders",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
           CAST(EXTRACT(MONTH FROM CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_month,
           CAST(DATE_TRUNC('month', CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP) AS month_start,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTHS AS TIMESTAMP) AS plus_quarter
    FROM orders
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function coverage: extraction, truncation, month-end,
    day arithmetic, interval addition — all codegen'd built-ins."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day(od).cast("timestamp").alias("month_end"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).alias("days_since_epoch"),
        F.add_months(od, 3).cast("timestamp").alias("plus_quarter"),
    )


@_register(
    "array_functions_embeddings",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 9) AS max_val,
           ROUND(list_min(CAST(embedding AS DOUBLE[])), 9) AS min_val,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 9) AS sum_val,
           ROUND(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 9) AS head_sum
    FROM embeddings
    """,
)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function coverage over the vector column:
    size, element extrema, full and sliced folds — JVM-side, the
    building blocks the similarity tier composes. Sums fold
    left-to-right in both engines over exact float->double casts, so
    round(9) is belt-and-suspenders."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max(dbl), 9).alias("max_val"),
        F.round(F.array_min(dbl), 9).alias("min_val"),
        F.round(fold(dbl), 9).alias("sum_val"),
        F.round(fold(F.slice(dbl, 1, 8)), 9).alias("head_sum"),
    )


@_register(
    "map_functions_orders",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT) AS n_urgent,
           CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW'), 0) AS BIGINT) AS n_low,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def map_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column coverage (the complex-type surface arrays don't
    reach): per-status priority→count MAPS built with map_from_entries
    over a sorted collect_list, then consumed with size / element_at /
    a map_values fold — all JVM-side. The oracle checks the extracted
    scalars (DuckDB's MAP isn't hash-comparable across engines; the
    lookups and fold are), so the map plumbing itself is what's under
    differential test."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    m = per.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "n")))
        ).alias("m")
    )
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return m.select(
        "o_orderstatus",
        F.size("m").cast("long").alias("n_priorities"),
        F.coalesce(F.element_at("m", F.lit("1-URGENT")), F.lit(0)).alias("n_urgent"),
        F.coalesce(F.element_at("m", F.lit("5-LOW")), F.lit(0)).alias("n_low"),
        total.alias("n_total"),
    )


@_register(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0
    )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute with
    a NOT IN exclusion subquery. s_suppkey is a non-null key, so NOT IN
    is exactly a left anti join (with a nullable subquery column it
    would need the null-aware anti join the SQL form plans — see
    sql_correlated_exists for the parser-driven path)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000.0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(excluded, "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@_register(
    "q21_sole_supplier_orders",
    """
    SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
    FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_linenumber <> l1.l_linenumber)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY n_orders DESC, s_name
    """,
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS and NOT EXISTS self-joins in
    one plan — suppliers that were the sole supplier on multi-line
    orders. The EXISTS becomes a left semi join (another line exists),
    the NOT EXISTS a left anti join (no other supplier), both on the
    orderkey with a non-equi residual condition."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    l1 = li.select("l_orderkey", "l_suppkey", "l_linenumber")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_linenumber").alias("ln2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_linenumber != l2.ln2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.o3) & (F.col("l_suppkey") != l3.s3),
            "left_anti",
        )
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "s_name")
    )


@_register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice', p_retailprice FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide part metrics to (key, metric, value) long
    form via the stack() generator — the inverse of pivot, one scan, no
    join (the oracle's UNION ALL reads the table twice; stack is the
    single-pass plan)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE),"
            " 'retailprice', p_retailprice) AS (metric, value)"
        ),
    )


@_register(
    "histogram_order_totalprice",
    """
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: integer bucket arithmetic (portable where
    width_bucket isn't), single aggregation pass with per-bucket extrema.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@_register(
    "window_trailing_hour_value",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_hour_value
    FROM events
    """,
)
def window_trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, each event's running sum over
    the trailing hour — rangeBetween on microsecond epochs (RANGE frames
    need a numeric ORDER BY in Spark; integer epochs also make the frame
    boundary exact in both engines). Decimal accumulation, double at the
    edge, same as every money sum here."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("trailing_hour_value"),
    )


@_register(
    "hypertable_rollup_events",
    """
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (day, hour)
    """,
)
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass produces the
    hour-level, day-level, and grand-total tiers via ROLLUP on nested
    time buckets (hour rolls up into day rolls up into total). At scale
    this materializes every query granularity a dashboard hits without
    re-scanning raw events per tier — Spark plans a single aggregation
    with an Expand, partial map-side combine included."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@_register(
    "agg_filtered_counts_orders",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_revenue,
           COUNT(DISTINCT o_custkey)
                FILTER (WHERE o_totalprice > 200000.0) AS big_spenders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filtered_counts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (the SQL FILTER clause): several
    differently-predicated aggregates in ONE pass over the fact table —
    the alternative to N filtered scans. Spark expresses each as
    agg(when(pred, x)); all of them ride the same partial/final
    hash aggregate, so the 100 TB scan happens exactly once."""
    o = load_table(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.count(F.when(fin, 1)).alias("n_finished"),
            F.sum(F.when(fin, dec("o_totalprice")))
            .cast("double")
            .alias("finished_revenue"),
            F.count_distinct(
                F.when(F.col("o_totalprice") > 200000.0, F.col("o_custkey"))
            ).alias("big_spenders"),
        )
    )


@_register(
    "gapfill_hourly_events",
    """
    WITH bounds AS (
      SELECT CAST(DATE_TRUNC('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(DATE_TRUNC('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    hours AS (
      SELECT UNNEST(generate_series((SELECT lo FROM bounds),
                                    (SELECT hi FROM bounds),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT h.hour, t.event_type,
           COALESCE(a.n, 0) AS n,
           COALESCE(a.total_value, CAST(0 AS DOUBLE)) AS total_value
    FROM hours h
    CROSS JOIN types t
    LEFT JOIN agg a ON a.hour = h.hour AND a.event_type = t.event_type
    """,
)
def gapfill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (the `time_bucket_gapfill` analog): a dense
    hourly calendar per event type with zero-filled empty buckets, built
    from sequence()+explode over the observed bounds cross-joined with
    the distinct type dimension, left-joined to the hourly rollup.

    Scale: every relation after the first aggregation is bounded by
    calendar-hours x event-types — independent of raw event count — so
    the fill skeleton and the join stay broadcast-sized even when the
    events scan is 100 TB; only the initial rollup shuffles.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = e.select("event_type").distinct()
    return (
        hours.crossJoin(types)
        .join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@_register(
    "window_revenue_share_by_region",
    """
    WITH nat AS (
      SELECT r.r_name AS region_name, n.n_name AS nation_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region_name, nation_name,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY region_name) AS DOUBLE) AS share
    FROM nat
    """,
)
def window_revenue_share_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report window: each nation's share of its region's order
    revenue. The window SUM runs over the *decimal* aggregate (exact,
    order-insensitive) and both operands cast to double only for the
    final division — bit-identical across engines.

    Scale: dimensions broadcast, one shuffle on the (region, nation)
    group key; the window partitions over ~5 rows per region post-agg.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
    )
    win = W.partitionBy("region_name")
    return nat.select(
        "region_name",
        "nation_name",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.sum("rev").over(win).cast("double")).alias(
            "share"
        ),
    )


@_register(
    "setop_intersect_all_priorities",
    """
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000.0
    """,
)
def setop_intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: each priority survives
    min(count_left, count_right) times, unlike the distinct INTERSECT
    above. Spark plans both as joins over counted groups."""
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    right = o.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_orderpriority").alias("priority")
    )
    return left.intersectAll(right)


@_register(
    "setop_union_all_priorities",
    """
    SELECT o_orderpriority AS priority, COUNT(*) AS n FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000.0
    ) GROUP BY o_orderpriority
    """,
)
def setop_union_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, duplicates kept) — completes the multiset
    set-op family next to INTERSECT ALL / EXCEPT ALL. Spark's union is
    a zero-shuffle concatenation of partitions; the count wrapper makes
    the multiset cardinalities oracle-checkable deterministically."""
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    right = o.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_orderpriority").alias("priority")
    )
    return left.unionAll(right).groupBy("priority").agg(F.count("*").alias("n"))


@_register(
    "setop_except_all_priorities",
    """
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000.0
    """,
)
def setop_except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: left copies survive
    count_left - count_right times (floor at zero)."""
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    right = o.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_orderpriority").alias("priority")
    )
    return left.exceptAll(right)


@_register(
    "q4_late_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commitdate/receiptdate absent, so "late" means a
    line shipped >60 days after ordering): priority distribution of
    orders with at least one late line. The correlated EXISTS carries a
    cross-relation date comparison, so it plans as a left semi join with
    the date predicate as the join's residual condition — not a
    pre-filter on either side alone."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("lk"), F.col("l_shipdate").cast("date").alias("sd")
    )
    return (
        o.join(
            li,
            (o.o_orderkey == li.lk)
            & (li.sd > F.date_add(o.o_orderdate.cast("date"), 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "q12_returnflag_priority_counts",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q12_returnflag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (returnflag standing in for shipmode): per flag,
    how many 1997 lines belong to high- vs low-priority orders — the
    two-way conditional count over a fact-fact join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# TPC-H Q2/Q20 shapes — partsupp is absent from the fixtures, so both
# derive the part↔supplier relation from lineitem: unit cost as
# MIN(l_extendedprice / l_quantity) per (partkey, suppkey) and shipped
# quantity per (partkey, suppkey, year). Same query skeletons
# (correlated MIN subquery / nested semi joins), real available data.
# --------------------------------------------------------------------------

@_register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), asia AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM cost
    JOIN asia ON cost.l_suppkey = s_suppkey
    JOIN part ON p_partkey = cost.l_partkey
    WHERE p_size < 10
      AND unit_cost = (
        SELECT MIN(c2.unit_cost)
        FROM cost c2 JOIN asia a2 ON c2.l_suppkey = a2.s_suppkey
        WHERE c2.l_partkey = cost.l_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest ASIA supplier per small part
    (reference has no joins at all — SURVEY.md §2.2; this is the
    correlated-MIN-subquery member of the extension tier X7).

    The correlated ``= (SELECT MIN ...)`` decorrelates into a per-part
    window MIN over the already-aggregated cost relation, filtered to
    rows at the minimum — NOT a per-part aggregate joined back, which
    would scan and aggregate lineitem twice (verified on the physical
    plan: the join formulation duplicated the whole fact pipeline). One
    fact scan, one (partkey, suppkey) shuffle, one partkey window
    exchange. Unit cost is a single IEEE division in both engines and
    MIN is order-insensitive, so the ``==`` filter is bit-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost_asia = cost.join(F.broadcast(asia), cost.l_suppkey == F.col("s_suppkey"))
    min_cost = F.min("unit_cost").over(W.partitionBy("l_partkey"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    return (
        cost_asia.withColumn("min_cost", min_cost)
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), cost_asia.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@_register(
    "q20_dominant_part_suppliers",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
      GROUP BY l_partkey, l_suppkey
    ), part_total AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT shipped.l_suppkey
      FROM shipped
      JOIN part_total ON shipped.l_partkey = part_total.l_partkey
      JOIN part ON p_partkey = shipped.l_partkey
      WHERE p_name LIKE '%widget%' AND 2 * qty > total_qty
    )
    AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    ORDER BY s_name
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA-nation suppliers who shipped more than half
    of some widget part's 1995 volume — nested IN subqueries over a
    derived availability relation, the double-semi-join member of X7.

    Decimal SUMs keep the 2·qty > total comparison exact in both
    engines. Shipped quantities aggregate once (shuffle on partkey,
    suppkey); the per-part total is a window SUM over that relation —
    not a second aggregate joined back, which would scan lineitem twice
    (verified on the physical plan). Both IN predicates become
    left-semi joins (nation side broadcast).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-01-01").cast("date"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("qty")
    )
    widget = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    total = F.sum("qty").over(W.partitionBy("l_partkey"))
    dominant = (
        shipped.join(F.broadcast(widget), shipped.l_partkey == F.col("p_partkey"), "left_semi")
        .withColumn("total_qty", total)
        .filter(F.lit(2) * F.col("qty") > F.col("total_qty"))
        .select("l_suppkey")
    )
    asia_nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 2
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(
            F.broadcast(asia_nations),
            s.s_nationkey == asia_nations.n_nationkey,
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Full-outer join, exact percentiles, fuzzy string matching
# --------------------------------------------------------------------------

@_register(
    "fullouter_nation_counts",
    """
    SELECT n_name, cust_cnt, supp_cnt
    FROM (SELECT c_nationkey AS c_nk, COUNT(*) AS cust_cnt
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN (SELECT s_nationkey AS s_nk, COUNT(*) AS supp_cnt
                     FROM supplier GROUP BY s_nationkey) s
      ON c_nk = s_nk
    JOIN nation ON n_nationkey = COALESCE(c_nk, s_nk)
    ORDER BY n_name
    """,
)
def fullouter_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one outer-join flavor the suite lacked):
    customer and supplier counts per nation, keeping nations that appear
    on only one side (NULL count on the other). COALESCE over the two
    join keys recovers the nation key for the dimension lookup.

    Scale: both inputs pre-aggregate to ≤ |nation| rows before the
    outer join, so the join is over tiny aggregated relations no matter
    how large the base tables are; nation is broadcast.
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("supp_cnt"))
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(s, c.c_nk == s.s_nk, "full_outer")
        .join(
            F.broadcast(n),
            F.col("n_nationkey") == F.coalesce("c_nk", "s_nk"),
        )
        .select("n_name", "cust_cnt", "supp_cnt")
        .orderBy("n_name")
    )


@_register(
    "percentile_price_by_flag",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.90), 6) AS p90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def percentile_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≙
    SQL PERCENTILE_CONT ≙ DuckDB quantile_cont — all use the same
    (n-1)·p linear-interpolation definition; round-6 absorbs the last
    ulp of the interpolation arithmetic).

    Exact percentiles sort each group's values; at 100 TB swap in
    approx_percentile (t-digest, mergeable, no global sort) — the
    approx twin of this oracle-checked exact tier.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = lambda q: F.round(F.percentile("l_extendedprice", F.lit(q)), 6)  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(p(0.25).alias("p25"), p(0.50).alias("p50"), p(0.90).alias("p90"))
        .orderBy("l_returnflag")
    )


@_register(
    "fuzzy_part_name_pairs",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY name_a, name_b
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: near-identical part-name pairs by edit
    distance — the entity-resolution primitive (built-in levenshtein,
    identical definition in both engines).

    The self-join runs over the DISTINCT name domain, not the table:
    dedup first, broadcast the (small) domain, theta-join. At scale the
    domain-reduction is the point — edit-distance joins over raw rows
    are quadratic in row count; over the value domain they're quadratic
    only in distinct values (and would get a length/prefix blocking key
    as a pre-filter, the PPJoin pattern in dedup.py).
    """
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 4)
        .orderBy("name_a", "name_b")
    )


@_register(
    "fuzzy_blocked_name_pairs",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY name_a, name_b
    """,
)
def fuzzy_blocked_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for the edit-distance join: bigram inverted-index
    blocking instead of the domain cross-join. Candidates are name
    pairs that (a) share at least one character bigram — guaranteed
    for any pair within edit distance 2 once the longer string has
    >= 6 characters (count filter: shared grams >= max_len - q + 1 -
    q*d = max_len - 5), and (b) differ in length by at most 2 (each
    edit changes length by at most 1). Only candidates pay the
    levenshtein verify.

    The ORACLE is the plain quadratic form — the value-hash therefore
    PROVES the blocking is lossless, not just fast. Complexity drops
    from O(|domain|^2) comparisons to O(collisions): the gram join is
    the same inverted-index shape as the shingle-jaccard dedup, and a
    Zipfian gram head at real scale gets the rarest-prefix filtering
    already implemented for PPJoin (dedup.py) — index the globally
    rarest grams of each string instead of all of them. Strings
    shorter than q + q·d = 6 characters pair inside a single bounded
    short-string block (only short-short pairs lack the shared-gram
    guarantee; this domain has none, but the operator stays universal
    — pinned by a hypothesis property over random strings)."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    return blocked_edit_distance_pairs(names, "p_name", d=2)


def blocked_edit_distance_pairs(
    names: DataFrame, col: str, d: int = 2
) -> DataFrame:
    """All unordered pairs of ``names[col]`` within edit distance ``d``,
    via lossless bigram inverted-index blocking (see
    fuzzy_blocked_name_pairs). q = 2; pairs whose longer string has
    >= q + q·d chars are guaranteed a shared bigram (count filter), and
    anything shorter meets every other short string in one bounded
    block keyed by a NUL-prefixed sentinel no real bigram can equal."""
    q = 2
    short_len = q + q * d
    # substring with a dynamic start needs expr(); guard length-1
    # strings (sequence(1, 0) counts DOWN and would index position 0)
    grams = names.select(
        F.col(col),
        F.explode(
            F.when(
                F.length(col) >= 2,
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length({col}) - 1), "
                        f"i -> substring({col}, i, 2))"
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    short = names.filter(F.length(col) < short_len).select(
        F.col(col), F.lit("\x00short").alias("g")
    )
    blocks = grams.unionByName(short)
    a = blocks.select(F.col(col).alias("name_a"), "g")
    b = blocks.select(F.col(col).alias("name_b"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= d)
        .select("name_a", "name_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= d)
        .orderBy("name_a", "name_b")
    )


@_register(
    "listagg_suppliers_by_nation",
    """
    SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def listagg_suppliers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (LISTAGG / string_agg): supplier roster
    per nation. collect_list gives no ordering guarantee under parallel
    aggregation, so the deterministic form is collect → array_sort →
    join — the only portable way to make list aggregation reproducible
    on any partitioning (and therefore oracle-checkable).
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "suppliers"
            )
        )
        .orderBy("n_name")
    )


@_register(
    "window_value_functions_orders",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           lead(o_totalprice) OVER w AS next_price,
           lag(o_totalprice, 2) OVER w AS prev2_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_value_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first/last/nth/lead/lag) over the full
    partition frame — the unbounded frame makes last_value/nth_value
    well-defined, and the (date, key) order makes every value
    deterministic. One window spec → Spark computes all five functions
    in a single Window exec over one sort, no repeated exchanges.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("date"), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    # lead/lag ignore frames; they share the window's partition+order.
    wo = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.lead("o_totalprice").over(wo).alias("next_price"),
            F.lag("o_totalprice", 2).over(wo).alias("prev2_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@_register("approx_percentile_price", None)  # rows-only: t-digest not SQL-portable
def approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (approx_percentile, t-digest-style sketch)
    — the 100 TB twin of percentile_price_by_flag: mergeable partial
    sketches, no per-group global sort. Accuracy is bounded by the
    relative-error parameter (10000 ≈ 0.01%); the unit test pins the
    approx-vs-exact gap. Rows-only driver check: the sketch's internals
    aren't reproducible in ANSI SQL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ap = lambda q: F.percentile_approx("l_extendedprice", F.lit(q), F.lit(10000))  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(
            ap(0.25).alias("p25"),
            ap(0.50).alias("p50"),
            ap(0.90).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# SCD Type-2 merge (warehouse dimension maintenance — the reference's
# atomic snapshot publish, main.go:174-205, kept as *history* instead of
# replace-in-place)
# --------------------------------------------------------------------------

# open-row sentinel (ISO string; far-future "9999-12-31" would overflow
# pandas' ns timestamps if a consumer casts to date)
SCD2_OPEN_END = "2200-01-01"


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    effective: str,
    base_from: str,
) -> DataFrame:
    """Apply a change batch to a dimension, keeping full history (SCD
    type 2): unchanged rows stay current, changed keys get their old row
    closed at the effective date and a new current row opened.

    Three branches over one key equi-join each (anti / semi / the batch
    itself) — at 100 TB this is the standard MERGE shape: the updates
    side is a day's change batch (usually broadcast-small vs the
    dimension); nothing shuffles more than once per branch, and AQE
    picks broadcast vs SMJ per actual batch size. Both inputs must share
    the same non-key column set."""
    cols = [c for c in base.columns if c != key]
    # validity bounds are ISO strings, not DATE: neither engine's
    # date->pandas dtype survives the driver's value-hash symmetrically
    # (Spark dates arrive as objects, DuckDB as datetime64)
    open_end = F.lit(SCD2_OPEN_END)
    eff = F.lit(effective)
    frm = F.lit(base_from)
    unchanged = base.join(updates, key, "left_anti").select(
        key,
        *cols,
        frm.alias("valid_from"),
        open_end.alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    closed = base.join(updates.select(key), key, "left_semi").select(
        key,
        *cols,
        frm.alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(0).alias("is_current"),
    )
    opened = updates.select(
        key,
        *cols,
        eff.alias("valid_from"),
        open_end.alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return unchanged.unionByName(closed).unionByName(opened)


SCD2_EFFECTIVE = "2024-06-01"
SCD2_BASE_FROM = "2024-01-01"


@_register(
    "scd2_customer_updates",
    f"""
    WITH upd AS (
      SELECT c_custkey, c_name, c_nationkey,
             ROUND(c_acctbal + 100.0, 2) AS c_acctbal,
             'AUTOMOBILE' AS c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           '{SCD2_BASE_FROM}' AS valid_from,
           '{SCD2_OPEN_END}' AS valid_to, 1 AS is_current
    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           '{SCD2_BASE_FROM}', '{SCD2_EFFECTIVE}', 0
    FROM customer WHERE c_custkey IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           '{SCD2_EFFECTIVE}', '{SCD2_OPEN_END}', 1
    FROM upd
    """,
)
def scd2_customer_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the customer dimension with a deterministic change
    batch (every 7th key gets a balance credit and a segment move): the
    old row closes at the effective date, the new row opens, everything
    else stays current — full history, no in-place loss."""
    c = load_table(spark, sf_dir, "customer")
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        F.lit("AUTOMOBILE").alias("c_mktsegment"),
    )
    return scd2_merge(c, upd, "c_custkey", SCD2_EFFECTIVE, SCD2_BASE_FROM)


@_register(
    "scd2_point_in_time_join",
    f"""
    WITH upd AS (
      SELECT c_custkey, c_name, c_nationkey,
             ROUND(c_acctbal + 100.0, 2) AS c_acctbal,
             'AUTOMOBILE' AS c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
    ), scd2 AS (
      SELECT c_custkey, c_mktsegment,
             '{SCD2_BASE_FROM}' AS valid_from,
             '{SCD2_OPEN_END}' AS valid_to, 1 AS is_current
      FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
      UNION ALL
      SELECT c_custkey, c_mktsegment,
             '{SCD2_BASE_FROM}', '{SCD2_EFFECTIVE}', 0
      FROM customer WHERE c_custkey IN (SELECT c_custkey FROM upd)
      UNION ALL
      SELECT c_custkey, c_mktsegment,
             '{SCD2_EFFECTIVE}', '{SCD2_OPEN_END}', 1
      FROM upd
    ), facts AS (
      SELECT o_custkey, o_totalprice,
             strftime(DATE '2024-01-01'
                      + CAST(o_orderkey % 365 AS INTEGER), '%Y-%m-%d')
               AS as_of
      FROM orders
    )
    SELECT s.c_mktsegment,
           CAST(s.is_current AS BIGINT) AS matched_current_version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,2)))
                   AS DOUBLE), 2) AS total_price
    FROM facts f JOIN scd2 s
      ON f.o_custkey = s.c_custkey
     AND f.as_of >= s.valid_from AND f.as_of < s.valid_to
    GROUP BY s.c_mktsegment, s.is_current
    ORDER BY c_mktsegment, matched_current_version
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join of facts against SCD2 dimension
    history: each order resolves to the customer version valid AT its
    as-of date, not the current one — the query SCD2 exists to serve.
    Orders carry a deterministic in-era as-of date (base date +
    orderkey mod 365 days) that straddles the effective date, so both
    the closed pre-update versions and the reopened current ones
    receive facts; the report shows order counts and exact decimal
    revenue per (segment, matched-version) cell.

    Plan shape: equality on the surrogate key drives an ordinary hash
    join (co-partitioned on custkey); the validity-interval bounds are
    residual filters, never a range cross-product. Validity endpoints
    are ISO-8601 strings, which compare lexicographically identically
    in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        F.lit("AUTOMOBILE").alias("c_mktsegment"),
    )
    scd2 = scd2_merge(c, upd, "c_custkey", SCD2_EFFECTIVE, SCD2_BASE_FROM).select(
        "c_custkey", "c_mktsegment", "valid_from", "valid_to", "is_current"
    )
    facts = o.select(
        "o_custkey",
        "o_totalprice",
        F.date_format(
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("o_orderkey") % 365).cast("int"),
            ),
            "yyyy-MM-dd",
        ).alias("as_of"),
    )
    return (
        facts.join(
            scd2,
            (facts["o_custkey"] == scd2["c_custkey"])
            & (facts["as_of"] >= scd2["valid_from"])
            & (facts["as_of"] < scd2["valid_to"]),
        )
        .groupBy("c_mktsegment", F.col("is_current").cast("bigint").alias(
            "matched_current_version"
        ))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_price"),
        )
        .orderBy("c_mktsegment", "matched_current_version")
    )


# --------------------------------------------------------------------------
# Trailing-window anomaly detection over the event stream
# --------------------------------------------------------------------------

ZSCORE_LOOKBACK = 10   # trailing events per user forming the baseline
ZSCORE_MIN_N = 5       # baseline must have at least this many events
ZSCORE_TAU = 2.0       # |z| threshold (compared on the rounded value)


@_register(
    "events_value_anomalies",
    f"""
    SELECT user_id, event_id, event_type, value, z FROM (
      SELECT user_id, event_id, event_type, value,
             COUNT(value) OVER w AS n,
             AVG(value) OVER w AS mu,
             STDDEV_SAMP(value) OVER w AS sd,
             ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w,
                   6) AS z
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
    ) t
    WHERE n >= {ZSCORE_MIN_N} AND sd > 0 AND ABS(z) > {ZSCORE_TAU}
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-window anomaly detection: each event's value is
    z-scored against that user's previous ZSCORE_LOOKBACK events (the
    event itself excluded — no self-contamination); events more than
    ZSCORE_TAU sample-stddevs from their trailing mean are flagged.

    One hash exchange on user_id serves every window aggregate (shared
    frame), then a row-local filter — the standard streaming-analytics
    shape run as batch. The z is rounded BEFORE thresholding so the
    boundary decision is identical across engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    z = F.round((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 6)
    return (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.count("value").over(w).alias("n"),
            F.stddev_samp("value").over(w).alias("sd"),
            z.alias("z"),
        )
        .filter(
            (F.col("n") >= ZSCORE_MIN_N)
            & (F.col("sd") > 0)
            & (F.abs(F.col("z")) > ZSCORE_TAU)
        )
        .select("user_id", "event_id", "event_type", "value", "z")
    )


# --------------------------------------------------------------------------
# Data-quality constraint validation: the ingest gate a 100 TB pipeline
# runs before publishing a snapshot (the distributed generalization of the
# reference's per-object readiness/validity checks, main.go:341-357).
# --------------------------------------------------------------------------

DQ_ORDERDATE_MIN, DQ_ORDERDATE_MAX = "1992-01-01", "1998-12-31"

_DQ_SQL = f"""
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
      SELECT 'orders_null_pk' AS rule, COUNT(*) AS n_violations
      FROM orders WHERE o_orderkey IS NULL
      UNION ALL
      SELECT 'orders_duplicate_pk',
             COALESCE(SUM(cnt - 1), 0)
      FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders
            GROUP BY o_orderkey HAVING COUNT(*) > 1) d
      UNION ALL
      SELECT 'orders_date_out_of_range', COUNT(*)
      FROM orders
      WHERE o_orderdate < DATE '{DQ_ORDERDATE_MIN}'
         OR o_orderdate > DATE '{DQ_ORDERDATE_MAX}'
      UNION ALL
      SELECT 'lineitem_null_fk', COUNT(*)
      FROM lineitem WHERE l_orderkey IS NULL
      UNION ALL
      SELECT 'lineitem_orphan_fk', COUNT(*)
      FROM lineitem WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
        (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
      UNION ALL
      SELECT 'lineitem_nonpositive_quantity', COUNT(*)
      FROM lineitem WHERE l_quantity <= 0
      UNION ALL
      SELECT 'lineitem_negative_price', COUNT(*)
      FROM lineitem WHERE l_extendedprice < 0
      UNION ALL
      SELECT 'customer_null_nation_fk', COUNT(*)
      FROM customer WHERE c_nationkey IS NULL
      UNION ALL
      SELECT 'customer_invalid_nation_fk', COUNT(*)
      FROM customer WHERE c_nationkey IS NOT NULL AND c_nationkey NOT IN
        (SELECT n_nationkey FROM nation)
    ) v ORDER BY rule
"""


@_register("dq_violations_report", _DQ_SQL)
def dq_violations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report: one row per data-quality rule with
    its violation count — PK nullability/uniqueness, FK referential
    integrity (orphan facts, dangling dims), domain ranges.

    Scale shape: each rule is one aggregate over one pruned scan —
    single-column counts, map-side partial aggregation, and the FK
    checks are anti-join-shaped (Catalyst turns NOT IN over a non-null
    key into a left anti join; nation broadcasts, the orders key side
    shuffles once at 100 TB). The rules union to a 9-row report, so the
    final exchange is trivially small. A pipeline gates the snapshot
    publish (store.publish) on every count being zero.

    NULL FK handling is explicit and engine-identical: NULL foreign
    keys are counted by their own *_null_fk rules, and the orphan rules
    count only non-null keys on BOTH engines (a bare NOT IN would drop
    NULL rows in ANSI SQL while a left-anti join counts them)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def one(rule: str, n: DataFrame) -> DataFrame:
        return n.select(F.lit(rule).alias("rule"),
                        F.col("n").cast("long").alias("n_violations"))

    dup = (
        orders.groupBy("o_orderkey").count().filter("count > 1")
        .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("n"))
    )
    checks = [
        one("orders_null_pk",
            orders.filter(F.col("o_orderkey").isNull()).agg(F.count("*").alias("n"))),
        one("orders_duplicate_pk", dup),
        one("orders_date_out_of_range",
            orders.filter(
                (F.col("o_orderdate") < F.lit(DQ_ORDERDATE_MIN).cast("date"))
                | (F.col("o_orderdate") > F.lit(DQ_ORDERDATE_MAX).cast("date"))
            ).agg(F.count("*").alias("n"))),
        one("lineitem_null_fk",
            lineitem.filter(F.col("l_orderkey").isNull())
            .agg(F.count("*").alias("n"))),
        one("lineitem_orphan_fk",
            lineitem.filter(F.col("l_orderkey").isNotNull())
            .join(orders.filter(F.col("o_orderkey").isNotNull())
                  .select("o_orderkey"),
                  lineitem.l_orderkey == orders.o_orderkey,
                  "left_anti").agg(F.count("*").alias("n"))),
        one("lineitem_nonpositive_quantity",
            lineitem.filter(F.col("l_quantity") <= 0).agg(F.count("*").alias("n"))),
        one("lineitem_negative_price",
            lineitem.filter(F.col("l_extendedprice") < 0).agg(F.count("*").alias("n"))),
        one("customer_null_nation_fk",
            customer.filter(F.col("c_nationkey").isNull())
            .agg(F.count("*").alias("n"))),
        one("customer_invalid_nation_fk",
            customer.filter(F.col("c_nationkey").isNotNull())
            .join(F.broadcast(nation.select("n_nationkey")),
                  customer.c_nationkey == nation.n_nationkey,
                  "left_anti").agg(F.count("*").alias("n"))),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("rule")


# --------------------------------------------------------------------------
# Behavioral analytics: cohort retention + ordered funnel over events.
# --------------------------------------------------------------------------

_COHORT_SQL = """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    )
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
           CAST(datediff('day', cohort_week, active_week) / 7 AS INTEGER)
             AS week_offset,
           COUNT(*) AS n_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
"""


@_register("cohort_weekly_retention", _COHORT_SQL)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in each later week they were active — the retention triangle
    every product-analytics stack computes.

    Scale shape: two user-keyed aggregates (first week, distinct
    user-weeks — both map-side partial) and one equi-join on user_id
    sharing the hash partitioning, then a tiny (cohorts x offsets)
    final aggregate. Week truncation is ISO-Monday in both engines."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            # ISO string on both engines: a raw DATE surfaces as python
            # objects from Spark but datetime64 from DuckDB, failing the
            # dtype-strict compare even when values agree
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


_FUNNEL_SQL = """
    WITH s AS (SELECT user_id, MIN(ts) AS ts_s FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, MIN(e.ts) AS ts_v FROM events e
          JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'view' AND e.ts > s.ts_s GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS ts_p FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.ts > v.ts_v GROUP BY e.user_id)
    SELECT stage, n_users FROM (
      SELECT 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s
      UNION ALL SELECT 'view_after_signup', COUNT(*) FROM v
      UNION ALL SELECT 'purchase_after_view', COUNT(*) FROM p
    ) f
"""


@_register("funnel_signup_view_purchase", _FUNNEL_SQL)
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: first signup, first view
    AFTER that signup, first purchase AFTER that view — each stage's
    user count. The ordered-sequence semantics (not mere co-occurrence)
    is what makes funnels funnel-shaped.

    Scale shape: each stage is one filtered user-keyed aggregate joined
    to the previous stage's (user, ts) relation — all hash-partitioned
    on user_id, so the three stages reuse one exchange under AQE; the
    final union is 3 rows."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_s"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("ts_s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_v"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("ts_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_p"))
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage("signup", s)
        .unionByName(stage("view_after_signup", v))
        .unionByName(stage("purchase_after_view", p))
    )


_RISING_RUNS_SQL = """
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             LAG(value, 1) OVER w AS v1, LAG(value, 2) OVER w AS v2,
             LAG(event_id, 2) OVER w AS start_event
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, start_event, event_id AS end_event,
           CAST(ROUND(value - v2, 2) AS DOUBLE) AS rise
    FROM seq
    WHERE v2 IS NOT NULL AND value > v1 AND v1 > v2
"""


@_register("pattern_rising_purchase_runs", _RISING_RUNS_SQL)
def pattern_rising_purchase_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (the MATCH_RECOGNIZE shape batch
    engines bolt on): three consecutive strictly-rising purchase values
    per user, emitted as (start, end, total rise). Two LAGs over one
    per-user window — a single hash exchange on user_id serves the whole
    pattern, and longer patterns are more LAG columns on the same frame,
    not more shuffles. Row-local float subtraction rounded to 2 so both
    engines agree bit-for-bit."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("value", 2).over(w).alias("v2"),
        F.lag("event_id", 2).over(w).alias("start_event"),
    )
    return (
        seq.filter(
            F.col("v2").isNotNull()
            & (F.col("value") > F.col("v1"))
            & (F.col("v1") > F.col("v2"))
        )
        .select(
            "user_id",
            "start_event",
            F.col("event_id").alias("end_event"),
            F.round(F.col("value") - F.col("v2"), 2).cast("double").alias("rise"),
        )
    )


# --------------------------------------------------------------------------
# Incremental materialized-view maintenance (X7 storage tier, store.py)
# --------------------------------------------------------------------------

_MV_SQL = """
    WITH agg AS (
      SELECT o_orderstatus,
             COUNT(*) AS n_rows,
             SUM(o_totalprice) AS s,
             SUM(o_totalprice * o_totalprice) AS q,
             MIN(o_totalprice) AS min_price,
             MAX(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           n_rows,
           ROUND(s, 2) AS sum_price,
           ROUND(s / n_rows, 6) AS avg_price,
           min_price,
           max_price,
           ROUND(q / n_rows - (s / n_rows) * (s / n_rows), 2) AS var_price
    FROM agg ORDER BY o_orderstatus
"""


@_register("mv_incremental_orders_stats", _MV_SQL)
def mv_incremental_orders_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view algebra end-to-end: orders arrives
    as three hash-split deltas; the view state is built from delta 0 and
    REFRESHED twice by merging delta partials (store.mv_partials /
    mv_merge — sum-of-sums, min-of-mins, count+sumsq), then finalized.
    The oracle computes the same aggregate DIRECTLY over the whole
    table with the same algebra, so the value-hash check proves
    merge(partial(d0), partial(d1), partial(d2)) == full recompute —
    the correctness core of incremental view maintenance.

    Scale: each refresh shuffles only the delta and the group-key
    relation (O(|delta| + |groups|)), never the base; the stored state
    is the partial relation itself, published atomically via
    SnapshotStore versions (see store.MaterializedView)."""
    from .store import mv_finalize, mv_merge, mv_partials

    o = load_table(spark, sf_dir, "orders")
    keys, measures = ("o_orderstatus",), ("o_totalprice",)
    deltas = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    state = mv_partials(deltas[0], keys, measures)
    for d in deltas[1:]:
        state = mv_merge(state, mv_partials(d, keys, measures), keys, measures)
    v = mv_finalize(state, keys, measures)
    return v.select(
        "o_orderstatus",
        "n_rows",
        F.round("sum_o_totalprice", 2).alias("sum_price"),
        F.round("avg_o_totalprice", 6).alias("avg_price"),
        F.col("min_o_totalprice").alias("min_price"),
        F.col("max_o_totalprice").alias("max_price"),
        F.round("var_o_totalprice", 2).alias("var_price"),
    ).orderBy("o_orderstatus")


@_register("approx_ndv_users_incremental", None)  # rows-only: sketch binaries engine-specific
def approx_ndv_users_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained APPROX COUNT(DISTINCT): events arrives
    as three hash-split deltas whose per-group Datasketches HLL sketches
    (Spark 4 hll_sketch_agg) are merged with hll_union_agg and finalized
    to estimates. COUNT(DISTINCT) is the aggregate exact algebra cannot
    maintain incrementally (partials would need the full value set);
    the sketch partial is bounded (KB per group) and losslessly
    mergeable — unit laws pin merged == single-shot exactly, and
    estimate within 5% of exact NDV. Rows-only driver check: sketch
    binaries are engine-specific."""
    from .store import mv_finalize, mv_merge, mv_partials

    e = load_table(spark, sf_dir, "events")
    keys, distinct = ("event_type",), ("user_id",)
    deltas = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    state = mv_partials(deltas[0], keys, (), distinct)
    for d in deltas[1:]:
        state = mv_merge(state, mv_partials(d, keys, (), distinct), keys, (), distinct)
    return (
        mv_finalize(state, keys, (), distinct)
        .select("event_type", "n_rows", "approx_ndv_user_id")
        .orderBy("event_type")
    )


@_register(
    "sessionize_events_native",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts)
                       >= 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def sessionize_events_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via Spark's NATIVE session_window — the same
    operator the streaming tier uses, here in batch: one groupBy, the
    session merge happens inside the aggregation (no lag + running-sum
    window pair). Boundary semantics differ from the lag formulation:
    session_window's window is [ts, ts+gap), so an event exactly gap
    after its predecessor starts a NEW session — the oracle mirrors
    that with >=. session_start == first event, session_end == last
    event + gap (the native operator's contract).

    Scale: one exchange on user_id; within partitions the merge is a
    sort + linear scan — strictly cheaper than the two stacked window
    functions of the lag formulation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@_register(
    "sample_k_per_group_docs",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents) t
    WHERE rn <= 3
    """,
)
def sample_k_per_group_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling (k=3 docs per language):
    rank by md5 of the key — a uniform-but-reproducible order, the same
    content-addressed trick the split/sample tier uses — and keep the
    first k. Unlike rand()-based sampling this is stable across runs,
    clusters, and partitionings, so eval subsets are auditable. One
    window over the group key; at scale, groups with billions of rows
    would use a per-partition top-k pre-prune first (same as top-k)."""
    d = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        d.select("doc_id", "lang", "source", rn.alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@_register(
    "histogram_equidepth_prices",
    """
    WITH b AS (
      SELECT o_totalprice,
             NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_equidepth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 quantile buckets of equal row count) —
    the complement of the existing equi-width histogram; NTILE over a
    total order (price, key tiebreak) makes bucket boundaries exactly
    reproducible in both engines. The optimizer-statistics shape: bucket
    boundaries are the quantile summary a cost model consumes.

    Scale note: the global NTILE is a single-partition window — exact
    and oracle-checkable, right for dimension-sized inputs like orders.
    For a 100 TB fact table the same output shape comes from
    approx_percentile boundaries + a range bucket join (no global
    sort); this query deliberately pins the EXACT tier."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        "o_totalprice",
        F.ntile(8).over(W.orderBy("o_totalprice", "o_orderkey")).alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@_register(
    "er_part_name_clusters",
    """
    WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
    edges AS (
      SELECT a.p_name AS x, b.p_name AS y
      FROM names a JOIN names b ON a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    ),
    sym AS (SELECT x, y FROM edges UNION SELECT y, x FROM edges),
    reach(node, lab) AS (
      SELECT x, x FROM sym
      UNION
      SELECT s.y, r.lab FROM reach r JOIN sym s ON s.x = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS canonical FROM reach GROUP BY node)
    SELECT node AS p_name, canonical,
           COUNT(*) OVER (PARTITION BY canonical) AS cluster_size
    FROM comp
    """,
)
def er_part_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy candidate pairs over the
    DISTINCT name domain (edit distance ≤ 4, see fuzzy_part_name_pairs
    for the domain-reduction scale argument) → connected components →
    per cluster a canonical representative (min name) + cluster size.
    The full dedup-entities pipeline a catalog/MDM system runs, composed
    from the engine's own kernels; oracle is the recursive-CTE
    transitive closure over the identical edge set."""
    edges = fuzzy_part_name_pairs(spark, sf_dir).select("name_a", "name_b")
    from .llmops.dedup import connected_components

    comp = connected_components(edges, a="name_a", b="name_b")
    return comp.select(
        F.col("node").alias("p_name"),
        F.col("comp").alias("canonical"),
    ).withColumn(
        "cluster_size", F.count("*").over(W.partitionBy("canonical"))
    )


@_register(
    "weighted_sample_docs",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
             LN((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1)
                / 4294967296.0) / n_chars AS k
      FROM documents
    )
    SELECT doc_id, n_chars, ROUND(k, 6) AS priority
    FROM keyed ORDER BY k DESC, doc_id LIMIT 50
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirtsos A-ES):
    each row gets key u^(1/w) — here the equivalent ln(u)/w — with u a
    DETERMINISTIC md5-derived uniform instead of an RNG, and the top-k
    keys are the sample. Heavier documents (w = n_chars) win
    proportionally more often, yet the draw is a pure projection +
    top-k: reproducible row-for-row on any engine/cluster/partitioning,
    which rand()-based weighted sampling can never be.

    Scale: no shuffle before the top-k; TakeOrdered keeps k rows per
    partition then merges — O(k) driver footprint."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    k = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", k.alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(50)
        .select("doc_id", "n_chars", F.round("k", 6).alias("priority"))
    )


@_register(
    "gapfill_interpolate_hourly",
    """
    WITH bounds AS (
      SELECT CAST(DATE_TRUNC('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(DATE_TRUNC('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    hours AS (
      SELECT UNNEST(generate_series((SELECT lo FROM bounds),
                                    (SELECT hi FROM bounds),
                                    INTERVAL 1 HOUR)) AS hour
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT h.hour, t.event_type,
             CAST(epoch_us(h.hour) / 3600000000 AS BIGINT) AS idx,
             COALESCE(a.n, 0) AS n, a.v
      FROM hours h CROSS JOIN types t
      LEFT JOIN agg a ON a.hour = h.hour AND a.event_type = t.event_type
    ),
    ctx AS (
      SELECT *,
        LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
        FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
      FROM grid
    )
    SELECT hour, event_type, n,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * (idx - pi) / (ni - pi)
                 END, 6) AS value_interp
    FROM ctx
    """,
)
def gapfill_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with LINEAR INTERPOLATION (the
    `interpolate()` half of time_bucket_gapfill, next to the zero-fill
    twin): empty hourly buckets get the line between their previous and
    next observed per-type averages; leading/trailing gaps take the
    nearest observation. Bucket averages divide an exact DECIMAL sum so
    both engines interpolate from identical doubles.

    Scale: same bounded grid as gapfill_hourly_events (hours × types
    after one aggregation); the four IGNORE-NULLS windows share one
    partitioning on event_type."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    agg = (
        e.groupBy(hour.alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("v"),
        )
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = e.select("event_type").distinct()
    grid = (
        hours.crossJoin(types)
        .join(agg, ["hour", "event_type"], "left")
        .withColumn("idx", (F.unix_micros("hour") / F.lit(3600000000)).cast("long"))
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )
    back = W.partitionBy("event_type").orderBy("idx").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    fwd = W.partitionBy("event_type").orderBy("idx").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    obs_idx = F.when(F.col("v").isNotNull(), F.col("idx"))
    ctx = (
        grid.withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("pi", F.last(obs_idx, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("ni", F.first(obs_idx, ignorenulls=True).over(fwd))
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("idx") - F.col("pi"))
            / (F.col("ni") - F.col("pi"))
        )
    )
    return ctx.select(
        "hour", "event_type", "n", F.round(filled, 6).alias("value_interp")
    )


@_register(
    "window_rolling_corr_qty_price",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(corr(l_quantity, l_extendedprice) OVER (
             PARTITION BY l_returnflag
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_suppkey
             ROWS BETWEEN 99 PRECEDING AND CURRENT ROW), 6) AS rolling_corr
    FROM lineitem
    QUALIFY rolling_corr IS NOT NULL
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_rolling_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling correlation (quantity vs price over a trailing 100-row
    window per return flag) — the moving-association signal risk/drift
    monitors compute; corr as a WINDOW aggregate, not a group aggregate.
    Round(6) absorbs the engines' different moment-update orders.

    The ORDER BY spells out a TOTAL order — (l_orderkey, l_linenumber)
    is NOT unique in this fixture, and a row frame over a tied order is
    nondeterministic (DuckDB's parallel sort broke ties differently
    across runs; caught by a full-window rehearsal, not the single
    lucky-pass parity run). (orderkey, linenumber, partkey, suppkey) is
    verified unique.

    Scale: one exchange on the partition key; the frame is row-bounded
    so state per window is O(1) moments, never frame-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_returnflag")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
        )
        .rowsBetween(-99, W.currentRow)
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.corr("l_quantity", "l_extendedprice").over(w), 6).alias(
                "rolling_corr"
            ),
        )
        .filter(F.col("rolling_corr").isNotNull())
        .orderBy("l_orderkey", "l_linenumber")
    )


@_register(
    "profile_column_stats_orders",
    """
    SELECT 'o_orderkey' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS ndv,
           ROUND(MIN(o_orderkey), 2) AS min_num,
           ROUND(MAX(o_orderkey), 2) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           ROUND(MIN(o_custkey), 2), ROUND(MAX(o_custkey), 2)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           ROUND(MIN(o_totalprice), 2), ROUND(MAX(o_totalprice), 2)
    FROM orders
    ORDER BY col
    """,
)
def profile_column_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style column statistics (the CBO's food): per
    numeric column — row count, null count, exact NDV, min, max — in
    ONE pass over the table (all aggregates fused into a single
    map-side-partial aggregation, then unpivoted to the long stats
    shape; the oracle's UNION-ALL formulation would scan once per
    column).

    Scale: a single scan + one 1-row exchange; NDV is exact here
    (dimension-sized input) — the 100 TB variant swaps countDistinct
    for the HLL sketch the store's MV tier already carries."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_ndv_{c}"),
            F.round(F.min(c).cast("double"), 2).alias(f"_min_{c}"),
            F.round(F.max(c).cast("double"), 2).alias(f"_max_{c}"),
        ]
    wide = o.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.col(f"_ndv_{c}").alias("ndv"),
            F.col(f"_min_{c}").alias("min_num"),
            F.col(f"_max_{c}").alias("max_num"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("col")
    )


@_register(
    "profile_key_candidates",
    """
    SELECT 'orders.o_orderkey unique' AS probe,
           CASE WHEN COUNT(DISTINCT o_orderkey) = COUNT(o_orderkey)
                 AND COUNT(*) = COUNT(o_orderkey) THEN 1 ELSE 0 END AS holds
    FROM orders
    UNION ALL
    SELECT 'lineitem.l_orderkey unique',
           CASE WHEN COUNT(DISTINCT l_orderkey) = COUNT(l_orderkey)
                 AND COUNT(*) = COUNT(l_orderkey) THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
           CASE WHEN NOT EXISTS (
             SELECT 1 FROM lineitem l LEFT JOIN orders o
               ON l.l_orderkey = o.o_orderkey
             WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
           ) THEN 1 ELSE 0 END
    UNION ALL
    SELECT 'orders.o_custkey -> customer.c_custkey',
           CASE WHEN NOT EXISTS (
             SELECT 1 FROM orders o LEFT JOIN customer c
               ON o.o_custkey = c.c_custkey
             WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
           ) THEN 1 ELSE 0 END
    ORDER BY probe
    """,
)
def profile_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint DISCOVERY (schema profiling): test uniqueness (primary
    key candidates) and inclusion dependencies (foreign key candidates)
    from the data itself — what a catalog crawler infers before anyone
    declares constraints. Uniqueness is one aggregate per table; each
    FK probe is a left-anti existence check on distinct keys.

    Scale: uniqueness = map-side-partial count vs countDistinct;
    inclusion = anti join of the child's DISTINCT key domain (value-
    domain-sized, not row-sized) against the parent — the same
    domain-reduction argument as the fuzzy join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    def unique_probe(df: DataFrame, col: str, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("probe"),
            F.when(
                (F.countDistinct(col) == F.count(col))
                & (F.count("*") == F.count(col)),
                1,
            )
            .otherwise(0)
            .alias("holds"),
        )

    def fk_probe(child: DataFrame, ck: str, parent: DataFrame, pk: str, label: str) -> DataFrame:
        orphans = (
            child.select(F.col(ck).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
            .join(parent.select(F.col(pk).alias("k")).distinct(), "k", "left_anti")
        )
        return orphans.agg(
            F.lit(label).alias("probe"),
            F.when(F.count("*") == 0, 1).otherwise(0).alias("holds"),
        )

    return (
        unique_probe(o, "o_orderkey", "orders.o_orderkey unique")
        .unionByName(unique_probe(li, "l_orderkey", "lineitem.l_orderkey unique"))
        .unionByName(
            fk_probe(li, "l_orderkey", o, "o_orderkey",
                     "lineitem.l_orderkey -> orders.o_orderkey")
        )
        .unionByName(
            fk_probe(o, "o_custkey", c, "c_custkey",
                     "orders.o_custkey -> customer.c_custkey")
        )
        .orderBy("probe")
    )


@_register(
    "profile_fd_violations",
    """
    WITH probes AS (
      SELECT 'lineitem: l_partkey -> l_suppkey' AS fd,
             l_partkey AS lhs, CAST(l_suppkey AS VARCHAR) AS rhs
      FROM lineitem WHERE l_partkey IS NOT NULL
      UNION ALL
      SELECT 'orders: o_custkey -> o_orderpriority',
             o_custkey, o_orderpriority
      FROM orders WHERE o_custkey IS NOT NULL
      UNION ALL
      SELECT 'orders: o_orderkey -> o_orderstatus',
             o_orderkey, o_orderstatus
      FROM orders WHERE o_orderkey IS NOT NULL
      UNION ALL
      SELECT 'customer: c_nationkey -> c_mktsegment',
             c_nationkey, c_mktsegment
      FROM customer WHERE c_nationkey IS NOT NULL
    ), pair_counts AS (
      SELECT fd, lhs, rhs, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM probes GROUP BY fd, lhs, rhs
    ), keep AS (
      SELECT fd, lhs, MAX(cnt) AS keep_cnt, SUM(cnt) AS lhs_cnt
      FROM pair_counts GROUP BY fd, lhs
    )
    SELECT fd,
           CAST(SUM(lhs_cnt) AS BIGINT)  AS n_rows,
           CAST(SUM(keep_cnt) AS BIGINT) AS n_keep,
           ROUND(1.0 - CAST(SUM(keep_cnt) AS DOUBLE)
                       / CAST(SUM(lhs_cnt) AS DOUBLE), 6) AS g3_violation
    FROM keep
    GROUP BY fd
    ORDER BY fd
    """,
)
def profile_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency discovery with the g3 error
    measure (Kivinen-Mannila: the minimum fraction of rows to delete
    for lhs → rhs to hold exactly — 0 means the FD holds). Each probe
    is two map-side-combinable aggregations: count per (lhs, rhs)
    pair, keep the majority rhs per lhs, reduce to one row per FD.

    Scale: the shuffled relation per probe is the DISTINCT (lhs, rhs)
    domain, never the table; probes over the same table still scan it
    once each here for clarity — a crawler batching dozens of FDs
    would pivot them through one scan like profile_column_stats."""

    def probe(df: DataFrame, lhs: str, rhs: str, label: str) -> DataFrame:
        pair = (
            df.filter(F.col(lhs).isNotNull())
            .groupBy(
                F.col(lhs).alias("lhs"),
                F.col(rhs).cast("string").alias("rhs"),
            )
            .agg(F.count("*").alias("cnt"))
        )
        keep = pair.groupBy("lhs").agg(
            F.max("cnt").alias("keep_cnt"), F.sum("cnt").alias("lhs_cnt")
        )
        return keep.agg(
            F.lit(label).alias("fd"),
            F.sum("lhs_cnt").cast("bigint").alias("n_rows"),
            F.sum("keep_cnt").cast("bigint").alias("n_keep"),
            F.round(
                F.lit(1.0)
                - F.sum("keep_cnt").cast("double")
                / F.sum("lhs_cnt").cast("double"),
                6,
            ).alias("g3_violation"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        probe(li, "l_partkey", "l_suppkey", "lineitem: l_partkey -> l_suppkey")
        .unionByName(
            probe(o, "o_custkey", "o_orderpriority",
                  "orders: o_custkey -> o_orderpriority")
        )
        .unionByName(
            probe(o, "o_orderkey", "o_orderstatus",
                  "orders: o_orderkey -> o_orderstatus")
        )
        .unionByName(
            probe(c, "c_nationkey", "c_mktsegment",
                  "customer: c_nationkey -> c_mktsegment")
        )
        .orderBy("fd")
    )


@_register(
    "profile_value_shapes",
    """
    WITH vals AS (
      SELECT 'customer.c_name' AS col, c_name AS val FROM customer
      UNION ALL
      SELECT 'part.p_brand', p_brand FROM part
      UNION ALL
      SELECT 'part.p_type', p_type FROM part
    ), shaped AS (
      SELECT col,
             regexp_replace(regexp_replace(regexp_replace(
               val, '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), '[a-z]', 'a',
               'g') AS shape,
             val
      FROM vals WHERE val IS NOT NULL
    )
    SELECT col, shape,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           MIN(val) AS example
    FROM shaped
    GROUP BY col, shape
    ORDER BY col, shape
    """,
)
def profile_value_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-pattern census (the profiler step that catches mixed
    formats before they break a parser): map every string to its
    shape — digits → 9, uppercase → A, lowercase → a, punctuation
    kept verbatim — and count rows per (column, shape), with the
    lexicographically-first example as evidence.

    Scale: shapes are computed JVM-side (chained regexp_replace, no
    Python), and the shuffled relation is one row per distinct shape —
    format censuses are tiny even when tables aren't."""

    def shaped(df: DataFrame, colname: str, label: str) -> DataFrame:
        shape = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(colname), "[0-9]", "9"),
                "[A-Z]",
                "A",
            ),
            "[a-z]",
            "a",
        )
        return (
            df.filter(F.col(colname).isNotNull())
            .select(
                F.lit(label).alias("col"),
                shape.alias("shape"),
                F.col(colname).alias("val"),
            )
        )

    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    allv = (
        shaped(c, "c_name", "customer.c_name")
        .unionByName(shaped(p, "p_brand", "part.p_brand"))
        .unionByName(shaped(p, "p_type", "part.p_type"))
    )
    return (
        allv.groupBy("col", "shape")
        .agg(
            F.count("*").cast("bigint").alias("n_values"),
            F.min("val").alias("example"),
        )
        .orderBy("col", "shape")
    )


@_register("sliding_distinct_users_hourly", None)  # rows-only: sketch binaries engine-specific
def sliding_distinct_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window COUNT(DISTINCT): distinct users per hour AND over
    the trailing 3-hour window — the second via HLL sketch UNION AS A
    WINDOW AGGREGATE (hll_union_agg over a row frame). This is the
    query shape exact semantics cannot scale: an exact trailing
    distinct needs every window to re-deduplicate its full user set
    (window-size × buckets blowup), while the sketch version carries
    one KB-bounded sketch per bucket and unions three of them per row.
    Unit law pins the estimates against exact trailing distincts (the
    sparse HLL regime is exact at fixture cardinalities)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.countDistinct("user_id").alias("ndv_hour"),
            F.hll_sketch_agg("user_id").alias("sk"),
        )
    )
    w = W.orderBy("hour").rowsBetween(-2, 0)
    return (
        hourly.select(
            "hour",
            "ndv_hour",
            F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
                "ndv_trailing_3h"
            ),
        )
        .orderBy("hour")
    )


@_register(
    "weighted_median_price_by_flag",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_partkey, l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
      FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(MIN(l_extendedprice), 2) AS weighted_median_price
    FROM w
    WHERE cumw >= totw / 2.0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (the robust center no built-in provides): the
    smallest price whose cumulative quantity-weight reaches half the
    group's total — one ordered cumulative-sum window over a TOTAL
    order (the rolling-corr lesson: ties in the order would make cumw,
    and therefore the crossing row, engine-dependent) plus a min-
    aggregate over the crossing set. Quantities are integers in this
    fixture, so cumw/totw are exact and the crossing row is
    deterministic in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = W.partitionBy("l_returnflag")
    cum = (
        li.withColumn("cumw", F.sum("l_quantity").over(w))
        .withColumn("totw", F.sum("l_quantity").over(tot))
    )
    return (
        cum.filter(F.col("cumw") >= F.col("totw") / 2.0)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 2).alias("weighted_median_price"))
        .orderBy("l_returnflag")
    )


@_register(
    "division_customers_all_priorities",
    """
    SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) =
           (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
    ORDER BY o_custkey
    """,
)
def division_customers_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION (the "for all" quantifier — customers who
    placed orders in EVERY priority class): the classic operator SQL
    has no keyword for, expressed as the count-distinct-equality
    rewrite. The divisor cardinality is a 1-row scalar that broadcasts;
    the dividend side is one map-side-partial distinct aggregation on
    the group key."""
    o = load_table(spark, sf_dir, "orders")
    total = o.agg(F.countDistinct("o_orderpriority").alias("_t"))
    return (
        o.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("n_priorities"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_priorities") == F.col("_t"))
        .drop("_t")
        .orderBy("o_custkey")
    )


@_register(
    "mad_price_by_flag",
    """
    WITH med AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(MAX(m.med), 6) AS median_price,
           ROUND(quantile_cont(ABS(l.l_extendedprice - m.med), 0.5), 6) AS mad_price
    FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def mad_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the robust spread statistic outlier
    gates use where stddev is poisoned by the outliers themselves. Two
    exact interpolated quantile passes: group medians (tiny relation,
    broadcast back) then the median of absolute deviations. Both
    engines use the identical linear-interpolation quantile
    definition; round(6) absorbs the join-order float noise."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.max("med"), 6).alias("median_price"),
            F.round(
                F.percentile(F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)),
                6,
            ).alias("mad_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Linear-regression aggregates, deterministic mode, gaps-and-islands
# (round-6 fourth wave)
# --------------------------------------------------------------------------

@_register(
    "regression_price_on_qty_by_flag",
    """
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def regression_price_on_qty_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares aggregates (slope / intercept /
    R2 / pair count) of extendedprice on quantity — the SQL-standard
    ``REGR_*`` family, one partial-aggregable pass (sums of x, y, xy,
    x2, y2 combine associatively, so map-side combine applies and the
    shuffle carries 5 doubles per group). Rounded to 6 decimals: the
    moment algebra agrees across engines far past that (same contract
    as stats_aggregates_lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "mode_event_type_by_user",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n_events
      FROM events GROUP BY user_id, event_type
    ), ranked AS (
      SELECT user_id, event_type, n_events,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n_events DESC, event_type) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS top_event_type, n_events
    FROM ranked WHERE rn = 1
    """,
)
def mode_event_type_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: most frequent event_type per user,
    ties broken lexicographically. Built-in ``mode()`` is
    tie-nondeterministic in both engines, so the portable form is
    count + rank — two exchanges on user_id that AQE plans as one
    (the count's shuffle already co-locates the window's key)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n_events"))
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), "n_events")
    )


@_register(
    "islands_user_active_hours",
    """
    WITH hours AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT) AS hr
      FROM events
    ), marked AS (
      SELECT user_id, hr,
             hr - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hr) AS island
      FROM hours
    ), islands AS (
      SELECT user_id, island, COUNT(*) AS run_hours
      FROM marked GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           MAX(run_hours) AS longest_run_hours,
           CAST(SUM(run_hours) AS BIGINT) AS total_active_hours
    FROM islands GROUP BY user_id
    """,
)
def islands_user_active_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user activity hours: maximal runs of
    consecutive hours with >=1 event, via the classic
    value-minus-row_number grouping key. All integer arithmetic
    (microsecond epochs floor-divided to hour indexes), so exactly
    reproducible. One exchange on user_id serves the distinct, the
    window, and both aggregations."""
    e = load_table(spark, sf_dir, "events")
    hr = F.floor(F.unix_micros(F.col("ts")) / 3_600_000_000).cast("bigint")
    hours = e.select("user_id", hr.alias("hr")).distinct()
    w = W.partitionBy("user_id").orderBy("hr")
    return (
        hours.withColumn("island", F.col("hr") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("run_hours"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("run_hours").alias("longest_run_hours"),
            F.sum("run_hours").cast("bigint").alias("total_active_hours"),
        )
    )


@_register(
    "skew_report_lineitem_partkey",
    """
    WITH c AS (
      SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey) AS rn FROM c
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS ndv,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM c
    ), top10 AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows FROM ranked WHERE rn <= 10
    )
    SELECT n_rows, ndv, max_cnt,
           ROUND(CAST(max_cnt AS DOUBLE) / n_rows, 6) AS max_key_share,
           ROUND(CAST(top10_rows AS DOUBLE) / n_rows, 6) AS top10_share,
           ROUND(CAST(n_rows AS DOUBLE) / ndv, 6) AS avg_rows_per_key
    FROM tot CROSS JOIN top10
    """,
)
def skew_report_lineitem_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis for a join/aggregation key: NDV,
    hottest-key share, top-10 share, mean rows per key — the numbers
    that decide between a plain shuffle, AQE skew-join, or explicit
    salting (salted_join above) BEFORE a 100 TB job is launched.

    One pass builds per-key counts (map-side combined); everything
    after is key-cardinality-sized, and the top-10 is a TakeOrdered,
    never a global sort."""
    from .session import pin

    li = load_table(spark, sf_dir, "lineitem")
    c = pin(li.groupBy("l_partkey").agg(F.count("*").alias("cnt")))
    tot = c.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("ndv"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    top10 = (
        c.orderBy(F.desc("cnt"), "l_partkey")
        .limit(10)
        .agg(F.sum("cnt").cast("bigint").alias("top10_rows"))
    )
    return tot.crossJoin(top10).select(
        "n_rows",
        "ndv",
        "max_cnt",
        F.round(F.col("max_cnt").cast("double") / F.col("n_rows"), 6).alias(
            "max_key_share"
        ),
        F.round(F.col("top10_rows").cast("double") / F.col("n_rows"), 6).alias(
            "top10_share"
        ),
        F.round(F.col("n_rows").cast("double") / F.col("ndv"), 6).alias(
            "avg_rows_per_key"
        ),
    )


# --------------------------------------------------------------------------
# Time-weighted average, OHLC resample, hash-sampled AQP
# (round-6 sixth wave)
# --------------------------------------------------------------------------

@_register(
    "twap_value_by_user",
    """
    WITH stepped AS (
      SELECT user_id,
             value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM events
    )
    SELECT user_id,
           ROUND(SUM(value * (t_next - t)) / SUM(t_next - t), 6) AS twap,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM stepped
    WHERE t_next IS NOT NULL
    GROUP BY user_id
    HAVING SUM(t_next - t) > 0
    """,
)
def twap_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user — each reading
    holds until the next one, so the mean weights values by how long
    they were current (the step-function integral sensors/prices need;
    a plain AVG over-weights bursts). Interval arithmetic is integer
    microseconds; one exchange on user_id serves the lead window and
    the aggregation."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    stepped = e.select(
        "user_id", "value", t.alias("t"), F.lead(t).over(w).alias("t_next")
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t")
    return (
        stepped.groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias("twap"),
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum(dt).alias("_span"),
        )
        .filter(F.col("_span") > 0)
        .drop("_span")
    )


@_register(
    "ohlc_hourly_value",
    """
    WITH ordered AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_ts,
             value,
             ROW_NUMBER() OVER (
               PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP))
               ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (
               PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP))
               ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT bar_ts,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ordered GROUP BY bar_ts
    """,
)
def ohlc_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: per hour, the opening value (earliest
    (ts, event_id)), high, low, closing value (latest), and the event
    count — the canonical time-series downsample. First/last are
    struct-extrema aggregates (min/max of (ts, event_id, value)), so
    the whole bar is ONE partial-aggregable pass — no window, no sort:
    map-side combine reduces each partition to one struct per bar
    before the shuffle, which is the shape that survives 100 TB of
    ticks."""
    e = load_table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts"))
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        e.groupBy(bar.alias("bar_ts"))
        .agg(
            first.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last.getField("value").alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


AQP_SAMPLE_THRESHOLD = "2"  # md5 hex < '2' → 2/16 = exactly 12.5 % of hash space


@_register(
    "aqp_revenue_estimate",
    """
    WITH sampled AS (
      SELECT CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
             md5('aqp:' || CAST(l_orderkey AS VARCHAR) || ':'
                        || CAST(l_linenumber AS VARCHAR)) < '2' AS in_sample
      FROM lineitem
    )
    SELECT CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           ROUND(CAST(SUM(CASE WHEN in_sample THEN rev END) AS DOUBLE) / 0.125, 2)
             AS est_revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS exact_revenue,
           ROUND(ABS(CAST(SUM(CASE WHEN in_sample THEN rev END) AS DOUBLE) / 0.125
                     - CAST(SUM(rev) AS DOUBLE))
                 / CAST(SUM(rev) AS DOUBLE), 6) AS rel_err
    FROM sampled
    """,
)
def aqp_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing on a DETERMINISTIC hash sample:
    rows whose md5(key) falls in the first 1/8 of hex space form an
    exactly-reproducible 12.5 % Bernoulli sample (no RNG, no seed
    state — the same rows everywhere, which is what makes a sampled
    estimate auditable). The estimate scales the sampled sum by the
    inverse rate; the exact pass rides the same single scan via
    conditional aggregation, so this query doubles as its own error
    audit. At scale you'd persist the sample as a materialized 1/8
    table and skip the exact branch."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.lit("aqp:"),
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    rev = dec("l_extendedprice") * (one() - rate("l_discount"))
    scored = li.select(
        rev.alias("rev"), (F.md5(key) < AQP_SAMPLE_THRESHOLD).alias("in_sample")
    )
    s_rev = F.sum(F.when(F.col("in_sample"), F.col("rev"))).cast("double")
    x_rev = F.sum("rev").cast("double")
    est = s_rev / 0.125
    return scored.agg(
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).cast("bigint").alias(
            "n_sampled"
        ),
        F.count("*").cast("bigint").alias("n_total"),
        F.round(est, 2).alias("est_revenue"),
        F.round(x_rev, 2).alias("exact_revenue"),
        F.round(F.abs(est - x_rev) / x_rev, 6).alias("rel_err"),
    )


# --------------------------------------------------------------------------
# Nearest as-of, winsorized stats, Benford audit, Poisson bootstrap
# (round-6 seventh wave)
# --------------------------------------------------------------------------

@_register(
    "asof_join_nearest_view",
    """
    WITH unioned AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts_us, 0 AS side,
             event_id AS eid, event_id AS q_eid, CAST(ts AS TIMESTAMP) AS q_ts
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id, NULL, NULL
      FROM events WHERE event_type = 'purchase'
    ), marked AS (
      SELECT user_id, side, eid, ts_us,
             LAST_VALUE(q_eid IGNORE NULLS) OVER wb AS b_eid,
             LAST_VALUE(q_ts IGNORE NULLS) OVER wb AS b_ts,
             LAST_VALUE(q_eid IGNORE NULLS) OVER wf AS f_eid,
             LAST_VALUE(q_ts IGNORE NULLS) OVER wf AS f_ts
      FROM unioned
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, side, eid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY ts_us DESC, side DESC, eid DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT eid AS purchase_event, user_id,
           CASE WHEN b_eid IS NULL AND f_eid IS NULL THEN NULL
                WHEN f_eid IS NULL THEN b_eid
                WHEN b_eid IS NULL THEN f_eid
                WHEN epoch_us(ts_us) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts_us) THEN b_eid
                ELSE f_eid END AS nearest_view_event,
           CASE WHEN b_eid IS NULL AND f_eid IS NULL THEN 'none'
                WHEN f_eid IS NULL THEN 'backward'
                WHEN b_eid IS NULL THEN 'forward'
                WHEN epoch_us(ts_us) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts_us) THEN 'backward'
                ELSE 'forward' END AS direction,
           CASE WHEN b_eid IS NULL AND f_eid IS NULL THEN NULL
                WHEN f_eid IS NULL THEN epoch_us(ts_us) - epoch_us(b_ts)
                WHEN b_eid IS NULL THEN epoch_us(f_ts) - epoch_us(ts_us)
                ELSE LEAST(epoch_us(ts_us) - epoch_us(b_ts),
                           epoch_us(f_ts) - epoch_us(ts_us)) END AS gap_us
    FROM marked WHERE side = 1
    """,
)
def asof_join_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'): each
    purchase matched to the same user's closest view in either time
    direction — backward wins ties, equal-timestamp views count as
    backward.

    Same O(n+m) union+window shape as the backward as-of above, run
    twice over ONE exchange on user_id: an ascending carry-forward pass
    (latest view at-or-before) and a descending pass (earliest view
    strictly after); the nearest pick is then a per-row CASE on the two
    integer-microsecond gaps. No join operator, no per-pair expansion."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("ts_us"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("eid"),
        F.col("event_id").alias("q_eid"),
        F.col("ts").alias("q_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ts_us"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("eid"),
        F.lit(None).cast("long").alias("q_eid"),
        F.lit(None).cast("timestamp").alias("q_ts"),
    )
    bounds = (W.unboundedPreceding, W.currentRow)
    wb = W.partitionBy("user_id").orderBy("ts_us", "side", "eid").rowsBetween(*bounds)
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.desc("side"), F.desc("eid"))
        .rowsBetween(*bounds)
    )
    marked = (
        views.unionByName(purchases)
        .withColumn("b_eid", F.last("q_eid", ignorenulls=True).over(wb))
        .withColumn("b_ts", F.last("q_ts", ignorenulls=True).over(wb))
        .withColumn("f_eid", F.last("q_eid", ignorenulls=True).over(wf))
        .withColumn("f_ts", F.last("q_ts", ignorenulls=True).over(wf))
        .filter(F.col("side") == 1)
    )
    gap_b = F.unix_micros(F.col("ts_us")) - F.unix_micros(F.col("b_ts"))
    gap_f = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts_us"))
    none_b, none_f = F.col("b_eid").isNull(), F.col("f_eid").isNull()
    back_wins = none_f | (~none_b & (gap_b <= gap_f))
    return marked.select(
        F.col("eid").alias("purchase_event"),
        "user_id",
        F.when(none_b & none_f, F.lit(None).cast("long"))
        .when(back_wins, F.col("b_eid"))
        .otherwise(F.col("f_eid"))
        .alias("nearest_view_event"),
        F.when(none_b & none_f, "none")
        .when(back_wins, "backward")
        .otherwise("forward")
        .alias("direction"),
        F.when(none_b & none_f, F.lit(None).cast("long"))
        .when(none_f, gap_b)
        .when(none_b, gap_f)
        .otherwise(F.least(gap_b, gap_f))
        .alias("gap_us"),
    )


@_register(
    "winsorized_price_stats",
    """
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_raw,
           ROUND(CAST(SUM(CAST(LEAST(GREATEST(CAST(l_extendedprice AS DOUBLE),
                                              lo), hi)
                               AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_winsorized,
           CAST(SUM(CASE WHEN CAST(l_extendedprice AS DOUBLE) < lo
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN CAST(l_extendedprice AS DOUBLE) > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clipped) mean per group beside the raw mean
    and clip counts — the robust-statistics gate feature pipelines
    apply before z-scoring heavy-tailed columns. Exactness contract:
    the clipped per-row double is cast to DECIMAL(18,6) before summing,
    so the group mean is summation-order-independent (same trick as the
    money columns); the tiny quantile relation broadcasts back onto the
    fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    price = F.col("l_extendedprice").cast("double")
    clipped = F.least(F.greatest(price, F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / F.count("*"), 6
            ).alias("mean_raw"),
            F.round(
                F.sum(clipped.cast("decimal(18,6)")).cast("double") / F.count("*"),
                6,
            ).alias("mean_winsorized"),
            F.sum(F.when(price < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(price > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
        )
    )


@_register(
    "benford_totalprice_audit",
    """
    WITH digits AS (
      SELECT SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                       1, 1) AS digit
      FROM orders
    ), counts AS (
      SELECT digit, COUNT(*) AS n_orders FROM digits GROUP BY digit
    ), tot AS (
      SELECT CAST(SUM(n_orders) AS DOUBLE) AS n FROM counts
    )
    SELECT digit, CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(n_orders / n, 6) AS observed_p,
           ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected_p,
           ROUND(ABS(n_orders / n
                     - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6) AS abs_dev
    FROM counts CROSS JOIN tot
    """,
)
def benford_totalprice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected log10(1 + 1/d) share per leading digit — the classic
    fabricated-numbers screen auditors run over financial columns (a
    synthetic uniform-ish price column fails it loudly, which is itself
    the point of the audit). One digit-projection pass, then everything
    is 9-row arithmetic."""
    from .session import pin

    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    )
    counts = pin(
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n_orders"))
    )
    tot = counts.agg(F.sum("n_orders").cast("double").alias("n"))
    obs = F.col("n_orders") / F.col("n")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round(obs, 6).alias("observed_p"),
        F.round(exp, 6).alias("expected_p"),
        F.round(F.abs(obs - exp), 6).alias("abs_dev"),
    )


# Poisson(1) CDF as 8-hex-digit thresholds over md5's first 32 bits:
# weight = #{k : md5_8 >= H[k]} reproduces an inverse-CDF Poisson draw
# from a DETERMINISTIC uniform — identical literals in both engines, so
# every replicate estimate is exact-decimal and bit-identical.
BOOT_B = 32
BOOT_POISSON_HEX = [
    "5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
    "ff1025f5", "ffd90f3b", "fffa8b71", "ffff540c",
]


@_register(
    "bootstrap_revenue_ci",
    f"""
    WITH exploded AS (
      SELECT b.b,
             CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
             SUBSTRING(md5('boot:' || CAST(b.b AS VARCHAR) || ':'
                           || CAST(l_orderkey AS VARCHAR) || ':'
                           || CAST(l_linenumber AS VARCHAR)), 1, 8) AS h8
      FROM lineitem CROSS JOIN (SELECT UNNEST(RANGE({BOOT_B})) AS b) b
    ), weighted AS (
      SELECT b, rev,
             {" + ".join(f"(CASE WHEN h8 >= '{h}' THEN 1 ELSE 0 END)" for h in BOOT_POISSON_HEX)}
               AS w
      FROM exploded
    ), ests AS (
      SELECT b, CAST(SUM(w * rev) AS DOUBLE) AS est,
             CAST(SUM(rev) AS DOUBLE) AS tot
      FROM weighted GROUP BY b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           ROUND(AVG(est), 2) AS boot_mean,
           ROUND(STDDEV_SAMP(est), 2) AS boot_se,
           ROUND(AVG(est) - 1.96 * STDDEV_SAMP(est), 2) AS ci_lo,
           ROUND(AVG(est) + 1.96 * STDDEV_SAMP(est), 2) AS ci_hi,
           ROUND(MAX(tot), 2) AS exact_total
    FROM ests
    """,
)
def bootstrap_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for total revenue — the
    one-pass resampling scheme distributed engines use (per-row
    Poisson(1) weights instead of with-replacement draws, so replicates
    need no shuffle of the data). Weights come from a deterministic
    md5-derived uniform pushed through the Poisson inverse CDF (shared
    hex thresholds), making every replicate estimate an exact decimal
    sum — the whole CI is reproducible anywhere. B x row expansion is
    the entire cost; each replicate partial-aggregates map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (one() - rate("l_discount"))
    exploded = li.select(
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        rev.alias("rev"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    ).select(
        "b",
        "rev",
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot:"),
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            8,
        ).alias("h8"),
    )
    w = sum(
        (F.col("h8") >= F.lit(h)).cast("int") for h in BOOT_POISSON_HEX
    )
    ests = (
        exploded.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("rev")).cast("double").alias("est"),
            F.sum("rev").cast("double").alias("tot"),
        )
    )
    mean, sd = F.avg("est"), F.stddev_samp("est")
    return ests.agg(
        F.count("*").cast("bigint").alias("n_replicates"),
        F.round(mean, 2).alias("boot_mean"),
        F.round(sd, 2).alias("boot_se"),
        F.round(mean - 1.96 * sd, 2).alias("ci_lo"),
        F.round(mean + 1.96 * sd, 2).alias("ci_hi"),
        F.round(F.max("tot"), 2).alias("exact_total"),
    )


# --------------------------------------------------------------------------
# Hypothesis-testing statistics: chi-square independence, Welch t-test,
# binned two-sample KS, pairwise correlation matrix (round 6, eighth wave)
# --------------------------------------------------------------------------
#
# The reference has no statistics tier at all (SURVEY.md §2.2 "Aggregations
# beyond county"); these make the classical test statistics a data-quality
# pipeline runs on 100 TB concrete as one-shuffle DataFrame plans: each
# query reduces the fact scan to a bounded relation (contingency cells,
# per-group moment sums, fixed histogram bins) in a single partial-agg
# shuffle, then finishes the statistic on that bounded relation. Exactness
# contract: all moment sums accumulate in DECIMAL (summation-order
# independent), and the final float arithmetic applies the identical
# operation sequence in Spark and DuckDB before a ROUND(_, 6).


@_register(
    "stats_chi2_independence",
    """
    WITH cells AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS obs
      FROM orders GROUP BY 1, 2
    ), ann AS (
      SELECT s, p, obs,
             SUM(obs) OVER () AS n,
             SUM(obs) OVER (PARTITION BY s) AS rt,
             SUM(obs) OVER (PARTITION BY p) AS ct
      FROM cells
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST((COUNT(DISTINCT s) * COUNT(DISTINCT p) = COUNT(*)) AS INT)
             AS is_complete,
           CAST(((SELECT COUNT(DISTINCT s) FROM cells) - 1)
                * ((SELECT COUNT(DISTINCT p) FROM cells) - 1) AS BIGINT)
             AS dof,
           ROUND(SUM(POW(obs - rt * ct / CAST(n AS DOUBLE), 2)
                     / (rt * ct / CAST(n AS DOUBLE))), 6) AS chi2,
           ROUND(SQRT(SUM(POW(obs - rt * ct / CAST(n AS DOUBLE), 2)
                          / (rt * ct / CAST(n AS DOUBLE)))
                      / (MAX(n)
                         * LEAST((SELECT COUNT(DISTINCT s) FROM cells) - 1,
                                 (SELECT COUNT(DISTINCT p) FROM cells) - 1))),
                 6) AS cramers_v
    FROM ann
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (order status x priority) with
    Cramer's V effect size — the categorical-association audit a
    curation pipeline runs before trusting a stratification column.

    Scale shape: ONE partial-agg shuffle reduces the fact table to the
    r x c contingency cells (<= 15 rows here); the expected counts,
    chi2 sum, and dof all live on that bounded relation (windows over a
    single task). is_complete flags whether every (row, col) pair was
    observed — expected-count formulas silently assume it."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(
            F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
        )
        .agg(F.count("*").alias("obs"))
    )
    ann = cells.select(
        "obs",
        F.sum("obs").over(W.partitionBy()).alias("n"),
        F.sum("obs").over(W.partitionBy("s")).alias("rt"),
        F.sum("obs").over(W.partitionBy("p")).alias("ct"),
        F.col("s"),
        F.col("p"),
    )
    e = F.col("rt") * F.col("ct") / F.col("n").cast("double")
    chi2 = F.sum(F.pow(F.col("obs") - e, F.lit(2.0)) / e)
    n_s = F.countDistinct("s")
    n_p = F.countDistinct("p")
    return ann.agg(
        F.max("n").cast("bigint").alias("n"),
        (F.countDistinct("s") * F.countDistinct("p") == F.count("*"))
        .cast("int")
        .alias("is_complete"),
        ((n_s - 1) * (n_p - 1)).cast("bigint").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (F.max("n") * F.least(n_s - 1, n_p - 1))), 6
        ).alias("cramers_v"),
    )


@_register(
    "stats_welch_ttest",
    """
    WITH moments AS (
      SELECT l_returnflag AS flag,
             COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY l_returnflag
    ), stats AS (
      SELECT flag, n,
             CAST(sx AS DOUBLE) / n AS mean,
             (CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)
               AS var,
             (CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1) / n
               AS se2
      FROM moments
    )
    SELECT CAST(a.n AS BIGINT) AS n_a,
           CAST(r.n AS BIGINT) AS n_r,
           ROUND(a.mean, 6) AS mean_a,
           ROUND(r.mean, 6) AS mean_r,
           ROUND((a.mean - r.mean) / SQRT(a.se2 + r.se2), 6) AS t_stat,
           ROUND(POW(a.se2 + r.se2, 2)
                 / (POW(a.se2, 2) / (a.n - 1) + POW(r.se2, 2) / (r.n - 1)),
                 4) AS welch_dof
    FROM (SELECT * FROM stats WHERE flag = 'A') a,
         (SELECT * FROM stats WHERE flag = 'R') r
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the A and R return-flag
    price populations: t statistic and Welch-Satterthwaite degrees of
    freedom, from exact decimal moment sums.

    Scale shape: one filtered partial-agg shuffle produces two moment
    rows (n, sum x, sum x^2 — DECIMAL, so summation-order independent);
    the statistic is a scalar expression over those two rows. The same
    two-pass-free moment formula var = (sxx - sx^2/n)/(n-1) runs
    identically in DuckDB, so values match bit-for-bit before ROUND."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    x = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    sx, sxx, n = (
        F.col("sx").cast("double"),
        F.col("sxx").cast("double"),
        F.col("n"),
    )
    var = (sxx - sx * sx / n) / (n - 1)
    stats = m.select(
        "flag",
        "n",
        (sx / n).alias("mean"),
        var.alias("var"),
        (var / n).alias("se2"),
    )
    a = stats.filter(F.col("flag") == "A").alias("a")
    r = stats.filter(F.col("flag") == "R").alias("r")
    se2 = F.col("a.se2") + F.col("r.se2")
    return a.crossJoin(F.broadcast(r)).select(
        F.col("a.n").cast("bigint").alias("n_a"),
        F.col("r.n").cast("bigint").alias("n_r"),
        F.round(F.col("a.mean"), 6).alias("mean_a"),
        F.round(F.col("r.mean"), 6).alias("mean_r"),
        F.round((F.col("a.mean") - F.col("r.mean")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2, F.lit(2.0))
            / (
                F.pow(F.col("a.se2"), F.lit(2.0)) / (F.col("a.n") - 1)
                + F.pow(F.col("r.se2"), F.lit(2.0)) / (F.col("r.n") - 1)
            ),
            4,
        ).alias("welch_dof"),
    )


@_register(
    "stats_ks_two_sample",
    """
    WITH s AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS x,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), mm AS (
      SELECT MIN(x) AS lo, MAX(x) AS hi FROM s
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / 512.0)) AS BIGINT),
                   511) AS bin,
             g1
      FROM s, mm
    ), cnt AS (
      SELECT bin, SUM(g1) AS c1, SUM(1 - g1) AS c2
      FROM binned GROUP BY bin
    ), cum AS (
      SELECT SUM(c1) OVER (ORDER BY bin) AS a1,
             SUM(c2) OVER (ORDER BY bin) AS a2,
             SUM(c1) OVER () AS n1,
             SUM(c2) OVER () AS n2
      FROM cnt
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(512 AS BIGINT) AS n_bins,
           ROUND(MAX(ABS(CAST(a1 AS DOUBLE) / n1
                         - CAST(a2 AS DOUBLE) / n2)), 6) AS d_stat,
           ROUND(MAX(ABS(CAST(a1 AS DOUBLE) / n1
                         - CAST(a2 AS DOUBLE) / n2))
                 * SQRT(CAST(MAX(n1) AS DOUBLE) * MAX(n2)
                        / (MAX(n1) + MAX(n2))), 6) AS ks_scaled
    FROM cum
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the URGENT and LOW
    priority order-value distributions, computed on a fixed 512-bin
    equi-width grid — the distribution-drift check a training pipeline
    runs between corpus snapshots.

    Scale shape: the distributed work is ONE partial-agg shuffle from
    the fact scan down to <= 512 (bin, c1, c2) rows; the CDF prefix sum
    and max-gap run on that bounded relation (the single-task window is
    over 512 rows by construction, never over the data). Binning makes
    the statistic deterministic AND scalable — an exact KS needs a
    global sort of both samples; on the grid, both engines apply
    identical double arithmetic, so values match before ROUND."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    s = o.select(
        F.col("o_totalprice").cast("double").alias("x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("g1"),
    )
    mm = s.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(512.0)
    binned = s.join(F.broadcast(mm)).select(
        F.least(
            F.floor((F.col("x") - F.col("lo")) / width).cast("bigint"),
            F.lit(511).cast("bigint"),
        ).alias("bin"),
        "g1",
    )
    cnt = binned.groupBy("bin").agg(
        F.sum("g1").alias("c1"), F.sum(1 - F.col("g1")).alias("c2")
    )
    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = cnt.select(
        F.sum("c1").over(wcum).alias("a1"),
        F.sum("c2").over(wcum).alias("a2"),
        F.sum("c1").over(W.partitionBy()).alias("n1"),
        F.sum("c2").over(W.partitionBy()).alias("n2"),
    )
    gap = F.abs(
        F.col("a1").cast("double") / F.col("n1")
        - F.col("a2").cast("double") / F.col("n2")
    )
    return cum.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.lit(512).cast("bigint").alias("n_bins"),
        F.round(F.max(gap), 6).alias("d_stat"),
        F.round(
            F.max(gap)
            * F.sqrt(
                F.max("n1").cast("double")
                * F.max("n2")
                / (F.max("n1") + F.max("n2"))
            ),
            6,
        ).alias("ks_scaled"),
    )


@_register(
    "stats_corr_matrix_lineitem",
    """
    WITH m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity      AS DECIMAL(19,4))) AS s_q,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS s_p,
             SUM(CAST(l_discount      AS DECIMAL(19,4))) AS s_d,
             SUM(CAST(l_quantity      AS DECIMAL(19,4))
               * CAST(l_quantity      AS DECIMAL(19,4))) AS s_qq,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4))
               * CAST(l_extendedprice AS DECIMAL(19,4))) AS s_pp,
             SUM(CAST(l_discount      AS DECIMAL(19,4))
               * CAST(l_discount      AS DECIMAL(19,4))) AS s_dd,
             SUM(CAST(l_quantity      AS DECIMAL(19,4))
               * CAST(l_extendedprice AS DECIMAL(19,4))) AS s_qp,
             SUM(CAST(l_quantity      AS DECIMAL(19,4))
               * CAST(l_discount      AS DECIMAL(19,4))) AS s_qd,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4))
               * CAST(l_discount      AS DECIMAL(19,4))) AS s_pd
      FROM lineitem
    ), c AS (
      SELECT n,
             (n * CAST(s_qp AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_p AS DOUBLE))
             / SQRT((n * CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                  * (n * CAST(s_pp AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE)))
               AS corr_qp,
             (n * CAST(s_qd AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_d AS DOUBLE))
             / SQRT((n * CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                  * (n * CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)))
               AS corr_qd,
             (n * CAST(s_pd AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_d AS DOUBLE))
             / SQRT((n * CAST(s_pp AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))
                  * (n * CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)))
               AS corr_pd
      FROM m
    )
    SELECT var_x, var_y, CAST(n AS BIGINT) AS n, ROUND(corr, 6) AS corr
    FROM (
      SELECT n, 'quantity' AS var_x, 'extendedprice' AS var_y,
             corr_qp AS corr FROM c
      UNION ALL
      SELECT n, 'quantity', 'discount', corr_qd FROM c
      UNION ALL
      SELECT n, 'extendedprice', 'discount', corr_pd FROM c
    )
    ORDER BY var_x, var_y
    """,
)
def stats_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (long form) over the lineitem
    numeric columns (quantity, extendedprice, discount) — the feature-
    redundancy screen run before fitting anything on tabular columns.

    Scale shape: ONE aggregation computes every first and second moment
    (9 decimal sums) in a single pass over the fact scan — no per-pair
    re-scan, no shuffle beyond the scalar partial-agg tree. The
    correlations derive from those exact decimal sums on a 1-row
    relation, unpivoted to long form with stack(). All moment sums are
    DECIMAL (order-independent); the double arithmetic applies the
    identical operation sequence in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,4)")
    p = F.col("l_extendedprice").cast("decimal(12,4)")
    d = F.col("l_discount").cast("decimal(12,4)")
    m = li.agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s_q"),
        F.sum(p).alias("s_p"),
        F.sum(d).alias("s_d"),
        F.sum(q * q).alias("s_qq"),
        F.sum(p * p).alias("s_pp"),
        F.sum(d * d).alias("s_dd"),
        F.sum(q * p).alias("s_qp"),
        F.sum(q * d).alias("s_qd"),
        F.sum(p * d).alias("s_pd"),
    )

    def corr(sxy: str, sx: str, sy: str, sxx: str, syy: str) -> Column:
        n = F.col("n")
        xy, x, y = (F.col(c).cast("double") for c in (sxy, sx, sy))
        xx, yy = F.col(sxx).cast("double"), F.col(syy).cast("double")
        return (n * xy - x * y) / F.sqrt(
            (n * xx - x * x) * (n * yy - y * y)
        )

    c = m.select(
        "n",
        corr("s_qp", "s_q", "s_p", "s_qq", "s_pp").alias("corr_qp"),
        corr("s_qd", "s_q", "s_d", "s_qq", "s_dd").alias("corr_qd"),
        corr("s_pd", "s_p", "s_d", "s_pp", "s_dd").alias("corr_pd"),
    )
    return c.select(
        F.expr(
            "stack(3, "
            "'quantity', 'extendedprice', corr_qp, "
            "'quantity', 'discount', corr_qd, "
            "'extendedprice', 'discount', corr_pd) AS (var_x, var_y, corr0)"
        ),
        F.col("n").cast("bigint").alias("n"),
    ).select(
        "var_x", "var_y", "n", F.round("corr0", 6).alias("corr")
    ).orderBy("var_x", "var_y")


@_register(
    "stats_spearman_qty_price",
    """
    WITH xr AS (
      SELECT l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), xcum AS (
      SELECT v,
             2 * CAST(COALESCE(SUM(c) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) + c + 1 AS r2
      FROM xr
    ), yr AS (
      SELECT l_extendedprice AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), ycum AS (
      SELECT v,
             2 * CAST(COALESCE(SUM(c) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) + c + 1 AS r2
      FROM yr
    ), ranked AS (
      SELECT x.r2 AS rx, y.r2 AS ry
      FROM lineitem l
      JOIN xcum x ON l.l_quantity = x.v
      JOIN ycum y ON l.l_extendedprice = y.v
    ), m AS (
      SELECT CAST(COUNT(*) AS DOUBLE)       AS n,
             CAST(SUM(rx) AS DOUBLE)        AS sx,
             CAST(SUM(ry) AS DOUBLE)        AS sy,
             CAST(SUM(rx * rx) AS DOUBLE)   AS sxx,
             CAST(SUM(ry * ry) AS DOUBLE)   AS syy,
             CAST(SUM(rx * ry) AS DOUBLE)   AS sxy,
             CAST(COUNT(*) AS BIGINT)       AS n_rows
      FROM ranked
    )
    SELECT n_rows,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 6) AS rho_spearman
    FROM m
    """,
)
def stats_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price — the
    tie-robust monotone-association statistic (Pearson on average
    ranks). The naive form ranks every row globally twice; here each
    variable collapses to its DISTINCT-value counts (map-side
    combinable), the distributed prefix-scan kernel turns those into
    doubled average ranks (2r = 2·below + cnt + 1, exact integers —
    the doubling cancels in the correlation), and the rank relations
    join back value-domain-sized. Moments accumulate as DECIMAL(38,0)
    (exact, order-independent), so both engines compute the identical
    doubles before ROUND(_, 6).

    Kernel citation: llmops.pipeline.global_prefix_sum — same
    two-phase shape as the AUC query; no SinglePartition window."""
    from .llmops.pipeline import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")

    def rank_rel(col: str) -> DataFrame:
        cnts = li.groupBy(F.col(col).alias("v")).agg(
            F.count("*").cast("bigint").alias("c")
        )
        cum = global_prefix_sum(cnts, ["v"], "c", out_col="below",
                                inclusive=False)
        return cum.select(
            "v", (2 * F.col("below") + F.col("c") + 1).alias("r2")
        )

    ranked = (
        li.select(F.col("l_quantity").alias("xv"),
                  F.col("l_extendedprice").alias("yv"))
        .join(rank_rel("l_quantity").withColumnRenamed("r2", "rx"),
              F.col("xv") == F.col("v"))
        .drop("v")
        .join(rank_rel("l_extendedprice").withColumnRenamed("r2", "ry"),
              F.col("yv") == F.col("v"))
        .drop("v")
    )
    d38 = "decimal(38,0)"
    # cast BEFORE multiplying: long*long would overflow at extreme row
    # counts; decimal*decimal stays exact to 38 digits
    rxd, ryd = F.col("rx").cast(d38), F.col("ry").cast(d38)
    m = ranked.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("*").cast("double").alias("n"),
        F.sum(rxd).cast("double").alias("sx"),
        F.sum(ryd).cast("double").alias("sy"),
        F.sum(rxd * rxd).cast("double").alias("sxx"),
        F.sum(ryd * ryd).cast("double").alias("syy"),
        F.sum(rxd * ryd).cast("double").alias("sxy"),
    )
    return m.select(
        "n_rows",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("rho_spearman"),
    )


@_register(
    "retention_dau_wau_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ), days AS (
      SELECT DISTINCT day FROM ud
    ), cover AS (
      SELECT DISTINCT ud.user_id, ud.day + CAST(i.i AS INTEGER) AS td
      FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i
    ), wau AS (
      SELECT c.td AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
      FROM cover c JOIN days d ON c.td = d.day
      GROUP BY c.td
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    )
    SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    ORDER BY dau.day
    """,
)
def retention_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the growth
    metric every product dashboard leads with. The trailing distinct
    needs no per-day re-deduplication: each (user, active day) row
    covers the 7 target days it contributes to, so WAU(d) is a
    distinct count over the exploded coverage relation (bounded at
    7x the DEDUPLICATED user-day relation, far smaller than events),
    restricted to observed days.

    Exactness: dates and counts are integers; one division per day."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("td"),
        )
        .distinct()
        .join(days.withColumnRenamed("day", "td"), "td", "left_semi")
    )
    wau = cover.groupBy(F.col("td").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            # timestamp (midnight) so both engines surface datetime64
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@_register(
    "abc_pareto_parts",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(
               CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               * 10000 AS BIGINT)) AS BIGINT) AS r
      FROM lineitem GROUP BY l_partkey
    ), cum AS (
      SELECT l_partkey, r,
             CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS c,
             CAST(SUM(r) OVER () AS BIGINT) AS t
      FROM rev
    ), classed AS (
      SELECT CASE WHEN c * 5 <= t * 4 THEN 'A'
                  WHEN c * 20 <= t * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             r
      FROM cum
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(r) AS DOUBLE) / 10000, 2) AS class_revenue,
           ROUND(CAST(SUM(r) AS DOUBLE)
                 / CAST((SELECT SUM(r) FROM rev) AS DOUBLE), 6)
             AS revenue_share
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
)
def abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: A = parts whose
    inclusive cumulative share stays within 80% of total revenue,
    B within 95%, C the tail — the inventory-analytics workhorse
    ('which 20% of SKUs earn 80%?').

    Exactness: per-row revenue is exact DECIMAL scaled to integer
    ten-thousandths, so the cumulative is integer and class boundaries
    are integer cross-multiplications (c*5 <= t*4), never float
    shares. Scale: revenue collapses per part map-side; the cumulative
    runs through the distributed prefix-scan kernel over the
    part-cardinality relation sorted by revenue (tie-broken by key) —
    no SinglePartition window."""
    from .llmops.pipeline import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev_int = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        * 10000
    ).cast("bigint")
    rev = li.groupBy("l_partkey").agg(
        F.sum(rev_int).cast("bigint").alias("r")
    )
    cum = global_prefix_sum(
        rev.withColumn("_nr", -F.col("r")),
        ["_nr", "l_partkey"],
        "r",
        out_col="c",
        inclusive=True,
    ).drop("_nr")
    tot = rev.agg(F.sum("r").cast("bigint").alias("t"))
    cls = (
        F.when(F.col("c") * 5 <= F.col("t") * 4, "A")
        .when(F.col("c") * 20 <= F.col("t") * 19, "B")
        .otherwise("C")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(cls.alias("abc_class"), "r", "t")
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("r").cast("double") / 10000, 2).alias(
                "class_revenue"
            ),
            F.round(
                F.sum("r").cast("double") / F.first("t").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@_register(
    "control_chart_xmr_user_value",
    """
    WITH seq AS (
      SELECT user_id, value,
             LAG(value) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev
      FROM events
    ), lim AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DOUBLE)
               / COUNT(*) AS mean0,
             CAST(SUM(ABS(CAST(value AS DECIMAL(8,2))
                          - CAST(prev AS DECIMAL(8,2)))) AS DOUBLE)
               / NULLIF(COUNT(prev), 0) AS mrbar0
      FROM seq GROUP BY user_id
    )
    SELECT e.user_id, l.n_events,
           ROUND(l.mean0, 6)  AS mean_value,
           ROUND(l.mrbar0, 6) AS mr_bar,
           ROUND(l.mean0 + 2.66 * l.mrbar0, 6) AS ucl,
           ROUND(l.mean0 - 2.66 * l.mrbar0, 6) AS lcl,
           CAST(SUM(CASE WHEN e.value > l.mean0 + 2.66 * l.mrbar0
                           OR e.value < l.mean0 - 2.66 * l.mrbar0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM events e JOIN lim l USING (user_id)
    GROUP BY e.user_id, l.n_events, l.mean0, l.mrbar0
    ORDER BY user_id
    """,
)
def control_chart_xmr_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals / moving-range) control chart per user — the
    SPC process-stability monitor: center line = mean value, control
    limits = mean ± 2.66 · mean(|x_t − x_{t−1}|), plus the count of
    points outside the limits. The 2.66 constant is the standard
    XmR d2-derived factor for n=2 subgroups.

    Exactness: values and consecutive diffs accumulate as DECIMAL
    (order-independent); limits are one double expression both engines
    share; violations compare the raw doubles against unrounded
    limits. Scale: one user-keyed window for the lag, one grouped
    reduce, and a co-partitioned join-back of the user-cardinality
    limits relation — nothing global anywhere."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    dec = lambda c: F.col(c).cast("decimal(8,2)")  # noqa: E731
    seq = e.select(
        "user_id", "value", F.lag("value").over(w).alias("prev")
    )
    lim = seq.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.sum(dec("value")).cast("double") / F.count("*")).alias("mean0"),
        (
            F.sum(F.abs(dec("value") - dec("prev"))).cast("double")
            / F.nullif(F.count("prev"), F.lit(0))
        ).alias("mrbar0"),
    )
    ucl = F.col("mean0") + 2.66 * F.col("mrbar0")
    lcl = F.col("mean0") - 2.66 * F.col("mrbar0")
    return (
        e.select("user_id", "value")
        .join(lim, "user_id")
        .groupBy("user_id", "n_events", "mean0", "mrbar0")
        .agg(
            F.sum(
                F.when(
                    (F.col("value") > ucl) | (F.col("value") < lcl), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_violations")
        )
        .select(
            "user_id",
            "n_events",
            F.round("mean0", 6).alias("mean_value"),
            F.round("mrbar0", 6).alias("mr_bar"),
            F.round(ucl, 6).alias("ucl"),
            F.round(lcl, 6).alias("lcl"),
            "n_violations",
        )
        .orderBy("user_id")
    )


ALLOC_BUDGET = 100


@_register(
    "allocation_hamilton_quota",
    f"""
    WITH rev AS (
      SELECT n.n_name,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ), tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev
    ), quota AS (
      SELECT n_name, cents,
             ({ALLOC_BUDGET} * cents) // t AS base_units,
             ({ALLOC_BUDGET} * cents) % t AS remainder,
             t
      FROM rev, tot
    ), ranked AS (
      SELECT n_name, cents, base_units, remainder,
             ROW_NUMBER() OVER (ORDER BY remainder DESC, n_name)
               AS rem_rank,
             CAST({ALLOC_BUDGET} - SUM(base_units) OVER () AS BIGINT)
               AS leftover
      FROM quota
    )
    SELECT n_name,
           CAST(base_units
                + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
             AS BIGINT) AS alloc_units,
           CAST(base_units AS BIGINT) AS base_units,
           CAST(remainder AS BIGINT) AS remainder
    FROM ranked
    ORDER BY n_name
    """,
)
def allocation_hamilton_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional quota allocation by Hamilton's largest-remainder
    method: split a fixed budget of ALLOC_BUDGET units across nations
    in proportion to order revenue — the exact apportionment every
    quota-sampling pipeline needs (per-stratum sample budgets that sum
    EXACTLY to the total, no rounding drift). Each nation gets
    floor(B*share); the leftover units go to the largest remainders
    (name tiebreak).

    Exactness: revenue becomes integer cents, quotas use integer
    div/mod against the integer grand total — no floating point
    anywhere, so both engines agree bit-for-bit. Scale: revenue
    aggregates map-side; the apportionment itself runs on the
    GROUP-CARDINALITY relation (here 25 rows), where a global window
    is bounded, not a hazard."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("t"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "cents",
        F.expr(f"({ALLOC_BUDGET} * cents) DIV t").alias("base_units"),
        F.expr(f"({ALLOC_BUDGET} * cents) % t").alias("remainder"),
    )
    from pyspark.sql import Window as W

    # group-cardinality relation: bounded global windows
    rk = W.orderBy(F.desc("remainder"), "n_name")
    return (
        quota.withColumn("rem_rank", F.row_number().over(rk))
        .withColumn(
            "leftover",
            (F.lit(ALLOC_BUDGET) - F.sum("base_units").over(
                W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            )).cast("bigint"),
        )
        .select(
            "n_name",
            (
                F.col("base_units")
                + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_units"),
            F.col("base_units").cast("bigint").alias("base_units"),
            F.col("remainder").cast("bigint").alias("remainder"),
        )
        .orderBy("n_name")
    )


@_register(
    "hhi_supplier_concentration",
    """
    WITH s AS (
      SELECT n.n_name,
             CAST(s_acctbal AS DECIMAL(19,4)) AS bal
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE s_acctbal > 0
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(CAST(SUM(bal * bal) AS DOUBLE)
                 / (CAST(SUM(bal) AS DOUBLE) * CAST(SUM(bal) AS DOUBLE)),
                 6) AS hhi,
           ROUND(1.0 / COUNT(*), 6) AS hhi_floor
    FROM s
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier account balances
    per nation — the market-concentration audit (HHI = sum of squared
    shares; equals Σbal²/(Σbal)², so shares never materialize). The
    1/n floor column contextualizes it (HHI == floor means perfectly
    even). Negative balances are excluded (shares must be
    nonnegative).

    Scale: one broadcast dim join + one map-side-combinable groupBy;
    balances square as DECIMAL so the sums are exact and
    order-independent, with one double division per nation."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    bal = F.col("s_acctbal").cast("decimal(19,4)")
    joined = (
        s.filter(F.col("s_acctbal") > 0)
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("n_name", bal.alias("bal"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.round(
                F.sum(F.col("bal") * F.col("bal")).cast("double")
                / (
                    F.sum("bal").cast("double")
                    * F.sum("bal").cast("double")
                ),
                6,
            ).alias("hhi"),
            F.round(F.lit(1.0) / F.count("*"), 6).alias("hhi_floor"),
        )
        .orderBy("n_name")
    )


@_register(
    "orders_skyline_price_date",
    """
    WITH per_price AS (
      SELECT o_totalprice AS p, MAX(o_orderdate) AS md
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT p,
             MAX(md) OVER (ORDER BY p DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pm
      FROM per_price
    )
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN cum c ON o.o_totalprice = c.p
    WHERE c.pm IS NULL OR o.o_orderdate > c.pm
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    """,
)
def orders_skyline_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front) of orders on (totalprice, orderdate):
    keep every order not dominated by another with >= price AND >=
    date (strict in at least one) — the multi-criteria shortlist
    operator (best price-recency tradeoffs).

    Distributed 2-D skyline: collapse to one (price, max date) row per
    DISTINCT price (map-side combinable), take the EXCLUSIVE prefix
    max of date over price descending through the prefix-max kernel
    (llmops.pipeline.global_prefix_max — no SinglePartition window),
    and join back: a row survives iff its date strictly exceeds the
    best date among all strictly-higher prices (NULL prefix = highest
    price band, always on the front). Dates ride the kernel as integer
    epoch days."""
    from .llmops.pipeline import global_prefix_max

    o = load_table(spark, sf_dir, "orders")
    per_price = o.groupBy(F.col("o_totalprice").alias("p")).agg(
        F.datediff(F.max("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("md")
    )
    # descending price order via the negated sort key
    cum = global_prefix_max(
        per_price.withColumn("_np", -F.col("p")),
        ["_np"],
        "md",
        out_col="pm",
        inclusive=False,
    ).drop("_np")
    return (
        o.join(cum, o["o_totalprice"] == cum["p"])
        .filter(
            F.col("pm").isNull()
            | (
                F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast(
                    "bigint"
                )
                > F.col("pm")
            )
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


@_register(
    "overlap_sessions_per_hour",
    """
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ), bounds AS (
      SELECT user_id, session_id,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, session_id
    ), spans AS (
      SELECT user_id,
             UNNEST(generate_series(date_trunc('hour', s_start),
                                    date_trunc('hour', s_end),
                                    INTERVAL 1 HOUR)) AS hour
      FROM bounds
    )
    SELECT hour,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM spans GROUP BY hour ORDER BY hour
    """,
)
def overlap_sessions_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join of user sessions against the hourly time
    grid: every session (30-min-gap definition, identical to
    sessionize_events) counts in EVERY hour bucket its [start, end]
    interval overlaps — even hours with no event inside them. This is
    the concurrency profile ("how many sessions were live at hour H")
    that a naive per-event rollup gets wrong.

    Scale shape: interval-to-grid overlap as one narrow explode —
    sequence(hour(start), hour(end)) per session, bounded by session
    duration, never a range-predicate join. The grid side never
    materializes; there is exactly one shuffle beyond sessionization
    (the per-hour re-aggregation). At 100 TB this is the bucketized
    interval-join pattern: equality on hour replaces the
    non-equi overlap predicate Catalyst would turn into a
    broadcast-nested-loop."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    bounds = (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    spans = bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s_start")),
                F.date_trunc("hour", F.col("s_end")),
                F.expr("interval 1 hour"),
            )
        ).alias("hour"),
    )
    return (
        spans.groupBy("hour")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("hour")
    )


# --------------------------------------------------------------------------
# Time-series: trailing EWMA with exact rational weights; autocorrelation
# of the hourly activity series (round 6, tenth wave)
# --------------------------------------------------------------------------

# EWMA weights for alpha=0.2 over a 20-row trailing window, as EXACT
# integers: weight(lag d) = (4/5)^d scaled by 5^19 -> 4^d * 5^(19-d).
# Integer weights make the weighted sum a DECIMAL accumulation
# (summation-order independent), so Spark and DuckDB agree bit-for-bit
# before the final double division — the same exactness trick as the
# money columns, applied to exponential decay.
EWMA_WINDOW = 20
EWMA_WEIGHTS = [19073486328125, 15258789062500, 12207031250000, 9765625000000, 7812500000000, 6250000000000, 5000000000000, 4000000000000, 3200000000000, 2560000000000, 2048000000000, 1638400000000, 1310720000000, 1048576000000, 838860800000, 671088640000, 536870912000, 429496729600, 343597383680, 274877906944]


@_register(
    "ewma_trailing_user_value",
    """
    WITH weights(d, wt) AS (
      VALUES (0, 19073486328125),
             (1, 15258789062500),
             (2, 12207031250000),
             (3, 9765625000000),
             (4, 7812500000000),
             (5, 6250000000000),
             (6, 5000000000000),
             (7, 4000000000000),
             (8, 3200000000000),
             (9, 2560000000000),
             (10, 2048000000000),
             (11, 1638400000000),
             (12, 1310720000000),
             (13, 1048576000000),
             (14, 838860800000),
             (15, 671088640000),
             (16, 536870912000),
             (17, 429496729600),
             (18, 343597383680),
             (19, 274877906944)
    ), r AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id,
           ROUND(CAST(SUM(CAST(b.value AS DECIMAL(9,2)) * w.wt) AS DOUBLE)
                 / CAST(SUM(w.wt) AS DOUBLE), 6) AS ewma_20
    FROM r a
    JOIN r b ON a.user_id = b.user_id
            AND b.rn BETWEEN a.rn - 19 AND a.rn
    JOIN weights w ON w.d = a.rn - b.rn
    GROUP BY a.user_id, a.event_id
    """,
)
def ewma_trailing_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.2, normalized,
    20-row trailing window) of each user's event values — the smoothed
    activity signal feature stores compute per entity.

    Scale shape: ONE shuffle (partition by user), then collect_list
    over the bounded trailing frame and two JVM-side higher-order
    functions (zip_with + aggregate) per row — no self-join, no Python.
    The oracle expresses the identical weighted sum as a bounded
    rn-band self-join against a 20-row weights relation; both sides
    accumulate in DECIMAL with the same exact integer weights, so the
    division operands match exactly."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), W.currentRow)
    )
    arr = F.collect_list(F.col("value").cast("decimal(9,2)")).over(w)
    wts = F.array(*[F.lit(v) for v in EWMA_WEIGHTS])
    num = F.aggregate(
        F.zip_with(
            F.col("arr"),
            F.sequence(F.size("arr") - 1, F.lit(0), F.lit(-1)),
            lambda x, d: x * F.element_at(wts, d + 1),
        ),
        F.lit(0).cast("decimal(38,2)"),
        lambda acc, v: acc + v,
    )
    den = F.aggregate(
        F.sequence(F.lit(0), F.size("arr") - 1),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + F.element_at(wts, d + 1),
    )
    return (
        e.select("user_id", "event_id", arr.alias("arr"))
        .select(
            "user_id",
            "event_id",
            F.round(
                num.cast("double") / den.cast("double"), 6
            ).alias("ewma_20"),
        )
    )


@_register(
    "acf_hourly_event_counts",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             COUNT(*) AS c
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT c,
             LAG(c, 1) OVER (ORDER BY hour) AS l1,
             LAG(c, 2) OVER (ORDER BY hour) AS l2,
             LAG(c, 3) OVER (ORDER BY hour) AS l3,
             LAG(c, 4) OVER (ORDER BY hour) AS l4,
             LAG(c, 5) OVER (ORDER BY hour) AS l5,
             LAG(c, 6) OVER (ORDER BY hour) AS l6
      FROM hourly
    ), pairs AS (
      SELECT 1 AS lag, c AS x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
      UNION ALL SELECT 2, c, l2 FROM lagged WHERE l2 IS NOT NULL
      UNION ALL SELECT 3, c, l3 FROM lagged WHERE l3 IS NOT NULL
      UNION ALL SELECT 4, c, l4 FROM lagged WHERE l4 IS NOT NULL
      UNION ALL SELECT 5, c, l5 FROM lagged WHERE l5 IS NOT NULL
      UNION ALL SELECT 6, c, l6 FROM lagged WHERE l6 IS NOT NULL
    )
    SELECT CAST(lag AS INT) AS lag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND((COUNT(*) * CAST(SUM(x * y) AS DOUBLE)
                  - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                 / SQRT((COUNT(*) * CAST(SUM(x * x) AS DOUBLE)
                         - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                      * (COUNT(*) * CAST(SUM(y * y) AS DOUBLE)
                         - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))),
                 6) AS acf
    FROM pairs GROUP BY lag ORDER BY lag
    """,
)
def acf_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series at lags
    1..6 — the seasonality probe run before choosing rollup windows or
    forecast features.

    Scale shape: the fact scan reduces to the hourly count series in
    one partial-agg shuffle; the series (bounded by the time span, not
    the data) then takes 6 window lags in a single pass and aggregates
    exact integer moment sums per lag. The single-partition window is
    over the bounded series only. Counts are integers, so every moment
    sum is exact; the correlation arithmetic is the same double
    operation sequence in both engines."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("c"))
    )
    wo = W.orderBy("hour")
    lagged = hourly.select(
        "c", *[F.lag("c", d).over(wo).alias(f"l{d}") for d in range(1, 7)]
    )
    pairs = None
    for d in range(1, 7):
        p = (
            lagged.filter(F.col(f"l{d}").isNotNull())
            .select(
                F.lit(d).alias("lag"),
                F.col("c").alias("x"),
                F.col(f"l{d}").alias("y"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    n = F.count("*")
    sx, sy = F.sum("x").cast("double"), F.sum("y").cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    syy = F.sum(F.col("y") * F.col("y")).cast("double")
    sxy = F.sum(F.col("x") * F.col("y")).cast("double")
    return (
        pairs.groupBy("lag")
        .agg(
            n.cast("bigint").alias("n"),
            F.round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("acf"),
        )
        .select(F.col("lag").cast("int").alias("lag"), "n", "acf")
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# Distribution drift: PSI between cohorts, Jensen-Shannon divergence
# (round 6, twelfth wave)
# --------------------------------------------------------------------------


@_register(
    "psi_totalprice_drift",
    """
    WITH ref AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
      WHERE EXTRACT(YEAR FROM CAST(o_orderdate AS TIMESTAMP)) = 1995
    ), cur AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
      WHERE EXTRACT(YEAR FROM CAST(o_orderdate AS TIMESTAMP)) = 2000
    ), mm AS (
      SELECT MIN(x) AS lo, MAX(x) AS hi FROM ref
    ), rb AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((x - lo) / ((hi - lo) / 10.0))
                                 AS BIGINT), 0), 9) AS bin
      FROM ref, mm
    ), cb AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((x - lo) / ((hi - lo) / 10.0))
                                 AS BIGINT), 0), 9) AS bin
      FROM cur, mm
    ), grid AS (
      SELECT UNNEST(generate_series(0, 9)) AS bin
    ), cnt AS (
      SELECT g.bin,
             COALESCE(r.c, 0) AS n_ref,
             COALESCE(c.c, 0) AS n_cur
      FROM grid g
      LEFT JOIN (SELECT bin, COUNT(*) AS c FROM rb GROUP BY bin) r
        ON g.bin = r.bin
      LEFT JOIN (SELECT bin, COUNT(*) AS c FROM cb GROUP BY bin) c
        ON g.bin = c.bin
    ), probs AS (
      SELECT bin, n_ref, n_cur,
             (n_ref + 1.0) / (SUM(n_ref) OVER () + 10.0) AS p,
             (n_cur + 1.0) / (SUM(n_cur) OVER () + 10.0) AS q
      FROM cnt
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND(p, 6) AS p_ref,
           ROUND(q, 6) AS p_cur,
           ROUND((q - p) * LN(q / p), 6) AS psi_term,
           ROUND(SUM((q - p) * LN(q / p)) OVER (), 6) AS psi_total
    FROM probs ORDER BY bin
    """,
)
def psi_totalprice_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of order value between the 1995
    (reference) and 2000 (current) cohorts on a 10-bin equal-width grid
    anchored to the REFERENCE min/max — the standard drift gate model
    monitors run between training and serving populations. Laplace
    smoothing ((c+1)/(n+10)) keeps empty bins defined identically in
    both engines.

    Scale shape: two filtered partial-agg shuffles reduce the fact scan
    to <= 10 bin-count rows each; the 10-row literal grid left-joins
    the counts so empty bins surface; every window below that point
    runs on a 10-row relation. Deterministic: binning and smoothing use
    the identical double arithmetic in both engines, PSI terms round
    at 6."""
    o = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    x = F.col("o_totalprice").cast("double")
    ref = o.filter(year == 1995).select(x.alias("x"))
    cur = o.filter(year == 2000).select(x.alias("x"))
    mm = ref.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(10.0)
    binc = F.least(
        F.greatest(
            F.floor((F.col("x") - F.col("lo")) / width).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
        F.lit(9).cast("bigint"),
    ).alias("bin")
    rb = ref.join(F.broadcast(mm)).select(binc).groupBy("bin").agg(
        F.count("*").alias("rc")
    )
    cb = cur.join(F.broadcast(mm)).select(binc).groupBy("bin").agg(
        F.count("*").alias("cc")
    )
    grid = spark.range(10).select(F.col("id").cast("bigint").alias("bin"))
    cnt = (
        grid.join(rb, "bin", "left")
        .join(cb, "bin", "left")
        .select(
            "bin",
            F.coalesce("rc", F.lit(0)).alias("n_ref"),
            F.coalesce("cc", F.lit(0)).alias("n_cur"),
        )
    )
    wall = W.partitionBy()
    p = (F.col("n_ref") + 1.0) / (F.sum("n_ref").over(wall) + 10.0)
    q = (F.col("n_cur") + 1.0) / (F.sum("n_cur").over(wall) + 10.0)
    probs = cnt.select("bin", "n_ref", "n_cur", p.alias("p"), q.alias("q"))
    term = (F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))
    return probs.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("p_cur"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(wall), 6).alias("psi_total"),
    ).orderBy("bin")


@_register(
    "jsd_event_type_weekend",
    """
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN isodow(CAST(ts AS TIMESTAMP)) >= 6
                  THEN 1 ELSE 0 END AS wknd
      FROM events
    ), cnt AS (
      SELECT event_type,
             SUM(1 - wknd) AS c_wd,
             SUM(wknd) AS c_we
      FROM tagged GROUP BY event_type
    ), probs AS (
      SELECT event_type, c_wd, c_we,
             CAST(c_wd AS DOUBLE) / SUM(c_wd) OVER () AS p,
             CAST(c_we AS DOUBLE) / SUM(c_we) OVER () AS q
      FROM cnt
    )
    SELECT event_type,
           CAST(c_wd AS BIGINT) AS n_weekday,
           CAST(c_we AS BIGINT) AS n_weekend,
           ROUND(0.5 * (p * LN(p / ((p + q) / 2)))
                 + 0.5 * (q * LN(q / ((p + q) / 2))), 6) AS jsd_term,
           ROUND(SUM(0.5 * (p * LN(p / ((p + q) / 2)))
                     + 0.5 * (q * LN(q / ((p + q) / 2)))) OVER (), 6)
             AS jsd_total
    FROM probs ORDER BY event_type
    """,
)
def jsd_event_type_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the weekday and weekend
    event-type distributions (ISO day-of-week, Saturday/Sunday =
    weekend) — the bounded symmetric drift measure (0 <= JSD <= ln 2)
    used when KL's asymmetry or infinities are unacceptable.

    Scale shape: one partial-agg shuffle reduces events to one row per
    event type carrying both cohort counts (conditional aggregation —
    no second scan, no join of two cohort relations); the probability
    normalization and JSD sum run on that bounded relation. Counts are
    exact integers; the double formula is the identical operation
    sequence in both engines."""
    e = load_table(spark, sf_dir, "events")
    wknd = (F.weekday("ts") >= 5).cast("int")
    cnt = (
        e.select("event_type", wknd.alias("wknd"))
        .groupBy("event_type")
        .agg(
            F.sum(1 - F.col("wknd")).alias("c_wd"),
            F.sum("wknd").alias("c_we"),
        )
    )
    wall = W.partitionBy()
    p = F.col("c_wd").cast("double") / F.sum("c_wd").over(wall)
    q = F.col("c_we").cast("double") / F.sum("c_we").over(wall)
    probs = cnt.select("event_type", "c_wd", "c_we", p.alias("p"), q.alias("q"))
    m = (F.col("p") + F.col("q")) / 2
    term = 0.5 * (F.col("p") * F.log(F.col("p") / m)) + 0.5 * (
        F.col("q") * F.log(F.col("q") / m)
    )
    return probs.select(
        "event_type",
        F.col("c_wd").cast("bigint").alias("n_weekday"),
        F.col("c_we").cast("bigint").alias("n_weekend"),
        F.round(term, 6).alias("jsd_term"),
        F.round(F.sum(term).over(wall), 6).alias("jsd_total"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Association mining: basket pair rules, Markov transitions
# (round 6, thirteenth wave)
# --------------------------------------------------------------------------


@_register(
    "assoc_part_pairs_lift",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets FROM items
    ), freq AS (
      SELECT p, COUNT(*) AS c FROM items GROUP BY p
    ), pairs AS (
      SELECT a.p AS p1, b.p AS p2, COUNT(*) AS c_pair
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
           CAST(c_pair AS BIGINT) AS n_pair,
           ROUND(CAST(c_pair AS DOUBLE) / n_baskets, 6) AS support,
           ROUND(CAST(c_pair AS DOUBLE) / f1.c, 6) AS confidence,
           ROUND(CAST(c_pair AS DOUBLE) * n_baskets
                 / (CAST(f1.c AS DOUBLE) * f2.c), 6) AS lift
    FROM pairs JOIN freq f1 ON pairs.p1 = f1.p
               JOIN freq f2 ON pairs.p2 = f2.p
               CROSS JOIN n
    WHERE c_pair >= 3
    ORDER BY lift DESC, p1, p2 LIMIT 20
    """,
)
def assoc_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 association rules over order baskets by lift: for part
    pairs co-occurring in >= 3 orders, support, confidence(p1 -> p2),
    and lift = P(pair) / (P(p1) P(p2)) — the market-basket kernel
    behind recommendation co-occurrence features.

    Scale shape: ONE shuffle on the basket key builds sorted part-set
    arrays (collect_set dedupes in the aggregation — no separate
    distinct), then every pair is generated IN-ROW by nested
    transform/slice over the array (quadratic in BASKET size, small
    and bounded, never in catalog size; ascending sort canonicalizes
    p1 < p2) — measured against the equi-self-join formulation this
    drops the distinct+join exchanges and wins at sf0.1 (interleaved
    4x4: 1.42 s vs 1.50 s min), with the gap growing with basket
    count. Item frequencies explode from the same arrays; the
    single-row basket total broadcasts. All counts exact; ordering on
    the ROUNDED lift with key tiebreaks picks the same top-20 in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    bk = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    n = bk.agg(F.count("*").cast("bigint").alias("n_baskets"))
    freq = bk.select(F.explode("ps").alias("p")).groupBy("p").agg(
        F.count("*").alias("c")
    )
    pairs = (
        bk.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("c_pair"))
        .filter(F.col("c_pair") >= 3)
    )
    f1 = freq.withColumnRenamed("p", "p1").withColumnRenamed("c", "c1")
    f2 = freq.withColumnRenamed("p", "p2").withColumnRenamed("c", "c2")
    cp = F.col("c_pair").cast("double")
    return (
        pairs.join(f1, "p1")
        .join(f2, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("p1").cast("bigint").alias("p1"),
            F.col("p2").cast("bigint").alias("p2"),
            F.col("c_pair").cast("bigint").alias("n_pair"),
            F.round(cp / F.col("n_baskets"), 6).alias("support"),
            F.round(cp / F.col("c1"), 6).alias("confidence"),
            F.round(
                cp * F.col("n_baskets")
                / (F.col("c1").cast("double") * F.col("c2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "p1", "p2")
        .limit(20)
    )


@_register(
    "markov_event_transitions",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ), cnt AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt ORDER BY from_type, to_type
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types within each
    user's ordered stream: P(next = to | current = from) — the
    behavioral-sequence features session-prediction models start from.

    Scale shape: one shuffle partitions by user for the LEAD, then the
    transition counts reduce to an event-type x event-type relation
    (bounded by the category vocabulary squared) where the row
    normalization runs. Probabilities derive from exact integer counts
    identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    return cnt.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("from_type")),
            6,
        ).alias("p"),
    ).orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# Privacy audit + marketing attribution (round 6, fourteenth wave)
# --------------------------------------------------------------------------


@_register(
    "kanonymity_customer_audit",
    """
    WITH classes AS (
      SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
             COUNT(*) AS class_size
      FROM customer c GROUP BY 1, 2
    )
    SELECT CAST(nation AS BIGINT) AS nation, segment,
           CAST(class_size AS BIGINT) AS class_size
    FROM classes WHERE class_size < 10
    ORDER BY class_size, nation, segment
    """,
)
def kanonymity_customer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market segment) quasi-
    identifier pair: every equivalence class smaller than k=10 — the
    re-identification risk report run before releasing joined
    demographic slices; a violating class means those customers are
    distinguishable by the quasi-identifiers alone.

    Scale shape: one partial-agg shuffle to the class relation (bounded
    by the quasi-identifier domain product), then a filter — never a
    self-join. Counts exact."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") < 10)
        .select(
            F.col("nation").cast("bigint").alias("nation"),
            "segment",
            F.col("class_size").cast("bigint").alias("class_size"),
        )
        .orderBy("class_size", "nation", "segment")
    )


@_register(
    "ldiversity_customer_audit",
    """
    WITH bands AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 3000 THEN 'low'
                  WHEN c_acctbal < 7000 THEN 'mid'
                  ELSE 'high' END AS bal_band
      FROM customer
    ), classes AS (
      SELECT nation, segment,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct
      FROM bands GROUP BY 1, 2
    )
    SELECT CAST(nation AS BIGINT) AS nation, segment, class_size, l_distinct
    FROM classes WHERE l_distinct < 3
    ORDER BY l_distinct, nation, segment
    """,
)
def ldiversity_customer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion to the
    k-anonymity report: an equivalence class can be large (k-anonymous)
    yet still leak if its SENSITIVE attribute is homogeneous, because
    knowing someone is in the class reveals their value. Sensitive
    attribute here is the account-balance band; classes over the same
    (nation, segment) quasi-identifiers with fewer than l=3 distinct
    bands are reported.

    Scale shape: one partial-agg shuffle keyed by the quasi-identifier
    pair with COUNT(DISTINCT band) over a 4-value domain (rewritten by
    Spark into a two-level exact aggregate, still bounded by the class
    relation) — never a self-join, nothing corpus-sized collected."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            band.alias("bal_band"),
        )
        .groupBy("nation", "segment")
        .agg(
            F.count("*").cast("bigint").alias("class_size"),
            F.countDistinct("bal_band").cast("bigint").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < 3)
        .select(
            F.col("nation").cast("bigint").alias("nation"),
            "segment",
            "class_size",
            "l_distinct",
        )
        .orderBy("l_distinct", "nation", "segment")
    )


@_register(
    "text_source_token_entropy",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w
    ), tot AS (
      SELECT source, SUM(c) AS n, COUNT(*) AS vocab FROM freq GROUP BY source
    )
    SELECT f.source,
           CAST(MAX(t.n) AS BIGINT) AS n_tokens,
           CAST(MAX(t.vocab) AS BIGINT) AS vocab,
           ROUND(-SUM((CAST(c AS DOUBLE) / t.n)
                      * LN(CAST(c AS DOUBLE) / t.n)), 6) AS entropy,
           ROUND(-SUM((CAST(c AS DOUBLE) / t.n)
                      * LN(CAST(c AS DOUBLE) / t.n))
                 / LN(CAST(MAX(t.vocab) AS DOUBLE)), 6) AS norm_entropy
    FROM freq f JOIN tot t ON f.source = t.source
    GROUP BY f.source
    ORDER BY f.source
    """,
)
def text_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution, raw and
    normalized by ln(vocab) — the diversity signal that separates
    template-generated slices (low entropy) from organic text when
    weighting corpus mixtures.

    Scale shape: tokens reduce to (source, token) counts in one
    partial-agg shuffle (vocabulary-sized, Heaps-law sublinear); the
    per-source totals join back on source and the entropy sum runs over
    the count relation. Probabilities derive from exact integer counts;
    the log-sum's engine-order difference is orders of magnitude below
    the 6-decimal round (same contract as the perplexity tier)."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = freq.groupBy("source").agg(
        F.sum("c").alias("n"), F.count("*").alias("vocab")
    )
    p = F.col("c").cast("double") / F.col("n")
    ent = -F.sum(p * F.log(p))
    return (
        freq.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.max("vocab").cast("bigint").alias("vocab"),
            F.round(ent, 6).alias("entropy"),
            F.round(
                ent / F.log(F.max("vocab").cast("double")), 6
            ).alias("norm_entropy"),
        )
        .orderBy("source")
    )


@_register(
    "attribution_last_touch",
    """
    WITH carried AS (
      SELECT event_type, ts,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click', 'signup')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS mkt_ts,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click', 'signup')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS mkt_type
      FROM events
    )
    SELECT CASE WHEN mkt_ts IS NOT NULL
                 AND epoch_us(CAST(ts AS TIMESTAMP))
                     - epoch_us(CAST(mkt_ts AS TIMESTAMP))
                     <= 604800000000
                THEN mkt_type ELSE 'unattributed' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM carried WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent marketing touch (view / click / signup) within a 7-day
    lookback, else 'unattributed' — the conversion-credit report
    marketing analytics starts from.

    Scale shape: one shuffle partitions by user; the carried last-
    marketing-touch columns are two IGNORE-NULLS last_value windows
    over the SAME frame (both resolve to the same source row, so ts and
    type stay consistent); attribution is then a row-local expression
    and the final aggregation is over the channel domain. Microsecond
    integer arithmetic keeps the 7-day cutoff exact."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_mkt = F.col("event_type").isin("view", "click", "signup")
    mkt_ts = F.last(F.when(is_mkt, F.col("ts")), ignorenulls=True).over(w)
    mkt_type = F.last(
        F.when(is_mkt, F.col("event_type")), ignorenulls=True
    ).over(w)
    carried = e.select(
        "event_type",
        "ts",
        mkt_ts.alias("mkt_ts"),
        mkt_type.alias("mkt_type"),
    )
    within = (
        F.col("mkt_ts").isNotNull()
        & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("mkt_ts"))
            <= 604_800_000_000
        )
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            F.when(within, F.col("mkt_type"))
            .otherwise(F.lit("unattributed"))
            .alias("channel")
        )
        .groupBy("channel")
        .agg(F.count("*").cast("bigint").alias("n_purchases"))
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Lifecycle analytics: conversion latency, RFM segmentation, ingest-order
# audit (round 6, fifteenth wave)
# --------------------------------------------------------------------------


@_register(
    "conversion_time_percentiles",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS su,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS pu
      FROM events GROUP BY user_id
    ), conv AS (
      SELECT (pu - su) / 3600000000.0 AS hours
      FROM firsts WHERE su IS NOT NULL AND pu IS NOT NULL AND pu >= su
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(hours, 0.5), 6) AS p50_hours,
           ROUND(quantile_cont(hours, 0.9), 6) AS p90_hours,
           ROUND(SUM(hours) / COUNT(*), 6) AS mean_hours
    FROM conv
    """,
)
def conversion_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours from each user's first
    signup to their first purchase at or after it — the p50/p90
    latency summary growth analytics tracks release over release.

    Scale shape: one conditional aggregation reduces events to a row
    per user (both firsts in a single pass — no signup-purchase join);
    the percentile runs over the converted-user relation. Microsecond
    integer diffs make hours exact to double precision; both engines
    use the same linear-interpolation percentile definition."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("su"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("pu"),
    )
    conv = firsts.filter(
        F.col("su").isNotNull()
        & F.col("pu").isNotNull()
        & (F.col("pu") >= F.col("su"))
    ).select(((F.col("pu") - F.col("su")) / 3_600_000_000.0).alias("hours"))
    return conv.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(F.percentile("hours", F.lit(0.5)), 6).alias("p50_hours"),
        F.round(F.percentile("hours", F.lit(0.9)), 6).alias("p90_hours"),
        F.round(F.sum("hours") / F.count("*"), 6).alias("mean_hours"),
    )


@_register(
    "rfm_customer_segments",
    """
    WITH maxd AS (
      SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) AS d FROM orders
    ), rfm AS (
      SELECT o_custkey,
             DATEDIFF('day', MAX(CAST(o_orderdate AS TIMESTAMP)), MAX(maxd.d))
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders, maxd GROUP BY o_custkey
    ), scored AS (
      SELECT NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r,
             NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f,
             NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m
      FROM rfm
    )
    SELECT 'R' || r || 'F' || f || 'M' || m AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1 ORDER BY segment
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quintiles per
    ordering customer (5 = best: most recent, most frequent, highest
    spend), rolled up to segment population counts — the classical
    customer-value grid.

    Scale shape: orders reduce to one RFM row per customer in a single
    partial-agg shuffle; the three NTILE windows run over that
    customer-sized relation with fully-tied-off ordering (metric,
    custkey), so quintile assignment is deterministic in both engines;
    exact decimal monetary sums keep the M ordering identical. A naive
    NTILE window would plan a SinglePartition exchange — small for the
    fixture's customers, not at 100 TB — so each quintile is assigned
    from a DISTRIBUTED global position (the two-phase range-partition +
    offset kernel, llmops.pipeline.global_enumerate) with the exact
    NTILE bucket formula (first n%k buckets one larger); the plan test
    pins the plan SinglePartition-free."""
    from .llmops.pipeline import global_enumerate

    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("d"))
    rfm = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("d"), F.max("o_orderdate")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(dec("o_totalprice")).alias("monetary"),
        )
        .withColumn("neg_recency", -F.col("recency_days"))
    )
    n_row = rfm.agg(F.count("*").alias("n"))

    def quintile(sort_cols: list, out: str) -> DataFrame:
        df = global_enumerate(rfm, sort_cols).select(
            "o_custkey", (F.col("global_idx") + 1).alias("pos")
        )
        n, k = F.col("n"), F.lit(5)
        q = F.floor(n / k)
        r = n % k
        big = r * (q + 1)
        bucket = (
            F.when(F.col("pos") <= big, F.ceil(F.col("pos") / (q + 1)))
            .otherwise(
                r + F.ceil((F.col("pos") - big) / F.greatest(q, F.lit(1)))
            )
            .cast("int")
        )
        return df.crossJoin(F.broadcast(n_row)).select(
            "o_custkey", bucket.alias(out)
        )

    scored = (
        quintile(["neg_recency", "o_custkey"], "r")
        .join(quintile(["frequency", "o_custkey"], "f"), "o_custkey")
        .join(quintile(["monetary", "o_custkey"], "m"), "o_custkey")
    )
    return (
        scored.select(
            F.concat(
                F.lit("R"), F.col("r"), F.lit("F"), F.col("f"),
                F.lit("M"), F.col("m"),
            ).alias("segment")
        )
        .groupBy("segment")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("segment")
    )


@_register(
    "events_out_of_order_audit",
    """
    WITH seq AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY event_id) AS delta
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(delta) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inversions,
           ROUND(CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(delta), 6) AS inversion_rate
    FROM seq GROUP BY event_type ORDER BY event_type
    """,
)
def events_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order ingest audit: within each user's stream ordered by
    event id (arrival order), how often does the event timestamp step
    BACKWARD — the late-data rate that calibrates streaming watermark
    widths (streaming.py uses '2 hours'; this measures whether that
    holds).

    Scale shape: one shuffle partitions by user for the LAG; the
    aggregation reduces to the event-type domain. Microsecond integer
    deltas, exact counts."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    us = F.unix_micros(F.col("ts"))
    seq = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("delta")
    )
    inv = F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("delta").cast("bigint").alias("n_pairs"),
            inv.cast("bigint").alias("n_inversions"),
            F.round(inv.cast("double") / F.count("delta"), 6).alias(
                "inversion_rate"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Forecast backtest, survival analysis, concentration (round 6,
# sixteenth wave)
# --------------------------------------------------------------------------


@_register(
    "smape_seasonal_backtest",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             COUNT(*) AS c
      FROM events GROUP BY 1
    ), joined AS (
      SELECT c AS actual,
             LAG(c, 24) OVER (ORDER BY hour) AS forecast
      FROM hourly
    )
    SELECT CAST(COUNT(forecast) AS BIGINT) AS n_hours,
           ROUND(SUM(ABS(actual - forecast)) * 1.0 / SUM(actual), 6)
             AS wape,
           ROUND(AVG(2.0 * ABS(actual - forecast)
                     / (actual + forecast)), 6) AS smape,
           ROUND(SQRT(AVG(POW(CAST(actual - forecast AS DOUBLE), 2))), 6)
             AS rmse
    FROM joined WHERE forecast IS NOT NULL
    """,
)
def smape_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (predict each hour with
    the same hour yesterday) on the hourly event-count series: WAPE,
    sMAPE, and RMSE — the baseline every demand-forecast model must
    beat, measured the way a forecast pipeline actually scores.

    Scale shape: the fact scan reduces to the bounded hourly series in
    one partial-agg shuffle; the lag-24 join is one window pass over
    that series and the error aggregates are scalars. Counts are
    integers, so WAPE's ratio is exact-integer-derived; sMAPE and RMSE
    apply identical double arithmetic in both engines."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("c"))
    )
    joined = hourly.select(
        F.col("c").alias("actual"),
        F.lag("c", 24).over(W.orderBy("hour")).alias("forecast"),
    ).filter(F.col("forecast").isNotNull())
    err = F.col("actual") - F.col("forecast")
    return joined.agg(
        F.count("forecast").cast("bigint").alias("n_hours"),
        F.round(
            F.sum(F.abs(err)) * 1.0 / F.sum("actual"), 6
        ).alias("wape"),
        F.round(
            F.avg(2.0 * F.abs(err) / (F.col("actual") + F.col("forecast"))), 6
        ).alias("smape"),
        F.round(F.sqrt(F.avg(F.pow(err.cast("double"), F.lit(2.0)))), 6).alias(
            "rmse"
        ),
    )


@_register(
    "survival_user_retention_km",
    """
    WITH span AS (
      SELECT user_id,
             CAST(FLOOR((epoch_us(MAX(CAST(ts AS TIMESTAMP)))
                         - epoch_us(MIN(CAST(ts AS TIMESTAMP))))
                        / 3600000000.0) AS BIGINT) AS dur,
             CASE WHEN (epoch_us((SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events))
                        - epoch_us(MAX(CAST(ts AS TIMESTAMP))))
                       <= 12 * 3600000000
                  THEN 0 ELSE 1 END AS churned
      FROM events GROUP BY user_id
    ), times AS (
      SELECT dur AS t,
             SUM(churned) AS d,
             COUNT(*) AS leaving
      FROM span GROUP BY dur
    ), risk AS (
      SELECT t, d,
             SUM(leaving) OVER (ORDER BY t DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS n_at_risk
      FROM times
    )
    SELECT CAST(t AS INT) AS t_hours,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_churned,
           ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / n_at_risk))
                     OVER (ORDER BY t)), 6) AS survival
    FROM risk WHERE d > 0
    ORDER BY t_hours
    """,
)
def survival_user_retention_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve: per user, the observed activity
    span in HOURS; users whose last event falls within 12 hours of the
    corpus end are right-CENSORED (they count in the at-risk set but
    not as churn events) — the survival-analysis estimator done
    properly, not a naive churn histogram. The hour scale matches the
    fixture's activity density (day-level gaps barely exist).

    Scale shape: events reduce to one (duration, censored) row per user
    in a single aggregation (the corpus-max timestamp is a broadcast
    scalar); durations group to the bounded distinct-time relation
    where the descending-cumulative at-risk counts and the cumulative
    KM product (exp of an ORDERED log sum — deterministic order, same
    doubles both engines) run. Every window is over the time grid,
    never the data."""
    e = load_table(spark, sf_dir, "events")
    maxd = e.agg(F.max("ts").alias("mx"))
    span = (
        e.crossJoin(F.broadcast(maxd))
        .groupBy("user_id")
        .agg(
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / F.lit(3_600_000_000.0)
            )
            .cast("bigint")
            .alias("dur"),
            F.when(
                F.unix_micros(F.max("mx")) - F.unix_micros(F.max("ts"))
                <= 12 * 3_600_000_000,
                0,
            )
            .otherwise(1)
            .alias("churned"),
        )
    )
    times = span.groupBy(F.col("dur").alias("t")).agg(
        F.sum("churned").alias("d"), F.count("*").alias("leaving")
    )
    wdesc = W.orderBy(F.desc("t")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = times.select(
        "t", "d", F.sum("leaving").over(wdesc).alias("n_at_risk")
    )
    wasc = W.orderBy("t")
    return (
        risk.filter(F.col("d") > 0)
        .select(
            F.col("t").cast("int").alias("t_hours"),
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            F.col("d").cast("bigint").alias("n_churned"),
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            1.0 - F.col("d").cast("double") / F.col("n_at_risk")
                        )
                    ).over(wasc)
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("t_hours")
    )


@_register(
    "gini_revenue_concentration",
    """
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT r, ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS i,
             COUNT(*) OVER () AS n
      FROM rev
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(r) AS DOUBLE), 2) AS total_revenue,
           ROUND(2.0 * CAST(SUM(i * r) AS DOUBLE)
                 / (MAX(n) * CAST(SUM(r) AS DOUBLE))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini,
           ROUND(CAST(SUM(CASE WHEN i > n - CAST(CEIL(n / 10.0) AS BIGINT)
                               THEN r ELSE CAST(0 AS DECIMAL(18,2)) END)
                      AS DOUBLE)
                 / CAST(SUM(r) AS DOUBLE), 6) AS top_decile_share
    FROM ranked
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue across ordering customers plus the
    top-decile revenue share — the concentration audit run on corpus
    source weights and customer value alike (a Gini near 1 means a few
    heads dominate; near 0, uniform).

    Scale shape: orders reduce to one exact-decimal revenue row per
    customer; the rank is a window over that customer-sized relation
    with a fully tied-off total order (revenue, custkey), and the Gini
    reduces to exact decimal sums (sum of i*r stays decimal — the rank
    weight is an integer), so both engines divide identical operands.
    The formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n assumes ascending
    rank, which the total order pins. The rank comes from the
    DISTRIBUTED global-enumeration kernel (range partitions + driver
    prefix-summed offsets, llmops.pipeline.global_enumerate), not a
    SinglePartition ROW_NUMBER — the customer relation will not fit
    one task at 100 TB."""
    from .llmops.pipeline import global_enumerate

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("r"))
    n_row = rev.agg(F.count("*").alias("n"))
    ranked = (
        global_enumerate(rev, ["r", "o_custkey"])
        .select("r", (F.col("global_idx") + 1).alias("i"))
        .crossJoin(F.broadcast(n_row))
    )
    top = F.col("i") > F.col("n") - F.ceil(F.col("n") / 10.0).cast("bigint")
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.sum("r").cast("double"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("r")).cast("double")
            / (F.max("n") * F.sum("r").cast("double"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(top, F.col("r")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("double")
            / F.sum("r").cast("double"),
            6,
        ).alias("top_decile_share"),
    )
