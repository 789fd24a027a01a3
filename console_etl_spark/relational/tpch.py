"""TPC-H-derived suite (incl. salting and the Q2/Q20 shapes) (split from relational.py, round 7).

See the package ``__init__`` for the tier-wide conventions doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..session import load_table
from ._base import ORACLE, QUERIES, QueryFn, _register, dec, one, rate

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
    events scan is 100 TB; only the initial rollup shuffles. The
    rollup is localCheckpoint-pinned and the bounds/type relations
    derive FROM it (min/max of truncated hours == truncated min/max
    ts; its type set == the raw type set) — unpinned, each was its own
    fact scan, three for one answer (r12 repeated-scan sweep)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .localCheckpoint()
    )
    bounds = hourly.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = hourly.select("event_type").distinct()
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


