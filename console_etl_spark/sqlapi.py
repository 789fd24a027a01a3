"""SQL API surface: the engine's queries are equally expressible as
``spark.sql`` over registered views — same Catalyst plans as the
DataFrame forms (SURVEY.md §2.2; the reference has no SQL surface at
all, its "queries" are hardcoded HTTP handlers, main.go:77-85).

The queries here deliberately use constructs only the SQL parser
accepts — correlated scalar subqueries and correlated EXISTS — to
exercise Catalyst's decorrelation rewrites (subquery -> aggregate +
left outer / semi join). Everything is oracle-checked like the
DataFrame tier.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Expose the fixture tables as temp views so users can
    ``spark.sql(...)`` directly — the engine's SQL front door. Idempotent;
    views are session-scoped and lazily read (pushdown still applies)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@_register(
    "sql_correlated_scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice,
           (SELECT CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line_price
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def sql_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list — Catalyst
    decorrelates it into an aggregate + left outer join on l_orderkey
    (orders with no lineitems surface NULL, which a naive inner-join
    rewrite would drop)."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               (SELECT CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line_price
        FROM orders
        WHERE o_orderstatus = 'F'
        """
    )


@_register(
    "sql_correlated_exists",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity >= 49
    )
    ORDER BY s_suppkey
    """,
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left semi join; the subquery
    predicate pushes into the lineitem scan before the probe."""
    register_views(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity >= 49
        )
        ORDER BY s_suppkey
        """
    )


RECURSIVE_HIERARCHY_SQL = """
    WITH RECURSIVE chain(n_nationkey, n_name, parent, depth, path) AS (
      SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS parent, 0 AS depth,
             n_name AS path
      FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT c.n_nationkey, c.n_name, p.n_nationkey AS parent,
             p.depth + 1 AS depth, p.path || '/' || c.n_name AS path
      FROM nation c JOIN chain p
        ON CAST(FLOOR((c.n_nationkey - 1) / 2.0) AS BIGINT) = p.n_nationkey
       AND c.n_nationkey > 0
    )
    SELECT n_nationkey, n_name, parent, depth, path FROM chain
    ORDER BY n_nationkey
"""


@_register("sql_recursive_hierarchy", RECURSIVE_HIERARCHY_SQL)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE) — hierarchy traversal
    with per-row depth and materialized root-to-node path, over a
    deterministic binary-tree parent relation on the nation table
    (parent(k) = floor((k-1)/2)). The construct batch engines
    historically lacked: each iteration is one distributed join of the
    frontier against the (pushdown-pruned) child scan, state bounded by
    the frontier — the same iterate-until-empty shape as the dedup
    connected-components loop, but fully declarative. DuckDB runs the
    identical ANSI SQL, so the recursion is value-checked end to end."""
    register_views(spark, sf_dir, tables=("nation",))
    return spark.sql(RECURSIVE_HIERARCHY_SQL)


LATERAL_TOPK_SQL = """
    SELECT n_name, s_name, s_acctbal
    FROM nation, LATERAL (
      SELECT s_name, s_acctbal FROM supplier
      WHERE s_nationkey = n_nationkey
      ORDER BY s_acctbal DESC, s_name LIMIT 2
    ) top_suppliers
    ORDER BY n_name, s_acctbal DESC, s_name
"""


@_register("sql_lateral_topk_per_nation", LATERAL_TOPK_SQL)
def sql_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — per-nation top-2 suppliers via a
    parser-only construct (no DataFrame equivalent short of a window).
    Catalyst decorrelates the LATERAL into a ranked window join; DuckDB
    runs the identical SQL, so this also proves the SQL front door is
    engine-portable ANSI.
    """
    register_views(spark, sf_dir, tables=("nation", "supplier"))
    return spark.sql(LATERAL_TOPK_SQL)


@_register(
    "sql_parameterized_topn",
    """
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 50000
    GROUP BY o_orderpriority
    ORDER BY revenue DESC, o_orderpriority
    LIMIT 3
    """,
)
def sql_parameterized_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 PARAMETERIZED SQL (named-parameter binding — the
    injection-safe front door an application layer needs): the query
    text carries :status/:floor/:k markers and values bind at execution,
    never by string concatenation. The oracle runs the equivalent with
    literals — value parity proves binding changes nothing semantically."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority
        ORDER BY revenue DESC, o_orderpriority
        LIMIT 3
        """,
        args={"status": "F", "floor": 50000},
    )


GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY ALL
"""


@_register("sql_group_by_all_revenue", GROUP_BY_ALL_SQL)
def sql_group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL convenience surface (VERDICT r7 item 8): grouping
    keys are inferred as every non-aggregate select item, so adding a
    dimension to the SELECT list cannot silently desync from the GROUP
    BY clause. Spark >= 3.4 and DuckDB resolve it identically; the
    inferred plan is the ordinary partial->final hash aggregate — the
    sugar is parser-level only, nothing changes at scale."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(GROUP_BY_ALL_SQL)


ORDER_BY_ALL_SQL = """
    SELECT r_name, n_name,
           CAST(COUNT(c_custkey) AS BIGINT) AS customers
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ALL
    ORDER BY ALL
"""


@_register("sql_order_by_all_nation_summary", ORDER_BY_ALL_SQL)
def sql_order_by_all_nation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL + GROUP BY ALL together (VERDICT r7 item 8): a
    deterministic total order over every output column without
    restating the list — the report-table idiom. The LEFT JOIN keeps
    customer-less nations (COUNT(c_custkey) counts non-null keys, so
    they report 0, which an inner join would silently drop). Dimension
    tables broadcast; the one shuffle is the group-by on the 25-nation
    bounded domain."""
    register_views(spark, sf_dir, ["region", "nation", "customer"])
    return spark.sql(ORDER_BY_ALL_SQL)
