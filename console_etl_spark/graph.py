"""Graph analytics over derived relations: PageRank.

The reference has no graph surface (SURVEY §2.2); near-dup grouping
already ships an iterative min-label connected-components kernel
(llmops/dedup.py). PageRank completes the iterative-graph tier: rank
propagation over a weighted digraph as driver-side control flow over
DataFrame ops — each round one join + one aggregation shuffled on node
id, ``localCheckpoint`` so round N never replays rounds 1..N-1. This is
the shape GraphX/GraphFrames executes underneath; at 100 TB the edge
relation is hash-partitioned on src and every round reuses that
partitioning.

Applied here to the customer↔supplier trade graph (who trades with
whom, weighted by line items) — the centrality signal a marketplace
would call "systemically important counterparties".
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


PR_DAMPING = 0.85
PR_ITERS = 10


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
) -> DataFrame:
    """Weighted PageRank over (src, dst, w) — fixed-iteration power
    method, fully deterministic.

    Per round: one equi-join of edges against ranks on src (both sides
    hash-partitioned on the join key, so the exchange is set up once),
    one aggregation on dst, plus a 1-row dangling-mass aggregate that
    broadcasts. Dangling nodes (no out-edges) redistribute their rank
    uniformly — the standard stochastic-matrix fix. localCheckpoint per
    round truncates lineage (same pattern as connected_components;
    reliable checkpoint() on a cluster)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # normalized transition edges: weight share of src's out-mass
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .localCheckpoint()
    )
    has_out = out_w.select(F.col("src").alias("node")).withColumn(
        "dangling", F.lit(False)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(iters):
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contribs = (
            trans.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer↔supplier trade graph: an undirected edge (as two
    directed edges) per trading relationship, weighted by line-item
    count. Customers and suppliers live in one id space via prefixed
    node ids (c<id> / s<id>)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").alias("w"))
    )
    c = F.concat(F.lit("c"), F.col("o_custkey"))
    s = F.concat(F.lit("s"), F.col("l_suppkey"))
    fwd = pairs.select(c.alias("src"), s.alias("dst"), "w")
    rev = pairs.select(s.alias("src"), c.alias("dst"), "w")
    return fwd.unionByName(rev)


@_register("graph_pagerank_trade", None)  # rows-only: iterative, not SQL-expressible
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank nodes of the trade graph (10 damped power
    iterations, deterministic). Unit tests pin every rank against an
    independent pure-Python power iteration to 1e-12."""
    ranks = pagerank(trade_edges(spark, sf_dir))
    return (
        ranks.select("node", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


@_register(
    "graph_triangle_parts_basket",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), nodes AS (
      SELECT p1 AS p FROM edges UNION SELECT p2 FROM edges
    ), tris AS (
      SELECT COUNT(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e1.p2 = e2.p1
      JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    )
    SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT n_triangles FROM tris) AS n_triangles
    """,
)
def graph_triangle_parts_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the market-basket graph: parts are nodes, an
    edge links two parts that co-occur in an order ("bought together").
    Triangles = closed co-purchase triples, the clustering signal a
    recommender's neighborhood quality depends on.

    Scale shape: edges are oriented p1 < p2 once and every triangle is
    enumerated exactly once as (a<b<c) — the standard compact-forward
    algorithm. Both joins shuffle on a part key, and the basket
    pair-build is bounded by sum over orders of C(items_per_order, 2),
    not |parts|^2; the part id space keeps the graph sparse so the
    wedge join (e1.p2 = e2.p1) stays linear in sum of deg^2, the same
    bound any distributed triangle count pays. The edge relation is
    localCheckpoint-pinned: it feeds FIVE consumers (e1/e2/e3, the
    node census, the edge count), and unpinned, Catalyst re-derived
    the basket self-join for each — 12 fact scans and five pair
    builds for one answer (r12 hardening; the duplicated-base-scan
    class the plan discipline exists for)."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = edges.select(F.col("p1").alias("p")).union(
        edges.select(F.col("p2").alias("p"))
    ).distinct()
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.p2") == F.col("e2.p1"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1"))
            & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        nodes.agg(F.count("*").alias("n_nodes"))
        .crossJoin(edges.agg(F.count("*").alias("n_edges")))
        .crossJoin(tris)
    )


@_register(
    "graph_bfs_hop_histogram",
    """
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT 'c' || CAST(c AS VARCHAR) AS src,
             's' || CAST(s AS VARCHAR) AS dst FROM pairs
      UNION ALL
      SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM pairs
    ), bfs AS (
      SELECT 's1' AS node, 0 AS hops
      UNION
      SELECT e.dst, b.hops + 1
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.hops < 3
    ), dist AS (
      SELECT node, MIN(hops) AS hops FROM bfs GROUP BY node
    )
    SELECT CAST(hops AS INT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY hops ORDER BY hops
    """,
)
def graph_bfs_hop_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first shortest-hop histogram from supplier node s1 over
    the customer<->supplier trade graph, depth-capped at 3 — the
    reachability profile ("how many counterparties are 1 / 2 / 3 hops
    away") that graph engines answer with single-source BFS.

    Spark shape: textbook frontier BFS as driver-side control flow — a
    FIXED 3 iterations, each one equi-join of the current frontier
    against the edge relation (hash-partitioned on src once, reused
    every round) + an anti-join against the visited set; localCheckpoint
    truncates lineage per round (same contract as pagerank above). No
    step is proportional to anything but the frontier x degree. The
    DuckDB oracle expresses the identical min-hop semantics as a
    recursive CTE, so the histogram is value-checked end to end."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c = F.concat(F.lit("c"), F.col("o_custkey"))
    s = F.concat(F.lit("s"), F.col("l_suppkey"))
    edges = (
        pairs.select(c.alias("src"), s.alias("dst"))
        .unionByName(pairs.select(s.alias("src"), c.alias("dst")))
        .localCheckpoint()
    )
    dist = spark.createDataFrame([("s1", 0)], "node string, hops int")
    frontier = dist.select("node")
    for h in range(1, 4):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return (
        dist.groupBy("hops")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .select(F.col("hops").cast("int").alias("hops"), "n_nodes")
        .orderBy("hops")
    )
