"""Distributed k-means clustering over embedding columns (X3 adjunct).

Corpus clustering is the missing primitive between dedup and curation:
topic-balanced mixing, cluster-based decontamination audits, and IVF
coarse quantizers all start from "partition the embedding space into k
cells". The reference has no vector surface at all (SURVEY §2.2); this
is the Lloyd iteration re-expressed as Spark dataflow:

- **Assignment** is a broadcast join of the k-row centroid relation
  against the corpus, distance evaluated JVM-side by a fixed-order
  fold over the vector (``F.aggregate`` over ``F.zip_with``) — no
  Python in the row path, no shuffle of the corpus.
- **Update** explodes assigned vectors to (cluster, dim, value) and
  partially aggregates per (cluster, dim) — the shuffle carries
  k x dim partial sums per map task, never rows. Element sums are cast
  to DECIMAL so they are exact and summation-order-independent: the
  whole fit is bit-deterministic, run to run, any partitioning.
- Driver state is k x dim doubles per iteration — independent of corpus
  size, so the same loop drives 500 vectors or 100 TB.

Ties (equidistant centroids) break to the lowest cluster id via a
struct-min; empty clusters keep their previous centroid (standard
Lloyd fix, deterministic).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table, pin

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


KM_K = 8
KM_ITERS = 5

# Exact accumulator for centroid sums: embedding elements are ~unit
# floats; DECIMAL(28,12) holds sums of billions of them exactly, and
# decimal addition is associative/commutative — the reduce is
# order-independent, hence deterministic under any partitioning.
_DEC = "decimal(28,12)"


def _sq_dist(vec_col: str, cent_col: str) -> Column:
    """Squared euclidean distance as a fixed-order JVM fold."""
    return F.aggregate(
        F.zip_with(F.col(vec_col), F.col(cent_col), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, cents: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, vec) x broadcast(k centroids) -> (id, vec, cluster, dist).

    min(struct(dist, cid)) picks the nearest centroid with lowest-id
    tie-break in one partial-aggregable pass over the k-expanded rows.
    """
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "_d", _sq_dist(vec_col, "_cent")
    )
    best = F.min(F.struct(F.col("_d"), F.col("_cid"))).alias("_best")
    return (
        scored.groupBy(id_col)
        .agg(F.first(vec_col).alias(vec_col), best)
        .select(
            id_col,
            vec_col,
            F.col("_best._cid").alias("cluster"),
            F.col("_best._d").alias("dist"),
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Deterministic Lloyd k-means; returns (assignments, centroids,
    per-iteration inertia). Init = the k vectors with the smallest ids
    (reproducible anywhere, no RNG). Corpus passes: iters x (1 assign
    + 1 update); driver memory: O(k x dim)."""
    spark = emb.sparkSession
    emb = pin(emb.select(id_col, vec_col))
    dim = len(emb.select(vec_col).first()[0])

    seeds = emb.orderBy(id_col).limit(k).collect()
    centroids = [[float(v) for v in row[vec_col]] for row in seeds]
    inertia: list[float] = []

    for _ in range(iters):
        cents = F.broadcast(
            spark.createDataFrame(
                [(i, c) for i, c in enumerate(centroids)],
                "_cid int, _cent array<double>",
            )
        )
        assigned = _assign(emb, cents, vec_col, id_col)
        # one combined pass: per-(cluster, dim) exact sums + counts,
        # plus the iteration's inertia, all from the same assignment
        stats = (
            assigned.select(
                "cluster", "dist", F.posexplode(vec_col).alias("_pos", "_val")
            )
            .groupBy("cluster", "_pos")
            .agg(
                F.sum(F.col("_val").cast(_DEC)).alias("_sum"),
                F.count("*").alias("_n"),
                F.sum(F.col("dist").cast(_DEC)).alias("_dsum"),
            )
            .collect()
        )
        # sort the collected partials: the driver-side float += below
        # must fold in a fixed order or the reported inertia's last
        # bits drift with collect() row order across runs (assignments
        # and centroids were already order-free via exact decimals)
        stats = sorted(stats, key=lambda r: (r["cluster"], r["_pos"]))
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        total_inertia = 0.0
        for row in stats:
            sums.setdefault(row["cluster"], [None] * dim)[row["_pos"]] = row["_sum"]
            counts[row["cluster"]] = row["_n"]
            if row["_pos"] == 0:
                # dist was replicated once per dim; take the dim-0 slice
                total_inertia += float(row["_dsum"])
        centroids = [
            [float(sums[c][d] / counts[c]) for d in range(dim)]
            if c in sums
            else centroids[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]
        inertia.append(total_inertia)

    final_cents = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "_cid int, _cent array<double>",
        )
    )
    return _assign(emb, final_cents, vec_col, id_col), centroids, inertia


@_register("cluster_kmeans_embeddings", None)  # rows-only: iterative fit
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster every embedding into one of 8 k-means cells (5
    deterministic Lloyd rounds). Unit laws: bit-identical across runs,
    inertia non-increasing per round, assignments match a pure-numpy
    replica exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _, _ = kmeans_fit(emb)
    return assigned.select(
        "vec_id", "cluster", F.round("dist", 6).alias("dist")
    ).orderBy("vec_id")


@_register("cluster_kmeans_topic_mix", None)  # rows-only: derived from the fit
def cluster_kmeans_topic_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster x label composition — the 'is my corpus mix balanced
    across topic cells' audit a pretraining data team runs before
    sampling. Joins the fit back to the labeled corpus; one shuffle on
    vec_id (broadcast centroid assignment adds none)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _, _ = kmeans_fit(emb)
    return (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("n"))
        .orderBy("cluster", "label")
    )


SEMDEDUP_TAU = 0.4  # same near-dup cosine threshold as the exact pair tier


@_register("semdedup_cluster_prune", None)  # rows-only: built on the iterative fit
def semdedup_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning: k-means the embeddings, then
    WITHIN each cluster greedily keep a maximal set of vectors no two
    of which are near-duplicates (cosine >= SEMDEDUP_TAU), preferring
    the vectors FARTHEST from their centroid (edge examples carry more
    diversity than near-centroid ones — the published SemDeDup keep
    rule), with vec_id as the deterministic tie-break.

    Scale: pairwise similarity never crosses clusters, so the quadratic
    term is O(Σ_c n_c²) — bounded by raising k with corpus size exactly
    as the fit itself requires (cluster size ~n/k stays the
    applyInPandas group bound). The fit is the deterministic Lloyd
    kernel above; the prune is one groupBy(cluster).applyInPandas with
    a numpy GEMM per cluster. Laws (tests): bit-identical across runs,
    no two survivors within a cluster at >= tau, and every dropped
    vector has a kept near-dup witness in its cluster (maximality)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _, _ = kmeans_fit(emb)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["dist", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        kept: list[int] = []
        for i in range(len(pdf)):
            if kept:
                sims = np.round(
                    (m[kept] @ m[i]) / (norms[kept] * norms[i]), 9
                )
                if sims.max() >= SEMDEDUP_TAU:
                    continue
            kept.append(i)
        out = pdf.iloc[kept][["vec_id", "cluster", "dist"]].copy()
        out["dist"] = out["dist"].round(6)
        return out

    return (
        assigned.groupBy("cluster")
        .applyInPandas(prune, "vec_id long, cluster int, dist double")
        .orderBy("vec_id")
    )
