"""Probabilistic sketches as plain DataFrame plans (the "novel sketch"
tier next to HLL's approx_count_distinct).

A Count-Min sketch is just a (depth x width) counter matrix — i.e. a
tiny DataFrame keyed by (row, bucket). Building it is one aggregation
over the data; querying keys is a broadcast join against the sketch.
Both steps are deterministic (fixed xxhash64 seeds), reproducible on any
cluster, and mergeable across partitions/days by summing counters —
the property that makes sketches the right answer at 100 TB: the sketch
for a petabyte of events is still depth*width longs.

Error contract (standard CM bounds): estimate >= true count, and with
width w = ceil(e/eps), depth d = ceil(ln(1/delta)):
P[estimate > true + eps*N] < delta. Tests verify both sides empirically.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


def cms_params(eps: float = 0.005, delta: float = 0.01) -> tuple[int, int]:
    """(depth, width) for the standard Count-Min error bounds."""
    width = math.ceil(math.e / eps)
    depth = math.ceil(math.log(1.0 / delta))
    return depth, width


def _bucket(key: Column, row: int, width: int) -> Column:
    """Deterministic bucket for one hash row: xxhash64 with the row id as
    seed, folded into [0, width)."""
    return F.pmod(F.xxhash64(key, F.lit(row)), F.lit(width))


def cms_build(
    df: DataFrame, key: str, depth: int, width: int
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) — depth aggregations fused
    into ONE shuffle by exploding each input row into its depth
    (row, bucket) cells first. Output size is <= depth*width regardless
    of input size; sketches for different data slices merge by
    unioning and re-summing."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _bucket(F.col(key), r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy("c.row", "c.bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: str, depth: int, width: int
) -> DataFrame:
    """Point-query the sketch for each key: min over the depth rows of
    the addressed counters. The sketch is broadcast (<= depth*width
    rows); missing cells mean a zero counter."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _bucket(F.col(key), r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    addressed = keys.select(key, F.explode(cells).alias("c")).select(
        key, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )
    return (
        addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(key)
        .agg(F.min("cnt").alias("est_count"))
    )


@_register("sketch_cms_user_counts", None)  # rows-only: hash-addressed counters not SQL-portable
def sketch_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimated event counts per user: build the sketch over
    events, then point-query every distinct user. Estimates are exact
    here with high probability (500 users vs a 544-wide sketch), and the
    one-sided error contract (never an underestimate) is what heavy-
    hitter detection at 100 TB relies on."""
    depth, width = cms_params()
    e = load_table(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id", depth, width)
    users = e.select("user_id").distinct()
    return cms_estimate(sketch, users, "user_id", depth, width)


# --------------------------------------------------------------------------
# Bloom filter: set-membership sketch (no false negatives)
# --------------------------------------------------------------------------

@_register("sketch_bloom_prejoin_orders", None)  # rows-only: xxhash64 bit addresses not SQL-portable
def sketch_bloom_prejoin_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join pruning: build the filter over AUTOMOBILE-
    segment customer keys, probe every order's custkey, and count orders
    per priority by probable membership. At 100 TB this is the pattern
    that turns a fact-dimension semi join into a broadcast bit-set probe
    that prunes the fact scan before any shuffle; no false negatives, so
    the follow-up exact join only sees candidates. Deterministic
    (xxhash64), cross-validated by the unit false-positive/negative
    contract tests."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    o = load_table(spark, sf_dir, "orders")
    members = c.select(F.col("c_custkey").alias("key"))
    m, k = bloom_params(30000, fpp=0.01)
    bloom = bloom_build(members, "key", m, k)
    probes = o.select(F.col("o_custkey").alias("key"), "o_orderpriority").distinct()
    verdicts = bloom_contains(bloom, probes, "key", m, k)
    return (
        probes.join(verdicts, "key")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(F.when(F.col("maybe_present"), 1).otherwise(0)).alias(
                "probable_members"
            ),
            F.count("*").alias("probed"),
        )
    )


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for target false-positive probability."""
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def bloom_build(df: DataFrame, key: str, m_bits: int, k_hashes: int) -> DataFrame:
    """The filter as a DataFrame of set bit positions (<= m distinct
    rows): explode each key into its k bit addresses, distinct. Filters
    over different slices merge by union+distinct."""
    bits = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_contains(
    bloom: DataFrame, probes: DataFrame, key: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """(key, maybe_present) per probe: present iff ALL k addressed bits
    are set. Broadcast join against the bit set; a missing bit anywhere
    proves absence (no false negatives — the property that lets a Bloom
    filter pre-filter a 100 TB anti join down to candidate rows only)."""
    bits = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )
    addressed = probes.select(key, F.explode(bits).alias("bit"))
    hit = F.broadcast(bloom.withColumn("_set", F.lit(1)))
    return (
        addressed.join(hit, "bit", "left")
        .groupBy(key)
        .agg((F.count("*") == F.count("_set")).alias("maybe_present"))
    )


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries)
# --------------------------------------------------------------------------
# The deterministic counter-based frequent-items summary (the k-counter
# generalization of Boyer-Moore majority): each partition keeps at most
# k counters in O(k) memory; summaries merge by summing counters and
# pruning back to k (Agarwal et al., "Mergeable Summaries") — undercount
# is bounded by the summed prune decrements, which the summary CARRIES,
# so every estimate ships with its own certified error bar. Complements
# CMS: no hashing, no collisions, certified bounds per survivor.

MG_K = 32


def mg_partition_summaries(df: DataFrame, key: str, k: int = MG_K) -> DataFrame:
    """Per-partition Misra-Gries summaries via mapInPandas: Arrow
    batches are pre-aggregated with value_counts (vectorized), then
    folded into the bounded counter dict with the merge-and-prune step
    (subtract the (k+1)-th largest, drop non-positive, accumulate the
    decrement into the summary's error). Output: ≤ k+1 rows per
    partition — the surviving counters (part_err=0) plus ONE meta row
    (key NULL, cnt 0) carrying the partition's accumulated prune error,
    so downstream error totals are exactly-once. O(partitions·k) rows
    total, never data-sized."""
    import pandas as pd

    def batches(it):
        counters: dict = {}
        err = 0
        for pdf in it:
            vc = pdf[key].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - m for v, c in counters.items() if c > m}
                err += m
        yield pd.DataFrame(
            {
                key: list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                "part_err": [0] * len(counters) + [err],
            }
        )

    ktype = dict(df.dtypes)[key]
    return df.select(key).mapInPandas(
        batches, f"{key} {ktype}, cnt long, part_err long"
    )


def mg_heavy_hitters(df: DataFrame, key: str, k: int = MG_K) -> DataFrame:
    """Global heavy hitters with certified bounds: merge the partition
    summaries (sum counters per key), prune back to k with one window
    rank over the O(partitions·k) relation, and attach
    ``err_bound`` = Σ partition prune errors + the final merge prune.
    Contract: for every surviving key, est ≤ true ≤ est + err_bound;
    any key with true count > err_bound is guaranteed to survive. One
    narrow mapInPandas pass over the data; everything downstream is
    summary-sized (the window rank runs on ≤ partitions·k rows)."""
    from pyspark.sql import Window as W

    parts = mg_partition_summaries(df, key, k).localCheckpoint()
    part_err_total = parts.agg(F.sum("part_err").alias("pe"))
    merged = (
        parts.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.sum("cnt").alias("cnt"))
    )
    ranked = merged.withColumn(
        "rn", F.row_number().over(W.orderBy(F.desc("cnt"), key))
    )
    m_final = ranked.filter(F.col("rn") == k + 1).agg(
        F.coalesce(F.max("cnt"), F.lit(0)).alias("m")
    )
    return (
        ranked.crossJoin(F.broadcast(m_final))
        .crossJoin(F.broadcast(part_err_total))
        .withColumn("est", F.col("cnt") - F.col("m"))
        .filter((F.col("rn") <= k) & (F.col("est") > 0))
        .select(key, "est", (F.col("pe") + F.col("m")).alias("err_bound"))
    )


@_register("sketch_mg_heavy_tokens", None)  # rows-only: summary content depends on partitioning
def sketch_mg_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over the corpus token stream (k=32):
    the deterministic-guarantee twin of approximate top-k. Unit laws
    verify est ≤ true ≤ est + err_bound and that every token heavier
    than the bound is present, against exact counts."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    return mg_heavy_hitters(toks, "tok", MG_K).orderBy(F.desc("est"), "tok")


def mg_combine(a: DataFrame, b: DataFrame, key: str, k: int = MG_K) -> DataFrame:
    """Merge two Misra-Gries SUMMARIES into one (both in the summary
    schema mg_partition_summaries emits: counter rows + NULL-key meta
    rows carrying accumulated error): sum counters per key, prune back
    to k by subtracting the (k+1)-th largest, fold the prune decrement
    into one new meta row. The mergeable-summaries theorem keeps the
    certified bound valid for ANY merge tree — which is what lets a
    STREAM fold batch summaries into a running summary without ever
    revisiting data. Everything here is summary-sized."""
    from pyspark.sql import Window as W

    u = a.unionByName(b)
    merged = (
        u.filter(F.col(key).isNotNull()).groupBy(key).agg(F.sum("cnt").alias("cnt"))
    )
    ranked = merged.withColumn(
        "rn", F.row_number().over(W.orderBy(F.desc("cnt"), key))
    )
    m_df = ranked.filter(F.col("rn") == k + 1).agg(
        F.coalesce(F.max("cnt"), F.lit(0)).alias("m")
    )
    kept = (
        ranked.crossJoin(F.broadcast(m_df))
        .withColumn("cnt", F.col("cnt") - F.col("m"))
        .filter((F.col("rn") <= k) & (F.col("cnt") > 0))
        .select(key, "cnt", F.lit(0).cast("long").alias("part_err"))
    )
    ktype = dict(u.dtypes)[key]
    meta = (
        u.agg(F.coalesce(F.sum("part_err"), F.lit(0)).alias("pe"))
        .crossJoin(F.broadcast(m_df))
        .select(
            F.lit(None).cast(ktype).alias(key),
            F.lit(0).cast("long").alias("cnt"),
            (F.col("pe") + F.col("m")).alias("part_err"),
        )
    )
    return kept.unionByName(meta)


def mg_finalize(summary: DataFrame, key: str) -> DataFrame:
    """Summary → (key, est, err_bound): counter rows with the summed
    meta error attached (est ≤ true ≤ est + err_bound)."""
    err = summary.agg(F.coalesce(F.sum("part_err"), F.lit(0)).alias("err_bound"))
    return (
        summary.filter(F.col(key).isNotNull())
        .crossJoin(F.broadcast(err))
        .select(key, F.col("cnt").alias("est"), "err_bound")
    )


def stream_heavy_hitters(
    spark: SparkSession,
    path: str,
    store,
    catalog: str,
    checkpoint: str,
    key: str,
    k: int = MG_K,
    trigger_available_now: bool = True,
):
    """Streaming heavy hitters: each arriving micro-batch is folded into
    a persisted Misra-Gries summary — batch summary (one narrow pass
    over the batch) combined with the stored summary (summary-sized
    merge+prune), published as a new atomic SnapshotStore version. The
    running summary's certified bounds stay valid across any number of
    batches (mergeable-summaries theorem).

    Replay idempotence (r12 hardening — the same at-least-once defect
    class e839add fixed in the monitors, missed here): each publish
    carries the micro-batch's epoch tag in its version string, exactly
    the MaterializedView.refresh contract — a replayed fold whose
    epoch is already applied (equal, or numerically older than the
    current tag) is a no-op, so a crash between publish and the
    streaming checkpoint commit cannot double-merge a batch summary
    into the counters. The tag flips atomically with the data.

    Single-writer / replay-covers-history assumption (ADVICE r12,
    documented DELIBERATELY unscoped): tags here stay run-LESS
    (``e<epoch>``), unlike stream_refresh_mv's run-scoped ones,
    because for a sketch a fresh-checkpoint restart REPROCESSES THE
    WHOLE SOURCE — the numeric-older no-ops are exactly what keeps a
    full replay from double-merging (pinned by test). The flip side:
    exactly one stream may feed a catalog, and a fresh checkpoint
    must never be pointed at NEW-ONLY input (its reset epochs would
    no-op against the stored high-water tag and the new batches would
    be dropped) — feed new data through the same checkpointed stream,
    or start a new catalog. Per-batch cost: O(|batch| + k)."""
    import re as _re

    from ..store import MaterializedView

    reader = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", 1)
        .schema(spark.read.parquet(path).schema)
    )
    raw = reader.load(path)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"e{int(epoch_id):012d}"
        cur = store.current(catalog)
        if cur is not None and MaterializedView._already_applied(
            MaterializedView._epoch_of(cur.version), tag
        ):
            return
        batch_sum = mg_partition_summaries(batch_df.select(key), key, k)
        if cur is None:
            merged = mg_combine(
                batch_sum, batch_sum.limit(0), key, k
            )
            store.publish(merged, catalog, f"v000001-{tag}", partition_by=())
            return
        state = store.read_version(spark, catalog, cur.version)
        merged = mg_combine(state, batch_sum, key, k)
        n = int(_re.match(r"v(\d+)", cur.version).group(1))
        store.publish(merged, catalog, f"v{n + 1:06d}-{tag}", partition_by=())

    writer = raw.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch: mergeable NDV / union /
# intersection estimation (round 6, ninth wave)
# --------------------------------------------------------------------------
#
# The k smallest hash values of a set determine an unbiased NDV estimate
# ndv ~= (k-1) / u_(k) (u_(k) = k-th smallest hash mapped into (0,1)),
# and two sketches combine by "union the hash sets, keep the k smallest"
# — the mergeability that lets 100 TB of per-partition sketches reduce
# to one k-row relation. Set operations follow without ever joining the
# raw data: Jaccard ~= |K(A u B) that appear in both A_k and B_k| / k,
# intersection ~= J * union. Error is O(1/sqrt(k)) relative; tests pin
# the merge-equality law EXACTLY (same k smallest either way) and the
# estimate error empirically.

KMV_K = 256


def kmv_sketch(df: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """The k smallest DISTINCT xxhash64 values of df[key], as a k-row
    DataFrame (column h, ascending by construction via TakeOrdered).

    Scale shape: distinct on the hash (partial-agg shuffle), then a
    global ascending top-k — Spark executes sort().limit(k) as
    TakeOrderedAndProject: per-partition heaps of size k, one k-row
    merge on the driver side of the exchange; nothing data-sized moves."""
    return (
        df.select(F.xxhash64(F.col(key)).alias("h"))
        .distinct()
        .sort("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union the two sketches' hash sets, keep the k smallest — the
    exact same sketch kmv_sketch would produce on the unioned input
    (restricted to the keys both sketches saw; tests pin equality)."""
    return a.unionByName(b).distinct().sort("h").limit(k)


def _kmv_u(h: Column) -> Column:
    """Map a signed-64 hash into u in (0, 1): (h + 2^63 + 1) / (2^64+2) —
    strictly inside the open interval so 1/u never divides by zero."""
    return (h.cast("double") + F.lit(2.0**63 + 1.0)) / F.lit(2.0**64 + 2.0)


def kmv_ndv(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """NDV estimate from one sketch: (k-1)/u_(k); if the sketch holds
    fewer than k hashes the set was small — the sketch IS the distinct
    set, so the exact count is returned."""
    agg = sketch.agg(
        F.count("*").alias("m"), F.max(_kmv_u(F.col("h"))).alias("uk")
    )
    return agg.select(
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise((F.lit(k - 1)) / F.col("uk"))
        .alias("ndv_est")
    )


@_register("sketch_kmv_user_overlap", None)  # rows-only: xxhash64 order not SQL-portable
def sketch_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between the 'view' and 'purchase' event
    populations, estimated purely from two KMV sketches (k=256) — the
    corpus-overlap / audience-intersection estimate that at 100 TB must
    come from mergeable sketches, not a distinct-join.

    Output: one row with the two NDV estimates, union and intersection
    estimates, and the Jaccard — all deterministic (fixed xxhash64).
    Unit laws pin merge-equality exactly and estimate error vs exact
    NDV on the same fixture."""
    e = load_table(spark, sf_dir, "events")
    a = kmv_sketch(e.filter(F.col("event_type") == "view"), "user_id")
    b = kmv_sketch(e.filter(F.col("event_type") == "purchase"), "user_id")
    m = kmv_merge(a, b)
    # tag membership of each merged hash in the source sketches
    tagged = (
        m.join(a.withColumn("in_a", F.lit(1)), "h", "left")
        .join(b.withColumn("in_b", F.lit(1)), "h", "left")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
    )
    stats = tagged.agg(
        F.count("*").alias("m"),
        F.max(_kmv_u(F.col("h"))).alias("uk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("both"),
    )
    k = KMV_K
    union_est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(F.lit(k - 1) / F.col("uk"))
    jac = F.col("both") / F.col("m")
    ndv = lambda s: s.agg(  # noqa: E731 — tiny local alias
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise(F.lit(k - 1) / F.max(_kmv_u(F.col("h"))))
        .alias("v")
    )
    a_est = ndv(a).withColumnRenamed("v", "ndv_view_est")
    b_est = ndv(b).withColumnRenamed("v", "ndv_purchase_est")
    return (
        stats.crossJoin(F.broadcast(a_est))
        .crossJoin(F.broadcast(b_est))
        .select(
            F.round("ndv_view_est", 2).alias("ndv_view_est"),
            F.round("ndv_purchase_est", 2).alias("ndv_purchase_est"),
            F.round(union_est, 2).alias("ndv_union_est"),
            F.round(jac, 4).alias("jaccard_est"),
            F.round(jac * union_est, 2).alias("ndv_intersect_est"),
        )
    )


@_register("sketch_kll_price_quantiles", None)  # rows-only: KLL compaction is randomized; laws pin rank error + exact n
def sketch_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch over lineitem extended price: per-
    returnflag Datasketches KLL partials (Spark 4 kll_sketch_agg_double)
    merged into one global sketch (kll_merge_agg_double), finalized to
    p50/p90/p99 — the MV-tier quantile partial (store.mv_partials
    quantiles=) exercised as a standalone query. Percentiles are
    HOLISTIC (exact partials would carry every value), so at 100 TB an
    incrementally-maintained or partition-parallel percentile MUST come
    from a mergeable sketch; KLL's guarantee is ~1.65% normalized rank
    error at the default k=200 while kll_sketch_get_n stays EXACT
    through any merge tree.

    Output: one row per returnflag (partial-level estimates) plus a
    '_ALL_' row from the merged sketch — demonstrating both the
    partial and the merge answer the same surface. Rows-only driver
    check (KLL compaction is randomized); tests pin the rank-error
    contract against exact percentile_cont, exact n composition, and
    the MV refresh law (build+refresh quantiles ≈ full rebuild).

    Scale shape: one map-side-combinable groupBy(returnflag) builds the
    partials (3 sketch rows); the merge folds 3 rows. No shuffle
    carries raw values — sketch bytes only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("x")
    )
    # localCheckpoint the 3-row partial relation: both output branches
    # (per-flag rows and the _ALL_ merge) read the materialized sketches
    # — without it, Catalyst re-derives `parts` from the base table and
    # the full scan + sketch build runs TWICE (caught by plan review r9)
    parts = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("x").alias("kll")
    ).localCheckpoint()
    merged = parts.agg(F.kll_merge_agg_double("kll").alias("kll")).select(
        F.lit("_ALL_").alias("l_returnflag"), "kll"
    )
    return (
        parts.unionByName(merged)
        .select(
            "l_returnflag",
            F.kll_sketch_get_n_double("kll").alias("n"),
            F.round(
                F.kll_sketch_get_quantile_double("kll", F.lit(0.5)), 2
            ).alias("p50_est"),
            F.round(
                F.kll_sketch_get_quantile_double("kll", F.lit(0.9)), 2
            ).alias("p90_est"),
            F.round(
                F.kll_sketch_get_quantile_double("kll", F.lit(0.99)), 2
            ).alias("p99_est"),
        )
        .orderBy("l_returnflag")
    )
