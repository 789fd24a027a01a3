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
