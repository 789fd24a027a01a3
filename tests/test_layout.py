"""Z-order layout tests: Morton key laws + measured row-group pruning."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from console_etl_spark import layout
from console_etl_spark.session import load_table
from tests.conftest import SF_TEST


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(0, 256, 37) for y in range(0, 256, 41)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", layout.zorder_key([F.col("x"), F.col("y")], 8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton2(r.x, r.y, 8), (r.x, r.y)


def test_zorder_scaling_is_integer_exact_and_degenerate_safe(spark):
    df = spark.createDataFrame([(0, 5), (100, 5), (37, 5)], "x long, y long")
    keyed = layout.with_zorder_key(df, ["x", "y"], bits=8)
    got = {r.x: r["__z"] for r in keyed.collect()}
    # y is constant (degenerate range) → contributes 0 bits; x spans
    # [0,100] → scaled x*255//100
    for x in (0, 100, 37):
        assert got[x] == _morton2(x * 255 // 100, 0, 8)


def test_zorder_scaling_exact_at_big_ids(spark):
    """r12 fix: the rank-scale product runs in DECIMAL(38,0) with
    INTEGRAL div. The old `(x-lo)*255` LONG product overflowed (ANSI
    ArithmeticException) above ~2^55, and before that the `/`-then-cast
    went through DOUBLE, diverging from the oracle's integer `//` by
    one bucket at boundaries once the product passed 2^53 — flipping
    interleaved Morton bits at exactly the id scales a 100 TB layout
    rewrite sees."""
    xs = [0, (1 << 60) + 7, (1 << 60) - 12345678901, (1 << 59) + 12345]
    df = spark.createDataFrame([(x,) for x in xs], "x long").withColumn(
        "y", F.lit(0).cast("long")
    )
    keyed = layout.with_zorder_key(df, ["x", "y"], bits=8)
    got = {r.x: r["__z"] for r in keyed.collect()}
    lo, hi = min(xs), max(xs)
    for x in xs:
        assert got[x] == _morton2((x - lo) * 255 // (hi - lo), 0, 8), x


def _rowgroup_ranges(path_glob: str, col_a: str, col_b: str):
    out = []
    for f in sorted(glob.glob(path_glob)):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            sa = g.column(names[col_a]).statistics
            sb = g.column(names[col_b]).statistics
            out.append(((sa.min, sa.max), (sb.min, sb.max), g.num_rows))
    return out


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    """The measurable claim behind OPTIMIZE ZORDER: after clustering on
    the Morton curve of (l_partkey, l_suppkey), a box predicate on BOTH
    dimensions overlaps far fewer row groups than a round-robin layout
    of the same data — and a single-key sort only helps its own key."""
    li = load_table(spark, SF_TEST, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    upath = str(tmp_path / "u")
    layout.write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)
    li.repartition(8).write.mode("overwrite").parquet(upath)

    pk_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_hi = li.agg(F.max("l_suppkey")).collect()[0][0]
    # a ~12% × ~25% box in the middle of both domains
    pk_lo, pk_hi_q = int(pk_hi * 0.4), int(pk_hi * 0.52)
    sk_lo, sk_hi_q = int(sk_hi * 0.4), int(sk_hi * 0.65)

    def overlapping(ranges):
        hit = total = 0
        for (pmin, pmax), (smin, smax), _ in ranges:
            total += 1
            if pmin <= pk_hi_q and pmax >= pk_lo and smin <= sk_hi_q and smax >= sk_lo:
                hit += 1
        return hit, total

    z_hit, z_total = overlapping(_rowgroup_ranges(f"{zpath}/*.parquet", "l_partkey", "l_suppkey"))
    u_hit, u_total = overlapping(_rowgroup_ranges(f"{upath}/*.parquet", "l_partkey", "l_suppkey"))
    assert u_total >= 8 and z_total >= 8
    # round-robin: every row group spans the whole domain → zero pruning
    assert u_hit == u_total
    # z-order: the box touches only the curve segments crossing it
    assert z_hit < z_total, (z_hit, z_total)
    assert z_hit / z_total <= 0.75

    # correctness: the clustered copy is the same relation
    z_rows = spark.read.parquet(zpath).count()
    assert z_rows == li.count()
    got = (
        spark.read.parquet(zpath)
        .filter(
            (F.col("l_partkey").between(pk_lo, pk_hi_q))
            & (F.col("l_suppkey").between(sk_lo, sk_hi_q))
        )
        .count()
    )
    want = li.filter(
        (F.col("l_partkey").between(pk_lo, pk_hi_q))
        & (F.col("l_suppkey").between(sk_lo, sk_hi_q))
    ).count()
    assert got == want


# --------------------------------------------------------------------------
# PageRank (graph.py): exact parity with an independent power iteration
# --------------------------------------------------------------------------

def _reference_pagerank(edges, damping=0.85, iters=10):
    """Independent dense power iteration over collected edges."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_w = {}
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = [1.0 / n] * n
    for _ in range(iters):
        dm = sum(rank[idx[v]] for v in nodes if v not in out_w)
        new = [(1.0 - damping) / n + damping * dm / n] * n
        for s, d, w in edges:
            new[idx[d]] += damping * rank[idx[s]] * (w / out_w[s])
        rank = new
    return dict(zip(nodes, rank))


def test_pagerank_matches_reference_power_iteration(spark):
    from console_etl_spark import graph

    e = graph.trade_edges(spark, SF_TEST)
    collected = [(r.src, r.dst, float(r.w)) for r in e.collect()]
    ref = _reference_pagerank(collected)
    got = {r.node: r.rank for r in graph.pagerank(e).collect()}
    assert got.keys() == ref.keys()
    for v, r in ref.items():
        assert abs(got[v] - r) < 1e-12, (v, got[v], r)
    # ranks are a probability distribution
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_handles_dangling_nodes(spark):
    from console_etl_spark import graph

    # b and c have no out-edges (pure sinks)
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 3.0), ("d", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = {r.node: r.rank for r in graph.pagerank(edges, iters=15).collect()}
    ref = _reference_pagerank([("a", "b", 1.0), ("a", "c", 3.0), ("d", "a", 1.0)], iters=15)
    for v, r in ref.items():
        assert abs(got[v] - r) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["c"] > got["b"]  # 3x the edge weight into c


def test_zonemap_prunes_files_and_stays_exact(spark, tmp_path):
    """Zone-map skipping over a z-ordered layout: the reader opens a
    strict subset of files for a 2-dim box, and the result is exactly
    the full-scan answer (pruning is an optimization, never a filter)."""
    li = load_table(spark, SF_TEST, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    layout.write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)
    zm = layout.write_zonemap(zpath, ["l_partkey", "l_suppkey"])
    assert len(zm) == 8

    pk_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_hi = li.agg(F.max("l_suppkey")).collect()[0][0]
    box = {
        "l_partkey": (int(pk_hi * 0.4), int(pk_hi * 0.52)),
        "l_suppkey": (int(sk_hi * 0.4), int(sk_hi * 0.65)),
    }
    df, read, total = layout.read_with_zonemap(spark, zpath, box)
    assert total == 8 and 0 < read < total, (read, total)
    want = li.filter(
        F.col("l_partkey").between(*box["l_partkey"])
        & F.col("l_suppkey").between(*box["l_suppkey"])
    )
    assert df.count() == want.count()
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in want.collect()}
    assert a == b

    # a box outside the domain prunes everything but still answers
    empty, read0, _ = layout.read_with_zonemap(
        spark, zpath, {"l_partkey": (pk_hi + 10, pk_hi + 20)}
    )
    assert read0 == 0 and empty.count() == 0


def test_bloom_index_prunes_point_lookups_with_no_false_negatives(spark, tmp_path):
    """Per-file Bloom index over an UNSORTED high-cardinality key:
    zone maps can't prune (every file spans the domain) but the bloom
    index can — and a pruned read returns exactly the full-scan answer
    for every probed key (no false negatives)."""
    li = load_table(spark, SF_TEST, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = str(tmp_path / "u")
    li.repartition(8).write.mode("overwrite").parquet(path)  # interleaved keys
    layout.write_bloom_index(path, "l_orderkey")

    keys = [r.l_orderkey for r in li.select("l_orderkey").distinct().limit(20).collect()]
    pruned_any = False
    for key in keys:
        df, read, total = layout.read_with_bloom(spark, path, key)
        assert total == 8
        want = li.filter(F.col("l_orderkey") == key).count()
        assert df.count() == want and want > 0
        if read < total:
            pruned_any = True
    assert pruned_any  # at 8k bits/file the index must prune some probes

    # absent key: may prune to zero files, must return zero rows
    df, read, total = layout.read_with_bloom(spark, path, -99999)
    assert df.count() == 0


def test_read_pruned_combines_zonemap_and_bloom(spark, tmp_path):
    """The unified reader intersects both indexes: a (range AND
    equality) probe reads no more files than either index alone would,
    with the full-scan answer pinned."""
    li = load_table(spark, SF_TEST, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "both")
    layout.write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=8)
    layout.write_zonemap(path, ["l_partkey", "l_suppkey"])
    layout.write_bloom_index(path, "l_orderkey")

    pk_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    key = li.filter(F.col("l_partkey") <= int(pk_hi * 0.3)).select(
        "l_orderkey"
    ).first().l_orderkey
    ranges = {"l_partkey": (0, int(pk_hi * 0.3))}
    equals = {"l_orderkey": key}

    df, read_both, total = layout.read_pruned(spark, path, ranges, equals)
    _, read_zm, _ = layout.read_pruned(spark, path, ranges, None)
    _, read_bl, _ = layout.read_pruned(spark, path, None, equals)
    assert total == 8
    assert read_both <= min(read_zm, read_bl)
    want = li.filter(
        (F.col("l_partkey").between(0, int(pk_hi * 0.3)))
        & (F.col("l_orderkey") == key)
    )
    assert df.count() == want.count() > 0
    assert {tuple(r) for r in df.collect()} == {tuple(r) for r in want.collect()}
