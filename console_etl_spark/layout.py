"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference stores one snapshot sorted by a single key (`name` — see
store.py's sortWithinPartitions row-group skip-scan for Q4). A single
sort key only prunes scans that filter on THAT key; pipelines that
filter on two dimensions at once (user × time, part × supplier,
lat × lon) get no pruning on the second dimension. Z-ordering
interleaves the bits of several columns' normalized ranks into one
Morton key and sorts the layout by it, so parquet row-group/file
min-max statistics become tight on EVERY participating dimension at
once — the same layout optimization Delta's OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite apply at 100 TB.

Everything here is JVM-side built-in expressions (shift/and/or over a
fixed bit budget — no UDFs), one bounded 1-row aggregate for the
per-column ranges, and one range-repartition + in-partition sort for
the write: the exact physical shape of a sorted-table rewrite job.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
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


ZORDER_BITS = 8  # bits per dimension (2 dims → 16-bit Morton keys)


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-scale an integer column into [0, 2^bits) with pure integer
    arithmetic — `(x - lo) * (2^bits - 1) DIV (hi - lo)` — so the same
    formula is bit-exact in any engine (no float rounding at bucket
    boundaries). Degenerate ranges (hi == lo) map to 0.

    r12 fix: the division is Spark's INTEGRAL `div`, not `/` — true
    division goes through DOUBLE, and once (x - lo) * top exceeds 2^53
    (billion-scale ids on a wide range) the truncated double diverges
    from the oracle's integer `//` by one bucket at boundaries, which
    flips interleaved Morton bits — and the product is computed in
    DECIMAL(38,0), because the LONG product itself overflows (ANSI
    ArithmeticException) once the column tops ~2^55. Same values at
    every test SF; only the at-scale semantics change. The registered
    oracle widens through HUGEINT identically."""
    span = hi - lo
    top = F.lit((1 << bits) - 1).cast("decimal(38,0)")
    return F.when(span <= 0, F.lit(0).cast("long")).otherwise(
        F.call_function(
            "div",
            (col.cast("long") - lo).cast("decimal(38,0)") * top,
            span.cast("decimal(38,0)"),
        )
    ).cast("long")


def zorder_key(scaled: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton interleave: bit i of dimension j lands at position
    i*ndims + j. A fixed bits×ndims fan of shift/and/or built-ins —
    whole-stage-codegen friendly, no Python in the row path."""
    ndims = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndims + j))
    return z


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = ZORDER_BITS,
    key: str = "__z",
) -> DataFrame:
    """Append the Morton key over integer columns ``cols``. One bounded
    1-row aggregate fetches per-column ranges (the only job before the
    rewrite); rows never leave executors."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    r = df.agg(*aggs).collect()[0]
    scaled = [
        _scale_to_bits(
            F.col(c),
            F.lit(int(r[f"_lo_{c}"])).cast("long"),
            F.lit(int(r[f"_hi_{c}"])).cast("long"),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(key, zorder_key(scaled, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZORDER_BITS,
    n_files: int = 8,
) -> None:
    """Rewrite ``df`` as parquet clustered on the Z-curve of ``cols``:
    range-repartition on the Morton key (files own contiguous curve
    segments) + sortWithinPartitions (row groups within a file stay
    tight), then drop the key. Scans filtering any subset of ``cols``
    prune on file and row-group min-max stats — the OPTIMIZE ZORDER
    shape. At 100 TB, ``n_files`` comes from target file size, and the
    range exchange is sampling-based so no coordinator sees the data."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _zorder_sql_terms(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@_register(
    "zorder_interleaved_keys",
    f"""
    WITH b AS (
      SELECT min(user_id) AS ulo, max(user_id) AS uhi,
             min(CAST(floor(value) AS BIGINT)) AS vlo,
             max(CAST(floor(value) AS BIGINT)) AS vhi
      FROM events
    ), scaled AS (
      SELECT event_id,
             CASE WHEN uhi <= ulo THEN 0
                  ELSE CAST(CAST(user_id - ulo AS HUGEINT)
                            * {(1 << ZORDER_BITS) - 1}
                            // (uhi - ulo) AS BIGINT)
             END AS sx,
             CASE WHEN vhi <= vlo THEN 0
                  ELSE CAST(CAST(CAST(floor(value) AS BIGINT) - vlo
                                 AS HUGEINT)
                            * {(1 << ZORDER_BITS) - 1}
                            // (vhi - vlo) AS BIGINT)
             END AS sy
      FROM events, b
    )
    SELECT event_id, {_zorder_sql_terms('sx', 'sy', ZORDER_BITS)} AS zval
    FROM scaled
    """,
)
def zorder_interleaved_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (user_id, floor(value)) for every event —
    the clustering key write_zordered sorts by, value-hash-checked
    against the identical integer-exact interleave in ANSI SQL."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").cast("long").alias("x"),
        F.floor("value").cast("long").alias("y"),
    )
    keyed = with_zorder_key(e, ["x", "y"], ZORDER_BITS, key="zval")
    return keyed.select("event_id", "zval")


# --------------------------------------------------------------------------
# File-level zone maps (Iceberg/Delta-style metadata skipping)
# --------------------------------------------------------------------------
# Parquet row-group stats prune WITHIN a file at scan time, but the scan
# still has to OPEN every footer. A zone map lifts per-file min/max into
# one metadata document written at publish time, so a reader prunes the
# FILE LIST before Spark ever plans the scan — the manifest-level data
# skipping Iceberg/Delta do, and the reason write_zordered pays off
# twice (tight file ranges → aggressive zone-map pruning). The zone map
# is metadata-sized: reading it costs O(files), never O(data); on a
# real table format the same stats come from write-task metrics instead
# of a footer sweep.

ZONEMAP_NAME = "_ZONEMAP.json"


def write_zonemap(path: str, cols: list[str]) -> dict:
    """Sweep the parquet footers under ``path`` once and persist per-file
    min/max for ``cols`` as ``_ZONEMAP.json``. Returns the map."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    zm = {}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        entry = {}
        for c in cols:
            lo = hi = None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(names[c]).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            entry[c] = [lo, hi]
        zm[os.path.basename(f)] = entry
    with open(os.path.join(path, ZONEMAP_NAME), "w") as out:
        json.dump({"cols": cols, "files": zm}, out)
    return zm


def read_with_zonemap(
    spark: SparkSession, path: str, predicates: dict[str, tuple]
) -> tuple[DataFrame, int, int]:
    """Scan ``path`` reading ONLY files whose zone-map ranges overlap
    every ``col: (lo, hi)`` predicate. Returns (DataFrame over the
    surviving files WITH the predicate applied — zone maps prune, the
    filter still guarantees exactness — plus files_read, files_total).
    A column whose stats were unavailable keeps its files (never prunes
    on missing metadata)."""
    import json
    import os

    from pyspark.sql import functions as F

    with open(os.path.join(path, ZONEMAP_NAME)) as f:
        zm = json.load(f)
    keep = []
    for fname, entry in zm["files"].items():
        ok = True
        for c, (lo, hi) in predicates.items():
            flo, fhi = entry.get(c, (None, None))
            if flo is None or fhi is None:
                continue  # no stats → cannot prune
            if fhi < lo or flo > hi:
                ok = False
                break
        if ok:
            keep.append(os.path.join(path, fname))
    total = len(zm["files"])
    if not keep:
        df = spark.read.parquet(path).limit(0)
        return df, 0, total
    df = spark.read.parquet(*keep)
    for c, (lo, hi) in predicates.items():
        df = df.filter(F.col(c).between(lo, hi))
    return df, len(keep), total


# --------------------------------------------------------------------------
# Per-file Bloom indexes (Delta bloom-filter-index analog)
# --------------------------------------------------------------------------
# Zone maps prune RANGE predicates; they are useless for equality on a
# column whose values interleave across files (high-cardinality ids in
# an unsorted layout — every file's [min,max] covers everything). A
# per-file Bloom filter answers "could value v be in this file?" with
# no false negatives, so point lookups prune the file list even when
# min/max cannot. Same deterministic xxhash64 family as the engine's
# Bloom join pruner (llmops/sketches.py).

BLOOM_INDEX_NAME = "_BLOOM.json"


def _bloom_positions(value: str, m_bits: int, k_hashes: int) -> list[int]:
    """k deterministic bit positions for a value: md5-derived double
    hashing (h1 + i*h2 mod m) — stdlib-only, stable across runs."""
    import hashlib

    d = hashlib.md5(value.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m_bits for i in range(k_hashes)]


def write_bloom_index(
    path: str, col: str, m_bits: int = 32768, k_hashes: int = 5
) -> dict:
    """One Bloom bitset per parquet file over ``col``'s values,
    persisted as ``_BLOOM.json`` (hex bitsets). Built with a bounded
    per-file scan of just that column (pyarrow, column-pruned) at
    index-build time; on a table format this would come from write-task
    state like the zone map."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    idx = {}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        bits = 0
        tbl = pq.read_table(f, columns=[col])
        for v in tbl.column(col).to_pylist():
            if v is None:
                continue
            for p in _bloom_positions(str(v), m_bits, k_hashes):
                bits |= 1 << p
        idx[os.path.basename(f)] = f"{bits:x}"
    doc = {"col": col, "m_bits": m_bits, "k_hashes": k_hashes, "files": idx}
    with open(os.path.join(path, BLOOM_INDEX_NAME), "w") as out:
        json.dump(doc, out)
    return doc


def read_with_bloom(
    spark: SparkSession, path: str, value
) -> tuple[DataFrame, int, int]:
    """Point-lookup scan reading ONLY files whose Bloom filter admits
    ``value`` (no false negatives: a pruned file provably lacks it).
    Returns (DataFrame filtered to the value, files_read, files_total)."""
    import json
    import os

    from pyspark.sql import functions as F

    with open(os.path.join(path, BLOOM_INDEX_NAME)) as f:
        doc = json.load(f)
    col, m, k = doc["col"], doc["m_bits"], doc["k_hashes"]
    pos = _bloom_positions(str(value), m, k)
    keep = []
    for fname, hexbits in doc["files"].items():
        bits = int(hexbits, 16)
        if all(bits >> p & 1 for p in pos):
            keep.append(os.path.join(path, fname))
    total = len(doc["files"])
    if not keep:
        return spark.read.parquet(path).limit(0), 0, total
    df = spark.read.parquet(*keep).filter(F.col(col) == value)
    return df, len(keep), total


def read_pruned(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple] | None = None,
    equals: dict[str, object] | None = None,
) -> tuple[DataFrame, int, int]:
    """Unified metadata-skipping reader: intersect the zone map's
    range-surviving file set with the Bloom index's equality-surviving
    set, read only the intersection, and apply every predicate for
    exactness. Uses whichever index files exist — a missing index
    simply doesn't prune. Returns (DataFrame, files_read, files_total)."""
    import json
    import os

    from pyspark.sql import functions as F

    all_files = None
    keep = None

    zm_path = os.path.join(path, ZONEMAP_NAME)
    if ranges and os.path.exists(zm_path):
        with open(zm_path) as f:
            zm = json.load(f)
        all_files = set(zm["files"])
        zkeep = set()
        for fname, entry in zm["files"].items():
            ok = True
            for c, (lo, hi) in ranges.items():
                flo, fhi = entry.get(c, (None, None))
                if flo is None or fhi is None:
                    continue
                if fhi < lo or flo > hi:
                    ok = False
                    break
            if ok:
                zkeep.add(fname)
        keep = zkeep

    bl_path = os.path.join(path, BLOOM_INDEX_NAME)
    if equals and os.path.exists(bl_path):
        with open(bl_path) as f:
            doc = json.load(f)
        all_files = set(doc["files"]) if all_files is None else all_files
        col, m, k = doc["col"], doc["m_bits"], doc["k_hashes"]
        if col in equals:
            pos = _bloom_positions(str(equals[col]), m, k)
            bkeep = {
                fname
                for fname, hexbits in doc["files"].items()
                if all(int(hexbits, 16) >> p & 1 for p in pos)
            }
            keep = bkeep if keep is None else (keep & bkeep)

    if all_files is None:  # no usable index: plain scan
        df = spark.read.parquet(path)
        total = read = -1
    else:
        total = len(all_files)
        files = sorted(keep if keep is not None else all_files)
        read = len(files)
        if not files:
            df = spark.read.parquet(path).limit(0)
            return df, 0, total
        df = spark.read.parquet(*[os.path.join(path, f) for f in files])
    for c, (lo, hi) in (ranges or {}).items():
        df = df.filter(F.col(c).between(lo, hi))
    for c, v in (equals or {}).items():
        df = df.filter(F.col(c) == v)
    return df, read, total
