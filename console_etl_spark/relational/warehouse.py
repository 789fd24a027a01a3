"""Warehouse maintenance: percentiles/fuzzy, SCD2, anomaly, DQ, behavioral, incremental MVs (split from relational.py, round 7).

See the package ``__init__`` for the tier-wide conventions doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..session import load_table
from ._base import ORACLE, QUERIES, QueryFn, _register, dec, one, rate

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

    Scale shape (r12 repair): ONE scan per table — 4 scans for 9
    rules, down from the 11 of the per-rule shape (each rule used to
    re-scan its fact; found by the r12 repeated-scan sweep). Every
    per-row rule rides as a conditional-aggregate flag on the
    key-grouped relation the FK checks need anyway: orders reduces to
    (o_orderkey -> row count, out-of-range count) in one
    map-side-combinable pass that serves null-pk, duplicate-pk,
    date-range AND the orphan check's right side; lineitem reduces to
    (l_orderkey -> row count, bad-quantity count, bad-price count)
    serving its four rules; customer reduces over the tiny c_nationkey
    domain; nation broadcasts. The key-grouped shuffles are exactly
    the ones the FK anti-joins already required — the per-row rules
    now ride them for free. The rules union to a 9-row report; a
    pipeline gates the snapshot publish (store.publish) on every count
    being zero.

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

    bad_date = (
        (F.col("o_orderdate") < F.lit(DQ_ORDERDATE_MIN).cast("date"))
        | (F.col("o_orderdate") > F.lit(DQ_ORDERDATE_MAX).cast("date"))
    ).cast("long")
    from ..session import pin

    # pin (lazy persist), not localCheckpoint: all nine rule branches
    # execute in ONE job (the broadcast-crossJoin report below), so
    # the lazy cache fills on first touch and the other branches reuse
    # it — an eager checkpoint would serialize three materialization
    # jobs before the report job (A/B'd at sf0.1: checkpoint 1.70 s,
    # union-of-aggregates 1.88 s, this shape 1.41 s; the pre-repair
    # 11-scan shape's 0.93 s is the local cost of the saved scans —
    # the 100 TB trade documented above)
    okeys, lkeys, ckeys = pin(
        orders.groupBy("o_orderkey").agg(
            F.count("*").alias("cnt"), F.sum(bad_date).alias("bad_date")
        ),
        lineitem.groupBy("l_orderkey").agg(
            F.count("*").alias("cnt"),
            F.sum((F.col("l_quantity") <= 0).cast("long")).alias("bad_qty"),
            F.sum((F.col("l_extendedprice") < 0).cast("long")).alias(
                "bad_price"
            ),
        ),
        customer.groupBy("c_nationkey").agg(F.count("*").alias("cnt")),
    )

    def scalar(df: DataFrame, col, alias: str) -> DataFrame:
        return df.agg(
            F.coalesce(F.sum(col), F.lit(0)).cast("long").alias(alias)
        )

    parts = [
        scalar(okeys.filter(F.col("o_orderkey").isNull()), F.col("cnt"),
               "n_onull"),
        scalar(okeys.filter(F.col("cnt") > 1), F.col("cnt") - 1, "n_odup"),
        scalar(okeys, F.col("bad_date"), "n_odate"),
        scalar(lkeys.filter(F.col("l_orderkey").isNull()), F.col("cnt"),
               "n_lnull"),
        scalar(
            lkeys.filter(F.col("l_orderkey").isNotNull())
            .join(okeys.filter(F.col("o_orderkey").isNotNull())
                  .select("o_orderkey"),
                  lkeys.l_orderkey == okeys.o_orderkey,
                  "left_anti"),
            F.col("cnt"), "n_lorph"),
        scalar(lkeys, F.col("bad_qty"), "n_lqty"),
        scalar(lkeys, F.col("bad_price"), "n_lprice"),
        scalar(ckeys.filter(F.col("c_nationkey").isNull()), F.col("cnt"),
               "n_cnull"),
        scalar(
            ckeys.filter(F.col("c_nationkey").isNotNull())
            .join(F.broadcast(nation.select("n_nationkey")),
                  ckeys.c_nationkey == nation.n_nationkey,
                  "left_anti"),
            F.col("cnt"), "n_cinv"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(F.broadcast(p))
    return out.selectExpr(
        "stack(9, "
        "'customer_invalid_nation_fk', n_cinv, "
        "'customer_null_nation_fk', n_cnull, "
        "'lineitem_negative_price', n_lprice, "
        "'lineitem_nonpositive_quantity', n_lqty, "
        "'lineitem_null_fk', n_lnull, "
        "'lineitem_orphan_fk', n_lorph, "
        "'orders_date_out_of_range', n_odate, "
        "'orders_duplicate_pk', n_odup, "
        "'orders_null_pk', n_onull"
        ") as (rule, n_violations)"
    ).orderBy("rule")


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

    Scale shape (r12 repair): ONE events scan. The old per-stage
    filter-aggregate-join chain re-scanned events once per stage plus
    once per stage join — five fact scans for a 3-row answer (found by
    the r12 repeated-scan sweep). Now two chained running-min windows
    over a single user_id partitioning express the strict ordering
    in-pass: cummin(signup ts) qualifies views (ts strictly greater),
    cummin(qualified view ts) qualifies purchases; the per-user
    flag rollup reuses the window's hash partitioning, so the whole
    funnel is one exchange + one sort. Stage semantics are IDENTICAL:
    a row ordered by (ts, event_id) sees a same-ts signup in its
    running min, but the strict ts > comparison excludes it — matching
    the old join's ts > ts_s — and deeper funnels are more chained
    windows on the same frame, not more scans."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ts_sig = F.when(F.col("event_type") == "signup", F.col("ts"))
    staged = e.select("user_id", "event_type", "ts", "event_id").withColumn(
        "rms", F.min(ts_sig).over(w)
    )
    qual_view = F.when(
        (F.col("event_type") == "view") & (F.col("ts") > F.col("rms")),
        F.col("ts"),
    )
    staged = staged.withColumn("rmv", F.min(qual_view).over(w))
    per_user = staged.groupBy("user_id").agg(
        F.max((F.col("event_type") == "signup").cast("int")).alias("s"),
        F.max(qual_view.isNotNull().cast("int")).alias("v"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("rmv"))
            ).cast("int")
        ).alias("p"),
    )
    counts = per_user.agg(
        F.sum("s").cast("long").alias("n_s"),
        F.sum("v").cast("long").alias("n_v"),
        F.sum("p").cast("long").alias("n_p"),
    )
    return counts.selectExpr(
        "stack(3, 'signup', n_s, 'view_after_signup', n_v, "
        "'purchase_after_view', n_p) as (stage, n_users)"
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
    from ..store import mv_finalize, mv_merge, mv_partials

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
    from ..store import mv_finalize, mv_merge, mv_partials

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
    from ..llmops.dedup import connected_components

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
    partitioning on event_type. Like its zero-fill twin, the rollup is
    localCheckpoint-pinned and the bounds/type relations derive from
    it — one fact scan instead of three (r12 repeated-scan sweep)."""
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
        .localCheckpoint()
    )
    bounds = agg.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = agg.select("event_type").distinct()
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
    exact interpolated quantile passes over the (flag, price) COUNT
    GRID (r15, guide §2.3): `percentile(value, p, frequency)` over
    distinct values with multiplicities is bit-identical to the row
    form — Spark's Percentile aggregate builds the same value→count
    OpenHashMap either way (so memory was domain-bounded in BOTH
    forms; an earlier claim here overstated that) — but the fact
    table is scanned ONCE instead of twice, the per-row aggregate
    update loop runs over the domain instead of every row, and no
    row-sized broadcast join remains. Both engines use the identical
    linear-interpolation quantile definition; round(6) absorbs the
    join-order float noise."""
    from ..session import pin

    li = load_table(spark, sf_dir, "lineitem")
    grid = pin(
        li.groupBy("l_returnflag", "l_extendedprice").agg(
            F.count("*").cast("bigint").alias("ct")
        )
    )
    med = grid.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5), F.col("ct")).alias("med")
    )
    return (
        grid.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.max("med"), 6).alias("median_price"),
            F.round(
                F.percentile(
                    F.abs(F.col("l_extendedprice") - F.col("med")),
                    F.lit(0.5),
                    F.col("ct"),
                ),
                6,
            ).alias("mad_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
