"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``console_etl_spark``; each module
registers (name → query fn) and (name → ANSI-SQL oracle) pairs:
- navigation.py — the reference's Q1-Q5/T1 surface mapped onto fixtures
- relational.py — joins / aggregations / windows / set ops / top-k (X7)
- llmops/ — dedup (X1/X2), similarity (X3), text analysis (X4),
  multimodal (X5), JSON extraction (X6 in relational.py)
Entries without oracle SQL (LSH tiers, Pandas-UDF features) get the
driver's rows-only check by design — their exact twins are oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from console_etl_spark import graph, layout, navigation, relational, sqlapi
from console_etl_spark.llmops import (
    dedup,
    multimodal,
    pipeline,
    similarity,
    sketches,
    textan,
)

_MODULES = (
    navigation,
    relational,
    sqlapi,
    layout,
    graph,
    dedup,
    textan,
    similarity,
    multimodal,
    sketches,
    pipeline,
)

# The driver's correctness gate checks the FIRST 50 registered queries, so
# registration order is the coverage contract. Everything not listed here
# registers afterwards in module order and stays covered by the local
# parity suite (tests/test_oracle_parity.py).
# ROTATION POLICY (since r6, VERDICT r5 item 3): staleness-keyed. After
# five rounds every oracle-backed query has ≥1 driver row, so the window
# now re-proves the queries whose driver evidence is OLDEST, prioritizing
# any whose implementation changed since their last row. This round
# (fifth rotation): the 2 never-checked r6 VARIANT queries + all 42
# queries whose latest row is r1-r3 (they predate the r4 ANN tiling and
# r5 dtype-dispatch refactors) + chunk_documents_sliding and
# dq_violations_report (r5-checked but changed by the r6 boundary/NULL-FK
# fixes — changed code re-proves first) + 4 r4-checked queries the r5
# refactors touch (hypertable/gapfill sit on the events ts dtype path;
# shingle_jaccard and q2 are the two slowest headline kernels). The 46
# r5-checked, r6-untouched queries rotate out; next round the r4 bucket
# (21 remaining) is the stalest tier.
_PRIORITY = (
    # never driver-checked: the r6 VARIANT twins
    "events_props_variant",
    "nav_icon_variant",
    # r6-changed implementations (re-prove changed code first)
    "chunk_documents_sliding",
    "dq_violations_report",
    # stalest tier — latest driver row r1
    "events_sliding_windows",
    "q6_revenue_forecast",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q11_important_parts",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q22_idle_rich_customers",
    "range_join_price_bands",
    "setop_except_nations",
    "setop_intersect_nations",
    "top_customers_by_revenue",
    "window_order_gap_days",
    "window_rank_parts_by_price",
    "window_running_quantity",
    # latest driver row r2
    "agg_cube_orders",
    "agg_grouping_sets_orders",
    "anti_join_orderless_customers",
    "array_functions_embeddings",
    "date_functions_orders",
    "distinct_counts_lineitem",
    "events_hourly_stats",
    "semi_join_finished_customers",
    "setop_except_all_priorities",
    "setop_intersect_all_priorities",
    "setop_union_all_priorities",
    "topk_expensive_orders",
    "window_rank_functions_customers",
    "window_revenue_share_by_region",
    # latest driver row r3
    "dedup_content_hash_index",
    "fuzzy_part_name_pairs",
    "mix_corpus_weighted",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q13_customer_distribution",
    "q16_supplier_variety",
    "scalar_functions_showcase",
    "sql_correlated_scalar_subquery",
    "stats_aggregates_lineitem",
    "stratified_sample_docs",
    "unpivot_part_metrics",
    # r4-checked but refactor-adjacent (events ts dtype path; slowest
    # headline kernels)
    "hypertable_rollup_events",
    "gapfill_hourly_events",
    "dedup_shingle_jaccard",
    "q2_min_cost_supplier",
)


def _ordered(pairs: dict) -> dict:
    out = {n: pairs[n] for n in _PRIORITY if n in pairs}
    out.update(pairs)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the composed corpus
    curation pipeline (quality gate → normalized dedup → deterministic
    split → per-(split, lang) stats) — one Catalyst plan spanning the
    engine's text, dedup, and pipeline tiers. Driver checks rows>0."""
    return pipeline.curate_corpus_end_to_end(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return _ordered(out)
