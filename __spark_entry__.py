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
    clustering,
    dedup,
    modeleval,
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
    clustering,
    modeleval,
)

# The driver's correctness gate checks the FIRST 50 registered queries, so
# registration order is the coverage contract. Everything not listed here
# registers afterwards in module order and stays covered by the local
# parity suite (tests/test_oracle_parity.py).
# ROTATION POLICY (since r6, VERDICT r5 item 3): staleness-keyed —
# never-driver-checked queries first, then implementations changed since
# their last driver row, then oldest rows first. ROUND 10 (ninth
# rotation): the 7 NEW r10 registrations first (Markov removal-effect
# attribution — the quartet's data-driven capstone; the hourly
# seasonal decomposition companion to the seasonal-naive backtest;
# the Wilcoxon signed-rank PAIRED test completing the nonparametric
# stats tier; Mann-Kendall + Theil-Sen completing the robust
# series-trend tier; the price-volume-mix revenue bridge; the
# Wald-Wolfowitz runs test, MK's randomness sibling; the Ljung-Box
# portmanteau completing the autocorrelation toolset — all
# oracle-backed and windowed same-round per VERDICT r7 item 8), then
# topk_movers_mom (implementation CHANGED this round to fix its r9
# hash_match:false row — integer month arithmetic + DOUBLE money
# outputs; changed-since-last-driver-row outranks staleness), then
# pure staleness draining: ALL 24 remaining r4 rows and the 18 OLDEST
# r5 rows (registration order). No rows-only slots this round — all
# 50 are oracle value-hash checks. After this round the oldest
# remaining driver row is r5.
_PRIORITY = (
    # new r10 registrations, never driver-checked (7)
    "attribution_markov_removal",
    "seasonal_decompose_hourly",
    "stats_wilcoxon_signed_rank",
    "trend_mann_kendall_theil_sen",
    "pvm_revenue_bridge_by_brand",
    "stats_runs_test_daily_revenue",
    "stats_ljung_box_hourly",
    # implementation changed since its (failing) r9 driver row
    "topk_movers_mom",
    # r4 driver rows (all 24 remaining): registration order
    "nav_list_schemas",
    "nav_list_objects",
    "nav_derived_partition_key",
    "agg_rollup_returns",
    "pivot_priority_by_status",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "map_functions_orders",
    "hypertable_rollup_events",
    "gapfill_hourly_events",
    "q4_late_order_priority",
    "q12_returnflag_priority_counts",
    "q2_min_cost_supplier",
    "q20_dominant_part_suppliers",
    "listagg_suppliers_by_nation",
    "dedup_normalized_groups",
    "dedup_shingle_jaccard",
    "dedup_connected_groups",
    "dedup_embedding_cosine",
    "text_source_token_counts",
    "text_repetition_stats",
    "text_partial_overlap_pairs",
    "embedding_near_pairs",
    # oldest r5 driver rows (18 of 50): registration order
    "nav_point_lookup",
    "nav_icon_extraction",
    "q1_pricing_summary",
    "window_topk_orders_per_customer",
    "setop_union_nations",
    "events_json_extract",
    "asof_join_purchase_view",
    "range_join_purchase_after_signup",
    "events_user_enriched_stats",
    "sessionize_events",
    "q19_disjunctive_join",
    "q21_sole_supplier_orders",
    "histogram_order_totalprice",
    "window_trailing_hour_value",
    "agg_filtered_counts_orders",
    "fullouter_nation_counts",
    "percentile_price_by_flag",
    "window_value_functions_orders",
    # WINDOW FULL at 50.
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
