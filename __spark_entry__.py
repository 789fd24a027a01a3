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
# ROTATION POLICY (since r6, VERDICT r5 item 3): staleness-keyed --
# never-driver-checked queries first, then implementations changed since
# their last driver row, then oldest rows first. ROUND 14 (thirteenth
# rotation): the 8 NEW r14 registrations first (the AR(2) Yule-Walker
# one-step backtest carrying the shelf's first significance number -- the
# Diebold-Mariano statistic vs the seasonal-naive champion; pinball-loss
# scoring of the P10/P90 interval forecast on an honest calibration/
# holdout time split; the random-walk-with-drift bake-off floor; Mood's
# median test, the Cox-Stuart sign trend, Grubbs' outlier statistic, and
# the weekly-block pair Page's L / Kendall's W -- all oracle-backed,
# python/numpy replica laws in TestRound14Laws, windowed same-round).
# tools_staleness.py (closure-aware) reports ZERO stale-against-HEAD and
# zero unresolvable at the rotation point -- the r13 window drained the
# entire changed tier -- so the remaining 42 slots drain pure staleness:
# every remaining r7-vintage driver row and the oldest r8 rows, in
# registration order within equal rounds (one late swap: the r14 sf1
# A/B changed text_pmi_collocations to pin its tokenized relation, and
# changed-code outranks pure staleness, so it takes the final slot).
# 47 oracle value-hash slots +
# 3 rows-only-by-design slots (PageRank's iterative fixpoint and the
# MinHash-LSH / SimHash banded tiers -- each law-pinned with an
# oracle-checked exact twin).
_PRIORITY = (
    # new r14 registrations, never driver-checked (8)
    "forecast_ar2_daily",
    "forecast_pinball_interval_daily",
    "forecast_drift_daily",
    "stats_mood_median_weekend",
    "stats_cox_stuart_trend_daily",
    "stats_grubbs_outlier_daily",
    "stats_page_trend_dow",
    "stats_kendalls_w_dow",
    # r7 driver rows (the remaining 34 -- after this window the oldest
    # driver evidence anywhere in the fleet is r8)
    "weighted_median_price_by_flag",
    "division_customers_all_priorities",
    "mad_price_by_flag",
    "control_chart_xmr_user_value",
    "allocation_hamilton_quota",
    "hhi_supplier_concentration",
    "orders_skyline_price_date",
    "ldiversity_customer_audit",
    "events_out_of_order_audit",
    "smape_seasonal_backtest",
    "survival_user_retention_km",
    "gini_revenue_concentration",
    "graph_pagerank_trade",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_shingle_containment",
    "dedup_threshold_sweep",
    "calibration_diversity_vs_canonical",
    "text_zipf_fit",
    "text_keyword_rake",
    "text_trigram_novelty",
    "text_bm25_topk",
    "text_next_token_table",
    "word2vec_sampling_tables",
    "embedding_matryoshka_topk",
    "contrastive_hard_negatives",
    "mix_temperature_weights",
    "eval_gains_deciles",
    "eval_calibration_bins",
    "eval_woe_iv_doc_length",
    "q6_revenue_forecast",
    "top_customers_by_revenue",
    "window_running_quantity",
    "window_order_gap_days",
    # changed since last driver row (1): the r14 sf1 A/B shipped the
    # tokenized-relation pin in text_pmi_collocations (BENCH_AB_r14);
    # changed-code outranks pure staleness, so it takes the slot the
    # 8th-oldest r8 row (anomaly_mad_daily_revenue) would have had
    "text_pmi_collocations",
    # r8 driver rows (the 7 oldest, registration order)
    "window_rank_parts_by_price",
    "asof_join_bounded_lookback",
    "stats_mannwhitney_u",
    "attribution_position_based",
    "stats_kruskal_wallis",
    "changepoint_cusum_daily_revenue",
    "attribution_time_decay",
    # WINDOW FULL at 50 (8 new + 34 r7 + 1 changed + 7 r8).
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
