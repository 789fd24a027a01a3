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
)

# The driver's correctness gate checks the FIRST 50 registered queries, so
# registration order is the coverage contract. Everything not listed here
# registers afterwards in module order and stays covered by the local
# parity suite (tests/test_oracle_parity.py).
# ROTATION POLICY (since r6, VERDICT r5 item 3): staleness-keyed —
# never-driver-checked queries first, then implementations changed since
# their last driver row, then oldest rows first. This round (fifth
# rotation): the 9 never-checked r6 queries (2 VARIANT twins + 7 new
# operators: segment dedup, z-order, incremental MV, native
# session_window, k-per-group sampling, equi-depth histogram, entity
# resolution) + 3 r6-changed implementations (chunking + DQ fixes,
# bigram-perplexity arrays_zip rewrite) + the 38 stalest r1-r3 rows
# that fit. Rotated out to make room: the 4 r4-checked refactor-adjacent
# extras (hypertable/gapfill/shingle/q2 — all have r4 rows and unchanged
# code) and the 4 least-stale r3 rows (content_hash, fuzzy — whose edge
# kernel er_part_name_clusters re-proves transitively — mix_corpus,
# scalar_functions). Next round: the remaining r3 + r4 buckets.
_PRIORITY = (
    # never driver-checked: r6 VARIANT twins + r6 operators
    "events_props_variant",
    "nav_icon_variant",
    "dedup_cross_doc_segments",
    "zorder_interleaved_keys",
    "mv_incremental_orders_stats",
    "sessionize_events_native",
    "sample_k_per_group_docs",
    "histogram_equidepth_prices",
    "er_part_name_clusters",
    # never driver-checked: r6 third-wave oracle queries
    "weighted_sample_docs",
    "gapfill_interpolate_hourly",
    "window_rolling_corr_qty_price",
    "profile_column_stats_orders",
    "profile_key_candidates",
    "sql_parameterized_topn",
    # never driver-checked: r6 fourth-wave oracle queries (regression
    # aggregates, deterministic mode, gaps-and-islands, triangle census,
    # distributed global enumeration)
    "regression_price_on_qty_by_flag",
    "mode_event_type_by_user",
    "islands_user_active_hours",
    "graph_triangle_parts_basket",
    "enumerate_docs_global",
    # never driver-checked: r6 fifth-wave oracle queries (quality-aware
    # dedup survivor, curation funnel, lang x source association, skew
    # diagnosis)
    "dedup_keep_best_quality",
    "curation_funnel_report",
    "text_lang_source_mi",
    "skew_report_lineitem_partkey",
    # never driver-checked: r6 sixth-wave oracle queries (time-weighted
    # average, OHLC bars, deterministic-hash-sample AQP)
    "twap_value_by_user",
    "ohlc_hourly_value",
    "aqp_revenue_estimate",
    # never driver-checked: r6 seventh-wave oracle queries (nearest
    # as-of, winsorized stats, Benford audit, Poisson bootstrap CI)
    "asof_join_nearest_view",
    "winsorized_price_stats",
    "benford_totalprice_audit",
    "bootstrap_revenue_ci",
    # never driver-checked: r6 eighth-wave oracle queries (hypothesis
    # testing: chi-square independence, Welch t-test, binned two-sample
    # KS, one-pass pairwise correlation matrix)
    "stats_chi2_independence",
    "stats_welch_ttest",
    "stats_ks_two_sample",
    "stats_corr_matrix_lineitem",
    # never driver-checked: r6 ninth-wave oracle queries (frontier BFS
    # vs recursive-CTE oracle; interval-overlap session concurrency)
    "graph_bfs_hop_histogram",
    "overlap_sessions_per_hour",
    # never driver-checked: r6 tenth-wave oracle queries (trailing EWMA
    # with exact rational weights; hourly-series autocorrelation)
    "ewma_trailing_user_value",
    "acf_hourly_event_counts",
    # never driver-checked: r6 eleventh-wave oracle queries (PMI
    # collocations, Flesch readability)
    "text_pmi_collocations",
    "text_readability_scores",
    # never driver-checked: r6 twelfth-wave oracle queries (PSI cohort
    # drift, Jensen-Shannon event-mix divergence)
    "psi_totalprice_drift",
    "jsd_event_type_weekend",
    # never driver-checked: r6 thirteenth-wave oracle queries (basket
    # association rules by lift, Markov event-transition matrix)
    "assoc_part_pairs_lift",
    "markov_event_transitions",
    # never driver-checked: r6 fourteenth-wave oracle queries
    # (k-anonymity audit, per-source token entropy, last-touch
    # attribution)
    "kanonymity_customer_audit",
    "text_source_token_entropy",
    "attribution_last_touch",
    # never driver-checked: r6 fifteenth-wave oracle queries (time-to-
    # convert percentiles, RFM quintile segmentation, out-of-order
    # ingest audit)
    "conversion_time_percentiles",
    "rfm_customer_segments",
    "events_out_of_order_audit",
    # r6-changed implementations (re-prove changed code first)
    "chunk_documents_sliding",
    "dq_violations_report",
    "text_bigram_perplexity",
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
    # top_customers_by_revenue / window_order_gap_days /
    # window_rank_parts_by_price / window_running_quantity sit past slot
    # 50 now that the eighth-wave stats queries (never-checked) joined
    # the window — they stay r1-stale for the next rotation.
    "top_customers_by_revenue",
    "window_order_gap_days",
    "window_rank_parts_by_price",
    "window_running_quantity",
    # Rotated out for the fourth..seventh-wave never-checked queries
    # above (never-checked outranks stale): the three ALL-variant setops
    # (their *_nations twins hold r1 slots in this window and the code
    # is shared), the two r3 TPC-H rows q3/q5, and the whole r2 bucket
    # (agg_cube, agg_grouping_sets, array_functions, date_functions,
    # events_hourly_stats, topk_expensive, window_rank_functions,
    # anti_join_orderless, distinct_counts, semi_join_finished,
    # window_revenue_share) — all next round's first stale bucket.
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
