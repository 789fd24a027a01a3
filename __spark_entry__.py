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
# their last driver row, then oldest rows first. This round (fifth
# rotation, updated as round-6 waves landed): round 6 registered 51 new
# oracle-backed queries across fifteen waves, none of which has a driver
# row yet — the window is filled entirely by the 50 oldest of them (the
# 51st, events_out_of_order_audit, leads the next rotation, followed by
# the later-wave never-checked queries: the order-statistics tier —
# spearman/dau-wau/abc/xmr/hamilton/hhi/skyline/smape/km/gini —, the
# text-diagnostics tier — zipf/rake/heaps/trigram-novelty —, the eval
# tier, weighted-median/division/mad, scd2_point_in_time_join, and the
# round-6 retrieval/data-selection waves: text_bm25_topk,
# curate_token_budget, embedding_matryoshka_topk,
# contrastive_hard_negatives, dsir_importance_weights,
# mix_temperature_weights, split_leakage_safe,
# ldiversity_customer_audit, fuzzy_blocked_name_pairs,
# text_next_token_table, dedup_cross_source_matrix,
# word2vec_sampling_tables, dedup_degree_histogram). Everything
# with an existing driver row (r5's 50/50 pass plus the r1-r4 evidence)
# waits behind the never-checked tier per policy; the local parity suite
# keeps covering all of it every round.
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
    # convert percentiles, RFM quintile segmentation)
    "conversion_time_percentiles",
    "rfm_customer_segments",
    # WINDOW FULL at 50. Still never-driver-checked and first in line
    # for the next rotation: events_out_of_order_audit (fifteenth wave,
    # 51st registrant), the sixteenth wave (smape_seasonal_backtest,
    # survival_user_retention_km, gini_revenue_concentration), the
    # seventeenth (calibration_diversity_vs_canonical), eighteenth
    # (dedup_shingle_containment, text_zipf_fit), nineteenth
    # (eval_auc_doc_length, eval_gains_deciles, eval_calibration_bins),
    # twentieth (profile_fd_violations, profile_value_shapes),
    # twenty-first (dedup_events_debounce), twenty-second
    # (text_keyword_rake), twenty-third (eval_woe_iv_doc_length),
    # twenty-fourth (stats_spearman_qty_price), twenty-fifth
    # (eval_pr_curve_points), twenty-sixth (text_heaps_law_fit),
    # twenty-seventh (orders_skyline_price_date), twenty-eighth
    # (hhi_supplier_concentration), twenty-ninth
    # (allocation_hamilton_quota), thirtieth
    # (control_chart_xmr_user_value), thirty-first
    # (text_trigram_novelty), and thirty-fifth
    # (abc_pareto_parts; thirty-second through thirty-fourth are the
    # streaming OHLC twin and the rows-only pHash tier), thirty-sixth
    # (retention_dau_wau_stickiness), and thirty-seventh
    # (scd2_point_in_time_join).
    # Rotated out behind it: the 3 r6-changed
    # implementations (chunk_documents_sliding, dq_violations_report,
    # text_bigram_perplexity — all hold green r5 driver rows) and the
    # r1-stale tier (events_sliding_windows, q6-q22 singles,
    # range_join_price_bands, setops, top_customers, window_* — r1
    # rows, unchanged code), which re-register in module order.
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
