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
# their last driver row, then oldest rows first. ROUND 13 (twelfth
# rotation): the 5 NEW r13 registrations first (the SES alpha-grid
# backtest and the theta-method backtest — the state-space forecast
# siblings VERDICT r12 item 3 asked for, both scored against the
# seasonal-naive champion on the shared t >= 8 window; seasonal/trend
# strength via classical decomposition; the Cramer-von Mises two-sample
# test completing the KS/Mann-Whitney nonparametric shelf; first-order
# partial correlation controlling discount — all oracle-backed,
# numpy/pandas replica laws pinned, windowed same-round). The r12
# streaming item also landed (stream_croston_intermittent, streaming.py:
# stream==batch bit-exact + replay/restart laws) but streaming twins are
# pytest-tier, not window slots. tools_staleness.py (now law-aware for
# rows-only queries — VERDICT r12 item 7, and since this round a
# same-file CLOSURE fingerprint that also sees shared-helper and
# module-constant edits, and across in-repo imports) reports 26
# changed-code queries at HEAD: retention_dau_wau_stickiness (the
# (user,day) pin from the sf1 A/B) plus 25 the closure rule surfaced
# whose helpers changed after their rows (7 of them sit in the r6
# tier below and were already windowed; the other 19 form the changed
# tier). A second r13 wave added the ordered-alternative
# Jonckheere-Terpstra test, the Ansari-Bradley scale test, and the
# damped-Holt shelf member. Changed-code outranks pure staleness, so
# the r7 drain takes the 8 oldest rows and the rest lead r14. 38
# oracle value-hash slots + 12 rows-only-by-design slots (the
# ANN/PQ/OPQ tiers, both k-means queries, the cosine-ANN dedup,
# SemDeDup, the schema census, the two approx-sketch tiers, the
# sliding HLL — each with an oracle-checked exact twin or a pinned
# law suite).
_PRIORITY = (
    # new r13 registrations, never driver-checked (8; two waves)
    "forecast_ses_alpha_grid_daily",
    "forecast_theta_daily",
    "stats_seasonal_strength_daily",
    "stats_cvm_two_sample",
    "stats_partial_corr_lineitem",
    "stats_jonckheere_terpstra",
    "stats_ansari_bradley",
    "forecast_holt_damped_daily",
    # r6 driver rows (all 15 remaining; oldest evidence in the fleet)
    "psi_totalprice_drift",
    "jsd_event_type_weekend",
    "assoc_part_pairs_lift",
    "markov_event_transitions",
    "kanonymity_customer_audit",
    "text_source_token_entropy",
    "conversion_time_percentiles",
    "sql_parameterized_topn",
    "graph_bfs_hop_histogram",
    "dedup_cross_doc_segments",
    "dedup_keep_best_quality",
    "text_lang_source_mi",
    "text_pmi_collocations",
    "text_readability_scores",
    "enumerate_docs_global",
    # changed since last driver row (19 — tools_staleness.py's new
    # CLOSURE fingerprint, same-file helpers/constants AND in-repo
    # cross-module imports: retention's (user,day) pin from the sf1
    # A/B, plus 18 queries whose shared helpers changed after their
    # rows with no verdict ever flagging them — the r12 k-means
    # partial-sort fix alone had silently staled the two cluster
    # queries and the ANN tiers riding the same seeding helpers; the
    # kernel/session-helper consumers (spearman, eval AUC/PR, heaps,
    # abc, approx-NDV) surfaced only once imports were closed over)
    "retention_dau_wau_stickiness",
    "ann_ivf_pq_topk",
    "ann_lsh_bucketed",
    "ann_opq_topk",
    "ann_pq_topk",
    "cluster_kmeans_embeddings",
    "cluster_kmeans_topic_mix",
    "curate_token_budget",
    "dedup_connected_groups",
    "dedup_cross_source_matrix",
    "dedup_degree_histogram",
    "dedup_embedding_cosine_ann",
    "semdedup_cluster_prune",
    "abc_pareto_parts",
    "approx_ndv_users_incremental",
    "eval_auc_doc_length",
    "eval_pr_curve_points",
    "stats_spearman_qty_price",
    "text_heaps_law_fit",
    # r7 driver rows (8 oldest pure-staleness, registration order;
    # the rest lead r14)
    "events_props_schema_census",
    "dedup_events_debounce",
    "fuzzy_blocked_name_pairs",
    "approx_percentile_price",
    "scd2_point_in_time_join",
    "profile_fd_violations",
    "profile_value_shapes",
    "sliding_distinct_users_hourly",
    # WINDOW FULL at 50 (8 new + 19 changed + 15 r6 + 8 r7).
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
