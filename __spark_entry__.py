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
# their last driver row, then oldest rows first. ROUND 7 (sixth
# rotation) is the BACKLOG DRAIN (VERDICT r6 item 1): round 6 registered
# more oracle queries than the window holds, leaving 84 of 252 with no
# driver row ever (43 oracle-backed + 41 rows-only; computed from the
# CORRECTNESS_r01-r06 union, not from memory). This window = ALL 43
# never-checked oracle-backed queries in registration order, then the 7
# OLDEST never-checked rows-only queries — oracle evidence (value-hash)
# outranks rows-only evidence, so rows-only queries take window slots
# only once every never-checked oracle query has one. After this round
# the never-checked backlog is the 34 rows-only entries listed below;
# new registrations are paced so backlog + new <= 50 (window capacity).
_PRIORITY = (
    # never driver-checked, oracle-backed (43): registration order
    "dedup_events_debounce",
    "fuzzy_blocked_name_pairs",
    "scd2_point_in_time_join",
    "profile_fd_violations",
    "profile_value_shapes",
    "weighted_median_price_by_flag",
    "division_customers_all_priorities",
    "mad_price_by_flag",
    "stats_spearman_qty_price",
    "retention_dau_wau_stickiness",
    "abc_pareto_parts",
    "control_chart_xmr_user_value",
    "allocation_hamilton_quota",
    "hhi_supplier_concentration",
    "orders_skyline_price_date",
    "ldiversity_customer_audit",
    "events_out_of_order_audit",
    "smape_seasonal_backtest",
    "survival_user_retention_km",
    "gini_revenue_concentration",
    "dedup_shingle_containment",
    "dedup_cross_source_matrix",
    "dedup_degree_histogram",
    "dedup_threshold_sweep",
    "calibration_diversity_vs_canonical",
    "text_zipf_fit",
    "text_keyword_rake",
    "text_heaps_law_fit",
    "text_trigram_novelty",
    "text_bm25_topk",
    "text_next_token_table",
    "word2vec_sampling_tables",
    "embedding_matryoshka_topk",
    "contrastive_hard_negatives",
    "curate_token_budget",
    "dsir_importance_weights",
    "mix_temperature_weights",
    "split_leakage_safe",
    "eval_auc_doc_length",
    "eval_gains_deciles",
    "eval_calibration_bins",
    "eval_woe_iv_doc_length",
    "eval_pr_curve_points",
    # never driver-checked, rows-only (7 oldest): the driver records
    # its weaker rows>0 check for these — still their first evidence
    "events_props_schema_census",
    "approx_percentile_price",
    "approx_ndv_users_incremental",
    "sliding_distinct_users_hourly",
    "graph_pagerank_trade",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # WINDOW FULL at 50. Remaining never-checked backlog (34, all
    # rows-only, first in line for the r8 rotation):
    # dedup_embedding_cosine_ann, text_langid_heuristic,
    # bpe_train_merges, bpe_segment_token_counts, unigram_lm_vocab,
    # unigram_lm_token_counts, ann_lsh_bucketed, ann_lsh_multiprobe,
    # ann_ivf_topk, ann_ivf_pq_topk, ann_pq_topk, embedding_pca_scree,
    # ann_opq_topk, mm_feature_extract, mm_image_features,
    # mm_png_features, mm_svg_features, mm_jpeg_features,
    # mm_jpeg_pixels, mm_gif_features, mm_wav_features,
    # mm_adpcm_features, mm_mjpeg_video_features, mm_mp4_features,
    # mm_image_phash, dedup_image_phash_near, sketch_cms_user_counts,
    # sketch_bloom_prejoin_orders, sketch_mg_heavy_tokens,
    # sketch_kmv_user_overlap, pack_sequences_ffd,
    # cluster_kmeans_embeddings, cluster_kmeans_topic_mix,
    # semdedup_cluster_prune.
    # Behind them: r7-changed implementations, then oldest driver rows,
    # re-registering in module order as before.
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
