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
# their last driver row, then oldest rows first. ROUND 8 (seventh
# rotation) ZEROES the never-checked backlog (VERDICT r7 item 1): after
# r7 drained all 43 never-checked oracle queries, 34 rows-only entries
# remained with no driver row ever. This window = the 11 NEW r8
# registrations (never-checked, oracle-backed, registered across five
# waves this round — each windowed same-round per VERDICT r7 item 8),
# then ALL 34 never-checked rows-only queries, then the 5 OLDEST
# oracle rows (driver-checked r1, stale for seven rounds, in
# registration order). A Spearman fusion was built, A/B-measured 8%
# slower, and reverted this round (BENCH_AB_r8.md) — its
# implementation is byte-equal to the r7-checked form (docstring-only
# diff), so it takes no changed-impl slot; the r8 Kruskal-Wallis
# wide-pivot rewrite (BENCH_AB_r8.md §4) landed while the query was
# already in this window, so its driver row checks the shipped form.
# After this round the never-checked backlog is 0 for the first time;
# 11 r1-stale rows remain for r9 (q15_top_supplier,
# q22_idle_rich_customers, q11_important_parts, plus the 8 displaced
# by same-round windowing: q9_profit_by_nation_year, q14_promo_revenue,
# range_join_price_bands, q7_volume_shipping, q8_market_share,
# setop_except_nations, events_sliding_windows,
# setop_intersect_nations), then r2 rows age in.
_PRIORITY = (
    # new r8 registrations, oracle-backed, never driver-checked (11)
    "asof_join_bounded_lookback",
    "sql_group_by_all_revenue",
    "sql_order_by_all_nation_summary",
    "stats_mannwhitney_u",
    "attribution_position_based",
    "stats_kruskal_wallis",
    "changepoint_cusum_daily_revenue",
    "attribution_time_decay",
    "anomaly_mad_daily_revenue",
    "path_top_trigrams_sessions",
    "repeat_purchase_intervals",
    # never driver-checked, rows-only (all 34): registration order
    "dedup_embedding_cosine_ann",
    "text_langid_heuristic",
    "bpe_train_merges",
    "bpe_segment_token_counts",
    "unigram_lm_vocab",
    "unigram_lm_token_counts",
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "ann_ivf_pq_topk",
    "ann_pq_topk",
    "embedding_pca_scree",
    "ann_opq_topk",
    "mm_feature_extract",
    "mm_image_features",
    "mm_png_features",
    "mm_svg_features",
    "mm_jpeg_features",
    "mm_jpeg_pixels",
    "mm_gif_features",
    "mm_wav_features",
    "mm_adpcm_features",
    "mm_mjpeg_video_features",
    "mm_mp4_features",
    "mm_image_phash",
    "dedup_image_phash_near",
    "sketch_cms_user_counts",
    "sketch_bloom_prejoin_orders",
    "sketch_mg_heavy_tokens",
    "sketch_kmv_user_overlap",
    "pack_sequences_ffd",
    "cluster_kmeans_embeddings",
    "cluster_kmeans_topic_mix",
    "semdedup_cluster_prune",
    # oldest driver rows (r1, 5 of 16): registration order
    # (q9/q14, range_join/q7/q8, setop_except/events_sliding, then
    # setop_intersect, displaced by the second- through fifth-wave
    # registrations — VERDICT r7 item 8 requires same-round windowing
    # for new queries; all eight keep their existing r1 driver rows,
    # so the never-checked backlog stays 0)
    "q6_revenue_forecast",
    "top_customers_by_revenue",
    "window_running_quantity",
    "window_order_gap_days",
    "window_rank_parts_by_price",
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
