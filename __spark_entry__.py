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

from console_etl_spark import navigation, relational, sqlapi
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
    dedup,
    textan,
    similarity,
    multimodal,
    sketches,
    pipeline,
)

# The driver's correctness gate checks the FIRST 50 registered queries, so
# registration order is the coverage contract: front-load one (or more)
# oracle-backed representative of every SURVEY.md §2.1/§2.3 family and keep
# rows-only entries (guaranteed `no_oracle`) out of the window. Everything
# not listed here registers afterwards in module order and stays covered by
# the local parity suite (tests/test_oracle_parity.py).
# ROTATION (VERDICT r4 items 4-5, fourth rotation): cumulatively 94 of the
# 109 oracle-backed queries now have at least one driver CORRECTNESS row.
# This round windows ALL 16 never-checked queries (the four new r4 ops —
# pii_scrub / boilerplate / SCD2 / anomalies — plus the q21/histogram/
# FILTER/value-window/correlated-EXISTS/text-law/embedding-stats tier)
# plus sessionize_events, which broke unwatched when the fixture ts dtype
# changed (VERDICT r4 item 5) and needs a driver row proving the
# TIMESTAMP_NTZ fix; window_trailing_hour_value (same regression) is in
# the never-checked set already. The 6 operators BUILT this round (DQ
# gate, cohort, funnel, bigram perplexity, int8 quantization, chunking)
# are also windowed — new code is exactly what the driver should watch.
# Dropped to make room: 4 nav twins (keep point-lookup + icon, the two
# nontrivial shapes), 7 of 9 TPC-H (keep q1 + q19), 4 dedup twins (keep
# exact + ppjoin), gapfill, rollup/pivot/listagg agg twins (filtered/
# histogram/percentile keep the family), map_functions (json keeps the
# scalar family), near-pairs (ann_topk + int8 keep X3), partial-overlap
# (winnowed keeps the fingerprint family) — all multi-round driver-green
# and still covered by the local dtype-strict parity suite
# (tests/test_oracle_parity.py). Every SURVEY §2 family keeps ≥1
# representative in-window; 23 first-time slots this round.
_PRIORITY = (
    # reference navigation surface (point lookup + nested icon extraction)
    "nav_point_lookup",
    "nav_icon_extraction",
    # TPC-H representatives (aggregation + disjunctive join shapes)
    "q1_pricing_summary",
    "q19_disjunctive_join",
    "q21_sole_supplier_orders",
    # join variants
    "asof_join_purchase_view",
    "range_join_purchase_after_signup",
    "fullouter_nation_counts",
    # aggregations (FILTER-clause + histogram newly in-window)
    "agg_filtered_counts_orders",
    "dq_violations_report",
    "histogram_order_totalprice",
    "percentile_price_by_flag",
    # windows (trailing-hour RANGE frame + value functions newly in-window;
    # sessionize re-windowed after the TIMESTAMP_NTZ fix)
    "window_topk_orders_per_customer",
    "window_trailing_hour_value",
    "window_value_functions_orders",
    "sessionize_events",
    "cohort_weekly_retention",
    "funnel_signup_view_purchase",
    "pattern_rising_purchase_runs",
    # set ops
    "setop_union_nations",
    # events tier (X6 JSON extraction, rollup, enrichment, SCD2 + anomaly
    # detection newly in-window)
    "events_json_extract",
    "events_user_enriched_stats",
    "scd2_customer_updates",
    "events_value_anomalies",
    # SQL front door (correlated EXISTS + recursive CTE newly in-window)
    "sql_lateral_topk_per_nation",
    "sql_correlated_exists",
    "sql_recursive_hierarchy",
    # X1/X2 dedup tier representatives
    "dedup_exact_docs",
    "dedup_shingle_jaccard_ppjoin",
    "decontaminate_overlap_docs",
    # X3 similarity (+ embedding label stats newly in-window)
    "ann_topk_cosine",
    "embedding_int8_quantize",
    "embedding_label_stats",
    # X4 text analysis (7 never-checked ops newly in-window)
    "text_lang_stats",
    "text_quality_scores",
    "text_top_tokens",
    "text_top_bigrams",
    "text_fingerprints",
    "text_subword_token_counts",
    "text_pii_scrub",
    "text_boilerplate_ngram_ratio",
    "text_winnowed_fingerprints",
    "text_unigram_perplexity",
    "text_bigram_perplexity",
    "text_tfidf_top_terms",
    # X5 multimodal
    "mm_binary_stats",
    # pipeline tier + flagship
    "split_train_test_docs",
    "pack_sequences_by_lang",
    "chunk_documents_sliding",
    "curate_corpus_end_to_end",
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
