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
# ROTATION (VERDICT r3 item 4, third rotation): rounds 2-3 drove all 50
# slots green, so this round swaps 13 redundant already-driver-validated
# slots (second TPC-H shapes of covered join families q3/q5/q13/q16,
# scalar/stats/unpivot twins, sessionize, the content-hash/mix/stratified/
# fuzzy/correlated twins) for 13 oracle-backed queries that have never had
# a driver CORRECTNESS row — prioritizing every round-3 text operator,
# the PPJoin + normalized dedup twins, percentile/full-outer/range-join
# shapes, the stream-enrichment batch twin, and q4/q12/q17. Every SURVEY
# §2 family keeps ≥1 representative in-window; rotated-out queries remain
# covered by the local dtype-strict parity suite.
_PRIORITY = (
    # reference navigation surface (Q1-Q5, T1)
    "nav_list_packages",
    "nav_list_schemas",
    "nav_list_objects",
    "nav_point_lookup",
    "nav_derived_partition_key",
    "nav_icon_extraction",
    # joins + TPC-H shapes (q4/q12/q17 newly in-window this round)
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q20_dominant_part_suppliers",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q19_disjunctive_join",
    "q4_late_order_priority",
    "q12_returnflag_priority_counts",
    "q17_small_quantity_revenue",
    # join variants (range + full-outer newly in-window)
    "asof_join_purchase_view",
    "range_join_purchase_after_signup",
    "fullouter_nation_counts",
    # aggregations (percentile newly in-window)
    "agg_rollup_returns",
    "pivot_priority_by_status",
    "listagg_suppliers_by_nation",
    "percentile_price_by_flag",
    # windows
    "window_topk_orders_per_customer",
    # set ops
    "setop_union_nations",
    # scalar + complex-type functions
    "map_functions_orders",
    # events tier (X6 JSON extraction, gap-fill, rollup, and the
    # stream-enrichment batch twin — newly in-window)
    "events_json_extract",
    "hypertable_rollup_events",
    "gapfill_hourly_events",
    "events_user_enriched_stats",
    # SQL front door
    "sql_lateral_topk_per_nation",
    # X1/X2 dedup tier (PPJoin + normalized-groups newly in-window)
    "dedup_exact_docs",
    "dedup_shingle_jaccard",
    "dedup_shingle_jaccard_ppjoin",
    "dedup_normalized_groups",
    "dedup_connected_groups",
    "dedup_embedding_cosine",
    "decontaminate_overlap_docs",
    # X3 similarity
    "embedding_near_pairs",
    "ann_topk_cosine",
    # X4 text analysis (all four round-3 operators newly in-window)
    "text_lang_stats",
    "text_source_token_counts",
    "text_repetition_stats",
    "text_winnowed_fingerprints",
    "text_partial_overlap_pairs",
    "text_unigram_perplexity",
    "text_tfidf_top_terms",
    # X5 multimodal
    "mm_binary_stats",
    # pipeline tier + flagship
    "split_train_test_docs",
    "pack_sequences_by_lang",
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
