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
# their last driver row, then oldest rows first. ROUND 11 (tenth
# rotation): the 16 NEW r11 registrations first (Benjamini-Hochberg FDR
# over the per-brand chi-square family — the multiple-comparisons
# capstone, VERDICT r10 item 3; the monthly purchase-cohort retention
# triangle with normalized rates; the Holt-Winters additive one-step
# backtest challenging the seasonal-naive champion; the Friedman rank
# test completing the nonparametric tier's repeated-measures slot; the
# Cochran-Armitage trend-in-proportions test; second wave: the
# Jarque-Bera normality gate from exact cent-integer moments and the
# cumulative-LTV-per-member curve on the purchase-cohort grid; third
# wave: the Durbin-Watson residual-autocorrelation diagnostic on the
# daily-revenue OLS and the empirical P10/P50/P90 prediction interval
# for the seasonal-naive forecast — all
# oracle-backed and windowed same-round per VERDICT r7 item 8), then
# fourth wave (completing the round's 16-registration pacing cap):
# McNemar's paired-binary test on first-half/second-half buying
# status; Pettitt's rank-based changepoint on the daily revenue
# series; Breusch-Pagan heteroscedasticity on the daily OLS;
# the view->purchase hourly cross-correlation function; the
# seasonal-naive accuracy scorecard (MAE/RMSE/MASE/Theil's U2);
# XYZ demand-variability classification completing the ABC-XYZ
# inventory matrix; Cohen's kappa between two document raters —
# then the 2 queries whose
# implementations CHANGED this round (attribution_markov_removal: the
# oracle SQL now interpolates MARKOV_ITERS; stats_ljung_box_hourly:
# localCheckpoint pin — changed-since-last-driver-row outranks
# staleness), then pure staleness draining: ALL 32 remaining r5 rows
# (registration order). No rows-only slots this round — all 50 are
# oracle value-hash checks. After this round the oldest remaining
# driver row is r6.
_PRIORITY = (
    # new r11 registrations, never driver-checked (16)
    "stats_bh_fdr_brand_chi2",
    "cohort_monthly_order_retention",
    "forecast_holt_winters_daily",
    "stats_friedman_qty_by_flag",
    "stats_cochran_armitage_trend",
    "stats_jarque_bera_price_by_flag",
    "cohort_revenue_ltv_curve",
    "stats_durbin_watson_daily",
    "forecast_naive_interval_daily",
    "stats_mcnemar_repeat_buyers",
    "changepoint_pettitt_daily",
    "stats_breusch_pagan_daily",
    "forecast_accuracy_scorecard_daily",
    "ccf_view_purchase_hourly",
    "xyz_demand_variability_parts",
    "eval_cohens_kappa_raters",
    # implementations changed since their r10 driver rows (2)
    "attribution_markov_removal",
    "stats_ljung_box_hourly",
    # r5 driver rows (all 32 remaining): registration order
    "scd2_customer_updates",
    "events_value_anomalies",
    "dq_violations_report",
    "cohort_weekly_retention",
    "funnel_signup_view_purchase",
    "pattern_rising_purchase_runs",
    "sql_correlated_exists",
    "sql_recursive_hierarchy",
    "sql_lateral_topk_per_nation",
    "dedup_exact_docs",
    "dedup_shingle_jaccard_ppjoin",
    "decontaminate_overlap_docs",
    "text_quality_scores",
    "text_lang_stats",
    "text_top_tokens",
    "text_top_bigrams",
    "text_winnowed_fingerprints",
    "text_fingerprints",
    "text_subword_token_counts",
    "text_unigram_perplexity",
    "text_tfidf_top_terms",
    "text_pii_scrub",
    "text_boilerplate_ngram_ratio",
    "text_bigram_perplexity",
    "ann_topk_cosine",
    "embedding_label_stats",
    "embedding_int8_quantize",
    "mm_binary_stats",
    "split_train_test_docs",
    "pack_sequences_by_lang",
    "curate_corpus_end_to_end",
    "chunk_documents_sliding",
    # WINDOW FULL at 50 (16 new + 2 changed + 32 r5).
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
