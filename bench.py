#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its FULL plan into the noop sink (count() could let
Catalyst prune work; noop writes every result row).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from console_etl_spark.session import get_spark, release_pins

# Headline set: one per operator family (scan-agg, star join, semi/HAVING
# join, disjunctive join, as-of join, window decorrelation, top-k,
# windows, sessionization, JSON, dedup exact+LSH+jaccard, similarity
# exact+ANN, text analysis, decontamination, split/pack pipeline ops).
HEADLINE = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q6_revenue_forecast",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "q13_customer_distribution",
    "q16_supplier_variety",
    "q18_large_volume_customers",
    "q19_disjunctive_join",
    "asof_join_purchase_view",
    "hypertable_rollup_events",
    "window_topk_orders_per_customer",
    "events_hourly_stats",
    "events_json_extract",
    "sessionize_events",
    "dedup_exact_docs",
    "dedup_shingle_jaccard",
    "dedup_minhash_lsh",
    "embedding_near_pairs",
    "ann_topk_cosine",
    "text_top_tokens",
    "text_quality_scores",
    "decontaminate_overlap_docs",
    "split_train_test_docs",
    "pack_sequences_by_lang",
    "curate_corpus_end_to_end",
    # round-5 additions (new keys — round-over-round totals compare on
    # matching min keys, so extending the suite is safe):
    "text_bigram_perplexity",
    "embedding_int8_quantize",
    "dq_violations_report",
    # round-6 additions (segment dedup, z-order keys, incremental MV,
    # native session_window):
    "dedup_cross_doc_segments",
    "zorder_interleaved_keys",
    "mv_incremental_orders_stats",
    "sessionize_events_native",
    # round-6 late-wave additions (stats tier, EWMA window kernel,
    # basket self-join, interval-overlap explode, FFD packing):
    "stats_corr_matrix_lineitem",
    "ewma_trailing_user_value",
    "assoc_part_pairs_lift",
    "overlap_sessions_per_hour",
    "pack_sequences_ffd",
    # round-6 resume additions (order-statistics kernels at sf0.1:
    # prefix-scan AUC, double prefix-scan Spearman, ABC prefix cumsum,
    # map-side debounce):
    "eval_auc_doc_length",
    "stats_spearman_qty_price",
    "abc_pareto_parts",
    "dedup_events_debounce",
    # round-6 retrieval/data-selection wave (BM25 broadcast-stats scan,
    # prefix-scan budget cut, 16-dim matryoshka GEMM, label-masked
    # hard negatives, vocab-join DSIR, constant-size temperature mix):
    "text_bm25_topk",
    "curate_token_budget",
    "embedding_matryoshka_topk",
    "contrastive_hard_negatives",
    "dsir_importance_weights",
    "mix_temperature_weights",
    # round-8 addition (bounded-lookback as-of — the streamable horizon
    # variant; the unbounded as-of is already in the core suite):
    "asof_join_bounded_lookback",
    # round-8 second/third waves (rank-test prefix scans, journey
    # attribution user-window kernels, calendar-bounded CUSUM argmax):
    "stats_mannwhitney_u",
    "stats_kruskal_wallis",
    "attribution_position_based",
    "attribution_time_decay",
    "changepoint_cusum_daily_revenue",
    # round-9 additions (attribution quartet completion, parametric
    # stats tier, bounded-grid Kendall, KLL quantile partials):
    "attribution_first_touch",
    "attribution_linear",
    "stats_anova_f",
    "stats_kendall_tau",
    "stats_levene_bf",
    "sketch_kll_price_quantiles",
    # round-9 second wave (growth analytics + proportions test + MP3
    # frame-stream metadata):
    "growth_accounting_weekly",
    "stats_two_proportion_ztest",
    "topk_movers_mom",
    "mm_mp3_features",
    "mm_aac_features",
    # round-10 additions (Markov removal-effect attribution capstone,
    # additive seasonal decomposition, Wilcoxon signed-rank,
    # Mann-Kendall + Theil-Sen trend pair, price-volume-mix bridge,
    # Wald-Wolfowitz runs test, Ljung-Box portmanteau):
    "attribution_markov_removal",
    "seasonal_decompose_hourly",
    "stats_wilcoxon_signed_rank",
    "trend_mann_kendall_theil_sen",
    "pvm_revenue_bridge_by_brand",
    "stats_runs_test_daily_revenue",
    "stats_ljung_box_hourly",
    # round-11 additions (BH-FDR multiple-comparisons capstone, monthly
    # purchase-cohort triangle, Holt-Winters backtest, Friedman rank
    # test, Cochran-Armitage trend, Jarque-Bera normality gate,
    # cumulative-LTV curve, Durbin-Watson diagnostic, seasonal-naive
    # prediction interval):
    "stats_bh_fdr_brand_chi2",
    "cohort_monthly_order_retention",
    "forecast_holt_winters_daily",
    "stats_friedman_qty_by_flag",
    "stats_cochran_armitage_trend",
    "stats_jarque_bera_price_by_flag",
    "cohort_revenue_ltv_curve",
    "stats_durbin_watson_daily",
    "forecast_naive_interval_daily",
    # round-11 fourth wave (McNemar paired-binary, Pettitt rank
    # changepoint, Breusch-Pagan heteroscedasticity, seasonal-naive
    # accuracy scorecard, view->purchase hourly CCF, XYZ demand
    # variability, Cohen's kappa):
    "stats_mcnemar_repeat_buyers",
    "changepoint_pettitt_daily",
    "stats_breusch_pagan_daily",
    "forecast_accuracy_scorecard_daily",
    "ccf_view_purchase_hourly",
    "xyz_demand_variability_parts",
    "eval_cohens_kappa_raters",
    # round-12 additions (Croston intermittent-demand capstone,
    # Yule-Walker AR(2)+PACF, six-term Brier/Murphy decomposition,
    # Cramér's V effect size, Cohen's d family, burstiness profile,
    # rescaled-range Hurst exponent):
    "forecast_croston_intermittent",
    "stats_yule_walker_ar2_hourly",
    "eval_brier_decomposition",
    "stats_cramers_v_brand_flag",
    "stats_cohens_d_weekend_revenue",
    "stats_burstiness_event_hourly",
    "stats_hurst_rs_daily",
    # round-13 additions (SES alpha-grid and theta-method backtests —
    # the state-space siblings of the forecast shelf, shared t >= 8
    # evaluation window; seasonal/trend strength; Cramér-von Mises
    # two-sample completing the KS/Mann-Whitney shelf; first-order
    # partial correlation):
    "forecast_ses_alpha_grid_daily",
    "forecast_theta_daily",
    "stats_seasonal_strength_daily",
    "stats_cvm_two_sample",
    "stats_partial_corr_lineitem",
    "stats_jonckheere_terpstra",
    "stats_ansari_bradley",
    "forecast_holt_damped_daily",
    # round-14 additions (AR(2) Yule-Walker backtest with the
    # Diebold-Mariano significance column, pinball-scored interval
    # forecast, random-walk-with-drift floor, Mood median, Cox-Stuart
    # sign trend, Grubbs outlier, Page ordered trend + Kendall's W on
    # the weekly block design):
    "forecast_ar2_daily",
    "forecast_pinball_interval_daily",
    "forecast_drift_daily",
    "stats_mood_median_weekend",
    "stats_cox_stuart_trend_daily",
    "stats_grubbs_outlier_daily",
    "stats_page_trend_dow",
    "stats_kendalls_w_dow",
    "forecast_combo_daily",
    "stats_quade_dow",
    "stats_brunner_munzel",
    "stats_hodges_lehmann_shift",
    "anomaly_gesd_daily",
    "changepoint_buishand_range",
    "text_gopher_quality_flags",
]

# Continuity suite: exactly the 30 keys BENCH_r05 reported. The primary
# "value" metric totals THESE, so the cross-round series (and the judge's
# BASELINE.md comparison, whose measured denominator predates the round-6
# suite growth) stays apples-to-apples; the FULL suite total (whatever
# its current size — len(HEADLINE), 49 as of round 6) is reported
# alongside as "value_extended". Without this split, growing the suite
# would read as a slowdown that never happened.
CORE = HEADLINE[: HEADLINE.index("dedup_cross_doc_segments")]


def _calib_single(passes: int = 5) -> list[float]:
    """Fixed single-thread CPU-bound loop, timed ``passes`` times.

    The cross-round host-speed normalizer (see the long comment at its
    call site in main()). Shared by the main process and the isolated
    subprocess so their ratios are directly comparable.
    """
    return [round(_calib_worker(0), 4) for _ in range(passes)]


def _calib_worker(_: int) -> float:
    # THE calibration loop: _calib_single and _calib_multicore must
    # time this one body, or the single/multicore ratio telemetry
    # silently desynchronizes (r14 review finding).
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    return time.perf_counter() - t0


def _calib_multicore(workers: int, passes: int = 5) -> list[float]:
    """Multicore calibration twin (VERDICT r13 item 1b).

    The single-thread loop normalizes host CPU *speed* but is blind to
    multicore contention and memory-bandwidth pressure — exactly what a
    co-tenant box exerts on a 32-thread Spark suite. Here ``workers``
    processes run the SAME loop simultaneously; the wall time of one
    parallel batch is recorded per pass. On a quiet host mc ≈ single;
    under contention mc inflates while single may not — so the ratio
    calib_mc/calib tells a reader whether a slow round was contended
    without re-running anything. Spawn (not fork): the caller holds a
    live py4j gateway with helper threads, and forking a threaded
    process can deadlock the child.
    """
    import concurrent.futures as cf
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    out: list[float] = []
    with cf.ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as pool:
        list(pool.map(_calib_worker, range(workers)))  # warm the pool (imports)
        for _ in range(passes):
            t0 = time.perf_counter()
            list(pool.map(_calib_worker, range(workers)))
            out.append(round(time.perf_counter() - t0, 4))
    return out


def _jvm_gc_ms(spark) -> int | None:
    """Cumulative GC time (ms) across all collectors of the local JVM.

    local-mode driver and executors share one JVM, so this is the
    executor GC telemetry VERDICT r13 item 1b asks for. Returns None on
    any gateway hiccup — telemetry must never fail the bench contract.
    """
    try:
        beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    except Exception:
        return None


def run_isolated_core() -> None:
    """Subprocess mode: measure the frozen 30-query core CONTAMINATION-FREE.

    VERDICT r13 item 1a: the driver-run value/calib ratio drifted
    70.3→103.1 over r10–r13 while quiet-host re-measures held flat; the
    suspected contaminant is the growing extended suite itself (a
    104-plan warmup and 74 extra queries' worth of JVM/codegen/GC
    pressure share the session with the core measurement). This mode
    runs in a FRESH process with a FRESH SparkSession, warms ONLY the
    core plans, and times ONLY the core — same 3-pass-min protocol, same
    single-thread calibration — so the core series has a twin that
    suite growth cannot touch. If the drift reproduces here, it's code;
    if it doesn't, it's host/suite pressure. Output: one JSON line.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("console_etl_spark_bench_isolated")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in CORE:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    release_pins()
    spark.catalog.clearCache()
    calib_passes = _calib_single()
    calib_sec = sorted(calib_passes)[2]
    gc0 = _jvm_gc_ms(spark)
    timings: dict[str, float] = {}
    for name in CORE:
        runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_pins()
            spark.catalog.clearCache()
        timings[name] = min(runs)
    gc1 = _jvm_gc_ms(spark)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "isolated_core_sec": total,
                "calib_sec": calib_sec,
                "calib_min": min(calib_passes),
                "calib_max": max(calib_passes),
                "ratio": round(total / calib_sec, 2) if calib_sec else None,
                "gc_sec": round((gc1 - gc0) / 1000.0, 2)
                if gc0 is not None and gc1 is not None
                else None,
                "queries_min": timings,
            }
        )
    )
    spark.stop()


def _spawn_isolated_core() -> dict | None:
    """Run the isolated-core twin in a subprocess; None on any failure.

    Runs BEFORE the parent creates its own SparkSession so the fresh JVM
    has the whole box to itself — two concurrent JVMs would reintroduce
    the contamination this measurement exists to exclude.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--isolated-core"],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        for ln in reversed(proc.stdout.strip().splitlines()):
            if ln.startswith("{"):
                return json.loads(ln)
        print(
            f"# isolated-core subprocess produced no JSON (rc={proc.returncode}); "
            f"stderr tail: {proc.stderr[-500:]}",
            file=sys.stderr,
        )
    except Exception as exc:
        print(f"# isolated-core subprocess failed: {exc}", file=sys.stderr)
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Isolated-core twin FIRST (fresh box, no parent JVM yet).
    isolated = _spawn_isolated_core()

    spark = get_spark("console_etl_spark_bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warmup: run the whole suite once at the smallest SF so whole-stage
    # codegen is compiled for every plan shape before timing starts (the
    # first decimal-agg otherwise pays ~3 s of one-time JIT/codegen that
    # has nothing to do with the measured scale factor). sf0.1 data
    # itself stays untouched until the timed loop.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    release_pins()
    spark.catalog.clearCache()  # drop warmup persists before timing
    # Self-diagnosing artifact (VERDICT r2 item 5): the r02 bench recorded
    # a 5x outlier caused by co-tenant host load, indistinguishable from a
    # code regression without a judge re-run. Now every query runs 3
    # passes with ALL per-pass times persisted, and the host's 1-minute
    # load average is sampled before/after the suite — a loaded box shows
    # up in the artifact itself.
    load_before = os.getloadavg()
    # Host-speed calibration (round-5 finding: an identical-code A/B across
    # rounds showed ~2x wall-clock differences from VM/CPU speed alone —
    # indistinguishable from a code regression without a same-host rerun).
    # A fixed single-thread CPU-bound loop timed here lets any reader
    # normalize suite seconds across rounds: compare value/calib ratios,
    # not raw seconds. VERDICT r10 item 4: the loop runs FIVE passes and
    # reports its own spread — calib_sec (the cross-round normalizer) is
    # now the median, and calib_min/calib_max expose whether a given
    # round's "slow host" attribution rests on a stable measurement or a
    # single noisy pass. A wide spread means the host was churning DURING
    # calibration and the normalized ratio deserves suspicion.
    calib_passes = _calib_single()
    calib_sec = sorted(calib_passes)[2]
    # Multicore twin (VERDICT r13 item 1b): same loop on N parallel
    # workers — sensitive to the multicore/memory-bandwidth contention
    # the single-thread loop can't see. Compare calib_mc/calib across
    # rounds: a jump with flat single-thread calib = contended host.
    mc_workers = min(8, os.cpu_count() or 8)
    try:
        calib_mc_passes = _calib_multicore(mc_workers)
        calib_mc_sec = sorted(calib_mc_passes)[len(calib_mc_passes) // 2]
    except Exception as exc:  # telemetry must not break the contract
        print(f"# multicore calib failed: {exc}", file=sys.stderr)
        calib_mc_passes, calib_mc_sec = [], None
    gc_before_ms = _jvm_gc_ms(spark)
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    median: dict[str, float] = {}
    passes: dict[str, list[float]] = {}
    total = total_cold = total_median = 0.0
    n_passes = 3
    for name in HEADLINE:
        fn = qs[name]
        # Report the cold first pass (honest single-shot cost), the
        # median (robust central tendency), and the min (steady-state
        # floor). Round-over-round comparisons should use matching keys.
        runs: list[float] = []
        for _ in range(n_passes):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            # Queries that persist intermediates (dedup/similarity)
            # self-bound via session.pin; release fully between
            # measurements so passes are independent.
            release_pins()
            spark.catalog.clearCache()
        passes[name] = runs
        timings[name] = min(runs)
        cold[name] = runs[0]
        median[name] = sorted(runs)[n_passes // 2]
        if name in CORE:
            total += timings[name]
            total_cold += cold[name]
            total_median += median[name]
        print(
            f"# {name}: min {timings[name]:.3f}s median {median[name]:.3f}s "
            f"cold {cold[name]:.3f}s",
            file=sys.stderr,
        )
    load_after = os.getloadavg()
    gc_after_ms = _jvm_gc_ms(spark)
    gc_time_sec = (
        round((gc_after_ms - gc_before_ms) / 1000.0, 2)
        if gc_before_ms is not None and gc_after_ms is not None
        else None
    )

    # Driver contract is ONE parseable JSON line; round 3's artifact blew
    # the driver's line-capture budget by inlining 27x3 per-pass floats
    # and went unparsed. The full diagnostic detail now lives in a
    # sidecar (BENCH_DETAIL.json next to this script) and on stderr; the
    # final stdout line stays compact: headline totals + per-query mins.
    detail = {
        "queries_min": timings,
        "queries_cold": cold,
        "queries_median": median,
        "passes": passes,
        "calib_passes": calib_passes,
        "calib_mc_passes": calib_mc_passes,
        "isolated_core": isolated,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError as exc:  # read-only checkout: detail still reaches stderr
        print(f"# could not write {detail_path}: {exc}", file=sys.stderr)
    print(f"# detail: {json.dumps(detail)}", file=sys.stderr)

    # Round 8 recurrence of the round-3 failure: at 55 suite queries the
    # stdout line outgrew the driver's line-capture buffer again and
    # BENCH_r08.json recorded "parsed": null. The stdout dict now carries
    # ONLY the frozen 30-query CORE mins (its size never grows — suite
    # growth lands in the sidecar's queries_min), and the line length is
    # asserted below so any future contract breach fails HERE, visibly,
    # instead of silently in the driver.
    line = json.dumps(
        {
            "metric": "headline_suite_wall_sec",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: v for k, v in timings.items() if k in CORE},
            "value_cold": round(total_cold, 3),
            "value_median": round(total_median, 3),
            # full suite (CORE + post-r5 additions; size below); the
            # primary value stays the r5-comparable 30-query total
            "value_extended": round(sum(timings.values()), 3),
            "core_size": len(CORE),
            "suite_size": len(HEADLINE),
            "calib_sec": calib_sec,  # median of the 5 calib passes
            "calib_min": min(calib_passes),
            "calib_max": max(calib_passes),
            # host-speed-normalized headline (VERDICT r8 item 8): compare
            # THIS across rounds — raw seconds swing ~1.3x with co-tenant
            # load; value / calib_sec cancels the host-speed factor.
            "value_calib_ratio": round(total / calib_sec, 2) if calib_sec else None,
            # Contamination-free core twin (VERDICT r13 item 1a): same 30
            # queries, fresh subprocess+session, core-only warmup, own
            # calibration — suite growth cannot touch this series. If the
            # r10-r13 ratio drift reproduces in isolated_ratio it's code;
            # if isolated stays flat while value_calib_ratio climbs, the
            # in-session number is contaminated (host or suite pressure).
            "value_core_isolated": isolated.get("isolated_core_sec") if isolated else None,
            "calib_isolated_sec": isolated.get("calib_sec") if isolated else None,
            "isolated_ratio": isolated.get("ratio") if isolated else None,
            "isolated_gc_sec": isolated.get("gc_sec") if isolated else None,
            # Multicore contention twin (item 1b): calib_mc/calib ≈ 1 on a
            # quiet host; it inflates under co-tenant load the
            # single-thread loop can't see.
            "calib_mc_sec": calib_mc_sec,
            "calib_mc_workers": mc_workers,
            # Executor-JVM GC seconds across the timed loop (local mode:
            # driver==executor JVM). Distinguishes memory-pressure rounds
            # from CPU-contention rounds in the artifact itself.
            "gc_time_sec": gc_time_sec,
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in load_after],
            "sf": sf,
        }
    )
    assert len(line) < 4096, (
        f"stdout contract breach: bench line is {len(line)} bytes (budget 4096); "
        "move detail to BENCH_DETAIL.json instead of growing this line"
    )
    print(line)


if __name__ == "__main__":
    if "--isolated-core" in sys.argv[1:]:
        run_isolated_core()
    else:
        main()
