"""Model-evaluation analytics over scored corpora (X4/X8 adjunct).

A training-data engine that can score documents (quality, language,
dedup survivorship) also needs to EVALUATE those scores at corpus
scale: ranking power (AUC), targeting efficiency (gains/lift
deciles), and probability calibration (reliability bins). These are
the standard model-eval relations, re-expressed as exact Spark
dataflow over the ``documents`` fixture with ``n_chars`` standing in
for a model score and ``lang = 'en'`` for the binary label — the same
shapes apply verbatim to any (score, label) projection.

Scale notes (the reason these aren't one-liner windows):

- **AUC** is the Mann-Whitney statistic. The naive form ranks every
  row with ``ROW_NUMBER() OVER (ORDER BY score)`` — a SinglePartition
  exchange, the canonical scale-killer. Here the corpus first
  collapses to one row per DISTINCT score (map-side combinable; the
  grouped relation is bounded by score cardinality, not row count),
  then a distributed exclusive prefix-scan
  (llmops.pipeline.global_prefix_sum) supplies "negatives strictly
  below this score". The tie-corrected identity

      AUC = Σ_s pos_s · (2·neg_below(s) + neg_s) / (2·P·N)

  is all 64-bit integer arithmetic until one final division, so both
  engines agree bit-for-bit after ROUND(_, 6).
- **Gains deciles** need a global position — supplied by
  llmops.pipeline.global_enumerate (two-phase, no SinglePartition on
  the corpus); deciles use integer `div`, never float floor, so
  bucket boundaries cannot drift between engines. The cumulative
  window then runs over 10 rows.
- **Calibration bins** are pure groupBy: the predicted probability
  is kept as an integer numerator (``least(n_chars, CAL_SCALE)``)
  until the final division, so per-bin means are
  summation-order-independent.

The reference (a catalog/blob service, SURVEY §2.1) has no analytics
surface; this module is part of the §2.3 extension tier the driver
mandates for LLM-pipeline workloads.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..session import load_table
from .pipeline import global_enumerate, global_prefix_sum

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, label): n_chars as the score, lang='en' as the
    positive class — deterministic, engine-agnostic, tie-rich."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("score"),
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("label"),
    )


_SQL_SCORED = """
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS score,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS label
  FROM documents
"""


@_register(
    "eval_auc_doc_length",
    f"""
    WITH scored AS ({_SQL_SCORED}),
    by_score AS (
      SELECT score,
             CAST(SUM(label) AS BIGINT)     AS pos,
             CAST(SUM(1 - label) AS BIGINT) AS neg
      FROM scored GROUP BY score
    ), cum AS (
      SELECT pos, neg,
             CAST(COALESCE(SUM(neg) OVER (
                    ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) AS BIGINT) AS neg_below
      FROM by_score
    )
    SELECT ROUND(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
                 / CAST(2 * SUM(pos) * SUM(neg) AS DOUBLE), 6) AS auc,
           ROUND(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
                 / CAST(SUM(pos) * SUM(neg) AS DOUBLE) - 1.0, 6)
             AS gini_stat,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg
    FROM cum
    """,
)
def eval_auc_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected ROC AUC of doc length predicting lang='en' —
    grouped-by-score counts, then a distributed exclusive prefix-scan
    of negatives (no per-row global rank anywhere in the plan)."""
    by_score = (
        _scored(spark, sf_dir)
        .groupBy("score")
        .agg(
            F.sum("label").alias("pos"),
            F.sum(F.lit(1) - F.col("label")).alias("neg"),
        )
    )
    cum = global_prefix_sum(
        by_score, ["score"], "neg", out_col="neg_below", inclusive=False
    )
    num = F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg")))
    pos_tot = F.sum("pos")
    neg_tot = F.sum("neg")
    return cum.agg(
        F.round(
            num.cast("double") / (2 * pos_tot * neg_tot).cast("double"), 6
        ).alias("auc"),
        F.round(
            num.cast("double") / (pos_tot * neg_tot).cast("double") - F.lit(1.0),
            6,
        ).alias("gini_stat"),
        pos_tot.cast("bigint").alias("n_pos"),
        neg_tot.cast("bigint").alias("n_neg"),
    )


@_register(
    "eval_gains_deciles",
    f"""
    WITH scored AS ({_SQL_SCORED}),
    idx AS (
      SELECT label,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS rn,
             COUNT(*) OVER () AS n
      FROM scored
    ), dec AS (
      SELECT CAST((rn * 10) // n AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT)   AS n_docs,
             CAST(SUM(label) AS BIGINT) AS n_pos
      FROM idx GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n_pos) AS BIGINT)  AS tp,
             CAST(SUM(n_docs) AS BIGINT) AS td
      FROM dec
    )
    SELECT decile, n_docs, n_pos,
           ROUND(CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(tp AS DOUBLE), 6) AS cum_capture,
           ROUND((CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE))
                 / (CAST(tp AS DOUBLE) / CAST(td AS DOUBLE)), 6) AS lift
    FROM dec, tot
    ORDER BY decile
    """,
)
def eval_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table: rank by score desc (doc_id tiebreak)
    through the distributed enumeration kernel, bucket by integer
    `div`, then cumulative capture over the 10-row decile relation."""
    scored = _scored(spark, sf_dir).withColumn("_ns", -F.col("score"))
    idx = global_enumerate(scored, ["_ns", "doc_id"], out_col="_rn")
    # total rows from the un-enumerated relation: one scan-side scalar
    # aggregate instead of a second pass through the rank kernel
    total = _scored(spark, sf_dir).agg(F.count("*").cast("bigint").alias("_n"))
    dec = (
        idx.crossJoin(F.broadcast(total))
        .withColumn("decile", F.expr("CAST((_rn * 10) DIV _n AS BIGINT)"))
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("label").cast("bigint").alias("n_pos"),
        )
    )
    tot = dec.agg(
        F.sum("n_pos").cast("bigint").alias("tp"),
        F.sum("n_docs").cast("bigint").alias("td"),
    )
    from pyspark.sql import Window as W

    # 10-row relation: a global window here is bounded, not a scale
    # hazard (same shape as the other report-sized finals).
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum_capture",
            F.round(
                F.sum("n_pos").over(w).cast("double") / F.col("tp").cast("double"),
                6,
            ),
        )
        .withColumn(
            "lift",
            F.round(
                (F.col("n_pos").cast("double") / F.col("n_docs").cast("double"))
                / (F.col("tp").cast("double") / F.col("td").cast("double")),
                6,
            ),
        )
        .select("decile", "n_docs", "n_pos", "cum_capture", "lift")
        .orderBy("decile")
    )


# Probability scale: score/CAL_SCALE clamped to [0, 1]; ten
# equal-width bins via integer arithmetic so bucket edges are
# engine-exact. 600 comfortably covers the fixture's n_chars range.
CAL_SCALE = 600


@_register(
    "eval_calibration_bins",
    f"""
    WITH scored AS ({_SQL_SCORED}),
    binned AS (
      SELECT LEAST((LEAST(score, {CAL_SCALE}) * 10) // {CAL_SCALE}, 9)
               AS bin,
             LEAST(score, {CAL_SCALE}) AS pred_num,
             label
      FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(pred_num) AS DOUBLE)
                 / ({CAL_SCALE}.0 * COUNT(*)), 6) AS mean_pred,
           ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS frac_pos
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table: predicted probability = min(score, CAL_SCALE)
    / CAL_SCALE, ten equal-width bins. Numerators stay integer until
    the final division, so per-bin means are order-independent."""
    pred_num = F.least(F.col("score"), F.lit(CAL_SCALE))
    return (
        _scored(spark, sf_dir)
        .withColumn("pred_num", pred_num)
        .withColumn(
            "bin",
            F.least(
                F.expr(f"(pred_num * 10) DIV {CAL_SCALE}"), F.lit(9)
            ).cast("bigint"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("pred_num").cast("double")
                / (F.lit(float(CAL_SCALE)) * F.count("*")),
                6,
            ).alias("mean_pred"),
            F.round(F.sum("label").cast("double") / F.count("*"), 6).alias(
                "frac_pos"
            ),
        )
        .orderBy("bin")
    )


@_register(
    "eval_woe_iv_doc_length",
    f"""
    WITH scored AS ({_SQL_SCORED}),
    binned AS (
      SELECT LEAST((LEAST(score, {CAL_SCALE}) * 10) // {CAL_SCALE}, 9)
               AS bin,
             label
      FROM scored
    ), per_bin AS (
      SELECT CAST(bin AS BIGINT) AS bin,
             CAST(SUM(label) AS BIGINT)     AS n_pos,
             CAST(SUM(1 - label) AS BIGINT) AS n_neg
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT CAST(SUM(n_pos) AS BIGINT) AS p,
             CAST(SUM(n_neg) AS BIGINT) AS n
      FROM per_bin
    )
    SELECT bin, n_pos, n_neg,
           ROUND(LN(((n_pos + 0.5) * (n + 5.0))
                    / ((n_neg + 0.5) * (p + 5.0))), 6) AS woe,
           ROUND(((n_pos + 0.5) / (p + 5.0) - (n_neg + 0.5) / (n + 5.0))
                 * LN(((n_pos + 0.5) * (n + 5.0))
                      / ((n_neg + 0.5) * (p + 5.0))), 6) AS iv_term
    FROM per_bin, tot
    ORDER BY bin
    """,
)
def eval_woe_iv_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value table for the length
    score vs the lang='en' label — the credit-scoring-style feature
    diagnostic (how separating is each score band). Bins reuse the
    calibration grid; counts stay integer and the Laplace smoothing
    (+0.5 per class per bin, +5 to each total for 10 bins) keeps WOE
    finite in empty classes. Both engines evaluate the identical
    IEEE expression, so ROUND(_, 6) agrees.

    Scale: one groupBy to 10 rows, totals cross-joined back from a
    1-row broadcast — nothing row-sized past the first aggregation."""
    per_bin = (
        _scored(spark, sf_dir)
        .withColumn(
            "bin",
            F.least(
                F.expr(
                    f"(LEAST(score, {CAL_SCALE}) * 10) DIV {CAL_SCALE}"
                ),
                F.lit(9),
            ).cast("bigint"),
        )
        .groupBy("bin")
        .agg(
            F.sum("label").cast("bigint").alias("n_pos"),
            F.sum(F.lit(1) - F.col("label")).cast("bigint").alias("n_neg"),
        )
    )
    tot = per_bin.agg(
        F.sum("n_pos").cast("bigint").alias("p"),
        F.sum("n_neg").cast("bigint").alias("n"),
    )
    woe_arg = ((F.col("n_pos") + 0.5) * (F.col("n") + 5.0)) / (
        (F.col("n_neg") + 0.5) * (F.col("p") + 5.0)
    )
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_pos",
            "n_neg",
            F.round(F.log(woe_arg), 6).alias("woe"),
            F.round(
                (
                    (F.col("n_pos") + 0.5) / (F.col("p") + 5.0)
                    - (F.col("n_neg") + 0.5) / (F.col("n") + 5.0)
                )
                * F.log(woe_arg),
                6,
            ).alias("iv_term"),
        )
        .orderBy("bin")
    )


@_register(
    "eval_pr_curve_points",
    f"""
    WITH scored AS ({_SQL_SCORED}),
    by_score AS (
      SELECT score,
             CAST(SUM(label) AS BIGINT)     AS pos,
             CAST(SUM(1 - label) AS BIGINT) AS neg
      FROM scored GROUP BY score
    ), tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p FROM by_score
    ), cum AS (
      SELECT score,
             CAST(COALESCE(SUM(pos) OVER (
                    ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) AS BIGINT) AS pos_below,
             CAST(COALESCE(SUM(neg) OVER (
                    ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) AS BIGINT) AS neg_below,
             CAST(SUM(pos) OVER () AS BIGINT) AS p,
             CAST(SUM(neg) OVER () AS BIGINT) AS n
      FROM by_score
    )
    SELECT score AS threshold,
           p - pos_below AS tp,
           n - neg_below AS fp,
           ROUND(CAST(p - pos_below AS DOUBLE)
                 / CAST((p - pos_below) + (n - neg_below) AS DOUBLE), 6)
             AS precision_at,
           ROUND(CAST(p - pos_below AS DOUBLE) / CAST(p AS DOUBLE), 6)
             AS recall_at
    FROM cum
    ORDER BY threshold
    """,
)
def eval_pr_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall at every distinct score threshold (classifier
    'predict positive iff score >= t'): TP(t) = positives at-or-above
    t = P minus the exclusive below-prefix — the same grouped-by-score
    relation and prefix-scan kernel as the AUC, re-read for the curve.
    Counts stay integer; one division per output row.

    Scale: output is one row per DISTINCT score (bounded by score
    cardinality), the only per-row work is the map-side group.

    The grouped-by-score relation is pinned (VERDICT r6 item 5): it
    feeds BOTH the prefix-scan chain and the totals row — unpinned,
    each consumer re-scanned documents."""
    from ..session import pin

    by_score = pin(
        _scored(spark, sf_dir)
        .groupBy("score")
        .agg(
            F.sum("label").cast("bigint").alias("pos"),
            F.sum(F.lit(1) - F.col("label")).cast("bigint").alias("neg"),
        )
    )
    cum = global_prefix_sum(
        by_score, ["score"], "pos", out_col="pos_below", inclusive=False
    )
    cum = global_prefix_sum(
        cum, ["score"], "neg", out_col="neg_below", inclusive=False
    )
    tot = by_score.agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum("neg").cast("bigint").alias("n"),
    )
    tp = F.col("p") - F.col("pos_below")
    fp = F.col("n") - F.col("neg_below")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            tp.cast("bigint").alias("tp"),
            fp.cast("bigint").alias("fp"),
            F.round(tp.cast("double") / (tp + fp).cast("double"), 6).alias(
                "precision_at"
            ),
            F.round(tp.cast("double") / F.col("p").cast("double"), 6).alias(
                "recall_at"
            ),
        )
        .orderBy("threshold")
    )


@_register(
    "eval_cohens_kappa_raters",
    """
    WITH feat AS (
      SELECT CAST(n_chars AS BIGINT) AS nc,
             CAST(length(text) - length(replace(text, ' ', '')) + 1
                  AS BIGINT) AS nt
      FROM documents
    ), medc AS (
      SELECT MIN(nc) AS mc FROM (
        SELECT nc,
               SUM(cnt) OVER (ORDER BY nc
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS tot
        FROM (SELECT nc, COUNT(*) AS cnt FROM feat GROUP BY nc)
      ) WHERE cum * 2 >= tot
    ), medt AS (
      SELECT MIN(nt) AS mt FROM (
        SELECT nt,
               SUM(cnt) OVER (ORDER BY nt
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS tot
        FROM (SELECT nt, COUNT(*) AS cnt FROM feat GROUP BY nt)
      ) WHERE cum * 2 >= tot
    ), flags AS (
      SELECT CASE WHEN nc >= mc THEN 1 ELSE 0 END AS ra,
             CASE WHEN nt >= mt THEN 1 ELSE 0 END AS rb
      FROM feat CROSS JOIN medc CROSS JOIN medt
    ), c2 AS (
      SELECT CAST(SUM(ra * rb) AS BIGINT) AS n11,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM flags
    )
    SELECT n AS n_docs, n11, n10, n01, n00,
           ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
           ROUND(CAST((n11 + n10) * (n11 + n01)
                      + (n01 + n00) * (n10 + n00) AS DOUBLE)
                 / CAST(n * n AS DOUBLE), 6) AS pe,
           ROUND(CAST(2 * (n11 * n00 - n10 * n01) AS DOUBLE)
                 / CAST(NULLIF((n11 + n10) * (n10 + n00)
                               + (n11 + n01) * (n01 + n00), 0)
                        AS DOUBLE), 6) AS kappa
    FROM c2
    """,
)
def eval_cohens_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary document raters — the
    chance-corrected agreement metric the eval tier lacked (AUC ranks
    ONE scorer against labels; kappa asks whether TWO independent
    raters agree beyond what their marginal rates force). Rater A
    flags documents at or above the median character length; rater B
    at or above the median whitespace-token count — two length
    proxies whose agreement should be high but NOT perfect (token
    width varies), which is exactly the regime kappa was built to
    quantify. kappa = (po - pe)/(1 - pe), reported with the full 2x2
    and both agreement rates.

    Exactness: both rater thresholds are LOWER MEDIANS computed on
    the value-domain-bounded distinct-length relations (min value
    whose inclusive cumulative count reaches half the corpus —
    integer-exact, no interpolated quantile parity to defend), flags
    are integer comparisons, the four cells are exact counts, and
    kappa uses the integer identity
    2*(n11*n00 - n10*n01) / ((n11+n10)(n10+n00) + (n11+n01)(n01+n00))
    — ONE division of two exact integers (NULLIF-guarded for the
    degenerate constant-rater table).

    Scale shape: TWO corpus scans total — the information-theoretic
    minimum for a global-threshold rater (thresholds must exist
    before any row can be flagged). Scan 1 builds BOTH value
    histograms in one pass (posexplode of the (nc, nt) pair, groupBy
    (rater, value) — the plan-audit discipline caught the naive
    three-scan shape, one histogram pass per rater plus the flag
    pass, before registration); the lower medians then run on the
    distinct-VALUE relation (bounded by max document length, not
    corpus size — the same type-relation trick as the BPE tier),
    pivot to one broadcast row, and scan 2 reduces to the 5-counter
    2x2. No corpus-sized window, sort, or exact-percentile collect
    anywhere."""
    d = load_table(spark, sf_dir, "documents")
    feat = d.select(
        F.col("n_chars").cast("bigint").alias("nc"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("bigint")
        .alias("nt"),
    )
    hist = (
        feat.select(
            F.posexplode(F.array("nc", "nt")).alias("rater", "val")
        )
        .groupBy("rater", "val")
        .agg(F.count("*").alias("cnt"))
    )
    cumw = (
        W.partitionBy("rater")
        .orderBy("val")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.select(
        "rater",
        "val",
        F.sum("cnt").over(cumw).alias("cum"),
        F.sum("cnt").over(W.partitionBy("rater")).alias("tot"),
    )
    meds = (
        cum.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy()
        .pivot("rater", [0, 1])
        .agg(F.min("val"))
        .select(F.col("0").alias("mc"), F.col("1").alias("mt"))
    )
    flags = (
        feat.crossJoin(F.broadcast(meds))
        .select(
            F.when(F.col("nc") >= F.col("mc"), 1).otherwise(0).alias("ra"),
            F.when(F.col("nt") >= F.col("mt"), 1).otherwise(0).alias("rb"),
        )
    )
    c2 = flags.agg(
        F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("bigint")
        .alias("n00"),
        F.count("*").cast("bigint").alias("n"),
    )
    a, b, c, dd, n = (
        F.col("n11"),
        F.col("n10"),
        F.col("n01"),
        F.col("n00"),
        F.col("n"),
    )
    den = F.nullif(
        ((a + b) * (b + dd) + (a + c) * (c + dd)), F.lit(0)
    ).cast("double")
    return c2.select(
        n.alias("n_docs"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.round((a + dd).cast("double") / n.cast("double"), 6).alias("po"),
        F.round(
            ((a + b) * (a + c) + (c + dd) * (b + dd)).cast("double")
            / (n * n).cast("double"),
            6,
        ).alias("pe"),
        F.round((2 * (a * dd - b * c)).cast("double") / den, 6).alias(
            "kappa"
        ),
    )


def _sum10(prefix: str) -> str:
    """Fixed-order 10-term addition over the pivoted bin columns —
    left-associative in both engines, so the double sum is
    deterministic without an ordered window."""
    return " + ".join(f"COALESCE({prefix}{k}, 0.0)" for k in range(10))


@_register(
    "eval_brier_decomposition",
    f"""
    WITH scored AS ({_SQL_SCORED}),
    binned AS (
      SELECT LEAST((LEAST(score, {CAL_SCALE}) * 10) // {CAL_SCALE}, 9)
               AS bin,
             LEAST(score, {CAL_SCALE}) AS s,
             label AS y
      FROM scored
    ), per_bin AS (
      SELECT bin,
             CAST(COUNT(*) AS HUGEINT) AS nk,
             CAST(SUM(s) AS HUGEINT) AS ssk,
             CAST(SUM(CAST(s AS HUGEINT) * s) AS HUGEINT) AS sssk,
             CAST(SUM(y) AS HUGEINT) AS syk,
             CAST(SUM(s * y) AS HUGEINT) AS ssyk
      FROM binned GROUP BY bin
    ), g AS (
      SELECT CAST(SUM(nk) AS HUGEINT) AS n,
             CAST(SUM(ssk) AS HUGEINT) AS s,
             CAST(SUM(sssk) AS HUGEINT) AS ss,
             CAST(SUM(syk) AS HUGEINT) AS y,
             CAST(SUM(ssyk) AS HUGEINT) AS sy
      FROM per_bin
    ), terms AS (
      SELECT
        MAX(CASE WHEN bin = 0 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel0,
        MAX(CASE WHEN bin = 1 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel1,
        MAX(CASE WHEN bin = 2 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel2,
        MAX(CASE WHEN bin = 3 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel3,
        MAX(CASE WHEN bin = 4 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel4,
        MAX(CASE WHEN bin = 5 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel5,
        MAX(CASE WHEN bin = 6 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel6,
        MAX(CASE WHEN bin = 7 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel7,
        MAX(CASE WHEN bin = 8 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel8,
        MAX(CASE WHEN bin = 9 THEN CAST((ssk - {CAL_SCALE} * syk)
              * (ssk - {CAL_SCALE} * syk) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS rel9,
        MAX(CASE WHEN bin = 0 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res0,
        MAX(CASE WHEN bin = 1 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res1,
        MAX(CASE WHEN bin = 2 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res2,
        MAX(CASE WHEN bin = 3 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res3,
        MAX(CASE WHEN bin = 4 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res4,
        MAX(CASE WHEN bin = 5 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res5,
        MAX(CASE WHEN bin = 6 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res6,
        MAX(CASE WHEN bin = 7 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res7,
        MAX(CASE WHEN bin = 8 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res8,
        MAX(CASE WHEN bin = 9 THEN CAST((g.n * syk - nk * g.y)
              * (g.n * syk - nk * g.y) AS DOUBLE) / CAST(nk AS DOUBLE)
            END) AS res9,
        MAX(CASE WHEN bin = 0 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv0,
        MAX(CASE WHEN bin = 1 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv1,
        MAX(CASE WHEN bin = 2 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv2,
        MAX(CASE WHEN bin = 3 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv3,
        MAX(CASE WHEN bin = 4 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv4,
        MAX(CASE WHEN bin = 5 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv5,
        MAX(CASE WHEN bin = 6 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv6,
        MAX(CASE WHEN bin = 7 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv7,
        MAX(CASE WHEN bin = 8 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv8,
        MAX(CASE WHEN bin = 9 THEN CAST(nk * sssk - ssk * ssk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbv9,
        MAX(CASE WHEN bin = 0 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc0,
        MAX(CASE WHEN bin = 1 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc1,
        MAX(CASE WHEN bin = 2 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc2,
        MAX(CASE WHEN bin = 3 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc3,
        MAX(CASE WHEN bin = 4 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc4,
        MAX(CASE WHEN bin = 5 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc5,
        MAX(CASE WHEN bin = 6 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc6,
        MAX(CASE WHEN bin = 7 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc7,
        MAX(CASE WHEN bin = 8 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc8,
        MAX(CASE WHEN bin = 9 THEN CAST(nk * ssyk - ssk * syk AS DOUBLE)
              / CAST(nk AS DOUBLE) END) AS wbc9
      FROM per_bin CROSS JOIN g
    )
    SELECT CAST(g.n AS BIGINT) AS n_docs,
           ROUND(CAST(g.ss - 2 * {CAL_SCALE} * g.sy
                      + {CAL_SCALE} * {CAL_SCALE} * g.y AS DOUBLE)
                 / CAST(g.n * {CAL_SCALE} * {CAL_SCALE} AS DOUBLE), 6)
             AS brier,
           ROUND(({_sum10("rel")})
                 / CAST(g.n * {CAL_SCALE} * {CAL_SCALE} AS DOUBLE), 6)
             AS reliability,
           ROUND(({_sum10("res")})
                 / CAST(g.n * g.n * g.n AS DOUBLE), 6) AS resolution,
           ROUND(CAST(g.y * (g.n - g.y) AS DOUBLE)
                 / CAST(g.n * g.n AS DOUBLE), 6) AS uncertainty,
           ROUND(({_sum10("wbv")})
                 / CAST(g.n * {CAL_SCALE} * {CAL_SCALE} AS DOUBLE), 6)
             AS within_bin_var,
           ROUND(({_sum10("wbc")})
                 / CAST(g.n * {CAL_SCALE} AS DOUBLE), 6)
             AS within_bin_cov
    FROM terms CROSS JOIN g
    """,
)
def eval_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Murphy decomposition of the Brier score over the ten reliability
    bins eval_calibration_bins materializes (VERDICT r11 item 4):
    BRIER = RELIABILITY - RESOLUTION + UNCERTAINTY
            + WITHIN_BIN_VAR - 2 * WITHIN_BIN_COV,
    where reliability penalizes bins whose mean prediction drifts from
    their observed positive rate, resolution rewards bins that
    separate from the base rate, uncertainty is the label's own
    variance (the no-skill floor), and the two within-bin terms are
    what the 10-bin quantization hides for NON-constant bins: the
    prediction variance inside each bin and the prediction-label
    covariance inside each bin (the cross term the constant-bin
    three-term textbook identity silently drops). With all six terms
    the identity is EXACT before rounding — pinned in
    tests/test_modeleval_unit.py.

    Exactness: predictions stay integer numerators (s = least(score,
    CAL_SCALE), probability s/CAL_SCALE); every per-bin and global
    moment (n, sum s, sum s^2, sum y, sum s*y) is an exact integer, so
    brier and uncertainty are ONE division of two exact integers. The
    three per-bin double terms cannot be SUM-aggregated (summation
    order is nondeterministic); instead the <= 10 bins pivot to fixed
    columns (the r_k-pivot house pattern) and add in one fixed
    left-associative expression — identical order in both engines.

    Scale shape: one documents scan -> a <= 10-row partial aggregate
    (map-side combinable); everything after is scalar math on that
    bounded relation."""
    scored = _scored(spark, sf_dir)
    C = CAL_SCALE
    d38 = "decimal(38,0)"
    binned = scored.select(
        F.least(
            F.expr(f"(least(score, {C}) * 10) DIV {C}"), F.lit(9)
        ).alias("bin"),
        F.least(F.col("score"), F.lit(C)).alias("s"),
        F.col("label").alias("y"),
    )
    sI, yI = F.col("s").cast(d38), F.col("y").cast(d38)
    # localCheckpoint pin: the <= 10-row bin relation feeds THREE
    # consumers (the global moments row, the pivoted terms, and the
    # final cross join) — unpinned, Catalyst re-derives it per consumer
    # and the corpus is scanned three times (the duplicated-base-scan
    # class the r11 plan discipline exists to catch)
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast(d38).alias("nk"),
        F.sum(sI).alias("ssk"),
        F.sum(sI * sI).alias("sssk"),
        F.sum(yI).alias("syk"),
        F.sum(sI * yI).alias("ssyk"),
    ).localCheckpoint()
    g = per_bin.agg(
        F.sum("nk").alias("n"),
        F.sum("ssk").alias("s"),
        F.sum("sssk").alias("ss"),
        F.sum("syk").alias("y"),
        F.sum("ssyk").alias("sy"),
    )
    nk = F.col("nk").cast("double")
    rel_num = (F.col("ssk") - C * F.col("syk")) * (
        F.col("ssk") - C * F.col("syk")
    )
    res_num = (F.col("n") * F.col("syk") - F.col("nk") * F.col("y")) * (
        F.col("n") * F.col("syk") - F.col("nk") * F.col("y")
    )
    wbv_num = F.col("nk") * F.col("sssk") - F.col("ssk") * F.col("ssk")
    wbc_num = F.col("nk") * F.col("ssyk") - F.col("ssk") * F.col("syk")
    joined = per_bin.crossJoin(F.broadcast(g))
    terms = joined.agg(
        *[
            F.max(
                F.when(F.col("bin") == k, rel_num.cast("double") / nk)
            ).alias(f"rel{k}")
            for k in range(10)
        ],
        *[
            F.max(
                F.when(F.col("bin") == k, res_num.cast("double") / nk)
            ).alias(f"res{k}")
            for k in range(10)
        ],
        *[
            F.max(
                F.when(F.col("bin") == k, wbv_num.cast("double") / nk)
            ).alias(f"wbv{k}")
            for k in range(10)
        ],
        *[
            F.max(
                F.when(F.col("bin") == k, wbc_num.cast("double") / nk)
            ).alias(f"wbc{k}")
            for k in range(10)
        ],
    )

    def sum10(prefix: str):
        acc = F.coalesce(F.col(f"{prefix}0"), F.lit(0.0))
        for k in range(1, 10):
            acc = acc + F.coalesce(F.col(f"{prefix}{k}"), F.lit(0.0))
        return acc

    nG, yG = F.col("n"), F.col("y")
    nc2 = (nG * C * C).cast("double")
    return terms.crossJoin(F.broadcast(g)).select(
        nG.cast("bigint").alias("n_docs"),
        F.round(
            (
                F.col("ss") - 2 * C * F.col("sy") + C * C * yG
            ).cast("double")
            / nc2,
            6,
        ).alias("brier"),
        F.round(sum10("rel") / nc2, 6).alias("reliability"),
        F.round(
            sum10("res") / (nG * nG * nG).cast("double"), 6
        ).alias("resolution"),
        F.round(
            (yG * (nG - yG)).cast("double") / (nG * nG).cast("double"),
            6,
        ).alias("uncertainty"),
        F.round(sum10("wbv") / nc2, 6).alias("within_bin_var"),
        F.round(
            sum10("wbc") / (nG * C).cast("double"), 6
        ).alias("within_bin_cov"),
    )
