"""Text analysis operators (X4): tokenization, quality scoring,
language-ID heuristic, corpus statistics, fingerprinting.

Everything row-level is a built-in columnar expression (split / explode /
array ops / hashes) — zero Python in the hot path; aggregations are
one-shuffle groupBys with map-side partials.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table, pin
from .dedup import SQL_NORM, normalized_text, tokens

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


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

@_register(
    "text_quality_scores",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS type_token_ratio,
           CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                 AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')) > 0.25
                THEN 1 ELSE 0 END AS passes_quality
    FROM documents
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, lexical diversity
    (type-token ratio), average token length, and a boolean quality gate
    of the kind used to filter LLM training corpora."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    n_tok = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    ttr = n_distinct.cast("double") / n_tok
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        ttr.alias("type_token_ratio"),
        (F.col("n_chars").cast("double") / n_tok).alias("chars_per_token"),
        F.when(n_tok.between(20, 80) & (ttr > 0.25), 1).otherwise(0).alias("passes_quality"),
    )


@_register(
    "text_lang_stats",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language label (integer-exact aggregates)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens())).alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@_register(
    "text_source_token_counts",
    """
    SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def text_source_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per source — the "how many tokens does each data
    source contribute" question every training-mix pipeline asks."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.size(tokens())).alias("total_tokens"),
        F.count("*").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# Token / n-gram frequencies
# --------------------------------------------------------------------------

@_register(
    "text_top_tokens",
    """
    SELECT w AS token, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
    GROUP BY w ORDER BY freq DESC, token LIMIT 20
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency top-20 (explode → count → TakeOrdered)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(20)
    )


@_register(
    "text_top_bigrams",
    """
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents) t
    )
    SELECT bigram, COUNT(*) AS freq FROM (
      SELECT w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY ord) AS bigram
      FROM words QUALIFY bigram IS NOT NULL) t
    GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 20
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequency top-20. Bigrams are built positionally with
    a transform over the token array — no window shuffle needed (the
    n-gram structure is within-row)."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    idx = F.sequence(F.lit(1), F.size(w) - 1)
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "bigram")
        .limit(20)
    )


@_register(
    "text_repetition_stats",
    """
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents) t
    ), bi AS (
      SELECT doc_id, w || ' ' || LEAD(w) OVER win AS bg
      FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
      QUALIFY LEAD(w) OVER win IS NOT NULL
    ), cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 9) AS top_bigram_frac
    FROM cnt GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (the Gopher-style 'fraction of the
    document inside its most common n-gram' filter used to drop
    boilerplate/spam from pretraining corpora): per document, total word
    bigrams and the share held by the top bigram. Bigrams built
    positionally in-row (no window shuffle); one doc_id aggregation.
    Docs with <2 words carry no bigrams and drop out in both engines."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    idx = F.sequence(F.lit(1), F.size(w) - 1)
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    cnt = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c").cast("double") / F.sum("c"), 9).alias("top_bigram_frac"),
    )


# --------------------------------------------------------------------------
# Fingerprinting
# --------------------------------------------------------------------------

WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (guarantee: any match ≥ w+k-1 chars shares a fp)


_WINNOW_FPS_SQL = f"""
    pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text) - {WINNOW_K - 1})) AS i,
             length(text) - {WINNOW_K - 1} AS m
      FROM documents
      WHERE length(text) >= {WINNOW_K}
    ), grams AS (
      SELECT doc_id, i, m,
             md5(substring(text, CAST(i AS INT), {WINNOW_K})) AS h
      FROM pos
    ), wins AS (
      SELECT doc_id, i, m,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
      FROM grams
    ), fps AS (
      SELECT DISTINCT doc_id, fp FROM wins WHERE i <= m - {WINNOW_W - 1}
    )
"""


@_register(
    "text_winnowed_fingerprints",
    f"WITH {_WINNOW_FPS_SQL} SELECT doc_id, fp FROM fps",
)
def text_winnowed_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed rolling-hash fingerprints (Schleimer/MOSS shape): hash
    every char k-gram, slide a w-window over the hash sequence, keep
    each window's minimum — any substring match of length ≥ w+k-1 chars
    between two documents is guaranteed to share a fingerprint, at ~1/w
    the k-gram count. The copy-detection primitive for partial-overlap
    dedup, where whole-doc hashes (text_fingerprints) see nothing.

    Deliberately explode + codegen'd md5 + sliding window MIN, NOT an
    in-row higher-order-function formulation: HOF lambdas evaluate
    interpreted per element (an A/B at fixture scale measured ~78 s
    interpreted vs ~2 s for this plan — same lesson as
    minhash_signatures). One exchange on doc_id for the window, one for
    the distinct; the text column is projected away before the shuffle.
    Hashes are md5 hex strings: their lexicographic MIN agrees across
    engines, making the whole construction oracle-checkable.
    """
    from pyspark.sql import Window as W

    from ..session import spread

    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    grams = (
        spread(d.select("doc_id", "text"))
        .filter(n >= WINNOW_K)
        .select(
            "doc_id",
            "text",
            (n - (WINNOW_K - 1)).alias("m"),
            F.explode(F.sequence(F.lit(1), n - (WINNOW_K - 1))).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            "m",
            F.md5(F.col("text").substr(F.col("i"), F.lit(WINNOW_K))).alias("h"),
        )
    )
    win = W.partitionBy("doc_id").orderBy("i").rowsBetween(0, WINNOW_W - 1)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .filter(F.col("i") <= F.col("m") - (WINNOW_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )


PARTIAL_OVERLAP_MIN_FPS = 3


@_register(
    "text_partial_overlap_pairs",
    f"""
    WITH {_WINNOW_FPS_SQL}
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {PARTIAL_OVERLAP_MIN_FPS}
    """,
)
def text_partial_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap (copied-passage) candidates: document pairs
    sharing ≥ {PARTIAL_OVERLAP_MIN_FPS} winnowed fingerprints — what the
    winnowing guarantee is FOR: a copied span of w+k-1+ chars between
    otherwise-different documents must collide here, while whole-doc
    hashing and even shingle-Jaccard (diluted by document length) can
    miss it. Same inverted-index join shape as dedup_shingle_jaccard,
    but over the ~1/w-sampled fingerprint relation, so the Σdf² cost
    runs on a corpus-size-divided index. The fingerprint relation is
    persisted: it feeds both join sides.
    """
    # Cache contract: pinned via session.pin (bounded self-evicting
    # registry) — no caller-side clearCache needed.
    fps = pin(text_winnowed_fingerprints(spark, sf_dir))
    a = fps.select(F.col("doc_id").alias("a_id"), "fp")
    b = fps.select(F.col("doc_id").alias("b_id"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= PARTIAL_OVERLAP_MIN_FPS)
    )

@_register(
    "text_fingerprints",
    f"""
    SELECT doc_id,
           md5({SQL_NORM}) AS fp_md5,
           sha256({SQL_NORM}) AS fp_sha256,
           length(text) AS n_raw_chars
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprints (md5 + sha256 of normalized text)
    — the join key for cross-corpus dedup at 100 TB (32/64-byte keys
    shuffle instead of documents)."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalized_text()
    return d.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.sha2(norm, 256).alias("fp_sha256"),
        F.length("text").alias("n_raw_chars"),
    )


# --------------------------------------------------------------------------
# Language-ID heuristic
# --------------------------------------------------------------------------

# Tiny stopword/character profiles — a real deployment would plug in a
# trained model (fastText et al.) behind the same column contract; the
# heuristic keeps the operator dependency-free and deterministic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "or", "is", "in", "to"],
    "es": ["el", "la", "de", "y", "en", "que", "los"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "zh": ["de5", "shi4", "bu4", "le5", "zai4"],
}


def langid_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Score each doc against each language profile (fraction of profile
    stopwords present) and pick the argmax — ties broken alphabetically.
    Pure array built-ins: array_intersect against literal arrays."""
    toks = F.array_distinct(tokens(text_col))
    scored = docs.withColumn("_toks", toks)
    pairs = [
        F.struct(
            (
                F.size(F.array_intersect("_toks", F.array(*[F.lit(s) for s in words])))
                .cast("double")
                / F.lit(len(words))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_PROFILES.items())
    ]
    best = F.array_max(F.array(*pairs))
    return scored.withColumn("_best", best).select(
        *[c for c in docs.columns],
        F.col("_best.lang").alias("pred_lang"),
        F.col("_best.score").alias("pred_score"),
    )


@_register("text_langid_heuristic", None)  # rows-only: argmax-over-structs not portably SQL
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language identification (X4). Deterministic;
    rows-only driver check (unit tests pin exact outputs)."""
    d = load_table(spark, sf_dir, "documents")
    return langid_scores(d).select("doc_id", "pred_lang", "pred_score")


@_register(
    "text_subword_token_counts",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subwords,
           len(string_split(text, ' ')) AS n_whitespace_tokens,
           n_chars
    FROM documents
    """,
)
def text_subword_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (letter runs | digit runs | single punctuation) next to the plain
    whitespace count — the cheap token-budget estimator for training-data
    pipelines. Pure regexp_extract_all, JVM-side, no Python."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
            )
        ).alias("n_subwords"),
        F.size(F.split("text", " ")).alias("n_whitespace_tokens"),
        "n_chars",
    )


# --------------------------------------------------------------------------
# Corpus-level language-model signals
# --------------------------------------------------------------------------

@_register(
    "text_unigram_perplexity",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM freq)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(EXP(-AVG(LN(CAST(c AS DOUBLE) / t))), 6) AS unigram_ppl
    FROM tok JOIN freq USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity quality signal, with the corpus itself as
    the unigram LM: ppl(doc) = exp(-mean_w ln p(w)), p(w) = freq(w)/N.
    Low-perplexity docs are made of common tokens (boilerplate-ish);
    high-perplexity docs are rare-token-heavy (noise-ish) — the standard
    two-sided quality filter.

    Scale: the vocabulary grows sublinearly in corpus size (Heaps' law),
    so `freq` is orders of magnitude smaller than the token relation;
    the token->freq equi-join shuffles on the token key where AQE's
    skew-join splits the Zipfian head, and the 1-row total is a
    broadcast nested loop. Rounded to 6 decimals on both sides: the
    log-sum order differs between engines but agrees far past 6 places.
    Capability analog: reference serves documents verbatim with no
    quality signal (main.go:268); this is the scored tier a training
    pipeline needs on top."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens()).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.exp(-F.avg(F.log(F.col("c").cast("double") / F.col("t")))), 6
            ).alias("unigram_ppl"),
        )
    )


@_register(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY w),
    tf AS (SELECT source, w, COUNT(*) AS term_freq FROM tok GROUP BY source, w),
    scored AS (
        SELECT source, w AS term, term_freq, doc_freq,
               ROUND(term_freq * LN(CAST(n_docs AS DOUBLE) / doc_freq), 6)
                 AS tfidf
        FROM tf JOIN df USING (w) CROSS JOIN n
    )
    SELECT source, term, term_freq, doc_freq, tfidf, rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY source ORDER BY tfidf DESC, term) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per source by TF-IDF (term frequency
    within the source x inverse document frequency across the corpus) —
    the "what is this data source about" fingerprint used when auditing
    a training mix.

    Scale: two token-keyed aggregations (both map-side partial), one
    vocab-sized equi-join, and a per-source WindowGroupLimit top-k —
    no corpus-sized sort. Ranking and values use the same ROUND(.,6)
    on both engines so float ulp differences cannot flip ranks."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source", F.explode(tokens()).alias("w"))
    n = d.agg(F.count("*").alias("n_docs"))
    df_ = tok.groupBy("w").agg(F.countDistinct("doc_id").alias("doc_freq"))
    tf = tok.groupBy("source", "w").agg(F.count("*").alias("term_freq"))
    scored = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            F.col("w").alias("term"),
            "term_freq",
            "doc_freq",
            F.round(
                F.col("term_freq")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
                6,
            ).alias("tfidf"),
        )
    )
    w_spec = Window.partitionBy("source").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w_spec))
        .where(F.col("rnk") <= 5)
    )


# --------------------------------------------------------------------------
# PII detection / redaction (training-corpus scrubbing)
# --------------------------------------------------------------------------
# Patterns are deliberately conservative and dialect-portable: every
# construct below behaves identically under Java's regex (Spark) and
# RE2 (DuckDB) — no lookarounds, no \b-adjacent unicode surprises, no
# possessive quantifiers. Cross-engine behavior is pinned by a parity
# unit test over synthetic PII fixtures (the corpus fixtures are clean
# by construction, so the registered query's value is the plumbing).

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PII_PHONE = r"[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}"


def pii_scrub(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document PII census + redaction: counts of email / phone /
    IPv4 matches and the text with each replaced by a typed tag.

    Redaction order matters (an email's domain could otherwise be
    half-eaten by the IP pattern): emails first, then phones, then IPs.
    Pure regexp built-ins — JVM-side, codegen'd, no Python in the row
    path; at 100 TB this is an embarrassingly-parallel map."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IPV4)).alias("n_ipv4"),
        redacted.alias("redacted"),
    )


@_register(
    "text_pii_scrub",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS INT) AS n_ipv4,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_PHONE}', '<PHONE>', 'g'),
             '{PII_IPV4}', '<IP>', 'g') AS redacted
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered PII scrub over the documents table (clean by
    construction — the oracle still value-checks counts and the
    redacted text byte-for-byte; synthetic-PII parity lives in unit
    tests)."""
    return pii_scrub(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Boilerplate n-gram signal (C4-style cross-document repetition)
# --------------------------------------------------------------------------

BOILER_MIN_DF = 3  # a shingle in >= this many docs counts as boilerplate


@_register(
    "text_boilerplate_ngram_ratio",
    f"""
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents) t
    ), sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || LEAD(w, 1) OVER win || ' ' || LEAD(w, 2) OVER win AS sh
      FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
      QUALIFY LEAD(w, 2) OVER win IS NOT NULL
    ), df AS (SELECT sh, COUNT(*) AS c FROM sh GROUP BY sh)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN c >= {BOILER_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           ROUND(CAST(SUM(CASE WHEN c >= {BOILER_MIN_DF} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS boilerplate_ratio
    FROM sh JOIN df USING (sh)
    GROUP BY doc_id
    """,
)
def text_boilerplate_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate signal (the C4 filter family): the
    fraction of a document's distinct 3-word shingles that appear in at
    least BOILER_MIN_DF documents — headers, footers, and template text
    score high and get filtered before training.

    Plan: one exploded-shingle relation feeds both the document-
    frequency aggregate and the per-doc rollup — a vocab-sized
    (Heaps-law sublinear) join on the shingle key, then one groupBy on
    doc_id. Docs with fewer than 3 words have no shingles and are
    absent from the output in both engines."""
    from .dedup import exploded_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = exploded_shingles(d)
    df_counts = sh.groupBy("sh").agg(F.count("*").alias("c"))
    return (
        sh.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("c") >= BOILER_MIN_DF, 1).otherwise(0)).alias(
                "n_boilerplate"
            ),
            F.round(
                F.sum(
                    F.when(F.col("c") >= BOILER_MIN_DF, 1).otherwise(0)
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("boilerplate_ratio"),
        )
    )


@_register(
    "text_bigram_perplexity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    big AS (
      SELECT doc_id, w AS w1, LEAD(w) OVER win AS w2
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY LEAD(w) OVER win IS NOT NULL
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
    uc AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w) AS vocab FROM tok)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(EXP(-AVG(LN((c2 + 0.5) / (c1 + 0.5 * vocab)))), 6)
             AS bigram_ppl
    FROM big JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity with add-0.5 smoothing, the corpus as its
    own LM: ppl(doc) = exp(-mean_i ln p(w_i|w_{i-1})), p = (c2+k)/(c1+kV).
    The conditional upgrade of text_unigram_perplexity — boilerplate
    scores LOW only if its word *order* is common, so templated spam
    that beats a unigram filter is caught here.

    Scale: the bigram-count relation is the big intermediate (unique
    bigrams ~ corpus tokens early, sublinear later); both count
    aggregations are map-side partial, the probability join shuffles on
    the (w1, w2) key where AQE's skew-join splits the Zipfian head, and
    the 1-row vocab total broadcasts. Same ROUND(.,6) on both engines
    so log-sum association order cannot flip hashes."""
    d = load_table(spark, sf_dir, "documents")
    # Adjacent pairs come straight from the token ARRAY: zip the array
    # with itself shifted by one (arrays_zip over two slices — all
    # codegen'd built-ins, NOT a transform() lambda, which would run
    # interpreted per element) — tokens are already ordered within the
    # array, so the posexplode + per-doc window sort the LAG formulation
    # needs is pure waste: this shape has zero exchanges before the
    # count aggregations (interleaved A/B at sf0.1: 0.26 s vs 0.57 s
    # for the pair-construction stage, identical output multiset).
    w = tokens()
    big = (
        d.filter(F.size(w) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(w, 1, F.size(w) - 1).alias("w1"),
                    F.slice(w, 2, F.size(w) - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    toks = d.select("doc_id", F.explode(w).alias("w"))
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uc = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = toks.agg(F.countDistinct("w").alias("vocab"))
    logp = F.log(
        (F.col("c2") + F.lit(0.5))
        / (F.col("c1") + F.lit(0.5) * F.col("vocab"))
    )
    return (
        big.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.exp(-F.avg(logp)), 6).alias("bigram_ppl"),
        )
    )


# --------------------------------------------------------------------------
# Distributed BPE tokenizer training (vocabulary learning on the corpus)
# --------------------------------------------------------------------------

BPE_END = "</w>"  # word-final marker (word-internal vs word-final units)


def bpe_word_counts(docs: DataFrame) -> DataFrame:
    """(word, cnt, sym) relation: distinct corpus words with frequencies
    and their initial symbol sequences (characters + end-of-word marker).

    This is the ONE corpus-sized pass of BPE training: a single
    token-count shuffle (map-side partial) collapses 100 TB of text into
    the word-TYPE relation, which is Heaps'-law sublinear (millions of
    rows, not trillions) — every merge iteration after it runs on this
    relation only."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring("word", i, F.lit(1)),
    )
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("sym", F.concat(chars, F.array(F.lit(BPE_END))))
    )


def _bpe_merge_expr(sym: Column, a: str, b: str) -> Column:
    """Fold that applies one merge (a,b)→ab left-to-right,
    non-overlapping — the exact greedy semantics of reference BPE
    ("aaa" + (a,a) → ["aa","a"]). try_element_at keeps the empty-
    accumulator probe NULL-safe under ANSI mode."""
    merged = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    spark: SparkSession, docs: DataFrame, n_merges: int = 16
) -> tuple[DataFrame, list[tuple[str, str]]]:
    """Learn a BPE merge list from a corpus (Sennrich-style vocabulary
    training), distributed: per iteration, adjacent-pair counts over the
    word-type relation (weighted by word frequency) pick the most
    frequent pair (ties broken lexicographically — deterministic on any
    cluster), and one fold expression applies the merge to every word's
    symbol sequence. Returns (merges DataFrame, merge list).

    Scale: the corpus is touched once (bpe_word_counts); each of the
    bounded ``n_merges`` iterations is one map-side-partial aggregation
    over word types plus a 1-ROW collect (the argmax pair) — nothing
    corpus- or vocab-sized ever reaches the driver. The word-type
    relation is ``localCheckpoint``ed per iteration (the same pattern
    as ``dedup.connected_components``) so round N reads materialized
    symbols instead of replaying rounds 1..N-1's fold chain — on a
    cluster, swap for reliable ``checkpoint()``."""
    words = bpe_word_counts(docs).localCheckpoint()
    merges: list[tuple[str, str]] = []
    rows = []
    for rank in range(n_merges):
        pair_counts = (
            # filter before sequence(): Spark's sequence(1, 0) counts DOWN,
            # so a fully-merged single-symbol word would index out of bounds
            words.filter(F.size("sym") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("sym") - 1),
                        lambda i: F.struct(
                            F.element_at("sym", i).alias("a"),
                            F.element_at("sym", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pair_cnt"))
        )
        top = pair_counts.orderBy(F.desc("pair_cnt"), "a", "b").limit(1).collect()
        if not top or top[0].pair_cnt < 2:
            break
        a, b, cnt = top[0].a, top[0].b, int(top[0].pair_cnt)
        merges.append((a, b))
        rows.append((rank, a, b, a + b, cnt))
        words = words.withColumn(
            "sym", _bpe_merge_expr(F.col("sym"), a, b)
        ).localCheckpoint()
    out = spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count long"
    )
    return out, merges


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list: docs → (doc_id, subwords array).

    The apply side is data-dependent loop-until-fixpoint control flow
    (each word keeps merging its lowest-rank applicable pair), so it
    runs as an Arrow-batched mapInPandas with the bounded merge table in
    the closure and a per-batch word-type memo — per-partition,
    shuffle-free, embarrassingly parallel at any scale. (A chained fold
    expression per merge rank was rejected: it re-scans every token
    once per rank and misses the rank-priority semantics.)"""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        sym = list(word) + [BPE_END]
        while len(sym) > 1:
            best = None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, sym[i], sym[i + 1])
            if best is None:
                break
            _, a, b = best
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        memo[word] = sym
        return sym

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "subwords": [
                        [
                            s
                            for w in str(t).split(" ")
                            if w
                            for s in encode_word(w, memo)
                        ]
                        for t in pdf["text"]
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, subwords array<string>"
    )


@_register("bpe_train_merges", None)  # rows-only: iterative argmax not SQL-expressible
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary training on the documents corpus:
    the learned merge table (rank, pair, merged unit, corpus pair
    frequency). Unit tests pin it against an independent pure-Python
    BPE trainer on the same word counts."""
    d = load_table(spark, sf_dir, "documents")
    out, _ = bpe_learn(spark, d, n_merges=16)
    return out


@_register("bpe_segment_token_counts", None)  # rows-only: fixpoint apply not SQL-expressible
def bpe_segment_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply round trip: learn 16 merges on the corpus, then
    segment every document with them — per-doc subword counts vs
    whitespace counts (the real token-budget number a trained tokenizer
    would bill)."""
    d = load_table(spark, sf_dir, "documents")
    _, merges = bpe_learn(spark, d, n_merges=16)
    return bpe_segment(d, merges).select(
        "doc_id",
        F.size("subwords").alias("n_bpe_tokens"),
        F.array_distinct("subwords").alias("_u"),
    ).select(
        "doc_id",
        "n_bpe_tokens",
        F.size("_u").alias("n_distinct_units"),
    )


# --------------------------------------------------------------------------
# Categorical association: mutual information + chi-square
# (round-6 fifth wave)
# --------------------------------------------------------------------------

@_register(
    "text_lang_source_mi",
    """
    WITH j AS (
      SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY lang, source
    ), cl AS (
      SELECT lang, CAST(SUM(c) AS DOUBLE) AS cl FROM j GROUP BY lang
    ), cs AS (
      SELECT source, CAST(SUM(c) AS DOUBLE) AS cs FROM j GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n FROM j
    ), grid AS (
      SELECT cl.cl, cs.cs, tot.n, CAST(COALESCE(jj.c, 0) AS DOUBLE) AS c
      FROM cl CROSS JOIN cs CROSS JOIN tot
      LEFT JOIN j jj ON jj.lang = cl.lang AND jj.source = cs.source
    )
    SELECT ROUND(SUM(CASE WHEN c > 0
                          THEN (c / n) * ln(c * n / (cl * cs))
                          ELSE 0 END), 6) AS mi_nats,
           ROUND(SUM(pow(c - cl * cs / n, 2) / (cl * cs / n)), 6) AS chi2,
           CAST(MAX(n) AS BIGINT) AS n_docs
    FROM grid
    """,
)
def text_lang_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association between two categorical corpus dimensions (language
    x source): mutual information in nats and the chi-square statistic
    — the 'is my source mix confounded with language' audit that
    decides whether per-source sampling weights must be
    language-stratified.

    Both statistics run over the FULL category grid (absent cells count
    0 — they contribute expected mass to chi-square; MI's 0*ln0 limit
    is 0). One corpus pass builds the joint counts; everything after is
    category-sized (grid = |langs| x |sources| rows, broadcast joins,
    1-row output)."""
    d = load_table(spark, sf_dir, "documents")
    j = pin(d.groupBy("lang", "source").agg(F.count("*").alias("c")))
    cl = j.groupBy("lang").agg(F.sum("c").cast("double").alias("cl"))
    cs = j.groupBy("source").agg(F.sum("c").cast("double").alias("cs"))
    tot = j.agg(F.sum("c").cast("double").alias("n"))
    grid = (
        cl.crossJoin(cs)
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(j), ["lang", "source"], "left")
        .select(
            "cl", "cs", "n", F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("c")
        )
    )
    c, n, pcl, pcs = F.col("c"), F.col("n"), F.col("cl"), F.col("cs")
    mi_term = F.when(c > 0, (c / n) * F.log(c * n / (pcl * pcs))).otherwise(0.0)
    expected = pcl * pcs / n
    chi_term = F.pow(c - expected, F.lit(2)) / expected
    return grid.agg(
        F.round(F.sum(mi_term), 6).alias("mi_nats"),
        F.round(F.sum(chi_term), 6).alias("chi2"),
        F.max(n).cast("bigint").alias("n_docs"),
    )


@_register(
    "text_pmi_collocations",
    """
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents) t
    ), uni AS (
      SELECT w, COUNT(*) AS c FROM words GROUP BY w
    ), nt AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni
    ), bi AS (
      SELECT w1, w2, COUNT(*) AS c_xy FROM (
        SELECT w AS w1, LEAD(w) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        FROM words QUALIFY w2 IS NOT NULL) t
      GROUP BY w1, w2
    ), nb AS (
      SELECT CAST(SUM(c_xy) AS BIGINT) AS n_big FROM bi
    )
    SELECT w1 || ' ' || w2 AS bigram,
           CAST(c_xy AS BIGINT) AS freq,
           ROUND(LN(CAST(c_xy AS DOUBLE) * n_tok * n_tok
                    / (CAST(u1.c AS DOUBLE) * u2.c * n_big))
                 / LN(2), 6) AS pmi
    FROM bi JOIN uni u1 ON bi.w1 = u1.w
            JOIN uni u2 ON bi.w2 = u2.w
            CROSS JOIN nt CROSS JOIN nb
    WHERE c_xy >= 5
    ORDER BY pmi DESC, bigram LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information (min bigram
    count 5): PMI = log2(p(xy) / (p(x) p(y))) — the statistically-bound
    phrase detector (multi-word expressions) corpus linguists and
    tokenizer builders run before merging frequent pairs.

    Scale shape: bigram pairs come from arrays_zip over two slices of
    the in-row token array (zero exchanges before aggregation); the
    unigram relation (vocabulary, Heaps-law sublinear) joins back onto
    bigram counts by token key; the two scalar totals broadcast. The
    TOKENIZED document relation is pin()-persisted: its three
    consumers (bigram counts, unigram counts, the population total)
    otherwise each re-scan documents and re-run the tokenizer regex —
    the r14 sf1 A/B measured the pin 13% faster at 10x data (1.40 s
    vs 1.61 s rescan, BENCH_AB_r14) with the gap in the pin's favor
    widening, and at 100 TB it removes two full scan+tokenize passes
    while pin()'s kept lineage preserves recompute-on-loss (the
    retention_dau_wau_stickiness precedent; contrast
    text_bigram_perplexity, where pinning the EXPLODED relation —
    corpus tokens, not corpus docs — measured 79% slower and rescan
    stays). PMI is computed from exact integer counts; ordering is on
    the ROUNDED value (ties broken by bigram), so top-20 selection is
    identical in both engines."""
    from ..session import pin

    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    # pin the tokenized relation UNFILTERED: the unigram counts read
    # every document (a 1-token doc contributes its token), only the
    # bigram sides apply the >= 2 gate downstream
    dt = pin(d.select(w.alias("tk")))
    tk = F.col("tk")
    pairs = dt.filter(F.size(tk) >= 2)
    big = (
        pairs.select(
            F.explode(
                F.arrays_zip(
                    F.slice(tk, 1, F.size(tk) - 1).alias("w1"),
                    F.slice(tk, 2, F.size(tk) - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    uni = (
        dt.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n_tok = uni.agg(F.sum("c").cast("bigint").alias("n_tok"))
    # total bigrams BEFORE the min-count filter (population size)
    n_big = pairs.agg(
        F.sum(F.size(tk) - 1).cast("bigint").alias("n_big")
    )
    u1 = uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")
    u2 = uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")
    pmi = F.log(
        F.col("c_xy").cast("double")
        * F.col("n_tok")
        * F.col("n_tok")
        / (F.col("c1").cast("double") * F.col("c2") * F.col("n_big"))
    ) / F.log(F.lit(2.0))
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c_xy").cast("bigint").alias("freq"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "bigram")
        .limit(20)
    )


@_register(
    "text_readability_scores",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                AS BIGINT) AS n_sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                AS BIGINT) AS n_syllables,
           ROUND(206.835
                 - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
                            / GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1))
                 - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                                AS DOUBLE)
                           / len(string_split(text, ' '))), 4)
             AS flesch_ease
    FROM documents
    """,
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document, with its three ingredient
    counts (words, sentence-ending runs, vowel-group syllable proxy) —
    the grade-level prior quality pipelines mix into curation scores.

    Scale shape: embarrassingly parallel — three regexp counts and one
    arithmetic expression per row, zero shuffles, whole-stage codegen
    end to end. The identical regular expressions ([.!?]+ sentence
    runs, [aeiouy]+ vowel groups) run in both engines, so the integer
    ingredients match exactly and the double formula follows."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)), F.lit(1)
    )
    n_syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (n_syl.cast("double") / n_words)
    )
    return d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syl.cast("bigint").alias("n_syllables"),
        F.round(flesch, 4).alias("flesch_ease"),
    )


@_register(
    "calibration_diversity_vs_canonical",
    f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS score,
             CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY {{SQL_NORM}})
                  THEN 1 ELSE 0 END AS canonical
      FROM documents
    ), binned AS (
      SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin,
             score, canonical
      FROM scored
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(score) / COUNT(*), 6) AS mean_score,
           ROUND(CAST(SUM(canonical) AS DOUBLE) / COUNT(*), 6)
             AS canonical_rate
    FROM binned GROUP BY bin ORDER BY bin
    """.replace("{SQL_NORM}", SQL_NORM),
)
def calibration_diversity_vs_canonical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability (calibration) curve: lexical-diversity score deciles
    against the empirical rate of being the canonical copy under
    normalized exact dedup — the monitoring curve that checks whether a
    quality score actually predicts the outcome it gates
    (well-calibrated: monotone rate across bins).

    Scale shape: the per-document score is row-local; the canonical
    label is one window over the normalized-text group (the same
    partitioning dedup itself shuffles on); the curve reduces to 10
    fixed-width score bins. Mean score divides an exact double sum by
    an integer count identically in both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    score = (
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    ).alias("score")
    from pyspark.sql import Window as W

    canonical = (
        F.when(
            F.col("doc_id")
            == F.min("doc_id").over(W.partitionBy(normalized_text())),
            1,
        )
        .otherwise(0)
        .alias("canonical")
    )
    scored = d.select("doc_id", score, canonical)
    binned = scored.select(
        F.least(
            F.floor(F.col("score") * 10).cast("int"), F.lit(9)
        ).alias("bin"),
        "score",
        "canonical",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("score") / F.count("*"), 6).alias("mean_score"),
            F.round(
                F.sum("canonical").cast("double") / F.count("*"), 6
            ).alias("canonical_rate"),
        )
        .select(F.col("bin").cast("int").alias("bin"), "n_docs",
                "mean_score", "canonical_rate")
        .orderBy("bin")
    )


@_register(
    "text_zipf_fit",
    """
    WITH freq AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      GROUP BY w
    ), ranked AS (
      SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS DOUBLE))
               AS lr,
             LN(CAST(c AS DOUBLE)) AS lf
      FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
           ROUND((COUNT(*) * SUM(lr * lf) - SUM(lr) * SUM(lf))
                 / (COUNT(*) * SUM(lr * lr) - SUM(lr) * SUM(lr)), 6)
             AS zipf_slope,
           ROUND((SUM(lf) - ((COUNT(*) * SUM(lr * lf) - SUM(lr) * SUM(lf))
                             / (COUNT(*) * SUM(lr * lr) - SUM(lr) * SUM(lr)))
                            * SUM(lr)) / COUNT(*), 6) AS zipf_intercept,
           ROUND(POW(COUNT(*) * SUM(lr * lf) - SUM(lr) * SUM(lf), 2)
                 / ((COUNT(*) * SUM(lr * lr) - SUM(lr) * SUM(lr))
                    * (COUNT(*) * SUM(lf * lf) - SUM(lf) * SUM(lf))), 6)
             AS r_squared
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: the log-log
    regression slope of frequency on rank (natural text ~ -1; synthetic
    or templated corpora drift far from it), with intercept and R² —
    the corpus-naturalness diagnostic run before trusting perplexity
    filters trained on real text.

    Scale shape: the token stream reduces to the vocabulary relation in
    one shuffle; the rank is a window over the vocabulary (tie-broken
    by token for determinism); slope/intercept/R² come from the
    standard least-squares sums in a single aggregation. The log-sum
    ordering difference between engines is far below the 6-decimal
    round (perplexity-tier contract)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    ranked = freq.select(
        F.log(
            F.row_number().over(W.orderBy(F.desc("c"), "w")).cast("double")
        ).alias("lr"),
        F.log(F.col("c").cast("double")).alias("lf"),
    )
    n = F.count("*")
    slr, slf = F.sum("lr"), F.sum("lf")
    srl = F.sum(F.col("lr") * F.col("lf"))
    srr = F.sum(F.col("lr") * F.col("lr"))
    sff = F.sum(F.col("lf") * F.col("lf"))
    slope = (n * srl - slr * slf) / (n * srr - slr * slr)
    return ranked.agg(
        n.cast("bigint").alias("vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((slf - slope * slr) / n, 6).alias("zipf_intercept"),
        F.round(
            F.pow(n * srl - slr * slf, F.lit(2.0))
            / ((n * srr - slr * slr) * (n * sff - slf * slf)),
            6,
        ).alias("r_squared"),
    )


# --------------------------------------------------------------------------
# RAKE keyword extraction (degree-ranked variant)
# --------------------------------------------------------------------------

# Stop tokens delimit candidate phrases (Rose et al. 2010, RAKE). The
# canonical score deg(w)/freq(w) is a rational whose float summation
# order differs between engines; ranking by the integer co-occurrence
# degree alone keeps the extractor bit-exact everywhere and preserves
# the property RAKE actually uses — words that live in long phrases
# outrank words that appear alone. Documented as the degree variant.
RAKE_STOPS = ("a", "the", "of", "and", "or", "is", "in", "to")
# Candidate phrases longer than this are discarded (standard RAKE
# practice — unbounded runs in stopword-sparse text aren't keywords).
RAKE_MAX_WORDS = 4
_RAKE_PAT = r"\b(" + "|".join(RAKE_STOPS) + r")\b"


@_register(
    "text_keyword_rake",
    f"""
    WITH segs AS (
      SELECT trim(s) AS phrase
      FROM (SELECT unnest(string_split(
                     regexp_replace(text, '{_RAKE_PAT}', '|', 'g'),
                     '|')) AS s
            FROM documents) t
      WHERE trim(s) <> ''
        AND len(string_split(trim(s), ' ')) <= {RAKE_MAX_WORDS}
    ), occ_words AS (
      SELECT unnest(string_split(phrase, ' ')) AS w,
             len(string_split(phrase, ' ')) AS plen
      FROM segs
    ), deg AS (
      SELECT w, CAST(SUM(plen) AS BIGINT) AS deg
      FROM occ_words GROUP BY w
    ), phrases AS (
      SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM segs GROUP BY phrase
    )
    SELECT p.phrase, p.n_occurrences,
           CAST(SUM(d.deg) AS BIGINT) AS score
    FROM phrases p, UNNEST(string_split(p.phrase, ' ')) AS t(w)
    JOIN deg d ON d.w = t.w
    GROUP BY p.phrase, p.n_occurrences
    ORDER BY score DESC, phrase LIMIT 20
    """,
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction, degree-ranked: stop tokens split each
    document into candidate phrases (maximal non-stopword runs), each
    word's degree is the total length of every phrase occurrence it
    appears in, and a phrase scores the sum of its words' degrees —
    top-20 phrases with occurrence counts. Runs longer than
    RAKE_MAX_WORDS tokens are discarded (standard practice).

    Plan shape: phrase extraction is IN-ROW (one regexp_replace turns
    stop tokens into delimiters, then split — no window, no
    per-position explode); degrees aggregate over the exploded word
    relation (bounded by vocabulary) and broadcast back onto the
    distinct-phrase relation; the top-20 is TakeOrdered. Scores are
    pure integers, so both engines agree exactly with no rounding."""
    d = load_table(spark, sf_dir, "documents")
    segs = (
        d.select(
            F.explode(
                F.split(F.regexp_replace(F.col("text"), _RAKE_PAT, "|"), r"\|")
            ).alias("s")
        )
        .select(F.trim(F.col("s")).alias("phrase"))
        .filter(F.col("phrase") != "")
        .filter(F.size(F.split(F.col("phrase"), " ")) <= RAKE_MAX_WORDS)
    )
    occ = segs.withColumn("ws", F.split(F.col("phrase"), " "))
    deg = (
        occ.select(F.explode("ws").alias("w"), F.size("ws").alias("plen"))
        .groupBy("w")
        .agg(F.sum("plen").cast("bigint").alias("deg"))
    )
    phrases = segs.groupBy("phrase").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    return (
        phrases.withColumn("w", F.explode(F.split(F.col("phrase"), " ")))
        .join(F.broadcast(deg), "w")
        .groupBy("phrase", "n_occurrences")
        .agg(F.sum("deg").cast("bigint").alias("score"))
        .orderBy(F.desc("score"), "phrase")
        .limit(20)
    )


@_register(
    "text_heaps_law_fit",
    """
    WITH per_doc AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      FROM documents
    ), firsts AS (
      SELECT w, MIN(doc_id) AS fd FROM (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents) t
      GROUP BY w
    ), news AS (
      SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_toks
      FROM firsts GROUP BY fd
    ), joined AS (
      SELECT p.doc_id, p.n_toks, COALESCE(n.new_toks, 0) AS new_toks
      FROM per_doc p LEFT JOIN news n USING (doc_id)
    ), cum AS (
      SELECT LN(CAST(SUM(n_toks) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE)) AS lx,
             LN(CAST(SUM(new_toks) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE)) AS ly
      FROM joined
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_checkpoints,
           ROUND((COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
                 / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx)), 6)
             AS heaps_beta,
           ROUND((SUM(ly) - ((COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
                             / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx)))
                            * SUM(lx)) / COUNT(*), 6) AS heaps_logk,
           ROUND(POW(COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly), 2)
                 / ((COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx))
                    * (COUNT(*) * SUM(ly * ly) - SUM(ly) * SUM(ly))), 6)
             AS r_squared
    FROM cum
    """,
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth, V(N) ~ K*N^beta: checkpoint
    the corpus at every document (in doc_id order), take cumulative
    token count N and cumulative distinct-vocabulary size V, and fit
    the log-log regression — the companion corpus-naturalness
    diagnostic to the Zipf fit (natural text: beta 0.4-0.6; a
    template-generated or closed-vocabulary corpus saturates early).

    Scale shape: V needs no per-checkpoint re-deduplication — each
    token contributes one first-occurrence event at MIN(doc_id), so V
    is a prefix sum of new-token counts, N a prefix sum of doc
    lengths, both through the distributed prefix-scan kernel (no
    SinglePartition window); the OLS moments follow the Zipf-tier
    log-sum contract (ordering noise far below the 6-decimal round)."""
    from .pipeline import global_prefix_sum

    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
    )
    firsts = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
        )
        .groupBy("w")
        .agg(F.min("doc_id").alias("fd"))
    )
    news = firsts.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("new_toks")
    )
    joined = per_doc.join(news, "doc_id", "left").fillna(0, ["new_toks"])
    cum = global_prefix_sum(
        joined, ["doc_id"], "n_toks", out_col="cum_toks", inclusive=True
    )
    cum = global_prefix_sum(
        cum, ["doc_id"], "new_toks", out_col="cum_vocab", inclusive=True
    )
    pts = cum.select(
        F.log(F.col("cum_toks").cast("double")).alias("lx"),
        F.log(F.col("cum_vocab").cast("double")).alias("ly"),
    )
    n = F.count("*")
    sx, sy = F.sum("lx"), F.sum("ly")
    sxy = F.sum(F.col("lx") * F.col("ly"))
    sxx = F.sum(F.col("lx") * F.col("lx"))
    syy = F.sum(F.col("ly") * F.col("ly"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pts.agg(
        n.cast("bigint").alias("n_checkpoints"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round((sy - slope * sx) / n, 6).alias("heaps_logk"),
        F.round(
            F.pow(n * sxy - sx * sy, F.lit(2.0))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r_squared"),
    )


@_register(
    "text_trigram_novelty",
    """
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents) t
    ), grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               w || ' ' || LEAD(w, 1) OVER win
                 || ' ' || LEAD(w, 2) OVER win AS g
        FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
        QUALIFY g IS NOT NULL) t
    ), firsts AS (
      SELECT g, MIN(doc_id) AS fd FROM grams GROUP BY g
    )
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_trigrams,
           CAST(SUM(CASE WHEN f.fd = gr.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN f.fd = gr.doc_id THEN 1 ELSE 0 END)
                   AS DOUBLE) / COUNT(*), 6) AS novelty_rate
    FROM grams gr JOIN firsts f ON gr.g = f.g
    GROUP BY gr.doc_id
    ORDER BY gr.doc_id
    """,
)
def text_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty vs everything EARLIER in the corpus
    (doc_id order): the fraction of a document's distinct 3-grams seen
    in no lower-id document — the memorization/contamination curve a
    curation pipeline watches (novelty collapsing to ~0 means the tail
    of the corpus restates its head; 1.0 means genuinely new text).

    'Seen earlier' needs no per-prefix re-scan: a trigram is novel in
    exactly the document that is its MIN(doc_id), so one grouped min
    plus a join-back settles every document at once — the same
    first-occurrence trick as the Heaps fit, at n-gram granularity.
    Trigrams build in-row (positional transform over the token array,
    no window); counts stay integer to one final division."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    idx = F.sequence(F.lit(1), F.size(w) - 2)
    tris = F.when(
        F.size(w) >= 3,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i),
                F.element_at(w, i + 1),
                F.element_at(w, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        d.select("doc_id", F.explode(F.array_distinct(tris)).alias("g"))
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("fd"))
    novel = F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_trigrams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count("*"), 6
            ).alias("novelty_rate"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# BM25 retrieval
# --------------------------------------------------------------------------

BM25_TERMS = ("vector", "join", "stream")  # fixed query; present across fixtures
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


@_register(
    "text_bm25_topk",
    f"""
    WITH td AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t = '{BM25_TERMS[0]}')) AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t = '{BM25_TERMS[1]}')) AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t = '{BM25_TERMS[2]}')) AS DOUBLE) AS tf2
      FROM documents
    ), st AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      FROM td
    )
    SELECT doc_id,
           ROUND(
             (ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl)))
           + (ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)))
           + (ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))),
             6) AS bm25
    FROM td, st
    WHERE tf0 + tf1 + tf2 > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi-BM25 top-k retrieval for a fixed multi-term query — the
    classic lexical ranker behind training-data retrieval/dedup-by-query
    pipelines. For a small bound query the per-term tf is a ROW-LOCAL
    `size(filter(tokens))` (no posting-list explode, no shuffle per
    term); the corpus statistics (N, avgdl, per-term df) are ONE
    aggregate row broadcast back, so the whole query is scan → one
    scalar agg → scan-side score → TakeOrdered(k). At 100 TB the only
    exchanges are the single-row statistics agg and the top-k — both
    constant-size. Score terms sum in fixed query order (left-assoc) so
    both engines produce the identical double before ROUND(_, 6);
    BM25+-style idf `ln(1 + (N - df + .5)/(df + .5))` keeps every term
    non-negative even at df > N/2 (this fixture's vocabulary is tiny, so
    every term is common)."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    dl = F.size(w).cast("double")
    def tf_of(term: str) -> Column:
        # NB: a two-parameter lambda would make F.filter bind the second
        # parameter to the ELEMENT INDEX — close over the term instead
        return F.size(F.filter(w, lambda t: t == F.lit(term))).cast("double")

    tf = [tf_of(term) for term in BM25_TERMS]
    td = d.select(
        "doc_id",
        dl.alias("dl"),
        *[c.alias(f"tf{i}") for i, c in enumerate(tf)],
    )
    n_docs = F.count("*").cast("double")
    st = td.agg(
        n_docs.alias("n_docs"),
        (F.sum("dl") / n_docs).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )

    def term_score(i: int) -> Column:
        tfi, dfi = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1) + (F.col("n_docs") - dfi + F.lit(0.5)) / (dfi + F.lit(0.5))
        )
        denom = tfi + F.lit(BM25_K1) * (
            F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
        )
        return idf * (tfi * F.lit(BM25_K1 + 1)) / denom

    score = term_score(0) + term_score(1) + term_score(2)
    return (
        td.crossJoin(F.broadcast(st))
        .filter(F.col("tf0") + F.col("tf1") + F.col("tf2") > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOPK)
    )


@_register(
    "text_next_token_table",
    """
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents) t
    ), trs AS (
      SELECT ctx, nxt, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT w || ' ' || LEAD(w, 1) OVER win AS ctx,
               LEAD(w, 2) OVER win AS nxt
        FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
        QUALIFY LEAD(w, 2) OVER win IS NOT NULL) t
      GROUP BY 1, 2
    ), tot AS (
      SELECT ctx, CAST(SUM(c) AS BIGINT) AS n FROM trs GROUP BY ctx
    ), top AS (
      SELECT ctx, CAST(COUNT(*) AS BIGINT) AS n_ctx FROM trs GROUP BY ctx
      ORDER BY CAST(SUM(c) AS BIGINT) DESC, ctx LIMIT 10
    )
    SELECT t.ctx, r.nxt, r.c,
           ROUND(CAST(r.c AS DOUBLE) / o.n, 6) AS p, rnk
    FROM (
      SELECT ctx, nxt, c, ROW_NUMBER() OVER (
               PARTITION BY ctx ORDER BY c DESC, nxt) AS rnk
      FROM trs) r
    JOIN top t ON r.ctx = t.ctx
    JOIN tot o ON r.ctx = o.ctx
    WHERE rnk <= 3
    ORDER BY t.ctx, rnk
    """,
)
def text_next_token_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-LM continuation table: for the 10 most frequent bigram
    contexts, the top-3 next tokens with their conditional
    probabilities — the inspect-your-LM-data view (what completions
    does this corpus teach?) and the exact-count core of a backoff
    n-gram model.

    Trigrams build IN-ROW (positional transform over the token array,
    no per-doc window shuffle); everything after is two token-keyed
    aggregations (map-side partial) and a per-context WindowGroupLimit
    top-k. Counts exact; the only float is one final division, rounded
    identically in both engines."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    idx = F.sequence(F.lit(1), F.size(w) - 2)
    tris = F.when(
        F.size(w) >= 3,
        F.transform(
            idx,
            lambda i: F.struct(
                F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1)
                ).alias("ctx"),
                F.element_at(w, i + 2).alias("nxt"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<ctx:string,nxt:string>>"))
    trs = (
        d.select(F.explode(tris).alias("t"))
        .select("t.ctx", "t.nxt")
        .groupBy("ctx", "nxt")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = trs.groupBy("ctx").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_ctx"),
    )
    top = tot.orderBy(F.desc("n"), "ctx").limit(10).select("ctx", "n_ctx")
    wnd = Window.partitionBy("ctx").orderBy(F.desc("c"), "nxt")
    ranked = trs.withColumn("rnk", F.row_number().over(wnd)).filter(
        F.col("rnk") <= 3
    )
    return (
        ranked.join(F.broadcast(top), "ctx")
        .join(tot.select("ctx", "n"), "ctx")
        .select(
            "ctx",
            "nxt",
            "c",
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias("p"),
            "rnk",
        )
        .orderBy("ctx", "rnk")
    )


# --------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer training
# --------------------------------------------------------------------------

UNI_MAX_PIECE = 6   # longest candidate subword
UNI_VOCAB = 48      # multi-char vocabulary budget (single chars always kept)
UNI_ITERS = 4       # Viterbi-EM rounds


def unigram_lm_learn(
    spark: SparkSession,
    docs: DataFrame,
    max_piece: int = UNI_MAX_PIECE,
    vocab_size: int = UNI_VOCAB,
    iters: int = UNI_ITERS,
) -> tuple[dict[str, float], list[float], DataFrame]:
    """SentencePiece-style unigram-LM tokenizer training, distributed.

    The corpus is touched ONCE (the word-TYPE relation with
    frequencies — Heaps-sublinear, the same single pass as BPE). Seed
    vocabulary = the ``vocab_size`` highest-weighted substrings up to
    ``max_piece`` chars plus every single character (coverage
    guarantee: Viterbi always has a path). Each Viterbi-EM round is
    one mapInPandas over word TYPES with the piece log-probs closed
    over (vocab-bounded broadcast), one piece-keyed aggregation of
    frequency-weighted counts (map-side partial), and a vocab-bounded
    collect for the M-step renormalization — nothing corpus-sized
    reaches the driver, exactly the kmeans_fit driver-loop shape.

    Hard (Viterbi) EM: E-step picks each word's best segmentation
    under current probs, M-step renormalizes piece probabilities from
    the weighted counts; the joint objective — the corpus Viterbi
    log-likelihood returned per round — is non-decreasing (pinned as a
    law). Ties break deterministically: higher score, then fewer
    pieces, then lexicographic piece sequence.

    Returns (piece→prob, per-round log-likelihoods, word-type DataFrame).
    """
    import math

    import pandas as pd

    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    subs = words.select(
        "cnt",
        F.explode(
            F.array_distinct(
                F.expr(
                    "flatten(transform(sequence(1, length(word)), i -> "
                    f"transform(sequence(1, least({max_piece}, length(word) - i + 1)), "
                    "l -> substring(word, i, l))))"
                )
            )
        ).alias("piece"),
    )
    seed = subs.groupBy("piece").agg(F.sum("cnt").alias("w"))
    # bounded collects: top-K multi-char candidates + the alphabet
    top = (
        seed.filter(F.length("piece") >= 2)
        .orderBy(F.desc("w"), "piece")
        .limit(vocab_size)
        .collect()
    )
    chars = seed.filter(F.length("piece") == 1).collect()
    weights = {r.piece: float(r.w) for r in top}
    for r in chars:
        weights[r.piece] = float(r.w)
    total = sum(weights.values())
    probs = {p: w / total for p, w in weights.items()}

    lls: list[float] = []
    for _ in range(iters):
        logp = {p: math.log(v) for p, v in probs.items() if v > 0.0}

        def viterbi_batch(batches, _logp=logp, _mx=max_piece):
            for pdf in batches:
                out_rows = []
                for word, cnt in zip(pdf["word"], pdf["cnt"]):
                    n = len(word)
                    # best[i]: (score, -n_pieces, pieces tuple) for word[:i]
                    best = [None] * (n + 1)
                    best[0] = (0.0, 0, ())
                    for i in range(1, n + 1):
                        cand = None
                        for l in range(1, min(_mx, i) + 1):
                            piece = word[i - l : i]
                            lp = _logp.get(piece)
                            if lp is None or best[i - l] is None:
                                continue
                            s, np_, seq = best[i - l]
                            t = (round(s + lp, 12), np_ - 1, seq + (piece,))
                            if cand is None or t > cand:
                                cand = t
                        best[i] = cand
                    s, np_, seq = best[n]
                    out_rows.append((word, int(cnt), list(seq), float(s)))
                yield pd.DataFrame(
                    out_rows, columns=["word", "cnt", "pieces", "logp"]
                )

        seg = words.mapInPandas(
            viterbi_batch, "word string, cnt long, pieces array<string>, logp double"
        )
        stats = seg.select(
            (F.col("logp") * F.col("cnt")).alias("wll"),
            "cnt",
            F.explode("pieces").alias("piece"),
        )
        counts = stats.groupBy("piece").agg(F.sum("cnt").alias("c"))
        ll = seg.agg(F.sum(F.col("logp") * F.col("cnt"))).collect()[0][0]
        lls.append(float(ll))
        crows = counts.collect()  # bounded by vocab size
        cmap = {r.piece: float(r.c) for r in crows}
        # M-step: exact renormalization; unused single chars keep an
        # epsilon floor so coverage never breaks
        floor = 1e-9
        new = {}
        for p in probs:
            c = cmap.get(p, 0.0)
            if c == 0.0 and len(p) == 1:
                c = floor
            new[p] = c
        z = sum(new.values())
        probs = {p: (c / z) for p, c in new.items() if c > 0.0}
    return probs, lls, words


@_register("unigram_lm_vocab", None)  # rows-only: iterative EM not SQL-expressible
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram-LM tokenizer vocabulary: every piece with
    its final probability and rank. Laws pin determinism, Viterbi-EM
    log-likelihood monotonicity, and round-trip coverage."""
    d = load_table(spark, sf_dir, "documents")
    probs, _, _ = unigram_lm_learn(spark, d)
    rows = sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(
        [(i, p, round(v, 10)) for i, (p, v) in enumerate(rows)],
        "rank int, piece string, prob double",
    )


@_register("unigram_lm_token_counts", None)  # rows-only: applies the EM fit
def unigram_lm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply round trip for the unigram tokenizer: per-doc
    piece counts under the learned vocabulary vs whitespace tokens —
    the billing number a trained SentencePiece-style tokenizer
    produces. Apply = one Viterbi pass over word TYPES (not tokens)
    joined back to the exploded corpus — the same type-level trick as
    BPE segmentation."""
    import math

    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    probs, _, words = unigram_lm_learn(spark, d)
    logp = {p: math.log(v) for p, v in probs.items()}
    mx = UNI_MAX_PIECE

    def count_batch(batches):
        for pdf in batches:
            out = []
            for word in pdf["word"]:
                n = len(word)
                best = [None] * (n + 1)
                best[0] = (0.0, 0, ())
                for i in range(1, n + 1):
                    cand = None
                    for l in range(1, min(mx, i) + 1):
                        piece = word[i - l : i]
                        lp = logp.get(piece)
                        if lp is None or best[i - l] is None:
                            continue
                        s, np_, seq = best[i - l]
                        t = (round(s + lp, 12), np_ - 1, seq + (piece,))
                        if cand is None or t > cand:
                            cand = t
                    best[i] = cand
                out.append((word, len(best[n][2])))
            yield pd.DataFrame(out, columns=["word", "n_pieces"])

    per_type = words.select("word").mapInPandas(
        count_batch, "word string, n_pieces int"
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).filter(
        F.length("word") > 0
    )
    return (
        tok.join(per_type, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_unigram_pieces"),
        )
        .orderBy("doc_id")
    )


W2V_SUBSAMPLE_T = 1e-3  # word2vec subsampling threshold
W2V_NEG_ALPHA = 0.75    # noise-distribution exponent
W2V_TABLE_TOPK = 30


@_register(
    "word2vec_sampling_tables",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n,
             CAST(SUM(POW(CAST(c AS DOUBLE), {W2V_NEG_ALPHA})) AS DOUBLE) AS z
      FROM freq
    )
    SELECT w, c,
           ROUND(CAST(c AS DOUBLE) / n, 6) AS p,
           ROUND(LEAST(1.0, SQRT({W2V_SUBSAMPLE_T} / (CAST(c AS DOUBLE) / n))
                            + {W2V_SUBSAMPLE_T} / (CAST(c AS DOUBLE) / n)), 6)
             AS keep_prob,
           ROUND(POW(CAST(c AS DOUBLE), {W2V_NEG_ALPHA}) / z, 6) AS neg_weight
    FROM freq CROSS JOIN tot
    ORDER BY c DESC, w LIMIT {W2V_TABLE_TOPK}
    """,
)
def word2vec_sampling_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two classic embedding-training preprocessing tables in one
    pass: the word2vec SUBSAMPLING keep-probability
    (sqrt(t/f) + t/f, capped at 1 — frequent words get dropped from
    training windows) and the NEGATIVE-SAMPLING noise distribution
    (f^0.75 normalized — the flattened unigram the sampler draws
    negatives from), for the corpus head.

    One token-keyed aggregation (map-side partial) to the vocab-sized
    frequency relation, one 1-row scalar total broadcast back, one
    TakeOrdered for the head — constant exchanges at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    cd = F.col("c").cast("double")
    tot = freq.agg(
        F.sum("c").cast("double").alias("n"),
        F.sum(F.pow(cd, F.lit(W2V_NEG_ALPHA))).cast("double").alias("z"),
    )
    p = cd / F.col("n")
    t = F.lit(W2V_SUBSAMPLE_T)
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "w",
            "c",
            F.round(p, 6).alias("p"),
            F.round(F.least(F.lit(1.0), F.sqrt(t / p) + t / p), 6).alias(
                "keep_prob"
            ),
            F.round(F.pow(cd, F.lit(W2V_NEG_ALPHA)) / F.col("z"), 6).alias(
                "neg_weight"
            ),
        )
        .orderBy(F.desc("c"), "w")
        .limit(W2V_TABLE_TOPK)
    )


@_register(
    "text_gopher_quality_flags",
    """
    WITH feat AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tok,
             list_aggregate(
               list_transform(string_split(text, ' '), x -> len(x)),
               'sum') AS sum_len,
             len(text) - len(replace(text, '#', ''))
               + (len(text) - len(replace(text, '...', ''))) // 3
               AS n_sym,
             len(string_split(text, chr(10))) AS n_lines,
             len(list_filter(string_split(text, chr(10)),
                             x -> x LIKE '-%' OR x LIKE '*%'))
               AS n_bullet,
             len(list_filter(['the','a','be','to','of','and',
                              'that','have','with'],
                 s -> list_contains(string_split(text, ' '), s)))
               AS n_stop
      FROM documents
    ), flags AS (
      SELECT source,
             CASE WHEN n_tok BETWEEN 50 AND 100000
                  THEN 1 ELSE 0 END AS f_words,
             CASE WHEN 3 * n_tok <= sum_len AND sum_len <= 10 * n_tok
                  THEN 1 ELSE 0 END AS f_wordlen,
             CASE WHEN 10 * n_sym < n_tok THEN 1 ELSE 0 END AS f_symbol,
             CASE WHEN 10 * n_bullet <= 9 * n_lines
                  THEN 1 ELSE 0 END AS f_bullet,
             CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS f_stop
      FROM feat
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_words) AS BIGINT) AS pass_words,
           CAST(SUM(f_wordlen) AS BIGINT) AS pass_wordlen,
           CAST(SUM(f_symbol) AS BIGINT) AS pass_symbol,
           CAST(SUM(f_bullet) AS BIGINT) AS pass_bullet,
           CAST(SUM(f_stop) AS BIGINT) AS pass_stop,
           CAST(SUM(f_words * f_wordlen * f_symbol * f_bullet * f_stop)
                AS BIGINT) AS pass_all,
           ROUND(CAST(SUM(f_words * f_wordlen * f_symbol * f_bullet
                          * f_stop) AS DOUBLE) / COUNT(*), 6)
             AS pass_rate
    FROM flags GROUP BY source ORDER BY source
    """,
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality rule sweep (Rae et al. 2021, the
    rule family Dolma/RefinedWeb inherit), aggregated per source: the
    five classic structural filters — word count in [50, 100000], mean
    word length in [3, 10], symbol-to-word ratio below 0.1 ('#' and
    '...' symbols), bullet-started line fraction at most 0.9, and the
    stop-word sanity rule (at least 2 of the 8 canonical English stop
    words present) — each reported as a per-source pass count beside
    the conjunctive pass_all and its rate. text_quality_scores is the
    per-document gate this aggregates past: a mix curator reads THIS
    table to see which source fails which rule before reweighting.

    Exactness: every rule comparison is cleared of its division —
    3*n_tok <= sum_len <= 10*n_tok for mean word length,
    10*n_sym < n_tok for the symbol ratio, 10*n_bullet <= 9*n_lines
    for the bullet fraction — so all five flags are exact integer
    predicates (no float threshold can straddle an engine's rounding);
    token/line splits are the corpus-wide single-space convention
    (dedup.tokens and its string_split SQL twin); the only double is
    the final ROUND(rate, 6).

    Scale shape: ONE documents scan; per-row features are in-row
    built-in expressions (split / transform / aggregate / filter —
    whole-stage codegen, zero Python); the rollup is one
    map-side-combinable groupBy over the bounded source domain. No
    explosion — token arrays reduce in-row to scalars before the
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    lines = F.split(F.col("text"), "\n")
    n_tok = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_sym = (
        F.length("text")
        - F.length(F.regexp_replace("text", "#", ""))
        + (
            F.length("text")
            - F.length(F.regexp_replace("text", r"\.\.\.", ""))
        ).cast("int")
        / 3
    ).cast("int")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("-") | x.startswith("*"),
        )
    )
    stops = F.array(
        *[F.lit(s) for s in ("the", "a", "be", "to", "of", "and",
                             "that", "have", "with")]
    )
    n_stop = F.size(F.array_intersect(F.array_distinct(w), stops))
    f_words = n_tok.between(50, 100000).cast("int")
    f_wordlen = ((3 * n_tok <= sum_len) & (sum_len <= 10 * n_tok)).cast(
        "int"
    )
    f_symbol = (10 * n_sym < n_tok).cast("int")
    f_bullet = (10 * n_bullet <= 9 * n_lines).cast("int")
    f_stop = (n_stop >= 2).cast("int")
    flags = d.select(
        "source",
        f_words.alias("f_words"),
        f_wordlen.alias("f_wordlen"),
        f_symbol.alias("f_symbol"),
        f_bullet.alias("f_bullet"),
        f_stop.alias("f_stop"),
    )
    allf = (
        F.col("f_words")
        * F.col("f_wordlen")
        * F.col("f_symbol")
        * F.col("f_bullet")
        * F.col("f_stop")
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("f_words").cast("bigint").alias("pass_words"),
            F.sum("f_wordlen").cast("bigint").alias("pass_wordlen"),
            F.sum("f_symbol").cast("bigint").alias("pass_symbol"),
            F.sum("f_bullet").cast("bigint").alias("pass_bullet"),
            F.sum("f_stop").cast("bigint").alias("pass_stop"),
            F.sum(allf).cast("bigint").alias("pass_all"),
            F.round(
                F.sum(allf).cast("double") / F.count("*"), 6
            ).alias("pass_rate"),
        )
        .orderBy("source")
    )
