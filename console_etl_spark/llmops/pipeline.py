"""Training-data pipeline plumbing: deterministic dataset splitting and
stratified sampling.

A 100 TB corpus can't be split with ``randomSplit`` — random assignment
is neither reproducible across runs nor stable under re-partitioning,
and a re-run would scatter documents across splits differently. The
standard trick is content-addressed assignment: hash a stable key (the
document id) with a cryptographic hash, and carve the hash space into
train/val/test bands. Every engine that can compute md5 agrees on the
assignment, forever, row by row — which also makes it oracle-checkable.

Reference parity note: the reference has no sampling/splitting at all
(SURVEY.md §2.2); these are extension-tier operators mandated by the
driver's LLM-pipeline north star.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .dedup import _SHINGLE_EDGES_SQL
from .dedup import SQL_NORM

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


def hash_band(key: Column | str, pos: int = 1) -> Column:
    """One hex nibble of md5(key) — a uniform 16-bucket assignment that
    any engine reproduces bit-identically (UTF-8 bytes of the decimal
    rendering of the key). ``pos`` selects independent nibbles for
    independent decisions (split vs sample)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(col.cast("string").cast("binary")), pos, 1)


def split_column(key: Column | str) -> Column:
    """train/val/test by md5 nibble bands 0-b / c-d / e-f (75/12.5/12.5)."""
    h = hash_band(key, 1)
    return (
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
    )


@_register(
    "split_train_test_docs",
    """
    SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                ELSE 'test' END AS split
    FROM documents ORDER BY doc_id
    """,
)
def split_train_test_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test assignment per document.

    Pure projection — no shuffle, no state, no RNG; the assignment is a
    function of doc_id alone, so it is stable under re-runs, re-orders,
    re-partitioning, and engine changes (the oracle recomputes it in SQL
    and matches row for row).
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", split_column("doc_id").alias("split")).orderBy(
        "doc_id"
    )


@_register(
    "stratified_sample_docs",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 2, 1) <
          CASE WHEN lang = 'en' THEN '8' ELSE '4' END
    ORDER BY doc_id
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~50% of English documents
    and ~25% of every other language — per-stratum rates via a hash
    threshold that varies by the stratum column.

    Same content-addressed mechanism as the splitter (second md5 nibble,
    independent of the first), so sampling composes with splitting
    without correlation. This is the scale shape for corpus re-weighting:
    a filter, not a shuffle or a per-group reservoir.
    """
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", "8").otherwise("4")
    return (
        d.filter(hash_band("doc_id", 2) < rate)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@_register(
    "mix_corpus_weighted",
    """
    WITH up AS (
      SELECT doc_id, source, 0 AS epoch FROM documents
      WHERE source IN ('src0', 'src1')
      UNION ALL
      SELECT doc_id, source, 1 AS epoch FROM documents
      WHERE source IN ('src0', 'src1')
    ), down AS (
      SELECT doc_id, source, 0 AS epoch FROM documents
      WHERE source NOT IN ('src0', 'src1')
        AND substring(md5(CAST(doc_id AS VARCHAR)), 3, 1) < '8'
    )
    SELECT doc_id, source, epoch FROM up
    UNION ALL
    SELECT doc_id, source, epoch FROM down
    ORDER BY source, doc_id, epoch
    """,
)
def mix_corpus_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: the data-mix operator of an LLM training
    pipeline. High-value sources (src0/src1) are upsampled to 2 epochs
    (duplicated with an epoch id so downstream shuffling treats copies
    as distinct examples); every other source is downsampled to ~50% by
    the same content-addressed hash band the sampler uses (third md5
    nibble — independent of split and sample decisions).

    Epoch replication is a union of projections and downsampling is a
    filter — no shuffle at all; the mix is reproducible row-for-row on
    any engine, which is exactly what you need to re-materialize a
    training mix months later.
    """
    d = load_table(spark, sf_dir, "documents")
    upsampled = F.col("source").isin("src0", "src1")
    up0 = d.filter(upsampled).select("doc_id", "source", F.lit(0).alias("epoch"))
    up1 = d.filter(upsampled).select("doc_id", "source", F.lit(1).alias("epoch"))
    down = (
        d.filter(~upsampled)
        .filter(hash_band("doc_id", 3) < "8")
        .select("doc_id", "source", F.lit(0).alias("epoch"))
    )
    return up0.unionAll(up1).unionAll(down).orderBy("source", "doc_id", "epoch")


PACK_CONTEXT_TOKENS = 8192


@_register(
    "pack_sequences_by_lang",
    f"""
    WITH t AS (
      SELECT doc_id, lang, CAST(CEIL(n_chars / 4.0) AS BIGINT) AS est_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, est_tokens,
             SUM(est_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, lang, est_tokens,
           CAST(FLOOR((cum - est_tokens) / {PACK_CONTEXT_TOKENS}.0) AS BIGINT) AS pack_id
    FROM c ORDER BY lang, doc_id
    """,
)
def pack_sequences_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs
    (context windows) per language — each document's pack is determined
    by its starting offset in the language's running token stream
    (prefix-sum over a deterministic document order, divided by the
    window size). This is the streaming concatenate-and-chunk packing
    used to build pretraining examples, as a pure window expression.

    Token counts are estimated at 4 chars/token here; swap in the exact
    counts from textan's tokenizer for production packing. One shuffle
    (partition by lang), one sort per partition — the prefix sum never
    materializes per-document state on the driver.
    """
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    est = F.ceil(F.col("n_chars") / 4.0).cast("bigint")
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.select("doc_id", "lang", est.alias("est_tokens"))
        .withColumn("cum", F.sum("est_tokens").over(w))
        .select(
            "doc_id",
            "lang",
            "est_tokens",
            F.floor(
                (F.col("cum") - F.col("est_tokens")) / float(PACK_CONTEXT_TOKENS)
            )
            .cast("bigint")
            .alias("pack_id"),
        )
        .orderBy("lang", "doc_id")
    )


@_register(
    "curate_corpus_end_to_end",
    f"""
    WITH quality AS (
      SELECT doc_id, lang, text, n_chars
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 20 AND 80
        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) > 0.25
    ), deduped AS (
      SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                 PARTITION BY {SQL_NORM}
                 ORDER BY doc_id) AS rn
        FROM quality) t
      WHERE rn = 1
    )
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM deduped
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def curate_corpus_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline — quality gate → normalized exact
    dedup (min-id survivor) → deterministic split → per-(split, lang)
    corpus stats — as ONE declarative plan. This is the "a user could
    run their whole pipeline here" query: every stage is an operator
    that also exists standalone (text_quality_scores,
    dedup_normalized_groups, split_train_test_docs), and composing them
    stays a single Catalyst plan: the quality filter pushes into the
    scan, the dedup window is the only wide shuffle, the split is a pure
    projection, and the final aggregate reuses partial aggregation.
    """
    from .dedup import normalized_text
    from .textan import tokens

    d = load_table(spark, sf_dir, "documents")
    w = tokens()
    n_tok = F.size(w)
    ttr = F.size(F.array_distinct(w)).cast("double") / n_tok
    quality = d.filter(n_tok.between(20, 80) & (ttr > 0.25))

    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(normalized_text("text")).orderBy("doc_id")
    )
    deduped = quality.withColumn("rn", rn).filter(F.col("rn") == 1)
    return (
        deduped.select(
            split_column("doc_id").alias("split"), "lang", "n_chars"
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


CHUNK_TOKENS = 32   # context-window length in whitespace tokens
CHUNK_STRIDE = 16   # 50% overlap — the standard LM-pretraining stride


def chunk_starts(
    toks: Column, window: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> Column:
    """Start positions of the sliding context windows over a token
    array: 0..max(0, n-W) step S, PLUS one tail start at n-W whenever
    (n-W) % S != 0 — so the final tokens are never dropped (the span-
    coverage guarantee). The single Spark-side definition of the grid;
    chunk_documents_sliding, the streaming twin, and the tests all share
    it (the DuckDB _CHUNK_SQL mirrors it by construction)."""
    n = F.size(toks)
    base = F.sequence(
        F.lit(0), F.greatest(F.lit(0), n - window), F.lit(stride)
    )
    tail_needed = (n > window) & ((n - window) % stride != 0)
    return F.when(
        tail_needed, F.concat(base, F.array(n - window))
    ).otherwise(base)

_CHUNK_SQL = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) > {CHUNK_TOKENS}
                       AND (len(toks) - {CHUNK_TOKENS}) % {CHUNK_STRIDE} != 0
                  THEN list_append(
                         range(0, len(toks) - {CHUNK_TOKENS} + 1,
                               {CHUNK_STRIDE}),
                         len(toks) - {CHUNK_TOKENS})
                  ELSE range(0, greatest(0, len(toks) - {CHUNK_TOKENS}) + 1,
                             {CHUNK_STRIDE}) END AS starts
      FROM t),
    s AS (
      SELECT doc_id, toks,
             unnest(starts) AS start,
             generate_subscripts(starts, 1) - 1 AS chunk_id
      FROM g)
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           array_to_string(list_slice(toks, start + 1,
                                      start + {CHUNK_TOKENS}), ' ')
             AS chunk_text,
           CAST(least({CHUNK_TOKENS}, len(toks) - start) AS BIGINT)
             AS chunk_tokens
    FROM s
"""


@_register("chunk_documents_sliding", _CHUNK_SQL)
def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: every document becomes overlapping
    CHUNK_TOKENS-token windows at CHUNK_STRIDE (50% overlap) — the
    pretraining-prep step between curation and packing (pack_sequences
    packs whole docs; this splits docs LONGER than the context window
    so no text is truncated away, the span-coverage guarantee).

    All built-ins — split/sequence/posexplode/slice/array_join — one
    narrow explode, no shuffle, no Python; at 100 TB it is an
    embarrassingly-parallel map whose output is bounded by
    n_tokens/stride rows per doc. Start grid = 0..max(0, n-W) step S,
    plus one tail start at n-W whenever (n-W) % S != 0 so the final
    tokens are never dropped (true span coverage), on both engines —
    boundary semantics (short docs → one chunk) are engine-identical."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    starts = chunk_starts(toks)
    return (
        d.select("doc_id", toks.alias("t"), starts.alias("starts"))
        .select("doc_id", "t", F.posexplode("starts").alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join(
                F.slice("t", F.col("start") + 1, F.lit(CHUNK_TOKENS)), " "
            ).alias("chunk_text"),
            F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("start"))
            .cast("long")
            .alias("chunk_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Training export: deterministic sharded JSONL — the wire format LLM
# training loaders consume. Writer, not a query: the final step after
# curate → split → chunk/pack.
# --------------------------------------------------------------------------

def _shard_column(key: str | Column, n_shards: int) -> Column:
    """The deterministic content-addressed shard id both exporters
    share: first 8 md5 nibbles of the stringified key, mod n_shards —
    one definition so the "same row, same shard" parity between the
    JSONL and WebDataset exporters cannot drift."""
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(
            F.substring(F.md5(col.cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(n_shards),
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    shard_key: str | Column = "doc_id",
    compression: str = "gzip",
) -> None:
    """Write ``df`` as exactly ``n_shards`` JSONL files (optionally
    gzipped), sharded by a DETERMINISTIC content-addressed key — the
    md5-band trick the split/sample tier uses, so the same row lands in
    the same shard on every run, any cluster, any partitioning of the
    input (``repartition(n)`` round-robin or a raw ``write.json`` would
    both scatter rows differently per run).

    Layout: ``<path>/shard=<i>/part-*.json.gz`` — one file per shard
    (hive-partitioned directories, the layout training loaders and
    ``spark.read.json(path)`` both consume natively).

    Scale shape: one hash exchange co-locating each shard's rows on one
    task, then ``partitionBy`` streams exactly one file per shard — no
    driver involvement, no small-files problem (shard count is chosen,
    not inherited), and gzip per shard keeps parallelism at the file
    level (the granularity loaders parallelize over anyway)."""
    if "shard" in df.columns:
        # withColumn would silently OVERWRITE caller data (e.g. rows
        # read back from a previous shard= layout, where the partition
        # column materializes on read) and re-shard on the derived value
        raise ValueError(
            "export_jsonl_shards: input already has a 'shard' column — "
            "rename or drop it; the exporter derives its own"
        )
    from pyspark.sql import Observation

    obs = Observation("export_jsonl_shards")
    shard = _shard_column(shard_key, n_shards)
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, F.col("shard"))
        .observe(
            obs,
            *[
                F.sum(F.when(F.col("shard") == i, 1).otherwise(0)).alias(
                    f"s{i}"
                )
                for i in range(n_shards)
            ],
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", compression)
        .json(path)
    )
    # per-shard sample counts ride the write job itself (observe() —
    # zero extra scans) and land in a sidecar export_manifest prefers
    # over re-reading and line-counting every gzipped shard. The
    # sidecar goes through the Hadoop FileSystem API like everything
    # else this exporter touches: a local open() would succeed only on
    # file:// paths, so an s3a/HDFS export would write all its data and
    # then crash (or strand a local _counts.json) at the very last step.
    import json as _json

    sc = df.sparkSession.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    counts = obs.get
    sidecar = jvm.org.apache.hadoop.fs.Path(f"{path}/_counts.json")
    fs = sidecar.getFileSystem(hconf)
    out = fs.create(sidecar, True)
    try:
        payload = _json.dumps(
            {f"shard={i}": int(counts[f"s{i}"] or 0) for i in range(n_shards)},
            indent=1,
        )
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
    # Layout contract: shard=0..n-1 ALWAYS exist, even when a shard got
    # zero rows (tiny/skewed inputs) — partitionBy writes no directory
    # for an empty shard, and a loader iterating the documented range
    # would hit missing paths. Hadoop FS mkdirs is scheme-agnostic
    # (local, HDFS, s3a) and idempotent.
    for i in range(n_shards):
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/shard={i}")
        fs = p.getFileSystem(hconf)
        if not fs.exists(p):
            fs.mkdirs(p)


def export_wds_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write a WebDataset-style export: ``shard-00000.tar`` …, each tar
    holding ``<key>.txt`` (the sample payload) and ``<key>.json`` (all
    other columns as metadata) — the sequential-tar sample format
    multimodal training loaders stream at scale.

    Determinism contract (same as export_jsonl_shards): shard = md5 of
    the key → same row, same shard, same position on every run and any
    input partitioning; tar entries are sorted by key and carry zeroed
    timestamps/owners, so re-exports are BYTE-identical (content-
    addressable artifacts).

    Scale shape: one hash exchange co-locates each shard's rows, a
    task-local sort orders them, and each executor STREAMS its shard
    tars entry-by-entry (foreachPartition over sorted rows — nothing
    shard-sized is ever held in memory, no driver involvement). Tars
    land on whatever FS ``path`` points to (shared storage on a
    cluster)."""
    import glob
    import json
    import os

    os.makedirs(path, exist_ok=True)
    # overwrite semantics (parity with export_jsonl_shards): stale tars
    # from a previous export with more shards — and any abandoned
    # in-progress temp files — must not survive into the new export, or
    # export_manifest indexes deleted data as live
    for stale in glob.glob(os.path.join(path, "shard-*.tar")) + glob.glob(
        os.path.join(path, "shard-*.tar.inprogress-*")
    ):
        os.remove(stale)
    success = os.path.join(path, "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)
    meta_cols = [c for c in df.columns if c not in (key_col, text_col)]
    prepared = (
        df.withColumn("_shard", _shard_column(key_col, n_shards))
        .repartition(n_shards, F.col("_shard"))
        .sortWithinPartitions("_shard", key_col)
    )

    def write_partition(rows) -> None:
        import io
        import tarfile
        import uuid

        tar = None
        cur = None
        tmp = final = None
        prev_key = None

        def commit():
            # task-commit protocol: each attempt writes its own temp
            # file and atomically renames on completion, so a retried
            # or speculative duplicate attempt can never interleave
            # with another writer — last complete rename wins
            tar.close()
            os.replace(tmp, final)

        try:
            for r in rows:
                sid = r["_shard"]
                if sid != cur:
                    if tar is not None:
                        commit()
                    final = os.path.join(path, f"shard-{sid:05d}.tar")
                    tmp = f"{final}.inprogress-{uuid.uuid4().hex}"
                    tar = tarfile.open(tmp, "w")
                    cur = sid
                    prev_key = None
                key = str(r[key_col])
                if key == prev_key:
                    # duplicate keys produce duplicate tar member names,
                    # which loaders silently clobber; same key -> same
                    # shard -> same (sorted) partition, so the adjacent
                    # check is complete
                    raise ValueError(
                        f"export_wds_shards: duplicate key {key!r} — "
                        f"pass a unique key_col (e.g. a composite id)"
                    )
                prev_key = key
                payload = (r[text_col] or "").encode("utf-8")
                meta = json.dumps(
                    {c: r[c] for c in meta_cols}, sort_keys=True, default=str
                ).encode("utf-8")
                for suffix, body in ((".txt", payload), (".json", meta)):
                    info = tarfile.TarInfo(name=key + suffix)
                    info.size = len(body)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    info.mode = 0o644
                    tar.addfile(info, io.BytesIO(body))
            if tar is not None:
                commit()
                tar = None
        finally:
            if tar is not None:
                # failed attempt: close and abandon the temp file (the
                # next attempt writes its own; cleanup removes leftovers)
                tar.close()

    prepared.foreachPartition(write_partition)
    # job-completion marker: a partial export (died mid-job) is now
    # distinguishable — export_manifest refuses to index without it
    with open(success, "w"):
        pass


def curate_with_observed_metrics(spark: SparkSession, sf_dir: str):
    """The curation pipeline with IN-FLIGHT observability: Spark's
    ``Observation`` attaches metric expressions to the flowing rows of
    the ACTUAL job — rows kept, docs per split, mean token count — so
    pipeline telemetry costs ZERO extra scans (a separate metrics
    aggregation would re-run the whole curation plan). Returns
    (result rows, metrics dict).

    The idiomatic-Spark point: observe() metrics are computed by the
    same tasks that produce the output, which is the only way telemetry
    stays free at 100 TB — any "run a count() after" pattern doubles
    the pipeline cost."""
    from pyspark.sql import Observation

    curated = curate_corpus_end_to_end(spark, sf_dir)
    obs = Observation("curation")
    observed = curated.observe(
        obs,
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_docs").alias("n_docs_total"),
        F.sum("total_chars").alias("total_chars_all"),
        F.approx_count_distinct("split").alias("n_splits"),  # DISTINCT is barred in observed metrics
    )
    rows = observed.collect()  # metrics materialize with the job itself
    return rows, obs.get


def export_manifest(path: str, allow_legacy: bool = False) -> dict:
    """Write ``index.json`` for a training export — per shard: file
    name, sample count, byte size — the manifest an epoch-planning
    dataloader needs for deterministic sharding without scanning data.
    Handles both export layouts: WebDataset ``shard-*.tar`` (samples =
    tar members / 2 — header seeks only on an uncompressed tar, no
    payload read; refuses a tar export missing its ``_SUCCESS`` marker
    or carrying in-progress temp files) and hive ``shard=N/*.json[.gz]``
    JSONL, whose counts come from the ``_counts.json`` sidecar the
    exporter captured from the write job itself (observe() — zero extra
    scans); only a sidecar-less legacy export falls back to
    driver-side line counting, which is data-sized work.

    ``allow_legacy`` (ADVICE r12): a ``_SUCCESS``-less tar export is
    accepted only on explicit opt-in — absence of ``.inprogress``
    leftovers does NOT prove completeness (a driver crash after some
    tars were renamed into place but before later shards' tasks ever
    started leaves no temp files behind), so the default is to refuse
    and name the flag. Even opted in, the shard numbering must be
    contiguous ``shard-00000..N``: a gap means at least one interior
    shard's task never committed, which no legacy flag can bless.
    (Contiguity alone is NOT the gate because the torn state above can
    leave a contiguous PREFIX — hence flag AND check.)"""
    import glob
    import gzip
    import json
    import os
    import re
    import tarfile

    shards = []
    tars = sorted(glob.glob(os.path.join(path, "shard-*.tar")))
    if tars:
        leftovers = glob.glob(os.path.join(path, "shard-*.tar.inprogress-*"))
        if leftovers:
            raise RuntimeError(
                f"export_manifest: {path} is an incomplete WebDataset "
                f"export (in-progress temp files present) — re-run "
                f"export_wds_shards"
            )
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            if not allow_legacy:
                raise RuntimeError(
                    f"export_manifest: {path} has no _SUCCESS marker — "
                    f"the export may be torn (a crash after some shards "
                    f"were renamed into place leaves no .inprogress "
                    f"leftovers to prove otherwise). Re-run "
                    f"export_wds_shards to stamp it, or pass "
                    f"allow_legacy=True for a known-complete "
                    f"pre-task-commit-protocol export"
                )
            ids = sorted(
                int(m.group(1))
                for f in tars
                if (m := re.fullmatch(r"shard-(\d+)\.tar", os.path.basename(f)))
            )
            if ids != list(range(len(ids))) or len(ids) != len(tars):
                raise RuntimeError(
                    f"export_manifest: {path} has no _SUCCESS marker and "
                    f"non-contiguous shard numbering ({ids[:8]}...) — an "
                    f"interior shard's task never committed; this export "
                    f"is torn and allow_legacy cannot bless it. Re-run "
                    f"export_wds_shards"
                )
            import warnings

            warnings.warn(
                f"export_manifest: {path} has no _SUCCESS marker; "
                f"accepted as a complete legacy export on explicit "
                f"allow_legacy=True (contiguous shard-00000..{len(ids) - 1}, "
                f"no in-progress temp files) — re-run export_wds_shards "
                f"to stamp it",
                stacklevel=2,
            )
    for f in tars:
        with tarfile.open(f) as tar:
            n = len(tar.getnames()) // 2
        shards.append(
            {"file": os.path.basename(f), "n_samples": n,
             "bytes": os.path.getsize(f)}
        )
    sidecar = os.path.join(path, "_counts.json")
    counts = None
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            counts = json.load(fh)
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        b = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(d, "part-*"))
        )
        if counts is not None:
            n = counts[os.path.basename(d)]
        else:
            n = 0
            for f in sorted(glob.glob(os.path.join(d, "part-*"))):
                opener = gzip.open if f.endswith(".gz") else open
                with opener(f, "rt", encoding="utf-8") as fh:
                    n += sum(1 for _ in fh)
        shards.append(
            {"file": os.path.basename(d), "n_samples": n, "bytes": b}
        )
    doc = {
        "n_shards": len(shards),
        "n_samples": sum(s["n_samples"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(path, "index.json"), "w") as out:
        json.dump(doc, out, indent=1)
    return doc


# --------------------------------------------------------------------------
# Global contiguous row numbering without a single-partition window
# (round-6 fourth wave)
# --------------------------------------------------------------------------

def global_enumerate(
    df: DataFrame,
    sort_cols: list[str],
    out_col: str = "global_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign a contiguous 0-based global index in ``sort_cols`` order
    WITHOUT collapsing the data to one partition.

    ``ROW_NUMBER() OVER (ORDER BY ...)`` plans a SinglePartition
    exchange — the canonical scale-killer for training-sample
    enumeration (every row through one task). This is the two-phase
    distributed form:

      1. range-repartition on the sort key and sort within partitions
         (global order = partition order + intra-partition order);
      2. count rows per partition — one tiny aggregate whose result is
         bounded by the partition count, never the row count — and
         prefix-sum the counts into per-partition offsets on the
         driver;
      3. broadcast-join the offsets back and add a row_number windowed
         BY PARTITION ID (so the window exchange is on _pid, parallel
         across partitions).

    The ranged intermediate is pinned so phases 2 and 3 see the same
    physical partitioning. Output is bit-deterministic when the sort
    key is total (pass a tiebreaker column).
    """
    from pyspark.sql import Window as W

    from ..session import pin

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    pin(ranged)
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    acc = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_cnt"]
    off = spark.createDataFrame(offsets, "_pid int, _off bigint")
    w = W.partitionBy("_pid").orderBy(*sort_cols)
    return (
        ranged.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col,
            (F.row_number().over(w).cast("bigint") + F.col("_off") - 1),
        )
        .drop("_pid", "_off")
    )


def global_prefix_sum(
    df: DataFrame,
    sort_cols: list[str],
    value_col: str,
    out_col: str = "prefix_sum",
    inclusive: bool = True,
    num_partitions: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Running total of ``value_col`` in global ``sort_cols`` order
    WITHOUT a SinglePartition window — the sibling of
    ``global_enumerate`` for weighted ranks (Mann-Whitney AUC, Lorenz
    curves, cumulative-capture tables).

    Same two-phase shape: range-repartition on the sort key, aggregate
    ONE partial sum per partition (driver traffic bounded by the
    partition count, never the row count), prefix-scan those partials
    into per-partition offsets, broadcast them back, and finish with a
    window keyed BY PARTITION ID so the running total parallelizes.

    Exactness contract: pass an integral ``value_col`` (counts,
    flags, scaled decimals) — partials and offsets then carry exact
    64-bit sums, reduce order-independently, and the result is
    bit-deterministic under any partitioning. ``inclusive=
    False`` yields the exclusive scan (sum of strictly-preceding rows),
    the form rank statistics want. Ties within ``sort_cols`` should be
    broken by a tiebreaker column unless the caller aggregates per key
    first (then keys are unique by construction).

    ``group_cols``: optional GROUPED variant — the running total
    restarts at zero for each distinct group, while every group still
    scans distributed (range partitioning on group+sort keys; no
    per-group SinglePartition). One kernel invocation then serves N
    logically independent scans in a single shuffle. Use it ONLY when
    every fused group is individually large: fusing Spearman's two
    rank builds this way was A/B-measured ~8% SLOWER and reverted
    (BENCH_AB_r8.md) because one of its groups was trivially small —
    the union-tagging explode taxed the big group to save nothing on
    the small one. NULL group values are kept (the offsets join is
    null-safe). The bounded collect grows to one row per (partition,
    group-touched) pair — still partition-count-bounded when groups
    are few or group-clustered by the range partitioner.
    """
    from pyspark.sql import Window as W

    from ..session import pin

    spark = df.sparkSession
    gcols = list(group_cols or [])
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(num_partitions, *gcols, *sort_cols)
        .sortWithinPartitions(*gcols, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    pin(ranged)
    # Bounded collect: one row per shuffle partition (≤ num_partitions,
    # × groups sharing a boundary partition when grouped), independent
    # of |df| — allowlisted in tests/test_plans.py.
    parts = ranged.groupBy("_pid", *gcols).agg(F.sum(value_col).alias("_s")).collect()
    acc: dict[tuple, int] = {}
    offsets = []
    for row in sorted(parts, key=lambda r: r["_pid"]):
        key = tuple(row[c] for c in gcols)
        offsets.append((row["_pid"], *key, acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + (row["_s"] or 0)
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    off_schema = StructType(
        [StructField("_pid", IntegerType())]
        + [df.schema[c] for c in gcols]
        + [StructField("_off", LongType())]
    )
    off = spark.createDataFrame(offsets, off_schema)
    end = 0 if inclusive else -1
    w = (
        W.partitionBy("_pid", *gcols)
        .orderBy(*sort_cols)
        .rowsBetween(W.unboundedPreceding, end)
    )
    if gcols:
        # NULL is a legal group value (SQL GROUP BY keeps a null
        # group); a name-equi join on the group cols would silently
        # drop those rows, so the offsets join must be null-safe.
        offa = off.select(
            F.col("_pid").alias("_opid"),
            *[F.col(c).alias(f"_og_{c}") for c in gcols],
            "_off",
        )
        cond = F.col("_pid") == F.col("_opid")
        for c in gcols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"_og_{c}"))
        joined = ranged.join(F.broadcast(offa), cond).drop(
            "_opid", *[f"_og_{c}" for c in gcols]
        )
    else:
        joined = ranged.join(F.broadcast(off), ["_pid"])
    return (
        joined.withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w).cast("bigint"), F.lit(0))
            + F.col("_off"),
        )
        .drop("_pid", "_off")
    )


def global_prefix_sums(
    df: DataFrame,
    sort_cols: list[str],
    value_cols: list[str],
    out_cols: list[str],
    inclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Multi-column sibling of ``global_prefix_sum``: N running totals
    in ONE range shuffle, one bounded collect, and one partition-keyed
    window pass — for rank statistics that need several exclusive
    prefixes over the SAME sort order (Jonckheere-Terpstra's per-group
    prefix counts, Cramer-von Mises' combined + group-1 prefixes).
    Chaining the single-column kernel N times repartitions, pins, and
    window-scans the same relation N times for no semantic gain — the
    r13 review measured JT paying four identical shuffles this way.

    Same exactness contract as the single-column kernel (integral
    value columns, 64-bit exact partials, bit-deterministic under any
    partitioning); ungrouped only — every current multi-prefix
    consumer ranks one global order."""
    from pyspark.sql import Window as W
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from ..session import pin

    assert len(value_cols) == len(out_cols) and value_cols
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    pin(ranged)
    # Bounded collect: one row per shuffle partition (<= num_partitions),
    # independent of |df| — allowlisted in tests/test_plans.py.
    parts = (
        ranged.groupBy("_pid")
        .agg(*[F.sum(c).alias(f"_s_{c}") for c in value_cols])
        .collect()
    )
    acc = [0] * len(value_cols)
    offsets = []
    for row in sorted(parts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], *acc))
        acc = [
            a + (row[f"_s_{c}"] or 0) for a, c in zip(acc, value_cols)
        ]
    off_schema = StructType(
        [StructField("_pid", IntegerType())]
        + [StructField(f"_off_{c}", LongType()) for c in value_cols]
    )
    off = spark.createDataFrame(offsets, off_schema)
    end = 0 if inclusive else -1
    w = (
        W.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(W.unboundedPreceding, end)
    )
    joined = ranged.join(F.broadcast(off), ["_pid"])
    for c, out_col in zip(value_cols, out_cols):
        joined = joined.withColumn(
            out_col,
            F.coalesce(F.sum(c).over(w).cast("bigint"), F.lit(0))
            + F.col(f"_off_{c}"),
        )
    return joined.drop("_pid", *[f"_off_{c}" for c in value_cols])


@_register(
    "enumerate_docs_global",
    """
    SELECT doc_id,
           md5('doc:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(ROW_NUMBER() OVER (
                  ORDER BY md5('doc:' || CAST(doc_id AS VARCHAR)), doc_id)
                - 1 AS BIGINT) AS global_idx
    FROM documents
    """,
)
def enumerate_docs_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle + contiguous sample index —
    the 'shuffle the corpus once, then address samples by position'
    step every epoch-based training loader needs. Order is by the md5
    of a seed-prefixed doc key (uniform, content-derived, reproducible
    anywhere); the index comes from global_enumerate, so no
    SinglePartition exchange appears anywhere in the plan (pinned by
    tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("doc:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return global_enumerate(keyed, ["shuffle_key", "doc_id"])


@_register(
    "curation_funnel_report",
    f"""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr,
             MIN(CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                       AND CAST(len(list_distinct(string_split(text, ' ')))
                                AS DOUBLE)
                           / len(string_split(text, ' ')) > 0.25
                      THEN doc_id END)
               OVER (PARTITION BY {SQL_NORM}) AS canonical_id
      FROM documents
    ), flags AS (
      SELECT CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS f_len,
             CASE WHEN n_tokens BETWEEN 20 AND 80 AND ttr > 0.25
                  THEN 1 ELSE 0 END AS f_quality,
             CASE WHEN n_tokens BETWEEN 20 AND 80 AND ttr > 0.25
                       AND doc_id = canonical_id
                  THEN 1 ELSE 0 END AS f_dedup
      FROM scored
    ), agg AS (
      SELECT COUNT(*) AS c0, SUM(f_len) AS c1, SUM(f_quality) AS c2,
             SUM(f_dedup) AS c3
      FROM flags
    )
    SELECT 0 AS stage, 'ingested' AS gate, CAST(c0 AS BIGINT) AS n_surviving FROM agg
    UNION ALL
    SELECT 1, 'length_20_80', CAST(c1 AS BIGINT) FROM agg
    UNION ALL
    SELECT 2, 'lexical_diversity', CAST(c2 AS BIGINT) FROM agg
    UNION ALL
    SELECT 3, 'dedup_canonical', CAST(c3 AS BIGINT) FROM agg
    """,
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage survivor counts of the curation funnel (ingest ->
    length gate -> lexical-diversity gate -> dedup-canonical) — the
    'where did my corpus go' report every pipeline run ships with.

    All four counts come from ONE pass: per-row flags are cumulative
    (each stage ANDs the previous), summed by a single aggregate, then
    unpivoted with stack(). The only shuffle is the dedup window's
    exchange on the normalized-content key — the report adds no pass
    over the corpus beyond what the curation itself does.

    The canonical id is the min doc_id among QUALITY SURVIVORS of the
    group (a conditional MIN window), matching the composed pipeline
    curate_corpus_end_to_end, which dedups AFTER the quality gate — a
    group whose overall-min doc fails quality still contributes its
    surviving min to stage 3 (the round-11 self-review caught the
    all-docs MIN under-counting the real pipeline; the cross-law test
    pins stage 3 == the composed pipeline's survivor total).
    Implementation + oracle changed post-window in r11 — re-window in
    r12 per the changed-since-last-driver-row rule."""
    from .dedup import normalized_text, tokens

    d = load_table(spark, sf_dir, "documents")
    toks = tokens()
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok

    from pyspark.sql import Window as W

    quality_cond = n_tok.between(20, 80) & (ttr > 0.25)
    canonical = F.min(
        F.when(quality_cond, F.col("doc_id"))
    ).over(W.partitionBy(normalized_text()))
    f_len = (n_tok.between(20, 80)).cast("int")
    f_quality = quality_cond.cast("int")
    f_dedup = (quality_cond & (F.col("doc_id") == canonical)).cast("int")
    agg = d.select(
        f_len.alias("f_len"), f_quality.alias("f_quality"), f_dedup.alias("f_dedup")
    ).agg(
        F.count("*").alias("c0"),
        F.sum("f_len").alias("c1"),
        F.sum("f_quality").alias("c2"),
        F.sum("f_dedup").alias("c3"),
    )
    return agg.selectExpr(
        """stack(4,
             0, 'ingested',          CAST(c0 AS BIGINT),
             1, 'length_20_80',      CAST(c1 AS BIGINT),
             2, 'lexical_diversity', CAST(c2 AS BIGINT),
             3, 'dedup_canonical',   CAST(c3 AS BIGINT)
           ) AS (stage, gate, n_surviving)"""
    )


PACK_FFD_SHARDS = 4


@_register("pack_sequences_ffd", None)  # rows-only: bin-packing heuristic not SQL-expressible
def pack_sequences_ffd(
    spark: SparkSession, sf_dir: str, n_shards: int = PACK_FFD_SHARDS
) -> DataFrame:
    """First-fit-decreasing sequence packing: documents are binned into
    fixed-token-budget packs per (lang, shard), placing each document
    (largest first) into the first pack with room — the tighter packing
    a training-data builder runs when pad-token waste matters more than
    stream order (FFD <= 11/9 OPT + 1 bins vs 2 OPT for the streaming
    packer pack_sequences_by_lang above).

    Scale shape: packing is inherently sequential WITHIN a bin set, so
    the group is the unit of distribution — documents are salted into
    PACK_FFD_SHARDS shards per lang (deterministic xxhash64), and FFD
    runs independently per (lang, shard) inside one applyInPandas batch.
    Group size is corpus/(langs*shards) — tune PACK_FFD_SHARDS so a
    group fits an executor; pack ids stay globally unique via the
    (lang, shard, local bin) triple. Unit laws pin: every doc assigned
    exactly once; no pack over capacity unless it is a single oversize
    document; at most one pack per group at most half full (the
    first-fit guarantee)."""
    cap = PACK_CONTEXT_TOKENS
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("est_tokens"),
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["est_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        lang = pdf["lang"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        remaining: list[int] = []
        assigned: list[int] = []
        for tok in pdf["est_tokens"]:
            tok = int(tok)
            placed = -1
            for i, rem in enumerate(remaining):
                if rem >= tok:
                    placed = i
                    break
            if placed < 0:
                remaining.append(cap - tok)  # oversize goes negative: own bin
                placed = len(remaining) - 1
            else:
                remaining[placed] -= tok
            assigned.append(placed)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "est_tokens": pdf["est_tokens"],
                "pack_id": [f"{lang}/{shard}/{b}" for b in assigned],
            }
        )

    return (
        d.groupBy("lang", "shard")
        .applyInPandas(
            ffd, "doc_id long, lang string, est_tokens long, pack_id string"
        )
        .orderBy("doc_id")
    )


def global_prefix_max(
    df: DataFrame,
    sort_cols: list[str],
    value_col: str,
    out_col: str = "prefix_max",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running MAX of an integral ``value_col`` in global ``sort_cols``
    order — same two-phase shape as ``global_prefix_sum`` (range
    partition → one partial per partition → broadcast offsets →
    partition-id-keyed window), with max composing instead of sum:
    each partition's offset is the max over all PRECEDING partitions'
    partials, and rows combine it with their within-partition running
    max via ``greatest`` (null-skipping, so the exclusive scan's first
    rows stay NULL — the max identity). Powers order-dominance
    operators: skyline/Pareto fronts, record-so-far flags, watermark
    carries."""
    from pyspark.sql import Window as W

    from ..session import pin

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    pin(ranged)
    # Bounded collect: one partial-max row per shuffle partition.
    parts = ranged.groupBy("_pid").agg(F.max(value_col).alias("_m")).collect()
    best = None
    offsets = []
    for row in sorted(parts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], best))
        if row["_m"] is not None and (best is None or row["_m"] > best):
            best = row["_m"]
    off = spark.createDataFrame(offsets, "_pid int, _off bigint")
    end = 0 if inclusive else -1
    w = (
        W.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(W.unboundedPreceding, end)
    )
    return (
        ranged.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col,
            F.greatest(F.max(value_col).over(w).cast("bigint"), F.col("_off")),
        )
        .drop("_pid", "_off")
    )


# --------------------------------------------------------------------------
# Token-budget corpus selection
# --------------------------------------------------------------------------

CURATE_TOKEN_BUDGET = 10_000  # tokens the selected sub-corpus may total


@_register(
    "curate_token_budget",
    f"""
    WITH td AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS q
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens, q,
             CAST(SUM(n_tokens) OVER (ORDER BY q DESC, doc_id) AS BIGINT)
               AS cum_tokens
      FROM td
    )
    SELECT doc_id, n_tokens, ROUND(q, 6) AS quality, cum_tokens
    FROM c
    WHERE cum_tokens <= {CURATE_TOKEN_BUDGET}
    """,
)
def curate_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-greedy corpus selection under a token budget — 'give me
    the best documents that fit N training tokens', the data-selection
    primitive behind budgeted pretraining mixes. Documents rank by a
    quality signal (type-token ratio, higher is better; doc_id breaks
    ties) and are taken greedily while the running token total stays
    within the budget.

    The running total uses the distributed prefix-scan kernel
    (global_prefix_sum: range-repartition on the sort key, one partial
    per partition to the driver, broadcast offsets, per-partition
    window) — NO SinglePartition window, so ranking a 100 TB corpus
    parallelizes across the cluster. Token counts accumulate as exact
    int64, so the budget cut is bit-deterministic under any
    partitioning."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_tok = F.size(w).cast("bigint")
    q = F.size(F.array_distinct(w)).cast("double") / F.size(w).cast("double")
    td = d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        q.alias("q"),
        (-q).alias("negq"),
    )
    cum = global_prefix_sum(
        td, ["negq", "doc_id"], "n_tokens", out_col="cum_tokens", inclusive=True
    )
    return (
        cum.filter(F.col("cum_tokens") <= CURATE_TOKEN_BUDGET)
        .select(
            "doc_id",
            "n_tokens",
            F.round("q", 6).alias("quality"),
            "cum_tokens",
        )
    )


# --------------------------------------------------------------------------
# Distribution-matched data selection (DSIR-style) and temperature mixing
# --------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"  # the distribution we want the selected data to match


@_register(
    "dsir_importance_weights",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), vocab AS (
      SELECT w,
             CAST(COUNT(*) AS BIGINT) AS c_s,
             CAST(COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS BIGINT)
               AS c_t
      FROM tok GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c_s) AS DOUBLE) AS t_s,
             CAST(SUM(c_t) AS DOUBLE) AS t_t,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM vocab
    ), ratio AS (
      SELECT w,
             LN((CAST(c_t AS DOUBLE) + 1) / (t_t + v))
               - LN((CAST(c_s AS DOUBLE) + 1) / (t_s + v)) AS lr
      FROM vocab CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(lr), 6) AS log_ir,
           ROUND(SUM(lr) / COUNT(*), 6) AS log_ir_per_token,
           CASE WHEN ROUND(SUM(lr), 6) > 0 THEN 1 ELSE 0 END AS selected
    FROM tok JOIN ratio USING (w)
    GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR-style): score
    every document by how much more likely its tokens are under a
    TARGET unigram distribution (here the corpus's target-language
    slice) than under the raw SOURCE distribution (the whole corpus).
    log_ir(doc) = Σ_w [ln p_target(w) − ln p_source(w)] with add-one
    smoothing over the shared vocabulary; positive means
    'target-like — keep/upsample when matching a pretraining mix to a
    high-quality target'.

    Scale: both distributions come from ONE token-keyed aggregation
    (map-side partial; vocabulary is Heaps-sublinear in corpus size),
    the per-token log-ratio relation is vocab-sized, and scoring is a
    single token→ratio equi-join + per-doc sum — the same join shape
    as the perplexity queries, AQE-skew-split on the Zipfian head.
    Nothing corpus-sized is broadcast or collected. The vocab relation
    feeds two branches (the tot scalar and the ratio projection) and
    is pinned so the corpus-sized explode+aggregate runs ONCE for the
    stats side — two corpus passes total (stats + scoring join), the
    floor for global-distribution scoring (the same multi-branch
    hazard dedup.py pins on exploded shingles)."""
    from ..session import pin

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    vocab = pin(
        tok.groupBy("w").agg(
            F.count("*").cast("bigint").alias("c_s"),
            F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1))
            .cast("bigint")
            .alias("c_t"),
        )
    )
    tot = vocab.agg(
        F.sum("c_s").cast("double").alias("t_s"),
        F.sum("c_t").cast("double").alias("t_t"),
        F.count("*").cast("double").alias("v"),
    )
    lr = F.log(
        (F.col("c_t").cast("double") + F.lit(1)) / (F.col("t_t") + F.col("v"))
    ) - F.log(
        (F.col("c_s").cast("double") + F.lit(1)) / (F.col("t_s") + F.col("v"))
    )
    ratio = vocab.crossJoin(F.broadcast(tot)).select("w", lr.alias("lr"))
    return (
        tok.join(ratio, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("log_ir"),
            F.round(F.sum("lr") / F.count("*"), 6).alias("log_ir_per_token"),
            F.when(F.round(F.sum("lr"), 6) > 0, 1).otherwise(0).alias("selected"),
        )
    )


MIX_TEMPERATURE_ALPHA = 0.3  # multilingual temperature-sampling exponent


@_register(
    "mix_temperature_weights",
    f"""
    WITH lt AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(total_tokens) AS DOUBLE) AS t FROM lt
    ), pw AS (
      SELECT lang, n_docs, total_tokens,
             CAST(total_tokens AS DOUBLE) / t AS p,
             POW(CAST(total_tokens AS DOUBLE) / t, {MIX_TEMPERATURE_ALPHA}) AS pa
      FROM lt CROSS JOIN tot
    ), z AS (
      SELECT CAST(SUM(pa) AS DOUBLE) AS zsum FROM pw
    )
    SELECT lang, n_docs, total_tokens,
           ROUND(p, 6) AS p_raw,
           ROUND(pa / zsum, 6) AS p_sample,
           ROUND((pa / zsum) / p, 6) AS upsample_factor
    FROM pw CROSS JOIN z
    ORDER BY lang
    """,
)
def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per language — the standard
    multilingual pretraining mix: sampling probability ∝ p^α flattens
    the head (α < 1), upweighting low-resource slices without
    truncating high-resource ones. Emits the raw token share, the
    α-tempered sampling share, and the implied up/down-sampling
    factor per language.

    Scale: one grouped aggregate to a languages-sized relation, two
    1-row scalar totals broadcast back — constant-size exchanges
    regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
    )
    tot = lt.agg(F.sum("total_tokens").cast("double").alias("t"))
    p = F.col("total_tokens").cast("double") / F.col("t")
    pw = lt.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "total_tokens",
        p.alias("p"),
        F.pow(p, F.lit(MIX_TEMPERATURE_ALPHA)).alias("pa"),
    )
    z = pw.agg(F.sum("pa").cast("double").alias("zsum"))
    return (
        pw.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.round("p", 6).alias("p_raw"),
            F.round(F.col("pa") / F.col("zsum"), 6).alias("p_sample"),
            F.round((F.col("pa") / F.col("zsum")) / F.col("p"), 6).alias(
                "upsample_factor"
            ),
        )
        .orderBy("lang")
    )


@_register(
    "split_leakage_safe",
    # shares dedup's shingle-edges fragment (threshold interpolated from
    # JACCARD_THRESHOLD) instead of a hand-maintained copy that could
    # silently diverge from the Spark side's pair generator
    f"""
    WITH RECURSIVE {_SHINGLE_EDGES_SQL}, sym AS (
      SELECT a_id AS x, b_id AS y FROM edges
      UNION SELECT b_id, a_id FROM edges
    ), reach(node, lab) AS (
      SELECT x, x FROM sym
      UNION
      SELECT s.y, r.lab FROM reach r JOIN sym s ON s.x = r.node
    ), comp AS (
      SELECT node AS doc_id, MIN(lab) AS component FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS group_id,
           CASE WHEN substring(md5(CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                WHEN substring(md5(CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    ORDER BY d.doc_id
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: documents that are
    near-duplicates of each other (shingle-jaccard >= 0.6, transitively
    closed) MUST land in the same split, or test examples leak into
    training as paraphrases. Split is therefore a function of the
    near-dup GROUP id (connected-component minimum doc_id; singletons
    are their own group), hashed with the same md5-band convention as
    split_train_test_docs — deterministic, engine-independent, stable
    under re-partitioning.

    Scale: the pair generator is the inverted-index shingle join (never
    all-pairs), components run frontier-bounded min-id propagation, and
    the final assignment is one left join of the corpus against the
    (much smaller) grouped-docs relation plus a hash projection. The
    oracle recomputes the identical closure with a recursive CTE."""
    from .dedup import connected_components, dedup_shingle_jaccard

    d = load_table(spark, sf_dir, "documents")
    pairs = dedup_shingle_jaccard(spark, sf_dir).select("a_id", "b_id")
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    gid = F.coalesce("component", "doc_id").cast("bigint")
    return (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            gid.alias("group_id"),
            split_column(gid).alias("split"),
        )
        .orderBy("doc_id")
    )
