"""Unit laws for the deterministic split/sample operators
(llmops/pipeline.py): totality, determinism, independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from console_etl_spark.llmops import pipeline
from tests.conftest import SF_TEST


def test_split_is_total_and_deterministic(spark):
    """Every document gets exactly one split, and re-running produces
    the identical assignment (no RNG anywhere)."""
    a = pipeline.split_train_test_docs(spark, SF_TEST)
    b = pipeline.split_train_test_docs(spark, SF_TEST)
    n_docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").count()
    assert a.count() == n_docs
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.select("split").distinct().count() <= 3


def test_split_band_proportions(spark):
    """75/12.5/12.5 within binomial tolerance at n=500."""
    counts = {
        r["split"]: r["n"]
        for r in pipeline.split_train_test_docs(spark, SF_TEST)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert 0.65 < counts["train"] / total < 0.85
    assert 0.05 < counts["val"] / total < 0.20
    assert 0.05 < counts["test"] / total < 0.20


def test_sample_is_subset_and_stratified(spark):
    """The sample is a subset of the corpus and en is kept at roughly
    twice the rate of other languages."""
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    sample = pipeline.stratified_sample_docs(spark, SF_TEST)
    assert sample.join(docs, "doc_id", "left_anti").count() == 0
    rates = (
        sample.groupBy("lang").agg(F.count("*").alias("kept"))
        .join(docs.groupBy("lang").agg(F.count("*").alias("n")), "lang")
        .withColumn("rate", F.col("kept") / F.col("n"))
        .collect()
    )
    by_lang = {r["lang"]: r["rate"] for r in rates}
    en = by_lang.pop("en")
    assert 0.30 < en < 0.70
    for lang, rate in by_lang.items():
        assert 0.08 < rate < 0.45, (lang, rate)


def test_split_and_sample_use_independent_nibbles(spark):
    """Sampling must not skew the split distribution (independent hash
    positions): the train share within the sample stays near 75%."""
    sample = pipeline.stratified_sample_docs(spark, SF_TEST)
    split = pipeline.split_train_test_docs(spark, SF_TEST)
    joined = sample.join(split, "doc_id")
    frac = joined.filter(F.col("split") == "train").count() / joined.count()
    assert 0.60 < frac < 0.90


def test_mix_upsample_and_downsample_laws(spark):
    """Upsampled sources appear exactly twice per doc (distinct epoch),
    downsampled sources at most once at roughly half rate."""
    from console_etl_spark.llmops import pipeline

    mix = pipeline.mix_corpus_weighted(spark, SF_TEST)
    up = mix.filter(F.col("source").isin("src0", "src1"))
    per_doc = up.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.count_distinct("epoch").alias("e")
    )
    assert per_doc.filter((F.col("n") != 2) | (F.col("e") != 2)).count() == 0
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    down_total = docs.filter(~F.col("source").isin("src0", "src1")).count()
    down_kept = mix.filter(~F.col("source").isin("src0", "src1")).count()
    assert 0.3 < down_kept / down_total < 0.7


def test_pack_assignment_laws(spark):
    """pack_id is non-decreasing along the per-language doc order and
    every document's starting offset lies inside its pack's window."""
    from console_etl_spark.llmops import pipeline

    rows = (
        pipeline.pack_sequences_by_lang(spark, SF_TEST)
        .orderBy("lang", "doc_id")
        .collect()
    )
    budget = pipeline.PACK_CONTEXT_TOKENS
    cum_by_lang: dict[str, int] = {}
    for r in rows:
        start = cum_by_lang.get(r["lang"], 0)
        assert r["pack_id"] == start // budget, r
        cum_by_lang[r["lang"]] = start + r["est_tokens"]


def test_hash_band_matches_cpython_md5(spark):
    """Cross-validate the split hash against a third implementation:
    CPython's hashlib must agree with Spark's md5 (and thus DuckDB's,
    via the oracle) on the banding nibble for arbitrary ids."""
    import hashlib
    import random

    from console_etl_spark.llmops.pipeline import hash_band, split_column

    rng = random.Random(7)
    ids = [rng.randrange(0, 2**62) for _ in range(1000)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        r["doc_id"]: (r["band"], r["split"])
        for r in df.select(
            "doc_id",
            hash_band("doc_id", 1).alias("band"),
            split_column("doc_id").alias("split"),
        ).collect()
    }
    for i in ids:
        nib = hashlib.md5(str(i).encode()).hexdigest()[0]
        split = "train" if nib < "c" else ("val" if nib < "e" else "test")
        assert got[i] == (nib, split), i


def test_export_jsonl_shards_deterministic_and_complete(spark, tmp_path):
    """The training-export writer: gzipped JSONL, content-addressed
    sharding — complete (every row lands exactly once), reproducible
    (same shard assignment across runs), and shard-count-controlled."""
    import glob
    import gzip
    import json as jsonlib

    from console_etl_spark.llmops.pipeline import export_jsonl_shards
    from console_etl_spark.session import load_table
    from tests.conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents").select("doc_id", "lang", "text")
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_jsonl_shards(docs, out1, n_shards=4)
    export_jsonl_shards(docs, out2, n_shards=4)

    shard_dirs = sorted(glob.glob(out1 + "/shard=*"))
    assert len(shard_dirs) == 4  # chosen shard count, not inherited
    for d in shard_dirs:  # one gz file per shard: co-located then streamed
        assert len(glob.glob(d + "/part-*.json.gz")) == 1

    # completeness: every doc exactly once across shards
    back = spark.read.json(out1)
    assert back.count() == docs.count()
    assert back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0

    # determinism: identical shard -> doc_id assignment across runs
    def shard_sets(out):
        sets = {}
        for d in sorted(glob.glob(out + "/shard=*")):
            sid = int(d.rsplit("=", 1)[1])
            for f in glob.glob(d + "/part-*.json.gz"):
                with gzip.open(f, "rt") as fh:
                    sets[sid] = frozenset(
                        jsonlib.loads(l)["doc_id"] for l in fh
                    )
        return sets

    assert shard_sets(out1) == shard_sets(out2)


def test_export_jsonl_shards_materializes_empty_shards(spark, tmp_path):
    """The shard=0..n-1 layout contract holds even when some shards get
    zero rows (tiny input): empty shard directories are materialized so
    loaders iterating the documented range never hit missing paths."""
    import glob

    from console_etl_spark.llmops.pipeline import export_jsonl_shards

    two = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = str(tmp_path / "tiny")
    export_jsonl_shards(two, out, n_shards=8)
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 8, dirs
    assert spark.read.json(out).count() == 2


# --------------------------------------------------------------------------
# WebDataset tar-shard export
# --------------------------------------------------------------------------

def test_export_wds_shards_complete_and_deterministic(spark, tmp_path):
    import glob
    import hashlib
    import json
    import tarfile

    from console_etl_spark.llmops import pipeline
    from console_etl_spark.session import load_table
    from tests.conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents").limit(60)
    out1 = str(tmp_path / "wds1")
    out2 = str(tmp_path / "wds2")
    pipeline.export_wds_shards(docs, out1, n_shards=4)
    pipeline.export_wds_shards(docs, out2, n_shards=4)

    files1 = sorted(glob.glob(f"{out1}/shard-*.tar"))
    assert 0 < len(files1) <= 4

    # completeness: every doc reconstructs exactly from the tars
    got = {}
    for f in files1:
        with tarfile.open(f) as tar:
            members = tar.getnames()
            # each sample's two files are adjacent (loader streams pairs)
            assert all(
                members[i + 1] == members[i][:-4] + ".json"
                for i in range(0, len(members), 2)
            )
            for m in tar.getmembers():
                if m.name.endswith(".txt"):
                    key = m.name[:-4]
                    text = tar.extractfile(m).read().decode()
                    meta = json.loads(
                        tar.extractfile(key + ".json").read().decode()
                    )
                    got[int(key)] = (text, meta["lang"], meta["source"])
    want = {
        r.doc_id: (r.text, r.lang, r.source) for r in docs.collect()
    }
    assert got == want

    # byte-determinism: the re-export is hash-identical file by file
    def digest(d):
        return {
            f.split("/")[-1]: hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(f"{d}/shard-*.tar"))
        }

    assert digest(out1) == digest(out2)


def test_observed_metrics_match_separate_aggregation(spark):
    """Observation metrics ride the actual curation job (zero extra
    scans) and must equal an independently-computed aggregate."""
    from console_etl_spark.llmops import pipeline
    from tests.conftest import SF_TEST

    rows, metrics = pipeline.curate_with_observed_metrics(spark, SF_TEST)
    assert metrics["n_groups"] == len(rows)
    assert metrics["n_docs_total"] == sum(r.n_docs for r in rows)
    assert metrics["total_chars_all"] == sum(r.total_chars for r in rows)
    assert metrics["n_splits"] == len({r.split for r in rows})


def test_export_manifest_counts_both_layouts(spark, tmp_path):
    import json

    from console_etl_spark.llmops import pipeline
    from console_etl_spark.session import load_table
    from tests.conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents").limit(40)
    wds = str(tmp_path / "wds")
    pipeline.export_wds_shards(docs, wds, n_shards=3)
    m1 = pipeline.export_manifest(wds)
    assert m1["n_samples"] == 40
    assert m1["n_shards"] == len(m1["shards"]) > 0
    assert json.load(open(f"{wds}/index.json")) == m1

    jl = str(tmp_path / "jl")
    pipeline.export_jsonl_shards(docs, jl, n_shards=3)
    m2 = pipeline.export_manifest(jl)
    assert m2["n_samples"] == 40
    assert m2["n_shards"] == 3  # hive layout materializes every shard dir


def test_pack_ffd_laws(spark):
    """FFD packing: (1) every doc assigned exactly once; (2) no
    multi-doc pack exceeds capacity (oversize docs sit alone); (3) the
    first-fit guarantee — at most ONE pack per (lang, shard) group is
    at most half full."""
    from pyspark.sql import functions as F

    from console_etl_spark.llmops.pipeline import (
        PACK_CONTEXT_TOKENS,
        pack_sequences_ffd,
    )

    out = pack_sequences_ffd(spark, SF_TEST)
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()

    loads = out.groupBy("pack_id").agg(
        F.sum("est_tokens").alias("load"), F.count("*").alias("n")
    )
    assert (
        loads.filter(
            (F.col("load") > PACK_CONTEXT_TOKENS) & (F.col("n") > 1)
        ).count()
        == 0
    )
    # first-fit half-full law, per (lang, shard) group
    half = (
        loads.withColumn(
            "grp", F.regexp_extract("pack_id", r"^(.+/\d+)/\d+$", 1)
        )
        .filter(F.col("load") * 2 <= PACK_CONTEXT_TOKENS)
        .groupBy("grp")
        .count()
    )
    assert half.filter(F.col("count") > 1).count() == 0


def test_pack_ffd_no_worse_than_streaming_packer(spark):
    """FFD's bin count is <= the streaming packer's pack count on the
    same corpus and capacity (FFD <= 11/9 OPT + 1 vs 2 OPT) — packing
    quality, measured, not assumed."""
    from console_etl_spark.llmops.pipeline import (
        pack_sequences_by_lang,
        pack_sequences_ffd,
    )

    # n_shards=1: shard-for-shard comparison (each extra shard adds at
    # least one bin of fragmentation, which at 500 docs dominates)
    ffd_packs = (
        pack_sequences_ffd(spark, SF_TEST, n_shards=1)
        .select("pack_id")
        .distinct()
        .count()
    )
    stream_packs = (
        pack_sequences_by_lang(spark, SF_TEST)
        .select("lang", "pack_id")
        .distinct()
        .count()
    )
    assert ffd_packs <= stream_packs


def test_global_prefix_sum_matches_naive_scan(spark):
    """Kernel law: global_prefix_sum == the single-partition running
    total, inclusive and exclusive, on keys far outnumbering the
    shuffle partitions (so offsets really compose across partitions)."""
    rows = [(k, (k * 37 + 11) % 13) for k in range(997)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    expected = []
    acc = 0
    for k, v in rows:  # rows are already in k order
        expected.append((k, acc, acc + v))
        acc += v
    for inclusive, col in ((False, 1), (True, 2)):
        got = {
            r["k"]: r["ps"]
            for r in pipeline.global_prefix_sum(
                df, ["k"], "v", out_col="ps", inclusive=inclusive
            ).collect()
        }
        assert got == {e[0]: e[col] for e in expected}, f"inclusive={inclusive}"


def test_global_prefix_sums_fused_equals_chained_single(spark):
    """Fused-kernel law (r13): global_prefix_sums over N value columns
    == N chained global_prefix_sum calls over the same sort order, for
    both scan directions — the one-shuffle fusion JT/CvM ride must be
    a pure plan optimization, never a semantic change."""
    rows = [
        (k, (k * 37 + 11) % 13, (k * 17 + 5) % 7, k % 3)
        for k in range(997)
    ]
    df = spark.createDataFrame(rows, "k bigint, a bigint, b bigint, c bigint")
    for inclusive in (False, True):
        fused = {
            r["k"]: (r["pa"], r["pb"], r["pc"])
            for r in pipeline.global_prefix_sums(
                df,
                ["k"],
                ["a", "b", "c"],
                ["pa", "pb", "pc"],
                inclusive=inclusive,
            ).collect()
        }
        chained = df
        for c, o in (("a", "pa"), ("b", "pb"), ("c", "pc")):
            chained = pipeline.global_prefix_sum(
                chained, ["k"], c, out_col=o, inclusive=inclusive
            )
        want = {
            r["k"]: (r["pa"], r["pb"], r["pc"]) for r in chained.collect()
        }
        assert fused == want, f"inclusive={inclusive}"


def test_global_prefix_sum_grouped_equals_per_group_scans(spark):
    """Grouped-kernel law (VERDICT r7 item 6): one grouped invocation
    == running the ungrouped kernel once per group, for both scan
    directions, with groups far outnumbered by their keys and group
    sizes unequal (so range partitions straddle group boundaries)."""
    rows = [
        (["a", "b", "c"][k % 3], k, (k * 37 + 11) % 13)
        for k in range(997)
        if not (k % 3 == 2 and k > 300)  # unequal group sizes
    ]
    df = spark.createDataFrame(rows, "g string, k bigint, v bigint")
    for inclusive in (False, True):
        got = {
            (r["g"], r["k"]): r["ps"]
            for r in pipeline.global_prefix_sum(
                df, ["k"], "v", out_col="ps", inclusive=inclusive,
                group_cols=["g"],
            ).collect()
        }
        want = {}
        for g in ("a", "b", "c"):
            per = pipeline.global_prefix_sum(
                df.filter(df.g == g), ["k"], "v", out_col="ps",
                inclusive=inclusive,
            )
            want.update({(g, r["k"]): r["ps"] for r in per.collect()})
        assert got == want, f"inclusive={inclusive}"


def test_global_prefix_sum_deterministic_under_repartitioning(spark):
    """Bit-determinism: the scan is identical whatever the input
    partitioning (the kernel re-ranges internally)."""
    rows = [(k, k % 7) for k in range(300)]
    a = spark.createDataFrame(rows, "k bigint, v bigint")
    b = spark.createDataFrame(rows, "k bigint, v bigint").repartition(17)
    ra = pipeline.global_prefix_sum(a, ["k"], "v").collect()
    rb = pipeline.global_prefix_sum(b, ["k"], "v").collect()
    assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))


def test_global_prefix_max_matches_naive_scan(spark):
    """Kernel law: global_prefix_max == the single-partition running
    max (inclusive and exclusive; NULL before the first row of the
    exclusive scan — the max identity)."""
    rows = [(k, ((k * 73 + 19) % 41) - 5) for k in range(611)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    expected = []
    best = None
    for k, v in rows:
        expected.append((k, best, v if best is None else max(best, v)))
        best = v if best is None else max(best, v)
    for inclusive, col in ((False, 1), (True, 2)):
        got = {
            r["k"]: r["pm"]
            for r in pipeline.global_prefix_max(
                df, ["k"], "v", out_col="pm", inclusive=inclusive
            ).collect()
        }
        assert got == {e[0]: e[col] for e in expected}, f"inclusive={inclusive}"


def test_funnel_dedup_stage_matches_composed_pipeline(spark):
    """The funnel's stage-3 count must equal the REAL survivor total of
    curate_corpus_end_to_end (dedup AFTER the quality gate): canonical
    = min doc_id among quality survivors of the norm group — the
    all-docs MIN under-counted whenever a group's overall-min doc
    failed quality (round-11 self-review)."""
    from console_etl_spark.llmops.pipeline import (
        curate_corpus_end_to_end,
        curation_funnel_report,
    )
    from tests.conftest import SF_TEST

    funnel = {
        r["gate"]: r["n_surviving"]
        for r in curation_funnel_report(spark, SF_TEST).collect()
    }
    survivors = sum(
        r["n_docs"] for r in curate_corpus_end_to_end(spark, SF_TEST).collect()
    )
    assert funnel["dedup_canonical"] == survivors
    # funnel monotonicity: each gate only removes
    assert (
        funnel["ingested"]
        >= funnel["length_20_80"]
        >= funnel["lexical_diversity"]
        >= funnel["dedup_canonical"]
    )


def test_export_wds_overwrite_commit_and_guards(spark, tmp_path):
    """Round-11 self-review hardening: (a) re-export with fewer shards
    removes stale tars; (b) _SUCCESS lands and export_manifest refuses
    an export without it; (c) duplicate keys fail fast instead of
    writing clobbering tar member names; (d) no in-progress temp files
    survive a completed export."""
    import glob
    import os

    import pytest

    from console_etl_spark.llmops import pipeline
    from console_etl_spark.session import load_table
    from tests.conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents").limit(40)
    out = str(tmp_path / "wds")
    pipeline.export_wds_shards(docs, out, n_shards=8)
    first = set(glob.glob(f"{out}/shard-*.tar"))
    pipeline.export_wds_shards(docs, out, n_shards=2)
    second = set(glob.glob(f"{out}/shard-*.tar"))
    assert len(first) > 2  # the 8-shard export actually spread out
    assert second and len(second) <= 2  # every 8-shard-era tar removed
    assert all(
        os.path.basename(f) in ("shard-00000.tar", "shard-00001.tar")
        for f in second
    )
    assert os.path.exists(f"{out}/_SUCCESS")
    assert not glob.glob(f"{out}/shard-*.tar.inprogress-*")
    m = pipeline.export_manifest(out)
    assert m["n_samples"] == 40

    # missing _SUCCESS with NO in-progress leftovers: refused by
    # default (ADVICE r12 — no leftovers does not prove completeness),
    # readable only on explicit allow_legacy=True with contiguous
    # shard numbering (pre-task-commit-protocol data is still readable
    # — ADVICE r11): warn-and-proceed, identical manifest
    os.remove(f"{out}/_SUCCESS")
    with pytest.raises(RuntimeError, match="allow_legacy"):
        pipeline.export_manifest(out)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        m_legacy = pipeline.export_manifest(out, allow_legacy=True)
    assert m_legacy["n_samples"] == 40
    assert any("legacy" in str(w.message) for w in caught)
    # ...and a numbering GAP is positive evidence of a torn export
    # (an interior shard's task never committed) that no legacy flag
    # can bless: displace the highest-numbered tar to shard-00005
    gap_src = sorted(glob.glob(f"{out}/shard-*.tar"))[-1]
    os.rename(gap_src, f"{out}/shard-00005.tar")
    with pytest.raises(RuntimeError, match="non-contiguous"):
        pipeline.export_manifest(out, allow_legacy=True)
    os.rename(f"{out}/shard-00005.tar", gap_src)
    # ...but an in-progress temp file is positive evidence of a torn
    # export: still refuse
    torn = f"{out}/shard-00000.tar.inprogress-deadbeef"
    open(torn, "wb").close()
    with pytest.raises(RuntimeError, match="incomplete"):
        pipeline.export_manifest(out)
    os.remove(torn)

    dup = docs.limit(5).unionAll(docs.limit(5))
    with pytest.raises(Exception, match="duplicate key"):
        pipeline.export_wds_shards(dup, str(tmp_path / "wdsdup"), n_shards=2)


def test_export_jsonl_counts_sidecar_and_shard_guard(spark, tmp_path):
    """The _counts.json sidecar (captured by observe() on the write job)
    must match the true per-shard line counts, export_manifest must use
    it, and a pre-existing 'shard' column must be rejected instead of
    silently overwritten."""
    import glob
    import gzip
    import json
    import os

    import pytest

    from console_etl_spark.llmops import pipeline
    from console_etl_spark.session import load_table
    from tests.conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents").limit(50)
    out = str(tmp_path / "jl")
    pipeline.export_jsonl_shards(docs, out, n_shards=4)
    with open(os.path.join(out, "_counts.json")) as fh:
        counts = json.load(fh)
    assert sum(counts.values()) == 50
    for d in glob.glob(f"{out}/shard=*"):
        n = 0
        for f in glob.glob(f"{d}/part-*"):
            with gzip.open(f, "rt", encoding="utf-8") as fh:
                n += sum(1 for _ in fh)
        assert counts[os.path.basename(d)] == n
    m = pipeline.export_manifest(out)
    assert m["n_samples"] == 50
    assert {s["file"]: s["n_samples"] for s in m["shards"]} == counts

    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="'shard' column"):
        pipeline.export_jsonl_shards(
            docs.withColumn("shard", F.lit(1)), str(tmp_path / "jl2")
        )


def test_connected_components_raises_on_nonconvergence(spark):
    """Silent non-convergence would return wrong component labels and
    break split_leakage_safe's near-dups-share-a-split guarantee — a
    graph whose diameter exceeds max_iter must fail loudly."""
    import pytest

    from console_etl_spark.llmops.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a_id long, b_id long"
    )
    # diameter 8 converges comfortably at the default cap
    ok = connected_components(chain)
    assert ok.select("comp").distinct().count() == 1
    with pytest.raises(RuntimeError, match="did not converge|still changing"):
        connected_components(chain, max_iter=2)
