"""Structured Streaming tests (SURVEY.md §5.2 / §7.2 step 6).

Contract under test: a bounded file-source stream driven to completion
produces exactly what the batch twin produces on the same rows —
Spark's incremental-execution guarantee. Each test streams the sf0.001
events fixture split into several files (so multiple micro-batches
actually happen) and compares against the oracle-checked batch query.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from console_etl_spark import relational, streaming
from console_etl_spark.session import load_table
from tests.conftest import SF_TEST


def write_ordered_stream(df, n_files: int, out: str) -> None:
    """Write df as n_files parquet files that a file-source stream will
    pick up in EVENT-TIME order, like a real stream.

    Two things are needed: range-partitioning on ts (so each file holds a
    contiguous time slice; part-00000 = oldest), and strictly increasing
    file mtimes in that same order — FileStreamSource orders candidate
    files by modification time, and parallel write tasks finish in random
    order, so without the utime pass whole files can arrive "late" and be
    watermark-dropped.
    """
    import glob
    import os
    import time

    df.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(out)
    base = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(out, "part-*")))):
        os.utime(f, (base + i, base + i))


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """The events fixture rewritten as 4 time-ordered parquet files (ts
    keeps whatever dtype the fixture generation carries — the stream
    reader dispatches on it) → 4 micro-batches at maxFilesPerTrigger=1."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    write_ordered_stream(spark.read.parquet(f"{SF_TEST}/events.parquet"), 4, out)
    return out


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols, ignore_index=True)


def test_stream_hourly_equals_batch(spark, events_stream_dir):
    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.hourly_counts(stream), "t_hourly"
    ).toPandas()
    want = relational.events_hourly_stats(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_sliding_equals_batch(spark, events_stream_dir):
    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.sliding_counts(stream), "t_sliding"
    ).toPandas()
    want = relational.events_sliding_windows(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_debounce_equals_batch(spark, events_stream_dir):
    """The watermarked debounce emits exactly the batch debounce:
    same kept events, same suppression counts, same window ids."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.debounce_stream(stream), "t_debounce"
    ).toPandas()
    want = relational.dedup_events_debounce(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_ohlc_equals_batch(spark, events_stream_dir):
    """Streaming OHLC bars equal the batch resample: same open (first
    by ts,event_id), high, low, close (last), count per hour."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.ohlc_stream(stream), "t_ohlc"
    ).toPandas()
    want = relational.ohlc_hourly_value(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_static_enrichment_equals_batch(spark, events_stream_dir):
    """Stream-static broadcast join: enriching the event stream against
    static customer/nation dims must equal the batch twin exactly (the
    join is stateless per micro-batch, so incremental execution cannot
    change the result)."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    customer = spark.read.parquet(f"{SF_TEST}/customer.parquet")
    nation = spark.read.parquet(f"{SF_TEST}/nation.parquet")
    got = streaming.run_to_completion(
        streaming.enrich_events(stream, customer, nation), "t_enrich"
    ).toPandas()
    want = relational.events_user_enriched_stats(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_sessions_equal_batch_sessionize(spark, events_stream_dir):
    """session_window sessions must partition events identically to the
    batch lag+cumsum sessionization: same per-user session count and the
    same multiset of session sizes."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = (
        streaming.run_to_completion(streaming.session_counts(stream), "t_sess")
        .toPandas()
        .groupby("user_id")["n_events"]
        .apply(lambda s: sorted(s.tolist()))
    )
    want = (
        relational.sessionize_events(spark, SF_TEST)
        .toPandas()
        .groupby("user_id")["n_events"]
        .apply(lambda s: sorted(s.tolist()))
    )
    pd.testing.assert_series_equal(got, want)


def test_stream_dedup_drops_cross_batch_duplicates(spark, events_stream_dir, tmp_path):
    """Re-send every event 30 minutes later (inside the 2 h watermark):
    the duplicates mostly land in *later* micro-batches than their
    originals, so dropping them requires the dedup state to survive batch
    boundaries — within-batch dedup alone would emit them."""
    from pyspark.sql import functions as F

    from pyspark.sql.types import LongType

    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(events_stream_dir)
    if isinstance(base.schema["ts"].dataType, LongType):  # old nanos fixture
        shift = F.col("ts") + F.lit(30 * 60 * 10**9)
    else:  # timestamp (NTZ or TZ) fixture
        shift = F.col("ts") + F.expr("INTERVAL 30 MINUTES")
    replay = base.withColumn("ts", shift)
    write_ordered_stream(base.unionByName(replay), 6, dup_dir)

    stream = streaming.read_events_stream(spark, dup_dir)
    got = streaming.run_to_completion(
        streaming.dedup_stream(stream), "t_dedup", output_mode="append"
    )
    n_unique = load_table(spark, SF_TEST, "events").count()
    assert spark.read.parquet(dup_dir).count() == 2 * n_unique
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_running_user_totals_stateful(spark, events_stream_dir):
    """applyInPandasWithState accumulates across micro-batches; the final
    update per user must equal a batch groupBy with the same integer-cents
    arithmetic, proving state survived batch boundaries."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    updates = streaming.run_to_completion(
        streaming.running_user_totals(stream), "t_totals", output_mode="update"
    ).toPandas()
    # update mode emits one row per user per touched micro-batch — the
    # final state is the row with the highest n_events per user.
    got = (
        updates.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id", ignore_index=True)
    )

    e = load_table(spark, SF_TEST, "events").toPandas()
    e["cents"] = e["value"].mul(100).round().astype("int64")
    want = (
        e.groupby("user_id", as_index=False)
        .agg(
            n_events=("event_id", "size"),
            total_cents=("cents", "sum"),
            max_event_id=("event_id", "max"),
        )
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events", "total_cents", "max_event_id"]],
        want,
        check_dtype=False,
    )
    # multiple micro-batches really happened: some user got >1 update row
    assert len(updates) > len(got)


# --------------------------------------------------------------------------
# Continuous catalog ingest (streaming S3 analog)
# --------------------------------------------------------------------------

def test_stream_ingest_publishes_snapshots(spark, tmp_path):
    """Two catalog dumps arriving over time → two snapshot versions, each
    a complete consistent catalog; re-running with nothing new publishes
    nothing (the 304 analog via checkpoint)."""
    import json

    from console_etl_spark.store import SnapshotStore

    stream_dir = tmp_path / "all_json"
    stream_dir.mkdir()
    store = SnapshotStore(str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    def dump(fname: str, rows):
        with open(stream_dir / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    dump("v1.json", [
        {"schema": "olm.bundle", "package": "pkgA", "name": "b1", "x": 1},
        {"schema": "olm.package", "name": "pkgA", "icon": None},
    ])
    q = streaming.stream_ingest_metas(spark, str(stream_dir), store, "cat", ckpt)
    q.awaitTermination()
    v1 = store.current("cat")
    assert v1 is not None
    got = {(r.package, r.schema, r.name) for r in store.read(spark, "cat").collect()}
    assert got == {("pkgA", "olm.bundle", "b1"), ("pkgA", "olm.package", "pkgA")}

    # second dump: catalog changed upstream
    dump("v2.json", [
        {"schema": "olm.bundle", "package": "pkgB", "name": "b2", "x": 2},
    ])
    q = streaming.stream_ingest_metas(spark, str(stream_dir), store, "cat", ckpt)
    q.awaitTermination()
    v2 = store.current("cat")
    assert v2.version != v1.version
    got2 = {(r.package, r.schema, r.name) for r in store.read(spark, "cat").collect()}
    assert got2 == {("pkgB", "olm.bundle", "b2")}

    # nothing new: no batch runs, version unchanged (304 analog)
    q = streaming.stream_ingest_metas(spark, str(stream_dir), store, "cat", ckpt)
    q.awaitTermination()
    assert store.current("cat").version == v2.version


def test_stream_stream_join_equals_batch_range_join(spark, events_stream_dir):
    """The streaming interval join must produce exactly the batch range
    join's pairs once the bounded stream completes."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.signup_purchase_join(stream), "t_ssj", output_mode="append"
    ).toPandas()
    want = relational.range_join_purchase_after_signup(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_stream_left_outer_join_equals_batch(spark, events_stream_dir):
    """Watermarked LEFT OUTER interval join (VERDICT r2 item 7):
    - matched rows must equal the batch inner range join exactly;
    - every emitted NULL-purchase row must be a true batch-unmatched signup;
    - every batch-unmatched signup whose join window closed before the
      final watermark must have been emitted (state eviction emits it).
    """
    import glob
    import os

    from pyspark.sql import functions as F

    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.signup_purchase_join(stream, how="left_outer"),
        "t_ssloj",
        output_mode="append",
    ).toPandas()

    matched = got[got.purchase_event.notna()].drop(columns=["s_ts", "p_ts"])
    want_inner = relational.range_join_purchase_after_signup(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(
        _sorted(matched), _sorted(want_inner), check_dtype=False
    )

    # batch ground truth for unmatched signups
    e = load_table(spark, SF_TEST, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_event"), F.col("ts").alias("s_ts")
    )
    batch_unmatched = {
        r.signup_event
        for r in signups.join(
            spark.createDataFrame(want_inner).select("signup_event").distinct(),
            "signup_event",
            "left_anti",
        ).collect()
    }
    emitted_unmatched = got[got.purchase_event.isna()]
    assert set(emitted_unmatched.signup_event) <= batch_unmatched

    # completeness bound: the final watermark is (max event time seen
    # BEFORE the last micro-batch) - 2h; any unmatched signup whose 24h
    # window ended before it must have been evicted-and-emitted.
    from pyspark.sql.types import LongType

    files = sorted(glob.glob(os.path.join(events_stream_dir, "part-*")))
    head = spark.read.parquet(*files[:-1])
    if isinstance(head.schema["ts"].dataType, LongType):  # old nanos fixture
        max_ts = F.timestamp_micros(F.expr("max(ts) div 1000"))
    else:
        max_ts = F.max("ts").cast("timestamp")
    wm = head.select(max_ts.alias("m")).collect()[0].m
    threshold = wm - pd.Timedelta(hours=26)  # 2h watermark + 24h window
    must_emit = {
        r.signup_event
        for r in signups.filter(
            F.col("s_ts") < F.lit(threshold)
        ).collect()
        if r.signup_event in batch_unmatched
    }
    assert must_emit, "fixture should contain closed-window unmatched signups"
    assert must_emit <= set(emitted_unmatched.signup_event)


def test_stream_stream_full_outer_join_subset_laws(spark, events_stream_dir):
    """FULL OUTER completes the join matrix: matched rows equal the batch
    inner join; every NULL-padded row on either side corresponds to a
    truly unmatched batch row."""
    from pyspark.sql import functions as F

    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.signup_purchase_join(stream, how="full_outer"),
        "t_ssfoj",
        output_mode="append",
    ).toPandas()

    matched = got[got.purchase_event.notna() & got.signup_event.notna()].drop(
        columns=["s_ts", "p_ts"]
    )
    want_inner = relational.range_join_purchase_after_signup(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(
        _sorted(matched), _sorted(want_inner), check_dtype=False
    )

    e = load_table(spark, SF_TEST, "events")
    matched_signups = set(want_inner.signup_event)
    matched_purchases = set(want_inner.purchase_event)
    all_signups = {
        r.event_id for r in e.filter(F.col("event_type") == "signup").collect()
    }
    all_purchases = {
        r.event_id for r in e.filter(F.col("event_type") == "purchase").collect()
    }
    unmatched_s = got[got.purchase_event.isna()]
    unmatched_p = got[got.signup_event.isna()]
    assert set(unmatched_s.signup_event) <= all_signups - matched_signups
    assert set(unmatched_p.purchase_event) <= all_purchases - matched_purchases
    # both sides actually emitted some evicted-unmatched rows
    assert len(unmatched_s) > 0 and len(unmatched_p) > 0
    # ADVICE r3: an evicted unmatched purchase still knows its user — the
    # join key must coalesce from whichever side is present
    assert got.user_id.notna().all()


def test_stream_dedup_ingest_matches_batch_and_resumes(spark, tmp_path):
    """Online exact dedup: overlapping document files streamed in →
    output holds exactly the batch-dedup survivor set; re-running with
    the same checkpoint ingests nothing new; a NEW file with previously
    seen content is suppressed by the persistent index."""
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    from console_etl_spark.llmops.dedup import normalized_text

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # file 1: first 300 docs; file 2: docs 200-500 (100-doc overlap in
    # ids, plus whatever textual dups the fixture already contains)
    base = time.time()
    for i, cond in enumerate(
        [F.col("doc_id") < 300, F.col("doc_id") >= 200]
    ):
        f = stream_dir / f"batch{i}.parquet"
        docs.filter(cond).coalesce(1).write.mode("overwrite").parquet(str(f))
        for p in glob.glob(str(f / "part-*")):
            os.utime(p, (base + i, base + i))

    def run():
        q = streaming.stream_dedup_ingest(
            spark, str(stream_dir) + "/*", out, idx, ckpt
        )
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(out)
    # batch twin: the REGISTERED oracle-checked content-hash index query
    # (llmops.dedup.dedup_content_hash_index) — stream must equal batch
    from console_etl_spark.llmops.dedup import dedup_content_hash_index

    expected = dedup_content_hash_index(spark, SF_TEST).select("doc_id")
    assert got.count() == got.select("doc_id").distinct().count()
    missing = expected.join(got, "doc_id", "left_anti")
    assert missing.count() == 0
    extra = got.join(expected, "doc_id", "left_anti")
    assert extra.count() == 0

    # idempotent restart: same checkpoint, no new files -> no change
    n_before = got.count()
    run()
    assert spark.read.parquet(out).count() == n_before

    # replay file with already-seen content under a NEW name: the
    # persistent index (not the checkpoint) must suppress every row
    f = stream_dir / "batch9.parquet"
    docs.filter(F.col("doc_id") < 50).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(f))
    for p in glob.glob(str(f / "part-*")):
        os.utime(p, (base + 9, base + 9))
    run()
    assert spark.read.parquet(out).count() == n_before


def test_split_column_is_streaming_compatible(spark, tmp_path):
    """The deterministic splitter is a stateless projection, so the SAME
    expression runs under readStream unchanged and assigns every
    document the same split it gets in batch."""
    from pyspark.sql import functions as F

    from console_etl_spark.llmops.pipeline import split_column

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    src = str(tmp_path / "docs")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema(docs.schema)
        .parquet(src + "/*")
        .select("doc_id", split_column("doc_id").alias("split"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)
    batch = docs.select("doc_id", split_column("doc_id").alias("split"))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_parquet_sink_exactly_once_across_restart(spark, tmp_path):
    """Native file sink + checkpoint = end-to-end exactly-once: a second
    run with the same checkpoint re-emits NOTHING for already-committed
    source files, and newly-arrived files are picked up incrementally —
    the final sink equals one batch read of all input, no duplicates."""
    import glob
    import os
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, SF_TEST, "events")
    first_half = events.filter("event_id % 2 = 0")
    second_half = events.filter("event_id % 2 = 1")
    first_half.coalesce(2).write.mode("overwrite").parquet(src)

    def run_once():
        stream = streaming.read_events_stream(spark, src, max_files_per_trigger=1)
        streaming.write_stream_parquet(stream, out, ckpt)

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first_half.count()

    # restart with NO new input: nothing re-emitted
    run_once()
    assert spark.read.parquet(out).count() == n1

    # land the second half as new files (bump mtimes so the source's
    # mtime-ordered listing sees them as new arrivals), restart again
    second_half.coalesce(2).write.mode("append").parquet(src)
    now = time.time() + 5
    for f in glob.glob(os.path.join(src, "part-*")):
        os.utime(f, (now, now))
    run_once()

    sink = spark.read.parquet(out)
    assert sink.count() == events.count()
    assert sink.select("event_id").distinct().count() == events.count()
    assert sink.exceptAll(events).count() == 0


def test_stream_dq_monitor_counts_match_batch(spark, events_stream_dir, tmp_path):
    """The per-batch violation counts summed over all micro-batches must
    equal one batch evaluation of the same rules over the whole fixture,
    and batch_rows must account for every event exactly once."""
    from pyspark.sql import functions as F

    metrics = str(tmp_path / "metrics")
    q = streaming.stream_dq_monitor(
        spark, events_stream_dir, metrics, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    m = spark.read.parquet(metrics)
    assert {r.rule for r in m.select("rule").distinct().collect()} == {
        "null_pk", "null_ts", "negative_value", "unknown_event_type"
    }
    # >1 micro-batch actually happened (4 source files, 1 per trigger)
    assert m.select("epoch_id").distinct().count() >= 2

    e = load_table(spark, SF_TEST, "events")
    want = e.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("value") < 0, 1)).alias("neg"),
        F.count(
            F.when(~F.col("event_type").isin("view", "click", "purchase", "signup"), 1)
        ).alias("unk"),
    ).collect()[0]
    got = {
        r.rule: r.total
        for r in m.groupBy("rule").agg(F.sum("n_violations").alias("total")).collect()
    }
    rows_accounted = (
        m.filter("rule = 'null_pk'").agg(F.sum("batch_rows")).collect()[0][0]
    )
    assert rows_accounted == want.n
    assert got["negative_value"] == want.neg
    assert got["unknown_event_type"] == want.unk
    assert got["null_pk"] == 0 and got["null_ts"] == 0


def test_chunking_is_streaming_compatible(spark, tmp_path):
    """Context-window chunking is a stateless narrow op (split/sequence/
    posexplode/slice), so the SAME expression pipeline runs under
    readStream unchanged — chunking happens at ingest in production."""
    from pyspark.sql import functions as F

    from console_etl_spark.llmops.pipeline import (
        CHUNK_TOKENS,
        chunk_documents_sliding,
        chunk_starts,
    )

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    src = str(tmp_path / "docs")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")

    toks = F.split("text", " ")
    starts = chunk_starts(toks)  # the ONE grid definition, shared
    q = (
        spark.readStream.schema(docs.schema)
        .parquet(src + "/*")
        .select("doc_id", toks.alias("t"), starts.alias("starts"))
        .select("doc_id", "t", F.posexplode("starts").alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join(
                F.slice("t", F.col("start") + 1, F.lit(CHUNK_TOKENS)), " "
            ).alias("chunk_text"),
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)
    batch = chunk_documents_sliding(spark, SF_TEST).drop("chunk_tokens")
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_stream_starts_against_empty_directory(spark, tmp_path):
    """A stream must be startable BEFORE any data arrives (the normal
    deployment order: deploy the job, then producers write). The schema
    probe has nothing to read on an empty dir, so the reader falls back
    to the declared default schema — and a file arriving later with that
    physical type flows through the same normalized plan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "empty_src"
    src.mkdir()
    # starts clean on a dir with zero files
    stream = streaming.read_events_stream(spark, str(src))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"

    # a long-nanos file arriving later is picked up and normalized
    ns = int(pd.Timestamp("2024-03-01 10:30:00").value)  # ns since epoch
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array(np.array([ns], dtype=np.int64), pa.int64()),
                "user_id": pa.array([7], pa.int64()),
                "event_type": pa.array(["view"]),
                "value": pa.array([1.5], pa.float64()),
                "props": pa.array(["{}"]),
            }
        ),
        str(src / "late.parquet"),
    )
    got = streaming.run_to_completion(
        streaming.hourly_counts(stream), "t_empty_start"
    ).toPandas()
    assert len(got) == 1
    assert str(got["hour"].iloc[0]) == "2024-03-01 10:00:00"

    # explicit ts_type override is honored for NTZ-micros deployments
    from pyspark.sql import types as T

    s2 = streaming.read_events_stream(
        spark, str(src), ts_type=T.TimestampNTZType()
    )
    assert dict(s2.dtypes)["ts"] == "timestamp"


def test_running_user_totals_transform_with_state(spark, events_stream_dir):
    """The transformWithState twin must satisfy the same stream==batch
    contract as the applyInPandasWithState original: per-user running
    totals accumulate across micro-batches on the RocksDB state store
    (required by the API), final state equals the batch groupBy.

    Runs whenever compat.ensure_protobuf() found a runtime (pip package
    OR the vendored pure-Python runtime the shim wires up — this
    container's case since r9). Skips only on hosts with neither, after
    asserting the plan still constructs."""
    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        stream = streaming.read_events_stream(spark, events_stream_dir)
        plan = streaming.running_user_totals_tws(stream)
        assert plan.isStreaming  # API wired; execution needs protobuf
        assert dict(plan.dtypes)["total_cents"] == "bigint"
        pytest.skip("no protobuf runtime found: transformWithState execution gated")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streaming.read_events_stream(spark, events_stream_dir)
        updates = streaming.run_to_completion(
            streaming.running_user_totals_tws(stream),
            "t_totals_tws",
            output_mode="update",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    got = (
        updates.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id", ignore_index=True)
    )
    e = load_table(spark, SF_TEST, "events").toPandas()
    e["cents"] = e["value"].mul(100).round().astype("int64")
    want = (
        e.groupby("user_id", as_index=False)
        .agg(
            n_events=("event_id", "size"),
            total_cents=("cents", "sum"),
            max_event_id=("event_id", "max"),
        )
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events", "total_cents", "max_event_id"]],
        want,
        check_dtype=False,
    )
    assert len(updates) > len(got)  # state really crossed micro-batches


def test_stream_schema_probe_masks_only_emptiness(spark, tmp_path):
    """The empty-dir fallback must not swallow real failures: a source
    whose files exist but carry no ts column (schema mismatch) raises at
    plan time instead of silently starting with the long-nanos default
    (which would fail per-micro-batch later, or read garbage)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    bad = tmp_path / "bad_src"
    bad.mkdir()
    pq.write_table(pa.table({"not_ts": pa.array([1], pa.int64())}), str(bad / "f.parquet"))
    with pytest.raises(Exception, match="ts"):
        streaming.read_events_stream(spark, str(bad))

    # a missing path is a real error too (the stream source itself would
    # refuse it — only an EMPTY existing dir gets the fallback)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        streaming.read_events_stream(spark, str(tmp_path / "nope"))


def test_variant_parse_is_streaming_compatible(spark, events_stream_dir):
    """add_blob_variant's claim — shred the payload to VARIANT at ingest
    — must hold under readStream: parse_json + variant_get are stateless
    narrow ops, so the streamed extraction equals the batch one row for
    row."""
    from pyspark.sql import functions as F

    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        stream.select(
            "event_id",
            F.variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
        ),
        "t_variant",
        output_mode="append",
    ).toPandas()
    want = (
        load_table(spark, SF_TEST, "events")
        .select(
            "event_id",
            F.variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_refresh_mv_equals_full_recompute(spark, tmp_path):
    """Streaming MV maintenance: three delta files folded through
    foreachBatch == one full-table aggregation; a restart with no new
    files publishes nothing (exactly-once via checkpoint)."""
    from pyspark.sql import functions as F

    from console_etl_spark.session import load_table
    from console_etl_spark.store import (
        MaterializedView, SnapshotStore, mv_finalize, mv_partials,
    )
    from tests.conftest import SF_TEST

    o = load_table(spark, SF_TEST, "orders").limit(300).localCheckpoint()
    facts = tmp_path / "facts"
    for i in range(3):
        (o.filter(F.col("o_orderkey") % 3 == i)
         .coalesce(1).write.mode("append").parquet(str(facts)))

    store = SnapshotStore(str(tmp_path / "store"))
    keys, measures = ("o_orderstatus",), ("o_totalprice",)
    mv = MaterializedView(store, "mv_stream", keys, measures)
    ckpt = str(tmp_path / "ckpt")

    q = streaming.stream_refresh_mv(spark, str(facts), mv, ckpt)
    q.awaitTermination(120)

    got = {
        r.o_orderstatus: (r.n_rows, round(r.sum_o_totalprice, 2))
        for r in mv.read(spark).collect()
    }
    full = {
        r.o_orderstatus: (r.n_rows, round(r.sum_o_totalprice, 2))
        for r in mv_finalize(mv_partials(o, keys, measures), keys, measures).collect()
    }
    assert got == full
    n_versions = len(store.versions("mv_stream"))
    assert n_versions >= 1

    # restart: nothing new arrived -> no new version published
    q2 = streaming.stream_refresh_mv(spark, str(facts), mv, ckpt)
    q2.awaitTermination(120)
    assert len(store.versions("mv_stream")) == n_versions


def test_stream_heavy_hitters_bounds_hold_over_batches(spark, tmp_path):
    """Streaming Misra-Gries: tokens arrive as three parquet deltas; the
    running summary's certified bounds hold against exact counts over
    everything seen, and a restart with no new files publishes nothing."""
    from pyspark.sql import functions as F

    from console_etl_spark.llmops import sketches
    from console_etl_spark.session import load_table
    from console_etl_spark.store import SnapshotStore
    from tests.conftest import SF_TEST

    toks = (
        load_table(spark, SF_TEST, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .localCheckpoint()
    )
    facts = tmp_path / "toks"
    for i in range(3):
        (toks.filter(F.col("doc_id") % 3 == i).select("tok")
         .coalesce(1).write.mode("append").parquet(str(facts)))

    store = SnapshotStore(str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")
    q = sketches.stream_heavy_hitters(spark, str(facts), store, "hh", ckpt, "tok", k=8)
    q.awaitTermination(120)

    state = store.read(spark, "hh")
    hh = {r.tok: (r.est, r.err_bound)
          for r in sketches.mg_finalize(state, "tok").collect()}
    assert 0 < len(hh) <= 8
    exact = {r.tok: r.cnt
             for r in toks.groupBy("tok").agg(F.count("*").alias("cnt")).collect()}
    bound = next(iter(hh.values()))[1]
    assert bound > 0
    for t, (est, eb) in hh.items():
        assert eb == bound
        assert est <= exact[t] <= est + eb, (t, est, exact[t], eb)
    for t, c in exact.items():
        if c > bound:
            assert t in hh, (t, c, bound)

    n_versions = len(store.versions("hh"))
    q2 = sketches.stream_heavy_hitters(spark, str(facts), store, "hh", ckpt, "tok", k=8)
    q2.awaitTermination(120)
    assert len(store.versions("hh")) == n_versions

    # r12 hardening: every published version carries its epoch tag, so
    # a replayed fold is recognizable
    assert all("-e" in v for v in store.versions("hh"))

    # foreachBatch is at-least-once: a FULL replay (fresh checkpoint,
    # same files, same state) must be a no-op per epoch — the old
    # untagged publish re-merged every batch summary, doubling counts
    before = {r.tok: r.est
              for r in sketches.mg_finalize(store.read(spark, "hh"), "tok").collect()}
    q3 = sketches.stream_heavy_hitters(
        spark, str(facts), store, "hh", str(tmp_path / "ckpt_replay"), "tok", k=8
    )
    q3.awaitTermination(120)
    after = {r.tok: r.est
             for r in sketches.mg_finalize(store.read(spark, "hh"), "tok").collect()}
    assert after == before, "replayed epochs double-merged the summary"


def test_stream_refresh_mv_with_hll_distinct_state(spark, tmp_path):
    """Composition law: streaming MV maintenance × HLL distinct state —
    per-micro-batch sketch folds must land on the same estimates as one
    batch aggregation over everything streamed (lossless sketch union),
    and within 5% of exact NDV."""
    from pyspark.sql import functions as F

    from console_etl_spark.session import load_table
    from console_etl_spark.store import (
        MaterializedView, SnapshotStore, mv_finalize, mv_partials,
    )
    from tests.conftest import SF_TEST

    e = load_table(spark, SF_TEST, "events").limit(3000).localCheckpoint()
    facts = tmp_path / "ev"
    for i in range(3):
        (e.filter(F.col("event_id") % 3 == i)
         .coalesce(1).write.mode("append").parquet(str(facts)))

    store = SnapshotStore(str(tmp_path / "store"))
    keys, distinct = ("event_type",), ("user_id",)
    mv = MaterializedView(store, "mv_ndv_stream", keys, (), distinct=distinct)
    q = streaming.stream_refresh_mv(spark, str(facts), mv, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {r.event_type: r.approx_ndv_user_id for r in mv.read(spark).collect()}
    single = {
        r.event_type: r.approx_ndv_user_id
        for r in mv_finalize(
            mv_partials(e, keys, (), distinct), keys, (), distinct
        ).collect()
    }
    assert got == single  # streamed folds == one-shot sketch, bit-identical
    exact = {
        r.event_type: r.ndv
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ndv")).collect()
    }
    for t, est in got.items():
        assert abs(est - exact[t]) / exact[t] < 0.05


def test_stream_psi_monitor_composes_and_recomputes(
    spark, events_stream_dir, tmp_path
):
    """PSI monitor laws: (1) per-bin batch counts summed over all
    micro-batches equal one batch binning of the whole fixture on the
    same reference grid; (2) each epoch's stored psi_batch equals PSI
    recomputed from that epoch's stored bin counts and reference
    proportions."""
    import math

    from pyspark.sql import functions as F

    ref = load_table(spark, SF_TEST, "events")
    metrics = str(tmp_path / "psi_metrics")
    q = streaming.stream_psi_monitor(
        spark, events_stream_dir, ref, metrics, str(tmp_path / "psi_ckpt")
    )
    q.awaitTermination(120)

    m = spark.read.parquet(metrics)
    n_bins = 10
    assert m.select("epoch_id").distinct().count() >= 2

    # law 1: counts compose to the batch histogram on the same grid
    mm = ref.agg(
        F.min(F.col("value").cast("double")).alias("lo"),
        F.max(F.col("value").cast("double")).alias("hi"),
    ).collect()[0]
    width = (mm.hi - mm.lo) / float(n_bins)
    want = {
        int(r.bin): int(r.c)
        for r in ref.select(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col("value").cast("double") - F.lit(mm.lo))
                        / F.lit(width)
                    ).cast("int"),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    got = {
        int(r.bin): int(r.total)
        for r in m.groupBy("bin").agg(F.sum("n_batch").alias("total")).collect()
    }
    assert got == want

    # law 2: stored psi matches recomputation from stored ingredients
    for epoch in [r.epoch_id for r in m.select("epoch_id").distinct().collect()]:
        rows = sorted(
            m.filter(F.col("epoch_id") == epoch).collect(), key=lambda r: r.bin
        )
        n = sum(r.n_batch for r in rows)
        qs = [(r.n_batch + 1.0) / (n + n_bins) for r in rows]
        ps = [r.p_ref for r in rows]
        psi = sum((qb - pb) * math.log(qb / pb) for qb, pb in zip(qs, ps))
        assert abs(psi - rows[0].psi_batch) < 1e-12


def test_stream_markov_equals_batch(spark, events_stream_dir):
    """Transition counts folded over arrival-ordered micro-batches equal
    the batch Markov matrix computed over the same (ts, event_id)
    order — per-user sequence state survives batch boundaries (the
    carried last-type bridges each batch's first event)."""
    from pyspark.sql import functions as F

    from console_etl_spark.relational import markov_event_transitions

    stream = streaming.read_events_stream(spark, events_stream_dir)
    sink = streaming.run_to_completion(
        streaming.stream_markov_transitions(stream),
        "markov_sink",
        "append",
    )

    got = (
        sink.groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    got = {(r.from_type, r.to_type): r.n for r in got}
    want = {
        (r.from_type, r.to_type): r.n
        for r in markov_event_transitions(spark, SF_TEST).collect()
    }
    assert got == want


def test_bus_socket_stream_equals_batch(spark):
    """VERDICT r6 item 8: the streaming tier is not file-source-bound.
    Serve the events fixture as JSON messages over a TCP socket (the
    built-in source whose record-per-arrival unit matches a consumed
    Kafka topic), run the SAME hourly aggregation used by the file
    tests, and require bit-identical results to the batch twin computed
    from the same messages."""
    import socket
    import threading

    from pyspark.sql import functions as F

    from console_etl_spark.session import load_table

    events = load_table(spark, SF_TEST, "events").orderBy("event_id").limit(500)
    msgs = [
        r.value
        for r in events.select(
            F.to_json(
                F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
            ).alias("value")
        ).collect()
    ]
    n_msgs = len(msgs)
    assert n_msgs == 500

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            # one poison-pill message: must be dropped, not kill the query
            payload = "\n".join(["{not json"] + msgs) + "\n"
            conn.sendall(payload.encode())
            stop.wait(timeout=120)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        bus = streaming.read_bus_stream(
            spark, "socket", {"host": "127.0.0.1", "port": port}
        )
        agg = streaming.hourly_counts(streaming.parse_bus_events(bus))
        got = streaming.run_until(
            agg,
            "t_bus_hourly",
            done=lambda df: (df.agg(F.sum("n")).collect()[0][0] or 0) >= n_msgs,
        ).toPandas()
    finally:
        stop.set()
        srv.close()

    want = (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(8,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
        .toPandas()
    )
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_bus_rate_source_smoke(spark):
    """The rate stand-in: synthetic monotonic messages through the same
    normalized (value, ingest_ts) surface — counts accumulate."""
    from pyspark.sql import functions as F

    bus = streaming.read_bus_stream(spark, "rate", {"rowsPerSecond": "200"})
    agg = bus.agg(
        F.count("*").alias("n"),
        F.min(F.col("value").cast("long")).alias("lo"),
        F.max(F.col("value").cast("long")).alias("hi"),
    )
    got = streaming.run_until(
        agg, "t_bus_rate", done=lambda df: (df.collect() or [[0]])[0][0] >= 100
    ).collect()[0]
    # monotonic contiguous sequence: no dups, no gaps
    assert got["n"] >= 100 and got["hi"] - got["lo"] + 1 == got["n"]


def test_bus_unknown_source_rejected(spark):
    with pytest.raises(ValueError):
        streaming.read_bus_stream(spark, "pulsar")


def test_bus_delivery_semantics_socket_vs_file_restart(spark, tmp_path):
    """VERDICT r7 item 5: pin the DELIVERY-SEMANTICS contrast documented
    in read_bus_stream. The file (kafka-shaped, offset-checkpointed)
    path RE-SERVES across a restart: messages produced while the
    consumer was down are picked up by the restarted query, exactly
    once. The socket path is AT-MOST-ONCE: it has no offsets, so
    messages produced while the consumer was down are LOST — a
    restarted query sees only what the feed sends after it reconnects.
    Same three message batches through both paths; the file sink ends
    with batches 1+2+3, the socket result with batches 1 and 3 only."""
    import json
    import os
    import socket
    import threading

    from pyspark.sql import functions as F

    def batch(lo, hi):  # messages are just numbered JSON events
        return [
            json.dumps(
                {
                    "event_id": i,
                    "ts": f"2024-01-01 00:{i:02d}:00",
                    "user_id": i,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
            )
            for i in range(lo, hi)
        ]

    b1, b2, b3 = batch(0, 5), batch(5, 10), batch(10, 15)

    # ---- file path: replayable offsets -> restart re-serves batch 2+3
    src = tmp_path / "bus_files"
    src.mkdir()
    sink = str(tmp_path / "file_sink")
    ckpt = str(tmp_path / "file_ckpt")

    def land(name, msgs):
        p = src / name
        p.write_text("\n".join(msgs) + "\n")
        os.utime(p)

    def file_run():
        bus = (
            spark.readStream.format("text")
            .load(str(src))
            .select(
                F.col("value"),
                F.current_timestamp().alias("ingest_ts"),
            )
        )
        ids = streaming.parse_bus_events(bus).select("event_id")
        streaming.write_stream_parquet(ids, sink, ckpt)

    land("b1.jsonl", b1)
    file_run()  # consumer run 1: commits batch 1
    land("b2.jsonl", b2)  # produced while the consumer is DOWN
    land("b3.jsonl", b3)
    file_run()  # restart, same checkpoint: re-serves 2 and 3
    got_file = sorted(
        r.event_id for r in spark.read.parquet(sink).collect()
    )
    assert got_file == list(range(15))  # all three batches, exactly once

    # ---- socket path: no offsets -> batch 2 (produced while down) lost
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    run1_done = threading.Event()

    def serve():
        # Live feed with no buffer/offsets: connection 1 gets batch 1;
        # batch 2 is produced while no consumer is attached (the send
        # fails on the dead connection, or lands unread in a socket the
        # reader already abandoned — undeliverable either way, gone);
        # connection 2 gets only what the feed emits from then on (b3).
        conn, _ = srv.accept()
        conn.sendall(("\n".join(b1) + "\n").encode())
        try:
            # Heartbeats until the consumer leaves. Disconnect is
            # detected EITHER by a send error OR by the run-1-finished
            # signal — the OS can keep a lingering half-closed socket
            # writable indefinitely, and waiting only on OSError would
            # leave connection 2 never served (run 2 then burns its
            # whole run_until deadline — the flake ADVICE r8 flagged).
            while not stop.is_set() and not run1_done.is_set():
                conn.sendall(b"\n")  # blank line: dropped by the parser
                stop.wait(0.2)
        except OSError:
            pass
        # Consumer is gone. Batch 2 is produced NOW, while no consumer
        # is attached — undeliverable, no offsets, gone.
        try:
            conn.sendall(("\n".join(b2) + "\n").encode())
        except OSError:
            pass
        finally:
            conn.close()
        if stop.is_set():
            return
        conn2, _ = srv.accept()
        with conn2:
            conn2.sendall(("\n".join(b3) + "\n").encode())
            stop.wait(timeout=120)

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    def socket_run(qname, want_min, want_max):
        bus = streaming.read_bus_stream(
            spark, "socket", {"host": "127.0.0.1", "port": port}
        )
        ids = streaming.parse_bus_events(bus).select("event_id")
        return {
            r.event_id
            for r in streaming.run_until(
                ids,
                qname,
                done=lambda df: df.filter(
                    (F.col("event_id") >= want_min)
                    & (F.col("event_id") < want_max)
                ).count()
                >= want_max - want_min,
                output_mode="append",
            ).collect()
        }

    try:
        got1 = socket_run("t_bus_restart_1", 0, 5)  # run 1 sees batch 1
        run1_done.set()  # deterministic disconnect signal for serve()
        got2 = socket_run("t_bus_restart_2", 10, 15)  # run 2: batch 3 only
    finally:
        stop.set()
        srv.close()
    assert set(range(0, 5)) <= got1
    assert set(range(10, 15)) <= got2
    # the at-most-once pin: nothing can re-serve batch 1 to run 2, and
    # batch 2 — produced while the consumer was down — reached neither
    assert not (set(range(0, 5)) & got2)
    assert not (set(range(5, 10)) & got2)


def test_stream_asof_enrich_equals_batch_bounded_lookback(
    spark, events_stream_dir
):
    """VERDICT r7 item 8: the stream-stream AS-OF enrichment (interval
    join -> append-mode max_by reduction) must reproduce the batch twin
    relational.asof_join_bounded_lookback exactly on every purchase it
    emits, and must have emitted every matched purchase whose finalize
    window closed before the final watermark."""
    import glob
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.asof_enrich_join(stream), "t_asof_enrich",
        output_mode="append",
    ).toPandas()

    want = (
        relational.asof_join_bounded_lookback(spark, SF_TEST)
        .filter(F.col("view_event").isNotNull())
        .toPandas()
    )

    # every emitted purchase is a true batch match, value-identical
    assert len(got) > 0
    assert set(got.purchase_event) <= set(want.purchase_event)
    sub = want[want.purchase_event.isin(set(got.purchase_event))]
    pd.testing.assert_frame_equal(_sorted(got), _sorted(sub), check_dtype=False)

    # completeness: final watermark is (max event time seen BEFORE the
    # last micro-batch) - 2h; any matched purchase whose 1h finalize
    # window ended before it must have been flushed.
    files = sorted(glob.glob(os.path.join(events_stream_dir, "part-*")))
    head = spark.read.parquet(*files[:-1])
    if isinstance(head.schema["ts"].dataType, LongType):  # old nanos fixture
        max_ts = F.timestamp_micros(F.expr("max(ts) div 1000"))
    else:
        max_ts = F.max("ts").cast("timestamp")
    wm = head.select(max_ts.alias("m")).collect()[0].m
    threshold = wm - pd.Timedelta(hours=3)  # 2h watermark + 1h window
    must_emit = set(
        want[want.purchase_ts < threshold].purchase_event
    )
    assert must_emit, "fixture should contain closed-window matches"
    assert must_emit <= set(got.purchase_event)


def test_stream_asof_enrich_exactly_once_across_restart(
    spark, events_stream_dir, tmp_path
):
    """The chained-stateful as-of enrichment survives a restart with
    exactly-once output: run the first half of the time-ordered files
    to a checkpointed parquet sink, stop, land the rest, restart with
    the SAME checkpoint — every emitted purchase appears ONCE, every
    row matches the batch twin, and restarting did not re-emit or
    re-window already-finalized groups (join + aggregation state both
    recovered from the checkpoint, not recomputed)."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    files = sorted(glob.glob(os.path.join(events_stream_dir, "part-*")))
    assert len(files) == 4

    def land(fs):
        now = time.time()
        for i, f in enumerate(fs):
            dst = os.path.join(src, os.path.basename(f))
            shutil.copy(f, dst)
            os.utime(dst, (now + i, now + i))

    def run_once():
        stream = streaming.read_events_stream(spark, src, max_files_per_trigger=1)
        enriched = streaming.asof_enrich_join(stream)
        q = (
            enriched.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(files[:2])
    run_once()
    mid = spark.read.parquet(out).toPandas()
    land(files[2:])
    run_once()
    got = spark.read.parquet(out).toPandas()

    # exactly-once: no purchase appears twice, run 1's rows unchanged
    assert got.purchase_event.is_unique
    assert set(mid.purchase_event) <= set(got.purchase_event)

    # every emitted row equals the batch twin's matched output
    want = (
        relational.asof_join_bounded_lookback(spark, SF_TEST)
        .filter(F.col("view_event").isNotNull())
        .toPandas()
    )
    assert set(got.purchase_event) <= set(want.purchase_event)
    sub = want[want.purchase_event.isin(set(got.purchase_event))]
    pd.testing.assert_frame_equal(_sorted(got), _sorted(sub), check_dtype=False)
    # and the restart made real progress beyond run 1
    assert len(got) > len(mid) > 0


def test_run_until_surfaces_query_failure_not_timeout(spark):
    """ADVICE r7: a stream that FAILS (here: socket source pointed at a
    port that refuses/closes immediately) must surface the query's own
    exception from run_until promptly — not burn the whole deadline and
    mask it as TimeoutError."""
    import socket
    import time

    from pyspark.errors.exceptions.captured import StreamingQueryException

    # grab a port and close the listener: connection will be refused
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    bus = streaming.read_bus_stream(
        spark, "socket", {"host": "127.0.0.1", "port": port}
    )
    t0 = time.monotonic()
    with pytest.raises(StreamingQueryException):
        streaming.run_until(
            bus.select("value"),
            "t_run_until_fail",
            done=lambda df: False,
            timeout_s=60.0,
            output_mode="append",
        )
    # surfaced promptly, not after the 60 s deadline
    assert time.monotonic() - t0 < 30.0


def test_kafka_record_normalization_on_connector_schema(spark):
    """VERDICT r7 missing-item 2 (partial): the kafka branch cannot run
    without a broker + connector jar, but its column mapping is
    schema-driven — apply normalize_kafka_records to a batch DataFrame
    with the connector's EXACT schema and require: UTF-8 payload bytes
    decode to the same strings the socket/file paths carry, the broker
    timestamp passes through as ingest_ts, and the downstream JSON
    parse (parse_bus_events) yields the same typed events it does for
    every other source."""
    import datetime
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    kafka_schema = StructType(
        [
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
            StructField("timestampType", IntegerType()),
        ]
    )
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    payloads = [
        json.dumps(
            {
                "event_id": i,
                "ts": "2024-03-01 11:5%d:00" % i,
                "user_id": 10 + i,
                "event_type": "view",
                "value": float(i),
                "props": "{}",
            }
        )
        for i in range(3)
    ] + ["{not json"]  # poison pill: must normalize, then drop in parse
    rows = [
        (
            None,
            p.encode("utf-8"),
            "events",
            i % 2,
            100 + i,
            t0 + datetime.timedelta(seconds=i),
            0,
        )
        for i, p in enumerate(payloads)
    ]
    raw = spark.createDataFrame(rows, kafka_schema)

    bus = streaming.normalize_kafka_records(raw)
    assert [f.name for f in bus.schema.fields] == ["value", "ingest_ts"]
    got = bus.orderBy("ingest_ts").collect()
    assert [r.value for r in got] == payloads  # exact UTF-8 round-trip
    assert got[0].ingest_ts == t0  # broker timestamp passes through

    events = streaming.parse_bus_events(bus).orderBy("event_id").collect()
    assert [r.event_id for r in events] == [0, 1, 2]  # pill dropped
    assert events[1].user_id == 11 and events[1].value == 1.0
    assert events[2].ts == datetime.datetime(2024, 3, 1, 11, 52, 0)


def test_stream_asof_nearest_equals_batch_within_horizon(
    spark, events_stream_dir
):
    """The NEAREST-direction streaming as-of must reproduce the batch
    twin exactly on everything it emits: because the batch nearest is
    the global minimum gap, batch rows with gap_us <= horizon are
    precisely the purchases the horizon-bounded stream can match, with
    identical picks under identical tie rules (backward wins equal
    gaps; backward ties -> highest event id, forward ties -> lowest).
    Also bounds completeness by the final watermark — which for the
    forward direction must be delayed by the join state (a premature
    window finalize would drop forward candidates and fail the exact
    compare)."""
    import glob
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    HORIZON_US = 24 * 3600 * 1_000_000

    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.asof_nearest_enrich_join(stream), "t_asof_nearest",
        output_mode="append",
    ).toPandas()

    want = (
        relational.asof_join_nearest_view(spark, SF_TEST)
        .filter(F.col("gap_us") <= HORIZON_US)
        .toPandas()
    )

    assert len(got) > 0
    assert set(got.purchase_event) <= set(want.purchase_event)
    sub = want[want.purchase_event.isin(set(got.purchase_event))]
    pd.testing.assert_frame_equal(_sorted(got), _sorted(sub), check_dtype=False)
    # both directions must actually occur in the emitted set
    assert {"backward", "forward"} <= set(got.direction)

    # completeness: a matched purchase whose forward horizon closed
    # before the final watermark must have been emitted (batch output
    # carries no purchase_ts, so fetch it from the raw events)
    files = sorted(glob.glob(os.path.join(events_stream_dir, "part-*")))
    head = spark.read.parquet(*files[:-1])
    if isinstance(head.schema["ts"].dataType, LongType):
        max_ts = F.timestamp_micros(F.expr("max(ts) div 1000"))
    else:
        max_ts = F.max("ts").cast("timestamp")
    wm = head.select(max_ts.alias("m")).collect()[0].m
    threshold = wm - pd.Timedelta(hours=24 + 2 + 1)  # horizon+wm+window
    p_ts = {
        r.event_id: r.ts
        for r in load_table(spark, SF_TEST, "events")
        .filter(F.col("event_type") == "purchase")
        .collect()
    }
    must_emit = {
        e for e in want.purchase_event if p_ts[e] < threshold
    }
    assert must_emit, "fixture should contain horizon-closed matches"
    assert must_emit <= set(got.purchase_event)


def test_stream_scd2_point_in_time_equals_batch(spark, tmp_path):
    """Stream-static SCD2 enrichment: orders streamed file-by-file
    through scd2_enrich_stream against the SAME static SCD2 dimension
    the batch query builds, then the same (segment, version)
    aggregation — must equal relational.scd2_point_in_time_join
    exactly. Stateless per-batch join: incremental execution cannot
    change a point-in-time resolution."""
    from pyspark.sql import functions as F

    from console_etl_spark.relational import (
        SCD2_BASE_FROM,
        SCD2_EFFECTIVE,
        scd2_merge,
    )

    # the same SCD2 history the batch query derives
    c = load_table(spark, SF_TEST, "customer")
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        F.lit("AUTOMOBILE").alias("c_mktsegment"),
    )
    scd2 = scd2_merge(c, upd, "c_custkey", SCD2_EFFECTIVE, SCD2_BASE_FROM).select(
        "c_custkey", "c_mktsegment", "valid_from", "valid_to", "is_current"
    )

    # stream the orders facts as 3 files -> 3 micro-batches
    src = str(tmp_path / "orders_stream")
    orders = load_table(spark, SF_TEST, "orders")
    orders.repartition(3).write.mode("overwrite").parquet(src)
    facts_schema = orders.schema
    facts_stream = (
        spark.readStream.schema(facts_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "o_custkey",
            "o_totalprice",
            F.date_format(
                F.date_add(
                    F.lit("2024-01-01").cast("date"),
                    (F.col("o_orderkey") % 365).cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("as_of"),
        )
    )
    enriched = streaming.scd2_enrich_stream(facts_stream, scd2)
    agg = (
        enriched.groupBy(
            "c_mktsegment",
            F.col("is_current").cast("bigint").alias("matched_current_version"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_price"),
        )
    )
    got = streaming.run_to_completion(
        agg, "t_scd2_stream", output_mode="complete"
    ).toPandas()
    want = relational.scd2_point_in_time_join(spark, SF_TEST).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_stream_attribution_last_touch_equals_batch(spark, events_stream_dir):
    """Per-user carried-touch attribution folded over arrival-ordered
    micro-batches equals the batch attribution_last_touch report over
    the same (ts, event_id) order — the carried (mkt_ts, mkt_type)
    state bridges purchases in later batches to touches in earlier
    ones, and the 7-day cutoff is the same integer-microsecond
    comparison in both engines."""
    from pyspark.sql import functions as F

    from console_etl_spark.relational import attribution_last_touch

    stream = streaming.read_events_stream(spark, events_stream_dir)
    sink = streaming.run_to_completion(
        streaming.stream_attribution_last_touch(stream),
        "attr_lt_sink",
        "append",
    )

    got = {
        r.channel: r.n
        for r in sink.groupBy("channel").agg(F.sum("n").alias("n")).collect()
    }
    want = {
        r.channel: r.n_purchases
        for r in attribution_last_touch(spark, SF_TEST).collect()
    }
    assert got == want


def test_stream_attribution_state_survives_restart(
    spark, events_stream_dir, tmp_path
):
    """The carried last-touch state survives a checkpointed restart:
    run the first half of the time-ordered files to a parquet sink,
    stop, land the rest, restart with the SAME checkpoint — the final
    per-channel totals equal the batch twin EXACTLY. A lost state store
    would mis-attribute run-2 purchases whose touch arrived in run 1
    (inflating 'unattributed'); replayed offsets would inflate every
    count — equality rules out both."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from console_etl_spark.relational import attribution_last_touch

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    files = sorted(glob.glob(os.path.join(events_stream_dir, "part-*")))
    assert len(files) == 4

    def land(fs):
        now = time.time()
        for i, f in enumerate(fs):
            dst = os.path.join(src, os.path.basename(f))
            shutil.copy(f, dst)
            os.utime(dst, (now + i, now + i))

    def run_once():
        stream = streaming.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            streaming.stream_attribution_last_touch(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(files[:2])
    run_once()
    mid = spark.read.parquet(out).agg(F.sum("n")).collect()[0][0]
    land(files[2:])
    run_once()

    got = {
        r.channel: r.n
        for r in spark.read.parquet(out)
        .groupBy("channel")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    want = {
        r.channel: r.n_purchases
        for r in attribution_last_touch(spark, SF_TEST).collect()
    }
    assert got == want
    assert 0 < mid < sum(want.values())  # both runs made real progress


def test_stream_attribution_multi_chunk_group_sorted_globally(spark, tmp_path):
    """Regression (r8 review): a user's micro-batch rows can arrive as
    MULTIPLE Arrow chunks in arbitrary order when the group exceeds
    spark.sql.execution.arrow.maxRecordsPerBatch; sorting each chunk
    independently processes later rows first and can leave the carried
    touch on an OLDER event. Construct exactly that: one user's batch
    written in reversed ts order so chunk 1 holds the later rows, with
    maxRecordsPerBatch=2, then a second batch whose purchase is decided
    purely by the carried state — its credit must match the batch twin
    (click, the true latest touch), not the stale view a chunk-local
    sort would carry."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    day = 86_400_000_000
    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, days, utype):
        return {
            "event_id": eid,
            "ts": t0 + dt.timedelta(microseconds=days * day),
            "user_id": 1,
            "event_type": utype,
            "value": 1.0,
            "props": "{}",
        }

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    batch1 = [ev(4, 3, "purchase"), ev(3, 2, "click"),
              ev(2, 1, "purchase"), ev(1, 0, "view")]  # reversed ts order
    batch2 = [ev(5, 4, "purchase")]  # credit decided by carried state

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(batch1, schema=schema),
                   str(src / "part-000.parquet"))
    import os, time as _t
    now = _t.time()
    os.utime(src / "part-000.parquet", (now, now))
    pq.write_table(pa.Table.from_pylist(batch2, schema=schema),
                   str(src / "part-001.parquet"))
    os.utime(src / "part-001.parquet", (now + 1, now + 1))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = streaming.read_events_stream(spark, str(src))
        sink = streaming.run_to_completion(
            streaming.stream_attribution_last_touch(stream),
            "attr_chunk_sink",
            "append",
        )
        got = {
            r.channel: r.n
            for r in sink.groupBy("channel").agg(F.sum("n").alias("n")).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # Hand-derived batch semantics over the 5 rows: p@d1<-view (the
    # only prior touch), p@d3<-click, p@d4<-click (carried latest).
    # The chunk-local-sort bug yields {"view": 2, "click": 1} instead:
    # batch 1 processes [click@d2, p@d3] before [view@d0, p@d1], so the
    # carried state ends on the OLDER view and batch 2's purchase
    # mis-credits it.
    assert got == {"view": 1, "click": 2}, got


def test_stream_markov_multi_chunk_group_sorted_globally(spark, tmp_path):
    """Regression twin of the attribution chunk test for
    stream_markov_transitions: with maxRecordsPerBatch=2 and a user's
    batch written in reversed ts order, chunk-local sorting walks the
    sequence out of order and produces transition pairs that never
    happened. Sequence view->click->purchase->view (reversed on disk)
    must yield exactly its three true transitions."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, hours, utype):
        return {
            "event_id": eid,
            "ts": t0 + dt.timedelta(hours=hours),
            "user_id": 1,
            "event_type": utype,
            "value": 1.0,
            "props": "{}",
        }

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    rows = [ev(4, 3, "view"), ev(3, 2, "purchase"),
            ev(2, 1, "click"), ev(1, 0, "view")]  # reversed ts order
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   str(src / "part-000.parquet"))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = streaming.read_events_stream(spark, str(src))
        sink = streaming.run_to_completion(
            streaming.stream_markov_transitions(stream),
            "markov_chunk_sink",
            "append",
        )
        got = {
            (r.from_type, r.to_type): r.n
            for r in sink.groupBy("from_type", "to_type")
            .agg(F.sum("n").alias("n"))
            .collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # true ts-ordered sequence: view -> click -> purchase -> view
    assert got == {
        ("view", "click"): 1,
        ("click", "purchase"): 1,
        ("purchase", "view"): 1,
    }, got


def test_stream_cusum_monitor_exact_composition(spark, events_stream_dir, tmp_path):
    """CUSUM monitor laws: (1) per-batch rows/sums compose — totals over
    the metrics sink equal one batch aggregation of the whole fixture
    in exact integer cents; (2) each stored dev_cents recomputes
    exactly from its own stored ingredients and the frozen reference
    scalars; (3) the final running CUSUM (sum of dev_cents) is ZERO
    because the reference here IS the full fixture — the monitor's
    self-consistency identity sum(ref_rows*s_i - n_i*ref_sum) = 0 when
    sum(s_i)=ref_sum and sum(n_i)=ref_rows."""
    from pyspark.sql import functions as F

    ref = load_table(spark, SF_TEST, "events")
    metrics = str(tmp_path / "cusum_metrics")
    q = streaming.stream_cusum_monitor(
        spark, events_stream_dir, ref, metrics, str(tmp_path / "cusum_ckpt")
    )
    q.awaitTermination(120)

    m = spark.read.parquet(metrics)
    rows = sorted(m.collect(), key=lambda r: r.epoch_id)
    assert len(rows) >= 2  # one per non-empty micro-batch

    want = ref.agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("decimal(38,0)")
        ).alias("s"),
        F.count("value").alias("n"),  # non-null rows, the monitor's basis
    ).collect()[0]
    ref_sum, ref_rows = int(want.s), int(want.n)

    # law 1: exact composition of rows and cent-sums
    assert sum(r.batch_rows for r in rows) == ref_rows
    assert sum(int(r.batch_sum_cents) for r in rows) == ref_sum
    # law 2: stored deviation recomputes from stored ingredients
    for r in rows:
        assert int(r.dev_cents) == ref_rows * int(r.batch_sum_cents) - int(
            r.batch_rows
        ) * ref_sum, r
    # law 3: self-reference CUSUM telescopes to exactly zero
    assert sum(int(r.dev_cents) for r in rows) == 0


def test_stream_cusum_monitor_replayed_epochs_idempotent(
    spark, events_stream_dir, tmp_path
):
    """foreachBatch is at-least-once: a failure-retried epoch re-runs
    audit_batch with the same epoch_id. The metrics sink must absorb
    that idempotently (dynamic overwrite of the epoch_id partition),
    not append a duplicate row that double-counts in SUM(dev_cents).
    Simulate total replay — re-run the whole monitor over the same
    input with a FRESH checkpoint (every epoch re-fires) onto the SAME
    metrics dir — and assert the exact composition laws still hold."""
    from pyspark.sql import functions as F

    ref = load_table(spark, SF_TEST, "events")
    metrics = str(tmp_path / "cusum_metrics")
    q = streaming.stream_cusum_monitor(
        spark, events_stream_dir, ref, metrics, str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)
    n_epochs = spark.read.parquet(metrics).count()
    assert n_epochs >= 2

    # full replay: fresh checkpoint reprocesses every file into the
    # same epoch ids (0..N-1), each overwriting its own partition
    q2 = streaming.stream_cusum_monitor(
        spark, events_stream_dir, ref, metrics, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)

    m = spark.read.parquet(metrics)
    assert m.count() == n_epochs  # no duplicate epoch rows
    assert m.select("epoch_id").distinct().count() == n_epochs
    want = ref.agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("decimal(38,0)")
        ).alias("s"),
        F.count("value").alias("n"),
    ).collect()[0]
    rows = m.collect()
    assert sum(r.batch_rows for r in rows) == int(want.n)
    assert sum(int(r.batch_sum_cents) for r in rows) == int(want.s)
    assert sum(int(r.dev_cents) for r in rows) == 0  # telescoping law


def test_monitor_rejects_legacy_flat_metrics_dir(spark, tmp_path):
    """ADVICE r9: the monitors' sink switched from flat appended parquet
    (pre-r9) to hive-partitioned _epoch=N dynamic overwrite. Pointing
    the new code at a dir of flat files silently mixes incompatible
    layouts a reader would double-count — both monitors must FAIL FAST
    instead of relying on a docstring note. A partitioned (or fresh)
    dir passes the guard."""
    from console_etl_spark.streaming import _require_partitioned_metrics_dir

    legacy = tmp_path / "legacy"
    legacy.mkdir()
    (legacy / "part-00000-abc.parquet").write_bytes(b"PAR1")
    with pytest.raises(ValueError, match="flat parquet"):
        _require_partitioned_metrics_dir(str(legacy), "stream_cusum_monitor")

    ok = tmp_path / "partitioned"
    (ok / "_epoch=0").mkdir(parents=True)
    (ok / "_epoch=0" / "part-00000.parquet").write_bytes(b"PAR1")
    _require_partitioned_metrics_dir(str(ok), "stream_cusum_monitor")
    _require_partitioned_metrics_dir(str(tmp_path / "fresh"), "x")

    ref = load_table(spark, SF_TEST, "events").limit(10)
    with pytest.raises(ValueError, match="flat parquet"):
        streaming.stream_cusum_monitor(
            spark, str(tmp_path / "in"), ref, str(legacy),
            str(tmp_path / "ck"),
        )


def test_stream_quantile_monitor_merges_within_rank_error(
    spark, events_stream_dir, tmp_path
):
    """Quantile monitor laws (r9): (1) kll_sketch_get_n over the merged
    per-epoch sketches equals the fixture's exact non-null count — n
    composes EXACTLY through the merge tree; (2) the merged p50/p90
    land within KLL's rank-error contract (±4% rank absorbs compaction
    randomness) of the exact batch distribution; (3) replay (fresh
    checkpoint, same metrics dir) is idempotent — same epoch count,
    laws still hold."""
    from pyspark.sql import functions as F

    metrics = str(tmp_path / "kll_metrics")
    q = streaming.stream_quantile_monitor(
        spark, events_stream_dir, metrics, str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)
    m = spark.read.parquet(metrics)
    n_epochs = m.count()
    assert n_epochs >= 2

    e = load_table(spark, SF_TEST, "events")
    want = e.agg(
        F.count("value").alias("n"),
        F.percentile(
            F.col("value").cast("double"),
            F.array(*[F.lit(p) for p in (0.46, 0.54, 0.86, 0.94)]),
        ).alias("band"),
    ).collect()[0]

    def check():
        got = (
            spark.read.parquet(metrics)
            .agg(F.kll_merge_agg_double("kll").alias("kll"))
            .select(
                F.kll_sketch_get_n_double("kll").alias("n"),
                F.kll_sketch_get_quantile_double("kll", F.lit(0.5)).alias("p50"),
                F.kll_sketch_get_quantile_double("kll", F.lit(0.9)).alias("p90"),
            )
            .collect()[0]
        )
        assert got.n == want.n  # law 1: exact n through merges
        b = want.band
        assert b[0] <= got.p50 <= b[1], (got.p50, b)  # law 2
        assert b[2] <= got.p90 <= b[3], (got.p90, b)

    check()
    # law 3: full replay onto the same sink is idempotent
    q2 = streaming.stream_quantile_monitor(
        spark, events_stream_dir, metrics, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    m2 = spark.read.parquet(metrics)
    assert m2.count() == n_epochs
    assert m2.select("epoch_id").distinct().count() == n_epochs
    check()


def test_run_until_fails_fast_when_query_terminates_cleanly(spark):
    """ADVICE r8: a query that stops CLEANLY (isActive False, no
    exception) without satisfying done() must make run_until re-check
    done() once and raise immediately — not poll out the rest of the
    deadline. Stop a rate-source query from outside mid-poll and assert
    the TimeoutError arrives in a fraction of the 120 s budget."""
    import threading
    import time as _time

    from pyspark.sql import functions as F

    bus = streaming.read_bus_stream(spark, "rate", {"rowsPerSecond": "10"})
    agg = bus.agg(F.count("*").alias("n"))

    def stop_soon():
        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            qs = [
                q for q in spark.streams.active
                if q.name == "t_run_until_clean_stop"
            ]
            if qs and qs[0].recentProgress:
                qs[0].stop()  # clean external stop, no exception
                return
            _time.sleep(0.2)

    t = threading.Thread(target=stop_soon, daemon=True)
    t.start()
    t0 = _time.monotonic()
    with pytest.raises(TimeoutError, match="terminated before done"):
        streaming.run_until(
            agg,
            "t_run_until_clean_stop",
            done=lambda df: False,  # never satisfied
            timeout_s=120.0,
        )
    elapsed = _time.monotonic() - t0
    t.join(5)
    assert elapsed < 60, f"run_until polled {elapsed:.0f}s after clean stop"


def test_user_sessions_tws_timers_equal_batch(spark, events_stream_dir):
    """Event-time-TIMER sessionization law (r9): every session the TWS
    operator emits is EXACTLY a session of the batch 30-min gap
    definition (same integer-microsecond arithmetic as
    relational.sessionize_events), and every batch session whose close
    point (last + gap) precedes the final watermark was emitted —
    trailing sessions correctly stay open. Exercises the TWS tier the
    running-totals twin doesn't: ListState, registerTimer/deleteTimer/
    listTimers, and handleExpiredTimer under EventTime mode.

    Skips on hosts with no protobuf runtime (same gate as the
    running-totals TWS test)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("no protobuf runtime found: transformWithState gated")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streaming.read_events_stream(spark, events_stream_dir)
        got = streaming.run_to_completion(
            streaming.user_sessions_tws(stream),
            "t_sessions_tws",
            output_mode="append",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    gap_us = streaming.SESSION_GAP_US
    e = load_table(spark, SF_TEST, "events").toPandas()
    e["us"] = e["ts"].astype("int64") // 1000
    sess = []
    for uid, grp in e.sort_values(["user_id", "us"]).groupby("user_id"):
        cur = None
        for t in grp["us"]:
            if cur is None or t - cur[1] > gap_us:
                if cur is not None:
                    sess.append((uid, cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
            else:
                cur[1] = t
                cur[2] += 1
        sess.append((uid, cur[0], cur[1], cur[2]))
    batch = pd.DataFrame(
        sess, columns=["user_id", "start_us", "end_us", "n_events"]
    )

    # emitted-subset law: every emitted session is a batch session
    assert len(got) > 0
    merged = got.merge(
        batch, on=list(got.columns), how="left", indicator=True
    )
    assert (merged["_merge"] == "both").all()

    # completeness: final watermark = max event time seen BEFORE the
    # last micro-batch, minus the 2 h delay; every batch session whose
    # close point precedes it must have been emitted
    files = sorted(glob.glob(os.path.join(events_stream_dir, "part-*")))
    head_max_us = (
        spark.read.parquet(*files[:-1])
        .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .collect()[0][0]
    )
    wm_us = head_max_us - 2 * 3600 * 1_000_000
    # strict-close gate + the 1 ms timer offset: a session is
    # guaranteed emitted once its close point is at least 1 ms inside
    # the final watermark
    must_emit = batch[(batch["end_us"] + gap_us + 1000) <= wm_us]
    emitted_keys = set(map(tuple, got.values.tolist()))
    missing = [
        t for t in map(tuple, must_emit.values.tolist())
        if t not in emitted_keys
    ]
    assert not missing, f"{len(missing)} closed sessions never emitted"


def test_running_totals_tws_bootstrapped_from_batch_history(spark, tmp_path):
    """TWS initial-state law (r9): warm-starting the running-totals
    state from a BATCH backfill (user_totals_snapshot of the
    even-event_id half) and streaming only the odd half must end at
    exactly the one-shot batch aggregation over ALL events, per user —
    the lambda-collapse pattern (backfill once, stream deltas) with no
    history replay through the stream path. Exercises
    handleInitialState + the initialState GroupedData channel."""
    from pyspark.sql import functions as F

    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("no protobuf runtime found: transformWithState gated")

    e = load_table(spark, SF_TEST, "events")
    hist = e.filter(F.col("event_id") % 2 == 0)
    live = e.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "boot_stream")
    write_ordered_stream(live, 3, src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streaming.read_events_stream(spark, src)
        got = streaming.run_to_completion(
            streaming.running_user_totals_tws(
                stream, initial_totals=streaming.user_totals_snapshot(hist)
            ),
            "t_totals_tws_boot",
            output_mode="update",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    final = (
        got.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id", ignore_index=True)
    )
    full = e.toPandas()
    full["cents"] = full["value"].mul(100).round().astype("int64")
    want = (
        full.groupby("user_id", as_index=False)
        .agg(
            n_events=("event_id", "size"),
            total_cents=("cents", "sum"),
            max_event_id=("event_id", "max"),
        )
        .sort_values("user_id", ignore_index=True)
    )
    # every user has stream events in this fixture, so the emitted set
    # covers every user and the warm start must be exactly absorbed
    pd.testing.assert_frame_equal(
        final[["user_id", "n_events", "total_cents", "max_event_id"]],
        want,
        check_dtype=False,
    )


def test_user_event_type_counts_tws_mapstate_equals_batch(
    spark, events_stream_dir
):
    """MapState law (r9, completing the TWS state-type triad): the final
    (user, event_type) running count equals the batch groupBy count for
    EVERY pair — sub-key state accumulates across micro-batches and no
    pair is lost or double-counted. Also asserts counts really crossed
    batches (more update rows than final pairs)."""
    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("no protobuf runtime found: transformWithState gated")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streaming.read_events_stream(spark, events_stream_dir)
        got = streaming.run_to_completion(
            streaming.user_event_type_counts_tws(stream),
            "t_type_counts_tws",
            output_mode="update",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    final = (
        got.sort_values("n")
        .groupby(["user_id", "event_type"], as_index=False)
        .last()
    )
    want = (
        load_table(spark, SF_TEST, "events")
        .toPandas()
        .groupby(["user_id", "event_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    m = final.merge(
        want, on=["user_id", "event_type"], suffixes=("_got", "_want"),
        how="outer", indicator=True,
    )
    assert (m["_merge"] == "both").all()
    assert (m["n_got"] == m["n_want"]).all()
    assert len(got) > len(final)  # state crossed micro-batches


def test_user_event_type_counts_tws_ttl_evicts_state(spark, tmp_path):
    """State-TTL eviction law (r10, VERDICT r9 item 8 — the one
    state-lifecycle feature the TWS triad didn't cover): with a
    processing-time TTL far shorter than the inter-micro-batch gap
    (1 ms vs the seconds a micro-batch takes), every sub-key written in
    batch k has EXPIRED by batch k+1, so each batch counts from zero —
    the emitted n's per (user, type) SUM to the all-data total
    (whereas without TTL the LAST emitted n equals it; that law is the
    sibling test above). Every pair appears in all 3 batches, so
    TTL-mode emissions must also each be strictly smaller than the
    global count.

    Run mechanics: availableNow + a short TTL makes Spark append
    no-data "cleaning up state" micro-batches indefinitely after the
    data batches (each cleanup commit re-arms the next batch's expiry
    work), so the query never self-terminates — poll recentProgress
    until all data rows are committed, then stop() and swallow the
    interrupted-checkpoint artifact. The LAW's subject (data-batch
    emissions) is fully committed to the sink before cleanup begins."""
    import os
    import shutil
    import time as _time

    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("no protobuf runtime found: transformWithState gated")

    # 3 files; every (user, type) pair appears in each with known counts
    batches = [
        {(1, "view"): 2, (1, "click"): 1, (2, "view"): 3},
        {(1, "view"): 1, (1, "click"): 4, (2, "view"): 1},
        {(1, "view"): 5, (1, "click"): 2, (2, "view"): 2},
    ]
    src = tmp_path / "ttl_events"
    src.mkdir()
    base = _time.time()
    eid = 0
    for i, counts in enumerate(batches):
        rows = []
        for (uid, et), c in counts.items():
            for _ in range(c):
                rows.append((uid, (i * 1000 + eid) * 1_000_000, eid, et, 1.0))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "user_id long, us long, event_id long, event_type string, "
            "value double",
        ).selectExpr(
            "user_id", "timestamp_micros(us) AS ts", "event_id",
            "event_type", "value",
        )
        part = tmp_path / f"ttl_stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(part))
        pf = next(p for p in os.listdir(part) if p.endswith(".parquet"))
        dst = src / f"batch-{i:05d}.parquet"
        shutil.copy(str(part / pf), str(dst))
        os.utime(str(dst), (base + i, base + i))
    n_rows = eid

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streaming.read_events_stream(spark, str(src))
        q = (
            streaming.user_event_type_counts_tws(stream, ttl_ms=1)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_type_counts_tws_ttl")
            .trigger(availableNow=True)
            .start()
        )
        try:
            deadline = _time.time() + 180
            while _time.time() < deadline:
                done = sum(
                    p["numInputRows"] for p in (q.recentProgress or [])
                )
                if done >= n_rows:
                    break
                _time.sleep(1)
            else:
                raise AssertionError("data batches never finished")
        finally:
            try:
                q.stop()  # interrupts the endless TTL-cleanup batches
            except Exception:
                pass  # mid-checkpoint interrupt artifact, not the law
        got = spark.table("t_type_counts_tws_ttl").toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    want = {}
    for counts in batches:
        for k, c in counts.items():
            want[k] = want.get(k, 0) + c
    summed = got.groupby(["user_id", "event_type"])["n"].agg(["sum", "max"])
    assert set(summed.index) == set(want)
    for k, total in want.items():
        # full-expiry law: per-batch re-counts telescope to the total
        assert summed.loc[k, "sum"] == total, (k, summed.loc[k])
        # and expiry genuinely fired: every pair spans 3 batches, so no
        # single emission carries the global count
        assert summed.loc[k, "max"] < total, (k, summed.loc[k])


def test_tws_ttl_state_size_bounded_across_batches(spark, tmp_path):
    """State-SIZE law for TTL (r11, VERDICT r10 item 7 — the
    operational assertion the r10 re-count-from-zero law implies):
    drive 5 micro-batches that each write 3 brand-NEW (user, type)
    keys with a 1 ms TTL, and read query progress stateOperators
    metrics. If expiry only masked values logically, RocksDB rows
    would accumulate 3, 6, 9, 12, 15; the law is that they DON'T —
    every data batch's numRowsTotal stays <= the per-batch key count
    (eviction physically removes the previous batch's expired rows:
    numRowsRemoved == 3 from the second data batch on), the first
    no-data cleanup batch empties the store to numRowsTotal == 0, and
    the durable state bytes (rocksdbSstFileSize) never grow across
    the trailing cleanup batches. A long-running stream's state is
    bounded by the LIVE key set, not by history.

    Run mechanics: same availableNow + poll-then-stop pattern as the
    eviction law above (TTL cleanup batches never self-terminate);
    here the poll ALSO waits for >= 3 no-data cleanup progresses so
    the flat-bytes law has a window to observe."""
    import os
    import shutil
    import time as _time

    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("no protobuf runtime found: transformWithState gated")

    keys_per_batch, n_batches = 3, 5
    src = tmp_path / "ttl_sized_events"
    src.mkdir()
    base = _time.time()
    eid = 0
    for i in range(n_batches):
        rows = []
        for u in range(keys_per_batch):  # disjoint key sets per batch
            rows.append(
                (i * 10 + u + 1, (i * 1000 + eid) * 1_000_000, eid, "view", 1.0)
            )
            eid += 1
        df = spark.createDataFrame(
            rows,
            "user_id long, us long, event_id long, event_type string, "
            "value double",
        ).selectExpr(
            "user_id", "timestamp_micros(us) AS ts", "event_id",
            "event_type", "value",
        )
        part = tmp_path / f"ttl_sized_stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(part))
        pf = next(p for p in os.listdir(part) if p.endswith(".parquet"))
        dst = src / f"batch-{i:05d}.parquet"
        shutil.copy(str(part / pf), str(dst))
        os.utime(str(dst), (base + i, base + i))
    n_rows = eid

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    seen: dict = {}
    try:
        stream = streaming.read_events_stream(spark, str(src))
        q = (
            streaming.user_event_type_counts_tws(stream, ttl_ms=1)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_tws_ttl_state_size")
            .trigger(availableNow=True)
            .start()
        )
        try:
            deadline = _time.time() + 240
            while _time.time() < deadline:
                for p in (q.recentProgress or []):
                    if p["batchId"] in seen or not p["stateOperators"]:
                        continue
                    so = p["stateOperators"][0]
                    seen[p["batchId"]] = {
                        "inp": p["numInputRows"],
                        "total": so["numRowsTotal"],
                        "removed": so["numRowsRemoved"],
                        "sst": so.get("customMetrics", {}).get(
                            "rocksdbSstFileSize"
                        ),
                    }
                done = sum(v["inp"] for v in seen.values())
                cleanups = sum(1 for v in seen.values() if v["inp"] == 0)
                if done >= n_rows and cleanups >= 3:
                    break
                _time.sleep(1)
            else:
                raise AssertionError("data + cleanup batches never observed")
        finally:
            try:
                q.stop()  # interrupts the endless TTL-cleanup batches
            except Exception:
                pass  # mid-checkpoint interrupt artifact, not the law
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    data = [seen[b] for b in sorted(seen) if seen[b]["inp"] > 0]
    clean = [seen[b] for b in sorted(seen) if seen[b]["inp"] == 0]
    assert len(data) == n_batches and len(clean) >= 3
    # 15 distinct keys were written; live state never exceeds one batch
    for i, m in enumerate(data):
        assert m["total"] <= keys_per_batch, (i, m)
        if i > 0:  # eviction PHYSICALLY removed the prior batch's keys
            assert m["removed"] == keys_per_batch, (i, m)
    # the first cleanup batch empties the store, and it stays empty
    for m in clean:
        assert m["total"] == 0, m
    # durable state bytes are flat across the trailing cleanup batches
    ssts = [m["sst"] for m in clean if m["sst"] is not None]
    if len(ssts) >= 2:
        for a, b in zip(ssts, ssts[1:]):
            assert b <= a, ssts


def test_user_sessions_tws_out_of_order_bridge(spark, tmp_path):
    """Timer-sessionization under OUT-OF-ORDER arrival (r10, VERDICT r9
    item 8): a later micro-batch delivers an event whose timestamp
    falls BETWEEN two already-buffered events of the same user —
    within the watermark, so it must not be dropped, and it BRIDGES
    what would otherwise be two separate 30-min-gap sessions into one.
    Fixture (minutes): batch0 = {0, 50} (gap 50 > 30: two sessions if
    nothing else arrives), batch1 = {25} arriving late (gaps 25 and 25:
    one merged session), batch2 = a t=+10 h event that advances the
    watermark past the close point. Law: exactly ONE session
    (start=0, end=50 min, n=3) is emitted for the bridged user — never
    the two unbridged halves — plus the control user's in-order
    session. The interval-coalesce merge and the timer re-arm are the
    code paths only an out-of-order fixture exercises."""
    import os
    import shutil
    import time as _time

    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        pytest.skip("no protobuf runtime found: transformWithState gated")

    MIN = 60 * 1_000_000  # one minute in integer microseconds
    DAY = 1440 * MIN  # base offset: an event AT epoch 0 is not strictly
    # above the INITIAL watermark (also 0) and would be dropped as late
    batches = [
        [(1, DAY + 0 * MIN), (1, DAY + 50 * MIN),
         (2, DAY + 0 * MIN), (2, DAY + 10 * MIN)],
        [(1, DAY + 25 * MIN)],  # out-of-order bridge event
        [(1, DAY + 600 * MIN), (2, DAY + 600 * MIN)],  # watermark advance
    ]
    src = tmp_path / "ooo_events"
    src.mkdir()
    base = _time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(uid, us, i * 100 + j, "view", 1.0)
             for j, (uid, us) in enumerate(rows)],
            "user_id long, us long, event_id long, event_type string, "
            "value double",
        ).selectExpr(
            "user_id", "timestamp_micros(us) AS ts", "event_id",
            "event_type", "value",
        )
        part = tmp_path / f"stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(part))
        pf = next(p for p in os.listdir(part) if p.endswith(".parquet"))
        dst = src / f"batch-{i:05d}.parquet"
        shutil.copy(str(part / pf), str(dst))
        os.utime(str(dst), (base + i, base + i))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streaming.read_events_stream(spark, str(src))
        got = streaming.run_to_completion(
            streaming.user_sessions_tws(stream),
            "t_sessions_tws_ooo",
            output_mode="append",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    by_user = {
        uid: sorted(map(tuple, g[["start_us", "end_us", "n_events"]].values))
        for uid, g in got.groupby("user_id")
    }
    # bridged user: ONE session spanning all three events — the late
    # 25-min event merged the 0-min and 50-min halves
    assert by_user.get(1) == [(DAY, DAY + 50 * MIN, 3)], by_user
    # control user: one in-order session (0 + 10 min, gap 10 <= 30)
    assert by_user.get(2) == [(DAY, DAY + 10 * MIN, 2)], by_user


def test_stream_refresh_mv_with_kll_quantile_state(spark, tmp_path):
    """Composition law (r9 tiers tied together): streaming MV
    maintenance × KLL quantile state — the per-micro-batch sketch
    folds must (1) keep the sketch's n EXACTLY equal to the algebraic
    row count after any number of streamed refreshes, and (2) land
    every finalized percentile inside the ±4% rank band of the exact
    per-group distribution (same contract as the batch MV law)."""
    from pyspark.sql import functions as F

    from console_etl_spark.session import load_table
    from console_etl_spark.store import MaterializedView, SnapshotStore
    from tests.conftest import SF_TEST

    e = load_table(spark, SF_TEST, "events").limit(3000).localCheckpoint()
    facts = tmp_path / "ev"
    for i in range(3):
        (e.filter(F.col("event_id") % 3 == i)
         .coalesce(1).write.mode("append").parquet(str(facts)))

    store = SnapshotStore(str(tmp_path / "store"))
    keys, quantiles = ("event_type",), ("value",)
    mv = MaterializedView(
        store, "mv_kll_stream", keys, (), quantiles=quantiles
    )
    q = streaming.stream_refresh_mv(spark, str(facts), mv, str(tmp_path / "ck"))
    q.awaitTermination(120)

    # law 1: sketch n == the non-null count partial, exactly, after
    # streamed merges (== _cnt here: events.value has no NULLs)
    partials = store.read(spark, "mv_kll_stream")
    for r in partials.select(
        "_cnt", "_n_value",
        F.kll_sketch_get_n_double("_kll_value").alias("kn"),
    ).collect():
        assert r.kn == r._n_value == r._cnt

    bands = {"p50": (0.46, 0.54), "p90": (0.86, 0.94), "p99": (0.95, 1.0)}
    exact = {
        r.event_type: dict(zip(sorted(bands), r.b))
        for r in e.groupBy("event_type")
        .agg(
            F.percentile(
                F.col("value").cast("double"),
                F.array(*[
                    F.lit(p) for name in sorted(bands) for p in bands[name]
                ]),
            ).alias("b")
        )
        .select(
            "event_type",
            F.array(*[
                F.slice("b", 2 * i + 1, 2) for i in range(len(bands))
            ]).alias("b"),
        )
        .collect()
    }
    for row in mv.read(spark).collect():
        for name in bands:
            lo, hi = exact[row.event_type][name]
            est = row[f"{name}_value"]
            assert lo <= est <= hi, (row.event_type, name, est, lo, hi)


# --------------------------------------------------------------------------
# Round-11 hardening (streaming review pass): replay idempotence for the
# dq/psi monitors and the MV fold, window-derived debounce win_id, NULL
# poison-pill safety, remote-safe dedup-ingest probe
# --------------------------------------------------------------------------


def test_stream_dq_monitor_replayed_epochs_idempotent(
    spark, events_stream_dir, tmp_path
):
    """A failure-retried epoch re-runs audit_batch with the same
    epoch_id; the metrics sink must REPLACE that epoch's rows (dynamic
    overwrite of _epoch=N), not append duplicates an alerting SUM would
    double-count. Simulate total replay with a fresh checkpoint onto
    the same metrics dir (the cusum/quantile r9 pattern, now applied to
    the dq monitor)."""
    metrics = str(tmp_path / "dq_metrics")
    q = streaming.stream_dq_monitor(
        spark, events_stream_dir, metrics, str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    m1 = spark.read.parquet(metrics)
    n_rows = m1.count()
    n_epochs = m1.select("epoch_id").distinct().count()
    assert n_epochs >= 2 and n_rows == 4 * n_epochs  # 4 rules per epoch

    q2 = streaming.stream_dq_monitor(
        spark, events_stream_dir, metrics, str(tmp_path / "ck2")
    )
    q2.awaitTermination(120)
    m2 = spark.read.parquet(metrics)
    assert m2.count() == n_rows
    assert m2.select("epoch_id").distinct().count() == n_epochs
    # composition law survives the replay: per-rule violation totals
    # still equal the batch count over all events
    e = load_table(spark, SF_TEST, "events")
    want_null_pk = e.filter(e.event_id.isNull()).count()
    got = {
        r.rule: r.s
        for r in m2.groupBy("rule").agg(F.sum("n_violations").alias("s")).collect()
    }
    assert got["null_pk"] == want_null_pk


def test_stream_psi_monitor_replay_idempotent_and_guards(
    spark, events_stream_dir, tmp_path
):
    """(a) PSI metrics replace their epoch partition on replay; (b) an
    empty reference and a constant reference fail fast with named
    errors instead of a bare float(None) TypeError / silent
    divide-by-zero bins."""
    ref = load_table(spark, SF_TEST, "events")
    metrics = str(tmp_path / "psi_metrics")
    q = streaming.stream_psi_monitor(
        spark, events_stream_dir, ref, metrics, str(tmp_path / "pck1")
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(metrics).count()
    q2 = streaming.stream_psi_monitor(
        spark, events_stream_dir, ref, metrics, str(tmp_path / "pck2")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(metrics).count() == n1

    empty = ref.filter(F.lit(False))
    with pytest.raises(ValueError, match="no non-null"):
        streaming.stream_psi_monitor(
            spark, events_stream_dir, empty, str(tmp_path / "m2"),
            str(tmp_path / "pck3"),
        )
    const = ref.withColumn("value", F.lit(1.0))
    with pytest.raises(ValueError, match="constant"):
        streaming.stream_psi_monitor(
            spark, events_stream_dir, const, str(tmp_path / "m3"),
            str(tmp_path / "pck4"),
        )


def test_mv_refresh_epoch_tag_makes_replay_noop(spark, tmp_path):
    """stream_refresh_mv's exactly-once story: a replayed fold (same
    epoch_tag as the CURRENT version) must be a no-op returning the
    current snapshot — the tag flips atomically with the data, so a
    crash between publish and checkpoint commit cannot double-count."""
    from console_etl_spark.store import MaterializedView, SnapshotStore

    store = SnapshotStore(str(tmp_path / "mvstore"))
    mv = MaterializedView(store, "mv_epoch", ("g",), ("v",))
    d1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    d2 = spark.createDataFrame([("a", 3.0)], "g string, v double")

    mv.refresh(d1, epoch_tag="e000000000000")   # build path, tagged
    v1 = store.current("mv_epoch").version
    assert v1.endswith("-e000000000000")

    mv.refresh(d2, epoch_tag="e000000000001")
    v2 = store.current("mv_epoch").version
    snap = mv.read(spark).orderBy("g").collect()

    # replay of epoch 1: same delta, same tag -> no-op, state unchanged
    out = mv.refresh(d2, epoch_tag="e000000000001")
    assert out.version == v2
    assert store.current("mv_epoch").version == v2
    assert mv.read(spark).orderBy("g").collect() == snap

    # a NEW epoch still applies on top
    mv.refresh(d2, epoch_tag="e000000000002")
    after = {r.g: r for r in mv.read(spark).collect()}
    assert after["a"].n_rows == 3  # build + replay-suppressed + new epoch
    assert after["a"].sum_v == 7.0  # 1 + 3 (replay NOT double-counted) + 3


def test_mv_replay_guard_survives_manual_refresh_between(spark, tmp_path):
    """ADVICE r11 (store.py replay guard): an UNTAGGED manual refresh
    landing between a crash (post-publish, pre-checkpoint-commit) and
    the stream's replay must not defeat the epoch guard. The manual
    refresh carries the last applied tag forward in its version string,
    and replays of numerically-older epochs are recognized as applied."""
    from console_etl_spark.store import MaterializedView, SnapshotStore

    store = SnapshotStore(str(tmp_path / "mvstore2"))
    mv = MaterializedView(store, "mv_guard", ("g",), ("v",))
    d1 = spark.createDataFrame([("a", 1.0)], "g string, v double")
    d2 = spark.createDataFrame([("a", 3.0)], "g string, v double")
    manual = spark.createDataFrame([("a", 10.0)], "g string, v double")

    mv.refresh(d1, epoch_tag="e000000000000")
    mv.refresh(d2, epoch_tag="e000000000001")  # "crash" after this publish
    # operator runs a manual (untagged) refresh before the stream restarts
    mv.refresh(manual)
    v_manual = store.current("mv_guard").version
    assert v_manual.endswith("-e000000000001")  # tag carried forward
    snap = mv.read(spark).collect()

    # stream restarts and replays epoch 1: must be a no-op, NOT a
    # second fold of d2 (the r11 guard matched only the current
    # version's suffix, which the manual refresh had replaced)
    out = mv.refresh(d2, epoch_tag="e000000000001")
    assert out.version == v_manual
    assert mv.read(spark).collect() == snap
    row = mv.read(spark).collect()[0]
    assert row.sum_v == 14.0  # 1 + 3 + 10, d2 folded exactly once
    assert row.n_rows == 3

    # an even OLDER epoch replay is also recognized as applied
    assert mv.refresh(d1, epoch_tag="e000000000000").version == v_manual
    # but the NEXT epoch still applies
    mv.refresh(d2, epoch_tag="e000000000002")
    assert mv.read(spark).collect()[0].sum_v == 17.0
    # non-numeric custom tags keep equality-only semantics
    assert not MaterializedView._already_applied("release-b", "release-a")
    assert MaterializedView._already_applied("release-a", "release-a")


def test_mv_epoch_guard_is_run_scoped(spark, tmp_path):
    """ADVICE r12 (store.py:850): the numeric-older rule assumed one
    monotone epoch source per catalog, so a stream restarted with a
    FRESH checkpoint (epoch counter back at 0) — or a second writer
    stream — had its early epochs silently no-op'd and their deltas
    dropped. Tags are now run-scoped (``r<runid>-e<epoch>``): the
    numeric-older rule applies only within one run id; across runs
    (including one tagged, one legacy untagged) only full equality
    skips."""
    from console_etl_spark.store import MaterializedView, SnapshotStore
    from console_etl_spark.streaming import checkpoint_run_id

    store = SnapshotStore(str(tmp_path / "mvstore3"))
    mv = MaterializedView(store, "mv_runs", ("g",), ("v",))
    d = spark.createDataFrame([("a", 1.0)], "g string, v double")

    # run A folds epochs 0..1, then the stream is retired
    mv.refresh(d, epoch_tag="raaaa1111-e000000000000")
    mv.refresh(d, epoch_tag="raaaa1111-e000000000001")
    assert mv.read(spark).collect()[0].sum_v == 2.0

    # a FRESH-checkpoint restart (run B) legitimately restarts at
    # epoch 0 over new-only input: its fold must APPLY, not no-op
    mv.refresh(d, epoch_tag="rbbbb2222-e000000000000")
    assert mv.read(spark).collect()[0].sum_v == 3.0
    v_b0 = store.current("mv_runs").version

    # ...while run B's own crash-replay of that epoch is still a no-op
    out = mv.refresh(d, epoch_tag="rbbbb2222-e000000000000")
    assert out.version == v_b0
    assert mv.read(spark).collect()[0].sum_v == 3.0
    # and run B's numeric-older rule works within run B
    mv.refresh(d, epoch_tag="rbbbb2222-e000000000001")
    assert not MaterializedView._already_applied(
        "rbbbb2222-e000000000001", "rbbbb2222-e000000000002"
    )
    assert MaterializedView._already_applied(
        "rbbbb2222-e000000000001", "rbbbb2222-e000000000000"
    )

    # mixed legacy/tagged: numeric-older must NOT cross the boundary
    assert not MaterializedView._already_applied(
        "e000000000057", "rcccc3333-e000000000000"
    )
    assert not MaterializedView._already_applied(
        "rcccc3333-e000000000057", "e000000000000"
    )

    # a custom tag that merely LOOKS run-shaped must not adopt
    # monotone semantics — run ids are exactly 8 lowercase hex chars
    assert not MaterializedView._already_applied("reload-e7", "reload-e3")
    assert MaterializedView._already_applied("reload-e3", "reload-e3")

    # the emitter's run id: stable for one checkpoint dir across EVERY
    # spelling a crash-restart might use (trailing slash, file:// URI,
    # relative path, symlink — re-spelling the same dir must not mint
    # a new run id or the replay guard double-folds), distinct across
    # dirs, and scheme-aware for remote URIs
    import os

    ck1 = tmp_path / "ck1"
    ck1.mkdir()
    a = checkpoint_run_id(str(ck1))
    assert a == checkpoint_run_id(str(ck1) + "/")
    assert a == checkpoint_run_id("file://" + str(ck1))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert a == checkpoint_run_id("ck1")
    finally:
        os.chdir(cwd)
    link = tmp_path / "ck1_link"
    os.symlink(str(ck1), str(link))
    assert a == checkpoint_run_id(str(link))
    assert a != checkpoint_run_id(str(tmp_path / "ck2"))
    assert len(a) == 8 and int(a, 16) >= 0
    s3 = checkpoint_run_id("s3a://bucket/ck/")
    assert s3 == checkpoint_run_id("s3a://bucket/ck")
    assert s3 != checkpoint_run_id("s3a://bucket/other")


def test_stream_refresh_mv_fresh_checkpoint_restart_not_dropped(
    spark, tmp_path
):
    """End-to-end run-scope proof through stream_refresh_mv itself: a
    second stream run over NEW input with a FRESH checkpoint starts
    back at epoch 0, and its delta must land in the view (the pre-r13
    unscoped guard dropped it as 'numerically older')."""
    from console_etl_spark import streaming
    from console_etl_spark.store import MaterializedView, SnapshotStore

    src = tmp_path / "facts"
    src.mkdir()
    d1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    d1.coalesce(1).write.mode("append").parquet(str(src))

    store = SnapshotStore(str(tmp_path / "mvstore4"))
    mv = MaterializedView(store, "mv_fresh", ("g",), ("v",))
    q1 = streaming.stream_refresh_mv(
        spark, str(src), mv, str(tmp_path / "ckA")
    )
    q1.awaitTermination(120)
    assert store.current("mv_fresh").version.split("-e")[0].endswith(
        "r" + streaming.checkpoint_run_id(str(tmp_path / "ckA"))
    )
    base = {r.g: r.sum_v for r in mv.read(spark).collect()}
    assert base == {"a": 1.0, "b": 2.0}

    # new input lands; the operator restarts the stream with a FRESH
    # checkpoint dir (run 2, epoch ids reset to 0)
    d2 = spark.createDataFrame([("a", 10.0)], "g string, v double")
    d2.coalesce(1).write.mode("append").parquet(str(src))
    q2 = streaming.stream_refresh_mv(
        spark, str(src), mv, str(tmp_path / "ckB")
    )
    q2.awaitTermination(120)
    after = {r.g: r.sum_v for r in mv.read(spark).collect()}
    # run 2 re-reads BOTH files (fresh source checkpoint) — the point
    # under test is that its epoch-0 folds were NOT silently dropped
    assert after == {"a": 12.0, "b": 4.0}


def test_interval_micros_grammar(spark):
    """ADVICE r11 (streaming.py): _interval_micros must accept the same
    fixed-length grammar F.window() does — week/millisecond units and
    compound '1 hour 30 minutes' specs — and reject garbage with a
    message naming the supported grammar."""
    import pytest

    from console_etl_spark.streaming import _interval_micros

    assert _interval_micros("10 minutes") == 600_000_000
    assert _interval_micros("1 week") == 604_800_000_000
    assert _interval_micros("250 milliseconds") == 250_000
    assert _interval_micros("5 microseconds") == 5
    assert (
        _interval_micros("1 hour 30 minutes")
        == 3_600_000_000 + 30 * 60_000_000
    )
    assert _interval_micros("2 days 4 hours 1 second") == (
        2 * 86_400_000_000 + 4 * 3_600_000_000 + 1_000_000
    )
    with pytest.raises(ValueError, match="supported units"):
        _interval_micros("3 months")  # variable-length: no fixed divisor
    with pytest.raises(ValueError, match="pairs"):
        _interval_micros("10")
    with pytest.raises(ValueError, match="pairs"):
        _interval_micros("")


def test_debounce_stream_nondefault_window_win_ids(spark, events_stream_dir):
    """win_id must derive from the WINDOW ARGUMENT: with a 5-minute
    window, two adjacent windows floor-divide to DIFFERENT win_ids (the
    hardcoded 10-minute divisor collapsed them), and win_id must equal
    the integer-microsecond floor of the window start."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    got = streaming.run_to_completion(
        streaming.debounce_stream(stream, window="5 minutes"),
        "t_debounce_5m",
    ).toPandas()
    e = load_table(spark, SF_TEST, "events").toPandas()
    us = e["ts"].astype("int64") // 1000
    want_ids = set(us // 300_000_000)
    assert set(got["win_id"]) <= want_ids
    # adjacent 5-minute windows stay distinct: the number of distinct
    # win_ids matches the true 5-minute occupancy, not the 10-minute one
    assert got["win_id"].nunique() == len(want_ids)
    # keys are unique per (user, type, window)
    assert not got.duplicated(["user_id", "event_type", "win_id"]).any()


def test_running_user_totals_null_value_not_poison(spark, tmp_path):
    """One NULL value must not kill the stateful query (NaN.astype
    raises), and totals must match the batch semantics: COUNT(*) rows,
    SUM skips NULLs."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, "view", 1.25, "{}"),
        (2, "2024-01-01 00:01:00", 7, "view", None, "{}"),
        (3, "2024-01-01 00:02:00", 7, "view", 2.50, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "nullval")
    df.coalesce(1).write.parquet(src)
    stream = streaming.read_events_stream(spark, src)
    got = streaming.run_to_completion(
        streaming.running_user_totals(stream), "t_nullval", output_mode="update"
    ).toPandas()
    last = got.sort_values("n_events").iloc[-1]
    assert last["n_events"] == 3          # COUNT(*) semantics
    assert last["total_cents"] == 375     # SUM skips the NULL
    assert last["max_event_id"] == 3


def test_stream_dedup_ingest_fresh_checkpoint_full_replay(spark, tmp_path):
    """Losing the CHECKPOINT (but not the index) replays every file;
    the persistent index + per-epoch dynamic overwrite must leave the
    output byte-stable — zero new or duplicated documents."""
    import glob
    import os
    import time

    docs = load_table(spark, SF_TEST, "documents").limit(30)
    src = tmp_path / "replay_src"
    base = time.time() - 100
    for i in range(3):
        part = docs.filter((F.col("doc_id") % 3) == i).coalesce(1)
        part.write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))
        for p in glob.glob(str(src / f"b{i}.parquet" / "part-*")):
            os.utime(p, (base + i, base + i))
    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    q = streaming.stream_dedup_ingest(
        spark, str(src) + "/*", out, idx, str(tmp_path / "dck1")
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    n = first.count()
    assert n == first.select("doc_id").distinct().count()

    q2 = streaming.stream_dedup_ingest(
        spark, str(src) + "/*", out, idx, str(tmp_path / "dck2")
    )
    q2.awaitTermination(120)
    again = spark.read.parquet(out)
    assert again.count() == n
    assert again.select("doc_id").distinct().count() == n


def test_epoch_sink_contract_single_write_site():
    """VERDICT r11 item 7: write_epoch_partition is the ONLY place a
    foreachBatch sink may configure dynamic partition overwrite — a new
    sink writing parquet any other way (e.g. append mode, the pre-r11
    default that shipped three duplicating sinks) must show up here.
    Pins: exactly one partitionOverwriteMode site in streaming.py, no
    append-mode parquet writes anywhere in the module."""
    import inspect

    from console_etl_spark import streaming

    src = inspect.getsource(streaming)
    assert src.count("partitionOverwriteMode") == 1
    assert 'mode("append")' not in src
    # the helper itself stamps _epoch: a caller-supplied column is
    # replaced, so the partition key can never disagree with epoch_id
    helper = inspect.getsource(streaming.write_epoch_partition)
    assert 'withColumn("_epoch"' in helper


def _croston_weekly_zclass(spark):
    """Weekly centi-unit demand rows for the Z-class parts the batch
    query forecasts — rebuilt with the same expressions (NOT by calling
    into the batch fn's internals) so the stream fixture is an
    independent derivation."""
    from console_etl_spark.session import load_table
    from tests.conftest import SF_TEST

    li = load_table(spark, SF_TEST, "lineitem")
    base = li.select(
        "l_partkey",
        F.expr(
            "unix_micros(cast(l_shipdate as timestamp))"
            " div 86400000000 div 7"
        ).alias("w"),
        (F.col("l_quantity").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("qc"),
    )
    weekly = base.groupBy("l_partkey", "w").agg(
        F.sum("qc").cast("bigint").alias("q")
    )
    from console_etl_spark.relational import forecast_croston_intermittent

    batch = forecast_croston_intermittent(spark, SF_TEST)
    parts = batch.select(F.col("partkey").alias("l_partkey"))
    return weekly.join(parts, "l_partkey"), batch


def test_stream_croston_equals_batch(spark, tmp_path):
    """VERDICT r12 item 4: the streaming Croston twin, fed a part's
    full weekly-demand history in arrival order, must land on EXACTLY
    the batch query's state — same seeds, same alpha, same
    multiply-then-add fold, bit-for-bit after the same rounding."""
    weekly, batch = _croston_weekly_zclass(spark)
    src = str(tmp_path / "croston_src")
    # week-ordered drops: 3 contiguous week ranges -> 3 micro-batches
    import glob
    import os
    import time

    weekly.repartitionByRange(3, "w").write.mode("overwrite").parquet(src)
    base_t = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
        os.utime(f, (base_t + i, base_t + i))

    out = str(tmp_path / "croston_out")
    q = streaming.stream_croston_intermittent(
        spark, src, out, str(tmp_path / "croston_ck")
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    # freshest row per part = the max-n_demands row (state is monotone)
    wlast = W.partitionBy("partkey").orderBy(F.col("n_demands").desc())
    final = (
        got.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .drop("rn", "_epoch")
    )
    want = {r["partkey"]: r for r in batch.collect()}
    rows = {r["partkey"]: r for r in final.collect()}
    assert set(rows) == set(want)
    for pk, r in rows.items():
        b = want[pk]
        assert r["n_demands"] == b["n_demands"], pk
        for c in ("z_hat", "p_hat", "croston_fc", "sba_fc"):
            assert r[c] == b[c], (pk, c, r[c], b[c])


def test_stream_croston_replay_and_restart(spark, tmp_path):
    """The twin's delivery contract: (a) a restart with the SAME
    checkpoint resumes without re-emitting or double-folding served
    batches; (b) a full fresh-checkpoint replay over the same input
    rewrites the same ``_epoch`` partitions in place (dynamic
    overwrite), leaving the reader's freshest-row view unchanged —
    the write_epoch_partition idempotence class."""
    weekly, batch = _croston_weekly_zclass(spark)
    src = str(tmp_path / "cr_src")
    import glob
    import os
    import time

    weekly.repartitionByRange(3, "w").write.mode("overwrite").parquet(src)
    base_t = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
        os.utime(f, (base_t + i, base_t + i))

    out = str(tmp_path / "cr_out")
    ck = str(tmp_path / "cr_ck")
    q = streaming.stream_croston_intermittent(spark, src, out, ck)
    q.awaitTermination(180)
    before = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("_epoch").collect()
    )

    # (a) same-checkpoint restart with no new input: a no-op
    q2 = streaming.stream_croston_intermittent(spark, src, out, ck)
    q2.awaitTermination(180)
    after_restart = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("_epoch").collect()
    )
    assert after_restart == before

    # (b) fresh-checkpoint full replay: same epochs regenerate, dynamic
    # overwrite replaces them, the sink converges to the same contents
    q3 = streaming.stream_croston_intermittent(
        spark, src, out, str(tmp_path / "cr_ck2")
    )
    q3.awaitTermination(180)
    after_replay = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("_epoch").collect()
    )
    assert after_replay == before


def test_croston_tws_warm_start_equals_batch(spark, tmp_path):
    """TWS Croston warm-start law (the lambda-collapse pattern): seed
    per-part state from croston_state_snapshot over the HISTORY weeks,
    stream only the TAIL weeks, and every part that receives a tail
    update must land on exactly the registered batch query's row over
    the FULL history — bit-for-bit after the same rounding. Exercises
    handleInitialState + the initialState GroupedData channel on the
    forecast tier."""
    from tests.conftest import HAVE_PROTOBUF

    if not HAVE_PROTOBUF:
        weekly, _ = _croston_weekly_zclass(spark)
        plan = streaming.stream_croston_updates_tws(
            weekly.limit(0), initial_states=None
        )
        assert dict(plan.dtypes)["croston_fc"] == "double"
        pytest.skip("no protobuf runtime found: transformWithState gated")

    weekly, batch = _croston_weekly_zclass(spark)
    split_w = weekly.approxQuantile("w", [0.6], 0.0)[0]
    hist = weekly.filter(F.col("w") <= split_w)
    tail = weekly.filter(F.col("w") > split_w)
    assert tail.count() > 0

    src = str(tmp_path / "ctws_src")
    import glob
    import os
    import time

    tail.repartitionByRange(2, "w").write.mode("overwrite").parquet(src)
    base_t = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
        os.utime(f, (base_t + i, base_t + i))

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        reader = (
            spark.readStream.format("parquet")
            .option("maxFilesPerTrigger", 1)
            .schema(spark.read.parquet(src).schema)
        )
        got = streaming.run_to_completion(
            streaming.stream_croston_updates_tws(
                reader.load(src),
                initial_states=streaming.croston_state_snapshot(hist),
            ),
            "t_croston_tws_boot",
            output_mode="update",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    # freshest emitted row per part (state is monotone in n_demands)
    final = (
        got.sort_values("n_demands")
        .groupby("partkey", as_index=False)
        .last()
    )
    want = {r["partkey"]: r for r in batch.collect()}
    assert len(final) > 0
    n_checked = 0
    for row in final.itertuples():
        if row.partkey not in want:
            # a part can cross the >= 3 gate on tail rows alone while
            # the FULL-history batch query excluded it only if it
            # failed the Z-gate there; those parts aren't in `weekly`
            # by construction, so this must not happen
            raise AssertionError(f"part {row.partkey} not in batch output")
        b = want[row.partkey]
        if row.n_demands != b["n_demands"]:
            # a part whose tail rows were all consumed but whose final
            # update was emitted in an earlier batch — n_demands must
            # still match the full history for the LAST emitted row
            raise AssertionError(
                (row.partkey, row.n_demands, b["n_demands"])
            )
        for c in ("z_hat", "p_hat", "croston_fc", "sba_fc"):
            assert getattr(row, c) == b[c], (row.partkey, c)
        n_checked += 1
    assert n_checked >= 50  # the tail split touches a real fleet of parts


def test_markov_tws_warm_start_equals_batch(spark, tmp_path):
    """TWS Markov warm-start law (VERDICT r13 item 5, the
    lambda-collapse pattern ported from the Croston twin): seed
    per-user last-type state from markov_state_snapshot over the
    HISTORY events, stream only the TAIL events, and the history's
    batch transition counts plus the streamed tail counts must equal
    the registered batch query over the FULL history — the seeded
    state contributes exactly the one history->tail bridge transition
    per user that neither half alone contains."""
    from tests.conftest import HAVE_PROTOBUF

    from console_etl_spark.relational import markov_event_transitions
    from console_etl_spark.session import load_table

    events = load_table(spark, SF_TEST, "events")
    if not HAVE_PROTOBUF:
        plan = streaming.stream_markov_transitions_tws(
            events.limit(0), initial_states=None
        )
        assert dict(plan.dtypes)["n"] == "bigint"
        pytest.skip("no protobuf runtime found: transformWithState gated")

    # the split must be a TIME-prefix: the snapshot's last-type is only
    # the predecessor of the tail's first event if every history row
    # precedes every tail row in (ts, event_id) order (ties at the
    # boundary microsecond all land in history via <=)
    split_us = events.select(
        F.unix_micros("ts").alias("us")
    ).approxQuantile("us", [0.6], 0.0)[0]
    hist = events.filter(F.unix_micros("ts") <= split_us)
    tail = events.filter(F.unix_micros("ts") > split_us)
    assert tail.count() > 0 and hist.count() > 0

    src = str(tmp_path / "mtws_src")
    import glob
    import os
    import time

    tail.repartitionByRange(2, "ts").write.mode("overwrite").parquet(src)
    base_t = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
        os.utime(f, (base_t + i, base_t + i))

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        reader = (
            spark.readStream.format("parquet")
            .option("maxFilesPerTrigger", 1)
            .schema(spark.read.parquet(src).schema)
        )
        got = streaming.run_to_completion(
            streaming.stream_markov_transitions_tws(
                reader.load(src),
                initial_states=streaming.markov_state_snapshot(hist),
            ),
            "t_markov_tws_boot",
            output_mode="append",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    stream_counts: dict = {}
    for row in got.itertuples():
        k = (row.from_type, row.to_type)
        stream_counts[k] = stream_counts.get(k, 0) + int(row.n)
    # history-half transition counts via the registered query's own
    # lead-window shape on the hist relation
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hist_pairs = (
        hist.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .count()
        .collect()
    )
    combined = dict(stream_counts)
    for r in hist_pairs:
        k = (r["from_type"], r["to_type"])
        combined[k] = combined.get(k, 0) + int(r["count"])
    want = {
        (r.from_type, r.to_type): r.n
        for r in markov_event_transitions(spark, SF_TEST).collect()
    }
    assert combined == want
    # and the bridge really fired: the stream alone undercounts
    assert stream_counts != want


def test_attribution_tws_warm_start_equals_batch(spark, tmp_path):
    """TWS attribution warm-start law (VERDICT r13 item 5, third port
    after Croston and Markov): seed per-user last-marketing-touch
    state from attribution_state_snapshot over the HISTORY events,
    stream only the TAIL events, and the history-half batch
    attribution plus the streamed tail credits must equal the
    registered batch query over the FULL history — the seeded touch
    supplies exactly the cross-boundary credit (a tail purchase
    inside the lookback of a history touch) that neither half alone
    contains."""
    from tests.conftest import HAVE_PROTOBUF

    from console_etl_spark.relational import attribution_last_touch
    from console_etl_spark.session import load_table

    events = load_table(spark, SF_TEST, "events")
    if not HAVE_PROTOBUF:
        plan = streaming.stream_attribution_last_touch_tws(
            events.limit(0), initial_states=None
        )
        assert dict(plan.dtypes)["n"] == "bigint"
        pytest.skip("no protobuf runtime found: transformWithState gated")

    # TIME-prefix split (the markov test's rule): boundary ties land in
    # history via <=, so the snapshot's touch is the true predecessor
    # of every tail row
    split_us = events.select(
        F.unix_micros("ts").alias("us")
    ).approxQuantile("us", [0.6], 0.0)[0]
    hist = events.filter(F.unix_micros("ts") <= split_us)
    tail = events.filter(F.unix_micros("ts") > split_us)
    assert tail.count() > 0 and hist.count() > 0

    src = str(tmp_path / "atws_src")
    import glob
    import os
    import time

    tail.repartitionByRange(2, "ts").write.mode("overwrite").parquet(src)
    base_t = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
        os.utime(f, (base_t + i, base_t + i))

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        reader = (
            spark.readStream.format("parquet")
            .option("maxFilesPerTrigger", 1)
            .schema(spark.read.parquet(src).schema)
        )
        got = streaming.run_to_completion(
            streaming.stream_attribution_last_touch_tws(
                reader.load(src),
                initial_states=streaming.attribution_state_snapshot(hist),
            ),
            "t_attr_tws_boot",
            output_mode="append",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    stream_counts: dict = {}
    for row in got.itertuples():
        stream_counts[row.channel] = (
            stream_counts.get(row.channel, 0) + int(row.n)
        )

    def batch_attr_counts(rel):
        """The registered query's own carried-window shape on a
        sub-relation."""
        w = (
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        is_mkt = F.col("event_type").isin("view", "click", "signup")
        carried = rel.select(
            "event_type",
            "ts",
            F.last(F.when(is_mkt, F.col("ts")), ignorenulls=True)
            .over(w)
            .alias("mkt_ts"),
            F.last(F.when(is_mkt, F.col("event_type")), ignorenulls=True)
            .over(w)
            .alias("mkt_type"),
        )
        within = F.col("mkt_ts").isNotNull() & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("mkt_ts"))
            <= streaming.ATTR_LOOKBACK_US
        )
        rows = (
            carried.filter(F.col("event_type") == "purchase")
            .select(
                F.when(within, F.col("mkt_type"))
                .otherwise(F.lit("unattributed"))
                .alias("channel")
            )
            .groupBy("channel")
            .count()
            .collect()
        )
        return {r["channel"]: int(r["count"]) for r in rows}

    combined = dict(stream_counts)
    for ch, n in batch_attr_counts(hist).items():
        combined[ch] = combined.get(ch, 0) + n
    want = {
        r["channel"]: int(r["n_purchases"])
        for r in attribution_last_touch(spark, SF_TEST).collect()
    }
    assert combined == want
    # and the warm start really mattered: the streamed tail's credits
    # differ from attributing the tail in isolation (cross-boundary
    # purchases would land 'unattributed' without the seeded touch)
    assert stream_counts != batch_attr_counts(tail)


def test_sessions_tws_warm_start_equals_batch(spark, tmp_path):
    """TWS sessionization warm-start law (the fourth and final
    handleInitialState port): seed per-user OPEN sessions from
    session_state_snapshot over the HISTORY events, stream only the
    TAIL, and closed-history sessions + stream-emitted sessions must
    be exactly full-history batch sessions — with the watermark
    completeness guarantee intact (every full session whose close
    point precedes the final watermark appears in exactly one half)
    and at least one emitted session SPANNING the boundary (the
    bridge neither half alone contains). Also pins the snapshot
    itself against an independent pandas fold, and that a seeded
    session with no tail events still closes by TIMER."""
    import glob
    import os
    import time

    from tests.conftest import HAVE_PROTOBUF

    from console_etl_spark.session import load_table

    events = load_table(spark, SF_TEST, "events")
    if not HAVE_PROTOBUF:
        plan = streaming.user_sessions_tws(
            events.limit(0).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
        )
        assert dict(plan.dtypes)["n_events"] == "bigint"
        pytest.skip("no protobuf runtime found: transformWithState gated")

    gap_us = streaming.SESSION_GAP_US

    def batch_sessions(pdf):
        out = []
        pdf = pdf.copy()
        pdf["us"] = pdf["ts"].astype("int64") // 1000
        for uid, grp in pdf.sort_values(["user_id", "us"]).groupby(
            "user_id"
        ):
            cur = None
            for t in grp["us"]:
                if cur is None or t - cur[1] > gap_us:
                    if cur is not None:
                        out.append((uid, cur[0], cur[1], cur[2]))
                    cur = [t, t, 1]
                else:
                    cur[1] = t
                    cur[2] += 1
            out.append((uid, cur[0], cur[1], cur[2]))
        return set(out)

    e_pdf = events.toPandas()
    full_sess = batch_sessions(e_pdf)
    # Choose the split INSIDE the earliest multi-moment session, so the
    # boundary provably BISECTS a live session: a quantile split of
    # this sparse fixture lands in dead air (zero spanning sessions),
    # which would leave the warm-start bridge unexercised. Earliest end
    # => its close point sits far before the final watermark, so the
    # bridged session MUST be emitted.
    target = min(
        (s for s in full_sess if s[1] < s[2]), key=lambda s: (s[2], s[0])
    )
    t_us = e_pdf[e_pdf["user_id"] == target[0]]["ts"].astype(
        "int64"
    ) // 1000
    in_sess = t_us[(t_us >= target[1]) & (t_us <= target[2])]
    split_us = int(in_sess[in_sess < target[2]].max())
    us_col = F.unix_micros(F.col("ts").cast("timestamp"))
    hist = events.filter(us_col <= split_us)
    tail = events.filter(us_col > split_us)
    assert hist.count() > 0 and tail.count() > 0
    assert any(s[1] <= split_us < s[2] for s in full_sess)

    hist_sess = batch_sessions(e_pdf[(e_pdf["ts"].astype("int64") // 1000) <= split_us])
    closed_hist = {s for s in hist_sess if s[2] + gap_us <= split_us}
    open_hist = hist_sess - closed_hist

    # snapshot law: the Spark-side open-session seed equals the
    # independent pandas fold's open half exactly
    snap = {
        (r["user_id"], r["start_us"], r["last_us"], r["n"])
        for r in streaming.session_state_snapshot(hist, split_us).collect()
    }
    assert snap == open_hist

    src = str(tmp_path / "stws_src")
    tail.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    base_t = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
        os.utime(f, (base_t + i, base_t + i))

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        reader = (
            spark.readStream.format("parquet")
            .option("maxFilesPerTrigger", 1)
            .schema(spark.read.parquet(src).schema)
        )
        got = streaming.run_to_completion(
            streaming.user_sessions_tws(
                reader.load(src),
                initial_sessions=streaming.session_state_snapshot(
                    hist, split_us
                ),
            ),
            "t_sessions_tws_boot",
            output_mode="append",
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    emitted = set(
        (int(r.user_id), int(r.start_us), int(r.end_us), int(r.n_events))
        for r in got.itertuples()
    )
    # every emitted session is exactly a FULL-history batch session
    assert emitted <= full_sess
    # closed history is full-batch too, and the two halves are disjoint
    assert closed_hist <= full_sess
    assert not (emitted & closed_hist)
    # completeness under the final watermark (max event time seen
    # before the last micro-batch, minus the 2 h delay; strict close
    # gate + 1 ms timer offset as in the cold-start law)
    files = sorted(glob.glob(os.path.join(src, "part-*")))
    head_max_us = (
        spark.read.parquet(*files[:-1])
        .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .collect()[0][0]
    )
    wm_us = head_max_us - 2 * 3600 * 1_000_000
    must = {
        s for s in full_sess if s[2] + gap_us + 1000 <= wm_us
    }
    have = emitted | closed_hist
    missing = must - have
    assert not missing, f"{len(missing)} closeable sessions unemitted"
    # the bridge fired: at least one emitted session spans the split
    assert any(s[1] <= split_us < s[2] for s in emitted)


# --------------------------------------------------------------------------
# Stateful-tier projection contract (r15, VERDICT r14 item 4)
# --------------------------------------------------------------------------

def _state_input_columns(df) -> set[str]:
    """Column names crossing the state-store shuffle + Arrow boundary:
    the output of the stateful pandas operator's stream-side child in
    the analyzed plan."""
    node = df._jdf.queryExecution().analyzed()

    def find(n):
        if n.nodeName() in (
            "FlatMapGroupsInPandasWithState",
            "TransformWithStateInPySpark",
            "TransformWithStateInPandas",
        ):
            return n
        ch = n.children()
        for i in range(ch.length()):
            got = find(ch.apply(i))
            if got is not None:
                return got
        return None

    s = find(node)
    assert s is not None, "no stateful pandas operator in plan"
    out = s.children().apply(0).output()
    return {out.apply(i).name() for i in range(out.length())}


def test_stateful_ops_project_before_state_shuffle(spark, events_stream_dir):
    """Pin the r14 §4.1 optimization for all eight arbitrary-state
    operators: Spark cannot column-prune into an opaque pandas state
    function, so each operator must itself project to exactly the
    columns its function reads BEFORE groupBy — otherwise the unused
    props JSON (the widest events column) crosses the state-store
    shuffle and the Arrow boundary on every row. The batch bench cannot
    see this (streaming-only), so the plan is the evidence artifact:
    regressing any operator to a wider input breaks this test."""
    stream = streaming.read_events_stream(spark, events_stream_dir)
    expected = {
        streaming.running_user_totals: {"user_id", "event_id", "value"},
        streaming.running_user_totals_tws: {"user_id", "event_id", "value"},
        streaming.stream_markov_transitions: {
            "user_id", "ts", "event_id", "event_type"
        },
        streaming.stream_markov_transitions_tws: {
            "user_id", "ts", "event_id", "event_type"
        },
        streaming.stream_attribution_last_touch: {
            "user_id", "ts", "event_id", "event_type"
        },
        streaming.stream_attribution_last_touch_tws: {
            "user_id", "ts", "event_id", "event_type"
        },
        streaming.user_event_type_counts_tws: {"user_id", "event_type"},
        streaming.user_sessions_tws: {"user_id", "ts"},
    }
    for op, want in expected.items():
        got = _state_input_columns(op(stream))
        assert got == want, f"{op.__name__}: state input {got} != {want}"
        assert "props" not in got, f"{op.__name__} ships props into state"
