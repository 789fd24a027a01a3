"""Format round-trip tests for the source/sink layer: every supported
format must reproduce rows AND types exactly (SURVEY.md §2.2)."""

from __future__ import annotations

import pandas as pd
import pytest

from console_etl_spark import sources
from console_etl_spark.session import load_table
from tests.conftest import SF_TEST


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, ignore_index=True)


@pytest.mark.parametrize("fmt", sources.SUPPORTED_FORMATS)
def test_roundtrip_orders(spark, tmp_path, fmt):
    """orders covers int64, double, string, and timestamp columns."""
    orig = load_table(spark, SF_TEST, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    sources.write_table(orig, path, fmt)
    back = sources.read_table(spark, path, fmt, schema=orig.schema)
    assert back.schema == orig.schema
    pd.testing.assert_frame_equal(_canon(back), _canon(orig))


def test_partitioned_write_prunes(spark, tmp_path):
    """A partitioned sink must produce a layout whose reads are
    partition-pruned (the store's two-level layout, generalized)."""
    docs = load_table(spark, SF_TEST, "documents")
    path = str(tmp_path / "docs_part")
    sources.write_table(docs, path, "parquet", partition_by=("lang",))
    back = sources.read_table(spark, path, "parquet").filter("lang = 'es'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    want = docs.filter("lang = 'es'").count()
    assert back.count() == want


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        sources.read_table(spark, str(tmp_path), "csv")


def test_unknown_format_rejected(spark, tmp_path):
    docs = load_table(spark, SF_TEST, "documents")
    with pytest.raises(ValueError, match="unsupported"):
        sources.write_table(docs, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported"):
        sources.read_table(spark, str(tmp_path), "avro")


def test_read_media_dir_end_to_end(spark, tmp_path):
    """binaryFile ingestion of a real media directory: stdlib-encoded
    WAV + PNG + SVG files on disk -> (doc_id, payload, media_type,
    n_bytes) -> the multimodal decoders reproduce the encoded content."""
    from console_etl_spark.llmops import multimodal

    media = tmp_path / "media"
    media.mkdir()
    amp, period, rate = 8000, 4, 16000
    n = 32 * period
    mono = [amp if (i // period) % 2 == 0 else -amp for i in range(n)]
    (media / "tone.wav").write_bytes(multimodal.encode_wav(rate, 1, mono))
    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    (media / "dot.png").write_bytes(multimodal.encode_png(2, 2, px))
    (media / "icon.svg").write_bytes(
        b'<svg xmlns="http://www.w3.org/2000/svg" width="3" height="4"/>'
    )
    (media / "notes.txt").write_bytes(b"not media")

    df = sources.read_media_dir(spark, str(media))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"tone.wav", "dot.png", "icon.svg", "notes.txt"}
    assert rows["tone.wav"].media_type == "audio/wav"
    assert rows["dot.png"].media_type == "image/png"
    assert rows["icon.svg"].media_type == "image/svg+xml"
    assert rows["notes.txt"].media_type == "application/octet-stream"
    assert all(r.n_bytes == len(bytes(r.payload)) for r in rows.values())
    # distinct stable ids
    assert len({r.doc_id for r in rows.values()}) == 4

    # decoders run on the ingested payloads
    wav = multimodal.extract_features(
        df.filter("media_type = 'audio/wav'"), decoder="wav"
    ).collect()[0]
    assert wav.features[0] == rate and wav.features[5] == amp / 32768.0
    png = multimodal.extract_features(
        df.filter("media_type = 'image/png'"), decoder="png"
    ).collect()[0]
    assert png.features[:2] == [2.0, 2.0]

    # pathGlobFilter prunes at listing time
    only_wav = sources.read_media_dir(spark, str(media), glob="*.wav")
    assert only_wav.count() == 1


def test_console_meta_datasource_matches_ingest_path(spark, tmp_path):
    """The custom Python DataSource (format 'console_meta') must emit
    the same documents as ingest.read_meta_stream on the same files -
    byte-faithful blobs, envelope fields, one partition per file, and
    file-major _pos so shred_metas' last-wins survives multi-file dumps."""
    import json

    from console_etl_spark.datasource import register_meta_source
    from console_etl_spark.ingest import read_meta_stream, shred_metas

    d = tmp_path / "dumps"
    d.mkdir()
    (d / "a.json").write_text(
        '{"schema":"olm.package","package":"","name":"p1","v":1}\n'
        '{"schema":"olm.bundle","package":"p1","name":"b1"}'
    )
    (d / "b.json").write_text(
        '{\n "schema": "olm.package",\n "name": "p1",\n "v": 2\n}'
        '{"schema":"olm.channel","package":"p1","name":"c1"}'
    )

    register_meta_source(spark)
    df = spark.read.format("console_meta").load(str(d))
    assert df.rdd.getNumPartitions() == 2  # one task per stream file

    rows = df.orderBy("_pos").collect()
    assert [r.name for r in rows] == ["p1", "b1", "p1", "c1"]
    # byte-faithful: the pretty-printed doc kept its formatting
    assert rows[2].blob.startswith("{\n ")
    # file order: b.json's docs sort after a.json's
    assert rows[1]._pos < rows[2]._pos

    # same multiset of blobs as the mapInPandas ingest path, per file
    for f in ("a.json", "b.json"):
        want = {r.blob for r in read_meta_stream(spark, str(d / f)).collect()}
        got = {
            r.blob
            for r in df.collect()
            if json.loads(r.blob).get("name")
            in {json.loads(w).get("name") for w in want}
            and r.blob in want
        }
        assert got == want

    # last-wins across files: shred keeps b.json's p1 (v=2)
    shredded = shred_metas(df)
    p1 = [r for r in shredded.collect() if r.name == "p1"]
    assert len(p1) == 1 and json.loads(p1[0].blob)["v"] == 2


def test_console_meta_datasource_truncated_raises(spark, tmp_path):
    from py4j.protocol import Py4JJavaError

    from console_etl_spark.datasource import register_meta_source

    d = tmp_path / "bad"
    d.mkdir()
    (d / "t.json").write_text('{"schema":"olm.package","name":"x"')  # no close
    register_meta_source(spark)
    with pytest.raises((Exception, Py4JJavaError)):
        spark.read.format("console_meta").load(str(d)).collect()


def test_console_meta_pushdown_filters_at_source(spark, tmp_path):
    """EqualTo predicates on envelope columns are pushed into the
    Python reader (skipped at tokenize time); results equal post-scan
    filtering, the plan carries the pushed filter, and non-envelope
    predicates still evaluate in Spark."""
    from console_etl_spark.datasource import register_meta_source

    d = tmp_path / "pushd"
    d.mkdir()
    (d / "s.json").write_text(
        '{"schema":"olm.package","package":"","name":"p1"}'
        '{"schema":"olm.bundle","package":"p1","name":"b1"}'
        '{"schema":"olm.bundle","package":"p1","name":"b2"}'
    )
    register_meta_source(spark)
    base = spark.read.format("console_meta").load(str(d))

    got = base.filter("schema = 'olm.bundle'")
    rows = got.collect()
    assert sorted(r.name for r in rows) == ["b1", "b2"]
    # pushdown proof: the EqualTo left the plan (consumed by the
    # reader) - only the residual null check remains above the scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "olm.bundle" not in plan, plan
    assert "isnotnull(schema" in plan, plan

    # combined pushed + residual predicate
    both = base.filter("schema = 'olm.bundle' AND _pos > 1").collect()
    assert [r.name for r in both] == ["b2"]


def test_console_meta_streaming_incremental_pickup(spark, tmp_path):
    """readStream over the custom source: micro-batches pick up newly
    arrived dump files from the committed offset - restart with the
    same checkpoint re-emits nothing, new files arrive incrementally,
    and _pos matches the batch reader's file-major positions."""
    from console_etl_spark.datasource import register_meta_source

    d = tmp_path / "stream_dumps"
    d.mkdir()
    (d / "dump-000.json").write_text(
        '{"schema":"olm.package","package":"","name":"p1"}'
        '{"schema":"olm.bundle","package":"p1","name":"b1"}'
    )
    register_meta_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("console_meta")
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(out)

    first = run_once().collect()
    assert sorted(r.name for r in first) == ["b1", "p1"]

    # no new input -> nothing re-emitted across a checkpointed restart
    assert run_once().count() == 2

    # a new dump arrives (later name = appended)
    (d / "dump-001.json").write_text(
        '{"schema":"olm.package","name":"p2"}'
    )
    third = run_once()
    assert sorted(r.name for r in third.collect()) == ["b1", "p1", "p2"]
    p2 = third.filter("name = 'p2'").collect()[0]
    assert p2._pos == (1 << 32)  # file-major position, file index 1

    # batch read of the same dir agrees on the full document set
    batch = spark.read.format("console_meta").load(str(d)).collect()
    assert sorted(r.name for r in batch) == ["b1", "p1", "p2"]


def test_console_meta_tolerates_nested_subdirectory(spark, tmp_path):
    """A stray subdirectory inside a dump directory (not dot/underscore
    prefixed) must be skipped at planning time, not explode with
    IsADirectoryError at execution — the tolerance Spark's built-in
    file sources have."""
    from console_etl_spark.datasource import (
        _list_stream_files,
        register_meta_source,
    )

    d = tmp_path / "dumps"
    d.mkdir()
    (d / "a.json").write_text('{"schema":"olm.package","name":"p1"}')
    (d / "checkpoint").mkdir()  # stray nested dir, no dot/underscore prefix
    (d / "checkpoint" / "x.json").write_text('{"schema":"olm.bundle","name":"nope"}')

    assert _list_stream_files(str(d)) == [str(d / "a.json")]

    register_meta_source(spark)
    rows = spark.read.format("console_meta").load(str(d)).collect()
    assert [r.name for r in rows] == ["p1"]


def test_console_meta_write_roundtrip(spark, tmp_path):
    """df.write.format('console_meta'): read a dump directory, write it
    back through the source's write side, re-read — blob-identical
    round trip (the byte-faithful contract both directions), _SUCCESS
    marker present, overwrite replaces prior files."""
    import json
    import os

    from console_etl_spark.datasource import register_meta_source

    register_meta_source(spark)
    src_dir = tmp_path / "dump"
    src_dir.mkdir()
    docs = [
        {"schema": "olm.bundle", "package": "pkgA", "name": f"b{i}", "x": i}
        for i in range(7)
    ]
    with open(src_dir / "all.json", "w") as f:
        for d in docs:
            json.dump(d, f, indent=2)  # pretty-printed concatenated docs
            f.write("\n")

    df = spark.read.format("console_meta").load(str(src_dir))
    out = tmp_path / "rewritten"
    df.write.format("console_meta").option("path", str(out)).mode(
        "append"
    ).save()
    assert os.path.exists(out / "_SUCCESS")

    back = spark.read.format("console_meta").load(str(out))
    a = sorted(r.blob for r in df.collect())
    b = sorted(r.blob for r in back.collect())
    assert a == b and len(a) == 7

    # overwrite mode replaces the previous dump files
    small = df.filter("name = 'b0'")
    small.write.format("console_meta").option("path", str(out)).mode(
        "overwrite"
    ).save()
    again = spark.read.format("console_meta").load(str(out))
    assert [r.name for r in again.collect()] == ["b0"]
