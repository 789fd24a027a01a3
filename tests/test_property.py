"""Property-based tests (SURVEY.md §5.2 item 3): the shred pipeline's
laws hold on arbitrary meta streams, not just the curated fixtures.

Laws (from the reference's writeCatalog, /root/reference/cache.go:96-114):
1. Partition-key totality: the derived package is never null/empty —
   olm.package rows are keyed by name, empty keys fall back to __global.
2. Last-wins round-trip: the store holds exactly one row per derived
   (package, schema, name), and its blob is the LAST occurrence in
   stream order (the reference's sequential file overwrite).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from console_etl_spark.ingest import GLOBAL_PACKAGE, SCHEMA_PACKAGE, shred_metas

_spark = None  # hypothesis can't take pytest fixtures; session is cached


def get_session(spark):
    global _spark
    _spark = spark
    return spark


token = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
schema_st = st.sampled_from([SCHEMA_PACKAGE, "olm.channel", "olm.bundle"])
record = st.fixed_dictionaries(
    {
        "schema": schema_st,
        "package": st.one_of(st.just(""), token),
        "name": token,
        "payload": st.integers(0, 999),
    }
)


def expected_key(r: dict) -> str:
    # the reference's derivation order (cache.go:100-106)
    key = r["name"] if r["schema"] == SCHEMA_PACKAGE else r["package"]
    return key if key else GLOBAL_PACKAGE


def run_shred(spark, rows: list[dict]):
    data = [
        (r["schema"], r["package"], r["name"], json.dumps(r), i)
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "schema string, package string, name string, blob string, _pos long"
    )
    return shred_metas(df).collect()


class TestShredLaws:
    @given(rows=st.lists(record, min_size=1, max_size=25))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_key_totality_and_last_wins(self, spark, rows):
        got = run_shred(get_session(spark), rows)

        # law 1: key totality
        for r in got:
            assert r.package not in (None, ""), r
            src = json.loads(r.blob)
            assert r.package == expected_key(src)

        # law 2: exactly one row per key triple, blob = last occurrence
        expected: dict[tuple, str] = {}
        for i, r in enumerate(rows):
            expected[(expected_key(r), r["schema"], r["name"])] = json.dumps(r)
        assert {(r.package, r.schema, r.name): r.blob for r in got} == expected

    @given(rows=st.lists(record, min_size=1, max_size=25, unique_by=lambda r: (r["schema"], r["name"], r["package"])))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_multiset_preservation_when_keys_unique(self, spark, rows):
        """With no key collisions after derivation, shred is lossless:
        every input record survives byte-identically."""
        got = run_shred(get_session(spark), rows)
        derived = {(expected_key(r), r["schema"], r["name"]) for r in rows}
        if len(derived) != len(rows):
            return  # derivation itself collided; covered by the law-2 test
        assert sorted(r.blob for r in got) == sorted(
            json.dumps(r) for r in rows
        )


# --------------------------------------------------------------------------
# Concatenated-stream splitter laws (reference WalkMetasReader fidelity,
# cache.go:96: documents may be pretty-printed, span lines, or butt up
# against each other — all.json is NOT guaranteed JSON-lines)
# --------------------------------------------------------------------------

from console_etl_spark.ingest import (  # noqa: E402
    ingest_meta_stream,
    read_meta_stream,
    split_concatenated_json,
)

# payload strings stress the tokenizer: braces, quotes, escapes, newlines
tricky_text = st.text(
    alphabet='ab{}"\\\n:,[] ', min_size=0, max_size=12
)
tricky_record = st.fixed_dictionaries(
    {
        "schema": schema_st,
        "package": st.one_of(st.just(""), token),
        "name": token,
        "payload": tricky_text,
    }
)


class TestConcatSplitter:
    @given(
        rows=st.lists(tricky_record, min_size=1, max_size=12),
        style=st.sampled_from(["jsonl", "pretty", "packed", "spaced"]),
    )
    @settings(max_examples=40, deadline=None)
    def test_split_recovers_every_document(self, rows, style):
        docs = [json.dumps(r, indent=2 if style == "pretty" else None) for r in rows]
        sep = {"jsonl": "\n", "pretty": "\n", "packed": "", "spaced": "  \n\n "}[style]
        stream = sep.join(docs)
        got = split_concatenated_json(stream)
        assert [json.loads(d) for d in got] == rows
        # byte-faithful spans: each emitted doc is a verbatim substring
        for d in got:
            assert d in stream

    def test_split_handles_back_to_back_braces(self):
        assert split_concatenated_json('{"a":1}{"b":2}') == ['{"a":1}', '{"b":2}']

    def test_split_ignores_braces_inside_strings(self):
        doc = '{"a":"}{ \\" {{"}'
        assert split_concatenated_json(doc + doc) == [doc, doc]


class TestConcatIngestRoundTrip:
    def _write(self, tmp_path, text):
        p = tmp_path / "all.json"
        p.write_text(text)
        return str(p)

    def test_pretty_printed_stream_matches_jsonl(self, spark, tmp_path):
        rows = [
            {"schema": "olm.channel", "package": f"p{i%3}", "name": f"n{i}", "v": i}
            for i in range(20)
        ]
        jsonl = self._write(tmp_path, "\n".join(json.dumps(r) for r in rows))
        got_jsonl = {
            (r.package, r.schema, r.name) for r in ingest_meta_stream(spark, jsonl).collect()
        }
        pretty = self._write(tmp_path, "\n".join(json.dumps(r, indent=2) for r in rows))
        got_pretty = {
            (r.package, r.schema, r.name) for r in ingest_meta_stream(spark, pretty).collect()
        }
        assert got_pretty == got_jsonl
        assert len(got_pretty) == 20

    def test_packed_stream_last_wins(self, spark, tmp_path):
        """Duplicate keys in a }{-packed stream: the LAST occurrence
        survives, matching the reference's sequential overwrite."""
        rows = [
            {"schema": "olm.bundle", "package": "p", "name": "dup", "v": 1},
            {"schema": "olm.bundle", "package": "p", "name": "dup", "v": 2},
        ]
        path = self._write(tmp_path, "".join(json.dumps(r) for r in rows))
        got = ingest_meta_stream(spark, path).collect()
        assert len(got) == 1
        assert json.loads(got[0].blob)["v"] == 2

    def test_auto_probe_picks_line_path_for_jsonl(self, spark, tmp_path):
        rows = [{"schema": "olm.bundle", "package": "p", "name": f"n{i}"} for i in range(5)]
        path = self._write(tmp_path, "\n".join(json.dumps(r) for r in rows))
        from console_etl_spark.ingest import _probe_is_jsonl

        assert _probe_is_jsonl(path) is True
        assert read_meta_stream(spark, path, fmt="jsonl").count() == 5
        assert read_meta_stream(spark, path, fmt="concat").count() == 5

    def test_truncated_stream_raises_not_drops(self):
        """A document that never closes must surface as an error, not be
        silently dropped (the reference propagates decode errors,
        cache.go:96-98; ADVICE r2)."""
        import pytest

        with pytest.raises(ValueError, match="truncated"):
            split_concatenated_json('{"a": 1}{"b": ')
        with pytest.raises(ValueError, match="truncated"):
            split_concatenated_json('{"a": "unterminated string')

    def test_auto_misclassification_falls_back_to_splitter(self, spark, tmp_path):
        """A stream whose HEAD is one-doc-per-line but that turns
        pretty-printed past the 64 KB probe window must still ingest
        every document (ADVICE r2: the auto path validates the JSONL
        parse and falls back to the concat splitter)."""
        filler = "x" * 120  # ~180 bytes/line -> ~400 lines > 64 KB
        head = [
            {"schema": "olm.bundle", "package": "p", "name": f"h{i}", "pad": filler}
            for i in range(400)
        ]
        tail = [
            {"schema": "olm.bundle", "package": "p", "name": f"t{i}"} for i in range(5)
        ]
        text = "\n".join(json.dumps(r) for r in head) + "\n" + "\n".join(
            json.dumps(r, indent=2) for r in tail
        )
        path = self._write(tmp_path, text)
        from console_etl_spark.ingest import _probe_is_jsonl

        assert _probe_is_jsonl(path) is True  # the probe IS fooled...
        got = read_meta_stream(spark, path, fmt="auto")
        assert got.filter("schema IS NULL").count() == 0  # ...the read is not
        assert got.count() == 405


class TestMediaCodecLaws:
    """Codec round-trip laws for the stdlib JPEG/WAV paths: whatever the
    generator parameters, encode → metadata-parse recovers them exactly.
    Pure-Python (no Spark) so hypothesis can drive many examples."""

    @given(
        w=st.integers(1, 65535),
        h=st.integers(1, 65535),
        ncomp=st.sampled_from([1, 3, 4]),
        progressive=st.booleans(),
        with_jfif=st.booleans(),
    )
    @settings(max_examples=200, deadline=None)
    def test_jpeg_header_roundtrip(self, w, h, ncomp, progressive, with_jfif):
        from console_etl_spark.llmops import multimodal

        m = multimodal.jpeg_metadata(
            multimodal.encode_jpeg_header(
                w, h, n_components=ncomp, progressive=progressive,
                with_jfif=with_jfif,
            )
        )
        assert (m["width"], m["height"], m["n_components"]) == (w, h, ncomp)
        assert m["progressive"] is progressive
        assert m["has_jfif"] is with_jfif
        assert m["precision"] == 8 and m["n_dqt"] == 1

    @given(
        rate=st.sampled_from([8000, 16000, 44100, 48000]),
        nch=st.integers(1, 4),
        nframes=st.integers(0, 500),
        data=st.data(),
    )
    @settings(max_examples=100, deadline=None)
    def test_wav_roundtrip_metadata_and_amplitude_bounds(
        self, rate, nch, nframes, data
    ):
        from console_etl_spark.llmops import multimodal

        samples = data.draw(
            st.lists(
                st.integers(-32768, 32767),
                min_size=nframes * nch,
                max_size=nframes * nch,
            )
        )
        wav = multimodal.encode_wav(rate, nch, samples)
        m = multimodal.wav_metadata(wav)
        assert m["sample_rate"] == rate
        assert m["n_channels"] == nch
        assert m["n_frames"] == nframes
        f = multimodal.wav_features(wav)
        # invariants: 0 <= rms <= peak <= 1 (+eps for the -32768 edge),
        # |dc| <= peak, zcr in [0, 1]
        assert 0.0 <= f[4] <= f[5] + 1e-12 <= 1.0 + 1e-9 + 1e-12
        assert abs(f[7]) <= f[5] + 1e-12
        assert 0.0 <= f[6] <= 1.0

    @given(
        dur=st.floats(0.1, 7200.0, allow_nan=False, allow_infinity=False),
        ts_=st.sampled_from([600, 1000, 90000]),
        w=st.integers(16, 8192),
        h=st.integers(16, 8192),
        n_audio=st.integers(0, 3),
        has_video=st.booleans(),
    )
    @settings(max_examples=150, deadline=None)
    def test_mp4_container_roundtrip(self, dur, ts_, w, h, n_audio, has_video):
        from console_etl_spark.llmops import multimodal

        m = multimodal.mp4_metadata(
            multimodal.encode_mp4_header(
                dur, ts_, (w, h) if has_video else None, n_audio_tracks=n_audio
            )
        )
        assert m["brand"] == "isom" and m["timescale"] == ts_
        # duration quantizes to the container timescale
        assert abs(m["duration_sec"] - round(dur * ts_) / ts_) < 1e-12
        assert m["n_tracks"] == n_audio + (1 if has_video else 0)
        if has_video:
            assert (m["width"], m["height"]) == (float(w), float(h))
        else:
            assert m["width"] == 0.0


class TestChunkingLaws:
    """Start-grid boundary laws for context-window chunking, on arbitrary
    token counts: full coverage of EVERY token (including the tail when
    (n-W) % S != 0), correct chunk count, exact overlap."""

    @given(n_tok=st.integers(1, 500))
    @settings(max_examples=100, deadline=None)
    def test_start_grid_covers_and_counts(self, n_tok):
        from console_etl_spark.llmops.pipeline import CHUNK_STRIDE, CHUNK_TOKENS

        last_start = max(0, n_tok - CHUNK_TOKENS)
        grid = list(range(0, last_start + 1, CHUNK_STRIDE))
        starts = grid + (
            [last_start] if last_start > 0 and last_start % CHUNK_STRIDE else []
        )
        # short docs -> exactly one whole-doc chunk
        if n_tok <= CHUNK_TOKENS:
            assert starts == [0]
        # EVERY token is inside >=1 chunk — true span coverage
        covered = set()
        for s_ in starts:
            covered.update(range(s_, min(s_ + CHUNK_TOKENS, n_tok)))
        assert covered == set(range(n_tok))
        # consecutive GRID chunks overlap by exactly W - S tokens; the
        # tail chunk (if any) overlaps its predecessor by MORE, never less
        if len(grid) >= 2:
            overlap = CHUNK_TOKENS - CHUNK_STRIDE
            assert grid[1] - grid[0] == CHUNK_STRIDE
            assert len(
                set(range(grid[0], grid[0] + CHUNK_TOKENS))
                & set(range(grid[1], grid[1] + CHUNK_TOKENS))
            ) == overlap
        if starts != grid:
            assert 0 < starts[-1] - grid[-1] < CHUNK_STRIDE


class TestJpegCodecLaws:
    """Baseline-JPEG codec laws under hypothesis: with unit quant tables
    a FLAT image round-trips pixel-exactly in every mode (the DC-only
    law), and arbitrary rasters stay within DCT rounding (≤2/channel)."""

    @given(
        r=st.integers(0, 255),
        g=st.integers(0, 255),
        b=st.integers(0, 255),
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        mode=st.sampled_from(["444", "420", "gray"]),
    )
    @settings(max_examples=60, deadline=None)
    def test_flat_roundtrip_exact(self, r, g, b, w, h, mode):
        from console_etl_spark.llmops import multimodal

        if mode == "gray":
            v = round(0.299 * r + 0.587 * g + 0.114 * b)
            px = [[(v, v, v)] * w for _ in range(h)]
            payload = multimodal.encode_baseline_jpeg(px, grayscale=True)
        elif mode == "420":
            px = [[(r, g, b)] * w for _ in range(h)]
            payload = multimodal.encode_baseline_jpeg(px, subsample_420=True)
        else:
            px = [[(r, g, b)] * w for _ in range(h)]
            payload = multimodal.encode_baseline_jpeg(px)
        dw, dh, rows = multimodal.decode_jpeg_baseline(payload)
        assert (dw, dh) == (w, h)
        diff = max(
            abs(a - c)
            for rr, fr in zip(rows, px)
            for p, q in zip(rr, fr)
            for a, c in zip(p, q)
        )
        # flat blocks are DC-only: exact up to YCbCr int rounding
        assert diff <= 1, (mode, diff)

    @given(seed=st.integers(0, 10_000), w=st.integers(1, 24), h=st.integers(1, 24))
    @settings(max_examples=40, deadline=None)
    def test_arbitrary_raster_within_dct_rounding(self, seed, w, h):
        import numpy as np

        from console_etl_spark.llmops import multimodal

        rng = np.random.default_rng(seed)
        px = [
            [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
            for _ in range(h)
        ]
        dw, dh, rows = multimodal.decode_jpeg_baseline(
            multimodal.encode_baseline_jpeg(px)
        )
        assert (dw, dh) == (w, h)
        diff = max(
            abs(a - c)
            for rr, fr in zip(rows, px)
            for p, q in zip(rr, fr)
            for a, c in zip(p, q)
        )
        # Unit quant tables leave two rounding stages: each DCT
        # coefficient rounds by ±0.5 (worst-case pixel impact is the
        # half-L1 of the 64 orthonormal basis values, far above this)
        # plus the final YCbCr→RGB pixel round. Empirically random
        # rasters stay within ±2 except rare tail blocks (seed=313,
        # 19x20 hits 3); 4 is a comfortable observed ceiling.
        assert diff <= 4, diff


class TestGifCodecLaws:
    """GIF codec laws: palette-exact encode means decode is bit-exact
    for ANY raster with ≤256 distinct colors, sequential or interlaced."""

    @given(
        seed=st.integers(0, 10_000),
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        ncolors=st.sampled_from([1, 2, 3, 5, 17, 64, 256]),
        interlace=st.booleans(),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_exact(self, seed, w, h, ncolors, interlace):
        import random

        from console_etl_spark.llmops import multimodal

        rnd = random.Random(seed)
        colors = [
            (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
            for _ in range(ncolors)
        ]
        px = [[rnd.choice(colors) for _ in range(w)] for _ in range(h)]
        payload = multimodal.encode_gif(w, h, px, interlace=interlace)
        assert multimodal.decode_gif(payload) == (w, h, px)


class TestAdpcmCodecLaws:
    """IMA-ADPCM laws under hypothesis: structural round-trip for any
    int16 signal (length, rate, block seeds exact), and bounded
    reconstruction error for smooth signals (quantization noise scales
    with the step table, not the signal)."""

    @given(
        seed=st.integers(0, 10_000),
        rate=st.sampled_from([8000, 16000, 44100]),
        n=st.integers(1, 1500),
    )
    @settings(max_examples=40, deadline=None)
    def test_structural_roundtrip_any_signal(self, seed, rate, n):
        import random

        from console_etl_spark.llmops import multimodal

        rnd = random.Random(seed)
        samples = [rnd.randint(-32768, 32767) for _ in range(n)]
        p = multimodal.encode_adpcm_wav(rate, samples)
        drate, dec = multimodal.decode_adpcm_wav(p)
        assert drate == rate and len(dec) == n
        spb = (256 - 4) * 2 + 1
        for b in range(0, n, spb):
            assert dec[b] == samples[b]  # block seeds ride uncompressed
        # determinism
        assert p == multimodal.encode_adpcm_wav(rate, samples)

    @given(
        seed=st.integers(0, 10_000),
        freq=st.floats(50, 800),
        amp=st.integers(1000, 16000),
    )
    @settings(max_examples=30, deadline=None)
    def test_smooth_signal_error_bounded(self, seed, freq, amp):
        import math

        import numpy as np

        from console_etl_spark.llmops import multimodal

        rate = 16000
        phase = seed * 0.001
        samples = [
            int(amp * math.sin(2 * math.pi * freq * i / rate + phase))
            for i in range(1200)
        ]
        _, dec = multimodal.decode_adpcm_wav(
            multimodal.encode_adpcm_wav(rate, samples)
        )
        err = np.asarray(dec, dtype=float) - np.asarray(samples, dtype=float)
        # ADPCM error tracks signal SLOPE: quantization noise grows with
        # amp x freq/rate (measured ~8% of amp at 800 Hz/16 kHz, ~4% at
        # 400 Hz, <2% below 100 Hz). Bound = slope-aware envelope plus a
        # step-table granularity floor.
        rms = float(np.sqrt(np.mean(err**2)))
        assert rms < amp * (0.02 + 1.8 * freq / rate) + 16, (freq, amp, rms)


class TestEwmaKernelLaws:
    """The zip_with/aggregate EWMA kernel (relational.py) against a pure
    Python reference on arbitrary value sequences: the Spark plan's
    normalized trailing-window EWMA must equal the direct definition
    sum(w_d * x_{i-d}) / sum(w_d), w_d = (4/5)^d, computed with the
    same exact integer weights."""

    @given(
        vals=st.lists(
            st.decimals(
                min_value=0, max_value=500, places=2, allow_nan=False
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_matches_reference(self, spark, vals):
        import datetime

        from console_etl_spark.relational import (
            EWMA_WEIGHTS,
            EWMA_WINDOW,
            ewma_trailing_user_value,
        )

        # one synthetic user stream, strictly increasing timestamps
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i, base + datetime.timedelta(minutes=i), 1, "view", float(v), "{}")
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
            out = {
                r.event_id: r.ewma_20
                for r in ewma_trailing_user_value(spark, tmp).collect()
            }
        from decimal import Decimal

        for i in range(len(vals)):
            lo = max(0, i - (EWMA_WINDOW - 1))
            window = [Decimal(str(v)) for v in vals[lo : i + 1]]
            num = sum(
                x * EWMA_WEIGHTS[len(window) - 1 - p]
                for p, x in enumerate(window)
            )
            den = sum(EWMA_WEIGHTS[d] for d in range(len(window)))
            want = round(float(num) / float(den), 6)
            assert abs(out[i] - want) < 1e-9, (i, out[i], want)


class TestPrefixKernelLaws:
    """Hypothesis laws for the order-statistics kernels: any value mix
    (negatives included), any partition count (including more
    partitions than rows → empty range partitions), inclusive and
    exclusive, always equal to the single-threaded scan."""

    @given(
        vals=st.lists(st.integers(-1000, 1000), min_size=0, max_size=60),
        nparts=st.integers(1, 40),
        inclusive=st.booleans(),
    )
    @settings(max_examples=12, deadline=None)
    def test_prefix_sum_equals_naive(self, spark, vals, nparts, inclusive):
        from console_etl_spark.llmops import pipeline

        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k bigint, v bigint")
        got = {
            r["k"]: r["ps"]
            for r in pipeline.global_prefix_sum(
                df, ["k"], "v", out_col="ps",
                inclusive=inclusive, num_partitions=nparts,
            ).collect()
        }
        acc, want = 0, {}
        for k, v in rows:
            want[k] = acc + v if inclusive else acc
            acc += v
        assert got == want

    @given(
        vals=st.lists(st.integers(-1000, 1000), min_size=0, max_size=60),
        nparts=st.integers(1, 40),
        inclusive=st.booleans(),
    )
    @settings(max_examples=12, deadline=None)
    def test_prefix_max_equals_naive(self, spark, vals, nparts, inclusive):
        from console_etl_spark.llmops import pipeline

        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k bigint, v bigint")
        got = {
            r["k"]: r["pm"]
            for r in pipeline.global_prefix_max(
                df, ["k"], "v", out_col="pm",
                inclusive=inclusive, num_partitions=nparts,
            ).collect()
        }
        best, want = None, {}
        for k, v in rows:
            inc = v if best is None else max(best, v)
            want[k] = inc if inclusive else best
            best = inc
        assert got == want


class TestBlockedEditDistanceLaws:
    """The bigram-blocked edit-distance join must equal the quadratic
    join on ARBITRARY string sets — including strings shorter than the
    count-filter guarantee (covered by the short-string block) and
    single characters (no bigrams at all)."""

    @given(
        names=st.lists(
            st.text(alphabet="abcx", min_size=1, max_size=9),
            min_size=2,
            max_size=14,
            unique=True,
        )
    )
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_blocked_equals_quadratic(self, spark, names):
        from console_etl_spark.relational import blocked_edit_distance_pairs

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                    )
            return dp[len(b)]

        want = {
            (a, b, lev(a, b))
            for i, a in enumerate(names)
            for b in names[i + 1:]
            if lev(a, b) <= 2
        }
        want = {(min(a, b), max(a, b), d) for a, b, d in want}
        df = spark.createDataFrame([(n,) for n in names], "s string")
        got = {
            (r.name_a, r.name_b, r.dist)
            for r in blocked_edit_distance_pairs(df, "s", d=2).collect()
        }
        assert got == want


class TestBM25Laws:
    """text_bm25_topk's scoring against an independent pure-Python
    Okapi implementation on arbitrary corpora (fixed query terms)."""

    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["vector", "join", "stream", "pad", "x", "y"]),
                min_size=1,
                max_size=12,
            ),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_bm25_matches_reference(self, spark, docs):
        import math
        import os
        import tempfile

        from console_etl_spark.llmops import textan as t

        texts = [" ".join(ws) for ws in docs]
        n = len(texts)
        avgdl = sum(len(ws) for ws in docs) / n
        dfs = {
            term: sum(1 for ws in docs if term in ws)
            for term in t.BM25_TERMS
        }

        def score(ws):
            s = 0.0
            for term in t.BM25_TERMS:
                tf = ws.count(term)
                idf = math.log(1 + (n - dfs[term] + 0.5) / (dfs[term] + 0.5))
                s += idf * (tf * (t.BM25_K1 + 1)) / (
                    tf + t.BM25_K1 * (1 - t.BM25_B + t.BM25_B * len(ws) / avgdl)
                )
            return round(s, 6)

        want = sorted(
            (
                (i, score(ws))
                for i, ws in enumerate(docs)
                if any(term in ws for term in t.BM25_TERMS)
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[: t.BM25_TOPK]
        df = spark.createDataFrame(
            [(i, txt, "en", "s", len(txt)) for i, txt in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with tempfile.TemporaryDirectory() as td:
            df.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
            got = [
                (r.doc_id, r.bm25)
                for r in t.text_bm25_topk(spark, td).collect()
            ]
        assert got == want


class TestGroupedPrefixScanLaw:
    """Hypothesis law for the r8 grouped kernel (global_prefix_sum
    group_cols): any group mix INCLUDING NULL groups (SQL keeps a null
    group; the offsets join must be null-safe or those rows vanish),
    any partition count, both directions — always equal to the
    per-group single-threaded scan."""

    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", None]),
                st.integers(-100, 100),
            ),
            min_size=0,
            max_size=60,
        ),
        nparts=st.integers(1, 20),
        inclusive=st.booleans(),
    )
    @settings(max_examples=12, deadline=None)
    def test_grouped_equals_per_group_naive(
        self, spark, rows, nparts, inclusive
    ):
        from console_etl_spark.llmops import pipeline

        data = [(g, i, v) for i, (g, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "g string, k bigint, v bigint")
        got = {
            (r["g"], r["k"]): r["ps"]
            for r in pipeline.global_prefix_sum(
                df, ["k"], "v", out_col="ps", inclusive=inclusive,
                num_partitions=nparts, group_cols=["g"],
            ).collect()
        }
        assert len(got) == len(data)  # null groups must not vanish
        want = {}
        acc: dict = {}
        for g, k, v in sorted(data, key=lambda t: t[1]):  # k is unique
            if inclusive:
                acc[g] = acc.get(g, 0) + v
                want[(g, k)] = acc[g]
            else:
                want[(g, k)] = acc.get(g, 0)
                acc[g] = acc.get(g, 0) + v
        assert got == want


class TestAsOfJoinLaws:
    """The as-of family against a direct Python reference on arbitrary
    event streams (duplicate timestamps included, to exercise the tie
    rules: a view at exactly the purchase ts matches; equal-ts views
    resolve to the highest event_id), plus the horizon identity:
    bounded == unbounded with the latest match masked when older than
    24 h — equivalent to 'latest within horizon' because the carried
    view has the maximum ts."""

    @given(
        evs=st.lists(
            st.tuples(
                st.integers(0, 2),            # user
                st.integers(0, 3000),         # minutes offset (dups ok)
                st.sampled_from(["view", "purchase"]),
                st.integers(0, 99),           # value
            ),
            min_size=1,
            max_size=50,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_asof_and_horizon_match_reference(self, spark, evs):
        import datetime
        import os
        import tempfile

        from console_etl_spark import relational

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (
                eid,
                base + datetime.timedelta(minutes=m),
                u,
                t,
                float(v),
                "{}",
            )
            for eid, (u, m, t, v) in enumerate(evs)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
            got_un = {
                r.purchase_event: r
                for r in relational.asof_join_purchase_view(spark, tmp).collect()
            }
            got_bd = {
                r.purchase_event: r
                for r in relational.asof_join_bounded_lookback(
                    spark, tmp
                ).collect()
            }

        views: dict = {}
        for eid, ts, u, t, v, _ in rows:
            if t == "view":
                views.setdefault(u, []).append((ts, eid, v))
        horizon = datetime.timedelta(hours=24)
        n_purchases = 0
        for eid, ts, u, t, v, _ in rows:
            if t != "purchase":
                continue
            n_purchases += 1
            cands = [c for c in views.get(u, []) if c[0] <= ts]
            best = max(cands, key=lambda c: (c[0], c[1])) if cands else None
            gu, gb = got_un[eid], got_bd[eid]
            if best is None:
                assert gu.view_event is None
                assert gb.view_event is None
            else:
                assert (gu.view_event, gu.view_ts, gu.view_value) == (
                    best[1], best[0], best[2],
                ), (eid, gu)
                if best[0] >= ts - horizon:
                    assert (gb.view_event, gb.view_ts, gb.view_value) == (
                        best[1], best[0], best[2],
                    ), (eid, gb)
                else:
                    assert gb.view_event is None and gb.view_ts is None
        assert len(got_un) == n_purchases == len(got_bd)


class TestScd2MergeLaws:
    """SCD2 merge invariants on arbitrary dimensions and change
    batches (beyond the fixture-shaped oracle check): for every key,
    exactly one current row; changed keys carry a closed [base_from,
    effective) version plus an open [effective, open-end) one with the
    NEW attributes; unchanged keys keep one open row with the OLD
    attributes; brand-new keys (insert case) get one open row; nothing
    else exists."""

    @given(
        base_keys=st.sets(st.integers(0, 20), max_size=12),
        upd_keys=st.sets(st.integers(0, 25), max_size=12),
    )
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_merge_partitions_keys_correctly(self, spark, base_keys, upd_keys):
        from console_etl_spark.relational import SCD2_OPEN_END, scd2_merge

        base = spark.createDataFrame(
            [(k, f"old{k}") for k in sorted(base_keys)], "k long, attr string"
        )
        upd = spark.createDataFrame(
            [(k, f"new{k}") for k in sorted(upd_keys)], "k long, attr string"
        )
        out = scd2_merge(base, upd, "k", "2024-06-01", "2024-01-01").collect()

        by_key: dict = {}
        for r in out:
            by_key.setdefault(r.k, []).append(r)
        assert set(by_key) == base_keys | upd_keys
        for k, rows in by_key.items():
            current = [r for r in rows if r.is_current == 1]
            assert len(current) == 1, (k, rows)
            assert current[0].valid_to == SCD2_OPEN_END
            if k in base_keys and k in upd_keys:  # changed: close + open
                assert len(rows) == 2
                closed = next(r for r in rows if r.is_current == 0)
                assert (closed.valid_from, closed.valid_to) == (
                    "2024-01-01", "2024-06-01",
                )
                assert closed.attr == f"old{k}"
                assert current[0].valid_from == "2024-06-01"
                assert current[0].attr == f"new{k}"
            elif k in base_keys:  # unchanged: one open old row
                assert len(rows) == 1
                assert rows[0].valid_from == "2024-01-01"
                assert rows[0].attr == f"old{k}"
            else:  # insert: one open new row
                assert len(rows) == 1
                assert rows[0].valid_from == "2024-06-01"
                assert rows[0].attr == f"new{k}"


class TestRound8StatAndAttributionLaws:
    """Cross-QUERY consistency laws for the round-8 statistical and
    attribution tiers — engine parity is covered per-query by
    test_oracle_parity; these pin relationships BETWEEN queries that
    no single oracle can express.
    """

    def test_kruskal_on_two_groups_equals_mannwhitney_z_squared(
        self, spark, tmp_path
    ):
        """For exactly two groups, tie-corrected Kruskal-Wallis H is
        IDENTICALLY the square of the tie-corrected Mann-Whitney z
        (rank-based one-way ANOVA degenerates to the rank-sum test).
        Run the two REAL registered queries on an orders table filtered
        to the URGENT/LOW pair and pin the identity — this catches a
        formula drift in either query that its own oracle would happily
        mirror (both sides of a parity check can be wrong together)."""
        import pyarrow.parquet as pq
        import pyarrow.compute as pc

        from console_etl_spark.relational import (
            stats_kruskal_wallis,
            stats_mannwhitney_u,
        )
        from tests.conftest import SF_TEST

        t = pq.read_table(f"{SF_TEST}/orders.parquet")
        t = t.filter(
            pc.is_in(
                t["o_orderpriority"],
                value_set=__import__("pyarrow").array(["1-URGENT", "5-LOW"]),
            )
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))

        kw = stats_kruskal_wallis(spark, str(tmp_path)).collect()[0]
        mw = stats_mannwhitney_u(spark, str(tmp_path)).collect()[0]
        assert kw["k"] == 2
        assert kw["n"] == mw["n1"] + mw["n2"]
        # both outputs are ROUND(…, 6); squaring the rounded z costs up
        # to ~2*|z|*5e-7, so compare at 1e-5 absolute+relative
        z2 = mw["z"] * mw["z"]
        assert abs(kw["h_tie_corrected"] - z2) <= 1e-5 * max(1.0, z2), (
            kw["h_tie_corrected"],
            z2,
        )

    def test_kruskal_domain_drift_reports_null_not_wrong_h(
        self, spark, tmp_path
    ):
        """The wide-pivot Kruskal kernel hardcodes the CLOSED 5-value
        TPC-H priority domain (an A/B-measured 18% win over the
        domain-agnostic narrow form). Its safety contract: if the
        domain ever drifts — a sixth priority value appears — the query
        must report NULL h / h_tie_corrected, never a silently wrong H
        computed over a subset of rows (VERDICT r8 What's-wrong #3:
        pin the guard directly)."""
        import pyarrow.parquet as pq

        from console_etl_spark.relational import stats_kruskal_wallis
        from tests.conftest import SF_TEST

        t = pq.read_table(f"{SF_TEST}/orders.parquet").to_pandas()
        t.loc[t.index[: len(t) // 10], "o_orderpriority"] = "6-EXTRA"
        t.to_parquet(str(tmp_path / "orders.parquet"))

        row = stats_kruskal_wallis(spark, str(tmp_path)).collect()[0]
        # n counts only the five known groups — strictly fewer rows
        # than the drifted table — and both statistics are withheld
        assert row["n"] < len(t)
        assert row["h"] is None
        assert row["h_tie_corrected"] is None

    def test_anova_domain_drift_reports_null_not_wrong_f(
        self, spark, tmp_path
    ):
        """stats_anova_f (r9) shares the Kruskal wide-pivot's closed
        5-value priority domain and must share its safety contract: a
        sixth priority value yields NULL f_stat / eta_sq, never an F
        computed over a subset of rows."""
        import pyarrow.parquet as pq

        from console_etl_spark.relational import stats_anova_f
        from tests.conftest import SF_TEST

        t = pq.read_table(f"{SF_TEST}/orders.parquet").to_pandas()
        t.loc[t.index[: len(t) // 10], "o_orderpriority"] = "6-EXTRA"
        t.to_parquet(str(tmp_path / "orders.parquet"))

        row = stats_anova_f(spark, str(tmp_path)).collect()[0]
        assert row["n"] < len(t)
        assert row["f_stat"] is None
        assert row["eta_sq"] is None

    def test_anova_f_on_two_groups_equals_welch_like_t_squared(
        self, spark, tmp_path
    ):
        """Cross-query law for the r9 parametric tier: on exactly two
        groups, classic one-way ANOVA F is IDENTICALLY the square of
        the POOLED-variance t statistic. stats_welch_ttest reports the
        unpooled t, so equality is approximate unless the two groups
        have near-equal sizes and variances — instead pin the exact
        algebraic identity directly: recompute pooled t² from the
        ANOVA's own ingredients on an orders table filtered to the
        URGENT/LOW pair and check F against it via an independent
        numpy computation of the group moments."""
        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from console_etl_spark.relational import stats_anova_f
        from tests.conftest import SF_TEST

        t = pq.read_table(f"{SF_TEST}/orders.parquet")
        t = t.filter(
            pc.is_in(
                t["o_orderpriority"],
                value_set=__import__("pyarrow").array(["1-URGENT", "5-LOW"]),
            )
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        row = stats_anova_f(spark, str(tmp_path)).collect()[0]
        assert row["k"] == 2

        df = t.to_pandas()
        x = df["o_totalprice"].astype(float)
        g = df["o_orderpriority"]
        a, b = x[g == "1-URGENT"], x[g == "5-LOW"]
        na, nb = len(a), len(b)
        sp2 = (
            (na - 1) * a.var(ddof=1) + (nb - 1) * b.var(ddof=1)
        ) / (na + nb - 2)
        t_pooled = (a.mean() - b.mean()) / np.sqrt(sp2 * (1 / na + 1 / nb))
        assert abs(row["f_stat"] - t_pooled**2) <= 1e-4 * max(
            1.0, t_pooled**2
        ), (row["f_stat"], t_pooled**2)

    def test_growth_accounting_identities(self, spark):
        """growth_accounting_weekly (r9) must satisfy the two defining
        identities of the lifecycle decomposition, per week w:
        (1) actives(w) = new + retained + resurrected equals the exact
        distinct-user count of that week; (2) churned(w) =
        actives(w-1) - retained(w) — every previous-week active either
        returns (retained) or churns. Both exact integers."""
        from pyspark.sql import functions as F

        from console_etl_spark.relational import growth_accounting_weekly
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        rows = growth_accounting_weekly(spark, SF_TEST).collect()
        per_week: dict[str, dict[str, int]] = {}
        for r in rows:
            per_week.setdefault(r["week"], {})[r["status"]] = r["n_users"]

        exact = {
            r["week"]: r["n"]
            for r in load_table(spark, SF_TEST, "events")
            .select(
                F.date_trunc("week", "ts").cast("date").cast("string")
                .alias("week"),
                "user_id",
            )
            .distinct()
            .groupBy("week")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        weeks = sorted(exact)
        for w in weeks:
            d = per_week.get(w, {})
            actives = (
                d.get("new", 0) + d.get("retained", 0) + d.get("resurrected", 0)
            )
            assert actives == exact[w], (w, d, exact[w])
        for prev, cur in zip(weeks, weeks[1:]):
            dp, dc = per_week.get(prev, {}), per_week.get(cur, {})
            actives_prev = (
                dp.get("new", 0)
                + dp.get("retained", 0)
                + dp.get("resurrected", 0)
            )
            # identity holds only for ADJACENT calendar weeks
            import datetime

            if (
                datetime.date.fromisoformat(cur)
                - datetime.date.fromisoformat(prev)
            ).days == 7:
                assert dc.get("churned", 0) == actives_prev - dc.get(
                    "retained", 0
                ), (prev, cur, dp, dc)

    def test_attribution_trio_conserves_conversions(self, spark):
        """Every attribution method distributes EXACTLY one conversion
        per purchase: last-touch's integer counts sum to the purchase
        count exactly; position-based and time-decay (per-touch credits
        rounded to 9 decimals before the decimal sum) match within the
        rounding budget. The two journey-based methods also agree
        exactly on the unattributed count (identical journey + lookback
        construction), while last-touch's may differ (its carried touch
        survives an intervening purchase)."""
        from pyspark.sql import functions as F

        from console_etl_spark.relational import (
            attribution_first_touch,
            attribution_last_touch,
            attribution_linear,
            attribution_position_based,
            attribution_time_decay,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        purchases = (
            load_table(spark, SF_TEST, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        lt = attribution_last_touch(spark, SF_TEST).collect()
        assert sum(r["n_purchases"] for r in lt) == purchases

        ft = {r["channel"]: r for r in
              attribution_first_touch(spark, SF_TEST).collect()}
        pb = {r["channel"]: r for r in
              attribution_position_based(spark, SF_TEST).collect()}
        td = {r["channel"]: r for r in
              attribution_time_decay(spark, SF_TEST).collect()}
        ln = {r["channel"]: r for r in
              attribution_linear(spark, SF_TEST).collect()}
        # first-touch credit is INTEGER: conservation is exact
        assert sum(r["credited_conversions"] for r in ft.values()) == purchases
        for method, rows in (
            ("position_based", pb),
            ("time_decay", td),
            ("linear", ln),
        ):
            total = sum(r["credited_conversions"] for r in rows.values())
            # ≤ 9-decimal rounding per touch, 6-decimal per channel row
            assert abs(total - purchases) < 1e-3, (method, total, purchases)
        assert (
            pb["unattributed"]["credited_conversions"]
            == td["unattributed"]["credited_conversions"]
            == ft["unattributed"]["credited_conversions"]
            == ln["unattributed"]["credited_conversions"]
        )
        # journey-based methods see the same eligible touch multiset
        touch_counts = {c: r["n_touches"] for c, r in pb.items()}
        for rows in (td, ft, ln):
            assert {c: r["n_touches"] for c, r in rows.items()} == touch_counts

    def test_mad_anomaly_flags_invariant_to_scaling(self, spark, tmp_path):
        """Robust-statistics contract of anomaly_mad_daily_revenue:
        scaling every order's price by a=3 (exact at DECIMAL(12,2)
        scale) scales the median, MAD, and max deviation by exactly 3
        and flags the SAME anomaly days — median and MAD are
        equivariant and the 3.5-MAD integer-cent cross-multiplication
        is scale-invariant. A float anywhere in the decision path (or
        interpolation in the median) breaks this exactness. (A per-
        order SHIFT is deliberately not tested: daily revenue is a sum
        over a varying order count, so an order-level shift is not a
        uniform day-level shift.)"""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from console_etl_spark.relational import anomaly_mad_daily_revenue
        from tests.conftest import SF_TEST

        base = anomaly_mad_daily_revenue(spark, SF_TEST).collect()[0]

        t = pq.read_table(f"{SF_TEST}/orders.parquet")
        price = t["o_totalprice"]
        orig_type = price.type
        asf = pc.cast(price, pa.float64())  # ≤ 1e10 cents: exact in f64
        newp = pc.cast(pc.multiply(asf, pa.scalar(3.0)), orig_type)
        idx = t.schema.get_field_index("o_totalprice")
        pq.write_table(
            t.set_column(idx, "o_totalprice", newp),
            str(tmp_path / "orders.parquet"),
        )

        scaled = anomaly_mad_daily_revenue(spark, str(tmp_path)).collect()[0]
        assert scaled["n_days"] == base["n_days"]
        assert scaled["n_anomalies"] == base["n_anomalies"]
        assert scaled["max_dev_date"] == base["max_dev_date"]
        for col in ("med", "mad", "max_dev"):
            assert scaled[col] == round(3 * base[col], 2), (
                col, scaled[col], base[col],
            )


class TestRound9StatInvarianceLaws:
    """Invariance laws for the r9 classical-stats tier — properties the
    per-query oracles cannot catch (both engines could drift together):
    each law perturbs the input relation and pins the statistic's
    defining symmetry."""

    def test_kendall_tau_negates_under_y_negation(self, spark, tmp_path):
        """tau-b is a concordance statistic: negating y swaps every
        concordant pair with a discordant one, so tau_b flips sign
        EXACTLY and (concordant, discordant) swap as integer counts."""
        import pyarrow.parquet as pq

        from console_etl_spark.relational import stats_kendall_tau
        from tests.conftest import SF_TEST

        base = stats_kendall_tau(spark, SF_TEST).collect()[0]

        t = pq.read_table(f"{SF_TEST}/lineitem.parquet").to_pandas()
        t["l_discount"] = -t["l_discount"]
        t.to_parquet(str(tmp_path / "lineitem.parquet"))
        neg = stats_kendall_tau(spark, str(tmp_path)).collect()[0]

        assert neg["concordant"] == base["discordant"]
        assert neg["discordant"] == base["concordant"]
        assert neg["n"] == base["n"] and neg["n_cells"] == base["n_cells"]
        assert abs(neg["tau_b"] + base["tau_b"]) <= 2e-6  # ROUND(.,6) each

    def test_anova_f_invariant_under_group_relabeling_and_scaling(
        self, spark, tmp_path
    ):
        """F depends on the group PARTITION, not the labels, and is
        scale-free: bijectively relabeling priorities and scaling x by
        3 (exact at DECIMAL(12,2)) must reproduce F and eta_sq to
        float-roundoff."""
        import pyarrow.parquet as pq

        from console_etl_spark.relational import stats_anova_f
        from tests.conftest import SF_TEST

        base = stats_anova_f(spark, SF_TEST).collect()[0]

        t = pq.read_table(f"{SF_TEST}/orders.parquet").to_pandas()
        cyc = {
            "1-URGENT": "2-HIGH",
            "2-HIGH": "3-MEDIUM",
            "3-MEDIUM": "4-NOT SPECIFIED",
            "4-NOT SPECIFIED": "5-LOW",
            "5-LOW": "1-URGENT",
        }
        t["o_orderpriority"] = t["o_orderpriority"].map(cyc)
        t["o_totalprice"] = t["o_totalprice"] * 3
        t.to_parquet(str(tmp_path / "orders.parquet"))
        got = stats_anova_f(spark, str(tmp_path)).collect()[0]

        assert got["n"] == base["n"] and got["k"] == base["k"]
        assert abs(got["f_stat"] - base["f_stat"]) <= 1e-5 * max(
            1.0, abs(base["f_stat"])
        )
        assert abs(got["eta_sq"] - base["eta_sq"]) <= 1e-6

    def test_levene_w_exactly_invariant_under_location_shift(
        self, spark, tmp_path
    ):
        """Brown-Forsythe W is location-free BY CONSTRUCTION: shifting
        every price by a constant shifts each group median by exactly
        that constant (the lower median is a data value, exact in
        decimal), so the |x - med_g| relation — and therefore W — is
        BIT-IDENTICAL, not merely close."""
        import pyarrow.parquet as pq

        from console_etl_spark.relational import stats_levene_bf
        from tests.conftest import SF_TEST

        base = stats_levene_bf(spark, SF_TEST).collect()[0]

        t = pq.read_table(f"{SF_TEST}/orders.parquet").to_pandas()
        t["o_totalprice"] = t["o_totalprice"] + 1000
        t.to_parquet(str(tmp_path / "orders.parquet"))
        got = stats_levene_bf(spark, str(tmp_path)).collect()[0]

        assert (got["n"], got["k"]) == (base["n"], base["k"])
        assert got["w_stat"] == base["w_stat"]  # exact, not approx

    def test_two_proportion_z_antisymmetric_under_group_swap(
        self, spark, tmp_path
    ):
        """Swapping the two groups negates z exactly (pooled p is
        symmetric; the numerator flips sign, IEEE negation is exact)
        and swaps (n, x) pairs as integers."""
        import pyarrow.parquet as pq

        from console_etl_spark.relational import stats_two_proportion_ztest
        from tests.conftest import SF_TEST

        base = stats_two_proportion_ztest(spark, SF_TEST).collect()[0]

        t = pq.read_table(f"{SF_TEST}/orders.parquet").to_pandas()
        swap = {"1-URGENT": "5-LOW", "5-LOW": "1-URGENT"}
        t["o_orderpriority"] = t["o_orderpriority"].map(
            lambda v: swap.get(v, v)
        )
        t.to_parquet(str(tmp_path / "orders.parquet"))
        got = stats_two_proportion_ztest(spark, str(tmp_path)).collect()[0]

        assert (got["n1"], got["x1"]) == (base["n2"], base["x2"])
        assert (got["n2"], got["x2"]) == (base["n1"], base["x1"])
        assert got["z"] == -base["z"] or (got["z"] == 0 and base["z"] == 0)


class TestRound10Laws:
    """Invariance and independent-replica laws for the five r10
    registrations — the oracle gate proves Spark==DuckDB; these pin
    that the MATH is right (same discipline as the r8/r9 law classes).
    """

    def test_markov_removal_bounds_and_share_normalization(self, spark):
        """Absorbing-chain laws on the fixture: conversion probability
        lies in (0, 1]; every removal effect lies in [0, 1] (redirecting
        a channel's inbound edges to DROP can only LOSE conversion
        paths, so p_removed <= p_full — provable by induction on the
        fixed-point iterates); and the normalized shares sum to 1
        within the 6-dp output rounding."""
        from console_etl_spark.relational import attribution_markov_removal
        from tests.conftest import SF_TEST

        rows = attribution_markov_removal(spark, SF_TEST).collect()
        assert [r["channel"] for r in rows] == ["click", "signup", "view"]
        p = rows[0]["p_conv"]
        assert 0.0 < p <= 1.0
        for r in rows:
            assert r["p_conv"] == p  # one chain, one conversion prob
            assert 0.0 <= r["removal_effect"] <= 1.0, r
        share_sum = sum(r["share"] for r in rows)
        assert abs(share_sum - 1.0) <= 3e-6, share_sum

    def test_markov_removal_single_channel_chain_attributes_fully(
        self, spark, tmp_path
    ):
        """Degenerate chain: every journey is exactly [view, purchase].
        Removing 'view' severs every conversion path (effect 1, share
        1); removing 'click' or 'signup' changes nothing (effect 0).
        p_conv is exactly 1 — every journey converts."""
        from console_etl_spark.relational import attribution_markov_removal

        rows = []
        for uid in range(1, 6):
            base = 86_400_000_000 * uid
            rows.append((uid, base, uid * 10, "view", 1.0))
            rows.append((uid, base + 60_000_000, uid * 10 + 1, "purchase", 1.0))
        spark.createDataFrame(
            rows,
            "user_id long, us long, event_id long, event_type string, "
            "value double",
        ).selectExpr(
            "user_id", "timestamp_micros(us) AS ts", "event_id",
            "event_type", "value",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

        got = {
            r["channel"]: r
            for r in attribution_markov_removal(spark, str(tmp_path)).collect()
        }
        assert got["view"]["p_conv"] == 1.0
        assert got["view"]["removal_effect"] == 1.0
        assert got["view"]["share"] == 1.0
        for ch in ("click", "signup"):
            assert got[ch]["removal_effect"] == 0.0
            assert got[ch]["share"] == 0.0

    def test_markov_iteration_count_shared_by_both_engines(self):
        """ADVICE r10: the oracle SQL must interpolate MARKOV_ITERS
        (not hardcode 60) so changing the constant can never silently
        de-synchronize the two engines' fixed-point step counts —
        bit-identical outputs REQUIRE identical iteration counts."""
        from console_etl_spark.relational import ORACLE
        from console_etl_spark.relational.timeseries import MARKOV_ITERS

        sql = ORACLE["attribution_markov_removal"]
        assert f"WHERE i < {MARKOV_ITERS}" in sql
        assert f"WHERE i = {MARKOV_ITERS}" in sql

    def test_seasonal_effects_weighted_sum_to_zero(self, spark):
        """Additive-decomposition identity: within each component, the
        n_obs-weighted sum of seasonal effects is zero (sum over groups
        of n_k * (mean_k - g) = total - g * N = 0 in real arithmetic;
        the 6-dp output rounding bounds the float residue). Also pins
        the component domains: 24 hour-of-day rows, 7 day-of-week."""
        from console_etl_spark.relational import seasonal_decompose_hourly
        from tests.conftest import SF_TEST

        rows = seasonal_decompose_hourly(spark, SF_TEST).collect()
        by_comp: dict = {}
        for r in rows:
            by_comp.setdefault(r["component"], []).append(r)
        assert sorted(by_comp) == ["day_of_week", "hour_of_day"]
        assert len(by_comp["hour_of_day"]) == 24
        assert sorted(r["k"] for r in by_comp["hour_of_day"]) == list(range(24))
        assert len(by_comp["day_of_week"]) == 7
        assert sorted(r["k"] for r in by_comp["day_of_week"]) == list(range(7))
        for comp, grp in by_comp.items():
            total_n = sum(r["n_obs"] for r in grp)
            wsum = sum(r["n_obs"] * r["seasonal_effect"] for r in grp)
            assert abs(wsum) <= total_n * 1e-6 + 1e-6, (comp, wsum)

    def test_wilcoxon_matches_independent_numpy_ranking(self, spark):
        """Replica law: the distributed midrank identity
        2*W+ = sum cpos*(2*below+ct+1) must reproduce a literal
        numpy average-ranking implementation of the signed-rank test
        (rank |d|, midranks for ties, sum positive ranks, tie-corrected
        z) on the same pairs."""
        import numpy as np

        from console_etl_spark.relational import stats_wilcoxon_signed_rank
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_wilcoxon_signed_rank(spark, SF_TEST).collect()[0]

        o = load_table(spark, SF_TEST, "orders").toPandas()
        o["yr"] = o["o_orderdate"].dt.year
        o["price"] = o["o_totalprice"].round(2)
        per = o.groupby("o_custkey").apply(
            lambda g: (
                g.loc[g.yr <= 1997, "price"].sum().round(2),
                g.loc[g.yr >= 1998, "price"].sum().round(2),
                (g.yr <= 1997).sum(),
                (g.yr >= 1998).sum(),
            ),
            include_groups=False,
        )
        d = np.array(
            [round(s2 - s1, 2) for s1, s2, k1, k2 in per
             if k1 > 0 and k2 > 0 and s1 != s2]
        )
        ad = np.abs(d)
        order = np.argsort(ad, kind="stable")
        sorted_ad = ad[order]
        r = np.empty(len(d))
        pos = 0
        while pos < len(d):
            j = pos
            while j + 1 < len(d) and sorted_ad[j + 1] == sorted_ad[pos]:
                j += 1
            r[pos:j + 1] = (pos + 1 + j + 1) / 2.0
            pos = j + 1
        ranks = np.empty(len(d))
        ranks[order] = r
        w_plus = float(ranks[d > 0].sum())
        n = len(d)
        _, t = np.unique(ad, return_counts=True)
        tie = float(((t.astype(np.float64) ** 3) - t).sum())
        var = n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - tie / 48.0
        z = (w_plus - n * (n + 1.0) / 4.0) / np.sqrt(var)

        assert got["n"] == n
        assert got["w_plus"] == round(w_plus, 1)
        assert abs(got["z"] - z) <= 2e-6, (got["z"], z)

    def test_mann_kendall_matches_independent_numpy(self, spark):
        """Replica law: S, the tie-corrected continuity-corrected z,
        and the Theil-Sen lower median must reproduce a literal numpy
        all-pairs implementation on the same daily series."""
        import numpy as np

        from console_etl_spark.relational import trend_mann_kendall_theil_sen
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = trend_mann_kendall_theil_sen(spark, SF_TEST).collect()[0]

        o = load_table(spark, SF_TEST, "orders").toPandas()
        daily = (
            o.assign(d=o["o_orderdate"].dt.floor("D"),
                     price=o["o_totalprice"].round(2))
            .groupby("d", as_index=False)["price"].sum()
        )
        rev = daily["price"].round(2).values
        days = daily["d"].values.astype("datetime64[D]").astype(np.int64)
        n = len(rev)
        i, j = np.triu_indices(n, 1)
        diff = rev[j] - rev[i]
        s = int(np.sign(diff).sum())
        slopes = diff / (days[j] - days[i]).astype(np.float64)
        k = (len(slopes) + 1) // 2
        sen = float(np.partition(slopes, k - 1)[k - 1])
        _, t = np.unique(rev, return_counts=True)
        t = t[t > 1].astype(np.float64)
        var = (
            n * (n - 1.0) * (2.0 * n + 5.0)
            - (t * (t - 1) * (2 * t + 5)).sum()
        ) / 18.0
        z = (
            (s - 1.0) / np.sqrt(var)
            if s > 0
            else ((s + 1.0) / np.sqrt(var) if s < 0 else 0.0)
        )

        assert got["n_days"] == n
        assert got["s"] == s
        assert abs(got["z"] - z) <= 2e-6, (got["z"], z)
        assert abs(got["sen_slope"] - sen) <= 2e-6, (got["sen_slope"], sen)

    def test_runs_test_matches_independent_numpy(self, spark):
        """Replica law: the LAG-pass run count, the sign counts, and
        the continuity-free z must reproduce a literal numpy
        implementation (lower median, drop-at-median, run boundaries
        where consecutive signs differ) on the same daily series."""
        import numpy as np

        from console_etl_spark.relational import stats_runs_test_daily_revenue
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_runs_test_daily_revenue(spark, SF_TEST).collect()[0]

        o = load_table(spark, SF_TEST, "orders").toPandas()
        daily = (
            o.assign(d=o["o_orderdate"].dt.floor("D"),
                     price=o["o_totalprice"].round(2))
            .groupby("d")["price"].sum().round(2).sort_index()
        )
        rev = daily.values
        med = np.sort(rev)[(len(rev) + 1) // 2 - 1]
        s = (rev[rev != med] > med).astype(int)
        runs = 1 + int((s[1:] != s[:-1]).sum())
        n1, n2 = int(s.sum()), int(len(s) - s.sum())
        mean = 2.0 * n1 * n2 / (n1 + n2) + 1.0
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
        )
        z = (runs - mean) / np.sqrt(var)

        assert (got["n1"], got["n2"], got["runs"]) == (n1, n2, runs)
        assert abs(got["z"] - z) <= 2e-6, (got["z"], z)

    def test_ljung_box_matches_independent_numpy(self, spark):
        """Replica law: the exact-integer classical r_k (n^2-cleared
        autocovariance over full-series variance) and the Q fold must
        reproduce a literal numpy implementation (global-mean
        autocovariances, Q = n(n+2) sum r_k^2/(n-k)) on the same hourly
        series."""
        import numpy as np

        from console_etl_spark.relational import stats_ljung_box_hourly
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_ljung_box_hourly(spark, SF_TEST).collect()[0]

        e = load_table(spark, SF_TEST, "events").toPandas()
        hourly = (
            e.assign(h=e["ts"].dt.floor("h"))
            .groupby("h").size().sort_index()
        )
        x = hourly.values.astype(np.float64)
        n = len(x)
        xb = x.mean()
        den = ((x - xb) ** 2).sum()
        rk = [
            float((((x[:-k] - xb) * (x[k:] - xb)).sum()) / den)
            for k in range(1, 7)
        ]
        q = n * (n + 2.0) * sum(r * r / (n - k) for k, r in enumerate(rk, 1))

        assert got["n"] == n
        for k in range(1, 7):
            assert abs(got[f"r{k}"] - rk[k - 1]) <= 2e-6, (k, got[f"r{k}"])
        assert abs(got["q_lb"] - q) <= 1e-4 * max(1.0, q), (got["q_lb"], q)

    def test_pvm_bridge_conserves_delta(self, spark):
        """Waterfall honesty: per brand, price_effect + volume_effect
        reconstructs delta within the 2-dp output rounding (the
        telescoping identity is exact in real arithmetic), and the
        bridge covers only brands active in both eras."""
        from console_etl_spark.relational import pvm_revenue_bridge_by_brand
        from tests.conftest import SF_TEST

        rows = pvm_revenue_bridge_by_brand(spark, SF_TEST).collect()
        assert rows, "no both-era brands in fixture"
        for r in rows:
            assert r["qty1"] > 0 and r["qty2"] > 0
            resid = r["delta"] - (r["price_effect"] + r["volume_effect"])
            assert abs(resid) <= 0.03, (r["brand"], resid)


class TestRound11Laws:
    """Invariance and independent-replica laws for the five r11
    registrations (house discipline since r8: oracle parity proves
    Spark==DuckDB; these prove the MATH is right, with a literal
    numpy/pandas implementation written independently of the engine
    code)."""

    def test_bh_fdr_matches_independent_numpy_stepup(self, spark):
        """Replica: per-brand chi-square from a pandas crosstab and the
        BH step-up via reversed np.minimum.accumulate must reproduce
        the engine's p_bh column; plus the three BH structure laws —
        p_bh >= p_raw, p_bh nondecreasing in rank, and the rejection
        set is a PREFIX of the rank order (the step-up guarantees all
        three)."""
        import numpy as np
        import pandas as pd

        from console_etl_spark.relational import stats_bh_fdr_brand_chi2
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_bh_fdr_brand_chi2(spark, SF_TEST).toPandas()
        assert len(got) == 25  # every fixture brand has full marginals

        li = load_table(spark, SF_TEST, "lineitem").select(
            "l_partkey", "l_returnflag", "l_linestatus"
        ).toPandas()
        pt = load_table(spark, SF_TEST, "part").select(
            "p_partkey", "p_brand"
        ).toPandas()
        df = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
        ps = {}
        for brand, grp in df.groupby("p_brand"):
            ct = pd.crosstab(grp["l_returnflag"], grp["l_linestatus"])
            ct = ct.reindex(index=["A", "N", "R"], columns=["F", "O"],
                            fill_value=0)
            obs = ct.to_numpy(dtype=float)
            n = obs.sum()
            exp = np.outer(obs.sum(1), obs.sum(0)) / n
            chi2 = float(((obs - exp) ** 2 / exp).sum())
            ps[brand] = np.exp(-chi2 / 2.0)
        m = len(ps)
        order = sorted(ps, key=lambda b: (ps[b], b))
        raw = np.array([ps[b] for b in order])
        stepup = np.minimum.accumulate(
            (raw * m / np.arange(1, m + 1))[::-1]
        )[::-1]
        p_bh = np.minimum(1.0, stepup)

        got = got.sort_values("p_rank").reset_index(drop=True)
        assert list(got["brand"]) == order
        for i in range(m):
            assert abs(got["p_bh"][i] - p_bh[i]) <= 2e-6, (i, order[i])
            assert got["p_bh"][i] >= got["p_raw"][i] - 1e-9
            if i:
                assert got["p_bh"][i] >= got["p_bh"][i - 1] - 1e-9
        rejects = list(got["reject_fdr_05"])
        assert rejects == sorted(rejects, reverse=True)  # prefix law

    def test_cohort_triangle_structure_and_pandas_replica(self, spark):
        """Laws: age-0 cell of every cohort equals the cohort size
        (retention exactly 1.0 — a customer is active in their own
        first month by construction); cohort sizes sum to the distinct
        customer count; and every (cohort, age, n_active) cell matches
        a literal pandas groupby replica EXACTLY (integer counts)."""
        from console_etl_spark.relational import (
            cohort_monthly_order_retention,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = cohort_monthly_order_retention(spark, SF_TEST).toPandas()
        o = load_table(spark, SF_TEST, "orders").select(
            "o_custkey", "o_orderdate"
        ).toPandas()
        o["mo"] = (o["o_orderdate"].dt.year - 1970) * 12 + (
            o["o_orderdate"].dt.month - 1
        )
        um = o[["o_custkey", "mo"]].drop_duplicates()
        firsts = um.groupby("o_custkey")["mo"].min().rename("cm")
        tri = (
            um.join(firsts, on="o_custkey")
            .assign(age=lambda d: d["mo"] - d["cm"])
            .groupby(["cm", "age"])
            .size()
        )
        sizes = firsts.value_counts()

        assert int(got["n_cohort"].sum() and len(firsts)) == len(firsts)
        for _, r in got.iterrows():
            cm = (r["cohort_month"] // 100 - 1970) * 12 + (
                r["cohort_month"] % 100 - 1
            )
            assert r["n_active"] == tri[(cm, r["age_months"])]
            assert r["n_cohort"] == sizes[cm]
            if r["age_months"] == 0:
                assert r["n_active"] == r["n_cohort"]
                assert r["retention"] == 1.0
        assert len(got) == len(tri)
        assert sizes.sum() == um["o_custkey"].nunique()

    def test_holt_winters_matches_independent_numpy_recursion(self, spark):
        """Replica: an independently-written numpy Holt-Winters
        (array-indexed state, no rotating buffer) must reproduce the
        engine's MAE/sMAPE to float tolerance; plus non-degeneracy
        (the fixture spans years, so n_days >> 14 and both MAEs are
        strictly positive) and the skill identity
        mae_skill == 1 - mae_hw-sum/mae_naive-sum."""
        import numpy as np

        from console_etl_spark.relational import (
            HW_ALPHA,
            HW_BETA,
            HW_GAMMA,
            forecast_holt_winters_daily,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = forecast_holt_winters_daily(spark, SF_TEST).collect()[0]

        o = load_table(spark, SF_TEST, "orders").toPandas()
        rev = (
            o.assign(d=o["o_orderdate"].dt.floor("D"),
                     p=o["o_totalprice"].round(2))
            .groupby("d")["p"].sum().sort_index().to_numpy()
        )
        y = np.round(rev, 2)  # per-day decimal sums, as doubles
        T = len(y)
        assert got["n_days"] == T - 7 and T > 100
        l = y[:7].mean()
        b = (y[7:14].mean() - y[:7].mean()) / 7.0
        s = dict(enumerate(y[:7] - l, start=1))  # s[t] for t=1..7
        e_hw, e_sn, sp_hw, sp_sn = [], [], [], []
        for t in range(8, T + 1):
            yt = y[t - 1]
            yhat = l + b + s[t - 7]
            e_hw.append(abs(yt - yhat))
            e_sn.append(abs(yt - y[t - 8]))
            sp_hw.append(2 * abs(yt - yhat) / (yt + yhat))
            sp_sn.append(2 * abs(yt - y[t - 8]) / (yt + y[t - 8]))
            l_new = HW_ALPHA * (yt - s[t - 7]) + (1 - HW_ALPHA) * (l + b)
            b_new = HW_BETA * (l_new - l) + (1 - HW_BETA) * b
            s[t] = HW_GAMMA * (yt - l - b) + (1 - HW_GAMMA) * s[t - 7]
            l, b = l_new, b_new
        n = float(len(e_hw))
        assert got["mae_hw"] > 0 and got["mae_snaive"] > 0
        assert abs(got["mae_hw"] - sum(e_hw) / n) <= 1e-4 * got["mae_hw"]
        assert abs(got["mae_snaive"] - sum(e_sn) / n) <= (
            1e-4 * got["mae_snaive"]
        )
        assert abs(got["smape_hw"] - sum(sp_hw) / n) <= 1e-5
        assert abs(got["smape_snaive"] - sum(sp_sn) / n) <= 1e-5
        skill = 1.0 - sum(e_hw) / sum(e_sn)
        assert abs(got["mae_skill"] - skill) <= 1e-4 * abs(skill) + 1e-6

    def test_friedman_matches_independent_pandas_ranks(self, spark):
        """Replica: pandas average-rank within each complete month
        block reproduces Q and the mean ranks; plus the rank-sum
        identity mean_rank_a + mean_rank_n + mean_rank_r == k(k+1)/2
        == 6 (each block hands out ranks summing to 6)."""
        import pandas as pd

        from console_etl_spark.relational import stats_friedman_qty_by_flag
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_friedman_qty_by_flag(spark, SF_TEST).collect()[0]
        assert got["k"] == 3
        mr_sum = got["mean_rank_a"] + got["mean_rank_n"] + got["mean_rank_r"]
        assert abs(mr_sum - 6.0) <= 1e-5

        li = load_table(spark, SF_TEST, "lineitem").select(
            "l_shipdate", "l_returnflag", "l_quantity"
        ).toPandas()
        li["mo"] = (li["l_shipdate"].dt.year - 1970) * 12 + (
            li["l_shipdate"].dt.month - 1
        )
        bm = (
            li.assign(q=li["l_quantity"].astype("int64"))
            .groupby(["mo", "l_returnflag"])["q"].sum().reset_index()
        )
        complete = bm.groupby("mo").size()
        bm = bm[bm["mo"].isin(complete[complete == 3].index)]
        bm["rank"] = bm.groupby("mo")["q"].rank(method="average")
        n = bm["mo"].nunique()
        assert got["n_blocks"] == n
        rsum = bm.groupby("l_returnflag")["rank"].sum()
        q_stat = 12.0 / (n * 3 * 4) * float((rsum**2).sum()) - 3 * n * 4
        assert abs(got["q_friedman"] - q_stat) <= 1e-4 * max(1.0, q_stat)
        for fl in ("a", "n", "r"):
            assert abs(
                got[f"mean_rank_{fl}"] - rsum[fl.upper()] / n
            ) <= 1e-5

    def test_cochran_armitage_matches_independent_numpy(self, spark):
        """Replica: the textbook per-level form (scores s_i, successes
        r_i, totals n_i; T = sum r_i(s_i - s_bar), Var = p(1-p) *
        sum n_i(s_i - s_bar)^2, Z = T/sqrt(Var)) computed in numpy
        from the raw columns must match z_ca; plus chi2_trend == z^2
        within output rounding and a non-degenerate family (both
        outcome classes present)."""
        import numpy as np

        from console_etl_spark.relational import stats_cochran_armitage_trend
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_cochran_armitage_trend(spark, SF_TEST).collect()[0]
        li = load_table(spark, SF_TEST, "lineitem").select(
            "l_quantity", "l_returnflag"
        ).toPandas()
        s = li["l_quantity"].astype("int64").to_numpy()
        r = (li["l_returnflag"] == "R").to_numpy()
        N = len(s)
        R = int(r.sum())
        assert got["n"] == N and got["n_success"] == R
        assert 0 < R < N
        levels, counts = np.unique(s, return_counts=True)
        succ = np.array([int(r[s == lv].sum()) for lv in levels])
        sbar = (counts * levels).sum() / N
        t_stat = (succ * (levels - sbar)).sum()
        p = R / N
        var = p * (1 - p) * (counts * (levels - sbar) ** 2).sum()
        z = t_stat / np.sqrt(var)
        assert abs(got["z_ca"] - z) <= 1e-4 * max(1.0, abs(z))
        assert abs(got["chi2_trend"] - got["z_ca"] ** 2) <= 1e-4 * max(
            1.0, got["chi2_trend"]
        )

    def test_jarque_bera_matches_independent_numpy_moments(self, spark):
        """Replica: numpy central moments per flag (computed the naive
        way — mean-subtracted powers, nothing shared with the engine's
        raw-moment expansion) must reproduce skewness, excess kurtosis,
        and JB; plus the JB identity jb == n/6 (S^2 + K^2/4) on the
        engine's own outputs within rounding."""
        import numpy as np

        from console_etl_spark.relational import (
            stats_jarque_bera_price_by_flag,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = {
            r["flag"]: r
            for r in stats_jarque_bera_price_by_flag(spark, SF_TEST).collect()
        }
        assert sorted(got) == ["A", "N", "R"]
        li = load_table(spark, SF_TEST, "lineitem").select(
            "l_returnflag", "l_extendedprice"
        ).toPandas()
        for flag, grp in li.groupby("l_returnflag"):
            x = np.round(grp["l_extendedprice"].to_numpy(), 2)
            n = len(x)
            d = x - x.mean()
            m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
            skew = m3 / m2**1.5
            exk = m4 / m2**2 - 3.0
            jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
            g = got[flag]
            assert g["n"] == n
            assert abs(g["skewness"] - skew) <= 1e-5, flag
            assert abs(g["excess_kurtosis"] - exk) <= 1e-5, flag
            assert abs(g["jarque_bera"] - jb) <= 1e-3 * max(1.0, jb), flag
            ident = g["n"] / 6.0 * (
                g["skewness"] ** 2 + g["excess_kurtosis"] ** 2 / 4.0
            )
            assert abs(g["jarque_bera"] - ident) <= 1e-2 * max(1.0, ident)

    def test_ltv_curve_structure_and_pandas_replica(self, spark):
        """Laws: cum_ltv_per_member is nondecreasing in age within every
        cohort (revenue is nonnegative); the last age's cumulative
        equals the cohort's total revenue / members; age-0 n_cohort is
        the cohort's distinct-customer count; and every period_revenue
        cell matches a literal pandas replica exactly (integer
        cents)."""
        from console_etl_spark.relational import cohort_revenue_ltv_curve
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = cohort_revenue_ltv_curve(spark, SF_TEST).toPandas()
        o = load_table(spark, SF_TEST, "orders").select(
            "o_custkey", "o_orderdate", "o_totalprice"
        ).toPandas()
        o["mo"] = (o["o_orderdate"].dt.year - 1970) * 12 + (
            o["o_orderdate"].dt.month - 1
        )
        o["cents"] = (o["o_totalprice"].round(2) * 100).round().astype(
            "int64"
        )
        o["cm"] = o.groupby("o_custkey")["mo"].transform("min")
        o["age"] = o["mo"] - o["cm"]
        grid = o.groupby(["cm", "age"]).agg(
            rev=("cents", "sum"), n=("o_custkey", "nunique")
        )
        assert len(got) == len(grid)
        for cm_ym, sub in got.groupby("cohort_month"):
            cm = (cm_ym // 100 - 1970) * 12 + (cm_ym % 100 - 1)
            sub = sub.sort_values("age_months").reset_index(drop=True)
            assert sub["n_cohort"].nunique() == 1
            assert sub["n_cohort"][0] == grid.loc[(cm, 0), "n"]
            cum = 0
            prev_ltv = -1.0
            for _, r in sub.iterrows():
                cell = grid.loc[(cm, r["age_months"])]
                assert round(r["period_revenue"] * 100) == cell["rev"]
                cum += cell["rev"]
                assert r["cum_ltv_per_member"] >= prev_ltv - 1e-9
                prev_ltv = r["cum_ltv_per_member"]
            want_last = (cum / 100.0) / sub["n_cohort"][0]
            assert abs(prev_ltv - want_last) <= 1e-4

    def test_durbin_watson_matches_independent_numpy_ols(self, spark):
        """Replica: numpy least-squares on the (t, daily revenue)
        points (np.polyfit — nothing shared with the engine's
        normal-equation integers) must reproduce slope, DW, and
        rho_lag1; plus the range law 0 < DW < 4 and the identity
        rho == 1 - DW/2."""
        import numpy as np

        from console_etl_spark.relational import stats_durbin_watson_daily
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_durbin_watson_daily(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        rev = (
            o.assign(d=o["o_orderdate"].dt.floor("D"),
                     p=o["o_totalprice"].round(2))
            .groupby("d")["p"].sum().sort_index().to_numpy()
        )
        y = np.round(rev, 2)
        t = np.arange(1, len(y) + 1, dtype=float)
        b, a = np.polyfit(t, y, 1)
        e = y - (a + b * t)
        dw = float(((e[1:] - e[:-1]) ** 2).sum() / (e**2).sum())
        assert got["n_days"] == len(y)
        assert 0.0 < got["durbin_watson"] < 4.0
        assert abs(got["slope_per_day"] - b) <= 1e-4 * max(1.0, abs(b))
        assert abs(got["durbin_watson"] - dw) <= 1e-5
        assert abs(
            got["rho_lag1"] - (1.0 - got["durbin_watson"] / 2.0)
        ) <= 2e-6

    def test_naive_interval_matches_numpy_percentiles(self, spark):
        """Replica: np.percentile (linear interpolation — the
        PERCENTILE_CONT definition) on the y_t - y_{t-7} residuals
        must reproduce the band; plus the order law p10 <= p50 <= p90,
        mad_abs >= |p50| sanity, and n_resid == n_days - 7."""
        import numpy as np

        from console_etl_spark.relational import (
            forecast_naive_interval_daily,
            stats_durbin_watson_daily,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = forecast_naive_interval_daily(spark, SF_TEST).collect()[0]
        n_days = stats_durbin_watson_daily(spark, SF_TEST).collect()[0][
            "n_days"
        ]
        assert got["n_resid"] == n_days - 7
        assert got["p10"] <= got["p50"] <= got["p90"]
        assert got["mad_abs"] >= 0.0

        o = load_table(spark, SF_TEST, "orders").toPandas()
        rev = (
            o.assign(d=o["o_orderdate"].dt.floor("D"),
                     p=o["o_totalprice"].round(2))
            .groupby("d")["p"].sum().sort_index().to_numpy()
        )
        y = np.round(rev, 2)
        e = y[7:] - y[:-7]
        assert abs(got["p10"] - np.percentile(e, 10)) <= 1e-4
        assert abs(got["p50"] - np.percentile(e, 50)) <= 1e-4
        assert abs(got["p90"] - np.percentile(e, 90)) <= 1e-4
        assert abs(got["mad_abs"] - np.percentile(np.abs(e), 50)) <= 1e-4

    def test_mcnemar_cells_and_statistic_replica(self, spark):
        """Replica: pandas recomputation of the half-split buying
        flags must reproduce all four cells; the statistic identities
        chi2 = (n10-n01)^2/(n10+n01) and the clamped continuity
        variant; and the partition law n11+n10+n01+n00 == |customer|."""
        from console_etl_spark.relational import stats_mcnemar_repeat_buyers
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_mcnemar_repeat_buyers(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        c_n = load_table(spark, SF_TEST, "customer").count()
        d = (o["o_orderdate"].astype("int64") // 86_400_000_000_000).astype(
            "int64"
        )
        d0, d1 = d.min(), d.max()
        df = o.assign(d=d)
        per = df.groupby("o_custkey")["d"].agg(
            h1=lambda s: int((s * 2 <= d0 + d1).any()),
            h2=lambda s: int((s * 2 > d0 + d1).any()),
        )
        n11 = int(((per.h1 == 1) & (per.h2 == 1)).sum())
        n10 = int(((per.h1 == 1) & (per.h2 == 0)).sum())
        n01 = int(((per.h1 == 0) & (per.h2 == 1)).sum())
        assert (got["n11"], got["n10"], got["n01"]) == (n11, n10, n01)
        assert got["n00"] == c_n - len(per)
        assert got["n11"] + got["n10"] + got["n01"] + got["n00"] == c_n
        disc = n10 + n01
        if disc:
            want = (n10 - n01) ** 2 / disc
            assert abs(got["chi2_mcnemar"] - want) <= 1e-6
            cc = max(abs(n10 - n01) - 1, 0) ** 2 / disc
            assert abs(got["chi2_cc"] - cc) <= 1e-6
            assert got["chi2_cc"] <= got["chi2_mcnemar"] + 1e-9
        else:
            assert got["chi2_mcnemar"] is None

    def test_pettitt_matches_independent_pandas_ranks(self, spark):
        """Replica: pandas midranks (rank method='average') drive
        U_t = 2*cumsum(r) - t(n+1); the max-|U| argmax (earliest t on
        ties) and the approximate p must match; plus the closure law
        U_n == 0 by construction."""
        import numpy as np
        import pandas as pd

        from console_etl_spark.relational import changepoint_pettitt_daily
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = changepoint_pettitt_daily(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        daily = (
            o.assign(
                d=(o["o_orderdate"].astype("int64") // 86_400_000_000_000),
                cents=(o["o_totalprice"].round(2) * 100).round(),
            )
            .groupby("d")["cents"]
            .sum()
            .sort_index()
        )
        x = daily.to_numpy()
        n = len(x)
        r = pd.Series(x).rank(method="average").to_numpy()
        u = 2 * np.cumsum(r) - (np.arange(1, n + 1) * (n + 1))
        assert abs(u[-1]) < 1e-9  # U_n == 0
        au = np.abs(u[: n - 1])
        k = au.max()
        t_star = int(np.argmax(au)) + 1  # earliest t attaining max
        assert got["n_days"] == n
        assert got["k_stat"] == int(round(k))
        assert got["t_star"] == t_star
        assert got["change_day"] == int(daily.index[t_star - 1])
        p = 2.0 * np.exp(-6.0 * k * k / (n**3 + n**2))
        assert abs(got["p_approx"] - p) <= 1e-6

    def test_breusch_pagan_matches_independent_numpy(self, spark):
        """Replica: np.polyfit residuals squared, regressed on t via
        np.corrcoef — LM = n*R^2; plus the laws 0 <= R^2 <= 1 and
        bp_lm == n_days * aux_r2 (identity of the reported pair)."""
        import numpy as np

        from console_etl_spark.relational import stats_breusch_pagan_daily
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_breusch_pagan_daily(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        y = (
            o.assign(
                d=o["o_orderdate"].dt.floor("D"),
                c=(o["o_totalprice"].round(2) * 100).round(),
            )
            .groupby("d")["c"]
            .sum()
            .sort_index()
            .to_numpy()
        )
        n = len(y)
        t = np.arange(1, n + 1, dtype=float)
        b, a = np.polyfit(t, y, 1)
        g = (y - (a + b * t)) ** 2
        r2 = float(np.corrcoef(t, g)[0, 1] ** 2)
        assert got["n_days"] == n
        assert 0.0 <= got["aux_r2"] <= 1.0
        assert abs(got["aux_r2"] - r2) <= 1e-5
        # bp_lm is ROUND(n * unrounded_r2, 6); comparing against the
        # 6dp-rounded aux_r2 can drift by up to n * 5e-7
        assert abs(got["bp_lm"] - n * r2) <= 1e-3

    def test_forecast_scorecard_matches_independent_numpy(self, spark):
        """Replica: numpy lag-7/lag-1 errors on the shared evaluation
        window; plus the power-mean law RMSE >= MAE and the ratio
        identities MASE = MAE7/MAE1, U2 = RMSE7/RMSE1."""
        import numpy as np

        from console_etl_spark.relational import (
            forecast_accuracy_scorecard_daily,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = forecast_accuracy_scorecard_daily(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        y = (
            o.assign(
                d=o["o_orderdate"].dt.floor("D"),
                c=(o["o_totalprice"].round(2) * 100).round(),
            )
            .groupby("d")["c"]
            .sum()
            .sort_index()
            .to_numpy()
        )
        e7 = y[7:] - y[:-7]
        e1 = (y[1:] - y[:-1])[6:]  # aligned to the t >= 8 window
        assert got["n_eval"] == len(e7) == len(e1)
        mae7 = np.abs(e7).mean() / 100.0
        rmse7 = np.sqrt((e7.astype(float) ** 2).mean()) / 100.0
        assert abs(got["mae_snaive"] - mae7) <= 1e-4
        assert abs(got["rmse_snaive"] - rmse7) <= 1e-4
        assert got["rmse_snaive"] >= got["mae_snaive"] - 1e-9
        assert abs(
            got["mase"] - np.abs(e7).sum() / np.abs(e1).sum()
        ) <= 1e-6
        assert abs(
            got["theil_u2"]
            - np.sqrt(
                (e7.astype(float) ** 2).sum() / (e1.astype(float) ** 2).sum()
            )
        ) <= 1e-6

    def test_ccf_matches_independent_numpy_dense_grid(self, spark):
        """Replica: numpy dense hourly grid (missing hours = 0) and
        np.corrcoef at each lag; plus |ccf| <= 1 and the pair-count
        law n_pairs(k) = n_hours - k."""
        import numpy as np

        from console_etl_spark.relational import ccf_view_purchase_hourly
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        rows = ccf_view_purchase_hourly(spark, SF_TEST).collect()
        assert [r["lag_hours"] for r in rows] == list(range(7))
        e = load_table(spark, SF_TEST, "events").toPandas()
        e = e[e["event_type"].isin(["view", "purchase"])]
        h = (e["ts"].astype("int64") // 3_600_000_000_000).astype("int64")
        h0, h1 = h.min(), h.max()
        nh = int(h1 - h0 + 1)
        v = np.zeros(nh)
        p = np.zeros(nh)
        for hh, typ in zip(h, e["event_type"]):
            (v if typ == "view" else p)[hh - h0] += 1
        for r in rows:
            k = r["lag_hours"]
            assert r["n_pairs"] == nh - k
            want = float(
                np.corrcoef(v[: nh - k] if k else v, p[k:])[0, 1]
            )
            assert abs(r["ccf"]) <= 1.0 + 1e-9
            assert abs(r["ccf"] - want) <= 1e-5

    def test_xyz_classes_match_independent_pandas_cv(self, spark):
        """Replica: pandas weekly demand per part with the zero-week
        identity (full-span denominator); every part's cv and class
        must match, classes must partition the part set, and the
        class boundaries must be consistent with the reported cv."""
        import numpy as np

        from console_etl_spark.relational import xyz_demand_variability_parts
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = xyz_demand_variability_parts(spark, SF_TEST).toPandas()
        li = load_table(spark, SF_TEST, "lineitem").toPandas()
        li = li.assign(
            w=(li["l_shipdate"].astype("int64") // 86_400_000_000_000) // 7,
            qc=(li["l_quantity"].round(2) * 100).round().astype("int64"),
        )
        nw = int(li["w"].max() - li["w"].min() + 1)
        weekly = li.groupby(["l_partkey", "w"])["qc"].sum()
        per = weekly.groupby("l_partkey").agg(["count", "sum"])
        sxx = (weekly**2).groupby("l_partkey").sum()
        assert len(got) == len(per)
        assert set(got["xyz_class"]) <= {"X", "Y", "Z"}
        g = got.set_index("partkey")
        for pk in per.index:
            sx = int(per.loc[pk, "sum"])
            varn = nw * int(sxx.loc[pk]) - sx * sx
            cv = np.sqrt(float(varn)) / sx
            row = g.loc[pk]
            assert row["weeks_active"] == per.loc[pk, "count"]
            assert abs(row["cv"] - cv) <= 1e-5
            want = "X" if 4 * varn <= sx * sx else (
                "Y" if varn <= sx * sx else "Z"
            )
            assert row["xyz_class"] == want

    def test_cohens_kappa_identity_and_pandas_replica(self, spark):
        """Replica: pandas lower-median raters reproduce the 2x2;
        plus the defining identity kappa == (po - pe)/(1 - pe), the
        range law -1 <= kappa <= 1, and cell-partition n11+..+n00 ==
        n_docs."""
        from console_etl_spark.llmops.modeleval import (
            eval_cohens_kappa_raters,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = eval_cohens_kappa_raters(spark, SF_TEST).collect()[0]
        d = load_table(spark, SF_TEST, "documents").toPandas()
        nc = d["n_chars"].astype("int64")
        nt = (
            d["text"].str.len() - d["text"].str.replace(" ", "").str.len()
            + 1
        ).astype("int64")

        def lower_median(s):
            v = s.sort_values().to_numpy()
            # min value whose inclusive cumulative count reaches n/2
            return v[(len(v) - 1) // 2] if len(v) % 2 else v[len(v) // 2 - 1]

        mc, mt = lower_median(nc), lower_median(nt)
        ra, rb = (nc >= mc).astype(int), (nt >= mt).astype(int)
        n11 = int(((ra == 1) & (rb == 1)).sum())
        n10 = int(((ra == 1) & (rb == 0)).sum())
        n01 = int(((ra == 0) & (rb == 1)).sum())
        n00 = int(((ra == 0) & (rb == 0)).sum())
        assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (
            n11,
            n10,
            n01,
            n00,
        )
        n = got["n_docs"]
        assert n11 + n10 + n01 + n00 == n == len(d)
        assert -1.0 - 1e-9 <= got["kappa"] <= 1.0 + 1e-9
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
        assert abs(got["po"] - po) <= 1e-6
        assert abs(got["pe"] - pe) <= 1e-6
        if pe < 1.0:
            assert abs(got["kappa"] - (po - pe) / (1 - pe)) <= 2e-6

    def test_holt_winters_degenerate_spans_match_oracle(self, spark, tmp_path):
        """The recursion needs a complete first week to seed and a
        scored day to report: <7 observed days must yield ZERO rows
        (the oracle's recursive CTE never seeds), exactly 7 must yield
        the n=0 all-NULL row (NULL state propagation, not NaN), and
        8-13 days (partial second init week) must still value-match
        the oracle. Driven on truncated copies of the orders fixture
        through BOTH engines."""
        import duckdb
        from pyspark.sql import functions as F

        import __spark_entry__ as entrymod
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST
        from tests.test_oracle_parity import canonicalize

        o = load_table(spark, SF_TEST, "orders")
        days = (
            o.select(
                F.expr(
                    "unix_micros(cast(o_orderdate as timestamp))"
                    " div 86400000000"
                ).alias("d")
            )
            .distinct()
            .orderBy("d")
            .collect()
        )
        sql = entrymod.oracle_sql()["forecast_holt_winters_daily"]
        fn = entrymod.queries()["forecast_holt_winters_daily"]
        for keep in (3, 5, 7, 11):
            cut = days[keep - 1]["d"]
            sub = o.filter(
                F.expr(
                    "unix_micros(cast(o_orderdate as timestamp))"
                    " div 86400000000"
                )
                <= cut
            )
            d = str(tmp_path / f"hw{keep}")
            sub.coalesce(1).write.mode("overwrite").parquet(
                f"{d}/orders.parquet"
            )
            sp = canonicalize(fn(spark, d).toPandas())
            con = duckdb.connect()
            con.execute(
                "create view orders as select * from "
                f"read_parquet('{d}/orders.parquet/*.parquet')"
            )
            dk = canonicalize(con.execute(sql).fetchdf())
            assert len(sp) == len(dk) == (0 if keep < 7 else 1), keep
            if keep == 7:
                assert sp["n_days"][0] == 0 == dk["n_days"][0]
                assert sp["mae_hw"].isna().all()
                assert dk["mae_hw"].isna().all()
            if len(sp):
                import pandas.testing as pt

                pt.assert_frame_equal(sp, dk, check_dtype=False)


class TestRound12Laws:
    """numpy/pandas replicas + defining identities for the r12
    registrations (Croston, Yule-Walker AR(2), Brier decomposition)."""

    def test_croston_pandas_replica_and_laws(self, spark):
        """Replica: an independent pandas fold over the same weekly
        centi-unit demand relation reproduces every part's smoothed
        state bit-for-bit; plus the defining laws: only Z-class parts
        with >= 3 demand weeks appear, SBA = (1 - alpha/2) * Croston,
        p_hat >= 1 (intervals are whole weeks), and z_hat lies inside
        the part's observed [min, max] weekly demand envelope."""
        import pandas as pd

        from console_etl_spark.relational.timeseries import (
            CROSTON_ALPHA,
            _CR_OMA,
            _CR_SBA,
            forecast_croston_intermittent,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = forecast_croston_intermittent(spark, SF_TEST).toPandas()
        assert len(got) > 0
        li = load_table(spark, SF_TEST, "lineitem").toPandas()
        li["w"] = (
            pd.to_datetime(li["l_shipdate"]).astype("int64")
            // 1_000 // 86_400_000_000 // 7
        )
        li["qc"] = (li["l_quantity"].astype(float) * 100).round().astype(
            "int64"
        )
        weekly = (
            li.groupby(["l_partkey", "w"])["qc"].sum().reset_index(name="q")
        )
        nw = int(weekly["w"].max() - weekly["w"].min() + 1)
        expect = {}
        for pk, grp in weekly.groupby("l_partkey"):
            q = grp.sort_values("w")
            sx, sxx = int(q["q"].sum()), int((q["q"] ** 2).sum())
            if not (nw * sxx - sx * sx > sx * sx):  # Z-class gate
                continue
            ws, ds = q["w"].to_numpy(), q["q"].to_numpy()
            if len(ds) < 3:
                continue
            z, p = float(ds[0]), float(ws[1] - ws[0])
            for i in range(2, len(ds)):
                z = CROSTON_ALPHA * float(ds[i]) + _CR_OMA * z
                p = CROSTON_ALPHA * float(ws[i] - ws[i - 1]) + _CR_OMA * p
            expect[pk] = (len(ds), z, p, ds.min(), ds.max())
        assert set(got["partkey"]) == set(expect)
        for row in got.itertuples():
            n, z, p, dmin, dmax = expect[row.partkey]
            assert row.n_demands == n
            assert row.z_hat == round(z / 100.0, 6)
            assert row.p_hat == round(p, 6)
            assert row.croston_fc == round(z / 100.0 / p, 6)
            assert row.sba_fc == round(_CR_SBA * z / 100.0 / p, 6)
            assert row.p_hat >= 1.0  # whole-week intervals
            # EWMA of demands stays inside the demand envelope
            assert dmin / 100.0 - 1e-9 <= row.z_hat <= dmax / 100.0 + 1e-9
            # SBA is a pure scaling of the Croston rate
            assert abs(row.sba_fc - round(_CR_SBA * z / 100.0 / p, 6)) < 1e-12

    def test_yule_walker_numpy_replica_and_laws(self, spark):
        """Replica: numpy classical ACF + the p=2 Toeplitz solve agree
        with the engine to 1e-9; laws: pacf2 == phi2 by Durbin-Levinson,
        innovation_ratio in (0, 1], and |r_k| < 1."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_yule_walker_ar2_hourly,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_yule_walker_ar2_hourly(spark, SF_TEST).collect()[0]
        e = load_table(spark, SF_TEST, "events").toPandas()
        c = (
            e.set_index("ts")
            .resample("1h")["event_id"]
            .count()
        )
        c = c[c > 0].to_numpy(dtype=float)  # observed hours only
        n = len(c)
        mu = c.mean()
        c0 = ((c - mu) ** 2).sum() / n

        def r(k):
            return ((c[k:] - mu) * (c[:-k] - mu)).sum() / n / c0

        r1, r2, r3 = r(1), r(2), r(3)
        assert got["n"] == n
        for have, want in (
            (got["r1"], r1), (got["r2"], r2), (got["r3"], r3),
        ):
            assert abs(have - want) <= 1e-6
            assert abs(have) < 1.0
        phi1 = r1 * (1 - r2) / (1 - r1 * r1)
        phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
        assert abs(got["phi1_yw"] - phi1) <= 1e-6
        assert abs(got["phi2_yw"] - phi2) <= 1e-6
        # numpy cross-check via the Toeplitz solve itself
        sol = np.linalg.solve(np.array([[1, r1], [r1, 1]]), [r1, r2])
        assert abs(got["phi1_yw"] - sol[0]) <= 1e-6
        assert abs(got["phi2_yw"] - sol[1]) <= 1e-6
        pacf3 = (r3 - phi1 * r2 - phi2 * r1) / (1 - phi1 * r1 - phi2 * r2)
        assert abs(got["pacf3"] - pacf3) <= 1e-6
        assert 0.0 < got["innovation_ratio"] <= 1.0 + 1e-9

    def test_brier_murphy_identity_and_numpy_replica(self, spark):
        """The six-term Murphy identity holds EXACTLY (within the 6-dp
        output rounding): brier == rel - res + unc + wbv - 2*wbc; every
        term matches an independent numpy computation; rel/unc/wbv
        are non-negative by construction."""
        from console_etl_spark.llmops.modeleval import (
            CAL_SCALE,
            eval_brier_decomposition,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = eval_brier_decomposition(spark, SF_TEST).collect()[0]
        d = load_table(spark, SF_TEST, "documents").toPandas()
        s = d["n_chars"].clip(upper=CAL_SCALE).astype("int64")
        p = s / CAL_SCALE
        y = (d["lang"] == "en").astype("int64")
        bins = (s * 10 // CAL_SCALE).clip(upper=9)
        n = len(d)
        brier = ((p - y) ** 2).mean()
        ybar = y.mean()
        rel = res = wbv = wbc = 0.0
        for _, idx in p.groupby(bins).groups.items():
            pk, yk = p[idx], y[idx]
            nk = len(idx)
            rel += nk * (pk.mean() - yk.mean()) ** 2
            res += nk * (yk.mean() - ybar) ** 2
            wbv += ((pk - pk.mean()) ** 2).sum()
            wbc += ((pk - pk.mean()) * yk).sum()
        rel, res, wbv, wbc = rel / n, res / n, wbv / n, wbc / n
        unc = ybar * (1 - ybar)
        assert got["n_docs"] == n
        for col, want in (
            ("brier", brier), ("reliability", rel), ("resolution", res),
            ("uncertainty", unc), ("within_bin_var", wbv),
            ("within_bin_cov", wbc),
        ):
            assert abs(got[col] - want) <= 2e-6, (col, got[col], want)
        gap = got["brier"] - (
            got["reliability"] - got["resolution"] + got["uncertainty"]
            + got["within_bin_var"] - 2 * got["within_bin_cov"]
        )
        assert abs(gap) <= 5e-6  # six rounded terms
        assert got["reliability"] >= 0
        assert got["within_bin_var"] >= 0
        assert got["uncertainty"] >= 0

    def test_cramers_v_pandas_replica_and_laws(self, spark):
        """Replica: pandas crosstab chi-square reproduces chi2/V to
        1e-6; laws: 0 <= V_corrected <= V <= 1, dof == (r-1)(c-1)."""
        import pandas as pd

        from console_etl_spark.relational.timeseries import (
            stats_cramers_v_brand_flag,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_cramers_v_brand_flag(spark, SF_TEST).collect()[0]
        li = load_table(spark, SF_TEST, "lineitem").toPandas()
        pt = load_table(spark, SF_TEST, "part").toPandas()
        j = li.merge(
            pt[["p_partkey", "p_brand"]],
            left_on="l_partkey",
            right_on="p_partkey",
        )
        ct = pd.crosstab(j["p_brand"], j["l_returnflag"])
        n = ct.values.sum()
        row = ct.sum(axis=1).values[:, None]
        col = ct.sum(axis=0).values[None, :]
        e = row * col / n
        chi2 = ((ct.values - e) ** 2 / e).sum()
        r, c = ct.shape
        assert got["n"] == n
        assert (got["n_rows"], got["n_cols"]) == (r, c)
        assert got["dof"] == (r - 1) * (c - 1)
        assert abs(got["chi2"] - chi2) <= 1e-5
        v = (chi2 / (n * (min(r, c) - 1))) ** 0.5
        assert abs(got["cramers_v"] - v) <= 1e-6
        assert 0.0 <= got["cramers_v_corrected"] <= got["cramers_v"] <= 1.0

    def test_cohens_d_pandas_replica_and_laws(self, spark):
        """Replica: pandas group moments reproduce d/g/delta; laws:
        |g| < |d| (shrinkage), and the weekend classifier agrees with
        the calendar (epoch-day % 7 in {2,3} == Saturday/Sunday)."""
        import pandas as pd

        from console_etl_spark.relational.timeseries import (
            stats_cohens_d_weekend_revenue,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_cohens_d_weekend_revenue(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        o["d"] = (
            pd.to_datetime(o["o_orderdate"]).astype("int64")
            // 1_000 // 86_400_000_000
        )
        # calendar agreement of the pure-integer weekend rule
        dow = pd.to_datetime(o["o_orderdate"]).dt.dayofweek  # Mon=0
        assert ((o["d"] % 7).isin([2, 3]) == dow.isin([5, 6])).all()
        daily = (
            (o.groupby("d")["o_totalprice"].sum() * 100)
            .round()
            .astype("int64")
        )
        wk = daily[daily.index % 7 >= 4]  # weekdays: d%7 in {0,1,4,5,6}\{2,3}
        wk = daily[~daily.index.to_series().mod(7).isin([2, 3])]
        we = daily[daily.index.to_series().mod(7).isin([2, 3])]
        n1, n2 = len(we), len(wk)
        m1, m2 = we.mean(), wk.mean()
        v1, v2 = we.var(ddof=1), wk.var(ddof=1)
        sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
        d = (m1 - m2) / sp2**0.5
        g = d * (1 - 3 / (4 * (n1 + n2) - 9))
        assert (got["n_weekend"], got["n_weekday"]) == (n1, n2)
        assert abs(got["cohens_d"] - d) <= 1e-6
        assert abs(got["hedges_g"] - g) <= 1e-6
        assert abs(got["glass_delta"] - (m1 - m2) / v2**0.5) <= 1e-6
        assert abs(got["hedges_g"]) < abs(got["cohens_d"]) or d == 0

    def test_burstiness_pandas_replica_and_laws(self, spark):
        """Replica per event type; laws: -1 < B < 1, fano > 0,
        |lag1| < 1, and a Poisson-like series has B ~ (sigma-mu)/(sigma+mu)
        by definition (identity re-check from raw moments)."""
        from console_etl_spark.relational.timeseries import (
            stats_burstiness_event_hourly,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = {
            r["event_type"]: r
            for r in stats_burstiness_event_hourly(spark, SF_TEST).collect()
        }
        e = load_table(spark, SF_TEST, "events").toPandas()
        for et, grp in e.groupby("event_type"):
            c = (
                grp.set_index("ts")
                .resample("1h")["event_id"]
                .count()
            )
            c = c[c > 0].astype("int64")
            n, s, ss = len(c), int(c.sum()), int((c**2).sum())
            V = n * ss - s * s
            r = got[et]
            assert r["n_hours"] == n
            assert abs(r["mean_hourly"] - s / n) <= 1e-6
            assert abs(r["fano"] - V / (n * s)) <= 1e-6
            assert abs(
                r["burstiness"] - (V**0.5 - s) / (V**0.5 + s)
            ) <= 1e-6
            x = c.to_numpy(dtype=float)
            mu = x.mean()
            c0 = ((x - mu) ** 2).sum()
            r1 = ((x[1:] - mu) * (x[:-1] - mu)).sum() / c0
            assert abs(r["lag1_autocorr"] - r1) <= 1e-6
            assert -1.0 < r["burstiness"] < 1.0
            assert r["fano"] > 0
            assert abs(r["lag1_autocorr"]) < 1.0

    def test_hurst_numpy_replica_and_laws(self, spark):
        """Replica: an independent numpy R/S implementation (floats
        throughout, classic formulation) agrees to 1e-6; laws: block
        counts match n_days // m, mean R/S grows with m, and
        0 < hurst < 1."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_hurst_rs_daily,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_hurst_rs_daily(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        import pandas as pd

        o["d"] = (
            pd.to_datetime(o["o_orderdate"]).astype("int64")
            // 1_000 // 86_400_000_000
        )
        y = (
            (o.groupby("d")["o_totalprice"].sum() * 100)
            .round()
            .astype("int64")
            .sort_index()
            .to_numpy(dtype=float)
        )
        T = len(y)
        assert got["n_days"] == T
        logs = []
        for m in (8, 16, 32, 64):
            nb = T // m
            assert got[f"nb{m}"] == nb
            rss = []
            for b in range(nb):
                blk = y[b * m:(b + 1) * m]
                dev = np.cumsum(blk - blk.mean())
                R = dev.max() - dev.min()
                S = blk.std()  # population
                if S > 0:
                    rss.append(R / S)
            mean_rs = float(np.mean(rss))
            assert abs(got[f"rs{m}"] - mean_rs) <= 1e-5 * max(1, mean_rs)
            logs.append((np.log(m), np.log(mean_rs)))
        assert got["rs8"] < got["rs16"] < got["rs32"] < got["rs64"]
        x = np.array([p[0] for p in logs])
        yy = np.array([p[1] for p in logs])
        slope = ((x - x.mean()) * (yy - yy.mean())).sum() / (
            (x - x.mean()) ** 2
        ).sum()
        assert abs(got["hurst"] - slope) <= 1e-5
        assert 0.0 < got["hurst"] < 1.0


class TestRound13Laws:
    """numpy/pandas replicas + defining identities for the r13
    registrations (SES alpha grid, theta backtest, seasonal strength,
    Cramer-von Mises, partial correlation)."""

    @staticmethod
    def _daily_cents(spark):
        import pandas as pd

        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        o = load_table(spark, SF_TEST, "orders").toPandas()
        d = pd.to_datetime(o["o_orderdate"]).astype("int64") // 1_000
        return (
            o.assign(
                d=d // 86_400_000_000,
                cents=(o["o_totalprice"].astype(float) * 100)
                .round()
                .astype("int64"),
            )
            .groupby("d")["cents"]
            .sum()
            .sort_index()
        )

    def test_ses_grid_pandas_replica_and_laws(self, spark):
        """Replica: an independent python fold over the pandas daily
        series reproduces every alpha row bit-for-bit; laws: exactly
        one is_best, it carries the grid's smallest SSE (via its
        unrounded replica), and n_eval is the same for every alpha."""
        from console_etl_spark.relational.timeseries import (
            SES_ALPHAS,
            forecast_ses_alpha_grid_daily,
        )

        from tests.conftest import SF_TEST

        got = forecast_ses_alpha_grid_daily(spark, SF_TEST)
        rows = {r["alpha"]: r for r in got.collect()}
        assert set(rows) == set(SES_ALPHAS)
        cents = self._daily_cents(spark).to_numpy()
        T = len(cents)
        assert T >= 8
        l0 = float(int(cents[:7].sum())) / 7.0
        sa7 = int(sum(abs(int(cents[t - 1]) - int(cents[t - 8]))
                      for t in range(8, T + 1)))
        sses = {}
        for a in SES_ALPHAS:
            l, n, sae, sse = l0, 0, 0.0, 0.0
            for t in range(8, T + 1):
                y = float(cents[t - 1])
                sae += abs(y - l)
                sse += (y - l) * (y - l)
                l = a * y + (1.0 - a) * l
                n += 1
            sses[a] = sse
            r = rows[a]
            assert r["n_eval"] == n
            assert r["mae_ses"] == round(sae / n / 100.0, 6)
            assert r["rmse_ses"] == round((sse / n) ** 0.5 / 100.0, 6)
            assert r["mae_vs_snaive"] == round(sae / float(sa7), 6)
        best = [r for r in rows.values() if r["is_best"] == 1]
        assert len(best) == 1
        want_best = min(SES_ALPHAS, key=lambda a: (sses[a], a))
        assert best[0]["alpha"] == want_best
        assert len({r["n_eval"] for r in rows.values()}) == 1

    def test_theta_pandas_replica_and_cross_query_law(self, spark):
        """Replica: expanding-OLS half-slope + SES-with-drift fold in
        pure python ints/floats reproduces the row; cross-query law:
        theta's mae_snaive equals forecast_accuracy_scorecard_daily's
        (identical evaluation window and denominator convention)."""
        from console_etl_spark.relational.timeseries import (
            THETA_ALPHA,
            _TH_OMA,
            forecast_accuracy_scorecard_daily,
            forecast_theta_daily,
        )

        from tests.conftest import SF_TEST

        got = forecast_theta_daily(spark, SF_TEST).collect()[0]
        cents = [int(c) for c in self._daily_cents(spark).to_numpy()]
        T = len(cents)
        hs = [0.0] * (T + 1)
        sy = sty = st = stt = 0
        for t in range(1, T + 1):
            c = cents[t - 1]
            sy += c
            sty += t * c
            st += t
            stt += t * t
            if t >= 2:
                hs[t] = (
                    float(t * sty - st * sy)
                    / float(t * stt - st * st)
                    / 2.0
                )
        l = float(sum(cents[:7])) / 7.0
        n, sae, sse = 0, 0.0, 0.0
        sa7 = sum(abs(cents[t - 1] - cents[t - 8]) for t in range(8, T + 1))
        for t in range(8, T + 1):
            y = float(cents[t - 1])
            yhat = l + hs[t - 1]
            sae += abs(y - yhat)
            sse += (y - yhat) * (y - yhat)
            l = THETA_ALPHA * y + _TH_OMA * yhat
            n += 1
        assert got["n_eval"] == n
        assert got["mae_theta"] == round(sae / n / 100.0, 6)
        assert got["rmse_theta"] == round((sse / n) ** 0.5 / 100.0, 6)
        assert got["mae_snaive"] == round(float(sa7) / n / 100.0, 6)
        assert got["mae_skill"] == round(1.0 - sae / float(sa7), 6)
        card = forecast_accuracy_scorecard_daily(spark, SF_TEST).collect()[0]
        assert card["n_eval"] == got["n_eval"]
        assert card["mae_snaive"] == got["mae_snaive"]

    def test_seasonal_strength_pandas_replica_and_laws(self, spark):
        """Replica: pandas centered rolling-7 trend + per-dow seasonal
        means + population variances reproduce both strengths to 1e-6;
        laws: strengths in [0,1], n_used == n_days - 6, and the
        remainder RMSE is nonnegative."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_seasonal_strength_daily,
        )

        from tests.conftest import SF_TEST

        got = stats_seasonal_strength_daily(spark, SF_TEST).collect()[0]
        daily = self._daily_cents(spark)
        cents = daily.to_numpy().astype(object)  # exact ints
        days = daily.index.to_numpy()
        T = len(cents)
        tr7 = [
            sum(cents[i - 3 : i + 4]) if 3 <= i <= T - 4 else None
            for i in range(T)
        ]
        rows = [
            (int((days[i] + 4) % 7), int(cents[i]), int(7 * cents[i] - tr7[i]))
            for i in range(T)
            if tr7[i] is not None
        ]
        assert got["n_used"] == len(rows) == T - 6
        snum: dict = {}
        scnt: dict = {}
        for dow, _, det7 in rows:
            snum[dow] = snum.get(dow, 0) + det7
            scnt[dow] = scnt.get(dow, 0) + 1
        detr = np.array([d / 7.0 for _, _, d in rows])
        seas = np.array(
            [float(snum[dow]) / scnt[dow] / 7.0 for dow, _, _ in rows]
        )
        y = np.array([float(c) for _, c, _ in rows])
        rem = detr - seas
        deseas = y - seas

        def pvar(x):
            return float((x * x).mean() - x.mean() ** 2)

        f_seas = max(0.0, 1.0 - pvar(rem) / pvar(detr))
        f_trend = max(0.0, 1.0 - pvar(rem) / pvar(deseas))
        assert abs(got["f_seasonal"] - round(f_seas, 6)) <= 2e-6
        assert abs(got["f_trend"] - round(f_trend, 6)) <= 2e-6
        assert abs(got["rmse_remainder"] - round(pvar(rem) ** 0.5 / 100.0, 2)) <= 0.02
        assert 0.0 <= got["f_seasonal"] <= 1.0
        assert 0.0 <= got["f_trend"] <= 1.0
        assert got["rmse_remainder"] >= 0.0

    def test_cvm_pandas_replica_and_laws(self, spark):
        """Replica: Anderson's T from raw midranks (pandas
        rank(method='average'), the textbook U = n1*sum(r_i - i)^2 +
        n2*sum(s_j - j)^2 form — an independent path from the engine's
        per-distinct-value closed form); laws: t_mean == 1/6 + 1/(6N)
        and the z-standardization is consistent with the reported
        pieces."""
        import numpy as np
        import pandas as pd

        from console_etl_spark.relational.timeseries import (
            stats_cvm_two_sample,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_cvm_two_sample(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        o = o[o["o_orderpriority"].isin(["1-URGENT", "5-LOW"])]
        x = (o["o_totalprice"].astype(float) * 100).round().astype("int64")
        g = (o["o_orderpriority"] == "1-URGENT").to_numpy()
        r = pd.Series(x).rank(method="average").to_numpy()
        r1 = np.sort(r[g])
        r2 = np.sort(r[~g])
        n1, n2 = len(r1), len(r2)
        assert (got["n1"], got["n2"]) == (n1, n2)
        u = n1 * ((r1 - np.arange(1, n1 + 1)) ** 2).sum() + n2 * (
            (r2 - np.arange(1, n2 + 1)) ** 2
        ).sum()
        nt = n1 + n2
        t = u / (n1 * n2 * nt) - (4.0 * n1 * n2 - 1.0) / (6.0 * nt)
        assert abs(got["t_stat"] - t) <= 2e-6
        assert got["t_mean"] == round(1.0 / 6.0 + 1.0 / (6.0 * nt), 6)
        var = (
            (nt + 1.0)
            / 45.0
            / (nt * nt)
            * (4.0 * n1 * n2 * nt - 3.0 * (n1 * n1 + n2 * n2) - 2.0 * n1 * n2)
            / (4.0 * n1 * n2)
        )
        assert abs(got["z"] - (t - (1.0 / 6.0 + 1.0 / (6.0 * nt))) / var**0.5) <= 2e-4

    def test_partial_corr_numpy_replica_and_laws(self, spark):
        """Replica: numpy corrcoef on the exact centi-unit columns +
        the textbook first-order partial formula; laws: every |r| <= 1,
        and the reported partial is consistent with the reported raw
        correlations."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_partial_corr_lineitem,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_partial_corr_lineitem(spark, SF_TEST).collect()[0]
        li = load_table(spark, SF_TEST, "lineitem").toPandas()
        x = (li["l_quantity"].astype(float) * 100).round()
        y = (li["l_extendedprice"].astype(float) * 100).round()
        z = (li["l_discount"].astype(float) * 100).round()
        c = np.corrcoef(np.vstack([x, y, z]))
        rxy, rxz, ryz = c[0, 1], c[0, 2], c[1, 2]
        part = (rxy - rxz * ryz) / (
            (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
        ) ** 0.5
        assert got["n"] == len(li)
        assert abs(got["r_xy"] - rxy) <= 5e-6
        assert abs(got["r_xz"] - rxz) <= 5e-6
        assert abs(got["r_yz"] - ryz) <= 5e-6
        assert abs(got["r_xy_given_z"] - part) <= 5e-6
        for k in ("r_xy", "r_xz", "r_yz", "r_xy_given_z"):
            assert abs(got[k]) <= 1.0
        # consistency from the REPORTED (rounded) pieces
        pr = (got["r_xy"] - got["r_xz"] * got["r_yz"]) / (
            (1.0 - got["r_xz"] ** 2) * (1.0 - got["r_yz"] ** 2)
        ) ** 0.5
        assert abs(pr - got["r_xy_given_z"]) <= 5e-6
        t = got["r_xy_given_z"] * (
            (got["n"] - 3.0) / (1.0 - got["r_xy_given_z"] ** 2)
        ) ** 0.5
        assert abs(got["t_stat"] - t) <= 1e-3


class TestRound13WaveTwoLaws:
    """Replicas + identities for the r13 second-wave registrations
    (Jonckheere-Terpstra, Ansari-Bradley, damped Holt)."""

    def test_jonckheere_terpstra_numpy_replica_and_laws(self, spark):
        """Replica: brute-force pairwise Mann-Whitney counts over the
        five ordered priority groups (numpy searchsorted on sorted
        group arrays — an independent path from the engine's
        per-distinct-value prefix form); laws: the null mean identity
        and 0 <= JT <= sum_(i<j) n_i*n_j."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_jonckheere_terpstra,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_jonckheere_terpstra(spark, SF_TEST).collect()[0]
        o = load_table(spark, SF_TEST, "orders").toPandas()
        x = (o["o_totalprice"].astype(float) * 100).round().astype("int64")
        g = o["o_orderpriority"].str[0].astype(int)
        groups = [np.sort(x[g == i].to_numpy()) for i in range(1, 6)]
        jt2 = 0
        for i in range(5):
            for j in range(i + 1, 5):
                a, bb = groups[i], groups[j]
                # #(a < b) doubled + #(a == b): via searchsorted
                lo = np.searchsorted(a, bb, side="left")
                hi = np.searchsorted(a, bb, side="right")
                jt2 += int(2 * lo.sum() + (hi - lo).sum())
        n = sum(len(gr) for gr in groups)
        sn2 = sum(len(gr) ** 2 for gr in groups)
        assert got["n"] == n
        assert got["jt"] == round(jt2 / 2.0, 1)
        assert got["e_jt"] == round((float(n) * n - sn2) / 4.0, 1)
        max_jt = sum(
            len(groups[i]) * len(groups[j])
            for i in range(5)
            for j in range(i + 1, 5)
        )
        assert 0.0 <= got["jt"] <= max_jt
        # z should be a plain finite float
        assert got["z"] == got["z"]

    def test_ansari_bradley_pandas_replica_and_laws(self, spark):
        """Replica: raw midrank scores a_i = min(r_i, N+1-r_i) via
        pandas rank(method='average'); laws: the tie-conditional null
        mean identity and the score-sum closure sum(a) over BOTH
        groups equals the replica's."""
        import pandas as pd

        from console_etl_spark.relational.timeseries import (
            stats_ansari_bradley,
        )
        from console_etl_spark.session import load_table
        from tests.conftest import SF_TEST

        got = stats_ansari_bradley(spark, SF_TEST).collect()[0]
        li = load_table(spark, SF_TEST, "lineitem").toPandas()
        li = li[li["l_returnflag"].isin(["R", "N"])]
        x = (li["l_extendedprice"].astype(float) * 100).round().astype(
            "int64"
        )
        g1 = (li["l_returnflag"] == "R").to_numpy()
        r = pd.Series(x).rank(method="average").to_numpy()
        n = len(r)
        a = pd.Series(r).combine(pd.Series(n + 1 - r), min).to_numpy()
        n1, n2 = int(g1.sum()), int((~g1).sum())
        assert (got["n1"], got["n2"]) == (n1, n2)
        ab = float(a[g1].sum())
        assert got["ab"] == round(ab, 1)
        e_ab = n1 * float(a.sum()) / n
        assert abs(got["e_ab"] - round(e_ab, 1)) <= 0.2
        var = (
            n1
            * n2
            * (n * float((a * a).sum()) - float(a.sum()) ** 2)
            / (float(n) ** 2 * (n - 1))
        )
        assert abs(got["z"] - (ab - e_ab) / var**0.5) <= 2e-5

    def test_holt_damped_python_replica_and_shelf_laws(self, spark):
        """Replica: the damped-Holt fold in pure python over the pandas
        daily series; shelf laws: mae_snaive equals the theta query's
        (shared window + denominator), and phi=1 would BE classic Holt
        — at phi<1 the damped trend contribution shrinks step-over-step
        (checked via the constants, not re-fold)."""
        from console_etl_spark.relational.timeseries import (
            HD_ALPHA,
            HD_BETA,
            HD_PHI,
            _HD_OMA,
            _HD_OMB,
            forecast_holt_damped_daily,
            forecast_theta_daily,
        )

        from tests.conftest import SF_TEST

        got = forecast_holt_damped_daily(spark, SF_TEST).collect()[0]
        cents = [
            int(c)
            for c in TestRound13Laws._daily_cents(spark).to_numpy()
        ]
        T = len(cents)
        l = float(sum(cents[:7])) / 7.0
        b = (float(sum(cents[7:14])) / 7.0 - float(sum(cents[:7])) / 7.0) / 7.0
        n, sae, sse = 0, 0.0, 0.0
        sa7 = sum(abs(cents[t - 1] - cents[t - 8]) for t in range(8, T + 1))
        for t in range(8, T + 1):
            y = float(cents[t - 1])
            yhat = l + HD_PHI * b
            sae += abs(y - yhat)
            sse += (y - yhat) * (y - yhat)
            l_new = HD_ALPHA * y + _HD_OMA * yhat
            b = HD_BETA * (l_new - l) + _HD_OMB * (HD_PHI * b)
            l = l_new
            n += 1
        assert got["n_eval"] == n
        assert got["mae_damped"] == round(sae / n / 100.0, 6)
        assert got["rmse_damped"] == round((sse / n) ** 0.5 / 100.0, 6)
        assert got["mae_skill"] == round(1.0 - sae / float(sa7), 6)
        theta = forecast_theta_daily(spark, SF_TEST).collect()[0]
        assert theta["mae_snaive"] == got["mae_snaive"]
        assert 0.0 < HD_PHI < 1.0 and _HD_OMA == 1.0 - HD_ALPHA
        assert _HD_OMB == 1.0 - HD_BETA


class TestRound14Laws:
    """numpy/pandas replicas + defining identities for the r14
    registrations (AR(2) backtest with Diebold-Mariano, pinball
    interval scoring, drift benchmark, Mood's median, Cox-Stuart,
    Grubbs, Page's L, Kendall's W)."""

    _daily_cents = staticmethod(TestRound13Laws._daily_cents)

    def _ar2_replica(self, cents):
        """Independent python replica of the expanding Yule-Walker
        AR(2) one-step backtest (exact-int prefix moments, the
        n^2-cleared r_k identity, mean-form forecast)."""
        T = len(cents)
        sae = sse = sd = sdd = 0.0
        sa7 = 0
        n = 0
        phi1 = phi2 = None
        for t in range(8, T + 1):
            m = t - 1
            pre = cents[:m]
            s = sum(pre)
            ss = sum(c * c for c in pre)
            p1 = sum(pre[j] * pre[j - 1] for j in range(1, m))
            p2 = sum(pre[j] * pre[j - 2] for j in range(2, m))
            den = m * (m * ss - s * s)
            r1 = float(
                m * m * p1
                - m * s * ((s - pre[0]) + (s - pre[-1]))
                + (m - 1) * s * s
            ) / float(den)
            r2 = float(
                m * m * p2
                - m * s * ((s - pre[0] - pre[1]) + (s - pre[-1] - pre[-2]))
                + (m - 2) * s * s
            ) / float(den)
            mu = float(s) / float(m)
            phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
            phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
            yhat = (
                mu
                + phi1 * (float(pre[-1]) - mu)
                + phi2 * (float(pre[-2]) - mu)
            )
            y = float(cents[t - 1])
            ae = abs(y - yhat)
            ae7 = abs(cents[t - 1] - cents[t - 8])
            sae += ae
            sse += (y - yhat) * (y - yhat)
            sa7 += ae7
            dd = ae - float(ae7)
            sd += dd
            sdd += dd * dd
            n += 1
        return n, sae, sse, sa7, sd, sdd, phi1, phi2

    def test_ar2_python_replica_and_bakeoff_laws(self, spark):
        """Replica: the expanding Yule-Walker fold reproduces every
        reported column to round-6; laws: mae_snaive equals the theta
        entry's (the shared bake-off protocol), and the DM statistic's
        sign agrees with the skill's (skill > 0 <=> mean loss
        differential < 0 <=> dm_stat < 0)."""
        from console_etl_spark.relational.timeseries import (
            forecast_ar2_daily,
            forecast_theta_daily,
        )

        from tests.conftest import SF_TEST

        got = forecast_ar2_daily(spark, SF_TEST).collect()[0]
        cents = [int(c) for c in self._daily_cents(spark).to_numpy()]
        n, sae, sse, sa7, sd, sdd, phi1, phi2 = self._ar2_replica(cents)
        assert got["n_eval"] == n
        assert got["phi1_last"] == round(phi1, 6)
        assert got["phi2_last"] == round(phi2, 6)
        assert got["mae_ar2"] == round(sae / n / 100.0, 6)
        assert got["rmse_ar2"] == round((sse / n) ** 0.5 / 100.0, 6)
        assert got["mae_snaive"] == round(float(sa7) / n / 100.0, 6)
        assert got["mae_skill"] == round(1.0 - sae / float(sa7), 6)
        md = sd / n
        dm = md / (((sdd / n - md * md) / n) ** 0.5)
        assert got["dm_stat"] == round(dm, 6)
        theta = forecast_theta_daily(spark, SF_TEST).collect()[0]
        assert theta["n_eval"] == got["n_eval"]
        assert theta["mae_snaive"] == got["mae_snaive"]
        assert (got["mae_skill"] > 0) == (got["dm_stat"] < 0)

    def test_pinball_numpy_replica_and_laws(self, spark):
        """Replica: numpy linear-interpolation quantiles on the
        calibration half + the pinball fold reproduce every column;
        laws: the halves partition the residuals, coverage in [0,1],
        and the P50 pinball is half the holdout MAE about the
        calibration median (the defining tau=0.5 identity)."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            forecast_pinball_interval_daily,
        )

        from tests.conftest import SF_TEST

        got = forecast_pinball_interval_daily(spark, SF_TEST).collect()[0]
        cents = [int(c) for c in self._daily_cents(spark).to_numpy()]
        T = len(cents)
        e = [(cents[t - 1] - cents[t - 8]) / 100.0 for t in range(8, T + 1)]
        nr = len(e)
        calib = [x for i, x in enumerate(e, 1) if i * 2 <= nr]
        hold = [x for i, x in enumerate(e, 1) if i * 2 > nr]
        assert got["n_calib"] == len(calib)
        assert got["n_holdout"] == len(hold)
        q10, q50, q90 = (
            float(np.quantile(np.array(calib), q)) for q in (0.1, 0.5, 0.9)
        )
        assert got["q10"] == round(q10, 6)
        assert got["q90"] == round(q90, 6)

        def pball(tau, q):
            return sum(
                max(tau * (x - q), (tau - 1.0) * (x - q)) for x in hold
            ) / len(hold)

        assert got["pinball_p10"] == round(pball(0.1, q10), 6)
        assert got["pinball_p50"] == round(pball(0.5, q50), 6)
        assert got["pinball_p90"] == round(pball(0.9, q90), 6)
        cov = sum(1 for x in hold if q10 <= x <= q90) / len(hold)
        assert got["coverage_80"] == round(cov, 6)
        assert 0.0 <= got["coverage_80"] <= 1.0
        mae_med = sum(abs(x - q50) for x in hold) / len(hold)
        assert abs(got["pinball_p50"] - mae_med / 2.0) <= 1e-6

    def test_drift_python_replica_and_shared_denominator(self, spark):
        """Replica: the expanding-drift fold reproduces the row; law:
        the seasonal-naive denominator equals the AR(2) entry's (same
        window, same champion)."""
        from console_etl_spark.relational.timeseries import (
            forecast_ar2_daily,
            forecast_drift_daily,
        )

        from tests.conftest import SF_TEST

        got = forecast_drift_daily(spark, SF_TEST).collect()[0]
        cents = [int(c) for c in self._daily_cents(spark).to_numpy()]
        T = len(cents)
        n, sae, sse, sa7 = 0, 0.0, 0.0, 0
        for t in range(8, T + 1):
            yhat = float(cents[t - 2]) + float(
                cents[t - 2] - cents[0]
            ) / float(t - 2)
            y = float(cents[t - 1])
            sae += abs(y - yhat)
            sse += (y - yhat) * (y - yhat)
            sa7 += abs(cents[t - 1] - cents[t - 8])
            n += 1
        assert got["n_eval"] == n
        assert got["mae_drift"] == round(sae / n / 100.0, 6)
        assert got["rmse_drift"] == round((sse / n) ** 0.5 / 100.0, 6)
        assert got["mae_skill"] == round(1.0 - sae / float(sa7), 6)
        ar2 = forecast_ar2_daily(spark, SF_TEST).collect()[0]
        assert ar2["mae_snaive"] == got["mae_snaive"]
        assert ar2["n_eval"] == got["n_eval"]

    def test_mood_median_pandas_replica_and_laws(self, spark):
        """Replica: pandas median + boolean counting reproduce the
        cells and both statistics; laws: the Yates statistic never
        exceeds the uncorrected one, and at most half the days lie
        strictly above the pooled median."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_mood_median_weekend,
        )

        from tests.conftest import SF_TEST

        got = stats_mood_median_weekend(spark, SF_TEST).collect()[0]
        daily = self._daily_cents(spark)
        days = daily.index.to_numpy()
        cents = daily.to_numpy().astype(float)
        wk = np.isin(days % 7, (2, 3))
        med = float(np.quantile(cents, 0.5))
        a = int(((cents > med) & wk).sum())
        n1 = int(wk.sum())
        ab = int((cents > med).sum())
        n = len(cents)
        assert got["n_weekend"] == n1
        assert got["n_weekday"] == n - n1
        assert got["above_weekend"] == a
        assert got["above_weekday"] == ab - a
        assert got["median_revenue"] == round(med / 100.0, 6)
        b, c, d = ab - a, n1 - a, n - n1 - (ab - a)
        det = a * d - b * c
        chi2 = n * det * det / float(n1 * (n - n1) * ab * (n - ab))
        assert got["chi2_mood"] == round(chi2, 6)
        yd = max(abs(float(det)) - n / 2.0, 0.0)
        chi2y = n * yd * yd / float(n1 * (n - n1) * ab * (n - ab))
        assert got["chi2_yates"] == round(chi2y, 6)
        assert got["chi2_yates"] <= got["chi2_mood"]
        assert ab * 2 <= n

    def test_cox_stuart_python_replica_and_laws(self, spark):
        """Replica: the ceil-half fold with sign counting reproduces
        the row; laws: pairs never exceed floor(T/2), and z recomputes
        from the counts."""
        from console_etl_spark.relational.timeseries import (
            stats_cox_stuart_trend_daily,
        )

        from tests.conftest import SF_TEST

        got = stats_cox_stuart_trend_daily(spark, SF_TEST).collect()[0]
        cents = [int(c) for c in self._daily_cents(spark).to_numpy()]
        T = len(cents)
        c = (T + 1) // 2
        plus = minus = 0
        for i in range(1, T - c + 1):
            d = cents[i + c - 1] - cents[i - 1]
            plus += d > 0
            minus += d < 0
        assert got["n_plus"] == plus
        assert got["n_minus"] == minus
        assert got["n_pairs"] == plus + minus <= T // 2
        z = float(2 * plus - (plus + minus)) / float(plus + minus) ** 0.5
        assert got["z_cox_stuart"] == round(z, 6)

    def test_grubbs_numpy_replica_and_laws(self, spark):
        """Replica: numpy mean/sample-SD/argmax reproduce statistic and
        argmax day; laws: G > 0 and G <= (n-1)/sqrt(n) (the Grubbs
        upper bound for any dataset)."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_grubbs_outlier_daily,
        )

        from tests.conftest import SF_TEST

        got = stats_grubbs_outlier_daily(spark, SF_TEST).collect()[0]
        daily = self._daily_cents(spark)
        days = daily.index.to_numpy()
        cents = [int(x) for x in daily.to_numpy()]
        n = len(cents)
        s = sum(cents)
        ss = sum(x * x for x in cents)
        mean = float(s) / n
        sd = (float(n * ss - s * s) / float(n * (n - 1))) ** 0.5
        adev = [abs(float(x) - mean) for x in cents]
        best = max(range(n), key=lambda i: (adev[i], -int(days[i])))
        assert got["n_days"] == n
        assert got["mean_revenue"] == round(mean / 100.0, 6)
        assert got["sd_revenue"] == round(sd / 100.0, 6)
        assert got["g_stat"] == round(adev[best] / sd, 6)
        assert got["outlier_day"] == int(days[best])
        assert 0.0 < got["g_stat"] <= (n - 1) / n ** 0.5

    @staticmethod
    def _dow_rank_sums(daily):
        """Shared replica for the weekly block design: within-week
        ranks 1..7 by (cents, dow) over complete epoch weeks."""
        import pandas as pd

        df = pd.DataFrame(
            {
                "w": daily.index.to_numpy() // 7,
                "dow": daily.index.to_numpy() % 7,
                "cents": daily.to_numpy(),
            }
        )
        full = df.groupby("w")["dow"].count()
        df = df[df["w"].isin(full[full == 7].index)]
        df = df.sort_values(["w", "cents", "dow"])
        df["r"] = df.groupby("w").cumcount() + 1
        rj = df.groupby("dow")["r"].sum().to_dict()
        m = df["w"].nunique()
        return rj, m

    def test_page_trend_pandas_replica_and_laws(self, spark):
        """Replica: pandas block ranks reproduce L; laws: E[L] = 112m,
        z recomputes from (L, m), and L lies within the attainable
        per-block permutation bounds [84m, 140m]."""
        from console_etl_spark.relational.timeseries import (
            stats_page_trend_dow,
        )

        from tests.conftest import SF_TEST

        got = stats_page_trend_dow(spark, SF_TEST).collect()[0]
        rj, m = self._dow_rank_sums(self._daily_cents(spark))
        l_stat = sum((dow + 1) * rsum for dow, rsum in rj.items())
        assert got["m_weeks"] == m
        assert got["l_stat"] == l_stat
        assert got["e_l"] == 112 * m
        var = m * 49.0 * 8.0 * 48.0 / 144.0
        assert got["z_page"] == round((l_stat - 112 * m) / var ** 0.5, 6)
        # attainable per-block range of sum_j j*r_j over permutations of
        # 1..7: min (reversed) sum j*(8-j) = 84, max (aligned) sum j^2 = 140
        assert 84 * m <= l_stat <= 140 * m

    def test_kendalls_w_pandas_replica_and_friedman_identity(self, spark):
        """Replica: the doubled-score S4 over pandas block ranks
        reproduces W; laws: 0 <= W <= 1, chi2 == 6mW (the Friedman
        identity of the k=7 design), and Page's test sees the same
        block design (same m_weeks)."""
        from console_etl_spark.relational.timeseries import (
            stats_kendalls_w_dow,
            stats_page_trend_dow,
        )

        from tests.conftest import SF_TEST

        got = stats_kendalls_w_dow(spark, SF_TEST).collect()[0]
        rj, m = self._dow_rank_sums(self._daily_cents(spark))
        s4 = sum((2 * rsum - 8 * m) ** 2 for rsum in rj.values())
        assert got["m_weeks"] == m
        assert got["s4_stat"] == s4
        w = 3.0 * s4 / float(m * m * 336)
        assert got["kendalls_w"] == round(w, 6)
        assert got["chi2_friedman"] == round(6.0 * m * w, 6)
        assert 0.0 <= got["kendalls_w"] <= 1.0
        page = stats_page_trend_dow(spark, SF_TEST).collect()[0]
        assert page["m_weeks"] == got["m_weeks"]


class TestRound14LawsWave2:
    """numpy/pandas replicas + defining identities for the r14 wave-2
    registrations (forecast combination, Quade, Brunner-Munzel,
    Hodges-Lehmann, generalized ESD, Buishand range, Gopher flags)."""

    _daily_cents = staticmethod(TestRound13Laws._daily_cents)

    @property
    def SF_TEST(self):
        from tests.conftest import SF_TEST

        return SF_TEST

    def test_combo_replica_and_jensen_law(self, spark):
        """Replica: the three-member equal-weight combination fold
        reproduces every column; laws: mae_snaive equals the drift
        entry's (shared protocol), and the per-timestep triangle
        inequality |y - mean(f_i)| <= mean|y - f_i| makes the combo's
        SAE at most the mean of its members' SAEs (Jensen / the
        Bates-Granger hedge, exactly, not just on average)."""
        from console_etl_spark.relational.timeseries import (
            forecast_combo_daily,
            forecast_drift_daily,
        )

        got = forecast_combo_daily(spark, self.SF_TEST).collect()[0]
        cents = [int(c) for c in self._daily_cents(spark).to_numpy()]
        T = len(cents)
        sae = sse = 0.0
        sa7 = 0
        sae_members = [0.0, 0.0, 0.0]
        n = 0
        for t in range(8, T + 1):
            y = float(cents[t - 1])
            l1 = cents[t - 2]
            l7 = cents[t - 8]
            y1 = cents[0]
            f_sn = float(l7)
            f_n = float(l1)
            f_dr = float(l1) + float(l1 - y1) / float(t - 2)
            yhat = (float(l7) + float(l1) + f_dr) / 3.0
            sae += abs(y - yhat)
            sse += (y - yhat) * (y - yhat)
            sa7 += abs(cents[t - 1] - l7)
            for i, f in enumerate((f_sn, f_n, f_dr)):
                sae_members[i] += abs(y - f)
            n += 1
        assert got["n_eval"] == n
        assert got["mae_combo"] == round(sae / n / 100.0, 6)
        assert got["rmse_combo"] == round((sse / n) ** 0.5 / 100.0, 6)
        assert got["mae_snaive"] == round(float(sa7) / n / 100.0, 6)
        assert got["mae_skill"] == round(1.0 - sae / float(sa7), 6)
        drift = forecast_drift_daily(spark, self.SF_TEST).collect()[0]
        assert drift["mae_snaive"] == got["mae_snaive"]
        assert drift["n_eval"] == got["n_eval"]
        assert sae <= sum(sae_members) / 3.0 + 1e-9

    def test_quade_replica_and_block_design_law(self, spark):
        """Replica: numpy blocked ranks with the (cents, dow) and
        (spread, w) deterministic tiebreaks reproduce A, sum S_j^2,
        and F; law: the block count matches Page's (same complete-week
        design)."""
        from console_etl_spark.relational.timeseries import (
            stats_page_trend_dow,
            stats_quade_dow,
        )

        got = stats_quade_dow(spark, self.SF_TEST).collect()[0]
        daily = self._daily_cents(spark)
        rows = [(d // 7, d % 7, int(c)) for d, c in daily.items()]
        byweek = {}
        for w, dow, c in rows:
            byweek.setdefault(w, []).append((dow, c))
        full = {w: v for w, v in byweek.items() if len(v) == 7}
        spreads = sorted(
            (max(c for _, c in v) - min(c for _, c in v), w)
            for w, v in full.items()
        )
        q_of = {w: i + 1 for i, (_, w) in enumerate(spreads)}
        s_j = [0] * 7
        a_stat = 0
        for w, v in full.items():
            ranked = sorted(v, key=lambda t: (t[1], t[0]))
            for r, (dow, _) in enumerate(ranked, start=1):
                s_ij = q_of[w] * (r - 4)
                s_j[dow] += s_ij
                a_stat += s_ij * s_ij
        b_num = sum(x * x for x in s_j)
        m = len(full)
        assert got["m_weeks"] == m
        assert got["a_stat"] == a_stat
        assert got["b_num"] == b_num
        f = (m - 1) * float(b_num) / (m * float(a_stat) - float(b_num))
        assert got["f_quade"] == round(f, 6)
        page = stats_page_trend_dow(spark, self.SF_TEST).collect()[0]
        assert page["m_weeks"] == got["m_weeks"]

    def test_brunner_munzel_replica_and_mw_duality(self, spark):
        """Replica: scipy-formula numpy midranks reproduce W, p_hat,
        and df; law: BM's p_hat = P(X_L > X_U) + tie/2 is the
        complement of Mann-Whitney's auc on the SAME populations
        (p_hat + auc == 1 to rounding)."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_brunner_munzel,
            stats_mannwhitney_u,
        )
        from console_etl_spark.session import load_table

        got = stats_brunner_munzel(spark, self.SF_TEST).collect()[0]
        o = load_table(spark, self.SF_TEST, "orders").toPandas()
        o = o[o["o_orderpriority"].isin(["1-URGENT", "5-LOW"])]
        x = (
            (o[o["o_orderpriority"] == "1-URGENT"]["o_totalprice"]
             .astype(float) * 100).round().astype("int64").to_numpy()
        )
        y = (
            (o[o["o_orderpriority"] == "5-LOW"]["o_totalprice"]
             .astype(float) * 100).round().astype("int64").to_numpy()
        )

        def midranks(a, pool):
            srt = np.sort(pool)
            lo = np.searchsorted(srt, a, side="left")
            hi = np.searchsorted(srt, a, side="right")
            return (lo + hi + 1) / 2.0

        nx, ny = len(x), len(y)
        rcx = midranks(x, np.concatenate((x, y)))
        rcy = midranks(y, np.concatenate((x, y)))
        rx = midranks(x, x)
        ry = midranks(y, y)
        sx = np.sum(
            (rcx - rx - rcx.mean() + (nx + 1) / 2.0) ** 2
        ) / (nx - 1)
        sy = np.sum(
            (rcy - ry - rcy.mean() + (ny + 1) / 2.0) ** 2
        ) / (ny - 1)
        w = (
            nx * ny * (rcy.mean() - rcx.mean())
            / ((nx + ny) * np.sqrt(nx * sx + ny * sy))
        )
        df = (nx * sx + ny * sy) ** 2 / (
            (nx * sx) ** 2 / (nx - 1) + (ny * sy) ** 2 / (ny - 1)
        )
        p_hat = (rcy.mean() - (ny + 1) / 2.0) / nx
        assert got["n1"] == nx and got["n2"] == ny
        assert abs(got["p_hat"] - p_hat) <= 1e-6
        assert abs(got["w_bm"] - w) <= 1e-5
        assert abs(got["df_bm"] - df) <= 1e-3
        mw = stats_mannwhitney_u(spark, self.SF_TEST).collect()[0]
        assert abs(got["p_hat"] + mw["auc"] - 1.0) <= 2e-6

    def test_hodges_lehmann_replica_and_range_law(self, spark):
        """Replica: the numpy pairwise-difference median (explicit
        two-middle-order-statistics rule) reproduces the estimate
        exactly; law: the estimate lies inside [min diff, max diff]."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            stats_hodges_lehmann_shift,
        )

        got = stats_hodges_lehmann_shift(spark, self.SF_TEST).collect()[0]
        daily = self._daily_cents(spark)
        we = np.array(
            [int(c) for d, c in daily.items() if d % 7 in (2, 3)],
            dtype="int64",
        )
        wd = np.array(
            [int(c) for d, c in daily.items() if d % 7 not in (2, 3)],
            dtype="int64",
        )
        diffs = np.sort((we[:, None] - wd[None, :]).ravel())
        p = len(diffs)
        assert got["n_pairs"] == p
        lo = diffs[(p + 1) // 2 - 1]
        hi = diffs[(p + 2) // 2 - 1]
        assert got["hl_cents_x2"] == int(lo) + int(hi)
        assert got["hl_shift"] == round((int(lo) + int(hi)) / 200.0, 6)
        assert diffs[0] * 2 <= got["hl_cents_x2"] <= diffs[-1] * 2

    def test_gesd_replica_and_grubbs_law(self, spark):
        """Replica: the numpy peel (exact-integer argmax key, sample
        sd) reproduces all three iterations; laws: iteration 1 IS the
        Grubbs statistic (same day, same value to rounding), and the
        argmax key makes each round's choice deterministic."""
        from console_etl_spark.relational.timeseries import (
            anomaly_gesd_daily,
            stats_grubbs_outlier_daily,
        )

        rows = {
            r["iter"]: r
            for r in anomaly_gesd_daily(spark, self.SF_TEST).collect()
        }
        daily = self._daily_cents(spark)
        remaining = [(int(d), int(c)) for d, c in daily.items()]
        for it in (1, 2, 3):
            n = len(remaining)
            s = sum(c for _, c in remaining)
            ss = sum(c * c for _, c in remaining)
            key = lambda t: (-abs(n * t[1] - s), t[0])  # noqa: E731
            d_star, c_star = min(remaining, key=key)
            sd = ((n * ss - s * s) / (n * (n - 1))) ** 0.5
            r_stat = abs(n * c_star - s) / n / sd
            got = rows[it]
            assert got["d"] == d_star
            assert got["cents"] == c_star
            assert got["n_remaining"] == n
            assert abs(got["r_stat"] - r_stat) <= 1e-6
            remaining = [t for t in remaining if t[0] != d_star]
        g = stats_grubbs_outlier_daily(spark, self.SF_TEST).collect()[0]
        assert g["outlier_day"] == rows[1]["d"]
        assert abs(g["g_stat"] - rows[1]["r_stat"]) <= 1e-6

    def test_buishand_replica_and_order_law(self, spark):
        """Replica: numpy cumulative deviations reproduce R/sqrt(n),
        Q/sqrt(n), and the argmax day; law: Q <= R always (S_n = 0
        puts 0 inside [min S, max S], so max|S| <= max S - min S)."""
        import numpy as np

        from console_etl_spark.relational.timeseries import (
            changepoint_buishand_range,
        )

        got = changepoint_buishand_range(spark, self.SF_TEST).collect()[0]
        daily = self._daily_cents(spark)
        ds = np.array([int(d) for d in daily.index], dtype="int64")
        cs = daily.to_numpy().astype("int64")
        n = len(cs)
        s = int(cs.sum())
        ss = int((cs.astype(object) ** 2).sum())
        tk = np.cumsum(cs)
        nsk = n * tk - np.arange(1, n + 1) * s
        denom = (float(n * ss - s * s)) ** 0.5 * float(n) ** 0.5
        r = float(nsk.max() - nsk.min()) / denom
        q = float(np.abs(nsk).max()) / denom
        order = sorted(zip(-np.abs(nsk), ds))
        assert got["n_days"] == n
        assert got["d_star"] == order[0][1]
        assert got["r_buishand"] == round(r, 6)
        assert got["q_buishand"] == round(q, 6)
        assert got["q_buishand"] <= got["r_buishand"] + 1e-9

    def test_gopher_flags_pandas_replica_and_monotone_law(self, spark):
        """Replica: pandas recomputation of all five integer-exact rule
        predicates reproduces every per-source count; law: the
        conjunctive pass_all never exceeds any individual rule's
        count."""
        from console_etl_spark.llmops.textan import (
            text_gopher_quality_flags,
        )
        from console_etl_spark.session import load_table

        got = {
            r["source"]: r
            for r in text_gopher_quality_flags(spark, self.SF_TEST).collect()
        }
        docs = load_table(spark, self.SF_TEST, "documents").toPandas()
        stops = {"the", "a", "be", "to", "of", "and", "that", "have",
                 "with"}
        agg = {}
        for _, row in docs.iterrows():
            text = row["text"]
            toks = text.split(" ")
            n_tok = len(toks)
            sum_len = sum(len(t) for t in toks)
            n_sym = text.count("#") + (
                len(text) - len(text.replace("...", ""))
            ) // 3
            lines = text.split("\n")
            n_bullet = sum(
                1 for ln in lines if ln.startswith(("-", "*"))
            )
            f = (
                1 if 50 <= n_tok <= 100000 else 0,
                1 if 3 * n_tok <= sum_len <= 10 * n_tok else 0,
                1 if 10 * n_sym < n_tok else 0,
                1 if 10 * n_bullet <= 9 * len(lines) else 0,
                1 if len(stops & set(toks)) >= 2 else 0,
            )
            a = agg.setdefault(
                row["source"], [0, 0, 0, 0, 0, 0, 0]
            )
            a[0] += 1
            for i in range(5):
                a[1 + i] += f[i]
            a[6] += 1 if all(f) else 0
        for src, a in agg.items():
            g = got[src]
            assert g["n_docs"] == a[0]
            assert g["pass_words"] == a[1]
            assert g["pass_wordlen"] == a[2]
            assert g["pass_symbol"] == a[3]
            assert g["pass_bullet"] == a[4]
            assert g["pass_stop"] == a[5]
            assert g["pass_all"] == a[6]
            assert g["pass_rate"] == round(a[6] / a[0], 6)
            assert g["pass_all"] <= min(a[1:6])
