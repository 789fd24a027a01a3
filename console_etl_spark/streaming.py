"""Structured Streaming tier (SURVEY.md §2.2 streaming row).

The reference's only "streaming" is pull-based conditional-GET refresh
(S3, /root/reference/cache.go:54-66) — no event time, windows, or state.
This module supplies the real thing over the events fixture shape:
watermarked tumbling/sliding windows, session windows, and streaming
dedup. Batch twins of the window aggregations live in relational.py
(events_hourly_stats / events_sliding_windows / sessionize_events) and
are oracle-checked; the streaming versions are unit-tested by driving a
file source to completion and comparing against the batch plan — the
Structured Streaming correctness contract (same plan, incremental
execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    """Events stream schema with ``ts`` as whatever physical type the
    source files carry — long nanos (old fixture generation) or
    TIMESTAMP_NTZ (current micros fixture). A file-source stream needs a
    declared schema, and declaring the wrong ts dtype makes the reader
    silently null/drop rows, so the dtype must be dispatched, never
    assumed."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Long-nanos variant kept as the named constant tests import.
EVENTS_STREAM_SCHEMA = _events_stream_schema(T.LongType())


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    ts_type: T.DataType | None = None,
) -> DataFrame:
    """File-source events stream (the Kafka-shaped entry point in
    production — swap format, keep the downstream plan).

    Dtype-dispatches ``ts`` the same way session.load_table does: a
    one-off batch footer read discovers the on-disk type, then the
    stream normalizes to TimestampType (wall-clock-identical under the
    UTC session TZ). DELIBERATE SESSION SIDE EFFECT: constructing the
    reader sets spark.sql.session.timeZone=UTC for the whole session —
    every monitor's hour/window truncation and the batch twins it must
    match are defined in UTC (the engine's own get_spark sessions are
    UTC already; a foreign session that needs another report TZ must
    not interleave TZ-sensitive batch queries with these streams).
    When the source directory is still EMPTY (the
    common start-the-stream-before-data-arrives deployment), schema
    inference has nothing to read — fall back to the declared default
    (long nanos, ``EVENTS_STREAM_SCHEMA``) or an explicit ``ts_type``.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if ts_type is None:
        from pyspark.errors import AnalysisException

        try:
            ts_type = spark.read.parquet(path).schema["ts"].dataType
        except AnalysisException as e:
            # Fall back ONLY for the start-before-data case: an EMPTY
            # existing directory (no footers to infer from). Anything
            # else — missing path (the stream source itself would refuse
            # it), corrupt footer, permissions, a ts column missing —
            # must surface at plan time, not be masked into a silently
            # wrong long-nanos schema.
            cond = ""
            get_cond = getattr(e, "getCondition", None) or getattr(
                e, "getErrorClass", None
            )
            if get_cond is not None:
                cond = get_cond() or ""
            if "UNABLE_TO_INFER_SCHEMA" in cond:
                ts_type = T.LongType()
            else:
                raise
    stream = (
        spark.readStream.schema(_events_stream_schema(ts_type))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if isinstance(ts_type, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _dec_sum(col: str):
    """Exact money sum: decimal accumulate, double at the edge — same
    convention as the batch twins so stream == batch bit-for-bit."""
    return F.sum(F.col(col).cast("decimal(8,2)")).cast("double")


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming twin of
    relational.events_hourly_stats). Late events beyond the watermark are
    dropped; state for closed windows is evicted — bounded memory at any
    scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _dec_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding windows (2h / 1h) — twin of events_sliding_windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), _dec_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows with a 30-minute gap — the native stateful twin of
    relational.sessionize_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    state is bounded by the watermark, the streaming analog of X1."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def _interval_micros(spec: str) -> int:
    """Microseconds in a Spark interval string like '10 minutes' — the
    divisor debounce_stream derives win_id from must track the window
    argument (a hardcoded default-window divisor would collapse two
    adjacent non-default windows onto one win_id).

    Accepts the same grammar ``F.window()`` does for fixed-length
    intervals: every unit from microsecond through week, and compound
    specs like '1 hour 30 minutes' (pairwise <n> <unit> tokens summed).
    Month/year are rejected by name — they are variable-length, so
    ``F.window()`` itself refuses them and no integer divisor exists."""
    per = {
        "microsecond": 1,
        "millisecond": 1_000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 604_800_000_000,
    }
    tokens = spec.strip().split()
    if not tokens or len(tokens) % 2 != 0:
        raise ValueError(
            f"_interval_micros: cannot parse interval {spec!r} — expected "
            f"pairs of '<n> <unit>' with units in "
            f"{sorted(per)} (plural forms accepted)"
        )
    total = 0
    for n, unit in zip(tokens[::2], tokens[1::2]):
        key = unit.lower().rstrip("s")
        if key not in per:
            raise ValueError(
                f"_interval_micros: unsupported unit {unit!r} in {spec!r} "
                f"— supported units: {sorted(per)} (month/year are "
                f"variable-length and have no fixed divisor)"
            )
        total += int(n) * per[key]
    return total


def debounce_stream(
    events: DataFrame, window: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming telemetry debounce — twin of
    relational.dedup_events_debounce, same output columns: the FIRST
    event per (user, event type) in each tumbling window plus the
    suppression count, as a watermarked window aggregation (min over
    (ts, event_id, value) structs — state per open window is one
    struct and one counter; closed windows evict at the watermark).
    win_id matches the batch integer-microsecond floor because
    F.window() aligns starts to epoch multiples of the slide."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id", "event_type")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("k"),
            F.count("*").alias("n_in_win"),
        )
        .select(
            F.col("k.event_id").cast("bigint").alias("event_id"),
            "user_id",
            "event_type",
            F.expr(
                f"unix_micros(w.start) DIV {_interval_micros(window)}"
            )
            .cast("bigint")
            .alias("win_id"),
            F.col("k.value").alias("kept_value"),
            (F.col("n_in_win") - 1).cast("bigint").alias("n_suppressed"),
        )
    )


def ohlc_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming OHLC bars — twin of relational.ohlc_hourly_value, same
    columns: open/close as watermarked min/max over (ts, event_id,
    value) structs, high/low/count as plain aggregates. One struct
    pair and three scalars of state per open bar; closed bars evict at
    the watermark. The canonical live-ticker downsample."""
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            first.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last.getField("value").alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("bar_ts"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a bounded file-source stream to completion into a memory
    sink and return the materialized result (test/dev harness only —
    production sinks are kafka/parquet/foreachBatch).

    Default output mode is ``complete`` because with a bounded file
    source the watermark never passes the last windows — in ``append``
    mode their rows would be withheld forever (use ``append`` for
    non-aggregating streams like dedup).
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return stream_df.sparkSession.table(query_name)


# --------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState): per-user running
# totals. Demonstrates the pattern for operators Spark's built-in
# streaming aggregations can't express (arbitrary per-key state machines).
# --------------------------------------------------------------------------

RUNNING_TOTALS_OUTPUT = (
    "user_id long, n_events long, total_cents long, max_event_id long"
)
RUNNING_TOTALS_STATE = "n long, cents long, max_id long"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total, high-water event id) maintained as
    explicit group state across micro-batches.

    Money is accumulated in integer cents so the running total is
    order-independent and exactly comparable to a batch groupBy — the
    float-summation nondeterminism a naive ``sum(value)`` state would
    have. State is 3 longs per user: bounded by user cardinality, and at
    cluster scale the state store shards by the groupBy key. Emits in
    ``update`` mode — one refreshed row per user per micro-batch touched.
    """
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        n, cents, max_id = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # a NULL value must not poison the query: NaN.astype(int64)
            # raises — and the batch twin's SUM skips NULLs, so dropna
            # keeps stream == batch on dirty data (count still counts
            # every row, like COUNT(*))
            vals = pdf["value"].dropna()
            cents += int(vals.mul(100).round().astype("int64").sum())
            if len(pdf):
                max_id = max(max_id, int(pdf["event_id"].max()))
        state.update((n, cents, max_id))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "max_event_id": [max_id],
            }
        )

    # r14 optimization (guide §4.1): project to the columns the state
    # function reads BEFORE the state shuffle — Spark cannot prune into
    # an opaque pandas function, so the unused props JSON (the widest
    # events column) otherwise crosses the shuffle and the Arrow
    # boundary on every row. Output is schema-declared and unchanged.
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            RUNNING_TOTALS_OUTPUT,
            RUNNING_TOTALS_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


MARKOV_OUTPUT = "user_id long, from_type string, to_type string, n long"
MARKOV_STATE = "last_type string"


def stream_markov_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition counts maintained incrementally
    across micro-batches — the streaming twin of the batch
    markov_event_transitions query (relational.py), for arrival-ordered
    streams (time-range-ordered file drops; the out-of-order audit
    measures how safe that assumption is).

    State per user is ONE string: the last event type seen. Each batch
    sorts its rows for the user by (ts, event_id) — deterministic within
    the batch — bridges the carried state to the batch's first event,
    and emits the batch's transition pair counts in append mode; the
    final transition matrix is a plain aggregation over the sink, and
    stream==batch is pinned by test. At scale the state store shards by
    user_id and holds one short string per user."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        pairs: dict = {}
        # A group larger than the Arrow batch size arrives as MULTIPLE
        # chunks in arbitrary order — concatenate before the one sort,
        # or a purchase chunk could precede its earlier-ts touch chunk.
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for t in pdf["event_type"]:
                if last is not None:
                    k = (last, t)
                    pairs[k] = pairs.get(k, 0) + 1
                last = t
        if last is not None:
            state.update((last,))
        if pairs:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(pairs),
                    "from_type": [k[0] for k in pairs],
                    "to_type": [k[1] for k in pairs],
                    "n": list(pairs.values()),
                }
            )

    # r14 optimization (guide §4.1): only the columns the state function
    # reads cross the shuffle + Arrow boundary (drops props and value).
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            MARKOV_OUTPUT,
            MARKOV_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


from .relational.timeseries import ATTR_LOOKBACK_US  # noqa: E402 — one
# lookback constant owns the whole attribution family, batch AND stream;
# a desynced copy here would silently break the stream==batch contract

ATTR_OUTPUT = "user_id long, channel string, n long"
ATTR_STATE = "mkt_ts long, mkt_type string"


def stream_attribution_last_touch(events: DataFrame) -> DataFrame:
    """Per-user last-touch attribution maintained incrementally across
    micro-batches — the streaming twin of the batch
    attribution_last_touch query (relational.timeseries), for
    arrival-ordered streams (same contract as
    stream_markov_transitions; the out-of-order audit measures how safe
    that assumption is). Marketing teams run this as the live
    conversion dashboard the batch report reconciles nightly.

    State per user is ONE (timestamp, type) pair: the most recent
    marketing touch (view / click / signup) seen so far — purchases do
    NOT reset it, matching the batch twin's carried IGNORE-NULLS
    window. Each batch sorts its rows for the user by (ts, event_id)
    (deterministic within the batch), bridges the carried touch to the
    batch's first purchase, credits each purchase to the carried touch
    if it is within the exact 7-day microsecond lookback (else
    'unattributed'), and emits per-channel purchase counts in append
    mode; the live report is a plain aggregation over the sink, and
    stream==batch is pinned by test. At scale the state store shards by
    user_id and holds one long + one short string per user."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _micros(s: pd.Series) -> pd.Series:
        if pd.api.types.is_datetime64_any_dtype(s):
            return s.astype("datetime64[ns]").astype("int64") // 1000
        return s.astype("int64") // 1000  # NANOS-as-long fixture generation

    def update(key: tuple, pdfs, state: GroupState):
        mkt_ts, mkt_type = state.get if state.exists else (None, None)
        counts: dict = {}
        # Concatenate the group's Arrow chunks before the one sort (a
        # group larger than the Arrow batch size arrives as multiple
        # chunks in arbitrary order; see stream_markov_transitions).
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            us = _micros(pdf["ts"])
            for t, ts_us in zip(pdf["event_type"], us):
                if t == "purchase":
                    within = (
                        mkt_ts is not None
                        and ts_us - mkt_ts <= ATTR_LOOKBACK_US
                    )
                    ch = mkt_type if within else "unattributed"
                    counts[ch] = counts.get(ch, 0) + 1
                elif t in ("view", "click", "signup"):
                    mkt_ts, mkt_type = int(ts_us), t
        if mkt_ts is not None:
            state.update((mkt_ts, mkt_type))
        if counts:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(counts),
                    "channel": list(counts),
                    "n": list(counts.values()),
                }
            )

    # r14 optimization (guide §4.1): only the columns the state function
    # reads cross the shuffle + Arrow boundary (drops props and value).
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            ATTR_OUTPUT,
            ATTR_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def user_totals_snapshot(events_batch: DataFrame) -> DataFrame:
    """Per-user (n_events, total_cents, max_event_id) from a BATCH
    relation — the warm-start state for running_user_totals_tws's
    ``initial_totals``: backfill history once with a batch job, then
    let the stream continue from exactly that state (the standard
    lambda-collapse pattern for stateful streaming at scale — no
    replaying months of history through the stream path).

    Rounding: ``bround`` (half-to-even), NOT a decimal cast (HALF_UP) —
    the stream path's pandas ``.round()`` is banker's rounding, and a
    3-decimal midpoint value (1.125) would otherwise make warm start +
    deltas diverge from the one-shot batch by one cent."""
    return events_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.bround(F.col("value") * 100).cast("long")).alias(
            "total_cents"
        ),
        F.max("event_id").alias("max_event_id"),
    )


def running_user_totals_tws(
    events: DataFrame, initial_totals: DataFrame | None = None
) -> DataFrame:
    """``running_user_totals`` on Spark 4's transformWithState API — the
    supported successor of applyInPandasWithState for arbitrary per-key
    state machines. Same semantics, same output schema, stream==batch
    pinned by the same test.

    ``initial_totals`` (optional): a batch relation shaped like
    user_totals_snapshot's output, delivered through TWS's
    initial-state channel — handleInitialState seeds each user's
    ValueState in the FIRST micro-batch, so totals continue from the
    batch backfill instead of zero. Law test: warm start + streamed
    deltas equals one batch aggregation over history ∪ stream.

    Differences that matter at scale: typed state handles (here one
    ValueState of 3 longs per user) instead of a single opaque tuple,
    first-class timers/TTL for state eviction, and a state schema the
    engine can evolve — all on the RocksDB state store provider
    (required by the API; the right store for 100 TB state anyway:
    incremental checkpoints, spill-to-disk instead of executor-memory
    state).

    Environment gate: executing this operator needs a ``protobuf``
    Python runtime (Spark's TWS state-server protocol,
    pyspark/sql/streaming/proto). The pip package is absent in this
    container, but compat.ensure_protobuf() wires up the pure-Python
    runtime the host's google-cloud-sdk vendors, so since r9 the
    stream-equals-batch test EXECUTES here; on hosts with no runtime at
    all it still skips and the applyInPandasWithState twin above
    carries the tested contract. Plan construction works regardless."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", RUNNING_TOTALS_STATE)

        def handleInitialState(self, key, initialState, timerValues) -> None:
            r = initialState.iloc[0]
            self._state.update(
                (
                    int(r["n_events"]),
                    int(r["total_cents"]),
                    int(r["max_event_id"]),
                )
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents, max_id = (
                self._state.get() if self._state.exists() else (0, 0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                # NULL-safe like the applyInPandasWithState twin: a NaN
                # would raise in astype(int64) and kill the query
                vals = pdf["value"].dropna()
                cents += int(vals.mul(100).round().astype("int64").sum())
                if len(pdf):
                    max_id = max(max_id, int(pdf["event_id"].max()))
            self._state.update((n, cents, max_id))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                    "max_event_id": [max_id],
                }
            )

        def close(self) -> None:
            pass

    # r14 optimization (guide §4.1): project before the state shuffle —
    # the processor reads only event_id and value (see the APWS twin).
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=RUNNING_TOTALS_OUTPUT,
            outputMode="Update",
            timeMode="None",
            initialState=(
                None if initial_totals is None
                else initial_totals.groupBy("user_id")
            ),
        )
    )


TYPE_COUNTS_TWS_OUTPUT = "user_id long, event_type string, n long"


def user_event_type_counts_tws(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Per-user per-event-type running counts on a TWS MapState —
    completing the state-type triad (ValueState: running totals;
    ListState: open sessions; MapState: a keyed sub-aggregate whose
    KEY SET is data-driven). A MapState reads/writes only the touched
    sub-keys, so per-batch state I/O is O(types seen in the batch),
    not O(all types ever seen) — the property that matters when the
    sub-key domain is wide (page paths, SKUs) and RocksDB holds the
    long tail.

    ``ttl_ms`` engages the state-lifecycle feature the triad's other
    operators don't cover: per-state-variable PROCESSING-TIME TTL
    (Spark evicts a sub-key's value ttl_ms after its last write —
    expired reads return nothing, as if the key were never seen). TTL
    requires timeMode=ProcessingTime; with it the operator becomes a
    sliding "recent activity" counter whose state size is bounded by
    the eviction clock even when the user/type domain grows without
    bound — the knob that keeps RocksDB state from accumulating
    forever at 100 TB. Law (tests): with a TTL shorter than the
    inter-batch gap, every batch re-counts from zero, so the emitted
    n's per (user, type) SUM to the all-data batch count; without TTL
    the LAST emitted n equals it.

    Emits the updated (user, type, n) rows each micro-batch (update
    mode); the final row per (user, type) equals the batch
    groupBy(user_id, event_type).count() — the law test."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming import StatefulProcessor

    class TypeCounts(StatefulProcessor):
        def init(self, handle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n long", ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            batch: dict[str, int] = {}
            for pdf in rows:
                for t, c in pdf["event_type"].value_counts().items():
                    batch[t] = batch.get(t, 0) + int(c)
            out_t, out_n = [], []
            for t, c in batch.items():
                cur = (
                    self._counts.getValue((t,))
                    if self._counts.containsKey((t,))
                    else None
                )
                n = (cur[0] if cur is not None else 0) + c
                self._counts.updateValue((t,), (n,))
                out_t.append(t)
                out_n.append(n)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_t),
                    "event_type": out_t,
                    "n": out_n,
                }
            )

        def close(self) -> None:
            pass

    # r14 optimization (guide §4.1): the processor reads only
    # event_type — one string column crosses instead of the full row.
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TypeCounts(),
            outputStructType=TYPE_COUNTS_TWS_OUTPUT,
            outputMode="Update",
            # TTL state is clocked by processing time; without a TTL the
            # operator needs no clock at all
            timeMode="ProcessingTime" if ttl_ms is not None else "None",
        )
    )


SESSIONS_TWS_OUTPUT = (
    "user_id long, start_us long, end_us long, n_events long"
)
SESSION_GAP_US = 1_800_000_000  # 30 min, matching relational.sessionize_events


def session_state_snapshot(
    events_batch: DataFrame, boundary_us: int
) -> DataFrame:
    """Per-user OPEN-session warm-start state from BATCH event history
    — the lambda-collapse seed for user_sessions_tws (the fourth and
    final port of the handleInitialState channel; unlike the
    Croston/Markov/attribution scalars, session state is a LIST of
    open intervals). Batch-sessionize the history with the exact
    integer-microsecond gap fold (gap > SESSION_GAP_US starts a new
    session — identical to relational.sessionize_events and to the
    stream's _coalesce), then keep ONLY sessions still open at the
    split boundary: a session with last_us + gap <= boundary can
    never merge a tail event (every tail ts > boundary >= last + gap),
    so it is closed history and belongs to the batch half of the law;
    a session with last_us + gap > boundary may yet be extended or
    bridged and must ride into the stream as initial state. Emits
    (user_id, start_us, last_us, n)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("us")
    rows = events_batch.select("user_id", us.alias("us"))
    sess_id = F.sum(
        F.when(
            F.col("us") - F.lag("us").over(w) > SESSION_GAP_US, 1
        ).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        rows.select("user_id", "us", sess_id.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("last_us"),
            F.count("*").alias("n"),
        )
        .filter(F.col("last_us") + SESSION_GAP_US > F.lit(boundary_us))
        .select("user_id", "start_us", "last_us", "n")
    )


def user_sessions_tws(
    events: DataFrame,
    watermark: str = "2 hours",
    initial_sessions: DataFrame | None = None,
) -> DataFrame:
    """Gap-based sessionization on transformWithState EVENT-TIME TIMERS
    — the capability tier running_user_totals_tws doesn't touch: a
    session closes not when another event arrives but when the
    WATERMARK passes its last event + 30 min, so output latency is
    bounded by real time, not by the key's next activity (the
    difference that matters for an idle-user alerting pipeline).

    State per user is a ListState of (start_us, last_us, n) session
    triples — bounded by OPEN sessions, never raw events. Each input
    batch merges its event times into the triples (a new event can
    extend a session or BRIDGE two adjacent ones — the merge is a
    sorted interval coalesce, so out-of-order arrivals within the
    watermark land exactly); one timer per user tracks the earliest
    close candidate. handleExpiredTimer emits every session whose
    last + gap <= current watermark and re-arms for the rest.

    Law (tests): every emitted session is EXACTLY a batch session of
    relational.sessionize_events' integer-microsecond definition, and
    every batch session whose close point precedes the final watermark
    must have been emitted — the same emitted-subset + completeness
    pinning as the streaming as-of twin. Trailing sessions (close
    point after the last watermark) correctly stay open.

    Warm start: ``initial_sessions`` (session_state_snapshot output)
    seeds each user's OPEN history sessions via handleInitialState —
    which also ARMS their close timer, so a seeded session with no
    tail activity still closes when the watermark passes its close
    point (the list-state + timer variant of the Croston/Markov/
    attribution scalar ports; with it, every stateful op in the
    engine carries the lambda-collapse channel).

    Scale: state is O(open sessions per user), timers are one per
    user, and the only shuffle keys on user_id. RocksDB state store
    required (TWS API); timers and state evolve with the engine's
    state-schema support."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming import StatefulProcessor

    gap_us = SESSION_GAP_US

    class Sessionizer(StatefulProcessor):
        def init(self, handle) -> None:
            self._sessions = handle.getListState(
                "sessions", "start_us long, last_us long, n long"
            )
            self._handle = handle

        @staticmethod
        def _coalesce(sessions: list) -> list:
            sessions.sort()
            out: list = []
            for s in sessions:
                if out and s[0] - out[-1][1] <= gap_us:
                    out[-1] = [
                        out[-1][0], max(out[-1][1], s[1]), out[-1][2] + s[2]
                    ]
                else:
                    out.append(list(s))
            return out

        def _rearm(self, sessions: list) -> None:
            # materialize before mutating: listTimers() is a paginated
            # state-server iterator; deleting while iterating risks
            # skipped (never-deleted) timers and duplicate firings
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            if sessions:
                # +1 ms past the close point: the emit gate below is
                # STRICT (close < watermark), so the timer must fire at
                # a watermark that already satisfies it — an expiry at
                # the floor-divided boundary could fire while the gate
                # still holds the session open and churn every batch
                self._handle.registerTimer(
                    (min(s[1] for s in sessions) + gap_us) // 1000 + 1
                )

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # Seed the ListState with the history's open sessions AND
            # arm their close timer: a seeded session that receives no
            # tail events must still close when the watermark passes
            # its close point, which only a timer can trigger.
            cur = self._coalesce(
                [
                    [int(r.start_us), int(r.last_us), int(r.n)]
                    for r in initialState.itertuples()
                ]
            )
            if cur:
                self._sessions.appendList([tuple(c) for c in cur])
                self._rearm(cur)

        def handleInputRows(self, key, rows, timerValues):
            cur = [list(r) for r in self._sessions.get()]
            for pdf in rows:
                for t in (pdf["ts"].astype("int64") // 1000).tolist():
                    cur.append([t, t, 1])
            cur = self._coalesce(cur)
            self._sessions.clear()
            self._sessions.appendList([tuple(c) for c in cur])
            self._rearm(cur)
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # STRICT close gate in microseconds: an event with
            # ts == last + gap still MERGES in the batch definition
            # (sessionize_events starts a new session only when
            # gap > SESSION_GAP_US) and is not yet late when the
            # watermark equals that point (Spark drops only ts <
            # watermark) — emitting at <= would close one admissible
            # event too early and break the emitted==batch law. The
            # ms->us comparison also avoids the //1000 floor widening
            # the premature-close window by up to 999 us.
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            cur = [list(r) for r in self._sessions.get()]
            done = [c for c in cur if c[1] + gap_us < wm_us]
            keep = [c for c in cur if c[1] + gap_us >= wm_us]
            self._sessions.clear()
            if keep:
                self._sessions.appendList([tuple(c) for c in keep])
            self._rearm(keep)
            if done:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(done),
                        "start_us": [c[0] for c in done],
                        "end_us": [c[1] for c in done],
                        "n_events": [c[2] for c in done],
                    }
                )

        def close(self) -> None:
            pass

    # r14 optimization (guide §4.1): the sessionizer reads only ts; the
    # watermark column survives the projection, so event-time semantics
    # are unchanged while props/value/event_type stop crossing.
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Sessionizer(),
            outputStructType=SESSIONS_TWS_OUTPUT,
            outputMode="Append",
            timeMode="EventTime",
            initialState=(
                None
                if initial_sessions is None
                else initial_sessions.groupBy("user_id")
            ),
        )
    )


# --------------------------------------------------------------------------
# Continuous catalog ingest: meta stream -> snapshot store
# --------------------------------------------------------------------------

def stream_ingest_metas(
    spark: SparkSession,
    path: str,
    store,
    catalog: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Continuous ingest of the all.json meta stream into the snapshot
    store — the streaming generalization of the reference's pull-based
    conditional-GET refresh loop (S3, /root/reference/cache.go:37-93).

    Each arriving file is one full catalog dump (the reference's refresh
    unit). Per micro-batch: parse lines → derive envelope (T1) → dedup →
    publish as a NEW snapshot version keyed by the micro-batch epoch, then
    atomically flip the manifest — readers always see a complete catalog,
    and the checkpoint guarantees each dump is ingested exactly once
    (the If-Modified-Since analog: unchanged source ⇒ no new files ⇒ no
    batch ⇒ zero recompute).
    """
    from .ingest import parse_meta_lines, shred_metas

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )

    def publish_batch(batch_df: DataFrame, epoch_id: int) -> None:
        metas = shred_metas(parse_meta_lines(batch_df))
        if metas.isEmpty():
            return
        store.publish(metas, catalog, version=f"stream-{epoch_id:09d}")

    writer = (
        raw.writeStream.foreachBatch(publish_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


BUS_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_bus_stream(
    spark: SparkSession, source: str = "socket", options: dict | None = None
) -> DataFrame:
    """Message-bus (Kafka-shaped) source: one MESSAGE per record,
    normalized to ``(value string, ingest_ts timestamp)`` — the unit of
    arrival is a record, not a file, unlike every file source above.

    On a real cluster this is ``source="kafka"`` (external broker +
    connector jar): Spark's kafka rows map 1:1 through the same select
    (``CAST(value AS STRING)``, broker timestamp). This container has
    no broker, so the wire-compatible stand-ins are the built-in
    ``socket`` source (TCP lines ≙ consumed topic records — drives the
    stream==batch law in tests) and ``rate`` (synthetic monotonic
    messages for soak/backpressure checks). Downstream operators are
    source-agnostic: everything taking the events stream works
    unchanged on ``parse_bus_events`` of ANY of the three, which is the
    point — the streaming tier is not file-source-bound.

    Scale note: socket is single-connection (dev harness); kafka and
    file sources are the partitioned production paths — one Spark
    partition per topic partition, offsets in the checkpoint.

    DELIVERY SEMANTICS differ by source and are part of the contract:
    kafka and file sources are REPLAYABLE — their offsets live in the
    checkpoint, so a restarted query re-serves any uncommitted range
    and the pipeline stays exactly-once end-to-end (with an idempotent
    or transactional sink). The socket source is AT-MOST-ONCE: TCP has
    no offsets, so records consumed but not yet committed when the
    query stops are LOST on restart — acceptable for the dev harness,
    never for production ingest. ``rate`` is deterministic-by-time and
    replays like kafka. tests/test_streaming.py pins the difference:
    the file-source path re-serves from its checkpoint after a restart
    while socket cannot.
    """
    opts = dict(options or {})
    if source == "kafka":
        raw = spark.readStream.format("kafka").options(**opts).load()
        return normalize_kafka_records(raw)
    if source == "socket":
        raw = spark.readStream.format("socket").options(**opts).load()
        return raw.select(
            F.col("value").alias("value"),
            F.current_timestamp().alias("ingest_ts"),
        )
    if source == "rate":
        raw = spark.readStream.format("rate").options(**opts).load()
        return raw.select(
            F.col("value").cast("string").alias("value"),
            F.col("timestamp").alias("ingest_ts"),
        )
    raise ValueError(f"unknown bus source {source!r} (kafka|socket|rate)")


def normalize_kafka_records(raw: DataFrame) -> DataFrame:
    """Map Spark's fixed kafka-source schema — (key binary, value
    binary, topic, partition, offset, timestamp, timestampType) — onto
    the normalized bus surface (value string, ingest_ts timestamp):
    payload bytes decode as UTF-8 (CAST binary→string), the broker
    timestamp carries through as ingest_ts.

    Factored out of read_bus_stream so the mapping is TESTABLE without
    a broker: the container has no kafka connector jar, but the select
    is schema-driven, so applying it to a batch DataFrame with the
    connector's exact schema exercises the same expressions the stream
    would run (test_streaming.py). Only the wire/offset semantics
    still need a real broker (documented in read_bus_stream)."""
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("ingest_ts"),
    )


def parse_bus_events(bus: DataFrame) -> DataFrame:
    """JSON event-per-message decode for a bus stream: event TIME comes
    from the payload (``ts``), never from ``ingest_ts`` — watermarks
    must track the domain clock or a broker replay re-dates history.
    Malformed messages surface as all-null rows (from_json PERMISSIVE)
    and are dropped by the event_id guard rather than killing the query
    — the poison-pill policy a bus consumer needs (a file source can
    quarantine a bad file; a bus offset must be consumed regardless)."""
    j = F.from_json("value", BUS_EVENT_SCHEMA)
    return (
        bus.select(j.alias("j"))
        .select("j.*")
        .filter(F.col("event_id").isNotNull())
    )


def run_until(
    stream_df: DataFrame,
    query_name: str,
    done,
    timeout_s: float = 120.0,
    poll_s: float = 0.5,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive an UNBOUNDED-source stream (socket/rate — no availableNow
    support) into a memory sink until ``done(materialized_df)`` returns
    True, then stop and return the materialized result. The bus-source
    sibling of run_to_completion's bounded-file drive."""
    import time as _time

    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        deadline = _time.monotonic() + timeout_s
        while _time.monotonic() < deadline:
            if not q.isActive:
                # The query stopped — failed OR terminated cleanly. Either
                # way no more data is coming, so polling out the rest of
                # the deadline can only waste it: re-check done() once
                # (the final micro-batch may have satisfied it), then
                # surface the real failure if there is one, else time out
                # immediately.
                if done(spark.table(query_name)):
                    break
                if q.exception() is not None:
                    raise q.exception()
                raise TimeoutError(
                    f"{query_name}: query terminated before done() was satisfied"
                )
            if done(spark.table(query_name)):
                break
            _time.sleep(poll_s)
        else:
            if q.exception() is not None:
                raise q.exception()
            raise TimeoutError(
                f"{query_name}: done() not satisfied within {timeout_s}s"
            )
        return spark.table(query_name)
    finally:
        q.stop()


def write_stream_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Native checkpointed parquet file sink, driven to completion of
    currently-available input (availableNow).

    The file sink's transaction log plus the source checkpoint give
    END-TO-END exactly-once for file→file pipelines without foreachBatch:
    a restart with the same checkpoint resumes after the last committed
    batch (already-processed source files are never re-emitted), and a
    crash mid-batch leaves uncommitted output files invisible to readers
    of the sink's _spark_metadata log. At scale this is the bronze-layer
    landing pattern: partition-local appends, no shuffle, no driver
    state beyond the offsets. File sinks support append mode only, so
    this takes non-aggregating streams (ingest normalization, dedup,
    enrichment) — aggregations land via foreachBatch (see
    stream_ingest_metas).
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


# --------------------------------------------------------------------------
# Stream-stream join: purchases joined to same-user signups within 24 h
# --------------------------------------------------------------------------

def signup_purchase_join(
    events: DataFrame, watermark: str = "2 hours", how: str = "inner"
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of the batch
    range_join_purchase_after_signup (relational.py).

    Both sides carry the user_id equi-key plus a bounded time condition;
    the watermark + interval bound lets Spark evict join state once a
    row can no longer match (state is bounded by
    watermark + 24 h per side — without the time bound a stream-stream
    join would buffer forever).

    ``how='left_outer'`` / ``'full_outer'`` are the watermarked outer
    joins: an unmatched row is emitted with NULLs on the other side once
    the watermark passes its join window and its state is evicted — the
    standard "emit unmatched after watermark" pattern. Rows whose window
    is still open when a bounded stream ends stay withheld (same reason
    aggregate tests use complete mode); the stream-equals-batch tests
    bound completeness by the final watermark.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream join type {how!r}")
    s = (
        events.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_event"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = s.join(
        p,
        (s.user_id == p.p_user)
        & (p.p_ts > s.s_ts)
        & (p.p_ts <= s.s_ts + F.expr("INTERVAL 24 HOURS")),
        how,
    )
    if how == "inner":
        return joined.select(
            "user_id", "signup_event", "purchase_event", "purchase_value"
        )
    # Outer rows keep their join key from WHICHEVER side is present: a
    # watermark-evicted unmatched purchase knows its user (p_user) even
    # though the signup side is NULL — dropping it would make the row
    # unattributable (ADVICE r3). Both event times are carried so callers
    # can tell which unmatched rows' join windows had closed.
    return joined.select(
        F.coalesce(s.user_id, p.p_user).alias("user_id"),
        "signup_event",
        "s_ts",
        "purchase_event",
        "p_ts",
        "purchase_value",
    )


def enrich_events(
    events: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Stream-static enrichment join (streaming twin of
    relational.events_user_enriched_stats): the unbounded event stream
    picks up its user's nation from STATIC dimension tables, then
    aggregates per (nation, event_type).

    Stream-static joins need no watermark on the static side — the dim
    is re-read per micro-batch (so slowly-changing dims are picked up)
    and broadcast, keeping the join stateless and map-side: the 100 TB
    firehose shape. Only the final small aggregation keeps state."""
    dims = F.broadcast(
        customer.join(
            nation, customer.c_nationkey == nation.n_nationkey
        ).select(
            F.col("c_custkey").alias("user_id"),
            F.col("n_name").alias("nation"),
        )
    )
    return (
        events.join(dims, "user_id")
        .groupBy("nation", "event_type")
        .agg(
            F.count("*").alias("n"),
            _dec_sum("value").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# The replay-idempotent foreachBatch sink contract (shared by every
# parquet-writing sink in this module)
# --------------------------------------------------------------------------

def checkpoint_run_id(checkpoint: str) -> str:
    """Stable 8-hex identity of a stream's checkpoint location, used to
    RUN-SCOPE monotone epoch tags (``r<runid>-e<epoch>``). foreachBatch
    epoch ids are monotone only within one checkpoint: a stream
    restarted against a fresh checkpoint dir — or a second writer
    stream — legitimately starts back at epoch 0, and an unscoped
    numeric-older guard would silently drop those early folds (ADVICE
    r12, MaterializedView._already_applied). Hashing the CANONICALIZED
    checkpoint location gives each checkpoint lineage its own monotone
    namespace while staying stable across crash-restarts of the SAME
    checkpoint (where epoch ids genuinely continue and the numeric
    guard must keep working) — canonicalized, not the literal
    spelling: a local path ('/data/ck', 'file:///data/ck', a relative
    form, a symlink) resolves through realpath before hashing, because
    a restart that merely re-spells the same checkpoint dir must NOT
    mint a new run id (that would defeat the crash-replay guard and
    double-fold the replayed epoch). Remote URIs (s3a://, hdfs://)
    hash their normalized string — object stores have no symlinks and
    one logical location is one spelling in practice. Documented
    residual: wiping a checkpoint dir's CONTENTS in place reuses the
    path, hence the run id — use a fresh dir for a fresh run."""
    import hashlib
    import os
    import posixpath
    from urllib.parse import urlparse

    raw = str(checkpoint)
    parsed = urlparse(raw)
    if parsed.scheme in ("", "file"):
        path = parsed.path if parsed.scheme == "file" else raw
        norm = os.path.realpath(path)
    else:
        norm = (
            f"{parsed.scheme}://{parsed.netloc}"
            f"{posixpath.normpath(parsed.path).rstrip('/') or '/'}"
        )
    return hashlib.sha256(norm.encode("utf-8")).hexdigest()[:8]


def write_epoch_partition(
    df: DataFrame, epoch_id: int, path: str, single_file: bool = False
) -> None:
    """Land one micro-batch's output replay-idempotently: stamp the rows
    with their own ``_epoch=<id>`` hive partition and write via DYNAMIC
    partition overwrite, so an at-least-once foreachBatch retry REPLACES
    that epoch's output instead of appending a second copy (a duplicated
    epoch double-counts in any downstream SUM). This is the ONLY way a
    sink in this module may write parquet from foreachBatch — new sinks
    route through here so append-mode can't ship by default again
    (three sinks did exactly that before r11's e839add).

    ``_epoch`` is a SEPARATE dir-key column (always stamped here, never
    caller-supplied — withColumn replaces any existing one) so a plain
    ``epoch_id`` LONG data column survives as data for consumers: a
    partition column would read back as an inferred INT. ``single_file``
    coalesces bounded driver-built metrics rows into one file per epoch;
    leave it False for data-sized output like the dedup survivors."""
    out = df.withColumn("_epoch", F.lit(int(epoch_id)))
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch")
        .parquet(path)
    )


# --------------------------------------------------------------------------
# Streaming incremental dedup: online exact-dedup against a persistent
# hash index (the ingestion-time dedup of a continuously-fed corpus)
# --------------------------------------------------------------------------

def stream_dedup_ingest(
    spark: SparkSession,
    path: str,
    out_dir: str,
    index_dir: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Continuously ingest parquet document files, keeping only documents
    whose (normalized-text) content hash was never seen before — across
    batches AND across restarts.

    Per micro-batch (foreachBatch — the streaming side of X1 dedup):
    1. hash each document's normalized text (sha2-256, content address);
    2. dedup within the batch (min doc_id per hash — the survivor rule);
    3. anti-join against the persistent seen-hash index;
    4. append survivors to ``out_dir`` and their hashes to ``index_dir``.

    At 100 TB the index is the big side: the anti-join shuffles only the
    incoming batch against it (sort-merge on the hash), never rewrites
    it, and writes stay partition-local. Replay idempotence
    (foreachBatch is at-least-once): BOTH sinks land via dynamic
    partition overwrite of the batch's own ``_epoch=N`` partition, so a
    crash-and-replay REPLACES that epoch's output instead of appending
    a second copy — out_dir is written BEFORE the index on purpose (if
    the order were flipped, a crash between the two would leave the
    hashes indexed but the documents unwritten, and the replay's
    anti-join would silently drop them). The index presence probe goes
    through Spark, not the local filesystem, so an s3://... index_dir
    dedups correctly instead of silently treating every batch as the
    first.

    Streaming twin of ``llmops.dedup.dedup_exact_docs`` (same normalize +
    survivor semantics; cross-validated in tests/test_streaming.py).
    """
    from .llmops.dedup import normalized_text

    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )

    def dedup_batch(batch_df: DataFrame, epoch_id: int) -> None:
        hashed = batch_df.withColumn(
            "content_hash", F.sha2(normalized_text("text"), 256)
        )
        w = W.partitionBy("content_hash").orderBy("doc_id")
        batch_unique = (
            hashed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        from pyspark.errors import AnalysisException

        sess = batch_unique.sparkSession
        try:
            # scheme-agnostic probe (local, HDFS, s3a): an absent or
            # empty index reads as "no index yet"; os.path.isdir would
            # be False forever on a remote store and silently disable
            # cross-batch dedup
            seen = sess.read.parquet(index_dir).select("content_hash")
            novel = batch_unique.join(seen, "content_hash", "left_anti")
        except AnalysisException:
            novel = batch_unique
        # Materialize once: novel feeds both sinks and reading the index
        # we are about to overwrite into must happen before the write.
        novel = novel.persist()
        try:
            write_epoch_partition(
                novel.drop("content_hash"), epoch_id, out_dir
            )
            write_epoch_partition(
                novel.select("content_hash"), epoch_id, index_dir
            )
        finally:
            novel.unpersist()

    writer = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dq_monitor(
    spark: SparkSession,
    path: str,
    metrics_dir: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Streaming data-quality monitor over the events stream: per
    micro-batch, evaluate the ingest-gate rules (null keys, domain
    violations, timestamp bounds) and land one row per rule per batch
    in a parquet metrics table — the observability half of the batch
    ``dq_violations_report`` (relational.py), aggregated incrementally
    instead of rescanned. Replay-idempotent like the cusum/quantile
    monitors: each epoch's rows overwrite their own ``_epoch=N``
    partition, so an at-least-once foreachBatch retry replaces rather
    than duplicates (a duplicated epoch would double-count in any
    alerting SUM downstream).

    Each batch's rule evaluation is a handful of single-column counts
    (map-side partial aggregation over only that batch); the metrics
    table grows by n_rules rows per batch regardless of data volume, so
    the monitor's own storage is O(batches), not O(events). Downstream,
    alerting is a plain batch query over metrics_dir; a pipeline can
    also gate each batch's promotion the way store.publish(gate=...)
    gates snapshots.
    """
    stream = read_events_stream(spark, path)

    def audit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        counts = batch_df.agg(
            F.count("*").alias("n_rows"),
            F.count(F.when(F.col("event_id").isNull(), 1)).alias("null_pk"),
            F.count(F.when(F.col("ts").isNull(), 1)).alias("null_ts"),
            F.count(F.when(F.col("value") < 0, 1)).alias("negative_value"),
            F.count(
                F.when(~F.col("event_type").isin("view", "click", "purchase", "signup"), 1)
            ).alias("unknown_event_type"),
        ).collect()[0]  # bounded: ONE aggregated row per micro-batch
        rows = [
            (int(epoch_id), rule, int(counts[rule]), int(counts["n_rows"]))
            for rule in ("null_pk", "null_ts", "negative_value", "unknown_event_type")
        ]
        write_epoch_partition(
            batch_df.sparkSession.createDataFrame(
                rows,
                "epoch_id long, rule string, n_violations long, "
                "batch_rows long",
            ),
            epoch_id,
            metrics_dir,
            single_file=True,
        )

    _require_partitioned_metrics_dir(metrics_dir, "stream_dq_monitor")
    writer = (
        stream.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_refresh_mv(
    spark: SparkSession,
    path: str,
    mv,
    checkpoint: str,
    schema=None,
    trigger_available_now: bool = True,
):
    """Streaming materialized-view maintenance: fold each arriving
    micro-batch of fact rows into a ``store.MaterializedView`` —
    aggregate the delta, merge with current partial state, publish a new
    atomic snapshot version (readers of the view never see a half-merged
    refresh). Exactly-once across restarts is the checkpoint PLUS the
    epoch tag: foreachBatch replays the last uncommitted epoch after a
    crash, and a replayed fold whose tag already rides in the CURRENT
    version is skipped (the tag flips atomically with the data in
    _CURRENT), so a crash between publish and checkpoint-commit cannot
    double-count the delta.

    This is the streaming twin of MaterializedView.refresh: per batch
    the work is O(|batch| + |groups|) — the base table is NEVER
    rescanned, so a view over a 100 TB fact stream refreshes at the
    arrival rate of the deltas. Late/duplicate file delivery is handled
    by the file-source checkpoint (a re-delivered file is not re-read),
    matching the append-only contract mv_merge requires."""
    reader = spark.readStream.format("parquet").option("maxFilesPerTrigger", 1)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.schema(spark.read.parquet(path).schema)
    raw = reader.load(path)
    run_id = checkpoint_run_id(checkpoint)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        mv.refresh(batch_df, epoch_tag=f"r{run_id}-e{int(epoch_id):012d}")

    writer = (
        raw.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _require_partitioned_metrics_dir(metrics_dir: str, who: str) -> None:
    """Fail fast when ``metrics_dir`` holds a FLAT (pre-r9 append-mode)
    metrics sink: the monitors now write hive-partitioned ``_epoch=N``
    dirs via dynamic partition overwrite, and pointing the new layout at
    a dir of flat parquet files silently mixes two incompatible layouts
    a reader would double-count (ADVICE r9). A dir qualifies as legacy
    iff it has top-level ``*.parquet`` data files and no ``_epoch=``
    subdirectory."""
    import os

    try:
        names = os.listdir(metrics_dir)
    except (FileNotFoundError, NotADirectoryError):
        return  # fresh sink — the writer creates it
    has_epoch_dirs = any(n.startswith("_epoch=") for n in names)
    flat_parquet = [
        n for n in names if n.endswith(".parquet") and not n.startswith("_")
    ]
    if flat_parquet and not has_epoch_dirs:
        raise ValueError(
            f"{who}: metrics_dir {metrics_dir!r} contains a flat parquet "
            f"layout ({flat_parquet[:3]}...); this monitor writes "
            "hive-partitioned _epoch=N dirs — point it at a fresh "
            "metrics_dir instead of mixing layouts"
        )


def stream_cusum_monitor(
    spark: SparkSession,
    path: str,
    reference: DataFrame,
    metrics_dir: str,
    checkpoint: str,
    value_col: str = "value",
    trigger_available_now: bool = True,
):
    """Streaming level-shift monitor: the live twin of the batch CUSUM
    changepoint (relational.changepoint_cusum_daily_revenue). Each
    micro-batch appends ONE row (epoch_id, batch_rows, batch_sum_cents,
    dev_cents) where dev_cents = batch_sum_cents - batch_rows *
    ref_mean_cents — the batch's exact integer-cent deviation from the
    frozen reference level. The monitor itself is STATELESS per batch
    (restart-safe with no state store): the running CUSUM is an
    associative SUM(dev_cents) over the metrics sink, so an alert query
    is `SUM(dev_cents) OVER (ORDER BY epoch_id)` against a threshold —
    the cumulative deviation is exact no matter how batches were cut
    or replayed. Replay is IDEMPOTENT at the sink, not at the reader:
    each epoch's row lands via dynamic partition overwrite of its own
    epoch_id=N partition, so a failure-retried micro-batch replaces its
    row instead of appending a duplicate — SUM(dev_cents) needs no
    epoch dedup.

    Exactness: the reference level reduces ONCE to integer
    (sum_cents, rows) — ref_mean never materializes as a float;
    dev_cents multiplies through by the reference ROW COUNT the same
    way the batch changepoint multiplies by N, so every stored number
    is an exact integer: dev_cents = ref_rows * batch_sum_cents -
    batch_rows * ref_sum_cents, i.e. the deviation scaled by
    ref_rows. Dividing by ref_rows*100 recovers currency units.

    Scale: one map-side global aggregate per micro-batch (two columns),
    one appended row per epoch — monitor output is O(batches)
    regardless of stream volume."""
    ref = reference.agg(
        F.sum((F.col(value_col).cast("decimal(12,2)") * 100).cast("decimal(38,0)"))
        .alias("sum_cents"),
        F.count(value_col).alias("rows"),  # non-null rows: the level's basis
    ).collect()[0]  # bounded: ONE row, two scalars
    if ref.sum_cents is None:
        raise ValueError(
            f"stream_cusum_monitor: reference has no non-null {value_col!r} "
            "rows — a level monitor needs a reference level"
        )
    ref_sum_cents, ref_rows = int(ref.sum_cents), int(ref.rows)

    _require_partitioned_metrics_dir(metrics_dir, "stream_cusum_monitor")
    stream = read_events_stream(spark, path)

    def audit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        row = batch_df.agg(
            F.sum(
                (F.col(value_col).cast("decimal(12,2)") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("s"),
            F.count(value_col).alias("n"),  # non-null rows only — an
            # all-NULL batch has no level evidence (sum would be NULL)
        ).collect()[0]  # bounded: one aggregated row per micro-batch
        n = int(row.n)
        if n == 0 or row.s is None:
            return
        from decimal import Decimal

        s = int(row.s)
        dev = ref_rows * s - n * ref_sum_cents
        # Layout note: this sink is hive-partitioned (see
        # write_epoch_partition for the replay-idempotence contract) —
        # point the monitor at a fresh metrics_dir, never a dir
        # holding flat pre-r9 appends.
        write_epoch_partition(
            batch_df.sparkSession.createDataFrame(
                [(int(epoch_id), n, Decimal(s), Decimal(dev))],
                "epoch_id long, batch_rows long, "
                "batch_sum_cents decimal(38,0), dev_cents decimal(38,0)",
            ),
            epoch_id,
            metrics_dir,
            single_file=True,
        )

    writer = (
        stream.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quantile_monitor(
    spark: SparkSession,
    path: str,
    metrics_dir: str,
    checkpoint: str,
    value_col: str = "value",
    trigger_available_now: bool = True,
):
    """Streaming quantile monitor: the live twin of the MV tier's KLL
    quantile partials (store.mv_partials quantiles=, r9) and the third
    monitor beside CUSUM (level) and PSI (distribution vs reference).
    Each micro-batch appends ONE row (epoch_id, batch_rows, kll) where
    ``kll`` is the Datasketches KLL sketch of the batch's ``value_col``
    — so ANY downstream window of the metrics sink reconstructs
    percentiles over exactly that span with one kll_merge_agg_double:
    whole-stream p99, last-24-epochs p50, epoch-over-epoch drift, all
    without re-reading stream data.

    Semantics: the monitor is STATELESS per batch (restart-safe with no
    state store); the sketch's row count (kll_sketch_get_n) composes
    EXACTLY through merges while quantiles carry KLL's ~1.65%
    normalized-rank-error contract (k=200). Replay is idempotent at the
    sink — dynamic partition overwrite of the epoch_id partition, the
    same contract as stream_cusum_monitor.

    Scale: one map-side-combinable aggregation per micro-batch, one
    sketch row per epoch — monitor output is O(batches * sketch_bytes)
    regardless of stream volume."""
    _require_partitioned_metrics_dir(metrics_dir, "stream_quantile_monitor")
    stream = read_events_stream(spark, path)

    def audit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        row = batch_df.agg(
            F.kll_sketch_agg_double(
                F.col(value_col).cast("double")
            ).alias("kll"),
            F.count(value_col).alias("n"),  # non-null rows only
        ).collect()[0]  # bounded: one aggregated row per micro-batch
        if int(row.n) == 0:
            return
        write_epoch_partition(
            batch_df.sparkSession.createDataFrame(
                [(int(epoch_id), int(row.n), bytes(row.kll))],
                "epoch_id long, batch_rows long, kll binary",
            ),
            epoch_id,
            metrics_dir,
            single_file=True,
        )

    writer = (
        stream.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_psi_monitor(
    spark: SparkSession,
    path: str,
    reference: DataFrame,
    metrics_dir: str,
    checkpoint: str,
    value_col: str = "value",
    n_bins: int = 10,
    trigger_available_now: bool = True,
):
    """Streaming distribution-drift monitor: per micro-batch, bin the
    batch's ``value_col`` on a grid anchored to the REFERENCE
    distribution's min/max and land (epoch_id, bin, n_batch, p_ref,
    psi_batch) rows via per-epoch dynamic partition overwrite
    (replay-idempotent) — the population-stability-index gate
    (relational.psi_totalprice_drift) run incrementally against a
    frozen training-time reference instead of rescanned.

    The reference reduces ONCE at start to n_bins proportions plus two
    scalars (a bounded collect); each micro-batch contributes one
    n_bins-row aggregate (map-side partials over that batch only), so
    monitor state and output are O(batches * n_bins) regardless of
    stream volume. Laplace smoothing ((c+1)/(n+bins)) matches the batch
    PSI query, keeping empty bins defined. A pipeline alerts on
    psi_batch > 0.2 (the conventional "significant shift" line) with a
    plain batch query over metrics_dir."""
    x = F.col(value_col).cast("double")
    mm = reference.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).collect()[0]
    if mm.lo is None:
        raise ValueError(
            f"stream_psi_monitor: reference has no non-null {value_col!r} "
            "rows — a drift monitor needs a reference distribution"
        )
    lo, hi = float(mm.lo), float(mm.hi)
    if hi == lo:
        raise ValueError(
            f"stream_psi_monitor: reference {value_col!r} is constant "
            f"({lo!r}) — a zero-width bin grid cannot measure drift"
        )
    width = (hi - lo) / float(n_bins)

    def bin_of(col):
        return F.least(
            F.greatest(F.floor((col - F.lit(lo)) / F.lit(width)).cast("int"),
                       F.lit(0)),
            F.lit(n_bins - 1),
        )

    ref_rows = (
        reference.select(bin_of(x).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("c"))
        .collect()  # bounded: <= n_bins rows
    )
    ref_counts = {int(r.bin): int(r.c) for r in ref_rows}
    n_ref = sum(ref_counts.values())
    p_ref = [
        (ref_counts.get(b, 0) + 1.0) / (n_ref + n_bins) for b in range(n_bins)
    ]

    _require_partitioned_metrics_dir(metrics_dir, "stream_psi_monitor")
    stream = read_events_stream(spark, path)

    def audit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        import math

        rows = (
            batch_df.select(bin_of(F.col(value_col).cast("double")).alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias("c"))
            .collect()  # bounded: <= n_bins rows per micro-batch
        )
        counts = {int(r.bin): int(r.c) for r in rows}
        n = sum(counts.values())
        if n == 0:
            return
        q = [(counts.get(b, 0) + 1.0) / (n + n_bins) for b in range(n_bins)]
        psi = sum(
            (q[b] - p_ref[b]) * math.log(q[b] / p_ref[b])
            for b in range(n_bins)
        )
        out = [
            (int(epoch_id), b, counts.get(b, 0), p_ref[b], psi)
            for b in range(n_bins)
        ]
        write_epoch_partition(
            batch_df.sparkSession.createDataFrame(
                out,
                "epoch_id long, bin int, n_batch long, p_ref double, "
                "psi_batch double",
            ),
            epoch_id,
            metrics_dir,
            single_file=True,
        )

    writer = (
        stream.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# Stream-stream AS-OF enrichment (round 8, VERDICT r7 item 8): the
# streaming twin of relational.asof_join_bounded_lookback
# --------------------------------------------------------------------------


def _asof_sides(events: DataFrame, watermark: str, with_values: bool):
    """(views, purchases) watermarked sides shared by both as-of
    enrichment variants — one place owns the column contract
    (view_event/purchase_event names, v_user_id disambiguation) and
    the watermark tagging, so the backward and nearest twins cannot
    drift apart (r8 review item 4)."""
    vcols = [
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event"),
    ]
    pcols = [
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event"),
    ]
    if with_values:
        vcols.append(F.col("value").alias("view_value"))
        pcols.append(F.col("value").alias("purchase_value"))
    views = (
        events.filter(F.col("event_type") == "view")
        .select(*vcols)
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(*pcols)
        .withWatermark("purchase_ts", watermark)
    )
    return views, purchases


def asof_enrich_join(
    events: DataFrame,
    lookback: str = "24 hours",
    watermark: str = "2 hours",
    finalize_window: str = "1 hour",
) -> DataFrame:
    """Each purchase enriched with the same user's LATEST view within
    the trailing ``lookback`` — the stream-stream as-of join Spark has
    no built-in for, composed from two chained stateful operators:

    1. a watermarked INNER interval join (view_ts in
       [purchase_ts - lookback, purchase_ts]) producing every candidate
       (purchase, view) pair — the bounded lookback is what lets Spark
       evict view state once the watermark passes (an UNBOUNDED as-of
       would need the full view history in state forever, which is why
       the batch twin only becomes streamable with the horizon);
    2. an append-mode windowed aggregation reducing candidates to the
       single latest view per purchase via ``max_by`` over the
       (view_ts, view_event) struct — the same tie rule as the batch
       twin (latest ts, then highest event_id). Grouping includes a
       ``finalize_window`` tumbling window on purchase_ts because
       append-mode aggregation finalizes groups by watermark passing
       the window end; each purchase belongs to exactly one window, so
       the window column is bookkeeping, not semantics.

    Late views within the watermark still join to an already-seen
    purchase and land in the SAME purchase group before it finalizes —
    per-micro-batch reduction (foreachBatch max_by) would get this
    wrong, which is why the reduction is a stateful operator downstream
    of the join, not sink-side. Emits only matched, finalized
    purchases; tests/test_streaming.py pins emitted == the batch twin's
    matched rows plus a watermark-derived completeness bound.

    Scale: both states are evictable (join state bounded by
    watermark + lookback per side, agg state by watermark +
    finalize_window); the shuffles key on user_id and purchase_event —
    no global state, no SinglePartition.
    """
    views, purchases = _asof_sides(events, watermark, with_values=True)
    pairs = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")
        ),
        "inner",
    )
    # purchase_ts is watermark-tagged after the join; grouping on it
    # directly would put TWO event-time columns under the aggregation
    # (the window + the raw column), which Spark rejects. Carry it
    # through the keys as detagged integer micros and rebuild the
    # timestamp on the way out — the window column alone drives
    # finalization.
    best = (
        pairs.groupBy(
            F.window("purchase_ts", finalize_window).alias("_w"),
            "purchase_event",
            "user_id",
            F.unix_micros("purchase_ts").alias("_p_us"),
            "purchase_value",
        )
        .agg(
            F.max_by(
                F.struct("view_event", "view_ts", "view_value"),
                F.struct("view_ts", "view_event"),
            ).alias("best")
        )
    )
    return best.select(
        "purchase_event",
        "user_id",
        F.timestamp_micros(F.col("_p_us")).alias("purchase_ts"),
        "purchase_value",
        F.col("best.view_event").alias("view_event"),
        F.col("best.view_ts").alias("view_ts"),
        F.col("best.view_value").alias("view_value"),
    )


def asof_nearest_enrich_join(
    events: DataFrame,
    horizon: str = "24 hours",
    watermark: str = "2 hours",
    finalize_window: str = "1 hour",
) -> DataFrame:
    """NEAREST-direction stream-stream as-of: each purchase enriched
    with the same user's closest view in EITHER time direction within
    ±``horizon`` — the streaming twin of the batch
    relational.asof_join_nearest_view restricted to the horizon (the
    restriction is what bounds join state; the batch form's unbounded
    forward search would mean never-finalizable state).

    Same chained-stateful shape as asof_enrich_join, with a symmetric
    interval (|view_ts − purchase_ts| ≤ horizon) and a ``min_by`` over
    the ordering struct (gap_us, direction-flag, side-tie): backward
    wins equal gaps, equal-timestamp views count as backward, and ties
    within a side resolve exactly as the batch carry passes do —
    backward to the HIGHEST view event id (negated in the tie key),
    forward to the LOWEST. Because the batch nearest is the global
    minimum gap, the law is clean: streaming output == batch output
    filtered to gap_us ≤ horizon (pinned in tests/test_streaming.py).

    Forward matches mean a purchase cannot finalize until the
    watermark clears purchase_ts + horizon; Spark's cross-operator
    watermark propagation delays the downstream window finalization by
    the join's state retention, so no forward candidate is missed —
    the stream==batch test would catch a premature finalize.
    """
    views, purchases = _asof_sides(events, watermark, with_values=False)
    h = F.expr(f"INTERVAL {horizon}")
    pairs = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("purchase_ts") - h)
        & (F.col("view_ts") <= F.col("purchase_ts") + h),
        "inner",
    )
    gap = F.abs(
        F.unix_micros("view_ts") - F.unix_micros("purchase_ts")
    ).alias("gap_us")
    backward = F.col("view_ts") <= F.col("purchase_ts")
    dirflag = F.when(backward, F.lit(0)).otherwise(F.lit(1))
    tie = F.when(backward, -F.col("view_event")).otherwise(F.col("view_event"))
    best = (
        pairs.select(
            "*",
            gap,
            dirflag.alias("dirflag"),
            tie.alias("tie"),
        )
        .groupBy(
            F.window("purchase_ts", finalize_window).alias("_w"),
            "purchase_event",
            "user_id",
            F.unix_micros("purchase_ts").alias("_p_us"),
        )
        .agg(
            F.min_by(
                F.struct("view_event", "gap_us", "dirflag"),
                F.struct("gap_us", "dirflag", "tie"),
            ).alias("best")
        )
    )
    return best.select(
        "purchase_event",
        "user_id",
        F.col("best.view_event").alias("nearest_view_event"),
        F.when(F.col("best.dirflag") == 0, "backward")
        .otherwise("forward")
        .alias("direction"),
        F.col("best.gap_us").alias("gap_us"),
    )


def scd2_enrich_stream(
    facts: DataFrame,
    scd2_dim: DataFrame,
    fact_key: str = "o_custkey",
    dim_key: str = "c_custkey",
    as_of_col: str = "as_of",
) -> DataFrame:
    """Stream-static SCD2 point-in-time enrichment: each streaming fact
    resolves against the customer version valid AT its as-of date —
    the streaming twin of relational.scd2_point_in_time_join's join
    stage (tests pin stream == batch on the same aggregation).

    The dimension side is a STATIC SCD2 history (scd2_merge output):
    Spark re-plans the join per micro-batch, so the equality key drives
    an ordinary hash join with the validity-interval bounds as residual
    filters — stateless, no watermark, the same plan shape as batch.
    At scale the static side is the snapshot-store read of the
    dimension's current SCD2 table; swapping in a fresher snapshot
    between restarts is the standard slowly-changing-enrichment
    deployment (exactly the reference's refresh-then-serve loop, done
    relationally)."""
    return facts.join(
        scd2_dim,
        (facts[fact_key] == scd2_dim[dim_key])
        & (facts[as_of_col] >= scd2_dim["valid_from"])
        & (facts[as_of_col] < scd2_dim["valid_to"]),
    )


# --------------------------------------------------------------------------
# Streaming Croston: per-part intermittent-demand state maintained
# across micro-batches — the streaming twin of the batch
# forecast_croston_intermittent query (VERDICT r12 item 4).
# --------------------------------------------------------------------------

CROSTON_OUTPUT = (
    "partkey long, n_demands long, z_hat double, p_hat double, "
    "croston_fc double, sba_fc double"
)
CROSTON_STATE = "i long, z double, p double, w_last long"


def stream_croston_updates(weekly: DataFrame) -> DataFrame:
    """Per-part Croston (+SBA) state updated incrementally across
    micro-batches of weekly demand occurrences ``(l_partkey, w, q)``
    (q in exact centi-units, one row per part-week with demand) — the
    streaming twin of forecast_croston_intermittent
    (relational/timeseries.py), for arrival-ordered streams: weeks
    must arrive non-decreasing per part ACROSS batches (time-range-
    ordered file drops — the same contract every state machine in this
    module documents); within a batch, rows are sorted before folding,
    so any intra-batch order is safe.

    State per part is (occurrence count, z, p, last demand week) —
    four scalars, sharded by the groupBy key in the state store at
    cluster scale. The fold is BIT-IDENTICAL to the batch query's JVM
    ``F.aggregate``: z seeds at the FIRST demand size, p at the FIRST
    interval, and occurrences >= 3 step
    z' = alpha*q + (1-alpha)*z, p' = alpha*(w - w_last) + (1-alpha)*p
    with the SAME CROSTON_ALPHA constants imported from the batch
    module (the ATTR_LOOKBACK_US single-definition-site discipline) and
    the same multiply-then-add parenthesization, so after feeding a
    part's full history the emitted row equals the batch row exactly —
    pinned by test. Emits in update mode (one refreshed row per part
    per touched micro-batch) once a part has >= 3 occurrences, matching
    the batch HAVING; the class gate (WHICH parts are intermittent)
    stays a batch-side decision — a stream cannot know a part's
    variance class before seeing its history, so the caller feeds the
    Z-class parts' demand stream (the lambda-collapse split
    running_user_totals_tws documents).

    Unlike the monitors this operator does NOT own a sink: route the
    returned update stream through foreachBatch + write_epoch_partition
    (the module's replay-idempotence contract) so an at-least-once
    retry REPLACES its epoch's rows."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .relational.timeseries import CROSTON_ALPHA, _CR_OMA, _CR_SBA

    a, oma, sba = CROSTON_ALPHA, _CR_OMA, _CR_SBA

    def update(key: tuple, pdfs, state: GroupState):
        i, z, p, w_last = state.get if state.exists else (0, 0.0, 0.0, 0)
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("w")
        for w, q in zip(pdf["w"], pdf["q"]):
            w = int(w)
            q = float(q)
            if i == 0:
                z = q  # first demand size seeds the size EWMA
            elif i == 1:
                p = float(w - w_last)  # first interval seeds the rate
            else:
                z = a * q + oma * z
                p = a * float(w - w_last) + oma * p
            w_last = w
            i += 1
        state.update((i, z, p, w_last))
        if i >= 3:
            yield pd.DataFrame(
                {
                    "partkey": [key[0]],
                    "n_demands": [i],
                    "z_hat": [round(z / 100.0, 6)],
                    "p_hat": [round(p, 6)],
                    "croston_fc": [round(z / 100.0 / p, 6)],
                    "sba_fc": [round(sba * z / 100.0 / p, 6)],
                }
            )

    return weekly.groupBy("l_partkey").applyInPandasWithState(
        update,
        CROSTON_OUTPUT,
        CROSTON_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_croston_intermittent(
    spark: SparkSession,
    path: str,
    out_dir: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """File-fed driver for stream_croston_updates with the module's
    replay-idempotent sink: reads time-range-ordered parquet drops of
    weekly demand rows, maintains per-part Croston state, and lands
    each micro-batch's refreshed forecasts via write_epoch_partition
    (dynamic ``_epoch=N`` overwrite — an at-least-once retry REPLACES
    the epoch instead of appending a duplicate). The freshest forecast
    per part is the row with the highest n_demands (state is
    monotone), independent of which epoch carried it."""
    reader = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", 1)
        .schema(spark.read.parquet(path).schema)
    )
    updates = stream_croston_updates(reader.load(path))

    def land(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_epoch_partition(batch_df, epoch_id, out_dir, single_file=True)

    writer = (
        updates.writeStream.outputMode("update")
        .foreachBatch(land)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def croston_state_snapshot(weekly: DataFrame) -> DataFrame:
    """Per-part Croston warm-start state from a BATCH weekly-demand
    relation ``(l_partkey, w, q)`` — the lambda-collapse seed for
    stream_croston_updates_tws: backfill demand history once with a
    batch job, then stream only new weeks from exactly this state (no
    history replay through the stream path, the user_totals_snapshot
    pattern). Emits UNROUNDED (i, z, p, w_last) per part — the rounded
    forecast columns of the registered batch query are for readers;
    warm start must continue the fold bit-for-bit, so it gets the raw
    EWMA state, computed by the SAME JVM F.aggregate fold and seed
    conventions as forecast_croston_intermittent (z at the first
    demand size, p at the first interval, occurrences >= 3 folded;
    parts seen once carry p = 0.0, the 'interval not yet seeded'
    convention the stream's i == 1 branch completes)."""
    from .relational.timeseries import CROSTON_ALPHA, _CR_OMA

    grouped = (
        weekly.select("l_partkey", "w", F.col("q").cast("double").alias("q"))
        .groupBy("l_partkey")
        .agg(
            F.array_sort(F.collect_list(F.struct("w", "q"))).alias("a"),
            F.count("*").cast("bigint").alias("i"),
        )
    )
    a_lit, oma = F.lit(CROSTON_ALPHA), F.lit(_CR_OMA)
    arr = F.col("a")
    n = F.col("i")
    z1 = F.element_at(arr, 1)["q"]
    p1 = (
        F.element_at(arr, 2)["w"] - F.element_at(arr, 1)["w"]
    ).cast("double")
    folded = F.aggregate(
        F.when(n >= 3, F.slice(arr, 3, (n - 2).cast("int"))).otherwise(
            F.array()
        ),
        F.struct(
            z1.alias("z"),
            F.when(n >= 2, p1).otherwise(F.lit(0.0)).alias("p"),
            F.element_at(arr, F.least(n, F.lit(2)).cast("int"))["w"].alias(
                "w_prev"
            ),
        ),
        lambda acc, x: F.struct(
            (a_lit * x["q"] + oma * acc["z"]).alias("z"),
            (
                a_lit * (x["w"] - acc["w_prev"]).cast("double")
                + oma * acc["p"]
            ).alias("p"),
            x["w"].alias("w_prev"),
        ),
    )
    return grouped.select(
        "l_partkey",
        "i",
        folded["z"].alias("z"),
        folded["p"].alias("p"),
        F.element_at(arr, -1)["w"].cast("bigint").alias("w_last"),
    )


def stream_croston_updates_tws(
    weekly: DataFrame, initial_states: DataFrame | None = None
) -> DataFrame:
    """stream_croston_updates on Spark 4's transformWithState API, with
    the WARM-START channel the applyInPandasWithState twin lacks:
    ``initial_states`` (croston_state_snapshot output) seeds each
    part's ValueState in the first micro-batch via handleInitialState,
    so the stream continues the batch backfill's EWMAs bit-for-bit
    instead of replaying demand history — the lambda-collapse pattern
    running_user_totals_tws documents, applied to the forecast tier.
    Same fold, same constants, same output schema and >= 3 emit gate
    as the apply twin; law test pins warm start + streamed tail ==
    the registered batch query over the full history. Runs on the
    RocksDB state store (API requirement; the right store for
    part-cardinality state anyway); execution needs a protobuf
    runtime (compat.ensure_protobuf — the container's vendored
    pure-Python one works)."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from .relational.timeseries import CROSTON_ALPHA, _CR_OMA, _CR_SBA

    a, oma, sba = CROSTON_ALPHA, _CR_OMA, _CR_SBA

    class CrostonState(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("croston", CROSTON_STATE)

        def handleInitialState(self, key, initialState, timerValues) -> None:
            r = initialState.iloc[0]
            self._state.update(
                (int(r["i"]), float(r["z"]), float(r["p"]), int(r["w_last"]))
            )

        def handleInputRows(self, key, rows, timerValues):
            i, z, p, w_last = (
                self._state.get() if self._state.exists() else (0, 0.0, 0.0, 0)
            )
            chunks = [pdf for pdf in rows if not pdf.empty]
            if not chunks:
                return
            pdf = pd.concat(chunks).sort_values("w")
            for w, q in zip(pdf["w"], pdf["q"]):
                w = int(w)
                q = float(q)
                if i == 0:
                    z = q
                elif i == 1:
                    p = float(w - w_last)
                else:
                    z = a * q + oma * z
                    p = a * float(w - w_last) + oma * p
                w_last = w
                i += 1
            self._state.update((i, z, p, w_last))
            if i >= 3:
                yield pd.DataFrame(
                    {
                        "partkey": [key[0]],
                        "n_demands": [i],
                        "z_hat": [round(z / 100.0, 6)],
                        "p_hat": [round(p, 6)],
                        "croston_fc": [round(z / 100.0 / p, 6)],
                        "sba_fc": [round(sba * z / 100.0 / p, 6)],
                    }
                )

        def close(self) -> None:
            pass

    return weekly.groupBy("l_partkey").transformWithStateInPandas(
        statefulProcessor=CrostonState(),
        outputStructType=CROSTON_OUTPUT,
        outputMode="Update",
        timeMode="None",
        initialState=(
            None
            if initial_states is None
            else initial_states.groupBy("l_partkey")
        ),
    )


def markov_state_snapshot(events_batch: DataFrame) -> DataFrame:
    """Per-user Markov warm-start state from BATCH event history —
    the lambda-collapse seed for stream_markov_transitions_tws
    (the croston_state_snapshot pattern applied to the sequence tier):
    backfill history once with a batch job, then stream only new
    events from exactly this state. State per user is ONE string —
    the last event type in (ts, event_id) order — computed with a
    single max-by-struct aggregate (lexicographic struct ordering;
    (ts, event_id) is unique, so event_type never participates in the
    comparison), exactly the row a per-user (ts, event_id) sort would
    end on. Emits (user_id, last_type)."""
    return events_batch.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type"))[
            "event_type"
        ].alias("last_type")
    )


def stream_markov_transitions_tws(
    events: DataFrame, initial_states: DataFrame | None = None
) -> DataFrame:
    """stream_markov_transitions on Spark 4's transformWithState API,
    with the WARM-START channel the applyInPandasWithState twin lacks
    (VERDICT r13 item 5): ``initial_states`` (markov_state_snapshot
    output) plants each user's carried last-type in the first
    micro-batch via handleInitialState, so the stream's first event
    per user bridges to the batch backfill's final event — the ONE
    transition per user that neither the history nor the tail alone
    contains. Same per-batch (ts, event_id) sort, same pair-count
    emit, same output schema as the apply twin; the pinned law is
    history-batch transition counts + streamed-tail counts == the
    registered batch query over the FULL history. Runs on the RocksDB
    state store (API requirement; the right store for user-cardinality
    state anyway); execution needs a protobuf runtime
    (compat.ensure_protobuf — the container's vendored pure-Python
    one works)."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MarkovState(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("markov", MARKOV_STATE)

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # Mirror the apply twin's `if last is not None` guard: a
            # NULL snapshot last_type must leave the state ABSENT, not
            # become the literal string "None" (r14 review finding —
            # a nullable event_type source would otherwise emit a
            # spurious ("None", t) bridge transition the batch query
            # never produces).
            v = initialState.iloc[0]["last_type"]
            if v is not None and pd.notna(v):
                self._state.update((str(v),))

        def handleInputRows(self, key, rows, timerValues):
            last = self._state.get()[0] if self._state.exists() else None
            chunks = [pdf for pdf in rows if not pdf.empty]
            if not chunks:
                return
            # Multi-chunk groups arrive in arbitrary chunk order —
            # concatenate before the one sort (the apply twin's rule).
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            pairs: dict = {}
            for t in pdf["event_type"]:
                if last is not None:
                    k = (last, t)
                    pairs[k] = pairs.get(k, 0) + 1
                last = t
            if last is not None:
                self._state.update((str(last),))
            if pairs:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(pairs),
                        "from_type": [k[0] for k in pairs],
                        "to_type": [k[1] for k in pairs],
                        "n": list(pairs.values()),
                    }
                )

        def close(self) -> None:
            pass

    # r14 optimization (guide §4.1): only the columns the processor
    # reads cross the shuffle + Arrow boundary (drops props and value).
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=MarkovState(),
            outputStructType=MARKOV_OUTPUT,
            outputMode="Append",
            timeMode="None",
            initialState=(
                None
                if initial_states is None
                else initial_states.groupBy("user_id")
            ),
        )
    )


def attribution_state_snapshot(events_batch: DataFrame) -> DataFrame:
    """Per-user last-MARKETING-touch warm-start state from BATCH event
    history — the lambda-collapse seed for
    stream_attribution_last_touch_tws (the markov_state_snapshot
    pattern applied to the attribution tier): backfill history once
    with a batch job, then stream only new events from exactly this
    state. State per user is ONE (microsecond, type) pair — the last
    view/click/signup in (ts, event_id) order, computed with a single
    max-by-struct aggregate over the FILTERED marketing events
    ((ts, event_id) is unique, so event_type never participates in
    the comparison). The timestamp converts to exact integer
    microseconds on the batch side (unix_micros for TIMESTAMP
    fixtures, `div 1000` for NANOS-as-long ones — integer division,
    never a double, which loses exactness above 2^53 ns), matching
    the stream twin's pandas `.astype(int64) // 1000`. Emits
    (user_id, mkt_ts, mkt_type)."""
    from pyspark.sql.types import LongType

    mkt = events_batch.filter(
        F.col("event_type").isin("view", "click", "signup")
    )
    m = mkt.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("m")
    )
    if isinstance(events_batch.schema["ts"].dataType, LongType):
        mkt_us = F.expr("m.ts div 1000")
    else:
        mkt_us = F.unix_micros(F.col("m.ts"))
    return m.select(
        "user_id",
        mkt_us.cast("long").alias("mkt_ts"),
        F.col("m.event_type").alias("mkt_type"),
    )


def stream_attribution_last_touch_tws(
    events: DataFrame, initial_states: DataFrame | None = None
) -> DataFrame:
    """stream_attribution_last_touch on Spark 4's transformWithState
    API, with the warm-start channel the applyInPandasWithState twin
    lacks (VERDICT r13 item 5, third port after Croston and Markov):
    ``initial_states`` (attribution_state_snapshot output) plants each
    user's carried last marketing touch in the first micro-batch via
    handleInitialState, so a tail purchase inside the 7-day lookback
    of a HISTORY touch credits that touch instead of landing
    'unattributed' — the cross-boundary credit neither half alone
    contains. Same per-batch (ts, event_id) sort, same
    purchase-credit / touch-carry fold, same output schema as the
    apply twin; the pinned law is history-half batch attribution +
    streamed-tail credits == the registered batch query over the FULL
    history. Runs on the RocksDB state store; execution needs a
    protobuf runtime (compat.ensure_protobuf)."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    def _micros(s: pd.Series) -> pd.Series:
        if pd.api.types.is_datetime64_any_dtype(s):
            return s.astype("datetime64[ns]").astype("int64") // 1000
        return s.astype("int64") // 1000  # NANOS-as-long fixture generation

    class AttrState(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("attr", ATTR_STATE)

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # the apply twin's `if mkt_ts is not None` guard: a user
            # with no marketing history must start with ABSENT state
            row = initialState.iloc[0]
            ts_v, ty_v = row["mkt_ts"], row["mkt_type"]
            if ts_v is not None and pd.notna(ts_v) and ty_v is not None:
                self._state.update((int(ts_v), str(ty_v)))

        def handleInputRows(self, key, rows, timerValues):
            mkt_ts, mkt_type = (
                self._state.get() if self._state.exists() else (None, None)
            )
            counts: dict = {}
            chunks = [pdf for pdf in rows if not pdf.empty]
            if not chunks:
                return
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            us = _micros(pdf["ts"])
            for t, ts_us in zip(pdf["event_type"], us):
                if t == "purchase":
                    within = (
                        mkt_ts is not None
                        and ts_us - mkt_ts <= ATTR_LOOKBACK_US
                    )
                    ch = mkt_type if within else "unattributed"
                    counts[ch] = counts.get(ch, 0) + 1
                elif t in ("view", "click", "signup"):
                    mkt_ts, mkt_type = int(ts_us), t
            if mkt_ts is not None:
                self._state.update((mkt_ts, mkt_type))
            if counts:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(counts),
                        "channel": list(counts),
                        "n": list(counts.values()),
                    }
                )

        def close(self) -> None:
            pass

    # r14 optimization (guide §4.1): only the columns the processor
    # reads cross the shuffle + Arrow boundary (drops props and value).
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=AttrState(),
            outputStructType=ATTR_OUTPUT,
            outputMode="Append",
            timeMode="None",
            initialState=(
                None
                if initial_states is None
                else initial_states.groupBy("user_id")
            ),
        )
    )
