"""Structured Streaming twins of the watch/convert pipeline and the
windowed event aggregations.

Reference parity (msconvert_dag.py): the DAG *polls* every 5 minutes
and sleeps in wait_until_quiet. Streaming-native Spark replaces both:

* the file source tails the watch directory incrementally with
  exactly-once tracking in the checkpoint (no ledger anti-join needed
  — the checkpoint IS the ledger);
* ``maxFileAge`` / watermarks replace the quiet-wait sleep: a late or
  still-growing file simply arrives in a later micro-batch;
* ``Trigger.AvailableNow`` gives the batch-drain mode used in tests;
  a production deployment runs the same code with a processing-time
  trigger.

Scale: the streaming file source scales to large directories via
``maxFilesPerTrigger`` back-pressure; state for windowed aggs is
bounded by the watermark horizon. Event-time sessionization with
``session_window`` mirrors operators/timeseries.events_sessionize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ]
)

#: Historical fixed schema (ts = int64 nanos). Kept for callers that
#: stream from pre-written nanos parquet; ``load_events_stream`` now
#: probes the footer instead of assuming this shape.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # ns (read with nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_convert(
    spark: SparkSession,
    watch_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming convert: binaryFile stream → deterministic fake
    conversion record per input file → parquet sink, exactly-once via
    checkpoint. Drains what's currently in the directory
    (AvailableNow) — rerunning converts only NEW files.
    """
    reader = (
        spark.readStream.format("binaryFile")
        .schema(FILE_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        # back-pressure: bound every micro-batch; AvailableNow still
        # drains the whole backlog, just in multiple batches
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(watch_dir)
    converted = stream.select(
        F.regexp_replace("path", "^file:", "").alias("path"),
        F.col("length").alias("n_bytes_in"),
        F.md5("content").alias("checksum"),
        F.lit("ok").alias("status"),
    )
    q = (
        converted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_DURATION_UNIT_MS = {
    "millisecond": 1, "milliseconds": 1, "ms": 1,
    "second": 1000, "seconds": 1000, "s": 1000,
    "minute": 60_000, "minutes": 60_000, "min": 60_000, "mins": 60_000,
    "hour": 3_600_000, "hours": 3_600_000, "h": 3_600_000,
    "day": 86_400_000, "days": 86_400_000, "d": 86_400_000,
    "week": 604_800_000, "weeks": 604_800_000,
}


def _parse_duration_ms(spec: str) -> int:
    """Parse a Spark ``CalendarInterval``-style duration ('1 minute',
    '2 hours', '30 seconds') into milliseconds — used to VALIDATE a
    caller-supplied watermark before handing it to withWatermark."""
    parts = spec.strip().lower().split()
    if len(parts) != 2 or parts[1] not in _DURATION_UNIT_MS:
        raise ValueError(f"unsupported duration spec: {spec!r}")
    try:
        n = float(parts[0])
    except ValueError:
        raise ValueError(f"unsupported duration spec: {spec!r}") from None
    return int(n * _DURATION_UNIT_MS[parts[1]])


def load_events_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Parquet streaming source over the events table with ``ts``
    normalized to a (UTC) µs TimestampType.

    The file-stream source needs an explicit schema, and the generator
    has shipped ``ts`` both as int64 nanos and as TIMESTAMP_NTZ across
    rounds — so probe the footer with a one-off batch read (metadata
    only, no data scan) and adapt, mirroring catalog._load_events."""
    from pyspark.sql.types import TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    probed = (
        spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    )
    # the file-stream source requires a DIRECTORY; select the events
    # table out of the SF dir with a glob filter
    reader = spark.readStream.schema(probed).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    raw = reader.parquet(sf_dir)
    ts_type = probed["ts"].dataType
    if isinstance(ts_type, LongType):
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if isinstance(ts_type, TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def stream_tumbling_counts(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_tumbling",
) -> None:
    """Hourly tumbling counts per event_type with a 1-hour watermark,
    drained with AvailableNow into an in-memory sink (tests compare
    against the batch events_tumbling_window)."""
    ev = load_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").start.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    table_name: str = "stream_sessions",
) -> None:
    """Native event-time session windows (gap-based) — the streaming
    twin of events_sessionize, with watermark-bounded state.

    Boundary semantics: ``session_window``'s end is EXCLUSIVE
    (window = [start, last_ts + gap)), so an event arriving exactly
    ``gap`` after its predecessor starts a NEW session. The batch
    events_sessionize uses strictly-greater-than-gap, so the two
    differ only for exact-gap events; the streaming oracle
    (operators/streaming_ops.py) encodes the ``>=`` boundary.
    """
    ev = load_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_user_running_totals(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_user_totals",
) -> None:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (count, sum) accumulator maintained across
    micro-batches — the hand-rolled state that windows/sessions can't
    express (e.g. lifetime counters, fraud scores).

    Scale: state is keyed by user_id (natural shuffle key); each
    micro-batch touches only arriving keys; Arrow moves the batch.
    State eviction (timeout) is configured NoTimeout here because the
    tests drain a finite source; production sets EventTimeTimeout
    with the watermark.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = load_events_stream(spark, sf_dir).select("user_id", "value")

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total_cents", LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        # integer-cents accumulator: values are 2-decimal by domain,
        # so the running sum is EXACT and order-independent — the
        # streamed total is bit-comparable to any batch/oracle sum
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # round per VALUE (each is 2dp-exact), then integer-sum
            total_cents += int(
                pdf["value"].mul(100).round().astype("int64").sum()
            )
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [total_cents / 100.0],
            }
        )

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()



def stream_user_ewma(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_user_ewma",
) -> None:
    """Per-EVENT streaming feature with bounded carry-over state: the
    α=0.5 truncated EWMA (operators/analytics_ext.events_ewma) as a
    stateful streaming operator.  Unlike the running-totals
    accumulator (one row per key), this emits one row per arriving
    event, computed from the event plus the user's previous ≤7
    values carried in state — the shape of real-time feature
    pipelines (fraud scores, rate baselines) where each event needs
    its features NOW, not at window close.

    State is BOUNDED by construction: exactly the last 7 integer-cent
    values per user (an array<long> of length ≤7), so state size is
    O(active users), independent of stream length — no eviction
    pressure, though production still sets EventTimeTimeout to drop
    idle users.

    Exactness: the dyadic weights 2^-i make the weighted sum exact
    integer arithmetic (cents × 2^(7-i)); the two final divisions
    replicate Spark's decimal→double→HALF_UP-round chain digit for
    digit, so the streamed values are BYTE-identical to the batch
    operator and its DuckDB oracle.

    Ordering: events are sorted by (ts, event_id) inside each
    micro-batch; the AvailableNow drain over one parquet file is a
    single batch, so the per-user order is total.  A multi-batch
    deployment keys ordering to the source's per-partition order —
    the standard contract for per-key stateful streaming.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import ArrayType

    ev = load_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value"
    )
    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("lag_cents", ArrayType(LongType()))]
    )

    def update(key, pdfs, state):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        lags = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        out_ids, out_ewma = [], []
        for event_id, value in zip(pdf["event_id"], pdf["value"]):
            # HALF_UP on the double's shortest repr — the exact chain
            # of the batch twin's cast(value as decimal(8,2)); Python
            # round() is banker's and diverges on .xx5 values
            cents = int(
                Decimal(repr(float(value))).quantize(
                    Decimal("0.01"), ROUND_HALF_UP
                )
                * 100
            )
            window = [cents] + lags[:7]
            a = sum(v << (7 - i) for i, v in enumerate(window))
            b = sum(1 << (7 - i) for i in range(len(window)))
            # replicate the batch operator's decimal→double chain:
            # num = Σ value·2^-i is exact at decimal scale 9
            # (1/12800 = 7.8125e-5), den = Σ 2^-i exact at scale 7
            numf = float(Decimal(a) / Decimal(12800))
            denf = float(Decimal(b) / Decimal(128))
            q = numf / denf
            out_ids.append(int(event_id))
            out_ewma.append(
                float(
                    Decimal(repr(q)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
            )
            lags = [cents] + lags[:6]
        state.update((lags,))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [key[0]] * len(out_ids),
                "ewma": out_ewma,
            }
        )

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_user_running_totals_tws(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_user_totals_tws",
) -> None:
    """The running-totals accumulator re-expressed on
    ``transformWithStateInPandas`` — Spark 4's successor to
    ``applyInPandasWithState`` (SPARK-49564 "State V2"): typed state
    handles (ValueState here; ListState/MapState/timers/TTL
    available) instead of one opaque state tuple, RocksDB-backed so
    per-key state spills to disk instead of executor heap.

    Semantics are identical to :func:`stream_user_running_totals`
    (exact integer-cents accumulation, update-mode emission) and the
    two are equality-tested against each other and the batch agg —
    the migration path a production pipeline would take, proven
    result-stable.

    Scale: same keyed-shuffle shape; the win is operational — RocksDB
    state store + changelog checkpointing where the old API held all
    state on-heap.

    Environment gate: the State V2 worker protocol runs over
    protobuf, which this container does not ship — detected up front
    (import-try per the build mandate) instead of failing inside the
    streaming query. tests/test_streaming.py runs the equality test
    wherever protobuf exists and skips here.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's State V2 worker protocol); not installed in this "
            "environment. stream_user_running_totals is the semantically "
            "identical applyInPandasWithState fallback."
        ) from None
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, total_cents bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, cents = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    pdf["value"].mul(100).round().astype("int64").sum()
                )
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    ev = load_events_stream(spark, sf_dir).select("user_id", "value")
    agg = ev.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=StructType(
            [
                StructField("user_id", LongType()),
                StructField("n_events", LongType()),
                StructField("sum_value", DoubleType()),
            ]
        ),
        outputMode="Update",
        timeMode="None",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_session_flush(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_session_flush",
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    max_files_per_trigger: int | None = 1,
) -> None:
    """Expiring-state sessionization via ``EventTimeTimeout``: a
    per-user session accumulator that EMITS a row only when the
    event-time watermark passes ``last_event + gap`` — the state-
    eviction pattern stream_user_running_totals documents as the
    production configuration (watch.py's NoTimeout totals grow state
    forever; this one provably releases it).

    Mechanics per micro-batch: the user's batch rows are sorted by
    event time and SPLIT on gaps ``>= gap`` — matching the batch
    twin ``events_session_window_batch``'s boundary rule (new
    session when ``t >= prev_end + gap``) even when several
    sessions' worth of events land in one micro-batch, and when the
    first new event gaps away from the carried open-session state.
    Sessions closed by an intra-batch gap are emitted immediately;
    only the single still-open tail session stays in state, with the
    timeout re-armed at ``session_end + gap``. When a later batch
    advances the watermark past that deadline, Spark invokes the
    function with ``state.hasTimedOut`` and NO rows — the closed
    session is emitted and the state removed. Sessions still open
    when the source dries up are intentionally NOT emitted (they
    have not ended — a restart resumes them from the checkpoint).
    Cents use half-away-from-zero rounding (``floor(v*100+0.5)`` on
    non-negative money values) to match Spark/DuckDB ``round()`` —
    pandas' ``Series.round`` is banker's rounding and would diverge
    on exact half-cents.

    Scale: state is (4 longs) × live users, and eviction bounds
    "live" to the gap window — the property that lets a 100 TB
    stream run for months without state growth.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    # Precondition (correctness, not tuning): eager emission of intra-
    # batch-closed sessions assumes no in-watermark event can still
    # belong to an emitted session. That holds iff watermark delay <=
    # gap — a late event within the watermark is by definition < delay
    # behind max(ts) seen; with delay <= gap it lands within the gap of
    # the still-open tail session (kept in state), never inside an
    # already-emitted one. A delay > gap (e.g. watermark='2 hours',
    # gap_minutes=30) breaks that invariant, so refuse it.
    delay_ms = _parse_duration_ms(watermark)
    if delay_ms > gap_minutes * 60_000:
        raise ValueError(
            f"stream_session_flush requires watermark delay <= gap: "
            f"got watermark={watermark!r} ({delay_ms} ms) > "
            f"gap_minutes={gap_minutes} ({gap_minutes * 60_000} ms). "
            "Either shrink the watermark or grow the gap; supporting "
            "delay > gap needs closed sessions held in state until the "
            "watermark passes their end+gap."
        )

    ev = (
        load_events_stream(
            spark,
            src_dir,
            glob="*.parquet",
            max_files_per_trigger=max_files_per_trigger,
        )
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
            StructField("cents", LongType()),
        ]
    )
    gap_ms = gap_minutes * 60 * 1000
    gap_us = gap_ms * 1000

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        def frame(sessions):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [key[0]] * len(sessions), dtype="int64"
                    ),
                    "session_start_us": pd.Series(
                        [s[0] for s in sessions], dtype="int64"
                    ),
                    "session_end_us": pd.Series(
                        [s[1] for s in sessions], dtype="int64"
                    ),
                    "n_events": pd.Series(
                        [s[2] for s in sessions], dtype="int64"
                    ),
                    "sum_cents": pd.Series(
                        [s[3] for s in sessions], dtype="int64"
                    ),
                }
            )

        if state.hasTimedOut:
            closed = state.get
            state.remove()
            yield frame([closed])
            return

        parts = [pdf for pdf in pdfs if len(pdf)]
        cur = state.get if state.exists else None  # (start,end,n,cents)
        closed: list[tuple[int, int, int, int]] = []
        if parts:
            batch = pd.concat(parts, ignore_index=True)
            us = (batch["ts"].astype("int64") // 1000).to_numpy()  # ns->us
            # half-away-from-zero cents (values are non-negative money)
            cents = np.floor(
                batch["value"].to_numpy(dtype="float64") * 100.0 + 0.5
            ).astype("int64")
            order = np.argsort(us, kind="stable")
            for t, c in zip(us[order].tolist(), cents[order].tolist()):
                if cur is not None and t - cur[1] >= gap_us:
                    closed.append(cur)
                    cur = None
                if cur is None:
                    cur = (t, t, 1, c)
                else:
                    cur = (
                        min(cur[0], t),
                        max(cur[1], t),
                        cur[2] + 1,
                        cur[3] + c,
                    )
        if cur is None:
            # no rows and no timeout: nothing to do (state untouched)
            yield frame([])
            return
        state.update(cur)
        # re-arm eviction: must stay ahead of the current watermark
        deadline_ms = max(
            cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(deadline_ms)
        yield frame(closed)

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_enrich_counts(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_enrich",
) -> None:
    """Stream-static broadcast join: enrich the event stream with the
    ``customer`` dimension (market segment), then aggregate counts and
    exact-cents sums per segment.

    The static side is re-resolvable per micro-batch (Spark re-plans
    the join each trigger, so a refreshed dim table is picked up) and
    broadcast — the canonical dimension-enrichment shape: NO shuffle
    of the stream side for the join; the only stateful shuffle is the
    5-key segment aggregate.

    Events carry no customer key, so the join key is derived
    deterministically (user_id spread over the customer keyspace) —
    the oracle builds the identical key.
    """
    from aichemy_data_pipelines_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    n_cust = cust.count()  # bounded scalar: sizes the derived join key
    ev = load_events_stream(spark, sf_dir).withColumn(
        "c_custkey", F.col("user_id") % n_cust + 1
    )
    joined = ev.join(F.broadcast(cust), "c_custkey")
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        (
            F.expr("sum(cast(round(value * 100) as bigint))") / 100.0
        ).alias("sum_value"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_click_attribution(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_attrib",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """STREAM-STREAM inner join with a time-range condition — the
    Structured Streaming feature the other drains don't exercise:
    clicks joined to purchases by the same user within the following
    30 minutes (ad-attribution shape).

    Both sides carry event-time watermarks; with the range condition
    Spark derives the state-retention horizon for each side (a click
    can stop waiting once the purchase watermark passes
    click_ts + 30 min), so join state is bounded — the production
    requirement for unbounded streams.

    Output is the raw matched pairs (append mode — stream-stream
    joins emit matches as both sides arrive), which is a
    deterministic SET and therefore hash-checkable against the batch
    self-join oracle.

    Scale: state is keyed by user_id; the join shuffles both streams
    on the key once and retains only the watermark horizon. Skewed
    hot users bound the per-key state linearly in their in-horizon
    events, not in stream length.
    """
    clicks = (
        load_events_stream(
            spark, sf_dir, glob=glob,
            max_files_per_trigger=max_files_per_trigger,
        )
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        load_events_stream(
            spark, sf_dir, glob=glob,
            max_files_per_trigger=max_files_per_trigger,
        )
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        [
            clicks.user_id == purchases.p_user_id,
            purchases.purchase_ts > clicks.click_ts,
            purchases.purchase_ts
            <= clicks.click_ts + F.expr("interval 30 minutes"),
        ],
        "inner",
    ).select("click_id", "purchase_id", "user_id")
    q = (
        joined.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_keys(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_dedup",
) -> None:
    """Streaming deduplication via ``dropDuplicatesWithinWatermark``
    — the streaming twin of events_dedup_latest's idempotency ledger:
    the first event per (user_id, event_type) passes, later ones are
    dropped, and the dedup state is EVICTED once the watermark passes
    (unlike plain dropDuplicates, whose state grows forever).

    Only the key columns are emitted: *which* row survives a
    streaming dedup is arrival-order-dependent, but the surviving KEY
    SET is exactly the distinct key set — deterministic and
    hash-checkable against ``SELECT DISTINCT``.

    Scale: state = one entry per in-horizon key, sharded by the key
    shuffle — the canonical exactly-once event-ingest front door at
    100 TB/day (state bounded by keys/hour, not events/hour).
    """
    ev = load_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    ).select("user_id", "event_type")
    q = (
        deduped.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_user_gap_alerts(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_user_gap_alerts",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """Per-EVENT cadence screen with MINIMAL state (one long per
    user): each arriving event is stamped with the gap to the user's
    previous event (exact epoch-microsecond integers) and a
    rapid-fire flag (gap < 1 h) — the real-time half of
    analytics_ext.events_inter_arrival_stats, and the primitive
    behind rate limiting / bot cadence alerts.

    State = last event's epoch-µs per user — the smallest possible
    stateful-streaming footprint (O(active users) longs; production
    adds EventTimeTimeout to drop idle users).

    Exactness: gaps are integer µs differences — no float path at
    all, so the streamed rows are byte-identical to a batch lag
    window and hash-checkable in DuckDB (the declared oracle).

    Ordering: per-user (ts, event_id) sort inside the micro-batch;
    the AvailableNow drain over one parquet file is a single batch,
    so the per-user order is total (same contract as
    stream_user_ewma).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import BooleanType

    ev = load_events_stream(
        spark, sf_dir, glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    ).select("event_id", "user_id", "ts")
    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("gap_us", LongType()),
            StructField("is_rapid", BooleanType()),
        ]
    )
    state_schema = StructType([StructField("last_us", LongType())])
    rapid_us = 3_600_000_000  # < 1 hour between events

    def update(key, pdfs, state):
        import pandas as pd

        last_us = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ids, gaps, rapid = [], [], []
        for event_id, ts in zip(pdf["event_id"], pdf["ts"]):
            # pandas Timestamp.value is epoch NANOseconds (the events
            # source is µs-precision, so the ns→µs division is exact)
            now_us = ts.value // 1000
            gap = None if last_us is None else now_us - last_us
            ids.append(int(event_id))
            gaps.append(gap)
            rapid.append(bool(gap is not None and gap < rapid_us))
            last_us = now_us
        state.update((last_us,))
        yield pd.DataFrame(
            {
                "event_id": ids,
                "user_id": [key[0]] * len(ids),
                "gap_us": pd.array(gaps, dtype="Int64"),
                "is_rapid": rapid,
            }
        )

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merge_ledger_batch(
    batch_df: DataFrame,
    batch_id: int,
    table,
    run_id: str | None = None,
) -> None:
    """One micro-batch of the upsert ledger (module-level so the
    replay-idempotence contract is directly testable).  ``table`` is a
    pipeline.atomic.AtomicParquetTable; the merge no-ops when the
    ledger's manifest already carries this batch_id."""
    from aichemy_data_pipelines_spark.pipeline.replay import (
        is_replay,
        stamp,
    )

    # high-watermark, not equality: foreachBatch ids are monotonic,
    # so any id <= the committed watermark is a replay (equality-only
    # would re-merge an older re-delivered batch, double-counting it).
    # run_id scopes the watermark to one checkpoint lifetime — a
    # recreated checkpoint restarts ids at 0 and must NOT be dropped
    # against the stale stamp (r06 ADVICE)
    if is_replay(table.meta(), batch_id, run_id):
        return  # replay of an already-merged batch
    part = batch_df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.expr("sum(cast(round(value * 100) as bigint))").alias("cents"),
    )
    base = table.read(batch_df.sparkSession)
    if base is not None:
        part = (
            base.unionByName(part)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("cents").alias("cents"),
            )
        )
    table.overwrite(
        part.localCheckpoint(eager=True),
        meta=stamp(table.meta(), batch_id, run_id),
    )
    table.vacuum()


def stream_upsert_ledger(
    spark: SparkSession,
    src_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """``foreachBatch`` incremental-ledger sink — THE production
    streaming-upsert pattern: each micro-batch computes its partial
    (count, integer-cents sum) per user and MERGES it into a parquet
    ledger by partial-aggregate algebra (same algebra as
    operators/relational_ext.orders_incremental_agg), instead of
    holding unbounded per-user state in the state store.

    Exactly-once, via two complementary mechanisms:

    - *No torn reads*: the merged ledger commits through the manifest
      protocol (pipeline/atomic.py) — the new version's data dir is
      written while readers still resolve the old manifest, then one
      atomic link publishes it, so neither a crash mid-write nor the
      read-then-overwrite hazard of a plain foreachBatch upsert can
      tear the ledger.
    - *No double merges*: foreachBatch is at-least-once (the
      checkpoint commits only after the function returns), and
      re-merging a batch into a base that already includes it would
      double-count n_events/cents.  Each overwrite therefore stamps
      ``last_batch_id`` into the manifest metadata, and a replayed
      batch whose id matches the committed stamp no-ops.

    localCheckpoint still cuts the read→write lineage cycle.

    Scale: ledger size = keyspace (users), not events; each
    micro-batch shuffles only its own partials + the keyspace-sized
    ledger. State-store-free, so state never outgrows the watermark.
    """
    from aichemy_data_pipelines_spark.pipeline.atomic import (
        AtomicParquetTable,
    )

    table = AtomicParquetTable(ledger_dir)
    ev = load_events_stream(
        spark, src_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
    ).select("user_id", "value")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        from aichemy_data_pipelines_spark.pipeline.replay import (
            checkpoint_identity,
        )

        merge_ledger_batch(
            batch_df,
            batch_id,
            table,
            run_id=checkpoint_identity(checkpoint_dir),
        )

    q = (
        ev.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
