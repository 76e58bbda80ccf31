"""Streaming twins: exactly-once file conversion via checkpoint;
windowed/session aggregations equal to their batch counterparts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.operators.timeseries import (
    events_sessionize,
    events_tumbling_window,
)
from aichemy_data_pipelines_spark.streaming.watch import (
    stream_convert,
    stream_sessionize,
    stream_tumbling_counts,
)
from tests.conftest import SF_SMOKE


def test_stream_convert_exactly_once(spark, tmp_path):
    watch = tmp_path / "watch"
    watch.mkdir()
    (watch / "f1.bin").write_bytes(b"one")
    (watch / "f2.bin").write_bytes(b"two")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    stream_convert(spark, str(watch), out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 2
    assert set(first.columns) == {"path", "n_bytes_in", "checksum", "status"}

    # drain again with no new files: checkpoint suppresses reprocessing
    stream_convert(spark, str(watch), out, ckpt)
    assert spark.read.parquet(out).count() == 2

    # a NEW file is picked up incrementally
    (watch / "f3.bin").write_bytes(b"three")
    stream_convert(spark, str(watch), out, ckpt)
    assert spark.read.parquet(out).count() == 3


def test_stream_tumbling_equals_batch(spark, tmp_path):
    stream_tumbling_counts(
        spark,
        SF_SMOKE,
        str(tmp_path / "ckpt"),
        table_name="t_tumble",
    )
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table("t_tumble").collect()
    }
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in events_tumbling_window(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_stream_sessionize_equals_batch(spark, tmp_path):
    stream_sessionize(
        spark,
        SF_SMOKE,
        str(tmp_path / "ckpt"),
        table_name="t_sess",
    )
    got = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in spark.table("t_sess").collect()
    )
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in events_sessionize(spark, SF_SMOKE)
        .select("user_id", "session_start", "n_events")
        .collect()
    )
    assert got == want


def test_stateful_running_totals_equals_batch(spark, tmp_path):
    from aichemy_data_pipelines_spark.catalog import load_table
    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_user_running_totals,
    )

    stream_user_running_totals(
        spark, SF_SMOKE, str(tmp_path / "ckpt"), table_name="t_state"
    )
    # keep only each user's final (latest) update row
    got = {}
    for r in spark.table("t_state").collect():
        got[r.user_id] = (r.n_events, r.sum_value)
    want = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "cast(sum(cast(round(value * 100) as bigint)) as double) / 100"
            ).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_stream_convert_backpressure_multiple_batches(spark, tmp_path):
    from aichemy_data_pipelines_spark.streaming.watch import stream_convert

    watch = tmp_path / "watch_bp"
    watch.mkdir()
    for i in range(7):
        (watch / f"f{i}.bin").write_bytes(bytes([i]) * (i + 1))
    out, ckpt = str(tmp_path / "out_bp"), str(tmp_path / "ckpt_bp")
    # 2 files per micro-batch -> 4 batches; still exactly-once overall
    stream_convert(spark, str(watch), out, ckpt, max_files_per_trigger=2)
    got = spark.read.parquet(out)
    assert got.count() == 7
    assert got.select("path").distinct().count() == 7
    # re-drain: nothing reprocessed
    stream_convert(spark, str(watch), out, ckpt, max_files_per_trigger=2)
    assert spark.read.parquet(out).count() == 7


def test_stream_upsert_ledger_multibatch_equals_batch(spark, tmp_path):
    """foreachBatch incremental ledger: 3 micro-batches of partials
    merged by partial-agg algebra must equal the one-shot batch agg,
    and a re-drain must be a no-op (exactly-once via checkpoint)."""
    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_upsert_ledger,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = tmp_path / "evsrc"
    src.mkdir()
    # split the feed into 3 files -> maxFilesPerTrigger=1 -> 3 batches
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).toPandas().assign(
            ts=lambda d: d.ts.astype("int64")
        ).to_parquet(str(src / f"events_{i}.parquet"))
    from aichemy_data_pipelines_spark.pipeline.atomic import (
        AtomicParquetTable,
    )

    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    stream_upsert_ledger(
        spark, str(src), ledger, ckpt,
        glob="*.parquet", max_files_per_trigger=1,
    )
    got = {
        r.user_id: (r.n_events, r.cents)
        for r in AtomicParquetTable(ledger).read(spark).collect()
    }
    want = {
        r.user_id: (r.n, r.c)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.expr("sum(cast(round(value * 100) as bigint))").alias("c"),
        )
        .collect()
    }
    assert got == want
    # exactly-once: re-drain sees no new files, ledger unchanged
    stream_upsert_ledger(
        spark, str(src), ledger, ckpt,
        glob="*.parquet", max_files_per_trigger=1,
    )
    got2 = {
        r.user_id: (r.n_events, r.cents)
        for r in AtomicParquetTable(ledger).read(spark).collect()
    }
    assert got2 == want


def test_stream_stream_join_across_microbatches(spark, tmp_path):
    """Stream-stream join state must survive micro-batch boundaries:
    events split time-sequentially into 3 files (maxFilesPerTrigger=1
    -> 3 batches), so click->purchase pairs spanning a boundary only
    match if the click side's join state is retained until the
    purchase arrives. Result must equal the batch self-join."""
    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_click_attribution,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lo, hi = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    span = (hi - lo) / 3
    src = tmp_path / "evsrc"
    src.mkdir()
    # time-ordered thirds: watermark advances monotonically between
    # batches (unordered splits would drop late rows by design)
    for i in range(3):
        cut_lo = lo + i * span
        cut_hi = hi if i == 2 else lo + (i + 1) * span
        part = ev.where(
            (F.col("ts") >= cut_lo)
            & (F.col("ts") < cut_hi if i < 2 else F.col("ts") <= cut_hi)
        )
        part.toPandas().assign(
            ts=lambda d: d.ts.astype("int64")
        ).to_parquet(str(src / f"events_{i}.parquet"))

    stream_click_attribution(
        spark, str(src), str(tmp_path / "ckpt"),
        table_name="t_attrib3", glob="*.parquet", max_files_per_trigger=1,
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.table("t_attrib3").collect()
    }
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            (c.user_id == p.p_user_id)
            & (p.pts > c.cts)
            & (p.pts <= c.cts + F.expr("interval 30 minutes")),
        ).collect()
    }
    assert want and got == want


def test_session_flush_evicts_state_on_watermark(spark, tmp_path):
    """EventTimeTimeout eviction: sessions whose gap deadline falls
    behind the advancing watermark must flush exactly once with exact
    totals; the still-open tail session must NOT be emitted."""
    import pandas as pd

    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_session_flush,
    )

    base = 1_700_000_000_000_000_000  # ns epoch, stable
    h = 3_600 * 1_000_000_000
    rows = [
        # user 1: two events at t0..t0+5min  (flushes)
        (1, 1, base, "view", 1.25),
        (2, 1, base + 5 * 60 * 1_000_000_000, "click", 2.50),
        # user 2: one event at t0 (flushes)
        (3, 2, base, "view", 10.00),
        # user 3: very late event — advances the watermark far past
        # users 1/2's deadlines, but its own session stays open
        (4, 3, base + 10 * h, "view", 5.00),
    ]
    src = tmp_path / "src"
    src.mkdir()
    # three time-ordered files -> three micro-batches
    for i, sl in enumerate((rows[:2], rows[2:3], rows[3:])):
        pd.DataFrame(
            sl, columns=["event_id", "user_id", "ts", "event_type", "value"]
        ).assign(props="{}").to_parquet(str(src / f"ev_{i}.parquet"))
    stream_session_flush(
        spark, str(src), str(tmp_path / "ckpt"), "sess_flush_t"
    )
    got = {
        r.user_id: (r.n_events, r.sum_cents, r.session_start_us, r.session_end_us)
        for r in spark.sql("SELECT * FROM sess_flush_t").collect()
    }
    us = base // 1000
    assert got == {
        1: (2, 375, us, us + 5 * 60 * 1_000_000),
        2: (1, 1000, us, us),
    }, got


def test_session_flush_splits_on_event_time_gaps(spark, tmp_path):
    """Gap-boundary parity with events_session_window_batch: events
    separated by >= gap must form SEPARATE sessions even when they
    arrive in the same micro-batch (intra-batch split) or when the
    first new event gaps away from the carried open-session state
    (cross-batch split) — not merge into one mega-session."""
    import pandas as pd

    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_session_flush,
    )

    base = 1_700_000_000_000_000_000  # ns epoch, stable
    m = 60 * 1_000_000_000  # one minute in ns
    h = 60 * m
    batch1 = [
        # user 1: TWO sessions' worth in ONE micro-batch (55min gap)
        (1, 1, base, "view", 1.25),
        (2, 1, base + 5 * m, "click", 2.50),
        (3, 1, base + 60 * m, "view", 4.00),
        (4, 1, base + 62 * m, "click", 0.75),
        # user 2: session A opens and is carried in state
        (5, 2, base, "view", 10.00),
    ]
    batch2 = [
        # user 2: first new event gaps 60min past the carried state
        (6, 2, base + 60 * m, "view", 3.00),
    ]
    batch3 = [
        # watermark mover: flushes every still-open tail via timeout
        (7, 9, base + 10 * h, "view", 5.00),
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, sl in enumerate((batch1, batch2, batch3)):
        pd.DataFrame(
            sl, columns=["event_id", "user_id", "ts", "event_type", "value"]
        ).assign(props="{}").to_parquet(str(src / f"ev_{i}.parquet"))
    stream_session_flush(
        spark, str(src), str(tmp_path / "ckpt"), "sess_split_t"
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events, r.sum_cents)
        for r in spark.sql("SELECT * FROM sess_split_t").collect()
    }
    us, mu = base // 1000, 60 * 1_000_000
    assert got == {
        (1, us, us + 5 * mu, 2, 375),  # intra-batch split, emitted early
        (1, us + 60 * mu, us + 62 * mu, 2, 475),  # tail, timeout-flushed
        (2, us, us, 1, 1000),  # cross-batch split on carried state
        (2, us + 60 * mu, us + 60 * mu, 1, 300),  # tail, timeout-flushed
    }, got


def test_session_flush_rejects_watermark_wider_than_gap(spark, tmp_path):
    """Eager emission of intra-batch-closed sessions is only sound
    when watermark delay <= gap (an in-watermark late event can then
    never belong to an already-emitted session). delay > gap must be
    refused up front, not silently produce overlapping sessions."""
    import pytest as _pytest

    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_session_flush,
    )

    with _pytest.raises(ValueError, match="watermark delay <= gap"):
        stream_session_flush(
            spark,
            str(tmp_path),
            str(tmp_path / "ckpt"),
            gap_minutes=30,
            watermark="2 hours",
        )


def test_parse_duration_ms():
    from aichemy_data_pipelines_spark.streaming.watch import (
        _parse_duration_ms,
    )

    assert _parse_duration_ms("1 minute") == 60_000
    assert _parse_duration_ms("2 hours") == 7_200_000
    assert _parse_duration_ms("30 seconds") == 30_000
    assert _parse_duration_ms("500 ms") == 500
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _parse_duration_ms("fortnight")


def test_tws_running_totals_equals_batch_and_v1(spark, tmp_path):
    """transformWithStateInPandas (State V2) twin: same result as the
    batch agg AND as the applyInPandasWithState implementation — the
    proven migration path between the two stateful APIs. Skips where
    protobuf (the State V2 worker protocol dependency) is absent."""
    import pytest as _pytest

    from aichemy_data_pipelines_spark.catalog import load_table
    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_user_running_totals,
        stream_user_running_totals_tws,
    )

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError, match="protobuf"):
            stream_user_running_totals_tws(
                spark, SF_SMOKE, str(tmp_path / "ckpt_tws")
            )
        _pytest.skip("protobuf absent: State V2 worker cannot run here")

    stream_user_running_totals_tws(
        spark, SF_SMOKE, str(tmp_path / "ckpt_tws"), table_name="t_tws"
    )
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table("t_tws").collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "cast(sum(cast(round(value * 100) as bigint)) as double) / 100"
            ).alias("s"),
        )
        .collect()
    }
    assert got == want
    stream_user_running_totals(
        spark, SF_SMOKE, str(tmp_path / "ckpt_v1"), table_name="t_v1"
    )
    v1 = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table("t_v1").collect()
    }
    assert got == v1


def test_upsert_ledger_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replays (crash between ledger overwrite and
    checkpoint commit) must not double-merge a batch: the manifest's
    last_batch_id stamp makes the re-merge a no-op, while a genuinely
    new batch_id still merges."""
    from aichemy_data_pipelines_spark.pipeline.atomic import (
        AtomicParquetTable,
    )
    from aichemy_data_pipelines_spark.streaming.watch import (
        merge_ledger_batch,
    )

    table = AtomicParquetTable(str(tmp_path / "ledger"))
    batch = spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 3.5)], "user_id long, value double"
    )
    merge_ledger_batch(batch, 0, table)
    snap = sorted(tuple(r) for r in table.read(spark).collect())
    assert snap == [(1, 2, 500), (2, 1, 350)]

    merge_ledger_batch(batch, 0, table)  # the replay
    assert sorted(tuple(r) for r in table.read(spark).collect()) == snap

    merge_ledger_batch(batch, 1, table)  # a real new batch still merges
    after = {
        r.user_id: (r.n_events, r.cents) for r in table.read(spark).collect()
    }
    assert after == {1: (4, 1000), 2: (2, 700)}


def test_streaming_ewma_equals_batch(spark):
    """The per-event stateful EWMA (bounded carry state) must emit
    byte-identical values to the batch window operator for every
    event."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_ewma,
    )
    from aichemy_data_pipelines_spark.operators.streaming_ops import (
        streaming_user_ewma,
    )
    from tests.conftest import SF_SMOKE

    batch = {
        r.event_id: (r.user_id, r.ewma)
        for r in events_ewma(spark, SF_SMOKE).collect()
    }
    streamed = {
        r.event_id: (r.user_id, r.ewma)
        for r in streaming_user_ewma(spark, SF_SMOKE).collect()
    }
    assert streamed == batch


def test_streaming_gap_alerts_state_continues_across_batches(
    spark, tmp_path
):
    """The cadence screen's one-long state must carry across
    micro-batches: with maxFilesPerTrigger=1 the two files drain as
    two batches, and the batch-2 event's gap must be measured against
    the user's LAST batch-1 event, not NULL."""
    import time as _time
    import uuid

    import pandas as pd

    from aichemy_data_pipelines_spark.streaming.watch import (
        stream_user_gap_alerts,
    )

    src_dir = tmp_path / "evsrc"
    src_dir.mkdir()

    def write_file(events, name):
        pd.DataFrame(
            {
                "event_id": [e[0] for e in events],
                "ts": pd.array(
                    [pd.Timestamp(e[1]).value for e in events],
                    dtype="int64",
                ),
                "user_id": [7] * len(events),
                "event_type": ["view"] * len(events),
                "value": [1.0] * len(events),
                "props": ["{}"] * len(events),
            }
        ).to_parquet(str(src_dir / name))

    write_file(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:10:00")],
        "events_a.parquet",
    )
    _time.sleep(0.05)  # distinct mtimes -> deterministic batch order
    write_file([(3, "2024-01-01 02:10:00")], "events_b.parquet")

    name = f"gaps_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream_user_gap_alerts(
            spark, str(src_dir), str(tmp_path / "ckpt"),
            table_name=name, glob="*.parquet", max_files_per_trigger=1,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    rows = {r.event_id: r for r in spark.table(name).collect()}
    assert rows[1].gap_us is None and not rows[1].is_rapid
    assert rows[2].gap_us == 600_000_000 and rows[2].is_rapid
    # the batch-2 event: state supplied 00:10 -> gap = 2h, not NULL
    assert rows[3].gap_us == 7_200_000_000
    assert not rows[3].is_rapid  # 2 h >= the 1 h rapid threshold
