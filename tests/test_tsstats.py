"""Ground-truth tests for operators/tsstats_ops.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.tsstats_ops import (
    events_autocorrelation,
    events_changepoint_cusum,
    events_rate_limit_screen,
)

_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(f"{path}/events.parquet")


def test_autocorrelation_alternating_and_constant(spark, tmp_path):
    """Per-day alternating 2/0 counts -> lag-1 acf = -1 exactly;
    a constant series has zero variance -> NULL acf (not inf/crash)."""
    rows = []
    eid = 0
    for d in range(1, 15):  # 14 days
        day = f"2024-01-{d:02d} 01:00:00"
        if d % 2 == 1:  # odd days: 2 'alt' events, even days: 0
            for _ in range(2):
                rows.append((eid, day, 1, "alt", 1.0, "{}"))
                eid += 1
        rows.append((eid, day, 2, "const", 1.0, "{}"))  # 1/day always
        eid += 1
    sf = str(tmp_path)
    _write_events(spark, sf, rows)
    got = {
        (r.event_type, r.lag): r
        for r in events_autocorrelation(spark, sf).collect()
    }
    assert got[("alt", 1)].acf == -1.0
    assert got[("alt", 1)].n_pairs == 13
    # period-2 series: lag 7 (odd) also anti-correlated
    assert got[("alt", 7)].acf == -1.0
    assert got[("const", 1)].acf is None
    assert got[("const", 7)].acf is None


def test_changepoint_finds_level_shift(spark, tmp_path):
    """10 quiet days (1/day) then 5 loud days (7/day): the CUSUM
    argmax lands on the last pre-shift day with the exact segment
    means."""
    rows = []
    eid = 0
    for d in range(1, 16):
        per = 1 if d <= 10 else 7
        for _ in range(per):
            rows.append(
                (eid, f"2024-03-{d:02d} 12:00:00", 1, "x", 1.0, "{}")
            )
            eid += 1
    sf = str(tmp_path)
    _write_events(spark, sf, rows)
    [r] = events_changepoint_cusum(spark, sf).collect()
    assert r.cp_day == "2024-03-10" and r.t_split == 10
    assert r.n_days == 15
    assert r.mean_before == 1.0 and r.mean_after == 7.0
    # stat = |n*S_t - t*S_n| = |15*10 - 10*45| = 300
    assert r.cusum_stat == 300


def test_rate_limit_sliding_window_straddles_hours(spark, tmp_path):
    """60 events from 01:30 to 02:29 straddle the hour boundary: an
    hourly BUCKET sees only 30+30, the sliding RANGE frame sees the
    true 60-burst and flags it; a sparse user stays unflagged."""
    rows = []
    for i in range(60):
        mm = 30 + i
        rows.append(
            (
                i,
                f"2024-05-01 {1 + mm // 60:02d}:{mm % 60:02d}:00",
                7,
                "x",
                1.0,
                "{}",
            )
        )
    rows.append((1000, "2024-05-01 01:00:00", 8, "x", 1.0, "{}"))
    rows.append((1001, "2024-05-01 09:00:00", 8, "x", 1.0, "{}"))
    sf = str(tmp_path)
    _write_events(spark, sf, rows)
    got = {r.user_id: r for r in
           events_rate_limit_screen(spark, sf).collect()}
    assert got[7].peak_1h == 60 and got[7].flagged is True
    assert got[8].peak_1h == 1 and got[8].flagged is False
    assert got[8].n_events == 2


def test_autocorrelation_counts_zero_days(spark, tmp_path):
    """A type with one event on day 1 and one on day 3 over a 3-day
    span: the zero-filled series is [1,0,1], so lag-1 pairs are
    (1,0),(0,1) -> acf = -1; dropping the empty day 2 would instead
    pair the two spikes and report +... (the bug the grid prevents)."""
    rows = [
        (1, "2024-06-01 01:00:00", 1, "sparse", 1.0, "{}"),
        (2, "2024-06-03 01:00:00", 1, "sparse", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    _write_events(spark, sf, rows)
    got = {
        (r.event_type, r.lag): r
        for r in events_autocorrelation(spark, sf).collect()
    }
    assert got[("sparse", 1)].n_pairs == 2
    assert got[("sparse", 1)].acf == -1.0


def test_forecast_backtest_short_span_yields_empty(spark, tmp_path):
    """r06 ADVICE: on a corpus spanning < 8 days, Spark's sequence()
    would raise ILLEGAL_SEQUENCE_BOUNDARIES while the DuckDB oracle's
    generate_series returns zero rows — the span guard must make the
    operator return an empty (not crash) backtest, matching the
    oracle's empty set."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_forecast_backtest,
    )

    rows = [
        (i, f"2024-01-{d:02d} 01:00:00", 1, "a", 1.0, "{}")
        for i, d in enumerate((1, 2, 3))
    ]
    sf = str(tmp_path)
    _write_events(spark, sf, rows)
    out = events_forecast_backtest(spark, sf)
    assert out.count() == 0
    # schema intact even when empty (driver canonicalizer relies on it)
    assert out.columns == [
        "event_type", "n_days", "n_actual", "mae", "mean_bias"
    ]
