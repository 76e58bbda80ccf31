"""Equality tests for time-series scale variants: a scale-path
rewrite must be result-identical to its simple twin, not just
oracle-green (the oracle can't see plan shape; these pin it
Spark-vs-Spark at sf0.001 AND on a crafted cross-day fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.timeseries import (
    events_asof_join,
    events_asof_join_bucketed,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(
        (r.purchase_id, r.user_id, r.purchase_ts, r.last_click_id, r.since_click_us)
        for r in df.collect()
    )


def test_asof_bucketed_equals_plain(spark):
    assert _rows(events_asof_join_bucketed(spark, SF_SMOKE)) == _rows(
        events_asof_join(spark, SF_SMOKE)
    )


def test_asof_bucketed_cross_day_seed(spark, tmp_path, monkeypatch):
    """A purchase whose last click happened DAYS earlier (with empty
    days and click-less days between) must pick up the carried seed —
    the case the per-day bucket alone would miss."""
    rows = [
        # user 1: click day 1, purchase day 5 (3 empty days between)
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (5, "2024-01-05 09:00:00", 1, "purchase", 5.0, "{}"),
        # user 1: same-day click then purchase (intra-day path)
        (6, "2024-01-05 10:00:00", 1, "click", 1.0, "{}"),
        (7, "2024-01-05 11:00:00", 1, "purchase", 2.0, "{}"),
        # user 2: purchase with NO prior click ever -> nulls
        (8, "2024-01-03 08:00:00", 2, "purchase", 9.0, "{}"),
        # user 2: two clicks on one day, purchase next day -> latest wins
        (9, "2024-01-03 12:00:00", 2, "click", 1.0, "{}"),
        (10, "2024-01-03 12:30:00", 2, "click", 1.0, "{}"),
        (11, "2024-01-04 07:00:00", 2, "purchase", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "fixture"
    df.coalesce(1).write.parquet(str(d / "events.parquet"))

    got = {
        r.purchase_id: (r.last_click_id, r.since_click_us)
        for r in events_asof_join_bucketed(spark, str(d)).collect()
    }
    h_us = 3_600 * 1_000_000
    assert got == {
        5: (1, 95 * h_us),     # cross-multi-day seed
        7: (6, 1 * h_us),      # intra-day click wins over seed
        8: (None, None),       # no click ever
        11: (10, 18 * h_us + 30 * 60 * 1_000_000),  # latest of prior day
    }, got


def test_time_weighted_avg_hand_computed(spark, tmp_path):
    """TWA on a crafted step function: value 10.00 held for 3h, then
    1.00 for 1h -> integral (10*3 + 1*1)/4 = 7.75, NOT the arithmetic
    mean 5.5 (burst over-weighting is what TWA exists to fix).
    Zero-span day -> min value of the instant."""
    from aichemy_data_pipelines_spark.operators.timeseries import (
        events_time_weighted_avg,
    )

    rows = [
        # user 1: 10.00@00:00, 1.00@03:00, close 04:00 (value ignored
        # for area, ends the span)
        (1, "2024-02-01 00:00:00", 1, "click", 10.0, "{}"),
        (2, "2024-02-01 03:00:00", 1, "click", 1.0, "{}"),
        (3, "2024-02-01 04:00:00", 1, "click", 99.0, "{}"),
        # user 2: single event -> twa = value
        (4, "2024-02-01 12:00:00", 2, "click", 7.5, "{}"),
        # user 3: two events at the SAME instant -> min value
        (5, "2024-02-01 08:00:00", 3, "click", 9.0, "{}"),
        (6, "2024-02-01 08:00:00", 3, "click", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    from pyspark.sql import functions as F

    df.withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.user_id: (r.n_events, r.twa_value)
        for r in events_time_weighted_avg(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (3, round((10.0 * 3 + 1.0 * 1) / 4, 6)),
        2: (1, 7.5),
        3: (2, 2.0),
    }, got
