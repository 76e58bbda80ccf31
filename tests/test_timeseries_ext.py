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
