"""Oracle-checked STREAMING queries.

Each entry drains a Structured Streaming query over the events table
(AvailableNow trigger, fresh checkpoint) into a memory sink and
returns the result — so the driver's DuckDB gate verifies the
*streaming* computation end-to-end, not just its batch twin:

* tumbling window counts (watermarked groupBy window),
* native session windows,
* the applyInPandasWithState per-user lifetime totals (integer-cents
  state → exact, engine-comparable sums).

Scale notes live with the implementations (streaming/watch.py);
checkpoints make every one of these exactly-once under retries.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.analytics_ext import (
    ORACLE as _ANALYTICS_ORACLE,
)
from aichemy_data_pipelines_spark.streaming.watch import (
    stream_click_attribution,
    stream_user_ewma,
    stream_user_gap_alerts,
    stream_dedup_keys,
    stream_enrich_counts,
    stream_sessionize,
    stream_tumbling_counts,
    stream_upsert_ledger,
    stream_user_running_totals,
)


def _drain(spark: SparkSession, runner, sf_dir: str) -> DataFrame:
    name = f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    # state-store partition count is frozen into the checkpoint at
    # first run; pin it so a caller session's default (200) doesn't
    # spin 200 tiny state tasks per micro-batch
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        runner(spark, sf_dir, ckpt, table_name=name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(spark, stream_tumbling_counts, sf_dir)


def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(spark, stream_sessionize, sf_dir)


def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _drain(spark, stream_user_running_totals, sf_dir)
    # keep each user's final update (single-batch drains emit one row
    # per user already; retries may emit more)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", "n_events", "sum_value")
    )


def streaming_enriched_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(spark, stream_enrich_counts, sf_dir)


def streaming_upsert_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the foreachBatch incremental-ledger sink (fresh ledger +
    checkpoint) and return the ledger contents; sum exposed in whole
    units like the stateful twin."""
    ledger = tempfile.mkdtemp(prefix="ledger_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_upsert_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        stream_upsert_ledger(spark, sf_dir, ledger, ckpt)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    from aichemy_data_pipelines_spark.pipeline.atomic import (
        AtomicParquetTable,
    )

    return AtomicParquetTable(ledger).read(spark).select(
        "user_id",
        "n_events",
        (F.col("cents") / 100.0).alias("sum_value"),
    )


def streaming_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the per-event stateful EWMA (bounded ≤7-value carry
    state per user) and dedupe on event_id (retried drains may
    re-emit; values are deterministic for a given prefix)."""
    df = _drain(spark, stream_user_ewma, sf_dir)
    return df.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "ewma"
    )


def streaming_gap_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the per-event cadence screen (one long of state per
    user) and dedupe on event_id (retried drains may re-emit; gaps
    are deterministic for a given prefix)."""
    df = _drain(spark, stream_user_gap_alerts, sf_dir)
    return df.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "gap_us", "is_rapid"
    )


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(spark, stream_click_attribution, sf_dir)


def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(spark, stream_dedup_keys, sf_dir)


QUERIES = {
    "streaming_gap_alerts": streaming_gap_alerts,
    "streaming_user_ewma": streaming_user_ewma,
    "streaming_click_attribution": streaming_click_attribution,
    "streaming_dedup_keys": streaming_dedup_keys,
    "streaming_upsert_totals": streaming_upsert_totals,
    "streaming_enriched_segments": streaming_enriched_segments,
    "streaming_tumbling_window": streaming_tumbling_window,
    "streaming_session_window": streaming_session_window,
    "streaming_user_totals": streaming_user_totals,
}

_batch_ewma_sql = _ANALYTICS_ORACLE["events_ewma"]

ORACLE = {
    # the streamed per-event gap stamps must equal a batch lag window
    # exactly (pure integer microsecond arithmetic, no float path)
    "streaming_gap_alerts": """
        SELECT event_id, user_id,
               gap_us,
               COALESCE(gap_us < 3600000000, FALSE) AS is_rapid
        FROM (
            SELECT event_id, user_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) AS gap_us
            FROM events
        )
    """,
    # the streamed per-event EWMA must equal the BATCH operator's
    # oracle exactly (same decimal->double->half-up chain)
    "streaming_user_ewma": (
        "SELECT event_id, user_id, ewma FROM ("
        + _batch_ewma_sql
        + ")"
    ),
    "streaming_click_attribution": """
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts > c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    "streaming_dedup_keys": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "streaming_upsert_totals": """
        SELECT user_id, COUNT(*) AS n_events,
               SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM events GROUP BY user_id
    """,
    "streaming_enriched_segments": """
        SELECT c_mktsegment,
               COUNT(*) AS n_events,
               SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM events
        JOIN customer
          ON user_id % (SELECT COUNT(*) FROM customer) + 1 = c_custkey
        GROUP BY c_mktsegment
    """,
    "streaming_tumbling_window": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS window_start,
               event_type, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "streaming_session_window": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   -- >= (not >): Spark's session_window end is
                   -- EXCLUSIVE (window = [start, last_ts + gap)), so
                   -- an event exactly gap after its predecessor opens
                   -- a NEW session — unlike batch events_sessionize,
                   -- which uses strictly-greater-than-gap
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                >= 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)
                     AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    """,
    "streaming_user_totals": """
        SELECT user_id, COUNT(*) AS n_events,
               SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM events GROUP BY user_id
    """,
}
