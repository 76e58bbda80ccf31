"""Mergeable-sketch rollups — pre-aggregated HyperLogLog sketches
re-aggregated to coarser grains, the pattern behind every 100 TB
"distinct users" dashboard.

``approx_count_distinct`` (operators/approx_ops.py) answers one
ad-hoc query; this module demonstrates the *storage* form: persist a
small fixed-size Apache DataSketches HLL sketch per (dimension,
day), then answer month/era/total uniques by UNIONING sketches —
no rescan of the raw events. On a 100 TB event store the daily
sketch table is megabytes, and any rollup over it is interactive.

Oracle strategy (same contract as approx_ops): a sketch estimate
can't hash-match another engine, so the query emits the EXACT
distinct counts (the hashable payload) plus a boolean asserting the
merged-sketch estimate landed inside its error bound; the DuckDB
oracle computes the same exact stats and a TRUE literal. HLL state
depends only on the SET of inserted values (per-register max) and
union takes per-register max, so the boolean is deterministic across
runs, partitionings, and merge orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table

# lgConfigK=12 -> 4096 registers, relative std dev ~1.04/sqrt(4096)
# = 1.6%; assert within 3x (99.7% mass). Deterministic for a fixed
# dataset (see module doc), so the boolean is stable.
_LG_K = 12
_SLACK = 3 * 1.04 / (2 ** (_LG_K / 2))


def events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily HLL user sketches per event_type, unioned to an
    all-time estimate, validated against the exact distinct count.

    Output: (event_type, n_day_sketches, n_users_exact,
    merged_in_bound).

    Scale: stage 1 is one map-side-combined agg producing a
    kilobyte-sized sketch per (type, day) — the persisted artifact;
    stage 2 unions ~365 sketches per type (trivial). The exact
    countDistinct here exists only to ground the oracle; at 100 TB
    you'd never run it — that is the point of the sketch table.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_day_sketches"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_day_sketches",
        "n_users_exact",
        (
            F.abs(F.col("est") - F.col("n_users_exact"))
            / F.col("n_users_exact")
            <= _SLACK
        ).alias("merged_in_bound"),
    )


QUERIES = {"events_hll_rollup": events_hll_rollup}

ORACLE = {
    "events_hll_rollup": """
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_day_sketches,
               COUNT(DISTINCT user_id) AS n_users_exact,
               TRUE AS merged_in_bound
        FROM events GROUP BY event_type
    """,
}
