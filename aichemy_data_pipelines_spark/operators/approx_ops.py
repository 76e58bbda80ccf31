"""Approximate-aggregate tier — the sketches that actually run at
100 TB, oracle-checked via error-bound booleans.

Exact percentiles need a per-group sort and exact COUNT(DISTINCT)
needs an expand+dedup shuffle; at corpus scale both give way to
mergeable sketches:

* ``approx_percentile`` — Greenwald-Khanna-style quantile summaries:
  map-side partial sketches, constant-size merge, rank error
  ≤ 1/accuracy.
* ``approx_count_distinct`` — HyperLogLog++: fixed 2^p registers,
  relative standard deviation set by ``rsd``.

Oracle strategy: a sketch value can't hash-match another engine, so
each query emits (a) the EXACT statistic (decimal/bigint — the
hashable payload) and (b) booleans asserting the sketch landed
inside its guaranteed error bound. The DuckDB oracle computes the
same exact statistics and TRUE literals — so a drifting sketch or a
broken bound breaks the hash match. Both sketches are deterministic
for a fixed dataset (hash-based registers / order-insensitive
merges), so the booleans are stable across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table

# approx_percentile rank error is 1/accuracy (1e-4 at the 10000
# default); we assert against exact quantiles at p ± 0.02 — 200x the
# guarantee, so the boolean is robustly true yet still catches a
# broken sketch (which lands far outside).
_RANK_SLACK = 0.02
# HLL++ at rsd=0.05: assert within 3x the std dev (99.7% mass); the
# check is deterministic because HLL is — a real regression (e.g.
# wrong column) lands orders of magnitude away.
_HLL_RSD = 0.05
_HLL_SLACK = 3 * _HLL_RSD


def events_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p90 of value: exact (hashable) + sketch-in-bound
    booleans for the approx_percentile twin.

    Scale: the sketch agg is one map-side-combined pass — no per-group
    sort; this is the form events_percentiles takes at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    lo50, hi50 = 0.5 - _RANK_SLACK, 0.5 + _RANK_SLACK
    lo90, hi90 = 0.9 - _RANK_SLACK, 0.9 + _RANK_SLACK
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.count("*").alias("n"),
        F.expr(
            f"approx_percentile(value, 0.5) >= percentile(value, {lo50}) "
            f"AND approx_percentile(value, 0.5) <= percentile(value, {hi50})"
        ).alias("p50_in_bound"),
        F.expr(
            f"approx_percentile(value, 0.9) >= percentile(value, {lo90}) "
            f"AND approx_percentile(value, 0.9) <= percentile(value, {hi90})"
        ).alias("p90_in_bound"),
    )


def distinct_counts_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lineitem distinct counts (hashable) + HLL-in-bound
    booleans for the approx_count_distinct twins.

    Scale: HLL is the 100 TB form — fixed-size registers, no expand;
    the exact columns keep the oracle bit-comparable.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def bounded(col: str) -> F.Column:
        return (
            (
                F.abs(
                    F.expr(f"approx_count_distinct({col}, {_HLL_RSD})")
                    - F.countDistinct(col)
                )
                / F.countDistinct(col)
            )
            <= _HLL_SLACK
        )

    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        bounded("l_orderkey").alias("orders_in_bound"),
        bounded("l_partkey").alias("parts_in_bound"),
        bounded("l_suppkey").alias("supps_in_bound"),
    )


QUERIES = {
    "events_approx_percentiles": events_approx_percentiles,
    "distinct_counts_approx": distinct_counts_approx,
}

ORACLE = {
    "events_approx_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               COUNT(*) AS n,
               TRUE AS p50_in_bound,
               TRUE AS p90_in_bound
        FROM events GROUP BY event_type
    """,
    "distinct_counts_approx": """
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               TRUE AS orders_in_bound,
               TRUE AS parts_in_bound,
               TRUE AS supps_in_bound
        FROM lineitem
    """,
}
