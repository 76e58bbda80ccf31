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


_CMS_DEPTH = 4
_CMS_WIDTH = 1024
_CMS_TOP_K = 20


def events_heavy_hitters_cms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-K users by event count, estimated through a COUNT-MIN
    SKETCH (Cormode & Muthukrishnan 2005) built relationally:

    1. sketch build — one pass over events: for each of d=4 depths,
       bucket = portable_hash(depth:user) % w=1024, counted with one
       groupBy (map-side combined). The whole sketch is d·w = 4096
       rows — the megabytes-for-terabytes trade, same as the HLL
       table above;
    2. query — each candidate key probes its d buckets (broadcast
       join against the sketch) and takes the MIN — the CMS
       overestimate-only guarantee;
    3. report — top-K by estimate, with the exact count alongside
       (est >= exact ALWAYS; at test scale the exact side grounds
       the oracle, at 100 TB you would keep only the sketch).

    Candidate enumeration here is distinct-keys (fine when the key
    space fits a scan); a true streaming heavy-hitter keeps a
    candidate heap beside the sketch — the sketch table and probe
    plan are identical either way.

    Oracle: deterministic portable hashing makes every bucket, the
    whole sketch, and therefore the estimates bit-reproducible in
    DuckDB.
    """
    from aichemy_data_pipelines_spark.functions.hashing import spark_hash64

    ev = load_table(spark, sf_dir, "events")
    depths = ", ".join(str(j) for j in range(_CMS_DEPTH))
    hh = spark_hash64(
        "concat(cast(j as string), ':', cast(user_id as string))"
    )
    bucketed = ev.select("user_id").select(
        "user_id",
        F.explode(F.expr(f"array({depths})")).alias("j"),
    ).select(
        "j", F.expr(f"abs({hh}) % {_CMS_WIDTH}").alias("bucket")
    )
    sketch = bucketed.groupBy("j", "bucket").agg(
        F.count("*").alias("c")
    )
    keys = ev.select("user_id").distinct().select(
        "user_id", F.explode(F.expr(f"array({depths})")).alias("j")
    ).select(
        "user_id",
        "j",
        F.expr(f"abs({hh}) % {_CMS_WIDTH}").alias("bucket"),
    )
    est = (
        keys.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    return (
        est.join(exact, "user_id")
        .orderBy(F.desc("est_count"), "user_id")
        .limit(_CMS_TOP_K)
        .select(
            "user_id",
            "est_count",
            "n_exact",
            (F.col("est_count") >= F.col("n_exact")).alias(
                "overestimate_ok"
            ),
        )
    )



_QH_WIDTH = "2.0"  # histogram bucket width in value units


def events_quantile_histogram_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable QUANTILE sketches: per-day bucketed value histograms
    per event type, merged to all-time quantile estimates — the
    quantile twin of events_hll_rollup.  Where percentile_approx
    answers one ad-hoc query with an unmergeable plan, the production
    form persists a tiny fixed-width histogram per (type, day)
    (mergeable by integer addition, associative and re-aggregatable
    to ANY coarser grain) and reads quantiles off the merged
    cumulative curve.

    Estimates are bucket LOWER BOUNDS (bucket width 2.0), so the
    error is bounded by the width by construction; everything is
    exact integer arithmetic and hash-checkable — no sketch
    randomness at all.

    Output: (event_type, n_days, n_events, p50_lo, p90_lo, p99_lo).

    Scale: the daily sketch table is #types × #days × #buckets rows
    (kilobytes per year); the merge is one bounded groupBy; the
    quantile read is a window over ≤ #buckets rows per type.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("cast(ts as date)").alias("day"),
        F.expr(f"cast(floor(value / {_QH_WIDTH}) as bigint)").alias("b"),
    ).agg(F.count("*").alias("c"))
    merged = daily.groupBy("event_type", "b").agg(
        F.sum("c").cast("long").alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cum = (
        merged.withColumn("cum", F.sum("c").over(w))
        .withColumn("total", F.sum("c").over(wt))
    )

    def q_lo(q: str):
        # smallest bucket whose cumulative count reaches ceil(q*total)
        return F.min(
            F.when(
                F.col("cum") * 100 >= F.expr(f"cast({q} as bigint) * total"),
                F.col("b"),
            )
        ) * F.expr(f"cast({_QH_WIDTH} as double)")

    # derived from the kilobyte-scale daily sketch table — NOT a
    # second scan of the raw events
    n_days = daily.groupBy("event_type").agg(
        F.countDistinct("day").cast("long").alias("n_days")
    )
    out = cum.groupBy("event_type").agg(
        F.max("total").cast("long").alias("n_events"),
        q_lo("50").alias("p50_lo"),
        q_lo("90").alias("p90_lo"),
        q_lo("99").alias("p99_lo"),
    )
    return out.join(F.broadcast(n_days), "event_type").select(
        "event_type", "n_days", "n_events", "p50_lo", "p90_lo", "p99_lo"
    )


QUERIES = {
    "events_quantile_histogram_rollup": events_quantile_histogram_rollup,
    "events_hll_rollup": events_hll_rollup,
    "events_heavy_hitters_cms": events_heavy_hitters_cms,
}

ORACLE = {
    "events_quantile_histogram_rollup": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(floor(value / {_QH_WIDTH}) AS BIGINT) AS b,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2, 3
        ), merged AS (
            SELECT event_type, b, CAST(SUM(c) AS BIGINT) AS c
            FROM daily GROUP BY event_type, b
        ), cum AS (
            SELECT event_type, b, c,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY b
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(c) OVER (PARTITION BY event_type) AS total
            FROM merged
        ), q AS (
            SELECT event_type,
                   CAST(MAX(total) AS BIGINT) AS n_events,
                   MIN(CASE WHEN cum * 100 >= 50 * total THEN b END)
                     * CAST({_QH_WIDTH} AS DOUBLE) AS p50_lo,
                   MIN(CASE WHEN cum * 100 >= 90 * total THEN b END)
                     * CAST({_QH_WIDTH} AS DOUBLE) AS p90_lo,
                   MIN(CASE WHEN cum * 100 >= 99 * total THEN b END)
                     * CAST({_QH_WIDTH} AS DOUBLE) AS p99_lo
            FROM cum GROUP BY event_type
        ), nd AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                     AS n_days
            FROM events GROUP BY event_type
        )
        SELECT q.event_type, nd.n_days, q.n_events,
               q.p50_lo, q.p90_lo, q.p99_lo
        FROM q JOIN nd ON q.event_type = nd.event_type
    """,
    "events_hll_rollup": """
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_day_sketches,
               COUNT(DISTINCT user_id) AS n_users_exact,
               TRUE AS merged_in_bound
        FROM events GROUP BY event_type
    """,
}


def _cms_oracle() -> str:
    from aichemy_data_pipelines_spark.functions.hashing import sql_hash64

    depths = ", ".join(str(j) for j in range(_CMS_DEPTH))
    hh = sql_hash64(
        "concat(cast(j as varchar), ':', cast(user_id as varchar))"
    )
    return f"""
        WITH b AS (
            SELECT j, abs({hh}) % {_CMS_WIDTH} AS bucket
            FROM events, unnest([{depths}]) AS t(j)
        ), sketch AS (
            SELECT j, bucket, COUNT(*) AS c FROM b GROUP BY j, bucket
        ), kb AS (
            SELECT user_id, j, abs({hh}) % {_CMS_WIDTH} AS bucket
            FROM (SELECT DISTINCT user_id FROM events),
                 unnest([{depths}]) AS t(j)
        ), est AS (
            SELECT user_id, MIN(c) AS est_count
            FROM kb JOIN sketch USING (j, bucket) GROUP BY user_id
        ), exact AS (
            SELECT user_id, COUNT(*) AS n_exact FROM events
            GROUP BY user_id
        )
        SELECT user_id, est_count, n_exact,
               est_count >= n_exact AS overestimate_ok
        FROM est JOIN exact USING (user_id)
        ORDER BY est_count DESC, user_id LIMIT {_CMS_TOP_K}
    """


ORACLE["events_heavy_hitters_cms"] = _cms_oracle()
