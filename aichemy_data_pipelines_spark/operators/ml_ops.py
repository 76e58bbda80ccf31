"""In-engine ML training primitives — the histogram-based split
search that tree learners (XGBoost/LightGBM-style) run as their inner
loop, expressed as DataFrame aggregation so it trains where the data
lives.

``events_decision_stump`` fits a depth-1 classifier predicting
``event_type == 'purchase'`` from ``value``: bucket the feature into
fixed-width bins (ONE map-side-combined agg over the corpus — the
histogram pass), then score every candidate split threshold with
cumulative positive/negative counts and pick the minimum-
misclassification split. All counts are exact integers and the
tie-break is deterministic (lowest bin), so even model TRAINING is
value-checked against the DuckDB oracle — FP impurity scores would
be summation-order-dependent and wouldn't be.

Scale: the corpus-sized work is the single histogram agg (bins are
bounded, here width-5 over [0, 500)); the cumsum/argmin run over the
~100-row bin table. This is exactly how distributed GBDT frameworks
make split search data-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table

_BIN_W = 5


def events_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single split "value <= (bin+1)*W" for purchase vs rest.

    Output: one row (split_bin, left_pos, left_neg, right_pos,
    right_neg, misclass, accuracy) — left = rows with
    bin <= split_bin, predicted class = majority on each side.
    """
    ev = load_table(spark, sf_dir, "events")
    bins = (
        ev.select(
            F.expr(f"cast(floor(value / {_BIN_W}) as bigint)").alias("bin"),
            (F.col("event_type") == "purchase").cast("long").alias("pos"),
        )
        .groupBy("bin")
        .agg(
            F.sum("pos").alias("npos"),
            (F.count("*") - F.sum("pos")).alias("nneg"),
        )
    )
    tot = bins.agg(
        F.sum("npos").alias("tpos"), F.sum("nneg").alias("tneg")
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        bins.select(
            "bin",
            F.sum("npos").over(w).alias("lpos"),
            F.sum("nneg").over(w).alias("lneg"),
        )
        .crossJoin(F.broadcast(tot))
    )
    scored = cum.select(
        "bin",
        "lpos",
        "lneg",
        (F.col("tpos") - F.col("lpos")).alias("rpos"),
        (F.col("tneg") - F.col("lneg")).alias("rneg"),
        F.least(
            F.col("lpos") + (F.col("tneg") - F.col("lneg")),
            F.col("lneg") + (F.col("tpos") - F.col("lpos")),
        ).alias("misclass"),
        (F.col("tpos") + F.col("tneg")).alias("n"),
    )
    wb = Window.orderBy("misclass", "bin")
    return (
        scored.withColumn("rk", F.row_number().over(wb))
        .where(F.col("rk") == 1)
        .select(
            F.col("bin").alias("split_bin"),
            F.col("lpos").alias("left_pos"),
            F.col("lneg").alias("left_neg"),
            F.col("rpos").alias("right_pos"),
            F.col("rneg").alias("right_neg"),
            "misclass",
            F.round(1.0 - F.col("misclass") / F.col("n"), 6).alias(
                "accuracy"
            ),
        )
    )


def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS trend of daily purchase revenue: slope and
    intercept of cents-vs-day-index, from the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) — ALL exact integers (x = day
    index, y = integer cents), so the only FP is the final two
    divisions, identical in any engine.

    This is the distributed-regression shape: one pass computes the
    sufficient statistics with map-side combine; the model solve is
    O(1) on the driver side of the plan. Output: one row (n_days,
    slope_cents_per_day, intercept_cents), 6dp.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.expr("sum(cast(round(value * 100) as bigint))").alias("cents")
        )
    )
    d0 = daily.agg(F.min("day").alias("day0"))
    xy = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("day", "day0").cast("long").alias("x"),
        F.col("cents").alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = "cast(n * sxy - sx * sy as double) / cast(n * sxx - sx * sx as double)"
    return s.select(
        F.col("n").alias("n_days"),
        F.expr(f"round({slope}, 6)").alias("slope_cents_per_day"),
        F.expr(
            f"round((cast(sy as double) - ({slope}) * cast(sx as double)) "
            "/ cast(n as double), 6)"
        ).alias("intercept_cents"),
    )


QUERIES = {
    "events_decision_stump": events_decision_stump,
    "events_linear_trend": events_linear_trend,
}

ORACLE = {
    "events_linear_trend": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), d0 AS (SELECT MIN(day) AS day0 FROM daily),
        xy AS (
            SELECT CAST(date_diff('day', d0.day0, d.day) AS BIGINT) AS x,
                   d.cents AS y
            FROM daily d, d0
        ), s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM xy
        )
        SELECT n AS n_days,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                 AS slope_cents_per_day,
               round((CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE), 6) AS intercept_cents
        FROM s
    """,
    "events_decision_stump": f"""
        WITH bins AS (
            SELECT CAST(floor(value / {_BIN_W}) AS BIGINT) AS bin,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS npos,
                   CAST(COUNT(*) - SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS nneg
            FROM events GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(npos) AS BIGINT) AS tpos,
                   CAST(SUM(nneg) AS BIGINT) AS tneg
            FROM bins
        ), cum AS (
            SELECT bin,
                   CAST(SUM(npos) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS lpos,
                   CAST(SUM(nneg) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS lneg
            FROM bins
        ), scored AS (
            SELECT c.bin, c.lpos, c.lneg,
                   t.tpos - c.lpos AS rpos,
                   t.tneg - c.lneg AS rneg,
                   least(c.lpos + (t.tneg - c.lneg),
                         c.lneg + (t.tpos - c.lpos)) AS misclass,
                   t.tpos + t.tneg AS n
            FROM cum c, tot t
        )
        SELECT bin AS split_bin, lpos AS left_pos, lneg AS left_neg,
               rpos AS right_pos, rneg AS right_neg, misclass,
               round(1.0 - CAST(misclass AS DOUBLE) / n, 6) AS accuracy
        FROM scored
        ORDER BY misclass, bin
        LIMIT 1
    """,
}
