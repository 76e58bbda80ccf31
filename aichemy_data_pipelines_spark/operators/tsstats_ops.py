"""Time-series statistics: autocorrelation, CUSUM changepoint
location, and a sliding-window rate-limit screen.

These are the capacity-planning / abuse-detection diagnostics a
telemetry warehouse runs nightly over its event stream: "is traffic
weekly-seasonal?" (ACF at lag 7), "when did the level shift?"
(CUSUM argmax), "which principals burst past the per-hour ceiling?"
(range-frame peak counts).

Determinism notes:
* ACF and the changepoint statistic are built ONLY from integer
  day-count sums (window/group aggregates of exact BIGINTs); the
  final Pearson / mean divisions are a single identical double chain
  rounded to 6dp, so both engines hash-match.
* Zero-variance series emit NULL acf explicitly via CASE (Spark's
  non-ANSI x/0 -> NULL vs DuckDB's IEEE inf would otherwise split).
* The rate-limit frame is a value-based RANGE over exact epoch
  MICROSECONDS — tie-insensitive by construction (row order within
  an equal timestamp cannot change a value-range count).

Scale notes:
* Both daily-series ops collapse the corpus with ONE map-side
  combined groupBy(event_type, day); everything after runs on the
  |types| x |days| grid (KBs at any corpus size).
* The rate-limit screen is one shuffle on user_id and a single
  sorted-window pass per user — the same plan shape as
  events_sessionize, which holds at 100 TB because state per key is
  one frame, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table

_ACF_LAGS = (1, 7)
# peak 1-hour event ceiling per user before the screen flags them
_RATE_LIMIT_PER_HOUR = 50
_HOUR_US = 3_600_000_000


def _daily_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled (event_type, day, n) over the corpus-wide day span.

    Absent days COUNT as 0 — ACF/changepoint on an observed-days-only
    series would silently splice out gaps and shift every lag.

    The (type, day, n) aggregate is ``localCheckpoint``-ed and the
    day span / type registry are DERIVED FROM IT (every event
    contributes a daily row, so min/max day and distinct types are
    identical by construction): left lazy, each of the three
    subframes re-embedded its own full events scan, and the grid
    itself is referenced twice by the ACF lag join — 6 events scans
    in one physical plan (round-10 plan audit). Checkpointed, the
    corpus collapses in ONE scan and every consumer plan reads only
    the bounded |types|x|days| RDD (pinned in tests/test_plans.py).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint()
    )
    span = daily.agg(
        F.min("day").alias("lo"),
        F.max("day").alias("hi"),
    )
    days = span.select(
        F.explode(
            F.expr("sequence(lo, hi, interval 1 day)")
        ).alias("day")
    )
    types = daily.select("event_type").distinct()
    return (
        types.crossJoin(F.broadcast(days))
        .join(daily, ["event_type", "day"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0).cast("long")))
    )


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson autocorrelation of each type's daily-count series at
    lags 1 and 7 (day-over-day persistence and weekly seasonality).

    acf_k = (np*Sxy - Sx*Sy) / sqrt((np*Sxx - Sx^2)(np*Syy - Sy^2))
    over the (x_t, x_{t+k}) pairs of the zero-filled grid; counts are
    BIGINT and the moment sums/products exact DECIMALs (overflow-safe
    to 10^38 — sx² wraps int64 silently in Spark but raises in
    DuckDB, so BIGINT math would diverge in failure mode at scale);
    the final chain is one rounded double.
    Constant series (zero variance on either side) emit NULL.

    Scale: corpus collapses in one groupBy; the lag self-join and the
    moment agg run on the bounded grid.
    """
    g = _daily_grid(spark, sf_dir)
    lags = spark.createDataFrame(
        [(k,) for k in _ACF_LAGS], "lag int"
    )
    lagged = g.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        F.date_add("day", F.col("lag")).alias("day"),
        F.col("n").alias("x"),
    )
    pairs = lagged.join(
        g.select("event_type", "day", F.col("n").alias("y")),
        ["event_type", "day"],
    )
    # Moment sums and their products run in DECIMAL, not BIGINT: at
    # large scale sx² / Σx² exceed int64, where Spark's non-ANSI
    # multiply WRAPS silently (wrong acf) while DuckDB RAISES — the
    # engines would diverge in failure mode (r06 ADVICE). The decimal
    # shapes below bind identically in both engines and produce the
    # same integers as the old BIGINT math at any non-overflowing
    # scale. Safe domain (r07 ADVICE — a DECIMAL(38) product cannot
    # carry both factors at full width, so the _var casts split the
    # 38 digits): np ≤ 10⁸ pairs and moment sums ≤ 10³⁰ — i.e. up to
    # ~10⁸ per-type days of counts up to ~10¹¹/day. Beyond that the
    # narrowing cast NULLs here where DuckDB raises; both are far
    # past any real grid (10⁸ days ≈ 270k years).
    d19 = "decimal(19,0)"
    m = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("long").alias("np"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19)).alias("syy"),
    )

    def _var(n, s2, s):
        return F.col(n).cast("decimal(8,0)") * F.col(s2).cast(
            "decimal(30,0)"
        ) - F.col(s).cast(d19) * F.col(s).cast(d19)

    varx = _var("np", "sxx", "sx")
    vary = _var("np", "syy", "sy")
    cov = F.col("np").cast("decimal(8,0)") * F.col("sxy").cast(
        "decimal(30,0)"
    ) - F.col("sx").cast(d19) * F.col("sy").cast(d19)
    return m.select(
        "event_type",
        "lag",
        F.col("np").alias("n_pairs"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                cov.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double")),
                6,
            ),
        ).alias("acf"),
    )


def events_changepoint_cusum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM changepoint location per event type: the split day
    t maximizing |n*S_t - t*S_n| over the zero-filled daily series
    (the classic argmax_t |sum_{i<=t}(x_i - mean)| estimator, scaled
    by n so it stays integer-exact). Earliest day wins ties.

    Output: (event_type, cp_day, t_split, n_days, cusum_stat,
    mean_before, mean_after) — before/after means are the one
    rounded double each.

    Scale: one corpus groupBy, then per-type windows over the bounded
    grid; the argmax is a row_number pick, no second corpus pass.
    """
    g = _daily_grid(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    tot = Window.partitionBy("event_type")
    scored = (
        g.withColumn("t", F.row_number().over(w).cast("long"))
        .withColumn("s_t", F.sum("n").over(w).cast("long"))
        .withColumn("n_days", F.count("*").over(tot).cast("long"))
        .withColumn("s_n", F.sum("n").over(tot).cast("long"))
        .where(F.col("t") < F.col("n_days"))
        .withColumn(
            "stat",
            F.abs(
                F.col("n_days") * F.col("s_t")
                - F.col("t") * F.col("s_n")
            ),
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.desc("stat"), F.asc("day")
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            F.col("t").alias("t_split"),
            "n_days",
            F.col("stat").alias("cusum_stat"),
            F.round(
                F.col("s_t").cast("double") / F.col("t"), 6
            ).alias("mean_before"),
            F.round(
                (F.col("s_n") - F.col("s_t")).cast("double")
                / (F.col("n_days") - F.col("t")),
                6,
            ).alias("mean_after"),
        )
    )


def events_rate_limit_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Peak 1-hour sliding event count per user + over-ceiling flag —
    the burst/abuse screen a rate limiter is tuned against.

    The frame is a value RANGE of exactly one hour of epoch
    MICROSECONDS ending at each event, so the peak is the true
    sliding-window maximum (not an hourly bucket, which halves worst-
    case bursts straddling a boundary).

    Scale: one shuffle on user_id, one sorted range-frame pass; state
    is a single frame per user.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-(_HOUR_US - 1), 0)
    )
    return (
        ev.withColumn("in_hour", F.count("*").over(frame))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("in_hour").cast("long").alias("peak_1h"),
        )
        .withColumn(
            "flagged", F.col("peak_1h") > F.lit(_RATE_LIMIT_PER_HOUR)
        )
    )


QUERIES = {
    "events_autocorrelation": events_autocorrelation,
    "events_changepoint_cusum": events_changepoint_cusum,
    "events_rate_limit_screen": events_rate_limit_screen,
}

_SQL_GRID = """
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo,
               MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ), days AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM span
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), grid AS (
        SELECT t.event_type, d.day, COALESCE(a.n, 0) AS n
        FROM types t
        CROSS JOIN days d
        LEFT JOIN daily a
          ON a.event_type = t.event_type AND a.day = d.day
    )
"""

ORACLE = {
    "events_autocorrelation": f"""
        WITH {_SQL_GRID}, lags AS (
            SELECT unnest([{", ".join(str(k) for k in _ACF_LAGS)}])
                     AS lag
        ), pairs AS (
            SELECT g.event_type, l.lag, g.n AS x, h.n AS y
            FROM grid g
            CROSS JOIN lags l
            JOIN grid h
              ON h.event_type = g.event_type
             AND h.day = g.day + l.lag * INTERVAL 1 DAY
        ), m AS (
            SELECT event_type, lag,
                   CAST(COUNT(*) AS BIGINT) AS np,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                     AS sxy,
                   SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                     AS sxx,
                   SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                     AS syy
            FROM pairs GROUP BY 1, 2
        ), v AS (
            -- overflow-safe moments, mirroring the Spark side
            -- bit-for-bit. Same safe domain as the Spark comment on
            -- the _var casts: a DECIMAL(38) product cannot carry both
            -- factors at full width, so exactness holds for np <= 10^8
            -- pairs and moment sums <= 10^30; beyond that Spark's
            -- narrowing cast NULLs where DuckDB raises — both far past
            -- any real grid (10^8 days ~ 270k years)
            SELECT event_type, lag, np,
                   CAST(np AS DECIMAL(8,0)) * CAST(sxx AS DECIMAL(30,0))
                     - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                     AS varx,
                   CAST(np AS DECIMAL(8,0)) * CAST(syy AS DECIMAL(30,0))
                     - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                     AS vary,
                   CAST(np AS DECIMAL(8,0)) * CAST(sxy AS DECIMAL(30,0))
                     - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                     AS cov
            FROM m
        )
        SELECT event_type, lag, np AS n_pairs,
               CASE WHEN varx > 0 AND vary > 0
                    THEN round(
                        CAST(cov AS DOUBLE)
                        / sqrt(CAST(varx AS DOUBLE)
                               * CAST(vary AS DOUBLE)),
                        6)
               END AS acf
        FROM v
    """,
    "events_changepoint_cusum": f"""
        WITH {_SQL_GRID}, scored AS (
            SELECT event_type, day,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
                   CAST(SUM(n) OVER w AS BIGINT) AS s_t,
                   CAST(COUNT(*) OVER tot AS BIGINT) AS n_days,
                   CAST(SUM(n) OVER tot AS BIGINT) AS s_n
            FROM grid
            WINDOW w AS (PARTITION BY event_type ORDER BY day),
                   tot AS (PARTITION BY event_type)
        ), interior AS (
            SELECT *, abs(n_days * s_t - t * s_n) AS stat
            FROM scored WHERE t < n_days
        ), picked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_type
                ORDER BY stat DESC, day ASC) AS rk
            FROM interior
        )
        SELECT event_type,
               strftime(day, '%Y-%m-%d') AS cp_day,
               t AS t_split, n_days,
               stat AS cusum_stat,
               round(CAST(s_t AS DOUBLE) / t, 6) AS mean_before,
               round(CAST(s_n - s_t AS DOUBLE) / (n_days - t), 6)
                 AS mean_after
        FROM picked WHERE rk = 1
    """,
    "events_rate_limit_screen": f"""
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS us FROM events
        ), c AS (
            SELECT user_id,
                   COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN {_HOUR_US - 1} PRECEDING
                             AND CURRENT ROW) AS in_hour
            FROM e
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(in_hour) AS BIGINT) AS peak_1h,
               MAX(in_hour) > {_RATE_LIMIT_PER_HOUR} AS flagged
        FROM c GROUP BY user_id
    """,
}
