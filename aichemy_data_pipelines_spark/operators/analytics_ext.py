"""Further analytics operators: anomaly scoring, cohort retention,
histograms, and a compliance (right-to-be-forgotten) impact plan.

Determinism notes:
* z-scores avoid stddev_samp's engine-specific accumulation: the
  moments come from EXACT decimal sums (Σx at 2dp, Σx² at 4dp), so
  mean/std derive from identical doubles in both engines, then one
  identical arithmetic chain per row (rounded 6dp).
* histograms use integer bucket arithmetic; cohorts use month
  strings; the delete plan is pure joins/aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table

_SQL_SUM = "CAST(CAST(SUM({x}) AS DECIMAL(38,6)) AS DOUBLE)"


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 3 sample standard deviations above
    their type's mean — the batch anomaly sweep.

    Scale: one agg on event_type (broadcast back), one map pass; no
    second shuffle. Moments via exact decimal sums (see module note).
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr(
            "cast(cast(sum(cast(value as decimal(8,2))) as decimal(38,6)) "
            "as double)"
        ).alias("sx"),
        F.expr(
            "cast(cast(sum(cast(value as decimal(8,2)) "
            "* cast(value as decimal(8,2))) as decimal(38,6)) as double)"
        ).alias("sxx"),
    )
    stats = stats.select(
        "event_type",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn(
            "zscore", F.round((F.col("value") - F.col("mean")) / F.col("std"), 6)
        )
        .where(F.col("zscore") > 3)
        .select("event_id", "user_id", "event_type", "value", "zscore")
    )


def orders_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month; for
    each (cohort, activity-month) the count of distinct active
    customers and months-since-cohort.

    Scale: two aggs on o_custkey (exchange reused), then a tiny
    cohort×month agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort_month")
    )
    activity = orders.select(
        "o_custkey", F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).distinct()
    return (
        activity.join(first, "o_custkey")
        .groupBy("cohort_month", "month")
        .agg(F.countDistinct("o_custkey").alias("n_active"))
        .withColumn(
            "months_since",
            (
                F.substring("month", 1, 4).cast("int") * 12
                + F.substring("month", 6, 2).cast("int")
            )
            - (
                F.substring("cohort_month", 1, 4).cast("int") * 12
                + F.substring("cohort_month", 6, 2).cast("int")
            ),
        )
    )


def part_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram (10-unit buckets) per brand —
    integer bucket arithmetic, portable across engines.

    Scale: pure map + bounded-key agg.
    """
    part = load_table(spark, sf_dir, "part")
    bucket = F.floor(F.col("p_retailprice") / 10).cast("int")
    return (
        part.withColumn("bucket", bucket)
        .groupBy("p_brand", "bucket")
        .agg(
            F.count("*").alias("n_parts"),
            (F.col("bucket") * 10).cast("double").alias("bucket_low"),
        )
        .select("p_brand", "bucket", "bucket_low", "n_parts")
    )


def compliance_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact plan: for a deletion cohort
    (stand-in: user/customer key % 37 = 0), count affected rows per
    table BEFORE destructive deletes run — the audit step of a GDPR
    pipeline.

    Scale: per-table semi-join counts; each is key-pruned and
    shuffle-bounded by the cohort size. The actual delete is the same
    anti-join materialized back to storage (dynamic partition
    overwrite in sources/formats.py).

    PRECONDITION (enforced): the cohort broadcast assumes a
    request-queue-sized deletion list.  The testdata stand-in is a
    customer FRACTION (c_custkey % 37 ≈ 2.7%), which at 1e9+
    customers would not broadcast — a row-count guard
    (``spark.graft.compliance.maxBroadcastCohort``, default 1e7
    keys) falls back to unhinted semi-joins past the bound.
    """
    from aichemy_data_pipelines_spark.functions.hints import (
        COMPLIANCE_MAX_COHORT,
        broadcast_when,
        conf_int,
    )

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 37 == 0
    ).select(F.col("c_custkey").alias("key"))
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    n_cust = cust.count()
    cohort = broadcast_when(
        cust,
        n_cust,
        conf_int(spark, COMPLIANCE_MAX_COHORT, 10_000_000),
        "compliance_delete_plan",
    )
    ev_cnt = (
        events.join(
            cohort, events.user_id == cust.key, "left_semi"
        ).count()
    )
    ord_rows = orders.join(
        cohort, orders.o_custkey == cust.key, "left_semi"
    )
    ord_cnt = ord_rows.count()
    li_cnt = li.join(
        ord_rows.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).count()
    return spark.createDataFrame(
        [
            ("customer", n_cust),
            ("events", ev_cnt),
            ("orders", ord_cnt),
            ("lineitem", li_cnt),
        ],
        "table_name string, n_rows bigint",
    )


def events_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users + row counts per event_type via the SALTED
    two-phase aggregation (functions/skew.py salted_distinct_count).

    event_type is the canonical hot key (5 values over the whole
    corpus): the plain plan funnels each type's entire distinct-user
    state through one task; the salted plan splits it 16 ways by
    hashing the DISTINCT column, so the partial distinct counts are
    over disjoint user slices and sum exactly.

    Oracle is the plain COUNT(DISTINCT) — the salted rewrite must be
    value-identical, not approximately right.
    """
    from aichemy_data_pipelines_spark.catalog import load_table as _lt
    from aichemy_data_pipelines_spark.functions.skew import (
        salted_distinct_count,
    )

    return salted_distinct_count(
        _lt(spark, sf_dir, "events"), "event_type", "user_id", n_salt=16
    )


_EWMA_LAGS = 8  # current event + 7 lags
# α = 0.5 → weights 2^-i: exact dyadic decimals, so the weighted sum
# is EXACT decimal arithmetic in both engines (no float accumulation)
_EWMA_W = ["1.0000000", "0.5000000", "0.2500000", "0.1250000",
           "0.0625000", "0.0312500", "0.0156250", "0.0078125"]


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (α=0.5) over
    each event and its 7 predecessors — the streaming-smoothing
    primitive (monitoring dashboards, trend baselines) in batch form.

    Determinism: α=0.5 makes every weight a dyadic rational
    (2^-i), so value×weight products and their sum are exact
    DECIMAL arithmetic — order-independent under partial
    aggregation and identical in DuckDB.  The truncated window
    renormalizes by the sum of PRESENT weights, so early events
    (fewer than 8 predecessors) still average to their own scale.

    Scale: ONE shuffle on user_id feeding a bounded-frame window
    (7 lags); no self-joins, no global sort.  At 100 TB the
    user_id partitioning is reused by every other per-user window
    in the suite (sessionize, lag features, running totals).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr("cast(value as decimal(8,2))").alias("vdec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for i, wt in enumerate(_EWMA_W):
        lag = F.col("vdec") if i == 0 else F.lag("vdec", i).over(w)
        wdec = F.expr(f"cast({wt} as decimal(9,7))")
        term = F.coalesce(lag * wdec, F.lit(0).cast("decimal(18,9)"))
        wpresent = F.when(lag.isNotNull(), wdec).otherwise(
            F.lit(0).cast("decimal(9,7)")
        )
        num = term if num is None else num + term
        den = wpresent if den is None else den + wpresent
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(num.cast("double") / den.cast("double"), 6).alias("ewma"),
    )


_CUSUM_H = "100.000000"  # |cusum| beyond this flags a level shift


def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-style CUSUM change-point screen per event type: the
    running sum of deviations from the type's mean, flagged where
    |CUSUM| exceeds a fixed decision band — drift/level-shift
    detection over metric streams (the batch twin of an SRE burn
    alert).

    Determinism: the type mean is snapped to DECIMAL(12,6) (from
    exact decimal sums), each deviation is exact decimal, and the
    RUNNING SUM is decimal too — exact arithmetic is associative, so
    DuckDB's segment-tree window aggregation and Spark's incremental
    one produce identical values (a double cumsum would NOT —
    association order differs between engines).

    Scale: one shuffle on event_type feeding an ordered cumulative
    window.  Per-type series length is the scale knob: event_type
    cardinality is bounded (a metrics registry), and at 100 TB the
    window becomes per (type, day) with the day boundary carried
    forward — same plan, partitioned time axis.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.expr("cast(value as decimal(8,2))").alias("vdec"),
    )
    means = ev.groupBy("event_type").agg(
        F.expr(
            "cast(round(cast(cast(sum(vdec) as decimal(38,6)) as double) "
            "/ count(*), 6) as decimal(12,6))"
        ).alias("mean_dec")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.join(F.broadcast(means), "event_type")
        .withColumn("dev", F.expr("vdec - mean_dec"))
        .withColumn("cusum_dec", F.sum("dev").over(w))
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.round(F.col("cusum_dec").cast("double"), 6).alias("cusum"),
            F.expr(
                f"abs(cusum_dec) > cast({_CUSUM_H} as decimal(12,6))"
            ).alias("is_change"),
        )
    )


def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix — the standard
    behavioral-diversity feature (bot screens: near-zero entropy =
    single-action automation; engagement scoring: high entropy =
    broad usage).

    Determinism (the ln recipe of tfidf_ops/dsir_ops): each term
    p·ln(p) is built from 9dp-snapped DECIMAL factors — p as
    round(n_ut/n_u, 9) and ln(p) as round(ln, 9) — so the per-user
    sum is EXACT decimal arithmetic, order-independent under partial
    aggregation; only the final entropy is a 6dp double.

    Scale: ONE shuffle total — the explicit repartition on user_id
    satisfies every downstream clustering requirement
    (HashPartitioning on a PREFIX of the grouping keys satisfies the
    (user, type) groupBy's ClusteredDistribution, the user window,
    and the final per-user agg), so the count, total-window and
    entropy agg all run shuffle-free on the same partitioning
    (plan-pinned in tests/test_plans.py).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").repartition("user_id")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_ut")
    )
    per_user = ut.withColumn(
        "n_u", F.sum("n_ut").over(Window.partitionBy("user_id"))
    )
    term = (
        "cast(round(n_ut / n_u, 9) as decimal(18,9)) * "
        "cast(round(ln(n_ut / n_u), 9) as decimal(18,9))"
    )
    return (
        per_user.withColumn("term", F.expr(term))
        .groupBy("user_id")
        .agg(
            F.sum("n_ut").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.round(-F.sum("term").cast("double"), 6).alias("entropy"),
        )
    )


def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: event counts,
    exact-decimal value totals, and each hour's share of its type's
    traffic — the shape behind load forecasting and anomaly baselines
    ("is 3am volume normal for clicks?").

    Determinism: counts are integers; value totals are exact decimal
    sums cast to double at 6dp; shares are integer ratios rounded
    6dp.  Hours derive from the session-TZ timestamp (UTC in both
    engines).

    Scale: ONE groupBy on (event_type, hour) — 24×|types| groups,
    virtually all work in the map-side partial agg; the share window
    runs over the tiny aggregated frame.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr(
            "cast(cast(sum(cast(value as decimal(8,2))) as decimal(38,6))"
            " as double)"
        ).alias("total_value"),
    )
    w = Window.partitionBy("event_type")
    return agg.select(
        "event_type",
        "hour",
        "n_events",
        F.round("total_value", 6).alias("total_value"),
        F.round(
            F.col("n_events") * 100.0 / F.sum("n_events").over(w), 6
        ).alias("pct_of_type"),
    )


def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-gap statistics (count, min/max/mean gap
    in MICROSECONDS) — the cadence feature behind rate-limiting, bot
    screens (metronomic gaps) and churn models (stretching gaps).
    Users with one event have no gaps and are excluded.

    Determinism: gaps are exact integer epoch-MICROsecond differences
    (unix_micros ↔ epoch_us; whole seconds would silently truncate
    sub-second timestamps differently across engines), ordered by
    (ts, event_id) — a total order; min/max/sum are integer
    aggregates; the mean is reported in SECONDS as a 6dp double
    (6dp of a ~1e10 µs mean would sit past double precision).

    Scale: ONE shuffle on user_id feeding a 1-lag window, then the
    per-user agg reuses the same partitioning (no second exchange).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "gap_us",
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        # mean reported in SECONDS: a 6dp round of a ~1e10-microsecond
        # mean sits past double precision (engine ulps surface); the
        # ~1e4-second scale is exactly representable at 6dp
        F.round(
            F.sum("gap_us").cast("double") / F.count("*") / 1000000.0, 6
        ).alias("mean_gap_s"),
    )


_KL_BUCKETS = 16
_KL_WIDTH = 32  # value range ~[0, 512): 16 buckets of 32


def events_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day KL divergence of the value distribution vs the
    all-time distribution — the standard data-drift monitor for a
    metric stream (a day whose histogram diverges from baseline
    flags instrumentation changes or behavior shifts before any
    threshold alert fires).

    D_KL(day ‖ overall) over 16 fixed-width value buckets; buckets
    absent from a day contribute 0 (p=0 terms vanish), and q>0 is
    guaranteed because the baseline includes the day itself.

    Determinism: bucket ids and all counts are exact integers; each
    p·ln(p/q) term is a product of two 9dp-snapped decimals — p from
    integer division, ln(p/q) as the difference of logs
    ln(n_db/day_tot) − ln(n_b/n_total) (overflow-safe: no int64
    product to wrap/raise) — so per-day sums are exact decimal;
    published KL is a 6dp double.

    Scale: ONE corpus shuffle (groupBy day × bucket, map-side
    combined to ≤ days×16 rows); everything after runs on that tiny
    aggregate — the baseline table is exactly 16 rows and broadcast
    (genuinely constant-bounded, unlike a vocabulary).
    """
    # clamp BOTH ends: negative values (an instrumentation regression
    # — exactly what a drift monitor must flag) land in bucket 0, so
    # the 16-bucket invariant and the 16-row broadcast bound hold for
    # any input range
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(_KL_BUCKETS - 1),
                F.floor(F.col("value") / _KL_WIDTH),
            ),
        ).cast("int").alias("bucket"),
    )
    db = ev.groupBy("day", "bucket").agg(
        F.count("*").cast("long").alias("n_db")
    )
    overall = db.groupBy("bucket").agg(
        F.sum("n_db").cast("long").alias("n_b")
    )
    from pyspark.sql.window import Window

    day_w = Window.partitionBy("day")
    j = (
        db.withColumn("day_tot", F.sum("n_db").over(day_w))
        .join(F.broadcast(overall), "bucket")
        .withColumn(
            "n_total",
            F.sum("n_db").over(Window.partitionBy(F.lit(1))),
        )
    )
    # ln(p/q) as ln(n_db/day_tot) - ln(n_b/n_total): each division is
    # a BIGINT→double true division, so no int64 product can overflow
    # (n_db·n_total wraps silently in Spark's non-ANSI multiply but
    # RAISES in DuckDB — the engines would diverge in failure mode;
    # r06 ADVICE). Same double ops in both engines → bit-identical.
    term = (
        "cast(round(n_db / day_tot, 9) as decimal(18,9)) * "
        "cast(round(ln(n_db / day_tot) - ln(n_b / n_total), 9) "
        "as decimal(18,9))"
    )
    return (
        j.withColumn("term", F.expr(term))
        .groupBy("day")
        .agg(
            F.sum("n_db").cast("long").alias("n_events"),
            F.round(F.sum("term").cast("double"), 6).alias("kl"),
        )
    )


def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each (type, day)'s
    event count with the count 7 days earlier, score MAE and mean
    bias per type over EVERY day of the observation window that has
    a 7-day-old baseline slot — the canonical forecasting BASELINE
    every capacity model must beat, and the backtest harness shape
    (grid of scoring days, actuals and lagged predictions coalesced
    to 0, aggregate errors).

    Zero-event days COUNT: the scoring grid is built from the
    corpus-wide [min_day+7, max_day] span × the type registry, with
    absent (type, day) counts coalesced to 0 on both sides — a
    sparse type that misses a week contributes its full miss to MAE
    instead of silently dropping out (an inner join on observed days
    would understate error for exactly the spiky types a backtest
    exists to expose).

    Determinism: daily counts and absolute errors are exact
    integers; MAE/bias are single 6dp IEEE divisions.

    Scale: one (type, day) groupBy (map-side combined to a tiny
    frame); the grid is |types| × |days| rows and every join after
    the first agg runs on that bounded frame.

    ``daily`` is ``localCheckpoint``-ed and the span / type registry
    derive from it (identical values by construction — every event
    contributes a daily row): left lazy, daily was referenced twice
    (grid join + 7-day-lag prediction join) and span/types each
    carried their own events scan — 4 scans in one plan (round-10
    plan audit). Checkpointed, the corpus collapses in ONE scan and
    the returned plan reads only the bounded aggregate (pinned in
    tests/test_plans.py).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n")).localCheckpoint()
    span = daily.agg(
        F.min("day").alias("lo"),
        F.max("day").alias("hi"),
    )
    # guard the grid: Spark's sequence() RAISES when start > stop
    # (ILLEGAL_SEQUENCE_BOUNDARIES) while DuckDB's generate_series
    # returns an empty set — on a corpus spanning < 8 days the two
    # engines would diverge (crash vs zero rows; r06 ADVICE). Filter
    # the 1-row span frame first so both yield an empty backtest.
    days = span.where(F.expr("hi >= date_add(lo, 7)")).select(
        F.explode(
            F.expr("sequence(date_add(lo, 7), hi, interval 1 day)")
        ).alias("day")
    )
    types = daily.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(days))
    scored = (
        grid.join(daily, ["event_type", "day"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0).cast("long")))
        .join(
            daily.select(
                "event_type",
                F.date_add("day", 7).alias("day"),
                F.col("n").alias("n_pred"),
            ),
            ["event_type", "day"],
            "left",
        )
        .withColumn(
            "n_pred", F.coalesce("n_pred", F.lit(0).cast("long"))
        )
    )
    return scored.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_actual"),
        F.round(
            F.sum(F.abs(F.col("n") - F.col("n_pred"))).cast("double")
            / F.count("*"),
            6,
        ).alias("mae"),
        F.round(
            F.sum(F.col("n") - F.col("n_pred")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_bias"),
    )


_MAD_K = 5.0  # |v - median| > K·MAD flags an outlier


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly screen per event type — the
    outlier detector that survives what breaks z-scores: a few huge
    outliers inflate the mean AND the stddev, masking themselves;
    the median and the median absolute deviation barely move.

    Output: per type (n, median, mad, n_outliers at |v-med| > 5·MAD).

    Determinism: medians are exact interpolated percentiles
    (percentile ↔ quantile_cont, the events_percentiles recipe),
    rounded 6dp BEFORE the deviation pass so both engines threshold
    against the identical double; outlier counts are integer.

    Scale: two passes over the type groups (median, then MAD of
    deviations) + one counting pass — each a map-side-combined agg;
    the per-type medians broadcast back (bounded type registry).
    At 100 TB swap approx_percentile into the same shape.

    The bounded per-type ``med`` and ``mad`` frames are
    ``localCheckpoint``-ed: the deviation frame is referenced by BOTH
    the MAD aggregate and the outlier-count pass, so left lazy the
    plan re-embedded the events scan 6 times (round-10 plan audit).
    Checkpointed (a few KB each), the three passes the algorithm
    genuinely needs are the ONLY events scans, and the returned plan
    carries exactly one (pinned in tests/test_plans.py).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median")
    ).localCheckpoint()
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("median"))
    )
    mad = dev.groupBy("event_type", "median").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad"),
    ).localCheckpoint()
    flagged = (
        dev.join(
            F.broadcast(mad.select("event_type", "mad")),
            "event_type",
        )
        .where(F.col("adev") > F.lit(_MAD_K) * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_outliers"))
    )
    return (
        mad.join(flagged, "event_type", "left")
        .select(
            "event_type",
            "n",
            "median",
            "mad",
            F.coalesce("n_outliers", F.lit(0).cast("long")).alias(
                "n_outliers"
            ),
        )
    )


def corpus_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of corpus mass across sources, for both doc
    counts and char volume — the concentration diagnostic of a data
    mix (G→0: balanced; G→1: one source dominates; feeds the
    temperature-mix decision).

    G = (2·Σ i·wᵢ)/(n·Σw) − (n+1)/n over weights sorted ascending
    (i = 1-based rank) — all rank products and sums are exact
    integers; the two divisions are a single 6dp double chain.

    Scale: one per-source agg (bounded), rank windows over
    |sources| rows — nothing corpus-scale after the first groupBy.
    """
    from pyspark.sql.window import Window

    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("w_docs"),
            # coalesce: an all-NULL-n_chars source must rank as 0, not
            # as an engine-dependent NULL position (Spark sorts NULLS
            # FIRST asc, DuckDB NULLS LAST — a cross-engine rank skew)
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("long")
            .alias("w_chars"),
        )
    )

    ranked = per.select(
        "source",
        "w_docs",
        "w_chars",
        F.row_number()
        .over(Window.orderBy(F.col("w_docs"), F.col("source")))
        .alias("rk_docs"),
        F.row_number()
        .over(Window.orderBy(F.col("w_chars"), F.col("source")))
        .alias("rk_chars"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.round(
            (2 * F.sum(F.col("w_docs") * F.col("rk_docs")).cast("double"))
            / (F.count("*") * F.sum("w_docs").cast("double"))
            - (F.count("*") + 1) / F.count("*"),
            6,
        ).alias("gini_docs"),
        F.round(
            (2 * F.sum(F.col("w_chars") * F.col("rk_chars")).cast("double"))
            / (F.count("*") * F.sum("w_chars").cast("double"))
            - (F.count("*") + 1) / F.count("*"),
            6,
        ).alias("gini_chars"),
    )


QUERIES = {
    "events_forecast_backtest": events_forecast_backtest,
    "events_anomaly_mad": events_anomaly_mad,
    "corpus_source_gini": corpus_source_gini,
    "events_kl_drift": events_kl_drift,
    "events_ewma": events_ewma,
    "events_cusum": events_cusum,
    "events_user_entropy": events_user_entropy,
    "events_hourly_seasonality": events_hourly_seasonality,
    "events_inter_arrival_stats": events_inter_arrival_stats,
    "events_anomaly_zscore": events_anomaly_zscore,
    "orders_retention_cohorts": orders_retention_cohorts,
    "part_price_histogram": part_price_histogram,
    "compliance_delete_plan": compliance_delete_plan,
    "events_salted_distinct": events_salted_distinct,
}

def _ewma_sql() -> str:
    terms, present = [], []
    for i, wt in enumerate(_EWMA_W):
        lag = (
            "vdec"
            if i == 0
            else f"lag(vdec, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        )
        wd = f"CAST({wt} AS DECIMAL(9,7))"
        terms.append(
            f"COALESCE(({lag}) * {wd}, CAST(0 AS DECIMAL(18,9)))"
        )
        present.append(
            f"CASE WHEN ({lag}) IS NOT NULL THEN {wd} "
            f"ELSE CAST(0 AS DECIMAL(9,7)) END"
        )
    return f"""
        WITH ev AS (
            SELECT event_id, user_id, ts, value,
                   CAST(value AS DECIMAL(8,2)) AS vdec
            FROM events
        )
        SELECT event_id, user_id, ts, value,
               ROUND(CAST(({' + '.join(terms)}) AS DOUBLE)
                     / CAST(({' + '.join(present)}) AS DOUBLE), 6) AS ewma
        FROM ev
    """


ORACLE = {
    "events_forecast_backtest": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), span AS (
            SELECT MIN(CAST(ts AS DATE)) AS lo,
                   MAX(CAST(ts AS DATE)) AS hi
            FROM events
        ), days AS (
            SELECT CAST(unnest(generate_series(
                       lo + INTERVAL 7 DAY, hi, INTERVAL 1 DAY
                   )) AS DATE) AS day
            FROM span
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), grid AS (
            SELECT t.event_type, d.day FROM types t, days d
        ), scored AS (
            SELECT g.event_type,
                   COALESCE(a.n, 0) AS n,
                   COALESCE(p.n, 0) AS n_pred
            FROM grid g
            LEFT JOIN daily a
              ON a.event_type = g.event_type AND a.day = g.day
            LEFT JOIN daily p
              ON p.event_type = g.event_type
             AND g.day = p.day + INTERVAL 7 DAY
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n) AS BIGINT) AS n_actual,
               round(CAST(SUM(abs(n - n_pred)) AS DOUBLE) / COUNT(*),
                     6) AS mae,
               round(CAST(SUM(n - n_pred) AS DOUBLE) / COUNT(*), 6)
                 AS mean_bias
        FROM scored GROUP BY event_type
    """,
    "events_anomaly_mad": f"""
        WITH med AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS median
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, m.median,
                   abs(e.value - m.median) AS adev
            FROM events e JOIN med m USING (event_type)
        ), mad AS (
            SELECT event_type, median,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   round(quantile_cont(adev, 0.5), 6) AS mad
            FROM dev GROUP BY event_type, median
        )
        SELECT m.event_type, m.n, m.median, m.mad,
               CAST(COALESCE(SUM(CASE WHEN d.adev > {_MAD_K} * m.mad
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_outliers
        FROM mad m JOIN dev d USING (event_type)
        GROUP BY m.event_type, m.n, m.median, m.mad
    """,
    "corpus_source_gini": """
        WITH per AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS w_docs,
                   -- COALESCE mirrors the operator: all-NULL-n_chars
                   -- sources rank as 0, not engine-dependent NULLs
                   CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS w_chars
            FROM documents GROUP BY source
        ), ranked AS (
            SELECT w_docs, w_chars,
                   row_number() OVER (ORDER BY w_docs, source)
                     AS rk_docs,
                   row_number() OVER (ORDER BY w_chars, source)
                     AS rk_chars
            FROM per
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
               round((2 * CAST(SUM(w_docs * rk_docs) AS DOUBLE))
                     / (COUNT(*) * CAST(SUM(w_docs) AS DOUBLE))
                     - (COUNT(*) + 1) / COUNT(*), 6) AS gini_docs,
               round((2 * CAST(SUM(w_chars * rk_chars) AS DOUBLE))
                     / (COUNT(*) * CAST(SUM(w_chars) AS DOUBLE))
                     - (COUNT(*) + 1) / COUNT(*), 6) AS gini_chars
        FROM ranked
    """,
    "events_kl_drift": f"""
        WITH ev AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(greatest(0, least({_KL_BUCKETS - 1},
                              floor(value / {_KL_WIDTH}))) AS INTEGER)
                     AS bucket
            FROM events
        ), db AS (
            SELECT day, bucket, CAST(COUNT(*) AS BIGINT) AS n_db
            FROM ev GROUP BY day, bucket
        ), j AS (
            SELECT day, bucket, n_db,
                   SUM(n_db) OVER (PARTITION BY day) AS day_tot,
                   SUM(n_db) OVER (PARTITION BY bucket) AS n_b,
                   SUM(n_db) OVER () AS n_total
            FROM db
        )
        SELECT day,
               CAST(SUM(n_db) AS BIGINT) AS n_events,
               round(CAST(SUM(
                   CAST(round(n_db / day_tot, 9) AS DECIMAL(18,9)) *
                   CAST(round(ln(n_db / day_tot) - ln(n_b / n_total), 9)
                        AS DECIMAL(18,9))
               ) AS DOUBLE), 6) AS kl
        FROM j GROUP BY day
    """,
    "events_user_entropy": """
        WITH ut AS (
            SELECT user_id, event_type, COUNT(*) AS n_ut
            FROM events GROUP BY user_id, event_type
        ), pu AS (
            SELECT user_id, n_ut,
                   SUM(n_ut) OVER (PARTITION BY user_id) AS n_u
            FROM ut
        )
        SELECT user_id,
               CAST(SUM(n_ut) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               round(-CAST(SUM(
                   CAST(round(n_ut / n_u, 9) AS DECIMAL(18,9)) *
                   CAST(round(ln(n_ut / n_u), 9) AS DECIMAL(18,9))
               ) AS DOUBLE), 6) AS entropy
        FROM pu GROUP BY user_id
    """,
    "events_hourly_seasonality": """
        WITH agg AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(8,2)))
                        AS DECIMAL(38,6)) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, hour, n_events,
               round(total_value, 6) AS total_value,
               round(n_events * 100.0 /
                     SUM(n_events) OVER (PARTITION BY event_type),
                     6) AS pct_of_type
        FROM agg
    """,
    "events_inter_arrival_stats": """
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) AS gap_us
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               round(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0,
                     6) AS mean_gap_s
        FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    """,
    "events_ewma": _ewma_sql(),
    "events_cusum": f"""
        WITH ev AS (
            SELECT event_id, event_type, ts, value,
                   CAST(value AS DECIMAL(8,2)) AS vdec
            FROM events
        ), means AS (
            SELECT event_type,
                   CAST(ROUND(CAST(CAST(SUM(vdec) AS DECIMAL(38,6))
                                   AS DOUBLE) / COUNT(*), 6)
                        AS DECIMAL(12,6)) AS mean_dec
            FROM ev GROUP BY event_type
        ), c AS (
            SELECT e.event_id, e.event_type, e.ts, e.value,
                   SUM(e.vdec - m.mean_dec) OVER (
                       PARTITION BY e.event_type
                       ORDER BY e.ts, e.event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cusum_dec
            FROM ev e JOIN means m ON e.event_type = m.event_type
        )
        SELECT event_id, event_type, ts, value,
               ROUND(CAST(cusum_dec AS DOUBLE), 6) AS cusum,
               abs(cusum_dec) > CAST({_CUSUM_H} AS DECIMAL(12,6))
                 AS is_change
        FROM c
    """,
    "events_salted_distinct": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_distinct,
               COUNT(*) AS n_rows
        FROM events GROUP BY event_type
    """,
    "events_anomaly_zscore": """
        WITH stats AS (
            SELECT event_type, COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DECIMAL(38,6))
                        AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(8,2))
                                 * CAST(value AS DECIMAL(8,2)))
                        AS DECIMAL(38,6)) AS DOUBLE) AS sxx
            FROM events GROUP BY event_type
        ), ms AS (
            SELECT event_type, n, sx / n AS mean,
                   sqrt((sxx - sx * sx / n) / (n - 1)) AS std
            FROM stats
        )
        SELECT e.event_id, e.user_id, e.event_type, e.value,
               round((e.value - ms.mean) / ms.std, 6) AS zscore
        FROM events e JOIN ms ON e.event_type = ms.event_type
        WHERE round((e.value - ms.mean) / ms.std, 6) > 3
    """,
    "orders_retention_cohorts": """
        WITH first AS (
            SELECT o_custkey, strftime(MIN(o_orderdate), '%Y-%m') AS cohort_month
            FROM orders GROUP BY o_custkey
        ), activity AS (
            SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS month
            FROM orders
        )
        SELECT f.cohort_month, a.month,
               COUNT(DISTINCT a.o_custkey) AS n_active,
               (CAST(substr(a.month, 1, 4) AS INTEGER) * 12
                + CAST(substr(a.month, 6, 2) AS INTEGER))
               - (CAST(substr(f.cohort_month, 1, 4) AS INTEGER) * 12
                  + CAST(substr(f.cohort_month, 6, 2) AS INTEGER))
                 AS months_since
        FROM activity a JOIN first f ON a.o_custkey = f.o_custkey
        GROUP BY f.cohort_month, a.month
    """,
    "part_price_histogram": """
        SELECT p_brand,
               CAST(floor(p_retailprice / 10) AS INTEGER) AS bucket,
               CAST(CAST(floor(p_retailprice / 10) AS INTEGER) * 10 AS DOUBLE)
                 AS bucket_low,
               COUNT(*) AS n_parts
        FROM part GROUP BY p_brand, floor(p_retailprice / 10)
    """,
    "compliance_delete_plan": """
        WITH cohort AS (
            SELECT c_custkey AS key FROM customer WHERE c_custkey % 37 = 0
        )
        SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM cohort
        UNION ALL
        SELECT 'events', COUNT(*) FROM events
        WHERE user_id IN (SELECT key FROM cohort)
        UNION ALL
        SELECT 'orders', COUNT(*) FROM orders
        WHERE o_custkey IN (SELECT key FROM cohort)
        UNION ALL
        SELECT 'lineitem', COUNT(*) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_custkey IN (SELECT key FROM cohort))
    """,
}
