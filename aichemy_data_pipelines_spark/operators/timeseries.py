"""Time-series / window operator suite over the ``events`` table.

Spark-first designs:
* sessionization / as-of — window functions partitioned by user_id
  (no O(n²) self-join; the shuffle key is the natural partition key);
* range join — equi-join on user_id with the time predicate as a
  post-join filter (Catalyst keeps it out of a cartesian);
* tumbling/sliding windows — ``F.window`` (native, codegen) with
  DuckDB oracles built from epoch arithmetic on the same grid.

Determinism: all money-ish sums go through decimal (functions/
money.py); all timestamps are emitted as formatted strings; every
window ordering has an ``event_id`` tiebreak so results are unique.

Reference parity: ``events_dedup_latest`` is the Spark form of the
reference's idempotent ``already_converted`` re-discovery check
(msconvert_dag.py:112-122) — keep exactly one (latest) row per
logical key at any scale.

Scale: every window partitions by ``user_id`` (high cardinality, even
distribution) so state per task is bounded by one user's history; AQE
skew-split covers pathological users. Aggregations are map-side
partial. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.money import dec, money_sum, sum_to_double

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_SQL_TS_FMT = "%Y-%m-%d %H:%M:%S"
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts + exact value sums per type.

    Scale: single scan; hash agg on (hour, type) — bounded keyspace,
    map-side combine does nearly all the work.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            money_sum(dec("value"), "sum_value"),
        )
        .select(
            F.date_format("w", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (each event lands in 2).

    Scale: F.window expands each row to its covering windows before
    the agg — a 2x row inflation, far cheaper than a self-join; grid
    arithmetic all in codegen.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").start.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            money_sum(dec("value"), "sum_value"),
        )
        .select(
            F.date_format("w", _TS_FMT).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-min silence starts a new
    session. Classic lag → boundary flag → cumulative-sum session id.

    Scale: one shuffle on user_id; per-task state is a single user's
    ordered history. At 100 TB this is the standard streaming-or-batch
    sessionizer; the streaming twin uses a session window with
    watermark (streaming/watch.py).
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_us").isNull()
                | (F.unix_micros("ts") - F.col("prev_us") > F.lit(_SESSION_GAP_US))
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
        F.count("*").alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "duration_us"
        ),
    )


def events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 highest-value events per user via row_number.

    Scale: one shuffle on user_id; rank truncation happens inside the
    window operator (no global sort). For extreme k-skew, pre-
    aggregate per (user, salt) then re-rank.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), "event_id"
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("user_id", "rk", "event_id", "value")
    )


def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest event per (user_id, event_type) — idempotent
    re-processing guard, the Spark form of the reference's
    already_converted check (msconvert_dag.py:112-122).

    Scale: row_number over the logical key; the shuffle is the
    dedup — no secondary pass.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", _TS_FMT).alias("ts"),
            "value",
        )
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at
    or before it.

    Spark-first: instead of an inequality join (O(n·m) per user), sort
    once per user and carry the last click forward with
    ``last(..., ignorenulls=True)`` — linear, one shuffle, and the
    exact plan a streaming state op would use.

    Scale: partition by user_id; for a calendar-scale fact stream use
    :func:`events_asof_join_bucketed` — (user_id, day) buckets seeded
    with the prior days' tail keep window state bounded.
    """
    ev = _events(spark, sf_dir).where(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    enriched = ev.withColumn(
        "last_click_id", F.last(click_id, ignorenulls=True).over(w)
    ).withColumn("last_click_us", F.last(click_ts, ignorenulls=True).over(w))
    return enriched.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        "last_click_id",
        (F.unix_micros("ts") - F.col("last_click_us")).alias("since_click_us"),
    )


def events_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, (user_id, day)-bucketed scale variant.

    Same result as :func:`events_asof_join`, different plan. The plain
    variant's window spans a user's ENTIRE history, so per-task state
    grows with per-user history — fine for bounded histories, wrong
    for a calendar-scale fact stream. Here window state is bounded by
    one user-DAY and history crosses bucket boundaries through a
    compact seed table:

    1. per (user_id, day): latest click of the day — a plain agg, one
       row per user-day (orders of magnitude smaller than events);
    2. the "previous days' tail" seed: running ``last`` over each
       user's day sequence shifted one row back
       (``rowsBetween(unboundedPreceding, -1)``) — an unbounded window
       but over the COMPACT user-day table, so cheap at any scale;
    3. seed joined back on (user_id, day) — a key the events already
       shuffle on for the bucket window, so it stays co-located;
    4. intra-day last-click-forward, coalesced with the seed.
    """
    ev = (
        _events(spark, sf_dir)
        .where(F.col("event_type").isin("click", "purchase"))
        .withColumn("day", F.date_trunc("day", "ts"))
    )
    day_tail = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "day")
        .agg(
            F.max(
                F.struct(
                    F.unix_micros("ts").alias("us"),
                    F.col("event_id").alias("id"),
                )
            ).alias("tail")
        )
    )
    spine = ev.select("user_id", "day").distinct()
    wdays = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        spine.join(day_tail, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("tail", ignorenulls=True).over(wdays).alias("seed"),
        )
    )
    wb = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    enriched = (
        ev.join(seeds, ["user_id", "day"], "left")
        .withColumn("intra_id", F.last(click_id, ignorenulls=True).over(wb))
        .withColumn("intra_us", F.last(click_us, ignorenulls=True).over(wb))
    )
    return enriched.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.coalesce("intra_id", F.col("seed.id")).alias("last_click_id"),
        (
            F.unix_micros("ts") - F.coalesce("intra_us", F.col("seed.us"))
        ).alias("since_click_us"),
    )


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within 30 minutes after a purchase, per user: equi-join
    on user_id + time-range filter.

    Scale: the equi key keeps this a hash/sort-merge join; the range
    predicate filters post-match. For dense per-user streams, add a
    coarse time-bucket to the join key (bucket and bucket+1) to bound
    per-key fanout.
    """
    ev = _events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("e_us"),
    )
    return (
        p.join(e, F.col("p_user") == F.col("e_user"))
        .where(
            (F.col("e_us") > F.col("p_us"))
            & (F.col("e_us") <= F.col("p_us") + 30 * 60 * 1_000_000)
        )
        .select(
            F.col("p_user").alias("user_id"),
            "purchase_id",
            "error_id",
            (F.col("e_us") - F.col("p_us")).alias("gap_us"),
        )
    )


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) TIME-WEIGHTED average of ``value`` — the
    hypertable-style TWA: integrate the last-observation-carried-
    forward step function between the day's first and last event and
    divide by the covered span. An arithmetic mean over-weights
    bursts; TWA weights each reading by how long it was current.

    Determinism across engines: the integral is computed in EXACT
    integers — 2-decimal values as cents (bigint) × µs durations —
    summed (grouping-order-invariant), with ONE float division at the
    end. A zero-span day (single event, or several at one instant)
    has no integrable area; its TWA is defined as the MIN value of
    the instant (deterministic under timestamp ties, unlike
    "first").

    Scale: one (user_id, day) window for the lead + one agg on the
    same key — a single shuffle, state bounded by one user-day.
    """
    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    w = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
    )
    stepped = ev.select(
        "user_id",
        "day",
        F.unix_micros("ts").alias("us"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    return (
        stepped.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(
                    F.col("next_us").isNotNull(),
                    F.col("cents") * (F.col("next_us") - F.col("us")),
                )
            ).alias("area"),
            (F.max("us") - F.min("us")).alias("span_us"),
            F.min("cents").alias("min_cents"),
        )
        .select(
            "user_id",
            "day",
            "n_events",
            F.when(
                F.col("span_us") > 0,
                F.round(
                    F.col("area")
                    / (F.col("span_us") * F.lit(100.0)),
                    6,
                ),
            )
            .otherwise(F.col("min_cents") / 100.0)
            .alias("twa_value"),
        )
    )


def events_counter_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter increase with RESET detection per user — the
    monitoring-system ``increase()`` semantics: readings normally
    rise; a drop means the counter restarted, so the post-reset
    reading itself counts as the increase (never a negative delta).

    Exact-integer deltas (cents), lag over the (user_id) window with
    an event_id tiebreak; per-user totals plus the reset count.

    Scale: one user_id shuffle shared by the lag window and the agg —
    the same single-shuffle shape as the other per-user ops.
    """
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.withColumn("prev", F.lag("cents").over(w))
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum(
                F.when(F.col("prev").isNull(), F.lit(0))
                .when(
                    F.col("cents") >= F.col("prev"),
                    F.col("cents") - F.col("prev"),
                )
                .otherwise(F.col("cents"))
            ).alias("inc_cents"),
            F.sum(
                F.expr(
                    "cast(prev is not null and cents < prev as bigint)"
                )
            ).alias("n_resets"),
        )
        .select(
            "user_id",
            "n_samples",
            (F.col("inc_cents") / 100.0).alias("total_increase"),
            "n_resets",
        )
    )


def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles per event_type — the financial/monitoring
    rollup: open = first value of the bucket, close = last, plus
    high/low and the sample count.

    Determinism: open/close use ``min_by``/``max_by`` keyed on a
    zero-padded ``(µs, event_id)`` string (lexicographic = numeric
    order; DuckDB's arg_min/arg_max take no struct key) — a total
    order, so timestamp ties cannot flip the candle between engines.
    Values aggregate as exact cents, one final /100.

    Scale: single map-side-combined agg on a bounded keyspace
    (types × hours) — the classic pre-aggregation a monitoring store
    keeps instead of raw points.
    """
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
            "hour"
        ),
        F.expr(
            "concat(lpad(cast(unix_micros(ts) as string), 20, '0'), ':', "
            "lpad(cast(event_id as string), 12, '0'))"
        ).alias("ord_key"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    key = F.col("ord_key")
    return (
        ev.groupBy("event_type", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("cents", key).alias("o"),
            F.max("cents").alias("h"),
            F.min("cents").alias("l"),
            F.max_by("cents", key).alias("c"),
        )
        .select(
            "event_type",
            "hour",
            "n_events",
            (F.col("o") / 100.0).alias("open"),
            (F.col("h") / 100.0).alias("high"),
            (F.col("l") / 100.0).alias("low"),
            (F.col("c") / 100.0).alias("close"),
        )
    )


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily × event-type ROLLUP (day totals + grand total).

    Scale: native rollup = one expand + one agg; bounded keyspace.
    """
    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    return ev.rollup("day", "event_type").agg(
        F.count("*").alias("n_events"),
        money_sum(dec("value"), "sum_value"),
    )


def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of value per event_type (linear
    interpolation), rounded to 6dp to absorb formula-order ulps.

    Scale: exact percentile needs a per-group sort — fine for bounded
    groups; the 100 TB path swaps in approx_percentile (t-digest,
    map-side mergeable) with the same API shape.
    """
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count("*").alias("n"),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel depth per user (each later stage
    must strictly follow the user's first qualifying earlier stage).

    Bounded-state design: three scalar conditional MIN aggregates —
    first view, first click strictly after it, first purchase strictly
    after that — never per-user arrays, so a bot user with millions of
    events costs three longs of agg state, not a collect_list blowup.

    Scale: every groupBy/join keys on user_id, so after the first
    shuffle the later aggs and joins reuse the hash partitioning
    (AQE/Catalyst exchange reuse); map-side partial aggregation does
    the heavy lifting.
    """
    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    et = F.col("event_type")
    # pass 1: first view per user (grouping over ALL events keeps
    # view-less users in the output with t_view NULL)
    views = ev.groupBy("user_id").agg(
        F.min(F.when(et == "view", us)).alias("t_view")
    )
    # pass 2: first click strictly after the first view
    clicks = (
        ev.select("user_id", et.alias("event_type"), us.alias("us"))
        .join(views, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") > F.col("t_view")),
                    F.col("us"),
                )
            ).alias("t_click"),
        )
    )
    # pass 3: first purchase strictly after that click
    funnel = (
        ev.select("user_id", et.alias("event_type"), us.alias("us"))
        .join(clicks, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("t_click")),
                    F.col("us"),
                )
            ).alias("t_purchase"),
        )
    )
    return funnel.select(
        "user_id",
        (
            F.col("t_view").isNotNull().cast("int")
            + F.col("t_click").isNotNull().cast("int")
            + F.col("t_purchase").isNotNull().cast("int")
        ).alias("funnel_depth"),
    )


def events_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` in BATCH mode (30-minute gap),
    with an oracle that independently encodes ITS boundary rule: a
    new session starts when the inter-event gap is >= the window gap
    (window end = last_ts + gap, EXCLUSIVE) — unlike the lag-based
    events_sessionize, which breaks only on gaps STRICTLY greater.
    Having both oracle-checked pins the exact-gap boundary difference
    the streaming twin documents (streaming/watch.py), instead of
    leaving it as a comment.

    Scale: one user_id shuffle; session assembly is per-key state.

    Output: (user_id, start_us, end_us, n_events, cents).
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("sum(cast(round(value * 100) as bigint))").alias("cents"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
            "cents",
        )
    )


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click conversion-latency histogram in 10-minute buckets
    (integer microsecond division — exact in both engines), using the
    same bounded conditional-MIN passes as events_funnel (never
    per-user arrays).

    Scale: two user_id aggs sharing one hash partitioning; the
    histogram agg is bounded by the bucket count.

    Output: (bucket_10min, n_users).
    """
    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    et = F.col("event_type")
    views = ev.groupBy("user_id").agg(
        F.min(F.when(et == "view", us)).alias("t_view")
    )
    clicks = (
        ev.select("user_id", et.alias("event_type"), us.alias("us"))
        .join(views, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") > F.col("t_view")),
                    F.col("us"),
                )
            ).alias("t_click"),
        )
    )
    return (
        clicks.where(F.col("t_click").isNotNull())
        .select(
            F.expr("(t_click - t_view) div 600000000").alias("bucket_10min")
        )
        .groupBy("bucket_10min")
        .agg(F.count("*").alias("n_users"))
    )


def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase revenue with a running cumulative total.

    Determinism: the cumulative sum runs in decimal and converts per
    row, so the running column is exact in both engines.

    Scale: daily pre-agg first (tiny), then a single-partition window
    over days — the window input is already reduced to |days| rows.
    """
    ev = _events(spark, sf_dir).where(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.expr(f"sum({dec('value')})").alias("_dsum"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "n_purchases",
        F.expr("cast(cast(_dsum as decimal(38,6)) as double)").alias("revenue"),
        F.expr(
            "cast(cast(sum(_dsum) over "
            "(order by day rows between unbounded preceding and current row) "
            "as decimal(38,6)) as double)"
        ).alias("cum_revenue"),
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation (props is a JSON blob).

    Scale: get_json_object is JVM-side; for hot paths at 100 TB,
    from_json with an explicit schema once per column beats repeated
    path extraction.
    """
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
    )


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-CALENDAR-day moving average of daily purchase revenue: a
    RANGE frame over an integer day index (days since epoch), so the
    frame always spans exactly the trailing 7 calendar days — gap days
    contribute no rows but still bound the frame, unlike a ROWS frame
    over observed days. Average is over observed days in the frame
    (decimal-exact sum, 6dp round).

    Scale: daily pre-agg shrinks input to |days| rows; the window
    runs on the reduced set.
    """
    ev = _events(spark, sf_dir).where(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.expr(f"sum({dec('value')})").alias("_dsum"))
    daily = daily.withColumn(
        "_day_idx", F.expr("datediff(to_date(day), date '1970-01-01')")
    )
    frame = "order by _day_idx range between 6 preceding and current row"
    return daily.select(
        "day",
        F.expr("cast(cast(_dsum as decimal(38,6)) as double)").alias("revenue"),
        F.round(
            F.expr(
                f"cast(cast(sum(_dsum) over ({frame}) as decimal(38,6)) "
                "as double)"
            )
            / F.expr(f"count(*) over ({frame})"),
            6,
        ).alias("ma7"),
    )


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densify + forward-fill: the gap-fill operator every
    monitoring/feature pipeline needs (≈7% of hourly buckets per
    event type are empty in the synthetic feed).

    Builds the full (event_type × hour) spine with ``sequence()`` +
    explode from the observed global bounds, left-joins the hourly
    aggregate, fills missing counts with 0, and carries the last
    non-null hourly sum forward with ``last(..., ignorenulls)`` over
    an ordered window.

    Scale: the spine is types × hours — KEYSPACE-sized, not
    event-sized (5 types × 10 years is ~440k rows regardless of
    corpus size); the only event-sized work is the first hourly agg
    (map-side combined). Forward-fill shuffles on event_type — for
    thousands of series, partition on series id; the frame is
    bounded-preceding so state is O(1) per row.
    """
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.expr("sum(cast(round(value * 100) as bigint))").alias("_cents"),
    )
    # ONE tiny agg yields bounds AND the type domain (1 row), so the
    # spine explodes from it without re-aggregating events for a
    # distinct() and again for bounds — one corpus-scale agg total
    # for the spine side instead of three
    stats = hourly.agg(
        F.min("h").alias("lo"),
        F.max("h").alias("hi"),
        F.collect_set("event_type").alias("types"),
    )
    spine = stats.select(
        F.explode("types").alias("event_type"), "lo", "hi"
    ).select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "h"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = spine.join(hourly, ["event_type", "h"], "left")
    return filled.select(
        "event_type",
        F.date_format("h", _TS_FMT).alias("hour"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        (F.last("_cents", ignorenulls=True).over(w) / 100.0).alias(
            "carried_sum"
        ),
        F.col("n_events").isNull().alias("gap_filled"),
    )


def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequential ML features — the feature-engineering
    window stage of a training pipeline: event index, previous value,
    seconds since previous event, rolling mean of the prior ≤5 values
    (exact integer-cents sum, one FP division).

    Scale: one shuffle on user_id (the natural high-cardinality key),
    then every feature is computed in a single window pass over each
    partition; rolling state is O(frame) per row. This is the shape
    feature backfills run at corpus scale.
    """
    ev = _events(spark, sf_dir).withColumn(
        "_cents", F.expr("cast(round(value * 100) as bigint)")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wprev = w.rowsBetween(-5, -1)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("seq"),
        (F.lag("_cents").over(w) / 100.0).alias("prev_value"),
        (
            (
                F.expr("unix_micros(ts)")
                - F.lag(F.expr("unix_micros(ts)")).over(w)
            )
            / 1000000.0
        ).alias("secs_since_prev"),
        F.when(
            F.count("*").over(wprev) > 0,
            F.sum("_cents").over(wprev)
            / (F.count("*").over(wprev) * 100.0),
        ).alias("rolling_mean5"),
    )


def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session summary over the gap-based sessionizer:
    session count, total events, mean events/session, mean and max
    session duration in seconds — the engagement profile product
    dashboards aggregate sessions into.

    Composed VERBATIM from events_sessionize (one definition of a
    "session"; the oracle wraps the sessionize oracle the same way,
    the screens_matrix composition pattern) — so the two can never
    drift.

    Determinism: counts and µs durations are exact integers; the two
    means are single IEEE division chains rounded 6dp (seconds scale
    keeps 6dp inside double precision).

    Scale: the sessionizer's one user_id shuffle carries this final
    per-user agg too (grouping on a prefix of (user, session) —
    no new Exchange, pinned).
    """
    s = events_sessionize(spark, sf_dir)
    return s.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(
            F.sum("n_events").cast("double") / F.count("*"), 6
        ).alias("mean_events"),
        F.round(
            F.sum("duration_us").cast("double")
            / F.count("*")
            / 1000000.0,
            6,
        ).alias("mean_duration_s"),
        F.round(
            F.max("duration_us").cast("double") / 1000000.0, 6
        ).alias("max_duration_s"),
    )


QUERIES = {
    "events_session_stats": events_session_stats,
    "events_lag_features": events_lag_features,
    "events_gapfill_hourly": events_gapfill_hourly,
    "events_moving_avg": events_moving_avg,
    "events_tumbling_window": events_tumbling_window,
    "events_sliding_window": events_sliding_window,
    "events_sessionize": events_sessionize,
    "events_topk_per_user": events_topk_per_user,
    "events_dedup_latest": events_dedup_latest,
    "events_asof_join": events_asof_join,
    "events_asof_join_bucketed": events_asof_join_bucketed,
    "events_range_join": events_range_join,
    "events_rollup": events_rollup,
    "events_ohlc": events_ohlc,
    "events_counter_increase": events_counter_increase,
    "events_time_weighted_avg": events_time_weighted_avg,
    "events_percentiles": events_percentiles,
    "events_funnel": events_funnel,
    "events_conversion_latency": events_conversion_latency,
    "events_session_window_batch": events_session_window_batch,
    "events_running_total": events_running_total,
    "events_json_props": events_json_props,
}

_SQL_SESSIONIZE = f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > {_SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               strftime(MIN(ts), '{_SQL_TS_FMT}') AS session_start,
               COUNT(*) AS n_events,
               MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
        FROM sessions GROUP BY user_id, session_id
    """

_SQL_SUM_VALUE = (
    "CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)"
)

ORACLE = {
    "events_lag_features": """
        SELECT event_id, user_id,
               row_number() OVER w AS seq,
               lag(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0
                 AS prev_value,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0
                 AS secs_since_prev,
               CASE WHEN COUNT(*) OVER wp > 0
                    THEN SUM(CAST(round(value * 100) AS BIGINT)) OVER wp
                         / (COUNT(*) OVER wp * 100.0)
               END AS rolling_mean5
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wp AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
    """,
    "events_gapfill_hourly": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   COUNT(*) AS n_events,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly
        ), spine AS (
            SELECT t.event_type, d.h
            FROM (SELECT DISTINCT event_type FROM hourly) t,
                 (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                         AS h FROM bounds) d
        )
        SELECT s.event_type,
               strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
               COALESCE(y.n_events, 0) AS n_events,
               last_value(y.cents IGNORE NULLS)
                   OVER (PARTITION BY s.event_type ORDER BY s.h
                         ROWS UNBOUNDED PRECEDING) / 100.0 AS carried_sum,
               y.n_events IS NULL AS gap_filled
        FROM spine s LEFT JOIN hourly y
          ON s.event_type = y.event_type AND s.h = y.h
    """,
    "events_moving_avg": """
        WITH daily AS (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(CAST(date_trunc('day', ts) AS DATE)
                        - DATE '1970-01-01' AS INTEGER) AS day_idx,
                   SUM(CAST(value AS DECIMAL(18,6))) AS dsum
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        )
        SELECT day,
               CAST(CAST(dsum AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
               round(CAST(CAST(SUM(dsum) OVER (ORDER BY day_idx RANGE BETWEEN 6
                          PRECEDING AND CURRENT ROW) AS DECIMAL(38,6))
                     AS DOUBLE)
                     / COUNT(*) OVER (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING
                                      AND CURRENT ROW), 6) AS ma7
        FROM daily
    """,
    "events_tumbling_window": f"""
        SELECT strftime(date_trunc('hour', ts), '{_SQL_TS_FMT}') AS window_start,
               event_type, COUNT(*) AS n_events,
               {_SQL_SUM_VALUE} AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sliding_window": f"""
        WITH expanded AS (
            SELECT to_timestamp(floor(epoch_us(ts) / 1800000000) * 1800) AS w, value
            FROM events
            UNION ALL
            SELECT to_timestamp(floor(epoch_us(ts) / 1800000000) * 1800
                                - 1800) AS w, value
            FROM events
        )
        SELECT strftime(w, '{_SQL_TS_FMT}') AS window_start,
               COUNT(*) AS n_events,
               {_SQL_SUM_VALUE} AS sum_value
        FROM expanded GROUP BY 1
    """,
    "events_sessionize": _SQL_SESSIONIZE,
    # session stats compose the sessionize oracle VERBATIM (the
    # screens_matrix pattern): one definition of a session
    "events_session_stats": f"""
        WITH s AS ({{_S}})
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
                 AS mean_events,
               round(CAST(SUM(duration_us) AS DOUBLE) / COUNT(*)
                     / 1000000.0, 6) AS mean_duration_s,
               round(CAST(MAX(duration_us) AS DOUBLE) / 1000000.0, 6)
                 AS max_duration_s
        FROM s GROUP BY user_id
    """.format(_S=_SQL_SESSIONIZE),
    "events_topk_per_user": """
        SELECT user_id, rk, event_id, value FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rk
            FROM events) t
        WHERE rk <= 3
    """,
    "events_dedup_latest": f"""
        SELECT user_id, event_type, event_id,
               strftime(ts, '{_SQL_TS_FMT}') AS ts, value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts DESC, event_id DESC) AS rk
              FROM events) t
        WHERE rk = 1
    """,
    "events_asof_join": f"""
        WITH ce AS (
            SELECT *, last_value(CASE WHEN event_type = 'click' THEN event_id END
                                 IGNORE NULLS)
                          OVER w AS last_click_id,
                      last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                                 IGNORE NULLS)
                          OVER w AS last_click_us
            FROM events
            WHERE event_type IN ('click', 'purchase')
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id AS purchase_id, user_id,
               strftime(ts, '{_SQL_TS_FMT}') AS purchase_ts,
               last_click_id,
               epoch_us(ts) - last_click_us AS since_click_us
        FROM ce WHERE event_type = 'purchase'
    """,
    # the bucketed variant is result-identical by construction — same
    # oracle; the equality test pins Spark-vs-Spark plan equivalence.
    "events_asof_join_bucketed": f"""
        WITH ce AS (
            SELECT *, last_value(CASE WHEN event_type = 'click' THEN event_id END
                                 IGNORE NULLS)
                          OVER w AS last_click_id,
                      last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                                 IGNORE NULLS)
                          OVER w AS last_click_us
            FROM events
            WHERE event_type IN ('click', 'purchase')
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id AS purchase_id, user_id,
               strftime(ts, '{_SQL_TS_FMT}') AS purchase_ts,
               last_click_id,
               epoch_us(ts) - last_click_us AS since_click_us
        FROM ce WHERE event_type = 'purchase'
    """,
    "events_range_join": """
        SELECT p.user_id AS user_id,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
        FROM events p JOIN events e
          ON p.user_id = e.user_id
        WHERE p.event_type = 'purchase' AND e.event_type = 'error'
          AND epoch_us(e.ts) > epoch_us(p.ts)
          AND epoch_us(e.ts) <= epoch_us(p.ts) + 1800000000
    """,
    "events_counter_increase": """
        WITH stepped AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   lag(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_samples,
               SUM(CASE WHEN prev IS NULL THEN 0
                        WHEN cents >= prev THEN cents - prev
                        ELSE cents END) / 100.0 AS total_increase,
               CAST(SUM(CASE WHEN prev IS NOT NULL AND cents < prev
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
        FROM stepped GROUP BY user_id
    """,
    "events_ohlc": """
        SELECT event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')
                 AS hour,
               COUNT(*) AS n_events,
               arg_min(CAST(round(value * 100) AS BIGINT),
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                       || ':' ||
                       lpad(CAST(event_id AS VARCHAR), 12, '0'))
                 / 100.0 AS open,
               MAX(CAST(round(value * 100) AS BIGINT)) / 100.0 AS high,
               MIN(CAST(round(value * 100) AS BIGINT)) / 100.0 AS low,
               arg_max(CAST(round(value * 100) AS BIGINT),
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                       || ':' ||
                       lpad(CAST(event_id AS VARCHAR), 12, '0'))
                 / 100.0 AS close
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    """,
    "events_time_weighted_avg": """
        WITH stepped AS (
            SELECT user_id,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   epoch_us(ts) AS us,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id, date_trunc('day', ts)
                       ORDER BY ts, event_id) AS next_us
            FROM events
        ), agg AS (
            SELECT user_id, day,
                   COUNT(*) AS n_events,
                   SUM(CASE WHEN next_us IS NOT NULL
                            THEN cents * (next_us - us) END) AS area,
                   MAX(us) - MIN(us) AS span_us,
                   MIN(cents) AS min_cents
            FROM stepped GROUP BY user_id, day
        )
        SELECT user_id, day, n_events,
               CASE WHEN span_us > 0
                    THEN round(area / (span_us * 100.0), 6)
                    ELSE min_cents / 100.0 END AS twa_value
        FROM agg
    """,
    "events_rollup": f"""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type, COUNT(*) AS n_events,
               {_SQL_SUM_VALUE} AS sum_value
        FROM events
        GROUP BY ROLLUP(strftime(date_trunc('day', ts), '%Y-%m-%d'), event_type)
    """,
    "events_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "events_session_window_batch": """
        WITH s AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), g AS (
            SELECT user_id, ts, value,
                   SUM(brk) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS sid
            FROM s
        )
        SELECT user_id,
               MIN(epoch_us(ts)) AS start_us,
               MAX(epoch_us(ts)) + 1800000000 AS end_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM g
        GROUP BY user_id, sid
    """,
    "events_conversion_latency": """
        WITH v AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                     AS t_view
            FROM events GROUP BY user_id
        ), c AS (
            SELECT e.user_id, MAX(v.t_view) AS t_view,
                   MIN(CASE WHEN e.event_type = 'click'
                            AND epoch_us(e.ts) > v.t_view
                            THEN epoch_us(e.ts) END) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            GROUP BY e.user_id
        )
        SELECT (t_click - t_view) // 600000000 AS bucket_10min,
               COUNT(*) AS n_users
        FROM c WHERE t_click IS NOT NULL
        GROUP BY 1
    """,
    "events_funnel": """
        WITH v AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view
            FROM events GROUP BY user_id
        ), c AS (
            SELECT e.user_id,
                   MIN(CASE WHEN e.event_type = 'click'
                            AND epoch_us(e.ts) > v.t_view
                            THEN epoch_us(e.ts) END) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id,
                   MIN(CASE WHEN e.event_type = 'purchase'
                            AND epoch_us(e.ts) > c.t_click
                            THEN epoch_us(e.ts) END) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            GROUP BY e.user_id
        )
        SELECT v.user_id,
               (CASE WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END)
               AS funnel_depth
        FROM v JOIN c ON v.user_id = c.user_id
               JOIN p ON v.user_id = p.user_id
    """,
    "events_running_total": """
        WITH daily AS (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   COUNT(*) AS n_purchases,
                   SUM(CAST(value AS DECIMAL(18,6))) AS dsum
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT day, n_purchases,
               CAST(CAST(dsum AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
               CAST(CAST(SUM(dsum) OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DECIMAL(38,6)) AS DOUBLE) AS cum_revenue
        FROM daily
    """,
    "events_json_props": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS DOUBLE)
                 / COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS avg_k
        FROM events GROUP BY event_type
    """,
}
