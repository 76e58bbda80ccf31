"""Ground-truth pins for the round-6 analytics/curation additions.

The driver/oracle gates prove engine parity; these tests prove the
MATH — on synthetic inputs where the right answer is computable by
hand (the testdata's uniform source mix, for instance, cannot
distinguish temperature scaling from plain normalization).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_temperature_mix_upweights_small_sources(spark, tmp_path):
    """τ=0.7 must pull small sources ABOVE their raw share and large
    sources below (toward uniform), with weights summing to 1."""
    from aichemy_data_pipelines_spark.operators.sampling_ops import (
        corpus_temperature_mix,
    )

    sf = str(tmp_path)
    rows = [(i, f"text {i}", "en", "big" if i < 90 else "small", 10)
            for i in range(100)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = {r.source: r for r in corpus_temperature_mix(spark, sf).collect()}
    assert got["big"].frac == 0.9 and got["small"].frac == 0.1
    assert got["small"].weight > got["small"].frac
    assert got["big"].weight < got["big"].frac
    assert abs(got["big"].weight + got["small"].weight - 1.0) < 2e-6
    # closed form: w_small = .1^.7 / (.1^.7 + .9^.7)
    expect = 0.1**0.7 / (0.1**0.7 + 0.9**0.7)
    assert abs(got["small"].weight - expect) < 1e-4


def test_user_entropy_bounds(spark):
    """Entropy is 0 for single-type users and ≤ ln(n_types) always;
    verified against a plain-Python recomputation at smoke SF."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_user_entropy,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    truth = {}
    for r in ev.select("user_id", "event_type").collect():
        truth.setdefault(r.user_id, {}).setdefault(r.event_type, 0)
        truth[r.user_id][r.event_type] += 1
    for r in events_user_entropy(spark, SF_SMOKE).collect():
        counts = truth[r.user_id]
        n = sum(counts.values())
        expect = -sum(c / n * math.log(c / n) for c in counts.values())
        assert abs(r.entropy - expect) < 1e-6, r.user_id
        assert r.entropy <= math.log(r.n_types) + 1e-9
        if r.n_types == 1:
            assert r.entropy == 0.0


def test_lexical_diversity_ground_truth(spark, tmp_path):
    """Hand-checkable doc: 'a a a b c' → 5 tokens, 3 types,
    ttr=0.6, hapax b,c of 3 types = 2/3."""
    from aichemy_data_pipelines_spark.operators.tfidf_ops import (
        docs_lexical_diversity,
        docs_token_entropy,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "a a a b c", "en", "s", 9), (2, "x x x x", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    ld = {r.doc_id: r for r in docs_lexical_diversity(spark, sf).collect()}
    assert (ld[1].n_tokens, ld[1].n_types) == (5, 3)
    assert ld[1].ttr == 0.6
    assert abs(ld[1].hapax_frac - 2 / 3) < 1e-6
    assert (ld[2].n_tokens, ld[2].n_types, ld[2].ttr) == (4, 1, 0.25)
    assert ld[2].hapax_frac == 0.0

    te = {r.doc_id: r for r in docs_token_entropy(spark, sf).collect()}
    assert te[2].entropy == 0.0  # one repeated token = zero entropy
    expect = -(0.6 * math.log(0.6) + 2 * 0.2 * math.log(0.2))
    assert abs(te[1].entropy - expect) < 1e-6


def test_inter_arrival_ground_truth(spark, tmp_path):
    """Three events at t, t+1s, t+3s → gaps 1s and 2s."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_inter_arrival_stats,
    )

    sf = str(tmp_path)
    spark.sql(
        "SELECT * FROM VALUES "
        "(1L, timestamp'2024-01-01 00:00:00', 7L, 'view', 1.0D, '{}'),"
        "(2L, timestamp'2024-01-01 00:00:01', 7L, 'view', 1.0D, '{}'),"
        "(3L, timestamp'2024-01-01 00:00:03', 7L, 'view', 1.0D, '{}'),"
        "(4L, timestamp'2024-01-01 00:00:00', 8L, 'view', 1.0D, '{}') "
        "AS t(event_id, ts, user_id, event_type, value, props)"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    rows = {r.user_id: r for r in
            events_inter_arrival_stats(spark, sf).collect()}
    assert 8 not in rows  # single event -> no gaps
    r = rows[7]
    assert (r.n_gaps, r.min_gap_us, r.max_gap_us) == (2, 1_000_000,
                                                      2_000_000)
    assert r.mean_gap_s == 1.5


def test_copurchase_lift_identity(spark):
    """lift · n_a · n_b == n_ab · N exactly (integer identity) and
    confidence = n_ab/n_a for every emitted pair."""
    from aichemy_data_pipelines_spark.operators.insights_ops import (
        parts_copurchase_lift,
    )

    rows = parts_copurchase_lift(spark, SF_SMOKE).collect()
    assert rows
    n_total = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey").distinct().count()
    )
    for r in rows[:200]:
        # emitted values are 6dp-rounded: the true value sits within
        # half a grid step (plus float fuzz at the exact midpoint)
        assert abs(r.confidence - round(r.n_orders / r.n_a, 6)) <= 1e-9
        assert (
            abs(r.lift - round((r.n_orders * n_total) / (r.n_a * r.n_b), 6))
            <= 1e-9
        )


def test_broadcast_when_hint_boundary(spark):
    """broadcast_when attaches the hint exactly at n <= max and not
    past it (analyzed-plan ResolvedHint presence)."""
    from aichemy_data_pipelines_spark.functions.hints import broadcast_when

    df = spark.range(10)
    hinted = spark.range(5).join(
        broadcast_when(df, 10, 10, "t"), "id"
    )
    assert "ResolvedHint" in (
        hinted._jdf.queryExecution().analyzed().toString()
    )
    unhinted = spark.range(5).join(
        broadcast_when(df, 11, 10, "t"), "id"
    )
    assert "ResolvedHint" not in (
        unhinted._jdf.queryExecution().analyzed().toString()
    )


def test_conf_int_default_and_override(spark):
    from aichemy_data_pipelines_spark.functions.hints import conf_int

    key = "spark.graft.test.someGuard"
    assert conf_int(spark, key, 42) == 42
    spark.conf.set(key, "7")
    try:
        assert conf_int(spark, key, 42) == 7
    finally:
        spark.conf.unset(key)


def test_kl_drift_zero_for_identical_days(spark, tmp_path):
    """Two days with identical value histograms have KL exactly 0;
    a shifted day is strictly positive."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_kl_drift,
    )

    sf = str(tmp_path)
    rows = []
    eid = 0
    # days 1+2: identical histograms; day 3: all mass in one bucket
    for day, values in (
        ("01", [10.0, 50.0, 100.0, 200.0]),
        ("02", [10.0, 50.0, 100.0, 200.0]),
        ("03", [400.0, 400.0, 400.0, 400.0]),
    ):
        for v in values:
            eid += 1
            rows.append(
                (eid, f"2024-01-{day} 12:00:00", 1, "view", v, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
        1
    ).write.parquet(f"{sf}/events.parquet")

    got = {r.day: r.kl for r in events_kl_drift(spark, sf).collect()}
    # identical days still diverge from the MIXED baseline equally
    assert got["2024-01-01"] == got["2024-01-02"]
    # the concentrated day diverges more than the spread days
    assert got["2024-01-03"] > got["2024-01-01"] >= 0


def test_gini_bounds(spark, tmp_path):
    """Equal sources → gini 0; near-total concentration → gini → 1."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        corpus_source_gini,
    )

    sf = str(tmp_path / "eq")
    spark.createDataFrame(
        [(i, "t", "en", f"s{i % 4}", 100) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    r = corpus_source_gini(spark, sf).first()
    assert r.n_sources == 4 and r.gini_docs == 0.0 and r.gini_chars == 0.0

    sf2 = str(tmp_path / "conc")
    rows = [(i, "t", "en", "whale", 1000) for i in range(97)] + [
        (100 + j, "t", "en", f"m{j}", 1) for j in range(3)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf2}/documents.parquet")
    r2 = corpus_source_gini(spark, sf2).first()
    assert r2.gini_docs > 0.7 and r2.gini_chars > 0.7


def test_mad_screen_survives_outlier_that_breaks_zscore(spark, tmp_path):
    """One huge outlier: the MAD screen still flags exactly it, with
    the median/MAD barely moved — the robustness motivation."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_anomaly_mad,
    )

    sf = str(tmp_path)
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 10.2, 9.8, 1000.0]
    spark.createDataFrame(
        [(i, f"2024-01-01 00:00:{i:02d}", 1, "view", v, "{}")
         for i, v in enumerate(vals)],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
        1
    ).write.parquet(f"{sf}/events.parquet")
    r = events_anomaly_mad(spark, sf).first()
    assert r.n == 9 and abs(r.median - 10.0) < 0.3
    assert r.n_outliers == 1  # exactly the 1000.0


def test_forecast_backtest_perfect_weekly_series(spark, tmp_path):
    """A perfectly 7-periodic daily series backtests to MAE 0."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_forecast_backtest,
    )

    sf = str(tmp_path)
    rows = []
    eid = 0
    for day in range(14):
        # count pattern repeats with period 7: day % 7 + 1 events
        for _ in range(day % 7 + 1):
            eid += 1
            rows.append(
                (eid, f"2024-01-{day + 1:02d} 01:00:00", 1, "view",
                 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
        1
    ).write.parquet(f"{sf}/events.parquet")
    r = events_forecast_backtest(spark, sf).first()
    assert r.n_days == 7 and r.mae == 0.0 and r.mean_bias == 0.0


def test_cli_audit_emits_all_sections(spark, capsys):
    """The audit subcommand runs every health section and prints one
    parseable JSON document with non-empty sections."""
    import json as _json

    from aichemy_data_pipelines_spark.cli import main
    from tests.conftest import SF_SMOKE

    rc = main(["audit", "--sf-dir", SF_SMOKE, "--max-rows", "8"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {
        "uniqueness", "orphans", "value_drift", "source_concentration",
    }
    assert all(out[k]["rows"] for k in out)
    assert {r["table_name"] for r in out["uniqueness"]["rows"]} >= {
        "documents",
    }
    assert 0.0 <= (
        out["source_concentration"]["rows"][0]["gini_docs"]
    ) <= 1.0
    # deterministic truncation: drift keeps the NEWEST days and says so
    drift = out["value_drift"]
    assert drift["truncated"] is True  # 30 days > 8-row cap
    days = [r["day"] for r in drift["rows"]]
    assert days == sorted(days, reverse=True) and len(days) == 8


def test_kl_drift_clamps_negative_values(spark, tmp_path):
    """Negative values (instrumentation regression) land in bucket 0
    — the 16-bucket invariant holds for any input range and the day
    still scores instead of minting out-of-range buckets."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_kl_drift,
    )

    sf = str(tmp_path)
    rows = [(1, "2024-01-01 01:00:00", 1, "view", 10.0, "{}"),
            (2, "2024-01-02 01:00:00", 1, "view", -500.0, "{}"),
            (3, "2024-01-02 01:00:01", 1, "view", -3.0, "{}")]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
        1
    ).write.parquet(f"{sf}/events.parquet")
    got = {r.day: r for r in events_kl_drift(spark, sf).collect()}
    assert got["2024-01-02"].n_events == 2
    assert got["2024-01-02"].kl >= 0.0  # scored, no crash/extra buckets


def test_forecast_backtest_counts_zero_event_days(spark, tmp_path):
    """A type active on day 1 but silent on day 8 must contribute its
    full miss to MAE — zero-event days are scored, not dropped."""
    from aichemy_data_pipelines_spark.operators.analytics_ext import (
        events_forecast_backtest,
    )

    sf = str(tmp_path)
    rows = []
    # 'spiky': 5 events on day 1, nothing after; observation window
    # extended to day 8 by a second type
    for i in range(5):
        rows.append((i, "2024-01-01 01:00:00", 1, "spiky", 1.0, "{}"))
    rows.append((99, "2024-01-08 01:00:00", 1, "steady", 1.0, "{}"))
    rows.append((98, "2024-01-01 01:00:00", 1, "steady", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
        1
    ).write.parquet(f"{sf}/events.parquet")
    got = {r.event_type: r for r in
           events_forecast_backtest(spark, sf).collect()}
    # scoring grid = day 8 only; spiky actual 0 vs pred 5 -> MAE 5
    assert got["spiky"].n_days == 1 and got["spiky"].mae == 5.0
    assert got["spiky"].mean_bias == -5.0
    # steady: actual 1 vs pred 1 -> perfect
    assert got["steady"].mae == 0.0
