"""Semantic tests for the round-5 quality screens: CUSUM
change-point detection (analytics_ext), embedding cluster outliers
(ivf), and Flesch readability (textops) — pure-Python ground truth
plus invariant checks.
"""

from __future__ import annotations

import re
from collections import defaultdict
from decimal import Decimal

from aichemy_data_pipelines_spark.operators.analytics_ext import events_cusum
from aichemy_data_pipelines_spark.operators.ivf import (
    embeddings_cluster_outliers,
)
from aichemy_data_pipelines_spark.operators.textops import text_readability
from tests.conftest import SF_SMOKE


def test_cusum_ground_truth(spark):
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type", "ts", "value")
        .collect()
    )
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    expected = {}
    for etype, evs in by_type.items():
        vals = [Decimal(str(round(r.value, 2))) for r in evs]
        mean = Decimal(str(round(float(sum(vals)) / len(vals), 6)))
        evs_sorted = sorted(
            zip(evs, vals), key=lambda p: (p[0].ts, p[0].event_id)
        )
        run = Decimal(0)
        for r, v in evs_sorted:
            run += v - mean
            expected[r.event_id] = (
                round(float(run), 6),
                abs(run) > Decimal("100"),
            )
    got = {
        r.event_id: (r.cusum, r.is_change)
        for r in events_cusum(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_cusum_ends_near_zero(spark):
    """By construction Σ(x-mean) over the whole series ≈ 0 (up to
    n × the 6dp mean rounding); the LAST cusum per type must be tiny
    relative to the series scale."""
    rows = events_cusum(spark, SF_SMOKE).collect()
    last = {}
    for r in sorted(rows, key=lambda r: (r.ts, r.event_id)):
        last[r.event_type] = r.cusum
    for etype, c in last.items():
        assert abs(c) < 1.0, (etype, c)


def test_cluster_outliers_invariants(spark):
    rows = embeddings_cluster_outliers(spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(rows) == n_vecs  # every vector gets a verdict
    by_list = defaultdict(list)
    for r in rows:
        assert -1.0 <= r.centroid_cos <= 1.0
        assert r.is_outlier == (r.zscore < -2.0)
        by_list[r.list_id].append(r.zscore)
    # z-scores are standardized within each cluster: mean ≈ 0
    for lst, zs in by_list.items():
        if len(zs) > 1:
            assert abs(sum(zs) / len(zs)) < 0.01, lst
    # ~2.3% of a roughly-normal tail sits below -2; just require some
    assert any(r.is_outlier for r in rows)
    assert sum(r.is_outlier for r in rows) < 0.2 * n_vecs


def test_readability_ground_truth(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    expected = {}
    for r in docs:
        toks = r.text.strip().lower().split()
        syl = sum(len(re.findall(r"[aeiou]+", t)) for t in toks)
        score = round(
            206.835 - 1.015 * len(toks) - 84.6 * (syl / len(toks)), 6
        )
        expected[r.doc_id] = (len(toks), syl, score)
    got = {
        r.doc_id: (r.n_words, r.n_syllables, r.flesch)
        for r in text_readability(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_quantile_histogram_rollup_ground_truth(spark):
    """Merged-histogram quantile lower bounds recomputed in pure
    Python; the bucket-width error contract holds vs exact quantiles."""
    import math
    from collections import Counter, defaultdict

    from aichemy_data_pipelines_spark.operators.sketch_ops import (
        _QH_WIDTH,
        events_quantile_histogram_rollup,
    )

    width = float(_QH_WIDTH)
    rows = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r.value)
    got = {
        r.event_type: r
        for r in events_quantile_histogram_rollup(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(by_type)
    for etype, vals in by_type.items():
        hist = Counter(int(math.floor(v / width)) for v in vals)
        total = len(vals)
        r = got[etype]
        assert r.n_events == total
        for q, lo in ((50, r.p50_lo), (90, r.p90_lo), (99, r.p99_lo)):
            cum = 0
            for b in sorted(hist):
                cum += hist[b]
                if cum * 100 >= q * total:
                    assert lo == b * width
                    break
            # width-bounded error vs the exact quantile
            exact = sorted(vals)[max(0, -(-q * total // 100) - 1)]
            assert lo <= exact < lo + 2 * width


def test_readability_empty_doc_is_explicit_null(spark, tmp_path):
    """Empty/punctuation-only documents must agree between engines.

    With the whitespace tokenizer, split('') returns [''] in BOTH
    engines, so n_words is never 0 today — but the n_words >= 1 guard
    pins flesch = explicit NULL for any future tokenizer that CAN
    emit zero tokens (Spark's non-ANSI divide would give NULL, DuckDB
    ±inf — a silent parity break).  This test locks the degenerate
    inputs end-to-end against the DuckDB oracle."""
    import duckdb

    from aichemy_data_pipelines_spark.operators.textops import ORACLE

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", "web", 19),
            (2, "", "en", "web", 0),
            (3, "!!! ??? ...", "en", "web", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    rows = {
        r.doc_id: r
        for r in text_readability(spark, sf).collect()
    }
    # split('') -> [''] in both engines: one degenerate empty token
    assert rows[2].n_words == 1 and rows[2].n_syllables == 0
    assert rows[3].n_words == 3 and rows[3].n_syllables == 0
    assert rows[1].flesch is not None

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    orows = {
        r[0]: r for r in con.sql(ORACLE["text_readability"]).fetchall()
    }
    for doc_id in (1, 2, 3):
        s, o = rows[doc_id], orows[doc_id]
        assert (s.n_words, s.n_syllables, s.flesch) == (o[1], o[2], o[3])
