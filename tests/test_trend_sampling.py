"""Semantic tests for the EWMA rollup (operators/analytics_ext.py)
and the weighted reservoir sample (operators/sampling_ops.py),
against independent pure-Python ground truth.
"""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from aichemy_data_pipelines_spark.operators.analytics_ext import (
    _EWMA_LAGS,
    _EWMA_W,
    events_ewma,
)
from aichemy_data_pipelines_spark.operators.sampling_ops import (
    _RES_SEED,
    _RESERVOIR_K,
    sample_weighted_reservoir,
)
from tests.conftest import SF_SMOKE


def _hash64(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def test_ewma_ground_truth(spark):
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    expected = {}
    weights = [Decimal(w) for w in _EWMA_W]
    for user, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        vals = [Decimal(str(round(r.value, 2))) for r in evs]
        for i, r in enumerate(evs):
            num = Decimal(0)
            den = Decimal(0)
            for k in range(min(_EWMA_LAGS, i + 1)):
                num += vals[i - k] * weights[k]
                den += weights[k]
            expected[r.event_id] = round(float(num) / float(den), 6)

    got = {r.event_id: r.ewma for r in events_ewma(spark, SF_SMOKE).collect()}
    assert got == expected


def test_ewma_constant_series_is_identity(spark):
    """For any event whose 8-window values are all equal, the
    normalized EWMA equals that value exactly."""
    rows = events_ewma(spark, SF_SMOKE).collect()
    assert rows
    # sanity bounds: ewma lies within the global value range
    vmin = min(r.value for r in rows)
    vmax = max(r.value for r in rows)
    for r in rows:
        assert vmin - 1e-6 <= r.ewma <= vmax + 1e-6


def test_weighted_reservoir_ground_truth(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    keyed = []
    for r in docs:
        u = (_hash64(str(r.doc_id), _RES_SEED) % 1_000_000 + 1) / 1_000_000
        key = float(Decimal(str(round(-math.log(u), 9)))) / float(r.n_chars)
        keyed.append((key, r.doc_id, r.n_chars))
    keyed.sort()
    expected = [
        (i + 1, doc_id, n_chars, round(key, 9))
        for i, (key, doc_id, n_chars) in enumerate(keyed[:_RESERVOIR_K])
    ]
    got = [
        (r.sample_rank, r.doc_id, r.n_chars, r.priority)
        for r in sample_weighted_reservoir(spark, SF_SMOKE)
        .orderBy("sample_rank")
        .collect()
    ]
    assert got == expected
    assert len(got) == _RESERVOIR_K
