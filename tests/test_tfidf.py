"""Semantic tests for TF-IDF keywords and the Zipf fit
(operators/tfidf_ops.py). Oracle parity is covered by
tests/test_oracle_parity.py; these pin the math against independent
pure-Python ground truth.
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

from aichemy_data_pipelines_spark.operators.tfidf_ops import (
    _TOP_K,
    _ZIPF_R,
    docs_tfidf_topterms,
    terms_zipf_fit,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return {
        r.doc_id: r.text.strip().lower().split()
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }


def test_tfidf_ground_truth(spark):
    docs = _docs(spark)
    n = len(docs)
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))
    idf = {t: Decimal(str(round(math.log(n / c), 9))) for t, c in df.items()}

    expected = {}
    for doc_id, toks in docs.items():
        tf = Counter(toks)
        scored = sorted(
            ((tf[t] * idf[t], t) for t in tf), key=lambda p: (-p[0], p[1])
        )
        expected[doc_id] = [
            (t, tf[t], round(float(s), 6), i + 1)
            for i, (s, t) in enumerate(scored[:_TOP_K])
        ]

    got = {}
    for r in docs_tfidf_topterms(spark, SF_SMOKE).collect():
        got.setdefault(r.doc_id, []).append(
            (r.term, r.tf, r.score, r.term_rank)
        )
    for doc_id in got:
        got[doc_id].sort(key=lambda p: p[3])
    assert got == expected


def test_zipf_fit_ground_truth(spark):
    docs = _docs(spark)
    freq = Counter()
    for toks in docs.values():
        freq.update(toks)
    top = sorted(freq.items(), key=lambda p: (-p[1], p[0]))[:_ZIPF_R]
    xs = [Decimal(str(round(math.log(i + 1), 9))) for i in range(len(top))]
    ys = [Decimal(str(round(math.log(c), 9))) for _, c in top]
    n = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * float(sxy) - float(sx) * float(sy)) / (
        n * float(sxx) - float(sx) * float(sx)
    )
    intercept = (float(sy) - slope * float(sx)) / n

    row = terms_zipf_fit(spark, SF_SMOKE).collect()[0]
    assert row.n_terms == n
    assert row.slope == round(slope, 6)
    assert row.intercept == round(intercept, 6)
    # a token-frequency distribution always has a non-increasing
    # rank curve, so the fitted slope cannot be positive
    assert row.slope <= 0.0


def test_vocab_growth_ground_truth(spark):
    from aichemy_data_pipelines_spark.operators.tfidf_ops import (
        _HEAPS_BUCKET,
        corpus_vocab_growth,
    )

    docs = _docs(spark)
    firsts = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id]
        for i in range(len(toks) - 2):
            sh = " ".join(toks[i : i + 3])
            firsts.setdefault(sh, doc_id)
    from collections import Counter

    per_bucket = Counter(d // _HEAPS_BUCKET for d in firsts.values())
    expected, cum = [], 0
    for b in sorted(per_bucket):
        cum += per_bucket[b]
        expected.append((b, per_bucket[b], cum))
    got = [
        (r.bucket, r.n_new_terms, r.vocab_size)
        for r in corpus_vocab_growth(spark, SF_SMOKE)
        .orderBy("bucket")
        .collect()
    ]
    assert got == expected
    # running total is monotone and ends at the full shingle vocab
    assert got[-1][2] == len(firsts)
