"""Semantic tests for the composed screen matrix
(operators/screens_ops.py): flag/verdict consistency against the
individual member operators, and funnel sanity (each screen must
actually discriminate on the synthetic corpus).
"""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.screens_ops import (
    _MAX_PPL,
    _MIN_QUALITY,
    corpus_screens_matrix,
)
from tests.conftest import SF_SMOKE

_FLAGS = (
    "pass_quality",
    "pass_boilerplate",
    "pass_readability",
    "pass_ppl",
    "pass_dedup",
    "pass_dsir",
    "pass_blocklist",  # r17: the seventh screen
)


def test_matrix_flags_match_members(spark):
    from aichemy_data_pipelines_spark.operators.corpus_ops import dedup_keep_one
    from aichemy_data_pipelines_spark.operators.dsir_ops import (
        corpus_dsir_weights,
    )
    from aichemy_data_pipelines_spark.operators.textops import text_quality

    rows = corpus_screens_matrix(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs

    quality = {
        r.doc_id: r.quality_score
        for r in text_quality(spark, SF_SMOKE).collect()
    }
    keep = {r.doc_id: r.keep for r in dedup_keep_one(spark, SF_SMOKE).collect()}
    # the matrix uses the RELATIVE dsir screen: log-ratio >= corpus mean
    from decimal import Decimal

    lrs = {
        r.doc_id: Decimal(str(r.dsir_logratio)).quantize(Decimal("0.000001"))
        for r in corpus_dsir_weights(spark, SF_SMOKE).collect()
    }
    lr_mean = Decimal(
        str(round(float(sum(lrs.values())) / len(lrs), 9))
    )
    dsir = {doc: lr >= lr_mean for doc, lr in lrs.items()}
    from aichemy_data_pipelines_spark.operators.blocklist_ops import (
        docs_blocklist_filter,
    )

    blocked = {
        r.doc_id: r.blocked
        for r in docs_blocklist_filter(spark, SF_SMOKE).collect()
    }
    for r in rows:
        assert r.pass_quality == (quality[r.doc_id] >= _MIN_QUALITY)
        assert r.pass_ppl == (r.ppl <= _MAX_PPL)
        assert r.pass_dedup == (keep[r.doc_id] == 1)
        assert r.pass_dsir == dsir[r.doc_id]
        assert r.pass_blocklist == (not blocked[r.doc_id])
        n_failed = sum(0 if getattr(r, f) else 1 for f in _FLAGS)
        assert r.n_failed == n_failed
        assert r.kept == (n_failed == 0)


def test_each_screen_discriminates(spark):
    """Every screen passes some docs and fails some docs on the
    synthetic corpus — a screen that never fires is a threshold bug."""
    rows = corpus_screens_matrix(spark, SF_SMOKE).collect()
    for f in _FLAGS:
        vals = {getattr(r, f) for r in rows}
        assert vals == {True, False}, f
    kept = sum(r.kept for r in rows)
    assert 0 < kept < len(rows)
