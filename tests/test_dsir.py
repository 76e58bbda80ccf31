"""DSIR importance weights: the estimator must actually separate the
target domain — English documents should score higher average
log-likelihood ratio than non-English ones, and the weights must be
internally consistent."""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.dsir_ops import (
    corpus_dsir_weights,
)
from tests.conftest import SF_SMOKE


def test_weights_separate_target_language(spark):
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    rows = corpus_dsir_weights(spark, SF_SMOKE).collect()
    assert len(rows) == len(docs)
    en = [r.dsir_logratio for r in rows if docs[r.doc_id] == "en"]
    other = [r.dsir_logratio for r in rows if docs[r.doc_id] != "en"]
    assert en and other
    mean_en = sum(en) / len(en)
    mean_other = sum(other) / len(other)
    assert mean_en > mean_other, (mean_en, mean_other)
    # the selection verdict is exactly the sign of the weight
    for r in rows:
        assert r.selected == (r.dsir_logratio >= 0) or abs(
            r.dsir_logratio
        ) < 1e-6
        assert r.n_tokens >= 1
