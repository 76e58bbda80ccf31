"""Hashed bigram-LM perplexity: the filter must behave like a
language model — text from the training domain (English) scores
lower perplexity than out-of-domain text."""

from __future__ import annotations

import math

from aichemy_data_pipelines_spark.operators.lm_ops import (
    corpus_bigram_perplexity,
)
from tests.conftest import SF_SMOKE


def test_target_language_scores_lower_perplexity(spark):
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    rows = corpus_bigram_perplexity(spark, SF_SMOKE).collect()
    assert rows
    en = [r.ppl for r in rows if langs[r.doc_id] == "en"]
    other = [r.ppl for r in rows if langs[r.doc_id] != "en"]
    assert en and other
    mean_en = sum(en) / len(en)
    mean_other = sum(other) / len(other)
    assert mean_en < mean_other, (mean_en, mean_other)
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.ppl > 0
        # ppl is exactly exp(-avg_logprob) up to the output rounding
        assert abs(r.ppl - math.exp(-r.avg_logprob)) < 1e-3 * r.ppl
