"""Persisted-LM contract (pipeline/lm_index.py): build+score must be
byte-equal to the inline corpus_bigram_perplexity operator, and the
frozen model must score NEW batches without corpus access.
"""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.lm_ops import (
    corpus_bigram_perplexity,
)
from aichemy_data_pipelines_spark.pipeline.lm_index import (
    build_lm_index,
    score_batch,
)
from tests.conftest import SF_SMOKE


def test_persisted_lm_matches_inline_operator(spark, tmp_path):
    root = str(tmp_path / "lm")
    assert build_lm_index(spark, SF_SMOKE, root) == 1
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    persisted = sorted(
        (r.doc_id, r.n_bigrams, r.avg_logprob, r.ppl)
        for r in score_batch(spark, root, docs).collect()
    )
    inline = sorted(
        (r.doc_id, r.n_bigrams, r.avg_logprob, r.ppl)
        for r in corpus_bigram_perplexity(spark, SF_SMOKE).collect()
    )
    assert persisted == inline


def test_frozen_model_scores_new_batch(spark, tmp_path):
    """A never-seen batch scores against the frozen counts: natural
    target-language text must come out lower-perplexity than token
    salad, and short docs emit no row."""
    root = str(tmp_path / "lm")
    build_lm_index(spark, SF_SMOKE, root)
    corpus_text = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where("lang = 'en'")
        .select("text")
        .first()
        .text
    )
    batch = spark.createDataFrame(
        [
            (1, "en", corpus_text),  # in-domain
            (2, "xx", "zq wv jx qk zz vv xq kj"),  # token salad
            (3, "en", "one"),  # too short: no bigrams
        ],
        "doc_id long, lang string, text string",
    )
    rows = {r.doc_id: r for r in score_batch(spark, root, batch).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].ppl < rows[2].ppl


def test_incompatible_model_is_refused(spark, tmp_path, monkeypatch):
    import aichemy_data_pipelines_spark.pipeline.lm_index as lmx

    root = str(tmp_path / "lm")
    build_lm_index(spark, SF_SMOKE, root)
    docs = spark.createDataFrame(
        [(1, "en", "a b c")], "doc_id long, lang string, text string"
    )
    monkeypatch.setattr(lmx, "_B2", 9999)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="incompatible"):
        score_batch(spark, root, docs)
