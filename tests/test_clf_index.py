"""Persisted-classifier contract (pipeline/clf_index.py): build+score
must be byte-equal to the inline docs_quality_classifier operator,
the frozen weights must score NEW batches without corpus access, and
a constants mismatch must refuse loudly."""

from __future__ import annotations

import pytest

from aichemy_data_pipelines_spark.operators.classifier_ops import (
    docs_quality_classifier,
)
from aichemy_data_pipelines_spark.pipeline.clf_index import (
    build_clf_index,
    score_batch,
)
from tests.conftest import SF_SMOKE


def test_persisted_clf_matches_inline_operator(spark, tmp_path):
    root = str(tmp_path / "clf")
    assert build_clf_index(spark, SF_SMOKE, root) == 1
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    persisted = sorted(
        tuple(r) for r in score_batch(spark, root, docs).collect()
    )
    inline = sorted(
        tuple(r) for r in docs_quality_classifier(spark, SF_SMOKE).collect()
    )
    assert persisted == inline


def test_frozen_weights_score_new_batch(spark, tmp_path):
    """A never-seen batch scores against the frozen weights: the
    teacher label still computes (it is a text expression), scores
    stay in [0, 1], and repetitive junk (distinct-ratio collapse)
    must score below clean prose under the distilled quality
    boundary."""
    root = str(tmp_path / "clf")
    build_clf_index(spark, SF_SMOKE, root)
    clean = (
        "the quick brown fox jumps over that lazy dog with a friend "
        "of the family and then rests in it for a while"
    )
    junk = " ".join(["spam"] * 24)
    batch = spark.createDataFrame(
        [(1, clean), (2, junk)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in score_batch(spark, root, batch).collect()}
    assert set(rows) == {1, 2}
    assert all(0.0 <= r.score <= 1.0 for r in rows.values())
    assert rows[1].label == 1 and rows[2].label == 0
    assert rows[1].score > rows[2].score


def test_incompatible_constants_refuse(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "clf")
    build_clf_index(spark, SF_SMOKE, root)
    import aichemy_data_pipelines_spark.pipeline.clf_index as ci

    monkeypatch.setitem(ci._META, "k", 9999)
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="incompatible"):
        score_batch(spark, root, docs)
