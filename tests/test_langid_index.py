"""Persisted-langid contract (pipeline/langid_index.py): build+score
must be byte-equal to the inline text_langid_classifier operator,
the frozen weights must score NEW batches without corpus access, and
a constants mismatch must refuse loudly."""

from __future__ import annotations

import pytest

from aichemy_data_pipelines_spark.operators.langid_ops import (
    text_langid_classifier,
)
from aichemy_data_pipelines_spark.pipeline.langid_index import (
    build_langid_index,
    score_batch,
)
from tests.conftest import SF_SMOKE


def test_persisted_langid_matches_inline_operator(spark, tmp_path):
    root = str(tmp_path / "langid")
    assert build_langid_index(spark, SF_SMOKE, root) == 1
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    persisted = sorted(
        tuple(r) for r in score_batch(spark, root, docs).collect()
    )
    inline = sorted(
        tuple(r) for r in text_langid_classifier(spark, SF_SMOKE).collect()
    )
    assert persisted == inline


def test_frozen_weights_score_new_batch(spark, tmp_path):
    """A never-seen batch scores against the frozen weights: the
    teacher label still computes (it is a text expression), scores
    are valid softmax maxima (>= 1/5), and agree is consistent with
    the published labels."""
    root = str(tmp_path / "langid")
    build_langid_index(spark, SF_SMOKE, root)
    english = (
        "the quick brown fox jumps over a lazy dog and it is the "
        "best of a family in the field"
    )
    nostop = " ".join(["zorgl"] * 20)
    batch = spark.createDataFrame(
        [(1, english), (2, nostop)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in score_batch(spark, root, batch).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].teacher_lang == "en"
    assert rows[2].teacher_lang == "und"
    for r in rows.values():
        assert 0.2 - 1e-9 <= r.score <= 1.0
        assert r.agree == int(r.pred_lang == r.teacher_lang)


def test_incompatible_constants_refuse(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "langid")
    build_langid_index(spark, SF_SMOKE, root)
    import aichemy_data_pipelines_spark.pipeline.langid_index as li

    monkeypatch.setitem(li._META, "k", 9999)
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="incompatible"):
        score_batch(spark, root, docs)


def test_missing_snapshot_refuses(spark, tmp_path):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no langid snapshot"):
        score_batch(spark, str(tmp_path / "absent"), docs)
