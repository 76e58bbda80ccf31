"""Persisted quality-classifier artifact: train once, score every
ingest batch — the fourth persisted artifact alongside the IVF index
(pipeline/ann_index.py), the LSH band index
(pipeline/dedup_index.py) and the bigram LM (pipeline/lm_index.py).

``operators/classifier_ops.docs_quality_classifier`` trains its
weights inside the query; at 100 TB the fastText/DCLM recipe trains
the student ONCE on a labeled slice and then scores every arriving
shard against the frozen weights. This module persists the trained
state — the (_K+2)-row (j, w) weight table, a few hundred bytes —
as one atomic versioned snapshot, and scores arbitrary document
batches against it through the SAME featurization + sigmoid chain
(classifier_ops.features_from_docs / _score / present_scores), so
persisted scoring is byte-identical to the inline operator by
construction (pinned in tests/test_clf_index.py).

Scale: training is the documented bounded-gradient loop (one corpus
pass per step over the persisted feature frame); scoring a batch is
one map-side featurization + one broadcast join against a tiny
literal — no corpus access at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.operators.classifier_ops import (
    _K,
    _LR,
    _MIN_QUALITY,
    _SEED,
    _STEPS,
    _score,
    features_from_docs,
    present_scores,
    train_weights,
)
from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable

_META = {
    "k": _K,
    "lr": _LR,
    "steps": _STEPS,
    "seed": _SEED,
    "min_quality": _MIN_QUALITY,
}

#: Points corpus queries at a persisted weight snapshot: when set,
#: ``docs_quality_classifier`` (and everything composing it —
#: corpus_curriculum_mix, corpus_clf_agreement, the screens) scores
#: through the frozen weights instead of re-training inline
#: (r11 verdict #5). Unset (the default, and the driver's gate
#: condition) the inline training path runs unchanged.
CLF_ROOT_CONF = "spark.graft.clf.indexRoot"


def _clf_table(root: str) -> AtomicParquetTable:
    return AtomicParquetTable(os.path.join(root, "clf_weights.parquet"))


def _refuse_on_meta_mismatch(meta: dict) -> None:
    """Weights trained under different hashing/feature constants
    would silently score against the wrong feature space — refuse."""
    mismatched = {
        key: (meta.get(key), want)
        for key, want in _META.items()
        if meta.get(key) != want
    }
    if mismatched:
        raise ValueError(
            f"persisted classifier meta {mismatched} is incompatible "
            "with the current constants; rebuild with build_clf_index"
        )


def frozen_weights(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """The persisted (j, w) weight table for ``sf_dir``, or None when
    the inline-training path should run.

    Resolution: ``spark.graft.clf.indexRoot`` unset → None (default);
    set but no snapshot committed yet → None (inline-train fallback —
    a missing artifact must not break the query); snapshot trained
    under DIFFERENT constants → ValueError (scoring through the wrong
    feature space must never be silent); snapshot trained on a
    DIFFERENT corpus → warn + None (its weights are valid, just not
    byte-comparable to this corpus's oracle).
    """
    import warnings

    root = str(spark.conf.get(CLF_ROOT_CONF, "") or "")
    if not root:
        return None
    table = _clf_table(root)
    w = table.read(spark)
    if w is None:
        return None
    meta = table.meta()
    _refuse_on_meta_mismatch(meta)
    if meta.get("sf_dir") != sf_dir:
        warnings.warn(
            f"classifier snapshot at {root!r} was trained on "
            f"{meta.get('sf_dir')!r}, not {sf_dir!r}; falling back to "
            "inline training for oracle-comparable scores",
            stacklevel=2,
        )
        return None
    return w


def build_clf_index(spark: SparkSession, sf_dir: str, root: str) -> int:
    """Train the student on the corpus and persist its weight table;
    returns the model version."""
    feat = features_from_docs(load_table(spark, sf_dir, "documents"))
    w = spark.createDataFrame(
        train_weights(spark, feat), "j bigint, w decimal(18,9)"
    )
    return _clf_table(root).overwrite(w, meta={**_META, "sf_dir": sf_dir})


def score_batch(
    spark: SparkSession, root: str, docs: DataFrame
) -> DataFrame:
    """Score a (doc_id, text) batch against the persisted weights.

    Output matches docs_quality_classifier: (doc_id, label, score,
    pred) — label included because the teacher is a cheap text
    expression, which keeps batch scoring directly comparable to the
    inline operator and gives ingest monitoring a live
    student-vs-teacher agreement signal for free."""
    table = _clf_table(root)
    # missing snapshot first: meta() is {} at version 0, which would
    # otherwise read as "every constant mismatches" — a misleading
    # rebuild-your-constants error for a table that simply isn't there
    w = table.read(spark)
    if w is None:
        raise ValueError(f"no classifier snapshot at {root}")
    _refuse_on_meta_mismatch(table.meta())
    return present_scores(_score(features_from_docs(docs), w))
