"""Persisted language-ID artifact: train once, score every ingest
batch — the fifth persisted artifact alongside the IVF index
(pipeline/ann_index.py), the LSH band index (pipeline/dedup_index.py),
the bigram LM (pipeline/lm_index.py) and the quality classifier
(pipeline/clf_index.py).

``operators/langid_ops.text_langid_classifier`` trains its softmax
weights inside the query; at 100 TB the fastText recipe trains the
student ONCE on a labeled slice and then scores every arriving shard
against the frozen weights. This module persists the trained state —
the ``_N_CLASSES``·(``_K``+2)-row (c, j, w) weight table, a few KB —
as one atomic versioned snapshot, and scores arbitrary document
batches against it through the SAME featurization + softmax +
argmax chain (langid_ops.features_from_docs / _class_probs /
present_predictions), so persisted scoring is byte-identical to the
inline operator by construction (pinned in
tests/test_langid_index.py).

Scale: training is the documented bounded-gradient loop; scoring a
batch is one map-side featurization + one broadcast join against a
tiny literal — no corpus access at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.operators.langid_ops import (
    _K,
    _LR,
    _SEED,
    _STEPS,
    _UND_WT,
    _class_probs,
    _train,
    features_from_docs,
    present_predictions,
)
from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable

_META = {
    "k": _K,
    "lr": _LR,
    "steps": _STEPS,
    "seed": _SEED,
    "und_wt": _UND_WT,
}


def _langid_table(root: str) -> AtomicParquetTable:
    return AtomicParquetTable(os.path.join(root, "langid_weights.parquet"))


def build_langid_index(spark: SparkSession, sf_dir: str, root: str) -> int:
    """Train the softmax student on the corpus and persist its
    (c, j, w) weight table; returns the model version."""
    feat = features_from_docs(load_table(spark, sf_dir, "documents"))
    weights = _train(spark, feat)
    w = spark.createDataFrame(
        sorted((c, j, v) for (c, j), v in weights.items()),
        "c int, j bigint, w decimal(18,9)",
    )
    return _langid_table(root).overwrite(w, meta={**_META, "sf_dir": sf_dir})


def score_batch(
    spark: SparkSession, root: str, docs: DataFrame
) -> DataFrame:
    """Score a (doc_id, text) batch against the persisted weights.

    Output matches text_langid_classifier: (doc_id, teacher_lang,
    pred_lang, score, agree) — the teacher label is a cheap text
    expression, which keeps batch scoring directly comparable to the
    inline operator and gives ingest monitoring a live
    student-vs-teacher agreement signal for free."""
    table = _langid_table(root)
    # missing snapshot first: meta() is {} at version 0, which would
    # otherwise read as "every constant mismatches" — a misleading
    # rebuild-your-constants error for a table that simply isn't there
    w = table.read(spark)
    if w is None:
        raise ValueError(f"no langid snapshot at {root}")
    meta = table.meta()
    # weights trained under different hashing/feature constants would
    # silently score against the wrong feature space — refuse instead
    mismatched = {
        key: (meta.get(key), want)
        for key, want in _META.items()
        if meta.get(key) != want
    }
    if mismatched:
        raise ValueError(
            f"persisted langid meta {mismatched} is incompatible "
            "with the current constants; rebuild with build_langid_index"
        )
    return present_predictions(_class_probs(features_from_docs(docs), w))
