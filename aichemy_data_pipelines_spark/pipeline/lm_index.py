"""Persisted bigram-LM quality filter: train once, score every
ingest batch — the third persisted artifact alongside the IVF index
(pipeline/ann_index.py) and the LSH band index
(pipeline/dedup_index.py).

``operators/lm_ops.corpus_bigram_perplexity`` trains its hashed
count tables inside the query; at 100 TB the CCNet recipe trains the
LM on the target slice ONCE and then scores every arriving shard
against the frozen model.  This module persists the trained state —
the (b1, b2) pair-count table, at most B1×B2 rows and in practice
the observed-pair subset — as one atomic versioned snapshot, and
scores arbitrary document batches against it through the SAME
smoothing/logprob chain (lm_ops.score_bigrams), so persisted scoring
is byte-identical to the inline operator by construction
(pinned in tests/test_lm_index.py).

Scale: training is one corpus pass reduced to a bounded table
(megabytes); scoring a batch is two broadcast joins + one doc agg —
no corpus access at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.operators.lm_ops import (
    _B1,
    _B2,
    _doc_bigrams,
    _TGT_LANG,
    score_bigrams,
)
from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable


def _lm_table(root: str) -> AtomicParquetTable:
    return AtomicParquetTable(os.path.join(root, "lm_counts.parquet"))


def build_lm_index(spark: SparkSession, sf_dir: str, root: str) -> int:
    """Train the hashed bigram LM on the target-language slice and
    persist its pair-count table; returns the model version."""
    bi = _doc_bigrams(load_table(spark, sf_dir, "documents"))
    pairs = (
        bi.where(F.col("lang") == _TGT_LANG)
        .groupBy("b1", "b2")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return _lm_table(root).overwrite(
        pairs,
        meta={"b1": _B1, "b2": _B2, "tgt_lang": _TGT_LANG, "sf_dir": sf_dir},
    )


def score_batch(
    spark: SparkSession, root: str, docs: DataFrame
) -> DataFrame:
    """Perplexity-score a (doc_id, lang, text) batch against the
    persisted LM.  Output matches corpus_bigram_perplexity:
    (doc_id, n_bigrams, avg_logprob, ppl); docs with < 2 tokens have
    no bigrams and emit no row (nothing to score)."""
    table = _lm_table(root)
    meta = table.meta()
    # a model trained under different bucketing/seed constants would
    # silently land every lookup in the wrong bucket — refuse instead
    if meta.get("b1") != _B1 or meta.get("b2") != _B2 or (
        meta.get("tgt_lang") != _TGT_LANG
    ):
        raise ValueError(
            f"persisted LM (b1={meta.get('b1')}, b2={meta.get('b2')}, "
            f"tgt_lang={meta.get('tgt_lang')}) is incompatible with the "
            f"current constants (b1={_B1}, b2={_B2}, "
            f"tgt_lang={_TGT_LANG}); rebuild with build_lm_index"
        )
    pairs = table.read(spark)
    if pairs is None:
        # trained on a corpus with zero target-language bigrams: the
        # inline operator scores everything with empty counts (pure
        # add-one smoothing) — mirror that instead of crashing
        pairs = spark.createDataFrame([], "b1 bigint, b2 bigint, c bigint")
    uni = pairs.groupBy("b1").agg(F.sum("c").cast("bigint").alias("c_uni"))
    bigr = pairs.groupBy("b2").agg(F.sum("c").cast("bigint").alias("c_bi"))
    bi = _doc_bigrams(docs)
    return score_bigrams(bi, uni, bigr)
