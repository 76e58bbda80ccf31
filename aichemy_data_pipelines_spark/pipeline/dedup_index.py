"""Persisted LSH signature index: the dedup twin of
pipeline/ann_index.py — build the corpus band-key index once, screen
every ingest batch against it, and GROW it as batches are accepted.

``operators/dedup.dedup_incremental`` documents this exact shape
("at 100 TB the corpus band keys are a persisted table") but
recomputes both sides from the documents table so its oracle can
replay it.  This module is the operational artifact itself:

* ``build_dedup_index`` — shingle the corpus once, commit the
  (doc_id, band, key) table (one row per band per doc — kilobytes
  per million docs) as a versioned atomic snapshot, hive-partitioned
  by ``band`` so a screen's equi-join prunes to matching band
  directories.
* ``screen_batch`` — shingle ONLY the batch, broadcast its band
  keys against the persisted index, emit the per-doc verdict
  (doc_id, n_corpus_matches, is_new).  Corpus-side cost is one
  index scan regardless of batch count.
* ``accept_batch`` — append the screened batch's band keys to the
  index (the accepted docs become corpus for the NEXT batch), one
  atomic commit stamped with the caller's batch id for replay
  idempotence (the foreachBatch contract of
  streaming/corpus_ingest.py).

tests/test_dedup_index.py pins byte-equality of
build+screen against dedup_incremental, and the grow-then-rescreen
monotonicity (a doc screened after its own batch was accepted is no
longer "new").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.dedup import (
    _SHINGLE_N,
    _docs_with_shingles,
    _spark_band_keys,
)
from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable
from aichemy_data_pipelines_spark.pipeline.replay import is_replay, stamp


def _index_table(root: str) -> AtomicParquetTable:
    return AtomicParquetTable(os.path.join(root, "band_index.parquet"))


def band_keys_for(docs_with_tokens: DataFrame) -> DataFrame:
    """(doc_id, band, key) for any (doc_id, tokens)-shaped slice.

    Docs too short to shingle (< ``_SHINGLE_N`` tokens) are filtered
    HERE — the shingle index-explode crashes on them otherwise — so
    callers keep their full spine and short docs simply have no
    bands (trivially new at screen time)."""
    return _spark_band_keys(
        docs_with_tokens.where(F.size("tokens") >= _SHINGLE_N)
    )


def build_dedup_index(
    spark: SparkSession, sf_dir: str, root: str, corpus_filter=None
) -> int:
    """Shingle the corpus (optionally filtered) and persist its band
    keys; returns the index version."""
    docs = _docs_with_shingles(spark, sf_dir)
    if corpus_filter is not None:
        docs = docs.where(corpus_filter)
    bands = band_keys_for(docs)
    return _index_table(root).overwrite(
        bands.select("doc_id", "band", "key"),
        partition_by=["band"],
        meta={"sf_dir": sf_dir},
    )


def screen_batch(
    spark: SparkSession, root: str, batch_docs: DataFrame
) -> DataFrame:
    """Screen a (doc_id, tokens)-shaped batch against the persisted
    index.  Output: (doc_id, n_corpus_matches, is_new) — one row per
    batch doc; too-short docs (no shingles → no bands) are trivially
    new."""
    idx_df = _index_table(root).read(spark)
    spine = batch_docs.select("doc_id")
    if idx_df is None:
        # empty index (first batch ever, or band-less corpus):
        # everything is new
        return spine.select(
            "doc_id", F.lit(0).cast("long").alias("n_corpus_matches")
        ).withColumn("is_new", F.lit(True))
    idx = idx_df.select(
        F.col("doc_id").alias("corpus_doc"), "band", "key"
    )
    batch_bands = band_keys_for(batch_docs)
    # broadcast precondition: batch_docs is a streaming micro-batch,
    # bounded by the trigger (maxFilesPerTrigger / availableNow
    # chunking) — not a corpus fraction; the caller controls batch
    # sizing, so no runtime count is spent here (unlike the
    # self-contained dedup_incremental query, which guards it)
    matches = (
        F.broadcast(batch_bands.select("doc_id", "band", "key"))
        .join(idx, ["band", "key"])
        .select("doc_id", "corpus_doc")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_corpus_matches"))
    )
    return (
        spine.join(matches, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "n_corpus_matches", F.lit(0).cast("long")
            ).alias("n_corpus_matches"),
        )
        .withColumn("is_new", F.col("n_corpus_matches") == 0)
    )


def accept_batch(
    root: str,
    batch_docs: DataFrame,
    batch_id: int | None = None,
    run_id: str | None = None,
) -> int:
    """Append the batch's band keys to the index (replay-idempotent
    when ``batch_id`` is supplied).

    Replay guard is a HIGH-WATERMARK, not last-id equality: Structured
    Streaming's foreachBatch ids are monotonically increasing, so ANY
    ``batch_id <= last_batch_id`` is a replay of an already-applied
    batch — equality-only would re-append the keys of any batch older
    than the most recent one (duplicate index rows, meta stamp moving
    backwards) if the checkpoint ever re-delivered it.

    ``run_id`` scopes the watermark to one checkpoint lifetime (pass
    :func:`pipeline.replay.checkpoint_identity`): a deleted/recreated
    checkpoint restarts ids at 0, and without the identity the stale
    watermark would silently drop every new batch (r06 ADVICE)."""
    table = _index_table(root)
    if is_replay(table.meta(), batch_id, run_id):
        return table.version()
    return table.append(
        band_keys_for(batch_docs).select("doc_id", "band", "key"),
        partition_by=["band"],
        meta=stamp(table.meta(), batch_id, run_id),
    )
