"""Persisted IVF index: build-once / query-many for the ANN tier.

``operators/ivf.py`` trains its k-means quantizer inside the query —
right for an oracle-checked operator, wrong operationally: a 100 TB
corpus trains its index ONCE (hours of k-means on a sample), then
serves millions of queries against the persisted artifact.

The whole index is ONE atomic commit: the postings table (vec_id →
list_id inverted lists, hive-partitioned by ``list_id`` so a probe
reads only its lists' directories) carries the K trained centroids
in its manifest ``meta`` (K×dim 6dp doubles — bytes, not data
files).  A rebuild therefore flips centroids and postings together:
a concurrent query sees either the old index or the new one, never
new centroids over old lists, and a crash mid-build leaves an
orphan data dir for ``vacuum`` — no torn index state is
representable.  The previous index stays time-travelable until
vacuumed.

tests/test_ann_index.py pins byte-equality between the persisted
path and operators/ivf.ann_ivf_topk — index staleness or trainer
drift fails the suite.

Scale: the build is the k-means sample pass + one corpus-wide
assignment write; queries touch ~nprobe/K of the postings via
partition pruning, broadcast only the K-row centroid table, and
never recompute training.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.functions.vectors import spark_dot_exact
from aichemy_data_pipelines_spark.operators.ivf import (
    _kmeans,
    _TOP_K,
    n_probe,
)
from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable


def _postings_table(root: str) -> AtomicParquetTable:
    return AtomicParquetTable(os.path.join(root, "postings.parquet"))


def build_ivf_index(spark: SparkSession, sf_dir: str, root: str) -> int:
    """Train and persist the IVF index in one atomic commit; returns
    the index version."""
    cents, lists = _kmeans(spark, sf_dir)
    cent_rows = [
        [int(r.list_id), [float(x) for x in r.centroid]]
        for r in cents.collect()  # K rows — bounded by construction
    ]
    return _postings_table(root).overwrite(
        lists.select("list_id", "vec_id", "embedding"),
        partition_by=["list_id"],
        meta={
            "n_lists": len(cent_rows),
            "sf_dir": sf_dir,
            "centroids": cent_rows,
        },
    )


def _load_centroids(
    spark: SparkSession, root: str, version: int
) -> DataFrame:
    meta = _postings_table(root).meta(version)
    if "centroids" not in meta:
        raise ValueError(
            f"IVF index at {root!r} (version {version}) has no "
            "'centroids' manifest meta — built by an incompatible "
            "layout; rebuild with build_ivf_index"
        )
    return spark.createDataFrame(
        [
            (int(lid), [float(x) for x in vec])
            for lid, vec in meta["centroids"]
        ],
        "list_id int, centroid array<double>",
    )


def query_ivf_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    nprobe: int | None = None,
    top_k: int = _TOP_K,
    exclude_query_ids: bool = True,
) -> DataFrame:
    """nprobe search against the persisted index.

    *queries*: (query_id, embedding).  Output matches
    operators/ivf.ann_ivf_topk: (query_id, rk, cand_id, cosine).
    ``nprobe`` defaults to ``ivf.n_probe(K)`` for the index's own K
    (read from the manifest), matching the inline operator.

    ``exclude_query_ids``: drop candidates whose ``vec_id`` equals
    the query's ``query_id`` — correct when query ids ARE corpus
    vector ids (self-search, the inline operator's contract).  Pass
    False for external queries whose id space is unrelated to the
    corpus, or a legitimate candidate sharing the number would be
    silently lost.
    """
    joined = _scored_candidates(spark, root, queries, nprobe)
    if exclude_query_ids:
        joined = joined.where(F.col("query_id") != F.col("cand_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), "cand_id"
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select("query_id", "rk", "cand_id", "cosine")
    )


def _scored_candidates(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    nprobe: int | None = None,
    min_cosine: float | None = None,
) -> DataFrame:
    """(query_id, cand_id, cosine) over the probed inverted lists —
    the shared probe+re-rank core of query_ivf_index (top-k search)
    and screen_batch (threshold screening).

    ``min_cosine``: threshold paths pass their bar so candidates are
    prefiltered with a plain DOUBLE cosine at bar − 1e-6 before the
    exact-decimal fold (lossless — |double − exact| ≲ 3e-12 vs the
    exact test's 5e-9 rounding granularity; the ivf._assign margin
    analysis). Rank-based paths pass None: a top-k cutoff has no
    fixed bar to prefilter against."""
    # resolve the index version ONCE: centroids and postings must
    # come from the SAME manifest, or a concurrent rebuild between
    # the two reads serves new centroids over old lists — the torn
    # state the single-commit layout exists to prevent
    table = _postings_table(root)
    version = table.version()
    cents = _load_centroids(spark, root, version)
    if nprobe is None:
        nprobe = n_probe(len(table.meta(version)["centroids"]))
    postings = table.read(spark, version=version)
    if postings is None:
        raise ValueError(
            f"IVF index at {root!r} has no postings data "
            "(empty or never-built index); run build_ivf_index"
        )
    q = queries.select(
        F.col("query_id"),
        F.col("embedding").alias("qv"),
        F.expr(
            f"sqrt({spark_dot_exact('embedding', 'embedding')})"
        ).alias("qn"),
    )
    cdot = spark_dot_exact("qv", "centroid")
    cnorm = f"sqrt({spark_dot_exact('centroid', 'centroid')})"
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_cos"), "list_id"
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "c_cos",
            F.round(F.expr(f"try_divide({cdot}, qn * ({cnorm}))"), 8),
        )
        .withColumn("prk", F.row_number().over(wq))
        .where(F.col("prk") <= nprobe)
        .select("query_id", "qv", "qn", "list_id")
    )
    c = postings.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        "list_id",
    ).withColumn("cn", F.expr(f"sqrt({spark_dot_exact('cv', 'cv')})"))
    dot = spark_dot_exact("qv", "cv")
    joined = F.broadcast(probes).join(c, "list_id")
    if min_cosine is not None:
        from aichemy_data_pipelines_spark.functions.vectors import (
            spark_dot,
        )

        joined = joined.where(
            F.expr(f"try_divide({spark_dot('qv', 'cv')}, qn * cn)")
            >= min_cosine - 1e-6
        )
    return (
        joined.withColumn(
            "cosine", F.round(F.expr(f"try_divide({dot}, qn * cn)"), 8)
        )
        .select("query_id", "cand_id", "cosine")
    )


def screen_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    bar: float | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """Incremental ANN screening of a NEW (vec_id, embedding) batch
    against the persisted index — the operational twin of
    operators/ivf.ann_incremental_screen (byte-equality pinned in
    tests/test_ann_index.py): on ingest, probe each new vector's
    n_probe(K) lists and report every indexed vector at cosine ≥
    ``bar`` (default ivf._SCREEN_COS).

    Output: (vec_id, n_corpus_matches, best_cand, best_cosine,
    is_new) — one verdict row per batch vector; the ``is_new`` rows
    are safe to append to the index (the dedup_incremental accept
    path, vector edition).

    Scale: batch-proportional — K-row centroid broadcast, nprobe
    list-partition reads via partition pruning, no training, no
    corpus rescan."""
    from aichemy_data_pipelines_spark.operators.ivf import (
        _SCREEN_COS,
        screen_verdicts,
    )

    resolved = _SCREEN_COS if bar is None else bar
    scored = _scored_candidates(
        spark,
        root,
        batch.select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        nprobe,
        min_cosine=resolved,
    )
    return screen_verdicts(scored, batch.select("vec_id"), resolved)


def accept_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    batch_id: int | None = None,
    run_id: str | None = None,
) -> int:
    """Grow the index with a screened (vec_id, embedding) batch
    WITHOUT retraining: vectors assign to the FROZEN manifest
    centroids (the same deterministic max-cosine argmax the builder
    used) and their postings append under the existing list_id
    partitioning — the ANN twin of dedup_index.accept_batch, and the
    accept half of the screen-then-grow ingest loop
    (streaming/corpus_ingest.stream_embedding_ingest).

    Replay-idempotent via the shared high-watermark guard
    (pipeline/replay.py): any ``batch_id <= last_batch_id`` under the
    same checkpoint identity no-ops. The centroid manifest meta
    carries over through ``stamp`` so queries against the grown index
    keep resolving centroids+postings from one manifest.

    K stays frozen — appends grow the lists, not the quantizer; once
    the corpus outgrows K·targetList by a margin, rebuild with
    build_ivf_index (the IVF operational contract; FAISS's add-vs-
    train split works the same way)."""
    from aichemy_data_pipelines_spark.operators.ivf import _assign
    from aichemy_data_pipelines_spark.pipeline.replay import (
        is_replay,
        stamp,
    )

    table = _postings_table(root)
    meta = table.meta()
    if is_replay(meta, batch_id, run_id):
        return table.version()
    cents = _load_centroids(spark, root, table.version())
    lists = _assign(batch.select("vec_id", "embedding"), cents)
    return table.append(
        lists.select("list_id", "vec_id", "embedding"),
        partition_by=["list_id"],
        meta=stamp(meta, batch_id, run_id),
    )
