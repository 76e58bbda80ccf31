"""Persisted IVF index: build-once / query-many for the ANN tier.

``operators/ivf.py`` trains its k-means quantizer inside the query —
right for an oracle-checked operator, wrong operationally: a 100 TB
corpus trains its index ONCE (hours of k-means on a sample), then
serves millions of queries against the persisted artifact.  This
module splits the phases across two atomic tables:

* ``build_ivf_index`` — train the coarse quantizer (the exact
  deterministic k-means of operators/ivf.py, so the persisted index
  is byte-identical to the oracle-checked one) and commit two
  versioned snapshots: ``centroids`` (K rows) and ``postings``
  (vec_id → list_id inverted lists, hive-partitioned by list_id so
  a probe reads only its lists' directories).  Atomic manifests make
  index rebuilds safe under concurrent readers (a query sees the old
  index until the new one's manifest lands) and keep the previous
  index time-travelable until vacuum.
* ``query_ivf_index`` — nprobe search against the PERSISTED
  artifact: score K broadcast centroids, probe the chosen lists'
  partitions, exact cosine re-rank.  No training in the query path.

tests/test_ann_index.py pins byte-equality between the persisted
path and operators/ivf.ann_ivf_topk — index staleness or trainer
drift fails the suite.

Scale: the build is the k-means sample pass + one corpus-wide
assignment write; queries touch ~nprobe/K of the postings via
partition pruning (hive dirs on list_id), broadcast only the K-row
centroid table, and never recompute training.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.functions.vectors import spark_dot_exact
from aichemy_data_pipelines_spark.operators.ivf import (
    _kmeans,
    _N_LISTS,
    _NPROBE,
    _TOP_K,
)
from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable

_NORM = f"sqrt({spark_dot_exact('embedding', 'embedding')})"


def _centroids_table(root: str) -> AtomicParquetTable:
    return AtomicParquetTable(os.path.join(root, "centroids.parquet"))


def _postings_table(root: str) -> AtomicParquetTable:
    return AtomicParquetTable(os.path.join(root, "postings.parquet"))


def build_ivf_index(spark: SparkSession, sf_dir: str, root: str) -> int:
    """Train and persist the IVF index; returns the index version."""
    cents, lists = _kmeans(spark, sf_dir)
    v = _centroids_table(root).overwrite(
        cents, meta={"n_lists": _N_LISTS, "sf_dir": sf_dir}
    )
    _postings_table(root).overwrite(
        lists.select("list_id", "vec_id", "embedding"),
        partition_by=["list_id"],
        meta={"centroids_version": v},
    )
    return v


def query_ivf_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    nprobe: int = _NPROBE,
    top_k: int = _TOP_K,
) -> DataFrame:
    """nprobe search against the persisted index.

    *queries*: (query_id, embedding).  Output matches
    operators/ivf.ann_ivf_topk: (query_id, rk, cand_id, cosine).
    """
    cents = _centroids_table(root).read(spark)
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
            "c_cos", F.round(F.expr(f"{cdot} / (qn * ({cnorm}))"), 8)
        )
        .withColumn("prk", F.row_number().over(wq))
        .where(F.col("prk") <= nprobe)
        .select("query_id", "qv", "qn", "list_id")
    )
    c = (
        _postings_table(root)
        .read(spark)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("cv"),
            "list_id",
        )
        .withColumn("cn", F.expr(f"sqrt({spark_dot_exact('cv', 'cv')})"))
    )
    dot = spark_dot_exact("qv", "cv")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), "cand_id"
    )
    return (
        F.broadcast(probes)
        .join(c, "list_id")
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(F.expr(f"{dot} / (qn * cn)"), 8))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select("query_id", "rk", "cand_id", "cosine")
    )
