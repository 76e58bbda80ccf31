"""Semantic deduplication over embeddings — the SemDeDup recipe
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540), DataFrame-first:

1. cluster the embedding space with the SAME deterministic k-means
   the IVF index trains (operators/ivf._kmeans — seeds by md5 order,
   2 Lloyd iterations, exact-decimal 6dp centroids, so even the
   clustering is oracle-replayable);
2. compute cosine similarity ONLY within each cluster — the paper's
   core trick: semantic duplicates land in the same cluster, so the
   candidate space is sum(cluster_size^2), never corpus^2;
3. greedy keep-one verdict: a vector is DROPPED iff some
   lower-vec_id vector in its cluster sits at cosine >= tau.
   (The paper keeps a random member per duplicate group; keeping the
   lowest id is the same policy made deterministic, matching
   dedup_keep_one's min-doc_id convention.)

Output: one verdict row per vector — (vec_id, list_id, keep,
n_sem_dups) where n_sem_dups counts the lower-id near-dups that
doomed it (0 for keepers).

Scale: the k-means trains on a sample (see ivf.py's scale notes);
assignment is a broadcast cross-score; the pair stage is an equi-join
on list_id whose fanout is bounded by cluster sizes — K is
SCALE-ADAPTIVE (ivf.n_lists: clamp(ceil(N/64), 8, 1024), oracle
in-plan from COUNT(*)), so clusters hold ~64 vectors at any corpus
size and the within-cluster pair work stays ~linear in N (the paper
raises K the same way — 50,000 lists for LAION), while the join stays
a single shuffle on list_id. Exact-decimal dot products keep the
verdict bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.functions.vectors import spark_dot_exact
from aichemy_data_pipelines_spark.operators.ivf import (
    _KMEANS_CTES,
    _kmeans,
    _sql_pair_cos,
)

#: cosine threshold for "semantically duplicate" — tuned on the
#: synthetic corpus's cosine spread: 0.25 (dedup_embedding_cosine's
#: near-dup floor) drops 69% of vectors (transitive greedy collapse),
#: 0.5 drops none; 0.35 yields a ~16% dedup rate, the regime the
#: SemDeDup paper reports for web corpora. Production would sweep
#: this against downstream loss, exactly as the paper does.
_TAU = 0.35


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, lists = _kmeans(spark, sf_dir)
    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    scored = lists.withColumn("n", F.expr(norm))
    a = scored.select(
        "list_id",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("n").alias("na"),
    )
    b = scored.select(
        "list_id",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("n").alias("nb"),
    )
    dot = spark_dot_exact("va", "vb")
    dups = (
        a.join(b, "list_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(F.expr(f"try_divide({dot}, na * nb)"), 8)
        )
        .where(F.col("cosine") >= _TAU)
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.count("*").cast("long").alias("n_sem_dups"))
    )
    return (
        scored.select("vec_id", "list_id")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "list_id",
            F.coalesce("n_sem_dups", F.lit(0).cast("long")).alias(
                "n_sem_dups"
            ),
        )
        .withColumn("keep", F.col("n_sem_dups") == 0)
    )


QUERIES = {"dedup_semantic": dedup_semantic}

ORACLE = {
    "dedup_semantic": f"""
        WITH {_KMEANS_CTES}, pr AS (
            SELECT la.list_id, la.vec_id AS id_a, lb.vec_id AS id_b,
                   ea.embedding AS va, eb.embedding AS vb
            FROM lists la
            JOIN lists lb ON la.list_id = lb.list_id
                         AND la.vec_id < lb.vec_id
            JOIN embeddings ea ON ea.vec_id = la.vec_id
            JOIN embeddings eb ON eb.vec_id = lb.vec_id
        ), expl AS (
            SELECT id_a, id_b, unnest(va) AS xa, unnest(vb) AS xb
            FROM pr
        ), cos AS (
            SELECT id_a, id_b, {_sql_pair_cos('xa', 'xb')} AS cosine
            FROM expl GROUP BY id_a, id_b
        ), dups AS (
            SELECT id_b AS vec_id, COUNT(*) AS n_sem_dups
            FROM cos WHERE cosine >= {_TAU} GROUP BY id_b
        )
        SELECT l.vec_id, l.list_id,
               CAST(COALESCE(d.n_sem_dups, 0) AS BIGINT) AS n_sem_dups,
               COALESCE(d.n_sem_dups, 0) = 0 AS keep
        FROM lists l LEFT JOIN dups d ON l.vec_id = d.vec_id
    """,
}
