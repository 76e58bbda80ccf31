"""Near-duplicate clustering: connected components over the LSH
candidate graph — the step that turns pairwise near-dup hits into
keep-one-per-group decisions for a training corpus.

Algorithm (Spark-first iterative min-label propagation, the core of
GraphX/GraphFrames connected components):

1. nodes = all documents, label = own doc_id;
2. edges = LSH candidate pairs with exact Jaccard ≥ threshold
   (operators/dedup.py), symmetrized;
3. repeat: every node takes min(own label, neighbors' labels) until a
   fixpoint — the loop is a DRIVER loop over a handful of iterations
   (graph diameter), not over data; each iteration is one shuffle on
   doc_id.

The DuckDB oracle computes the same components with a recursive CTE
(transitive closure + min reachable), so even this iterative
operator is value-checked, not just rows-counted.

Scale: per iteration one equi-join + one agg on doc_id; iterations =
near-dup cluster diameter, which for dedup graphs is tiny (chains of
near-identical docs). For web-scale graphs swap in the
large-star/small-star variant — same join shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.operators.dedup import (
    _SQL_LSH_PAIRS,
    dedup_ngram_jaccard,
)

_JACCARD_MIN = 0.5
_MAX_ITERS = 20


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over jaccard≥0.5 LSH pairs; every doc
    gets a cluster id (= min doc_id in its component; singletons are
    their own cluster) and the cluster size."""
    # the label-propagation loop runs many small shuffles; a caller
    # session's default 200 partitions would mean 200 tiny tasks per
    # iteration — pin to the session's core count for this job, and
    # restore the caller's setting afterwards (the loop materializes
    # every intermediate via persist/count, so the conf has done its
    # job by the time we return the final lazy plan)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        return _dedup_clusters_inner(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _dedup_clusters_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .where(F.col("jaccard") >= _JACCARD_MIN)
        .select("doc_a", "doc_b")
    )
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()

    labels = docs.select("doc_id", F.col("doc_id").alias("label")).persist()
    for _ in range(_MAX_ITERS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_a, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()

    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
        )
    )


QUERIES = {"dedup_clusters": dedup_clusters}

ORACLE = {
    "dedup_clusters": f"""
        WITH pairs_base AS ({_SQL_LSH_PAIRS}),
        jacc AS (
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(lower(text)), '\\s+') AS tokens
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_transform(range(0, len(tokens) - 2),
                           i -> array_to_string(tokens[i + 1:i + 3], ' '))
                         AS shingles
                FROM toks WHERE len(tokens) >= 3
            ), ds AS (
                SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh
            ), counts AS (
                SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id
            ), inter AS (
                SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
                FROM pairs_base p
                JOIN ds sa ON p.doc_a = sa.doc_id
                JOIN ds sb ON p.doc_b = sb.doc_id AND sa.s = sb.s
                GROUP BY p.doc_a, p.doc_b
            )
            SELECT p.doc_a, p.doc_b
            FROM pairs_base p
            JOIN inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
            JOIN counts ca ON p.doc_a = ca.doc_id
            JOIN counts cb ON p.doc_b = cb.doc_id
            WHERE round(CAST(i.n_inter AS DOUBLE)
                        / (ca.n_sh + cb.n_sh - i.n_inter), 6) >= {_JACCARD_MIN}
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM jacc
            UNION
            SELECT doc_b, doc_a FROM jacc
        ),
        reach AS (
            WITH RECURSIVE r(a, b) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
            )
            SELECT * FROM r
        ),
        comp AS (
            SELECT d.doc_id,
                   least(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
            GROUP BY d.doc_id
        )
        SELECT c.doc_id, c.cluster_id, s.cluster_size
        FROM comp c
        JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM comp GROUP BY cluster_id) s
          ON c.cluster_id = s.cluster_id
    """,
}
