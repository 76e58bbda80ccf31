"""Banded-LSH recall evidence (r12 verdict #2/#3 leftovers): measure
dedup_embedding_cosine pair recall/precision against the EXACT
same-label cosine>=0.25 truth, and ann_knn_graph edge recall against
the EXACT top-3 graph, at the given SF (default sf0.1 — the scale
where round 12 measured the single-band 46%->23% collapse and round
13's B=4 banding restored it). Run uncontended, single session;
results are recorded in BASELINE.md's banded-LSH stress table.

Truth is computed with the SAME exact-decimal dot products and 8dp
rounding as the operators, so a boundary pair can never disagree on
the threshold; tie-breaks in the exact graph mirror the operators'
(cosine DESC, nbr_id ASC).

Usage: python scripts/recall_stress.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from aichemy_data_pipelines_spark.functions.vectors import (
        spark_dot_exact,
    )
    from aichemy_data_pipelines_spark.operators.similarity import (
        corpus_plane_count,
    )
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="recall_stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_vec = e.count()
    planes = corpus_plane_count(spark, sf)
    print(f"{sf}: {n_vec} vectors, planes={planes}")

    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    base = e.select(
        "vec_id", "label", "embedding", F.expr(norm).alias("nn")
    ).repartition(64)
    a = base.select(
        F.col("vec_id").alias("id_a"),
        "label",
        F.col("embedding").alias("va"),
        F.col("nn").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        "label",
        F.col("embedding").alias("vb"),
        F.col("nn").alias("nb"),
    )
    dot = spark_dot_exact("va", "vb")
    cos = F.round(F.expr(f"{dot} / (na * nb)"), 8)

    # --- dedup_embedding_cosine vs exact same-label truth ---
    t0 = time.time()
    truth_pairs = {
        (r.id_a, r.id_b)
        for r in (
            a.join(b, "label")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .where(F.col("cosine") >= 0.25)
            .select("id_a", "id_b")
            .collect()
        )
    }
    t_truth = time.time() - t0
    t0 = time.time()
    got_pairs = {
        (r.id_a, r.id_b)
        for r in qs["dedup_embedding_cosine"](spark, sf)
        .select("id_a", "id_b")
        .collect()
    }
    t_got = time.time() - t0
    hit = len(truth_pairs & got_pairs)
    print(
        f"dedup_embedding_cosine: {len(got_pairs)} pairs emitted, "
        f"{len(truth_pairs)} true, recall={hit}/{len(truth_pairs)}"
        f"={hit / max(1, len(truth_pairs)):.3f}, "
        f"precision={hit}/{len(got_pairs)}"
        f"={hit / max(1, len(got_pairs)):.3f} "
        f"(truth {t_truth:.1f}s, query {t_got:.1f}s)"
    )

    # --- ann_knn_graph vs the exact top-3 graph ---
    t0 = time.time()
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), "id_b")
    exact_edges = {
        (r.id_a, r.id_b)
        for r in (
            a.drop("label")
            .crossJoin(b.drop("label"))
            .where(F.col("id_a") != F.col("id_b"))
            .withColumn("cosine", cos)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("id_a", "id_b")
            .collect()
        )
    }
    t_truth = time.time() - t0
    t0 = time.time()
    got_edges = {
        (r.vec_id, r.nbr_id)
        for r in qs["ann_knn_graph"](spark, sf)
        .select("vec_id", "nbr_id")
        .collect()
    }
    t_got = time.time() - t0
    hit = len(exact_edges & got_edges)
    print(
        f"ann_knn_graph: {len(got_edges)} edges emitted, "
        f"{len(exact_edges)} exact, edge recall="
        f"{hit}/{len(exact_edges)}={hit / max(1, len(exact_edges)):.3f} "
        f"(truth {t_truth:.1f}s, query {t_got:.1f}s)"
    )


if __name__ == "__main__":
    main()
