"""Banded-LSH recall/cost frontier sweep (r14 verdict task #1).

For each (B bands, Hamming probe radius) config, re-run the
Spark-side banded candidate generation of ``dedup_embedding_cosine``
and ``ann_knn_graph`` at a given SF and report pair/edge recall
against the EXACT truth, precision, candidate volume (the post-join
pre-dedup candidate rows — the number that prices the config at
scale), and wall time. The frontier table this prints is recorded in
BASELINE.md; the shipped config is the best point with candidate
cost <= ~2x the r14 baseline (B=4, radius 1).

Sweep mechanics: ``similarity._BANDS_BY_PLANES`` / ``_PLANES`` /
``probe_xors`` are module globals read at CALL time by the
signature/probe builders, so patching them re-parameterizes the
operators without touching committed code (r16: the OR-width is
corpus-size-adaptive via bands_for_planes — a sweep point pins the
whole table to its B). Truth is computed once per SF with the
operators' own exact-decimal dots and 8dp rounding.

Usage: python scripts/recall_frontier.py [sf_dir] [--configs B:R,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _patched(mod, bands: int, radius: int):
    """Set the module globals for one sweep point; returns the
    originals for restore."""
    orig = (dict(mod._BANDS_BY_PLANES), mod._PLANES, mod.probe_xors)
    # pin the adaptive table to this sweep point's B at EVERY plane
    # count, so the operators run exactly (B, radius)
    for p in list(mod._BANDS_BY_PLANES):
        mod._BANDS_BY_PLANES[p] = bands
    # regenerate the plane table for the widened band count: the
    # generator appends families, so bands [0, 4) stay byte-identical
    # to the shipped configuration at any B >= 4
    planes = []
    import hashlib

    for p in range(max(bands, mod._MAX_BANDS) * mod._MAX_PLANES):
        row = []
        for d in range(mod._DIM):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h, 16) % 2 == 0 else -1)
        planes.append(row)
    mod._PLANES = planes

    def xors(planes_n: int, _r=radius):
        out = [0] + [1 << p for p in range(planes_n)]
        if _r >= 2:
            out += [
                (1 << p) | (1 << q)
                for p in range(planes_n)
                for q in range(p + 1, planes_n)
            ]
        return out

    mod.probe_xors = xors
    return orig


def _restore(mod, orig):
    table, mod._PLANES, mod.probe_xors = orig
    mod._BANDS_BY_PLANES.clear()
    mod._BANDS_BY_PLANES.update(table)


def main() -> None:
    sf = "/root/testdata/sf0.1"
    configs = [(4, 1), (6, 1), (8, 1), (4, 2), (6, 2)]
    for arg in sys.argv[1:]:
        if arg.startswith("--configs"):
            configs = [
                tuple(int(x) for x in c.split(":"))
                for c in arg.split("=", 1)[1].split(",")
            ]
        elif not arg.startswith("--"):
            sf = arg

    double_truth = "--double-truth" in sys.argv

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aichemy_data_pipelines_spark.functions.vectors import (
        spark_dot,
        spark_dot_exact,
    )
    from aichemy_data_pipelines_spark.operators import dedup, similarity
    from aichemy_data_pipelines_spark.operators.similarity import (
        corpus_plane_count,
    )
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="recall_frontier")
    spark.sparkContext.setLogLevel("ERROR")

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
    # --double-truth: plain double cosines for the truth sets (the
    # 10x corpus makes exact-decimal all-pairs prohibitive; |double -
    # exact| <= ~3e-12 is immaterial against a 0.25 threshold or a
    # top-3 rank for a RECALL measurement)
    dot = (
        spark_dot("va", "vb") if double_truth else spark_dot_exact("va", "vb")
    )
    cos = F.round(F.expr(f"{dot} / (na * nb)"), 8)

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
    print(
        f"truth: {len(truth_pairs)} same-label pairs >= 0.25, "
        f"{len(exact_edges)} exact top-3 edges"
    )
    print(
        f"{'B':>2} {'r':>2} | {'cand_pairs':>10} {'cost_x':>6} | "
        f"{'pair_recall':>11} {'precision':>9} {'dedup_s':>7} | "
        f"{'edge_recall':>11} {'knn_s':>6}"
    )

    base_cost = None
    for bands, radius in configs:
        orig = _patched(similarity, bands, radius)
        try:
            # candidate volume: RAW join rows (a pair meeting in m
            # buckets counts m times) — dedup_embedding_cosine pays
            # its exact-decimal cosine per raw row, so this is the
            # number that prices the config
            ec = e.withColumn(
                "sigs",
                F.expr(
                    similarity._spark_sig_keys("embedding", planes, bands)
                ),
            )
            aa = ec.select(
                F.col("vec_id").alias("id_a"),
                "label",
                F.explode(
                    F.expr(
                        f"array({similarity._spark_probe_keys(planes, bands)})"
                    )
                ).alias("sig"),
            )
            bb = ec.select(
                F.col("vec_id").alias("id_b"),
                "label",
                F.explode(
                    F.expr(
                        f"array({similarity._spark_member_keys(bands)})"
                    )
                ).alias("sig"),
            )
            n_cand = (
                aa.join(bb, ["label", "sig"])
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .count()
            )
            if base_cost is None:
                base_cost = max(1, n_cand)

            t0 = time.time()
            got_pairs = {
                (r.id_a, r.id_b)
                for r in dedup.dedup_embedding_cosine(spark, sf)
                .select("id_a", "id_b")
                .collect()
            }
            t_dedup = time.time() - t0
            hit = len(truth_pairs & got_pairs)
            rec = hit / max(1, len(truth_pairs))
            prec = hit / max(1, len(got_pairs))

            t0 = time.time()
            got_edges = {
                (r.vec_id, r.nbr_id)
                for r in similarity.ann_knn_graph(spark, sf)
                .select("vec_id", "nbr_id")
                .collect()
            }
            t_knn = time.time() - t0
            ehit = len(exact_edges & got_edges)
            erec = ehit / max(1, len(exact_edges))

            print(
                f"{bands:>2} {radius:>2} | {n_cand:>10} "
                f"{n_cand / base_cost:>6.2f} | {rec:>11.3f} "
                f"{prec:>9.3f} {t_dedup:>7.1f} | {erec:>11.3f} "
                f"{t_knn:>6.1f}"
            )
        finally:
            _restore(similarity, orig)


if __name__ == "__main__":
    main()
