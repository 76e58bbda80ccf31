"""Banded-LSH vs IVF-routed near-dup A/B (r15 verdict #2): run BOTH
committed candidate generators — dedup_embedding_cosine (banded
hyperplane LSH, B now scale-adaptive via similarity.bands_for_planes)
and dedup_embedding_ivf (pairs within trained-IVF probe lists) — at a
given SF against the same exact truth (same-label cosine >= 0.25),
and report recall, precision, RAW candidate rows (the number that
prices each config: every raw row pays a cosine) and wall time.

The table this prints is recorded in BASELINE.md (r16); the decision
rule it feeds: banded stays the default while its adaptive-B
candidate budget is competitive, IVF routing is the documented path
past the B clamp (planes >= 11, i.e. ~64k+ vectors per block target).

Usage: python scripts/ivf_route_ab.py [sf_dir] [--double-truth]
                                      [--skip-banded] [--skip-ivf]
                                      [--nprobe=N1,N2,...] [--graph]

--nprobe sweeps the IVF row over explicit probe counts (patching
ivf.n_probe for the run, the recall_frontier patching idiom) — the
committed query's own point is n_probe(K); extra points price the
recall/candidate frontier the routing knob buys.

--graph (r17) switches the A/B to the k-NN GRAPH generators:
similarity.ann_knn_graph (banded) vs ivf.ann_knn_graph_ivf (routed),
measured as EDGE recall against the exact top-3 graph (numpy double
cosines — blockwise, the r15 double-truth convention). This is the
measurement behind the r17 decision of which generator the 100 TB
graph consumer (clustering/pagerank) defaults to.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def graph_mode(sf: str) -> None:
    """Banded vs IVF-routed k-NN graph: edge recall vs the exact
    top-3 graph + wall, one row per generator (and per --nprobe
    point for the routed side)."""
    import numpy as np

    from aichemy_data_pipelines_spark.operators import ivf, similarity
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="ivf_route_ab_graph")
    spark.sparkContext.setLogLevel("ERROR")
    rows = sorted(
        spark.read.parquet(f"{sf}/embeddings.parquet").collect(),
        key=lambda r: r.vec_id,
    )
    ids = np.array([r.vec_id for r in rows])
    v = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    n = len(ids)
    planes, bands = similarity.corpus_lsh_params(spark, sf)
    k = ivf.corpus_list_count(spark, sf)
    print(
        f"{sf}: {n} vectors | banded planes={planes} B={bands} "
        f"| ivf K={k} nprobe_graph={ivf.n_probe_graph(k)}"
    )
    # exact top-3 truth, blockwise (n^2 doubles never materialize)
    truth = set()
    t0 = time.time()
    for lo in range(0, n, 2048):
        hi = min(n, lo + 2048)
        block = vn[lo:hi] @ vn.T
        for i in range(hi - lo):
            block[i, lo + i] = -2.0
        for i in range(hi - lo):
            # deterministic top-3 (r17 ADVICE #3): argpartition alone
            # breaks cosine ties arbitrarily, wobbling recall numbers
            # run-to-run on corpora with tied cosines — gather ALL
            # indices tied with the 3rd-largest cosine, then order by
            # (-cos, id), matching the operators' nbr_id tie-break
            row = block[i]
            third = np.partition(row, -3)[-3]
            cand = np.flatnonzero(row >= third)
            top = cand[np.lexsort((ids[cand], -row[cand]))[:3]]
            src = int(ids[lo + i])
            for j in top:
                truth.add((src, int(ids[j])))
    print(f"truth: {len(truth)} exact top-3 edges ({time.time()-t0:.0f}s)")
    print(f"{'path':>8} | {'edge_recall':>11} | {'wall_s':>7}")

    def report(name, edges_fn):
        t0 = time.time()
        got = {(r.vec_id, r.nbr_id) for r in edges_fn().collect()}
        wall = time.time() - t0
        print(
            f"{name:>8} | {len(truth & got) / len(truth):>11.3f} "
            f"| {wall:>7.1f}"
        )

    if "--skip-banded" not in sys.argv:
        report("banded", lambda: similarity.ann_knn_graph(spark, sf))
    # the graph generator reads the GRAPH tier (r18,
    # ivf._NPROBE_GRAPH_BY_K) — sweep points patch that knob
    nprobes = [ivf.n_probe_graph(k)]
    for arg in sys.argv[1:]:
        if arg.startswith("--nprobe="):
            nprobes = [int(x) for x in arg.split("=", 1)[1].split(",")]
    if "--skip-ivf" not in sys.argv:
        orig = ivf.n_probe_graph
        try:
            for np_ in nprobes:
                ivf.n_probe_graph = lambda kk, _n=np_: _n
                report(
                    f"ivf@{np_}",
                    lambda: ivf.ann_knn_graph_ivf(spark, sf),
                )
        finally:
            ivf.n_probe_graph = orig


def main() -> None:
    sf = "/root/testdata/sf0.1"
    for arg in sys.argv[1:]:
        if not arg.startswith("--"):
            sf = arg
    if "--graph" in sys.argv:
        graph_mode(sf)
        return
    double_truth = "--double-truth" in sys.argv

    from pyspark.sql import functions as F

    from aichemy_data_pipelines_spark.functions.vectors import (
        spark_dot,
        spark_dot_exact,
    )
    from aichemy_data_pipelines_spark.operators import dedup, ivf, similarity
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="ivf_route_ab")
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_vec = e.count()
    planes, bands = similarity.corpus_lsh_params(spark, sf)
    k = ivf.corpus_list_count(spark, sf)
    nprobe = ivf.n_probe(k)
    print(
        f"{sf}: {n_vec} vectors | banded planes={planes} B={bands} "
        f"| ivf K={k} nprobe={nprobe}"
    )

    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    base = e.select(
        "vec_id", "label", "embedding", F.expr(norm).alias("nn")
    ).repartition(64)
    a = base.select(
        F.col("vec_id").alias("id_a"), "label",
        F.col("embedding").alias("va"), F.col("nn").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), "label",
        F.col("embedding").alias("vb"), F.col("nn").alias("nb"),
    )
    dot = (
        spark_dot("va", "vb") if double_truth else spark_dot_exact("va", "vb")
    )
    cos = F.round(F.expr(f"{dot} / (na * nb)"), 8)
    truth = {
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
    print(f"truth: {len(truth)} same-label pairs >= 0.25")
    print(
        f"{'path':>8} | {'cand_rows':>10} | {'recall':>7} "
        f"{'precision':>9} | {'wall_s':>7}"
    )

    def report(name, cand_rows, pairs_fn):
        t0 = time.time()
        got = {(r.id_a, r.id_b) for r in pairs_fn().collect()}
        wall = time.time() - t0
        hit = len(truth & got)
        print(
            f"{name:>8} | {cand_rows:>10} | "
            f"{hit / max(1, len(truth)):>7.3f} "
            f"{hit / max(1, len(got)):>9.3f} | {wall:>7.1f}"
        )

    if "--skip-banded" not in sys.argv:
        ec = e.withColumn(
            "sigs",
            F.expr(similarity._spark_sig_keys("embedding", planes, bands)),
        )
        aa = ec.select(
            F.col("vec_id").alias("id_a"), "label",
            F.explode(
                F.expr(
                    f"array({similarity._spark_probe_keys(planes, bands)})"
                )
            ).alias("sig"),
        )
        bb = ec.select(
            F.col("vec_id").alias("id_b"), "label",
            F.explode(
                F.expr(f"array({similarity._spark_member_keys(bands)})")
            ).alias("sig"),
        )
        n_cand = (
            aa.join(bb, ["label", "sig"])
            .where(F.col("id_a") < F.col("id_b"))
            .count()
        )
        report(
            "banded", n_cand,
            lambda: dedup.dedup_embedding_cosine(spark, sf).select(
                "id_a", "id_b"
            ),
        )

    nprobes = [nprobe]
    for arg in sys.argv[1:]:
        if arg.startswith("--nprobe="):
            nprobes = [int(x) for x in arg.split("=", 1)[1].split(",")]

    if "--skip-ivf" not in sys.argv:
        # raw candidate rows: probes x probed-list members, same-label,
        # self-pairs out, both orientations counted once (id_a < id_b
        # after least/greatest) — the rows that pay the double cosine
        cents, lists = ivf._kmeans(spark, sf, k=k)
        lab = e.select("vec_id", "label")
        cnorm = f"sqrt({spark_dot_exact('centroid', 'centroid')})"
        from pyspark.sql import Window

        en = e.select("vec_id", "embedding").withColumn(
            "en", F.expr(ivf._NORM)
        )
        cn = cents.withColumn("cn", F.expr(cnorm))
        wd = Window.partitionBy("vec_id").orderBy(
            F.desc("dcos"), "list_id"
        )
        m = lists.select(
            F.col("vec_id").alias("nbr_id"), "list_id"
        ).join(
            lab.select(
                F.col("vec_id").alias("nbr_id"),
                F.col("label").alias("nbr_label"),
            ),
            "nbr_id",
        )
        orig_n_probe = ivf.n_probe
        try:
            for np_ in nprobes:
                kth = F.max(
                    F.when(F.col("drk") == np_, F.col("dcos"))
                ).over(Window.partitionBy("vec_id"))
                probes = (
                    en.crossJoin(F.broadcast(cn))
                    .select(
                        "vec_id", "list_id",
                        F.expr(
                            f"try_divide({spark_dot('embedding', 'centroid')}, "
                            "en * cn)"
                        ).alias("dcos"),
                    )
                    .withColumn("drk", F.row_number().over(wd))
                    .withColumn("kth", kth)
                    .where(
                        F.col("kth").isNull()
                        | (F.col("dcos") >= F.col("kth") - 1e-6)
                    )
                    .where(F.col("drk") <= np_)
                    .select("vec_id", "list_id")
                    .join(lab, "vec_id")
                )
                n_cand = (
                    probes.join(m, "list_id")
                    .where(
                        (F.col("vec_id") != F.col("nbr_id"))
                        & (F.col("label") == F.col("nbr_label"))
                    )
                    .count()
                )
                ivf.n_probe = lambda kk, _n=np_: _n
                report(
                    f"ivf@{np_}", n_cand,
                    lambda: ivf.dedup_embedding_ivf(spark, sf).select(
                        "id_a", "id_b"
                    ),
                )
        finally:
            ivf.n_probe = orig_n_probe


if __name__ == "__main__":
    main()
