"""Adversarial pins for the r14 double-cosine margin prefilters.

The equality tests in tests/test_similarity.py / test_ann_index.py
run on the synthetic corpus, whose cosines sit far from decision
boundaries. These tests ENGINEER vectors whose cosines straddle the
exact 8dp boundaries — the 0.25 screen bar's round-half-up point
(0.249999995) and round8-equal argmax ties — and assert the
prefiltered paths equal their exact-only references bit-for-bit.
If a margin were too tight (dropping a boundary survivor) or a
tie-break leaked through the double ordering, it fails here first.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

#: the 0.25 bar's 8dp round-half-up decision point
_BOUNDARY = 0.249999995
#: cosines straddling the bar at every interesting distance
_EDGE_COSINES = [
    _BOUNDARY - 1e-7,
    _BOUNDARY - 1e-9,
    _BOUNDARY - 1e-12,
    _BOUNDARY,
    _BOUNDARY + 1e-12,
    _BOUNDARY + 1e-9,
    _BOUNDARY + 1e-7,
    0.25,
    0.2501,
    0.9,
    0.0,
    -0.3,
]


def _unit_at_cosine(c: float, dim: int = 8) -> list[float]:
    """A unit vector whose cosine to e1 is (up to double rounding) c."""
    v = [0.0] * dim
    v[0] = c
    v[1] = math.sqrt(max(0.0, 1.0 - c * c))
    return v


def test_screen_prefilter_exact_at_the_bar(spark, tmp_path):
    """screen_batch (prefilter ON) must equal the exact-only scoring
    path (min_cosine=None, threshold applied after the exact 8dp
    round) on a batch engineered to sit ON the 0.25 boundary."""
    from aichemy_data_pipelines_spark.operators.ivf import (
        _SCREEN_COS,
        screen_verdicts,
    )
    from aichemy_data_pipelines_spark.pipeline.ann_index import (
        _scored_candidates,
        build_ivf_index,
        screen_batch,
    )

    # corpus: e1 plus deterministic fillers confined to dims 4..7 —
    # orthogonal to the e1/e2 plane the edge vectors live in, so a
    # batch vector's ONLY possible near-dup is e1 itself and the
    # boundary cosines decide is_new (enough rows for the K=8-floor
    # quantizer to train)
    dim = 8
    corpus = [(0, _unit_at_cosine(1.0, dim))]
    for i in range(1, 64):
        v = [0.0] * 4 + [math.sin(0.7 * i + j * j) for j in range(4)]
        n = math.sqrt(sum(x * x for x in v))
        corpus.append((i, [x / n for x in v]))
    corpus_dir = tmp_path / "corpus_sf"
    corpus_dir.mkdir()
    spark.createDataFrame(
        corpus, "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(str(corpus_dir / "embeddings.parquet"))
    root = str(tmp_path / "ivf")
    build_ivf_index(spark, str(corpus_dir), root)

    batch = spark.createDataFrame(
        [
            (1000 + i, _unit_at_cosine(c))
            for i, c in enumerate(_EDGE_COSINES)
        ],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r.vec_id, r.n_corpus_matches, r.best_cand, r.best_cosine, r.is_new)
        for r in screen_batch(spark, root, batch).collect()
    )
    # reference: SAME probes/candidates, exact cosine on every one,
    # no double prefilter anywhere
    scored = _scored_candidates(
        spark,
        root,
        batch.select(F.col("vec_id").alias("query_id"), "embedding"),
        min_cosine=None,
    )
    ref = sorted(
        (r.vec_id, r.n_corpus_matches, r.best_cand, r.best_cosine, r.is_new)
        for r in screen_verdicts(
            scored, batch.select("vec_id"), _SCREEN_COS
        ).collect()
    )
    assert got == ref
    # the construction is meaningful: both sides of the bar occur
    news = {v: is_new for v, _, _, _, is_new in got}
    assert any(news.values()) and not all(news.values())


def test_assign_prefilter_exact_on_round8_ties(spark):
    """ivf._assign's max-margin prefilter must keep BOTH centroids of
    a round8-equal tie so the lower-list-id tie-break decides —
    engineered vectors sit between two centroids 1e-9..1e-7 apart in
    cosine (all round8-equal or 1-ulp apart)."""
    from pyspark.sql import Window

    from aichemy_data_pipelines_spark.functions.vectors import (
        spark_dot_exact,
    )
    from aichemy_data_pipelines_spark.operators.ivf import _NORM, _assign

    dim = 4
    theta = 0.3
    c1 = [1.0, 0.0, 0.0, 0.0]
    c2 = [math.cos(theta), math.sin(theta), 0.0, 0.0]
    # list ids deliberately NOT in centroid order to catch an
    # ordering bug in the tie-break
    cents = spark.createDataFrame(
        [(2, c1), (1, c2)], "list_id int, centroid array<double>"
    )
    vecs = []
    mid = theta / 2.0
    for i, delta in enumerate(
        [0.0, 1e-12, -1e-12, 1e-9, -1e-9, 5e-8, -5e-8, 1e-7, -1e-7]
    ):
        a = mid + delta
        vecs.append((i, [math.cos(a), math.sin(a), 0.0, 0.0]))
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    got = sorted(
        (r.vec_id, r.list_id) for r in _assign(e, cents).collect()
    )
    # all-exact reference argmax (the pre-r14 shape)
    cdot = spark_dot_exact("embedding", "centroid")
    cnorm = f"sqrt({spark_dot_exact('centroid', 'centroid')})"
    w = Window.partitionBy("vec_id").orderBy(F.desc("a_cos"), "list_id")
    ref = sorted(
        (r.vec_id, r.list_id)
        for r in (
            e.withColumn("en", F.expr(_NORM))
            .crossJoin(F.broadcast(cents.withColumn("cn", F.expr(cnorm))))
            .withColumn(
                "a_cos", F.round(F.expr(f"{cdot} / ((en) * (cn))"), 8)
            )
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .collect()
        )
    )
    assert got == ref
    # ties resolved to the LOWER list id: the exactly-mid vector's
    # cosines round8-equal, so list 1 (c2!) must win
    assert dict(got)[0] == 1


def test_dedup_embedding_cosine_prefilter_exact_at_the_bar(spark, tmp_path):
    """dedup_embedding_cosine's r16 double-cosine threshold prefilter
    must emit EXACTLY the pairs the exact-only plan emits on a corpus
    engineered to straddle the 0.25 bar at every interesting distance
    (same candidate generation, exact fold on every candidate, no
    prefilter) — row-for-row, cosines included."""
    from aichemy_data_pipelines_spark.functions.vectors import (
        spark_dot_exact,
    )
    from aichemy_data_pipelines_spark.operators.dedup import (
        dedup_embedding_cosine,
    )
    from aichemy_data_pipelines_spark.operators.similarity import (
        _spark_member_keys,
        _spark_probe_keys,
        _spark_sig_keys,
        corpus_lsh_params,
        release_sig_frames,
    )

    dim = 64
    rows = [(0, 0, _unit_at_cosine(1.0, dim))]
    for i, c in enumerate(_EDGE_COSINES):
        rows.append((1 + i, 0, _unit_at_cosine(c, dim)))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    got = sorted(
        (r.label, r.id_a, r.id_b, r.cosine)
        for r in dedup_embedding_cosine(spark, sf).collect()
    )

    # reference: the SAME banded candidate join, exact-decimal cosine
    # on EVERY candidate, no double prefilter
    planes, bands = corpus_lsh_params(spark, sf)
    e = spark.read.parquet(f"{sf}/embeddings.parquet").withColumn(
        "sigs", F.expr(_spark_sig_keys("embedding", planes, bands))
    )
    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    a = e.select(
        F.col("vec_id").alias("id_a"), "label",
        F.col("embedding").alias("va"), F.expr(norm).alias("na"),
        F.explode(
            F.expr(f"array({_spark_probe_keys(planes, bands)})")
        ).alias("sig"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label"),
        F.col("embedding").alias("vb"), F.expr(norm).alias("nb"),
        F.explode(F.expr(f"array({_spark_member_keys(bands)})")).alias("sig"),
    )
    dot = spark_dot_exact("va", "vb")
    ref = sorted(
        (r.label, r.id_a, r.id_b, r.cosine)
        for r in (
            a.join(b, ["label", "sig"])
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn(
                "cosine", F.round(F.expr(f"{dot} / (na * nb)"), 8)
            )
            .where(F.col("cosine") >= 0.25)
            .groupBy("label", "id_a", "id_b")
            .agg(F.max("cosine").alias("cosine"))
            .collect()
        )
    )
    assert got == ref
    # the construction is meaningful: among the (e1, edge_i) pairs —
    # whose cosines ARE the boundary ladder — some crossed the bar
    # and some did not (the edge vectors are mutually near-parallel,
    # so edge-edge pairs all pass; the e1 leg is the discriminating
    # one)
    e1_pairs = {p[2] for p in ref if p[1] == 0}
    assert 0 < len(e1_pairs) < len(_EDGE_COSINES)
    release_sig_frames()  # tmp-dir frame must not outlive the test
