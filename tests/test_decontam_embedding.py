"""corpus_ops.decontam_embedding: leak semantics on crafted vectors
(the sf corpus can't pin exact-copy leaks) and the broadcast-guard
fallback. Oracle parity at sf0.01 runs via tests/test_oracle_parity.py."""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.corpus_ops import (
    decontam_embedding,
)

_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


_ROWS = [
    # eval split = vec_id % 10 == 0
    (10, [1.0, 0.0, 0.0], 0),
    (20, [0.0, 1.0, 0.0], 0),
    # train: exact copy of eval 10 -> cosine 1.0 to it, 0.0 to 20
    (1, [1.0, 0.0, 0.0], 0),
    # train: 45 degrees off BOTH eval vectors -> cosine ~0.707 to each
    (2, [1.0, 1.0, 0.0], 0),
    # train: orthogonal to both -> clean
    (3, [0.0, 0.0, 1.0], 0),
]


def test_flags_exact_and_near_leaks_not_orthogonal(spark, tmp_path):
    sf = _write(spark, tmp_path, _ROWS)
    got = {
        r.vec_id: (r.n_eval_hits, r.max_cosine)
        for r in decontam_embedding(spark, sf).collect()
    }
    assert set(got) == {1, 2}  # vec 3 is clean
    assert got[1] == (1, 1.0)
    assert got[2][0] == 2
    assert abs(got[2][1] - 0.70710678) < 1e-8


def test_boundary_pairs_respect_the_exact_threshold(spark, tmp_path):
    """The double-cosine prefilter must not change the verdict at the
    bar: a pair just ABOVE 0.35 (inside the 1e-6 prefilter gate) is
    kept by the exact re-score, just BELOW is dropped."""
    import math

    def unit(c):
        return [c, math.sqrt(1.0 - c * c), 0.0]

    rows = [
        (10, [1.0, 0.0, 0.0], 0),  # eval
        (1, unit(0.3500005), 0),  # train, exact cosine > bar
        (2, unit(0.3499995), 0),  # train, in-gate but < bar
    ]
    sf = _write(spark, tmp_path, rows)
    got = {r.vec_id for r in decontam_embedding(spark, sf).collect()}
    assert got == {1}


def test_guard_fallback_gives_identical_rows(spark, tmp_path):
    sf = _write(spark, tmp_path, _ROWS)
    hinted = sorted(map(tuple, decontam_embedding(spark, sf).collect()))
    spark.conf.set("spark.graft.decontam.maxBroadcastEvalRows", "1")
    try:
        unhinted = sorted(
            map(tuple, decontam_embedding(spark, sf).collect())
        )
    finally:
        spark.conf.unset("spark.graft.decontam.maxBroadcastEvalRows")
    assert hinted == unhinted
