"""ANN semantics: exact baseline sanity + LSH recall floor."""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.similarity import (
    ann_cosine_topk,
    ann_lsh_topk,
)
from tests.conftest import SF_SMOKE


def test_bruteforce_topk_shape(spark):
    rows = ann_cosine_topk(spark, SF_SMOKE).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == set(range(10))
    for q, rs in by_query.items():
        ranks = sorted(r.rk for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rk)]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.cand_id != q for r in rs)


def test_lsh_recall_floor(spark):
    """On this corpus (neighbors at cos≈0.4) the 4-bit multiprobe
    design should recover a solid fraction of exact top-3; guard a
    floor so parameter regressions (like the original 8-bit/0%-recall
    config) fail loudly."""
    exact = {
        (r.query_id, r.cand_id)
        for r in ann_cosine_topk(spark, SF_SMOKE).collect()
        if r.rk <= 3
    }
    approx = {
        (r.query_id, r.cand_id)
        for r in ann_lsh_topk(spark, SF_SMOKE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall collapsed: {recall:.2f}"


def test_ivf_recall_floor(spark):
    """IVF with nprobe=2 over 10 lists: this corpus' labels are not
    cosine-cohesive, so the information-theoretic expectation is
    ~nprobe/n_lists = 20%; measured ~30%. Floor guards the mechanism
    (probing + in-list search), not the quantizer quality."""
    from aichemy_data_pipelines_spark.operators.ivf import ann_ivf_topk

    exact = {
        (r.query_id, r.cand_id)
        for r in ann_cosine_topk(spark, SF_SMOKE).collect()
        if r.rk <= 3
    }
    ivf = {
        (r.query_id, r.cand_id)
        for r in ann_ivf_topk(spark, SF_SMOKE).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.2, f"IVF recall collapsed: {recall:.2f}"
