"""Semantic tests for corpus overlap analytics
(operators/overlap_ops.py). Oracle parity is covered by
tests/test_oracle_parity.py + tests/test_driver_canon.py; these pin
the invariants: matrix symmetry-by-construction, coefficient bounds,
and consistency between the contamination matrix and the
boilerplate flags (a shared shingle implies boilerplate shingles on
both sides).
"""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.overlap_ops import (
    corpus_cross_contamination,
    docs_boilerplate_fraction,
)
from tests.conftest import SF_SMOKE


def test_contamination_matrix_bounds(spark):
    rows = corpus_cross_contamination(spark, SF_SMOKE).collect()
    assert rows, "planted near-dups span sources in the synthetic corpus"
    seen = set()
    for r in rows:
        # unordered pairs appear exactly once, in sorted order
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 1 <= r.n_shared <= min(r.n_a, r.n_b)
        assert 0.0 < r.overlap_coeff <= 1.0


def test_boilerplate_fraction_bounds_and_coverage(spark):
    rows = docs_boilerplate_fraction(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    # every doc with >= 5 tokens gets a row (the synthetic docs all do)
    assert len(rows) == n_docs
    assert any(r.n_boilerplate > 0 for r in rows), "planted dups share 5-grams"
    for r in rows:
        assert 0 <= r.n_boilerplate <= r.n_shingles
        assert 0.0 <= r.boilerplate_frac <= 1.0
        assert r.flagged == (r.n_boilerplate * 2 > r.n_shingles)


def test_shared_shingles_imply_boilerplate_on_both_sides(spark):
    """If two sources share a shingle, at least two docs contain it,
    so the per-doc boilerplate counter must be nonzero somewhere in
    both sources."""
    pairs = corpus_cross_contamination(spark, SF_SMOKE).collect()
    contaminated_sources = {s for r in pairs for s in (r.source_a, r.source_b)}
    if not contaminated_sources:
        return
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    src_of = {r.doc_id: r.source for r in docs}
    bp_sources = {
        src_of[r.doc_id]
        for r in docs_boilerplate_fraction(spark, SF_SMOKE).collect()
        if r.n_boilerplate > 0
    }
    assert contaminated_sources <= bp_sources


def test_novelty_ground_truth_and_ordering(spark):
    """Pure-Python recomputation of per-doc novelty + the ordering
    invariant: the first doc (min doc_id) is 100% novel."""
    import hashlib

    from aichemy_data_pipelines_spark.operators.overlap_ops import (
        _N,
        docs_novelty,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    sh_by_doc = {}
    for r in docs:
        toks = r.text.strip().lower().split()
        if len(toks) < _N:
            continue
        sh_by_doc[r.doc_id] = {
            int(
                hashlib.md5(
                    " ".join(toks[i : i + _N]).encode()
                ).hexdigest()[:15],
                16,
            )
            for i in range(len(toks) - _N + 1)
        }
    firsts = {}
    for doc_id in sorted(sh_by_doc):
        for h in sh_by_doc[doc_id]:
            firsts.setdefault(h, doc_id)
    expected = {
        doc_id: (
            len(hs),
            sum(1 for h in hs if firsts[h] == doc_id),
        )
        for doc_id, hs in sh_by_doc.items()
    }
    got = {
        r.doc_id: (r.n_shingles, r.n_novel)
        for r in docs_novelty(spark, SF_SMOKE).collect()
    }
    assert got == expected
    first_doc = min(sh_by_doc)
    assert expected[first_doc][0] == expected[first_doc][1]
