"""operators/crossmodal_ops.py: verdict semantics on crafted pair
sets (the synthetic corpus's image leg produces zero phash pairs
below sf0.1, so the 'both' / 'image_only' branches never fire at the
oracle gate SF) plus a live-leg check at sf0.1. Oracle value-parity
at sf0.01 runs via tests/test_oracle_parity.py."""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.crossmodal_ops import (
    compose_pair_verdicts,
    dedup_cross_modal,
)
from tests.conftest import SF_BENCH


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_compose_covers_all_three_verdicts(spark):
    text = _pairs(spark, [(1, 2), (3, 4)])
    image = _pairs(spark, [(1, 2), (5, 6)])
    got = {
        (r.doc_a, r.doc_b): (r.text_dup, r.image_dup, r.verdict)
        for r in compose_pair_verdicts(text, image).collect()
    }
    assert got == {
        (1, 2): (1, 1, "both"),
        (3, 4): (1, 0, "text_only"),
        (5, 6): (0, 1, "image_only"),
    }


def test_compose_empty_legs(spark):
    empty = _pairs(spark, [])
    text = _pairs(spark, [(1, 2)])
    only_text = compose_pair_verdicts(text, empty).collect()
    assert [(r.verdict) for r in only_text] == ["text_only"]
    assert compose_pair_verdicts(empty, empty).count() == 0


def test_both_legs_live_at_sf01(spark):
    """At sf0.1 BOTH members contribute pairs (4 image near-dups
    exist there), so the composition is exercised with a non-vacuous
    image leg at least once per suite run — guarding against the
    image member silently degenerating to empty everywhere."""
    rows = dedup_cross_modal(spark, SF_BENCH).collect()
    verdicts = {r.verdict for r in rows}
    assert "text_only" in verdicts
    assert {"image_only", "both"} & verdicts, (
        "image leg contributed no pairs at sf0.1"
    )
    # pair-key invariant holds through the full outer join
    assert all(r.doc_a < r.doc_b for r in rows)
