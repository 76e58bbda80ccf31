"""Semantic tests for the corpus-curation decision layer
(operators/corpus_ops.py). Oracle parity is covered by
tests/test_oracle_parity.py; these pin the *semantics*:
keep-one-per-cluster invariants, decontam evidence soundness, and the
integer-only term ranking.
"""

from __future__ import annotations

from collections import Counter

from aichemy_data_pipelines_spark.operators.corpus_ops import (
    _DECON_N,
    _EVAL_MOD,
    _TOP_TERMS,
    decontam_ngram_overlap,
    dedup_keep_one,
    docs_distinct_terms,
)
from tests.conftest import SF_SMOKE


def test_keep_one_exactly_one_keeper_per_cluster(spark):
    rows = dedup_keep_one(spark, SF_SMOKE).collect()
    by_cluster = Counter()
    for r in rows:
        assert r.keep in (0, 1)
        # the keeper is the cluster representative itself
        assert (r.doc_id == r.cluster_id) == bool(r.keep)
        by_cluster[r.cluster_id] += r.keep
    assert all(v == 1 for v in by_cluster.values())
    # every document got a verdict
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs


def test_decontam_hits_are_real_overlaps(spark):
    """Every flagged doc must be a training doc with plausible
    evidence counts; the planted near-dups guarantee hits exist."""
    rows = decontam_ngram_overlap(spark, SF_SMOKE).collect()
    assert rows, "synthetic corpus plants near-dups across the eval split"
    for r in rows:
        assert r.doc_id % _EVAL_MOD != 0  # training docs only
        assert r.n_shared_shingles >= 1
        assert 1 <= r.n_eval_docs
    # evidence spot-check: re-derive one doc's overlap in pure Python
    docs = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }

    def shingles(text):
        toks = text.strip().lower().split()
        return {
            " ".join(toks[i : i + _DECON_N])
            for i in range(len(toks) - _DECON_N + 1)
        }

    ev_sh = {
        i: shingles(t) for i, t in docs.items() if i % _EVAL_MOD == 0
    }
    worst = max(rows, key=lambda r: r.n_shared_shingles)
    mine = shingles(docs[worst.doc_id])
    shared = set().union(
        *(mine & s for s in ev_sh.values())
    )
    hit_evals = sum(1 for s in ev_sh.values() if mine & s)
    assert len(shared) == worst.n_shared_shingles
    assert hit_evals == worst.n_eval_docs


def test_distinct_terms_ranking_is_deterministic(spark):
    rows = docs_distinct_terms(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in doc_rows] == list(
            range(1, len(doc_rows) + 1)
        )
        assert len(doc_rows) <= _TOP_TERMS
        # the (tf DESC, df ASC, token ASC) key must be non-increasing
        keys = [(-r.tf, r.df, r.token) for r in doc_rows]
        assert keys == sorted(keys)
