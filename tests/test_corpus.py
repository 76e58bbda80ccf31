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


def test_token_report_spans_verified_in_python(spark):
    """decontam_token_report's island arithmetic re-derived in pure
    Python: per training doc, mark every token position covered by an
    eval-shared 8-gram, merge into runs, and compare total coverage,
    longest run, and island count exactly. The flagged doc set must
    equal decontam_ngram_overlap's (same N, same split, same min
    length), and fractions must be consistent with their integers."""
    from aichemy_data_pipelines_spark.operators.corpus_ops import (
        decontam_token_report,
    )

    rows = decontam_token_report(spark, SF_SMOKE).collect()
    assert rows, "synthetic corpus plants near-dups across the eval split"
    flagged = {r.doc_id for r in rows}
    overlap = {
        r.doc_id for r in decontam_ngram_overlap(spark, SF_SMOKE).collect()
    }
    assert flagged == overlap

    docs = {
        d.doc_id: d.text.strip().lower().split()
        for d in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    ev_sh = set()
    for i, toks in docs.items():
        if i % _EVAL_MOD == 0:
            for s in range(len(toks) - _DECON_N + 1):
                ev_sh.add(" ".join(toks[s : s + _DECON_N]))
    for r in rows:
        toks = docs[r.doc_id]
        assert r.n_tokens == len(toks)
        covered = [False] * len(toks)
        for s in range(len(toks) - _DECON_N + 1):
            if " ".join(toks[s : s + _DECON_N]) in ev_sh:
                for p in range(s, s + _DECON_N):
                    covered[p] = True
        runs, cur = [], 0
        for c in covered + [False]:
            if c:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        assert runs, f"doc {r.doc_id} flagged but no covered tokens"
        assert r.contaminated_tokens == sum(runs)
        assert r.longest_run == max(runs)
        assert r.n_islands == len(runs)
        assert r.contaminated_frac == round(sum(runs) / len(toks), 6)
        assert r.longest_frac == round(max(runs) / len(toks), 6)
        assert 0 < r.longest_frac <= r.contaminated_frac <= 1.0


def test_source_rollup_consistent_with_token_report(spark):
    """decontam_source_rollup re-derived from the per-doc report plus
    the raw documents table: counts, rates, token shares and
    mean/max fractions must agree exactly (decimal-sum mean), and
    clean sources must report NULL extents, not zeros."""
    from decimal import ROUND_HALF_UP, Decimal

    from aichemy_data_pipelines_spark.operators.corpus_ops import (
        decontam_source_rollup,
        decontam_token_report,
    )

    rep = {
        r.doc_id: r
        for r in decontam_token_report(spark, SF_SMOKE).collect()
    }
    docs = [
        (d.doc_id, d.source, len(d.text.strip().lower().split()))
        for d in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
        if d.doc_id % _EVAL_MOD != 0
    ]
    rows = decontam_source_rollup(spark, SF_SMOKE).collect()
    assert {r.source for r in rows} == {s for _, s, _ in docs}
    for r in rows:
        mine = [(i, n) for i, s, n in docs if s == r.source]
        hits = [rep[i] for i, _ in mine if i in rep]
        assert r.n_docs == len(mine)
        assert r.n_contaminated == len(hits)
        assert r.contamination_rate == round(len(hits) / len(mine), 6)
        assert r.contaminated_token_share == round(
            sum(h.contaminated_tokens for h in hits)
            / sum(n for _, n in mine),
            6,
        )
        if not hits:
            assert r.mean_longest_frac is None
            assert r.max_longest_frac is None
            continue
        assert r.max_longest_frac == max(h.longest_frac for h in hits)
        mean = sum(
            Decimal(repr(h.longest_frac)).quantize(Decimal("0.000001"))
            for h in hits
        ) / len(hits)
        assert Decimal(repr(r.mean_longest_frac)) == Decimal(
            repr(float(mean))
        ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
