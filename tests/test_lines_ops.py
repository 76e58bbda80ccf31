"""operators/lines_ops.py: repeated-line removal semantics — corpus
frequency, order-aware keep-first, cleaned-content fingerprint."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.lines_ops import (
    _LINE_TOKENS,
    _MIN_DF,
    dedup_repeated_lines,
)
from tests.conftest import SF_SMOKE


def _seg_texts(text: str) -> list[str]:
    toks = text.split()
    if not toks:
        return [""]
    return [
        " ".join(toks[i : i + _LINE_TOKENS])
        for i in range(0, len(toks), _LINE_TOKENS)
    ]


def test_repeated_lines_keep_first_and_fingerprint(spark):
    """Python re-derivation over the whole smoke corpus: corpus
    segment frequency (distinct docs), keep-first verdict per
    occurrence, per-doc counts and cleaned md5 — row-for-row."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    segs = {d: _seg_texts(t) for d, t in docs.items()}
    df_count: dict[str, set] = {}
    for d, ss in segs.items():
        for s in ss:
            df_count.setdefault(s, set()).add(d)
    firsts = {}
    for d in sorted(segs):
        for i, s in enumerate(segs[d]):
            if s not in firsts:
                firsts[s] = (d, i)
            else:
                firsts[s] = min(firsts[s], (d, i))
    want = {}
    for d, ss in segs.items():
        removed = [
            len(df_count[s]) >= _MIN_DF and firsts[s] != (d, i)
            for i, s in enumerate(ss)
        ]
        kept = " ".join(s for s, r in zip(ss, removed) if not r)
        want[d] = (
            len(ss),
            sum(removed),
            round(sum(removed) / len(ss), 6),
            hashlib.md5(kept.encode()).hexdigest(),
        )

    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.removed_frac, r.cleaned_hash)
        for r in dedup_repeated_lines(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d], (d, got[d], want[d])
    # the corpus has real repeated segments — the operator must act
    assert sum(v[1] for v in want.values()) > 0


def test_repeated_lines_is_single_explode_plan(spark):
    """No python UDF, no cartesian: one tokenize+slice explode feeding
    hash joins (the Scale note's contract)."""
    df = dedup_repeated_lines(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_repeated_lines_keeps_exactly_one_copy_of_boilerplate(spark):
    """For every segment with df >= _MIN_DF, exactly ONE occurrence
    corpus-wide survives (the canonical first); for df < _MIN_DF all
    occurrences survive — checked via the removal accounting."""
    rows = dedup_repeated_lines(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    occ: dict[str, int] = {}
    for t in docs.values():
        for s in _seg_texts(t):
            occ[s] = occ.get(s, 0) + 1
    docs_per: dict[str, set] = {}
    for d, t in docs.items():
        for s in _seg_texts(t):
            docs_per.setdefault(s, set()).add(d)
    # expected total removals: every occurrence beyond the first of
    # each boilerplate segment
    want_removed = sum(
        occ[s] - 1 for s in occ if len(docs_per[s]) >= _MIN_DF
    )
    assert sum(r.n_removed for r in rows) == want_removed
