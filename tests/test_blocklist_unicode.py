"""Semantic tests for the r17 widening screens: blocklist filter
(operators/blocklist_ops.py) and unicode/mojibake stats
(operators/unicode_ops.py) — verdicts re-derived independently in
Python over the raw corpus, plus plan-shape pins (pure map; the NFC
stat is the one sanctioned Arrow hop)."""

from __future__ import annotations

import hashlib
import unicodedata

from aichemy_data_pipelines_spark.operators.blocklist_ops import (
    _BLOCK_SOURCES,
    _BLOCK_TERMS,
    _MAX_TERM_HITS,
    docs_blocklist_filter,
)
from aichemy_data_pipelines_spark.operators.unicode_ops import (
    _COMBINING,
    _MOJIBAKE,
    _REPLACEMENT,
    text_unicode_stats,
)
from tests.conftest import SF_SMOKE


def test_blocklist_verdicts_rederive(spark):
    docs = {
        r.doc_id: (r.text, r.source)
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    got = {r.doc_id: r for r in docs_blocklist_filter(spark, SF_SMOKE).collect()}
    assert set(got) == set(docs)
    saw_term_block = saw_domain_block = saw_clean = False
    for doc_id, (text, source) in docs.items():
        toks = text.strip().lower().split()
        hits = sum(1 for t in toks if t in _BLOCK_TERMS)
        distinct = sum(1 for t in _BLOCK_TERMS if t in toks)
        r = got[doc_id]
        assert r.n_term_hits == hits
        assert r.n_distinct_terms == distinct
        assert r.domain_blocked == (source in _BLOCK_SOURCES)
        assert r.blocked == (
            source in _BLOCK_SOURCES or hits >= _MAX_TERM_HITS
        )
        saw_term_block |= r.blocked and not r.domain_blocked
        saw_domain_block |= r.domain_blocked
        saw_clean |= not r.blocked
    # the screen must discriminate through BOTH arms on this corpus
    assert saw_term_block and saw_domain_block and saw_clean
    # the dead term stays dead: real blocklists are mostly absent
    assert all(
        "leak" not in text.strip().lower().split()
        for text, _ in docs.values()
    )


def test_blocklist_is_pure_map(spark):
    plan = (
        docs_blocklist_filter(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # no join, no shuffle — a free pass


def test_unicode_stats_rederive(spark):
    """Re-derive every stat in Python: rebuild the md5-parity noise
    suffix, then count with stdlib unicodedata/str ops."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    got = {r.doc_id: r for r in text_unicode_stats(spark, SF_SMOKE).collect()}
    assert set(got) == set(docs)
    saw_delta = saw_repl = saw_ctrl = saw_clean = False
    for doc_id, text in docs.items():
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        b = [int(h[k], 16) % 2 for k in range(4)]
        noisy = text + " "
        if b[0] == 0:
            noisy += _COMBINING
        if b[1] == 0:
            noisy += _REPLACEMENT
        if b[2] == 0:
            noisy += _MOJIBAKE
        if b[3] == 0:
            noisy += "\x07"
        r = got[doc_id]
        assert r.n_chars == len(noisy)
        assert r.n_nfc_chars == len(unicodedata.normalize("NFC", noisy))
        assert r.nfc_delta == len(noisy) - len(
            unicodedata.normalize("NFC", noisy)
        )
        assert r.n_replacement == noisy.count(_REPLACEMENT)
        assert r.n_mojibake == noisy.count(_MOJIBAKE[0])
        assert r.n_control == noisy.count("\x07")
        assert r.mojibake_flag == (
            r.n_replacement > 0 or r.n_mojibake > 0 or r.n_control > 0
        )
        saw_delta |= r.nfc_delta > 0
        saw_repl |= r.n_replacement > 0
        saw_ctrl |= r.n_control > 0
        saw_clean |= not r.mojibake_flag
    assert saw_delta and saw_repl and saw_ctrl and saw_clean


def test_unicode_stats_single_arrow_hop(spark):
    """The NFC length is the ONE sanctioned Python stage (Arrow
    pandas_udf — Spark SQL has no normalizer builtin); everything
    else must stay JVM-side, and no row-at-a-time UDF may appear."""
    plan = (
        text_unicode_stats(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan  # pure map, no shuffle
