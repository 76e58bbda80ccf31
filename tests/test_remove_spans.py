"""operators/substring_dedup.dedup_remove_spans: keep-first removal
semantics and reconstruction on crafted documents (the synthetic
corpus exercises removal — 92 tiles at sf0.01 — but not the
edge shapes). Oracle value-parity at sf0.01 runs via
tests/test_oracle_parity.py."""

from __future__ import annotations

import hashlib

from aichemy_data_pipelines_spark.operators.substring_dedup import (
    _TILE,
    dedup_remove_spans,
)

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_SPAN = " ".join(f"w{i}" for i in range(_TILE))  # one full tile
_TAIL_A = "alpha beta gamma"
_TAIL_B = "delta epsilon zeta"


def _run(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], _SCHEMA
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return {
        r.doc_id: r
        for r in dedup_remove_spans(spark, str(tmp_path)).collect()
    }


def _fp(text: str) -> str:
    return hashlib.md5(text.encode()).hexdigest()


def test_keep_first_removes_later_copies(spark, tmp_path):
    # doc 1 owns the span (lowest doc_id); docs 2 and 3 lose it
    got = _run(
        spark,
        tmp_path,
        [
            (1, f"{_SPAN} {_TAIL_A}"),
            (2, f"{_SPAN} {_TAIL_B}"),
            (3, _SPAN),
        ],
    )
    assert got[1].n_removed == 0
    assert got[1].clean_fp == _fp(f"{_SPAN} {_TAIL_A.lower()}".lower())
    assert got[2].n_removed == 1
    assert got[2].clean_n_tokens == 3
    assert got[2].clean_fp == _fp(_TAIL_B)
    # doc 3 is ENTIRELY the duplicated span: cleaned to empty
    assert got[3].n_removed == 1
    assert got[3].clean_n_tokens == 0
    assert got[3].clean_fp == _fp("")
    assert got[3].removed_frac == 1.0


def test_within_doc_duplicate_tiles_removed(spark, tmp_path):
    # the SAME span tiled twice in one doc: first kept, second removed
    got = _run(spark, tmp_path, [(1, f"{_SPAN} {_SPAN}")])
    r = got[1]
    assert r.n_tiles == 2
    assert r.n_removed == 1
    assert r.clean_fp == _fp(_SPAN)


def test_partial_tail_never_removed(spark, tmp_path):
    # both docs are the same SHORT text (< _TILE tokens): partial
    # tiles are not duplicate evidence, so nothing is removed even
    # though the texts are identical (exact-dup territory upstream)
    got = _run(spark, tmp_path, [(1, _TAIL_A), (2, _TAIL_A)])
    assert got[1].n_removed == 0 and got[2].n_removed == 0
    assert got[1].n_tiles == 1
    assert got[2].clean_fp == _fp(_TAIL_A)
