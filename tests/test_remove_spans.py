"""operators/substring_dedup.dedup_remove_spans: keep-first removal
semantics and reconstruction on crafted documents (the synthetic
corpus exercises removal — 92 tiles at sf0.01 — but not the
edge shapes). Oracle value-parity at sf0.01 runs via
tests/test_oracle_parity.py."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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


# documents built from a small pool of SHARED 12-token blocks (so
# cross-doc and within-doc duplicate tiles actually occur) plus a
# per-doc unique tail (never duplicated, exercises the partial-tile
# path). Blocks are tile-aligned by construction: blocks first, tail
# last.
_BLOCKS = [[f"w{i}x{j}" for j in range(12)] for i in range(3)]

_DOCS = st.lists(
    st.tuples(
        st.lists(st.integers(0, 2), min_size=0, max_size=3),  # block ids
        st.integers(0, 11),  # unique-tail length
    ),
    min_size=1,
    max_size=5,
).filter(lambda docs: all(bs or tail for bs, tail in docs))


def _reference(doc_tokens):
    """Pure-Python keep-first tiling dedup: the executable spec."""
    seen = set()
    out = {}
    for doc_id in sorted(doc_tokens):
        toks = doc_tokens[doc_id]
        n_tiles = -(-len(toks) // _TILE)
        kept, n_removed = [], 0
        for i in range(n_tiles):
            tile = toks[i * _TILE : (i + 1) * _TILE]
            if len(tile) == _TILE:
                key = " ".join(tile)
                if key in seen:
                    n_removed += 1
                    continue
                seen.add(key)
            kept.append(tile)
        clean = " ".join(" ".join(t) for t in kept)
        out[doc_id] = (
            n_tiles,
            n_removed,
            sum(len(t) for t in kept),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_DOCS)
def test_remove_spans_matches_python_reference(spark, tmp_path_factory, docs):
    """dedup_remove_spans equals the sequential keep-first spec for
    arbitrary block/tail compositions — corpus-wide ordering, within-
    doc duplicates, partial tails, and full reconstruction (via the
    clean-text fingerprint) all at once."""
    doc_tokens = {}
    for i, (block_ids, tail) in enumerate(docs):
        doc_id = i + 1
        toks = [t for b in block_ids for t in _BLOCKS[b]]
        toks += [f"t{doc_id}q{k}" for k in range(tail)]
        doc_tokens[doc_id] = toks
    tmp = tmp_path_factory.mktemp("spans_prop")
    got = _run(
        spark,
        tmp,
        [(d, " ".join(toks)) for d, toks in doc_tokens.items()],
    )
    want = _reference(doc_tokens)
    for doc_id, (n_tiles, n_removed, clean_n, fp) in want.items():
        r = got[doc_id]
        assert (r.n_tiles, r.n_removed, r.clean_n_tokens, r.clean_fp) == (
            n_tiles,
            n_removed,
            clean_n,
            fp,
        ), (doc_id, doc_tokens[doc_id])
