"""RAG chunk retrieval: verified against a THIRD, plain-Python
implementation of the whole chain (tokenize → chunk → signed hashed
unit vectors → cosine → top-k), independent of both Spark and the
DuckDB oracle."""

from __future__ import annotations

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

from aichemy_data_pipelines_spark.operators.hash_embeddings import (
    _DIM,
    _SEED_BUCKET,
    _SEED_SIGN,
)
from aichemy_data_pipelines_spark.operators.chunking_ops import (
    _CHUNK,
    _STRIDE,
)
from aichemy_data_pipelines_spark.operators.rag_ops import (
    _Q_MOD,
    _TOPK,
    rag_chunk_retrieval,
)
from tests.conftest import SF_SMOKE


def _h64(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def _unit(tokens: list[str]) -> dict[int, Decimal]:
    w: dict[int, int] = {}
    for t in tokens:
        pos = _h64(t, _SEED_BUCKET) % _DIM
        sgn = 1 if _h64(t, _SEED_SIGN) % 2 == 0 else -1
        w[pos] = w.get(pos, 0) + sgn
    w = {p: v for p, v in w.items() if v != 0}
    nrm = sum(v * v for v in w.values()) ** 0.5
    if nrm == 0:
        return {}
    return {
        p: Decimal(repr(v / nrm)).quantize(
            Decimal("1e-6"), ROUND_HALF_UP
        )
        for p, v in w.items()
    }


def test_matches_plain_python_brute_force(spark):
    docs = {
        r.doc_id: re.split(r"\s+", r.text.strip().lower())
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    queries = {d: t for d, t in docs.items() if d % _Q_MOD == 0}
    chunks: dict[tuple[int, int], dict[int, Decimal]] = {}
    for d, toks in docs.items():
        if d % _Q_MOD == 0:
            continue
        n = len(toks)
        last = 0 if n <= _CHUNK else -(-(n - _CHUNK) // _STRIDE)
        for i in range(last + 1):
            vec = _unit(toks[i * _STRIDE : i * _STRIDE + _CHUNK])
            if vec:
                chunks[(d, i)] = vec
    expected = {}
    for qd, qt in queries.items():
        qv = _unit(qt)
        scored = []
        for (d, i), cv in chunks.items():
            shared = qv.keys() & cv.keys()
            if not shared:
                # inverted-index candidate contract: zero-overlap
                # chunks are unreachable, never ranked
                continue
            s = sum((qv[p] * cv[p] for p in shared), Decimal(0))
            scored.append((-s, d, i))
        scored.sort()
        for rk, (negs, d, i) in enumerate(scored[:_TOPK], start=1):
            expected[(qd, rk)] = (d, i, float(round(-negs, 6)))

    got = {
        (r.query_doc, r.rk): (r.doc_id, r.chunk_idx, r.cosine)
        for r in rag_chunk_retrieval(spark, SF_SMOKE).collect()
    }
    assert got == expected
