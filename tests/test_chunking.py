"""Chunk-window invariants: the sliding windows must exactly tile
every document — full coverage, correct stride/overlap, ragged last
chunk, one chunk for short docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.chunking_ops import (
    _CHUNK,
    _STRIDE,
    docs_chunk_windows,
)
from tests.conftest import SF_SMOKE


def test_chunks_tile_documents(spark):
    n_tokens = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            "doc_id",
            F.expr(
                r"size(split(trim(lower(text)), '\\s+'))"
            ).alias("n"),
        )
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in docs_chunk_windows(spark, SF_SMOKE).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, chunks in by_doc.items():
        n = n_tokens[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.start_token == c.chunk_idx * _STRIDE
            assert c.n_tokens == min(_CHUNK, n - c.start_token)
            assert c.n_tokens >= 1
        # full coverage: last chunk reaches the end of the doc
        last = chunks[-1]
        assert last.start_token + last.n_tokens == n
        # minimality: one chunk iff the doc fits in a window
        if n <= _CHUNK:
            assert len(chunks) == 1
        else:
            # the previous chunk must NOT already reach the end
            prev_end = (len(chunks) - 2) * _STRIDE + _CHUNK
            assert prev_end < n
