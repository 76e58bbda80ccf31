"""Export-planning invariants: shard assignment determinism and
packing-plan conservation, re-derived in pure Python."""

from __future__ import annotations

import duckdb

from aichemy_data_pipelines_spark.operators.export_ops import (
    _CTX,
    _N_SHARDS,
    corpus_packing_plan,
    corpus_shard_plan,
)
from tests.conftest import SF_SMOKE


def test_shard_plan_covers_corpus_and_balances(spark):
    rows = corpus_shard_plan(spark, SF_SMOKE).collect()
    assert {r.shard for r in rows} == set(range(_N_SHARDS))
    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    # hash sharding: no shard dominates (loose 3x-of-fair-share bound)
    assert max(r.n_docs for r in rows) <= 3 * n_docs / _N_SHARDS


def test_packing_plan_conserves_tokens_and_layout(spark):
    shards = {r.shard: r for r in corpus_shard_plan(spark, SF_SMOKE).collect()}
    bins = corpus_packing_plan(spark, SF_SMOKE).collect()
    # token conservation per shard
    by_shard = {}
    for b in bins:
        by_shard.setdefault(b.shard, []).append(b)
    for shard, bs in by_shard.items():
        assert sum(b.bin_tokens for b in bs) == shards[shard].total_tokens
        # bins are the contiguous prefix 0..max (cumsum layout can
        # skip a bin only if one doc spans > _CTX tokens)
        ids = sorted(b.bin for b in bs)
        if shards[shard].max_doc_tokens <= _CTX:
            assert ids == list(range(len(ids)))
        # every bin holds at least one doc and starts below the cap
        for b in bs:
            assert b.n_docs >= 1
