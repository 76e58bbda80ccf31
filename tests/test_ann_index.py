"""Persisted-IVF-index contract (pipeline/ann_index.py): the
build/query split must be byte-identical to the oracle-checked
inline operator, survive rebuilds atomically, and prune postings by
list partition.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.ivf import (
    _N_QUERIES,
    ann_ivf_topk,
)
from aichemy_data_pipelines_spark.pipeline.ann_index import (
    _postings_table,
    build_ivf_index,
    query_ivf_index,
)
from tests.conftest import SF_SMOKE


def _queries(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .where(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_persisted_index_matches_inline_operator(spark, tmp_path):
    root = str(tmp_path / "ivf")
    v = build_ivf_index(spark, SF_SMOKE, root)
    assert v == 1
    inline = sorted(
        (r.query_id, r.rk, r.cand_id, r.cosine)
        for r in ann_ivf_topk(spark, SF_SMOKE).collect()
    )
    persisted = sorted(
        (r.query_id, r.rk, r.cand_id, r.cosine)
        for r in query_ivf_index(spark, root, _queries(spark)).collect()
    )
    assert persisted == inline

    # rebuild commits a NEW version; queries still work and the old
    # version remains readable until vacuum
    assert build_ivf_index(spark, SF_SMOKE, root) == 2
    again = sorted(
        (r.query_id, r.rk, r.cand_id, r.cosine)
        for r in query_ivf_index(spark, root, _queries(spark)).collect()
    )
    assert again == inline


def test_postings_are_partitioned_by_list(spark, tmp_path):
    """list_id hive partitions exist on disk — a probe's scan prunes
    to its lists' directories."""
    root = str(tmp_path / "ivf")
    build_ivf_index(spark, SF_SMOKE, root)
    (data_dir,) = _postings_table(root).current_dirs()
    parts = {
        n
        for n in os.listdir(data_dir)
        if n.startswith("list_id=") and os.path.isdir(os.path.join(data_dir, n))
    }
    assert len(parts) >= 2


def test_screen_batch_matches_inline_operator(spark, tmp_path):
    """ann_incremental_screen (self-contained, oracle-checked) and
    the operational path (build_ivf_index on the corpus split +
    screen_batch) must agree row-for-row — index staleness, probe
    drift, or verdict-shape drift fails here."""
    from aichemy_data_pipelines_spark.operators.ivf import (
        _INCR_MOD,
        ann_incremental_screen,
    )
    from aichemy_data_pipelines_spark.pipeline.ann_index import (
        screen_batch,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus_dir = str(tmp_path / "corpus_sf")
    os.makedirs(corpus_dir)
    e.where(F.col("vec_id") % _INCR_MOD != 0).write.parquet(
        f"{corpus_dir}/embeddings.parquet"
    )
    root = str(tmp_path / "ivf")
    build_ivf_index(spark, corpus_dir, root)

    batch = e.where(F.col("vec_id") % _INCR_MOD == 0).select(
        "vec_id", "embedding"
    )
    key = lambda r: (  # noqa: E731
        r.vec_id, r.n_corpus_matches, r.best_cand, r.best_cosine, r.is_new
    )
    persisted = sorted(map(key, screen_batch(spark, root, batch).collect()))
    inline = sorted(
        map(key, ann_incremental_screen(spark, SF_SMOKE).collect())
    )
    assert persisted == inline
    assert inline, "batch split is non-empty by construction"
    for t in inline:
        # verdict-shape invariants: is_new ⟺ zero matches ⟺ no best
        assert t[4] == (t[1] == 0)
        assert (t[2] is None) == t[4] and (t[3] is None) == t[4]


def test_accept_batch_is_replay_idempotent(spark, tmp_path):
    """accept_batch under a re-delivered foreachBatch id must no-op
    (high-watermark + checkpoint identity), and growing the index
    must keep the centroid manifest so queries still resolve."""
    from aichemy_data_pipelines_spark.pipeline.ann_index import (
        _load_centroids,
        accept_batch,
    )

    root = str(tmp_path / "ivf")
    build_ivf_index(spark, SF_SMOKE, root)
    table = _postings_table(root)
    n0 = table.read(spark).count()

    batch = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .limit(3)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    v1 = accept_batch(spark, root, batch, batch_id=0, run_id="run-a")
    assert table.read(spark).count() == n0 + 3
    # replay of batch 0 under the same identity: no-op
    assert accept_batch(spark, root, batch, batch_id=0, run_id="run-a") == v1
    assert table.read(spark).count() == n0 + 3
    # centroids survived the append (stamp carries manifest meta)
    assert _load_centroids(spark, root, table.version()).count() > 0
    # a NEW checkpoint identity restarts ids: batch 0 applies again
    v2 = accept_batch(spark, root, batch, batch_id=0, run_id="run-b")
    assert v2 > v1 and table.read(spark).count() == n0 + 6
