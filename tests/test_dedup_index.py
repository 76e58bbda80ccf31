"""Persisted-LSH-index contract (pipeline/dedup_index.py):
build+screen must be byte-equal to the oracle-checked
dedup_incremental operator, and accepting a batch must make its docs
visible to the next screen (grow monotonicity + replay idempotence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.dedup import (
    _INCR_MOD,
    _docs_with_shingles,
    dedup_incremental,
)
from aichemy_data_pipelines_spark.pipeline.dedup_index import (
    _index_table,
    accept_batch,
    build_dedup_index,
    screen_batch,
)
from tests.conftest import SF_SMOKE


def test_screen_matches_incremental_operator(spark, tmp_path):
    root = str(tmp_path / "lsh")
    build_dedup_index(
        spark, SF_SMOKE, root, corpus_filter=F.col("doc_id") % _INCR_MOD != 0
    )
    batch = _docs_with_shingles(spark, SF_SMOKE).where(
        F.col("doc_id") % _INCR_MOD == 0
    )
    persisted = sorted(
        (r.doc_id, r.n_corpus_matches, r.is_new)
        for r in screen_batch(spark, root, batch).collect()
    )
    inline = sorted(
        (r.doc_id, r.n_corpus_matches, r.is_new)
        for r in dedup_incremental(spark, SF_SMOKE).collect()
    )
    assert persisted == inline


def test_accept_makes_batch_visible_and_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "lsh")
    build_dedup_index(
        spark, SF_SMOKE, root, corpus_filter=F.col("doc_id") % _INCR_MOD != 0
    )
    batch = _docs_with_shingles(spark, SF_SMOKE).where(
        F.col("doc_id") % _INCR_MOD == 0
    )
    v1 = accept_batch(root, batch, batch_id=7)
    # replay of the same batch_id is a no-op commit
    assert accept_batch(root, batch, batch_id=7) == v1
    assert _index_table(root).meta()["last_batch_id"] == 7
    n_rows = _index_table(root).read(spark).count()
    # replay of any OLDER batch id is also a no-op (high-watermark
    # guard, not last-id equality): no duplicate band rows, and the
    # meta stamp never moves backwards
    assert accept_batch(root, batch, batch_id=3) == v1
    assert _index_table(root).meta()["last_batch_id"] == 7
    assert _index_table(root).read(spark).count() == n_rows
    # every batch doc with bands now matches ITSELF in the index
    rescreen = screen_batch(spark, root, batch).collect()
    assert rescreen
    for r in rescreen:
        # docs long enough to shingle (all synthetic docs are) now
        # collide with their own accepted signature
        assert not r.is_new, r.doc_id


def test_short_docs_screen_as_trivially_new(spark, tmp_path):
    """A batch containing docs too short to shingle must not crash
    the screen, and those docs must come back is_new with zero
    matches."""
    root = str(tmp_path / "lsh")
    build_dedup_index(spark, SF_SMOKE, root)
    batch = spark.createDataFrame(
        [(900001, ["just", "two"]), (900002, list("abcdefgh"))],
        "doc_id long, tokens array<string>",
    )
    rows = {r.doc_id: r for r in screen_batch(spark, root, batch).collect()}
    assert set(rows) == {900001, 900002}
    assert rows[900001].is_new and rows[900001].n_corpus_matches == 0
    # the long synthetic-alphabet doc shares no shingles either
    assert rows[900002].is_new
    # accepting the mixed batch also survives the short doc
    accept_batch(root, batch, batch_id=1)
    rescreen = {
        r.doc_id: r for r in screen_batch(spark, root, batch).collect()
    }
    assert not rescreen[900002].is_new  # banded doc now matches itself
    assert rescreen[900001].is_new  # band-less doc stays new


def test_screening_against_empty_index(spark, tmp_path):
    """A never-built/empty index screens every doc as new instead of
    crashing on a None read."""
    from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable

    root = str(tmp_path / "lsh")
    # commit an EMPTY index (zero banded docs)
    empty = spark.createDataFrame([], "doc_id long, band int, key string")
    AtomicParquetTable(root + "/band_index.parquet").overwrite(
        empty, partition_by=["band"]
    )
    batch = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"])], "doc_id long, tokens array<string>"
    )
    rows = screen_batch(spark, root, batch).collect()
    assert len(rows) == 1 and rows[0].is_new


def test_compacting_grown_index_preserves_screens(spark, tmp_path):
    """After several accepts fragment the index, table-compact must
    collapse the dirs without changing a single screening verdict."""
    root = str(tmp_path / "lsh")
    build_dedup_index(
        spark, SF_SMOKE, root, corpus_filter=F.col("doc_id") % _INCR_MOD != 0
    )
    docs = _docs_with_shingles(spark, SF_SMOKE)
    for i, m in enumerate((0, 5)):
        accept_batch(
            root,
            docs.where(F.col("doc_id") % _INCR_MOD == m),
            batch_id=i,
        )
    probe = docs.where(F.col("doc_id") % _INCR_MOD == 3)
    before = sorted(
        (r.doc_id, r.n_corpus_matches, r.is_new)
        for r in screen_batch(spark, root, probe).collect()
    )
    t = _index_table(root)
    assert len(t.current_dirs()) == 3
    t.compact(spark, partition_by=["band"])
    assert len(t.current_dirs()) == 1
    # replay-idempotence stamp survives the compaction
    assert t.meta()["last_batch_id"] == 1
    after = sorted(
        (r.doc_id, r.n_corpus_matches, r.is_new)
        for r in screen_batch(spark, root, probe).collect()
    )
    assert after == before


def test_fresh_checkpoint_identity_defeats_stale_watermark(
    spark, tmp_path
):
    """r06 ADVICE: if the streaming checkpoint is deleted/recreated
    while the index table is kept, foreachBatch ids restart at 0 —
    the bare watermark would silently drop every new batch until ids
    exceed the stale stamp. With the run-identity recorded alongside,
    a new identity re-opens the gate (and rolls the stamp over),
    while a same-identity replay still no-ops."""
    root = str(tmp_path / "lsh")
    build_dedup_index(
        spark, SF_SMOKE, root, corpus_filter=F.col("doc_id") % _INCR_MOD != 0
    )
    batch = _docs_with_shingles(spark, SF_SMOKE).where(
        F.col("doc_id") % _INCR_MOD == 0
    )
    v1 = accept_batch(root, batch, batch_id=5, run_id="ckpt-A")
    n1 = _index_table(root).read(spark).count()
    # same identity, id <= watermark: replay, no-op
    assert accept_batch(root, batch, batch_id=5, run_id="ckpt-A") == v1
    assert accept_batch(root, batch, batch_id=2, run_id="ckpt-A") == v1
    assert _index_table(root).read(spark).count() == n1
    # NEW identity (recreated checkpoint), ids restart at 0: must be
    # PROCESSED, not dropped — and the stamp rolls to the new run
    v2 = accept_batch(root, batch, batch_id=0, run_id="ckpt-B")
    assert v2 > v1
    meta = _index_table(root).meta()
    assert meta["last_batch_id"] == 0
    assert meta["last_run_id"] == "ckpt-B"
    # next replay under the NEW identity no-ops again
    assert accept_batch(root, batch, batch_id=0, run_id="ckpt-B") == v2


def test_checkpoint_identity_resolves_file_uri_via_hadoop_fs(
    spark, tmp_path
):
    """r07 VERDICT #4: the identity read must survive a real cluster
    where the checkpoint lives on a DFS. A ``file:`` URI only
    resolves through the Hadoop FileSystem API — the local ``open()``
    fallback cannot read a path spelled ``file:/...`` — so a
    successful read on the URI proves the FS code path executes."""
    import json

    from aichemy_data_pipelines_spark.pipeline.replay import (
        checkpoint_identity,
    )

    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "q-dfs"}))
    assert checkpoint_identity(ck.as_uri()) == "q-dfs"
    # missing path through the FS API degrades to None, not an error
    assert checkpoint_identity((tmp_path / "nope").as_uri()) is None


def test_adopt_identity_migrates_legacy_stamp(spark, tmp_path):
    """r07 ADVICE: a legacy-stamped table (watermark, no identity)
    whose checkpoint is recreated can never self-migrate — every
    restarted batch is dropped, so stamp() never runs. adopt_identity
    injects the new checkpoint's identity with the watermark reset,
    after which restarted batches process and re-stamp normally."""
    import json

    from aichemy_data_pipelines_spark.pipeline.replay import (
        adopt_identity,
    )

    root = str(tmp_path / "lsh")
    build_dedup_index(
        spark, SF_SMOKE, root, corpus_filter=F.col("doc_id") % _INCR_MOD != 0
    )
    batch = _docs_with_shingles(spark, SF_SMOKE).where(
        F.col("doc_id") % _INCR_MOD == 0
    )
    # legacy stamp: batch committed without an identity
    v1 = accept_batch(root, batch, batch_id=5)
    table = _index_table(root)
    assert "last_run_id" not in table.meta()
    n1 = table.read(spark).count()
    # checkpoint recreated: without migration, batch 0 is dropped
    assert accept_batch(root, batch, batch_id=0, run_id="q-new") == v1
    # one-time migration against the new checkpoint
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "q-new"}))
    assert adopt_identity(table, str(ck)) == "q-new"
    meta = _index_table(root).meta()
    assert meta["last_run_id"] == "q-new"
    assert "last_batch_id" not in meta
    # data untouched by the meta-only manifest bump
    assert _index_table(root).read(spark).count() == n1
    # restarted batch 0 under the new identity now PROCESSES...
    v2 = accept_batch(root, batch, batch_id=0, run_id="q-new")
    assert v2 > v1
    # ...and its replay no-ops again
    assert accept_batch(root, batch, batch_id=0, run_id="q-new") == v2
    # idempotent: already-migrated table is a no-op
    assert adopt_identity(_index_table(root), str(ck)) is None


def test_checkpoint_identity_file_uri_without_jvm(tmp_path, monkeypatch):
    """No-JVM contexts (ops CLI before any session exists) must still
    resolve file: URIs through the local fallback — open() on the raw
    URI string would raise OSError and silently return None."""
    import json

    import pyspark.sql as pssql

    from aichemy_data_pipelines_spark.pipeline import replay

    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "q-nojvm"}))
    monkeypatch.setattr(
        pssql.SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    assert replay.checkpoint_identity(ck.as_uri()) == "q-nojvm"
    assert replay.checkpoint_identity(str(ck)) == "q-nojvm"


def test_replay_helpers_legacy_compat(tmp_path):
    """Legacy stamps (no identity) and identity-less callers keep the
    bare-watermark semantics; checkpoint_identity reads the streaming
    metadata file and degrades to None."""
    import json

    from aichemy_data_pipelines_spark.pipeline.replay import (
        checkpoint_identity,
        is_replay,
        stamp,
    )

    # legacy stamp, identity-less caller: watermark decides
    assert is_replay({"last_batch_id": 5}, 5, None)
    assert is_replay({"last_batch_id": 5}, 3, "ckpt-A")  # legacy stamp
    assert not is_replay({"last_batch_id": 5}, 6, None)
    assert not is_replay({}, 0, "ckpt-A")
    # identity-scoped: mismatch re-opens the gate
    m = stamp({}, 5, "ckpt-A")
    assert is_replay(m, 5, "ckpt-A")
    assert not is_replay(m, 0, "ckpt-B")
    # stamp without run_id stays legacy-shaped
    assert "last_run_id" not in stamp({}, 5, None)
    # metadata file round-trip + unreadable dir
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "q-123"}))
    assert checkpoint_identity(str(ck)) == "q-123"
    assert checkpoint_identity(str(tmp_path / "nope")) is None
