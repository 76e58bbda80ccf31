"""Streaming corpus ingestion: quality gate + first-arrival dedup
(within batch and across batches via the growing signature index),
exactly-once, atomic commits."""

from __future__ import annotations

import pytest

from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable
from aichemy_data_pipelines_spark.streaming.corpus_ingest import (
    stream_corpus_ingest,
)

_GOOD_A = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew distinct potions under a crimson autumn sky tonight"
)
_GOOD_B = (
    "colorless green ideas sleep furiously beneath ancient granite "
    "mountains where silver rivers carve patient winding canyons daily"
)
_GOOD_C = (
    "a traveling merchant counted copper coins beside the harbor "
    "market as gulls wheeled above creaking wooden fishing boats"
)
_SPAM = "spam " * 40  # frac_dup_words ~ 0.97 -> quality-dropped


def _write(df_rows, spark, path):
    spark.createDataFrame(
        df_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(path))


@pytest.fixture
def ingested(spark, tmp_path):
    src = tmp_path / "feed"
    src.mkdir()
    # batch 0: two good docs + an intra-batch duplicate pair (8 dups 2)
    _write(
        [
            (1, _GOOD_A, "en", "web", len(_GOOD_A)),
            (2, _GOOD_B, "en", "web", len(_GOOD_B)),
            (8, _GOOD_B, "en", "mirror", len(_GOOD_B)),
        ],
        spark,
        src / "f0.parquet",
    )
    # batch 1: dup of doc 1 (cross-batch), one new good doc, one spam
    _write(
        [
            (3, _GOOD_A, "en", "scrape", len(_GOOD_A)),
            (4, _GOOD_C, "en", "web", len(_GOOD_C)),
            (6, _SPAM, "en", "junk", len(_SPAM)),
        ],
        spark,
        src / "f1.parquet",
    )
    # batch 2: dup of doc 4
    _write(
        [(5, _GOOD_C, "en", "mirror", len(_GOOD_C))],
        spark,
        src / "f2.parquet",
    )
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    stream_corpus_ingest(
        spark, str(src), str(out), ckpt, max_files_per_trigger=1
    )
    return src, out, ckpt


def test_first_arrival_dedup_and_quality(spark, ingested):
    _src, out, _ckpt = ingested
    curated = AtomicParquetTable(str(out / "curated.parquet")).read(spark)
    ids = sorted(r.doc_id for r in curated.collect())
    # 1,2 accepted; 8 intra-batch dup of 2; 3 cross-batch dup of 1;
    # 4 accepted; 6 spam; 5 cross-batch dup of 4
    assert ids == [1, 2, 4]
    # index holds bands only for accepted docs
    idx = AtomicParquetTable(str(out / "sig_index.parquet")).read(spark)
    assert sorted(
        r.doc_id for r in idx.select("doc_id").distinct().collect()
    ) == [1, 2, 4]


def test_redrain_is_noop(spark, ingested):
    src, out, ckpt = ingested
    stream_corpus_ingest(
        spark, str(src), str(out), ckpt, max_files_per_trigger=1
    )
    curated = AtomicParquetTable(str(out / "curated.parquet")).read(spark)
    assert sorted(r.doc_id for r in curated.collect()) == [1, 2, 4]


def test_new_file_ingested_incrementally(spark, ingested):
    src, out, ckpt = ingested
    _write(
        [
            (9, _GOOD_B, "en", "late-mirror", 10),  # dup of accepted 2
            (
                10,
                "entirely novel prose about winter constellations "
                "guiding weary sailors home across phosphorescent seas",
                "en",
                "web",
                99,
            ),
        ],
        spark,
        src / "f3.parquet",
    )
    stream_corpus_ingest(
        spark, str(src), str(out), ckpt, max_files_per_trigger=1
    )
    curated = AtomicParquetTable(str(out / "curated.parquet")).read(spark)
    assert sorted(r.doc_id for r in curated.collect()) == [1, 2, 4, 10]


def test_replay_of_committed_batch_is_noop(spark, ingested):
    """foreachBatch is at-least-once: a crash after both appends but
    before the checkpoint commit replays the batch. The batch_id
    manifest stamp must make that replay a no-op."""
    from aichemy_data_pipelines_spark.streaming.corpus_ingest import (
        ingest_batch,
    )

    src, out, _ckpt = ingested
    curated = AtomicParquetTable(str(out / "curated.parquet"))
    sig = AtomicParquetTable(str(out / "sig_index.parquet"))
    v_cur, v_sig = curated.version(), sig.version()
    last_bid = sig.meta()["last_batch_id"]
    replay = spark.read.parquet(str(src / "f2.parquet"))
    ingest_batch(replay, last_bid, curated, sig)
    assert (curated.version(), sig.version()) == (v_cur, v_sig)


def test_replay_after_crash_between_appends(spark, tmp_path):
    """Crash window the round-4 ADVICE flagged: curated committed the
    batch but sig_index didn't. The replay must skip the curated
    append (no duplicate docs) yet still index the band keys, and
    later batches must dedup against them."""
    import pytest as _pytest

    from aichemy_data_pipelines_spark.streaming.corpus_ingest import (
        ingest_batch,
    )

    src = tmp_path / "feed"
    src.mkdir()
    _write([(1, _GOOD_A, "en", "web", len(_GOOD_A))], spark, src / "f0.parquet")
    _write([(4, _GOOD_C, "en", "web", len(_GOOD_C))], spark, src / "f1.parquet")
    _write(
        [(5, _GOOD_C, "en", "mirror", len(_GOOD_C))], spark, src / "f2.parquet"
    )
    curated = AtomicParquetTable(str(tmp_path / "out" / "curated.parquet"))
    sig = AtomicParquetTable(str(tmp_path / "out" / "sig_index.parquet"))
    ingest_batch(spark.read.parquet(str(src / "f0.parquet")), 0, curated, sig)

    class _Crash(Exception):
        pass

    class _CrashySig:
        """Delegates reads; dies on append — the crash window."""

        def __init__(self, inner):
            self._inner = inner

        def meta(self):
            return self._inner.meta()

        def read(self, sess):
            return self._inner.read(sess)

        def append(self, *a, **k):
            raise _Crash()

    df1 = spark.read.parquet(str(src / "f1.parquet"))
    with _pytest.raises(_Crash):
        ingest_batch(df1, 1, curated, _CrashySig(sig))
    assert curated.meta()["last_batch_id"] == 1
    assert sig.meta()["last_batch_id"] == 0
    n_before = curated.read(spark).count()

    ingest_batch(df1, 1, curated, sig)  # the replay
    assert curated.read(spark).count() == n_before  # no doc duplicated
    assert sig.meta()["last_batch_id"] == 1
    # the recovered index still screens future dups of the batch
    ingest_batch(spark.read.parquet(str(src / "f2.parquet")), 2, curated, sig)
    ids = sorted(r.doc_id for r in curated.read(spark).collect())
    assert ids == [1, 4]


def test_stream_embedding_ingest_screens_and_grows(spark, tmp_path):
    """The ANN screen-then-grow loop end to end: seed index from the
    corpus split, stream two embedding drops (one containing a
    near-dup of an indexed vector — its own copy), verify verdicts,
    index growth by exactly the novel vectors, and replay safety on
    a second identical run."""
    from pyspark.sql import functions as F

    from aichemy_data_pipelines_spark.operators.ivf import _INCR_MOD
    from aichemy_data_pipelines_spark.pipeline.ann_index import (
        _postings_table,
        build_ivf_index,
    )
    from aichemy_data_pipelines_spark.streaming.corpus_ingest import (
        stream_embedding_ingest,
    )
    from tests.conftest import SF_SMOKE

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus_dir = tmp_path / "corpus_sf"
    corpus_dir.mkdir()
    e.where(F.col("vec_id") % _INCR_MOD != 0).write.parquet(
        str(corpus_dir / "embeddings.parquet")
    )
    root = str(tmp_path / "ivf")
    build_ivf_index(spark, str(corpus_dir), root)
    table = _postings_table(root)
    v_built = table.version()
    n_indexed = table.read(spark).count()

    # feed: drop 0 = fresh batch vectors; drop 1 = exact copies of
    # two INDEXED vectors under new ids (guaranteed near-dups)
    feed = tmp_path / "feed"
    feed.mkdir()
    batch0 = e.where(F.col("vec_id") % _INCR_MOD == 0).select(
        "vec_id", "embedding"
    )
    n_batch0 = batch0.count()
    batch0.coalesce(1).write.parquet(str(feed / "b0.parquet"))
    dup_src = e.where(F.col("vec_id") % _INCR_MOD != 0).limit(2)
    dup_src.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).coalesce(1).write.parquet(str(feed / "b1.parquet"))

    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    stream_embedding_ingest(
        spark, str(feed), root, str(out), ckpt, max_files_per_trigger=1
    )

    verdicts = AtomicParquetTable(
        str(out / "screen_verdicts.parquet")
    ).read(spark)
    rows = {r.vec_id: r for r in verdicts.collect()}
    assert len(rows) == n_batch0 + 2
    # the re-ingested copies MUST hit their indexed originals
    for r in rows.values():
        if r.vec_id >= 1_000_000:
            assert not r.is_new and r.best_cosine == 1.0
    n_new = sum(1 for r in rows.values() if r.is_new)
    grown = _postings_table(root)
    assert grown.read(spark).count() == n_indexed + n_new
    assert grown.version() > v_built
    v_after = grown.version()

    # replay: same feed, same checkpoint -> availableNow finds no new
    # files, nothing re-appends
    stream_embedding_ingest(
        spark, str(feed), root, str(out), ckpt, max_files_per_trigger=1
    )
    assert _postings_table(root).version() == v_after
    assert AtomicParquetTable(
        str(out / "screen_verdicts.parquet")
    ).read(spark).count() == len(rows)


_EVAL_DOC = (
    "benchmark question about photosynthesis requires plants convert "
    "sunlight carbon dioxide and water into glucose and oxygen daily"
)
# shares an 8-gram window with _EVAL_DOC -> bloom-positive
_LEAKED = (
    "students recall that plants convert sunlight carbon dioxide and "
    "water into glucose during the photosynthesis study session"
)


def test_bloom_gate_rejects_contaminated_at_ingest(spark, tmp_path):
    """Streaming decontamination (r15): with an eval-suite Bloom bit
    set installed, a doc sharing an 8-gram with the benchmark is
    rejected at ingest — it reaches neither the curated table nor
    the signature index — while clean docs flow through, and a full
    checkpoint re-drain stays a no-op (exactly-once with the gate
    active)."""
    from aichemy_data_pipelines_spark.streaming.corpus_ingest import (
        stream_corpus_ingest,
    )

    src = tmp_path / "feed"
    src.mkdir()
    _write(
        [
            (1, _GOOD_A, "en", "web", len(_GOOD_A)),
            (2, _LEAKED, "en", "scrape", len(_LEAKED)),
        ],
        spark,
        src / "f0.parquet",
    )
    _write(
        [(3, _GOOD_B, "en", "web", len(_GOOD_B))],
        spark,
        src / "f1.parquet",
    )
    eval_docs = spark.createDataFrame(
        [(100, _EVAL_DOC)], "doc_id long, text string"
    )
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    stream_corpus_ingest(
        spark,
        str(src),
        str(out),
        ckpt,
        max_files_per_trigger=1,
        eval_docs=eval_docs,
    )
    curated = AtomicParquetTable(str(out / "curated.parquet")).read(spark)
    ids = sorted(r.doc_id for r in curated.collect())
    assert ids == [1, 3], f"leaked doc must be rejected: {ids}"
    idx = AtomicParquetTable(str(out / "sig_index.parquet")).read(spark)
    assert sorted(
        r.doc_id for r in idx.select("doc_id").distinct().collect()
    ) == [1, 3], "contaminated doc's bands must not enter the index"
    # rejection audit (r16, r15 ADVICE #4): the Bloom rejection is
    # RECORDED, not silently absent — one (doc_id, reason, batch_id)
    # row for the contaminated doc
    audit = AtomicParquetTable(str(out / "reject_audit.parquet")).read(
        spark
    )
    rej = {(r.doc_id, r.reason) for r in audit.collect()}
    assert (2, "contaminated") in rej, f"no audit row for the leak: {rej}"
    assert not any(d in (1, 3) for d, _ in rej), (
        f"accepted docs must not appear in the audit: {rej}"
    )
    n_audit = audit.count()
    # exactly-once: a full re-drain with the gate is a no-op
    stream_corpus_ingest(
        spark,
        str(src),
        str(out),
        ckpt,
        max_files_per_trigger=1,
        eval_docs=eval_docs,
    )
    curated2 = AtomicParquetTable(str(out / "curated.parquet")).read(spark)
    assert sorted(r.doc_id for r in curated2.collect()) == [1, 3]
    audit2 = AtomicParquetTable(str(out / "reject_audit.parquet")).read(
        spark
    )
    assert audit2.count() == n_audit, "audit rows duplicated on replay"


def test_bloom_gate_replay_after_crash_is_idempotent(spark, tmp_path):
    """Crash between the curated and sig_index appends, WITH the
    bloom gate active: the replay recomputes the same accepted set
    (the gate is deterministic given the frozen bits), skips the
    curated append, and appends only the band keys — no duplicate
    rows, contaminated doc still out."""
    from aichemy_data_pipelines_spark.operators.bloom_ops import (
        bloom_bits_from_docs,
    )
    from aichemy_data_pipelines_spark.streaming.corpus_ingest import (
        ingest_batch,
    )

    curated = AtomicParquetTable(str(tmp_path / "curated.parquet"))
    sig_index = AtomicParquetTable(str(tmp_path / "sig.parquet"))
    bits = bloom_bits_from_docs(
        spark.createDataFrame(
            [(100, _EVAL_DOC)], "doc_id long, text string"
        )
    ).localCheckpoint(eager=True)
    batch = spark.createDataFrame(
        [
            (1, _GOOD_A, "en", "web", len(_GOOD_A)),
            (2, _LEAKED, "en", "scrape", len(_LEAKED)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ingest_batch(batch, 0, curated, sig_index, run_id="r", bloom_bits=bits)
    assert sorted(
        r.doc_id for r in curated.read(spark).collect()
    ) == [1]
    # simulate the crash window: curated stamped for batch 1, index
    # not — then replay batch 1
    batch1 = spark.createDataFrame(
        [(4, _GOOD_C, "en", "web", len(_GOOD_C))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ingest_batch(batch1, 1, curated, sig_index, run_id="r", bloom_bits=bits)
    n_cur = curated.read(spark).count()
    n_idx = sig_index.read(spark).count()
    ingest_batch(batch1, 1, curated, sig_index, run_id="r", bloom_bits=bits)
    assert curated.read(spark).count() == n_cur
    assert sig_index.read(spark).count() == n_idx
    assert sorted(
        r.doc_id for r in curated.read(spark).collect()
    ) == [1, 4]
