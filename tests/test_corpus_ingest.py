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
