"""Corpus-build driver: materialized snapshot consistent with the
audit funnel, versioned re-builds, crash-safe via the manifest
protocol."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.corpus_ops import (
    corpus_curation_funnel,
)
from aichemy_data_pipelines_spark.pipeline.corpus_build import (
    CorpusBuildConfig,
    CorpusBuildPipeline,
)
from tests.conftest import SF_SMOKE


@pytest.fixture
def pipe(spark, tmp_path):
    return CorpusBuildPipeline(
        spark, CorpusBuildConfig(sf_dir=SF_SMOKE, output_dir=str(tmp_path))
    )


def test_build_matches_funnel(spark, pipe):
    stats = pipe.build_once()
    funnel = corpus_curation_funnel(spark, SF_SMOKE).agg(
        F.sum("n_raw").alias("n_raw"),
        F.sum("n_final").alias("n_final"),
        F.sum("final_ws_tokens").alias("tok"),
    ).collect()[0]
    assert stats["n_raw"] == funnel.n_raw
    assert stats["n_final"] == funnel.n_final
    assert stats["final_ws_tokens"] == funnel.tok
    assert 0 < stats["n_final"] < stats["n_raw"]

    cur = pipe.curated.read(spark)
    assert cur.count() == stats["n_final"]
    # snapshot carries full doc rows + deterministic shard assignment
    assert {"doc_id", "text", "source", "shard"} <= set(cur.columns)
    assert cur.where(
        (F.col("shard") < 0) | (F.col("shard") >= pipe.cfg.n_shards)
    ).count() == 0
    # verdict snapshot covers every raw doc
    assert pipe.verdicts_table.read(spark).count() == stats["n_raw"]
    # build log has one line with the same stats
    logged = json.loads(
        open(pipe._builds_log).read().strip().splitlines()[-1]
    )
    assert logged["n_final"] == stats["n_final"]


def test_rebuild_versions_and_determinism(spark, pipe):
    s1 = pipe.build_once()
    s2 = pipe.build_once()
    # same input -> identical verdicts; snapshot version advances
    assert s2["n_final"] == s1["n_final"]
    assert s2["corpus_version"] == s1["corpus_version"] + 1
    assert pipe.curated.version() == s2["corpus_version"]
    # old version stays on disk until vacuum; current read is v2 only
    assert pipe.curated.read(spark).count() == s2["n_final"]
    removed = pipe.curated.vacuum()
    assert len(removed) == 1
    assert pipe.curated.read(spark).count() == s2["n_final"]


def test_crashed_build_leaves_previous_version(spark, pipe):
    from aichemy_data_pipelines_spark.pipeline.atomic import (
        AtomicParquetTable,
    )

    s1 = pipe.build_once()
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            AtomicParquetTable,
            "_publish",
            lambda self, *a: (_ for _ in ()).throw(KeyboardInterrupt),
        )
        with pytest.raises(KeyboardInterrupt):
            pipe.build_once()
    # readers still on v1, complete
    assert pipe.curated.version() == s1["corpus_version"]
    assert pipe.curated.read(spark).count() == s1["n_final"]
    # re-run converges
    s3 = pipe.build_once()
    assert s3["n_final"] == s1["n_final"]


def test_curated_snapshot_is_shard_partitioned(spark, pipe):
    import os

    pipe.build_once()
    data_dir = pipe.curated.current_dirs()[0]
    shard_dirs = [
        d for d in os.listdir(data_dir) if d.startswith("shard=")
    ]
    assert len(shard_dirs) > 1
    # partition column round-trips through the reader
    cur = pipe.curated.read(spark)
    assert "shard" in cur.columns
    assert cur.where(F.col("shard").isNull()).count() == 0


def test_zordered_snapshot_tightens_file_bounds(spark, tmp_path):
    """With files_per_shard > 1 the curated snapshot is laid out
    along a (doc_id, n_chars) Z-curve inside each shard, so per-file
    footer min/max spans are fractions of the shard's span — footer
    skipping prunes doc_id-range and length predicates without
    reading data."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    p = CorpusBuildPipeline(
        spark,
        CorpusBuildConfig(
            sf_dir=SF_SMOKE,
            output_dir=str(tmp_path),
            n_shards=4,
            files_per_shard=4,
        ),
    )
    p.build_once()
    data_dir = p.curated.current_dirs()[0]
    # Z-order metric: mean normalized (doc_id-span × n_chars-span)
    # bounding-box AREA per file — an unsorted layout sits near 1.0
    # per file; a Z-curve layout measures ~0.25 here
    areas = []
    for shard_dir in sorted(_glob.glob(os.path.join(data_dir, "shard=*"))):
        files = sorted(_glob.glob(os.path.join(shard_dir, "*.parquet")))
        if len(files) < 2:
            continue  # tiny shard collapsed to one task's file
        norm_spans = {}
        for c in ("doc_id", "n_chars"):
            vals = []
            for fp in files:
                meta = pq.ParquetFile(fp).metadata
                idx = meta.schema.names.index(c)
                st = [
                    meta.row_group(g).column(idx).statistics
                    for g in range(meta.num_row_groups)
                ]
                vals.append(
                    (min(s.min for s in st), max(s.max for s in st))
                )
            glo = min(v[0] for v in vals)
            ghi = max(v[1] for v in vals)
            norm_spans[c] = [
                (hi - lo) / max(ghi - glo, 1) for lo, hi in vals
            ]
        areas += [
            a * b
            for a, b in zip(norm_spans["doc_id"], norm_spans["n_chars"])
        ]
    assert len(areas) >= 4, "need multi-file shards to assert the layout"
    assert sum(areas) / len(areas) < 0.5, areas


def test_full_audit_verdicts_carry_screen_matrix(spark, tmp_path):
    """full_audit=True records the seven-screen audit columns in the
    versioned verdicts snapshot, consistent with the funnel verdicts."""
    from aichemy_data_pipelines_spark.pipeline.corpus_build import (
        CorpusBuildConfig,
        CorpusBuildPipeline,
    )
    from tests.conftest import SF_SMOKE

    pipe = CorpusBuildPipeline(
        spark,
        CorpusBuildConfig(
            sf_dir=SF_SMOKE,
            output_dir=str(tmp_path / "corpus"),
            full_audit=True,
        ),
    )
    stats = pipe.build_once()
    v = pipe.verdicts_table.read(spark)
    cols = set(v.columns)
    assert {
        "pass_quality",
        "pass_boilerplate",
        "pass_readability",
        "pass_ppl",
        "pass_dedup",
        "pass_dsir",
        "pass_blocklist",
        "n_failed",
    } <= cols
    rows = v.collect()
    assert len(rows) == stats["n_raw"]
    for r in rows:
        assert 0 <= r.n_failed <= 7
        # the matrix's dedup screen and the funnel's dedup verdict
        # are the same underlying keep-one component
        assert r.pass_dedup == bool(r.dedup_keep)
