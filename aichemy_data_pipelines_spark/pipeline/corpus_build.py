"""Corpus-build driver — the LLM-data twin of ``WatchConvertPipeline``:
where the watch pipeline turns raw instrument runs into converted
files, this turns a raw document corpus into a VERSIONED, curated,
sharded training corpus, with every gate auditable.

One ``build_once()`` cycle:

1. **verdicts** — the shared per-doc flag table
   (operators/corpus_ops.curation_flags): Gopher-style quality gate,
   eval holdout, benchmark decontamination, near-dup keep-one;
2. **materialize** — curated docs (``final`` conjunction) written as
   an atomic snapshot through the manifest protocol
   (pipeline/atomic.py): readers always see a complete corpus
   version, a crashed build leaves the previous version live, and
   old versions remain addressable until vacuum (free time travel);
3. **shard assignment** — every curated doc gets its deterministic
   export shard (portable hash, stable under re-runs and appends —
   same scheme as operators/export_ops.corpus_shard_plan) so the
   snapshot is directly consumable by a sharded tokenizer fleet;
4. **audit** — the verdict table ships as its own snapshot (same
   protocol) and a per-cycle stats line (counts per drop reason,
   final token yield) appends to ``builds.jsonl``.

Scale: verdict stages keep their individual optimal plans (pure-map
quality, broadcast decontam, equi-join dedup); materialization adds
one doc_id equi-join and a pure-map shard column; stats are one
bounded agg collected to the driver (rows = drop reasons, not docs).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.hashing import spark_hash64
from aichemy_data_pipelines_spark.operators.corpus_ops import curation_flags
from aichemy_data_pipelines_spark.pipeline.atomic import AtomicParquetTable

_N_SHARDS = 16


@dataclass
class CorpusBuildConfig:
    sf_dir: str
    output_dir: str
    n_shards: int = _N_SHARDS
    #: parquet files per export shard in the curated snapshot; with
    #: >1, files within a shard are laid out along a (doc_id,
    #: n_chars) Z-order curve so footer min/max skipping prunes on
    #: either column (incremental doc_id-range readers, length
    #: filters) — at 100 TB this is the difference between a shard
    #: scan and a file-pruned scan
    files_per_shard: int = 1
    #: enrich the verdicts snapshot with the FULL seven-screen audit
    #: matrix (operators/screens_ops.py): per-doc pass flags and
    #: failure counts recorded next to the build's own funnel
    #: verdicts — the "why was my doc dropped" record shipped with
    #: every corpus version.  Off by default (the matrix runs every
    #: screen, including the LM and DSIR estimators).
    full_audit: bool = False


class CorpusBuildPipeline:
    def __init__(self, spark: SparkSession, cfg: CorpusBuildConfig):
        self.spark = spark
        self.cfg = cfg
        os.makedirs(cfg.output_dir, exist_ok=True)

    # -- snapshot tables ----------------------------------------------------
    @property
    def curated(self) -> AtomicParquetTable:
        return AtomicParquetTable(
            os.path.join(self.cfg.output_dir, "curated.parquet")
        )

    @property
    def verdicts_table(self) -> AtomicParquetTable:
        return AtomicParquetTable(
            os.path.join(self.cfg.output_dir, "verdicts.parquet")
        )

    @property
    def _builds_log(self) -> str:
        return os.path.join(self.cfg.output_dir, "builds.jsonl")

    # -- stages -------------------------------------------------------------
    def verdicts(self) -> DataFrame:
        v = curation_flags(self.spark, self.cfg.sf_dir)
        if self.cfg.full_audit:
            from aichemy_data_pipelines_spark.operators.screens_ops import (
                corpus_screens_matrix,
            )

            audit = corpus_screens_matrix(
                self.spark, self.cfg.sf_dir
            ).select(
                "doc_id",
                "pass_quality",
                "pass_boilerplate",
                "pass_readability",
                "pass_ppl",
                "pass_dedup",
                "pass_dsir",
                "pass_blocklist",
                "n_failed",
            )
            v = v.join(audit, "doc_id", "left")
        return v

    def curate(self, verdicts: DataFrame) -> DataFrame:
        """Curated snapshot: full doc rows for keepers + export shard."""
        docs = load_table(self.spark, self.cfg.sf_dir, "documents")
        keep = verdicts.where(F.col("final")).select("doc_id")
        return docs.join(keep, "doc_id").withColumn(
            "shard",
            F.expr(
                f"{spark_hash64('cast(doc_id as string)')}"
                f" % {self.cfg.n_shards}"
            ),
        )

    # -- one build cycle ----------------------------------------------------
    def build_once(self) -> dict:
        t0 = time.perf_counter()
        # cut lineage once: both snapshots and the stats agg reuse the
        # verdict plan, which embeds the dedup/decontam join tree
        v = self.verdicts().localCheckpoint(eager=True)
        # hive-partitioned by export shard: a tokenizer fleet reads
        # its shard's directory without scanning the others.  With
        # files_per_shard > 1 the rows are range-partitioned on
        # (shard, morton(doc_id, n_chars)) BEFORE the partitioned
        # write, so each task holds one compact Z-range of one shard
        # and every data file covers a tight (doc_id, n_chars)
        # bounding box (footer-skipping asserted in
        # tests/test_corpus_build.py).
        curated_df = self.curate(v)
        if self.cfg.files_per_shard > 1:
            from aichemy_data_pipelines_spark.sources.formats import (
                with_morton_z,
            )

            curated_df = (
                with_morton_z(curated_df, "doc_id", "n_chars")
                .repartitionByRange(
                    self.cfg.n_shards * self.cfg.files_per_shard,
                    F.col("shard"),
                    F.col("_z"),
                )
                .sortWithinPartitions("shard", "_z")
                .drop("_z")
            )
        ver_curated = self.curated.overwrite(
            curated_df, partition_by=["shard"]
        )
        self.verdicts_table.overwrite(v)
        stats_row = (
            v.agg(
                F.count("*").alias("n_raw"),
                F.sum(F.expr("cast(not q_keep as bigint)")).alias(
                    "n_fail_quality"
                ),
                F.sum(F.expr("cast(is_eval as bigint)")).alias(
                    "n_eval_heldout"
                ),
                F.sum(F.expr("cast(contam as bigint)")).alias(
                    "n_contaminated"
                ),
                F.sum(F.expr("cast(not dedup_keep as bigint)")).alias(
                    "n_dup_dropped"
                ),
                F.sum(F.expr("cast(final as bigint)")).alias("n_final"),
                F.sum(
                    F.expr("case when final then ws else 0 end")
                ).alias("final_ws_tokens"),
            )
            .collect()[0]
            .asDict()
        )
        stats = {k: int(v_) for k, v_ in stats_row.items()}
        stats["corpus_version"] = ver_curated
        stats["wall_ms"] = int((time.perf_counter() - t0) * 1000)
        stats["built_at"] = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.gmtime()
        )
        with open(self._builds_log, "a") as f:
            f.write(json.dumps(stats) + "\n")
        return stats
