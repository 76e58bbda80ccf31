"""Command-line surface: run the watch pipeline, a registered query,
or the metrics panels.

Usage (mirrors how a reference user would drive the Airflow DAG):

    python -m aichemy_data_pipelines_spark.cli watch \
        --watch-dir /data --output-dir /data/mzML --archive-dir /data/archives \
        [--cycles N] [--quiet-seconds S] [--policy skip|replace] [--delete-original]

    python -m aichemy_data_pipelines_spark.cli query q1_pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--limit 20]

    python -m aichemy_data_pipelines_spark.cli metrics --output-dir /data/mzML

    python -m aichemy_data_pipelines_spark.cli corpus-build \
        --sf-dir /root/testdata/sf0.01 --output-dir /data/corpus

    python -m aichemy_data_pipelines_spark.cli corpus-ingest \
        --src-dir /data/feed --output-dir /data/corpus \
        --checkpoint-dir /data/corpus/_ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="aichemy-data-pipelines-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("watch", help="run watch→convert→archive cycles")
    w.add_argument("--watch-dir", required=True)
    w.add_argument("--output-dir", required=True)
    w.add_argument("--archive-dir", required=True)
    w.add_argument(
        "--cycles",
        type=int,
        default=None,
        help="number of cycles (default: 1, or unbounded with --interval)",
    )
    w.add_argument(
        "--interval",
        type=float,
        default=None,
        metavar="SECONDS",
        help="daemon mode: fixed-rate polling every SECONDS (the "
        "reference's */5 cron schedule); Ctrl-C to stop",
    )
    w.add_argument(
        "--pool",
        default=None,
        help="fair-scheduler pool name bounding this pipeline's share "
        "of the cluster (the reference's MS_POOL concurrency pool)",
    )
    w.add_argument("--quiet-seconds", type=int, default=0)
    w.add_argument("--policy", choices=["skip", "replace"], default="skip")
    w.add_argument("--delete-original", action="store_true")
    w.add_argument("--fmt", choices=["mzml", "mzxml"], default="mzml")

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    au = sub.add_parser(
        "audit",
        help="run the data-health report (uniqueness, orphans, "
        "drift, concentration) and print one JSON document",
    )
    au.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    au.add_argument(
        "--max-rows",
        type=int,
        default=64,
        help="cap rows recorded per audit section",
    )

    cb = sub.add_parser(
        "corpus-build",
        help="build a versioned curated training corpus "
        "(quality gate → decontam → dedup keep-one → atomic "
        "sharded snapshot)",
    )
    cb.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    cb.add_argument("--output-dir", required=True)
    cb.add_argument("--shards", type=int, default=16)
    cb.add_argument(
        "--full-audit",
        action="store_true",
        help="record the six-screen audit matrix (quality/boilerplate/"
        "readability/perplexity/dedup/DSIR pass flags) in the "
        "verdicts snapshot",
    )

    ci = sub.add_parser(
        "corpus-ingest",
        help="stream a document feed into a curated corpus "
        "(quality gate + first-arrival dedup vs the growing "
        "signature index; exactly-once)",
    )
    ci.add_argument("--src-dir", required=True)
    ci.add_argument("--output-dir", required=True)
    ci.add_argument("--checkpoint-dir", required=True)
    ci.add_argument("--glob", default="*.parquet")
    ci.add_argument("--max-files-per-trigger", type=int, default=None)

    tc = sub.add_parser(
        "table-compact",
        help="compact an atomic table's current version into "
        "right-sized files (atomic manifest flip; old version "
        "time-travelable until --vacuum)",
    )
    tc.add_argument("--table-root", required=True)
    tc.add_argument(
        "--target-file-mb",
        type=int,
        default=128,
        help="target parquet file size (default 128 MiB)",
    )
    tc.add_argument(
        "--partition-by",
        default=None,
        help="comma-separated hive-partition columns to preserve "
        "(REQUIRED when the current version is partitioned)",
    )
    tc.add_argument(
        "--vacuum",
        action="store_true",
        help="drop superseded data dirs after the compaction commit",
    )

    ib = sub.add_parser(
        "index-build",
        help="build a persisted similarity/dedup index "
        "(versioned atomic snapshots)",
    )
    ib.add_argument("--kind", choices=["ivf", "lsh", "lm"], required=True)
    ib.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ib.add_argument("--root", required=True)

    ta = sub.add_parser(
        "table-adopt-checkpoint",
        help="one-time migration: inject a recreated checkpoint's "
        "identity into a LEGACY replay stamp (watermark without "
        "identity) so the restarted stream's batches are processed "
        "instead of silently dropped; run after the new checkpoint "
        "exists and before its first batch commits",
    )
    ta.add_argument("--table-root", required=True)
    ta.add_argument("--checkpoint-dir", required=True)

    m = sub.add_parser("metrics", help="print pipeline metrics panels")
    m.add_argument("--output-dir", required=True)
    m.add_argument(
        "--export-grafana",
        metavar="DIR",
        default=None,
        help="write a Grafana provisioning tree (dashboard JSON + "
        "provider + DuckDB datasource) mirroring the reference's "
        "grafana/provisioning, backed by the ledger parquet",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "watch":
        from aichemy_data_pipelines_spark.pipeline.batch import (
            PipelineConfig,
            WatchConvertPipeline,
        )

        cfg = PipelineConfig(
            watch_dir=args.watch_dir,
            output_dir=args.output_dir,
            archive_dir=args.archive_dir,
            quiet_seconds=args.quiet_seconds,
            archive_policy=args.policy,
            delete_original=args.delete_original,
            fmt=args.fmt,
            extra={"pool": args.pool} if args.pool else {},
        )
        pipe = WatchConvertPipeline(spark, cfg)
        if args.interval is not None:
            try:
                pipe.run_forever(
                    args.interval,
                    max_cycles=args.cycles,
                    on_cycle=lambda n, s: print(f"cycle {n}: {s}"),
                )
            except KeyboardInterrupt:
                print("watch loop stopped")
            return 0
        for i in range(args.cycles or 1):
            stats = pipe.run_once()
            print(f"cycle {i + 1}: {stats}")
        return 0

    if args.cmd == "index-build":
        if args.kind == "ivf":
            from aichemy_data_pipelines_spark.pipeline.ann_index import (
                build_ivf_index,
            )

            v = build_ivf_index(spark, args.sf_dir, args.root)
        elif args.kind == "lm":
            from aichemy_data_pipelines_spark.pipeline.lm_index import (
                build_lm_index,
            )

            v = build_lm_index(spark, args.sf_dir, args.root)
        else:
            from aichemy_data_pipelines_spark.pipeline.dedup_index import (
                build_dedup_index,
            )

            v = build_dedup_index(spark, args.sf_dir, args.root)
        print(json.dumps({"kind": args.kind, "version": v}))
        return 0

    if args.cmd == "table-compact":
        from aichemy_data_pipelines_spark.pipeline.atomic import (
            AtomicParquetTable,
        )

        table = AtomicParquetTable(args.table_root)
        v = table.compact(
            spark,
            target_file_bytes=args.target_file_mb << 20,
            partition_by=(
                # tolerate "band, key" / trailing commas: strip
                # whitespace, drop empties, None if nothing is left
                [
                    c.strip()
                    for c in args.partition_by.split(",")
                    if c.strip()
                ]
                or None
                if args.partition_by
                else None
            ),
        )
        removed = table.vacuum() if args.vacuum else []
        print(
            json.dumps(
                {"version": v, "vacuumed": len(removed)}
            )
        )
        return 0

    if args.cmd == "table-adopt-checkpoint":
        from aichemy_data_pipelines_spark.pipeline.atomic import (
            AtomicParquetTable,
        )
        from aichemy_data_pipelines_spark.pipeline.replay import (
            adopt_identity,
        )

        # a DFS checkpoint (hdfs:/s3a:/...) is only readable through
        # the Hadoop FS API, which needs an active JVM — spin up the
        # session for non-file URIs; plain paths and file: URIs
        # resolve locally without one
        if "://" in args.checkpoint_dir and not args.checkpoint_dir.startswith(
            "file:"
        ):
            from aichemy_data_pipelines_spark.session import get_spark

            get_spark(app_name="table-adopt-checkpoint")
        ident = adopt_identity(
            AtomicParquetTable(args.table_root), args.checkpoint_dir
        )
        print(json.dumps({"adopted_identity": ident}))
        # non-zero when nothing migrated: stamp already identity-
        # scoped, no stamp at all, or checkpoint metadata unreadable
        return 0 if ident is not None else 1

    if args.cmd == "corpus-build":
        from aichemy_data_pipelines_spark.pipeline.corpus_build import (
            CorpusBuildConfig,
            CorpusBuildPipeline,
        )

        pipe = CorpusBuildPipeline(
            spark,
            CorpusBuildConfig(
                sf_dir=args.sf_dir,
                output_dir=args.output_dir,
                n_shards=args.shards,
                full_audit=args.full_audit,
            ),
        )
        stats = pipe.build_once()
        print(json.dumps(stats))
        return 0

    if args.cmd == "corpus-ingest":
        from aichemy_data_pipelines_spark.pipeline.atomic import (
            AtomicParquetTable,
        )
        from aichemy_data_pipelines_spark.streaming.corpus_ingest import (
            stream_corpus_ingest,
        )

        stream_corpus_ingest(
            spark,
            args.src_dir,
            args.output_dir,
            args.checkpoint_dir,
            glob=args.glob,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        cur = AtomicParquetTable(
            os.path.join(args.output_dir, "curated.parquet")
        ).read(spark)
        n = 0 if cur is None else cur.count()
        print(json.dumps({"curated_docs": n}))
        return 0

    if args.cmd == "query":
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        if args.name not in qs:
            print(
                f"unknown query {args.name!r}; available: {sorted(qs)}",
                file=sys.stderr,
            )
            return 2
        try:
            qs[args.name](spark, args.sf_dir).show(
                args.limit, truncate=False
            )
        finally:
            # one-shot lifecycle: a query that cached a signature
            # frame (ann_knn_graph / dedup_embedding_cosine) must not
            # leave it persisted into whatever this process does next
            # — the CLI, unlike bench/driver, may rewrite tables
            # between operations (r15 ADVICE #1 drain hook)
            from aichemy_data_pipelines_spark.operators.similarity import (
                release_sig_frames,
            )

            release_sig_frames()
        return 0

    if args.cmd == "audit":
        # the ops one-shot: every cross-cutting data-health query in
        # one JSON document (the report a scheduler ships nightly).
        # Sections are aggregates; the driver materializes at most
        # max_rows (+1 to detect truncation) per section — no
        # corpus-sized collect.
        from pyspark.sql import functions as F

        from aichemy_data_pipelines_spark.operators.analytics_ext import (
            corpus_source_gini,
            events_kl_drift,
        )
        from aichemy_data_pipelines_spark.operators.quality_ops import (
            dq_orphan_check,
            dq_uniqueness,
        )

        # (section, query, sort keys) — sections are sorted BEFORE the
        # row cap so truncation is deterministic and keeps the most
        # relevant rows (e.g. the NEWEST drift days), never an
        # arbitrary task-order subset
        sections = {
            "uniqueness": (dq_uniqueness, [F.asc("table_name")]),
            "orphans": (dq_orphan_check, [F.asc("relationship")]),
            "value_drift": (events_kl_drift, [F.desc("day")]),
            "source_concentration": (
                corpus_source_gini,
                [F.asc("n_sources")],
            ),
        }
        report = {}
        for name, (fn, order) in sections.items():
            df = fn(spark, args.sf_dir).orderBy(*order)
            rows = df.limit(args.max_rows + 1).collect()
            truncated = len(rows) > args.max_rows
            report[name] = {
                "rows": [r.asDict() for r in rows[: args.max_rows]],
                "truncated": truncated,
            }
        print(json.dumps(report, default=str))
        return 0

    if args.cmd == "metrics":
        from aichemy_data_pipelines_spark.pipeline.metrics import PipelineMetrics

        if args.export_grafana:
            from aichemy_data_pipelines_spark.pipeline.grafana import (
                export_provisioning,
            )

            for path in export_provisioning(args.output_dir, args.export_grafana):
                print(f"wrote {path}")
        m = PipelineMetrics(spark, args.output_dir)
        print("== files converted (24h) ==")
        m.converted_last_24h().show()
        print("== avg conversion time ==")
        m.avg_conversion_seconds().show()
        print("== conversions per hour ==")
        m.conversions_per_hour().show(truncate=False)
        print("== recent cycles ==")
        m.recent_cycles().show(truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
