"""Observability parity: the reference Grafana panels computed from
the pipeline's own ledgers."""

from __future__ import annotations

import os

from aichemy_data_pipelines_spark.pipeline.batch import (
    PipelineConfig,
    WatchConvertPipeline,
)
from aichemy_data_pipelines_spark.pipeline.metrics import PipelineMetrics
from tests.test_pipeline import make_tree


def _run_pipeline(spark, tmp_path):
    watch = str(tmp_path / "watch")
    make_tree(
        watch,
        {"p1": {"r1": {"a.bin": b"one"}, "r2": {"b.bin": b"two"}}},
    )
    cfg = PipelineConfig(
        watch_dir=watch,
        output_dir=str(tmp_path / "out"),
        archive_dir=str(tmp_path / "arc"),
        quiet_seconds=0,
    )
    pipe = WatchConvertPipeline(spark, cfg)
    pipe.run_once()
    return pipe


def test_dashboard_panels(spark, tmp_path):
    pipe = _run_pipeline(spark, tmp_path)
    m = PipelineMetrics(spark, pipe.cfg.output_dir)

    assert (
        m.converted_last_24h().collect()[0].files_converted_24h == 2
    )
    avg = m.avg_conversion_seconds().collect()[0]
    assert avg.n == 2 and avg.avg_conversion_sec >= 0
    per_hour = m.conversions_per_hour().collect()
    assert sum(r.n_converted for r in per_hour) == 2
    files = m.converted_files().collect()
    assert sorted(r.base for r in files) == ["r1", "r2"]
    cycles = m.recent_cycles().collect()
    assert len(cycles) == 1 and cycles[0].total == 2


def test_cycle_log_accumulates_and_records_failures(spark, tmp_path):
    import pytest

    pipe = _run_pipeline(spark, tmp_path)
    make_tree(pipe.cfg.watch_dir, {"p1": {"bad": {"x.bin": b"CORRUPT"}}})
    with pytest.raises(RuntimeError):
        pipe.run_once()
    m = PipelineMetrics(spark, pipe.cfg.output_dir)
    cycles = m.recent_cycles().collect()
    assert len(cycles) == 2
    assert any(r.verdict == "failed" for r in cycles)


def test_cli_watch_and_metrics(spark, tmp_path, capsys):
    from aichemy_data_pipelines_spark.cli import main

    watch = str(tmp_path / "watch")
    make_tree(watch, {"p": {"runx": {"f.bin": b"data"}}})
    rc = main(
        [
            "watch",
            "--watch-dir", watch,
            "--output-dir", str(tmp_path / "out"),
            "--archive-dir", str(tmp_path / "arc"),
        ]
    )
    assert rc == 0
    assert "'succeeded': 1" in capsys.readouterr().out
    rc = main(["metrics", "--output-dir", str(tmp_path / "out")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "files converted (24h)" in out

    assert main(["query", "nope"]) == 2
    assert (
        main(["query", "q6_revenue_forecast", "--sf-dir", "/root/testdata/sf0.001"])
        == 0
    )


def test_grafana_export_panels_executable(spark, tmp_path):
    """The exported provisioning tree mirrors the reference's
    (dashboard JSON + provider.yaml + datasource yaml), and every
    panel's rawSql actually executes in DuckDB against the live
    ledger — a dashboard that can't query is not parity."""
    import json

    import duckdb

    from aichemy_data_pipelines_spark.pipeline.grafana import (
        export_provisioning,
        panel_sql,
    )

    pipe = _run_pipeline(spark, tmp_path)
    dest = str(tmp_path / "grafana")
    paths = export_provisioning(pipe.cfg.output_dir, dest)
    assert [os.path.basename(p) for p in paths] == [
        "aichemy_data_pipelines_spark.json",
        "provider.yaml",
        "duckdb.yaml",
    ]
    dash = json.load(open(paths[0]))
    assert dash["uid"] and len(dash["panels"]) == 5
    titles = [p["title"] for p in dash["panels"]]
    assert "Files converted (24 h)" in titles
    assert "Conversions per hour" in titles

    con = duckdb.connect()
    for panel in dash["panels"]:
        for t in panel["targets"]:
            rows = con.sql(t["rawSql"]).fetchall()
            assert rows is not None
    # sanity: the stat panel counts this run's 2 conversions
    sqls = panel_sql(
        os.path.join(pipe.cfg.output_dir, "_ledger.parquet"),
        os.path.join(pipe.cfg.output_dir, "cycles.jsonl"),
    )
    assert con.sql(sqls["files_converted_24h"]).fetchall()[0][0] == 2


def test_cli_exports_grafana(spark, tmp_path, capsys):
    from aichemy_data_pipelines_spark.cli import main

    pipe = _run_pipeline(spark, tmp_path)
    rc = main(
        [
            "metrics",
            "--output-dir", pipe.cfg.output_dir,
            "--export-grafana", str(tmp_path / "g"),
        ]
    )
    assert rc == 0
    assert os.path.exists(
        tmp_path / "g" / "dashboards" / "aichemy_data_pipelines_spark.json"
    )
