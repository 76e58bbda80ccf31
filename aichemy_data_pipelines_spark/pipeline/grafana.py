"""Grafana provisioning export — the reference ships a concrete
dashboard + datasource provisioning tree
(grafana/provisioning/dashboards/msconvert.json, provider.yaml,
datasources/airflow.yaml); this module emits the same artifact for
the Spark pipeline, panel for panel, with the ledger parquet as the
backing store instead of Airflow's Postgres.

Panels (1:1 with the reference dashboard):

| Reference panel            | Here (SQL over ledger parquet)    |
| ---                        | ---                               |
| Files converted (24 h)     | stat: count ok in 24h             |
| Avg conversion time (min)  | stat: avg(duration_ms)/60000      |
| Conversions per hour       | timeseries: hourly ok counts      |
| Recent DAG runs            | table: cycles.jsonl tail          |
| Converted files            | table: ok rows, newest first      |

The emitted datasource is DuckDB (file-less, reading the parquet/
jsonl ledgers directly via read_parquet/read_json_auto) — the same
engine this repo's oracles use, so every panel query is CI-testable
without a Grafana instance (tests/test_metrics.py runs each rawSql).
"""

from __future__ import annotations

import json
import os

_DASH_UID = "aichemy-data-pipelines-spark"


def panel_sql(ledger_path: str, cycles_path: str) -> dict[str, str]:
    """The five panel queries, DuckDB dialect, macro-free so they run
    identically inside Grafana and in CI.

    Manifest-aware: a ledger written through pipeline/atomic.py
    resolves to exactly its committed data dirs (crashed-commit
    orphans invisible, same guarantee the Spark readers get); a plain
    parquet dir keeps the one-glob form. Regenerate the dashboard
    after commits (build_dashboard is cheap) or run vacuum so the
    on-disk globs match the manifest."""
    from aichemy_data_pipelines_spark.pipeline.atomic import (
        AtomicParquetTable,
    )

    live = AtomicParquetTable(ledger_path).current_dirs()
    if live:
        globs = ", ".join(f"'{d}/*.parquet'" for d in live)
        led = f"read_parquet([{globs}])"
    else:
        led = f"read_parquet('{ledger_path}/*.parquet')"
    return {
        "files_converted_24h": f"""
            SELECT COUNT(*) AS value FROM {led}
            WHERE status = 'ok'
              AND CAST(converted_at AS TIMESTAMP) > NOW() - INTERVAL 24 HOUR
        """,
        "avg_conversion_min": f"""
            SELECT ROUND(AVG(duration_ms) / 60000.0, 1) AS value
            FROM {led}
            WHERE status = 'ok'
              AND CAST(converted_at AS TIMESTAMP) > NOW() - INTERVAL 24 HOUR
        """,
        "conversions_per_hour": f"""
            SELECT date_trunc('hour', CAST(converted_at AS TIMESTAMP))
                     AS time,
                   COUNT(*) AS converted
            FROM {led} WHERE status = 'ok'
            GROUP BY 1 ORDER BY 1
        """,
        "recent_cycles": f"""
            SELECT cycle_ts AS "Cycle", verdict AS "Run Status",
                   total AS "Total", failed AS "Failed",
                   wall_ms / 1000.0 AS "Run Time"
            FROM read_json_auto('{cycles_path}')
            ORDER BY cycle_ts DESC LIMIT 20
        """,
        "converted_files": f"""
            SELECT converted_at AS "Converted At",
                   plate_rel || '/' || base AS "Run",
                   duration_ms AS "Duration (ms)"
            FROM {led} WHERE status = 'ok'
            ORDER BY converted_at DESC
        """,
    }


def build_dashboard(output_dir: str) -> dict:
    """Dashboard JSON mirroring the reference's msconvert.json panel
    set/layout (stat, stat, timeseries, table, table)."""
    ledger = os.path.join(output_dir, "_ledger.parquet")
    cycles = os.path.join(output_dir, "cycles.jsonl")
    sql = panel_sql(ledger, cycles)
    ds = {"type": "motherduck-duckdb-datasource", "uid": "pipeline-duckdb"}

    def target(key: str, fmt: str = "table") -> list[dict]:
        return [{"refId": "A", "rawSql": sql[key].strip(), "format": fmt}]

    panels = [
        {
            "id": 1,
            "title": "Files converted (24 h)",
            "type": "stat",
            "gridPos": {"h": 4, "w": 6, "x": 0, "y": 0},
            "datasource": ds,
            "targets": target("files_converted_24h"),
            "options": {
                "reduceOptions": {"calcs": ["lastNotNull"]},
                "colorMode": "background",
                "graphMode": "none",
            },
        },
        {
            "id": 2,
            "title": "Avg conversion time (min)",
            "type": "stat",
            "gridPos": {"h": 4, "w": 6, "x": 6, "y": 0},
            "datasource": ds,
            "targets": target("avg_conversion_min"),
            "options": {
                "reduceOptions": {"calcs": ["lastNotNull"]},
                "colorMode": "value",
                "graphMode": "none",
            },
        },
        {
            "id": 3,
            "title": "Conversions per hour",
            "type": "timeseries",
            "gridPos": {"h": 8, "w": 24, "x": 0, "y": 4},
            "datasource": ds,
            "targets": target("conversions_per_hour", "time_series"),
            "fieldConfig": {
                "defaults": {"custom": {"lineWidth": 2, "fillOpacity": 10}},
                "overrides": [],
            },
        },
        {
            "id": 4,
            "title": "Recent cycles",
            "type": "table",
            "gridPos": {"h": 8, "w": 12, "x": 0, "y": 12},
            "datasource": ds,
            "targets": target("recent_cycles"),
            "options": {
                "sortBy": [{"displayName": "Cycle", "desc": True}],
            },
            "fieldConfig": {
                "defaults": {},
                "overrides": [
                    {
                        "matcher": {"id": "byName", "options": "Run Status"},
                        "properties": [
                            {
                                "id": "mappings",
                                "value": [
                                    {
                                        "type": "value",
                                        "options": {
                                            "ok": {"color": "green", "index": 0},
                                            "failed": {
                                                "color": "red",
                                                "index": 1,
                                            },
                                        },
                                    }
                                ],
                            }
                        ],
                    }
                ],
            },
        },
        {
            "id": 5,
            "title": "Converted files",
            "type": "table",
            "gridPos": {"h": 8, "w": 12, "x": 12, "y": 12},
            "datasource": ds,
            "targets": target("converted_files"),
            "options": {
                "sortBy": [{"displayName": "Converted At", "desc": True}]
            },
        },
    ]
    return {
        "title": "aichemy-data-pipelines-spark Pipeline",
        "uid": _DASH_UID,
        "schemaVersion": 38,
        "version": 1,
        "refresh": "5m",
        "time": {"from": "now-24h", "to": "now"},
        "timezone": "browser",
        "tags": ["aichemy-data-pipelines-spark"],
        "panels": panels,
    }


def export_provisioning(output_dir: str, dest_dir: str) -> list[str]:
    """Write the full provisioning tree (dashboard JSON + provider +
    datasource YAML) under ``dest_dir``; returns written paths."""
    dash_dir = os.path.join(dest_dir, "dashboards")
    ds_dir = os.path.join(dest_dir, "datasources")
    os.makedirs(dash_dir, exist_ok=True)
    os.makedirs(ds_dir, exist_ok=True)

    dash_path = os.path.join(dash_dir, "aichemy_data_pipelines_spark.json")
    with open(dash_path, "w") as f:
        json.dump(build_dashboard(output_dir), f, indent=2)

    provider_path = os.path.join(dash_dir, "provider.yaml")
    with open(provider_path, "w") as f:
        f.write(
            "apiVersion: 1\n"
            "providers:\n"
            "  - name: aichemy-data-pipelines-spark\n"
            "    type: file\n"
            "    disableDeletion: false\n"
            "    updateIntervalSeconds: 30\n"
            "    allowUiUpdates: true\n"
            "    options:\n"
            "      path: /etc/grafana/provisioning/dashboards\n"
        )

    ds_path = os.path.join(ds_dir, "duckdb.yaml")
    with open(ds_path, "w") as f:
        f.write(
            "apiVersion: 1\n"
            "datasources:\n"
            "  - name: Pipeline DuckDB\n"
            "    uid: pipeline-duckdb\n"
            "    type: motherduck-duckdb-datasource\n"
            "    isDefault: true\n"
            "    editable: true\n"
            "    jsonData:\n"
            "      # file-less: panels read the ledger parquet directly\n"
            "      path: ':memory:'\n"
        )
    return [dash_path, provider_path, ds_path]
