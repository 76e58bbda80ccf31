"""Pipeline observability — the reference's Grafana dashboard
(grafana/provisioning/dashboards/msconvert.json) re-expressed as
DataFrame queries over the pipeline's own ledgers:

| Reference panel            | Here                         |
| ---                        | ---                          |
| Files converted (24 h)     | ``converted_last_24h``       |
| Avg conversion time (min)  | ``avg_conversion_seconds``   |
| Conversions per hour       | ``conversions_per_hour``     |
| Recent DAG runs            | ``recent_cycles``            |
| Converted files            | ``converted_files``          |

The reference queries Airflow's Postgres; here the source of truth
is the conversion ledger parquet the pipeline already writes (plus a
per-cycle stats log). Point any BI tool at those parquet paths.

Scale: ledgers are bounded by backlog, not corpus; every metric is a
single filtered agg.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PipelineMetrics:
    def __init__(self, spark: SparkSession, output_dir: str):
        self.spark = spark
        self.ledger_path = os.path.join(output_dir, "_ledger.parquet")
        # no leading underscore: Spark's file listing treats _-prefixed
        # paths as hidden metadata and refuses to read them
        self.cycles_path = os.path.join(output_dir, "cycles.jsonl")

    # -- recording ---------------------------------------------------------
    def record_cycle(self, stats: dict, wall_ms: int) -> None:
        """Append one cycle's stats (driver-side, tiny)."""
        row = dict(stats)
        row["wall_ms"] = wall_ms
        row["cycle_ts"] = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.gmtime()
        )
        with open(self.cycles_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # -- ledger-backed panels ---------------------------------------------
    def _ledger(self) -> DataFrame:
        from aichemy_data_pipelines_spark.pipeline.atomic import (
            AtomicParquetTable,
        )

        # manifest-aware read (only committed data dirs); fall back to
        # a plain parquet read for pre-manifest ledger layouts
        df = AtomicParquetTable(self.ledger_path).read(self.spark)
        if df is not None:
            return df
        return self.spark.read.parquet(self.ledger_path)

    def converted_last_24h(self, now: str | None = None) -> DataFrame:
        led = self._ledger().where(F.col("status") == "ok")
        now_expr = F.lit(now).cast("timestamp") if now else F.current_timestamp()
        return led.where(
            F.col("converted_at").cast("timestamp")
            >= now_expr - F.expr("INTERVAL 24 HOURS")
        ).agg(F.count("*").alias("files_converted_24h"))

    def avg_conversion_seconds(self) -> DataFrame:
        return (
            self._ledger()
            .where(F.col("status") == "ok")
            .agg(
                (F.avg("duration_ms") / 1000.0).alias("avg_conversion_sec"),
                F.count("*").alias("n"),
            )
        )

    def conversions_per_hour(self) -> DataFrame:
        return (
            self._ledger()
            .where(F.col("status") == "ok")
            .groupBy(
                F.date_format(
                    F.date_trunc("hour", F.col("converted_at").cast("timestamp")),
                    "yyyy-MM-dd HH:00:00",
                ).alias("hour")
            )
            .agg(F.count("*").alias("n_converted"))
        )

    def recent_cycles(self, n: int = 20) -> DataFrame:
        if not os.path.exists(self.cycles_path):
            return self.spark.createDataFrame(
                [], "cycle_ts string, total long, failed long, wall_ms long"
            )
        df = self.spark.read.json(self.cycles_path)
        return df.orderBy(F.desc("cycle_ts")).limit(n)

    def converted_files(self) -> DataFrame:
        return (
            self._ledger()
            .where(F.col("status") == "ok")
            .select("plate_rel", "base", "converted_at", "duration_ms")
            .orderBy(F.desc("converted_at"), "base")
        )
