"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]``; the conf is chosen so the same code
is correct on a 1000-executor cluster: AQE enabled (runtime coalesce,
skew-join splitting), Arrow for any Pandas-UDF exchange, broadcast
threshold high enough that every dimension table in the star schema
broadcasts, and shuffle partitions sized via env for the tested SF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aichemy-data-pipelines-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Env overrides: ``SPARK_GRAFT_CPUS`` (local parallelism),
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # plan re-optimization from shuffle statistics. At 100 TB this
        # is what absorbs key skew and mis-sized shuffles.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Dimension tables (region/nation/supplier/part/customer at
        # bench SF) must broadcast; 64 MB covers them while leaving
        # fact-fact joins as sort-merge.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow transfer for the (rare) Pandas-UDF paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Read-side split sizing: at 100 TB this bounds task count;
        # 128 MB splits -> ~800k tasks, fine for a 1000-executor fleet.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Deterministic session timezone so timestamp math matches the
        # DuckDB oracle regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
