"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` merge the per-module suites under
``aichemy_data_pipelines_spark.operators`` (see SURVEY.md §2 for the
inventory). ``entry`` runs the flagship Q3-style query at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aichemy_data_pipelines_spark.operators.tpch import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def _suites():
    from aichemy_data_pipelines_spark.operators import tpch

    modules = [tpch]
    try:
        from aichemy_data_pipelines_spark.operators import timeseries

        modules.append(timeseries)
    except ImportError:
        pass
    for name in ("dedup", "similarity", "textops", "relational_ext", "clustering", "streaming_ops", "analytics_ext", "quality_ops", "sampling_ops", "ivf", "approx_ops", "corpus_ops", "vector_ops", "pii_ops", "pq", "sketch_ops", "substring_dedup", "ivfpq", "insights_ops", "export_ops", "ml_ops"):
        try:
            mod = __import__(
                f"aichemy_data_pipelines_spark.operators.{name}", fromlist=[name]
            )
            modules.append(mod)
        except ImportError:
            pass
    try:
        from aichemy_data_pipelines_spark.operators import pipeline_ops

        modules.append(pipeline_ops)
    except ImportError:
        pass
    try:
        from aichemy_data_pipelines_spark.operators import multimodal_ops

        modules.append(multimodal_ops)
    except ImportError:
        pass
    return modules


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _suites():
        merged.update(mod.QUERIES)
    return merged


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _suites():
        merged.update(mod.ORACLE)
    return merged
