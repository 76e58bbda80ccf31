"""PySpark-native analytics + pipeline engine.

A from-scratch, Spark-first engine with the pipeline capabilities of
the reference Airflow repo (aichemy-hub/aichemy-data-pipelines — see
SURVEY.md §1) plus a full analytical / LLM-training-data operator
surface: relational queries, time-series windows, deduplication,
similarity search, text analysis, and multimodal column plumbing.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join planning, and AQE handles runtime re-planning; Python
UDFs appear only as Arrow-batched Pandas UDFs in the multimodal stubs.
"""

from aichemy_data_pipelines_spark.session import get_spark
from aichemy_data_pipelines_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]

__version__ = "0.1.0"
