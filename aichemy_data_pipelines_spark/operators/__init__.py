"""Operator suites. Each module exports

* ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
* ``ORACLE: dict[str, str]`` — DuckDB-SQL twins (subset of QUERIES;
  missing keys are rows-only checked by the driver).

``__spark_entry__.py`` merges them all.
"""
