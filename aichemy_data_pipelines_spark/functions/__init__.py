"""Shared expression helpers.

All helpers build JVM-side Catalyst expressions (``pyspark.sql
.functions`` / ``F.expr``) — no Python row UDFs — and each has an
exactly-equivalent ANSI-SQL form the DuckDB oracles use, so Spark and
the oracle compute bit-identical values.
"""
