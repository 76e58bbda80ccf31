"""Format readers/writers and bucketed-table helpers.

Reference parity: the reference's I/O surface is directory-watching
input + mzML/tar outputs with atomic renames and skip/replace
policies (msconvert_dag.py). The generic engine needs the standard
lake surface instead: schema-explicit CSV/JSON/parquet readers,
partitioned parquet sinks with write policies, and bucketed tables
for co-located (shuffle-free) fact-fact joins.

Scale:
* ``write_partitioned`` — partition columns become directory pruning
  at read time (partition filters never touch data files).
* ``write_bucketed`` / ``bucketed_join`` — pre-shuffling both fact
  tables into the same bucket layout turns every future equi-join on
  the bucket key into a zero-exchange zip join; at 100 TB this is the
  difference between an hourly join re-shuffling 100 TB and reading
  co-located buckets. The no-Exchange property is asserted in
  tests/test_sources.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    """Schema-explicit CSV read (never inferSchema: inference costs a
    full extra pass and types drift between runs)."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options
) -> DataFrame:
    """Schema-explicit JSON-lines read."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partitioned sink. With ``mode='overwrite'`` and dynamic
    partition overwrite, only the partitions present in ``df`` are
    replaced — the lake-safe incremental upsert for append-mostly
    pipelines (the batch analog of the reference's replace policy).
    """
    (
        df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
    )
    df.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planned with
    ZERO Exchange (asserted in tests): the shuffle was paid once at
    write time and amortizes over every subsequent join."""
    return spark.table(left_table).join(spark.table(right_table), on)
