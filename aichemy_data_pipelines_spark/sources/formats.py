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


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Opaque-binary ingestion via Spark's ``binaryFile`` source —
    the entry point for multimodal corpora (images/audio/video land
    as files; this turns a directory into a DataFrame of
    (path, modificationTime, length, content) with content as a
    `binary` column ready for multimodal/codecs.py's `mapInPandas`
    decode stage).

    Scale: listing is distributed and incremental-friendly (pair with
    the streaming file source in streaming/watch.py for tailing);
    pushdown on path/length happens BEFORE content is read, so a
    `length < N` guard never fetches oversized payloads. Binary
    content is never parsed JVM-side — it flows straight to Arrow.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def write_sorted_layout(
    df: DataFrame,
    dest_path: str,
    sort_col: str,
    n_files: int,
) -> None:
    """Range-partitioned, sorted-within-file parquet layout — the
    data-skipping write path (1-D Z-order).

    ``repartitionByRange`` gives each output file a disjoint value
    range of *sort_col* (sampled range boundaries, so skew in the
    sort key still yields balanced files); ``sortWithinPartitions``
    then makes every parquet row group's min/max tight. A later scan
    with a predicate on *sort_col* prunes to the one file + row group
    that can contain it — at 100 TB the difference between a full
    scan and reading one footer. The disjoint-ranges property is
    asserted from the parquet footers in tests/test_sources.py.
    """
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(dest_path)
    )


def with_morton_z(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    z_col: str = "_z",
) -> DataFrame:
    """Add a 2-D Z-order (Morton) key column: interleave the bits of
    the two normalized sort keys so rows close in ``z_col`` are close
    in BOTH value dimensions.

    Normalization maps each key to a ``bits``-bit grid via global
    min/max (two bounded scalars, collected once — NOTE this is an
    extra evaluation of the input plan before the caller's write;
    persist/localCheckpoint upstream if the input is expensive).
    The Morton code is a pure-JVM bit-interleave expression inside
    codegen.  Shared by :func:`write_zorder_layout` and the
    curated-corpus snapshot layout (pipeline/corpus_build.py).
    An empty input gets a constant z key (nothing to order).
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.selectExpr(
        f"min({col_a})", f"max({col_a})", f"min({col_b})", f"max({col_b})"
    ).first()
    if lo_a is None or lo_b is None:
        return df.withColumn(z_col, F.lit(0).cast("bigint"))
    gmax = (1 << bits) - 1

    def grid(col: str, lo: float, hi: float) -> str:
        span = max(hi - lo, 1)
        return (
            f"cast(floor((cast({col} as double) - {lo}) * {gmax} / {span}) "
            f"as bigint)"
        )

    ga, gb = grid(col_a, lo_a, hi_a), grid(col_b, lo_b, hi_b)
    morton = " + ".join(
        f"(((_ga >> {i}) & 1) << {2 * i}) + (((_gb >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return (
        df.withColumn("_ga", F.expr(ga))
        .withColumn("_gb", F.expr(gb))
        .withColumn(z_col, F.expr(morton))
        .drop("_ga", "_gb")
    )


def write_zorder_layout(
    df: DataFrame,
    dest_path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """2-D Z-order (Morton) parquet layout: each output file covers a
    compact RECTANGLE of the (a, b) value space — min/max skipping
    then works for predicates on EITHER column, where a plain 1-D
    sort only skips on its lead column.  The bounding-box tightening
    vs a round-robin layout is asserted from parquet footers in
    tests/test_sources.py.
    """
    from pyspark.sql import functions as F

    (
        with_morton_z(df, col_a, col_b, bits)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(dest_path)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_mb: int = 256,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_file_mb) files.

    The small-files problem is THE silent killer of streaming /
    incremental sinks at scale (a 5-minute micro-batch cadence writes
    ~100k files/year per partition; every downstream scan pays
    per-file open + footer costs and the namenode pays the metadata).
    Periodic compaction keeps file count ∝ data size.

    Listing goes through the Hadoop FileSystem API (the same listing
    a scan performs), so the op works unchanged on HDFS/S3A; the
    rewrite is one round-robin repartition — no key shuffle.

    Returns {files_before, bytes_before, files_after, rows}.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    files_before = 0
    bytes_before = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            files_before += 1
            bytes_before += st.getLen()
    n_out = max(1, -(-bytes_before // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.repartition(n_out).write.mode("overwrite").parquet(dest_path)
    rows = spark.read.parquet(dest_path).count()
    return {
        "files_before": files_before,
        "bytes_before": bytes_before,
        "files_after": n_out,
        "rows": rows,
    }
