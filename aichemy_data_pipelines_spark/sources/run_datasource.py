"""Python Data Source (Spark 4 `pyspark.sql.datasource` API) for
run-directory discovery — `spark.read.format("msruns")`.

The watch-tree layout (= reference msconvert_dag.py:176-221 discovery:
``watch_dir/<plate>/<run>.d/<files>``) is normally discovered here via
a ``binaryFile`` scan + run-level aggregation
(pipeline/batch.py:discover). That is one flat driver-side file
listing; at tens of millions of files the LISTING itself becomes the
bottleneck. This source moves listing onto the executors:

* ``partitions()`` — the driver lists only the top-level plate
  directories (thousands, not millions);
* ``read(partition)`` — each task walks ONE plate subtree and emits
  already-aggregated run rows (run_dir, base, plate_rel, n_files,
  total_bytes, newest_mtime_ms) — the exact schema
  ``WatchConvertPipeline.discover`` produces pre-ledger-filter, so
  the two are interchangeable (equality-tested).

This is the standard "parallel manifest listing" trick of large-scale
table formats, expressed through Spark's public Python Data Source
API. On cloud storage, ``os.scandir`` becomes an object-store LIST
with the plate as the prefix; the shape is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

RUN_SCHEMA = (
    "run_dir string, base string, plate_rel string, "
    "n_files int, total_bytes long, newest_mtime_ms long"
)


class PlatePartition(InputPartition):
    def __init__(self, plate_dir: str, plate_rel: str):
        self.plate_dir = plate_dir
        self.plate_rel = plate_rel


class RunDiscoveryReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("msruns source requires .option('path', ...)")
        self.suffix = options.get("suffix", ".d")

    def partitions(self):
        parts = []
        for entry in sorted(os.scandir(self.path), key=lambda e: e.name):
            if entry.is_dir():
                parts.append(PlatePartition(entry.path, entry.name))
        # empty tree: one no-op partition (the API requires >=1)
        return parts or [PlatePartition(self.path, "")]

    def read(self, partition: PlatePartition):
        if not partition.plate_rel and not os.path.isdir(partition.plate_dir):
            return
        for entry in sorted(
            os.scandir(partition.plate_dir), key=lambda e: e.name
        ):
            if not (entry.is_dir() and entry.name.endswith(self.suffix)):
                continue
            n_files = 0
            total = 0
            newest = 0
            for root, _dirs, files in os.walk(entry.path):
                for fn in files:
                    st = os.stat(os.path.join(root, fn))
                    n_files += 1
                    total += st.st_size
                    newest = max(newest, int(st.st_mtime * 1000))
            if n_files == 0:
                continue
            base = entry.name[: -len(self.suffix)]
            yield (
                entry.path,
                base,
                partition.plate_rel,
                n_files,
                total,
                newest,
            )


class RunDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "msruns"

    def schema(self) -> str:
        return RUN_SCHEMA

    def reader(self, schema) -> RunDiscoveryReader:
        return RunDiscoveryReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(RunDataSource)
