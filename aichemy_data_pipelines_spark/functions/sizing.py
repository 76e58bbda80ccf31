"""Cluster/shuffle sizing calculator — the arithmetic behind the
session defaults, parameterized for real deployments.

The rules of thumb encoded here (standard Spark capacity planning):

* task input ≈ 128–256 MB compressed → bounded task count, good
  scan/IO overlap;
* shuffle partition target ≈ 150–200 MB of *shuffle* data so a
  partition sorts/aggregates in memory (no spill) within a few GB of
  executor heap per task slot;
* executors sized 4–5 cores each (HDFS client throughput sweet spot,
  bounded GC);
* AQE coalesces over-provisioned shuffle partitions at runtime, so
  we round UP — over-partitioning is cheap, under-partitioning
  spills.

Example: 100 TB scan with 30% shuffle selectivity →
``recommend_conf(100 * 1000 * GB)`` → 400k scan tasks (256 MB each),
160k shuffle partitions pre-AQE, and ~95 five-core executors (~475
cores) to finish a scan-bound stage in ~30 min at 120 MB/s/core.
Tighter SLAs or heavier CPU per row scale the executor count
linearly via ``target_stage_minutes`` / ``per_core_scan_mb_s``.
"""

from __future__ import annotations

from dataclasses import dataclass

MB = 1024 * 1024
GB = 1024 * MB


@dataclass
class SizingPlan:
    input_bytes: int
    scan_partition_bytes: int
    scan_tasks: int
    shuffle_bytes_est: int
    shuffle_partitions: int
    executors_recommended: int
    conf: dict


def recommend_conf(
    input_bytes: int,
    shuffle_fraction: float = 0.3,
    target_scan_partition_mb: int = 256,
    target_shuffle_partition_mb: int = 192,
    executor_cores: int = 5,
    target_stage_minutes: float = 30.0,
    per_core_scan_mb_s: float = 120.0,
) -> SizingPlan:
    """Compute partition counts + a spark conf dict for a given input
    size. Pure arithmetic — unit-tested, no Spark required."""
    if input_bytes <= 0:
        raise ValueError("input_bytes must be positive")
    scan_pb = target_scan_partition_mb * MB
    scan_tasks = max(1, -(-input_bytes // scan_pb))
    shuffle_bytes = int(input_bytes * shuffle_fraction)
    shuffle_parts = max(
        1, -(-shuffle_bytes // (target_shuffle_partition_mb * MB))
    )
    # cores needed to scan input in target_stage_minutes
    need_core_seconds = input_bytes / (per_core_scan_mb_s * MB)
    cores = max(
        executor_cores,
        int(need_core_seconds / (target_stage_minutes * 60)) + 1,
    )
    executors = -(-cores // executor_cores)
    conf = {
        "spark.sql.files.maxPartitionBytes": str(scan_pb),
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.executor.cores": str(executor_cores),
        # 4 GB heap per task slot keeps a 192 MB shuffle partition
        # (x2-3 dedup/serde overhead) comfortably in memory
        "spark.executor.memory": f"{4 * executor_cores}g",
    }
    return SizingPlan(
        input_bytes=input_bytes,
        scan_partition_bytes=scan_pb,
        scan_tasks=scan_tasks,
        shuffle_bytes_est=shuffle_bytes,
        shuffle_partitions=shuffle_parts,
        executors_recommended=executors,
        conf=conf,
    )
