"""Portable hashing: identical values in Spark and DuckDB.

Spark's native ``hash``/``xxhash64`` have no DuckDB twin, so every
hash that feeds a correctness-checked operator derives from ``md5``
(identical hex output everywhere):

* ``portable_hash64``: first 15 hex chars of md5 → BIGINT (60 bits,
  always positive, fits in int64). Spark: ``conv(substr(md5(x),1,15),
  16,10)``; DuckDB: ``('0x' || substr(md5(x),1,15))::BIGINT``.
* seeded variants prefix the input with ``'<seed>:'`` — this is how
  minhash gets k independent hash functions without k hash algorithms.

Scale: md5 is a JVM intrinsic inside whole-stage codegen; for
100 TB-scale internal-only hashing (no oracle), swap in ``xxhash64``
via ``fast=True`` — same call sites, ~3x cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def spark_hash64(expr: str, seed: int | None = None, fast: bool = False) -> str:
    """SQL fragment (Spark dialect) hashing *expr* to a BIGINT."""
    if fast:
        return f"xxhash64({expr})" if seed is None else f"xxhash64({seed}, {expr})"
    inner = expr if seed is None else f"concat('{seed}:', {expr})"
    return f"cast(conv(substr(md5({inner}),1,15),16,10) as bigint)"


def hash64(expr: str, seed: int | None = None, alias: str | None = None) -> Column:
    col = F.expr(spark_hash64(expr, seed))
    return col.alias(alias) if alias else col


def sql_hash64(expr: str, seed: int | None = None) -> str:
    """DuckDB twin of :func:`spark_hash64` (portable mode)."""
    inner = expr if seed is None else f"concat('{seed}:', {expr})"
    return f"('0x' || substr(md5({inner}),1,15))::BIGINT"


def spark_hash_hex(expr: str, seed: int) -> str:
    """Seeded md5 hex digest (string ordering = unsigned ordering).

    Minhash needs only a uniform hash with a total order, so the
    lexicographic MIN of seeded md5 hex digests is a valid minhash
    and is engine-portable with zero numeric conversion.
    """
    return f"md5(concat('{seed}:', {expr}))"


def sql_hash_hex(expr: str, seed: int) -> str:
    return f"md5(concat('{seed}:', {expr}))"
