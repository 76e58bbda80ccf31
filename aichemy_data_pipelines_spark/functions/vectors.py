"""Vector math over ``array<float>`` columns — pure Catalyst.

Dot product / norms / cosine via ``zip_with`` + ``aggregate`` higher-
order functions: JVM-evaluated per row, no Python, no UDF. DuckDB
twins use ``list_dot_product`` / ``list_cosine_similarity``.

Scale: per-row O(dim) JVM work inside codegen; for brute-force top-k
the cost driver is the pair join, not this arithmetic (see
operators/similarity.py for the LSH-bucketed scale path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def spark_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"0D, (acc, v) -> acc + v)"
    )


def spark_norm(a: str) -> str:
    return f"sqrt({spark_dot(a, a)})"


def spark_cosine(a: str, b: str) -> str:
    return f"({spark_dot(a, b)} / ({spark_norm(a)} * {spark_norm(b)}))"


def dot(a: str, b: str, alias: str | None = None) -> Column:
    col = F.expr(spark_dot(a, b))
    return col.alias(alias) if alias else col


def cosine(a: str, b: str, alias: str | None = None) -> Column:
    col = F.expr(spark_cosine(a, b))
    return col.alias(alias) if alias else col


# -- Exact (oracle-comparable) variants -------------------------------
#
# float * float widened to double is EXACT (24+24 mantissa bits < 53),
# so only the summation ORDER introduces engine-dependent rounding.
# Accumulating at DECIMAL(37,24) — each '+' widens (37,24)+(37,24) →
# (38,24) with no rounding, see spark_dot_exact — is exact and
# order-independent up to |partial sum| < 10^13 (tested headroom:
# tests/test_properties.py::test_exact_dot_headroom); the final cast
# to double is one deterministic rounding. Both engines therefore
# produce bit-identical cosines.

_DECV = "decimal(18,12)"


def spark_dot_exact(a: str, b: str) -> str:
    # Two subtleties: (1) the accumulator and merge re-cast sit at
    # decimal(37,24) — the element-product type — because Spark's
    # decimal '+' of (37,24)+(37,24) widens to (38,24) with NO
    # rounding; a (38,24) accumulator instead widens (38,24)+(37,24)
    # to (38,23), rounding every partial sum at scale 23 before the
    # merge re-cast can run (≈5e-24 absolute drift per fold step —
    # ~6,300 ulps on tiny inputs like [2**-24]). (2) floats widen to
    # double BEFORE the decimal cast — Spark's float→decimal goes
    # through the float's 7-digit shortest string repr, which loses
    # the low bits DuckDB's numeric conversion keeps.
    # With the (37,24) accumulator the fold keeps scale 24 at every
    # step and is bit-equal to DuckDB's SUM(DECIMAL(36,24)); headroom
    # |partial sum| < 10^13 covers every consumer (unit-norm-ish
    # embeddings: |dot| <= dim * max|x|^2, e.g. dim 4096 at |x| <= 10^4
    # is 4*10^11). Beyond it Spark fails LOUD — ANSI (the session
    # default) raises NUMERIC_VALUE_OUT_OF_RANGE, non-ANSI yields NULL
    # — never a silently wrong value, while DuckDB's (38,24) SUM keeps
    # one more decade (pinned: tests/test_properties.py::
    # test_exact_dot_headroom). The final double
    # conversion is one deterministic rounding shared by both
    # engines, so consumers may still round derived quantities (e.g.
    # cosine to 8dp) defensively. A mid-pipeline decimal rescale is
    # NOT portable: DuckDB truncates, Spark rounds.
    return (
        f"cast(aggregate(zip_with({a}, {b}, "
        f"(x, y) -> cast(cast(x as double) as {_DECV}) "
        f"* cast(cast(y as double) as {_DECV})), "
        f"cast(0 as decimal(37,24)), "
        f"(acc, v) -> cast(acc + v as decimal(37,24))) as double)"
    )


def spark_cosine_exact(a: str, b: str) -> str:
    return (
        f"({spark_dot_exact(a, b)} / "
        f"(sqrt({spark_dot_exact(a, a)}) * sqrt({spark_dot_exact(b, b)})))"
    )


def sql_dot_exact(a_val: str, b_val: str) -> str:
    """DuckDB aggregate fragment over zipped-unnest element columns.

    The inner CAST TO DOUBLE mirrors Spark AND dodges DuckDB's
    float→decimal cast, which scales in float precision and corrupts
    digits past the 7th.
    """
    return (
        f"CAST(SUM(CAST(CAST({a_val} AS DOUBLE) AS DECIMAL(18,12)) * "
        f"CAST(CAST({b_val} AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)"
    )
