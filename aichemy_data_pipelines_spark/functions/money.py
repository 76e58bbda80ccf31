"""Decimal-exact money arithmetic.

Floating-point SUM over a shuffled dataset is order-dependent, so a
Spark result and a DuckDB oracle can differ in the last ulp — enough
to break value-hash comparison, and enough to make benchmarks
non-reproducible run to run. Every money aggregate therefore:

1. casts operands to ``DECIMAL(18,6)`` (exact for 2-decimal synthetic
   prices and 2-decimal discounts),
2. multiplies/sums in decimal (exact, order-independent),
3. casts the final aggregate back to ``DOUBLE`` (deterministic).

Ratios/averages divide two already-exact doubles, which is a single
deterministic FP op in both engines.

Scale: decimal aggregation is still whole-stage-codegen'd JVM work
with map-side partial aggregation; cost is ~2x a double sum and
independent of cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Narrow on purpose: Spark decimals with precision ≤ 18 use the
#: compact long representation inside codegen (no BigDecimal per
#: row), which measures ~2x faster on money-heavy aggregates.
#: DOMAIN ASSUMPTION (checked against the data): money amounts are
#: 2-decimal and |x| < 10^6; rates (1 ± pct) are 2-decimal and < 100.
#: The oracle side may use wider decimals — the VALUES are identical
#: because both casts are exact for in-domain inputs; only the
#: runtime representation differs.
DEC = "decimal(8,2)"
RATE = "decimal(4,2)"


def dec(expr: str) -> str:
    """SQL fragment casting *expr* to the exact money decimal type."""
    return f"cast({expr} as {DEC})"


def rate(expr: str) -> str:
    """SQL fragment for (1 ± small-pct) factors; keeps products like
    price × rate × rate at precision ≤ 18 (compact-long decimals)."""
    return f"cast({expr} as {RATE})"


def sum_to_double(sum_expr: str) -> str:
    """Decimal aggregate → double, identically in any engine.

    The inner rescale to scale 6 is EXACT for our money expressions
    (2-decimal operands → ≤6 fractional decimal digits in any
    sum-of-products), and it keeps the decimal's integer mantissa
    below 2^53 so the final double conversion is correctly rounded in
    both Spark (BigDecimal.doubleValue) and DuckDB (mantissa/10^scale
    with both operands FP-exact). Casting a scale-12 decimal straight
    to double is NOT portable — the >2^53 mantissa rounds differently.
    """
    return f"cast(cast({sum_expr} as decimal(38,6)) as double)"


def money_sum(expr: str, alias: str) -> Column:
    """Exact SUM of a money expression → double.

    *expr* is a SQL fragment over already-decimal operands, e.g.
    ``money_sum(f"{dec('l_extendedprice')} * {dec('1 - l_discount')}",
    "revenue")``.
    """
    return F.expr(sum_to_double(f"sum({expr})")).alias(alias)


def money_avg(expr: str, alias: str) -> Column:
    """Exact-sum average: exact double sum / count (one FP divide)."""
    return F.expr(
        f"{sum_to_double(f'sum({expr})')} / count({expr})"
    ).alias(alias)


def sql_money_sum(expr: str) -> str:
    """DuckDB-side twin of :func:`money_sum`."""
    return f"CAST(CAST(SUM({expr}) AS DECIMAL(38,6)) AS DOUBLE)"


def sql_money_avg(expr: str) -> str:
    """DuckDB-side twin of :func:`money_avg`."""
    return f"{sql_money_sum(expr)} / COUNT({expr})"
