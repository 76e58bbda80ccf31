"""Skew mitigation: salted joins.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit
fallback for the pathological case AQE can't fix: ONE join key so
hot that even a split partition's build side overflows.

``salted_join(left, right, key, n_salt)``:
* left rows get a deterministic salt in [0, n_salt) derived from
  xxhash64 of the whole row's key + a uniqueizer column;
* right rows are replicated n_salt times (explode over the salt
  range);
* the join key becomes (key, salt) — the hot key's rows spread over
  n_salt partitions.

Results are exactly equal to the plain join (asserted in
tests/test_skew.py); cost is n_salt× replication of the right side,
so use it left=fact / right=dim-with-hot-key.

Supported join types: inner / left / left_semi / left_anti only.
Because the RIGHT side is replicated n_salt times, a right or full
outer join would emit every unmatched right row n_salt times — a
silent divergence from the plain join — so those types raise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    salt_src: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right
    side replicated. ``salt_src`` defaults to a hash of all left
    columns (deterministic; pass an id column for cheaper salting).

    Raises ``ValueError`` for right/full outer joins: unmatched right
    rows would appear once per salt replica, diverging from the plain
    join. Salt the other side (swap the inputs) instead.
    """
    allowed = {
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not supported — the replicated "
            "right side would duplicate unmatched right rows. Supported: "
            "inner, left, left_semi, left_anti (swap inputs to salt the "
            "other side)."
        )
    if salt_src is None:
        salt_src = F.xxhash64(*[F.col(c) for c in left.columns])
    lsalted = left.withColumn("_salt", F.pmod(salt_src, F.lit(n_salt)))
    rrep = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = lsalted.join(rrep, [on, "_salt"], how)
    return out.drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Skew-safe EXACT count-distinct: two-phase aggregation where the
    salt is a hash of the DISTINCT column, so each salt bucket owns a
    disjoint slice of the distinct space and the per-bucket distinct
    counts sum exactly (no over-counting — unlike salting by row).

    This is the explicit fix for the aggregation AQE can't split: a
    hot group's distinct-set state lives on one task in the plain
    plan; here it spreads over n_salt tasks, each holding 1/n_salt of
    the hash space.

    Returns (group_col, n_distinct, n_rows).
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salt))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(group_col, "_salt")
        .agg(
            F.countDistinct(distinct_col).alias("_pd"),
            F.count("*").alias("_pc"),
        )
    )
    return partial.groupBy(group_col).agg(
        F.sum("_pd").alias("n_distinct"),
        F.sum("_pc").alias("n_rows"),
    )
