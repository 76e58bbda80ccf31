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
    """
    if salt_src is None:
        salt_src = F.xxhash64(*[F.col(c) for c in left.columns])
    lsalted = left.withColumn("_salt", F.pmod(salt_src, F.lit(n_salt)))
    rrep = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = lsalted.join(rrep, [on, "_salt"], how)
    return out.drop("_salt")
