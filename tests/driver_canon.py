"""Replica of the DRIVER's result canonicalizer.

The driver compares each ``queries()`` entry against its
``oracle_sql()`` twin at sf0.01 by (1) selecting columns sorted by
name, (2) ``pandas.DataFrame.sort_values`` over ALL columns, and
(3) a dtype-sensitive value hash.  Round 4 proved the local parity
gate (tests/test_oracle_parity.py) is value-faithful but not
*representation*-faithful to that pipeline: six locally-green queries
shipped red because

- DuckDB's uncast ``SUM``/``//`` returns HUGEINT (int128), which
  lands in pandas as *object* dtype while Spark emits int64 — values
  identical, dtype hash different;
- ``array<int>`` output columns crash ``sort_values``
  (``TypeError: unhashable type: 'list'``).

This module reproduces both failure modes exactly so they are caught
before the driver sees them.  ``canon`` mirrors the driver's
sort-for-comparison step (including the list-column crash);
``rep`` builds a dtype-tagged representation in which int64,
float64, and object-of-Python-int columns are all DISTINCT even when
their values compare equal.
"""

from __future__ import annotations

import pandas as pd


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization: columns sorted by name, rows
    sorted by every column.  Raises TypeError on list-valued columns,
    exactly like the driver's ``_canon`` did in CORRECTNESS_r04."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))
    return pdf.reset_index(drop=True)


def _cell(kind: str, v):
    if v is None or (isinstance(v, float) and v != v) or pd.isna(v):
        return None
    if kind == "M":
        return str(pd.Timestamp(v))
    if kind == "f":
        return float(v)
    if kind in "iu":
        return int(v)
    if kind == "b":
        return bool(v)
    # object column: keep the concrete Python type visible — this is
    # the HUGEINT trap (int values inside an object column must NOT
    # compare equal to an int64 column)
    return (type(v).__name__, str(v))


def rep(pdf: pd.DataFrame):
    """Dtype-sensitive representation of a canonicalized frame — the
    stand-in for the driver's hash.  Two frames compare equal here
    iff the driver's dtype-sensitive hash would match."""
    out = []
    for c in pdf.columns:
        s = pdf[c]
        kind = s.dtype.kind
        out.append((c, kind, tuple(_cell(kind, v) for v in s)))
    return tuple(out)
