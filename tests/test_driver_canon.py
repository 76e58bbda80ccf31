"""Representation-faithful driver gate (round-4 postmortem).

tests/test_oracle_parity.py checks VALUES at sf0.001 with a tolerant
normalizer; the driver checks REPRESENTATION at sf0.01 with pandas
``sort_values`` + a dtype-sensitive hash.  Round 4 shipped six
locally-green/driver-red queries through that gap.  This gate closes
it:

- ``test_no_array_output_columns``: no declared query may emit an
  array/map/struct column — the driver's canonicalizer crashes on
  them (``unhashable type: 'list'``, the r04 ``err`` rows).  Schema
  check only, sf0.001, all queries.
- ``test_driver_representation_parity``: for the upcoming driver
  window (the first 50 ``queries()`` entries — exactly the sample the
  driver will take), run Spark and DuckDB at the driver's sf0.01 and
  compare through tests/driver_canon.py, which reproduces the
  driver's sort + dtype-sensitive hash semantics (HUGEINT-vs-BIGINT
  is a FAIL here even though values match — the r04 hashfail rows).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.driver_canon import canon, rep

_QUERIES = entry_mod.queries()
_ORACLE = entry_mod.oracle_sql()
_WINDOW = list(_QUERIES)[:50]
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_array_output_columns(spark, name):
    schema = _QUERIES[name](spark, SF_SMOKE).schema
    bad = [f.name for f in schema.fields if isinstance(f.dataType, _NESTED)]
    assert not bad, (
        f"{name}: columns {bad} are array/map/struct — the driver's "
        "pandas canonicalizer cannot sort/hash them (r04 err rows); "
        "stringify (array_join) or explode to long form"
    )


@pytest.mark.parametrize("name", _WINDOW)
def test_driver_representation_parity(spark, name):
    if name not in _ORACLE:
        # declared rows-only (tests/test_contract.py ROWS_ONLY): the
        # driver records err='no_oracle' + spark_rows — replicate
        # that weaker check (runs + canonicalizes + nonempty)
        spdf = canon(_QUERIES[name](spark, SF_ORACLE).toPandas())
        assert len(spdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    spdf = canon(_QUERIES[name](spark, SF_ORACLE).toPandas())
    con = _duck(SF_ORACLE)
    dpdf = canon(con.sql(_ORACLE[name]).df())

    assert list(spdf.columns) == list(dpdf.columns), (
        f"{name}: columns spark={list(spdf.columns)} duck={list(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), (
        f"{name}: rows spark={len(spdf)} duck={len(dpdf)}"
    )
    srep, drep = rep(spdf), rep(dpdf)
    for (sc, sk, sv), (dc, dk, dv) in zip(srep, drep):
        assert sk == dk, (
            f"{name}.{sc}: dtype kind spark={sk!r} duck={dk!r} — the "
            "driver's hash is dtype-sensitive (HUGEINT trap: add a "
            "CAST in the oracle)"
        )
        mism = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b
        ]
        assert not mism, f"{name}.{sc}: first value mismatches {mism[:3]}"
