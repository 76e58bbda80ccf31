"""THE correctness gate, replicated locally.

For every ``queries()`` entry with an ``oracle_sql()`` twin, run both
(Spark at sf0.001, DuckDB on the same parquet) and compare row count,
column-name set, and the order-insensitive multiset of values — the
same comparison the driver performs for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

_QUERIES = entry_mod.queries()
_ORACLE = entry_mod.oracle_sql()
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


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key
    )
    return cols, data


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(spark, name):
    sdf = _QUERIES[name](spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if name not in _ORACLE:
        # rows-only contract: must run AND be deterministic — build a
        # second independent plan and require identical results
        sdf2 = _QUERIES[name](spark, SF_SMOKE)
        s_rows2 = [tuple(r) for r in sdf2.collect()]
        sc1, sv1 = _normalize(s_cols, s_rows)
        sc2, sv2 = _normalize(sdf2.columns, s_rows2)
        assert sc1 == sc2 and sv1 == sv2, f"{name}: non-deterministic"
        return

    con = _duck(SF_SMOKE)
    rel = con.sql(_ORACLE[name])
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    sc, sv = _normalize(s_cols, s_rows)
    dc, dv = _normalize(d_cols, d_rows)

    assert sc == dc, f"{name}: column mismatch spark={sc} duck={dc}"
    assert len(sv) == len(dv), f"{name}: rowcount spark={len(sv)} duck={len(dv)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_sql_plane_weights_md5_parity():
    """The r16 compact LSH oracle recomputes the ±1 hyperplane
    weights IN-PLAN from md5 parity instead of inlining the Python
    table as literals (similarity._sql_signature); this pin holds the
    two derivations equal cell-by-cell over the full
    _MAX_BANDS × _MAX_PLANES × _DIM table, so an md5-dialect or
    parity-trick regression in either engine fails loudly here rather
    than as an opaque driver hash mismatch."""
    from aichemy_data_pipelines_spark.operators import similarity as sim

    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT g.g, d.d,
               CASE WHEN instr('02468ace',
                    substr(md5(g.g::VARCHAR || ':' || d.d::VARCHAR),
                           32, 1)) > 0
                    THEN 1 ELSE -1 END AS w
        FROM range({sim._MAX_BANDS * sim._MAX_PLANES}) g(g),
             range({sim._DIM}) d(d)
        """
    ).fetchall()
    assert len(rows) == sim._MAX_BANDS * sim._MAX_PLANES * sim._DIM
    for g, d, w in rows:
        assert sim._PLANES[g][d] == w, (g, d, w)


def test_all_suites_registered():
    """_suites() swallows ImportError so one broken module can't sink
    the whole driver contract — but that must never SILENTLY shrink
    the query surface. Pin the count; bump it when adding queries."""
    assert len(_QUERIES) >= 75, sorted(_QUERIES)
