"""Ad-hoc parity runner: python scripts/check_parity.py <query> [sf_dir]

Runs one declared query against its DuckDB oracle through the
driver-faithful canonicalizer (tests/driver_canon.py) and prints
PASS/FAIL. Development aid only — the committed gates are
tests/test_oracle_parity.py and tests/test_driver_canon.py.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from tests.driver_canon import canon, rep  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark()
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    spdf = q(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    odf = con.sql(sql).df()
    ok_rows = len(spdf) == len(odf)
    r_s, r_o = rep(canon(spdf)), rep(canon(odf))
    ok = ok_rows and r_s == r_o
    print(f"{name}: rows {len(spdf)}/{len(odf)} rep_match={r_s == r_o}")
    if not ok:
        print("SPARK:", spdf.head(5).to_dict("records"))
        print("ORACLE:", odf.head(5).to_dict("records"))
        print("spark dtypes:", dict(spdf.dtypes.astype(str)))
        print("oracle dtypes:", dict(odf.dtypes.astype(str)))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
