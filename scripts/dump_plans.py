"""Dump .explain("formatted") for every declared query to a directory.

Usage: python scripts/dump_plans.py <out_dir> [sf_dir] [name ...]

One file per query: <out_dir>/<query>.txt. Plan capture is
driver-side; operators that run eager work at plan-construction
(trained artifacts, localCheckpoint barriers) execute those jobs,
so a full dump at sf0.1 takes a few minutes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = sys.argv[3:] or sorted(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # keep dumping the rest
            plan = f"ERROR: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
