"""Plan-shape audit: how many times does each query's PHYSICAL plan
scan each parquet table?

A lazily-referenced DataFrame re-embeds its whole lineage at every
reference, so a frame used N times evaluates N times — invisible in
results, superlinear in cost at corpus scale. This audit caught
docs_pagerank re-embedding the MinHash candidate chain 14x (28
documents scans in one plan) and dedup_graph_triangles 6x in round
10; both now localCheckpoint their edge frames and are pinned at
zero scans (tests/test_plans.py).

Reading the output: 2 scans of a PRUNED projection is often the
honest self-join shape (two narrow column sets beat persist+shuffle
of the wide row); 3+ scans, or 2 scans where the re-derived subtree
is an expensive chain (explodes, joins, training), is the
share_frame / localCheckpoint candidate list.

Usage: python scripts/plan_scan_audit.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="plan_scan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    rows = []
    for name in sorted(qs):
        try:
            plan = (
                qs[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # surface, keep auditing the rest
            rows.append((name, -1, f"ERR {str(exc)[:80]}"))
            continue
        # \w+ not [a-z]+: digits/underscores in a table name (e.g.
        # order_items) must not be truncated into a merged tally key
        tables = re.findall(r"Scan parquet .*?(\w+)\.parquet", plan)
        c = Counter(tables)
        multi = {t: n for t, n in c.items() if n >= 2}
        if multi:
            rows.append((name, sum(c.values()), multi))
    print("queries whose plan scans a table 2+ times (descending):")
    for name, total, detail in sorted(
        rows, key=lambda r: -(r[1] if r[1] > 0 else 10**9)
    ):
        print(f"  {name:40s} {total:3} {detail}")


if __name__ == "__main__":
    main()
