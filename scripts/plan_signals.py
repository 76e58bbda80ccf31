"""Summarize optimization-relevant signals from dumped plan files.

Usage: python scripts/plan_signals.py <plans_dir>

Per plan: Exchange count (hash/range/single), join strategies,
Python-boundary nodes (BatchEvalPython/ArrowEvalPython/MapInArrow/
FlatMapGroupsInPandas), CartesianProduct/BroadcastNestedLoopJoin,
Window count, parquet scan count per table, whether any scan reads
a text/embedding-heavy column it doesn't need (ReadSchema width),
and ReusedExchange hits. Sorted so the ugliest plans print first.
"""

from __future__ import annotations

import os
import re
import sys


def main() -> None:
    d = sys.argv[1]
    rows = []
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".txt"):
            continue
        name = fn[:-4]
        text = open(os.path.join(d, fn)).read()
        if text.startswith("ERROR"):
            rows.append((name, {"ERROR": text[:100]}, -1))
            continue
        sig = {
            "xch_hash": len(re.findall(r"Arguments: hashpartitioning", text)),
            "xch_range": len(re.findall(r"Arguments: rangepartitioning", text)),
            "xch_single": len(re.findall(r"Arguments: SinglePartition", text)),
            "xch_rr": len(re.findall(r"Arguments: RoundRobinPartitioning", text)),
            "reused_xch": len(re.findall(r"ReusedExchange", text)),
            "smj": len(re.findall(r"\bSortMergeJoin\b", text)),
            "shj": len(re.findall(r"\bShuffledHashJoin\b", text)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", text)),
            "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", text)),
            "cartesian": len(re.findall(r"\bCartesianProduct\b", text)),
            "window": len(re.findall(r"^\(\d+\) Window", text, re.M)),
            "py": len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"MapInArrow|FlatMapGroupsInPandas",
                    text,
                )
            ),
            "sort": len(re.findall(r"^\(\d+\) Sort\b", text, re.M)),
            "gen": len(re.findall(r"^\(\d+\) Generate", text, re.M)),
            "imr": len(re.findall(r"InMemoryTableScan", text)),
        }
        # Formatted plans put the path on a per-scan "Location:" line
        # (ADVICE r18: the old "Scan parquet <path>" regex never
        # matched and fell through to counting every file: URI, which
        # overcounts multi-path InMemoryFileIndex entries). One
        # Location line per scan node; dedupe paths within the line.
        scans = [
            sorted({p for p in re.findall(r"/(\w+)\.parquet", ln)})[0]
            for ln in text.splitlines()
            if ln.startswith("Location:") and ".parquet" in ln
        ]
        from collections import Counter

        sc = Counter(scans)
        sig["scans"] = dict(sc)
        multi = {t: n for t, n in sc.items() if n >= 2}
        if multi:
            sig["MULTI_SCAN"] = multi
        badness = (
            sig["cartesian"] * 100
            + sig["xch_hash"]
            + sig["xch_range"]
            + sig["smj"] * 2
            + sig["py"] * 3
            + sum(n - 1 for n in sc.values() if n >= 2) * 5
        )
        rows.append((name, sig, badness))
    for name, sig, badness in sorted(rows, key=lambda r: -r[2]):
        print(f"{badness:4d} {name}: {sig}")


if __name__ == "__main__":
    main()
