"""Regenerate ATTEST_HASHES.json — the per-query source-hash stamp
that makes attestation age reset when an operator's source changes.

Usage: python scripts/update_attest_hashes.py <round>

For every query in ``__spark_entry__.queries()``: if the committed
stamp is absent or its hash differs from the current source hash,
re-stamp it as ``{"hash": <current>, "round": <round>}`` — i.e. the
stamp's round is the round this source text FIRST appeared. Entries
for removed queries are dropped. ``__spark_entry__._attestation_order``
compares the stamp against each query's newest green driver row: a
stamp round newer than the green row (or a hash mismatch, which means
the source changed after the stamp was last cut) sorts the query with
the never-attested group, forcing driver re-attestation of the new
plan. Run once per round, after the round's source changes, before
committing.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rnd = int(sys.argv[1])
    import __spark_entry__ as entry

    root = os.path.dirname(os.path.abspath(entry.__file__))
    path = os.path.join(root, "ATTEST_HASHES.json")
    try:
        with open(path) as fh:
            stamps = json.load(fh)
    except (OSError, ValueError):
        stamps = {}
    current = entry._current_hashes()
    changed, dropped = [], []
    for name, h in current.items():
        if name not in stamps or stamps[name].get("hash") != h:
            stamps[name] = {"hash": h, "round": rnd}
            changed.append(name)
    for name in list(stamps):
        if name not in current:
            del stamps[name]
            dropped.append(name)
    with open(path, "w") as fh:
        json.dump({k: stamps[k] for k in sorted(stamps)}, fh, indent=1)
        fh.write("\n")
    print(f"round {rnd}: {len(changed)} (re)stamped, {len(dropped)} dropped")
    for n in changed:
        print("  ", n)


if __name__ == "__main__":
    main()
