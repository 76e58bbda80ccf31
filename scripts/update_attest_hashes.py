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


def _pre_r10_hash(fn, oracle: str | None) -> str:
    """The stamp format used through round 9: operator function body
    + oracle SQL only (no helper-module sources). Kept so --migrate
    can tell "the hash FORMAT changed" apart from "the source
    changed"."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', repr(type(fn)))}"
    return hashlib.sha256(
        (src + "\x00" + (oracle or "")).encode()
    ).hexdigest()


def migrate(rnd: int) -> None:
    """One-off r10 migration: _source_hash grew a helper-module term
    (r9 verdict #2 — a functions/ helper edit must reset its
    consumers' stamps), which changes EVERY query's hash even where
    no source changed. Re-stamping them all at round 10 would flood
    the driver window with false resets, so: recompute each stamp in
    the new format, PRESERVING the committed round when the
    pre-r10-format hash still matches (the source text is untouched —
    only our hashing function changed), and stamping round ``rnd``
    when it doesn't (a real source change this round)."""
    import __spark_entry__ as entry

    root = os.path.dirname(os.path.abspath(entry.__file__))
    path = os.path.join(root, "ATTEST_HASHES.json")
    with open(path) as fh:
        stamps = json.load(fh)
    merged_q: dict = {}
    merged_o: dict = {}
    for mod in entry._suites():
        merged_q.update(mod.QUERIES)
        merged_o.update(mod.ORACLE)
    out, preserved, restamped = {}, [], []
    for name, fn in merged_q.items():
        oracle = merged_o.get(name)
        new_hash = entry._source_hash(fn, oracle)
        old = stamps.get(name)
        if old is not None and old.get("hash") == _pre_r10_hash(fn, oracle):
            out[name] = {"hash": new_hash, "round": old.get("round", rnd)}
            preserved.append(name)
        else:
            out[name] = {"hash": new_hash, "round": rnd}
            restamped.append(name)
    with open(path, "w") as fh:
        json.dump({k: out[k] for k in sorted(out)}, fh, indent=1)
        fh.write("\n")
    print(
        f"migrated: {len(preserved)} rounds preserved,"
        f" {len(restamped)} re-stamped at r{rnd}"
    )
    for n in restamped:
        print("  ", n)


def _r10_v1_helper_blob(mod) -> str:
    """FROZEN copy of the first (round-10 v1) helper-blob algorithm:
    helpers referenced by the operator module's own source only, no
    traversal of composed operator modules. Kept so --migrate-v2 can
    tell 'the hashing algorithm grew operator-transitivity' apart
    from 'the source changed'."""
    import importlib
    import inspect
    import re

    if mod is None:
        return ""
    try:
        pending = set(
            re.findall(
                r"aichemy_data_pipelines_spark\.functions\.(\w+)",
                inspect.getsource(mod),
            )
        )
    except (OSError, TypeError):
        pending = set()
    sources: dict = {}
    while pending:
        name = pending.pop()
        if name in sources:
            continue
        try:
            src = inspect.getsource(
                importlib.import_module(
                    f"aichemy_data_pipelines_spark.functions.{name}"
                )
            )
        except Exception:
            src = name
        sources[name] = src
        pending.update(
            re.findall(
                r"aichemy_data_pipelines_spark\.functions\.(\w+)", src
            )
        )
    return "\x00".join(sources[n] for n in sorted(sources))


def migrate_v2(rnd: int) -> None:
    """Second r10 format migration: _helper_sources now traverses
    composed OPERATOR modules (crossmodal→dedup, clustering→dedup, …)
    so helper edits reset composed consumers too. Same preservation
    rule as migrate(): a stamp whose v1-format hash still matches
    (source untouched, only our coverage function grew) keeps its
    round; a real source change re-stamps at ``rnd``."""
    import sys as _s

    import __spark_entry__ as entry

    root = os.path.dirname(os.path.abspath(entry.__file__))
    path = os.path.join(root, "ATTEST_HASHES.json")
    with open(path) as fh:
        stamps = json.load(fh)
    merged_q: dict = {}
    merged_o: dict = {}
    for mod in entry._suites():
        merged_q.update(mod.QUERIES)
        merged_o.update(mod.ORACLE)
    out, preserved, restamped = {}, [], []
    for name, fn in merged_q.items():
        oracle = merged_o.get(name)
        new_hash = entry._source_hash(fn, oracle)
        v1_blob = _r10_v1_helper_blob(
            _s.modules.get(getattr(fn, "__module__", ""))
        )
        v1_hash = entry._source_hash(fn, oracle, helpers=v1_blob)
        old = stamps.get(name)
        if old is not None and old.get("hash") == v1_hash:
            out[name] = {"hash": new_hash, "round": old.get("round", rnd)}
            preserved.append(name)
        else:
            out[name] = {"hash": new_hash, "round": rnd}
            restamped.append(name)
    with open(path, "w") as fh:
        json.dump({k: out[k] for k in sorted(out)}, fh, indent=1)
        fh.write("\n")
    print(
        f"migrated (v2): {len(preserved)} rounds preserved,"
        f" {len(restamped)} re-stamped at r{rnd}"
    )
    for n in restamped:
        print("  ", n)


def main() -> None:
    if sys.argv[1] == "--migrate":
        migrate(int(sys.argv[2]))
        return
    if sys.argv[1] == "--migrate-v2":
        migrate_v2(int(sys.argv[2]))
        return
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
