"""Driver-contract guards: the __spark_entry__ surface the grading
driver consumes stays structurally sound as suites grow."""

from __future__ import annotations

import __spark_entry__ as entry_mod

#: Queries deliberately shipped WITHOUT a DuckDB oracle (the driver
#: records the sanctioned weaker rows-only check: err='no_oracle' +
#: spark_rows). dedup_minhash_lsh_fast re-entered in round 6 per the
#: r05 verdict: xxhash64 has no DuckDB twin, a rows-only driver row
#: beats no driver row, and _attestation_order counts such rows as
#: attested so it cannot jam the window. Growing this list is a
#: deliberate act — every addition needs a pinned-semantics test
#: like the lsh_fast recall test (tests/test_dedup.py).
ROWS_ONLY: set[str] = {"dedup_minhash_lsh_fast"}


def test_every_query_has_oracle_or_declared_rows_only():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    missing = {n for n in qs if n not in osql}
    assert missing == ROWS_ONLY, (
        f"queries without oracle: {missing - ROWS_ONLY} / "
        f"stale ROWS_ONLY entries: {ROWS_ONLY - missing}"
    )
    stray = set(osql) - set(qs)
    assert not stray, f"oracles without queries: {stray}"


def test_driver_window_is_mechanical_least_recently_attested():
    """The driver samples the first 50 queries() entries; since
    round 5 that order is DERIVED from the committed CORRECTNESS
    snapshots (never-green first, then oldest green attestation) so
    the sample cannot be hand-curated (r04 ADVICE)."""
    import glob
    import json

    ks = list(entry_mod.queries())
    assert len(set(ks)) == len(ks)
    last_green: dict[str, int] = {}
    last_red: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("r")[-1].split(".")[0])
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ) or (
                row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_red[name] = max(last_red.get(name, 0), rnd)

    stamps = json.load(open("ATTEST_HASHES.json"))
    hashes = entry_mod._current_hashes()

    def key(n):
        # a regression (red newer than the last green) re-enters the
        # front with the never-attested group
        if last_red.get(n, 0) > last_green.get(n, 0):
            return 0
        # as does a source change newer than the last green (r06
        # verdict #3): a rewritten operator can't hide behind a green
        # row earned by its old plan
        st = stamps.get(n)
        if st is not None and (
            hashes.get(n) != st.get("hash")
            or st.get("round", 0) > last_green.get(n, 0)
        ):
            return 0
        return last_green.get(n, 0)

    keys = [(key(n), n) for n in ks]
    assert keys == sorted(keys), "queries() not least-recently-attested order"
    # every never-attested/regressed/source-changed query outranks
    # every attested one
    never = [n for n in ks if key(n) == 0]
    assert ks[: len(never)] == never
    # the committed stamp file covers exactly the query set, and every
    # stamp hash matches the current source (regenerate via
    # scripts/update_attest_hashes.py after changing an operator)
    assert set(stamps) == set(ks)
    mismatched = [n for n in ks if stamps[n]["hash"] != hashes[n]]
    assert not mismatched, (
        f"stale ATTEST_HASHES.json for {mismatched}; run "
        "scripts/update_attest_hashes.py <round>"
    )


def test_attestation_order_promotes_regressions(tmp_path):
    """Synthetic snapshots: green r01 then red r02 must sort with the
    never-attested group, ahead of a query green in r01 only."""
    import json

    import __spark_entry__ as e

    root = tmp_path
    (root / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "regressed": {"rows_match": True, "schema_match": True, "hash_match": True},
                "stale_green": {"rows_match": True, "schema_match": True, "hash_match": True},
            }
        )
    )
    (root / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {"regressed": {"rows_match": True, "schema_match": True, "hash_match": False}}
        )
    )
    order = e._attestation_order(
        ["stale_green", "regressed", "fresh"], root=str(root)
    )
    assert order == ["fresh", "regressed", "stale_green"]


def test_oracles_are_nonempty_sql():
    for name, sql in entry_mod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_binary_callables():
    import inspect

    for name, fn in entry_mod.queries().items():
        assert callable(fn), name
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
        ]
        assert len(params) == 2, (name, params)


def test_all_operator_modules_import_cleanly():
    """_suites() swallows ImportError so optional modules can be
    absent in exotic environments — but in THIS repo every module
    must import, or queries() silently shrinks and the driver checks
    fewer operators than SURVEY §2 claims. Import each one directly
    (no try/except) and require its QUERIES/ORACLE dicts."""
    import importlib
    import re

    src = open("__spark_entry__.py").read()
    names = set(re.findall(r'"([a-z0-9_]+)"', src.split("for name in (")[1].split("):")[0]))
    assert len(names) >= 30  # the round-5 suite roster
    for name in sorted(names) + ["tpch", "timeseries", "pipeline_ops", "multimodal_ops"]:
        mod = importlib.import_module(
            f"aichemy_data_pipelines_spark.operators.{name}"
        )
        assert isinstance(mod.QUERIES, dict) and mod.QUERIES, name
        assert isinstance(mod.ORACLE, dict), name
        # every declared query in the module has an oracle twin
        # (except the explicit rows-only roster)
        missing = set(mod.QUERIES) - set(mod.ORACLE) - ROWS_ONLY
        assert not missing, (name, missing)


def test_every_query_is_listed_in_survey_section_2():
    """SURVEY §2 is the coverage contract the judge audits line by
    line — r06 found 5 implemented, driver-green queries silently
    missing from it (inventory drift). Pin: every name in queries()
    appears as a backtick reference somewhere in SURVEY.md's §2
    block, so adding a query without its checklist bullet fails CI."""
    import os
    import re

    survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    with open(survey) as f:
        text = f.read()
    # §2 block: from the '## 2' heading to the next '## ' heading
    m = re.search(r"^## §2 .*?(?=^## §)", text, re.M | re.S)
    assert m, "SURVEY.md section 2 heading not found"
    sec2 = m.group(0)
    listed = set(re.findall(r"`([A-Za-z0-9_./]+)`", sec2))
    missing = sorted(
        name for name in entry_mod.queries() if name not in listed
    )
    assert not missing, (
        f"queries() entries absent from SURVEY.md §2: {missing}"
    )


def test_attestation_order_resets_on_source_change(tmp_path):
    """r06 verdict #3: a query whose source hash changed since its
    last green driver row must sort with the never-attested group.
    Both reset paths: a hash mismatch vs the stamp, and a stamp round
    newer than the green row."""
    import json

    import __spark_entry__ as e

    root = tmp_path
    (root / "CORRECTNESS_r05.json").write_text(
        json.dumps(
            {
                n: {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                }
                for n in ("rewritten", "restamped", "steady")
            }
        )
    )
    (root / "ATTEST_HASHES.json").write_text(
        json.dumps(
            {
                # hash no longer matches current source -> reset
                "rewritten": {"hash": "OLD", "round": 3},
                # hash matches but first appeared AFTER the green row
                "restamped": {"hash": "H2", "round": 6},
                # hash matches, predates the green row -> keeps age
                "steady": {"hash": "H3", "round": 3},
            }
        )
    )
    order = e._attestation_order(
        ["steady", "restamped", "rewritten"],
        root=str(root),
        current_hashes={"rewritten": "NEW", "restamped": "H2", "steady": "H3"},
    )
    assert order == ["restamped", "rewritten", "steady"]


def test_helper_module_edit_resets_consumer_stamps():
    """r9 verdict #2: the attestation stamp must SEE changes to the
    shared ``functions/`` expression layer — the round-9 vectors.py
    fix changed 16 queries' behavior but reset no stamp. Pins that
    (a) a dot-exact consumer's stamp input includes the vectors
    helper source, (b) a tokenizer consumer's includes text.py even
    though it imports only string CONSTANTS (no __module__ to scan),
    (c) perturbing the helper blob changes the hash, and (d) the
    default hashing path resolves the same blob the explicit one
    does."""
    import __spark_entry__ as e
    from aichemy_data_pipelines_spark.operators import gopher_ops, similarity

    vec_blob = e._helper_sources(similarity)
    assert "def spark_dot_exact" in vec_blob
    tok_blob = e._helper_sources(gopher_ops)
    assert "SPARK_TOKENS" in tok_blob
    # (e) the closure follows OPERATOR composition too: crossmodal_ops
    # imports no functions/ helper directly — it composes dedup and
    # multimodal_ops — yet its stamp must still see the tokenizer and
    # shingle primitives its text member builds on (round-10
    # self-review gap)
    from aichemy_data_pipelines_spark.operators import crossmodal_ops

    xm_blob = e._helper_sources(crossmodal_ops)
    assert "def spark_shingles" in xm_blob
    assert "SPARK_TOKENS =" in xm_blob
    fn = similarity.QUERIES["ann_cosine_topk"]
    h_now = e._source_hash(fn, "SELECT 1")
    assert h_now == e._source_hash(fn, "SELECT 1", helpers=vec_blob)
    h_edited = e._source_hash(
        fn, "SELECT 1", helpers=vec_blob + "# helper edited"
    )
    assert h_now != h_edited
