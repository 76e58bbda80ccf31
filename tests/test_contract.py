"""Driver-contract guards: the __spark_entry__ surface the grading
driver consumes stays structurally sound as suites grow."""

from __future__ import annotations

import __spark_entry__ as entry_mod

#: Queries deliberately shipped WITHOUT a DuckDB oracle (driver
#: records a weaker rows-only check). Growing this list is a
#: deliberate act — every addition needs a pinned-semantics test like
#: dedup_minhash_lsh_fast's recall test.
ROWS_ONLY = {"dedup_minhash_lsh_fast"}


def test_every_query_has_oracle_or_declared_rows_only():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    missing = {n for n in qs if n not in osql}
    assert missing == ROWS_ONLY, (
        f"queries without oracle: {missing - ROWS_ONLY} / "
        f"stale ROWS_ONLY entries: {ROWS_ONLY - missing}"
    )
    stray = set(osql) - set(qs)
    assert not stray, f"oracles without queries: {stray}"


def test_driver_window_is_a_prefix_of_queries():
    ks = list(entry_mod.queries())
    assert len(entry_mod._DRIVER_WINDOW) == 50
    assert ks[:50] == entry_mod._DRIVER_WINDOW
    assert len(set(ks)) == len(ks)


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
