"""Plan-shape assertions: the scale contract, checked mechanically.

Correct results with a wrong plan (cartesian product, unpruned scan,
missed broadcast) pass value tests and then die at 100 TB — so the
perf tests assert on ``explain("formatted")`` output directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def strip_initial_plans(plan: str) -> str:
    """Drop every ``== Initial Plan ==`` subtree from an executed-plan
    string (r19). An already-executed AdaptiveSparkPlan embedded in a
    plan rendering — e.g. the cached band-signature chain behind an
    ``InMemoryTableScan`` (dedup.py r18 persist) — prints BOTH its
    final plan and its never-executed initial plan, so substring
    counters (Exchange / Scan parquet budgets) double-count nodes the
    query never runs. Node depth = the column of the ``+-`` marker; a
    section's subtree is every following line whose marker sits
    deeper. Plans with no executed adaptive subtrees pass through
    unchanged, so pre-r18 budget values keep their exact semantics.
    """
    def _depth(line: str) -> int:
        # node marker: "+-" (last child) or ":-" (non-last child);
        # marker-less lines (root, wrapped detail) nest under the
        # current node
        cands = [i for i in (line.find("+-"), line.find(":-")) if i >= 0]
        return min(cands) if cands else 1 << 30

    out: list[str] = []
    skip_depth: int | None = None
    for line in plan.splitlines(keepends=True):
        depth = _depth(line)
        if skip_depth is not None:
            if depth > skip_depth:
                continue
            skip_depth = None
        if "== Initial Plan ==" in line:
            skip_depth = depth
            continue
        out.append(line)
    return "".join(out)


def assert_no_cartesian(df: DataFrame, name: str = "") -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, (
        f"{name}: plan contains a CartesianProduct\n{plan}"
    )


def assert_broadcast_join(df: DataFrame, name: str = "") -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"{name}: expected a broadcast join\n{plan}"
    )


def assert_no_broadcast_hint(df: DataFrame, name: str = "") -> None:
    """Assert the query carries NO user-forced broadcast hint.

    A ``ResolvedHint`` in the analyzed plan means someone wrote
    ``F.broadcast(...)`` — an order Spark obeys even when the side is
    an unbounded vocabulary/df table that would OOM at 100 TB.  AQE
    choosing a broadcast from runtime stats is fine (and invisible
    here); a forced hint on an unbounded side is the defect.
    """
    analyzed = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    assert "ResolvedHint" not in analyzed, (
        f"{name}: forced broadcast hint on an unbounded table\n{analyzed}"
    )


def assert_pushed_filters(df: DataFrame, fragment: str, name: str = "") -> None:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(fragment in ln for ln in pushed), (
        f"{name}: filter {fragment!r} not pushed to scan; "
        f"PushedFilters lines: {pushed}\n{plan}"
    )


def assert_pruned_schema(df: DataFrame, max_cols: int, name: str = "") -> None:
    """Assert the scan reads at most max_cols columns (ReadSchema)."""
    plan = formatted_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and "struct<" in ln:
            ncols = ln.split("struct<", 1)[1].count(":")
            assert ncols <= max_cols, (
                f"{name}: scan reads {ncols} cols (> {max_cols}): {ln}"
            )
