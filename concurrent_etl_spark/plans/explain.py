"""Plan introspection helpers.

Scale tuning is plan-shape-driven (SURVEY §7 step 6): tests assert on
join strategies, pushed filters, and codegen spans instead of
guessing. This module turns ``df.explain(...)`` into a string the
assertions can grep.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Return the physical plan as text (what .explain() prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_broadcast_joins(df: DataFrame, n: int) -> str:
    """Assert the plan contains exactly n broadcast hash joins and no
    sort-merge joins (i.e. the fact side never shuffles for dims)."""
    plan = plan_string(df, mode="simple")
    assert plan.count("BroadcastHashJoin") == n, plan
    assert "SortMergeJoin" not in plan, plan
    return plan


def pushed_filters(df: DataFrame) -> str:
    """Return the PushedFilters lines from the formatted plan."""
    return "\n".join(
        line for line in plan_string(df).splitlines() if "PushedFilters" in line
    )
