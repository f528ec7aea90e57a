"""Whole-catalog plan invariants: the 'no slow path anywhere' guard.

Builds (but does not execute) every registered query's physical plan
at sf0.001 and asserts the engine-wide rules:

  * no CartesianProduct — except the one query that intentionally
    demonstrates a cross join;
  * no row-at-a-time Python (BatchEvalPython) — Python may appear
    only Arrow-batched (ArrowEvalPython / mapInPandas / UDTF nodes);
  * every query has a DuckDB oracle registered (the driver records a
    weaker rows-only check otherwise — we hold the line at 100%).

A new query that silently regresses any of these fails here even if
its results are correct.
"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod
from concurrent_etl_spark.plans.explain import plan_string

SF_DIR = "/root/testdata/sf0.001"

#: queries whose plan legitimately contains a cartesian/nested-loop
#: product of two multi-row sides
CARTESIAN_OK = {"join_cross"}


class TestWholeCatalogPlans:
    def test_all_plans_obey_invariants(self, spark):
        queries = entrymod.queries()
        oracles = entrymod.oracle_sql()
        missing_oracle = sorted(set(queries) - set(oracles))
        assert not missing_oracle, f"queries without oracle: {missing_oracle}"

        offenders: list[str] = []
        for name, fn in queries.items():
            plan = plan_string(fn(spark, SF_DIR), "simple")
            if name not in CARTESIAN_OK and "CartesianProduct" in plan:
                offenders.append(f"{name}: CartesianProduct")
            # BatchEvalPythonUDTF (arrow'd separately) is allowed; the
            # forbidden node is plain row-at-a-time BatchEvalPython
            if re.search(r"BatchEvalPython(?!UDTF)", plan):
                offenders.append(f"{name}: row-at-a-time Python UDF")
        assert not offenders, offenders
