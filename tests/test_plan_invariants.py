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

#: queries allowed to contain an UNPARTITIONED Window (single-partition
#: WindowExec) — each with a documented boundedness argument. Any other
#: query growing a global window fails this suite even if correct:
#: at 100 TB a global window is a one-executor sort of its whole input.
GLOBAL_WINDOW_OK = {
    # surrogate-id assignment runs over NEW dim keys only (anti-join
    # output, bounded by dim change rate, never fact-sized) — and the
    # initial 15-row dim build in the same query
    "dimension_upsert",
    # cumulative-share window runs AFTER orderBy().limit(100): its
    # input is the 100-row TakeOrdered result, not the vocabulary
    "vocab_coverage_topk",
    # rank window runs AFTER orderBy().limit(500): its input is the
    # 500-row TakeOrdered head of the vocabulary, never the corpus
    "zipf_slope_fit",
    # rank window runs AFTER orderBy().limit(50): its input is the
    # 50-row TakeOrdered resample head, never the scored corpus
    "dsir_importance_resample",
    # FALSE POSITIVE of the spec-text regex, not a global window:
    # Catalyst's lateral-subquery decorrelation prints the pulled-up
    # correlation key in the Window operator's partitionSpec argument
    # (`Window [...rnk...], [o_custkey], [o_totalprice DESC ...]`)
    # but NOT inside windowspecdefinition(...), which is all this
    # regex can see. The optimized plan partitions by o_custkey.
    "lateral_topk_per_entity",
}

_WSPEC = re.compile(r"windowspecdefinition\(([^,()]*?)[,)]")


def _has_global_window(plan: str) -> bool:
    """True if any Window node has no partition columns.

    In plan text a partitioned window's windowspecdefinition starts
    with bare partition expressions; an unpartitioned one starts
    directly with an ordering expression ('col ASC NULLS FIRST').
    """
    for m in _WSPEC.finditer(plan):
        first = m.group(1)
        if " ASC" in first or " DESC" in first:
            return True
    return False


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
            if name not in GLOBAL_WINDOW_OK and _has_global_window(plan):
                offenders.append(f"{name}: unpartitioned Window")
        assert not offenders, offenders


# ---------------------------------------------------------------------------
# driver-materialization allowlist (VERDICT r5 item 4)
# ---------------------------------------------------------------------------

#: Every ``.collect()`` / ``.toPandas()`` in the package, keyed by
#: (relative path, enclosing function, method). Each entry was
#: audited BOUNDED at any scale factor — a scalar/k-row aggregate, a
#: domain-bounded dimension, or a fixture writer with an explicit
#: cap applied identically in both engines. Adding a new site fails
#: this test until the site is audited and listed here with its
#: boundedness argument.
_DRIVER_MATERIALIZE_OK = {
    # instrumentation scalars (1-row aggregates)
    ("queries_llm7.py", "winnowing_work_stats", "collect"),
    ("queries_llm7.py", "containment_candidate_stats", "collect"),
    ("queries_catalog.py", "q_jdbc_source_roundtrip", "collect"),
    ("queries_stats2.py", "q_kendall_tau", "collect"),
    # two bounded collects: 1-row day-domain stats + 1-row median
    ("queries_stats2.py", "q_theilsen_slope", "collect"),
    # 1-row sum(deg^2) scalar sizing the pair-stage repartition
    ("queries_mining.py", "q_link_prediction_jaccard", "collect"),
    # k-row / domain-bounded reduces
    ("queries_analytics.py", "q_skyline_pareto_parts", "collect"),  # <=240 price buckets
    # PQ training scalars: k seed rows, k*M-row Lloyd reduce, _PQ_NQ
    # query rows — all bounded (attributed to the nearest enclosing
    # def, the _cluster_col helper)
    ("queries_clustering.py", "_cluster_col", "collect"),
    ("queries_training.py", "q_global_id_assignment", "collect"),  # per-source counts
    ("queries_stats.py", "_cum_by_value", "collect"),  # value-domain/2^33 buckets
    ("streaming/file_stream.py", "merge_into_partitioned_parquet", "collect"),  # distinct partition values
    ("operators/dims.py", "upsert_dimension", "collect"),  # max-id scalar
    ("operators/training.py", "gradient_row", "collect"),  # 1-row gradient
    ("operators/clustering.py", "update_centroids", "collect"),  # k rows
    ("operators/clustering.py", "init_centroids", "collect"),  # k rows
    # fixture writers with explicit caps (both engines)
    ("queries_catalog.py", "q_xlsx_source_roundtrip", "collect"),  # nation: 25 rows fixed
    ("queries_catalog.py", "q_warc_source_roundtrip", "collect"),  # doc_id < 200
    ("queries_catalog.py", "q_avro_source_roundtrip", "collect"),  # s_suppkey <= 100k
    ("queries_catalog.py", "q_parquet_zonemap_audit", "toPandas"),  # limit(100k)
    ("queries_streaming.py", "q_stream_stateful_session_roundtrip", "collect"),  # limit(50k)
}


def test_driver_materializations_are_allowlisted():
    """Source lint: no new unbounded driver-side collects can land.

    Scans every package source line for ``.collect()``/``.toPandas()``
    and requires the (file, enclosing def, method) triple to be in the
    audited allowlist. Multiset-exact both ways: an allowlist entry
    whose site disappeared must be pruned too.
    """
    import collections
    import os

    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "concurrent_etl_spark")
    found: collections.Counter = collections.Counter()
    for root, _, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, pkg)
            cur = "<module>"
            with open(path) as f:
                for line in f:
                    m = re.match(r"\s*def (\w+)", line)
                    if m:
                        cur = m.group(1)
                    for meth in ("collect", "toPandas"):
                        if f".{meth}()" in line:
                            found[(rel, cur, meth)] += 1
    unlisted = sorted(set(found) - _DRIVER_MATERIALIZE_OK)
    stale = sorted(_DRIVER_MATERIALIZE_OK - set(found))
    assert not unlisted, f"unaudited driver materializations: {unlisted}"
    assert not stale, f"stale allowlist entries: {stale}"
