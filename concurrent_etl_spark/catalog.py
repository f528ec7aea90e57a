"""Shared query registry: name -> Spark callable + DuckDB oracle SQL.

Query modules (queries_catalog, queries_llm, …) register into these
dicts via the ``query`` decorator; ``__spark_entry__`` exposes them to
the driver harness.

Persist convention: a query callable MAY ``persist()`` intermediates
whose consumer is the DataFrame it returns (the result is lazy, so
the function cannot unpersist before the caller executes it). The
contract is therefore harness-level: every catalog-wide runner
(``bench.py``, ``tools/check_oracle.py``, ``tools/explain_all.py``)
calls ``spark.catalog.clearCache()`` after consuming each query, so
cached blocks never accumulate across a full-catalog sweep. Functions
that DO run a terminal action internally (pagerank's bounded
materialization, streaming's merge) unpersist eagerly in
``try/finally`` instead.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable + its oracle.

    ``oracle=None`` registers a rows-only query (driver records the
    weaker check) — reserved for genuinely non-SQL-expressible ops.

    The registered callable is wrapped to pin the semantics-bearing
    session confs (``engine.SESSION_PINS``: UTC timezone, parquet
    nanosAsLong, Python-DataSource filter pushdown) on the CALLER's
    session before the query body runs. The driver harness invokes
    queries on its own default SparkSession, not ``get_spark()``'s —
    round 3 proved a query can fail on a conf the engine session sets
    (``pyds_txn_source_roundtrip``, DATA_SOURCE_PUSHDOWN_DISABLED).
    Pinning at the registry boundary makes every query
    bare-session-portable without per-site hand-rolled pins. The
    decorator returns the UNwrapped function so module-internal
    composition stays direct.
    """

    def deco(fn):
        @functools.wraps(fn)
        def pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
            from concurrent_etl_spark.engine import pin_session_confs

            pin_session_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = pinned
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dsum(col: str, alias: str, scale: int = 4) -> F.Column:
    """Order-insensitive exact sum of a double col, returned as double.

    DECIMAL accumulation is associative/commutative-exact, so Spark's
    partitioned partial aggregates and the oracle's sequential sum
    produce bit-identical doubles after the final cast.
    """
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )
