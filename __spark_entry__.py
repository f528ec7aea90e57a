"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()``    — named (spark, sf_dir) -> DataFrame callables, one
                   per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents; column names
                   are aliased identically on both sides (the driver
                   sorts columns by name and value-hashes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from concurrent_etl_spark import catalog
from concurrent_etl_spark import queries_analytics  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_catalog  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_llm2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_mining  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_relational2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_relational3  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_relational4  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_stats  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_streaming  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_temporal  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_tpch  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_tpch2  # noqa: F401 — registers queries
from concurrent_etl_spark import queries_tpch3  # noqa: F401 — registers queries
from concurrent_etl_spark.engine import DEFAULT_SF_DIR, load_tables
from concurrent_etl_spark.operators.etl import flagship_confirmation


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: lineitem fact -> 4-dim broadcast join chain -> load projection."""
    return flagship_confirmation(load_tables(spark, DEFAULT_SF_DIR))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.QUERIES


def oracle_sql() -> dict[str, str]:
    return catalog.ORACLES
