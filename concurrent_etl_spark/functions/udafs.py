"""GROUPED_AGG pandas UDAFs (custom aggregators, §2.9).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the GROUPED_AGG eval type from the *evaluated*
``pd.Series -> scalar`` type hints, and postponed evaluation would
turn them into strings it cannot parse (UNSUPPORTED_SIGNATURE).

Determinism: the lower-median convention — the element at sorted
index ``(n-1)//2`` — is tie- and order-exact over integers (no
interpolated averages, no float accumulation); DuckDB's
``quantile_disc(0.5)`` implements the identical pick.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("long")
def n_rows(s: pd.Series) -> int:
    """Row count as a UDAF: Spark refuses to mix GROUPED_AGG pandas
    UDFs with built-in aggregates in one agg
    (INVALID_PANDAS_UDF_PLACEMENT), so the count rides along as one."""
    return int(len(s))


@F.pandas_udf("long")
def lower_median(s: pd.Series) -> int:
    """Exact lower median of an integer series."""
    v = s.sort_values().reset_index(drop=True)
    return int(v.iloc[(len(v) - 1) // 2])


@F.pandas_udf("long")
def mad_lower(s: pd.Series) -> int:
    """Median absolute deviation around the lower median — a nested
    median no built-in aggregate expresses (the UDAF-shaped stat)."""
    v = s.sort_values().reset_index(drop=True)
    med = int(v.iloc[(len(v) - 1) // 2])
    a = (s - med).abs().sort_values().reset_index(drop=True)
    return int(a.iloc[(len(a) - 1) // 2])
