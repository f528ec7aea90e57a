"""Relational primitives (SURVEY.md §2.2-2.4: P5/P6, J1-J4, A1-A6).

Each function re-expresses a hand-rolled pandas idiom from the
reference as the idiomatic Spark plan, with the scale-relevant join
strategy made explicit:

  * small dimension side  -> ``broadcast()`` hint (no shuffle of the
    fact table; at 100 TB the fact NEVER moves for a dim join);
  * new-key detection     -> left_anti join (was: ``~isin`` mask,
    case_2/Normal.py:63-67 — note SQL NOT IN has different NULL
    semantics; left_anti matches the pandas behaviour);
  * remote IN-list fetch  -> left_semi join (was: collect keys on the
    driver, splice into a SQL string, case_2/Normal.py:244-257 — the
    driver round-trip and the injection hazard both disappear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_left_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str]
) -> DataFrame:
    """Left join attaching dim attributes to a fact (J1).

    Reference: ``pd.merge(fact, dim, how='left', on=key)`` chained 4x
    (case_2/Normal.py:232-236). The dim side is broadcast: a
    1000-executor fact scan joins locally, zero shuffle.
    """
    # broadcast-ok: API contract — `dim` is a dimension table (J1)
    return fact.join(F.broadcast(dim), on, "left")


def composite_key_join(
    fact: DataFrame, lookup: DataFrame, keys: list[str]
) -> DataFrame:
    """Left join on a composite key (J2, case_2/Normal.py:263)."""
    # broadcast-ok: API contract — `lookup` is a dimension table (J2)
    return fact.join(F.broadcast(lookup), keys, "left")


def anti_join(batch: DataFrame, existing: DataFrame, on: str | list[str]) -> DataFrame:
    """Rows of ``batch`` whose key is absent from ``existing`` (J3/P5)."""
    return batch.join(existing, on, "left_anti")


def semi_join(fact: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """Rows of ``fact`` whose key appears in ``keys`` (J4/P6).

    ``keys`` is typically a small distinct set -> broadcast, so the
    fact side streams through a local hash probe.
    """
    # broadcast-ok: API contract — `keys` is a small distinct key set
    return fact.join(F.broadcast(keys), on, "left_semi")


def new_keys(batch: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Distinct non-null keys in ``batch`` missing from ``dim`` (P5+A1).

    Reference: ``~df[k].isin(master[k]) & ~df[k].isnull()`` then
    ``drop_duplicates`` (case_2/Normal.py:63-70). Aggregating to
    distinct BEFORE the anti join keeps the join input minimal —
    map-side partial aggregation shrinks the shuffle — and the dim
    side is broadcast (dims are small by contract; without the hint
    Spark picks a sort-merge anti join when stats are missing).
    """
    return (
        batch.select(key)
        .where(F.col(key).isNotNull())
        .dropDuplicates([key])
        # broadcast-ok: API contract — `dim` is a dimension table (P5)
        .join(F.broadcast(dim.select(key)), key, "left_anti")
    )


def dedup_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic one-row-per-key dedup (A1).

    pandas ``drop_duplicates(subset=...)`` keeps the FIRST row in file
    order; Spark's ``dropDuplicates`` keeps an arbitrary one. For a
    reproducible pipeline (and an oracle-checkable one) we keep the
    minimum of every other column per key — order-insensitive and
    deterministic under any partitioning.
    """
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.distinct()
    aggs = [F.min(c).alias(c) for c in others]
    return df.groupBy(*keys).agg(*aggs)


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group z-score normalization via batch ``applyInPandas``
    (§2.9: the grouped-map UDF shape — whole group in, whole group
    out, as one Arrow-backed pandas frame per group).

    This op is deliberately also expressible with a window avg/stddev
    (zero Python); it exists as the grouped-map template for logic
    that genuinely needs the whole group materialized (per-group model
    fits, iterative per-entity solvers). Scale contract: one shuffle
    on the group key, and the LARGEST SINGLE GROUP must fit in one
    executor's memory — the documented applyInPandas constraint; skew
    in group sizes matters here more than anywhere else.
    """
    import pandas as pd

    out_schema = f"{group_col} long, {value_col} double, zscore double"

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=0)
        z = (pdf[value_col] - mu) / sd if sd > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                "zscore": z,
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        _norm, schema=out_schema
    )
