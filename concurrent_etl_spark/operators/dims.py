"""Surrogate-key dimension maintenance (SURVEY.md §2.6).

Re-expresses the reference's ``update_master_table``
(case_2/Normal.py:54-80, ~27 LoC, called 4x per chunk): read dim,
mask new keys, dedup, append (DB assigns identity ID), re-read.

That read-check-insert is racy under the reference's own thread
parallelism (two chunks can insert the same key between each other's
read and write, case_2/MultithreadETL.py:61-87). Here dimension
maintenance happens ONCE per batch on the full batch DataFrame —
deterministic, idempotent, race-free:

  new = batch keys, non-null, distinct, anti-joined against dim
  id   = row_number() over key order + max(existing id)

``row_number`` over a global key sort is a single tiny shuffle over
only the NEW keys (dims are small relative to facts); facts never
move. ``monotonically_increasing_id`` is deliberately avoided — it is
partitioning-dependent and non-contiguous, which breaks idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from concurrent_etl_spark.operators.relational import new_keys


def upsert_dimension(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    id_col: str = "id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Return ``dim`` with surrogate-keyed rows added for unseen keys.

    Parameters mirror the reference's (master_df, batch_df, base_column)
    call shape (case_2/Normal.py:210-225). ``extra_cols`` carries
    attribute columns copied from the first occurrence in the batch
    (e.g. workCentreDisplayName, case_2/MultithreadETL.py:237-240).

    Returns the complete new dimension: existing rows unchanged,
    new rows with ids max(existing)+1, +2, ... in key order.
    """
    extra_cols = extra_cols or []
    fresh = new_keys(batch, dim, key)
    if extra_cols:
        firsts = batch.groupBy(key).agg(
            *[F.min(c).alias(c) for c in extra_cols]
        )
        fresh = fresh.join(firsts, key, "left")

    # driver-side scalar: max existing surrogate (dims are small; this
    # is a bounded single-value aggregate, not a row collect)
    max_id = dim.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("m")).collect()[0]["m"]

    w = Window.orderBy(key)
    new_rows = fresh.select(
        (F.row_number().over(w) + F.lit(max_id)).cast("bigint").alias(id_col),
        F.col(key),
        *[F.col(c) for c in extra_cols],
    )
    return dim.select(id_col, key, *extra_cols).unionByName(new_rows)


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed.

    Collapses consecutive rows with an unchanged attribute and emits
    one version row per change: (key, attr, valid_from, valid_to,
    is_current), half-open intervals, ``valid_to`` null on the current
    version. The reference's dimensions are type-1 (overwrite-only,
    case_2/Normal.py:54-80); type-2 is what a warehouse needs for
    point-in-time joins.

    Plan shape: ONE shuffle on ``key``; both window passes (lag for
    change detection, lead for interval close) share the same
    partitioning+ordering so Spark reuses a single sort. Determinism
    under ts ties comes from the explicit ``tiebreak`` column in the
    window order.

    Scale: state per key = its version chain, bounded by change rate;
    partitioning by key spreads chains uniformly. Incremental refresh
    at 100 TB = run this over (current-version rows UNION new feed)
    per partition-pruned date slice.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    changes = (
        df.withColumn("_prev", F.lag(attr).over(w))
        .where(F.col("_prev").isNull() | (F.col(attr) != F.col("_prev")))
        .select(key, attr, F.col(ts_col).alias("valid_from"), tiebreak)
    )
    w2 = Window.partitionBy(key).orderBy("valid_from", tiebreak)
    return changes.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )
