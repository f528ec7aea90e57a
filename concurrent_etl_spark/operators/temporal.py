"""Temporal joins the reference lacks but a time-series warehouse needs.

The reference's only notion of time is file arrival (SURVEY §2.8); its
event-ish data (postingDate/postingTime, ``case_2/Normal.py:163-170``)
is never joined on time. These operators add the two standard temporal
join shapes over the ``events`` table, built scale-first:

  * as-of join — "latest right row at-or-before each left row" — as a
    union + ordered window scan: one shuffle on the entity key, zero
    range explosion, O(n log n). This is how you do as-of at 100 TB;
    the naive per-left-row lookup is a correlated O(n^2) disaster.

  * range join — "pairs within a time window" — via time-bucketing:
    each left row probes exactly two buckets (its own and the next),
    so the join is a pair of equi-joins on (key, bucket) that Spark
    executes as a hash join; the exact range predicate then filters
    the small candidate set. No BroadcastNestedLoopJoin ever appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_id: str,
    right_vals: list[str],
    prefix: str = "prior_",
) -> DataFrame:
    """Left as-of join: attach the latest right row with ts <= left.ts.

    Tie semantics: a right row at exactly left.ts qualifies; among
    right rows sharing a timestamp the one with the greatest
    ``right_id`` wins (full determinism).

    Implementation is the scalable union-scan: tag both inputs, union,
    sort each entity's rows by (ts, tag, id) inside one window, and
    carry the last non-null right payload forward. One hash shuffle on
    ``on``; no range or nested-loop join.
    """
    lcols = left.columns
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_vals],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_lv_{c}")
          for c in lcols if c not in (on, ts_col)],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(dict(right.dtypes)[right_id]).alias("_rid"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}")
          for c in right_vals],
        *[F.col(c).alias(f"_lv_{c}") for c in lcols if c not in (on, ts_col)],
    )
    # right rows sort before left rows at equal ts => "at-or-before"
    # includes same-instant matches; _rid asc => greatest id wins last.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_tag"), F.col("_rid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pack the right payload into one struct that is null exactly on
    # left rows — last(ignorenulls) then carries the whole right row,
    # so a legitimately-null right value can't be skipped past.
    u = r.unionByName(l).withColumn(
        "_rpack",
        F.when(
            F.col("_tag") == 0,
            F.struct(
                F.col("_rid").alias("rid"),
                *[F.col(f"_rv_{c}").alias(c) for c in right_vals],
            ),
        ),
    )
    pack = F.last("_rpack", ignorenulls=True).over(w)
    out = u.select(
        F.col(on), F.col(ts_col), F.col("_tag"),
        *[F.col(f"_lv_{c}").alias(c) for c in lcols if c not in (on, ts_col)],
        pack["rid"].alias(f"{prefix}{right_id}"),
        *[pack[c].alias(f"{prefix}{c}") for c in right_vals],
    )
    return out.where(F.col("_tag") == 1).drop("_tag")


def range_join_pairs(
    events: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_s: int = 3600,
) -> DataFrame:
    """Pairs (a, b) per entity with b.ts in [a.ts, a.ts + window_s).

    Bucketed band join: bucket width == window width, so b's bucket is
    always a's bucket or the next one. The left side expands 2x (its
    two probe buckets) and both sides hash-join on (key, bucket) —
    a plan whose cost scales with matches, not with |events|^2.
    Self-pairs excluded; ``lag_ms`` is the exact millisecond gap.
    """
    w_us = window_s * 1_000_000
    base = events.select(
        F.col(on),
        F.col(id_col).alias("_eid"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    ).withColumn("_bkt", F.expr(f"_us div {w_us}"))  # exact integral division
    a = base.select(
        F.col(on),
        F.col("_eid").alias("event_a"),
        F.col("_us").alias("us_a"),
        F.explode(F.array(F.col("_bkt"), F.col("_bkt") + 1)).alias("bucket"),
    )
    b = base.select(
        F.col(on),
        F.col("_eid").alias("event_b"),
        F.col("_us").alias("us_b"),
        F.col("_bkt").alias("bucket"),
    )
    return (
        a.join(b, [on, "bucket"])
        .where(
            (F.col("us_b") >= F.col("us_a"))
            & (F.col("us_b") < F.col("us_a") + F.lit(w_us))
            & (F.col("event_a") != F.col("event_b"))
        )
        .select(
            F.col(on),
            "event_a",
            "event_b",
            F.expr("(us_b - us_a) div 1000").alias("lag_ms"),
        )
    )
