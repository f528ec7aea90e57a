"""Temporal join queries over the events table (operators/temporal.py).

The reference joins only on equality keys (SURVEY §2.3); these cover
the two time-axis join shapes every event warehouse needs, in their
scale-safe formulations (union-scan as-of, bucketed range join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.operators.temporal import asof_join, range_join_pairs


@query(
    "asof_join_prior_click",
    oracle="""
    SELECT l.user_id, l.ts, l.event_id, l.value,
           p.prior_event_id, p.prior_ts, p.prior_value
    FROM (SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'purchase') l
    LEFT JOIN LATERAL (
      SELECT r.event_id AS prior_event_id, r.ts AS prior_ts,
             r.value AS prior_value
      FROM events r
      WHERE r.event_type = 'click' AND r.user_id = l.user_id
        AND r.ts <= l.ts
      ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) p ON true
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the user's latest click at or
    before it. Spark side is the O(n log n) union-scan (one shuffle on
    user_id, no range join); the oracle states the same semantics as a
    per-row LATERAL lookup — feasible for DuckDB at sf0.01, quadratic
    poison at 100 TB, which is exactly why the engine doesn't do it
    that way."""
    ev = load_table(spark, sf_dir, "events")
    return asof_join(
        ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        ev.where(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id", "value"
        ),
        on="user_id",
        ts_col="ts",
        right_id="event_id",
        right_vals=["ts", "value"],
    )


@query(
    "range_join_events",
    oracle="""
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
           (epoch_us(b.ts) - epoch_us(a.ts)) // 1000 AS lag_ms
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
     AND a.event_id <> b.event_id
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: same-user event pairs within one hour, via the
    bucketed band join (two equi-probes per row, never a nested-loop
    cross product)."""
    return range_join_pairs(
        load_table(spark, sf_dir, "events"), window_s=3600
    )


@query(
    "ewma_user_value",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
               AS vals
      FROM events WHERE event_type = 'purchase')
    SELECT user_id, ts, event_id, value,
           round(
             list_aggregate(list_transform(vals,
               (v, i) -> v * pow(0.5, len(vals) - i)), 'sum')
             /
             list_aggregate(list_transform(vals,
               (v, i) -> pow(0.5, len(vals) - i)), 'sum'),
             9) AS ewma
    FROM ordered
    """,
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over each user's last 10
    purchase values — the standard smoothing/trend statistic for
    time-series feature engineering. The frame's values are staged as
    an ordered array (collect_list over an explicit ROWS frame with a
    total ordering) and folded with alpha = 0.5: every weight is an
    exact power of two, so each multiply is EXACT in IEEE arithmetic
    and the <= 10-term left-to-right fold rounds identically in both
    engines — no DECIMAL staging needed. One shuffle on user_id; the
    frame bounds state at 10 values regardless of history length
    (the batch analog of a bounded streaming state store).
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    n = F.size("vals")
    weighted = F.aggregate(
        F.transform(
            F.col("vals"), lambda v, i: v * F.pow(F.lit(0.5), n - 1 - i)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.aggregate(
        F.transform(
            F.col("vals"), lambda v, i: F.pow(F.lit(0.5), n - 1 - i)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.select("user_id", "ts", "event_id", "value", vals.alias("vals"))
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.round(weighted / norm, 9).alias("ewma"),
        )
    )


@query(
    "rolling_zscore_anomaly",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             COUNT(*) OVER win AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER win AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                    * CAST(value AS DECIMAL(18,6))) OVER win AS DOUBLE) AS s2
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id,
           round((value - s / n)
                 / sqrt((s2 - s * s / n) / (n - 1)), 6) AS z,
           CASE WHEN abs((value - s / n)
                 / sqrt((s2 - s * s / n) / (n - 1))) >= 2.5
                THEN 1 ELSE 0 END AS is_anomaly
    FROM w
    WHERE n >= 5 AND (s2 - s * s / n) / (n - 1) > 0
    """,
)
def q_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly gate: each event scored against the
    trailing-10 window of the SAME user's values — the streaming-able
    outlier filter a metrics pipeline runs before aggregation (a
    sensor stuck at 100x normal would otherwise poison daily sums).

    Determinism: window sums accumulate as DECIMAL (exact, partition-
    invariant), convert to double once, then mean/variance/sqrt are a
    fixed IEEE expression both engines evaluate identically. Windows
    shorter than 5 rows or with zero variance emit nothing (a z-score
    against no history is noise).

    Scale: ONE shuffle on user_id; both window stats share one
    partitioned sort (trailing ROWS frame = O(1) state per row).
    Per-user history length never matters — the frame is bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    vdec = F.col("value").cast("decimal(18,6)")
    staged = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("*").over(win).alias("n"),
        F.sum(vdec).over(win).cast("double").alias("s"),
        F.sum(vdec * vdec).over(win).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(var)
    return (
        staged.where((F.col("n") >= 5) & (var > 0))
        .select(
            "event_id",
            "user_id",
            F.round(z, 6).alias("z"),
            F.when(F.abs(z) >= 2.5, 1).otherwise(0).alias("is_anomaly"),
        )
    )
