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
